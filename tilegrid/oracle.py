"""Single-process NumPy reference implementations — the test oracle.

Replicates the reference's central test invariant (OpAsserter.scala:63-81):
run the op on the whole stitched raster sequentially, run the distributed op
on the tiled layer, stitch, compare. Every Spark operator in
tilegrid.operators has a whole-array twin here.

Focal semantics:
  * mean/sum/min/max/...: window clipped at raster edge; NoData (NaN) cells
    skipped (reference FocalCalculation + Mean.scala).
  * slope/aspect/hillshade: neighbors outside the raster or NoData take the
    focal cell's value (SurfacePointCalculation.scala note), Horn's method
    derivatives (SurfacePointCalculation.scala:172-173).
"""

from __future__ import annotations

import math

import numpy as np

from .geometry import points_in_polygon
from .grid import Extent, GridBounds, LayoutDefinition


# ------------------------------------------------------------ stitch / cut

def stitch(tiles: dict[tuple[int, int], np.ndarray], nodata=np.nan) -> tuple[np.ndarray, GridBounds]:
    """Assemble {(col,row): tile} into one array over the key bounds."""
    cols = [c for c, _ in tiles]
    rows = [r for _, r in tiles]
    gb = GridBounds(min(cols), min(rows), max(cols), max(rows))
    th, tw = next(iter(tiles.values())).shape[:2]
    out = np.full((gb.height * th, gb.width * tw), nodata, dtype=np.float64)
    for (c, r), t in tiles.items():
        y0, x0 = (r - gb.row_min) * th, (c - gb.col_min) * tw
        out[y0 : y0 + th, x0 : x0 + tw] = t
    return out, gb


def cut(arr: np.ndarray, tile_cols: int, tile_rows: int) -> dict[tuple[int, int], np.ndarray]:
    """Cut a whole array into a {(col,row): tile} grid (top-left = (0,0))."""
    h, w = arr.shape[:2]
    out = {}
    for r in range(h // tile_rows):
        for c in range(w // tile_cols):
            out[(c, r)] = arr[
                r * tile_rows : (r + 1) * tile_rows, c * tile_cols : (c + 1) * tile_cols
            ]
    return out


# ----------------------------------------------------------------- focal ops

def _windows(arr: np.ndarray, size: int) -> np.ndarray:
    """(h, w, size, size) sliding windows over arr padded with NaN."""
    pad = size // 2
    p = np.pad(arr.astype(np.float64), pad, constant_values=np.nan)
    return np.lib.stride_tricks.sliding_window_view(p, (size, size))


def focal_mean(arr: np.ndarray, size: int = 3) -> np.ndarray:
    w = _windows(arr, size)
    with np.errstate(invalid="ignore"):
        return np.nanmean(w, axis=(2, 3))


def focal_sum(arr: np.ndarray, size: int = 3) -> np.ndarray:
    w = _windows(arr, size)
    allnan = np.isnan(w).all(axis=(2, 3))
    s = np.nansum(w, axis=(2, 3))
    s[allnan] = np.nan
    return s


def focal_min(arr: np.ndarray, size: int = 3) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        return np.nanmin(_windows(arr, size), axis=(2, 3))


def focal_max(arr: np.ndarray, size: int = 3) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        return np.nanmax(_windows(arr, size), axis=(2, 3))


def focal_median(arr: np.ndarray, size: int = 3) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        return np.nanmedian(_windows(arr, size), axis=(2, 3))


def focal_std(arr: np.ndarray, size: int = 3) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        return np.nanstd(_windows(arr, size), axis=(2, 3))


def focal_mode(arr: np.ndarray, size: int = 3) -> np.ndarray:
    w = _windows(arr, size)
    h, ww = arr.shape
    out = np.full((h, ww), np.nan)
    for i in range(h):
        for j in range(ww):
            v = w[i, j][~np.isnan(w[i, j])]
            if len(v):
                vals, counts = np.unique(v, return_counts=True)
                out[i, j] = vals[np.argmax(counts)]
    return out


def convolve(arr: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Direct correlation-style convolution (kernel not flipped — matches the
    reference Kernel semantics) with zero treatment of NoData."""
    size = kernel.shape[0]
    w = _windows(arr, size)
    wz = np.where(np.isnan(w), 0.0, w)
    return np.einsum("ijkl,kl->ij", wz, kernel)


def _surface_neighbors(arr: np.ndarray) -> dict[str, np.ndarray]:
    """8-neighbor arrays with outside-raster and NoData neighbors replaced by
    the focal value (reference edge rule)."""
    a = arr.astype(np.float64)
    # outside-raster neighbors = focal value (reference note), achieved by
    # NaN-padding then substituting the focal value below
    p = np.pad(a, 1, constant_values=np.nan)
    out = {}
    names = {
        "nw": (0, 0), "n": (0, 1), "ne": (0, 2),
        "w": (1, 0), "e": (1, 2),
        "sw": (2, 0), "s": (2, 1), "se": (2, 2),
    }
    h, w = a.shape
    for name, (dy, dx) in names.items():
        nb = p[dy : dy + h, dx : dx + w]
        out[name] = np.where(np.isnan(nb), a, nb)
    return out


def _horn_derivatives(arr: np.ndarray, cell_width: float, cell_height: float):
    n = _surface_neighbors(arr)
    dzdx = (n["ne"] + 2 * n["e"] + n["se"] - n["nw"] - 2 * n["w"] - n["sw"]) / (
        8.0 * cell_width
    )
    dzdy = (n["sw"] + 2 * n["s"] + n["se"] - n["nw"] - 2 * n["n"] - n["ne"]) / (
        8.0 * cell_height
    )
    nanmask = np.isnan(arr)
    dzdx[nanmask] = np.nan
    dzdy[nanmask] = np.nan
    return dzdx, dzdy


def slope(arr: np.ndarray, cell_width: float, cell_height: float, z_factor: float = 1.0) -> np.ndarray:
    """Horn's method, degrees (Slope.scala:46-58 + SurfacePoint.slope)."""
    dzdx, dzdy = _horn_derivatives(arr, cell_width, cell_height)
    return np.degrees(np.arctan(z_factor * np.sqrt(dzdx**2 + dzdy**2)))


def aspect(arr: np.ndarray, cell_width: float, cell_height: float) -> np.ndarray:
    """Aspect in degrees [0, 360); flat = NaN (SurfacePoint.aspect)."""
    dzdx, dzdy = _horn_derivatives(arr, cell_width, cell_height)
    a = np.arctan2(dzdy, -dzdx)
    a = np.where(a < 0, a + 2 * np.pi, a)
    a = np.where((dzdx == 0) & (dzdy == 0), np.nan, a)
    a = np.where(a == 2 * np.pi, 0.0, a)
    return np.degrees(a)


def hillshade(
    arr: np.ndarray, cell_width: float, cell_height: float,
    azimuth: float = 315.0, altitude: float = 45.0, z_factor: float = 1.0,
) -> np.ndarray:
    """0..127 illumination (Hillshade.scala direct path)."""
    dzdx, dzdy = _horn_derivatives(arr, cell_width, cell_height)
    az = math.radians(90.0 - azimuth)
    ze = math.radians(90.0 - altitude)
    denom = np.sqrt(dzdx**2 + dzdy**2 + 1.0)
    cos_slope = 1.0 / denom
    sin_slope = np.sqrt(dzdx**2 + dzdy**2) / denom
    mag = np.sqrt(dzdx**2 + dzdy**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos_aspect = np.where(
            dzdx == 0,
            np.where(dzdy == 0, -1.0, 0.0),
            np.where(dzdy == 0, np.where(dzdx < 0, 1.0, -1.0), -dzdx / mag),
        )
        sin_aspect = np.where(
            dzdy == 0,
            0.0,
            np.where(dzdx == 0, np.sign(dzdy), dzdy / mag),
        )
    c = math.cos(az) * cos_aspect + math.sin(az) * sin_aspect
    v = math.cos(ze) * cos_slope + math.sin(ze) * sin_slope * c
    out = np.round(127.0 * np.maximum(0.0, v))
    out[np.isnan(arr)] = np.nan
    return out


def _morans_stats(arr: np.ndarray) -> tuple[float, float]:
    v = arr[~np.isnan(arr)]
    n = v.size
    sx, sx2 = float(v.sum()), float((v * v).sum())
    mean = sx / n
    var = (sx2 - sx * sx / n) / n
    return mean, var


def morans_i(arr: np.ndarray, size: int = 3) -> np.ndarray:
    """Local Moran's I (Moran.scala TileMoransICalculation): base/var*z/w
    with z the neighbor deviation sum and w the in-bounds neighbor count."""
    mean, var = _morans_stats(arr)
    w = _windows(arr, size)
    with np.errstate(invalid="ignore"):
        S = np.nansum(w, axis=(2, 3))
        wfull = (~np.isnan(w)).sum(axis=(2, 3))
    wn = wfull - 1
    base = arr - mean
    z = (S - arr) - wn * mean
    with np.errstate(invalid="ignore", divide="ignore"):
        li = base / var * z / wn
    li[np.isnan(arr) | (wn <= 0)] = np.nan
    return li


def morans_i_global(arr: np.ndarray, size: int = 3) -> float:
    """Global Moran's I (ScalarMoransICalculation): sum(base/var*z)/sum(w)."""
    li = morans_i(arr, size)
    mean, var = _morans_stats(arr)
    w = _windows(arr, size)
    wn = (~np.isnan(w)).sum(axis=(2, 3)) - 1
    ok = ~np.isnan(li)
    return float((li[ok] * wn[ok]).sum() / wn[~np.isnan(arr)].sum())


# --------------------------------------------------------------- pyramid

def pyramid_up(arr: np.ndarray, method: str = "average") -> np.ndarray:
    """One zoom level up = 2x2 block reduce."""
    h, w = arr.shape
    b = arr.reshape(h // 2, 2, w // 2, 2).astype(np.float64)
    if method == "average":
        with np.errstate(invalid="ignore"):
            return np.nanmean(b, axis=(1, 3))
    if method == "nearest":  # reference NearestNeighbor picks the NW sample
        return arr[::2, ::2].astype(np.float64)
    if method == "max":
        with np.errstate(invalid="ignore"):
            return np.nanmax(b, axis=(1, 3))
    if method == "sum":
        return np.nansum(b, axis=(1, 3))
    raise ValueError(method)


# ---------------------------------------------------------- joins / knn

def pip_join(
    px: np.ndarray, py: np.ndarray, point_ids: list,
    polygons: dict[str, list[np.ndarray]],
) -> set[tuple[str, str]]:
    """Brute-force point-in-polygon join -> {(point_id, polygon_id)}."""
    out = set()
    for pid, rings in polygons.items():
        inside = points_in_polygon(px, py, rings)
        for i in np.where(inside)[0]:
            out.add((point_ids[i], pid))
    return out


def knn(
    qx: np.ndarray, qy: np.ndarray, cx: np.ndarray, cy: np.ndarray,
    cand_ids: list, k: int,
) -> list[list]:
    """Brute-force kNN: for each query, the k nearest candidate ids, ties
    broken by (distance, id)."""
    out = []
    for x, y in zip(qx, qy):
        d = (cx - x) ** 2 + (cy - y) ** 2
        order = sorted(range(len(d)), key=lambda i: (d[i], cand_ids[i]))
        out.append([cand_ids[i] for i in order[:k]])
    return out


# --------------------------------------------------------------- zonal

def zonal_histogram(values: np.ndarray, zones: np.ndarray) -> dict[int, dict[float, int]]:
    """{zone: {value: count}} over aligned arrays, NoData skipped."""
    ok = ~np.isnan(values) & ~np.isnan(zones.astype(np.float64))
    out: dict[int, dict[float, int]] = {}
    for z, v in zip(zones[ok].astype(np.int64).ravel(), values[ok].ravel()):
        out.setdefault(int(z), {})
        out[int(z)][float(v)] = out[int(z)].get(float(v), 0) + 1
    return out


# ------------------------------------------------------------ rasterize

def rasterize_polygon(
    rings: list[np.ndarray], ext: Extent, cols: int, rows: int
) -> np.ndarray:
    """Boolean mask: pixel-center-in-polygon (reference PixelIsPoint rule,
    PolygonRasterizer PixelIsPoint option)."""
    cw, ch = ext.width / cols, ext.height / rows
    cxs = ext.xmin + (np.arange(cols) + 0.5) * cw
    cys = ext.ymax - (np.arange(rows) + 0.5) * ch
    gx, gy = np.meshgrid(cxs, cys)
    return points_in_polygon(gx.ravel(), gy.ravel(), rings).reshape(rows, cols)


# ----------------------------------------------------- tiler (whole-array)

def tile_assignments(
    layout: LayoutDefinition, xmins, ymins, xmaxs, ymaxs
) -> list[list[tuple[int, int]]]:
    """For each input extent, the (col,row) keys its raster covers — the
    CutTiles key set (CutTiles.scala:45-57)."""
    mt = layout.map_transform
    out = []
    for xmn, ymn, xmx, ymx in zip(xmins, ymins, xmaxs, ymaxs):
        gb = mt.gridbounds_for_extent(Extent(xmn, ymn, xmx, ymx))
        tl = layout.tile_layout
        keys = [
            (c, r)
            for c, r in gb.coords()
            if 0 <= c < tl.layout_cols and 0 <= r < tl.layout_rows
        ]
        out.append(keys)
    return out


# ------------------------------------------- iterative propagation oracles
# Reference-faithful whole-raster loops (deliberately UNvectorized and
# structurally unlike operators/terrain.py, so engine and oracle can only
# agree by computing the same thing).

_DIR_BITS = [  # Greenlee bits (FlowDirection.scala:61-71); drow grows south
    (1, 1, 0), (2, 1, 1), (4, 0, 1), (8, -1, 1),
    (16, -1, 0), (32, -1, -1), (64, 0, -1), (128, 1, -1),
]
_SQRT2 = 1.4142135623730951


def fill_ref(arr: np.ndarray, threshold: float = 20.0) -> np.ndarray:
    """Fill.scala:46-70 double path (neighbor mean when every in-bounds
    neighbor differs by more than threshold)."""
    h, w = arr.shape
    out = arr.astype(np.float64).copy()
    for r in range(h):
        for c in range(w):
            cv = arr[r, c]
            if np.isnan(cv):
                continue
            vals = []
            for _, dc, dr in _DIR_BITS:
                cc, rr = c + dc, r + dr
                if 0 <= cc < w and 0 <= rr < h and not np.isnan(arr[rr, cc]):
                    vals.append(arr[rr, cc])
            if vals and all(abs(v - cv) > threshold for v in vals):
                out[r, c] = sum(vals) / len(vals)
    return out


def flow_direction_ref(arr: np.ndarray) -> np.ndarray:
    """FlowDirection.scala:36-106: max-drop D8 with tie bit-sums; sinks and
    NoData -> NaN."""
    h, w = arr.shape
    out = np.full((h, w), np.nan)
    for r in range(h):
        for c in range(w):
            cv = arr[r, c]
            if np.isnan(cv):
                continue
            drops = {}
            for bit, dc, dr in _DIR_BITS:
                cc, rr = c + dc, r + dr
                if 0 <= cc < w and 0 <= rr < h and not np.isnan(arr[rr, cc]):
                    dist = _SQRT2 if dc != 0 and dr != 0 else 1.0
                    drops[bit] = (cv - arr[rr, cc]) / dist
            if not drops:
                continue
            mx = max(drops.values())
            if mx < 0:
                continue  # sink -> NODATA
            out[r, c] = float(sum(b for b, v in drops.items() if v == mx))
    return out


def flow_accumulation_ref(dirs: np.ndarray) -> np.ndarray:
    """Accumulation.scala:29-216 recurrence acc(c) = sum over inflowing
    neighbors n of (acc(n) + 1), memoized recursion over the flow DAG."""
    h, w = dirs.shape
    acc = np.full((h, w), -1.0)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, h * w + 100))

    def rec(r: int, c: int) -> float:
        if acc[r, c] >= 0:
            return acc[r, c]
        acc[r, c] = 0.0  # mark (DAG: no cycles with distinct elevations)
        s = 0.0
        for bit, dc, dr in _DIR_BITS:
            cc, rr = c - dc, r - dr  # neighbor that would flow ALONG bit
            if 0 <= cc < w and 0 <= rr < h and not np.isnan(dirs[rr, cc]):
                if int(dirs[rr, cc]) & bit:
                    s += rec(rr, cc) + 1.0
        acc[r, c] = s
        return s

    for r in range(h):
        for c in range(w):
            rec(r, c)
    sys.setrecursionlimit(old)
    return acc


def cost_distance_ref(
    friction: np.ndarray, sources: list[tuple[int, int]]
) -> np.ndarray:
    """CostDistance.scala:43-66 converged fixpoint == single-source-set
    Dijkstra with edge cost factor * (f_a + f_b) / 2 (sqrt(2) diagonal)."""
    import heapq as _hq

    h, w = friction.shape
    dist = np.full((h, w), np.inf)
    pq = []
    for c, r in sources:
        dist[r, c] = 0.0
        _hq.heappush(pq, (0.0, r, c))
    while pq:
        d, r, c = _hq.heappop(pq)
        if d > dist[r, c] or np.isnan(friction[r, c]):
            continue
        for _, dc, dr in _DIR_BITS:
            rr, cc = r + dr, c + dc
            if not (0 <= cc < w and 0 <= rr < h) or np.isnan(friction[rr, cc]):
                continue
            factor = _SQRT2 if dc != 0 and dr != 0 else 1.0
            nd = d + factor * (friction[r, c] + friction[rr, cc]) / 2.0
            if nd < dist[rr, cc]:
                dist[rr, cc] = nd
                _hq.heappush(pq, (nd, rr, cc))
    return np.where(np.isinf(dist), np.nan, dist)


def viewshed_ref(dem: np.ndarray, start_col: int, start_row: int) -> np.ndarray:
    """Viewshed.scala:26-126 verbatim double loops (required-height sweeps,
    exact-int interpolation branch, height >= required - 0.5 test)."""
    h, w = dem.shape
    height0 = dem[start_row, start_col]
    out = np.zeros((h, w))
    for row in range(h):
        for col in range(w):
            height = dem[row, col]
            if np.isnan(height):
                continue  # required = NaN -> not visible
            mx = -np.inf
            if start_row != row:
                lo, hi = (start_row + 1, row) if start_row < row else (row + 1, start_row)
                for y in range(lo, hi + 1):
                    if y == row:
                        continue  # reference: 0-div -> NaN -> skipped
                    x = (y - start_row) / (row - start_row) * (col - start_col) + start_col
                    xi = int(np.floor(x))
                    if x == xi:
                        z = dem[y, xi]
                    else:
                        z = (xi + 1 - x) * dem[y, xi] + (x - xi) * dem[y, xi + 1]
                    req = (start_row - row) / (y - row) * (z - height) + height
                    if req > mx:
                        mx = req
            if start_col != col:
                lo, hi = (start_col + 1, col) if start_col < col else (col + 1, start_col)
                for x in range(lo, hi + 1):
                    if x == col:
                        continue
                    y = (x - start_col) / (col - start_col) * (row - start_row) + start_row
                    yi = int(np.floor(y))
                    if y == yi:
                        z = dem[yi, x]
                    else:
                        z = (yi + 1 - y) * dem[yi, x] + (y - yi) * dem[yi + 1, x]
                    req = (start_col - col) / (x - col) * (z - height) + height
                    if req > mx:
                        mx = req
            if height0 >= mx - 0.5:
                out[row, col] = 1.0
    return out


def approx_viewshed_ref(dem: np.ndarray, sc: int, sr: int) -> np.ndarray:
    """Verbatim loop port of ApproxViewshed.offsets
    (raster/.../viewshed/ApproxViewshed.scala:31-121): ring-by-ring R2
    grazing-height propagation, including its exact-integer interpolation
    branch and per-side doY/doX corner ownership. Returns the offsets
    surface; visibility is dem == offsets."""
    rows, cols = dem.shape
    k = float(dem[sr, sc])
    t = np.full((rows, cols), np.nan)
    t[sr, sc] = k
    max_layer = max(rows - sr, cols - sc, sr + 1, sc + 1)

    def do_y(x: int, y: int, layer: int) -> None:
        if not (0 <= y < rows and 0 <= x < cols):
            return
        z = dem[y, x]
        if layer == 1:
            t[y, x] = z
            return
        x_val = abs(1.0 / (sr - y)) * (sc - x) + x
        x_int = int(x_val)
        yp = y - int(np.sign(y - sr))
        if sr == y:
            closest = t[yp, x]
        elif x_val == x_int:
            closest = t[yp, x_int]
        else:
            closest = (x_int + 1 - x_val) * t[yp, x_int] + (
                x_val - x_int) * t[yp, x_int + 1]
        if y > sr:
            t[y, x] = max(z, 1.0 / (sr - (y - 1)) * (k - closest) + closest)
        else:
            t[y, x] = max(z, -1.0 / (sr - (y + 1)) * (k - closest) + closest)

    def do_x(x: int, y: int, layer: int) -> None:
        if not (0 <= y < rows and 0 <= x < cols):
            return
        z = dem[y, x]
        if layer == 1:
            t[y, x] = z
            return
        y_val = abs(1.0 / (sc - x)) * (sr - y) + y
        y_int = int(y_val)
        xp = x - int(np.sign(x - sc))
        if sc == x:
            closest = t[y, xp]
        elif y_val == y_int:
            closest = t[y_int, xp]
        else:
            closest = (y_int + 1 - y_val) * t[y_int, xp] + (
                y_val - y_int) * t[y_int + 1, xp]
        if x > sc:
            t[y, x] = max(z, 1.0 / (sc - (x - 1)) * (k - closest) + closest)
        else:
            t[y, x] = max(z, -1.0 / (sc - (x + 1)) * (k - closest) + closest)

    for layer in range(1, max_layer):
        for ii in range(2 * layer):
            do_y(sc - layer + ii, sr - layer, layer)
            do_y(sc + layer - ii, sr + layer, layer)
            do_x(sc - layer, sr + layer - ii, layer)
            do_x(sc + layer, sr - layer + ii, layer)
    return t
