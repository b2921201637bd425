"""Deterministic synthetic test corpora (FIXTURES.md).

All values are pure functions of ids / coordinates (seed 42 where a PRNG is
unavoidable), mirroring the reference's parametric test layers
(TestFiles.scala:31-73) and single-tile-cut builders
(TileLayerRDDBuilders.scala:46-183). No external data.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from . import codec
from .grid import Extent
from .geometry import regular_ngon, wkb_encode_polygon

HOT_BOX = Extent(10.0, 10.0, 10.1, 10.1)  # skew knob: hot 0.1 deg box


def hash64(s: str) -> int:
    """Stable 64-bit hash (blake2b/8B, little-endian)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _halton(i: np.ndarray, base: int) -> np.ndarray:
    """Low-discrepancy Halton sequence, vectorized."""
    i = np.asarray(i, dtype=np.int64) + 1
    out = np.zeros(i.shape, dtype=np.float64)
    f = 1.0 / base
    ii = i.copy()
    while (ii > 0).any():
        out += f * (ii % base)
        ii //= base
        f /= base
    return out


# -------------------------------------------------------------- T1: images

_PATTERNS = ("constant", "gradient", "checker", "mod97")


def make_pattern(i: int, h: int, w: int) -> np.ndarray:
    """Deterministic uint8 pattern tile."""
    p = _PATTERNS[i % 4]
    if p == "constant":
        return np.full((h, w), i % 256, dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    if p == "gradient":
        return ((xx + yy) % 256).astype(np.uint8)
    if p == "checker":
        return (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8)
    return ((xx * yy + i) % 97).astype(np.uint8)


def make_pattern_rgb(i: int, h: int, w: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 RGB tile: three phase-shifted patterns
    (MultibandTile-shaped corpus, MultibandTile.scala:54)."""
    return np.stack(
        [make_pattern(i, h, w), make_pattern(i + 1, h, w), make_pattern(i + 2, h, w)],
        axis=-1,
    )


def phash64(arr: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-ish hash: xor-fold of 8x8 mean-block
    sign bits vs global mean (consistent between oracle and engine).
    RGB inputs hash their luma plane."""
    from .codec import to_gray_f64

    a = to_gray_f64(arr) if arr.ndim == 3 else arr.astype(np.float64)
    h, w = a.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = a[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for b_i, b in enumerate(bits):
        if b:
            v |= 1 << b_i
    return v - (1 << 64) if v >= 1 << 63 else v


def image_lonlat(image_id: str) -> tuple[float, float]:
    """Deterministic placement (FIXTURES.md T1): uniform lon, mercator-safe
    lat; 10% of ids remapped into the hot box (skew)."""
    h1 = hash64(image_id) % (1 << 20)
    h2 = hash64(image_id + "|lat") % (1 << 20)
    lon = -180.0 + h1 / float(1 << 20) * 360.0
    lat = -85.0 + h2 / float(1 << 20) * 170.0
    if hash64(image_id + "|hot") % 10 == 0:
        lon = HOT_BOX.xmin + (h1 / float(1 << 20)) * HOT_BOX.width
        lat = HOT_BOX.ymin + (h2 / float(1 << 20)) * HOT_BOX.height
    return lon, lat


def images_table(n: int) -> pd.DataFrame:
    """The authoritative input table (BASELINE.json input_hint):
    (image_id, bytes, w, h, fmt, caption, phash) + derived lon/lat columns.
    Images are RGB (h, w, 3); pipelines choose luma or multiband at the
    tiler (tile_to_layout(multiband=...))."""
    sizes = (64, 128, 256)
    rows = []
    for i in range(n):
        image_id = f"img{i:010d}"
        w = sizes[i % 3]
        h = sizes[(i // 3) % 3]
        arr = make_pattern_rgb(i, h, w)
        fmt = "png" if i % 2 == 0 else "fjpg"
        data = codec.encode_tile(arr, fmt)
        cap = f"caption-{i}-" + " ".join(
            f"w{(hash64(f'{i}|{j}')) % 1000}" for j in range(3)
        )
        if i % 7 == 0:
            cap += " ümläut-中文-سلام"
        lon, lat = image_lonlat(image_id)
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": cap,
                "phash": np.int64(phash64(arr)),
                "lon": lon,
                "lat": lat,
            }
        )
    return pd.DataFrame(rows)


# -------------------------------------------------------------- T2: points

def points_table(n: int) -> pd.DataFrame:
    i = np.arange(n)
    lon = -180.0 + _halton(i, 2) * 360.0
    lat = -85.0 + _halton(i, 3) * 170.0
    hot = i % 10 == 9  # 10% into the hot box
    lon = np.where(hot, HOT_BOX.xmin + _halton(i, 2) * HOT_BOX.width, lon)
    lat = np.where(hot, HOT_BOX.ymin + _halton(i, 3) * HOT_BOX.height, lat)
    return pd.DataFrame(
        {"point_id": [f"pt{j:08d}" for j in i], "lon": lon, "lat": lat}
    )


# ------------------------------------------------------------ T3: polygons

def polygons_table(k: int) -> pd.DataFrame:
    """K convex n-gons on a Halton lattice + 3 specials (FIXTURES.md T3)."""
    rows = []
    i = np.arange(k)
    cx = -170.0 + _halton(i, 2) * 340.0
    cy = -80.0 + _halton(i, 3) * 160.0
    for j in range(k):
        n = 3 + j % 6
        radius = 0.5 + (j % 10) * 0.3
        ring = regular_ngon(float(cx[j]), float(cy[j]), n, radius, rot=0.1 * j)
        rows.append(
            {
                "polygon_id": f"poly{j:05d}",
                "wkb": wkb_encode_polygon([ring]),
                "zone": np.int32(j % 16),
            }
        )
    # specials: hot-box cover, degenerate sliver, tile-edge crosser
    hot_ring = regular_ngon(10.05, 10.05, 8, 0.5)
    rows.append({"polygon_id": f"poly{k:05d}", "wkb": wkb_encode_polygon([hot_ring]), "zone": np.int32(0)})
    sliver = np.array([[0.0, 0.0], [5.0, 1e-7], [5.0, -1e-7]])
    rows.append({"polygon_id": f"poly{k + 1:05d}", "wkb": wkb_encode_polygon([sliver]), "zone": np.int32(1)})
    # zoom-8 tile edge at lon = 360/256 * k: pick the edge at 45.0 exactly
    crosser = np.array([[44.5, 0.0], [45.5, 0.0], [45.5, 1.0], [44.5, 1.0]])
    rows.append({"polygon_id": f"poly{k + 2:05d}", "wkb": wkb_encode_polygon([crosser]), "zone": np.int32(2)})
    return pd.DataFrame(rows)


# ----------------------------------------------------------- T4: tile layers

LAYER_VARIANTS = (
    "all-ones", "all-twos", "all-hundreds", "increasing", "decreasing",
    "every-other-undefined", "mod-10000",
)
TEST_BOUNDS = (1, 1, 6, 7)  # KeyBounds (1,1)..(6,7), reference TestFiles.scala:38-42


def layer_tile(
    variant: str, col: int, row: int, tile_size: int,
    bounds: tuple[int, int, int, int] = TEST_BOUNDS,
) -> np.ndarray:
    """One float64 tile of the parametric layer (NaN = NoData)."""
    cmin, rmin, cmax, _ = bounds
    layer_w = (cmax - cmin + 1) * tile_size
    yy, xx = np.mgrid[0:tile_size, 0:tile_size]
    gx = (col - cmin) * tile_size + xx  # global pixel coords within bounds
    gy = (row - rmin) * tile_size + yy
    idx = gy.astype(np.float64) * layer_w + gx
    if variant == "all-ones":
        return np.ones((tile_size, tile_size))
    if variant == "all-twos":
        return np.full((tile_size, tile_size), 2.0)
    if variant == "all-hundreds":
        return np.full((tile_size, tile_size), 100.0)
    if variant == "increasing":
        return idx
    if variant == "decreasing":
        total = layer_w * ((bounds[3] - rmin + 1) * tile_size)
        return total - 1.0 - idx
    if variant == "every-other-undefined":
        out = idx % 2
        return np.where((gx + gy) % 2 == 0, np.nan, out * 0 + 1.0)
    if variant == "mod-10000":
        return idx % 10000.0
    if variant == "zones":
        return np.float64((gx // 4) % 4 + 4 * ((gy // 4) % 4))
    raise ValueError(variant)


def tile_layer_table(
    variant: str, zoom: int = 8, tile_size: int = 16,
    bounds: tuple[int, int, int, int] = TEST_BOUNDS,
) -> pd.DataFrame:
    """Pre-tiled raster layer rows (zoom,col,row,cell,tile,w,h,fmt)."""
    from .cell import z2_encode

    cmin, rmin, cmax, rmax = bounds
    rows = []
    for r in range(rmin, rmax + 1):
        for c in range(cmin, cmax + 1):
            arr = layer_tile(variant, c, r, tile_size, bounds)
            rows.append(
                {
                    "zoom": np.int32(zoom),
                    "col": np.int32(c),
                    "row": np.int32(r),
                    "cell": np.int64(z2_encode(c, r)),
                    "tile": codec.raw_encode(arr),
                    "h": np.int32(tile_size),
                    "w": np.int32(tile_size),
                    "fmt": "raw",
                }
            )
    return pd.DataFrame(rows)


def stitch_layer_df(pdf: pd.DataFrame) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """Stitch a collected layer DataFrame back to one array (test helper)."""
    from .oracle import stitch

    tiles = {
        (int(r["col"]), int(r["row"])): codec.decode_tile(bytes(r["tile"]), None)
        for _, r in pdf.iterrows()
    }
    arr, gb = stitch(tiles)
    return arr, (gb.col_min, gb.row_min, gb.col_max, gb.row_max)
