"""Layer reproject / raster warp between LatLng and WebMercator layouts.

Reference: TileRDDReproject.scala:39-260 (bufferTiles -> per-tile RasterizingReproject
warp -> re-tile into the destination layout). Our shape is shuffle-compact
instead of buffered: because nearest-neighbor assigns every destination pixel
center to exactly ONE source pixel (and both CRS transforms here are
per-axis monotone), each source tile can emit the destination sub-rect
patches it alone is responsible for — one decode pass, then the same
parts->paste merge the tiler uses. No 9x buffer explode, no overlap.

Pixel lookup uses GLOBAL source pixel indices floor((lon - xmin)/cell_w)
with the same expression text as the SQL oracle twin, so warped key
assignment and pixel values are hash-exact across engines (the only
transcendentals are the CRS formulas themselves, identical on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec
from ..cell import z2_encode
from ..grid import (
    Extent,
    LayoutDefinition,
    lnglat_to_webmercator,
    webmercator_to_lnglat,
)
from . import LAYER_SCHEMA

_PARTS = (
    "zoom int, col int, row int, cell long, part binary, py0 int, px0 int, "
    "ph int, pw int"
)


def _fwd(src_crs: str, dst_crs: str):
    # fast paths keep the contract queries' exact expression text
    if (src_crs, dst_crs) == ("latlng", "webmercator"):
        return lnglat_to_webmercator
    if (src_crs, dst_crs) == ("webmercator", "latlng"):
        return webmercator_to_lnglat
    # any other pair routes through the proj module (UTM, LCC, Albers,
    # polar stereographic, sinusoidal, proj strings — proj4 parity)
    from ..proj import transform_fn

    return transform_fn(src_crs, dst_crs)


_SEPARABLE = {("latlng", "webmercator"), ("webmercator", "latlng")}


def _dst_bbox(
    fwd, sext: Extent, dst_world: Extent, k: int = 9, pad_frac: float = 0.05
) -> Extent | None:
    """Footprint of a src tile in dst coords. Corners alone are exact only
    for per-axis monotone transforms (the latlng<->webmercator fast paths,
    which pass k=2/pad_frac=0 and keep their old exact-corner cost);
    conic/transverse projections bow tile edges, so sample the boundary and
    pad 5% — over-coverage is free (the per-pixel ownership mask drops
    foreign pixels), under-coverage would leave NaN holes."""
    ex = np.linspace(sext.xmin, sext.xmax, k)
    ey = np.linspace(sext.ymin, sext.ymax, k)
    bx = np.concatenate([ex, ex, np.full(k, sext.xmin), np.full(k, sext.xmax)])
    by = np.concatenate([np.full(k, sext.ymin), np.full(k, sext.ymax), ey, ey])
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        X, Y = fwd(bx, by)
    X, Y = np.asarray(X, np.float64), np.asarray(Y, np.float64)
    # +-inf means "beyond the dst world edge" (lat 90 -> WM infinity): clamp
    # into the world so the tile still covers up to the edge; NaN means
    # unprojectable (e.g. a far-hemisphere point) and is dropped
    X = np.clip(X, dst_world.xmin, dst_world.xmax)
    Y = np.clip(Y, dst_world.ymin, dst_world.ymax)
    ok = ~(np.isnan(X) | np.isnan(Y))
    if not ok.any():
        return None
    x0, x1 = float(X[ok].min()), float(X[ok].max())
    y0, y1 = float(Y[ok].min()), float(Y[ok].max())
    pad = pad_frac * max(x1 - x0, y1 - y0)
    box = Extent(
        max(x0 - pad, dst_world.xmin),
        max(y0 - pad, dst_world.ymin),
        min(x1 + pad, dst_world.xmax),
        min(y1 + pad, dst_world.ymax),
    )
    if box.width <= 0 or box.height <= 0:
        return None
    return box


def reproject_layer(
    layer: DataFrame,
    src_layout: LayoutDefinition,
    dst_layout: LayoutDefinition,
    dst_zoom: int,
    src_crs: str,
    dst_crs: str,
    method: str = "nearest",
) -> DataFrame:
    """Warp a tiled layer into a different CRS + layout. method='nearest'
    (the reference default) needs no buffering — every dst pixel maps into
    exactly one src tile. method='bilinear' uses the BufferTiles path
    (reproject_layer_bilinear): 1-px margins make the 4-tap gathers
    tile-local, exactly TileRDDReproject.scala's bufferedTile warp.
    Plan (both): decode pass emits per-(src tile, dst key) patches of
    inverse-mapped pixels -> one groupBy(dst key) paste."""
    if method == "bilinear":
        return reproject_layer_bilinear(
            layer, src_layout, dst_layout, dst_zoom, src_crs, dst_crs
        )
    if method != "nearest":
        raise ValueError(f"unsupported warp method {method!r}")
    fwd = _fwd(src_crs, dst_crs)
    inv = _fwd(dst_crs, src_crs)
    _bk, _bp = ((2, 0.0) if (src_crs, dst_crs) in _SEPARABLE else (9, 0.05))
    smt = src_layout.map_transform
    dmt = dst_layout.map_transform
    dtl = dst_layout.tile_layout
    th, tw = dtl.tile_rows, dtl.tile_cols
    # global source grid constants (identical text to the oracle SQL)
    sxmin, symax = src_layout.extent.xmin, src_layout.extent.ymax
    scw, sch = src_layout.cell_width, src_layout.cell_height
    stl = src_layout.tile_layout
    dst_world = dst_layout.extent

    def emit(it):
        for pdf in it:
            out = {k: [] for k in
                   ("zoom", "col", "row", "cell", "part", "py0", "px0", "ph", "pw")}
            for t in pdf.itertuples(index=False):
                src = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                col, row = int(t.col), int(t.row)
                sext = smt.extent_for_key(col, row)
                # src tile footprint in dst coords (boundary-sampled +
                # padded; non-finite images like lat = +-90 -> +-inf in WM
                # are dropped by the finite mask inside _dst_bbox)
                box = _dst_bbox(fwd, sext, dst_world, _bk, _bp)
                if box is None:
                    continue
                gb = dmt.gridbounds_for_extent(box)
                c0, c1 = max(gb.col_min, 0), min(gb.col_max, dtl.layout_cols - 1)
                r0, r1 = max(gb.row_min, 0), min(gb.row_max, dtl.layout_rows - 1)
                gx0, gy0 = col * stl.tile_cols, row * stl.tile_rows
                for dc in range(int(c0), int(c1) + 1):
                    for dr in range(int(r0), int(r1) + 1):
                        dext = dmt.extent_for_key(dc, dr)
                        dcw, dch = dext.width / tw, dext.height / th
                        cx = dext.xmin + (np.arange(tw) + 0.5) * dcw
                        cy = dext.ymax - (np.arange(th) + 0.5) * dch
                        lon, lat = inv(
                            np.broadcast_to(cx, (th, tw)).ravel(),
                            np.repeat(cy, tw),
                        )
                        # GLOBAL src pixel index — same floor text as SQL
                        sgx = np.floor((lon - sxmin) / scw).astype(np.int64)
                        sgy = np.floor((symax - lat) / sch).astype(np.int64)
                        sgx = sgx.reshape(th, tw)
                        sgy = sgy.reshape(th, tw)
                        mine = (
                            (sgx >= gx0) & (sgx < gx0 + stl.tile_cols)
                            & (sgy >= gy0) & (sgy < gy0 + stl.tile_rows)
                        )
                        if not mine.any():
                            continue
                        ys, xs = np.nonzero(mine)
                        wy0, wy1 = int(ys.min()), int(ys.max())
                        wx0, wx1 = int(xs.min()), int(xs.max())
                        # multiband tiles ((h, w, bands)) warp band-wise
                        # through the same gather: patch grows a band axis
                        # and the boolean scatter carries (n, bands) rows
                        pshape = (wy1 - wy0 + 1, wx1 - wx0 + 1) + src.shape[2:]
                        patch = np.full(pshape, np.nan)
                        sub = mine[wy0 : wy1 + 1, wx0 : wx1 + 1]
                        patch[sub] = src[
                            (sgy[wy0 : wy1 + 1, wx0 : wx1 + 1] - gy0)[sub],
                            (sgx[wy0 : wy1 + 1, wx0 : wx1 + 1] - gx0)[sub],
                        ]
                        out["zoom"].append(dst_zoom)
                        out["col"].append(dc)
                        out["row"].append(dr)
                        out["cell"].append(int(z2_encode(dc, dr)))
                        out["part"].append(codec.raw_encode(patch))
                        out["py0"].append(wy0)
                        out["px0"].append(wx0)
                        out["ph"].append(patch.shape[0])
                        out["pw"].append(patch.shape[1])
            yield pd.DataFrame(out)

    parts = layer.mapInPandas(emit, _PARTS)

    def paste(pdf: pd.DataFrame) -> pd.DataFrame:
        patches = [
            (codec.decode_tile(bytes(t.part), "raw"), int(t.py0), int(t.px0))
            for t in pdf.itertuples(index=False)
        ]
        nb = max(p.shape[2] if p.ndim == 3 else 0 for p, _, _ in patches)
        acc = np.full((th, tw, nb) if nb else (th, tw), np.nan)
        for patch, y0, x0 in patches:
            if nb and patch.ndim == 2:
                patch = patch[:, :, None]
            win = acc[y0 : y0 + patch.shape[0], x0 : x0 + patch.shape[1]]
            m = np.isnan(win) & ~np.isnan(patch)
            win[m] = patch[m]
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]], "tile": [codec.raw_encode(acc)],
                "h": [th], "w": [tw], "fmt": ["raw"],
            }
        )

    return parts.groupBy("zoom", "col", "row").applyInPandas(paste, LAYER_SCHEMA)


def reproject_layer_bilinear(
    layer: DataFrame,
    src_layout: LayoutDefinition,
    dst_layout: LayoutDefinition,
    dst_zoom: int,
    src_crs: str,
    dst_crs: str,
) -> DataFrame:
    """Bilinear warp via buffered tiles (TileRDDReproject.scala:84-121):
    bufferTiles(1) gives each src tile its 1-px margins, so every dst
    pixel whose top-left tap falls in this tile gathers all 4 taps
    locally. Ownership rule: dst pixel belongs to the src tile containing
    floor(fx), floor(fy) (the top-left tap), so patches never overlap.
    Taps outside the global grid clamp to the edge (resample_bilinear's
    clamping rule)."""
    from .focal import _assemble, buffer_parts

    fwd = _fwd(src_crs, dst_crs)
    inv = _fwd(dst_crs, src_crs)
    _bk, _bp = ((2, 0.0) if (src_crs, dst_crs) in _SEPARABLE else (9, 0.05))
    dmt = dst_layout.map_transform
    smt = src_layout.map_transform
    dtl = dst_layout.tile_layout
    th, tw = dtl.tile_rows, dtl.tile_cols
    sxmin, symax = src_layout.extent.xmin, src_layout.extent.ymax
    scw, sch = src_layout.cell_width, src_layout.cell_height
    stl = src_layout.tile_layout
    ncx, ncy = stl.layout_cols * stl.tile_cols, stl.layout_rows * stl.tile_rows
    dst_world = dst_layout.extent

    parts = buffer_parts(layer, 1)

    def warp_group(pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf, 1)
        empty = pd.DataFrame(
            {c: [] for c in
             ("zoom", "col", "row", "cell", "part", "py0", "px0", "ph", "pw")}
        )
        if asm is None:
            return empty
        buf, h, w = asm
        first = pdf.iloc[0]
        col, row = int(first["tcol"]), int(first["trow"])
        sext = smt.extent_for_key(col, row)
        box = _dst_bbox(fwd, sext, dst_world, _bk, _bp)
        if box is None:
            return empty
        gb = dmt.gridbounds_for_extent(box)
        gx0, gy0 = col * stl.tile_cols, row * stl.tile_rows
        rows_out = []
        for dc in range(max(gb.col_min, 0), min(gb.col_max, dtl.layout_cols - 1) + 1):
            for dr in range(max(gb.row_min, 0), min(gb.row_max, dtl.layout_rows - 1) + 1):
                dext = dmt.extent_for_key(dc, dr)
                dcw, dch = dext.width / tw, dext.height / th
                cx = dext.xmin + (np.arange(tw) + 0.5) * dcw
                cy = dext.ymax - (np.arange(th) + 0.5) * dch
                lon, lat = inv(
                    np.broadcast_to(cx, (th, tw)).ravel(), np.repeat(cy, tw)
                )
                fx = ((lon - sxmin) / scw - 0.5).reshape(th, tw)
                fy = ((symax - lat) / sch - 0.5).reshape(th, tw)
                # ownership by the grid-clamped top-left tap, so dst pixels
                # just outside the grid edge belong to the edge tile
                ix = np.clip(np.floor(fx).astype(np.int64), 0, ncx - 1)
                iy = np.clip(np.floor(fy).astype(np.int64), 0, ncy - 1)
                mine = (
                    (ix >= gx0) & (ix < gx0 + stl.tile_cols)
                    & (iy >= gy0) & (iy < gy0 + stl.tile_rows)
                )
                if not mine.any():
                    continue
                ys, xs = np.nonzero(mine)
                wy0, wy1 = int(ys.min()), int(ys.max())
                wx0, wx1 = int(xs.min()), int(xs.max())
                pshape = (wy1 - wy0 + 1, wx1 - wx0 + 1) + buf.shape[2:]
                patch = np.full(pshape, np.nan)
                sub = mine[wy0 : wy1 + 1, wx0 : wx1 + 1]
                sfx = fx[wy0 : wy1 + 1, wx0 : wx1 + 1][sub]
                sfy = fy[wy0 : wy1 + 1, wx0 : wx1 + 1][sub]
                # 4 taps, clamped to the GLOBAL grid then shifted into the
                # buffered array (margin offset +1); edge-of-world margins
                # are NaN in buf, but global clamping keeps taps in-grid
                tx0 = np.clip(np.floor(sfx).astype(np.int64), 0, ncx - 1)
                ty0 = np.clip(np.floor(sfy).astype(np.int64), 0, ncy - 1)
                tx1 = np.clip(tx0 + 1, 0, ncx - 1)
                ty1 = np.clip(ty0 + 1, 0, ncy - 1)
                wxf = np.clip(sfx - tx0, 0.0, 1.0)
                wyf = np.clip(sfy - ty0, 0.0, 1.0)
                bx0, bx1 = tx0 - gx0 + 1, tx1 - gx0 + 1
                by0, by1 = ty0 - gy0 + 1, ty1 - gy0 + 1
                if buf.ndim == 3:  # weights broadcast across bands
                    wxf, wyf = wxf[:, None], wyf[:, None]
                top = buf[by0, bx0] * (1 - wxf) + buf[by0, bx1] * wxf
                bot = buf[by1, bx0] * (1 - wxf) + buf[by1, bx1] * wxf
                patch[sub] = top * (1 - wyf) + bot * wyf
                rows_out.append(
                    (dst_zoom, dc, dr, int(z2_encode(dc, dr)),
                     codec.raw_encode(patch), wy0, wx0,
                     patch.shape[0], patch.shape[1])
                )
        if not rows_out:
            return empty
        return pd.DataFrame(
            rows_out,
            columns=["zoom", "col", "row", "cell", "part", "py0", "px0", "ph", "pw"],
        )

    warped = parts.groupBy("zoom", "tcol", "trow").applyInPandas(warp_group, _PARTS)

    def paste(pdf: pd.DataFrame) -> pd.DataFrame:
        patches = [
            (codec.decode_tile(bytes(t.part), "raw"), int(t.py0), int(t.px0))
            for t in pdf.itertuples(index=False)
        ]
        nb = max(p.shape[2] if p.ndim == 3 else 0 for p, _, _ in patches)
        acc = np.full((th, tw, nb) if nb else (th, tw), np.nan)
        for patch, y0, x0 in patches:
            if nb and patch.ndim == 2:
                patch = patch[:, :, None]
            win = acc[y0 : y0 + patch.shape[0], x0 : x0 + patch.shape[1]]
            m = np.isnan(win) & ~np.isnan(patch)
            win[m] = patch[m]
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]], "tile": [codec.raw_encode(acc)],
                "h": [th], "w": [tw], "fmt": ["raw"],
            }
        )

    return warped.groupBy("zoom", "col", "row").applyInPandas(paste, LAYER_SCHEMA)
