"""Raster <- vector: scanline polygon rasterizer, rasterize-to-layer,
kernel density (point -> raster aggregation).

Reference: Rasterizer/PolygonRasterizer (raster/.../rasterize/
Rasterizer.scala:61-130, polygon/PolygonRasterizer.scala:35-392) and
RDDKernelDensity (spark/.../density/RDDKernelDensity.scala:72-177).

Inclusion rule: pixel-center-in-polygon (PixelIsPoint), implemented as a
vectorized even-odd scanline: per pixel row, x-intersections of the ring
edges with the row's center line, then np.searchsorted parity fill — exactly
equivalent to ray casting at every pixel center but O(rows x edges) instead
of O(pixels x edges).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_decode, z2_encode  # noqa: F401
from ..geometry import wkb_decode
from ..grid import Extent, LayoutDefinition
from . import LAYER_SCHEMA


def scanline_rasterize(
    rings: list[np.ndarray], ext: Extent, cols: int, rows: int,
    pixel_is_area: bool = False,
) -> np.ndarray:
    """Boolean mask via scanline even-odd fill at pixel centers
    (PixelIsPoint, the reference default). `pixel_is_area=True` gives the
    reference's PixelIsArea / includePartial option
    (PolygonRasterizer.runsArea, polygon/PolygonRasterizer.scala:181-226):
    a pixel burns when the polygon covers ANY part of it. Construction: a
    partially-covered pixel necessarily meets the polygon BOUNDARY (and a
    fully-covered one contains its own center), so the area mask is the
    center mask ∪ the supercover of every ring — exact for solid and holed
    polygons (a pixel wholly inside a hole hits neither)."""
    if pixel_is_area:
        mask = scanline_rasterize(rings, ext, cols, rows)
        for ring in rings:
            closed = np.vstack([ring, ring[:1]])
            mask |= rasterize_line(closed, ext, cols, rows)
        return mask
    cw, ch = ext.width / cols, ext.height / rows
    ys = ext.ymax - (np.arange(rows) + 0.5) * ch
    mask = np.zeros((rows, cols), dtype=bool)
    cxs = ext.xmin + (np.arange(cols) + 0.5) * cw
    for ring in rings:
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for r in range(rows):
            y = ys[r]
            crosses = (y1 > y) != (y2 > y)
            if not crosses.any():
                continue
            xi = x1[crosses] + (y - y1[crosses]) * (x2[crosses] - x1[crosses]) / (
                y2[crosses] - y1[crosses]
            )
            xi.sort()
            # parity of intersections strictly RIGHT of the pixel center —
            # matches ray casting's `px < xint` rule exactly (including
            # centers that fall on an edge), geometry.points_in_ring
            parity = (len(xi) - np.searchsorted(xi, cxs, side="right")) % 2
            mask[r] ^= parity.astype(bool)
    return mask


def rasterize_line(
    coords: np.ndarray, ext: Extent, cols: int, rows: int
) -> np.ndarray:
    """Boolean mask of every cell a polyline passes through (supercover
    grid traversal — the reference's Rasterizer.foreachCellByLineString,
    raster/.../rasterize/Rasterizer.scala line dispatch via
    polygon/LineRasterizer traversal). Vectorized per segment: collect the
    parametric t of every integer x- and y-grid crossing, sort, and floor
    the midpoints of consecutive spans to cell indices — each span lies in
    exactly one cell."""
    coords = np.asarray(coords, np.float64)
    cw, ch = ext.width / cols, ext.height / rows
    # continuous pixel coordinates (x right, y down)
    px = (coords[:, 0] - ext.xmin) / cw
    py = (ext.ymax - coords[:, 1]) / ch
    mask = np.zeros((rows, cols), dtype=bool)
    for i in range(len(coords) - 1):
        x0, y0, x1, y1 = px[i], py[i], px[i + 1], py[i + 1]
        dx, dy = x1 - x0, y1 - y0
        ts = [np.array([0.0, 1.0])]
        if dx != 0.0:
            kx = np.arange(math.ceil(min(x0, x1)), math.floor(max(x0, x1)) + 1)
            ts.append((kx - x0) / dx)
        if dy != 0.0:
            ky = np.arange(math.ceil(min(y0, y1)), math.floor(max(y0, y1)) + 1)
            ts.append((ky - y0) / dy)
        t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
        tm = (t[:-1] + t[1:]) / 2.0
        cx = np.floor(x0 + tm * dx).astype(np.int64)
        cy = np.floor(y0 + tm * dy).astype(np.int64)
        ok = (cx >= 0) & (cx < cols) & (cy >= 0) & (cy < rows)
        mask[cy[ok], cx[ok]] = True
        # a zero-length segment (or endpoint exactly on the grid) still
        # burns its own cell
        exi, eyi = int(np.floor(x0)), int(np.floor(y0))
        if 0 <= exi < cols and 0 <= eyi < rows:
            mask[eyi, exi] = True
    exi = int(np.floor(px[-1])) if len(px) else -1
    eyi = int(np.floor(py[-1])) if len(py) else -1
    if 0 <= exi < cols and 0 <= eyi < rows:
        mask[eyi, exi] = True
    return mask


def rasterize_to_layer(
    polygons: pd.DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    spark,
    value_col: str = "zone",
    id_col: str = "polygon_id",
    wkb_col: str = "wkb",
    pixel_is_area: bool = False,
) -> DataFrame:
    """Burn polygons into a tile layer (rasterizeWithValue): polygon ->
    covering cells (driver), explode, per-tile scanline burn, merge overlaps
    by last-id-wins (deterministic). `pixel_is_area` selects the
    includePartial inclusion rule (Rasterizer Options / PixelIsArea)."""
    from ..cell import cover_polygon

    rows = []
    for t in polygons.itertuples(index=False):
        rings = wkb_decode(bytes(getattr(t, wkb_col)))
        for c in cover_polygon(layout, rings):
            rows.append(
                {
                    id_col: getattr(t, id_col),
                    "wkb": getattr(t, wkb_col),
                    "value": float(getattr(t, value_col)),
                    "cell": int(c),
                }
            )
    exploded = spark.createDataFrame(pd.DataFrame(rows))
    mt = layout.map_transform
    tc, tr = layout.tile_layout.tile_cols, layout.tile_layout.tile_rows

    def burn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        cell = int(pdf.iloc[0]["cell"])
        col, row = (int(v) for v in z2_decode(cell))
        ext = mt.extent_for_key(col, row)
        out = np.full((tr, tc), np.nan)
        for t in pdf.itertuples(index=False):
            rings = wkb_decode(bytes(t.wkb))
            m = scanline_rasterize(rings, ext, tc, tr,
                                   pixel_is_area=pixel_is_area)
            out[m] = t.value
        return pd.DataFrame(
            {
                "zoom": [zoom], "col": [col], "row": [row], "cell": [cell],
                "tile": [codec.raw_encode(out)], "h": [tr], "w": [tc], "fmt": ["raw"],
            }
        )

    return exploded.groupBy("cell").applyInPandas(burn, LAYER_SCHEMA)


def kernel_density(
    points: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    kernel: np.ndarray,
    x: str = "x",
    y: str = "y",
    group_cols: tuple[str, ...] = (),
    weight: str | None = None,
    stat: str = "sum",
) -> DataFrame:
    """RDDKernelDensity (density/RDDKernelDensity.scala:72-177): each point
    explodes to every tile its kernel footprint touches (computed in
    Catalyst from the kernel radius), tiles stamp+sum their points in one
    groupBy — the canonical point->raster aggregation. group_cols adds
    extra grouping dimensions (e.g. a day column -> one raster per
    (key, day): the SpaceTimeKey batch layout). `weight` names a per-point
    value column (stamp is kernel * w; default 1). stat='sum' accumulates
    stamps (the density path); stat='max' takes the pixelwise maximum
    stamp instead — ORDER-INDEPENDENT, so it stays bit-deterministic for
    arbitrary float weights (sums of arbitrary floats are not); pixels no
    stamp touches are NoData (NaN) rather than 0."""
    from .tiler import explode_covering_keys

    if stat not in ("sum", "max"):
        raise ValueError(f"stat must be 'sum' or 'max', got {stat!r}")
    kr_y, kr_x = kernel.shape[0] // 2, kernel.shape[1] // 2
    cw, ch = layout.cell_width, layout.cell_height
    rx, ry = kr_x * cw, kr_y * ch
    df = (
        points.withColumn("xmin", F.col(x) - F.lit(rx))
        .withColumn("xmax", F.col(x) + F.lit(rx))
        .withColumn("ymin", F.col(y) - F.lit(ry))
        .withColumn("ymax", F.col(y) + F.lit(ry))
    )
    carry = (x, y) + ((weight,) if weight else ())
    exploded = explode_covering_keys(df, layout, zoom).select(
        "zoom", "col", "row", "cell", *carry, *group_cols
    )
    mt = layout.map_transform
    tc, tr = layout.tile_layout.tile_cols, layout.tile_layout.tile_rows
    types = dict(zip(exploded.schema.fieldNames(), exploded.schema.fields))
    out_schema = LAYER_SCHEMA + "".join(
        f", {c} {types[c].dataType.simpleString()}" for c in group_cols
    )

    def stamp(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        col, row = int(first["col"]), int(first["row"])
        ext = mt.extent_for_key(col, row)
        out = np.zeros((tr, tc)) if stat == "sum" else np.full((tr, tc), -np.inf)
        # pixel index of each point's center within this tile's grid
        px = np.floor((pdf[x].values - ext.xmin) / cw).astype(np.int64)
        py = np.floor((ext.ymax - pdf[y].values) / ch).astype(np.int64)
        ws = pdf[weight].values if weight else np.ones(len(pdf))
        for cx_, cy_, w_ in zip(px, py, ws):
            y0, y1 = cy_ - kr_y, cy_ + kr_y + 1
            x0, x1 = cx_ - kr_x, cx_ + kr_x + 1
            ky0, kx0 = max(0, -y0), max(0, -x0)
            ty0, tx0 = max(0, y0), max(0, x0)
            ty1, tx1 = min(tr, y1), min(tc, x1)
            if ty1 <= ty0 or tx1 <= tx0:
                continue
            k = kernel[ky0 : ky0 + (ty1 - ty0), kx0 : kx0 + (tx1 - tx0)]
            patch = k if w_ == 1.0 else k * w_
            if stat == "sum":
                out[ty0:ty1, tx0:tx1] += patch
            else:
                np.maximum(out[ty0:ty1, tx0:tx1], patch, out=out[ty0:ty1, tx0:tx1])
        if stat == "max":
            out[~np.isfinite(out)] = np.nan
        row_out = {
            "zoom": [int(first["zoom"])], "col": [col], "row": [row],
            "cell": [int(first["cell"])], "tile": [codec.raw_encode(out)],
            "h": [tr], "w": [tc], "fmt": ["raw"],
        }
        for c in group_cols:
            row_out[c] = [first[c]]
        return pd.DataFrame(row_out)

    if not group_cols:
        return exploded.groupBy("zoom", "col", "row").applyInPandas(
            stamp, out_schema
        )

    # One Spark group per SPATIAL key, time slices sub-grouped in pandas:
    # applyInPandas costs ~ms of Arrow/pandas setup per group, so grouping
    # on (key x slice) pays it n_slices times per tile (1920 groups ~= 8 s
    # at sf0.1); per-key grouping pays it once and loops slices in-process.
    # All slices of one key land in one task — fine while slices/key stays
    # modest (tiles are small); extreme slice counts would re-split here.
    def stamp_slices(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [
            stamp(sub)
            for _, sub in pdf.groupby(list(group_cols), sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    return exploded.groupBy("zoom", "col", "row").applyInPandas(
        stamp_slices, out_schema
    )
