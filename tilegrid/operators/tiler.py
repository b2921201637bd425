"""Tiler: key assignment, CutTiles explode, tileToLayout merge.

Reference semantics reproduced:
  * point->key floor math (MapKeyTransform.scala:88-96) — pure Catalyst
    expressions (floor arithmetic), no UDF, so Tungsten codegen applies and
    the same formula is usable as oracle SQL.
  * extent->GridBounds with the N/W-inclusive / S/E-exclusive backoff rule
    (MapKeyTransform.scala:52-74) — also pure Catalyst expressions feeding
    `sequence()` + `explode()` (CutTiles.scala:45-57 key explode).
  * tileToLayout = CutTiles + merge duplicate keys
    (TilerMethods.scala:50-57, TileRDDMerge.scala:44-55): one shuffle,
    groupBy(zoom,col,row) + applyInPandas paste-all (deterministic merge
    order: sorted by source id — fixes the reference's float-associativity
    nondeterminism called out in SURVEY.md §7).

Scale notes: the explode amplifies rows by the tiles-per-image cover (1-4 for
point-placed images); the single shuffle hashes on (zoom,col,row). Hot cells
(skew knob in fixtures) are handled by AQE skew splitting at the groupBy and,
for extreme skew, by two-level merge (partial merge on salted keys, then
final merge) — see `tile_to_layout(salt_partials=...)`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_sql
from ..grid import Extent, LayoutDefinition
from ..tiles import nn_paste, nodata_mask_nan
from . import LAYER_SCHEMA


def key_exprs(layout: LayoutDefinition, x: str, y: str) -> tuple[str, str]:
    """SQL expressions for (col,row) of the tile containing point (x,y).
    Identical text runs in Spark SQL and DuckDB (oracle parity)."""
    e, tl = layout.extent, layout.tile_layout
    col = f"CAST(floor((({x}) - {e.xmin!r}) / {e.width!r} * {tl.layout_cols}) AS BIGINT)"
    row = f"CAST(floor(({e.ymax!r} - ({y})) / {e.height!r} * {tl.layout_rows}) AS BIGINT)"
    return col, row


def with_key_columns(
    df: DataFrame, layout: LayoutDefinition, x: str, y: str, zoom: int
) -> DataFrame:
    """Add zoom/col/row/cell columns for point rows — all JVM-side."""
    cx, rx = key_exprs(layout, x, y)
    return (
        df.withColumn("zoom", F.lit(zoom).cast("int"))
        .withColumn("col", F.expr(cx).cast("int"))
        .withColumn("row", F.expr(rx).cast("int"))
        .withColumn("cell", F.expr(z2_sql("col", "row", "spark")))
    )


def gridbounds_exprs(
    layout: LayoutDefinition, xmin: str, ymin: str, xmax: str, ymax: str
) -> dict[str, str]:
    """SQL expressions for the covering GridBounds of an extent, with the
    reference's exact backoff rules (MapKeyTransform.scala:52-74)."""
    e, tl = layout.extent, layout.tile_layout
    tw = e.width / tl.layout_cols
    th = e.height / tl.layout_rows
    col_min, row_min = key_exprs(layout, xmin, ymax)
    dcol = f"((({xmax}) - {e.xmin!r}) / {tw!r})"
    drow = f"(({e.ymax!r} - ({ymin})) / {th!r})"
    col_max = (
        f"CAST(CASE WHEN {dcol} = floor({dcol}) AND {dcol} <> ({col_min}) "
        f"THEN floor({dcol}) - 1 ELSE floor({dcol}) END AS BIGINT)"
    )
    row_max = (
        f"CAST(CASE WHEN {drow} = floor({drow}) AND {drow} <> ({row_min}) "
        f"THEN floor({drow}) - 1 ELSE floor({drow}) END AS BIGINT)"
    )
    return {"col_min": col_min, "row_min": row_min, "col_max": col_max, "row_max": row_max}


def with_extent_from_center(
    df: DataFrame, layout: LayoutDefinition, x: str, y: str, w: str = "w", h: str = "h"
) -> DataFrame:
    """Give each point-placed image a world extent: centered at (x,y), sized
    w x h pixels at this layout's resolution."""
    cw, ch = layout.cell_width, layout.cell_height
    return (
        df.withColumn("xmin", F.col(x) - F.col(w) * F.lit(cw) / 2)
        .withColumn("xmax", F.col(x) + F.col(w) * F.lit(cw) / 2)
        .withColumn("ymin", F.col(y) - F.col(h) * F.lit(ch) / 2)
        .withColumn("ymax", F.col(y) + F.col(h) * F.lit(ch) / 2)
    )


def explode_covering_keys(df: DataFrame, layout: LayoutDefinition, zoom: int) -> DataFrame:
    """CutTiles key explode: one output row per (input row x covering tile).
    Requires xmin/ymin/xmax/ymax columns. All JVM-side (sequence + explode),
    clipped to the layout grid."""
    tl = layout.tile_layout
    gb = gridbounds_exprs(layout, "xmin", "ymin", "xmax", "ymax")
    return (
        df.withColumn("_c0", F.greatest(F.expr(gb["col_min"]), F.lit(0)))
        .withColumn("_c1", F.least(F.expr(gb["col_max"]), F.lit(tl.layout_cols - 1)))
        .withColumn("_r0", F.greatest(F.expr(gb["row_min"]), F.lit(0)))
        .withColumn("_r1", F.least(F.expr(gb["row_max"]), F.lit(tl.layout_rows - 1)))
        .where("_c1 >= _c0 AND _r1 >= _r0")
        .withColumn("col", F.explode(F.expr("sequence(CAST(_c0 AS INT), CAST(_c1 AS INT))")))
        .withColumn("row", F.explode(F.expr("sequence(CAST(_r0 AS INT), CAST(_r1 AS INT))")))
        .withColumn("zoom", F.lit(zoom).cast("int"))
        .withColumn("cell", F.expr(z2_sql("col", "row", "spark")))
        .drop("_c0", "_c1", "_r0", "_r1")
    )


def tile_assignments(
    df: DataFrame, layout: LayoutDefinition, zoom: int, id_col: str = "image_id"
) -> DataFrame:
    """(id, zoom, col, row, cell) — which tiles each input raster covers.
    Pure Catalyst; this is the bitwise-parity surface for the tiler."""
    return explode_covering_keys(df, layout, zoom).select(
        id_col, "zoom", "col", "row", "cell"
    )


def cut_tiles(
    df: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    id_col: str = "image_id",
    out_fmt: str = "raw",
) -> DataFrame:
    """Paste each (input raster x covering key) into a fresh layout tile
    (CutTiles.scala:45-57). Input needs tile/fmt/xmin/ymin/xmax/ymax columns.
    Output: layer rows + id column, float64 raw tiles (NaN NoData) unless
    out_fmt='png' (uint8). One mapInPandas, no shuffle."""
    exploded = explode_covering_keys(df, layout, zoom)
    tsz_c, tsz_r = layout.tile_layout.tile_cols, layout.tile_layout.tile_rows
    mt = layout.map_transform
    out_schema = LAYER_SCHEMA + f", {id_col} string"

    def paste_batches(it):
        for pdf in it:
            out = {
                "zoom": [], "col": [], "row": [], "cell": [], "tile": [],
                "h": [], "w": [], "fmt": [], id_col: [],
            }
            for t in pdf.itertuples(index=False):
                src = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if src.ndim == 3:
                    src = codec.to_gray_f64(src)
                target = np.full((tsz_r, tsz_c), np.nan)
                text = mt.extent_for_key(int(t.col), int(t.row))
                nn_paste(
                    target, text, src,
                    Extent(t.xmin, t.ymin, t.xmax, t.ymax),
                    nodata_mask_nan,
                )
                if out_fmt == "png":
                    data = codec.png_encode(
                        np.where(np.isnan(target), 0, target).astype(np.uint8)
                    )
                else:
                    data = codec.raw_encode(target)
                out["zoom"].append(t.zoom)
                out["col"].append(t.col)
                out["row"].append(t.row)
                out["cell"].append(t.cell)
                out["tile"].append(data)
                out["h"].append(tsz_r)
                out["w"].append(tsz_c)
                out["fmt"].append(out_fmt)
                out[id_col].append(getattr(t, id_col))
            yield pd.DataFrame(out)

    cols = ["zoom", "col", "row", "cell", "tile", "fmt", "xmin", "ymin", "xmax", "ymax", id_col]
    return exploded.select(cols).mapInPandas(paste_batches, out_schema)


def merge_tiles_udf(id_col: str):
    """applyInPandas kernel merging all part-tiles of one key: sort by id for
    determinism, start from the first, fill NoData from the rest
    (TileRDDMerge.scala:44-55 + Tile.merge paste-where-NoData)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        acc = None
        for t, f in zip(pdf["tile"], pdf["fmt"]):
            arr = codec.decode_tile(bytes(t), f).astype(np.float64)
            if acc is None:
                acc = arr
            else:
                m = np.isnan(acc)
                acc[m] = arr[m]
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]], "tile": [codec.raw_encode(acc)],
                "h": [acc.shape[0]], "w": [acc.shape[1]], "fmt": ["raw"],
            }
        )

    return merge


def tile_to_layout(
    df: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    id_col: str = "image_id",
    repartition: int | None = None,
) -> DataFrame:
    """CutTiles + merge: the reference tiler (one shuffle on the key)."""
    parts = cut_tiles(df, layout, zoom, id_col=id_col, out_fmt="raw")
    if repartition:
        parts = parts.repartition(repartition, "cell")
    return parts.groupBy("zoom", "col", "row").applyInPandas(
        merge_tiles_udf(id_col), LAYER_SCHEMA
    )
