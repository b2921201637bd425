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
final merge) — see `tile_to_layout(hot_threshold=..., n_salt=...)`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_sql
from ..grid import Extent, LayoutDefinition
from ..tiles import nn_paste, nn_patch, nodata_mask_nan, paste_patch
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
    multiband: bool = False,
) -> DataFrame:
    """Paste each (input raster x covering key) into a fresh layout tile
    (CutTiles.scala:45-57). Input needs tile/fmt/xmin/ymin/xmax/ymax columns.
    Output: layer rows + id column, float64 raw tiles (NaN NoData) unless
    out_fmt='png' (uint8). multiband=True keeps (h, w, bands) arrays intact
    (MultibandTile.scala:54) instead of collapsing to luma. One mapInPandas,
    no shuffle."""
    return _paste_tiles(
        explode_covering_keys(df, layout, zoom), layout, id_col, out_fmt,
        multiband=multiband,
    )


def _paste_tiles(
    exploded: DataFrame,
    layout: LayoutDefinition,
    id_col: str = "image_id",
    out_fmt: str = "raw",
    extra_cols: tuple[str, ...] = (),
    multiband: bool = False,
) -> DataFrame:
    """The decode+paste half of CutTiles, over pre-exploded (row x key)
    rows — split out so skew routing can filter BEFORE the expensive
    decode pass. Passes id_col, _ord (when present), and extra_cols
    through."""
    tsz_c, tsz_r = layout.tile_layout.tile_cols, layout.tile_layout.tile_rows
    mt = layout.map_transform
    passthrough = [id_col]
    passthrough += [c for c in extra_cols if c not in passthrough]
    types = dict(zip(exploded.schema.fieldNames(), exploded.schema.fields))
    out_schema = LAYER_SCHEMA + "".join(
        f", {c} {types[c].dataType.simpleString()}" for c in passthrough
    )

    def paste_batches(it):
        for pdf in it:
            out = {
                k: []
                for k in ["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]
                + passthrough
            }
            for t in pdf.itertuples(index=False):
                src = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if src.ndim == 3 and not multiband:
                    src = codec.to_gray_f64(src)
                target = np.full((tsz_r, tsz_c) + src.shape[2:], np.nan)
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
                for c in passthrough:
                    out[c].append(getattr(t, c))
            yield pd.DataFrame(out)

    cols = (
        ["zoom", "col", "row", "cell", "tile", "fmt", "xmin", "ymin", "xmax", "ymax"]
        + passthrough
    )
    return exploded.select(cols).mapInPandas(paste_batches, out_schema)


_PARTS_BASE = (
    "zoom int, col int, row int, cell long, part binary, "
    "py0 int, px0 int, ph int, pw int"
)


def _cut_parts_direct(
    df: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    id_col: str,
    hot_bits: dict[tuple[int, int], int],
    multiband: bool = False,
) -> DataFrame:
    """Shuffle-compact CutTiles: ONE decode per source image (not per
    covering tile); covering keys enumerated in-UDF with the same
    vectorized gridbounds math the JVM explode uses. Emits only the
    NN-resampled sub-rectangle (part, py0, px0) per covering tile —
    ~tile_px/img_px less shuffle volume than full NoData-padded tiles.
    merge_salt = the top hot_bits[key] bits of the merge-order hash for hot
    keys (per-key salt width, sized to that key's part count), else 0."""
    import hashlib

    mt = layout.map_transform
    tl = layout.tile_layout
    tsz = (tl.tile_rows, tl.tile_cols)
    out_schema = _PARTS_BASE + f", {id_col} string, merge_ord long, merge_salt int"
    cols_out = [
        "zoom", "col", "row", "cell", "part", "py0", "px0", "ph", "pw",
        id_col, "merge_ord", "merge_salt",
    ]

    def run(it):
        from ..cell import z2_encode

        for pdf in it:
            c0, r0, c1, r1 = mt.gridbounds_for_extents(
                pdf["xmin"].values, pdf["ymin"].values,
                pdf["xmax"].values, pdf["ymax"].values,
            )
            c0 = np.maximum(c0, 0)
            r0 = np.maximum(r0, 0)
            c1 = np.minimum(c1, tl.layout_cols - 1)
            r1 = np.minimum(r1, tl.layout_rows - 1)
            out = {k: [] for k in cols_out}
            for i, t in enumerate(pdf.itertuples(index=False)):
                if c1[i] < c0[i] or r1[i] < r0[i]:
                    continue
                # keep the source's native dtype: uint8 patches are 8x
                # smaller to encode/shuffle than f64 and paste upcasts
                # losslessly into the f64 NaN-NoData accumulator
                src = codec.decode_tile(bytes(t.tile), t.fmt)
                if src.ndim == 3 and not multiband:
                    src = codec.to_gray_f64(src)
                src_ext = Extent(t.xmin, t.ymin, t.xmax, t.ymax)
                rid = getattr(t, id_col)
                # THE canonical merge-order key (single definition): 60-bit
                # md5-prefix hash of the id. The fold sorts by (merge_ord, id)
                # — hash order, not raw id order — so salt buckets (top bits
                # of merge_ord) are contiguous fold segments and the salted
                # two-phase fold is bit-identical to the global fold.
                ordv = int(hashlib.md5(str(rid).encode()).hexdigest()[:15], 16)
                for col in range(int(c0[i]), int(c1[i]) + 1):
                    for row in range(int(r0[i]), int(r1[i]) + 1):
                        got = nn_patch(tsz, mt.extent_for_key(col, row), src, src_ext)
                        if got is None:
                            continue
                        y0, x0, patch = got
                        out["zoom"].append(zoom)
                        out["col"].append(col)
                        out["row"].append(row)
                        out["cell"].append(int(z2_encode(col, row)))
                        out["part"].append(
                            codec.raw_encode(np.ascontiguousarray(patch))
                        )
                        out["py0"].append(y0)
                        out["px0"].append(x0)
                        out["ph"].append(patch.shape[0])
                        out["pw"].append(patch.shape[1])
                        out[id_col].append(rid)
                        out["merge_ord"].append(ordv)
                        bits = hot_bits.get((col, row), 0)
                        out["merge_salt"].append(
                            (ordv >> (60 - bits)) if bits else 0
                        )
            yield pd.DataFrame(out)

    cols_in = ["tile", "fmt", "xmin", "ymin", "xmax", "ymax", id_col]
    return df.select(cols_in).mapInPandas(run, out_schema)


def _assemble_udf(layout: LayoutDefinition, id_col: str):
    """applyInPandas kernel assembling one (key, salt) partial tile from its
    parts: fold in canonical (merge_ord, id) order, first-defined-wins per
    pixel (TileRDDMerge.scala:44-55 + Tile.merge paste-where-NoData).
    Band count comes from the first decoded part (single- and multiband
    parts share this kernel)."""
    tr, tc = layout.tile_layout.tile_rows, layout.tile_layout.tile_cols

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["merge_ord", id_col])
        acc = None
        for t in pdf.itertuples(index=False):
            y0, x0 = int(t.py0), int(t.px0)
            # first-defined-wins fold: a part whose window is already fully
            # defined is a no-op — skip its DECODE entirely (exact; this is
            # what bounds hot-cell folds where thousands of images stack on
            # the same window)
            if acc is not None:
                win = acc[y0 : y0 + int(t.ph), x0 : x0 + int(t.pw)]
                if not np.isnan(win).any():
                    continue
            patch = codec.decode_tile(bytes(t.part), "raw")
            if acc is None:
                acc = np.full((tr, tc) + patch.shape[2:], np.nan)
            paste_patch(acc, y0, x0, patch, nodata_mask_nan)
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]], "tile": [codec.raw_encode(acc)],
                "h": [tr], "w": [tc], "fmt": ["raw"],
                "merge_salt": [first["merge_salt"]],
            }
        )

    return merge


def _merge_salted_udf():
    """Final pass: fold the per-salt partial tiles in ascending salt order
    (== ascending canonical order, since salt is the hash top bits — see
    the canonical order key in _cut_parts_direct). Single-partial groups
    (all cold keys) pass through
    without a decode/encode round trip."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]
        if len(pdf) == 1:
            return pdf[out_cols]
        pdf = pdf.sort_values("merge_salt")
        acc = None
        for t, f in zip(pdf["tile"], pdf["fmt"]):
            arr = codec.decode_tile(bytes(t), f).astype(np.float64)
            if acc is None:
                acc = arr
            else:
                m = np.isnan(acc)
                acc[m] = arr[m]
            if not np.isnan(acc).any():
                break  # exact: first-wins fold is saturated
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
    hot_threshold: int | None = 512,
    n_salt: int = 256,
    multiband: bool = False,
) -> DataFrame:
    """CutTiles + merge: the reference tiler with explicit hot-cell skew
    splitting, which the reference lacks (SpacePartitioner degrades to
    modulo on overflow, partition/SpacePartitioner.scala:47-52; the north
    rule requires explicit splitting).

    Shape: census (pure-Catalyst count over the key explode, no decode) ->
    one decode pass emitting compact sub-rect parts with merge_salt (top
    per-key-sized bits of the canonical merge-order hash for hot keys, 0
    otherwise) -> partial merge per (key, salt) -> final fold per key in
    salt order. Because salt buckets are contiguous in the canonical
    (merge_ord, id) fold order, the two-phase result is bit-identical to a
    single global fold. Cold keys have exactly one partial and pass through
    the final stage untouched. hot_threshold=None skips the census (every
    key cold). n_salt caps the per-key bucket count (power of two)."""
    hot_bits: dict[tuple[int, int], int] = {}
    cap_bits = max(1, int(n_salt - 1).bit_length()) if n_salt > 1 else 1
    if hot_threshold is not None:
        exploded = explode_covering_keys(df, layout, zoom)
        counts = exploded.groupBy("col", "row").count()
        hot_rows = counts.where(F.col("count") > hot_threshold).collect()
        # per-key salt width: ~hot_threshold parts per partial, power of
        # two, capped at n_salt buckets — a single global width sized to the
        # worst cell would shatter every mildly-hot key into hundreds of
        # near-empty partials (full-tile encodes each: measured 100x output
        # amplification at 1.6M images)
        for r in hot_rows:
            need = -(-int(r["count"]) // hot_threshold)
            hot_bits[(int(r["col"]), int(r["row"]))] = min(
                cap_bits, max(1, (need - 1).bit_length())
            )
    parts = _cut_parts_direct(df, layout, zoom, id_col, hot_bits, multiband)
    if repartition:
        parts = parts.repartition(repartition, "cell")
    partials = parts.groupBy("zoom", "col", "row", "merge_salt").applyInPandas(
        _assemble_udf(layout, id_col), LAYER_SCHEMA + ", merge_salt int"
    )
    return partials.groupBy("zoom", "col", "row").applyInPandas(
        _merge_salted_udf(), LAYER_SCHEMA
    )
