"""Layer reshaping: crop, mask, merge, split, stitch, zoom resample,
histogram equalization / matching.

Reference: spark/.../crop/Crop.scala:30-70, mask/Mask.scala:70-139,
merge/TileRDDMerge.scala:28-43, resample/ZoomResample.scala:28-120,
stitch/StitchRDDMethods.scala:30-55,
equalization/RDDHistogramEqualization.scala:44-120.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_encode
from ..geometry import polygon_contains_extent, wkb_decode
from ..grid import Extent, GridBounds, LayoutDefinition
from . import KEY_COLS, LAYER_SCHEMA
from .rasterize import scanline_rasterize


def crop(layer: DataFrame, ext: Extent, layout: LayoutDefinition) -> DataFrame:
    """Drop tiles outside the extent, NoData-out pixels outside it on
    boundary tiles (Crop.scala:30-70)."""
    gb = layout.map_transform.gridbounds_for_extent(ext)
    filtered = layer.where(
        (F.col("col") >= gb.col_min) & (F.col("col") <= gb.col_max)
        & (F.col("row") >= gb.row_min) & (F.col("row") <= gb.row_max)
    )
    mt = layout.map_transform

    def run(it):
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                text = mt.extent_for_key(int(t.col), int(t.row))
                inter = text.intersection(ext)
                if inter is None:
                    arr[:] = np.nan
                elif inter != text:
                    h, w = arr.shape[:2]
                    cw, ch = text.width / w, text.height / h
                    cx = text.xmin + (np.arange(w) + 0.5) * cw
                    cy = text.ymax - (np.arange(h) + 0.5) * ch
                    outside = (
                        (cx[None, :] < ext.xmin) | (cx[None, :] > ext.xmax)
                        | (cy[:, None] < ext.ymin) | (cy[:, None] > ext.ymax)
                    )
                    arr[outside] = np.nan
                tiles.append(codec.raw_encode(arr))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return filtered.mapInPandas(run, LAYER_SCHEMA)


def mask(layer: DataFrame, rings: list[np.ndarray], layout: LayoutDefinition) -> DataFrame:
    """NoData-out pixels not covered by the polygon; prefilter tiles by cell
    cover (Mask.scala:70-139)."""
    from ..cell import cover_polygon

    cells = [int(c) for c in cover_polygon(layout, rings)]
    filtered = layer.where(F.col("cell").isin(cells)) if cells else layer.limit(0)
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast([r.tolist() for r in rings])
    mt = layout.map_transform

    def run(it):
        rr = [np.asarray(r) for r in bc.value]
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                text = mt.extent_for_key(int(t.col), int(t.row))
                if not polygon_contains_extent(rr, text):
                    h, w = arr.shape[:2]
                    m = scanline_rasterize(rr, text, w, h)
                    arr[~m] = np.nan
                tiles.append(codec.raw_encode(arr))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return filtered.mapInPandas(run, LAYER_SCHEMA)


def merge_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Mosaic: full-outer join on keys; where both exist, b fills a's NoData
    (TileRDDMerge.scala:28-43)."""
    right = b.select(
        *KEY_COLS, F.col("cell").alias("cell_b"), F.col("tile").alias("tile_b"),
        F.col("fmt").alias("fmt_b"), F.col("h").alias("h_b"), F.col("w").alias("w_b"),
    )
    joined = a.join(right, KEY_COLS, "full")

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            for t in pdf.itertuples(index=False):
                if t.tile is None:
                    arr = codec.decode_tile(bytes(t.tile_b), t.fmt_b).astype(np.float64)
                    h, w, cell = int(t.h_b), int(t.w_b), int(t.cell_b)
                else:
                    arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                    h, w, cell = int(t.h), int(t.w), int(t.cell)
                    if t.tile_b is not None:
                        other = codec.decode_tile(bytes(t.tile_b), t.fmt_b).astype(np.float64)
                        m = np.isnan(arr)
                        arr[m] = other[m]
                rows["zoom"].append(int(t.zoom))
                rows["col"].append(int(t.col))
                rows["row"].append(int(t.row))
                rows["cell"].append(cell)
                rows["tile"].append(codec.raw_encode(arr))
                rows["h"].append(h)
                rows["w"].append(w)
                rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, LAYER_SCHEMA)


def stitch(layer: DataFrame) -> tuple[np.ndarray, GridBounds]:
    """Collect a (bounded!) layer to one driver-side array
    (StitchRDDMethods.scala:30-55) — test/debug utility."""
    pdf = layer.toPandas()
    tiles = {
        (int(r["col"]), int(r["row"])): codec.decode_tile(bytes(r["tile"]), r["fmt"])
        .astype(np.float64)
        for _, r in pdf.iterrows()
    }
    from ..oracle import stitch as _st

    return _st(tiles)


def zoom_resample(
    layer: DataFrame, from_zoom: int, to_zoom: int, method: str = "nearest"
) -> DataFrame:
    """Zoom z -> higher zoom z' by key arithmetic + per-tile upsample
    (ZoomResample.scala:28-120): each source tile explodes into 4^(dz)
    children. method selects the resample kernel (Resample.scala:25-36):
    nearest (default), bilinear, cubic, lanczos — all edge-clamped within
    the source tile, matching the reference's per-tile resample."""
    from ..tiles import RESAMPLERS

    dz = to_zoom - from_zoom
    if dz <= 0:
        raise ValueError("to_zoom must be > from_zoom")
    n = 1 << dz
    resample = RESAMPLERS[method]

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = arr.shape
                sub_h, sub_w = h // n, w // n
                for dy in range(n):
                    for dx in range(n):
                        block = arr[
                            dy * sub_h : (dy + 1) * sub_h, dx * sub_w : (dx + 1) * sub_w
                        ]
                        up = resample(block, h, w)
                        c, r = int(t.col) * n + dx, int(t.row) * n + dy
                        rows["zoom"].append(to_zoom)
                        rows["col"].append(c)
                        rows["row"].append(r)
                        rows["cell"].append(int(z2_encode(c, r)))
                        rows["tile"].append(codec.raw_encode(up))
                        rows["h"].append(h)
                        rows["w"].append(w)
                        rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return layer.mapInPandas(run, LAYER_SCHEMA)


# distinct-value cap for the fused single-action stat path; above it the
# legacy min/max + bucket-count actions run instead (exactness, not a
# sample). 2^16 rows ~ 1 MB collected — trivial, and uint8/uint16 imagery
# (the corpus) sits far below it.
_VALUE_FAST_CAP = 65536

# instrumentation: stat ACTIONS run by the most recent
# histogram_equalization / histogram_matching call (1 = fused fast path,
# 2 = high-cardinality fallback); tests pin the fast path on uint8 layers
LAST_STAT_ACTIONS: list[int] = [0]


def _transfer_stats(layer: DataFrame, num_buckets: int):
    """(lo, hi, bucket_of, cdf) for the equalization/matching transfer in
    ONE stat action when the layer's distinct-value count is small —
    matching the reference's two-action shape
    (RDDHistogramEqualization.scala:44-120: one histogram aggregate, then
    the lazy transfer). The single pass emits per-partition EXACT value
    counts; the driver derives min/max from the value set and re-buckets
    the counts with the same floor rule, so lo/hi/cdf — and therefore the
    output bits — are identical to the legacy min/max + bucket-count
    3-action path, which remains the fallback above _VALUE_FAST_CAP
    distinct values (continuous float rasters)."""

    def count_values(it):
        acc: dict[float, int] = {}
        over = False
        for pdf in it:
            for t in pdf.itertuples(index=False):
                if over:
                    break
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                v = arr[~np.isnan(arr)]
                if not v.size:
                    continue
                vals, cnts = np.unique(v, return_counts=True)
                for val, c in zip(vals.tolist(), cnts.tolist()):
                    acc[val] = acc.get(val, 0) + c
                if len(acc) > _VALUE_FAST_CAP:
                    over = True
        if over:
            yield pd.DataFrame({"value": [0.0], "n": np.int64([-1])})
        else:
            yield pd.DataFrame(
                {"value": list(acc.keys()),
                 "n": np.asarray(list(acc.values()), dtype=np.int64)})

    rows = (
        layer.mapInPandas(count_values, "value double, n long")
        .groupBy("value").agg(F.sum("n").alias("n")).collect()
    )
    overflow = any(int(r["n"]) < 0 for r in rows) or len(rows) > _VALUE_FAST_CAP
    if not overflow and rows:
        LAST_STAT_ACTIONS[0] = 1
        vals = np.asarray([float(r["value"]) for r in rows])
        cnts = np.asarray([int(r["n"]) for r in rows], dtype=np.int64)
        lo, hi = float(vals.min()), float(vals.max())
        if hi <= lo:
            hi = lo + 1.0

        def bucket_of(arr: np.ndarray) -> np.ndarray:
            return (
                np.floor((arr - lo) / (hi - lo) * num_buckets)
                .clip(0, num_buckets - 1)
                .astype(np.int64)
            )

        counts = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(counts, bucket_of(vals), cnts)
        cdf = np.cumsum(counts).astype(np.float64)
        cdf = cdf / cdf[-1] if cdf[-1] > 0 else cdf
        return lo, hi, bucket_of, cdf
    # legacy path: exact at any cardinality, two stat actions
    from .summary import min_max

    LAST_STAT_ACTIONS[0] = 2
    mm = min_max(layer).collect()[0]
    lo, hi = float(mm["vmin"]), float(mm["vmax"])
    if hi <= lo:
        hi = lo + 1.0
    bucket_of, cdf = _bucket_cdf(layer, lo, hi, num_buckets)
    return lo, hi, bucket_of, cdf


def _bucket_cdf(layer: DataFrame, lo: float, hi: float, num_buckets: int):
    """Floor-rule bucket CDF of a layer: cdf[b] = P(bucket(v) <= b) with
    bucket(v) = clip(floor((v-lo)/(hi-lo)*nb), 0, nb-1). Shared by the
    equalization/matching transfer passes; exact rational arithmetic."""

    def bucket_of(arr: np.ndarray) -> np.ndarray:
        return (
            np.floor((arr - lo) / (hi - lo) * num_buckets)
            .clip(0, num_buckets - 1)
            .astype(np.int64)
        )

    def count_buckets(it):
        for pdf in it:
            acc = np.zeros(num_buckets, dtype=np.int64)
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                v = arr[~np.isnan(arr)]
                if v.size:
                    acc += np.bincount(bucket_of(v), minlength=num_buckets)
            yield pd.DataFrame({"bucket": np.arange(num_buckets), "n": acc})

    rows = (
        layer.mapInPandas(count_buckets, "bucket int, n long")
        .groupBy("bucket").agg(F.sum("n").alias("n")).collect()
    )
    counts = np.zeros(num_buckets, dtype=np.int64)
    for r in rows:
        counts[int(r["bucket"])] = int(r["n"])
    cdf = np.cumsum(counts).astype(np.float64)
    cdf = cdf / cdf[-1] if cdf[-1] > 0 else cdf
    return bucket_of, cdf


def histogram_matching(
    layer: DataFrame,
    target_values: list[float],
    target_cdf: list[float],
    num_buckets: int = 256,
) -> DataFrame:
    """Histogram matching (RDDHistogramMatching.scala:30-120): map each
    pixel to the target distribution's inverse CDF at the pixel's source
    quantile. target_values/target_cdf describe the target's piecewise-
    linear CDF (cdf[0] = 0 .. cdf[-1] = 1). The source quantile uses the
    floor-rule bucket CDF; segment slopes are precomputed once so engine
    and SQL oracle share identical literals — the whole transfer is exact
    rational arithmetic. Stats come from _transfer_stats: one fused stat
    action on discrete imagery, legacy two-action fallback above the
    cardinality cap — bit-identical either way."""
    tv = np.asarray(target_values, dtype=np.float64)
    tc = np.asarray(target_cdf, dtype=np.float64)
    slopes = (tv[1:] - tv[:-1]) / (tc[1:] - tc[:-1])
    layer = layer.persist()  # stat action(s) + transfer read the cache
    lo, hi, bucket_of, cdf = _transfer_stats(layer, num_buckets)
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast((cdf.tolist(), tv.tolist(), tc.tolist(), slopes.tolist()))

    def run(it):
        cdf_l, tv_l, tc_l, sl_l = bc.value
        cdf_a, tv_a, tc_a, sl_a = (np.asarray(a) for a in (cdf_l, tv_l, tc_l, sl_l))
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                out = np.full_like(arr, np.nan)
                ok = ~np.isnan(arr)
                q = cdf_a[bucket_of(arr[ok])]
                j = np.clip(
                    np.searchsorted(tc_a, q, side="right") - 1, 0, len(sl_a) - 1
                )
                out[ok] = tv_a[j] + (q - tc_a[j]) * sl_a[j]
                tiles.append(codec.raw_encode(out))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def sigmoidal_contrast(
    layer: DataFrame, alpha: float = 0.5, beta: float = 6.0
) -> DataFrame:
    """Sigmoidal contrast stretch (RDDSigmoidalContrast.scala:41-80 /
    the GDAL formula): normalize to [0,1] over the layer min/max, apply
    sig(x) = 1/(1+exp(beta*(alpha-x))) rescaled so sig(0)->0, sig(1)->1,
    then map back to [min, max]. exp is transcendental -> pair with a
    rounded oracle."""
    from .summary import min_max

    layer = layer.persist()  # 2 passes: min/max, transfer
    mm = min_max(layer).collect()[0]
    lo, hi = float(mm["vmin"]), float(mm["vmax"])
    if hi <= lo:
        hi = lo + 1.0

    def run(it):
        y0 = 1.0 / (1.0 + np.exp(beta * alpha))
        y1 = 1.0 / (1.0 + np.exp(beta * (alpha - 1.0)))
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                x = (arr - lo) / (hi - lo)
                y = 1.0 / (1.0 + np.exp(beta * (alpha - x)))
                out = lo + (y - y0) / (y1 - y0) * (hi - lo)
                tiles.append(codec.raw_encode(out))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def histogram_equalization(layer: DataFrame, num_buckets: int = 256) -> DataFrame:
    """Global-stat-then-map (RDDHistogramEqualization.scala:44-120): pass 1
    bucket counts -> broadcast CDF -> pass 2 per-pixel transfer
    out = lo + cdf[bucket(v)] * (hi - lo).

    Bucketing uses the floor rule bucket(v) = clip(floor((v-lo)/(hi-lo)*nb),
    0, nb-1) in BOTH passes (count and transfer; shared _bucket_cdf). Every
    step is +,-,*,/ of exact integer counts — no transcendentals — so the
    transfer is bit-identical to the SQL oracle twin. Stats come from
    _transfer_stats: ONE fused stat action on discrete imagery (the
    reference's RDDHistogramEqualization two-action shape), legacy
    min/max + bucket-count actions above the cardinality cap."""
    layer = layer.persist()  # stat action(s) + transfer read the cache
    lo, hi, bucket_of, cdf = _transfer_stats(layer, num_buckets)
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast((lo, hi, cdf.tolist()))

    def run(it):
        lo_, hi_, cdf_l = bc.value
        cdf_a = np.asarray(cdf_l)
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                out = np.where(np.isnan(arr), np.nan, 0.0)
                ok = ~np.isnan(arr)
                out[ok] = lo_ + cdf_a[bucket_of(arr[ok])] * (hi_ - lo_)
                tiles.append(codec.raw_encode(out))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def retile_to_layout(
    layer: DataFrame,
    src_layout: LayoutDefinition,
    dst_layout: LayoutDefinition,
    dst_zoom: int,
) -> DataFrame:
    """Re-key a layer onto a different LayoutDefinition: each tile's extent
    (from its src key) is pasted NN-aligned into every dst tile it covers
    (RDDLayoutMerge.scala:40-52's cut step — prototype + Tile.merge by
    extents), then partial dst tiles combine with first-non-NoData wins."""
    from ..cell import z2_encode

    smt = src_layout.map_transform
    dmt = dst_layout.map_transform
    dtc = dst_layout.tile_layout.tile_cols
    dtr = dst_layout.tile_layout.tile_rows
    scw, sch = src_layout.cell_width, src_layout.cell_height
    dcw, dch = dst_layout.cell_width, dst_layout.cell_height

    def cut(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                sh, sw = arr.shape
                sext = smt.extent_for_key(int(t.col), int(t.row))
                gb = dmt.gridbounds_for_extent(sext)
                for dc, dr in gb.coords():
                    if not (0 <= dc < dst_layout.tile_layout.layout_cols
                            and 0 <= dr < dst_layout.tile_layout.layout_rows):
                        continue
                    dext = dmt.extent_for_key(dc, dr)
                    # dst pixel centers -> src pixel indices (NN, the
                    # Tile.merge(extent, otherExtent, other) alignment)
                    xs = dext.xmin + (np.arange(dtc) + 0.5) * dcw
                    ys = dext.ymax - (np.arange(dtr) + 0.5) * dch
                    sx = np.floor((xs - sext.xmin) / scw).astype(np.int64)
                    sy = np.floor((sext.ymax - ys) / sch).astype(np.int64)
                    mx = (sx >= 0) & (sx < sw)
                    my = (sy >= 0) & (sy < sh)
                    if not (mx.any() and my.any()):
                        continue
                    out = np.full((dtr, dtc), np.nan)
                    yy, xx = np.meshgrid(sy.clip(0, sh - 1), sx.clip(0, sw - 1),
                                         indexing="ij")
                    vals = arr[yy, xx]
                    out[np.ix_(my, mx)] = vals[np.ix_(my, mx)]
                    outs.append(pd.DataFrame(
                        {
                            "zoom": [dst_zoom], "col": [int(dc)], "row": [int(dr)],
                            "cell": [int(z2_encode(dc, dr))],
                            "tile": [codec.raw_encode(out)],
                            "h": [dtr], "w": [dtc], "fmt": ["raw"],
                        }
                    ))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    parts = layer.mapInPandas(cut, LAYER_SCHEMA)

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for t in pdf.itertuples(index=False):
            arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
            if acc is None:
                acc = arr
            else:
                m = np.isnan(acc)
                acc[m] = arr[m]
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [int(first["zoom"])], "col": [int(first["col"])],
                "row": [int(first["row"])], "cell": [int(first["cell"])],
                "tile": [codec.raw_encode(acc)], "h": [int(first["h"])],
                "w": [int(first["w"])], "fmt": ["raw"],
            }
        )

    return parts.groupBy("zoom", "col", "row").applyInPandas(combine, LAYER_SCHEMA)


def layout_merge(
    left: DataFrame,
    left_layout: LayoutDefinition,
    right: DataFrame,
    right_layout: LayoutDefinition,
    zoom: int,
) -> DataFrame:
    """One-call RDDLayoutMerge (RDDLayoutMerge.scala:31-55): re-key `right`
    onto `left`'s layout, then mosaic (left wins, right fills NoData)."""
    cut = retile_to_layout(right, right_layout, left_layout, zoom)
    return merge_layers(left, cut)
