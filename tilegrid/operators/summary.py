"""Layer summaries: histogram, min/max, class breaks, polygonal summary,
temporal statistics.

Reference: StatsTileRDDMethods (spark/.../summary/StatsTileRDDMethods.scala:
35-115), StreamingHistogram (Ben-Haim/Tom-Tov, raster/.../histogram/
StreamingHistogram.scala) and polygonal summaries
(PolygonalSummaryTileLayerRDDMethods.scala:35-75). Our plan: per-tile Arrow
partials (np.unique / bincount / masked folds) -> JVM groupBy merge — the
same two-phase shape as the reference's map+reduce, but the reduce is
Tungsten hash aggregation with map-side combine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..geometry import (
    polygon_contains_extent,
    polygon_intersects_extents,
)
from ..grid import LayoutDefinition
from ..oracle import rasterize_polygon


def _tiles(it):
    for pdf in it:
        for t in pdf.itertuples(index=False):
            yield t, codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)


def histogram(layer: DataFrame, num_buckets: int = 80, lo: float | None = None, hi: float | None = None) -> DataFrame:
    """Fixed-break histogram: (bucket, lo, hi, count). Breaks from the layer
    min/max (one cheap pre-pass) unless given."""
    if lo is None or hi is None:
        mm = min_max(layer).collect()[0]
        lo = mm["vmin"] if lo is None else lo
        hi = mm["vmax"] if hi is None else hi
    edges = np.linspace(lo, hi, num_buckets + 1)

    def partials(it):
        for t, arr in _tiles(it):
            v = arr[~np.isnan(arr)].ravel()
            if not len(v):
                continue
            counts, _ = np.histogram(v, bins=edges)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame({"bucket": nz, "count": counts[nz]})

    part = layer.mapInPandas(partials, "bucket int, count long")
    out = part.groupBy("bucket").agg(F.sum("count").alias("count"))
    w = (hi - lo) / num_buckets
    return out.select(
        "bucket",
        (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("lo"),
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("hi"),
        "count",
    )


def histogram_exact_int(layer: DataFrame) -> DataFrame:
    """Exact integer-value histogram (FastMapHistogram analogue):
    (value, count)."""

    def partials(it):
        for t, arr in _tiles(it):
            v = arr[~np.isnan(arr)].ravel()
            if not len(v):
                continue
            vals, counts = np.unique(v.astype(np.int64), return_counts=True)
            yield pd.DataFrame({"value": vals, "count": counts})

    part = layer.mapInPandas(partials, "value long, count long")
    return part.groupBy("value").agg(F.sum("count").alias("count"))


def min_max(layer: DataFrame) -> DataFrame:
    """Layer-wide (vmin, vmax) — per-tile fold + JVM min/max."""

    def partials(it):
        for t, arr in _tiles(it):
            v = arr[~np.isnan(arr)]
            if v.size:
                yield pd.DataFrame({"tmin": [float(v.min())], "tmax": [float(v.max())]})

    part = layer.mapInPandas(partials, "tmin double, tmax double")
    return part.agg(F.min("tmin").alias("vmin"), F.max("tmax").alias("vmax"))


def class_breaks(layer: DataFrame, n: int, exact: bool = False,
                 num_buckets: int = 4096) -> list[float]:
    """Quantile breaks from a histogram CDF
    (StatsTileRDDMethods.scala:85-100).

    The DEFAULT (exact=False) is the scale-safe path: a fixed `num_buckets`
    bucketed histogram (driver traffic bounded at num_buckets rows
    regardless of domain), returning bucket upper edges as approximate
    quantiles — the same trade the reference's StreamingHistogram makes.
    exact=True collects the exact integer-value histogram — bounded by the
    layer's value DOMAIN, which is unbounded for float layers: opt in only
    when the domain is known-small (classified / small-int rasters)."""
    if exact:
        hist = histogram_exact_int(layer).orderBy("value").collect()
        values = np.array([r["value"] for r in hist], dtype=np.float64)
        counts = np.array([r["count"] for r in hist], dtype=np.float64)
    else:
        hist = histogram(layer, num_buckets).orderBy("bucket").collect()
        values = np.array([r["hi"] for r in hist], dtype=np.float64)
        counts = np.array([r["count"] for r in hist], dtype=np.float64)
    cdf = np.cumsum(counts) / counts.sum()
    qs = np.linspace(0, 1, n + 1)[1:]
    idx = np.searchsorted(cdf, qs, side="left").clip(0, len(values) - 1)
    return [float(values[i]) for i in idx]


def mean_stddev(layer: DataFrame) -> DataFrame:
    """(count, mean, stddev) over all data cells — (sum, sumsq, n) partials."""

    def partials(it):
        for t, arr in _tiles(it):
            v = arr[~np.isnan(arr)].ravel()
            if v.size:
                yield pd.DataFrame(
                    {"s": [float(v.sum())], "ss": [float((v * v).sum())], "n": [int(v.size)]}
                )

    part = layer.mapInPandas(partials, "s double, ss double, n long")
    agg = part.agg(F.sum("s").alias("s"), F.sum("ss").alias("ss"), F.sum("n").alias("n"))
    return agg.select(
        F.col("n").alias("count"),
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) ** 2).alias("stddev"),
    )


def polygonal_summary(
    layer: DataFrame,
    rings: list[np.ndarray],
    layout: LayoutDefinition,
    stats: tuple[str, ...] = ("sum", "count", "min", "max", "mean"),
) -> DataFrame:
    """Fold pixels under a polygon (PolygonalSummaryTileLayerRDDMethods.scala:
    35-75): coarse cell-cover prefilter in the scan, full-tile fold when the
    tile extent is contained, rasterize-and-mask on boundary tiles."""
    from ..cell import cover_polygon

    cells = [int(c) for c in cover_polygon(layout, rings)]
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast([r.tolist() for r in rings])
    mt = layout.map_transform
    ext = layout.extent
    lc, lr = layout.tile_layout.layout_cols, layout.tile_layout.layout_rows
    filtered = layer.where(F.col("cell").isin(cells)) if cells else layer.limit(0)

    def partials(it):
        rr = [np.asarray(r) for r in bc.value]
        for t, arr in _tiles(it):
            text = mt.extent_for_key(int(t.col), int(t.row))
            if polygon_contains_extent(rr, text):
                sel = arr[~np.isnan(arr)]
            else:
                mask = rasterize_polygon(rr, text, arr.shape[1], arr.shape[0])
                sel = arr[mask & ~np.isnan(arr)]
            if sel.size:
                yield pd.DataFrame(
                    {
                        "psum": [float(sel.sum())],
                        "pcount": [int(sel.size)],
                        "pmin": [float(sel.min())],
                        "pmax": [float(sel.max())],
                    }
                )

    part = filtered.mapInPandas(partials, "psum double, pcount long, pmin double, pmax double")
    return part.agg(
        F.sum("psum").alias("sum"),
        F.sum("pcount").alias("count"),
        F.min("pmin").alias("min"),
        F.max("pmax").alias("max"),
        (F.sum("psum") / F.sum("pcount")).alias("mean"),
    )


def streaming_histogram(layer: DataFrame, num_buckets: int = 80):
    """Adaptive-bucket layer histogram — the reference's
    `rdd.histogram(numBuckets)` path (StatsTileRDDMethods.scala:56-70:
    per-tile StreamingHistogram merged with `.reduce(_ merge _)`), using
    our B-H/T-T sketch (tilegrid/sketch.py).

    Two-level reduce: the map side folds every tile of each Arrow batch
    into ONE sketch (<= num_buckets buckets regardless of pixel count), so
    the driver sees one tiny row per batch, folded in deterministic
    min-cell order. Unlike the fixed-break `histogram`, needs no min/max
    pre-pass and adapts bucket placement to the data — use it for
    class breaks / quantiles over unknown value domains at scale.
    Returns the merged StreamingHistogram."""
    from ..sketch import StreamingHistogram

    def per_batch(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            h = StreamingHistogram(num_buckets)
            key = None
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h.extend(arr)
                k = int(t.cell)
                key = k if key is None else min(key, k)
            if h.bucket_count():
                labels, counts, vmin, vmax = h.to_arrays()
                yield pd.DataFrame({
                    "k": [key], "labels": [labels.tolist()],
                    "counts": [counts.tolist()],
                    "vmin": [vmin], "vmax": [vmax],
                })

    rows = layer.mapInPandas(
        per_batch,
        "k long, labels array<double>, counts array<long>, "
        "vmin double, vmax double",
    ).toPandas()
    out = StreamingHistogram(num_buckets)
    for r in rows.sort_values("k").itertuples(index=False):
        out.merge(StreamingHistogram.from_arrays(
            r.labels, r.counts, r.vmin, r.vmax, num_buckets))
    return out


# ------------------------------------------------------ temporal statistics

def temporal_stats(
    layer: DataFrame, window: str, stat: str = "mean", ts_col: str = "ts"
) -> DataFrame:
    """Temporal map algebra over a space-time layer (LocalTemporalStatistics
    .scala:34-60): per spatial key, reduce tiles within each time window.
    `window` is a Spark window duration string ('7 days'). Returns a layer
    with an extra window_start column."""
    from .local import NARY_OPS

    fn = NARY_OPS[stat]
    grouped = layer.withColumn("_w", F.window(ts_col, window)).groupBy(
        "zoom", "col", "row", "_w"
    )

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [codec.decode_tile(bytes(t), f).astype(np.float64)
             for t, f in zip(pdf["tile"], pdf["fmt"])]
        )
        with np.errstate(invalid="ignore"):
            r = fn(stack)
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]],
                "tile": [codec.raw_encode(np.asarray(r, np.float64))],
                "h": [first["h"]], "w": [first["w"]], "fmt": ["raw"],
                "window_start": [first["_w"]["start"]],
            }
        )

    from . import LAYER_SCHEMA

    return grouped.applyInPandas(
        reduce_group, LAYER_SCHEMA + ", window_start timestamp"
    )


def temporal_gapfill(
    layer: DataFrame, ts_col: str = "ts", nodata: float | None = None
) -> DataFrame:
    """Per-pixel linear interpolation of NoData gaps across a space-time
    layer's time slices — the cloud-gap compositing step of satellite
    time-series pipelines. Beyond-reference member of the temporal family
    (the reference stops at windowed reduces, LocalTemporalStatistics
    .scala:34-60); same distribution shape as temporal_stats: exactly one
    shuffle (groupBy spatial key), per-group memory T x H x W float64.

    Semantics: per spatial key, slices sorted by `ts_col`; a gap pixel
    (NaN, or == `nodata` when given) with a valid slice both before and
    after in time is filled with vp + (vn - vp) * ((t - tp) / (tn - tp))
    over epoch-ns time; leading/trailing gaps (and all-gap pixels) are
    left as-is. Fully vectorized: prev/next valid slice indices via
    running max/min accumulate along the time axis."""
    from . import LAYER_SCHEMA

    def fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        stack = np.stack(
            [codec.decode_tile(bytes(t), f).astype(np.float64)
             for t, f in zip(pdf["tile"], pdf["fmt"])]
        )
        ts = (
            pd.to_datetime(pdf[ts_col])
            .astype("datetime64[ns]").astype("int64")
            .to_numpy().astype(np.float64)
        )
        T = stack.shape[0]
        valid = ~np.isnan(stack)
        if nodata is not None:
            valid &= stack != nodata
        idx = np.broadcast_to(
            np.arange(T)[:, None, None], stack.shape
        )
        prev = np.maximum.accumulate(np.where(valid, idx, -1), axis=0)
        nxt = np.minimum.accumulate(
            np.where(valid, idx, T)[::-1], axis=0
        )[::-1]
        can = (~valid) & (prev >= 0) & (nxt <= T - 1)
        pi, ni = np.clip(prev, 0, T - 1), np.clip(nxt, 0, T - 1)
        pv = np.take_along_axis(stack, pi, axis=0)
        nv = np.take_along_axis(stack, ni, axis=0)
        t, tp, tn = ts[idx], ts[pi], ts[ni]
        with np.errstate(invalid="ignore", divide="ignore"):
            fill = pv + (nv - pv) * ((t - tp) / (tn - tp))
        out = np.where(can, fill, stack)
        res = pdf.copy()
        res["tile"] = [
            codec.raw_encode(np.ascontiguousarray(out[i])) for i in range(T)
        ]
        res["fmt"] = "raw"
        return res

    ts_type = dict(
        zip(layer.schema.fieldNames(), layer.schema.fields)
    )[ts_col].dataType.simpleString()
    base_cols = [f.split()[0] for f in LAYER_SCHEMA.split(",")]
    extra = [c for c in layer.columns if c not in base_cols and c != ts_col]
    assert not extra, f"unexpected columns: {extra}"
    return layer.groupBy("zoom", "col", "row").applyInPandas(
        fill_group, LAYER_SCHEMA + f", {ts_col} {ts_type}"
    )


def temporal_trend(
    layer: DataFrame, ts_col: str = "ts", nodata: float | None = None
) -> DataFrame:
    """Per-pixel OLS trend (value change per DAY) across a space-time
    layer's slices — the NDVI-trend / change-detection primitive of
    satellite time-series analysis. Beyond-reference member of the
    temporal family (LocalTemporalStatistics.scala:34-60 stops at
    windowed reduces); one shuffle (groupBy spatial key), one output
    tile per key.

    slope = (n*Stv - St*Sv) / (n*Stt - St*St) over x = integer day
    number (days since 1970-01-01, UTC): with integer x and the layer's
    values, every sum is a sum of exactly-representable doubles, so the
    result is identical under ANY accumulation order — the property that
    makes a distributed reduce and a single-process replay bit-equal.
    Pixels with < 2 valid slices are NoData (NaN)."""
    from . import LAYER_SCHEMA

    def trend_group(pdf: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [codec.decode_tile(bytes(t), f).astype(np.float64)
             for t, f in zip(pdf["tile"], pdf["fmt"])]
        )
        days = (
            pd.to_datetime(pdf[ts_col])
            .astype("datetime64[ns]").astype("int64")
            .to_numpy() // 86_400_000_000_000
        ).astype(np.float64)
        valid = ~np.isnan(stack)
        if nodata is not None:
            valid &= stack != nodata
        v = np.where(valid, stack, 0.0)
        x = days[:, None, None] * valid
        n = valid.sum(axis=0, dtype=np.float64)
        st = x.sum(axis=0)
        sv = v.sum(axis=0)
        stv = (x * v).sum(axis=0)
        stt = (x * x).sum(axis=0)
        denom = n * stt - st * st
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(
                (n >= 2) & (denom != 0.0),
                (n * stv - st * sv) / denom,
                np.nan,
            )
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [int(first["zoom"])], "col": [int(first["col"])],
                "row": [int(first["row"])], "cell": [int(first["cell"])],
                "tile": [codec.raw_encode(np.ascontiguousarray(slope))],
                "h": [int(first["h"])], "w": [int(first["w"])],
                "fmt": ["raw"],
            }
        )

    return layer.groupBy("zoom", "col", "row").applyInPandas(
        trend_group, LAYER_SCHEMA
    )


def temporal_argmax(
    quality: DataFrame,
    value: DataFrame,
    ts_col: str = "ts",
    nodata: float | None = None,
) -> DataFrame:
    """Best-pixel composite: for each pixel, take the VALUE from the time
    slice whose QUALITY is maximal (ties -> earliest slice) — the
    max-NDVI / greenest-pixel compositing pattern of satellite pipelines,
    beyond-reference like the rest of the temporal family
    (LocalTemporalStatistics.scala:34-60 reduces a single layer; the
    composite carries a payload band from the winning slice).

    `quality` and `value` are same-keyed space-time layers (joined on
    spatial key + ts_col; slices missing from either side are dropped).
    Gap pixels (NaN quality, or == `nodata`) never win; pixels with no
    valid slice are NoData. One equi-join co-partitioned with the
    following groupBy (a single shuffle round on the spatial key), one
    output tile per key."""
    from . import LAYER_SCHEMA

    keys = ["zoom", "col", "row", ts_col]
    q = quality.select(*keys, "cell", "h", "w",
                       F.col("tile").alias("_qt"), F.col("fmt").alias("_qf"))
    v = value.select(*keys, F.col("tile").alias("_vt"), F.col("fmt").alias("_vf"))
    joined = q.join(v, keys)

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        qs = np.stack(
            [codec.decode_tile(bytes(t), f).astype(np.float64)
             for t, f in zip(pdf["_qt"], pdf["_qf"])]
        )
        vs = np.stack(
            [codec.decode_tile(bytes(t), f).astype(np.float64)
             for t, f in zip(pdf["_vt"], pdf["_vf"])]
        )
        valid = ~np.isnan(qs)
        if nodata is not None:
            valid &= qs != nodata
        ranked = np.where(valid, qs, -np.inf)
        win = np.argmax(ranked, axis=0)  # first max -> earliest slice wins ties
        out = np.take_along_axis(vs, win[None], axis=0)[0]
        out = np.where(valid.any(axis=0), out, np.nan)
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [int(first["zoom"])], "col": [int(first["col"])],
                "row": [int(first["row"])], "cell": [int(first["cell"])],
                "tile": [codec.raw_encode(np.ascontiguousarray(out))],
                "h": [int(first["h"])], "w": [int(first["w"])],
                "fmt": ["raw"],
            }
        )

    return joined.groupBy("zoom", "col", "row").applyInPandas(
        compose, LAYER_SCHEMA
    )
