"""Zonal statistics: value layer x zone layer (same keys).

Reference: ZonalHistogram / ZonalPercentage (spark/.../zonal/Zonal.scala:45-84,
raster/.../mapalgebra/zonal/*ZonalHistogram.scala). Our plan: equi-join the
two layers on (zoom,col,row), one Arrow UDF per tile pair emitting compact
(zone, value, count) partials via np.unique, then a JVM-side groupBy — the
heavy reduction happens in Tungsten with map-side partial aggregation, so
hot zones don't skew (counts pre-combine per partition)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from . import KEY_COLS

_PAIR_SCHEMA = "zone long, value double, count long"


def _zone_pairs(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    right = zone_layer.select(
        *KEY_COLS, F.col("tile").alias("tile_z"), F.col("fmt").alias("fmt_z")
    )
    joined = value_layer.join(right, KEY_COLS, "inner")

    def emit(it):
        for pdf in it:
            zs, vs, cs = [], [], []
            for t in pdf.itertuples(index=False):
                v = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64).ravel()
                z = codec.decode_tile(bytes(t.tile_z), t.fmt_z).astype(np.float64).ravel()
                ok = ~np.isnan(v) & ~np.isnan(z)
                if not ok.any():
                    continue
                pair = np.stack([z[ok].astype(np.int64), v[ok]])
                uniq, counts = np.unique(pair, axis=1, return_counts=True)
                zs.append(uniq[0].astype(np.int64))
                vs.append(uniq[1])
                cs.append(counts.astype(np.int64))
            if zs:
                yield pd.DataFrame(
                    {
                        "zone": np.concatenate(zs),
                        "value": np.concatenate(vs),
                        "count": np.concatenate(cs),
                    }
                )

    return joined.mapInPandas(emit, _PAIR_SCHEMA)


def zonal_histogram(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    """(zone, value, count) — the exploded zonal histogram."""
    return (
        _zone_pairs(value_layer, zone_layer)
        .groupBy("zone", "value")
        .agg(F.sum("count").alias("count"))
    )


def zonal_stats(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    """Per-zone min/max/sum/count/mean, fully JVM-side after the pair UDF."""
    pairs = _zone_pairs(value_layer, zone_layer)
    return pairs.groupBy("zone").agg(
        F.min("value").alias("zmin"),
        F.max("value").alias("zmax"),
        F.sum(F.col("value") * F.col("count")).alias("zsum"),
        F.sum("count").alias("zcount"),
        (F.sum(F.col("value") * F.col("count")) / F.sum("count")).alias("zmean"),
    )


def zonal_percentage(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    """Per-pixel percentage of its zone's total count for its (value, zone)
    pair (Zonal.scala:57-84: histogram broadcast + per-pixel map). Returns a
    layer. The (zone,value)->share map is broadcast-joined (small dim)."""
    hist = zonal_histogram(value_layer, zone_layer).collect()
    counts: dict[tuple[int, float], int] = {}
    totals: dict[int, int] = {}
    for r in hist:
        counts[(r["zone"], r["value"])] = r["count"]
        totals[r["zone"]] = totals.get(r["zone"], 0) + r["count"]

    spark = value_layer.sparkSession
    bc = spark.sparkContext.broadcast((counts, totals))

    right = zone_layer.select(
        *KEY_COLS, F.col("tile").alias("tile_z"), F.col("fmt").alias("fmt_z")
    )
    joined = value_layer.join(right, KEY_COLS, "inner")

    from . import LAYER_SCHEMA

    def emit(it):
        cts, tots = bc.value
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                v = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                z = codec.decode_tile(bytes(t.tile_z), t.fmt_z).astype(np.float64)
                out = np.full(v.shape, np.nan)
                ok = ~np.isnan(v) & ~np.isnan(z)
                if ok.any():
                    pair = np.stack([z[ok].astype(np.int64), v[ok]])
                    uniq, inv = np.unique(pair, axis=1, return_inverse=True)
                    shares = np.array(
                        [
                            100.0 * cts.get((int(uz), float(uv)), 0)
                            / max(tots.get(int(uz), 0), 1)
                            for uz, uv in uniq.T
                        ]
                    )
                    out[ok] = shares[inv]
                tiles.append(codec.raw_encode(out))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return joined.mapInPandas(emit, LAYER_SCHEMA)
