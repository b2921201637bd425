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


def _zone_pairs_keyed(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    """Per-tile (zoom, col, row, zone, value, count) partials."""
    right = zone_layer.select(
        *KEY_COLS, F.col("tile").alias("tile_z"), F.col("fmt").alias("fmt_z")
    )
    joined = value_layer.join(right, KEY_COLS, "inner")

    def emit(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                v = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64).ravel()
                z = codec.decode_tile(bytes(t.tile_z), t.fmt_z).astype(np.float64).ravel()
                ok = ~np.isnan(v) & ~np.isnan(z)
                if not ok.any():
                    continue
                pair = np.stack([z[ok].astype(np.int64), v[ok]])
                uniq, counts = np.unique(pair, axis=1, return_counts=True)
                outs.append(
                    pd.DataFrame(
                        {
                            "zoom": np.full(uniq.shape[1], t.zoom, np.int32),
                            "col": np.full(uniq.shape[1], t.col, np.int32),
                            "row": np.full(uniq.shape[1], t.row, np.int32),
                            "zone": uniq[0].astype(np.int64),
                            "value": uniq[1],
                            "count": counts.astype(np.int64),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return joined.mapInPandas(
        emit, "zoom int, col int, row int, zone long, value double, count long"
    )


def zonal_percentage(value_layer: DataFrame, zone_layer: DataFrame) -> DataFrame:
    """Per-pixel percentage of its zone's total count for its (value, zone)
    pair (Zonal.scala:57-84). Returns a layer.

    Fully distributed — no driver collect of the zonal histogram (its size
    is zone-count x value-domain, unbounded for float layers): the share
    dim is an aggregated DataFrame, each tile's needed (zone, value)
    shares are shipped back via an equi-join on the tile key, and a
    cogroup pairs them with the tile bytes for the per-pixel map. Driver
    and per-task memory are bounded by pixels-per-tile."""
    keyed = _zone_pairs_keyed(value_layer, zone_layer).persist()
    hist = keyed.groupBy("zone", "value").agg(F.sum("count").alias("n"))
    totals = hist.groupBy("zone").agg(F.sum("n").alias("total"))
    share = hist.join(totals, "zone").select(
        "zone", "value",
        (F.lit(100.0) * F.col("n") / F.col("total")).alias("share"),
    )
    tile_shares = keyed.select(*KEY_COLS, "zone", "value").join(
        share, ["zone", "value"]
    )

    right = zone_layer.select(
        *KEY_COLS, F.col("tile").alias("tile_z"), F.col("fmt").alias("fmt_z")
    )
    joined = value_layer.join(right, KEY_COLS, "inner")

    from . import LAYER_SCHEMA

    def apply_shares(tiles_pdf: pd.DataFrame, shares_pdf: pd.DataFrame) -> pd.DataFrame:
        t = tiles_pdf.iloc[0]
        v = codec.decode_tile(bytes(t["tile"]), t["fmt"]).astype(np.float64)
        z = codec.decode_tile(bytes(t["tile_z"]), t["fmt_z"]).astype(np.float64)
        out = np.full(v.shape, np.nan)
        ok = ~np.isnan(v) & ~np.isnan(z)
        if ok.any() and len(shares_pdf):
            lut = {
                (int(zz), float(vv)): float(ss)
                for zz, vv, ss in zip(
                    shares_pdf["zone"], shares_pdf["value"], shares_pdf["share"]
                )
            }
            pair = np.stack([z[ok].astype(np.int64), v[ok]])
            uniq, inv = np.unique(pair, axis=1, return_inverse=True)
            shares = np.array(
                [lut.get((int(uz), float(uv)), np.nan) for uz, uv in uniq.T]
            )
            out[ok] = shares[inv]
        return pd.DataFrame(
            {
                "zoom": [int(t["zoom"])], "col": [int(t["col"])],
                "row": [int(t["row"])], "cell": [int(t["cell"])],
                "tile": [codec.raw_encode(out)],
                "h": [out.shape[0]], "w": [out.shape[1]], "fmt": ["raw"],
            }
        )

    return (
        joined.groupby(*KEY_COLS)
        .cogroup(tile_shares.groupby(*KEY_COLS))
        .applyInPandas(lambda a, b: apply_shares(a, b), LAYER_SCHEMA)
    )
