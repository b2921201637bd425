"""Multiband tile operators (reference: MultibandTile.scala:54,
ArrayMultibandTile.scala, PixelInterleaveBandArrayTile.scala).

A multiband tile is a (h, w, bands) float64 array inside the same binary
`tile` column (the raw codec carries the band dimension; the PNG/fake-JPEG
codecs carry RGB natively). Ops:

  band_count(layer)       -> DataFrame with an n_bands column (decode-light)
  band_select(layer, i)   -> single-band layer (MultibandTile.band(i))
  band_stack(layers)      -> key-join N single-band layers into one multiband
                             (ArrayMultibandTile(bands...) constructor)
  band_combine(layer, fn) -> single-band from a NumPy combiner over bands
                             (MultibandTile.combine)
  normalized_difference   -> (band_a - band_b) / (band_a + band_b), the
                             NDVI-shaped combine (NaN where the sum is 0)
  band_stats(layer)       -> per-band (band, n_px, vsum, vmin, vmax, vmean)

All per-pixel math is vectorized NumPy inside Arrow batches; the only
shuffles are band_stack's key equi-join (co-partitioned layers -> no extra
exchange) and band_stats' tiny (bands-sized) partial-aggregate groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from . import KEY_COLS, LAYER_SCHEMA


def _map_tiles(layer: DataFrame, fn) -> DataFrame:
    """Decode -> fn(arr) -> raw-encode, preserving keys."""

    def run(it):
        for pdf in it:
            tiles, hs, ws = [], [], []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                out = fn(arr)
                tiles.append(codec.raw_encode(np.ascontiguousarray(out)))
                hs.append(out.shape[0])
                ws.append(out.shape[1])
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["h"] = np.asarray(hs, dtype=np.int32)
            pdf["w"] = np.asarray(ws, dtype=np.int32)
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def band_select(layer: DataFrame, band: int) -> DataFrame:
    """Single band as its own layer (MultibandTile.band)."""

    def pick(arr: np.ndarray) -> np.ndarray:
        if arr.ndim == 2:
            if band != 0:
                raise ValueError(f"band {band} of a single-band tile")
            return arr
        return arr[:, :, band]

    return _map_tiles(layer, pick)


def band_combine(layer: DataFrame, fn) -> DataFrame:
    """Arbitrary per-pixel combine across bands: fn(list_of_2d_bands) ->
    2-D array (MultibandTile.combine)."""

    def run(arr: np.ndarray) -> np.ndarray:
        bands = [arr] if arr.ndim == 2 else [arr[:, :, i] for i in range(arr.shape[2])]
        return np.asarray(fn(bands), dtype=np.float64)

    return _map_tiles(layer, run)


def normalized_difference(layer: DataFrame, a: int = 0, b: int = 1) -> DataFrame:
    """(band_a - band_b) / (band_a + band_b); NaN where the denominator is 0
    (the NDVI shape over whatever the bands hold)."""

    def nd(bands):
        x, y = bands[a], bands[b]
        den = x + y
        with np.errstate(invalid="ignore", divide="ignore"):
            out = (x - y) / den
        out[den == 0] = np.nan
        return out

    return band_combine(layer, nd)


def band_stack(layers: list[DataFrame]) -> DataFrame:
    """Stack N aligned single-band layers into one multiband layer. Inner
    key equi-join (tiles present in all inputs), then np.stack per key.
    With layers written sorted/partitioned by cell the join reuses the
    partitioning — no extra shuffle."""
    if len(layers) < 2:
        raise ValueError("band_stack needs >= 2 layers")
    joined = layers[0].select(*KEY_COLS, "cell", "tile", "fmt")
    for i, other in enumerate(layers[1:], start=1):
        right = other.select(
            *KEY_COLS,
            F.col("tile").alias(f"tile_{i}"),
            F.col("fmt").alias(f"fmt_{i}"),
        )
        joined = joined.join(right, KEY_COLS)
    n = len(layers)

    def stack(it):
        for pdf in it:
            rows = {k: [] for k in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            for t in pdf.itertuples(index=False):
                bands = [codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)]
                for i in range(1, n):
                    bands.append(
                        codec.decode_tile(
                            bytes(getattr(t, f"tile_{i}")), getattr(t, f"fmt_{i}")
                        ).astype(np.float64)
                    )
                arr = np.stack(bands, axis=-1)
                rows["zoom"].append(int(t.zoom))
                rows["col"].append(int(t.col))
                rows["row"].append(int(t.row))
                rows["cell"].append(int(t.cell))
                rows["tile"].append(codec.raw_encode(np.ascontiguousarray(arr)))
                rows["h"].append(arr.shape[0])
                rows["w"].append(arr.shape[1])
                rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return joined.mapInPandas(stack, LAYER_SCHEMA)


def band_stats(layer: DataFrame) -> DataFrame:
    """Per-band layer statistics: (band, n_px, vsum, vmin, vmax, vmean).
    One decode pass emitting bands-sized partials per batch, then a tiny
    groupBy(band) merge — the StatsTileRDDMethods histogram/minMax pattern
    generalized per band. Integer-valued rasters keep vsum exact (order-
    independent), so the DuckDB oracle twin hash-matches."""

    def partials(it):
        for pdf in it:
            acc: dict[int, list] = {}
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for bi in range(arr.shape[2]):
                    v = arr[:, :, bi]
                    v = v[~np.isnan(v)]
                    if v.size == 0:
                        continue
                    cur = acc.setdefault(bi, [0, 0.0, np.inf, -np.inf])
                    cur[0] += int(v.size)
                    cur[1] += float(v.sum())
                    cur[2] = min(cur[2], float(v.min()))
                    cur[3] = max(cur[3], float(v.max()))
            if acc:
                yield pd.DataFrame(
                    {
                        "band": list(acc),
                        "n": [a[0] for a in acc.values()],
                        "s": [a[1] for a in acc.values()],
                        "mn": [a[2] for a in acc.values()],
                        "mx": [a[3] for a in acc.values()],
                    }
                )

    part = layer.mapInPandas(
        partials, "band int, n long, s double, mn double, mx double"
    )
    return (
        part.groupBy("band")
        .agg(
            F.sum("n").cast("long").alias("n_px"),
            F.sum("s").alias("vsum"),
            F.min("mn").alias("vmin"),
            F.max("mx").alias("vmax"),
        )
        .withColumn("vmean", F.col("vsum") / F.col("n_px"))
    )
