"""Zoom pyramid: level z -> z-1 by gathering <=4 children per parent key and
2x decimating (reference Pyramid.scala:90-118: re-key via tile-center ->
combineByKey -> merge+resample).

For the power-of-2 ZXY scheme the center-point re-key reduces to integer
halving: child (c, r) at zoom z -> parent (c//2, r//2) at z-1, child quadrant
(c%2, r%2). We therefore compute the parent key in Catalyst (no UDF) and do
one groupBy per level — the same single shuffle per level as the reference's
combineByKey. `build_pyramid` persists each level and supports checkpointed
resume through sources.layer_io.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_sql
from ..tiles import block_reduce
from . import LAYER_SCHEMA


def pyramid_up(layer: DataFrame, method: str = "average") -> DataFrame:
    """One level up. Input/output: layer DataFrame (raw float64 tiles)."""
    parents = (
        layer.withColumn("pcol", (F.col("col") / 2).cast("int"))
        .withColumn("prow", (F.col("row") / 2).cast("int"))
        .withColumn("qx", (F.col("col") % 2).cast("int"))
        .withColumn("qy", (F.col("row") % 2).cast("int"))
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        th, tw = int(first["h"]), int(first["w"])
        big = None
        for t in pdf.itertuples(index=False):
            arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
            if big is None:  # band count comes from the first child tile
                big = np.full((2 * th, 2 * tw) + arr.shape[2:], np.nan)
            big[t.qy * th : (t.qy + 1) * th, t.qx * tw : (t.qx + 1) * tw] = arr
        out = block_reduce(big, 2, method)
        zoom = int(first["zoom"]) - 1
        pcol, prow = int(first["pcol"]), int(first["prow"])
        from ..cell import z2_encode

        return pd.DataFrame(
            {
                "zoom": [zoom], "col": [pcol], "row": [prow],
                "cell": [int(z2_encode(pcol, prow))],
                "tile": [codec.raw_encode(out)],
                "h": [th], "w": [tw], "fmt": ["raw"],
            }
        )

    return parents.groupBy("zoom", "pcol", "prow").applyInPandas(assemble, LAYER_SCHEMA)


def build_pyramid(
    layer: DataFrame,
    max_zoom: int,
    min_zoom: int = 0,
    method: str = "average",
    sink=None,
    persist: bool = True,
) -> dict[int, DataFrame]:
    """Pyramid.levelStream/upLevels: iterate zoom max->min, persisting each
    level; `sink(zoom, df)` is called per level (write + checkpoint marker).
    Returns {zoom: layer}."""
    levels = {max_zoom: layer}
    cur = layer
    for z in range(max_zoom, min_zoom, -1):
        nxt = pyramid_up(cur, method)
        if persist:
            nxt = nxt.persist()
        if sink is not None:
            sink(z - 1, nxt)
        levels[z - 1] = nxt
        cur = nxt
    return levels
