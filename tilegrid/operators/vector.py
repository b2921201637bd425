"""Distributed vector-geometry operators (§2.9): convex hull, simplify.

Distributed hull uses the classic exact decomposition: hull(S) =
hull(union of per-partition hulls) — each partition reduces its points to
<= its hull vertices (tiny), the driver finishes on the union. One narrow
Arrow pass, no shuffle (reference: vector/convexhull delegates to JTS;
algorithm here is Andrew's monotone chain from the published literature).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geometry import convex_hull, simplify_dp


def convex_hull_points(df: DataFrame, x: str = "x", y: str = "y") -> pd.DataFrame:
    """Exact convex hull of a distributed point set; returns the CCW hull
    vertices as a (small) pandas frame [x, y]."""

    def partial(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            h = convex_hull(pdf[[x, y]].values)
            yield pd.DataFrame({x: h[:, 0], y: h[:, 1]})

    parts = df.select(x, y).mapInPandas(partial, f"{x} double, {y} double").toPandas()
    if len(parts) == 0:
        return pd.DataFrame({x: [], y: []})
    h = convex_hull(parts[[x, y]].values)
    return pd.DataFrame({x: h[:, 0], y: h[:, 1]})


def simplify_rings(
    df: DataFrame, tolerance: float, wkb_col: str = "wkb"
) -> DataFrame:
    """Douglas-Peucker simplify every polygon's rings (WKB in/out)."""
    from ..geometry import wkb_decode, wkb_encode_polygon

    schema = df.schema

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new = []
            for raw in out[wkb_col]:
                rings = wkb_decode(bytes(raw))
                new.append(
                    wkb_encode_polygon([simplify_dp(r, tolerance) for r in rings])
                )
            out[wkb_col] = new
            yield out

    return df.mapInPandas(run, schema)
