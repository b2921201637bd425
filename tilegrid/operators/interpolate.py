"""Point-set -> raster interpolation: inverse distance weighting.

Reference: raster/.../interpolation/InverseDistanceWeighted.scala (point set
-> tile by w = 1/d^power sums). Our formulation quantizes points to their
pixel (the tiler's floor math), then builds the IDW surface RELATIONALLY:
each data pixel explodes to the window of target pixels it influences
(a Catalyst sequence-explode, like CutTiles), one groupBy aggregates
num = sum(w * sum_v) and den = sum(w * n) per target pixel — no UDF, no
range join, whole-stage codegen end to end. A target pixel holding data
returns the exact mean of its own points (the d=0 rule); otherwise
num/den over the window; pixels with no data in the window are absent.

The same SQL text runs on DuckDB, so the op is oracle-checked; the only
cross-engine nondeterminism is float summation order over the <= (2k+1)^2
window terms, absorbed by round(6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..grid import LayoutDefinition


def idw_grid(
    points: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "x",
    y: str = "y",
    value_col: str = "value",
    window: int = 2,
) -> DataFrame:
    """IDW (power=2) surface at pixel resolution: rows (col, row, px, py,
    val) for every pixel within `window` pixels of a data pixel."""
    tl = layout.tile_layout
    tc, tr = tl.tile_cols, tl.tile_rows
    ncx, ncy = tl.layout_cols * tc, tl.layout_rows * tr
    cw, ch = layout.cell_width, layout.cell_height
    e = layout.extent
    # global pixel index of each point (same floor text as the oracle)
    gx = f"CAST(floor((({x}) - {e.xmin!r}) / {cw!r}) AS BIGINT)"
    gy = f"CAST(floor(({e.ymax!r} - ({y})) / {ch!r}) AS BIGINT)"
    src = (
        points.select(
            F.expr(gx).alias("gx"), F.expr(gy).alias("gy"),
            F.col(value_col).alias("_v"),
        )
        .where(f"gx BETWEEN 0 AND {ncx - 1} AND gy BETWEEN 0 AND {ncy - 1}")
        .groupBy("gx", "gy")
        .agg(F.sum("_v").alias("sv"), F.count("*").cast("long").alias("n"))
    )
    k = window
    w_expr = (
        f"1.0 / ((dx * CAST({cw!r} AS DOUBLE)) * (dx * CAST({cw!r} AS DOUBLE))"
        f" + (dy * CAST({ch!r} AS DOUBLE)) * (dy * CAST({ch!r} AS DOUBLE)))"
    )
    exploded = (
        src.withColumn("dx", F.explode(F.expr(f"sequence(-{k}, {k})")))
        .withColumn("dy", F.explode(F.expr(f"sequence(-{k}, {k})")))
        .withColumn("tgx", F.col("gx") + F.col("dx"))
        .withColumn("tgy", F.col("gy") + F.col("dy"))
        .where(f"tgx BETWEEN 0 AND {ncx - 1} AND tgy BETWEEN 0 AND {ncy - 1}")
    )
    agg = exploded.groupBy("tgx", "tgy").agg(
        F.expr(f"sum(CASE WHEN dx = 0 AND dy = 0 THEN NULL ELSE ({w_expr}) * sv END)").alias("num"),
        F.expr(f"sum(CASE WHEN dx = 0 AND dy = 0 THEN NULL ELSE ({w_expr}) * n END)").alias("den"),
        F.expr("max(CASE WHEN dx = 0 AND dy = 0 THEN sv END)").alias("sv0"),
        F.expr("max(CASE WHEN dx = 0 AND dy = 0 THEN n END)").alias("n0"),
    )
    return agg.select(
        F.expr(f"CAST(tgx DIV {tc} AS INT)").alias("col"),
        F.expr(f"CAST(tgy DIV {tr} AS INT)").alias("row"),
        F.expr(f"CAST(tgx % {tc} AS INT)").alias("px"),
        F.expr(f"CAST(tgy % {tr} AS INT)").alias("py"),
        F.expr(
            "round(CASE WHEN n0 IS NOT NULL THEN sv0 / n0 ELSE num / den END, 6)"
        ).alias("val"),
    )


def kriging_grid(
    points: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    model: tuple[float, float, float],
    x: str = "x",
    y: str = "y",
    value_col: str = "value",
    buffer_cells: float = 4.0,
    max_samples_per_tile: int = 400,
    method: str = "ordinary",
    degree: int = 1,
    mean: float | None = None,
) -> DataFrame:
    """Kriging surface at pixel resolution, per tile: each sample
    point explodes to the tiles within `buffer_cells` pixels of it (the
    CutTiles-style Catalyst explode), and each tile solves the kriging
    system against its local buffered sample set at its pixel centers.
    `method` picks the estimator (reference vector/.../interpolation/):
    "ordinary" (Lagrange-constrained, default), "simple" (known `mean`),
    "universal" (joint polynomial drift of `degree`), or "geo" (iterated-
    GLS drift + per-tile residual variogram refit; ignores `model`).
    `model` =
    (nugget, sill, range), typically fit once on a driver-side sample via
    fit_spherical.

    Per-tile cost is O(min(samples, max_samples_per_tile)^3) — hot tiles
    subsample deterministically (sorted by (x, y)) to bound the solve.
    Output: (col, row, px, py, val, kvar) for tiles holding >= 3 samples."""
    from ..kriging import (
        geo_kriging, ordinary_kriging, simple_kriging, universal_kriging,
    )
    from .tiler import explode_covering_keys

    if method == "ordinary":
        solver = lambda p, v, q: ordinary_kriging(p, v, q, model)
    elif method == "simple":
        solver = lambda p, v, q: simple_kriging(p, v, q, model, mean=mean)
    elif method == "universal":
        solver = lambda p, v, q: universal_kriging(p, v, q, model, degree=degree)
    elif method == "geo":
        # model is refit per tile from the local residual field (iterated
        # GLS), so the caller-supplied `model` is unused by design
        solver = lambda p, v, q: geo_kriging(p, v, q, degree=degree)
    else:
        raise ValueError(f"unknown kriging method {method!r}")

    cw, ch = layout.cell_width, layout.cell_height
    r = buffer_cells
    df = (
        points.withColumn("xmin", F.col(x) - F.lit(r * cw))
        .withColumn("xmax", F.col(x) + F.lit(r * cw))
        .withColumn("ymin", F.col(y) - F.lit(r * ch))
        .withColumn("ymax", F.col(y) + F.lit(r * ch))
    )
    exploded = explode_covering_keys(df, layout, zoom).select(
        "zoom", "col", "row", x, y, value_col
    )
    mt = layout.map_transform
    tc, tr = layout.tile_layout.tile_cols, layout.tile_layout.tile_rows

    def krige(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[0]
        col, row = int(first["col"]), int(first["row"])
        if len(pdf) < 3:
            return pd.DataFrame(
                {c: [] for c in ("col", "row", "px", "py", "val", "kvar")}
            )
        if len(pdf) > max_samples_per_tile:
            pdf = pdf.sort_values([x, y]).iloc[
                :: max(1, len(pdf) // max_samples_per_tile)
            ].iloc[:max_samples_per_tile]
        ext = mt.extent_for_key(col, row)
        cxs = ext.xmin + (np.arange(tc) + 0.5) * cw
        cys = ext.ymax - (np.arange(tr) + 0.5) * ch
        gx, gy = np.meshgrid(cxs, cys)
        q = np.stack([gx.ravel(), gy.ravel()], axis=1)
        pred, var = solver(pdf[[x, y]].values, pdf[value_col].values, q)
        return pd.DataFrame(
            {
                "col": np.full(q.shape[0], col, np.int32),
                "row": np.full(q.shape[0], row, np.int32),
                "px": np.tile(np.arange(tc, dtype=np.int32), tr),
                "py": np.repeat(np.arange(tr, dtype=np.int32), tc),
                "val": pred,
                "kvar": var,
            }
        )

    return exploded.groupBy("zoom", "col", "row").applyInPandas(
        krige, "col int, row int, px int, py int, val double, kvar double"
    )
