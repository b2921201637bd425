"""Corpus QA profiling + shuffle-skew diagnosis (beyond-reference ops).

Before a 100 TB corpus is tiled, joined, or fed to training, two questions
gate everything downstream: *is the data what the schema claims* (null
rates, cardinalities, value ranges — a silently-null caption column wastes
a full training run) and *which keys will melt the shuffle* (one hot H3
cell / boilerplate doc hash can hold a 1000-executor stage hostage; the
tiler's census-then-salt path, tiler.py:380, needs exactly this census as
its input signal).

Both ops are single-purpose DataFrame plans:

- ``profile_columns``: ONE aggregation pass over the scan (multi-column
  distinct counts share Spark's Expand-based partial aggregation, so the
  scan is read once however many columns are profiled), then a ``stack``
  pivot to one row per column. All outputs are exact integers or native
  min/max rendered to strings — no engine-dependent float formatting, so
  the DuckDB oracle hash-matches bit-for-bit.
- ``key_skew``: per-key counts (one shuffle on the key — the same shuffle
  any downstream groupBy would pay, so the census costs what it measures),
  a broadcast of the O(1)-row totals, and exact integer-division ratios:
  ``share_ppm`` (key's share of all rows, parts-per-million) and
  ``xmean_milli`` (count as a multiple of the mean key count, milli-x).
  A key with xmean_milli 50_000 is 50x the mean — the signal that routes
  it to the salted two-phase path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass per-column QA stats: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s, total_len). min/max compare on the NATIVE type (numeric
    order for numerics) and only the result is rendered to string;
    total_len is the exact BIGINT sum of string-rendered lengths."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.sum(F.length(F.col(c).cast("string")).cast("bigint"))
            .alias(f"{c}__len"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max, {c}__len"
        for c in cols
    )
    return row.selectExpr(
        "_n",
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_nulls, n_distinct, min_s, max_s, total_len)",
    ).select(
        "column",
        F.col("_n").alias("n_rows"),
        "n_nulls",
        "n_distinct",
        "min_s",
        "max_s",
        "total_len",
    )


def key_skew(
    df: DataFrame, key_cols: list[str], top: int = 15
) -> DataFrame:
    """Hot-key census: the `top` heaviest keys with exact integer ratios
    share_ppm = n*1e6 div total and xmean_milli = n*n_keys*1000 div total.
    Deterministic order (n desc, then keys)."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            *key_cols,
            "n",
            F.expr("(n * 1000000) DIV _total").alias("share_ppm"),
            F.expr("(n * _n_keys * 1000) DIV _total").alias("xmean_milli"),
        )
        .orderBy(F.desc("n"), *key_cols)
        .limit(top)
    )
