"""Similarity search over an embedding column (array<float>).

Two tiers, mirroring what a 100 TB corpus needs:
  - ``cosine_topk``: brute-force exact top-k — broadcast the (small) query
    set, one narrow pass over candidates, per-query top-k via window.
    O(N·Q·d) flops all inside codegen (``aggregate``/``zip_with`` fold —
    sequential, so bit-identical to the DuckDB oracle's ``list_reduce``).
  - ``lsh_bucket_topk``: the scale path — sign-of-hyperplane LSH buckets on
    BOTH sides, equi-join on bucket, top-k within. Deterministic integer
    hyperplanes (no RNG), so results are reproducible and oracle-checkable.

Embedding near-duplicate detection (`cosine_dup_pairs`) rides the same
bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dot_expr(a: str, b: str) -> str:
    """Sequential-fold dot product of two float arrays, f64 accumulation."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def _batch_topk(k: int, query_id: str, cand_id: str):
    """Arrow-batch-local top-k per query: exact pre-aggregation (the global
    top-k is a subset of the union of per-batch top-ks), so the window
    shuffle carries <= n_batches*Q*k rows instead of all N*Q scored rows."""
    import pandas as pd  # noqa: F401  (pandas ships with the worker)

    def run(it):
        for pdf in it:
            if len(pdf):
                yield (
                    pdf.sort_values(["sim", cand_id], ascending=[False, True])
                    .groupby(query_id, sort=False)
                    .head(k)
                )

    return run


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    cand_id: str = "vec_id",
    query_id: str = "query_id",
    emb: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query. Queries broadcast; scoring
    is a narrow codegen pass. The scored rows are reduced map-side by an
    exact per-batch top-k (selection only — sim values stay the JVM fold
    results), so the row_number window's shuffle is bounded by
    n_batches*Q*k, not the N*Q cross-product."""
    q = queries.select(
        F.col(query_id), F.col(emb).alias("_qemb")
    )
    sim = (
        candidates.crossJoin(F.broadcast(q))
        .withColumn(
            "sim",
            F.expr(
                f"{dot_expr(emb, '_qemb')} / ({norm_expr(emb)} * {norm_expr('_qemb')})"
            ),
        )
        .select(query_id, F.col(cand_id), "sim")
    )
    sim = sim.mapInPandas(_batch_topk(k, query_id, cand_id), sim.schema)
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(cand_id))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .withColumn("sim", F.round("sim", 4))
    )


def hyperplane_expr(emb: str, plane: int, dim: int) -> str:
    """Sign bit of <emb, H_plane> for the deterministic integer hyperplane
    H_plane[i] = ((i*2654435761 + plane*40503) % 1021) - 510 (Knuth/Fibonacci
    multipliers mod prime — fixed, reproducible, oracle-matching)."""
    terms = f"zip_with({emb}, sequence(0, {dim - 1}), (x, i) -> " \
        f"CAST(x AS DOUBLE) * (CAST((i * 2654435761 + {plane} * 40503) % 1021 AS DOUBLE) - 510.0))"
    s = f"aggregate({terms}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    return f"CASE WHEN {s} >= 0 THEN 1 ELSE 0 END"


def bucket_expr(emb: str, planes: list[int], dim: int) -> str:
    """Pack the sign bits of the given planes into one int bucket id."""
    bits = " + ".join(
        f"({hyperplane_expr(emb, p, dim)}) * {1 << j}" for j, p in enumerate(planes)
    )
    return f"CAST({bits} AS INT)"


def with_lsh_bucket(df: DataFrame, emb: str = "embedding", n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Pack n_planes sign bits into one int bucket id (2^n_planes buckets)."""
    return df.withColumn(
        "bucket", F.expr(bucket_expr(emb, list(range(n_planes)), dim))
    )


def with_banded_buckets(
    df: DataFrame,
    emb: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Banded multi-table LSH: n_bands independent tables, each hashing a
    disjoint slice of n_planes/n_bands hyperplanes -> one (band, bucket)
    row per input row per band. More planes per table shrink hot buckets;
    multiple tables restore recall (candidate if ANY band matches) — the
    same band trick the minhash pipeline uses.

    All n_planes sign folds are computed in ONE projection (one scan of the
    source); per-band buckets are bit slices of that packed int via a cheap
    sequence-explode — not a per-band union re-scanning the input."""
    rb = n_planes // n_bands
    allbits = bucket_expr(emb, list(range(n_planes)), dim)
    return (
        df.withColumn("_ab", F.expr(allbits))
        .withColumn("band", F.explode(F.expr(f"sequence(0, {n_bands - 1})")))
        .withColumn(
            "bucket",
            F.expr(f"CAST(shiftright(_ab, band * {rb}) & {(1 << rb) - 1} AS INT)"),
        )
        .drop("_ab")
    )


def lsh_bucket_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    cand_id: str = "vec_id",
    query_id: str = "query_id",
    emb: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates sharing an LSH bucket with the
    query (in ANY band — multi-table probing) are scored. At scale both
    sides hash on (band, bucket) (one shuffle each, or broadcast for small
    query sets); per-table selectivity is n_planes/n_bands sign bits and
    recall is restored by the band union. n_bands=1 is the single-table
    form."""
    c = with_banded_buckets(candidates, emb, n_planes, n_bands, dim)
    q = with_banded_buckets(queries, emb, n_planes, n_bands, dim).select(
        query_id, "band", "bucket", F.col(emb).alias("_qemb")
    )
    sim = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .select(query_id, F.col(cand_id), emb, "_qemb")
        .distinct()
        .withColumn(
            "sim",
            F.expr(
                f"{dot_expr(emb, '_qemb')} / ({norm_expr(emb)} * {norm_expr('_qemb')})"
            ),
        )
        .select(query_id, F.col(cand_id), "sim")
    )
    sim = sim.mapInPandas(_batch_topk(k, query_id, cand_id), sim.schema)
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(cand_id))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .withColumn("sim", F.round("sim", 4))
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    emb: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: banded multi-table LSH candidates +
    exact cosine refine. Defaults (16 planes / 4 bands of 4) keep per-table
    buckets small at scale while any-band matching keeps recall: a pair at
    angle theta is a candidate with prob 1-(1-(1-theta/pi)^4)^4. (The old
    single-table n_planes=4 default degraded toward N^2/16 pairs — a
    scale-killer.) max_bucket drops degenerate hot buckets (boilerplate/
    zero vectors) before the self-join, bounding pair output; n_bands=1
    reproduces the single-table behavior."""
    from .dedup import _cap_buckets

    banded = with_banded_buckets(df, emb, n_planes, n_bands, dim).select(
        id_col, "band", "bucket"
    )
    if max_bucket is not None:
        banded = _cap_buckets(banded, ["band", "bucket"], max_bucket, "cosine_dup")
    a, c = banded.alias("a"), banded.alias("c")
    cand = (
        a.join(c, ["band", "bucket"])
        .where(F.expr(f"a.{id_col} < c.{id_col}"))
        .select(
            F.expr(f"a.{id_col}").alias("vec_a"),
            F.expr(f"c.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    e1 = df.select(F.col(id_col).alias("vec_a"), F.col(emb).alias("_ea"))
    e2 = df.select(F.col(id_col).alias("vec_b"), F.col(emb).alias("_eb"))
    return (
        cand.join(e1, "vec_a")
        .join(e2, "vec_b")
        .withColumn(
            "sim",
            F.expr(
                f"{dot_expr('_ea', '_eb')} / ({norm_expr('_ea')} * {norm_expr('_eb')})"
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 4).alias("sim"))
    )
