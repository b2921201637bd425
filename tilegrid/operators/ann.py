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


# ---------------------------------------------------------------- IVF


def _lit_array(vals) -> str:
    """SQL array literal of DOUBLE values (repr round-trips exactly)."""
    return "array(" + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vals) + ")"


def train_ivf_centroids(
    df: DataFrame,
    n_list: int,
    cand_id: str = "vec_id",
    emb: str = "embedding",
    lloyd_iters: int = 0,
) -> list:
    """Coarse quantizer for an IVF index: ``n_list`` centroid vectors.

    Base quantizer is a deterministic hash-ordered sample — the ``n_list``
    smallest rows by ``md5(cast(id as string))``. Spark plans the
    orderBy+limit as a distributed TakeOrdered (per-partition top-k +
    driver merge of n_list rows), NOT a full sort, so this is O(N) scan +
    O(n_list) driver state at any scale, and it is reproducible (no RNG) —
    the same sample a SQL oracle computes with row_number()/QUALIFY.

    ``lloyd_iters`` > 0 runs that many k-means (Lloyd) refinement rounds:
    assignment is the same in-codegen argmax pass used by ``assign_lists``
    (no shuffle), and the recenter step is a map-side partial (sum, count)
    per list via mapInPandas followed by a driver combine of n_list
    partials — the classic distributed k-means shape. Refined centroids
    are no longer SQL-reproducible, so contract queries use iters=0.

    Returns a list of (list_id, [float64 values]) on the driver (tiny:
    n_list x dim), ready to broadcast or inline as literals.
    """
    base = (
        df.select(F.col(cand_id), F.col(emb))
        .orderBy(F.md5(F.col(cand_id).cast("string")), F.col(cand_id))
        .limit(n_list)
        .collect()
    )
    cents = [[float(x) for x in r[emb]] for r in base]
    for _ in range(lloyd_iters):
        import numpy as np

        expr = _argmax_list_expr(emb, cents)
        assigned = df.select(F.col(emb), F.expr(expr).alias("list_id"))

        def partials(it):
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                m = np.stack(pdf[emb].values).astype(np.float64)
                lid = pdf["list_id"].values
                rows = []
                for j in set(lid.tolist()):
                    sel = m[lid == j]
                    rows.append(
                        {"list_id": j, "n": len(sel), "vsum": sel.sum(0).tolist()}
                    )
                yield pd.DataFrame(rows)

        agg = assigned.mapInPandas(
            partials, "list_id int, n long, vsum array<double>"
        ).collect()
        sums: dict = {}
        counts: dict = {}
        for r in agg:
            j = r["list_id"]
            counts[j] = counts.get(j, 0) + r["n"]
            acc = sums.get(j)
            sums[j] = (
                [a + b for a, b in zip(acc, r["vsum"])] if acc else list(r["vsum"])
            )
        cents = [
            [s / counts[j] for s in sums[j]] if j in sums else cents[j]
            for j in range(len(cents))
        ]
    return list(enumerate(cents))


def _sim_to_lit(emb: str, vals) -> str:
    """Cosine similarity of column `emb` to a literal centroid, with the
    same sequential f64 fold as dot_expr (bit-identical to the oracle)."""
    lit = _lit_array(vals)
    return f"{dot_expr(emb, lit)} / ({norm_expr(emb)} * {norm_expr(lit)})"


def _argmax_list_expr(emb: str, cents) -> str:
    """list_id of the nearest (max-cosine) centroid, ties to the smaller
    list_id, as ONE codegen expression: greatest over (sim, -list_id)
    structs — no join, no shuffle, no extra rows."""
    cents = enumerate_cents(cents)
    structs = ", ".join(
        f"named_struct('s', {_sim_to_lit(emb, c)}, 'nid', {-j})"
        for j, c in enumerate(cents)
    )
    return f"CAST(-greatest({structs}).nid AS INT)"


def enumerate_cents(cents):
    """Accept either [(list_id, vec), ...] or [vec, ...]."""
    if cents and isinstance(cents[0], (tuple, list)) and len(cents[0]) == 2 \
            and isinstance(cents[0][0], int):
        return [v for _, v in cents]
    return list(cents)


def _probe_lists_expr(emb: str, cents, n_probe: int) -> str:
    """Array of the n_probe nearest list_ids for a query vector, ordered by
    (sim desc, list_id asc) — array_sort over (-sim, list_id) structs then
    slice: pure codegen, no shuffle."""
    cents = enumerate_cents(cents)
    structs = ", ".join(
        f"named_struct('ns', -({_sim_to_lit(emb, c)}), 'id', {j})"
        for j, c in enumerate(cents)
    )
    return (
        f"transform(slice(array_sort(array({structs})), 1, {n_probe}), x -> x.id)"
    )


def assign_lists(
    df: DataFrame,
    centroids,
    cand_id: str = "vec_id",
    emb: str = "embedding",
) -> DataFrame:
    """IVF list assignment: adds ``list_id`` = nearest centroid, computed
    in one whole-stage-codegen projection (O(n_list*d) flops per row, zero
    shuffle). At 100 TB this column doubles as the storage bucketing key —
    write the corpus partitioned by list_id and probes become partition
    pruning."""
    return df.withColumn("list_id", F.expr(_argmax_list_expr(emb, centroids)))


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    n_list: int = 8,
    n_probe: int = 2,
    cand_id: str = "vec_id",
    query_id: str = "query_id",
    emb: str = "embedding",
    centroids=None,
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF-Flat approximate nearest neighbours (the FAISS IVF shape,
    re-expressed relationally): coarse-quantize candidates into n_list
    inverted lists, probe each query's n_probe nearest lists only, exact
    cosine refine + per-query top-k inside the probed lists.

    Scale shape: assignment and probing are shuffle-free codegen passes;
    the only join is candidates ⨝ broadcast(probes) on list_id — with the
    corpus pre-bucketed by list_id this is a pruned scan of
    n_probe/n_list of the data. n_probe = n_list degrades gracefully to
    exact brute force (recall 1.0) — asserted in tests.
    """
    cents = centroids or train_ivf_centroids(
        candidates, n_list, cand_id, emb, lloyd_iters
    )
    assigned = assign_lists(candidates, cents, cand_id, emb)
    probes = (
        queries.select(
            F.col(query_id),
            F.col(emb).alias("_qemb"),
            F.explode(F.expr(_probe_lists_expr(emb, cents, n_probe))).alias(
                "list_id"
            ),
        )
    )
    sim = (
        assigned.join(F.broadcast(probes), "list_id")
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


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int,
                cand_id: str = "vec_id",
                query_id: str = "query_id") -> DataFrame:
    """Retrieval quality of an approximate ANN result against the exact
    top-k: per query, recall = |approx ∩ exact-top-k| / |exact-top-k|.
    Deterministic here (hash-derived planes/centroids, fixed tie order),
    so the recall numbers are fixed constants — pytest pins floors and
    BENCH.md reports them. Two small equi-joins over (query, candidate)
    pairs; both inputs are already <= Q*k rows."""
    a = approx.where(F.col("rank") <= k).select(query_id, cand_id)
    e = exact.where(F.col("rank") <= k).select(query_id, cand_id)
    hits = (
        a.join(e, [query_id, cand_id])
        .groupBy(query_id).agg(F.count("*").cast("long").alias("n_hit"))
    )
    per_q = e.groupBy(query_id).agg(
        F.count("*").cast("long").alias("n_exact"))
    return per_q.join(hits, query_id, "left").select(
        F.col(query_id),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        "n_exact",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"))
        .alias("recall"),
    )
