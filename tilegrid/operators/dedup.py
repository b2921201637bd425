"""Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
n-gram Jaccard — the canonical shape: shingle -> minhash -> band ->
bucket-join, one narrow signature pass + one equi-join shuffle at 100 TB.

Signatures are computed in a single vectorized Arrow pass (mapInPandas):
one md5 per shingle, then a Kirsch-Mitzenmacher double-hash family
h_j = (h1 + j*h2) & MASK56 derives all N_MINHASH functions (h1/h2 = two
56-bit halves of the md5). The UDF is also a materialization boundary —
Catalyst would otherwise inline the signature expression into every band
projection and both sides of the self-join (observed 80x blowup).

md5 produces identical hex in Spark, Python (hashlib) and DuckDB, so the
SQL oracle twins in ``tilegrid.queries`` are bit-exact.
"""

from __future__ import annotations

import hashlib
import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .text import NORMALIZE_RE, tokens_expr

N_MINHASH = 8
BAND_ROWS = 2  # 8 hashes -> 4 bands of 2: ~Jaccard 0.5+ pairs surface
MASK56 = (1 << 56) - 1
_NORM = _re.compile(NORMALIZE_RE)


def _py_tokens(text: str) -> list[str]:
    return [t for t in _NORM.sub(" ", text.lower()).split(" ") if t]


def hash60_expr(s: str, dialect: str = "spark") -> str:
    """60-bit integer hash of string expression `s` (md5-prefix, base-16)."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


def shingles_expr(tok_arr: str, n: int = 3, dialect: str = "spark") -> str:
    """Word n-gram shingle array from a token-array expression."""
    if dialect == "spark":
        gram = " , ' ', ".join(f"{tok_arr}[i + {j}]" for j in range(n)).join(
            ["concat(", ")"]
        )
        return (
            f"CASE WHEN size({tok_arr}) >= {n} THEN "
            f"transform(sequence(0, size({tok_arr}) - {n}), i -> {gram}) "
            f"ELSE array() END"
        )
    gram = " || ' ' || ".join(f"{tok_arr}[i + {j}]" for j in range(1, n + 1))
    return (
        f"list_transform(range(0, greatest(len({tok_arr}) - {n - 1}, 0)),"
        f" i -> {gram})"
    )


def minhash_sig_exprs(sh_arr: str, dialect: str = "duckdb") -> list[str]:
    """N_MINHASH oracle-SQL expressions: min over shingles of
    h_j = (h1 + j*h2) & MASK56 where (h1, h2) are md5 hex chars 1-14 and
    15-28 parsed base-16 — the exact math `with_minhash` computes in its
    Arrow pass. Empty shingle sets degrade to [md5('')]."""
    if dialect == "spark":
        h1 = "CAST(conv(substr(m, 1, 14), 16, 10) AS BIGINT)"
        h2 = "CAST(conv(substr(m, 15, 14), 16, 10) AS BIGINT)"
        md5s = (
            f"CASE WHEN size({sh_arr}) = 0 THEN array(md5('')) "
            f"ELSE transform({sh_arr}, s -> md5(s)) END"
        )
        return [
            f"array_min(transform({md5s}, m -> ({h1} + {j} * {h2}) & {MASK56}))"
            for j in range(N_MINHASH)
        ]
    h1 = "(('0x' || substr(m, 1, 14))::BIGINT)"
    h2 = "(('0x' || substr(m, 15, 14))::BIGINT)"
    md5s = (
        f"CASE WHEN len({sh_arr}) = 0 THEN [md5('')] "
        f"ELSE list_transform({sh_arr}, s -> md5(s)) END"
    )
    return [
        f"list_min(list_transform({md5s}, m -> ({h1} + {j} * {h2}) & {MASK56}))"
        for j in range(N_MINHASH)
    ]


def with_minhash_sql(df: DataFrame, text_col: str = "text") -> DataFrame:
    """JVM-expression twin of `with_minhash`: tokenize/shingle/md5 in
    codegen, one md5 pass materialized via persist() (the boundary stops
    Catalyst re-inlining the md5 array into all N_MINHASH projections —
    the observed 80x blowup), then N_MINHASH array_min folds over the
    cached (h1, h2) arrays. Bit-identical to the Arrow pass by
    construction (same md5 / double-hash math).

    Measured (tools/sig_bench.py, 24k docs x ~120 tokens, local[8]):
    Arrow 2.8s vs SQL 5.7s — the Arrow/NumPy pass is ~2x FASTER than
    this codegen path — per-shingle
    md5 through Spark's expression interpreter allocates per element,
    while hashlib.md5 over a batched Python loop stays in C. Kept for
    environments where Python workers are the bottleneck; `with_minhash`
    remains the default signature pass."""
    toks = tokens_expr(text_col, "spark")
    sh = shingles_expr("_toks", 3, "spark")
    md5s = (
        "CASE WHEN size(_sh) = 0 THEN array(md5('')) "
        "ELSE transform(_sh, s -> md5(s)) END"
    )
    staged = (
        df.withColumn("_toks", F.expr(toks))
        .withColumn("_sh", F.expr(sh))
        .withColumn(
            "_h1",
            F.expr(f"transform({md5s}, m -> CAST(conv(substr(m, 1, 14), 16, 10) AS BIGINT))"),
        )
        .withColumn(
            "_h2",
            F.expr(f"transform({md5s}, m -> CAST(conv(substr(m, 15, 14), 16, 10) AS BIGINT))"),
        )
        .drop("_toks", "_sh")
        .persist()
    )
    out = staged
    for j in range(N_MINHASH):
        out = out.withColumn(
            f"sig_{j}",
            F.expr(
                f"array_min(zip_with(_h1, _h2, (a, b) -> (a + {j} * b) & {MASK56}))"
            ),
        )
    return out.drop("_h1", "_h2")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash; canonical = min id.
    One map + one groupBy shuffle on the 128-bit hash (no skew: uniform)."""
    return (
        df.withColumn("text_hash", F.expr(f"md5({text_col})"))
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def cluster_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components over the duplicate-pair graph -> one canonical
    id per cluster: every document labels itself with the MIN doc id
    reachable through pairs, so keep-one-per-cluster dedup is
    `where(doc_id = cluster_id)`. Documents appearing in no pair are
    singleton clusters of themselves.

    Distributed min-label propagation with pointer jumping (label <- label
    of label each round), so convergence is O(log diameter) rounds rather
    than O(diameter) — the hash-to-min idea of Rastogi et al.'s connected
    components in MapReduce. Per round: one edge-label join + one
    label-label join, both hash-partitioned on the join key; the
    convergence probe is a single O(1)-row xor-fingerprint aggregate (no
    label-set comparison join). 100 TB shape: edges/labels shuffle on
    uniform ids; real dup clusters are shallow, so rounds ~ a handful.
    Returns (doc_id, cluster_id)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    # propagate ONLY over nodes that appear in a pair: documents in no pair
    # never change label (they are singletons of themselves) and re-joining
    # them through every round would shuffle the whole corpus per round —
    # the pair-graph node set is dup-cluster members only, typically orders
    # of magnitude smaller than the corpus at 100 TB. Singletons rejoin via
    # one left join at the end.
    # localCheckpoint, not persist: each round's plan must stay O(1) — a
    # persisted-but-lazy lineage regrows the full previous-round plan at
    # ANALYSIS time every round (measured doubling per round once labels
    # shrank to broadcast size; see vectorize._merged_labels rationale)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    fp_expr = F.expr(
        "bit_xor(xxhash64(concat(cast(node as string), ':', cast(lbl as string))))"
    )
    prev_fp = labels.agg(fp_expr).collect()[0][0]
    for _ in range(max_rounds):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src").agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                labels["node"],
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias("lbl"),
            )
        )
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("lbl").alias("plbl"))
        new_labels = (
            stepped.join(ptr, stepped["lbl"] == ptr["pnode"], "left")
            .select(
                stepped["node"],
                F.least(F.col("lbl"), F.coalesce("plbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()  # eager; truncates lineage (see init note)
        )
        fp = new_labels.agg(fp_expr).collect()[0][0]
        labels = new_labels
        if fp == prev_fp:
            break
        prev_fp = fp
    edges.unpersist()
    return (
        docs.select(id_col)
        .join(labels, docs[id_col] == labels["node"], "left")
        .select(
            docs[id_col],
            F.coalesce("lbl", docs[id_col]).alias("cluster_id"),
        )
    )


def with_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add sig_0..sig_{N-1} BIGINT minhash columns in ONE vectorized Arrow
    pass: tokenize -> 3-shingles -> one md5/shingle -> double-hash family ->
    per-function min (NumPy). Narrow (no shuffle); the UDF node is a
    materialization boundary (see module docstring)."""
    schema = StructType(
        df.schema.fields
        + [StructField(f"sig_{j}", LongType()) for j in range(N_MINHASH)]
    )
    jj = np.arange(N_MINHASH, dtype=np.int64)

    def run(it):
        for pdf in it:
            sigs = np.empty((len(pdf), N_MINHASH), dtype=np.int64)
            for r, text in enumerate(pdf[text_col]):
                toks = _py_tokens(text)
                sh = [
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                ] or [""]
                hx = [hashlib.md5(s.encode()).hexdigest() for s in sh]
                h12 = np.array(
                    [(int(m[:14], 16), int(m[14:28], 16)) for m in hx],
                    dtype=np.int64,
                )
                vals = (h12[:, 0:1] + jj * h12[:, 1:2]) & MASK56
                sigs[r] = vals.min(axis=0)
            out = pdf.copy()
            for j in range(N_MINHASH):
                out[f"sig_{j}"] = sigs[:, j]
            yield out

    return df.mapInPandas(run, schema)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band (BAND_ROWS
    consecutive sigs) -> same bucket -> pair. Output (doc_a, doc_b,
    n_shared_bands). The only shuffle is groupBy/join on band buckets.

    max_bucket caps hot buckets (boilerplate docs are the skew risk at
    scale: one 10^6-doc bucket would emit 10^12 pairs): (band, bucket)
    groups larger than max_bucket are DROPPED before the self-join — pair
    output per bucket is bounded by max_bucket^2 — and the number of
    dropped buckets is logged to stderr.

    materialize=True persists the signature stage so the band projections
    and both sides of the self-join read the computed signatures instead of
    re-running the Arrow pass (at warehouse scale the signatures would be
    written to a table instead)."""
    sigs = with_minhash(df, text_col).select(
        id_col, *[f"sig_{j}" for j in range(N_MINHASH)]
    )
    if materialize:
        sigs = sigs.persist()
    n_bands = N_MINHASH // BAND_ROWS
    bands = None
    for b in range(n_bands):
        cols = " , '|', ".join(
            f"CAST(sig_{b * BAND_ROWS + r} AS STRING)" for r in range(BAND_ROWS)
        )
        part = sigs.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            F.expr(f"md5(concat({cols}))").alias("bucket"),
        )
        bands = part if bands is None else bands.unionByName(part)
    if max_bucket is not None:
        bands = _cap_buckets(bands, ["band", "bucket"], max_bucket, "minhash_lsh")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.expr(f"a.{id_col} < b.{id_col}"))
        .select(
            F.expr(f"a.{id_col}").alias("doc_a"),
            F.expr(f"b.{id_col}").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared_bands"))
    )
    return pairs


def _cap_buckets(
    bands: DataFrame, keys: list[str], max_bucket: int, tag: str
) -> DataFrame:
    """Drop LSH buckets larger than max_bucket before a self-join (bounded
    pair output), logging how many buckets/rows were dropped. The count
    aggregation shuffles only (keys, count) partials — cheap next to the
    self-join it protects."""
    import sys

    counts = bands.groupBy(*keys).agg(F.count("*").alias("_bc")).persist()
    dropped = counts.where(F.col("_bc") > max_bucket)
    n_dropped = dropped.count()
    if n_dropped:
        n_rows = dropped.agg(F.sum("_bc")).collect()[0][0]
        print(
            f"[{tag}] dropped {n_dropped} hot buckets (> {max_bucket} rows; "
            f"{n_rows} rows total) before self-join",
            file=sys.stderr,
        )
    ok = counts.where(F.col("_bc") <= max_bucket).select(*keys)
    # counts stays persisted until the join consumes it; blocking=False
    # unpersist after the plan is built would drop it before execution, so
    # rely on LRU eviction (the cached partials are tiny: one row/bucket)
    return bands.join(ok, keys)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash: per-token 60-bit md5-prefix hash, bitwise majority
    vote over the token multiset, packed to one BIGINT. One vectorized
    Arrow pass (NumPy bit matrix), zero shuffle. (An equivalent pure-SQL
    expression exists — see the oracle twin — but O(60·n_tokens) nested
    folds in codegen measured ~10x slower than the NumPy vote.)"""
    schema = StructType(df.schema.fields + [StructField("simhash", LongType())])
    bitpos = np.arange(60, dtype=np.int64)

    def run(it):
        for pdf in it:
            out_v = np.empty(len(pdf), dtype=np.int64)
            for r, text in enumerate(pdf[text_col]):
                toks = _py_tokens(text)
                if toks:
                    hs = np.array(
                        [
                            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                            for t in toks
                        ],
                        dtype=np.int64,
                    )
                    votes = (2 * ((hs[:, None] >> bitpos) & 1) - 1).sum(axis=0)
                else:
                    votes = np.zeros(60, dtype=np.int64)
                out_v[r] = int(((votes >= 0).astype(np.int64) << bitpos).sum())
            out = pdf.copy()
            out["simhash"] = out_v
            yield out

    return df.mapInPandas(run, schema)


def hamming_dup_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    hash_col: str = "phash",
    max_hamming: int = 8,
    nbits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs over a fixed-width integer hash column by
    Hamming distance — THE image-dedup op for the corpus's `phash` column
    (perceptual hashes of near-identical images differ in a few bits).

    EXACT by pigeonhole: the hash is partitioned into exactly
    max_hamming + 1 disjoint bit bands that together cover all `nbits`
    (band j spans bits floor(j*nbits/(m+1)) .. floor((j+1)*nbits/(m+1))-1,
    so widths differ by at most one and no band shifts past the word); any
    pair within distance max_hamming agrees on >= 1 band, so a band
    equi-join + bit_count(xor) refine returns exactly the pairs a
    brute-force O(n^2) scan would. The only shuffle is the (band, bucket)
    equi-join — never a cross join — and `max_bucket` bounds hot buckets
    (flat/monochrome images collapse to few hash values at scale) the same
    way minhash_lsh_pairs does. Output (id_a, id_b, hamming), id_a < id_b.
    All expressions are codegen bit ops; no Python in the path."""
    m1 = max_hamming + 1
    if nbits < m1:
        raise ValueError(f"nbits={nbits} < max_hamming+1={m1}: bands can't cover")
    cuts = [(j * nbits) // m1 for j in range(m1 + 1)]
    band_exprs = []
    for j in range(m1):
        lo, w = cuts[j], cuts[j + 1] - cuts[j]
        mask = (1 << w) - 1
        band_exprs.append(
            F.struct(
                F.lit(j).alias("band"),
                F.expr(
                    f"shiftrightunsigned({hash_col}, {lo}) & {mask}"
                ).alias("bucket"),
            )
        )
    bands = df.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(F.array(*band_exprs)).alias("bb"),
    ).select(id_col, hash_col, "bb.band", "bb.bucket")
    if max_bucket is not None:
        bands = _cap_buckets(bands, ["band", "bucket"], max_bucket, "hamming_dup")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.expr(f"a.{id_col} < b.{id_col}"))
        .select(
            F.expr(f"a.{id_col}").alias("id_a"),
            F.expr(f"b.{id_col}").alias("id_b"),
            F.expr(f"CAST(bit_count(a.{hash_col} ^ b.{hash_col}) AS INT)")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle (within
    an optional blocking column to bound the self-join). inter/union counts
    are integers -> the ratio is deterministic. Shuffles: explode->groupBy
    on shingle (uniform md5 — no skew), then pair aggregation."""
    base = (
        df.withColumn("_toks", F.expr(tokens_expr(text_col)))
        .withColumn("sh", F.expr(f"array_distinct({shingles_expr('_toks')})"))
        .select(id_col, *( [block_col] if block_col else [] ), "sh")
    )
    sizes = base.select(
        F.col(id_col), F.expr("CAST(size(sh) AS BIGINT)").alias("n_sh")
    )
    ex = base.select(
        id_col, *( [block_col] if block_col else [] ), F.explode("sh").alias("shingle")
    )
    jk = ["shingle"] + ([block_col] if block_col else [])
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, jk)
        .where(F.expr(f"a.{id_col} < b.{id_col}"))
        .groupBy(
            F.expr(f"a.{id_col}").alias("doc_a"), F.expr(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.expr("round(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6)"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


def chunk_exprs(tok_arr: str, width: int, dialect: str = "spark") -> str:
    """SQL expression: non-overlapping `width`-token chunks of the token
    array expression `tok_arr` (space-joined; full windows only, so the
    chunking is alignment-stable and a doc shorter than `width` tokens
    yields an empty array in both dialects)."""
    if dialect == "spark":
        return (
            f"CASE WHEN size({tok_arr}) >= {width} THEN "
            f"transform(sequence(1, size({tok_arr}) - {width - 1}, {width}), "
            f"i -> concat_ws(' ', slice({tok_arr}, i, {width}))) "
            f"ELSE array() END"
        )
    return (
        f"list_transform(range(1, greatest(len({tok_arr}) - {width - 1}, 0) + 1,"
        f" {width}), i -> array_to_string({tok_arr}[i:i+{width - 1}], ' '))"
    )


def chunk_dedup_stats(
    df: DataFrame,
    width: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-level (sub-document) duplication signal: chunk each doc
    into non-overlapping `width`-token windows and report, per document,
    how many of its chunks also occur in at least one OTHER document.
    This is the C4-style "duplicated span" pass (C4 drops any three-
    sentence span seen before) expressed as a per-doc statistic a cleaning
    rule can threshold on — exact doc-level dedup misses boilerplate
    shared across otherwise-distinct pages; this catches it.

    Shape for 100 TB: chunks are keyed by a 60-bit md5-derived integer
    (fixed-width shuffle key instead of the chunk text), one
    groupBy(chunk_key) with map-side partial aggregation counting distinct
    docs per chunk (uniform hash keys — no skew), an equi-join back, and
    one groupBy(doc_id). Two bounded shuffles, both on uniform keys;
    linear in corpus size.

    Output: id_col, n_chunks, dup_chunks, dup_chunk_frac (6dp; 0.0 for
    docs shorter than `width` tokens).
    """
    from .text import fan_out

    toks = tokens_expr(text_col)
    chunks = chunk_exprs("toks", width)
    key = hash60_expr("c")
    df = fan_out(df, id_col)
    # persist(): Generate would otherwise re-evaluate the inlined
    # tokenize+chunk+md5 pipeline per output chunk (see decontaminate /
    # with_minhash_sql — the same Catalyst re-inlining trap)
    base = df.select(F.col(id_col), F.expr(toks).alias("toks")).select(
        F.col(id_col),
        F.expr(f"transform({chunks}, c -> {key})").alias("keys"),
    ).persist()
    ex = base.select(F.col(id_col), F.explode("keys").alias("k"))
    ndocs = ex.groupBy("k").agg(F.countDistinct(id_col).alias("ndocs"))
    per = (
        ex.join(ndocs, "k")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_chunks"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("dup_chunks", F.lit(0)).cast("long").alias("dup_chunks"),
            F.round(
                F.coalesce(
                    F.col("dup_chunks").cast("double") / F.col("n_chunks"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


def keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection — the step AFTER clustering: per dup
    cluster keep the highest-`score_col` member (tie -> lowest id), the
    "keep longest / keep best-quality" dedup policy of production corpus
    pipelines. Output (cluster_id, keep_id, score, n_members).

    Deterministic and window-free: the winner is a single hash aggregation
    of max(struct(score, -id)) — struct comparison is lexicographic, so
    ties fall to the smallest id — plus the member count; no per-cluster
    sort, so a pathological mega-cluster costs a partial-aggregated max,
    not an O(n log n) window. One doc_id equi-join (uniform key), one
    groupBy on cluster_id."""
    j = docs.select(id_col, score_col).join(clusters, id_col)
    agg = j.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col(score_col).alias("s"), (-F.col(id_col)).alias("nid")
            )
        ).alias("best"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return agg.select(
        "cluster_id",
        (-F.col("best.nid")).alias("keep_id"),
        F.col("best.s").alias("score"),
        "n_members",
    )
