"""Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
n-gram Jaccard. All pure Spark SQL expressions (JVM codegen, no Python UDFs)
— at 100 TB these are a narrow map + one equi-join shuffle on the band/bucket
key, which is the canonical shape (shingle -> minhash -> band -> bucket-join).

Hash function: md5 (identical hex output in Spark and DuckDB, so the oracle
twin in ``tilegrid.queries`` is bit-exact). 60-bit integer hashes are the
first 15 md5 hex chars, parsed base-16 — sign-safe in int64 on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_expr

N_MINHASH = 8
BAND_ROWS = 2  # 8 hashes -> 4 bands of 2: ~Jaccard 0.5+ pairs surface


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


def minhash_sig_exprs(sh_arr: str, dialect: str = "spark") -> list[str]:
    """N_MINHASH expressions: min over shingles of md5(j || '|' || shingle).
    String-min of hex == numeric min of the 128-bit hash; empty shingle set
    degrades to md5 of the empty marker so every row gets a signature."""
    sigs = []
    for j in range(N_MINHASH):
        if dialect == "spark":
            e = (
                f"CASE WHEN size({sh_arr}) = 0 THEN md5('{j}|') ELSE "
                f"array_min(transform({sh_arr}, s -> md5(concat('{j}|', s)))) END"
            )
        else:
            e = (
                f"CASE WHEN len({sh_arr}) = 0 THEN md5('{j}|') ELSE "
                f"list_min(list_transform({sh_arr}, s -> md5('{j}|' || s))) END"
            )
        sigs.append(e)
    return sigs


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


def with_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add sig_0..sig_{N-1} minhash columns (narrow map, codegen)."""
    out = df.withColumn("_toks", F.expr(tokens_expr(text_col))).withColumn(
        "_sh", F.expr(shingles_expr("_toks"))
    )
    for j, e in enumerate(minhash_sig_exprs("_sh")):
        out = out.withColumn(f"sig_{j}", F.expr(e))
    return out.drop("_toks", "_sh")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band (BAND_ROWS
    consecutive sigs) -> same bucket -> pair. Output (doc_a, doc_b,
    n_shared_bands). The only shuffle is groupBy/join on band buckets —
    hot buckets (boilerplate docs) are the skew risk at scale; cap with
    a per-bucket count filter before the self-join."""
    sigs = with_minhash(df, text_col).select(
        id_col, *[f"sig_{j}" for j in range(N_MINHASH)]
    )
    n_bands = N_MINHASH // BAND_ROWS
    bands = None
    for b in range(n_bands):
        cols = ", ".join(f"sig_{b * BAND_ROWS + r}" for r in range(BAND_ROWS))
        part = sigs.select(
            F.col(id_col),
            F.lit(b).alias("band"),
            F.expr(f"md5(concat({cols}))").alias("bucket"),
        )
        bands = part if bands is None else bands.unionByName(part)
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


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash: per-token 60-bit hash, bitwise majority vote over the
    token multiset, packed to one BIGINT. Single codegen'd expression —
    O(60·n_tokens) adds per row, zero shuffle."""
    h = hash60_expr("t")
    return (
        df.withColumn("_toks", F.expr(tokens_expr(text_col)))
        .withColumn("_hs", F.expr(f"transform(_toks, t -> {h})"))
        .withColumn(
            "simhash",
            F.expr(
                "aggregate(sequence(0, 59), 0L, (acc, j) -> acc + "
                "CASE WHEN aggregate(_hs, 0L, (a, h) -> a + "
                "CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) >= 0 "
                "THEN shiftleft(1L, j) ELSE 0L END)"
            ),
        )
        .drop("_toks", "_hs")
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
