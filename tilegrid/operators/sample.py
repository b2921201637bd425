"""Deterministic sampling / splitting for training-data pipelines.

Spark's ``df.sample()`` draws from a per-partition RNG seed: the sampled
set changes under task retry, repartitioning, AQE re-planning, or a
checkpoint resume — unacceptable for a resumable 100 TB pipeline, where a
retried partition would silently change the training set. Everything here
keys membership off a 60-bit md5 hash of a row's stable id
(``dedup.hash60_expr``), so membership is a pure function of the row:
stable across retries, cluster sizes, partitionings, and engines (the
DuckDB oracle replays the identical expression).

Thresholds are precomputed INTEGER literals (``int(fraction * 2**60)``),
so the comparison is exact integer math — no float-rounding drift between
engines. All expressions are codegen; sample/split add zero shuffles (a
narrow filter / projection over the scan, filters pushable past it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import hash60_expr
from .text import sql_str

_SCALE = 1 << 60


def _hash_expr(id_col: str, salt: str, dialect: str = "spark") -> str:
    """60-bit hash of (id, salt); the salt decorrelates independent draws
    (a sample and a split over the same ids must not be correlated)."""
    tag = sql_str("|" + salt)
    if dialect == "spark":
        s = f"concat(CAST({id_col} AS STRING), {tag})"
    else:
        s = f"(CAST({id_col} AS VARCHAR) || {tag})"
    return hash60_expr(s, dialect)


def split_expr(
    weights: dict[str, float], id_col: str, salt: str = "split",
    dialect: str = "spark",
) -> str:
    """CASE expression assigning each row to one named split with the given
    weights (need not sum to exactly 1; they are normalized). Ordered
    cumulative integer thresholds over the id hash."""
    total = sum(weights.values())
    names = list(weights)
    h = _hash_expr(id_col, salt, dialect)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += weights[name] / total
        arms.append(f"WHEN {h} < {int(cum * _SCALE)} THEN {sql_str(name)}")
    return "CASE " + " ".join(arms) + f" ELSE {sql_str(names[-1])} END"


def with_split(
    df: DataFrame, weights: dict[str, float], id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column ('train'/'val'/... per `weights`). Disjoint and
    exhaustive by construction; membership is a pure function of
    (id, salt)."""
    return df.withColumn("split", F.expr(split_expr(weights, id_col, salt)))


def sample_pred(
    fraction: float, id_col: str, salt: str = "sample",
    dialect: str = "spark",
) -> str:
    """Boolean expression: deterministic `fraction` sample of rows by id."""
    return f"{_hash_expr(id_col, salt, dialect)} < {int(fraction * _SCALE)}"


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows. Retry/resume-stable (see
    module docstring); a narrow pushable filter, zero shuffle."""
    return df.where(F.expr(sample_pred(fraction, id_col, salt)))


def stratified_sample_pred(
    fractions: dict[str, float], strata_col: str, id_col: str,
    default: float = 0.0, salt: str = "strata", dialect: str = "spark",
) -> str:
    """Boolean expression: per-stratum deterministic sampling rates (the
    data-mixing primitive: upsample rare sources / downsample dominant
    ones by source or language)."""
    h = _hash_expr(id_col, salt, dialect)
    arms = " ".join(
        f"WHEN {strata_col} = {sql_str(k)} THEN {int(v * _SCALE)}"
        for k, v in fractions.items()
    )
    return f"{h} < (CASE {arms} ELSE {int(default * _SCALE)} END)"


def mix_rows_exprs(
    rates: dict[str, float], strata_col: str, id_col: str,
    default: float = 1.0, salt: str = "mix", dialect: str = "spark",
) -> tuple[str, str, str]:
    """(n_copies_expr, keep_pred_on_copy, order_key_expr) for a weighted
    training mix with OVERSAMPLING: rate r emits floor(r) whole copies of
    each row plus one more with probability frac(r), deterministically
    keyed by (id, salt, copy). copy is the 1-based replica index column
    the caller explodes; order_key is a stable pseudo-random sort key so
    the interleave order of the mixed corpus is also a pure function of
    the data (resume-safe epoch shuffling)."""
    def arms(f):
        body = " ".join(
            f"WHEN {strata_col} = {sql_str(k)} THEN {f(v)}"
            for k, v in rates.items()
        )
        return f"CASE {body} ELSE {f(default)} END"

    import math

    ceil_expr = arms(lambda v: int(math.ceil(v)))
    floor_expr = arms(lambda v: int(math.floor(v)))
    thr_expr = arms(lambda v: int((v - math.floor(v)) * _SCALE))
    tag = sql_str("|" + salt + "|")
    otag = sql_str("|" + salt + "|ord|")
    if dialect == "spark":
        hc = f"concat(CAST({id_col} AS STRING), {tag}, CAST(copy AS STRING))"
    else:
        hc = f"(CAST({id_col} AS VARCHAR) || {tag} || CAST(copy AS VARCHAR))"
    # copy >= 1 guards the rate-0 stratum: Spark's sequence(1, 0) is the
    # DESCENDING [1, 0], so the explode emits a bogus copy=0 replica that
    # `copy <= floor(0)` would otherwise keep (the DuckDB oracle's
    # range(1, 1) emits nothing — engines must agree on zero rows).
    keep = (
        f"(copy >= 1 AND (copy <= {floor_expr}"
        f" OR {hash60_expr(hc, dialect)} < {thr_expr}))"
    )
    if dialect == "spark":
        oc = f"concat(CAST({id_col} AS STRING), {otag}, CAST(copy AS STRING))"
    else:
        oc = f"(CAST({id_col} AS VARCHAR) || {otag} || CAST(copy AS VARCHAR))"
    return ceil_expr, keep, hash60_expr(oc, dialect)


def mix_oversample(
    df: DataFrame, rates: dict[str, float], strata_col: str = "source",
    id_col: str = "doc_id", default: float = 1.0, salt: str = "mix",
) -> DataFrame:
    """Weighted training mix with upsampling: each row appears
    floor(rate) + Bernoulli(frac(rate)) times (deterministic, hash-keyed —
    see module docstring), tagged with its replica index `copy` and a
    stable pseudo-random `order_key` for resume-safe interleaving. The
    explode is bounded by ceil(rate) (a narrow row-amplification, no
    shuffle); sorting by order_key at write time is the one range
    exchange a mixed-corpus materialization needs anyway."""
    ceil_e, keep, order = mix_rows_exprs(rates, strata_col, id_col, default, salt)
    return (
        df.withColumn("copy", F.explode(F.expr(f"sequence(1, {ceil_e})")))
        .where(F.expr(keep))
        .withColumn("order_key", F.expr(order))
    )


def stratified_sample(
    df: DataFrame, fractions: dict[str, float], strata_col: str = "lang",
    id_col: str = "doc_id", default: float = 0.0, salt: str = "strata",
) -> DataFrame:
    """Keep per-stratum deterministic fractions of rows (strata not listed
    in `fractions` keep `default`). Same stability guarantees as
    deterministic_sample; still a single narrow filter."""
    return df.where(
        F.expr(stratified_sample_pred(fractions, strata_col, id_col, default, salt))
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 2048,
    n_shards: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (in deterministic
    id order) into fixed-`capacity` training sequences, documents
    straddling sequence boundaries (the standard causal-LM packing — no
    padding waste, an EOD token separates docs). Emits, per document, the
    packed location: which sequence its first token lands in and at what
    offset, plus how many sequences it spans.

    A single global concatenation order would serialize the cumsum, so
    packing is SHARDED (shard = id hash % n_shards, the same layout a
    shuffle-read data loader consumes): within a shard, docs are ordered
    by id and offsets are a window cumsum — embarrassingly parallel
    across shards, one shuffle keyed by shard. Deterministic: a pure
    function of (id, token count), stable across retries / repartitioning
    / engines (the DuckDB oracle replays the identical window).

    Output: id_col, shard, n_tokens, seq_id, seq_off, n_seqs_spanned.
    """
    from .text import tokens_expr
    from pyspark.sql.window import Window

    toks = tokens_expr(text_col)
    base = df.select(
        F.col(id_col),
        F.expr(f"pmod({_hash_expr(id_col, 'pack')}, {n_shards})")
        .cast("int").alias("shard"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("g_off")
    out = base.select(id_col, "shard", "n_tokens", start)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(F.col("g_off") / capacity).cast("long").alias("seq_id"),
        (F.col("g_off") % capacity).cast("long").alias("seq_off"),
        (
            F.floor((F.col("g_off") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                    / capacity) - F.floor(F.col("g_off") / capacity) + 1
        ).cast("long").alias("n_seqs_spanned"),
    )
