"""Text analysis for a large-scale training-data pipeline: tokenization,
token/quality stats, language-ID heuristic, document fingerprinting.

Everything here is *pure Spark SQL expression* work — no Python UDFs — so the
whole stage stays inside whole-stage codegen and scales linearly with
executors (the 100 TB path: a narrow map over the scan, no shuffle).

Each builder has a DuckDB twin (same logical expression, DuckDB dialect) in
``tilegrid.queries`` used as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Whitespace tokens after lowercasing + punctuation strip. The corpus is
# already lowercase single-space words; the normalizer keeps this robust to
# arbitrary text while staying regex-portable (POSIX classes only, so the
# Java-regex engine and DuckDB's RE2 agree).
NORMALIZE_RE = "[^a-z0-9 ]"


def sql_str(v: str) -> str:
    """Quote a Python string as a SQL string literal, escaping embedded
    single quotes (''-doubling, identical in Spark SQL and DuckDB). Every
    user-supplied value (stratum key, split name, salt, language code)
    interpolated into a generated expression goes through this — a value
    containing a quote must neither break the expression nor inject SQL."""
    return "'" + str(v).replace("'", "''") + "'"


def tokens_expr(text_col: str, dialect: str = "spark") -> str:
    """SQL expression: array of non-empty lowercase tokens."""
    if dialect == "spark":
        return (
            f"filter(split(regexp_replace(lower({text_col}), '{NORMALIZE_RE}', ' '),"
            f" ' '), x -> x <> '')"
        )
    return (
        f"list_filter(string_split(regexp_replace(lower({text_col}),"
        f" '{NORMALIZE_RE}', ' ', 'g'), ' '), x -> x <> '')"
    )


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (deterministic; ties broken by fixed language order).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "de", "la", "los", "y"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def _count_in(tok_arr: str, words: tuple[str, ...], dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({tok_arr}, x -> array_contains(array({lst}), x)))"
    return f"len(list_filter({tok_arr}, x -> list_contains([{lst}], x)))"


def lang_id_expr(tok_arr: str, dialect: str = "spark") -> str:
    """Predicted language = argmax stopword hits (first-listed wins ties)."""
    counts = {
        lang: _count_in(tok_arr, words, dialect)
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(LANG_STOPWORDS)
    greatest = "greatest(" + ", ".join(counts.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {counts[lang]} = _best THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    # inline _best to stay a single expression
    return case.replace("_best", greatest)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, char_count, avg_token_len, space_ratio, digit_ratio —
    the quality-scoring raw features. All codegen'd."""
    toks = tokens_expr(text_col)
    return (
        df.withColumn("toks", F.expr(toks))
        .withColumn("token_count", F.expr("CAST(size(toks) AS BIGINT)"))
        .withColumn("char_count", F.expr(f"CAST(length({text_col}) AS BIGINT)"))
        .withColumn(
            "avg_token_len",
            F.expr(
                "CASE WHEN size(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                "CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS DOUBLE)"
                " / size(toks) END"
            ),
        )
        .withColumn(
            "space_ratio",
            F.expr(
                f"CAST(length({text_col}) - length(replace({text_col}, ' ', ''))"
                f" AS DOUBLE) / length({text_col})"
            ),
        )
        .withColumn(
            "distinct_ratio",
            F.expr(
                "CASE WHEN size(toks) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
                "CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) END"
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: length band + vocabulary diversity +
    stopword presence (a C4/Gopher-style filter, rebuilt relationally)."""
    out = with_token_stats(df, text_col)
    sw = _count_in("toks", LANG_STOPWORDS["en"], "spark")
    return (
        out.withColumn("stopword_hits", F.expr(f"CAST({sw} AS BIGINT)"))
        .withColumn(
            "quality",
            F.expr(
                "round((CASE WHEN token_count BETWEEN 16 AND 4096 THEN 0.4 ELSE 0.0 END)"
                " + least(distinct_ratio, 0.5) * 0.6"
                " + (CASE WHEN stopword_hits > 0 THEN 0.2 ELSE 0.0 END), 6)"
            ),
        )
        .drop("toks")
    )


def _gram_structs(n: int) -> str:
    """Spark expression: array<struct<n:int, g:string>> of the token
    `n`-grams of `toks` (space-joined). Guarded so short docs yield a typed
    empty array (sequence() would run DESCENDING on size < n)."""
    return (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> named_struct('n', {n}, 'g', concat_ws(' ', slice(toks, i, {n})))) "
        f"ELSE slice(array(named_struct('n', {n}, 'g', '')), 1, 0) END"
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

      * top_2gram_char_frac — characters covered by the most frequent
        token 2-gram / total 2-gram characters (a boilerplate detector);
      * dup_3gram_frac     — fraction of 3-gram occurrences that are
        repeats (1 - distinct/total);
      * dup_3gram_char_frac — characters inside repeated 3-gram
        occurrences / total 3-gram characters.

    Shape for 100 TB: one explode -> groupBy(doc, n, gram) with map-side
    partial aggregation -> one groupBy(doc) -> equi-join back onto the
    document table. Two bounded shuffles keyed by doc_id; linear in corpus
    size, never a per-doc quadratic array scan. (Repetition filters appear
    in the Gopher/MassiveText data pipeline literature; rebuilt here
    relationally.)"""
    toks = tokens_expr(text_col)
    base = df.select(id_col, F.expr(toks).alias("toks"))
    grams = base.select(
        id_col,
        F.expr(f"explode(concat({_gram_structs(2)}, {_gram_structs(3)}))").alias("t"),
    ).select(id_col, F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    cnts = grams.groupBy(id_col, "n", "g").agg(F.count("*").alias("c"))
    cl = F.col("c") * F.length("g")
    n2, n3 = F.col("n") == 2, F.col("n") == 3
    per = cnts.groupBy(id_col).agg(
        F.sum(F.when(n2, cl)).alias("tc2"),
        F.max(F.when(n2, cl)).alias("top2"),
        F.sum(F.when(n3, F.col("c"))).alias("tot3"),
        F.sum(F.when(n3, F.lit(1))).alias("dist3"),
        F.sum(F.when(n3, cl)).alias("tc3"),
        F.sum(F.when(n3 & (F.col("c") > 1), (F.col("c") - 1) * F.length("g")))
        .alias("rc3"),
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.coalesce(num.cast("double") / F.col(den), F.lit(0.0)), 6
    )
    return df.select(id_col).join(per, id_col, "left").select(
        id_col,
        frac(F.col("top2"), "tc2").alias("top_2gram_char_frac"),
        frac(F.col("tot3") - F.col("dist3"), "tot3").alias("dup_3gram_frac"),
        frac(F.col("rc3"), "tc3").alias("dup_3gram_char_frac"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 16,
    max_tokens: int = 4096,
    min_quality: float = 0.5,
    max_top2: float = 0.08,
    max_dup3: float = 0.1,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """The composed C4/Gopher-style cleaning rule, one call: length band +
    quality score + repetition thresholds + language allowlist. Returns
    (id, keep, reject_reason) where reject_reason names the FIRST failing
    rule in documented order (length -> quality -> repetition -> lang) —
    the audit column a production pipeline logs per document.

    Pure composition of the individually-oracled stages (quality_score,
    repetition_signals, lang_id_expr): one doc_id equi-join between the
    narrow quality pass and the repetition aggregate; everything else
    codegen."""
    q = quality_score(df, text_col).withColumn(
        "pred_lang", F.expr(lang_id_expr(f"({tokens_expr(text_col)})"))
    ).select(id_col, "token_count", "quality", "pred_lang")
    rep = repetition_signals(df, text_col, id_col)
    lang_list = ", ".join(sql_str(l) for l in langs)
    reason = F.expr(
        f"CASE WHEN token_count < {min_tokens} THEN 'too_short' "
        f"WHEN token_count > {max_tokens} THEN 'too_long' "
        f"WHEN quality < CAST({min_quality} AS DOUBLE) THEN 'low_quality' "
        f"WHEN top_2gram_char_frac > CAST({max_top2} AS DOUBLE) "
        f"THEN 'repetitive_2gram' "
        f"WHEN dup_3gram_frac > CAST({max_dup3} AS DOUBLE) "
        f"THEN 'repetitive_3gram' "
        f"WHEN pred_lang NOT IN ({lang_list}) THEN 'lang' END"
    )
    return (
        q.join(rep, id_col)
        .withColumn("reject_reason", reason)
        .select(
            id_col,
            F.col("reject_reason").isNull().alias("keep"),
            "reject_reason",
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized token stream (robust to
    whitespace/punctuation), plus a head fingerprint of the first 8 tokens
    (cheap prefix clustering key)."""
    toks = tokens_expr(text_col)
    return (
        df.withColumn("toks", F.expr(toks))
        .withColumn("fp_full", F.expr("md5(concat_ws(' ', toks))"))
        .withColumn("fp_head", F.expr("md5(concat_ws(' ', slice(toks, 1, 8)))"))
        .drop("toks")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by tf-idf (corpus-statistics pipeline op).

    idf = ln(N / df_t) with raw counts (no smoothing — both engines
    compute the identical expression). Shape at scale: one token explode,
    two partial-aggregated groupBys ((doc, token) tf and per-token df —
    map-side combine keeps the shuffle at distinct-key volume), a join
    against the token-level idf table (small vs the corpus: vocabulary,
    not tokens — AQE broadcasts it), and a per-doc top-k window. No
    Python anywhere; ranking uses the ROUNDED score so ties resolve
    identically on any engine, then token ascending.

    Output: id_col, term, tf (long), score (double, 6dp), rank (int).
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col), F.explode(F.expr(tokens_expr(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    idf = (
        tf.groupBy("term").agg(F.countDistinct(id_col).alias("df_t"))
        .crossJoin(F.broadcast(n_docs))
        .select("term", F.log(F.col("n") / F.col("df_t")).alias("idf"))
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def fan_out(df: DataFrame, id_col: str) -> DataFrame:
    """Spread a partition-starved scan across the cluster before CPU-heavy
    per-document expression work (gram construction, array_distinct).

    A small parquet fixture is one row group = ONE split — Spark cannot
    subdivide it, so a 32-core session would run the whole gram stage on a
    single core (measured 22 s -> ~2 s at sf0.1). Only fires when the scan
    has fewer partitions than the session's parallelism: at corpus scale
    the scan already carries thousands of splits and this is a no-op —
    it never introduces a full-corpus shuffle on the 100 TB path."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, id_col)
    return df


def grams_expr(tok_arr: str, n: int, dialect: str = "spark") -> str:
    """SQL expression: array of space-joined token `n`-grams of the token
    array expression `tok_arr` (full windows only; a doc shorter than `n`
    tokens yields an empty array in both dialects)."""
    if dialect == "spark":
        return (
            f"CASE WHEN size({tok_arr}) >= {n} THEN "
            f"transform(sequence(1, size({tok_arr}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({tok_arr}, i, {n}))) "
            f"ELSE array() END"
        )
    return (
        f"list_transform(range(1, greatest(len({tok_arr}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({tok_arr}[i:i+{n - 1}], ' '))"
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    threshold: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval contamination check: for every training document, the
    fraction of its distinct token `n`-grams that also appear in the held-
    out evaluation corpus `eval_df`, plus a `contaminated` flag at
    `threshold`. This is the decontamination pass an LLM training pipeline
    runs before mixing (the n-gram-overlap rule popularized by the GPT-3 /
    PaLM data cards), rebuilt relationally.

    Shape for 100 TB: the eval n-gram set is DISTINCT n-grams of the
    benchmark suite — thousands of docs, i.e. broadcast-sized by
    construction regardless of corpus scale. Train side is one narrow
    explode of per-doc distinct grams, a broadcast LEFT SEMI join (no
    shuffle of the corpus), and one groupBy(doc_id) with map-side partial
    aggregation. Total: one bounded shuffle keyed by doc_id.

    Output: id_col, total_grams, matched_grams, contaminated_frac
    (6dp; 0.0 for docs shorter than `n` tokens), contaminated (bool).
    """
    toks = tokens_expr(text_col)
    grams = grams_expr("toks", n)
    df = fan_out(df, id_col)
    # persist() is the boundary that stops Catalyst re-inlining the full
    # tokenize+gram pipeline into the Generate (explode) child, where it
    # is re-evaluated per OUTPUT gram — measured 21 s -> 0.3 s on the
    # sf0.1 corpus (same trap and fix as with_minhash_sql's md5 arrays)
    base = df.select(F.col(id_col), F.expr(toks).alias("toks")).select(
        F.col(id_col),
        F.expr(f"array_distinct({grams})").alias("grams"),
    ).persist()
    eval_grams = (
        eval_df.select(F.expr(toks).alias("toks"))
        .select(F.explode(F.expr(grams)).alias("g"))
        .distinct()
    )
    train = base.select(F.col(id_col), F.explode("grams").alias("g"))
    matched = (
        train.join(F.broadcast(eval_grams), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("matched_grams"))
    )
    totals = base.select(F.col(id_col), F.size("grams").alias("total_grams"))
    frac = F.round(
        F.coalesce(
            F.col("matched_grams").cast("double") / F.col("total_grams"),
            F.lit(0.0),
        ),
        6,
    )
    return (
        totals.join(matched, id_col, "left")
        .select(
            id_col,
            F.col("total_grams").cast("long").alias("total_grams"),
            F.coalesce("matched_grams", F.lit(0)).cast("long")
            .alias("matched_grams"),
            frac.alias("contaminated_frac"),
            (frac >= threshold).alias("contaminated"),
        )
    )
