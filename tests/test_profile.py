"""Corpus profiling + skew census: pandas replays and plan-shape checks."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrid.operators import profile as PF


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "en", 10),
        (1, "en", 200),
        (2, "de", 30),
        (3, None, 30),
        (4, "fr", None),
        (5, "en", 7),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    )


class TestProfileColumns:
    def test_matches_pandas_replay(self, spark, corpus):
        out = (
            PF.profile_columns(corpus, ["doc_id", "lang", "n_chars"])
            .orderBy("column")
            .toPandas()
            .set_index("column")
        )
        assert (out.n_rows == 6).all()
        assert out.loc["lang", "n_nulls"] == 1
        assert out.loc["n_chars", "n_nulls"] == 1
        assert out.loc["doc_id", "n_distinct"] == 6
        assert out.loc["lang", "n_distinct"] == 3  # en/de/fr, null excluded
        assert out.loc["n_chars", "n_distinct"] == 4
        # min/max compare on the native type: numeric 7 < 10 < 200
        assert out.loc["n_chars", "min_s"] == "7"
        assert out.loc["n_chars", "max_s"] == "200"
        assert out.loc["lang", "min_s"] == "de"
        assert out.loc["lang", "max_s"] == "fr"
        # exact rendered-length sums (nulls contribute nothing)
        assert out.loc["doc_id", "total_len"] == 6
        assert out.loc["lang", "total_len"] == 10
        assert out.loc["n_chars", "total_len"] == 2 + 3 + 2 + 2 + 1

    def test_single_scan(self, spark, corpus):
        plan = PF.profile_columns(corpus, ["doc_id", "lang"])._jdf.queryExecution(
        ).executedPlan().toString()
        # one pass: however many columns, the source appears once
        assert plan.count("LocalTableScan") + plan.count("Scan ") == 1


class TestKeySkew:
    def test_exact_ratios(self, spark):
        rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
        df = spark.createDataFrame(rows, ["k"])
        out = PF.key_skew(df, ["k"], top=3).toPandas().set_index("k")
        assert out.loc["hot", "n"] == 60
        assert out.loc["hot", "share_ppm"] == 600_000
        # 3 keys, mean 100/3: hot = 60*3*1000/100 = 1800 milli-x
        assert out.loc["hot", "xmean_milli"] == 1800
        assert out.loc["warm", "xmean_milli"] == 900
        assert out.loc["cold", "xmean_milli"] == 300
        assert list(out.index) == ["hot", "warm", "cold"]

    def test_totals_join_is_broadcast(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], ["k"])
        plan = PF.key_skew(df, ["k"])._jdf.queryExecution().executedPlan(
        ).toString()
        assert "Broadcast" in plan

    def test_top_limits(self, spark):
        df = spark.createDataFrame([(i % 7,) for i in range(70)], ["k"])
        assert PF.key_skew(df, ["k"], top=4).count() == 4
