"""Structured Streaming == batch parity for the keyed window aggregation."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tilegrid import fixtures
from tilegrid.grid import LATLNG_WORLD, LayoutDefinition, TileLayout
from tilegrid.streaming import streaming_cell_counts

LAYOUT = LayoutDefinition(LATLNG_WORLD, TileLayout(32, 32, 256, 256))
ZOOM = 5


def _events_pdf(n=3000):
    pts = fixtures.points_table(n)
    base = pd.Timestamp("2024-03-01 00:00:00")
    pts["ts"] = base + pd.to_timedelta((np.arange(n) * 37) % 7200, unit="s")
    pts["value"] = (np.arange(n) % 100).astype("float64")
    return pts


class TestStreaming:
    def test_stream_matches_batch(self, spark, tmp_path):
        pdf = _events_pdf()
        src = str(tmp_path / "stream_src")
        # two micro-batch files
        spark.createDataFrame(pdf.iloc[:1500]).write.mode("overwrite").parquet(src)
        spark.createDataFrame(pdf.iloc[1500:]).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        assert stream.isStreaming
        agg = streaming_cell_counts(
            stream, LAYOUT, ZOOM, x="lon", y="lat",
            window="15 minutes", watermark="1 hour", value_col="value",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("cells")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM cells").toPandas()

        batch = streaming_cell_counts(
            spark.createDataFrame(pdf), LAYOUT, ZOOM,
            x="lon", y="lat", window="15 minutes", watermark="1 hour",
            value_col="value",
        ).toPandas()

        key = ["cell", "window_start"]
        g = got.sort_values(key).reset_index(drop=True)
        b = batch.sort_values(key).reset_index(drop=True)
        assert len(g) == len(b) > 0
        pd.testing.assert_frame_equal(
            g[key + ["n_events", "sum_value"]], b[key + ["n_events", "sum_value"]]
        )

    def test_stateful_running_stats_across_batches(self, spark, tmp_path):
        """applyInPandasWithState: state must carry across micro-batches —
        final per-cell totals equal the batch groupBy over all input."""
        from tilegrid.streaming import streaming_running_cell_stats

        pdf = _events_pdf(2000)
        src = str(tmp_path / "state_src")
        spark.createDataFrame(pdf.iloc[:1000]).write.mode("overwrite").parquet(src)
        spark.createDataFrame(pdf.iloc[1000:]).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
            .parquet(src)
        )
        out = streaming_running_cell_stats(stream, LAYOUT, ZOOM, x="lon", y="lat")
        q = (
            out.writeStream.format("memory")
            .queryName("running")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM running").toPandas()
        # last emitted row per cell = the running total after all batches
        final = rows.groupby("cell").last()
        from tilegrid.operators.tiler import with_key_columns

        batch = (
            with_key_columns(spark.createDataFrame(pdf), LAYOUT, "lon", "lat", ZOOM)
            .groupBy("cell")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .toPandas()
            .set_index("cell")
        )
        assert set(final.index) == set(batch.index)
        for cell in batch.index:
            assert final.loc[cell, "n_events"] == batch.loc[cell, "n_events"]
            np.testing.assert_allclose(
                final.loc[cell, "sum_value"], batch.loc[cell, "sum_value"]
            )
            assert final.loc[cell, "min_value"] == batch.loc[cell, "min_value"]
            assert final.loc[cell, "max_value"] == batch.loc[cell, "max_value"]
        # state genuinely spanned batches: some cell was emitted twice
        assert (rows.groupby("cell").size() > 1).any()

    def test_watermark_bounds_state(self, spark):
        # watermark column present in the plan (state-bounding contract)
        pdf = _events_pdf(100)
        stream_like = spark.createDataFrame(pdf)
        agg = streaming_cell_counts(stream_like, LAYOUT, ZOOM, x="lon", y="lat")
        assert "window_start" in agg.columns and "n_events" in agg.columns
