"""Structured Streaming == batch parity for the keyed window aggregation."""

import numpy as np
import pandas as pd
import pytest

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

    def test_watermark_bounds_state(self, spark):
        # watermark column present in the plan (state-bounding contract)
        pdf = _events_pdf(100)
        stream_like = spark.createDataFrame(pdf)
        agg = streaming_cell_counts(stream_like, LAYOUT, ZOOM, x="lon", y="lat")
        assert "window_start" in agg.columns and "n_events" in agg.columns
