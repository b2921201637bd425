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


def _sessions_pd(pdf: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    """Hand gaps-and-islands oracle for sessionize."""
    rows = []
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        ts = list(g["ts"])
        vals = list(g["value"])
        start, n, s = ts[0], 1, vals[0]
        last = ts[0]
        for t, v in zip(ts[1:], vals[1:]):
            if (t - last).total_seconds() > gap_s:
                rows.append((uid, start, last + pd.Timedelta(seconds=gap_s), n, s))
                start, n, s = t, 0, 0.0
            n += 1
            s += v
            last = t
        rows.append((uid, start, last + pd.Timedelta(seconds=gap_s), n, s))
    return pd.DataFrame(
        rows, columns=["user_id", "session_start", "session_end",
                       "n_events", "sum_value"])


class TestSessionize:
    GAP = "5 minutes"
    KEY = ["user_id", "session_start"]

    def _pdf(self):
        pdf = _events_pdf(700)
        i = np.arange(len(pdf))
        # bursts of 100 events 40s apart, separated by 2h quiet gaps:
        # per user (every 7th event -> 280s spacing < the 5-minute gap)
        # each burst is one session, each quiet gap a session break
        pdf["ts"] = pd.Timestamp("2024-03-01") + pd.to_timedelta(
            (i % 100) * 40 + (i // 100) * 7200, unit="s")
        pdf["user_id"] = (i % 7).astype("int64")
        return pdf

    def test_batch_matches_islands_oracle(self, spark):
        from tilegrid.streaming import sessionize

        pdf = self._pdf()
        got = sessionize(
            spark.createDataFrame(pdf), gap=self.GAP, value_col="value",
        ).toPandas().sort_values(self.KEY).reset_index(drop=True)
        want = _sessions_pd(pdf, 300.0).sort_values(
            self.KEY).reset_index(drop=True)
        assert len(got) == len(want) > len(pdf["user_id"].unique())
        pd.testing.assert_frame_equal(
            got[self.KEY + ["session_end", "n_events"]],
            want[self.KEY + ["session_end", "n_events"]])
        np.testing.assert_allclose(got["sum_value"], want["sum_value"])

    def test_stream_matches_batch(self, spark, tmp_path):
        from tilegrid.streaming import sessionize

        pdf = self._pdf()
        src = str(tmp_path / "sess_src")
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        sess = sessionize(stream, gap=self.GAP, value_col="value",
                          watermark="0 seconds")
        q = (sess.writeStream.format("memory").queryName("sessions")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sessions").toPandas() \
            .sort_values(self.KEY).reset_index(drop=True)
        batch = sessionize(
            spark.createDataFrame(pdf), gap=self.GAP, value_col="value",
        ).toPandas().sort_values(self.KEY).reset_index(drop=True)
        assert len(got) == len(batch) > 0
        pd.testing.assert_frame_equal(
            got[self.KEY + ["session_end", "n_events"]],
            batch[self.KEY + ["session_end", "n_events"]])


class TestStreamSlippy:
    def test_stream_tree_matches_batch_tree(self, spark, tmp_path):
        import os

        from tilegrid import codec
        from tilegrid.operators import LAYER_SCHEMA
        from tilegrid.sources.render import ColorMap, render_png, write_slippy
        from tilegrid.streaming import stream_tiles_to_slippy, streaming_keyed

        pdf = _events_pdf(1200)
        src = str(tmp_path / "slippy_src")
        spark.createDataFrame(pdf.iloc[:600]).write.mode("overwrite").parquet(src)
        spark.createDataFrame(pdf.iloc[600:]).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        cm = ColorMap.ramp(0.0, 8.0, 8)
        out = str(tmp_path / "stream_tiles")
        q = stream_tiles_to_slippy(
            stream, LAYOUT, ZOOM, out, colormap=cm,
            checkpoint=str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

        # batch twin through the identical assemble+render path
        import numpy as np
        import pandas as pd

        keyed = streaming_keyed(spark.createDataFrame(pdf), LAYOUT, "lon",
                                "lat", ZOOM)
        ex, tl = LAYOUT.extent, LAYOUT.tile_layout
        px = F.floor((F.col("lon") - (F.lit(ex.xmin) + F.col("col")
                      * F.lit(LAYOUT.tile_width))) / F.lit(LAYOUT.cell_width))
        py = F.floor(((F.lit(ex.ymax) - F.col("row") * F.lit(LAYOUT.tile_height))
                      - F.col("lat")) / F.lit(LAYOUT.cell_height))
        cnt = (keyed.withColumn("px", px.cast("int"))
               .withColumn("py", py.cast("int"))
               .groupBy("zoom", "col", "row", "cell", "px", "py")
               .agg(F.count("*").cast("double").alias("cnt"))).toPandas()

        def tile_of(grp):
            arr = np.zeros((tl.tile_rows, tl.tile_cols))
            arr[grp["py"].to_numpy(), grp["px"].to_numpy()] = grp["cnt"].to_numpy()
            return arr

        want_dir = str(tmp_path / "batch_tiles")
        rows = []
        for (z, c, r, cell), grp in cnt.groupby(["zoom", "col", "row", "cell"]):
            rows.append({"zoom": z, "col": c, "row": r, "cell": cell,
                         "tile": codec.raw_encode(tile_of(grp)),
                         "h": tl.tile_rows, "w": tl.tile_cols, "fmt": "raw"})
        layer = spark.createDataFrame(pd.DataFrame(rows), schema=LAYER_SCHEMA)
        write_slippy(render_png(layer, cm), want_dir)

        got_files, want_files = {}, {}
        for base, store in ((out, got_files), (want_dir, want_files)):
            for zd in os.listdir(base):
                for xd in os.listdir(os.path.join(base, zd)):
                    for f in os.listdir(os.path.join(base, zd, xd)):
                        with open(os.path.join(base, zd, xd, f), "rb") as fh:
                            store[(zd, xd, f)] = fh.read()
        assert got_files.keys() == want_files.keys() and len(got_files) > 0
        for k in got_files:
            assert got_files[k] == want_files[k], k


class TestDedupStream:
    """dedup_stream: exact first-occurrence dedup, batch == stream, with
    watermark-bounded state on the stream side."""

    def _pdf(self):
        import numpy as np
        base = pd.Timestamp("2024-01-01")
        rows = []
        for i in range(400):
            fp = f"fp{i % 120:04d}"           # 120 distinct keys, re-ingested
            rows.append((i, fp, base + pd.Timedelta(seconds=30 * i)))
        return pd.DataFrame(rows, columns=["event_id", "fp", "ts"])

    def test_batch_dedup_counts(self, spark):
        from tilegrid.streaming import dedup_stream

        df = spark.createDataFrame(self._pdf())
        out = dedup_stream(df, key_cols=("fp",)).toPandas()
        assert len(out) == 120
        assert sorted(out.fp) == sorted(self._pdf().fp.unique())

    def test_stream_dedup_within_watermark(self, spark, tmp_path):
        from tilegrid.streaming import dedup_stream

        pdf = self._pdf()
        src = str(tmp_path / "dedup_src")
        spark.createDataFrame(pdf.iloc[:200]).write.mode("overwrite").parquet(src)
        spark.createDataFrame(pdf.iloc[200:]).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = dedup_stream(stream, key_cols=("fp",), ts_col="ts",
                           watermark="2 hours")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM dedup_out").toPandas()
        # every key re-ingests within 30*120 s = 1 h < the 2 h watermark,
        # so the stream drops exactly the duplicates batch dedup drops
        assert sorted(got.fp) == sorted(pdf.fp.unique())
        assert len(got) == 120
