"""Structured Streaming over the tile grid.

The reference has no streaming story (SURVEY.md §2.13) — this module is the
beyond-reference capability a continuously-ingesting corpus needs: the same
pure-Catalyst key assignment the batch tiler uses (tiler.key_exprs), applied
to a readStream source, with event-time windows + watermarks for late data.

Everything is built-in Spark streaming machinery — no custom state store:
  streaming_cell_counts   per-(cell, event-time window) counts/sums
  streaming_keyed         just add zoom/col/row/cell columns to a stream
  sessionize              session_window gaps-and-islands (batch + stream)
Both return streaming DataFrames; callers pick the sink (memory for tests,
parquet/kafka in production) and trigger.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .grid import LayoutDefinition
from .operators.tiler import with_key_columns


def streaming_keyed(
    stream: DataFrame, layout: LayoutDefinition, x: str, y: str, zoom: int
) -> DataFrame:
    """Add zoom/col/row/cell to a streaming DataFrame — the identical
    Catalyst floor math as the batch path, so stream and batch keys agree
    bit-for-bit."""
    return with_key_columns(stream, layout, x, y, zoom)


def streaming_cell_counts(
    stream: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "lon",
    y: str = "lat",
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Windowed per-cell aggregation with late-data handling: watermark on
    the event-time column bounds state, groupBy (cell, window) counts (and
    sums value_col when given). Output schema: zoom, col, row, cell,
    window_start, window_end, n_events [, sum_value]."""
    keyed = streaming_keyed(stream, layout, x, y, zoom).withWatermark(
        ts_col, watermark
    )
    aggs = [F.count("*").cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = keyed.groupBy(
        "zoom", "col", "row", "cell", F.window(ts_col, window).alias("_w")
    ).agg(*aggs)
    return out.select(
        "zoom", "col", "row", "cell",
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *(["n_events"] + (["sum_value"] if value_col else [])),
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    value_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gaps-and-islands sessionization via the built-in session_window —
    a session is a maximal run of events per key whose inter-event gap is
    <= `gap`; session_end = last event + gap (Spark's session_window
    convention). Works on BATCH and STREAMING inputs identically: the
    whole aggregation is JVM-side (no state UDF), and on a stream the
    watermark bounds the session store so open sessions for dead keys
    age out instead of accumulating. Output: key cols, session_start,
    session_end, n_events [, sum_value]."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count("*").cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = df.groupBy(
        *key_cols, F.session_window(ts_col, gap).alias("_w")
    ).agg(*aggs)
    return out.select(
        *key_cols,
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *(["n_events"] + (["sum_value"] if value_col else [])),
    )


def streaming_running_cell_stats(
    stream: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "lon",
    y: str = "lat",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per cell, carry
    running (count, sum, min, max) across micro-batches — the arbitrary-
    state path for aggregations Spark's windowed engine can't express
    (e.g. lifetime per-cell stats over an unbounded stream). Each update
    emits the cell's latest totals; state is one tiny tuple per cell, so
    the store stays O(live cells)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = streaming_keyed(stream, layout, x, y, zoom).select(
        "zoom", "col", "row", "cell", F.col(value_col).alias("_v")
    )

    def update(key, pdfs, state):
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, float("inf"), float("-inf")
        for pdf in pdfs:
            if len(pdf):
                n += int(len(pdf))
                s += float(pdf["_v"].sum())
                mn = min(mn, float(pdf["_v"].min()))
                mx = max(mx, float(pdf["_v"].max()))
        state.update((n, s, mn, mx))
        zoom_, col_, row_, cell_ = key
        yield pd.DataFrame(
            {
                "zoom": [zoom_], "col": [col_], "row": [row_], "cell": [cell_],
                "n_events": [n], "sum_value": [s],
                "min_value": [mn], "max_value": [mx],
            }
        )

    return keyed.groupBy("zoom", "col", "row", "cell").applyInPandasWithState(
        update,
        outputStructType=(
            "zoom int, col int, row int, cell long, n_events long, "
            "sum_value double, min_value double, max_value double"
        ),
        stateStructType="n long, s double, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tiles_to_slippy(
    stream: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    out_dir: str,
    x: str = "lon",
    y: str = "lat",
    colormap=None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
):
    """Streaming renderPng sink: cumulative per-pixel event counts (the
    kernel-density raster of the batch path) re-rendered to a z/x/y PNG
    tree on every micro-batch via foreachBatch — a live-updating web-map
    layer over an unbounded point stream. COMPLETE output mode: each batch
    re-emits the whole aggregate, so the rendered tree always reflects
    every event seen and tiles overwrite in place; streaming state is
    O(touched pixels). (At volumes where complete-mode re-render is too
    much, sink the counts stream to a table and render from it on a
    schedule instead — this sink is the low-latency path.) Assembly and
    PNG encode run executor-side through the batch render ops
    (render_png + write_slippy). Returns the started StreamingQuery."""
    import numpy as np

    from . import codec
    from .operators import LAYER_SCHEMA
    from .sources.render import render_png, write_slippy

    ex = layout.extent
    tl = layout.tile_layout
    keyed = streaming_keyed(stream, layout, x, y, zoom)
    px = F.floor(
        (F.col(x) - (F.lit(ex.xmin) + F.col("col") * F.lit(layout.tile_width)))
        / F.lit(layout.cell_width)).cast("int")
    py = F.floor(
        ((F.lit(ex.ymax) - F.col("row") * F.lit(layout.tile_height)) - F.col(y))
        / F.lit(layout.cell_height)).cast("int")
    counts = (
        keyed.withColumn("px", px).withColumn("py", py)
        .where((F.col("px") >= 0) & (F.col("px") < tl.tile_cols)
               & (F.col("py") >= 0) & (F.col("py") < tl.tile_rows))
        .groupBy("zoom", "col", "row", "cell", "px", "py")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    th_px, tw_px = tl.tile_rows, tl.tile_cols

    def assemble(key, pdf):
        z, c, r, cell = (int(v) for v in key)
        arr = np.zeros((th_px, tw_px), dtype=np.float64)
        arr[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["cnt"].to_numpy()
        return pd.DataFrame({
            "zoom": [z], "col": [c], "row": [r], "cell": [cell],
            "tile": [codec.raw_encode(arr)],
            "h": [th_px], "w": [tw_px], "fmt": ["raw"],
        })

    def render_batch(bdf, _epoch):
        layer = bdf.groupBy("zoom", "col", "row", "cell").applyInPandas(
            assemble, LAYER_SCHEMA)
        write_slippy(render_png(layer, colormap), out_dir)

    w = counts.writeStream.outputMode("complete").foreachBatch(render_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


def dedup_stream(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup on a continuously-ingesting corpus: keep the first
    occurrence of each key (e.g. a content fingerprint from
    text.fingerprint) and drop re-ingests. Works on BATCH and STREAMING
    inputs identically.

    On a stream with `ts_col`, uses dropDuplicatesWithinWatermark: the
    dedup state store only remembers keys younger than the watermark, so
    state is BOUNDED by ingest-rate x watermark instead of growing with
    the all-time corpus — the 100 TB shape (an unbounded exact-dedup
    state store would itself become corpus-sized; bounded-window dedup +
    a periodic batch exact_dedup compaction is the production pattern).
    Without `ts_col` (or on batch input) it is plain dropDuplicates on
    the key columns."""
    cols = list(key_cols)
    if df.isStreaming and ts_col is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return df.dropDuplicates(cols)
