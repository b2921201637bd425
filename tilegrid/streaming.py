"""Structured Streaming over the tile grid.

The reference has no streaming story (SURVEY.md §2.13) — this module is the
beyond-reference capability a continuously-ingesting corpus needs: the same
pure-Catalyst key assignment the batch tiler uses (tiler.key_exprs), applied
to a readStream source, with event-time windows + watermarks for late data.

Everything is built-in Spark streaming machinery — no custom state store:
  streaming_cell_counts   per-(cell, event-time window) counts/sums
  streaming_keyed         just add zoom/col/row/cell columns to a stream
Both return streaming DataFrames; callers pick the sink (memory for tests,
parquet/kafka in production) and trigger.
"""

from __future__ import annotations

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
