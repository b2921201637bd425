"""Spark operators over tiled-layer DataFrames.

A *layer* is a DataFrame with at least the columns
  zoom int, col int, row int, cell long, tile binary, h int, w int, fmt string
(`fmt` is the tile codec: 'raw' for analysis layers, 'png'/'jpeg' for image
layers), optionally plus payload columns (the reference's TileFeature,
TileFeature.scala:26). `cell` is the within-zoom Z-order id (tilegrid.cell),
the partitioning/sort key.
"""

KEY_COLS = ["zoom", "col", "row"]
LAYER_SCHEMA = (
    "zoom int, col int, row int, cell long, tile binary, h int, w int, fmt string"
)
