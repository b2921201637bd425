"""Split: cut rasters larger than the target tile size into a grid of
tile-sized pieces.

Mirrors the reference semantics (raster/src/main/scala/geotrellis/raster/
split/Split.scala:57-88 — per-tile window loop with `extend`/`cropped`
options; spark/src/main/scala/geotrellis/spark/split/Split.scala:29-51 and
ProjectedExtentRDDSplitMethods.scala — flatMap each (key, raster) into
sub-rasters with the key's extent updated to each cell-aligned window).

Spark shape: both distributed forms are a single mapInPandas explode —
each input row yields its subtiles in place, no shuffle, no driver state.
At 100 TB this is the ingest normalization pass that runs before
tile_to_layout, so keeping it narrow (one scan, output partitioned like
the input) matters.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec

LAYER_SCHEMA = (
    "zoom int, col int, row int, cell long, tile binary, h int, w int, fmt string"
)

SCENE_SCHEMA = (
    "scene_id string, sub_col int, sub_row int, tile binary, h int, w int,"
    " xmin double, ymin double, xmax double, ymax double"
)


def split_array(
    arr: np.ndarray, tile_cols: int, tile_rows: int, extend: bool = True
):
    """Split one array into a ceil(w/tile_cols) x ceil(h/tile_rows) grid
    (Split.scala:57-88). ``extend=True`` pads edge pieces to the full tile
    size with NaN (the CroppedTile-beyond-bounds NoData fill);
    ``extend=False`` truncates them at the source bounds.

    Yields (layout_col, layout_row, piece) with piece float64.
    """
    a = arr.astype(np.float64, copy=False)
    rows, cols = a.shape[:2]
    layout_cols = max(1, math.ceil(cols / tile_cols))
    layout_rows = max(1, math.ceil(rows / tile_rows))
    for lr in range(layout_rows):
        for lc in range(layout_cols):
            c0, r0 = lc * tile_cols, lr * tile_rows
            c1, r1 = min(c0 + tile_cols, cols), min(r0 + tile_rows, rows)
            piece = a[r0:r1, c0:c1]
            if extend and (piece.shape[0] < tile_rows or piece.shape[1] < tile_cols):
                full = np.full(
                    (tile_rows, tile_cols) + a.shape[2:], np.nan, np.float64
                )
                full[: piece.shape[0], : piece.shape[1]] = piece
                piece = full
            yield lc, lr, piece


def split_scenes(
    scenes: DataFrame,
    tile_cols: int,
    tile_rows: int,
    extend: bool = True,
) -> DataFrame:
    """Distributed Split over georeferenced scenes
    (ProjectedExtentRDDSplitMethods.scala): input rows
    (scene_id, tile, fmt, xmin, ymin, xmax, ymax); each scene explodes into
    its subtiles with the extent updated to each cell-aligned window.

    One mapInPandas pass — no shuffle; subtiles inherit the input's
    partitioning so a following tile_to_layout sees the same distribution.
    """

    def run(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                rows, cols = arr.shape[:2]
                cw = (t.xmax - t.xmin) / cols
                ch = (t.ymax - t.ymin) / rows
                for lc, lr, piece in split_array(arr, tile_cols, tile_rows, extend):
                    ph, pw = piece.shape[:2]
                    x0 = t.xmin + lc * tile_cols * cw
                    y1 = t.ymax - lr * tile_rows * ch
                    outs.append(
                        {
                            "scene_id": t.scene_id,
                            "sub_col": lc,
                            "sub_row": lr,
                            "tile": codec.raw_encode(piece),
                            "h": ph,
                            "w": pw,
                            "xmin": x0,
                            "ymin": y1 - ph * ch,
                            "xmax": x0 + pw * cw,
                            "ymax": y1,
                        }
                    )
            if outs:
                yield pd.DataFrame(outs)

    return scenes.mapInPandas(run, SCENE_SCHEMA)


def split_layer(layer: DataFrame, factor: int, zoom_out: int | None = None) -> DataFrame:
    """Split every tile of a keyed layer into factor x factor subtiles,
    re-keyed on the factor-times-finer grid: (col, row) piece (lc, lr) ->
    (col*factor + lc, row*factor + lr). The spark-side Split for layers
    whose stored tile size exceeds the layout's target (Split.scala:29-51
    applied to keyed tiles). One narrow pass, no shuffle."""
    from ..cell import z2_encode

    def run(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = arr.shape[:2]
                tc, tr = max(1, w // factor), max(1, h // factor)
                for lc, lr, piece in split_array(arr, tc, tr, extend=True):
                    nc, nr = int(t.col) * factor + lc, int(t.row) * factor + lr
                    outs.append(
                        {
                            "zoom": int(t.zoom) if zoom_out is None else zoom_out,
                            "col": nc,
                            "row": nr,
                            "cell": int(z2_encode(nc, nr)),
                            "tile": codec.raw_encode(piece),
                            "h": piece.shape[0],
                            "w": piece.shape[1],
                            "fmt": "raw",
                        }
                    )
            if outs:
                yield pd.DataFrame(outs)

    return layer.mapInPandas(run, LAYER_SCHEMA)
