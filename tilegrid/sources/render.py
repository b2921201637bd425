"""Render sinks: ColorMap + renderPng, slippy z/x/y file tree writer.

Reference: spark/.../render/Render.scala:35-90, raster/.../render/
ColorMap.scala:28-70, spark/.../io/slippy/ (SlippyTileWriter).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec


class ColorMap:
    """Value breaks -> RGB colors (LessThanOrEqualTo semantics: first break
    >= value wins; values above all breaks get the last color)."""

    def __init__(self, breaks: list[float], colors: list[tuple[int, int, int]]):
        assert len(breaks) == len(colors)
        self.breaks = np.asarray(breaks, dtype=np.float64)
        self.colors = np.asarray(colors, dtype=np.uint8)

    def apply(self, arr: np.ndarray) -> np.ndarray:
        """(h, w) float -> (h, w, 4) RGBA uint8 (NoData transparent)."""
        idx = np.searchsorted(self.breaks, arr, side="left").clip(0, len(self.breaks) - 1)
        idx = np.where(np.isnan(arr), 0, idx).astype(np.int64)
        rgb = self.colors[idx]
        alpha = np.where(np.isnan(arr), 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha])

    @staticmethod
    def ramp(vmin: float, vmax: float, n: int = 16) -> "ColorMap":
        """Simple grayscale ramp."""
        breaks = np.linspace(vmin, vmax, n).tolist()
        colors = [(int(v), int(v), int(v)) for v in np.linspace(0, 255, n)]
        return ColorMap(breaks, colors)


def render_png(layer: DataFrame, colormap: ColorMap | None = None) -> DataFrame:
    """Encode each tile to PNG bytes (Render.scala:35-90): grayscale clamp
    without a colormap, RGBA with one. Output layer rows with fmt='png'."""

    def run(it):
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if colormap is None:
                    img = np.where(np.isnan(arr), 0, arr).clip(0, 255).astype(np.uint8)
                else:
                    img = colormap.apply(arr)
                tiles.append(codec.png_encode(img))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "png"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    from ..operators import LAYER_SCHEMA

    return layer.mapInPandas(run, LAYER_SCHEMA)


def write_slippy(layer: DataFrame, out_dir: str) -> int:
    """Write a z/x/y.png tree (SlippyTileWriter). Executor-side writes via
    foreachPartition; returns tile count. Tiles must already be png
    (render_png) or raw (encoded on the fly)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for r in rows:
            data = bytes(r["tile"])
            if r["fmt"] != "png":
                arr = codec.decode_tile(data, r["fmt"]).astype(np.float64)
                data = codec.png_encode(
                    np.where(np.isnan(arr), 0, arr).clip(0, 255).astype(np.uint8)
                )
            d = os.path.join(out_dir, str(r["zoom"]), str(r["col"]))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r['row']}.png"), "wb") as f:
                f.write(data)

    layer.foreachPartition(write_part)
    n = 0
    for z in os.listdir(out_dir):
        for x in os.listdir(os.path.join(out_dir, z)):
            n += len(os.listdir(os.path.join(out_dir, z, x)))
    return n
