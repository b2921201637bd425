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

    def apply_indexed(self, arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(h, w) float -> (palette indices, PLTE, tRNS) for indexed PNG:
        same classification as apply(), but 1 byte/px — NoData maps to a
        dedicated transparent palette entry (index n), so at most 255
        colors fit an indexed PNG's 256-entry palette."""
        if len(self.colors) > 255:
            raise ValueError(
                "indexed PNG supports at most 255 colors"
                " (one palette slot is reserved for NoData)"
            )
        idx = np.searchsorted(self.breaks, arr, side="left").clip(0, len(self.breaks) - 1)
        idx = np.where(np.isnan(arr), len(self.colors), idx).astype(np.uint8)
        # transparent entry carries colors[0]'s RGB so the expanded RGBA is
        # byte-identical to apply() (which sends NaN to index 0, alpha 0)
        palette = np.vstack([self.colors, self.colors[:1]])
        trans = np.full(len(palette), 255, np.uint8)
        trans[-1] = 0
        return idx, palette, trans

    @staticmethod
    def ramp(vmin: float, vmax: float, n: int = 16) -> "ColorMap":
        """Simple grayscale ramp."""
        breaks = np.linspace(vmin, vmax, n).tolist()
        colors = [(int(v), int(v), int(v)) for v in np.linspace(0, 255, n)]
        return ColorMap(breaks, colors)

    @staticmethod
    def preset(name: str, vmin: float, vmax: float) -> "ColorMap":
        """Named color ramp over [vmin, vmax] (the reference's ColorRamps
        presets, raster/.../render/ColorRamps.scala:19-112 — the RGBA
        constants are the published ramp definitions)."""
        rgba = COLOR_RAMPS[name]
        colors = [((c >> 24) & 0xFF, (c >> 16) & 0xFF, (c >> 8) & 0xFF)
                  for c in rgba]
        breaks = np.linspace(vmin, vmax, len(colors)).tolist()
        return ColorMap(breaks, colors)


# ColorRamps.scala:19-112 preset palettes (0xRRGGBBAA)
COLOR_RAMPS = {
    "blue-to-orange": [
        0x2586ABFF, 0x4EA3C8FF, 0x7FB8D4FF, 0xADD8EAFF, 0xC8E1E7FF,
        0xEDECEAFF, 0xF0E7BBFF, 0xF5CF7DFF, 0xF9B737FF, 0xE68F2DFF,
        0xD76B27FF,
    ],
    "light-yellow-to-orange": [
        0x118C8CFF, 0x429D91FF, 0x61AF96FF, 0x75C59BFF, 0xA2CF9FFF,
        0xC5DAA3FF, 0xE6E5A7FF, 0xE3D28FFF, 0xE0C078FF, 0xDDAD62FF,
        0xD29953FF, 0xCA8746FF, 0xC2773BFF,
    ],
    "blue-to-red": [
        0x2791C3FF, 0x5DA1CAFF, 0x83B2D1FF, 0xA8C5D8FF, 0xCCDBE0FF,
        0xE9D3C1FF, 0xDCAD92FF, 0xD08B6CFF, 0xC66E4BFF, 0xBD4E2EFF,
    ],
    "green-to-red-orange": [
        0x569543FF, 0x9EBD4DFF, 0xBBCA7AFF, 0xD9E2B2FF, 0xE4E7C4FF,
        0xE6D6BEFF, 0xE3C193FF, 0xDFAC6CFF, 0xDB9842FF, 0xB96230FF,
    ],
    "light-to-dark-sunset": [
        0xFFFFFFFF, 0xFBEDD1FF, 0xF7E0A9FF, 0xEFD299FF, 0xE8C58BFF,
        0xE0B97EFF, 0xF2924DFF, 0xC97877FF, 0x946196FF, 0x2AB7D6FF,
        0x474040FF,
    ],
    "light-to-dark-green": [
        0xE8EDDBFF, 0xDCE8D4FF, 0xBEDBADFF, 0xA0CF88FF, 0x81C561FF,
        0x4BAF48FF, 0x1CA049FF, 0x3A6D35FF,
    ],
    "heatmap-yellow-to-red": [
        0xF7DA22FF, 0xECBE1DFF, 0xE77124FF, 0xD54927FF, 0xCF3A27FF,
        0xA33936FF, 0x7F182AFF, 0x68101AFF,
    ],
    "heatmap-blue-to-yellow-to-red": [
        0x2A2E7FFF, 0x3D5AA9FF, 0x4698D3FF, 0x39C6F0FF, 0x76C9B3FF,
        0xA8D050FF, 0xF6EB14FF, 0xFCB017FF, 0xF16022FF, 0xEE2C24FF,
        0x7D1416FF,
    ],
    "heatmap-dark-red-to-yellow-white": [
        0x68101AFF, 0x7F182AFF, 0xA33936FF, 0xCF3A27FF, 0xD54927FF,
        0xE77124FF, 0xECBE1DFF, 0xF7DA22FF, 0xF6EDB1FF, 0xFFFFFFFF,
    ],
}


def render_png(
    layer: DataFrame, colormap: ColorMap | None = None, indexed: bool = False
) -> DataFrame:
    """Encode each tile to PNG bytes (Render.scala:35-90): grayscale clamp
    without a colormap, RGBA with one, or 1-byte/px indexed-palette PNG
    (render/png/PngColorEncoding.scala Indexed) with indexed=True. Output
    layer rows with fmt='png'."""
    if indexed and colormap is None:
        raise ValueError("indexed PNG needs a colormap")

    def run(it):
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if colormap is None:
                    img = np.where(np.isnan(arr), 0, arr).clip(0, 255).astype(np.uint8)
                elif indexed:
                    tiles.append(codec.png_encode_indexed(*colormap.apply_indexed(arr)))
                    continue
                else:
                    img = colormap.apply(arr)
                tiles.append(codec.png_encode(img))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "png"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    from ..operators import LAYER_SCHEMA

    return layer.mapInPandas(run, LAYER_SCHEMA)


def render_jpg(
    layer: DataFrame, colormap: ColorMap | None = None, quality: int = 90
) -> DataFrame:
    """Encode each tile to real baseline JPEG bytes (reference
    JpgRenderMethods.scala / MultibandJpgRenderMethods.scala + render/jpg/
    Settings.scala's quality knob). JPEG has no alpha channel, so colormapped
    NoData renders black (the reference's behavior: JpgEncoder drops alpha);
    without a colormap, grayscale clamp like renderPng."""
    from .. import jpeg

    def run(it):
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                if colormap is None:
                    img = np.where(np.isnan(arr), 0, arr).clip(0, 255).astype(np.uint8)
                else:
                    rgba = colormap.apply(arr)
                    img = (rgba[..., :3] * (rgba[..., 3:4] / 255.0)).astype(np.uint8)
                tiles.append(jpeg.encode(img, quality=quality))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "jpeg"
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
