"""Multiband tiles through focal and reproject (reference:
spark/.../MultibandTileLayerRDDMethods.scala — band-wise semantics for
buffered stencils and warps must equal the per-band single-band results)."""

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec, fixtures
from tilegrid.cell import z2_encode
from tilegrid.grid import (
    LATLNG_WORLD,
    WEBMERCATOR_WORLD,
    LayoutDefinition,
    TileLayout,
)
from tilegrid.operators import LAYER_SCHEMA
from tilegrid.operators.bands import band_select
from tilegrid.operators.focal import focal
from tilegrid.operators.reproject import reproject_layer

TS, NT = 16, 4


def _band_arrays() -> list[np.ndarray]:
    n = NT * TS
    gy, gx = np.mgrid[0:n, 0:n]
    return [
        (gx * 3 + gy * 7).astype(np.float64),
        ((gx * gy) % 17).astype(np.float64),
        np.hypot(gx - 30.0, gy - 20.0),
    ]


def _layer(spark, arrs: list[np.ndarray] | np.ndarray):
    """Single (2D) or multiband (list of 2D -> (h, w, b)) layer."""
    stacked = (
        arrs if isinstance(arrs, np.ndarray)
        else np.stack(arrs, axis=-1)
    )
    rows = []
    for r in range(NT):
        for c in range(NT):
            t = stacked[r * TS : (r + 1) * TS, c * TS : (c + 1) * TS]
            rows.append((2, c, r, int(z2_encode(c, r)),
                         codec.raw_encode(np.ascontiguousarray(t)),
                         TS, TS, "raw"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile",
                                    "h", "w", "fmt"]),
        schema=LAYER_SCHEMA,
    )


def _stitch(pdf):
    arr, _ = fixtures.stitch_layer_df(pdf)
    return arr


def _stitch_band(pdf, band: int):
    """Stitch one band of a multiband layer result."""
    rows = []
    for _, t in pdf.iterrows():
        arr = codec.decode_tile(bytes(t["tile"]), t["fmt"])
        rows.append({**t, "tile": codec.raw_encode(
            np.ascontiguousarray(arr[:, :, band])),
            "fmt": "raw"})
    return _stitch(pd.DataFrame(rows))


class TestMultibandFocal:
    @pytest.mark.parametrize("op", ["mean", "max", "median"])
    def test_focal_matches_per_band(self, spark, op):
        bands = _band_arrays()
        multi = focal(_layer(spark, bands), op, size=1).toPandas()
        for i, arr in enumerate(bands):
            single = _stitch(focal(_layer(spark, arr), op, size=1).toPandas())
            np.testing.assert_array_equal(
                _stitch_band(multi, i), single, err_msg=f"band {i} op {op}")

    def test_focal_slope_matches_per_band(self, spark):
        bands = _band_arrays()
        multi = focal(
            _layer(spark, bands), "slope", cell_size=(1.0, 1.0)).toPandas()
        for i, arr in enumerate(bands):
            single = _stitch(focal(
                _layer(spark, arr), "slope", cell_size=(1.0, 1.0)).toPandas())
            np.testing.assert_array_equal(_stitch_band(multi, i), single)


class TestMultibandReproject:
    SRC = LayoutDefinition(LATLNG_WORLD, TileLayout(NT, NT, TS, TS))
    DST = LayoutDefinition(WEBMERCATOR_WORLD, TileLayout(NT, NT, TS, TS))

    @pytest.mark.parametrize("method", ["nearest", "bilinear"])
    def test_warp_matches_per_band(self, spark, method):
        bands = _band_arrays()
        multi = reproject_layer(
            _layer(spark, bands), self.SRC, self.DST, 2,
            "latlng", "webmercator", method=method).toPandas()
        for i, arr in enumerate(bands):
            single = _stitch(reproject_layer(
                _layer(spark, arr), self.SRC, self.DST, 2,
                "latlng", "webmercator", method=method).toPandas())
            got = _stitch_band(multi, i)
            np.testing.assert_array_equal(
                np.isnan(got), np.isnan(single), err_msg=f"band {i}")
            m = ~np.isnan(single)
            np.testing.assert_array_equal(got[m], single[m],
                                          err_msg=f"band {i} {method}")

    def test_band_select_after_multiband_focal(self, spark):
        # chain check: NDVI-then-slope style flows keep the band axis
        bands = _band_arrays()
        multi = focal(_layer(spark, bands), "mean", size=1)
        b1 = band_select(multi, 1).toPandas()
        single = _stitch(focal(_layer(spark, bands[1]), "mean", size=1).toPandas())
        np.testing.assert_array_equal(_stitch(b1), single)
