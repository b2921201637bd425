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
    Extent,
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


class TestMultibandReshape:
    """crop/mask/merge are band-agnostic (2D boolean masks index the first
    two axes of an (h, w, b) stack) — assert 3-band == per-band, the
    reference's multiband crop/mask/merge contract
    (MultibandTileLayerRDDMethods.scala)."""

    # the fixture layer grid: NT x NT tiles of TS px over a square world
    LAYOUT = LayoutDefinition(
        Extent(0.0, 0.0, float(NT * TS), float(NT * TS)),
        TileLayout(NT, NT, TS, TS),
    )

    def _collect(self, df):
        out = {}
        for r in df.collect():
            out[(r["col"], r["row"])] = codec.decode_tile(
                bytes(r["tile"]), r["fmt"])
        return out

    def test_crop_bandwise(self, spark):
        from tilegrid.operators.reshape import crop

        arrs = _band_arrays()
        ext = Extent(10.0, 6.0, 44.0, 39.0)
        mb = self._collect(crop(_layer(spark, arrs), ext, self.LAYOUT))
        for b, arr in enumerate(arrs):
            sb = self._collect(crop(_layer(spark, arr), ext, self.LAYOUT))
            assert set(sb) == set(mb)
            for k in sb:
                np.testing.assert_array_equal(mb[k][:, :, b], sb[k])

    def test_mask_bandwise(self, spark):
        from tilegrid.operators.reshape import mask

        arrs = _band_arrays()
        tri = [np.array([[5.0, 5.0], [60.0, 12.0], [30.0, 55.0]])]
        mb = self._collect(mask(_layer(spark, arrs), tri, self.LAYOUT))
        for b, arr in enumerate(arrs):
            sb = self._collect(mask(_layer(spark, arr), tri, self.LAYOUT))
            assert set(sb) == set(mb)
            for k in sb:
                np.testing.assert_array_equal(mb[k][:, :, b], sb[k])

    def test_merge_bandwise(self, spark):
        from tilegrid.operators.reshape import merge_layers

        arrs_a = _band_arrays()
        arrs_b = [a * 2.0 + 1.0 for a in arrs_a]
        # punch NoData holes in a so b fills them
        holed = []
        for a in arrs_a:
            h = a.copy()
            h[5:40, 10:30] = np.nan
            holed.append(h)
        mb = self._collect(merge_layers(_layer(spark, holed),
                                        _layer(spark, arrs_b)))
        for b, (ha, bb) in enumerate(zip(holed, arrs_b)):
            sb = self._collect(merge_layers(_layer(spark, ha),
                                            _layer(spark, bb)))
            assert set(sb) == set(mb)
            for k in sb:
                np.testing.assert_array_equal(mb[k][:, :, b], sb[k])


class TestMultibandLocal:
    """Unary/binary local map algebra is elementwise, so an (h, w, b)
    stack must equal per-band single-band runs (the reference's multiband
    combine semantics, ArrayMultibandTile.combine)."""

    def _collect(self, df):
        return {(r["col"], r["row"]): codec.decode_tile(bytes(r["tile"]), r["fmt"])
                for r in df.collect()}

    def test_unary_and_binary_bandwise(self, spark):
        from tilegrid.operators.local import local_binary, local_unary

        arrs = _band_arrays()
        others = [np.abs(a) + 1.0 for a in arrs]
        mb_sqrt = self._collect(local_unary(
            _layer(spark, [np.abs(a) for a in arrs]), "sqrt"))
        mb_add = self._collect(local_binary(
            _layer(spark, arrs), _layer(spark, others), "add"))
        for b, (a, o) in enumerate(zip(arrs, others)):
            sb_sqrt = self._collect(local_unary(_layer(spark, np.abs(a)), "sqrt"))
            sb_add = self._collect(local_binary(
                _layer(spark, a), _layer(spark, o), "add"))
            for k in sb_sqrt:
                np.testing.assert_array_equal(mb_sqrt[k][:, :, b], sb_sqrt[k])
                np.testing.assert_array_equal(mb_add[k][:, :, b], sb_add[k])
