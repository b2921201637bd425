"""Iterative propagation operators (terrain.py) vs reference-faithful
whole-raster oracles (oracle.fill_ref / flow_direction_ref /
flow_accumulation_ref / cost_distance_ref / viewshed_ref)."""

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec, fixtures, oracle
from tilegrid.cell import z2_encode
from tilegrid.grid import Extent, LayoutDefinition, TileLayout
from tilegrid.operators import terrain as TR

TS = 16  # tile size
NT = 4   # tiles per side -> 64x64 raster
LAYOUT = LayoutDefinition(
    Extent(0.0, 0.0, float(NT * TS), float(NT * TS)),
    TileLayout(NT, NT, TS, TS),
)


def dem_distinct() -> np.ndarray:
    """Strictly-distinct integer DEM: hashy base * N + unique index, so no
    two cells are equal -> the D8 graph is a forest (no flat ties)."""
    n = NT * TS
    gy, gx = np.mgrid[0:n, 0:n]
    base = (gx * 31 + gy * 17 + (gx * gy) % 13) % 23
    return (base * n * n + gy * n + gx).astype(np.float64)


def dem_spiky() -> np.ndarray:
    """Mostly-flat DEM with isolated spikes (fill targets)."""
    n = NT * TS
    gy, gx = np.mgrid[0:n, 0:n]
    arr = ((gx + gy) % 3).astype(np.float64)
    spikes = ((gx * 7 + gy * 11) % 59) == 0
    return np.where(spikes, arr + 100.0, arr)


def layer_from(spark, arr: np.ndarray):
    rows = []
    n = arr.shape[0] // TS
    for r in range(n):
        for c in range(n):
            t = arr[r * TS : (r + 1) * TS, c * TS : (c + 1) * TS]
            rows.append(
                {
                    "zoom": np.int32(6), "col": np.int32(c), "row": np.int32(r),
                    "cell": np.int64(z2_encode(c, r)),
                    "tile": codec.raw_encode(np.ascontiguousarray(t)),
                    "h": np.int32(TS), "w": np.int32(TS), "fmt": "raw",
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def stitched(pdf):
    arr, _ = fixtures.stitch_layer_df(pdf)
    return arr


class TestFill:
    def test_matches_ref(self, spark):
        dem = dem_spiky()
        got = stitched(TR.fill(layer_from(spark, dem), threshold=20.0).toPandas())
        want = oracle.fill_ref(dem, 20.0)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        assert not np.allclose(dem, want)  # some spikes actually filled

    def test_nodata_passthrough(self, spark):
        dem = dem_spiky()
        dem[5, 5] = np.nan
        got = stitched(TR.fill(layer_from(spark, dem), threshold=20.0).toPandas())
        assert np.isnan(got[5, 5])


class TestFlowDirection:
    def test_matches_ref(self, spark):
        dem = dem_distinct()
        got = stitched(TR.flow_direction(layer_from(spark, dem)).toPandas())
        want = oracle.flow_direction_ref(dem)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_array_equal(got[m], want[m])

    def test_tie_bits_sum(self, spark):
        # symmetric ridge: center cell drops equally east and west
        dem = np.zeros((TS, TS)) + 5.0
        dem[8, 8] = 10.0
        dem[8, 7] = dem[8, 9] = 1.0  # equal max drops E (1) and W (16)
        want = oracle.flow_direction_ref(dem)
        assert int(want[8, 8]) == 17
        got = stitched(TR.flow_direction(layer_from(
            spark, np.tile(dem, (NT, NT))[: NT * TS, : NT * TS])).toPandas())
        # the tiled copy keeps (8,8) interior to tile (0,0)
        assert int(got[8, 8]) == int(
            oracle.flow_direction_ref(np.tile(dem, (NT, NT)))[8, 8])


class TestFlowAccumulation:
    def test_matches_ref_cross_tile(self, spark):
        dem = dem_distinct()
        dirs = TR.flow_direction(layer_from(spark, dem))
        got = stitched(TR.flow_accumulation(dirs).toPandas())
        want = oracle.flow_accumulation_ref(oracle.flow_direction_ref(dem))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        assert want.max() > TS  # at least one flow path crosses tiles

    def test_convergence_bound(self, spark):
        # a flow path crosses at most (2*NT - 1) tile boundaries on this
        # grid; the boundary-exchange loop must reach the fixpoint within
        # that many rounds + 1 (the verdict's convergence-bound check)
        dem = dem_distinct()
        dirs = TR.flow_direction(layer_from(spark, dem))
        got = stitched(TR.flow_accumulation(dirs, max_rounds=2 * NT + 1).toPandas())
        want = oracle.flow_accumulation_ref(oracle.flow_direction_ref(dem))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


class TestCostDistance:
    def test_matches_ref_cross_tile(self, spark):
        n = NT * TS
        gy, gx = np.mgrid[0:n, 0:n]
        friction = (1.0 + (gx * 13 + gy * 7) % 5).astype(np.float64)
        sources = [(3, 3), (50, 60), (33, 20)]
        got = stitched(TR.cost_distance(
            layer_from(spark, friction), sources, LAYOUT).toPandas())
        want = oracle.cost_distance_ref(friction, sources)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_nodata_wall_blocks(self, spark):
        n = NT * TS
        friction = np.ones((n, n))
        friction[:, 30] = np.nan  # full-height wall minus nothing
        got = stitched(TR.cost_distance(
            layer_from(spark, friction), [(2, 2)], LAYOUT).toPandas())
        want = oracle.cost_distance_ref(friction, [(2, 2)])
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-12)
        assert np.isnan(got[:, 31:]).all()  # unreachable beyond the wall


class TestViewshed:
    def test_matches_ref_per_tile(self, spark):
        dem = (dem_spiky() * 0.25 + dem_distinct() % 7).astype(np.float64)
        out = TR.viewshed(layer_from(spark, dem)).toPandas()
        for _, r in out.iterrows():
            got = codec.decode_tile(bytes(r["tile"]), r["fmt"])
            c, ro = int(r["col"]), int(r["row"])
            tile_dem = dem[ro * TS : (ro + 1) * TS, c * TS : (c + 1) * TS]
            want = oracle.viewshed_ref(tile_dem, TS // 2, TS // 2)
            np.testing.assert_array_equal(got, want, err_msg=f"tile {c},{ro}")

    def test_flat_dem_all_visible(self, spark):
        dem = np.full((NT * TS, NT * TS), 7.0)
        out = TR.viewshed(layer_from(spark, dem)).toPandas()
        for _, r in out.iterrows():
            got = codec.decode_tile(bytes(r["tile"]), r["fmt"])
            assert (got == 1.0).all()


class TestEuclideanDistance:
    def test_matches_brute(self, spark):
        pts = pd.DataFrame(
            {"x": [5.0, 40.25, 63.0], "y": [10.0, 22.5, 1.0]}
        )
        tmpl = layer_from(spark, np.zeros((NT * TS, NT * TS)))
        got = stitched(TR.euclidean_distance(tmpl, pts, LAYOUT).toPandas())
        n = NT * TS
        cw = LAYOUT.cell_width
        xs = LAYOUT.extent.xmin + (np.arange(n) + 0.5) * cw
        ys = LAYOUT.extent.ymax - (np.arange(n) + 0.5) * LAYOUT.cell_height
        gx, gy = np.meshgrid(xs, ys)
        want = np.sqrt(np.min(
            (gx[:, :, None] - pts.x.values) ** 2
            + (gy[:, :, None] - pts.y.values) ** 2, axis=2))
        np.testing.assert_allclose(got, want, rtol=1e-12)
