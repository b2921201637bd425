"""Split vs reference semantics (raster-test/.../split/SplitSpec.scala):
window loop, extend/truncate edge handling, extent updating, and the
distributed layer/scene forms."""

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec
from tilegrid.operators.split import split_array, split_layer, split_scenes


class TestSplitArray:
    def test_even_grid(self):
        a = np.arange(16, dtype=np.float64).reshape(4, 4)
        pieces = list(split_array(a, 2, 2))
        assert [(lc, lr) for lc, lr, _ in pieces] == [
            (0, 0), (1, 0), (0, 1), (1, 1)
        ]
        np.testing.assert_array_equal(pieces[0][2], [[0, 1], [4, 5]])
        np.testing.assert_array_equal(pieces[3][2], [[10, 11], [14, 15]])

    def test_extend_pads_with_nodata(self):
        """SplitSpec: a 5x3 raster split 2x2 with extend gives full-size
        pieces, out-of-source cells NoData."""
        a = np.arange(15, dtype=np.float64).reshape(3, 5)
        pieces = {(lc, lr): p for lc, lr, p in split_array(a, 2, 2, extend=True)}
        assert set(pieces) == {(c, r) for c in range(3) for r in range(2)}
        assert all(p.shape == (2, 2) for p in pieces.values())
        edge = pieces[(2, 1)]
        assert edge[0, 0] == 14.0
        assert np.isnan(edge[0, 1]) and np.isnan(edge[1, 0]) and np.isnan(edge[1, 1])

    def test_no_extend_truncates(self):
        a = np.arange(15, dtype=np.float64).reshape(3, 5)
        pieces = {(lc, lr): p for lc, lr, p in split_array(a, 2, 2, extend=False)}
        assert pieces[(2, 1)].shape == (1, 1)
        assert pieces[(2, 0)].shape == (2, 1)
        assert pieces[(0, 1)].shape == (1, 2)

    def test_multiband_preserved(self):
        a = np.arange(48, dtype=np.float64).reshape(4, 4, 3)
        pieces = list(split_array(a, 2, 2))
        assert all(p.shape == (2, 2, 3) for _, _, p in pieces)
        np.testing.assert_array_equal(pieces[0][2][:, :, 0], [[0, 3], [12, 15]])

    def test_reassembly_is_lossless(self):
        a = np.arange(7 * 11, dtype=np.float64).reshape(7, 11)
        out = np.full((8, 12), np.nan)
        for lc, lr, p in split_array(a, 4, 4, extend=True):
            out[lr * 4 : lr * 4 + 4, lc * 4 : lc * 4 + 4] = p
        np.testing.assert_array_equal(out[:7, :11], a)
        assert np.isnan(out[7:, :]).all() and np.isnan(out[:, 11:]).all()


class TestSplitScenes:
    def _scenes(self, spark, arr, extent):
        xmin, ymin, xmax, ymax = extent
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "scene_id": ["s0"],
                    "tile": [codec.raw_encode(arr.astype(np.float64))],
                    "fmt": ["raw"],
                    "xmin": [xmin],
                    "ymin": [ymin],
                    "xmax": [xmax],
                    "ymax": [ymax],
                }
            )
        )

    def test_extents_tile_the_scene(self, spark):
        """ProjectedExtentRDDSplitMethods: subtile extents are the
        cell-aligned windows of the parent extent."""
        a = np.arange(64, dtype=np.float64).reshape(8, 8)
        df = self._scenes(spark, a, (0.0, 0.0, 8.0, 8.0))  # 1.0 cells
        out = split_scenes(df, 4, 4).toPandas()
        assert len(out) == 4
        ext = {
            (r.sub_col, r.sub_row): (r.xmin, r.ymin, r.xmax, r.ymax)
            for r in out.itertuples()
        }
        assert ext[(0, 0)] == (0.0, 4.0, 4.0, 8.0)
        assert ext[(1, 1)] == (4.0, 0.0, 8.0, 4.0)
        # pixel parity: top-left subtile is the top-left quadrant
        tl = codec.decode_tile(
            bytes(out.set_index(["sub_col", "sub_row"]).loc[(0, 0)].tile), "raw"
        )
        np.testing.assert_array_equal(tl, a[:4, :4])

    def test_ragged_scene_extend(self, spark):
        a = np.arange(30, dtype=np.float64).reshape(5, 6)
        df = self._scenes(spark, a, (0.0, 0.0, 6.0, 5.0))
        out = split_scenes(df, 4, 4, extend=True).toPandas()
        assert len(out) == 4
        assert set(zip(out.h, out.w)) == {(4, 4)}
        # extended edge extents run past the parent (cell-aligned windows)
        er = out[(out.sub_col == 1) & (out.sub_row == 1)].iloc[0]
        assert (er.xmin, er.ymax) == (4.0, 1.0)
        assert (er.xmax, er.ymin) == (8.0, -3.0)


class TestSplitLayer:
    def test_split_then_sum_matches(self, spark):
        rng = np.random.default_rng(7)
        tiles = []
        from tilegrid.cell import z2_encode

        arrs = {}
        for col, row in [(0, 0), (1, 0), (3, 2)]:
            a = rng.integers(0, 9, (32, 32)).astype(np.float64)
            arrs[(col, row)] = a
            tiles.append(
                {
                    "zoom": 3, "col": col, "row": row,
                    "cell": int(z2_encode(col, row)),
                    "tile": codec.raw_encode(a), "h": 32, "w": 32, "fmt": "raw",
                }
            )
        layer = spark.createDataFrame(pd.DataFrame(tiles))
        out = split_layer(layer, factor=2).toPandas()
        assert len(out) == 12 and set(zip(out.h, out.w)) == {(16, 16)}
        for (col, row), a in arrs.items():
            for lc in range(2):
                for lr in range(2):
                    sub = out[(out.col == col * 2 + lc) & (out.row == row * 2 + lr)]
                    assert len(sub) == 1
                    got = codec.decode_tile(bytes(sub.iloc[0].tile), "raw")
                    np.testing.assert_array_equal(
                        got, a[lr * 16 : (lr + 1) * 16, lc * 16 : (lc + 1) * 16]
                    )
