"""Distributed == sequential tests for tiler, pyramid, local map algebra
(the reference's OpAsserter invariant, OpAsserter.scala:63-81)."""

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec, fixtures, oracle
from tilegrid.grid import Extent, ZoomedLayoutScheme, lnglat_to_webmercator
from tilegrid.operators import local as L
from tilegrid.operators import pyramid as P
from tilegrid.operators import tiler as T
from tilegrid.tiles import nn_paste, nodata_mask_nan

ZOOM = 3
SCHEME = ZoomedLayoutScheme("webmercator")
LAYOUT = SCHEME.level_for_zoom(ZOOM).layout


def images_with_xy(n):
    pdf = fixtures.images_table(n)
    x, y = lnglat_to_webmercator(pdf.lon.values, pdf.lat.values)
    pdf["x"], pdf["y"] = x, y
    return pdf


def oracle_extents(pdf):
    cw, ch = LAYOUT.cell_width, LAYOUT.cell_height
    xmin = pdf.x.values - pdf.w.values * cw / 2
    xmax = pdf.x.values + pdf.w.values * cw / 2
    ymin = pdf.y.values - pdf.h.values * ch / 2
    ymax = pdf.y.values + pdf.h.values * ch / 2
    return xmin, ymin, xmax, ymax


class TestTileAssignments:
    def test_assignments_match_oracle(self, spark):
        pdf = images_with_xy(80)
        df = spark.createDataFrame(pdf[["image_id", "x", "y", "w", "h"]])
        got = (
            T.tile_assignments(
                T.with_extent_from_center(df, LAYOUT, "x", "y"), LAYOUT, ZOOM
            )
            .toPandas()
        )
        got_set = set(zip(got.image_id, got.col, got.row))

        xmin, ymin, xmax, ymax = oracle_extents(pdf)
        keys = oracle.tile_assignments(LAYOUT, xmin, ymin, xmax, ymax)
        want = set()
        for iid, ks in zip(pdf.image_id, keys):
            for c, r in ks:
                want.add((iid, c, r))
        assert got_set == want

    def test_point_keys_match_oracle(self, spark):
        pdf = fixtures.points_table(300)
        x, y = lnglat_to_webmercator(pdf.lon.values, pdf.lat.values)
        pdf["x"], pdf["y"] = x, y
        df = spark.createDataFrame(pdf[["point_id", "x", "y"]])
        lvl = SCHEME.level_for_zoom(8)
        got = T.with_key_columns(df, lvl.layout, "x", "y", 8).toPandas()
        oc, orw = lvl.layout.map_transform.keys_for_points(x, y)
        got = got.sort_values("point_id")
        np.testing.assert_array_equal(got.col.values, oc)
        np.testing.assert_array_equal(got.row.values, orw)
        from tilegrid.cell import z2_encode

        np.testing.assert_array_equal(got.cell.values, z2_encode(oc, orw))


def merge_order_key(image_id: str) -> tuple[int, str]:
    """Canonical merge order (tiler._cut_parts_direct): (md5-prefix hash, id)."""
    import hashlib

    return (int(hashlib.md5(image_id.encode()).hexdigest()[:15], 16), image_id)


def oracle_tile_to_layout(pdf, multiband=False):
    """Sequential tiler: same merge semantics, canonical (hash, id) order."""
    mt = LAYOUT.map_transform
    xmin, ymin, xmax, ymax = oracle_extents(pdf)
    keysets = oracle.tile_assignments(LAYOUT, xmin, ymin, xmax, ymax)
    order = sorted(
        range(len(pdf)), key=lambda i: merge_order_key(pdf.image_id.values[i])
    )
    tiles: dict[tuple[int, int], np.ndarray] = {}
    ts = LAYOUT.tile_layout.tile_cols
    shape = (ts, ts, 3) if multiband else (ts, ts)
    for i in order:
        r = pdf.iloc[i]
        src = codec.decode_tile(bytes(r["bytes"]), r["fmt"]).astype(np.float64)
        if src.ndim == 3 and not multiband:
            src = codec.to_gray_f64(src)
        src_ext = Extent(xmin[i], ymin[i], xmax[i], ymax[i])
        for c, rw in keysets[i]:
            tgt = tiles.setdefault((c, rw), np.full(shape, np.nan))
            nn_paste(tgt, mt.extent_for_key(c, rw), src, src_ext, nodata_mask_nan)
    return tiles


class TestTileToLayout:
    def test_pixels_match_oracle(self, spark):
        pdf = images_with_xy(40)
        df = spark.createDataFrame(
            pdf[["image_id", "bytes", "fmt", "x", "y", "w", "h"]].rename(
                columns={"bytes": "tile"}
            )
        )
        layer = T.tile_to_layout(
            T.with_extent_from_center(df, LAYOUT, "x", "y"), LAYOUT, ZOOM
        ).toPandas()
        want = oracle_tile_to_layout(pdf)
        assert set(zip(layer.col, layer.row)) == set(want)
        for t in layer.itertuples(index=False):
            got = codec.decode_tile(bytes(t.tile), t.fmt)
            exp = want[(t.col, t.row)]
            np.testing.assert_array_equal(
                np.isnan(got), np.isnan(exp), err_msg=f"key {(t.col, t.row)}"
            )
            m = ~np.isnan(exp)
            np.testing.assert_allclose(got[m], exp[m], err_msg=f"key {(t.col, t.row)}")

    def test_multiband_pixels_match_oracle(self, spark):
        """RGB corpus through the tiler with multiband=True: per-band parity
        vs the sequential (h, w, 3) oracle (MultibandTile semantics)."""
        pdf = images_with_xy(30)
        df = spark.createDataFrame(
            pdf[["image_id", "bytes", "fmt", "x", "y", "w", "h"]].rename(
                columns={"bytes": "tile"}
            )
        )
        layer = T.tile_to_layout(
            T.with_extent_from_center(df, LAYOUT, "x", "y"), LAYOUT, ZOOM,
            multiband=True,
        ).toPandas()
        want = oracle_tile_to_layout(pdf, multiband=True)
        assert set(zip(layer.col, layer.row)) == set(want)
        for t in layer.itertuples(index=False):
            got = codec.decode_tile(bytes(t.tile), t.fmt)
            exp = want[(t.col, t.row)]
            assert got.shape == exp.shape and got.shape[2] == 3
            np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
            m = ~np.isnan(exp)
            np.testing.assert_allclose(got[m], exp[m], err_msg=f"key {(t.col, t.row)}")

    def test_band_select_and_combine(self, spark):
        """band_select(i) of the multiband layer == grayscale of channel i;
        normalized_difference is exact per pixel."""
        from tilegrid.operators.bands import band_select, band_stack, normalized_difference

        pdf = images_with_xy(20)
        df = spark.createDataFrame(
            pdf[["image_id", "bytes", "fmt", "x", "y", "w", "h"]].rename(
                columns={"bytes": "tile"}
            )
        )
        placed = T.with_extent_from_center(df, LAYOUT, "x", "y")
        mb = T.tile_to_layout(placed, LAYOUT, ZOOM, multiband=True).persist()
        want = oracle_tile_to_layout(pdf, multiband=True)
        b1 = band_select(mb, 1).toPandas()
        for t in b1.itertuples(index=False):
            got = codec.decode_tile(bytes(t.tile), t.fmt)
            exp = want[(t.col, t.row)][:, :, 1]
            m = ~np.isnan(exp)
            np.testing.assert_allclose(got[m], exp[m])
        nd = normalized_difference(mb, 0, 2).toPandas()
        for t in nd.itertuples(index=False):
            got = codec.decode_tile(bytes(t.tile), t.fmt)
            w3 = want[(t.col, t.row)]
            den = w3[:, :, 0] + w3[:, :, 2]
            with np.errstate(invalid="ignore", divide="ignore"):
                exp = (w3[:, :, 0] - w3[:, :, 2]) / den
            exp[den == 0] = np.nan
            m = ~np.isnan(exp)
            np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
            np.testing.assert_allclose(got[m], exp[m])
        # restack the selected bands -> identical multiband tiles
        restack = band_stack(
            [band_select(mb, i) for i in range(3)]
        ).toPandas()
        for t in restack.itertuples(index=False):
            got = codec.decode_tile(bytes(t.tile), t.fmt)
            exp = want[(t.col, t.row)]
            m = ~np.isnan(exp)
            np.testing.assert_allclose(got[m], exp[m])
        mb.unpersist()

    def test_salted_merge_bit_identical(self, spark):
        """Hot-cell skew split (two-phase salted merge) must be bit-identical
        to the unsalted fold — north-rule requirement: salting may never
        change join/tile output. Corpus: many overlapping images on one tile
        (forced hot key) + background images."""
        pdf = images_with_xy(60)
        # pile 40 of them onto the same spot -> one hot tile
        pdf.loc[:39, "x"] = pdf.loc[40, "x"]
        pdf.loc[:39, "y"] = pdf.loc[40, "y"]
        df = spark.createDataFrame(
            pdf[["image_id", "bytes", "fmt", "x", "y", "w", "h"]].rename(
                columns={"bytes": "tile"}
            )
        )
        placed = T.with_extent_from_center(df, LAYOUT, "x", "y")
        plain = T.tile_to_layout(placed, LAYOUT, ZOOM, hot_threshold=None).toPandas()
        salted = T.tile_to_layout(
            placed, LAYOUT, ZOOM, hot_threshold=8, n_salt=4
        ).toPandas()
        pk = {(t.col, t.row): bytes(t.tile) for t in plain.itertuples(index=False)}
        sk = {(t.col, t.row): bytes(t.tile) for t in salted.itertuples(index=False)}
        assert pk.keys() == sk.keys()
        for k in pk:
            a = codec.decode_tile(pk[k], "raw")
            b = codec.decode_tile(sk[k], "raw")
            np.testing.assert_array_equal(
                np.isnan(a), np.isnan(b), err_msg=f"key {k}"
            )
            m = ~np.isnan(a)
            np.testing.assert_array_equal(a[m], b[m], err_msg=f"key {k}")


class TestReproject:
    def test_warp_latlng_to_webmercator_matches_oracle(self, spark):
        """NN warp vs a whole-array NumPy oracle: every dst pixel center
        inverse-mapped to the stitched source (TileRDDReproject parity)."""
        from tilegrid.grid import (
            LATLNG_WORLD, WEBMERCATOR_WORLD, LayoutDefinition, TileLayout,
            webmercator_to_lnglat,
        )
        from tilegrid.operators.reproject import reproject_layer

        src_layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 16, 16))
        dst_layout = LayoutDefinition(WEBMERCATOR_WORLD, TileLayout(4, 4, 16, 16))
        # deterministic non-trivial source: value = global pixel index
        rows = []
        from tilegrid.cell import z2_encode

        src_px = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
        for c in range(4):
            for r in range(4):
                arr = src_px[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16]
                rows.append((2, c, r, int(z2_encode(c, r)),
                             codec.raw_encode(np.ascontiguousarray(arr)),
                             16, 16, "raw"))
        from tilegrid.operators import LAYER_SCHEMA

        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile",
                                        "h", "w", "fmt"]),
            schema=LAYER_SCHEMA,
        )
        out = reproject_layer(
            layer, src_layout, dst_layout, 2, "latlng", "webmercator"
        ).toPandas()
        assert len(out) == 16  # full dst coverage
        half = WEBMERCATOR_WORLD.xmax
        cwm = 2 * half / 64
        gx, gy = np.meshgrid(np.arange(64), np.arange(64))
        mx = -half + (gx + 0.5) * cwm
        my = half - (gy + 0.5) * cwm
        lon, lat = webmercator_to_lnglat(mx.ravel(), my.ravel())
        sgx = np.floor((lon + 180.0) / src_layout.cell_width).astype(np.int64)
        sgy = np.floor((90.0 - lat) / src_layout.cell_height).astype(np.int64)
        want = src_px[sgy, sgx].reshape(64, 64)
        got, (c0, r0, _, _) = fixtures.stitch_layer_df(out)
        assert (c0, r0) == (0, 0)
        np.testing.assert_array_equal(got, want)


class TestReprojectBilinear:
    def test_bilinear_warp_matches_oracle(self, spark):
        """Buffered-tile bilinear warp vs a whole-array NumPy oracle."""
        from tilegrid.grid import (
            LATLNG_WORLD, WEBMERCATOR_WORLD, LayoutDefinition, TileLayout,
            webmercator_to_lnglat,
        )
        from tilegrid.operators.reproject import reproject_layer

        src_layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 16, 16))
        dst_layout = LayoutDefinition(WEBMERCATOR_WORLD, TileLayout(4, 4, 16, 16))
        from tilegrid.cell import z2_encode
        from tilegrid.operators import LAYER_SCHEMA

        rng = np.random.default_rng(13)
        src_px = rng.random((64, 64)) * 50.0
        rows = []
        for c in range(4):
            for r in range(4):
                arr = src_px[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16]
                rows.append((2, c, r, int(z2_encode(c, r)),
                             codec.raw_encode(np.ascontiguousarray(arr)),
                             16, 16, "raw"))
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile",
                                        "h", "w", "fmt"]),
            schema=LAYER_SCHEMA,
        )
        out = reproject_layer(
            layer, src_layout, dst_layout, 2, "latlng", "webmercator",
            method="bilinear",
        ).toPandas()
        assert len(out) == 16
        half = WEBMERCATOR_WORLD.xmax
        cwm = 2 * half / 64
        gx, gy = np.meshgrid(np.arange(64), np.arange(64))
        mx = -half + (gx + 0.5) * cwm
        my = half - (gy + 0.5) * cwm
        lon, lat = webmercator_to_lnglat(mx.ravel(), my.ravel())
        fx = (lon + 180.0) / src_layout.cell_width - 0.5
        fy = (90.0 - lat) / src_layout.cell_height - 0.5
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, 63)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, 63)
        x1 = np.clip(x0 + 1, 0, 63)
        y1 = np.clip(y0 + 1, 0, 63)
        wx = np.clip(fx - x0, 0.0, 1.0)
        wy = np.clip(fy - y0, 0.0, 1.0)
        top = src_px[y0, x0] * (1 - wx) + src_px[y0, x1] * wx
        bot = src_px[y1, x0] * (1 - wx) + src_px[y1, x1] * wx
        want = (top * (1 - wy) + bot * wy).reshape(64, 64)
        got, (c0, r0, _, _) = fixtures.stitch_layer_df(out)
        assert (c0, r0) == (0, 0)
        assert not np.isnan(got).any()
        np.testing.assert_allclose(got, want, rtol=1e-12)


def layer_df(spark, variant, tile_size=16):
    return spark.createDataFrame(fixtures.tile_layer_table(variant, tile_size=tile_size))


def stitched(pdf):
    arr, _ = fixtures.stitch_layer_df(pdf)
    return arr


class TestLocalOps:
    def test_binary_add(self, spark):
        a = layer_df(spark, "increasing")
        b = layer_df(spark, "all-twos")
        out = L.local_binary(a, b, "add").toPandas()
        got = stitched(out)
        want = stitched(fixtures.tile_layer_table("increasing")) + 2.0
        np.testing.assert_allclose(got, want)

    def test_unary_sqrt_and_scalar(self, spark):
        a = layer_df(spark, "increasing")
        got = stitched(L.local_unary(a, "sqrt").toPandas())
        want = np.sqrt(stitched(fixtures.tile_layer_table("increasing")))
        np.testing.assert_allclose(got, want)
        got2 = stitched(L.local_unary(a, "multiply", scalar=3.0).toPandas())
        np.testing.assert_allclose(got2, want**2 * 3.0)

    def test_nodata_propagates(self, spark):
        a = layer_df(spark, "every-other-undefined")
        b = layer_df(spark, "all-ones")
        got = stitched(L.local_binary(a, b, "add").toPandas())
        src = stitched(fixtures.tile_layer_table("every-other-undefined"))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(src))
        np.testing.assert_allclose(got[~np.isnan(got)], src[~np.isnan(src)] + 1)

    def test_nary_mean_and_variety(self, spark):
        dfs = [layer_df(spark, v) for v in ("all-ones", "all-twos", "all-hundreds")]
        got = stitched(L.local_nary(dfs, "mean").toPandas())
        np.testing.assert_allclose(got, np.full_like(got, (1 + 2 + 100) / 3))
        got_v = stitched(L.local_nary(dfs, "variety").toPandas())
        np.testing.assert_allclose(got_v, np.full_like(got_v, 3.0))

    def test_local_mask(self, spark):
        a = layer_df(spark, "all-hundreds")
        m = layer_df(spark, "every-other-undefined")
        got = stitched(L.local_mask(a, m).toPandas())
        mask_src = stitched(fixtures.tile_layer_table("every-other-undefined"))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(mask_src))


class TestPyramid:
    def test_one_level_matches_oracle(self, spark):
        a = layer_df(spark, "increasing")
        up = P.pyramid_up(a, "average").toPandas()
        # oracle: stitch bounds grid into global array aligned to even keys
        src = fixtures.tile_layer_table("increasing")
        tiles = {
            (int(r["col"]), int(r["row"])): codec.decode_tile(bytes(r["tile"]))
            for _, r in src.iterrows()
        }
        ts = 16
        cmin, rmin, cmax, rmax = fixtures.TEST_BOUNDS
        for t in up.itertuples(index=False):
            assert t.zoom == 7
            big = np.full((2 * ts, 2 * ts), np.nan)
            for dc in (0, 1):
                for dr in (0, 1):
                    child = (2 * t.col + dc, 2 * t.row + dr)
                    if child in tiles:
                        big[dr * ts : (dr + 1) * ts, dc * ts : (dc + 1) * ts] = tiles[child]
            want = oracle.pyramid_up(big, "average")
            got = codec.decode_tile(bytes(t.tile))
            np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
            m = ~np.isnan(want)
            np.testing.assert_allclose(got[m], want[m])

    def test_multiband_pyramid(self, spark):
        """pyramid_up over (h, w, 3) tiles: per-band 2x2 average."""
        from tilegrid.cell import z2_encode
        from tilegrid.operators import LAYER_SCHEMA

        rng = np.random.default_rng(9)
        tiles = {}
        rows = []
        for c in range(2):
            for r in range(2):
                arr = rng.random((16, 16, 3)) * 100
                tiles[(c, r)] = arr
                rows.append((8, c, r, int(z2_encode(c, r)),
                             codec.raw_encode(arr), 16, 16, "raw"))
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile",
                                        "h", "w", "fmt"]),
            schema=LAYER_SCHEMA,
        )
        up = P.pyramid_up(layer, "average").toPandas()
        assert len(up) == 1
        got = codec.decode_tile(bytes(up.iloc[0].tile), "raw")
        assert got.shape == (16, 16, 3)
        big = np.full((32, 32, 3), np.nan)
        for (c, r), a in tiles.items():
            big[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16] = a
        want = big.reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(got, want)

    def test_full_pyramid_counts(self, spark):
        a = layer_df(spark, "all-ones")
        levels = P.build_pyramid(a, max_zoom=8, min_zoom=5)
        counts = {z: levels[z].count() for z in levels}
        # bounds (1,1)-(6,7): z8=6x7=42 keys, z7 cols 0..3 rows 0..3 = 16,
        # z6 cols 0..1 rows 0..1 = 4, z5 = 1
        assert counts == {8: 42, 7: 16, 6: 4, 5: 1}


class TestLayoutMerge:
    def test_layout_merge_one_call(self, spark):
        """RDDLayoutMerge (RDDLayoutMerge.scala:31-55): right layer on a
        SHIFTED layout re-keys onto left's layout; left wins, right fills
        left's NoData."""
        import pandas as pd

        from tilegrid import codec
        from tilegrid.cell import z2_encode
        from tilegrid.grid import Extent, LayoutDefinition, TileLayout
        from tilegrid.operators.reshape import layout_merge

        ts = 8
        la = LayoutDefinition(Extent(0.0, 0.0, 16.0, 16.0), TileLayout(2, 2, ts, ts))
        lb = LayoutDefinition(Extent(4.0, 4.0, 20.0, 20.0), TileLayout(2, 2, ts, ts))

        def layer_of(layout, fn):
            rows = []
            for c in range(2):
                for r in range(2):
                    arr = np.asarray(
                        [[fn(c * ts + px, r * ts + py) for px in range(ts)]
                         for py in range(ts)], np.float64)
                    rows.append({
                        "zoom": np.int32(4), "col": np.int32(c), "row": np.int32(r),
                        "cell": np.int64(z2_encode(c, r)),
                        "tile": codec.raw_encode(arr), "h": np.int32(ts),
                        "w": np.int32(ts), "fmt": "raw",
                    })
            return spark.createDataFrame(pd.DataFrame(rows))

        # left: gx+gy, but NaN on a diagonal band; right: constant 99
        left = layer_of(la, lambda gx, gy: np.nan if (gx + gy) % 5 == 0 else gx + gy)
        right = layer_of(lb, lambda gx, gy: 99.0)
        got_pdf = layout_merge(left, la, right, lb, 4).toPandas()
        tiles = {(int(r["col"]), int(r["row"])):
                 codec.decode_tile(bytes(r["tile"]), r["fmt"])
                 for _, r in got_pdf.iterrows()}
        # oracle over left's global grid: pixel center (gx+0.5, 15.5-gy);
        # inside right's extent [4,20)x[4,20) the fill value is 99
        for (c, r), arr in tiles.items():
            for py in range(ts):
                for px in range(ts):
                    gx, gy = c * ts + px, r * ts + py
                    want = np.nan if (gx + gy) % 5 == 0 else gx + gy
                    cx_, cy_ = gx + 0.5, 16.0 - gy - 0.5
                    if np.isnan(want) and 4.0 <= cx_ < 20.0 and 4.0 <= cy_ < 20.0:
                        want = 99.0
                    if np.isnan(want):
                        assert np.isnan(arr[py, px]), (c, r, px, py)
                    else:
                        assert arr[py, px] == want, (c, r, px, py)


class TestMajorityVectorized:
    def test_matches_per_pixel_unique(self):
        """The sort/run-length majority kernel == the per-pixel np.unique
        definition (smallest value wins ties), NaNs excluded; all-NaN
        pixels stay NaN."""
        from tilegrid.operators.local import _majority

        rng = np.random.default_rng(17)
        for trial in range(10):
            n = int(rng.integers(1, 7))
            s = rng.integers(0, 4, (n, 9, 8)).astype(float)
            s[rng.random(s.shape) < 0.35] = np.nan
            for most in (True, False):
                want = np.full((9, 8), np.nan)
                for i in range(9):
                    for j in range(8):
                        v = s[:, i, j]
                        v = v[~np.isnan(v)]
                        if len(v):
                            vals, counts = np.unique(v, return_counts=True)
                            want[i, j] = vals[
                                np.argmax(counts) if most else np.argmin(counts)]
                np.testing.assert_array_equal(_majority(s, most), want)
