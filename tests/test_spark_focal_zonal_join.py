"""Distributed == sequential tests for focal, zonal, PIP join, kNN."""

import numpy as np
import pandas as pd
import pytest

from tilegrid import fixtures, oracle
from tilegrid.geometry import wkb_decode
from tilegrid.grid import ZoomedLayoutScheme, lnglat_to_webmercator
from tilegrid.operators import focal as FO
from tilegrid.operators import join as J
from tilegrid.operators import zonal as Z


def layer_df(spark, variant, tile_size=16):
    return spark.createDataFrame(fixtures.tile_layer_table(variant, tile_size=tile_size))


def stitched(pdf):
    arr, _ = fixtures.stitch_layer_df(pdf)
    return arr


def stitched_src(variant):
    return stitched(fixtures.tile_layer_table(variant))


class TestFocal:
    @pytest.mark.parametrize("op", ["mean", "sum", "min", "max", "median", "stddev"])
    def test_window_ops_match_oracle(self, spark, op):
        a = layer_df(spark, "mod-10000")
        got = stitched(FO.focal(a, op, size=1).toPandas())
        want = getattr(oracle, f"focal_{'std' if op == 'stddev' else op}")(
            stitched_src("mod-10000"), 3
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)


    def test_conway_matches_brute(self, spark):
        a = layer_df(spark, "every-other-undefined")
        got = stitched(FO.focal(a, "conway", size=1).toPandas())
        src = stitched_src("every-other-undefined")
        h, w = src.shape
        want = np.full((h, w), np.nan)
        for y in range(h):
            for x in range(w):
                n = 0
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w and not np.isnan(src[yy, xx]):
                            n += 1
                if n in (2, 3):
                    want[y, x] = 1.0
        np.testing.assert_array_equal(got, want)

    def test_mean_with_nodata(self, spark):
        a = layer_df(spark, "every-other-undefined")
        got = stitched(FO.focal_mean(a).toPandas())
        want = oracle.focal_mean(stitched_src("every-other-undefined"), 3)
        np.testing.assert_allclose(got, want, equal_nan=True)

    def test_mean_size2(self, spark):
        a = layer_df(spark, "increasing")
        got = stitched(FO.focal(a, "mean", size=2).toPandas())
        want = oracle.focal_mean(stitched_src("increasing"), 5)
        np.testing.assert_allclose(got, want)

    def test_slope_matches_oracle(self, spark):
        a = layer_df(spark, "mod-10000")
        got = stitched(FO.slope(a, cell_size=(30.0, 30.0)).toPandas())
        want = oracle.slope(stitched_src("mod-10000"), 30.0, 30.0)
        np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)

    def test_aspect_and_hillshade(self, spark):
        a = layer_df(spark, "increasing")
        got_a = stitched(FO.aspect(a, cell_size=(1.0, 1.0)).toPandas())
        want_a = oracle.aspect(stitched_src("increasing"), 1.0, 1.0)
        np.testing.assert_allclose(got_a, want_a, rtol=1e-12, equal_nan=True)
        got_h = stitched(
            FO.hillshade(a, cell_size=(1.0, 1.0), azimuth=315, altitude=45).toPandas()
        )
        want_h = oracle.hillshade(stitched_src("increasing"), 1.0, 1.0, 315, 45)
        np.testing.assert_allclose(got_h, want_h, equal_nan=True)

    def test_morans_i_matches_oracle(self, spark):
        a = layer_df(spark, "mod-10000")
        got = stitched(FO.morans_i(a).toPandas())
        want = oracle.morans_i(stitched_src("mod-10000"), 3)
        np.testing.assert_allclose(got, want, rtol=1e-10, equal_nan=True)
        gi = FO.morans_i_global(a).collect()[0]["morans_i"]
        wi = oracle.morans_i_global(stitched_src("mod-10000"), 3)
        np.testing.assert_allclose(gi, wi, rtol=1e-9)

    def test_mode_matches_oracle(self, spark):
        a = layer_df(spark, "every-other-undefined")
        got = stitched(FO.focal_mode(a).toPandas())
        want = oracle.focal_mode(stitched_src("every-other-undefined"), 3)
        np.testing.assert_allclose(got, want, equal_nan=True)
        b = layer_df(spark, "mod-10000")
        got2 = stitched(FO.focal_mode(b).toPandas())
        want2 = oracle.focal_mode(stitched_src("mod-10000"), 3)
        np.testing.assert_allclose(got2, want2, equal_nan=True)

    def test_mode_vectorized_kernel_speed(self):
        """The mode kernel must stay within ~5x of the median kernel on a
        256^2 tile (it was a 65k-iteration Python loop before)."""
        import time

        from tilegrid.operators.focal import _focal_mode_crop

        rng = np.random.default_rng(3)
        h = w = 256
        buf = np.full((h + 2, w + 2), np.nan)
        buf[1:-1, 1:-1] = rng.integers(0, 12, (h, w)).astype(float)
        # best-of-3 on both sides: a single run is vulnerable to one bad
        # scheduler slice when the whole suite saturates the box
        def best_of(fn, n=3):
            ts = []
            fn()  # warm
            for _ in range(n):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            return min(ts)

        mode_t = best_of(lambda: _focal_mode_crop(buf, 1, h, w))
        win = np.lib.stride_tricks.sliding_window_view(buf, (3, 3))
        med_t = best_of(lambda: np.nanmedian(win, axis=(2, 3)))
        assert mode_t <= 5 * med_t + 0.2, (mode_t, med_t)

    def test_convolve(self, spark):
        kern = np.array([[0.0, 1.0, 0.0], [1.0, 2.0, 1.0], [0.0, 1.0, 0.0]])
        a = layer_df(spark, "mod-10000")
        got = stitched(FO.convolve(a, kern).toPandas())
        want = oracle.convolve(stitched_src("mod-10000"), kern)
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestZonal:
    def test_histogram_matches_oracle(self, spark):
        v = layer_df(spark, "mod-10000")
        z = layer_df(spark, "zones")
        got = Z.zonal_histogram(v, z).toPandas()
        want = oracle.zonal_histogram(stitched_src("mod-10000"), stitched_src("zones"))
        got_map: dict[int, dict[float, int]] = {}
        for t in got.itertuples(index=False):
            got_map.setdefault(int(t.zone), {})[float(t.value)] = int(t.count)
        assert got_map == want

    def test_stats_mean(self, spark):
        v = layer_df(spark, "increasing")
        z = layer_df(spark, "zones")
        got = Z.zonal_stats(v, z).toPandas().set_index("zone").sort_index()
        vals = stitched_src("increasing")
        zones = stitched_src("zones")
        for zone in np.unique(zones):
            sel = vals[zones == zone]
            row = got.loc[int(zone)]
            assert row.zcount == sel.size
            np.testing.assert_allclose(row.zmean, sel.mean())
            np.testing.assert_allclose(row.zmin, sel.min())
            np.testing.assert_allclose(row.zmax, sel.max())


ZOOM = 6
LAYOUT = ZoomedLayoutScheme("webmercator").level_for_zoom(ZOOM).layout


def to_xy(pdf):
    x, y = lnglat_to_webmercator(pdf.lon.values, pdf.lat.values)
    pdf = pdf.copy()
    pdf["x"], pdf["y"] = x, y
    return pdf


class TestPipJoin:
    def test_matches_bruteforce(self, spark):
        pts = to_xy(fixtures.points_table(800))
        polys = fixtures.polygons_table(40)
        # polygons are in lon/lat: reproject rings to mercator for the join
        from tilegrid.geometry import wkb_encode_polygon

        merc_rows = []
        rings_by_id = {}
        for t in polys.itertuples(index=False):
            rings = wkb_decode(bytes(t.wkb))
            mr = []
            for ring in rings:
                rx, ry = lnglat_to_webmercator(ring[:, 0], ring[:, 1])
                mr.append(np.stack([rx, ry], axis=1))
            rings_by_id[t.polygon_id] = mr
            merc_rows.append({"polygon_id": t.polygon_id, "wkb": wkb_encode_polygon(mr)})
        polys_m = pd.DataFrame(merc_rows)

        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        got = J.pip_join(df, polys_m, LAYOUT, ZOOM).toPandas()
        got_set = set(zip(got.point_id, got.polygon_id))

        want = oracle.pip_join(
            pts.x.values, pts.y.values, pts.point_id.tolist(), rings_by_id
        )
        assert got_set == want
        assert len(want) > 0  # non-trivial

    def test_pip_join_df_matches_pandas_variant(self, spark):
        """DataFrame-native polygon side == driver-pandas variant."""
        pts = to_xy(fixtures.points_table(400))
        polys = fixtures.polygons_table(8)
        merc_rows = []
        from tilegrid.geometry import wkb_encode_polygon

        for t in polys.itertuples(index=False):
            rings = wkb_decode(bytes(t.wkb))
            mr = []
            for ring in rings:
                rx, ry = lnglat_to_webmercator(ring[:, 0], ring[:, 1])
                mr.append(np.stack([rx, ry], axis=1))
            merc_rows.append({"polygon_id": t.polygon_id, "wkb": wkb_encode_polygon(mr)})
        polys_m = pd.DataFrame(merc_rows)
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        want = J.pip_join(df, polys_m, LAYOUT, ZOOM).toPandas()
        got = J.pip_join_df(
            df, spark.createDataFrame(polys_m), LAYOUT, ZOOM
        ).toPandas()
        ws = set(zip(want.point_id, want.polygon_id))
        gs = set(zip(got.point_id, got.polygon_id))
        assert ws == gs and len(ws) > 0

    def test_unrefined_is_superset(self, spark):
        pts = to_xy(fixtures.points_table(300))
        polys = fixtures.polygons_table(10)
        from tilegrid.geometry import wkb_encode_polygon

        merc_rows = []
        for t in polys.itertuples(index=False):
            rings = wkb_decode(bytes(t.wkb))
            mr = []
            for ring in rings:
                rx, ry = lnglat_to_webmercator(ring[:, 0], ring[:, 1])
                mr.append(np.stack([rx, ry], axis=1))
            merc_rows.append({"polygon_id": t.polygon_id, "wkb": wkb_encode_polygon(mr)})
        polys_m = pd.DataFrame(merc_rows)
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        coarse = J.pip_join(df, polys_m, LAYOUT, ZOOM, refine=False).toPandas()
        fine = J.pip_join(df, polys_m, LAYOUT, ZOOM).toPandas()
        cs = set(zip(coarse.point_id, coarse.polygon_id))
        fs = set(zip(fine.point_id, fine.polygon_id))
        assert fs <= cs


class TestKnn:
    def test_knn_join_df_straggler_exhaustive(self, spark):
        """max_rounds=1 exhausts before the ring covers the layout: every
        query is a straggler and must still get exact results through the
        unconditional post-loop exhaustive round (no silent drops)."""
        pts = to_xy(fixtures.points_table(500))
        queries = to_xy(fixtures.points_table(12)).rename(
            columns={"point_id": "query_id"}
        )
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        qdf = spark.createDataFrame(queries[["query_id", "x", "y"]])
        k = 5
        got = J.knn_join_df(df, qdf, LAYOUT, ZOOM, k=k, max_rounds=1).toPandas()
        want = oracle.knn(
            queries.x.values, queries.y.values,
            pts.x.values, pts.y.values, pts.point_id.tolist(), k,
        )
        for qi, qid in enumerate(queries.query_id):
            grp = got[got.query_id == qid].sort_values("rank")
            assert grp.point_id.tolist() == want[qi], qid

    def test_knn_join_df_matches_bruteforce(self, spark):
        """DataFrame-native variant: same exact results, queries never
        touch the driver."""
        pts = to_xy(fixtures.points_table(500))
        queries = to_xy(fixtures.points_table(12)).rename(
            columns={"point_id": "query_id"}
        )
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        qdf = spark.createDataFrame(queries[["query_id", "x", "y"]])
        k = 5
        got = J.knn_join_df(df, qdf, LAYOUT, ZOOM, k=k).toPandas()
        want = oracle.knn(
            queries.x.values, queries.y.values,
            pts.x.values, pts.y.values, pts.point_id.tolist(), k,
        )
        for qi, qid in enumerate(queries.query_id):
            grp = got[got.query_id == qid].sort_values("rank")
            assert grp.point_id.tolist() == want[qi], qid

    def test_knn_join_df_many_queries_no_driver_blowup(self, spark):
        """5k queries x 20k points: the ring loop must stay distributed
        (per-round driver traffic is one tiny count) and return exactly k
        rows per query; spot-check 25 queries against brute force."""
        pts = to_xy(fixtures.points_table(20_000))
        queries = to_xy(fixtures.points_table(5_000)).rename(
            columns={"point_id": "query_id"}
        )
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        qdf = spark.createDataFrame(queries[["query_id", "x", "y"]])
        k = 3
        got = J.knn_join_df(df, qdf, LAYOUT, ZOOM, k=k).toPandas()
        counts = got.groupby("query_id").size()
        assert len(counts) == 5_000 and (counts == k).all()
        sample = queries.iloc[::200]
        want = oracle.knn(
            sample.x.values, sample.y.values,
            pts.x.values, pts.y.values, pts.point_id.tolist(), k,
        )
        for qi, qid in enumerate(sample.query_id):
            grp = got[got.query_id == qid].sort_values("rank")
            assert grp.point_id.tolist() == want[qi], qid

    def test_global_k_nearest(self, spark):
        pts = to_xy(fixtures.points_table(400))
        df = spark.createDataFrame(pts[["point_id", "x", "y"]])
        got = J.k_nearest(df, 0.0, 0.0, 7).toPandas()
        d = pts.x.values**2 + pts.y.values**2
        want = [pts.point_id.iloc[i] for i in np.argsort(d, kind="stable")[:7]]
        assert set(got.point_id) == set(want)

    def test_salted_count_matches_plain(self, spark):
        pts = to_xy(fixtures.points_table(1000))
        from tilegrid.operators.tiler import with_key_columns

        df = with_key_columns(
            spark.createDataFrame(pts[["point_id", "x", "y"]]), LAYOUT, "x", "y", ZOOM
        )
        salted = J.salted_count_per_cell(df, n_salt=8, id_col="point_id").toPandas()
        plain = df.groupBy("cell").count().toPandas()
        a = salted.set_index("cell")["n"].sort_index()
        b = plain.set_index("cell")["count"].sort_index()
        pd.testing.assert_series_equal(a, b, check_names=False)


class TestWithinDistancePairs:
    def test_matches_bruteforce(self, spark):
        from tilegrid.operators.join import within_distance_pairs

        rng = np.random.default_rng(11)
        n = 120
        pdf = pd.DataFrame(
            {
                "id": np.arange(n),
                "lon": rng.uniform(-20, 20, n),
                "lat": rng.uniform(-10, 10, n),
            }
        )
        r = 3.0
        got = (
            within_distance_pairs(spark.createDataFrame(pdf), r, "id")
            .toPandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        exp = []
        for i in range(n):
            for j in range(i + 1, n):
                d2 = (pdf.lon[i] - pdf.lon[j]) ** 2 + (pdf.lat[i] - pdf.lat[j]) ** 2
                if d2 <= r * r:
                    exp.append((i, j, d2))
        assert len(got) == len(exp)
        assert list(map(tuple, got[["id_a", "id_b"]].values)) == [
            (a, b) for a, b, _ in exp
        ]
        np.testing.assert_allclose(got.dist2.values, [d for _, _, d in exp])

    def test_each_pair_exactly_once(self, spark):
        from tilegrid.operators.join import within_distance_pairs

        # points in the SAME block and in adjacent blocks: no duplicates
        pdf = pd.DataFrame(
            {"id": [1, 2, 3], "lon": [0.1, 0.2, 1.1], "lat": [0.1, 0.2, 0.1]}
        )
        out = within_distance_pairs(spark.createDataFrame(pdf), 1.5, "id").toPandas()
        assert len(out) == len(out.drop_duplicates(["id_a", "id_b"])) == 3

    def test_no_cartesian_in_plan(self, spark):
        from tilegrid.operators.join import within_distance_pairs

        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "lon": [0.0, 1.0], "lat": [0.0, 1.0]})
        )
        plan = within_distance_pairs(df, 1.0, "id")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Cartesian" not in plan and "NestedLoop" not in plan
