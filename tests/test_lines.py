"""First-class LineString / MultiLine / MultiPoint / GeometryCollection
(reference: vector/src/main/scala/geotrellis/vector/Line.scala,
MultiLine.scala, MultiPoint.scala, GeometryCollection.scala + io/wkt,
io/wkb, io/json)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tilegrid import geometry as G
from tilegrid import relate as R
from tilegrid.grid import Extent
from tilegrid.operators.rasterize import rasterize_line

_coord = st.floats(-1000, 1000, allow_nan=False).map(lambda v: round(v, 6))
_pt = st.tuples(_coord, _coord)
_line = st.lists(_pt, min_size=2, max_size=12).map(
    lambda ps: np.asarray(ps, np.float64))
_multiline = st.lists(_line, min_size=1, max_size=4).map(G.MultiLine)
_multipoint = st.lists(_pt, min_size=1, max_size=8).map(
    lambda ps: G.MultiPoint(np.asarray(ps, np.float64)))


def _assert_geom_eq(a, b):
    if isinstance(a, np.ndarray):
        assert isinstance(b, np.ndarray) and np.array_equal(a, b)
    else:
        assert a == b


class TestRoundTrips:
    @given(_line)
    @settings(max_examples=60, deadline=None)
    def test_line_wkb_wkt_geojson(self, line):
        for enc, dec in (
            (G.wkb_encode_geom, G.wkb_decode),
            (G.wkt_encode_geom, G.wkt_decode),
            (G.geojson_encode, G.geojson_decode),
        ):
            _assert_geom_eq(dec(enc(line)), line)

    @given(_multiline)
    @settings(max_examples=40, deadline=None)
    def test_multiline_roundtrip(self, ml):
        for enc, dec in (
            (G.wkb_encode_geom, G.wkb_decode),
            (G.wkt_encode_geom, G.wkt_decode),
            (G.geojson_encode, G.geojson_decode),
        ):
            _assert_geom_eq(dec(enc(ml)), ml)

    @given(_multipoint)
    @settings(max_examples=40, deadline=None)
    def test_multipoint_roundtrip(self, mp):
        for enc, dec in (
            (G.wkb_encode_geom, G.wkb_decode),
            (G.wkt_encode_geom, G.wkt_decode),
            (G.geojson_encode, G.geojson_decode),
        ):
            _assert_geom_eq(dec(enc(mp)), mp)

    @given(st.lists(st.one_of(_pt.map(lambda p: p), _line, _multiline,
                              _multipoint), min_size=1, max_size=5))
    @settings(max_examples=30, deadline=None)
    def test_collection_roundtrip(self, geoms):
        gc = G.GeometryCollection(geoms)
        for enc, dec in (
            (G.wkb_encode_geom, G.wkb_decode),
            (G.wkt_encode_geom, G.wkt_decode),
            (G.geojson_encode, G.geojson_decode),
        ):
            _assert_geom_eq(dec(enc(gc)), gc)

    def test_collection_with_polygons(self):
        poly = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]
        mp = [poly, [np.array([[9.0, 9.0], [10.0, 9.0], [10.0, 10.0]])]]
        gc = G.GeometryCollection([(1.0, 2.0), poly, mp])
        for enc, dec in (
            (G.wkb_encode_geom, G.wkb_decode),
            (G.wkt_encode_geom, G.wkt_decode),
        ):
            _assert_geom_eq(dec(enc(gc)), gc)

    def test_wkt_multipoint_both_syntaxes(self):
        a = G.wkt_decode("MULTIPOINT ((1 2), (3 4))")
        b = G.wkt_decode("MULTIPOINT (1 2, 3 4)")
        assert a == b == G.MultiPoint([[1.0, 2.0], [3.0, 4.0]])


class TestLineMeasures:
    def test_length_open_not_closed(self):
        tri = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 4.0]])
        assert G.line_length(tri) == 7.0  # NOT the 12.0 perimeter
        assert G.line_length(G.MultiLine([tri, tri])) == 14.0
        assert G.line_length(np.array([[1.0, 1.0]])) == 0.0

    def test_points_line_distance_open(self):
        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        d = G.points_line_distance(
            np.array([5.0, -3.0, 13.0]), np.array([2.0, 0.0, 4.0]), line)
        np.testing.assert_allclose(d, [2.0, 3.0, 5.0])


class TestLineRelate:
    SQ = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]

    def test_line_polygon_relate_surface(self):
        crossing = np.array([[-1.0, 2.0], [5.0, 2.0]])
        assert R.crosses(crossing, self.SQ)
        inside = np.array([[1.0, 1.0], [2.0, 2.0]])
        assert R.within(inside, self.SQ)
        outside = np.array([[5.0, 5.0], [6.0, 6.0]])
        assert R.disjoint(outside, self.SQ)

    def test_multipoint_relate_exact(self):
        mp = G.MultiPoint([[1.0, 1.0], [10.0, 10.0]])
        assert R.relate(mp, self.SQ) == "0F0FFF212"
        assert R.relate(G.MultiPoint([[1.0, 1.0]]), self.SQ) == \
            R.relate((1.0, 1.0), self.SQ)
        # all inside -> interior-vs-exterior becomes F
        allin = G.MultiPoint([[1.0, 1.0], [2.0, 3.0]])
        assert R.relate(allin, self.SQ)[2] == "F"

    def test_multiline_intersects_decomposes(self):
        ml = G.MultiLine([
            np.array([[9.0, 9.0], [10.0, 10.0]]),
            np.array([[-1.0, 2.0], [5.0, 2.0]]),
        ])
        assert R.intersects(ml, self.SQ)
        far = G.MultiLine([np.array([[9.0, 9.0], [10.0, 10.0]])])
        assert not R.intersects(far, self.SQ)
        gc = G.GeometryCollection([(9.0, 9.0), np.array([[1.0, 1.0], [2.0, 2.0]])])
        assert R.intersects(gc, self.SQ)


class TestLineRasterize:
    def test_wkb_line_to_supercover_cells(self):
        # decode a WKB polyline and rasterize it; every vertex cell burns
        line = np.array([[0.5, 0.5], [7.5, 3.5], [7.5, 7.5]])
        got = rasterize_line(
            G.wkb_decode(G.wkb_encode_geom(line)), Extent(0, 0, 8, 8), 8, 8)
        assert got[7, 0] and got[4, 7] and got[0, 7]  # y flips downward
        assert got.sum() >= 11


class TestLineLengthsOp:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(2)
        rows = []
        want = {}
        for i in range(6):
            line = rng.uniform(-50, 50, (rng.randint(2, 9), 2))
            rows.append({"line_id": i, "wkb": G.wkb_encode_linestring(line)})
            want[i] = G.line_length(line)
        from tilegrid.operators.vector import line_lengths

        out = line_lengths(
            spark.createDataFrame(pd.DataFrame(rows))).toPandas()
        for _, r in out.iterrows():
            assert abs(r["length"] - want[r["line_id"]]) < 1e-12

    def test_multiline_wkb(self, spark):
        ml = G.MultiLine([np.array([[0.0, 0.0], [3.0, 4.0]]),
                          np.array([[0.0, 0.0], [0.0, 2.0]])])
        from tilegrid.operators.vector import line_lengths

        out = line_lengths(spark.createDataFrame(
            pd.DataFrame({"wkb": [G.wkb_encode_geom(ml)]}))).toPandas()
        assert out["length"].iloc[0] == 7.0


class TestClipLine:
    SQUARE = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]

    def test_through_square(self):
        line = np.array([[-5.0, 5.0], [15.0, 5.0]])
        parts = G.clip_line_to_polygon(line, self.SQUARE)
        assert len(parts) == 1
        np.testing.assert_allclose(parts[0], [[0.0, 5.0], [10.0, 5.0]])

    def test_fully_inside(self):
        line = np.array([[1.0, 1.0], [4.0, 7.0], [9.0, 2.0]])
        parts = G.clip_line_to_polygon(line, self.SQUARE)
        assert len(parts) == 1
        np.testing.assert_array_equal(parts[0], line)

    def test_fully_outside(self):
        line = np.array([[20.0, 20.0], [30.0, 25.0]])
        assert G.clip_line_to_polygon(line, self.SQUARE) == []

    def test_zigzag_multiple_parts(self):
        # crosses in, out, in, out -> 2 parts
        line = np.array([[-5.0, 2.0], [5.0, 2.0], [5.0, 15.0], [8.0, 15.0],
                         [8.0, 5.0], [20.0, 5.0]])
        parts = G.clip_line_to_polygon(line, self.SQUARE)
        assert len(parts) == 2
        total = sum(G.line_length(p) for p in parts)
        # part 1: x 0->5 at y=2 (5) + y 2->10 at x=5 (8);
        # part 2: y 10->5 at x=8 (5) + x 8->10 at y=5 (2)
        assert np.isclose(total, (5 + 8) + (5 + 2))

    def test_hole_splits(self):
        rings = self.SQUARE + [np.array([[4.0, 4.0], [6.0, 4.0],
                                         [6.0, 6.0], [4.0, 6.0]])]
        line = np.array([[-5.0, 5.0], [15.0, 5.0]])
        parts = G.clip_line_to_polygon(line, rings)
        assert len(parts) == 2
        np.testing.assert_allclose(parts[0], [[0.0, 5.0], [4.0, 5.0]])
        np.testing.assert_allclose(parts[1], [[6.0, 5.0], [10.0, 5.0]])

    def test_vertex_on_continuation_merges(self):
        # polyline with an interior vertex inside the box stays ONE part
        line = np.array([[-5.0, 5.0], [5.0, 5.0], [5.0, 8.0], [15.0, 8.0]])
        parts = G.clip_line_to_polygon(line, self.SQUARE)
        assert len(parts) == 1
        np.testing.assert_allclose(
            parts[0], [[0.0, 5.0], [5.0, 5.0], [5.0, 8.0], [10.0, 8.0]])

    @given(st.lists(st.tuples(st.floats(-20, 30, allow_nan=False),
                              st.floats(-20, 30, allow_nan=False)),
                    min_size=2, max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_length_matches_slab_method(self, pts):
        """Clipped total length == closed-form Liang-Barsky slab answer."""
        line = np.asarray(pts, np.float64)
        ext = Extent(0.05, 0.15, 10.05, 10.15)
        parts = G.clip_line_to_extent(line, ext)
        got = sum(G.line_length(p) for p in parts)
        want = 0.0
        for i in range(len(line) - 1):
            (x1, y1), (x2, y2) = line[i], line[i + 1]
            dx, dy = x2 - x1, y2 - y1
            t0, t1 = 0.0, 1.0
            ok = True
            for a, d, lo, hi in ((x1, dx, ext.xmin, ext.xmax),
                                 (y1, dy, ext.ymin, ext.ymax)):
                if d == 0.0:
                    if not (lo <= a <= hi):
                        ok = False
                    continue
                ta, tb = (lo - a) / d, (hi - a) / d
                t0, t1 = max(t0, min(ta, tb)), min(t1, max(ta, tb))
            if ok and t1 - t0 > 1e-12:
                want += np.hypot(dx, dy) * (t1 - t0)
        assert np.isclose(got, want, atol=1e-9)


class TestClipLinesOp:
    def test_spark_matches_local(self, spark):
        rng = np.random.default_rng(11)
        rect = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
        rows = []
        lines = []
        for i in range(6):
            ln = rng.uniform(-5, 15, (5, 2))
            lines.append(ln)
            rows.append({"line_id": i, "wkb": G.wkb_encode_linestring(ln)})
        df = spark.createDataFrame(pd.DataFrame(rows))
        from tilegrid.operators.vector import clip_lines
        got = {r["line_id"]: (bytes(r["clipped"]), r["n_parts"])
               for r in clip_lines(df, rect).collect()}
        for i, ln in enumerate(lines):
            want = G.clip_line_to_polygon(ln, rect)
            blob, n = got[i]
            assert n == len(want)
            dec = G.wkb_decode(blob)
            decs = dec.lines if isinstance(dec, G.MultiLine) else [dec]
            assert len(decs) == len(want)
            for a, b in zip(decs, want):
                np.testing.assert_array_equal(a, b)


class TestMvtLines:
    def test_slippy_line_tree(self, spark, tmp_path):
        from tilegrid.cell import cover_line, z2_decode
        from tilegrid.grid import LayoutDefinition, TileLayout
        from tilegrid.mvt import mvt_decode, write_mvt_lines_slippy

        world = Extent(0.0, 0.0, 64.0, 64.0)
        layout = LayoutDefinition(world, TileLayout(4, 4, 16, 16))
        l0 = np.array([[2.0, 2.0], [30.0, 40.0], [62.0, 10.0]])
        l1 = np.array([[50.0, 50.0], [55.0, 60.0]])
        df = spark.createDataFrame(pd.DataFrame([
            {"line_id": 0, "wkb": G.wkb_encode_linestring(l0)},
            {"line_id": 1, "wkb": G.wkb_encode_linestring(l1)},
        ]))
        out = str(tmp_path / "mvt-lines")
        n = write_mvt_lines_slippy(df, layout, 2, out)
        # the tile set on disk == the supercover of both lines
        import os
        want_cells = set(int(c) for c in cover_line(layout, l0)) | set(
            int(c) for c in cover_line(layout, l1))
        got = set()
        for x in os.listdir(os.path.join(out, "2")):
            for y in os.listdir(os.path.join(out, "2", x)):
                got.add((int(x), int(y.split(".")[0])))
        assert got == {tuple(int(v) for v in z2_decode(c)) for c in want_cells}
        assert n == len(got)
        # decode one tile and check coordinates lie in the clipped line's
        # quantization envelope
        mt = layout.map_transform
        for (cx, cy) in sorted(got):
            data = open(os.path.join(out, "2", str(cx), f"{cy}.mvt"), "rb").read()
            layers = mvt_decode(data)
            assert layers and layers[0]["name"] == "lines"
            text = mt.extent_for_key(cx, cy)
            for feat in layers[0]["features"]:
                assert feat["type"] == "linestring"
                for path in feat["rings"]:
                    # tile-local ints within the 4096 grid (+1 cell slack
                    # for rounding at the clip boundary)
                    assert (path >= -1).all() and (path <= 4097).all()


class TestFeatures:
    def test_feature_roundtrip_with_id(self):
        poly = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])]
        txt = G.feature_encode(poly, {"name": "tri", "rank": 3}, fid="f-1")
        geom, props, fid = G.feature_decode(txt)
        assert props == {"name": "tri", "rank": 3} and fid == "f-1"
        assert np.array_equal(geom[0][:3], poly[0])

    def test_feature_collection_mixed(self):
        feats = [
            ((1.0, 2.0), {"k": 1}),
            (np.array([[0.0, 0.0], [5.0, 5.0]]), {"k": 2}, "line-7"),
            ([np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]])], None),
        ]
        txt = G.feature_collection_encode(feats, crs_name="EPSG:4326")
        back, crs = G.feature_collection_decode(txt)
        assert crs == "EPSG:4326"
        assert len(back) == 3
        assert back[0][0] == (1.0, 2.0) and back[0][1] == {"k": 1}
        assert back[1][2] == "line-7"
        assert np.array_equal(back[1][0], feats[1][0])
        assert back[2][1] is None

    def test_bare_geometry_and_feature_entries(self):
        feats, crs = G.feature_collection_decode(
            G.geojson_encode((7.0, 8.0)))
        assert feats == [((7.0, 8.0), None, None)] and crs is None
        feats, _ = G.feature_collection_decode(
            G.feature_encode((1.0, 1.0), {"a": True}))
        assert feats[0][1] == {"a": True}

    def test_spark_geojson_features_op(self, spark):
        import json

        from tilegrid.operators.vector import geojson_features, line_lengths

        fc1 = G.feature_collection_encode([
            (np.array([[0.0, 0.0], [3.0, 4.0]]), {"n": "a"}, "1"),
            (np.array([[0.0, 0.0], [6.0, 8.0], [6.0, 20.0]]), {"n": "b"}, "2"),
        ])
        fc2 = G.feature_collection_encode([
            ((1.0, 2.0), {"n": "c"}),
        ])
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [10, 20], "geojson": [fc1, fc2]}))
        rows = {r["fid"]: r for r in geojson_features(df).collect()}
        assert rows["1"]["kind"] == "linestring" and rows["1"]["doc_id"] == 10
        assert json.loads(rows["2"]["properties"]) == {"n": "b"}
        assert rows[None]["kind"] == "point" and rows[None]["doc_id"] == 20
        # the exploded wkb feeds existing DataFrame ops directly
        lines = geojson_features(df).where("kind = 'linestring'")
        lens = {r["fid"]: r["length"]
                for r in line_lengths(lines, "wkb").collect()}
        assert lens == {"1": 5.0, "2": 22.0}


class TestReprojectAllKinds:
    def test_lines_points_collections_reproject(self, spark):
        from tilegrid.operators.vector import reproject_geoms
        from tilegrid.proj import transform_fn

        fn = transform_fn("latlng", "webmercator")
        line = np.array([[-10.0, 40.0], [20.0, 50.0], [30.0, -5.0]])
        ml = G.MultiLine([line, line + 1.0])
        mp = G.MultiPoint([[0.0, 0.0], [10.0, 10.0]])
        gc = G.GeometryCollection([(5.0, 5.0), line])
        rows = [{"gid": i, "wkb": G.wkb_encode_geom(g)}
                for i, g in enumerate([line, ml, mp, gc])]
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {r["gid"]: G.wkb_decode(bytes(r["wkb"]))
               for r in reproject_geoms(df, "latlng", "webmercator").collect()}
        want_line = np.column_stack(fn(line[:, 0], line[:, 1]))
        np.testing.assert_allclose(got[0], want_line)
        assert isinstance(got[1], G.MultiLine)
        np.testing.assert_allclose(got[1].lines[0], want_line)
        assert isinstance(got[2], G.MultiPoint)
        assert isinstance(got[3], G.GeometryCollection)
        np.testing.assert_allclose(got[3].geoms[1], want_line)

    def test_polygon_paths_still_work(self, spark):
        from tilegrid.operators.vector import reproject_geoms

        poly = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])]
        mp = [poly, [np.array([[20.0, 20.0], [25.0, 20.0], [25.0, 25.0]])]]
        rows = [{"gid": 0, "wkb": G.wkb_encode_polygon(poly)},
                {"gid": 1, "wkb": G.wkb_encode_multipolygon(mp)},
                {"gid": 2, "wkb": G.wkb_encode_multipolygon([])}]
        df = spark.createDataFrame(pd.DataFrame(rows))
        got = {r["gid"]: bytes(r["wkb"])
               for r in reproject_geoms(df, "latlng", "webmercator").collect()}
        g0 = G.wkb_decode(got[0])
        assert isinstance(g0, list) and isinstance(g0[0], np.ndarray)
        g1 = G.wkb_decode(got[1])
        assert isinstance(g1, list) and isinstance(g1[0], list)
        # empty multipolygon passes through unchanged, still a multipolygon
        assert got[2] == G.wkb_encode_multipolygon([])
