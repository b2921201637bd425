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
