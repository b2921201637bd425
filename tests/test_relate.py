"""DE-9IM relate + named predicates (reference: JTS-backed predicates on
vector/src/main/scala/geotrellis/vector/{Line,Polygon,Point}.scala).

Expected matrices are hand-derived from the DE-9IM definition and agree
with the JTS values for these canonical configurations.
"""

import numpy as np
import pytest

from tilegrid.relate import (
    contains,
    covered_by,
    covers,
    crosses,
    disjoint,
    equals_topo,
    intersects,
    matches,
    overlaps,
    relate,
    relate_points_polygon,
    touches,
    within,
    _transpose,
)


def sq(x0, y0, x1, y1):
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)]


L = lambda *pts: np.array(pts, float)


# ------------------------------------------------------------ point pairs

def test_point_point():
    assert relate((1.0, 2.0), (1.0, 2.0)) == "0FFFFFFF2"
    assert relate((1.0, 2.0), (3.0, 4.0)) == "FF0FFF0F2"
    assert equals_topo((1.0, 2.0), (1.0, 2.0))
    assert disjoint((1.0, 2.0), (3.0, 4.0))


def test_point_line():
    line = L((0, 0), (2, 0))
    assert relate((1.0, 0.0), line) == "0FFFFF102"  # on interior
    assert relate((0.0, 0.0), line) == "F0FFFF102"  # at endpoint
    assert relate((5.0, 5.0), line) == "FF0FFF102"  # off
    assert within((1.0, 0.0), line)
    assert touches((0.0, 0.0), line)
    assert not touches((1.0, 0.0), line)


def test_point_line_closed_ring_has_no_boundary():
    ring = L((0, 0), (1, 0), (1, 1), (0, 0))
    assert relate((1.0, 0.0), ring) == "0FFFFF1F2"
    assert relate((0.0, 0.0), ring) == "0FFFFF1F2"  # start pt is interior too


def test_point_polygon():
    poly = sq(0, 0, 2, 2)
    assert relate((1.0, 1.0), poly) == "0FFFFF212"
    assert relate((0.0, 1.0), poly) == "F0FFFF212"
    assert relate((5.0, 5.0), poly) == "FF0FFF212"
    assert within((1.0, 1.0), poly)
    assert contains(poly, (1.0, 1.0))
    assert touches((0.0, 1.0), poly)
    assert covers(poly, (0.0, 1.0)) and not contains(poly, (0.0, 1.0))


# ------------------------------------------------------------- line pairs

def test_line_line_cross():
    a, b = L((0, 0), (2, 2)), L((0, 2), (2, 0))
    assert relate(a, b) == "0F1FF0102"
    assert crosses(a, b) and intersects(a, b) and not touches(a, b)


def test_line_line_endpoint_touch():
    a, b = L((0, 0), (1, 1)), L((1, 1), (2, 0))
    assert relate(a, b) == "FF1F00102"
    assert touches(a, b) and not crosses(a, b)


def test_line_line_collinear_overlap():
    a, b = L((0, 0), (2, 0)), L((1, 0), (3, 0))
    assert relate(a, b) == "1010F0102"
    assert overlaps(a, b) and not crosses(a, b)


def test_line_within_line():
    a, b = L((1, 0), (2, 0)), L((0, 0), (3, 0))
    assert relate(a, b) == "1FF0FF102"
    assert within(a, b) and contains(b, a) and covered_by(a, b)


def test_line_line_t_touch():
    # B's endpoint meets A's interior: touches, not crosses
    a, b = L((0, 0), (2, 0)), L((1, 0), (1, 1))
    m = relate(a, b)
    assert m[0] == "F" and m[1] == "0"
    assert touches(a, b)


def test_line_line_disjoint():
    assert disjoint(L((0, 0), (1, 0)), L((0, 1), (1, 1)))


# ---------------------------------------------------------- line x polygon

def test_line_crosses_polygon():
    a, poly = L((-1, 0.5), (2, 0.5)), sq(0, 0, 1, 1)
    assert relate(a, poly) == "101FF0212"
    assert crosses(a, poly)


def test_line_inside_polygon():
    a, poly = L((0.2, 0.5), (0.8, 0.5)), sq(0, 0, 1, 1)
    assert relate(a, poly) == "1FF0FF212"
    assert within(a, poly) and contains(poly, a)


def test_line_on_polygon_boundary():
    a, poly = L((0, 0), (1, 0)), sq(0, 0, 1, 1)
    assert relate(a, poly) == "F1FF0F212"
    assert touches(a, poly) and covered_by(a, poly) and not within(a, poly)


def test_line_polygon_disjoint():
    assert disjoint(L((5, 5), (6, 6)), sq(0, 0, 1, 1))


def test_polygon_line_transpose_dispatch():
    a, poly = L((-1, 0.5), (2, 0.5)), sq(0, 0, 1, 1)
    assert relate(poly, a) == _transpose(relate(a, poly))
    assert crosses(poly, a)  # dim(a) > dim(b) branch


# -------------------------------------------------------- polygon pairs

def test_polygon_overlap():
    a, b = sq(0, 0, 2, 2), sq(1, 1, 3, 3)
    assert relate(a, b) == "212101212"
    assert overlaps(a, b) and intersects(a, b)


def test_polygon_disjoint():
    a, b = sq(0, 0, 1, 1), sq(5, 5, 6, 6)
    assert relate(a, b) == "FF2FF1212"
    assert disjoint(a, b)


def test_polygon_edge_adjacent():
    a, b = sq(0, 0, 1, 1), sq(1, 0, 2, 1)
    assert relate(a, b) == "FF2F11212"
    assert touches(a, b) and not overlaps(a, b)


def test_polygon_corner_touch():
    a, b = sq(0, 0, 1, 1), sq(1, 1, 2, 2)
    assert relate(a, b) == "FF2F01212"
    assert touches(a, b)


def test_polygon_within():
    a, b = sq(1, 1, 2, 2), sq(0, 0, 3, 3)
    assert relate(a, b) == "2FF1FF212"
    assert within(a, b) and contains(b, a) and covers(b, a)


def test_polygon_equal():
    a = sq(0, 0, 2, 2)
    b = sq(0, 0, 2, 2)
    assert relate(a, b) == "2FFF1FFF2"
    assert equals_topo(a, b) and covers(a, b) and covered_by(a, b)


def test_polygon_in_hole_is_disjoint():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)
    donut = [outer, hole]
    inner = sq(4, 4, 6, 6)
    assert relate(inner, donut) == "FF2FF1212"
    assert disjoint(inner, donut)


def test_polygon_fills_hole_touches():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)
    donut = [outer, hole]
    plug = sq(2, 2, 8, 8)  # exactly fills the hole
    m = relate(plug, donut)
    assert m[0] == "F" and m[4] == "1"  # no interior overlap, shared edge run
    assert touches(plug, donut)


# ------------------------------------------------- transpose + batch path

def test_transpose_property_random():
    rng = np.random.default_rng(7)
    geoms = []
    for _ in range(6):
        x0, y0 = rng.uniform(-5, 5, 2)
        w, h = rng.uniform(0.5, 4, 2)
        geoms.append(sq(x0, y0, x0 + w, y0 + h))
        geoms.append(L(tuple(rng.uniform(-5, 5, 2)), tuple(rng.uniform(-5, 5, 2))))
        geoms.append((float(rng.uniform(-5, 5)), float(rng.uniform(-5, 5))))
    for a in geoms:
        for b in geoms:
            assert relate(a, b) == _transpose(relate(b, a)), (a, b)


def test_relate_points_polygon_batch_matches_scalar():
    poly = sq(0.0, 0.0, 2.0, 2.0)
    px = np.array([1.0, 0.0, 2.0, 5.0, 1.0, -1.0])
    py = np.array([1.0, 1.0, 2.0, 5.0, 0.0, 1.0])
    batch = relate_points_polygon(px, py, poly)
    for i in range(len(px)):
        assert batch[i] == relate((float(px[i]), float(py[i])), poly)


def test_matches_patterns():
    assert matches("212101212", "T*T***T**")
    assert not matches("FF2FF1212", "T********")
    with pytest.raises(ValueError):
        matches("212", "T*T***T**")
