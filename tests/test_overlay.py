"""General polygon boolean ops (geometry.polygon_overlay / dissolve_rings)
vs an even-odd sampled-classification oracle: a point is inside
A op B iff (inside A) op (inside B), so classifying a dense sample grid
against the RESULT polygon must reproduce the boolean combination exactly
(grid points are offset so none lies on any edge)."""

import numpy as np
import pytest

from tilegrid.geometry import (
    _ring_signed_area,
    buffer_convex,
    buffer_polygon,
    dissolve_rings,
    points_in_polygon,
    points_polygon_distance,
    polygon_overlay,
)


def ring(*pts):
    return np.asarray(pts, np.float64)


SQ = lambda x0, y0, s: ring((x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s))

L_SHAPE = [ring((0, 0), (4, 0), (4, 1.5), (1.5, 1.5), (1.5, 4), (0, 4))]
RECT = [ring((1, 1), (3, 1), (3, 3), (1, 3))]
STAR = [ring((2, -1), (3, 2), (6, 2), (3.5, 3.5), (4.5, 6.5), (2, 4.5),
             (-0.5, 6.5), (0.5, 3.5), (-2, 2), (1, 2))]
HOLED = [SQ(0, 0, 6), SQ(2, 2, 2)]  # square with a square hole (even-odd)


def sample_grid(a, b, n=173):
    xs0 = min(r[:, 0].min() for r in a + b) - 0.3
    xs1 = max(r[:, 0].max() for r in a + b) + 0.3
    ys0 = min(r[:, 1].min() for r in a + b) - 0.3
    ys1 = max(r[:, 1].max() for r in a + b) + 0.3
    # prime-count grid + irrational-ish offset: no sample hits an edge
    xs = np.linspace(xs0 + 1.18e-4, xs1, n)
    ys = np.linspace(ys0 + 2.71e-4, ys1, n)
    gx, gy = np.meshgrid(xs, ys)
    return gx.ravel(), gy.ravel()


def check_all_ops(a, b):
    gx, gy = sample_grid(a, b)
    in_a = points_in_polygon(gx, gy, a)
    in_b = points_in_polygon(gx, gy, b)
    want = {
        "intersection": in_a & in_b,
        "union": in_a | in_b,
        "difference": in_a & ~in_b,
    }
    for op, expect in want.items():
        res = polygon_overlay(a, b, op)
        got = (
            points_in_polygon(gx, gy, res)
            if res
            else np.zeros(gx.shape, dtype=bool)
        )
        n_bad = int((got != expect).sum())
        assert n_bad == 0, f"{op}: {n_bad} misclassified samples"


class TestOverlay:
    def test_concave_vs_rect(self):
        check_all_ops(L_SHAPE, RECT)

    def test_concave_vs_concave(self):
        check_all_ops(STAR, L_SHAPE)

    def test_holed_vs_rect_through_hole(self):
        b = [ring((1, 2.5), (7, 2.5), (7, 3.5), (1, 3.5))]  # crosses the hole
        check_all_ops(HOLED, b)

    def test_holed_vs_star(self):
        check_all_ops(HOLED, STAR)

    def test_disjoint(self):
        a, b = [SQ(0, 0, 1)], [SQ(5, 5, 1)]
        assert polygon_overlay(a, b, "intersection") == []
        check_all_ops(a, b)

    def test_contained_difference_makes_hole(self):
        a, b = [SQ(0, 0, 6)], [SQ(2, 2, 2)]
        res = polygon_overlay(a, b, "difference")
        assert len(res) == 2  # outer + hole
        check_all_ops(a, b)

    def test_identical(self):
        a = [SQ(0, 0, 3)]
        assert polygon_overlay(a, a, "difference") == []
        gx, gy = sample_grid(a, a)
        for op in ("intersection", "union"):
            res = polygon_overlay(a, a, op)
            np.testing.assert_array_equal(
                points_in_polygon(gx, gy, res), points_in_polygon(gx, gy, a)
            )

    def test_adjacent_union_dissolves_shared_edge(self):
        a, b = [SQ(0, 0, 2)], [SQ(2, 0, 2)]
        res = polygon_overlay(a, b, "union")
        assert len(res) == 1  # one ring, internal edge gone
        gx, gy = sample_grid(a, b)
        want = points_in_polygon(gx, gy, a) | points_in_polygon(gx, gy, b)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)

    def test_adjacent_difference_keeps_a(self):
        a, b = [SQ(0, 0, 2)], [SQ(2, 0, 2)]
        res = polygon_overlay(a, b, "difference")
        gx, gy = sample_grid(a, b)
        np.testing.assert_array_equal(
            points_in_polygon(gx, gy, res), points_in_polygon(gx, gy, a)
        )

    def test_partial_overlap_rects(self):
        check_all_ops([SQ(0, 0, 3)], [SQ(1.5, 1.5, 3)])


class TestDissolve:
    def test_grid_of_squares_dissolves_to_one_ring(self):
        polys = [[SQ(i * 2.0, j * 2.0, 2.0)] for i in range(2) for j in range(2)]
        res = dissolve_rings(polys)
        assert len(res) == 1
        gx, gy = sample_grid(res, res)
        want = np.zeros(gx.shape, dtype=bool)
        for p in polys:
            want |= points_in_polygon(gx, gy, p)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)

    def test_overlapping_blobs(self):
        polys = [[SQ(0, 0, 3)], [SQ(2, 1, 3)], [SQ(4, 0, 3)]]
        res = dissolve_rings(polys)
        gx, gy = sample_grid(res, res)
        want = np.zeros(gx.shape, dtype=bool)
        for p in polys:
            want |= points_in_polygon(gx, gy, p)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)


def _linf_poly_distance(px, py, rings):
    """L-infinity distance from points to the polygon boundary."""
    best = np.full(px.shape, np.inf)
    for r in rings:
        n = len(r)
        for i in range(n):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % n]
            lo_x, hi_x = min(x1, x2), max(x1, x2)
            lo_y, hi_y = min(y1, y2), max(y1, y2)
            dx = np.maximum(0.0, np.maximum(lo_x - px, px - hi_x))
            dy = np.maximum(0.0, np.maximum(lo_y - py, py - hi_y))
            best = np.minimum(best, np.maximum(dx, dy))
    return best


class TestBufferPolygon:
    """Oracle: a point is inside buffer(P, +d) iff its distance to P is
    <= d (0 inside), and inside buffer(P, -d) iff inside P with boundary
    distance > d. Round caps inscribe the true arc, so round-cap checks
    exclude the chord sliver |dist - d| <= d*(1 - cos(pi/(4*quad_segs)));
    square caps are the exact L-infinity buffer — no sliver, every sample
    must classify identically."""

    def test_convex_round_matches_buffer_convex(self):
        sq = SQ(0, 0, 10)
        res = buffer_polygon([sq], 2.0)
        assert len(res) == 1
        want = abs(_ring_signed_area(buffer_convex(sq, 2.0)))
        assert abs(abs(_ring_signed_area(res[0])) - want) < 1e-9

    def test_concave_round_dilate(self):
        d = 1.5
        res = buffer_polygon(L_SHAPE, d)
        gx, gy = sample_grid(L_SHAPE, res)
        dist = points_polygon_distance(gx, gy, L_SHAPE)
        sliver = d * (1 - np.cos(np.pi / 32)) + 1e-9
        sure = np.abs(dist - d) > sliver
        got = points_in_polygon(gx, gy, res)
        assert int((got[sure] != (dist[sure] <= d)).sum()) == 0

    def test_holed_square_dilate_exact(self):
        d = 0.6
        res = buffer_polygon(HOLED, d, cap="square")
        assert len(res) == 2  # hole shrinks (2x2 -> 0.8x0.8) but survives
        gx, gy = sample_grid(HOLED, res)
        in_p = points_in_polygon(gx, gy, HOLED)
        dist = _linf_poly_distance(gx, gy, HOLED)
        want = in_p | (dist <= d)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)

    def test_holed_square_erode_exact(self):
        d = 0.6
        res = buffer_polygon(HOLED, -d, cap="square")
        gx, gy = sample_grid(HOLED, HOLED)
        in_p = points_in_polygon(gx, gy, HOLED)
        dist = _linf_poly_distance(gx, gy, HOLED)
        want = in_p & (dist > d)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)

    def test_dilate_fills_hole(self):
        # hole is 2x2; square dilation by 1.01 swallows it entirely
        res = buffer_polygon(HOLED, 1.01, cap="square")
        assert len(res) == 1

    def test_erode_to_empty(self):
        assert buffer_polygon([SQ(0, 0, 2)], -1.5) == []

    def test_erode_splits_concave(self):
        # dumbbell: two 4x4 lobes joined by a thin 0.8-high bar — eroding
        # by 1 removes the bar and splits the polygon into two parts
        dumb = [ring((0, 0), (4, 0), (4, 1.6), (6, 1.6), (6, 0), (10, 0),
                     (10, 4), (6, 4), (6, 2.4), (4, 2.4), (4, 4), (0, 4))]
        res = buffer_polygon(dumb, -1.0, cap="square")
        assert len(res) == 2
        gx, gy = sample_grid(dumb, dumb)
        in_p = points_in_polygon(gx, gy, dumb)
        dist = _linf_poly_distance(gx, gy, dumb)
        want = in_p & (dist > 1.0)
        np.testing.assert_array_equal(points_in_polygon(gx, gy, res), want)

    def test_zero_distance_identity(self):
        res = buffer_polygon(HOLED, 0.0)
        assert len(res) == 2
        gx, gy = sample_grid(HOLED, HOLED)
        np.testing.assert_array_equal(
            points_in_polygon(gx, gy, res), points_in_polygon(gx, gy, HOLED)
        )
