"""Core (non-Spark) module tests: grid math, cell index, codecs, geometry."""

import math

import numpy as np
import pytest

from tilegrid import cell, codec, fixtures, geometry, oracle
from tilegrid.celltype import FLOAT64, INT32, binary_nodata, union
from tilegrid.grid import (
    Extent,
    GridBounds,
    LayoutDefinition,
    MapKeyTransform,
    TileLayout,
    ZoomedLayoutScheme,
    lnglat_to_webmercator,
    webmercator_to_lnglat,
)


class TestMapKeyTransform:
    def setup_method(self):
        self.mt = MapKeyTransform(Extent(0.0, 0.0, 8.0, 8.0), 8, 8)

    def test_point_to_key(self):
        assert self.mt.key_for_point(0.5, 7.5) == (0, 0)
        assert self.mt.key_for_point(7.5, 0.5) == (7, 7)
        # on-boundary point goes to the tile it opens (floor)
        assert self.mt.key_for_point(1.0, 7.0) == (1, 1)

    def test_extent_to_gridbounds_backoff(self):
        # extent max edge exactly on a tile boundary does NOT claim next tile
        gb = self.mt.gridbounds_for_extent(Extent(0.0, 6.0, 2.0, 8.0))
        assert gb == GridBounds(0, 0, 1, 1)
        # zero-width extent on a boundary claims the east tile
        gb = self.mt.gridbounds_for_extent(Extent(2.0, 6.0, 2.0, 8.0))
        assert gb.col_min == 2 and gb.col_max == 2

    def test_roundtrip_key_extent(self):
        e = self.mt.extent_for_key(3, 4)
        assert e == Extent(3.0, 3.0, 4.0, 4.0)
        gb = self.mt.gridbounds_for_extent(e)
        assert gb == GridBounds(3, 4, 3, 4)

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(42)
        xs = rng.uniform(-1, 9, 500)
        ys = rng.uniform(-1, 9, 500)
        cols, rows = self.mt.keys_for_points(xs, ys)
        for x, y, c, r in zip(xs, ys, cols, rows):
            assert self.mt.key_for_point(x, y) == (c, r)

    def test_vectorized_gridbounds(self):
        rng = np.random.default_rng(7)
        x0 = rng.uniform(0, 6, 200)
        y0 = rng.uniform(0, 6, 200)
        x1 = x0 + rng.uniform(0, 2, 200)
        y1 = y0 + rng.uniform(0, 2, 200)
        # include exact-boundary cases
        x1[:20] = np.round(x1[:20])
        y1[:20] = np.round(y1[:20])
        cmin, rmin, cmax, rmax = self.mt.gridbounds_for_extents(x0, y0, x1, y1)
        for i in range(200):
            gb = self.mt.gridbounds_for_extent(Extent(x0[i], y0[i], x1[i], y1[i]))
            assert (gb.col_min, gb.row_min, gb.col_max, gb.row_max) == (
                cmin[i], rmin[i], cmax[i], rmax[i],
            ), i


class TestZoomedLayoutScheme:
    def test_layout_for_zoom(self):
        s = ZoomedLayoutScheme("webmercator")
        lvl = s.level_for_zoom(3)
        assert lvl.layout.tile_layout == TileLayout(8, 8, 256, 256)
        assert s.zoom_in(lvl).zoom == 4
        assert s.zoom_out(lvl).layout.tile_layout.layout_cols == 4

    def test_zoom_for_cell_size(self):
        s = ZoomedLayoutScheme("webmercator")
        lvl = s.level_for_zoom(10)
        cw = lvl.layout.cell_width
        assert s.zoom_for_cell_size(cw) == 10

    def test_mercator_roundtrip(self):
        lon = np.array([-120.0, 0.0, 37.5])
        lat = np.array([-60.0, 0.0, 70.0])
        x, y = lnglat_to_webmercator(lon, lat)
        lon2, lat2 = webmercator_to_lnglat(x, y)
        np.testing.assert_allclose(lon, lon2, atol=1e-9)
        np.testing.assert_allclose(lat, lat2, atol=1e-9)


class TestCellIndex:
    def test_z2_roundtrip(self):
        rng = np.random.default_rng(0)
        col = rng.integers(0, 1 << 29, 1000)
        row = rng.integers(0, 1 << 29, 1000)
        z = cell.z2_encode(col, row)
        c2, r2 = cell.z2_decode(z)
        np.testing.assert_array_equal(col, c2)
        np.testing.assert_array_equal(row, r2)

    def test_z2_known_values(self):
        # interleave: col bits even, row bits odd
        assert int(cell.z2_encode(0, 0)) == 0
        assert int(cell.z2_encode(1, 0)) == 1
        assert int(cell.z2_encode(0, 1)) == 2
        assert int(cell.z2_encode(1, 1)) == 3
        assert int(cell.z2_encode(2, 0)) == 4
        assert int(cell.z2_encode(7, 7)) == 63

    def test_cell_pack_roundtrip(self):
        z, c, r = cell.cell_decode(cell.cell_encode(12, 1000, 2000))
        assert (int(z), int(c), int(r)) == (12, 1000, 2000)

    def test_parent_children(self):
        cid = cell.cell_encode(5, 10, 20)
        par = cell.cell_parent(cid)
        z, c, r = cell.cell_decode(par)
        assert (int(z), int(c), int(r)) == (4, 5, 10)
        kids = cell.cell_children(par)
        assert cid in set(int(k) for k in np.ravel(kids))

    def test_k_ring(self):
        cid = cell.cell_encode(4, 8, 8)
        ring = cell.k_ring(cid, 1)
        assert len(ring) == 9
        # clipped at grid edge
        edge = cell.cell_encode(4, 0, 0)
        assert len(cell.k_ring(edge, 1)) == 4

    def test_zranges_cover_rectangle_exactly(self):
        ranges = cell.zranges(2, 3, 10, 9)
        members = set()
        for lo, hi in ranges:
            members.update(range(lo, hi + 1))
        expect = set()
        for c in range(2, 11):
            for r in range(3, 10):
                expect.add(int(cell.z2_encode(c, r)))
        assert expect == members  # exact decomposition (no over/under scan)

    def test_zranges_max_ranges_superset(self):
        exact = cell.zranges(2, 3, 40, 50, max_ranges=10**9)
        coarse = cell.zranges(2, 3, 40, 50, max_ranges=4)
        assert len(coarse) <= 4
        exact_set = set()
        for lo, hi in exact:
            exact_set.update(range(lo, hi + 1))
        for lo, hi in exact:
            # every exact range must be inside some coarse range
            assert any(clo <= lo and hi <= chi for clo, chi in coarse)

    def test_merge_ranges(self):
        assert cell.merge_ranges([(5, 7), (0, 2), (3, 4), (10, 12)]) == [
            (0, 7), (10, 12),
        ]

    def test_index_breaks_reference_semantics(self):
        # ranges [(0,9)], count 3: cap = ceil(10/4) = 3 -> breaks at
        # cumulative volumes 3, 6, 9 -> indices 2, 5, 8
        assert cell.index_breaks([(0, 9)], 3) == [2, 5, 8]
        # breaks land inside ranges, never in the [10, 99] gap
        bs = cell.index_breaks([(0, 9), (100, 109)], 3)
        assert bs == [4, 9, 104]  # cap = ceil(20/4) = 5
        # count caps the output (break on very end of last range dropped)
        assert cell.index_breaks([(0, 3)], 1) == [1]  # cap=2 -> vol 2 -> idx 1
        with pytest.raises(ValueError):
            cell.index_breaks([(0, 9)], 0)

    def test_index_breaks_fold_parity(self):
        # vectorized path == a direct fold over the published semantics
        def fold_breaks(ranges, count):
            total = sum(hi - lo + 1 for lo, hi in ranges)
            cap = max(-(-total // (count + 1)), 1)
            out, room = [], cap
            for lo, hi in ranges:
                rem = (lo, hi)
                while rem[1] >= rem[0]:
                    take = min(rem[1] - rem[0] + 1, room)
                    if take == room:
                        out.append(rem[0] + take - 1)
                        room = cap
                        rem = (rem[0] + take, rem[1])
                    else:
                        room -= take
                        break
            return out[:count]

        rng = np.random.RandomState(7)
        for _ in range(50):
            n = rng.randint(1, 8)
            starts = np.cumsum(rng.randint(1, 50, size=2 * n))
            ranges = [
                (int(starts[2 * i]), int(starts[2 * i + 1]) - 1)
                for i in range(n)
            ]
            count = int(rng.randint(1, 20))
            assert cell.index_breaks(ranges, count) == fold_breaks(ranges, count)

    def test_bucket_sql_counts_breaks_below(self):
        import duckdb

        breaks = [4, 9, 104]
        rows = duckdb.sql(
            f"SELECT cell, {cell.bucket_sql(breaks)} AS b FROM "
            "(SELECT unnest([0, 4, 5, 9, 10, 104, 105, 200]) AS cell)"
        ).fetchall()
        want = {0: 0, 4: 0, 5: 1, 9: 1, 10: 2, 104: 2, 105: 3, 200: 3}
        for c, b in rows:
            assert b == want[c], (c, b)

    def test_partition_tokens_cover_all_partitions(self):
        for n in (1, 5, 32):
            toks = cell.partition_tokens(n)
            assert sorted(cell.murmur3_int32(t) % n for t in toks) == list(range(n))

    def test_sql_expr_matches_numpy(self):
        import duckdb

        expr = cell.z2_sql("col", "row", dialect="duckdb")
        rows = duckdb.sql(
            "SELECT col, row, " + expr + " AS z FROM "
            "(SELECT (i % 1000) * 7 AS col, (i % 997) * 11 AS row "
            " FROM range(500) t(i))"
        ).fetchall()
        for c, r, z in rows:
            assert int(cell.z2_encode(c, r)) == z


class TestCodec:
    def test_png_roundtrip_gray8(self):
        arr = fixtures.make_pattern(3, 64, 96)
        assert np.array_equal(codec.png_decode(codec.png_encode(arr)), arr)

    def test_png_roundtrip_rgb(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        assert np.array_equal(codec.png_decode(codec.png_encode(arr)), arr)

    def test_png_roundtrip_gray16(self):
        rng = np.random.default_rng(2)
        arr = rng.integers(0, 65536, (20, 20), dtype=np.uint16)
        assert np.array_equal(codec.png_decode(codec.png_encode(arr)), arr)

    def test_png_filters_decode(self):
        # build a PNG with Up/Sub filters by hand and check decode
        import struct
        import zlib

        arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
        rows = []
        prev = np.zeros(8, np.int32)
        for y in range(8):
            cur = arr[y].astype(np.int32)
            if y % 2 == 0:  # Up filter
                rows.append(bytes([2]) + ((cur - prev) & 0xFF).astype(np.uint8).tobytes())
            else:  # Sub filter
                d = cur.copy()
                d[1:] = (cur[1:] - cur[:-1]) & 0xFF
                rows.append(bytes([1]) + d.astype(np.uint8).tobytes())
            prev = cur
        idat = zlib.compress(b"".join(rows))

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            codec.PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", idat)
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(codec.png_decode(png), arr)

    def test_fake_jpeg_psnr(self):
        arr = fixtures.make_pattern(5, 128, 128)
        dec = codec.fake_jpeg_decode(codec.fake_jpeg_encode(arr))
        assert codec.psnr(arr, dec) >= 40.0

    def test_raw_roundtrip(self):
        arr = np.linspace(0, 1, 256).reshape(16, 16).astype(np.float64)
        arr[0, 0] = np.nan
        out = codec.raw_decode(codec.raw_encode(arr))
        np.testing.assert_array_equal(
            np.isnan(arr), np.isnan(out)
        )
        np.testing.assert_array_equal(arr[~np.isnan(arr)], out[~np.isnan(out)])

    def test_sniff(self):
        arr = fixtures.make_pattern(1, 16, 16)
        assert np.array_equal(codec.decode_tile(codec.png_encode(arr)), arr)


class TestGeometry:
    def test_wkb_roundtrip(self):
        ring = geometry.regular_ngon(5.0, 5.0, 6, 2.0)
        rings = geometry.wkb_decode(geometry.wkb_encode_polygon([ring]))
        np.testing.assert_allclose(rings[0], ring)

    def test_pip_square(self):
        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        px = np.array([2.0, 5.0, -1.0, 2.0])
        py = np.array([2.0, 2.0, 2.0, 5.0])
        np.testing.assert_array_equal(
            geometry.points_in_polygon(px, py, [sq]),
            [True, False, False, False],
        )

    def test_pip_with_hole(self):
        outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]])
        px = np.array([5.0, 2.0])
        py = np.array([5.0, 2.0])
        np.testing.assert_array_equal(
            geometry.points_in_polygon(px, py, [outer, hole]), [False, True]
        )

    def test_polygon_intersects_extents(self):
        tri = np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 4.0]])
        xmin = np.array([1.0, 10.0, -5.0, 1.9])
        ymin = np.array([1.0, 10.0, -5.0, 1.9])
        xmax = np.array([2.0, 11.0, 10.0, 2.1])
        ymax = np.array([2.0, 11.0, 10.0, 2.1])
        hit = geometry.polygon_intersects_extents([tri], xmin, ymin, xmax, ymax)
        np.testing.assert_array_equal(hit, [True, False, True, True])

    def test_edge_crossing_extent_no_vertex_inside(self):
        # long thin triangle passes through the box without vertices inside
        tri = np.array([[-10.0, 1.0], [10.0, 1.0], [0.0, 1.5]])
        hit = geometry.polygon_intersects_extents(
            [tri], np.array([-1.0]), np.array([0.0]), np.array([1.0]), np.array([0.9])
        )
        assert not hit[0]
        hit = geometry.polygon_intersects_extents(
            [tri], np.array([-1.0]), np.array([0.0]), np.array([1.0]), np.array([1.1])
        )
        assert hit[0]

    def test_polygon_contains_extent(self):
        big = geometry.regular_ngon(0.0, 0.0, 8, 10.0)
        assert geometry.polygon_contains_extent([big], Extent(-1, -1, 1, 1))
        assert not geometry.polygon_contains_extent([big], Extent(8, 8, 12, 12))


class TestCellType:
    def test_union_widens(self):
        assert union(INT32, FLOAT64).dtype == "float64"

    def test_binary_nodata_propagates(self):
        a = np.array([[1, INT32.nodata], [3, 4]], dtype=np.int32)
        b = np.array([[10, 20], [INT32.nodata, 40]], dtype=np.int32)
        out = binary_nodata(np.add, a, b, INT32)
        assert out[0, 0] == 11 and out[1, 1] == 44
        assert out[0, 1] == INT32.nodata and out[1, 0] == INT32.nodata


class TestOracle:
    def test_stitch_cut_roundtrip(self):
        arr = np.arange(64, dtype=np.float64).reshape(8, 8)
        tiles = oracle.cut(arr, 4, 4)
        out, gb = oracle.stitch(tiles)
        np.testing.assert_array_equal(arr, out)
        assert gb == GridBounds(0, 0, 1, 1)

    def test_focal_mean_simple(self):
        arr = np.ones((5, 5))
        np.testing.assert_allclose(oracle.focal_mean(arr), np.ones((5, 5)))

    def test_focal_mean_nodata_skipped(self):
        arr = np.ones((3, 3))
        arr[1, 1] = np.nan
        m = oracle.focal_mean(arr)
        assert m[1, 1] == 1.0  # center NoData ignored, neighbors avg to 1
        assert m[0, 0] == 1.0

    def test_slope_flat_is_zero(self):
        arr = np.full((5, 5), 7.0)
        np.testing.assert_allclose(oracle.slope(arr, 1.0, 1.0), np.zeros((5, 5)))

    def test_slope_known_plane(self):
        # z = x → dz/dx = 1 (interior), slope = 45 deg
        yy, xx = np.mgrid[0:8, 0:8]
        s = oracle.slope(xx.astype(float), 1.0, 1.0)
        np.testing.assert_allclose(s[2:-2, 2:-2], 45.0)

    def test_aspect_plane(self):
        yy, xx = np.mgrid[0:8, 0:8]
        # z increases with x: atan2(dz/dy, -dz/dx) = atan2(0, -1) = 180 deg
        # (the reference SurfacePoint.aspect convention)
        a = oracle.aspect(xx.astype(float), 1.0, 1.0)
        np.testing.assert_allclose(a[2:-2, 2:-2], 180.0)

    def test_pyramid_average(self):
        arr = np.arange(16, dtype=np.float64).reshape(4, 4)
        up = oracle.pyramid_up(arr, "average")
        np.testing.assert_allclose(up, [[2.5, 4.5], [10.5, 12.5]])

    def test_rasterize_square(self):
        sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
        mask = oracle.rasterize_polygon([sq], Extent(0, 0, 4, 4), 4, 4)
        assert mask.sum() == 4  # pixel centers at 0.5, 1.5 inside
        assert mask[2:, :2].all()

    def test_knn_ties_deterministic(self):
        q = np.array([0.0]), np.array([0.0])
        cx = np.array([1.0, -1.0, 2.0])
        cy = np.array([0.0, 0.0, 0.0])
        out = oracle.knn(q[0], q[1], cx, cy, ["b", "a", "c"], 2)
        assert out == [["a", "b"]]


class TestTriangulation:
    def test_grid_triangulation_counts_and_area(self):
        from tilegrid.geometry import convex_hull
        from tilegrid.triangulation import delaunay

        gx, gy = np.meshgrid(np.arange(6, dtype=float), np.arange(5, dtype=float))
        pts_in = np.stack([gx.ravel(), gy.ravel()], axis=1)
        # jitter breaks cocircular grid degeneracy (deterministic)
        rng = np.random.default_rng(4)
        pts_in = pts_in + rng.random(pts_in.shape) * 1e-3
        pts, tris = delaunay(pts_in)
        n = len(pts)
        h = len(convex_hull(pts))
        # Euler: triangles = 2n - 2 - hull_vertices
        assert len(tris) == 2 * n - 2 - h
        # triangulation tiles the hull: areas sum to the hull area
        a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        areas = 0.5 * np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        )
        from tilegrid.geometry import polygon_area

        assert areas.sum() == pytest.approx(polygon_area(convex_hull(pts)))
        assert (areas > 0).all()

    def test_empty_circumcircle_property(self):
        from tilegrid.triangulation import _circumcircle, delaunay

        rng = np.random.default_rng(17)
        pts_in = rng.random((60, 2)) * 100
        pts, tris = delaunay(pts_in)
        for a, b, c in tris:
            ux, uy, r2 = _circumcircle(*pts[a], *pts[b], *pts[c])
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            inside = d2 < r2 * (1 - 1e-9)
            inside[[a, b, c]] = False
            assert not inside.any()

    def test_voronoi_edges_perpendicular_bisectors(self):
        from tilegrid.triangulation import voronoi_edges

        rng = np.random.default_rng(23)
        pts = rng.random((40, 2)) * 10
        segs = voronoi_edges(pts)
        assert len(segs) > 0
        # every finite Voronoi vertex (segment endpoint) is equidistant
        # from >= 3 sites (it is a circumcenter)
        for x1, y1, _, _ in segs[:10]:
            d = np.sort(np.hypot(pts[:, 0] - x1, pts[:, 1] - y1))
            assert d[2] - d[0] < 1e-6 * max(1.0, d[0])

    def test_delaunay_per_group(self, spark):
        import pandas as pd

        from tilegrid.operators.vector import delaunay_per_group

        rng = np.random.default_rng(31)
        rows = []
        for g in (1, 2):
            for p in rng.random((25, 2)) * 10 + g * 100:
                rows.append((g, float(p[0]), float(p[1])))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x", "y"]))
        out = delaunay_per_group(df, "g").toPandas()
        assert set(out.g) == {1, 2}
        # group separation: triangle vertices stay within their group's box
        for g in (1, 2):
            sub = out[out.g == g]
            assert len(sub) > 20
            for col in ("ax", "bx", "cx"):
                assert ((sub[col] >= g * 100) & (sub[col] <= g * 100 + 10)).all()


class TestAltIndexes:
    def test_rowmajor(self):
        from tilegrid.cell import rowmajor_encode

        assert rowmajor_encode(3, 2, 8) == 19
        np.testing.assert_array_equal(
            rowmajor_encode(np.array([0, 7]), np.array([0, 7]), 8),
            np.array([0, 63]),
        )

    def test_hilbert_roundtrip_and_locality(self):
        from tilegrid.cell import hilbert_decode, hilbert_encode

        order = 7
        n = 1 << order
        cc, rr = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_encode(cc.ravel(), rr.ravel(), order)
        # bijection over the full grid
        assert len(np.unique(d)) == n * n and d.min() == 0 and d.max() == n * n - 1
        dc, dr = hilbert_decode(d, order)
        np.testing.assert_array_equal(dc, cc.ravel())
        np.testing.assert_array_equal(dr, rr.ravel())
        # locality: consecutive curve positions are grid neighbors
        order2 = np.argsort(d, kind="stable")
        cs, rs = cc.ravel()[order2], rr.ravel()[order2]
        step = np.abs(np.diff(cs)) + np.abs(np.diff(rs))
        assert (step == 1).all()

    def test_z3ranges_cover_box_exactly(self):
        from tilegrid.cell import z3_encode, z3ranges

        box = (3, 5, 2, 9, 12, 6)  # col 3..9, row 5..12, t 2..6
        ranges = z3ranges(*box, max_ranges=10_000)
        cc, rr, tt = np.meshgrid(
            np.arange(box[0], box[3] + 1),
            np.arange(box[1], box[4] + 1),
            np.arange(box[2], box[5] + 1),
        )
        want = set(int(v) for v in z3_encode(cc.ravel(), rr.ravel(), tt.ravel()))
        got = set()
        for lo, hi in ranges:
            got.update(range(lo, hi + 1))
        assert got == want  # uncoalesced ranges are EXACT, not a superset
        # coalesced (bounded) ranges stay a superset
        coarse = z3ranges(*box, max_ranges=4)
        assert len(coarse) <= 4
        cov = set()
        for lo, hi in coarse:
            cov.update(range(lo, hi + 1))
        assert want <= cov

    def test_hilbert_known_order2(self):
        from tilegrid.cell import hilbert_encode

        # the canonical order-2 curve (Wikipedia xy2d convention)
        want = {
            (0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3,
            (0, 2): 4, (0, 3): 5, (1, 3): 6, (1, 2): 7,
        }
        for (c, r), v in want.items():
            assert int(hilbert_encode(c, r, 2)) == v, (c, r)


class TestVectorIOAndOps:
    def test_wkt_roundtrip(self):
        from tilegrid.geometry import (
            regular_ngon, wkt_decode, wkt_encode_multipolygon,
            wkt_encode_point, wkt_encode_polygon,
        )

        assert wkt_decode(wkt_encode_point(1.5, -2.25)) == (1.5, -2.25)
        ring = regular_ngon(3.0, 4.0, 7, 2.5, rot=0.3)
        hole = regular_ngon(3.0, 4.0, 5, 0.5)
        back = wkt_decode(wkt_encode_polygon([ring, hole]))
        np.testing.assert_array_equal(back[0], ring)
        np.testing.assert_array_equal(back[1], hole)
        mp = wkt_decode(wkt_encode_multipolygon([[ring], [hole]]))
        np.testing.assert_array_equal(mp[0][0], ring)
        np.testing.assert_array_equal(mp[1][0], hole)

    def test_geojson_roundtrip_and_wkb_parity(self):
        from tilegrid.geometry import (
            geojson_decode, geojson_encode, regular_ngon, wkb_decode,
            wkb_encode_polygon,
        )

        ring = regular_ngon(-10.0, 20.0, 6, 3.0)
        gj = geojson_decode(geojson_encode([ring]))
        np.testing.assert_array_equal(gj[0], ring)
        assert geojson_decode(geojson_encode((2.0, 3.0))) == (2.0, 3.0)
        # all three codecs agree on the same geometry
        wkb = wkb_decode(wkb_encode_polygon([ring]))
        np.testing.assert_array_equal(wkb[0], gj[0])

    def test_densify_and_affine(self):
        from tilegrid.geometry import affine_transform, densify, polygon_perimeter

        sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        d = densify(sq, 2.5)
        assert len(d) == 16  # each 10-unit edge -> 4 segments
        assert polygon_perimeter(d) == pytest.approx(40.0)
        seglens = np.hypot(*np.diff(np.vstack([d, d[:1]]), axis=0).T)
        assert (seglens <= 2.5 + 1e-12).all()
        rot = affine_transform(sq, 0.0, -1.0, 1.0, 0.0, 5.0, 0.0)  # 90deg + shift
        np.testing.assert_allclose(rot[1], [5.0, 10.0])

    def test_clip_polygon_convex(self):
        from tilegrid.geometry import clip_polygon_convex, polygon_area

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        clip = np.array([[2.0, -1.0], [6.0, -1.0], [6.0, 5.0], [2.0, 5.0]])
        out = clip_polygon_convex(sq, clip)
        assert polygon_area(out) == pytest.approx(8.0)  # right half of sq
        # clip winding must not matter
        out2 = clip_polygon_convex(sq, clip[::-1])
        assert polygon_area(out2) == pytest.approx(8.0)
        # disjoint -> empty
        far = clip + 100.0
        assert len(clip_polygon_convex(sq, far)) == 0
        # triangle x square partial overlap
        tri = np.array([[3.0, 3.0], [7.0, 3.0], [3.0, 7.0]])
        got = polygon_area(clip_polygon_convex(tri, sq))
        assert got == pytest.approx(1.0)  # the [3,4]^2 unit square
        tri2 = np.array([[3.0, 3.0], [4.5, 3.0], [3.0, 4.5]])
        got2 = polygon_area(clip_polygon_convex(tri2, sq))
        assert got2 == pytest.approx(0.875)  # unit square minus corner cut

    def test_buffer_convex(self):
        from tilegrid.geometry import buffer_convex, polygon_area, points_in_polygon

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        buf = buffer_convex(sq, 1.0, quad_segs=16)
        # area = A + perimeter*d + pi*d^2 (Minkowski with disc), slightly
        # under due to the polygonal disc
        want = 16.0 + 16.0 * 1.0 + np.pi
        assert polygon_area(buf) == pytest.approx(want, rel=0.01)
        assert polygon_area(buf) <= want
        # original inside the buffer
        assert points_in_polygon(sq[:, 0] + 1e-9, sq[:, 1] + 1e-9, [buf]).all()

    def test_polygon_predicates(self):
        from tilegrid.geometry import (
            polygon_contains_polygon, polygons_intersect, regular_ngon,
        )

        a = [regular_ngon(0.0, 0.0, 8, 5.0)]
        b = [regular_ngon(0.0, 0.0, 8, 1.0)]
        c = [regular_ngon(20.0, 0.0, 8, 1.0)]
        d = [regular_ngon(5.0, 0.0, 8, 1.5)]  # straddles a's boundary
        assert polygons_intersect(a, b) and polygon_contains_polygon(a, b)
        assert not polygons_intersect(a, c)
        assert polygons_intersect(a, d) and not polygon_contains_polygon(a, d)

    def test_shapefile_roundtrip(self):
        from tilegrid.geometry import regular_ngon
        from tilegrid.shapefile import shp_decode, shp_encode

        pts = [(1.5, -2.0), (3.25, 4.5)]
        assert shp_decode(shp_encode(pts)) == pts
        ring = regular_ngon(0.0, 0.0, 6, 2.0)
        hole = regular_ngon(10.0, 10.0, 4, 0.5)
        polys = [[ring], [ring + 10.0, hole]]
        back = shp_decode(shp_encode(polys))
        assert len(back) == 2 and len(back[1]) == 2
        np.testing.assert_allclose(back[0][0], ring)
        np.testing.assert_allclose(back[1][1], hole)
        with pytest.raises(ValueError, match="share one shape type"):
            shp_encode([pts[0], [ring]])

    def test_centroid_and_distance(self):
        from tilegrid.geometry import (
            points_polygon_distance, polygon_centroid, regular_ngon,
        )

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        assert polygon_centroid(sq) == (2.0, 2.0)
        ngon = regular_ngon(1.0, -1.0, 128, 2.0)
        cx, cy = polygon_centroid(ngon)
        assert cx == pytest.approx(1.0) and cy == pytest.approx(-1.0)
        d = points_polygon_distance(
            np.array([2.0, 6.0, -3.0]), np.array([2.0, 2.0, 0.0]), [sq]
        )
        np.testing.assert_allclose(d, [0.0, 2.0, 3.0])


class TestResampleKernels:
    def test_identity_scaling_is_exact(self):
        from tilegrid.tiles import resample_bilinear, resample_cubic, resample_lanczos

        rng = np.random.default_rng(7)
        src = rng.random((16, 16)) * 100
        for fn in (resample_bilinear, resample_cubic, resample_lanczos):
            np.testing.assert_allclose(fn(src, 16, 16), src, atol=1e-9, err_msg=fn.__name__)

    def test_constant_preserved(self):
        from tilegrid.tiles import (
            resample_cubic, resample_cubicspline, resample_lanczos,
        )

        src = np.full((8, 8), 42.0)
        np.testing.assert_allclose(resample_cubic(src, 32, 32), 42.0)
        np.testing.assert_allclose(resample_lanczos(src, 32, 32), 42.0)
        # B-spline: partition of unity -> constants exact (though smoothing)
        np.testing.assert_allclose(resample_cubicspline(src, 32, 32), 42.0)

    def test_cubic_reproduces_linear_ramp_interior(self):
        """Cubic convolution interpolates degree-1 polynomials exactly in
        the interior (Keys 1981) — the classic kernel correctness check."""
        from tilegrid.tiles import resample_cubic

        src = np.outer(np.arange(16, dtype=float), np.ones(16)) * 2.0 + 3.0
        up = resample_cubic(src, 32, 32)
        fy = (np.arange(32) + 0.5) * 16 / 32 - 0.5
        want = fy * 2.0 + 3.0
        # interior rows (edge-clamped taps differ at the borders)
        np.testing.assert_allclose(up[4:-4, 8], want[4:-4], rtol=1e-12)

    def test_block_reduce_median_and_mode(self):
        from tilegrid.tiles import block_reduce

        src = np.array(
            [[1.0, 1.0, 5.0, 7.0],
             [2.0, 9.0, 5.0, 5.0],
             [0.0, 0.0, 3.0, 3.0],
             [0.0, 4.0, 2.0, 2.0]]
        )
        med = block_reduce(src, 2, "median")
        np.testing.assert_allclose(med, [[1.5, 5.0], [0.0, 2.5]])
        mode = block_reduce(src, 2, "mode")
        np.testing.assert_allclose(mode, [[1.0, 5.0], [0.0, 2.0]])
        # NaN handling: all-NaN block -> NaN, partial -> skipped
        src2 = src.copy()
        src2[0:2, 0:2] = np.nan
        src2[0, 2] = np.nan
        m2 = block_reduce(src2, 2, "mode")
        assert np.isnan(m2[0, 0]) and m2[0, 1] == 5.0


class TestFixtures:
    def test_images_deterministic(self):
        a = fixtures.images_table(20)
        b = fixtures.images_table(20)
        assert a["phash"].tolist() == b["phash"].tolist()
        assert (a["caption"] == b["caption"]).all()
        # decode round-trip invariants: png exact, jpeg PSNR >= 40
        for _, r in a.iterrows():
            dec = codec.decode_tile(r["bytes"], r["fmt"])
            pat = fixtures.make_pattern_rgb(int(r["image_id"][3:]), r["h"], r["w"])
            assert dec.shape == (r["h"], r["w"], 3)  # RGB corpus
            if r["fmt"] == "png":
                assert np.array_equal(dec, pat)
            else:
                assert codec.psnr(pat, dec) >= 40.0

    def test_hot_box_skew_exists(self):
        df = fixtures.points_table(1000)
        hot = (
            (df.lon >= fixtures.HOT_BOX.xmin) & (df.lon <= fixtures.HOT_BOX.xmax)
            & (df.lat >= fixtures.HOT_BOX.ymin) & (df.lat <= fixtures.HOT_BOX.ymax)
        )
        assert hot.sum() >= 90

    def test_tile_layer_increasing_stitches(self):
        pdf = fixtures.tile_layer_table("increasing", tile_size=4)
        arr, (cmin, rmin, cmax, rmax) = fixtures.stitch_layer_df(pdf)
        assert (cmin, rmin, cmax, rmax) == fixtures.TEST_BOUNDS
        w = arr.shape[1]
        np.testing.assert_allclose(arr.ravel(), np.arange(arr.size, dtype=float))


class TestHullSimplify:
    def test_convex_hull_square_with_interior(self):
        from tilegrid.geometry import convex_hull

        rng = np.random.default_rng(7)
        inner = rng.uniform(0.1, 0.9, size=(200, 2))
        corners = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
        hull = convex_hull(np.vstack([inner, corners]))
        assert {tuple(p) for p in hull} == {tuple(p) for p in corners}
        # CCW orientation: positive shoelace area
        x, y = hull[:, 0], hull[:, 1]
        area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert area > 0

    def test_convex_hull_contains_all_points(self):
        from tilegrid.geometry import convex_hull, points_in_ring

        rng = np.random.default_rng(11)
        pts = rng.standard_normal((300, 2))
        hull = convex_hull(pts)
        eps = 1e-9
        grown = hull + (hull - hull.mean(axis=0)) * eps
        assert points_in_ring(pts[:, 0], pts[:, 1], grown).all()

    def test_simplify_line(self):
        from tilegrid.geometry import simplify_dp

        x = np.linspace(0, 10, 101)
        wiggly = np.column_stack([x, 0.001 * np.sin(x * 50)])
        out = simplify_dp(wiggly, tolerance=0.01)
        assert len(out) == 2  # collapses to the chord
        big = np.array([[0, 0], [5, 3], [10, 0]], dtype=float)
        out = simplify_dp(big, tolerance=0.5)
        assert len(out) == 3  # the 3-unit deviation survives

    def test_simplify_preserves_endpoints_and_order(self):
        from tilegrid.geometry import simplify_dp

        rng = np.random.default_rng(3)
        line = np.cumsum(rng.standard_normal((50, 2)), axis=0)
        out = simplify_dp(line, tolerance=0.2)
        assert (out[0] == line[0]).all() and (out[-1] == line[-1]).all()
        # kept points appear in original order
        idx = [np.where((line == p).all(axis=1))[0][0] for p in out]
        assert idx == sorted(idx)


class TestReclassify:
    """BreakMap boundary semantics (render/BreakMap.scala:88-121) via the
    distributed reclassify over a single-tile layer."""

    def _run(self, spark, arr, **kw):
        import pandas as pd
        from tilegrid import codec
        from tilegrid.cell import z2_encode
        from tilegrid.operators.local import reclassify

        pdf = pd.DataFrame([{
            "zoom": np.int32(0), "col": np.int32(0), "row": np.int32(0),
            "cell": np.int64(z2_encode(0, 0)),
            "tile": codec.raw_encode(np.ascontiguousarray(arr)),
            "h": np.int32(arr.shape[0]), "w": np.int32(arr.shape[1]),
            "fmt": "raw",
        }])
        out = reclassify(spark.createDataFrame(pdf), **kw).toPandas()
        return codec.decode_tile(bytes(out.iloc[0]["tile"]), out.iloc[0]["fmt"])

    def test_lte_default(self, spark):
        arr = np.array([[0.0, 1.0, 1.5, 3.0, 99.0, np.nan]])
        got = self._run(spark, arr, break_map={1.0: 10.0, 3.0: 20.0})
        np.testing.assert_array_equal(
            got, [[10.0, 10.0, 20.0, 20.0, np.nan, np.nan]])

    def test_lt_excludes_break(self, spark):
        arr = np.array([[1.0, 0.99, 3.0]])
        got = self._run(spark, arr, break_map={1.0: 10.0, 3.0: 20.0},
                        boundary="lt")
        np.testing.assert_array_equal(got, [[20.0, 10.0, np.nan]])

    def test_gte_and_gt(self, spark):
        arr = np.array([[0.5, 1.0, 2.0]])
        got = self._run(spark, arr, break_map={1.0: 10.0, 2.0: 20.0},
                        boundary="gte")
        np.testing.assert_array_equal(got, [[np.nan, 10.0, 20.0]])
        got = self._run(spark, arr, break_map={1.0: 10.0, 2.0: 20.0},
                        boundary="gt")
        np.testing.assert_array_equal(got, [[np.nan, np.nan, 10.0]])

    def test_exact_with_fallback(self, spark):
        arr = np.array([[1.0, 1.5, 2.0]])
        got = self._run(spark, arr, break_map={1.0: 10.0, 2.0: 20.0},
                        boundary="exact", fallback=-1.0)
        np.testing.assert_array_equal(got, [[10.0, -1.0, 20.0]])
