"""Property-based tests (hypothesis) for the pure kernels: codecs,
space-filling curves, grid math, and vector IO — the reference's
scalacheck-style coverage (e.g. raster-test property specs) applied to the
from-scratch implementations."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from tilegrid import codec
from tilegrid.cell import (
    hilbert_decode, hilbert_encode, z2_decode, z2_encode, z3_decode, z3_encode,
)
from tilegrid.geometry import (
    geojson_decode, geojson_encode, wkb_decode, wkb_encode_polygon,
    wkt_decode, wkt_encode_polygon,
)
from tilegrid.grid import Extent, LayoutDefinition, MapKeyTransform, TileLayout

_dims = st.integers(min_value=1, max_value=40)


class TestCodecProperties:
    @given(arrays(np.uint8, st.tuples(_dims, _dims)))
    @settings(max_examples=40, deadline=None)
    def test_png_gray_roundtrip(self, arr):
        assert np.array_equal(codec.png_decode(codec.png_encode(arr)), arr)

    @given(arrays(np.uint8, st.tuples(_dims, _dims, st.just(3))))
    @settings(max_examples=25, deadline=None)
    def test_png_rgb_roundtrip(self, arr):
        assert np.array_equal(codec.png_decode(codec.png_encode(arr)), arr)

    @given(arrays(
        np.float64, st.tuples(_dims, _dims),
        elements=st.floats(-1e12, 1e12, allow_nan=False),
    ))
    @settings(max_examples=40, deadline=None)
    def test_raw_roundtrip(self, arr):
        assert np.array_equal(codec.raw_decode(codec.raw_encode(arr)), arr)

    @given(arrays(np.uint8, st.tuples(_dims, _dims)))
    @settings(max_examples=25, deadline=None)
    def test_fake_jpeg_psnr_invariant(self, arr):
        rt = codec.fake_jpeg_decode(codec.fake_jpeg_encode(arr))
        assert rt.shape == arr.shape
        assert codec.psnr(arr, rt) >= 40.0

    @given(arrays(np.uint16, st.tuples(_dims, _dims)))
    @settings(max_examples=25, deadline=None)
    def test_tiff_roundtrip_u16(self, arr):
        from tilegrid.geotiff import tiff_decode, tiff_encode

        back, _ = tiff_decode(tiff_encode(arr))
        assert np.array_equal(back, arr)


class TestCurveProperties:
    @given(st.integers(0, (1 << 29) - 1), st.integers(0, (1 << 29) - 1))
    @settings(max_examples=200, deadline=None)
    def test_z2_roundtrip(self, c, r):
        z = int(z2_encode(c, r))
        dc, dr = z2_decode(z)
        assert (int(dc), int(dr)) == (c, r) and z >= 0

    @given(st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1),
           st.integers(0, (1 << 21) - 1))
    @settings(max_examples=200, deadline=None)
    def test_z3_roundtrip(self, c, r, t):
        z = int(z3_encode(c, r, t))
        dc, dr, dt = z3_decode(z)
        assert (int(dc), int(dr), int(dt)) == (c, r, t) and z >= 0

    @given(st.integers(1, 10), st.data())
    @settings(max_examples=100, deadline=None)
    def test_hilbert_roundtrip(self, order, data):
        n = 1 << order
        c = data.draw(st.integers(0, n - 1))
        r = data.draw(st.integers(0, n - 1))
        d = int(hilbert_encode(c, r, order))
        dc, dr = hilbert_decode(d, order)
        assert (int(dc), int(dr)) == (c, r)
        assert 0 <= d < n * n

    @given(st.integers(0, (1 << 29) - 1), st.integers(0, (1 << 29) - 1),
           st.integers(0, (1 << 29) - 1), st.integers(0, (1 << 29) - 1))
    @settings(max_examples=100, deadline=None)
    def test_z2_order_preserves_quadrants(self, c1, r1, c2, r2):
        # same-quadrant points sort inside the quadrant's contiguous range:
        # the top interleaved bits dominate the Morton order
        z1, z2_ = int(z2_encode(c1, r1)), int(z2_encode(c2, r2))
        q1 = (c1 >> 28, r1 >> 28)
        q2 = (c2 >> 28, r2 >> 28)
        if q1 != q2:
            top1 = (q1[0] & 1) | ((q1[1] & 1) << 1)
            top2 = (q2[0] & 1) | ((q2[1] & 1) << 1)
            # the interleaved bit-28 pair lives at bits 56 (col) / 57 (row)
            assert (z1 >> 56 == top1) and (z2_ >> 56 == top2)
            assert (z1 < z2_) == (top1 < top2)


class TestGridProperties:
    @given(
        st.floats(-179.999, 179.999), st.floats(-89.999, 89.999),
        st.integers(1, 10),
    )
    @settings(max_examples=200, deadline=None)
    def test_point_key_within_layout_and_extent_contains_point(self, x, y, zoom):
        n = 1 << zoom
        layout = LayoutDefinition(
            Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(n, n, 16, 16)
        )
        mt = layout.map_transform
        c, r = mt.key_for_point(x, y)
        assert 0 <= c < n and 0 <= r < n
        ext = mt.extent_for_key(c, r)
        # assignment is floor-of-the-computed-double: points within a
        # rounding ulp of a tile boundary may land on either side, so the
        # containment bound carries a tile-relative tolerance
        tol = (ext.xmax - ext.xmin) * 1e-12
        assert ext.xmin - tol <= x <= ext.xmax + tol
        assert ext.ymin - tol <= y <= ext.ymax + tol

    @given(
        st.floats(-170.0, 160.0), st.floats(-80.0, 70.0),
        st.floats(0.01, 20.0), st.floats(0.01, 15.0),
    )
    @settings(max_examples=150, deadline=None)
    def test_gridbounds_cover_the_extent_corners(self, x0, y0, w, h):
        layout = LayoutDefinition(
            Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(32, 32, 16, 16)
        )
        mt = layout.map_transform
        ext = Extent(x0, y0, x0 + w, y0 + h)
        gb = mt.gridbounds_for_extent(ext)
        for (px, py) in ((ext.xmin, ext.ymax), (ext.xmax, ext.ymin)):
            c, r = mt.key_for_point(px, py)
            # S/E-exclusive backoff may place the max edge one tile back
            assert gb.col_min <= c <= gb.col_max + 1
            assert gb.row_min <= r <= gb.row_max + 1
        # vectorized form agrees with the scalar form
        cm, rm, cx, rx = mt.gridbounds_for_extents(
            [ext.xmin], [ext.ymin], [ext.xmax], [ext.ymax]
        )
        assert (int(cm[0]), int(rm[0]), int(cx[0]), int(rx[0])) == (
            gb.col_min, gb.row_min, gb.col_max, gb.row_max
        )


_coord = st.floats(-1e6, 1e6, allow_nan=False)


class TestVectorIOProperties:
    @given(st.lists(st.tuples(_coord, _coord), min_size=3, max_size=12,
                    unique=True))
    @settings(max_examples=80, deadline=None)
    def test_ring_io_roundtrips_agree(self, pts):
        ring = np.asarray(pts, dtype=np.float64)
        via_wkb = wkb_decode(wkb_encode_polygon([ring]))[0]
        via_wkt = wkt_decode(wkt_encode_polygon([ring]))[0]
        via_gj = geojson_decode(geojson_encode([ring]))[0]
        assert np.array_equal(via_wkb, ring)
        assert np.array_equal(via_wkt, ring)
        assert np.array_equal(via_gj, ring)


class TestGeohashQuadkeyProperties:
    @given(
        st.floats(-180.0, 180.0, allow_nan=False),
        st.floats(-90.0, 90.0, allow_nan=False),
        st.integers(1, 11),
    )
    @settings(max_examples=200, deadline=None)
    def test_geohash_decode_contains_point(self, lon, lat, precision):
        from tilegrid.cell import geohash_decode, geohash_encode

        gh = geohash_encode(lon, lat, precision)
        clon, clat, elon, elat = geohash_decode(str(np.asarray(gh).item()))
        # +180/+90 clamp into the last cell; containment holds within one
        # half-width (exact) everywhere else
        lon_c = min(lon, np.nextafter(180.0, -np.inf))
        lat_c = min(lat, np.nextafter(90.0, -np.inf))
        assert abs(clon[0] - lon_c) <= elon[0] + 1e-9
        assert abs(clat[0] - lat_c) <= elat[0] + 1e-9

    @given(
        st.floats(-180.0, 180.0, allow_nan=False),
        st.floats(-90.0, 90.0, allow_nan=False),
        st.integers(2, 10),
    )
    @settings(max_examples=200, deadline=None)
    def test_geohash_parent_prefix(self, lon, lat, precision):
        from tilegrid.cell import geohash_encode

        full = str(np.asarray(geohash_encode(lon, lat, precision)).item())
        # geohash is hierarchical ONLY at even/odd-consistent truncation:
        # every prefix of the base32 string is the coarser cell's code
        for p in range(1, precision):
            coarse = str(np.asarray(geohash_encode(lon, lat, p)).item())
            assert full[:p] == coarse

    @given(
        st.integers(1, 23),
        st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def test_quadkey_roundtrip_and_prefix(self, zoom, data):
        from tilegrid.cell import quadkey_decode, quadkey_encode

        col = data.draw(st.integers(0, (1 << zoom) - 1))
        row = data.draw(st.integers(0, (1 << zoom) - 1))
        qk = str(np.asarray(quadkey_encode(zoom, col, row)).item())
        assert len(qk) == zoom
        z2, c2, r2 = quadkey_decode(qk)
        assert (int(z2[0]), int(c2[0]), int(r2[0])) == (zoom, col, row)
        if zoom > 1:
            pq = str(
                np.asarray(quadkey_encode(zoom - 1, col >> 1, row >> 1)).item()
            )
            assert qk.startswith(pq)
