"""From-scratch GeoTiff codec tests: roundtrips, format variants, georef,
and a Spark ingest of GeoTiff-encoded images through the tiler."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec
from tilegrid.geotiff import tiff_decode, tiff_decode_window, tiff_encode
from tilegrid.grid import Extent


class TestGeoTiffCodec:
    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32", "float64"])
    def test_roundtrip_gray(self, dtype):
        rng = np.random.default_rng(1)
        arr = (rng.random((37, 53)) * 200).astype(dtype)
        back, ext = tiff_decode(tiff_encode(arr))
        np.testing.assert_array_equal(back, arr)
        assert ext is None

    def test_roundtrip_rgb_and_georef(self):
        rng = np.random.default_rng(2)
        arr = (rng.random((32, 64, 3)) * 255).astype(np.uint8)
        e = Extent(-10.0, 40.0, 22.0, 56.0)
        data = tiff_encode(arr, extent=e)
        back, ext = tiff_decode(data)
        np.testing.assert_array_equal(back, arr)
        assert ext is not None
        np.testing.assert_allclose(
            [ext.xmin, ext.ymin, ext.xmax, ext.ymax],
            [e.xmin, e.ymin, e.xmax, e.ymax],
        )

    def test_uncompressed_and_codec_dispatch(self):
        arr = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
        data = tiff_encode(arr, compress=False)
        back, _ = tiff_decode(data)
        np.testing.assert_array_equal(back, arr)
        # codec.decode_tile sniffs the TIFF magic
        np.testing.assert_array_equal(codec.decode_tile(data), arr)
        np.testing.assert_array_equal(
            codec.decode_tile(codec.encode_tile(arr, "tiff"), "tiff"), arr
        )

    def test_packbits_strip(self):
        """Hand-built PackBits-compressed strip decodes correctly."""
        row = bytes([7] * 10 + [1, 2, 3])  # run of 7s + literal bytes
        packed = bytes([256 - 9, 7, 2, 1, 2, 3])  # replicate 10x7, literal 3
        h, w = 1, 13
        ifd_off = 8
        entries = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, 1, struct.pack("<H", 8)),
            (259, 3, 1, struct.pack("<H", 32773)),
            (262, 3, 1, struct.pack("<H", 1)),
            (277, 3, 1, struct.pack("<H", 1)),
            (278, 4, 1, struct.pack("<I", h)),
            (279, 4, 1, struct.pack("<I", len(packed))),
        ]
        n = len(entries) + 1
        strip_off = ifd_off + 2 + n * 12 + 4
        entries.append((273, 4, 1, struct.pack("<I", strip_off)))
        entries.sort(key=lambda x: x[0])
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
        out += struct.pack("<H", n)
        for tag, typ, cnt, raw in entries:
            out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        out += struct.pack("<I", 0)
        out += packed
        back, _ = tiff_decode(bytes(out))
        np.testing.assert_array_equal(back, np.frombuffer(row, np.uint8).reshape(1, 13))

    def test_big_endian_read(self):
        """Hand-built big-endian (MM) uncompressed gray TIFF decodes."""
        arr = (np.arange(4 * 6, dtype=np.uint16) * 101 % 5000).reshape(4, 6)
        body = arr.astype(">u2").tobytes()
        ifd_off = 8
        entries = [
            (256, 4, 1, struct.pack(">I", 6)),
            (257, 4, 1, struct.pack(">I", 4)),
            (258, 3, 1, struct.pack(">H", 16) + b"\x00\x00"),
            (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
            (262, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
            (277, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
            (278, 4, 1, struct.pack(">I", 4)),
            (279, 4, 1, struct.pack(">I", len(body))),
        ]
        n = len(entries) + 1
        strip_off = ifd_off + 2 + n * 12 + 4
        entries.append((273, 4, 1, struct.pack(">I", strip_off)))
        entries.sort(key=lambda x: x[0])
        out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
        out += struct.pack(">H", n)
        for tag, typ, cnt, raw in entries:
            out += struct.pack(">HHI", tag, typ, cnt) + raw[:4].ljust(4, b"\x00")
        out += struct.pack(">I", 0)
        out += body
        back, _ = tiff_decode(bytes(out))
        np.testing.assert_array_equal(back, arr)

    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32", "float64"])
    @pytest.mark.parametrize("compress", [False, "deflate", "lzw"])
    def test_bigtiff_roundtrip(self, dtype, compress):
        rng = np.random.default_rng(5)
        arr = (rng.random((23, 41)) * 200).astype(dtype)
        data = tiff_encode(arr, compress=compress, bigtiff=True)
        assert data[:4] == b"II+\x00"  # version 43 magic
        assert struct.unpack_from("<H", data, 4)[0] == 8  # 8-byte offsets
        back, _ = tiff_decode(data)
        np.testing.assert_array_equal(back, arr)

    def test_bigtiff_georef_and_rgb(self):
        rng = np.random.default_rng(6)
        arr = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
        e = Extent(3.0, -8.0, 27.0, 8.0)
        back, ext = tiff_decode(tiff_encode(arr, extent=e, bigtiff=True))
        np.testing.assert_array_equal(back, arr)
        np.testing.assert_allclose(
            [ext.xmin, ext.ymin, ext.xmax, ext.ymax],
            [e.xmin, e.ymin, e.xmax, e.ymax],
        )

    def test_bigtiff_big_endian_read(self):
        """Hand-built big-endian (MM) BigTIFF with LONG8 strip tags."""
        arr = (np.arange(3 * 5, dtype=np.uint8) * 7 % 250).reshape(3, 5)
        body = arr.tobytes()
        ifd_off = 16
        # 20-byte entries: tag u16, type u16, count u64, value 8 bytes
        entries = [
            (256, 4, 1, struct.pack(">I", 5) + b"\x00" * 4),
            (257, 4, 1, struct.pack(">I", 3) + b"\x00" * 4),
            (258, 3, 1, struct.pack(">H", 8) + b"\x00" * 6),
            (259, 3, 1, struct.pack(">H", 1) + b"\x00" * 6),
            (262, 3, 1, struct.pack(">H", 1) + b"\x00" * 6),
            (277, 3, 1, struct.pack(">H", 1) + b"\x00" * 6),
            (278, 4, 1, struct.pack(">I", 3) + b"\x00" * 4),
            (279, 16, 1, struct.pack(">Q", len(body))),
        ]
        n = len(entries) + 1
        strip_off = ifd_off + 8 + n * 20 + 8
        entries.append((273, 16, 1, struct.pack(">Q", strip_off)))
        entries.sort(key=lambda x: x[0])
        out = bytearray(b"MM\x00+" + struct.pack(">HHQ", 8, 0, ifd_off))
        out += struct.pack(">Q", n)
        for tag, typ, cnt, raw in entries:
            out += struct.pack(">HHQ", tag, typ, cnt) + raw[:8].ljust(8, b"\x00")
        out += struct.pack(">Q", 0)
        out += body
        back, _ = tiff_decode(bytes(out))
        np.testing.assert_array_equal(back, arr)

    def test_unsupported_raises(self):
        arr = np.zeros((4, 4), dtype=np.uint8)
        data = bytearray(tiff_encode(arr, compress=False))
        # flip compression tag (259) value to JPEG2000 (34712, unsupported)
        pos = data.find(struct.pack("<HH", 259, 3))
        data[pos + 8 : pos + 10] = struct.pack("<H", 34712 & 0xFFFF)
        with pytest.raises(ValueError, match="compression"):
            tiff_decode(bytes(data))


class TestGeoTiffIngest:
    def test_tiler_ingests_tiff_corpus(self, spark):
        """GeoTiff-encoded images flow through tile_to_layout unchanged —
        the codec dispatch is the only difference vs the PNG corpus."""
        from tilegrid import fixtures
        from tilegrid.grid import ZoomedLayoutScheme, lnglat_to_webmercator
        from tilegrid.operators.tiler import tile_to_layout, with_extent_from_center

        scheme = ZoomedLayoutScheme("webmercator")
        layout = scheme.level_for_zoom(3).layout
        pdf = fixtures.images_table(20)
        x, y = lnglat_to_webmercator(pdf.lon.values, pdf.lat.values)
        pdf["x"], pdf["y"] = x, y
        # re-encode the RGB patterns as GeoTiffs
        pdf["tile"] = [
            tiff_encode(fixtures.make_pattern_rgb(i, int(r.h), int(r.w)))
            for i, r in enumerate(pdf.itertuples(index=False))
        ]
        pdf["fmt"] = "tiff"
        df = spark.createDataFrame(pdf[["image_id", "tile", "fmt", "x", "y", "w", "h"]])
        layer = tile_to_layout(
            with_extent_from_center(df, layout, "x", "y"), layout, 3
        ).toPandas()
        assert len(layer) > 0
        arr = codec.decode_tile(bytes(layer.iloc[0].tile), layer.iloc[0].fmt)
        assert arr.shape == (256, 256)


class TestLZWAndPredictors:
    """LZW (compression 5) + horizontal/floating-point predictors —
    LZWDecompression.scala / HorizontalPredictor.scala /
    FloatingPointPredictor.scala parity surface."""

    def _rt(self, arr, **kw):
        got, _ = tiff_decode(tiff_encode(arr, **kw))
        np.testing.assert_array_equal(got, arr)

    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32", "float64"])
    def test_lzw_roundtrip(self, dtype):
        rng = np.random.RandomState(7)
        arr = (rng.rand(40, 53) * 200).astype(dtype)
        self._rt(arr, compress="lzw")

    def test_lzw_roundtrip_rgb(self):
        rng = np.random.RandomState(11)
        arr = (rng.rand(31, 47, 3) * 255).astype(np.uint8)
        self._rt(arr, compress="lzw")

    def test_lzw_code_width_growth_and_dictionary_flush(self):
        # high-entropy bytes force the table through 9->10->11->12 bits and
        # past the 4094 flush point
        rng = np.random.RandomState(3)
        arr = rng.randint(0, 256, size=(160, 160), dtype=np.uint8)
        self._rt(arr, compress="lzw")

    def test_handbuilt_lzw_stream_decodes(self):
        # TIFF6-spec encoding of b"ABABABABA", packed by hand in this test
        # (independent of _lzw_encode): Clear, 'A', 'B', AB(258), ABA(260),
        # BA(259), EOI at 9 bits each — A+B+AB+ABA+BA = 9 chars
        from tilegrid.geotiff import _lzw_decode

        codes = [256, 65, 66, 258, 260, 259, 257]
        buf = nbuf = 0
        out = bytearray()
        for c in codes:
            buf = (buf << 9) | c
            nbuf += 9
            while nbuf >= 8:
                out.append((buf >> (nbuf - 8)) & 0xFF)
                nbuf -= 8
            buf &= (1 << nbuf) - 1
        if nbuf:
            out.append((buf << (8 - nbuf)) & 0xFF)
        assert _lzw_decode(bytes(out)) == b"ABABABABA"

    @pytest.mark.parametrize("dtype", ["uint8", "uint16"])
    @pytest.mark.parametrize("bands", [1, 3])
    def test_horizontal_predictor(self, dtype, bands):
        rng = np.random.RandomState(5)
        shape = (24, 37) if bands == 1 else (24, 37, bands)
        # smooth-ish ramp + noise: the shape predictor 2 is built for
        base = np.cumsum(rng.randint(0, 3, size=shape), axis=1)
        arr = (base % np.iinfo(dtype).max).astype(dtype)
        self._rt(arr, compress="lzw", predictor=2)
        self._rt(arr, compress="deflate", predictor=2)

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    @pytest.mark.parametrize("bands", [1, 3])
    def test_floating_point_predictor(self, dtype, bands):
        rng = np.random.RandomState(9)
        shape = (19, 29) if bands == 1 else (19, 29, bands)
        arr = (rng.rand(*shape) * 1000 - 500).astype(dtype)
        self._rt(arr, compress="lzw", predictor=3)
        self._rt(arr, compress="deflate", predictor=3)

    def test_predictor_kind_mismatch_raises(self):
        with pytest.raises(ValueError):
            tiff_encode(np.zeros((4, 4), np.float32), predictor=2)
        with pytest.raises(ValueError):
            tiff_encode(np.zeros((4, 4), np.uint8), predictor=3)

    def test_geo_tags_survive_lzw(self):
        arr = (np.arange(64, dtype=np.uint8).reshape(8, 8))
        ext = Extent(10.0, 20.0, 18.0, 28.0)
        got, gext = tiff_decode(tiff_encode(arr, extent=ext, compress="lzw",
                                            predictor=2))
        np.testing.assert_array_equal(got, arr)
        assert gext is not None
        assert abs(gext.xmin - 10.0) < 1e-9 and abs(gext.ymax - 28.0) < 1e-9


class TestPlanarConfiguration:
    def test_planar_round_trip_uint8_rgb(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 255, (13, 17, 3)).astype(np.uint8)
        for compress in (False, True, "lzw"):
            data = tiff_encode(a, compress=compress, planar=2)
            out, _ = tiff_decode(data)
            np.testing.assert_array_equal(out, a)

    def test_planar_with_predictors(self):
        rng = np.random.RandomState(1)
        u = rng.randint(0, 65535, (9, 11, 3)).astype(np.uint16)
        out, _ = tiff_decode(tiff_encode(u, planar=2, predictor=2))
        np.testing.assert_array_equal(out, u)
        f = rng.uniform(-5, 5, (9, 11, 3)).astype(np.float32)
        out, _ = tiff_decode(tiff_encode(f, planar=2, predictor=3))
        np.testing.assert_array_equal(out, f)

    def test_planar_tag_written_and_bytes_differ(self):
        a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        chunky = tiff_encode(a, compress=False)
        planar = tiff_encode(a, compress=False, planar=2)
        assert chunky != planar
        np.testing.assert_array_equal(tiff_decode(planar)[0], a)

    def test_planar_single_band_degrades_to_chunky(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        np.testing.assert_array_equal(
            tiff_decode(tiff_encode(a, planar=2))[0], a
        )

    def test_planar_geotiff_extent_preserved(self):
        a = np.zeros((4, 4, 3), dtype=np.uint8)
        ext = Extent(10.0, 20.0, 14.0, 24.0)
        out, got_ext = tiff_decode(tiff_encode(a, extent=ext, planar=2))
        assert got_ext is not None
        assert (got_ext.xmin, got_ext.ymin, got_ext.xmax, got_ext.ymax) == (
            10.0, 20.0, 14.0, 24.0)

    def test_planar_bigtiff(self):
        rng = np.random.RandomState(2)
        a = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
        data = tiff_encode(a, planar=2, bigtiff=True)
        assert data[:4] == b"II+\x00"
        np.testing.assert_array_equal(tiff_decode(data)[0], a)


class TestWindowedRead:
    def _check(self, a, data, x0, y0, ww, wh):
        out, _ = tiff_decode_window(data, x0, y0, ww, wh)
        np.testing.assert_array_equal(out, a[y0:y0+wh, x0:x0+ww])

    def test_striped_multi_strip_windows(self):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 255, (100, 64)).astype(np.uint8)
        for compress in (False, True, "lzw"):
            data = tiff_encode(a, compress=compress, rows_per_strip=16)
            for win in [(0, 0, 64, 100), (10, 23, 30, 40), (63, 99, 1, 1),
                        (0, 96, 64, 4)]:
                self._check(a, data, *win)

    def test_multi_strip_round_trip_full(self):
        rng = np.random.RandomState(1)
        a = rng.uniform(-10, 10, (50, 33)).astype(np.float64)
        data = tiff_encode(a, rows_per_strip=7)
        np.testing.assert_array_equal(tiff_decode(data)[0], a)

    def test_windowed_rgb_and_planar(self):
        rng = np.random.RandomState(2)
        a = rng.randint(0, 255, (48, 40, 3)).astype(np.uint8)
        for planar in (1, 2):
            data = tiff_encode(a, rows_per_strip=8, planar=planar)
            out, _ = tiff_decode_window(data, 5, 9, 20, 30)
            np.testing.assert_array_equal(out, a[9:39, 5:25])

    def test_windowed_with_predictor(self):
        rng = np.random.RandomState(3)
        a = rng.randint(0, 65535, (64, 32)).astype(np.uint16)
        data = tiff_encode(a, rows_per_strip=16, predictor=2)
        self._check(a, data, 4, 20, 10, 30)

    @staticmethod
    def _make_tiled_tiff(a: np.ndarray, tw: int, th: int) -> bytes:
        """Hand-pack a minimal little-endian classic tiled TIFF (uint8,
        uncompressed) — the writer only emits strips, so the tiled read
        path needs a hand-built stream."""
        h, w = a.shape
        across, down = -(-w // tw), -(-h // th)
        chunks = []
        for ty in range(down):
            for tx in range(across):
                t = np.zeros((th, tw), np.uint8)
                src = a[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                t[: src.shape[0], : src.shape[1]] = src
                chunks.append(t.tobytes())
        tags = [(256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [1]),
                (262, 3, [1]), (277, 3, [1]), (322, 3, [tw]), (323, 3, [th]),
                (324, 4, None), (325, 4, [len(c) for c in chunks])]
        n = len(tags)
        data_off = 8 + 2 + n * 12 + 4
        blobs = []
        offs_pos = {}
        for i, (tag, typ, vals) in enumerate(tags):
            cnt = len(chunks) if vals is None else len(vals)
            sz = cnt * (2 if typ == 3 else 4)
            if sz > 4:
                offs_pos[tag] = data_off
                data_off += sz
        chunk_offs, acc = [], data_off
        for c in chunks:
            chunk_offs.append(acc)
            acc += len(c)
        out = bytearray(b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", n))
        for tag, typ, vals in tags:
            if tag == 324:
                vals = chunk_offs
            cnt = len(vals)
            pk = "H" if typ == 3 else "I"
            raw = struct.pack("<" + pk * cnt, *vals)
            out += struct.pack("<HHI", tag, typ, cnt)
            out += struct.pack("<I", offs_pos[tag]) if len(raw) > 4 else raw.ljust(4, b"\x00")
        out += struct.pack("<I", 0)
        for tag, typ, vals in tags:
            if tag == 324:
                vals = chunk_offs
            cnt = len(vals)
            pk = "H" if typ == 3 else "I"
            raw = struct.pack("<" + pk * cnt, *vals)
            if len(raw) > 4:
                out += raw
        for c in chunks:
            out += c
        return bytes(out)

    def test_windowed_tiled(self):
        rng = np.random.RandomState(4)
        a = rng.randint(0, 255, (40, 40)).astype(np.uint8)
        data = self._make_tiled_tiff(a, 16, 16)
        np.testing.assert_array_equal(tiff_decode(data)[0], a)  # sanity
        for win in [(10, 18, 20, 12), (0, 0, 40, 40), (39, 39, 1, 1),
                    (16, 16, 16, 16), (1, 33, 38, 7)]:
            x0, y0, ww, wh = win
            out, _ = tiff_decode_window(data, x0, y0, ww, wh)
            np.testing.assert_array_equal(out, a[y0:y0+wh, x0:x0+ww])

    def test_window_extent(self):
        a = np.zeros((10, 10), dtype=np.uint8)
        ext = Extent(0.0, 0.0, 10.0, 10.0)
        data = tiff_encode(a, extent=ext, rows_per_strip=2)
        _, wext = tiff_decode_window(data, 2, 3, 4, 5)
        assert (wext.xmin, wext.ymax, wext.xmax, wext.ymin) == (2.0, 7.0, 6.0, 2.0)

    def test_window_out_of_bounds_raises(self):
        a = np.zeros((10, 10), dtype=np.uint8)
        data = tiff_encode(a)
        with pytest.raises(ValueError):
            tiff_decode_window(data, 5, 5, 10, 2)


class TestOverviews:
    """Chained-IFD overviews (the cloud-optimized GeoTIFF layout; the
    reference reads multi-IFD files via GeoTiffReader's segment layout)."""

    def _file(self):
        rng = np.random.default_rng(2)
        full = (rng.random((128, 160)) * 255).astype(np.uint8)
        o1 = full.reshape(64, 2, 80, 2).mean(axis=(1, 3)).astype(np.uint8)
        o2 = o1.reshape(32, 2, 40, 2).mean(axis=(1, 3)).astype(np.uint8)
        from tilegrid.grid import Extent

        ext = Extent(0.0, 0.0, 16.0, 12.8)
        data = tiff_encode(
            full, extent=ext, compress="lzw", rows_per_strip=32, overviews=[o1, o2]
        )
        return data, full, o1, o2, ext

    def test_each_ifd_roundtrips_with_shared_extent(self):
        data, full, o1, o2, ext = self._file()
        for i, want in enumerate((full, o1, o2)):
            arr, got_ext = tiff_decode(data, ifd=i)
            np.testing.assert_array_equal(arr, want)
            assert got_ext.to_tuple() == ext.to_tuple()
        with pytest.raises(ValueError, match="no IFD"):
            tiff_decode(data, ifd=3)

    def test_windowed_read_on_overview(self):
        data, full, o1, _, _ = self._file()
        w1, _ = tiff_decode_window(data, 10, 5, 30, 20, ifd=1)
        np.testing.assert_array_equal(w1, o1[5:25, 10:40])
        w0, _ = tiff_decode_window(data, 10, 5, 30, 20)
        np.testing.assert_array_equal(w0, full[5:25, 10:40])

    def test_bigtiff_chain(self):
        rng = np.random.default_rng(3)
        full = (rng.random((64, 64)) * 1000).astype(np.float32)
        o1 = full[::2, ::2].copy()
        data = tiff_encode(full, bigtiff=True, predictor=3, overviews=[o1])
        np.testing.assert_array_equal(tiff_decode(data, ifd=1)[0], o1)
        np.testing.assert_array_equal(tiff_decode(data)[0], full)


class TestOldStyleJpeg:
    def test_compression_6_interchange_form(self):
        """Hand-built old-style JPEG TIFF: compression 6 with
        JPEGInterchangeFormat/Length (513/514) pointing at one complete
        stream — the common wild form."""
        from tilegrid import jpeg

        gx, gy = np.meshgrid(np.arange(40), np.arange(24))
        img = ((gx * 3 + gy * 5) % 200).astype(np.uint8)
        stream = jpeg.encode(img, quality=95)
        ifd_off = 8
        entries = [
            (256, 4, 1, struct.pack("<I", 40)),
            (257, 4, 1, struct.pack("<I", 24)),
            (258, 3, 1, struct.pack("<H", 8)),
            (259, 3, 1, struct.pack("<H", 6)),
            (262, 3, 1, struct.pack("<H", 1)),
            (277, 3, 1, struct.pack("<H", 1)),
            (514, 4, 1, struct.pack("<I", len(stream))),
        ]
        n = len(entries) + 1
        data_off = ifd_off + 2 + n * 12 + 4
        entries.append((513, 4, 1, struct.pack("<I", data_off)))
        entries.sort(key=lambda x: x[0])
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
        out += struct.pack("<H", n)
        for tag, typ, cnt, raw in entries:
            out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        out += struct.pack("<I", 0)
        out += stream
        back, ext = tiff_decode(bytes(out))
        assert ext is None
        np.testing.assert_array_equal(back, jpeg.decode(stream))
        assert codec.psnr(img.astype(float), back.astype(float)) >= 40.0

    def test_compression_6_without_pointer_raises(self):
        arr = np.zeros((4, 4), dtype=np.uint8)
        data = bytearray(tiff_encode(arr, compress=False))
        pos = data.find(struct.pack("<HH", 259, 3))
        data[pos + 8 : pos + 10] = struct.pack("<H", 6)
        with pytest.raises(ValueError, match="JPEGInterchangeFormat"):
            tiff_decode(bytes(data))


class TestTiledWrite:
    """Tiled-layout writes (TileWidth/TileLength/TileOffsets) — the layout
    the reference's tiled GeoTiffs and COGs use; pairs with 2-D windowed
    reads that skip whole tiles on both axes."""

    @pytest.mark.parametrize(
        "shape,dtype,compress,predictor,planar",
        [
            ((70, 90), "uint8", "lzw", 2, 1),
            ((70, 90), "float64", "deflate", 3, 1),
            ((50, 70, 3), "uint8", "deflate", 1, 1),
            ((50, 70, 3), "uint16", False, 1, 2),
        ],
    )
    def test_roundtrip_and_window(self, shape, dtype, compress, predictor, planar):
        rng = np.random.default_rng(4)
        arr = (rng.random(shape) * 200).astype(dtype)
        data = tiff_encode(
            arr, compress=compress, predictor=predictor, planar=planar, tile_size=32
        )
        back, _ = tiff_decode(data)
        np.testing.assert_array_equal(back, arr)
        win, _ = tiff_decode_window(data, 5, 7, 30, 25)
        np.testing.assert_array_equal(win, arr[7:32, 5:35])

    def test_jpeg_tiled(self):
        gx, gy = np.meshgrid(np.arange(60), np.arange(40))
        arr = ((gx * 3 + gy * 2) % 220).astype(np.uint8)
        data = tiff_encode(arr, compress="jpeg", tile_size=32)
        back, _ = tiff_decode(data)
        assert codec.psnr(arr.astype(float), back.astype(float)) >= 40.0

    def test_tiled_overviews_bigtiff(self):
        rng = np.random.default_rng(5)
        full = (rng.random((128, 96)) * 255).astype(np.uint8)
        o1 = full[::2, ::2].copy()
        data = tiff_encode(
            full, extent=Extent(0, 0, 9.6, 12.8), compress="lzw",
            tile_size=64, overviews=[o1], bigtiff=True,
        )
        np.testing.assert_array_equal(tiff_decode(data)[0], full)
        np.testing.assert_array_equal(tiff_decode(data, ifd=1)[0], o1)
        w, ext = tiff_decode_window(data, 8, 8, 40, 40, ifd=0)
        np.testing.assert_array_equal(w, full[8:48, 8:48])
        assert ext is not None

    def test_bad_tile_size_raises(self):
        with pytest.raises(ValueError, match="multiple of 16"):
            tiff_encode(np.zeros((8, 8), np.uint8), tile_size=20)


class TestArgFormat:
    """ARG (Azavea Raster Grid) sidecar+binary format parity
    (raster/.../io/arg/{ArgWriter,ArgReader,CellWriter}.scala)."""

    @pytest.mark.parametrize(
        "datatype", ["int8", "uint8", "int16", "uint16", "int32", "float32", "float64"]
    )
    def test_roundtrip_with_nodata(self, tmp_path, datatype):
        from tilegrid.arg import arg_read, arg_write

        rng = np.random.default_rng(7)
        arr = np.floor(rng.random((9, 13)) * 100).astype(np.float64)
        arr[0, 0] = np.nan
        arr[5, 7] = np.nan
        base = str(tmp_path / "t")
        ext = Extent(1.0, 2.0, 14.0, 11.0)
        arg_write(base, arr, ext, layer="t", datatype=datatype)
        back, got_ext, meta = arg_read(base + ".json")
        assert meta["datatype"] == datatype and meta["epsg"] == 3785
        assert got_ext.to_tuple() == ext.to_tuple()
        if datatype in ("uint8", "uint16"):
            # sentinel 0: NaN and literal 0 both read back as NoData
            want = arr.copy()
            want[want == 0] = np.nan
            np.testing.assert_array_equal(np.isnan(back), np.isnan(want))
            np.testing.assert_array_equal(back[~np.isnan(want)], want[~np.isnan(want)])
        else:
            np.testing.assert_array_equal(np.isnan(back), np.isnan(arr))
            m = ~np.isnan(arr)
            np.testing.assert_array_equal(back[m], arr[m])

    def test_bool_bitpacked(self, tmp_path):
        from tilegrid.arg import arg_read, arg_write

        arr = (np.arange(7 * 11).reshape(7, 11) % 3 == 0)
        base = str(tmp_path / "b")
        arg_write(base, arr, Extent(0, 0, 11, 7))
        back, _, meta = arg_read(base)
        assert meta["datatype"] == "bool"
        np.testing.assert_array_equal(back, arr.astype(np.float64))
        # packed size: ceil(77/8) bytes
        assert (tmp_path / "b.arg").stat().st_size == 10

    def test_constant_tile_metadata_only(self, tmp_path):
        import json as _json

        from tilegrid.arg import arg_read

        meta = {
            "layer": "c", "datatype": "int32", "type": "constant",
            "xmin": 0.0, "xmax": 4.0, "ymin": 0.0, "ymax": 2.0,
            "cols": 4, "rows": 2, "cellwidth": 1.0, "cellheight": 1.0,
            "epsg": 3785, "yskew": 0.0, "xskew": 0.0, "constant": 9,
        }
        (tmp_path / "c.json").write_text(_json.dumps(meta))
        back, ext, _ = arg_read(str(tmp_path / "c.json"))
        np.testing.assert_array_equal(back, np.full((2, 4), 9.0))
        assert ext.to_tuple() == (0.0, 0.0, 4.0, 2.0)

    def test_big_endian_on_disk(self, tmp_path):
        from tilegrid.arg import arg_write

        arr = np.array([[1.0, 258.0]])
        base = str(tmp_path / "be")
        arg_write(base, arr, Extent(0, 0, 2, 1), datatype="int16")
        raw = (tmp_path / "be.arg").read_bytes()
        assert raw == b"\x00\x01\x01\x02"  # big-endian 1, 258


class TestWriteCog:
    def test_cog_levels_and_windows(self):
        from tilegrid.geotiff import write_cog

        rng = np.random.default_rng(9)
        full = (rng.random((1024, 768)) * 255).astype(np.uint8)
        data = write_cog(full, extent=Extent(0, 0, 76.8, 102.4), tile_size=256, min_dim=256)
        a0, e0 = tiff_decode(data)
        np.testing.assert_array_equal(a0, full)
        a1, _ = tiff_decode(data, ifd=1)
        assert a1.shape == (512, 384)
        from tilegrid.tiles import block_reduce

        want1 = np.round(block_reduce(full, 2, "average")).astype(np.uint8)
        np.testing.assert_array_equal(a1, want1)
        with pytest.raises(ValueError, match="no IFD"):
            tiff_decode(data, ifd=2)  # 256x192 < min_dim stops the chain
        w, _ = tiff_decode_window(data, 100, 200, 64, 64, ifd=1)
        np.testing.assert_array_equal(w, want1[200:264, 100:164])
