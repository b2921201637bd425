"""Config-driven ETL (reference spark-etl: Etl.scala:54-76 lifecycle,
config/Input.scala + config/Output.scala descriptors, EtlConf CLI shape).
The declarative path must produce byte-identical layers to the imperative
library calls it composes."""

import json
import os

import numpy as np
import pytest

from tilegrid import codec, fixtures
from tilegrid.cell import hilbert_encode, z2_encode
from tilegrid.etl import EtlConf, EtlConfigError, run_etl
from tilegrid.geotiff import tiff_encode
from tilegrid.grid import Extent, LATLNG_WORLD, LayoutDefinition, TileLayout
from tilegrid.operators.tiler import tile_to_layout, with_extent_from_center
from tilegrid.sources.layer_io import read_layer


def _out(tmp, **kw):
    d = {"backend": {"type": "file", "path": os.path.join(tmp, "layers")},
         "maxZoom": 3, "minZoom": 2}
    d.update(kw)
    return d


def _inp(tmp, name="images", fmt="parquet", **kw):
    d = {"name": name, "format": fmt,
         "backend": {"type": "file", "path": os.path.join(tmp, "corpus")}}
    d.update(kw)
    return d


class TestConfParse:
    def test_bad_backend_type(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="backend.type"):
            EtlConf.from_dicts(
                [{"name": "x", "format": "parquet",
                  "backend": {"type": "accumulo", "path": "t"}}], _out(tmp))

    def test_bad_format(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="format"):
            EtlConf.from_dicts([_inp(tmp, fmt="shapefile")], _out(tmp))

    def test_missing_max_zoom(self, tmp_path):
        tmp = str(tmp_path)
        out = _out(tmp)
        del out["maxZoom"]
        with pytest.raises(EtlConfigError, match="maxZoom"):
            EtlConf.from_dicts([_inp(tmp)], out)

    def test_duplicate_names(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="duplicate"):
            EtlConf.from_dicts([_inp(tmp), _inp(tmp)], _out(tmp))

    def test_bad_key_index(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="keyIndexMethod"):
            EtlConf.from_dicts(
                [_inp(tmp)], _out(tmp, keyIndexMethod={"type": "geohash"}))

    def test_custom_crs_needs_extent(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="layoutExtent"):
            EtlConf.from_dicts([_inp(tmp)], _out(tmp, crs="epsg:32632"))

    def test_from_files(self, tmp_path):
        tmp = str(tmp_path)
        ip, op = tmp_path / "in.json", tmp_path / "out.json"
        ip.write_text(json.dumps([_inp(tmp)]))
        op.write_text(json.dumps(_out(tmp, keyIndexMethod={"type": "hilbert"},
                                      resampleMethod="max")))
        conf = EtlConf.from_files(str(ip), str(op))
        assert conf.inputs[0].name == "images"
        assert conf.output.key_index == "hilbert"
        assert conf.output.resample_method == "max"


@pytest.fixture()
def corpus(spark, tmp_path):
    path = os.path.join(str(tmp_path), "corpus")
    spark.createDataFrame(fixtures.images_table(12)).write.parquet(path)
    return str(tmp_path)


class TestParquetIngest:
    def test_lifecycle_matches_library_calls(self, spark, corpus):
        tmp = corpus
        conf = EtlConf.from_dicts([_inp(tmp)], _out(tmp))
        metrics = run_etl(spark, conf)
        levels = metrics["inputs"]["images"]
        assert set(levels) == {3, 2}
        root = os.path.join(tmp, "layers")

        # declarative == imperative at the base level, bit-identical
        lo = LayoutDefinition(LATLNG_WORLD, TileLayout(8, 8, 256, 256))
        imgs = spark.read.parquet(os.path.join(tmp, "corpus")) \
            .withColumnRenamed("bytes", "tile")
        direct = tile_to_layout(
            with_extent_from_center(imgs, lo, "lon", "lat"), lo, 3).toPandas()
        stored = read_layer(spark, root, "images", 3).toPandas()
        assert levels[3]["tiles"] == len(direct) == len(stored)
        key = ["zoom", "col", "row"]
        d = direct.sort_values(key).reset_index(drop=True)
        s = stored.sort_values(key).reset_index(drop=True)
        for a, b in zip(d.itertuples(), s.itertuples()):
            np.testing.assert_array_equal(
                codec.decode_tile(bytes(a.tile), a.fmt),
                codec.decode_tile(bytes(b.tile), b.fmt))

        # pyramid level exists and is a quarter the key volume or less
        up = read_layer(spark, root, "images", 2).toPandas()
        assert 0 < len(up) <= len(stored)

    def test_resume_skips_done_levels(self, spark, corpus):
        tmp = corpus
        conf = EtlConf.from_dicts([_inp(tmp)], _out(tmp, resume=True))
        run_etl(spark, conf)
        again = run_etl(spark, conf)
        assert all(lvl == {"skipped": True}
                   for lvl in again["inputs"]["images"].values())

    def test_clip_drops_outside_sources(self, spark, corpus):
        tmp = corpus
        imgs = fixtures.images_table(12)
        lon0, lat0 = imgs["lon"][0], imgs["lat"][0]
        clip = [lon0 - 1.0, lat0 - 1.0, lon0 + 1.0, lat0 + 1.0]
        conf = EtlConf.from_dicts(
            [_inp(tmp, name="clipped", clip=clip)], _out(tmp, pyramid=False))
        run_etl(spark, conf)
        full = EtlConf.from_dicts([_inp(tmp)], _out(tmp, pyramid=False))
        run_etl(spark, full)
        root = os.path.join(tmp, "layers")
        n_clip = read_layer(spark, root, "clipped", 3).count()
        n_full = read_layer(spark, root, "images", 3).count()
        assert 0 < n_clip < n_full

    def test_hilbert_key_index(self, spark, corpus):
        tmp = corpus
        conf = EtlConf.from_dicts(
            [_inp(tmp)],
            _out(tmp, keyIndexMethod={"type": "hilbert"}, pyramid=False))
        run_etl(spark, conf)
        pdf = read_layer(
            spark, os.path.join(tmp, "layers"), "images", 3).toPandas()
        want = hilbert_encode(pdf["col"].to_numpy(np.int64),
                              pdf["row"].to_numpy(np.int64), 3)
        np.testing.assert_array_equal(pdf["cell"].to_numpy(np.int64), want)

    def test_multi_input_one_config(self, spark, corpus):
        tmp = corpus
        conf = EtlConf.from_dicts(
            [_inp(tmp, name="a"), _inp(tmp, name="b", cache=True)],
            _out(tmp, pyramid=False))
        m = run_etl(spark, conf)
        assert set(m["inputs"]) == {"a", "b"}
        root = os.path.join(tmp, "layers")
        assert (read_layer(spark, root, "a", 3).count()
                == read_layer(spark, root, "b", 3).count() > 0)


class TestGeoTiffIngest:
    def test_directory_scan_georeferenced(self, spark, tmp_path):
        tmp = str(tmp_path)
        tifs = os.path.join(tmp, "tifs")
        os.makedirs(tifs)
        # two 64x64 float rasters on known extents; -9999 sentinel NoData
        lo = LayoutDefinition(LATLNG_WORLD, TileLayout(8, 8, 256, 256))
        cw, ch = lo.cell_width, lo.cell_height
        exts = [Extent(0.0, 0.0, 64 * cw, 64 * ch),
                Extent(90.0, -40.0, 90.0 + 64 * cw, -40.0 + 64 * ch)]
        arrs = []
        for i, ext in enumerate(exts):
            gy, gx = np.mgrid[0:64, 0:64]
            a = (gx + gy * 64.0 + i * 10000.0).astype(np.float64)
            a[0, :4] = -9999.0
            arrs.append(a)
            with open(os.path.join(tifs, f"s{i}.tif"), "wb") as f:
                f.write(tiff_encode(a, extent=ext))
        conf = EtlConf.from_dicts(
            [{"name": "dem", "format": "geotiff",
              "backend": {"type": "file", "path": tifs},
              "noData": -9999.0}],
            _out(tmp, pyramid=False))
        m = run_etl(spark, conf)
        assert m["inputs"]["dem"][3]["tiles"] > 0
        pdf = read_layer(
            spark, os.path.join(tmp, "layers"), "dem", 3).toPandas()
        # every source pixel lands: recoverable sum == sum of finite input
        total = 0.0
        for t, f in zip(pdf["tile"], pdf["fmt"]):
            arr = codec.decode_tile(bytes(t), f)
            total += np.nansum(arr)
        want = sum(a[a != -9999.0].sum() for a in arrs)
        assert total == pytest.approx(want)
        # sentinel became NaN NoData, not a burned value
        assert not any(
            (codec.decode_tile(bytes(t), f) == -9999.0).any()
            for t, f in zip(pdf["tile"], pdf["fmt"]))

    def test_unreferenced_tiff_raises(self, spark, tmp_path):
        tmp = str(tmp_path)
        tifs = os.path.join(tmp, "tifs")
        os.makedirs(tifs)
        with open(os.path.join(tifs, "bare.tif"), "wb") as f:
            f.write(tiff_encode(np.zeros((8, 8))))  # no geo tags
        conf = EtlConf.from_dicts(
            [{"name": "dem", "format": "geotiff",
              "backend": {"type": "file", "path": tifs}}],
            _out(tmp, pyramid=False))
        with pytest.raises(Exception, match="georeference"):
            run_etl(spark, conf)


class TestRenderOutput:
    """SpatialRenderOutput parity: backend 'render' writes z/x/y trees."""

    def _conf(self, tmp, **out_kw):
        out = _out(tmp, pyramid=False, **out_kw)
        out["backend"] = {"type": "render", "path": os.path.join(tmp, "tiles")}
        return EtlConf.from_dicts([_inp(tmp)], out)

    def test_png_tree(self, spark, corpus):
        tmp = corpus
        run_etl(spark, self._conf(tmp, breaks="10:ff0000ff;1000:00ff00ff"))
        base = os.path.join(tmp, "tiles", "images", "3")
        cols = os.listdir(base)
        assert cols
        p = os.path.join(base, cols[0])
        tile = os.path.join(p, os.listdir(p)[0])
        assert tile.endswith(".png")
        arr = codec.decode_tile(open(tile, "rb").read(), "png")
        assert arr.shape == (256, 256, 4)  # RGBA via the colormap
        rgb = {tuple(v) for v in arr[arr[:, :, 3] == 255][:, :3]}
        assert rgb <= {(255, 0, 0), (0, 255, 0)}

    def test_geotiff_tree_georeferenced(self, spark, corpus):
        from tilegrid.geotiff import tiff_decode

        tmp = corpus
        run_etl(spark, self._conf(tmp, encoding="geotiff"))
        lo = LayoutDefinition(LATLNG_WORLD, TileLayout(8, 8, 256, 256))
        base = os.path.join(tmp, "tiles", "images", "3")
        checked = 0
        for col in os.listdir(base):
            for f in os.listdir(os.path.join(base, col)):
                row = int(f.split(".")[0])
                arr, ext = tiff_decode(
                    open(os.path.join(base, col, f), "rb").read())
                assert arr.shape == (256, 256)
                cw = lo.extent.width / 8
                ch = lo.extent.height / 8
                assert ext.xmin == pytest.approx(lo.extent.xmin + int(col) * cw)
                assert ext.ymax == pytest.approx(lo.extent.ymax - row * ch)
                checked += 1
        assert checked > 0

    def test_bad_breaks_blob(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="expected"):
            self._conf(tmp, breaks="nonsense")

    def test_render_input_backend_rejected(self, tmp_path):
        tmp = str(tmp_path)
        with pytest.raises(EtlConfigError, match="backend.type"):
            EtlConf.from_dicts(
                [{"name": "x", "format": "parquet",
                  "backend": {"type": "render", "path": "t"}}], _out(tmp))


class TestMultibandGeoTiffIngest:
    def test_rgb_tiff_keeps_bands(self, spark, tmp_path):
        """MultibandGeoTiffHadoopInput parity: a 3-band GeoTiff ingested
        with output.multiband=true lands as (h, w, 3) tiles."""
        tmp = str(tmp_path)
        tifs = os.path.join(tmp, "tifs")
        os.makedirs(tifs)
        lo = LayoutDefinition(LATLNG_WORLD, TileLayout(8, 8, 256, 256))
        cw, ch = lo.cell_width, lo.cell_height
        gy, gx = np.mgrid[0:64, 0:64]
        rgb = np.stack([gx * 1.0, gy * 1.0, (gx + gy) % 7.0],
                       axis=-1).astype(np.uint8)
        ext = Extent(10.0, 10.0, 10.0 + 64 * cw, 10.0 + 64 * ch)
        with open(os.path.join(tifs, "rgb.tif"), "wb") as f:
            f.write(tiff_encode(rgb, extent=ext))
        conf = EtlConf.from_dicts(
            [{"name": "rgb", "format": "geotiff",
              "backend": {"type": "file", "path": tifs}}],
            _out(tmp, pyramid=False, multiband=True))
        run_etl(spark, conf)
        pdf = read_layer(
            spark, os.path.join(tmp, "layers"), "rgb", 3).toPandas()
        assert len(pdf) > 0
        bands = {codec.decode_tile(bytes(t), f).shape[2]
                 for t, f in zip(pdf["tile"], pdf["fmt"])}
        assert bands == {3}
        # pixel content survives: per-band sums equal the source's
        total = sum(
            np.nansum(codec.decode_tile(bytes(t), f), axis=(0, 1))
            for t, f in zip(pdf["tile"], pdf["fmt"]))
        np.testing.assert_allclose(total, rgb.astype(np.float64).sum(axis=(0, 1)))


class TestGeoTiffReprojectIngest:
    def test_latlng_tiff_into_webmercator_layout(self, spark, tmp_path):
        """Ingest.scala reproject-before-tile: a latlng GeoTiff ingested
        into a webmercator output lands on the right webmercator keys
        with its values intact (constant raster -> constant tiles)."""
        from tilegrid.grid import WEBMERCATOR_WORLD, lnglat_to_webmercator

        tmp = str(tmp_path)
        tifs = os.path.join(tmp, "tifs")
        os.makedirs(tifs)
        ext = Extent(-20.0, 10.0, 30.0, 45.0)
        arr = np.full((64, 64), 7.0)
        with open(os.path.join(tifs, "c.tif"), "wb") as f:
            f.write(tiff_encode(arr, extent=ext))
        conf = EtlConf.from_dicts(
            [{"name": "c", "format": "geotiff", "crs": "latlng",
              "backend": {"type": "file", "path": tifs}}],
            _out(tmp, pyramid=False, crs="webmercator"))
        run_etl(spark, conf)
        pdf = read_layer(spark, os.path.join(tmp, "layers"), "c", 3).toPandas()
        assert len(pdf) > 0
        # values survive the warp: every finite pixel is the constant
        vals = np.concatenate([
            codec.decode_tile(bytes(t), f).ravel()
            for t, f in zip(pdf["tile"], pdf["fmt"])])
        finite = vals[~np.isnan(vals)]
        assert len(finite) > 0 and (finite == 7.0).all()
        # keys match the webmercator footprint of the source extent
        wx0, wy0 = lnglat_to_webmercator(ext.xmin, ext.ymin)
        wx1, wy1 = lnglat_to_webmercator(ext.xmax, ext.ymax)
        tw = WEBMERCATOR_WORLD.width / 8
        got_cols = set(pdf["col"]);  got_rows = set(pdf["row"])
        want_cols = set(range(
            int((wx0 - WEBMERCATOR_WORLD.xmin) // tw),
            int((wx1 - WEBMERCATOR_WORLD.xmin) // tw) + 1))
        want_rows = set(range(
            int((WEBMERCATOR_WORLD.ymax - wy1) // tw),
            int((WEBMERCATOR_WORLD.ymax - wy0) // tw) + 1))
        assert got_cols == want_cols and got_rows == want_rows

    def test_warp_raster_roundtrip_extent(self):
        from tilegrid.etl import _warp_raster
        from tilegrid.grid import lnglat_to_webmercator

        gy, gx = np.mgrid[0:32, 0:32]
        arr = (gx + gy * 32).astype(np.float64)
        ext = Extent(0.0, 0.0, 45.0, 45.0)
        out, dext = _warp_raster(arr, ext, "latlng", "webmercator")
        assert out.shape == arr.shape
        wx0, wy0 = lnglat_to_webmercator(0.0, 0.0)
        wx1, wy1 = lnglat_to_webmercator(45.0, 45.0)
        assert dext.xmin == pytest.approx(wx0) and dext.xmax == pytest.approx(wx1)
        assert dext.ymin == pytest.approx(wy0) and dext.ymax == pytest.approx(wy1)
        fin = out[~np.isnan(out)]
        assert set(np.unique(fin)) <= set(np.unique(arr))
        # the gather is NN from inside the source: center pixel survives
        assert np.isfinite(out[16, 16])


class TestAvroBackend:
    def test_avro_output_matches_file_output(self, spark, corpus):
        tmp = corpus
        # file backend run (the ground truth store)
        run_etl(spark, EtlConf.from_dicts([_inp(tmp)], _out(tmp)))
        # avro backend run of the same config
        out = _out(tmp)
        out["backend"] = {"type": "avro", "path": os.path.join(tmp, "avro")}
        metrics = run_etl(spark, EtlConf.from_dicts([_inp(tmp)], out))
        assert set(metrics["inputs"]["images"]) == {3, 2}

        from tilegrid.sources.avro_store import read_layer_avro

        for z in (3, 2):
            a = read_layer(spark, os.path.join(tmp, "layers"),
                           "images", z).toPandas()
            b = read_layer_avro(spark, os.path.join(tmp, "avro"),
                                "images", z).toPandas()
            assert len(a) == len(b)
            key = ["zoom", "col", "row"]
            a = a.sort_values(key).reset_index(drop=True)
            b = b.sort_values(key).reset_index(drop=True)
            for ra, rb in zip(a.itertuples(), b.itertuples()):
                assert (ra.col, ra.row) == (rb.col, rb.row)
                np.testing.assert_array_equal(
                    codec.decode_tile(bytes(ra.tile), ra.fmt),
                    codec.decode_tile(bytes(rb.tile), rb.fmt))
