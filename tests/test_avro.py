"""Tests: from-scratch Avro codec (tilegrid/avro.py) + the Avro layer store.

Three tiers:
 1. golden bytes hand-derived from the published Avro binary-encoding spec;
 2. Python round-trips over every GeoTrellis tile record variant;
 3. cross-validation against the JVM org.apache.avro implementation (the
    avro jar ships inside pyspark) driven over py4j — Python-encoded bytes
    must decode in Java and vice versa, including container files.
"""

import json

import numpy as np
import pandas as pd
import pytest

from tilegrid import avro, codec, fixtures
from tilegrid.celltype import FLOAT64, CellType
from tilegrid.grid import Extent, GridBounds, LayoutDefinition, TileLayout
from tilegrid.meta import AttributeStore, LayerMeta
from tilegrid.sources import avro_store

WORLD = Extent(0.0, 0.0, 128.0, 128.0)
LAYOUT = LayoutDefinition(WORLD, TileLayout(8, 8, 16, 16))


class TestGoldenBytes:
    """Hand-derived expectations straight from the Avro spec."""

    def test_zigzag_varint(self):
        out = bytearray()
        avro.write_long(out, 0)
        avro.write_long(out, -1)
        avro.write_long(out, 1)
        avro.write_long(out, -2)
        avro.write_long(out, 2)
        avro.write_long(out, 64)  # zigzag 128 -> two-byte varint
        assert bytes(out) == b"\x00\x01\x02\x03\x04\x80\x01"

    def test_spatial_key_record(self):
        rec = avro.Record("geotrellis.spark.SpatialKey")
        rec["col"], rec["row"] = 2, 3
        out = bytearray()
        avro.encode_datum(avro.SPATIAL_KEY_SCHEMA, rec, out)
        assert bytes(out) == b"\x04\x06"

    def test_string_and_bytes(self):
        out = bytearray()
        avro.encode_datum("string", "abc", out)
        assert bytes(out) == b"\x06abc"

    def test_union_branches(self):
        sch = ["int", "null"]
        out = bytearray()
        avro.encode_datum(sch, 5, out)   # branch 0, zigzag(5)=10
        avro.encode_datum(sch, None, out)  # branch 1
        assert bytes(out) == b"\x00\x0a\x02"

    def test_array_block_framing(self):
        out = bytearray()
        avro.encode_datum({"type": "array", "items": "int"}, [1, 2], out)
        assert bytes(out) == b"\x04\x02\x04\x00"

    def test_float_double_little_endian(self):
        out = bytearray()
        avro.encode_datum("float", 1.0, out)
        avro.encode_datum("double", -2.0, out)
        assert bytes(out) == b"\x00\x00\x80\x3f" + b"\x00\x00\x00\x00\x00\x00\x00\xc0"

    def test_negative_count_array_decode(self):
        # spec: writers MAY emit a negative count followed by the block's
        # byte size; items follow
        data = b"\x03\x04\x02\x04\x00"  # count=-2, size=2, items 1,2, end
        r = avro.Reader(data)
        got = avro.decode_datum({"type": "array", "items": "int"}, r)
        assert got == [1, 2]


DTYPE_CASES = [
    ("bool", None),
    ("int8", -128), ("int8", None), ("int8", 7),
    ("uint8", 0), ("uint8", None), ("uint8", 9),
    ("int16", -32768), ("int16", None), ("int16", -5),
    ("uint16", 0), ("uint16", None), ("uint16", 11),
    ("int32", -2147483648), ("int32", None), ("int32", 42),
    ("float32", float("nan")), ("float32", None), ("float32", -99.5),
    ("float64", float("nan")), ("float64", None), ("float64", 3.25),
]


class TestTileRecords:
    @pytest.mark.parametrize("dt,nd", DTYPE_CASES)
    def test_tile_roundtrip(self, dt, nd):
        rng = np.random.default_rng(7)
        if dt == "bool":
            arr = rng.integers(0, 2, (5, 9)).astype(bool)
        elif dt.startswith("float"):
            arr = rng.normal(size=(5, 9)).astype(dt)
        else:
            info = np.iinfo(dt)
            arr = rng.integers(info.min, info.max, (5, 9), dtype=dt)
        ct = CellType(dt, nd)
        rec = avro.tile_to_record(arr, ct)
        sch = avro.tile_schema(dt)
        out = bytearray()
        avro.encode_datum(sch, rec, out)
        back = avro.decode_datum(sch, avro.Reader(bytes(out)))
        arr2, ct2 = avro.record_to_tile(back)
        np.testing.assert_array_equal(arr, arr2)
        assert ct2.dtype == dt
        if nd is None:
            assert ct2.nodata is None
        elif isinstance(nd, float) and np.isnan(nd):
            assert np.isnan(ct2.nodata)
        else:
            assert ct2.nodata == nd

    def test_key_value_record_blob(self):
        # AvroEncoder.toBinary parity path: zlib blob of one KeyValueRecord
        ct = CellType("float64", float("nan"))
        tiles = [((c, r), np.full((4, 4), c * 10.0 + r)) for c in range(3)
                 for r in range(2)]
        blob = avro.encode_tile_pairs(tiles, ct)
        sch = avro.pairs_schema(ct)
        back = avro.decode_tile_pairs(blob, sch)
        assert [k for k, _, _ in back] == [k for k, _ in tiles]
        for (k, a, ct2), (_, want) in zip(back, tiles):
            np.testing.assert_array_equal(a, want)
            assert np.isnan(ct2.nodata)

    def test_spacetime_pairs(self):
        ct = CellType("int32", -2147483648)
        tiles = [((1, 2, 1700000000000), np.arange(16, dtype=np.int32).reshape(4, 4))]
        blob = avro.encode_tile_pairs(tiles, ct, spacetime=True)
        back = avro.decode_tile_pairs(blob, avro.pairs_schema(ct, spacetime=True))
        assert back[0][0] == (1, 2, 1700000000000)

    def test_multiband_pairs(self):
        ct = CellType("float32", float("nan"))
        stack = np.stack([np.full((4, 4), b, dtype=np.float32) for b in range(3)])
        blob = avro.encode_tile_pairs([((0, 0), stack)], ct, bands=3)
        back = avro.decode_tile_pairs(blob, avro.pairs_schema(ct, bands=3))
        np.testing.assert_array_equal(back[0][1], stack)


class TestContainer:
    @pytest.mark.parametrize("cdc", ["null", "deflate"])
    def test_container_roundtrip(self, cdc):
        recs = []
        for i in range(10):
            r = avro.Record("geotrellis.spark.SpatialKey")
            r["col"], r["row"] = i, i * 2
            recs.append(r)
        data = avro.write_container(avro.SPATIAL_KEY_SCHEMA, recs, codec=cdc,
                                    records_per_block=3)
        sch, back = avro.read_container(data)
        assert sch["name"] == "SpatialKey"
        assert [(r["col"], r["row"]) for r in back] == [(i, 2 * i) for i in range(10)]

    def test_block_iteration_skips(self):
        recs = []
        for i in range(9):
            r = avro.Record("geotrellis.spark.SpatialKey")
            r["col"], r["row"] = i, 0
            recs.append(r)
        data = avro.write_container(avro.SPATIAL_KEY_SCHEMA, recs,
                                    records_per_block=3)
        blocks = list(avro.iter_container_blocks(data))
        assert [n for _, n, _ in blocks] == [3, 3, 3]
        # decode only the middle block
        mid = blocks[1][2]()
        assert [r["col"] for r in mid] == [3, 4, 5]

    def test_deterministic_output(self):
        r = avro.Record("geotrellis.spark.SpatialKey")
        r["col"], r["row"] = 1, 2
        a = avro.write_container(avro.SPATIAL_KEY_SCHEMA, [r])
        b = avro.write_container(avro.SPATIAL_KEY_SCHEMA, [r])
        assert a == b


class TestJvmParity:
    """Cross-validate against org.apache.avro via py4j (independent oracle)."""

    def _jvm(self, spark):
        return spark._jvm

    def _parse(self, spark, schema):
        return self._jvm(spark).org.apache.avro.Schema.Parser().parse(
            json.dumps(schema))

    def _jvm_decode(self, spark, schema, data: bytes):
        jvm = self._jvm(spark)
        jschema = self._parse(spark, schema)
        reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
        dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(data, None)
        return reader.read(None, dec)

    def test_python_encode_jvm_decode_key(self, spark):
        rec = avro.Record("geotrellis.spark.SpatialKey")
        rec["col"], rec["row"] = 1234, -77
        out = bytearray()
        avro.encode_datum(avro.SPATIAL_KEY_SCHEMA, rec, out)
        jrec = self._jvm_decode(spark, avro.SPATIAL_KEY_SCHEMA, bytes(out))
        assert jrec.get("col") == 1234 and jrec.get("row") == -77

    def test_python_encode_jvm_decode_tile(self, spark):
        arr = np.arange(12, dtype=np.float64).reshape(3, 4)
        rec = avro.tile_to_record(arr, CellType("float64", float("nan")))
        sch = avro.tile_schema("float64")
        out = bytearray()
        avro.encode_datum(sch, rec, out)
        jrec = self._jvm_decode(spark, sch, bytes(out))
        assert jrec.get("cols") == 4 and jrec.get("rows") == 3
        cells = jrec.get("cells")
        got = [cells.get(i) for i in range(cells.size())]
        assert got == list(map(float, range(12)))
        assert jrec.get("noDataValue") is True  # constant-NaN branch

    def test_jvm_encode_python_decode(self, spark):
        jvm = self._jvm(spark)
        jschema = self._parse(spark, avro.SPACETIME_KEY_SCHEMA)
        grec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        grec.put("col", 9)
        grec.put("row", 8)
        grec.put("instant", 1700000000123)
        writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
        baos = jvm.java.io.ByteArrayOutputStream()
        enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
        writer.write(grec, enc)
        enc.flush()
        back = avro.decode_datum(
            avro.SPACETIME_KEY_SCHEMA, avro.Reader(bytes(baos.toByteArray())))
        assert (back["col"], back["row"], back["instant"]) == (9, 8, 1700000000123)

    def test_jvm_reads_python_container(self, spark):
        jvm = self._jvm(spark)
        ct = CellType("int32", -2147483648)
        recs = [avro.tile_pairs_record(
            [((c, 0), np.full((2, 2), c, dtype=np.int32))], ct)
            for c in range(5)]
        data = avro.write_container(avro.pairs_schema(ct), recs,
                                    records_per_block=1)
        sin = jvm.org.apache.avro.file.SeekableByteArrayInput(data)
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        fr = jvm.org.apache.avro.file.DataFileReader(sin, reader)
        seen = []
        while fr.hasNext():
            rec = fr.next()
            pairs = rec.get("pairs")
            for i in range(pairs.size()):
                t = pairs.get(i)
                k, v = t.get("_1"), t.get("_2")
                cells = v.get("cells")
                seen.append((k.get("col"), cells.get(0)))
        fr.close()
        assert seen == [(c, c) for c in range(5)]


class TestAvroLayerStore:
    def _meta(self, zoom=8):
        return LayerMeta(cell_type=FLOAT64, layout=LAYOUT, extent=WORLD,
                         crs="webmercator",
                         bounds=GridBounds(*fixtures.TEST_BOUNDS), zoom=zoom)

    def test_roundtrip(self, spark, tmp_path):
        root = str(tmp_path / "avro-layers")
        df = spark.createDataFrame(fixtures.tile_layer_table("mod-10000"))
        n = avro_store.write_layer_avro(df, root, "m10k", 8, self._meta())
        assert n == df.count()
        back = avro_store.read_layer_avro(spark, root, "m10k", 8)
        a = {(r["col"], r["row"]): codec.decode_tile(bytes(r["tile"]), r["fmt"])
             for r in df.collect()}
        b = {(r["col"], r["row"]): codec.decode_tile(bytes(r["tile"]), r["fmt"])
             for r in back.collect()}
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_filtered_read_prunes_blocks(self, spark, tmp_path):
        root = str(tmp_path / "avro-layers")
        df = spark.createDataFrame(fixtures.tile_layer_table("increasing"))
        avro_store.write_layer_avro(df, root, "inc", 8, self._meta(),
                                    block_pairs=4)
        from tilegrid.cell import z2_encode, zranges
        # a 2x2 key window
        lo_c, lo_r = fixtures.TEST_BOUNDS[0], fixtures.TEST_BOUNDS[1]
        ranges = zranges(lo_c, lo_r, lo_c + 1, lo_r + 1)
        got = avro_store.read_layer_avro(spark, root, "inc", 8,
                                         cell_ranges=ranges)
        keys = {(r["col"], r["row"]) for r in got.collect()}
        assert keys == {(lo_c, lo_r), (lo_c + 1, lo_r), (lo_c, lo_r + 1),
                        (lo_c + 1, lo_r + 1)}

    def test_multiband_layer_roundtrip(self, spark, tmp_path):
        root = str(tmp_path / "avro-layers")
        rng = np.random.default_rng(3)
        from tilegrid.cell import z2_encode
        rows = []
        for c in range(2):
            for r in range(2):
                arr = rng.normal(size=(8, 8, 3))
                rows.append({
                    "zoom": np.int32(8), "col": np.int32(c), "row": np.int32(r),
                    "cell": np.int64(z2_encode(c, r)),
                    "tile": codec.raw_encode(arr),
                    "h": np.int32(8), "w": np.int32(8), "fmt": "raw",
                })
        df = spark.createDataFrame(pd.DataFrame(rows))
        avro_store.write_layer_avro(df, root, "mb", 8, self._meta())
        back = avro_store.read_layer_avro(spark, root, "mb", 8)
        b = {(r["col"], r["row"]): codec.decode_tile(bytes(r["tile"]), r["fmt"])
             for r in back.collect()}
        for row in rows:
            want = codec.raw_decode(row["tile"])
            np.testing.assert_array_equal(b[(row["col"], row["row"])], want)


class TestAvroValueReader:
    def test_single_tile_random_access(self, spark, tmp_path):
        root = str(tmp_path / "avro-layers")
        df = spark.createDataFrame(fixtures.tile_layer_table("increasing"))
        meta = LayerMeta(cell_type=FLOAT64, layout=LAYOUT, extent=WORLD,
                         crs="webmercator",
                         bounds=GridBounds(*fixtures.TEST_BOUNDS), zoom=8)
        avro_store.write_layer_avro(df, root, "inc", 8, meta, block_pairs=4)
        read = avro_store.value_reader_avro(root, "inc", 8)
        want = {(r["col"], r["row"]): codec.decode_tile(bytes(r["tile"]), r["fmt"])
                for r in df.collect()}
        # every key resolves to the exact tile
        for (c, r), arr in want.items():
            got = read(c, r)
            assert got is not None
            np.testing.assert_array_equal(got[0], arr)
        # keys outside the layer return None
        assert read(0, 0) is None
        assert read(99, 99) is None


class TestSpaceTimeAvroStore:
    def test_spacetime_roundtrip_with_z3_cells(self, spark, tmp_path):
        from tilegrid.cell import z3_encode

        root = str(tmp_path / "avro-st")
        day_ms = 86_400_000
        rng = np.random.default_rng(4)
        rows = []
        for c in range(3):
            for r in range(2):
                for day in (0, 1, 5):
                    ts = 1_700_000_000_000 + day * day_ms
                    arr = rng.normal(size=(4, 4))
                    rows.append({
                        "zoom": np.int32(8), "col": np.int32(c),
                        "row": np.int32(r),
                        "cell": np.int64(z3_encode(c, r, ts // day_ms)),
                        "tile": codec.raw_encode(arr), "h": np.int32(4),
                        "w": np.int32(4), "fmt": "raw", "ts": np.int64(ts),
                    })
        df = spark.createDataFrame(pd.DataFrame(rows))
        meta = LayerMeta(cell_type=FLOAT64, layout=LAYOUT, extent=WORLD,
                         crs="webmercator",
                         bounds=GridBounds(*fixtures.TEST_BOUNDS), zoom=8)
        n = avro_store.write_layer_avro(df, root, "st", 8, meta,
                                        block_pairs=4, ts_col="ts")
        assert n == len(rows)
        back = avro_store.read_layer_avro(
            spark, root, "st", 8,
            cell_of=lambda c, r, ts: z3_encode(c, r, ts // day_ms))
        a = {(r["col"], r["row"], r["ts"]): (r["cell"],
             codec.decode_tile(bytes(r["tile"]), r["fmt"]))
             for r in df.collect()}
        b = {(r["col"], r["row"], r["ts"]): (r["cell"],
             codec.decode_tile(bytes(r["tile"]), r["fmt"]))
             for r in back.collect()}
        assert a.keys() == b.keys()
        for k in a:
            assert a[k][0] == b[k][0]  # z3 cell recomputed identically
            np.testing.assert_array_equal(a[k][1], b[k][1])
