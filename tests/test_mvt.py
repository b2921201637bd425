"""MVT 2.1 codec round-trips (tilegrid/mvt.py) — command-integer geometry,
protobuf framing, property tables, and the z/x/y writer over
vectorize_merged_wkb output (ProtobufTileSpec.scala is the reference's
equivalent surface)."""

import os

import numpy as np
import pandas as pd
import pytest

from tilegrid import mvt
from tilegrid.grid import Extent, LayoutDefinition, TileLayout


def ring(*pts):
    return np.asarray(pts, np.int64)


class TestGeometryCommands:
    def test_polygon_roundtrip_with_hole(self):
        rings = [ring((0, 0), (100, 0), (100, 100), (0, 100)),
                 ring((20, 20), (40, 20), (40, 40), (20, 40))]
        cmds = mvt.encode_geometry("polygon", rings)
        back = mvt.decode_geometry(3, cmds)
        assert len(back) == 2
        for a, b in zip(rings, back):
            np.testing.assert_array_equal(a, b)

    def test_point_multi(self):
        rings = [ring((5, 7), (3, 2), (4096, 0))]
        back = mvt.decode_geometry(1, mvt.encode_geometry("point", rings))
        np.testing.assert_array_equal(back[0], rings[0])

    def test_linestring(self):
        rings = [ring((1, 1), (5, 9), (2, 2))]
        back = mvt.decode_geometry(2, mvt.encode_geometry("linestring", rings))
        np.testing.assert_array_equal(back[0], rings[0])

    def test_negative_deltas_zigzag(self):
        rings = [ring((4000, 4000), (10, 3990), (0, 0))]
        back = mvt.decode_geometry(2, mvt.encode_geometry("linestring", rings))
        np.testing.assert_array_equal(back[0], rings[0])


class TestTileCodec:
    def test_full_tile_roundtrip(self):
        feats = [
            {
                "id": 7, "type": "polygon",
                "rings": [ring((0, 0), (10, 0), (10, 10), (0, 10))],
                "properties": {"name": "a", "score": 1.5, "n": -3, "ok": True},
            },
            {
                "id": 8, "type": "point",
                "rings": [ring((100, 200))],
                "properties": {"name": "b"},
            },
        ]
        data = mvt.mvt_encode([("water", feats)], extent=4096)
        layers = mvt.mvt_decode(data)
        assert len(layers) == 1
        lay = layers[0]
        assert lay["name"] == "water" and lay["extent"] == 4096
        assert lay["version"] == 2
        f0, f1 = lay["features"]
        assert f0["id"] == 7 and f0["type"] == "polygon"
        assert f0["properties"] == {"name": "a", "score": 1.5, "n": -3, "ok": True}
        np.testing.assert_array_equal(f0["rings"][0], feats[0]["rings"][0])
        assert f1["properties"] == {"name": "b"}
        np.testing.assert_array_equal(f1["rings"][0], feats[1]["rings"][0])

    def test_key_value_dedup(self):
        feats = [
            {"id": i, "type": "point", "rings": [ring((i, i))],
             "properties": {"kind": "x", "idx": 1}}
            for i in range(20)
        ]
        data = mvt.mvt_encode([("pts", feats)])
        # shared key/value tables: 20 features but only 2 keys + 2 values
        lay = mvt.mvt_decode(data)[0]
        assert all(f["properties"] == {"kind": "x", "idx": 1}
                   for f in lay["features"])


TS = 16
LAYOUT = LayoutDefinition(
    Extent(0.0, 0.0, 64.0, 64.0), TileLayout(4, 4, TS, TS)
)


class TestVectorizePipeline:
    def test_roundtrip_on_vectorize_merged_wkb(self, spark):
        import tilegrid.codec as codec
        from tilegrid.cell import z2_encode
        from tilegrid.geometry import points_in_polygon, wkb_decode
        from tilegrid.operators.vectorize import vectorize_merged_wkb

        # two-tile-wide rectangular region -> one merged polygon
        rows = []
        for c in (1, 2):  # only the two tiles holding the region: keeps the
            r = 1         # label-propagation rounds (and the test) fast
            arr = np.zeros((TS, TS))
            arr[4:12, :] = 5.0
            rows.append({
                "zoom": np.int32(6), "col": np.int32(c), "row": np.int32(r),
                "cell": np.int64(z2_encode(c, r)),
                "tile": codec.raw_encode(arr), "h": np.int32(TS),
                "w": np.int32(TS), "fmt": "raw",
            })
        layer = spark.createDataFrame(pd.DataFrame(rows))
        polys = vectorize_merged_wkb(layer, LAYOUT).toPandas()
        polys = polys[polys.value == 5.0]  # drop the 0-background region
        assert len(polys) == 1
        rings = wkb_decode(bytes(polys.iloc[0]["wkb"]))
        text = Extent(0.0, 0.0, 64.0, 64.0)
        tile_rings = mvt.rings_to_tile_coords(rings, text, extent=4096)
        cmds = mvt.encode_geometry("polygon", tile_rings)
        back = mvt.decode_geometry(3, cmds)
        assert len(back) == len(tile_rings)
        for a, b in zip(tile_rings, back):
            np.testing.assert_array_equal(a, b)

    def test_write_mvt_slippy_tree(self, spark, tmp_path):
        import tilegrid.codec as codec
        from tilegrid.cell import z2_encode
        from tilegrid.operators.vectorize import vectorize_merged_wkb

        rows = []
        for c in (1, 2):  # only the two tiles holding the region: keeps the
            r = 1         # label-propagation rounds (and the test) fast
            arr = np.zeros((TS, TS))
            arr[4:12, :] = 5.0
            rows.append({
                "zoom": np.int32(6), "col": np.int32(c), "row": np.int32(r),
                "cell": np.int64(z2_encode(c, r)),
                "tile": codec.raw_encode(arr), "h": np.int32(TS),
                "w": np.int32(TS), "fmt": "raw",
            })
        layer = spark.createDataFrame(pd.DataFrame(rows))
        polys = vectorize_merged_wkb(layer, LAYOUT).where("value = 5.0")
        out = str(tmp_path / "mvt")
        n = mvt.write_mvt_slippy(polys, LAYOUT, 6, out, layer_name="regions")
        assert n >= 2  # region spans tiles (1,1) and (2,1)
        p = os.path.join(out, "6", "1", "1.mvt")
        assert os.path.exists(p)
        with open(p, "rb") as f:
            lay = mvt.mvt_decode(f.read())[0]
        assert lay["name"] == "regions"
        assert len(lay["features"]) == 1
        for r_ in lay["features"][0]["rings"]:
            assert (r_ >= 0).all() and (r_ <= 4096).all()
