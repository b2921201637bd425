"""Mapbox Vector Tile (MVT 2.1) codec + z/x/y writer, from scratch.

Reference: /root/reference/vectortile/ (ProtobufTile.scala / ProtobufLayer
.scala / internal/Command.scala — ScalaPB wrappers over the published
vector-tile-spec). This module implements the same wire format directly:
hand-rolled protobuf varint/zigzag framing, the Tile/Layer/Feature/Value
messages, and the MoveTo/LineTo/ClosePath command-integer geometry stream
(Command.scala:36-118 semantics: commands are (id & 0x7) | (count << 3),
parameters are zigzag-encoded deltas from the pen position).

Feature shape used throughout:
    {"id": int, "type": "point"|"linestring"|"polygon",
     "rings": [np.ndarray (m, 2) int32 tile-local coords, ...],
     "properties": {str: str|float|int|bool}}
"""

from __future__ import annotations

import os

import numpy as np

GEOM_TYPE = {"point": 1, "linestring": 2, "polygon": 3}
GEOM_NAME = {v: k for k, v in GEOM_TYPE.items()}

_MOVE_TO, _LINE_TO, _CLOSE_PATH = 1, 2, 7


# ------------------------------------------------------------- protobuf io

def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _key(field, 2) + _varint(len(payload)) + payload


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _fields(data: bytes):
    """Yield (field, wire, value) — value is int for wire 0, bytes for 2."""
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            yield field, wire, data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, data[pos : pos + 4]
            pos += 4
        elif wire == 1:
            yield field, wire, data[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


# ---------------------------------------------------------------- geometry

def encode_geometry(geom_type: str, rings: list[np.ndarray]) -> list[int]:
    """Rings (tile-local ints) -> command-integer stream
    (Command.scala:36-118)."""
    cmds: list[int] = []
    px = py = 0
    for ring in rings:
        r = np.asarray(ring, dtype=np.int64)
        if geom_type == "point":
            cmds.append((_MOVE_TO & 0x7) | (len(r) << 3))
            for x, y in r:
                cmds += [_zigzag(int(x) - px), _zigzag(int(y) - py)]
                px, py = int(x), int(y)
            continue
        cmds.append((_MOVE_TO & 0x7) | (1 << 3))
        cmds += [_zigzag(int(r[0, 0]) - px), _zigzag(int(r[0, 1]) - py)]
        px, py = int(r[0, 0]), int(r[0, 1])
        rest = r[1:]
        cmds.append((_LINE_TO & 0x7) | (len(rest) << 3))
        for x, y in rest:
            cmds += [_zigzag(int(x) - px), _zigzag(int(y) - py)]
            px, py = int(x), int(y)
        if geom_type == "polygon":
            cmds.append((_CLOSE_PATH & 0x7) | (1 << 3))
    return cmds


def decode_geometry(geom_type_id: int, cmds: list[int]) -> list[np.ndarray]:
    rings: list[np.ndarray] = []
    cur: list[tuple[int, int]] = []
    px = py = 0
    i = 0
    while i < len(cmds):
        c = cmds[i]
        i += 1
        cid, count = c & 0x7, c >> 3
        if cid == _MOVE_TO:
            if geom_type_id != 1 and cur:
                rings.append(np.asarray(cur, np.int64))
                cur = []
            for _ in range(count):
                px += _unzigzag(cmds[i])
                py += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((px, py))
        elif cid == _LINE_TO:
            for _ in range(count):
                px += _unzigzag(cmds[i])
                py += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((px, py))
        elif cid == _CLOSE_PATH:
            rings.append(np.asarray(cur, np.int64))
            cur = []
        else:
            raise ValueError(f"unknown command {cid}")
    if cur:
        rings.append(np.asarray(cur, np.int64))
    return rings


# ------------------------------------------------------------------ values

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _key(7, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _ld(1, b)
    if isinstance(v, int):
        return _key(6, 0) + _varint(_zigzag(v))  # sint64
    if isinstance(v, float):
        import struct

        return _key(3, 1) + struct.pack("<d", v)
    raise ValueError(f"unsupported property type {type(v)}")


def _decode_value(data: bytes):
    import struct

    for field, wire, v in _fields(data):
        if field == 1:
            return v.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 2:
            return struct.unpack("<f", v)[0]
        if field in (4, 5):
            return int(v)
        if field == 6:
            return _unzigzag(int(v))
        if field == 7:
            return bool(v)
    return None


# ------------------------------------------------------------- tile codec

def encode_layer(
    name: str, features: list[dict], extent: int = 4096, version: int = 2
) -> bytes:
    keys: list[str] = []
    vals: list = []
    kidx: dict[str, int] = {}
    vidx: dict = {}
    body = bytearray()
    for f in features:
        tags: list[int] = []
        for k, v in f.get("properties", {}).items():
            if k not in kidx:
                kidx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in vidx:
                vidx[vk] = len(vals)
                vals.append(v)
            tags += [kidx[k], vidx[vk]]
        cmds = encode_geometry(f["type"], f["rings"])
        fbody = bytearray()
        if f.get("id") is not None:
            fbody += _key(1, 0) + _varint(int(f["id"]))
        if tags:
            packed = b"".join(_varint(t) for t in tags)
            fbody += _ld(2, packed)
        fbody += _key(3, 0) + _varint(GEOM_TYPE[f["type"]])
        fbody += _ld(4, b"".join(_varint(c) for c in cmds))
        body += _ld(2, bytes(fbody))
    out = bytearray()
    out += _key(15, 0) + _varint(version)
    out += _ld(1, name.encode("utf-8"))
    out += bytes(body)
    for k in keys:
        out += _ld(3, k.encode("utf-8"))
    for v in vals:
        out += _ld(4, _encode_value(v))
    out += _key(5, 0) + _varint(extent)
    return bytes(out)


def mvt_encode(layers: list[tuple[str, list[dict]]], extent: int = 4096) -> bytes:
    return b"".join(_ld(3, encode_layer(n, fs, extent)) for n, fs in layers)


def _packed_uints(data: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(data):
        v, pos = _read_varint(data, pos)
        out.append(v)
    return out


def mvt_decode(data: bytes) -> list[dict]:
    layers = []
    for field, wire, payload in _fields(data):
        if field != 3:
            continue
        name, version, extent = "", 2, 4096
        keys: list[str] = []
        vals: list = []
        raw_features: list[bytes] = []
        for lf, lw, lv in _fields(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 15:
                version = int(lv)
            elif lf == 5:
                extent = int(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                vals.append(_decode_value(lv))
            elif lf == 2:
                raw_features.append(lv)
        features = []
        for fb in raw_features:
            fid, gtype, tags, cmds = None, 0, [], []
            for ff, fw, fv in _fields(fb):
                if ff == 1:
                    fid = int(fv)
                elif ff == 2:
                    tags = _packed_uints(fv) if isinstance(fv, bytes) else [fv]
                elif ff == 3:
                    gtype = int(fv)
                elif ff == 4:
                    cmds = _packed_uints(fv) if isinstance(fv, bytes) else [fv]
            props = {
                keys[tags[i]]: vals[tags[i + 1]] for i in range(0, len(tags), 2)
            }
            features.append(
                {
                    "id": fid,
                    "type": GEOM_NAME.get(gtype, "unknown"),
                    "rings": decode_geometry(gtype, cmds),
                    "properties": props,
                }
            )
        layers.append(
            {"name": name, "version": version, "extent": extent,
             "features": features}
        )
    return layers


# -------------------------------------------------- map coords -> tile ints

def rings_to_tile_coords(
    rings: list[np.ndarray], tile_extent, extent: int = 4096
) -> list[np.ndarray]:
    """Map-coordinate rings -> integer tile-local MVT coords. MVT y grows
    DOWNWARD from the tile's top edge."""
    out = []
    for r in rings:
        r = np.asarray(r, np.float64)
        x = np.round((r[:, 0] - tile_extent.xmin) / tile_extent.width * extent)
        y = np.round((tile_extent.ymax - r[:, 1]) / tile_extent.height * extent)
        out.append(np.stack([x, y], axis=1).astype(np.int64))
    return out


def write_mvt_slippy(
    polys_df,
    layout,
    zoom: int,
    out_dir: str,
    layer_name: str = "layer",
    extent: int = 4096,
    id_col: str = "value",
    wkb_col: str = "wkb",
) -> int:
    """Write polygons (e.g. vectorize_merged_wkb output) as a z/x/y.mvt
    slippy tree: cover tiles per polygon, clip each polygon to its tile
    with the general boolean overlay (geometry.polygon_overlay), transform
    to tile-local ints, one Layer per tile, executor-side writes
    (the render.write_slippy shape with MVT payloads)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .cell import cover_polygon
    from .geometry import polygon_overlay, wkb_decode

    mt = layout.map_transform

    def emit(it):
        for pdf in it:
            rows = {"col": [], "row": [], "fid": [], "wkb": []}
            for t in pdf.itertuples(index=False):
                raw = bytes(getattr(t, wkb_col))
                for c in cover_polygon(layout, wkb_decode(raw)):
                    from .cell import z2_decode

                    cc, rr = z2_decode(int(c))
                    rows["col"].append(int(cc))
                    rows["row"].append(int(rr))
                    rows["fid"].append(int(getattr(t, id_col)))
                    rows["wkb"].append(raw)
            if rows["col"]:
                yield pd.DataFrame(rows)

    covered = polys_df.mapInPandas(
        emit, "col int, row int, fid long, wkb binary"
    )

    os.makedirs(out_dir, exist_ok=True)

    def write_part(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for (col, row), grp in pdf.groupby(["col", "row"]):
                text = mt.extent_for_key(int(col), int(row))
                clip = [np.array([
                    [text.xmin, text.ymin], [text.xmax, text.ymin],
                    [text.xmax, text.ymax], [text.xmin, text.ymax],
                ])]
                feats = []
                for t in grp.itertuples(index=False):
                    rings = polygon_overlay(
                        wkb_decode(bytes(t.wkb)), clip, "intersection"
                    )
                    if not rings:
                        continue
                    feats.append(
                        {
                            "id": int(t.fid), "type": "polygon",
                            "rings": rings_to_tile_coords(rings, text, extent),
                            "properties": {"value": int(t.fid)},
                        }
                    )
                if not feats:
                    continue
                data = mvt_encode([(layer_name, feats)], extent)
                d = os.path.join(out_dir, str(zoom), str(col))
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"{row}.mvt"), "wb") as f:
                    f.write(data)
            yield pd.DataFrame({"n": [len(pdf)]})

    covered.repartition("col", "row").mapInPandas(write_part, "n long").count()
    n = 0
    for z in os.listdir(out_dir):
        for x in os.listdir(os.path.join(out_dir, z)):
            n += len(os.listdir(os.path.join(out_dir, z, x)))
    return n


def write_mvt_lines_slippy(
    lines_df,
    layout,
    zoom: int,
    out_dir: str,
    layer_name: str = "lines",
    extent: int = 4096,
    id_col: str = "line_id",
    wkb_col: str = "wkb",
) -> int:
    """Write LINESTRING/MULTILINESTRING WKB features as a z/x/y.mvt slippy
    tree: supercover tiles per line (cell.cover_line), clip each line to
    its tile with the general line↔polygon clipper
    (geometry.clip_line_to_polygon), transform to tile-local ints, one
    linestring Layer per tile — the line twin of write_mvt_slippy."""
    import pandas as pd

    from .cell import cover_line, z2_decode
    from .geometry import MultiLine, clip_line_to_extent, wkb_decode

    mt = layout.map_transform

    def emit(it):
        for pdf in it:
            rows = {"col": [], "row": [], "fid": [], "wkb": []}
            for t in pdf.itertuples(index=False):
                raw = bytes(getattr(t, wkb_col))
                g = wkb_decode(raw)
                parts = g.lines if isinstance(g, MultiLine) else [g]
                cells = set()
                for ln in parts:
                    cells.update(int(c) for c in cover_line(layout, ln))
                for c in sorted(cells):
                    cc, rr = z2_decode(c)
                    rows["col"].append(int(cc))
                    rows["row"].append(int(rr))
                    rows["fid"].append(int(getattr(t, id_col)))
                    rows["wkb"].append(raw)
            if rows["col"]:
                yield pd.DataFrame(rows)

    covered = lines_df.mapInPandas(
        emit, "col int, row int, fid long, wkb binary"
    )

    os.makedirs(out_dir, exist_ok=True)

    def write_part(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            for (col, row), grp in pdf.groupby(["col", "row"]):
                text = mt.extent_for_key(int(col), int(row))
                feats = []
                for t in grp.itertuples(index=False):
                    g = wkb_decode(bytes(t.wkb))
                    parts = g.lines if isinstance(g, MultiLine) else [g]
                    clipped = []
                    for ln in parts:
                        clipped.extend(clip_line_to_extent(ln, text))
                    if not clipped:
                        continue
                    feats.append(
                        {
                            "id": int(t.fid), "type": "linestring",
                            "rings": rings_to_tile_coords(clipped, text, extent),
                            "properties": {"value": int(t.fid)},
                        }
                    )
                if not feats:
                    continue
                data = mvt_encode([(layer_name, feats)], extent)
                d = os.path.join(out_dir, str(zoom), str(col))
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"{row}.mvt"), "wb") as f:
                    f.write(data)
            yield pd.DataFrame({"n": [len(pdf)]})

    covered.repartition("col", "row").mapInPandas(write_part, "n long").count()
    n = 0
    for z in os.listdir(out_dir):
        for x in os.listdir(os.path.join(out_dir, z)):
            n += len(os.listdir(os.path.join(out_dir, z, x)))
    return n
