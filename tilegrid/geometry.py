"""From-scratch vector geometry: WKB codec, ray-casting point-in-polygon,
polygon x extent intersection, segment tests, distances, polygon builders.

The reference delegates geometry to JTS (vector/.../Geometry.scala:28); the
north rule forbids leaning on a geo lib, so the predicates we need (PIP,
intersects, distance) are implemented directly in NumPy, batched so they run
over whole Arrow record batches at once.

Polygon representation: list of (m, 2) float64 rings — rings[0] = exterior,
rest = holes. Even-odd (ray-casting) semantics, so winding order is free.
"""

from __future__ import annotations

import struct

import numpy as np

from .grid import Extent

# ----------------------------------------------------------------------- WKB

_WKB_POINT, _WKB_POLYGON, _WKB_MULTIPOLYGON = 1, 3, 6
_WKB_LINESTRING, _WKB_MULTIPOINT, _WKB_MULTILINESTRING = 2, 4, 5
_WKB_GEOMETRYCOLLECTION = 7


# Geometry value forms (reference: vector/src/main/scala/geotrellis/vector/
# Line.scala, MultiLine.scala, MultiPoint.scala, GeometryCollection.scala):
#   point      -> (x, y) tuple
#   LINE       -> bare (N, 2) float64 ndarray (open path; matches the kind
#                 dispatch relate._kind already uses)
#   polygon    -> list[ndarray rings]      multipolygon -> list[list[rings]]
# The multi/collection kinds need explicit wrappers because their natural
# python shapes collide with the polygon forms above.

class MultiPoint:
    """An unordered set of points, coords shaped (N, 2)."""

    __slots__ = ("coords",)

    def __init__(self, coords):
        self.coords = np.asarray(coords, np.float64).reshape(-1, 2)

    def __repr__(self):  # pragma: no cover
        return f"MultiPoint({len(self.coords)} pts)"

    def __eq__(self, other):
        return isinstance(other, MultiPoint) and np.array_equal(
            self.coords, other.coords)


class MultiLine:
    """A set of open polylines, each a (N, 2) ndarray."""

    __slots__ = ("lines",)

    def __init__(self, lines):
        self.lines = [np.asarray(l, np.float64).reshape(-1, 2) for l in lines]

    def __repr__(self):  # pragma: no cover
        return f"MultiLine({len(self.lines)} lines)"

    def __eq__(self, other):
        return (
            isinstance(other, MultiLine)
            and len(self.lines) == len(other.lines)
            and all(np.array_equal(a, b)
                    for a, b in zip(self.lines, other.lines))
        )


class GeometryCollection:
    """A heterogeneous list of any geometry forms above."""

    __slots__ = ("geoms",)

    def __init__(self, geoms):
        self.geoms = list(geoms)

    def __repr__(self):  # pragma: no cover
        return f"GeometryCollection({len(self.geoms)})"

    def __eq__(self, other):
        if not isinstance(other, GeometryCollection) or len(self.geoms) != len(other.geoms):
            return False
        for a, b in zip(self.geoms, other.geoms):
            if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
                if not (isinstance(a, np.ndarray) and isinstance(b, np.ndarray)
                        and np.array_equal(a, b)):
                    return False
            elif isinstance(a, list) and isinstance(b, list):
                if wkb_encode_geom(a) != wkb_encode_geom(b):
                    return False
            elif a != b:
                return False
        return True


def wkb_encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_encode_linestring(coords: np.ndarray) -> bytes:
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    return (
        struct.pack("<BII", 1, _WKB_LINESTRING, len(c))
        + c.astype("<f8").tobytes()
    )


def wkb_encode_multilinestring(lines) -> bytes:
    ls = lines.lines if isinstance(lines, MultiLine) else lines
    out = [struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(ls))]
    out += [wkb_encode_linestring(l) for l in ls]
    return b"".join(out)


def wkb_encode_multipoint(pts) -> bytes:
    c = pts.coords if isinstance(pts, MultiPoint) else np.asarray(pts)
    out = [struct.pack("<BII", 1, _WKB_MULTIPOINT, len(c))]
    out += [wkb_encode_point(float(x), float(y)) for x, y in c]
    return b"".join(out)


def wkb_encode_geometrycollection(gc) -> bytes:
    gs = gc.geoms if isinstance(gc, GeometryCollection) else gc
    out = [struct.pack("<BII", 1, _WKB_GEOMETRYCOLLECTION, len(gs))]
    out += [wkb_encode_geom(g) for g in gs]
    return b"".join(out)


def wkb_encode_geom(g) -> bytes:
    """Encode any geometry form by shape dispatch."""
    if isinstance(g, tuple):
        return wkb_encode_point(float(g[0]), float(g[1]))
    if isinstance(g, np.ndarray):
        return wkb_encode_linestring(g)
    if isinstance(g, MultiPoint):
        return wkb_encode_multipoint(g)
    if isinstance(g, MultiLine):
        return wkb_encode_multilinestring(g)
    if isinstance(g, GeometryCollection):
        return wkb_encode_geometrycollection(g)
    if isinstance(g, list) and g and isinstance(g[0], list):
        return wkb_encode_multipolygon(g)
    if isinstance(g, list):
        return wkb_encode_polygon(g)
    raise TypeError(f"unsupported geometry form: {type(g)}")


def wkb_encode_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not (r[0] == r[-1]).all():  # close ring per WKB convention
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def wkb_encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    """Encode a list of polygons (each a list of rings) as WKB MULTIPOLYGON."""
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_encode_polygon(rings))
    return b"".join(out)


def wkb_decode(data: bytes):
    """Decode point -> (x, y); polygon -> list[rings]; multipolygon ->
    list[list[rings]]. Rings are returned unclosed (last==first removed)."""
    byte_order, geom_type = struct.unpack_from("<BI", data, 0)
    if byte_order != 1:
        raise ValueError("big-endian WKB unsupported")
    if geom_type == _WKB_POINT:
        x, y = struct.unpack_from("<dd", data, 5)
        return (x, y)
    if geom_type == _WKB_POLYGON:
        rings, _ = _decode_polygon_body(data, 5)
        return rings
    if geom_type == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", data, 5)
        pos, polys = 9, []
        for _ in range(n):
            pos += 5  # inner byte order + type
            rings, pos = _decode_polygon_body(data, pos)
            polys.append(rings)
        return polys
    if geom_type == _WKB_LINESTRING:
        line, _ = _decode_line_body(data, 5)
        return line
    if geom_type == _WKB_MULTIPOINT:
        (n,) = struct.unpack_from("<I", data, 5)
        pos, pts = 9, []
        for _ in range(n):
            pts.append(struct.unpack_from("<dd", data, pos + 5))
            pos += 21
        return MultiPoint(np.asarray(pts, np.float64).reshape(-1, 2))
    if geom_type == _WKB_MULTILINESTRING:
        (n,) = struct.unpack_from("<I", data, 5)
        pos, lines = 9, []
        for _ in range(n):
            line, pos = _decode_line_body(data, pos + 5)
            lines.append(line)
        return MultiLine(lines)
    if geom_type == _WKB_GEOMETRYCOLLECTION:
        (n,) = struct.unpack_from("<I", data, 5)
        pos, geoms = 9, []
        for _ in range(n):
            sub, pos = _decode_any(data, pos)
            geoms.append(sub)
        return GeometryCollection(geoms)
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def _decode_line_body(data: bytes, pos: int):
    (m,) = struct.unpack_from("<I", data, pos)
    pos += 4
    line = np.frombuffer(data, dtype="<f8", count=2 * m, offset=pos).reshape(m, 2)
    return line.astype(np.float64), pos + 16 * m


def _decode_any(data: bytes, pos: int):
    """Decode one nested geometry starting at `pos`; returns (geom, pos')."""
    geom_type = struct.unpack_from("<BI", data, pos)[1]
    pos += 5
    if geom_type == _WKB_POINT:
        x, y = struct.unpack_from("<dd", data, pos)
        return (x, y), pos + 16
    if geom_type == _WKB_LINESTRING:
        return _decode_line_body(data, pos)
    if geom_type == _WKB_POLYGON:
        return _decode_polygon_body(data, pos)
    if geom_type == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        polys = []
        for _ in range(n):
            rings, pos = _decode_polygon_body(data, pos + 5)
            polys.append(rings)
        return polys, pos
    if geom_type == _WKB_MULTIPOINT:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        pts = []
        for _ in range(n):
            pts.append(struct.unpack_from("<dd", data, pos + 5))
            pos += 21
        return MultiPoint(np.asarray(pts, np.float64).reshape(-1, 2)), pos
    if geom_type == _WKB_MULTILINESTRING:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lines = []
        for _ in range(n):
            line, pos = _decode_line_body(data, pos + 5)
            lines.append(line)
        return MultiLine(lines), pos
    if geom_type == _WKB_GEOMETRYCOLLECTION:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        geoms = []
        for _ in range(n):
            sub, pos = _decode_any(data, pos)
            geoms.append(sub)
        return GeometryCollection(geoms), pos
    raise ValueError(f"unsupported nested WKB geometry type {geom_type}")


def _decode_polygon_body(data: bytes, pos: int):
    (n_rings,) = struct.unpack_from("<I", data, pos)
    pos += 4
    rings = []
    for _ in range(n_rings):
        (m,) = struct.unpack_from("<I", data, pos)
        pos += 4
        r = np.frombuffer(data, dtype="<f8", count=2 * m, offset=pos).reshape(m, 2)
        pos += 16 * m
        if m > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        rings.append(r.astype(np.float64))
    return rings, pos


# ----------------------------------------------------------------- WKT
# (reference: vector/src/main/scala/geotrellis/vector/io/wkt/)

def _fmt_coord(x: float, y: float) -> str:
    # force Python floats: repr(np.float64(1.5)) is 'np.float64(1.5)' under
    # NumPy >= 2.0, which would corrupt the WKT
    return f"{float(x)!r} {float(y)!r}"


def wkt_encode_point(x: float, y: float) -> str:
    return f"POINT ({_fmt_coord(x, y)})"


def _wkt_rings(rings: list[np.ndarray]) -> str:
    parts = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        parts.append("(" + ", ".join(_fmt_coord(a, b) for a, b in r) + ")")
    return "(" + ", ".join(parts) + ")"


def wkt_encode_polygon(rings: list[np.ndarray]) -> str:
    return "POLYGON " + _wkt_rings(rings)


def wkt_encode_multipolygon(polys: list[list[np.ndarray]]) -> str:
    return "MULTIPOLYGON (" + ", ".join(_wkt_rings(p) for p in polys) + ")"


def _wkt_path(line: np.ndarray) -> str:
    c = np.asarray(line, np.float64).reshape(-1, 2)
    return "(" + ", ".join(_fmt_coord(a, b) for a, b in c) + ")"


def wkt_encode_linestring(line: np.ndarray) -> str:
    return "LINESTRING " + _wkt_path(line)


def wkt_encode_multilinestring(lines) -> str:
    ls = lines.lines if isinstance(lines, MultiLine) else lines
    return "MULTILINESTRING (" + ", ".join(_wkt_path(l) for l in ls) + ")"


def wkt_encode_multipoint(pts) -> str:
    c = pts.coords if isinstance(pts, MultiPoint) else np.asarray(pts)
    return "MULTIPOINT (" + ", ".join(
        f"({_fmt_coord(x, y)})" for x, y in c) + ")"


def wkt_encode_geometrycollection(gc) -> str:
    gs = gc.geoms if isinstance(gc, GeometryCollection) else gc
    return "GEOMETRYCOLLECTION (" + ", ".join(
        wkt_encode_geom(g) for g in gs) + ")"


def wkt_encode_geom(g) -> str:
    """Encode any geometry form by shape dispatch (wkb_encode_geom twin)."""
    if isinstance(g, tuple):
        return wkt_encode_point(float(g[0]), float(g[1]))
    if isinstance(g, np.ndarray):
        return wkt_encode_linestring(g)
    if isinstance(g, MultiPoint):
        return wkt_encode_multipoint(g)
    if isinstance(g, MultiLine):
        return wkt_encode_multilinestring(g)
    if isinstance(g, GeometryCollection):
        return wkt_encode_geometrycollection(g)
    if isinstance(g, list) and g and isinstance(g[0], list):
        return wkt_encode_multipolygon(g)
    if isinstance(g, list):
        return wkt_encode_polygon(g)
    raise TypeError(f"unsupported geometry form: {type(g)}")


def _parse_ring_text(txt: str) -> np.ndarray:
    pts = [
        [float(v) for v in pair.split()] for pair in txt.split(",") if pair.strip()
    ]
    r = np.asarray(pts, dtype=np.float64)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    return r


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized WKT body into its top-level (...) groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def wkt_decode(text: str):
    """POINT -> (x, y); POLYGON -> list[rings]; MULTIPOLYGON ->
    list[list[rings]] (same shapes wkb_decode returns)."""
    t = text.strip()
    upper = t.upper()
    if upper.startswith("POINT"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        x, y = (float(v) for v in body.split())
        return (x, y)
    if upper.startswith("POLYGON"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return [_parse_ring_text(g) for g in _split_groups(body)]
    if upper.startswith("MULTIPOLYGON"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return [
            [_parse_ring_text(g) for g in _split_groups(poly)]
            for poly in _split_groups(body)
        ]
    if upper.startswith("MULTILINESTRING"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return MultiLine([_parse_path_text(g) for g in _split_groups(body)])
    if upper.startswith("LINESTRING"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return _parse_path_text(body)
    if upper.startswith("MULTIPOINT"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        groups = _split_groups(body)
        # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4) are legal
        txt = ", ".join(groups) if groups else body
        return MultiPoint(_parse_path_text(txt))
    if upper.startswith("GEOMETRYCOLLECTION"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return GeometryCollection(
            [wkt_decode(part) for part in _split_top_geoms(body)])
    raise ValueError(f"unsupported WKT: {t[:30]!r}")


def _parse_path_text(txt: str) -> np.ndarray:
    """Comma-separated 'x y' pairs -> (N, 2) array, NOT ring-unclosed."""
    pts = [
        [float(v) for v in pair.split()] for pair in txt.split(",") if pair.strip()
    ]
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def _split_top_geoms(body: str) -> list[str]:
    """Split 'POINT (..), LINESTRING (..)' at top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    tail = body[start:].strip()
    if tail:
        parts.append(tail)
    return [p.strip() for p in parts]


# ----------------------------------------------------------------- GeoJSON
# (reference: vector/src/main/scala/geotrellis/vector/io/json/)

def geojson_encode(geom) -> str:
    """(x, y) -> Point; list[rings] -> Polygon; list[list[rings]] ->
    MultiPolygon. Rings emitted closed, per the GeoJSON spec."""
    import json

    def ring_coords(ring):
        r = np.asarray(ring, dtype=np.float64)
        if not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        return r.tolist()

    if isinstance(geom, tuple):
        obj = {"type": "Point", "coordinates": [geom[0], geom[1]]}
    elif isinstance(geom, np.ndarray):
        obj = {"type": "LineString",
               "coordinates": np.asarray(geom, np.float64).tolist()}
    elif isinstance(geom, MultiPoint):
        obj = {"type": "MultiPoint", "coordinates": geom.coords.tolist()}
    elif isinstance(geom, MultiLine):
        obj = {"type": "MultiLineString",
               "coordinates": [np.asarray(l, np.float64).tolist()
                               for l in geom.lines]}
    elif isinstance(geom, GeometryCollection):
        import json as _json

        obj = {
            "type": "GeometryCollection",
            "geometries": [_json.loads(geojson_encode(g)) for g in geom.geoms],
        }
    elif geom and isinstance(geom[0], list):
        obj = {
            "type": "MultiPolygon",
            "coordinates": [[ring_coords(r) for r in poly] for poly in geom],
        }
    else:
        obj = {"type": "Polygon", "coordinates": [ring_coords(r) for r in geom]}
    return json.dumps(obj)


def geojson_decode(text: str):
    import json

    obj = json.loads(text)
    t = obj["type"]
    if t == "GeometryCollection":
        return GeometryCollection(
            [geojson_decode(json.dumps(g)) for g in obj["geometries"]])
    cs = obj["coordinates"]

    def ring(c):
        r = np.asarray(c, dtype=np.float64)
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        return r

    if t == "Point":
        return (float(cs[0]), float(cs[1]))
    if t == "Polygon":
        return [ring(c) for c in cs]
    if t == "MultiPolygon":
        return [[ring(c) for c in poly] for poly in cs]
    if t == "LineString":
        return np.asarray(cs, np.float64).reshape(-1, 2)
    if t == "MultiLineString":
        return MultiLine([np.asarray(c, np.float64).reshape(-1, 2) for c in cs])
    if t == "MultiPoint":
        return MultiPoint(np.asarray(cs, np.float64).reshape(-1, 2))
    raise ValueError(f"unsupported GeoJSON type {t!r}")


def feature_encode(geom, properties=None, fid=None) -> str:
    """GeoJSON Feature (reference FeatureFormats.scala:32-47:
    writeFeatureJson / writeFeatureJsonWithID — `id` emitted only when
    given). `properties` is any JSON-serializable value (the reference's
    D: JsonWriter payload)."""
    import json

    obj = {
        "type": "Feature",
        "geometry": json.loads(geojson_encode(geom)),
        "properties": properties,
    }
    if fid is not None:
        obj["id"] = fid
    return json.dumps(obj)


def feature_decode(text: str):
    """-> (geom, properties, id-or-None) (FeatureFormats.readFeatureJson)."""
    import json

    obj = json.loads(text)
    if obj.get("type") != "Feature":
        raise ValueError("Feature expected")
    geom = geojson_decode(json.dumps(obj["geometry"]))
    return geom, obj.get("properties"), obj.get("id")


def feature_collection_encode(features, crs_name: str | None = None) -> str:
    """GeoJSON FeatureCollection (JsonFeatureCollection.scala); `features`
    is an iterable of (geom, properties) or (geom, properties, id) tuples.
    `crs_name` emits the reference's named-CRS member (JsonCRS.scala)."""
    import json

    feats = []
    for f in features:
        geom, props = f[0], f[1]
        fid = f[2] if len(f) > 2 else None
        feats.append(json.loads(feature_encode(geom, props, fid)))
    obj = {"type": "FeatureCollection", "features": feats}
    if crs_name is not None:
        obj["crs"] = {"type": "name", "properties": {"name": crs_name}}
    return json.dumps(obj)


def feature_collection_decode(text: str):
    """-> (features, crs_name-or-None); features = [(geom, props, id), ...].
    Accepts a bare Feature or geometry too (GeoJson.scala's permissive
    parse entry point)."""
    import json

    obj = json.loads(text)
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = [feature_decode(json.dumps(f)) for f in obj["features"]]
        crs = None
        if isinstance(obj.get("crs"), dict):
            crs = obj["crs"].get("properties", {}).get("name")
        return feats, crs
    if t == "Feature":
        return [feature_decode(text)], None
    return [(geojson_decode(text), None, None)], None


# ------------------------------------------------------- point-in-polygon

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: for each point, parity of crossings of a +x ray
    with the ring's edges. Vectorized over points (loop over edges — polygons
    are small, point batches are large)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(ring)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(n):
        cond = (y1[i] > py) != (y2[i] > py)
        if not cond.any():
            continue
        xint = (x2[i] - x1[i]) * (py - y1[i]) / (y2[i] - y1[i]) + x1[i]
        inside ^= cond & (px < xint)
    return inside


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings (holes flip parity back out)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


# ------------------------------------------------- polygon x extent intersect

def _segments_cross(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Vectorized proper/touching segment intersection via orientation signs."""
    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    return (d1 * d2 <= 0) & (d3 * d4 <= 0) & ~((d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0) & _no_1d_overlap(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2))


def _no_1d_overlap(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    ox = (np.minimum(ax1, ax2) > np.maximum(bx1, bx2)) | (
        np.maximum(ax1, ax2) < np.minimum(bx1, bx2)
    )
    oy = (np.minimum(ay1, ay2) > np.maximum(by1, by2)) | (
        np.maximum(ay1, ay2) < np.minimum(by1, by2)
    )
    return ox | oy


def polygon_bbox(rings: list[np.ndarray]) -> Extent:
    ext = rings[0]
    return Extent(
        float(ext[:, 0].min()), float(ext[:, 1].min()),
        float(ext[:, 0].max()), float(ext[:, 1].max()),
    )


def polygon_intersects_extents(
    rings: list[np.ndarray], xmin, ymin, xmax, ymax
) -> np.ndarray:
    """For arrays of extents, True where the polygon intersects the extent:
    bbox overlap AND (a vertex in extent OR an extent corner in polygon OR a
    polygon edge crosses an extent edge)."""
    xmin = np.asarray(xmin, np.float64)
    ymin = np.asarray(ymin, np.float64)
    xmax = np.asarray(xmax, np.float64)
    ymax = np.asarray(ymax, np.float64)
    bb = polygon_bbox(rings)
    hit = (
        (xmin <= bb.xmax) & (xmax >= bb.xmin) & (ymin <= bb.ymax) & (ymax >= bb.ymin)
    )
    if not hit.any():
        return hit
    exterior = rings[0]
    # (a) any polygon vertex inside extent (n_ext x n_vert)
    vx, vy = exterior[:, 0], exterior[:, 1]
    vert_in = (
        (vx[None, :] >= xmin[:, None]) & (vx[None, :] <= xmax[:, None])
        & (vy[None, :] >= ymin[:, None]) & (vy[None, :] <= ymax[:, None])
    ).any(axis=1)
    # (b) any extent corner inside polygon
    corner_in = np.zeros(xmin.shape, dtype=bool)
    for cx, cy in ((xmin, ymin), (xmin, ymax), (xmax, ymin), (xmax, ymax)):
        corner_in |= points_in_polygon(cx, cy, rings)
    out = hit & (vert_in | corner_in)
    # (c) residual: polygon edge crosses an extent edge
    rem = hit & ~out
    if rem.any():
        idx = np.where(rem)[0]
        ex1 = np.stack([xmin[idx], xmin[idx], xmax[idx], xmin[idx]], axis=1)
        ey1 = np.stack([ymin[idx], ymax[idx], ymin[idx], ymin[idx]], axis=1)
        ex2 = np.stack([xmax[idx], xmax[idx], xmax[idx], xmin[idx]], axis=1)
        ey2 = np.stack([ymin[idx], ymax[idx], ymax[idx], ymax[idx]], axis=1)
        crossed = np.zeros(len(idx), dtype=bool)
        x1, y1 = exterior[:, 0], exterior[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in range(len(exterior)):
            c = _segments_cross(
                x1[i], y1[i], x2[i], y2[i],
                ex1, ey1, ex2, ey2,
            ).any(axis=1)
            crossed |= c
            if crossed.all():
                break
        out[idx] = crossed
    return out


def polygon_contains_extent(rings: list[np.ndarray], ext: Extent) -> bool:
    """True when the extent is fully inside the polygon: all 4 corners inside
    and no edge crossings with the extent boundary."""
    cx = np.array([ext.xmin, ext.xmin, ext.xmax, ext.xmax])
    cy = np.array([ext.ymin, ext.ymax, ext.ymin, ext.ymax])
    if not points_in_polygon(cx, cy, rings).all():
        return False
    ex1 = np.array([[ext.xmin, ext.xmin, ext.xmax, ext.xmin]])
    ey1 = np.array([[ext.ymin, ext.ymax, ext.ymin, ext.ymin]])
    ex2 = np.array([[ext.xmax, ext.xmax, ext.xmax, ext.xmin]])
    ey2 = np.array([[ext.ymin, ext.ymax, ext.ymax, ext.ymax]])
    for ring in rings:
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in range(len(ring)):
            if _segments_cross(x1[i], y1[i], x2[i], y2[i], ex1, ey1, ex2, ey2).any():
                return False
    return True


# ------------------------------------------------------------------ builders

def regular_ngon(cx: float, cy: float, n: int, radius: float, rot: float = 0.0) -> np.ndarray:
    ang = rot + 2.0 * np.pi * np.arange(n) / n
    return np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], axis=1)


def extent_polygon(ext: Extent) -> np.ndarray:
    return np.array(
        [
            [ext.xmin, ext.ymin],
            [ext.xmax, ext.ymin],
            [ext.xmax, ext.ymax],
            [ext.xmin, ext.ymax],
        ]
    )


def polygon_area(ring: np.ndarray) -> float:
    """Shoelace area (positive regardless of winding)."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(abs(np.sum(x * y2 - x2 * y)) / 2.0)


def polygon_perimeter(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(np.hypot(x2 - x, y2 - y)))


def line_length(line) -> float:
    """Length of an OPEN polyline (Line.scala's length; MultiLine sums its
    parts). Unlike polygon_perimeter, the last->first segment is NOT
    closed."""
    if isinstance(line, MultiLine):
        return float(sum(line_length(l) for l in line.lines))
    c = np.asarray(line, np.float64).reshape(-1, 2)
    if len(c) < 2:
        return 0.0
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def clip_line_to_polygon(line, rings: list[np.ndarray]) -> list[np.ndarray]:
    """Line ∩ Polygon (the reference's Line.intersection(Polygon) via JTS,
    Line.scala:133-150): split every line segment at its crossings with the
    polygon boundary, keep the sub-segments whose midpoint is inside
    (even-odd over all rings, boundary counts as inside — JTS closed-region
    semantics), and stitch consecutive kept pieces back into maximal open
    polylines. Returns a list of (M, 2) arrays (possibly empty)."""
    c = np.asarray(line, np.float64).reshape(-1, 2)
    if len(c) < 2:
        return []
    edges = _edge_list(rings)
    parts: list[np.ndarray] = []
    cur: list[tuple[float, float]] | None = None

    def flush():
        nonlocal cur
        if cur is not None and len(cur) >= 2:
            parts.append(np.asarray(cur, np.float64))
        cur = None

    for i in range(len(c) - 1):
        (px_, py_), (qx, qy) = c[i], c[i + 1]
        if px_ == qx and py_ == qy:
            continue
        ts = sorted({0.0, 1.0}
                    | {t for t, _, _ in _split_params((px_, py_, qx, qy), edges)})
        for t0, t1 in zip(ts, ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            tm = 0.5 * (t0 + t1)
            mx, my = px_ + tm * (qx - px_), py_ + tm * (qy - py_)
            inside = bool(
                points_in_polygon(np.array([mx]), np.array([my]), rings)[0]
            ) or _on_boundary(mx, my, edges) is not None
            # exact endpoints at t=0/1 (px_+1.0*(qx-px_) can land 1 ulp off
            # the vertex, which would smear part joins and lengths)
            a = (px_, py_) if t0 == 0.0 else \
                (px_ + t0 * (qx - px_), py_ + t0 * (qy - py_))
            b = (qx, qy) if t1 == 1.0 else \
                (px_ + t1 * (qx - px_), py_ + t1 * (qy - py_))
            if not inside:
                flush()
                continue
            if cur is not None and _snap_pt(*cur[-1]) == _snap_pt(*a):
                cur.append(b)
            else:
                flush()
                cur = [a, b]
    flush()
    return parts


def clip_line_to_extent(line, ext) -> list[np.ndarray]:
    """Line ∩ axis-aligned box, via the general polygon clipper over the
    box ring (the per-tile clip of the MVT line writer)."""
    rect = np.array([
        [ext.xmin, ext.ymin], [ext.xmax, ext.ymin],
        [ext.xmax, ext.ymax], [ext.xmin, ext.ymax],
    ])
    return clip_line_to_polygon(line, [rect])


def points_line_distance(px, py, line: np.ndarray) -> np.ndarray:
    """Min distance from each point to an OPEN polyline (no closing
    segment — the open twin of points_segments_distance)."""
    c = np.asarray(line, np.float64).reshape(-1, 2)
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    best = np.full(px.shape, np.inf)
    for i in range(len(c) - 1):
        x1, y1 = c[i]
        x2, y2 = c[i + 1]
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            t = np.zeros_like(px)
        else:
            t = np.clip(((px - x1) * dx + (py - y1) * dy) / L2, 0.0, 1.0)
        best = np.minimum(best, np.hypot(px - (x1 + t * dx), py - (y1 + t * dy)))
    if len(c) == 1:
        best = np.hypot(px - c[0, 0], py - c[0, 1])
    return best


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (shoelace form; degenerate rings fall back to
    the vertex mean)."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(x.mean()), float(y.mean())
    cx = float(((x + x2) * cross).sum() / (6.0 * a))
    cy = float(((y + y2) * cross).sum() / (6.0 * a))
    return cx, cy


def densify(ring: np.ndarray, max_seg_len: float) -> np.ndarray:
    """Insert evenly spaced vertices so no segment exceeds max_seg_len
    (reference vector densify via JTS Densifier semantics)."""
    r = np.asarray(ring, dtype=np.float64)
    out = []
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        out.append(a)
        d = float(np.hypot(*(b - a)))
        if d > max_seg_len:
            k = int(np.ceil(d / max_seg_len))
            ts = np.arange(1, k) / k
            out.extend(a + ts[:, None] * (b - a))
    return np.asarray(out)


def affine_transform(ring: np.ndarray, a: float, b: float, d: float, e: float,
                     xoff: float = 0.0, yoff: float = 0.0) -> np.ndarray:
    """x' = a*x + b*y + xoff, y' = d*x + e*y + yoff (JTS
    AffineTransformation parameter order)."""
    r = np.asarray(ring, dtype=np.float64)
    return np.stack(
        [a * r[:, 0] + b * r[:, 1] + xoff, d * r[:, 0] + e * r[:, 1] + yoff],
        axis=1,
    )


def points_segments_distance(px, py, ring: np.ndarray) -> np.ndarray:
    """Min distance from each point to the ring's boundary segments."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    best = np.full(px.shape, np.inf)
    for i in range(len(ring)):
        dx, dy = x2[i] - x1[i], y2[i] - y1[i]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            t = np.zeros_like(px)
        else:
            t = np.clip(((px - x1[i]) * dx + (py - y1[i]) * dy) / L2, 0.0, 1.0)
        best = np.minimum(best, np.hypot(px - (x1[i] + t * dx), py - (y1[i] + t * dy)))
    return best


def points_polygon_distance(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Distance from points to a polygon: 0 inside, else distance to the
    nearest boundary segment (any ring)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    d = np.full(px.shape, np.inf)
    for ring in rings:
        d = np.minimum(d, points_segments_distance(px, py, ring))
    d[points_in_polygon(px, py, rings)] = 0.0
    return d


# ------------------------------------------------ set ops (clip / buffer)

def clip_polygon_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip an arbitrary simple ring against a CONVEX
    clip ring -> the intersection ring (possibly empty). This covers the
    reference's most common set-op uses (intersection with extents /
    convex query polygons; Polygon.scala:153-230 delegates to JTS).
    Clip ring may be CW or CCW (orientation is normalized)."""
    clip = np.asarray(clip_ring, dtype=np.float64)
    # normalize clip to CCW so "inside" = left of each directed edge
    x, y = clip[:, 0], clip[:, 1]
    if np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        clip = clip[::-1]
    out = [tuple(p) for p in np.asarray(subject, dtype=np.float64)]
    n = len(clip)
    for i in range(n):
        if not out:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        ex, ey = bx - ax, by - ay
        inp = out
        out = []
        m = len(inp)
        for j in range(m):
            cx, cy = inp[j]
            px, py = inp[j - 1]
            cur_in = ex * (cy - ay) - ey * (cx - ax) >= 0
            prev_in = ex * (py - ay) - ey * (px - ax) >= 0
            if cur_in != prev_in:
                # edge crossing: intersect segment (prev->cur) with clip line
                dx, dy = cx - px, cy - py
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ex * (ay - py) - ey * (ax - px)) / denom
                    out.append((px + t * dx, py + t * dy))
            if cur_in:
                out.append((cx, cy))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def buffer_convex(ring: np.ndarray, dist: float, quad_segs: int = 8) -> np.ndarray:
    """Positive buffer of a CONVEX ring (or a point set): the Minkowski sum
    with a disc, computed exactly for convex inputs as hull({v + c_k}) over
    the ring vertices v and a 4*quad_segs-gon disc approximation c_k —
    the JTS BufferOp contract restricted to the convex case (documented
    limitation; concave buffers need the full offset-curve machinery)."""
    if dist <= 0:
        raise ValueError("buffer_convex supports positive distances")
    k = 4 * quad_segs
    ang = 2.0 * np.pi * np.arange(k) / k
    disc = np.stack([dist * np.cos(ang), dist * np.sin(ang)], axis=1)
    pts = (np.asarray(ring, dtype=np.float64)[:, None, :] + disc[None, :, :]).reshape(-1, 2)
    return convex_hull(pts)


def _cap_points(dist: float, quad_segs: int, cap: str) -> np.ndarray:
    """Structuring element for buffering: a 4*quad_segs-gon disc
    approximation ("round", inscribed — JTS BufferOp's cap style) or the
    exact L-infinity square ("square": Minkowski sum with [-d, d]^2)."""
    if cap == "square":
        return np.array(
            [(dist, dist), (-dist, dist), (-dist, -dist), (dist, -dist)],
            dtype=np.float64,
        )
    if cap != "round":
        raise ValueError(f"cap must be 'round' or 'square', got {cap!r}")
    k = 4 * quad_segs
    ang = 2.0 * np.pi * np.arange(k) / k
    return np.stack([dist * np.cos(ang), dist * np.sin(ang)], axis=1)


def buffer_polygon(
    rings: list[np.ndarray],
    dist: float,
    quad_segs: int = 8,
    cap: str = "round",
) -> list[np.ndarray]:
    """Buffer of an ARBITRARY (concave, holed) even-odd polygon — the full
    JTS BufferOp contract the reference delegates to
    (vector/src/main/scala/geotrellis/vector/Polygon.scala:153-158
    `buffer(d)`), rebuilt on the general overlay: the d-dilation equals the
    polygon unioned with every boundary edge's "sausage" (the convex
    Minkowski sum of the segment with the structuring element, exact via
    hull of the two translated caps), and the d-erosion (dist < 0) equals
    the polygon minus those sausages. Folding per-edge keeps every overlay
    operand convex, which the fragment classifier handles robustly.

    dist > 0 dilates (holes shrink and may vanish); dist < 0 erodes (parts
    may split or vanish; [] = empty result). cap="round" approximates arcs
    with 4*quad_segs chords (inscribed, so the result is a subset of the
    true buffer); cap="square" is the exact L-infinity buffer — for
    axis-parallel polygons the output is axis-parallel and exact."""
    rings = [np.asarray(r, np.float64) for r in rings]
    if dist == 0.0:
        return rings
    d = abs(float(dist))
    capped = _cap_points(d, quad_segs, cap)
    op = "union" if dist > 0 else "difference"
    acc = rings
    for x1, y1, x2, y2 in _edge_list(rings):
        seg = np.array([(x1, y1), (x2, y2)], dtype=np.float64)
        pts = (seg[:, None, :] + capped[None, :, :]).reshape(-1, 2)
        sausage = convex_hull(pts)
        acc = polygon_overlay(acc, [sausage], op)
        if not acc:
            return []
    return acc


def polygons_intersect(a: list[np.ndarray], b: list[np.ndarray]) -> bool:
    """True when polygons a and b share any point: vertex containment
    either way, or any exterior-edge crossing."""
    ea, eb = a[0], b[0]
    if points_in_polygon(ea[:, 0], ea[:, 1], b).any():
        return True
    if points_in_polygon(eb[:, 0], eb[:, 1], a).any():
        return True
    ax1, ay1 = ea[:, 0], ea[:, 1]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = eb[:, 0], eb[:, 1]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)
    for i in range(len(ea)):
        if _segments_cross(
            ax1[i], ay1[i], ax2[i], ay2[i],
            bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
        ).any():
            return True
    return False


def polygon_contains_polygon(a: list[np.ndarray], b: list[np.ndarray]) -> bool:
    """True when polygon b lies fully inside polygon a (all b vertices in a
    and no boundary crossings)."""
    eb = b[0]
    if not points_in_polygon(eb[:, 0], eb[:, 1], a).all():
        return False
    ea = a[0]
    ax1, ay1 = ea[:, 0], ea[:, 1]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = eb[:, 0], eb[:, 1]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)
    for i in range(len(ea)):
        if _segments_cross(
            ax1[i], ay1[i], ax2[i], ay2[i],
            bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
        ).any():
            return False
    return True


# ----------------------------------------------------- hull / simplify

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull via Andrew's monotone chain (vector/convexhull/ in the
    reference delegates to JTS; rebuilt from the published algorithm).
    Input (n,2); output CCW hull vertices (m,2), no closing repeat."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def simplify_dp(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (reference: vector/simplify/
    via JTS; rebuilt from the published algorithm, iterative stack form).
    Keeps endpoints; drops vertices closer than `tolerance` to the chord."""
    pts = np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        L = np.hypot(seg[0], seg[1])
        mid = pts[i + 1 : j]
        if L == 0.0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs(
                seg[0] * (mid[:, 1] - pts[i, 1]) - seg[1] * (mid[:, 0] - pts[i, 0])
            ) / L
        k = int(np.argmax(d))
        if d[k] > tolerance:
            ki = i + 1 + k
            keep[ki] = True
            stack.append((i, ki))
            stack.append((ki, j))
    return pts[keep]


# ------------------------------------------- general polygon boolean ops
# (reference: vector/src/main/scala/geotrellis/vector/Polygon.scala:153-406
# delegates intersection/union/difference to JTS; rebuilt from scratch here
# as overlay by edge-fragment classification — split every edge at
# edge-edge intersections, classify each fragment's midpoint even-odd
# against the other polygon, select fragments per op, stitch rings.
# Handles concave polygons and holes; polygons are flat ring lists with
# even-odd semantics (same convention as points_in_polygon). Degenerate
# shared-boundary fragments are resolved by direction matching, so
# dissolve (union of edge-adjacent polygons) comes out clean.)

_SNAP = 9  # decimal digits for endpoint snapping when stitching


def _snap_pt(x: float, y: float) -> tuple[float, float]:
    return (round(float(x), _SNAP), round(float(y), _SNAP))


def _edge_list(rings: list[np.ndarray]) -> list[tuple[float, float, float, float]]:
    out = []
    for ring in rings:
        r = np.asarray(ring, np.float64)
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        for i in range(len(r)):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % len(r)]
            if x1 != x2 or y1 != y2:
                out.append((float(x1), float(y1), float(x2), float(y2)))
    return out


def _split_params(edge, others) -> list[tuple[float, float, float]]:
    """(t, x, y) split points of `edge` against every edge in `others`:
    proper crossings (intersection point computed once, so both polygons
    share the exact floats) plus collinear-overlap endpoints."""
    x1, y1, x2, y2 = edge
    rx, ry = x2 - x1, y2 - y1
    rlen2 = rx * rx + ry * ry
    pts: list[tuple[float, float, float]] = []
    for ox1, oy1, ox2, oy2 in others:
        sx, sy = ox2 - ox1, oy2 - oy1
        denom = rx * sy - ry * sx
        qpx, qpy = ox1 - x1, oy1 - y1
        if denom != 0.0:
            t = (qpx * sy - qpy * sx) / denom
            u = (qpx * ry - qpy * rx) / denom
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                pts.append((t, x1 + t * rx, y1 + t * ry))
        else:
            # parallel: collinear iff q - p is parallel to r
            if qpx * ry - qpy * rx != 0.0:
                continue
            for px_, py_ in ((ox1, oy1), (ox2, oy2)):
                t = ((px_ - x1) * rx + (py_ - y1) * ry) / rlen2 if rlen2 else -1.0
                if 0.0 < t < 1.0:
                    pts.append((t, px_, py_))
    return pts


def _fragments(rings, other_edges):
    """Split every edge of `rings` at its intersections with `other_edges`;
    yield (x1, y1, x2, y2) directed fragments."""
    frags = []
    for edge in _edge_list(rings):
        x1, y1, x2, y2 = edge
        cuts = sorted(
            {(0.0, x1, y1), (1.0, x2, y2)}
            | {c for c in _split_params(edge, other_edges)}
        )
        seen = {}
        path = []
        for t, px_, py_ in cuts:
            key = _snap_pt(px_, py_)
            if key in seen:
                continue
            seen[key] = True
            path.append((px_, py_))
        for a, b in zip(path, path[1:]):
            frags.append((a[0], a[1], b[0], b[1]))
    return frags


def _on_boundary(px_: float, py_: float, edges, eps: float = 1e-9):
    """Edge of `edges` containing point (within eps), else None."""
    for x1, y1, x2, y2 in edges:
        rx, ry = x2 - x1, y2 - y1
        rlen2 = rx * rx + ry * ry
        if rlen2 == 0.0:
            continue
        t = ((px_ - x1) * rx + (py_ - y1) * ry) / rlen2
        if t < -eps or t > 1.0 + eps:
            continue
        dx = px_ - (x1 + t * rx)
        dy = py_ - (y1 + t * ry)
        if dx * dx + dy * dy <= eps * eps * max(rlen2, 1.0):
            return (x1, y1, x2, y2)
    return None


def _stitch(frags) -> list[np.ndarray]:
    """Walk directed fragments into closed rings (unclosed chains are
    degenerate leftovers and dropped)."""
    from collections import defaultdict

    by_start = defaultdict(list)
    for f in frags:
        by_start[_snap_pt(f[0], f[1])].append(f)
    used = set()
    rings = []
    for f0 in frags:
        if id(f0) in used:
            continue
        ring = [(f0[0], f0[1])]
        cur = f0
        used.add(id(cur))
        closed = False
        for _ in range(len(frags) + 1):
            end = _snap_pt(cur[2], cur[3])
            if end == _snap_pt(f0[0], f0[1]):
                closed = True
                break
            nxt = None
            for cand in by_start.get(end, ()):  # any unused continuation
                if id(cand) not in used:
                    nxt = cand
                    break
            if nxt is None:
                break
            ring.append((nxt[0], nxt[1]))
            used.add(id(nxt))
            cur = nxt
        if closed and len(ring) >= 3:
            rings.append(np.asarray(ring, np.float64))
    return rings


def _ring_signed_area(ring: np.ndarray) -> float:
    r = np.asarray(ring, np.float64)
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(0.5 * np.sum(x * y2 - x2 * y))


def _normalize_orientation(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Even-odd ring sets are winding-free, but fragment stitching needs
    boundary direction to encode which side the interior is on: orient each
    ring CCW at even nesting depth (outer) and CW at odd depth (hole)."""
    out = []
    for i, ring in enumerate(rings):
        depth = 0
        vx, vy = float(ring[0, 0]), float(ring[0, 1])
        for j, other in enumerate(rings):
            if j != i and bool(
                points_in_ring(np.array([vx]), np.array([vy]), other)[0]
            ):
                depth += 1
        ccw = _ring_signed_area(ring) > 0
        want_ccw = depth % 2 == 0
        out.append(ring if ccw == want_ccw else ring[::-1])
    return out


def polygon_overlay(
    a_rings: list[np.ndarray],
    b_rings: list[np.ndarray],
    op: str,
) -> list[np.ndarray]:
    """Boolean overlay of two even-odd polygons (each a flat ring list,
    holes included): op in {intersection, union, difference}. Returns the
    result's rings (even-odd; may be multiple disjoint parts / holes).

    Shared-boundary fragments resolve by direction: a fragment of A lying
    on B's boundary survives intersection/union iff B's boundary runs the
    SAME way there (interiors on the same side) and difference iff
    OPPOSITE (B's interior on the far side) — so union of edge-adjacent
    polygons drops the internal edge and A - A is empty."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(op)
    a_rings = _normalize_orientation(a_rings)
    b_rings = _normalize_orientation(b_rings)
    a_edges = _edge_list(a_rings)
    b_edges = _edge_list(b_rings)
    a_frags = _fragments(a_rings, b_edges)
    b_frags = _fragments(b_rings, a_edges)

    def same_dir(frag, edge) -> bool:
        return (frag[2] - frag[0]) * (edge[2] - edge[0]) + (
            frag[3] - frag[1]
        ) * (edge[3] - edge[1]) > 0

    keep = []
    for f in a_frags:
        mx, my = (f[0] + f[2]) / 2.0, (f[1] + f[3]) / 2.0
        onb = _on_boundary(mx, my, b_edges)
        if onb is not None:
            want_same = op in ("intersection", "union")
            if same_dir(f, onb) == want_same:
                keep.append(f)
            continue
        inside_b = bool(points_in_polygon(np.array([mx]), np.array([my]), b_rings)[0])
        if (op == "intersection" and inside_b) or (
            op in ("union", "difference") and not inside_b
        ):
            keep.append(f)
    for f in b_frags:
        mx, my = (f[0] + f[2]) / 2.0, (f[1] + f[3]) / 2.0
        if _on_boundary(mx, my, a_edges) is not None:
            continue  # A's copy (if any) already covers shared boundary
        inside_a = bool(points_in_polygon(np.array([mx]), np.array([my]), a_rings)[0])
        if op == "intersection" and inside_a:
            keep.append(f)
        elif op == "union" and not inside_a:
            keep.append(f)
        elif op == "difference" and inside_a:
            keep.append((f[2], f[3], f[0], f[1]))  # reversed: hole boundary
    return _stitch(keep)


def dissolve_rings(polys: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Union-fold many polygons into one even-odd ring set
    (vector/.../dissolve analogue built on polygon_overlay)."""
    if not polys:
        return []
    acc = polys[0]
    for rings in polys[1:]:
        acc = polygon_overlay(acc, rings, "union")
    return acc
