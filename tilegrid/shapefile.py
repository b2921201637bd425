"""Minimal from-scratch ESRI Shapefile (.shp) codec.

Reference: the `shapefile/` module (geotrellis.shapefile delegates to
GeoTools). This reads/writes the geometry file only (.shp; the .dbf
attribute table is out of scope — attributes live in regular DataFrame
columns in this engine). Supported shape types: 1 (Point), 5 (Polygon,
multi-ring with the even-odd ring convention), 3 (PolyLine, returned as
open ring arrays). Geometry shapes come back in the same forms
`geometry.wkb_decode` produces, so downstream operators are agnostic.
"""

from __future__ import annotations

import struct

import numpy as np


def shp_decode(data: bytes) -> list:
    """Parse a .shp file -> list of geometries: (x, y) for points,
    list[rings] for polygons, list[parts] (open) for polylines."""
    if struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ValueError("not a shapefile (.shp)")
    out = []
    pos = 100
    n = len(data)
    while pos + 8 <= n:
        _, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        end = pos + content_words * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype == 0:  # null shape: a valid record with no geometry
            pass  # (shapefile spec 3.1.1) — deliberately skipped, not an error
        elif stype == 1:
            x, y = struct.unpack_from("<dd", data, pos + 4)
            out.append((x, y))
        elif stype in (3, 5):
            nparts, npoints = struct.unpack_from("<ii", data, pos + 36)
            parts = list(
                struct.unpack_from(f"<{nparts}i", data, pos + 44)
            ) + [npoints]
            pts = np.frombuffer(
                data, dtype="<f8", count=2 * npoints, offset=pos + 44 + 4 * nparts
            ).reshape(npoints, 2).astype(np.float64)
            rings = []
            for i in range(nparts):
                r = pts[parts[i] : parts[i + 1]]
                if stype == 5 and len(r) > 1 and (r[0] == r[-1]).all():
                    r = r[:-1]  # same unclosed convention as wkb_decode
                rings.append(r)
            out.append(rings)
        else:
            raise ValueError(f"unsupported shapefile shape type {stype}")
        pos = end
    return out


def shp_encode(geoms: list) -> bytes:
    """Write a .shp from (x, y) points and/or list[rings] polygons
    (homogeneous files per the spec; mixed input raises)."""
    kinds = {("point" if isinstance(g, tuple) else "polygon") for g in geoms}
    if len(kinds) > 1:
        raise ValueError("shapefile records must share one shape type")
    stype = 1 if kinds == {"point"} else 5
    records = []
    allx, ally = [], []
    for idx, g in enumerate(geoms, start=1):
        if stype == 1:
            body = struct.pack("<idd", 1, g[0], g[1])
            allx.append(g[0])
            ally.append(g[1])
        else:
            rings = [np.asarray(r, dtype=np.float64) for r in g]
            closed = []
            for r in rings:
                if not (r[0] == r[-1]).all():
                    r = np.vstack([r, r[:1]])
                closed.append(r)
            pts = np.vstack(closed)
            allx.extend(pts[:, 0])
            ally.extend(pts[:, 1])
            parts = np.cumsum([0] + [len(r) for r in closed[:-1]]).astype("<i4")
            body = struct.pack(
                "<idddd ii".replace(" ", ""),
                5,
                float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()),
                len(closed), len(pts),
            ) + parts.tobytes() + pts.astype("<f8").tobytes()
        records.append(struct.pack(">ii", idx, len(body) // 2) + body)
    content = b"".join(records)
    total_words = (100 + len(content)) // 2
    bbox = (
        (min(allx), min(ally), max(allx), max(ally)) if allx else (0.0,) * 4
    )
    header = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, stype)
    header += struct.pack("<4d", *bbox)
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    return header + content
