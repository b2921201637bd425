"""DE-9IM intersection-matrix `relate` and the named spatial predicates.

The reference exposes JTS-backed DE-9IM predicates on every geometry type
(vector/src/main/scala/geotrellis/vector/Line.scala:322-393,
Polygon.scala:236-330, Point.scala, MultiLine.scala:298-360 — `crosses`,
`overlaps`, `touches`, `within`, `contains`, `covers`, plus raw
`relate`).  This module computes the full 9-character matrix from scratch
for the repo's geometry forms:

  point   -> (x, y) tuple
  line    -> (N, 2) ndarray open/closed path (LINESTRING)
  polygon -> list[ndarray] even-odd ring set (holes included)

Dimensions: F = empty (-1), 0 = points, 1 = curves, 2 = areas.  Matrix
string order is II IB IE / BI BB BE / EI EB EE (row = first geometry).

Design notes (all derived, no JTS):
  * open-set arguments collapse the possible dims per cell — e.g. two
    polygon interiors intersect in dim 2 or not at all, a polygon
    boundary entering another polygon's open interior always yields a
    1-dim piece — so area/fragment classification decides every cell.
  * polygon x polygon area cells reuse `polygon_overlay`'s even-odd
    boolean machinery; boundary cells classify the overlay's own edge
    fragments (midpoint on/in/out tests).
  * line cells classify path fragments split at intersections
    (`_split_params`), with isolated contact points contributing dim 0
    under a max() fold so collinear dim-1 overlaps win.
"""

from __future__ import annotations

import numpy as np

from .geometry import (
    _edge_list,
    _on_boundary,
    _ring_signed_area,
    _normalize_orientation,
    _snap_pt,
    _split_params,
    points_in_polygon,
    points_segments_distance,
    polygon_overlay,
)

_EPS = 1e-9

# matrix cell indexes
_I, _B, _E = 0, 1, 2


def _new_m() -> np.ndarray:
    return np.full((3, 3), -1, dtype=np.int64)


def _render(m: np.ndarray) -> str:
    return "".join("F012"[d + 1] for d in m.reshape(-1))


def _bump(m: np.ndarray, r: int, c: int, dim: int) -> None:
    if dim > m[r, c]:
        m[r, c] = dim


def _kind(g) -> str:
    from .geometry import GeometryCollection, MultiLine, MultiPoint

    if isinstance(g, tuple) and len(g) == 2 and np.isscalar(g[0]):
        return "point"
    if isinstance(g, np.ndarray):
        return "line"
    if isinstance(g, MultiPoint):
        return "multipoint"
    if isinstance(g, MultiLine):
        return "multiline"
    if isinstance(g, GeometryCollection):
        return "collection"
    if isinstance(g, list):
        return "polygon"
    raise TypeError(f"unsupported geometry form: {type(g)}")


def _parts(g) -> list:
    """Decompose multi/collection geometries into simple parts."""
    from .geometry import GeometryCollection, MultiLine, MultiPoint

    if isinstance(g, MultiPoint):
        return [(float(x), float(y)) for x, y in g.coords]
    if isinstance(g, MultiLine):
        return list(g.lines)
    if isinstance(g, GeometryCollection):
        out = []
        for sub in g.geoms:
            out.extend(_parts(sub))
        return out
    if isinstance(g, list) and g and isinstance(g[0], list):
        return list(g)  # multipolygon -> polygons
    return [g]


def _transpose(matrix: str) -> str:
    return "".join(matrix[3 * (i % 3) + i // 3] for i in range(9))


# ------------------------------------------------------------- line helpers

def _path(g: np.ndarray) -> np.ndarray:
    p = np.asarray(g, np.float64)
    if p.ndim != 2 or p.shape[1] != 2 or len(p) < 2:
        raise ValueError("line must be an (N>=2, 2) array")
    return p


def _path_edges(p: np.ndarray) -> list[tuple[float, float, float, float]]:
    """Consecutive segments of an OPEN path (no implicit closing edge)."""
    out = []
    for i in range(len(p) - 1):
        x1, y1 = p[i]
        x2, y2 = p[i + 1]
        if x1 != x2 or y1 != y2:
            out.append((float(x1), float(y1), float(x2), float(y2)))
    return out


def _path_boundary(p: np.ndarray) -> list[tuple[float, float]]:
    """Mod-2 boundary of a single path: its endpoints, empty if closed."""
    a = (float(p[0, 0]), float(p[0, 1]))
    b = (float(p[-1, 0]), float(p[-1, 1]))
    return [] if _snap_pt(*a) == _snap_pt(*b) else [a, b]


def _path_fragments(p: np.ndarray, other_edges) -> list[tuple[float, float, float, float]]:
    """Split an open path's segments at intersections with `other_edges`."""
    frags = []
    for edge in _path_edges(p):
        x1, y1, x2, y2 = edge
        cuts = sorted(
            {(0.0, x1, y1), (1.0, x2, y2)}
            | set(_split_params(edge, other_edges))
        )
        seen = set()
        path = []
        for _, px_, py_ in cuts:
            key = _snap_pt(px_, py_)
            if key in seen:
                continue
            seen.add(key)
            path.append((px_, py_))
        for a, b in zip(path, path[1:]):
            frags.append((a[0], a[1], b[0], b[1]))
    return frags


def _poly_fragments(rings, other_edges):
    from .geometry import _fragments

    return _fragments(rings, other_edges)


def _net_area(rings: list[np.ndarray]) -> float:
    """Even-odd net area: |outer| - |holes| via normalized orientation."""
    if not rings:
        return 0.0
    return float(sum(_ring_signed_area(r) for r in _normalize_orientation(rings)))


def _contact_points(a_edges, b_edges) -> list[tuple[float, float]]:
    """All points where the two edge sets meet (crossings, vertex touches,
    collinear-overlap endpoints) plus endpoints of either lying on the
    other."""
    pts: dict[tuple[float, float], tuple[float, float]] = {}
    for e in a_edges:
        for _, x, y in _split_params(e, b_edges):
            pts[_snap_pt(x, y)] = (x, y)
        for x, y in ((e[0], e[1]), (e[2], e[3])):
            if _on_boundary(x, y, b_edges) is not None:
                pts[_snap_pt(x, y)] = (x, y)
    for e in b_edges:
        for x, y in ((e[0], e[1]), (e[2], e[3])):
            if _on_boundary(x, y, a_edges) is not None:
                pts[_snap_pt(x, y)] = (x, y)
    return list(pts.values())


def _pt_in_poly(x: float, y: float, rings) -> bool:
    return bool(points_in_polygon(np.array([x]), np.array([y]), rings)[0])


def _pt_row(p, boundary_pts) -> int:
    """Classify a point of a line as boundary (endpoint) or interior."""
    key = _snap_pt(*p)
    return _B if any(_snap_pt(*b) == key for b in boundary_pts) else _I


# --------------------------------------------------------------- dispatchers

def _relate_point_point(a, b) -> str:
    m = _new_m()
    m[_E, _E] = 2
    if _snap_pt(*a) == _snap_pt(*b):
        m[_I, _I] = 0
    else:
        m[_I, _E] = 0
        m[_E, _I] = 0
    return _render(m)


def _relate_point_line(a, line: np.ndarray) -> str:
    p = _path(line)
    edges = _path_edges(p)
    bnd = _path_boundary(p)
    m = _new_m()
    m[_E, _E] = 2
    m[_E, _I] = 1  # a single point can never cover a curve
    x, y = float(a[0]), float(a[1])
    col = None
    if any(_snap_pt(*b) == _snap_pt(x, y) for b in bnd):
        col = _B
    elif _on_boundary(x, y, edges) is not None:
        col = _I
    if col is None:
        m[_I, _E] = 0
    else:
        m[_I, col] = 0
    # line endpoints not equal to the point stay in the point's exterior
    if any(_snap_pt(*b) != _snap_pt(x, y) for b in bnd):
        m[_E, _B] = 0
    return _render(m)


def _relate_point_polygon(a, rings) -> str:
    m = _new_m()
    m[_E, _I] = 2
    m[_E, _B] = 1
    m[_E, _E] = 2
    x, y = float(a[0]), float(a[1])
    edges = _edge_list(rings)
    if _on_boundary(x, y, edges) is not None:
        m[_I, _B] = 0
    elif _pt_in_poly(x, y, rings):
        m[_I, _I] = 0
    else:
        m[_I, _E] = 0
    return _render(m)


def _relate_line_line(a: np.ndarray, b: np.ndarray) -> str:
    pa, pb = _path(a), _path(b)
    ea, eb = _path_edges(pa), _path_edges(pb)
    ba, bb = _path_boundary(pa), _path_boundary(pb)
    m = _new_m()
    m[_E, _E] = 2

    # 1-dim cells: fragments of each path on/off the other
    for x1, y1, x2, y2 in _path_fragments(pa, eb):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, eb) is not None:
            _bump(m, _I, _I, 1)  # collinear overlap is interior x interior
        else:
            _bump(m, _I, _E, 1)
    for x1, y1, x2, y2 in _path_fragments(pb, ea):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, ea) is None:
            _bump(m, _E, _I, 1)

    # 0-dim cells: isolated/contained contact points, classified by which
    # part (interior / endpoint-boundary) of each line they fall on
    for x, y in _contact_points(ea, eb):
        _bump(m, _pt_row((x, y), ba), _pt_row((x, y), bb), 0)

    # endpoints off the other line
    for x, y in ba:
        if _on_boundary(x, y, eb) is None:
            _bump(m, _B, _E, 0)
    for x, y in bb:
        if _on_boundary(x, y, ea) is None:
            _bump(m, _E, _B, 0)
    return _render(m)


def _relate_line_polygon(a: np.ndarray, rings) -> str:
    p = _path(a)
    ea = _path_edges(p)
    ba = _path_boundary(p)
    ep = _edge_list(rings)
    m = _new_m()
    m[_E, _I] = 2  # a curve can never cover an area
    m[_E, _E] = 2

    for x1, y1, x2, y2 in _path_fragments(p, ep):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, ep) is not None:
            _bump(m, _I, _B, 1)
        elif _pt_in_poly(mx, my, rings):
            _bump(m, _I, _I, 1)
        else:
            _bump(m, _I, _E, 1)

    # isolated boundary contacts (touch/cross points not on a collinear run)
    for x, y in _contact_points(ea, ep):
        _bump(m, _pt_row((x, y), ba), _B, 0)

    for x, y in ba:  # line endpoints vs the polygon's three parts
        if _on_boundary(x, y, ep) is not None:
            _bump(m, _B, _B, 0)
        elif _pt_in_poly(x, y, rings):
            _bump(m, _B, _I, 0)
        else:
            _bump(m, _B, _E, 0)

    # polygon boundary not covered by the line
    for x1, y1, x2, y2 in _poly_fragments(rings, ea):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, ea) is None:
            _bump(m, _E, _B, 1)
            break
    return _render(m)


def _relate_polygon_polygon(a_rings, b_rings) -> str:
    m = _new_m()
    m[_E, _E] = 2
    ea, eb = _edge_list(a_rings), _edge_list(b_rings)

    if _net_area(polygon_overlay(a_rings, b_rings, "intersection")) > _EPS:
        m[_I, _I] = 2
    if _net_area(polygon_overlay(a_rings, b_rings, "difference")) > _EPS:
        m[_I, _E] = 2
    if _net_area(polygon_overlay(b_rings, a_rings, "difference")) > _EPS:
        m[_E, _I] = 2

    # A's boundary fragments vs B's parts (open-set argument: a boundary
    # piece meeting an open interior/exterior does so along an interval)
    for x1, y1, x2, y2 in _poly_fragments(a_rings, eb):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, eb) is not None:
            _bump(m, _B, _B, 1)
        elif _pt_in_poly(mx, my, b_rings):
            _bump(m, _B, _I, 1)
        else:
            _bump(m, _B, _E, 1)
    for x1, y1, x2, y2 in _poly_fragments(b_rings, ea):
        mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        if _on_boundary(mx, my, ea) is not None:
            continue  # counted from A's side
        if _pt_in_poly(mx, my, a_rings):
            _bump(m, _I, _B, 1)
        else:
            _bump(m, _E, _B, 1)

    # isolated boundary-touch points (corner contacts with no shared run)
    if m[_B, _B] < 0 and _contact_points(ea, eb):
        m[_B, _B] = 0
    return _render(m)


def _relate_multipoint(mp, b) -> str:
    """DE-9IM of a finite point set vs a simple geometry, combined from the
    per-point matrices: interior(A) = the union of points, so row 0 is the
    entrywise MAX of per-point rows; boundary(A) is empty (row 1 = FFF);
    exterior(A) removes only finitely many points, so row 2 is the
    entrywise MIN (a dim only drops when b's part is itself one of the
    points). MultiLine/GeometryCollection have no combined relate (their
    mod-2 boundary is not per-part decomposable) — use the decomposed
    predicates (intersects) or relate the parts directly."""
    mats = [relate(p, b) for p in _parts(mp)]
    vals = {"F": -1, "0": 0, "1": 1, "2": 2}
    inv = {-1: "F", 0: "0", 1: "1", 2: "2"}
    out = []
    for c in range(3):
        out.append(inv[max(vals[m[0 * 3 + c]] for m in mats)])
    out += ["F", "F", "F"]
    for c in range(3):
        out.append(inv[min(vals[m[2 * 3 + c]] for m in mats)])
    return "".join(out)


def relate(a, b) -> str:
    """DE-9IM matrix of two geometries (point / line / polygon /
    multipoint forms; multiline and collections decompose via _parts for
    the intersects predicate only)."""
    ka, kb = _kind(a), _kind(b)
    if ka == "multipoint":
        return _relate_multipoint(a, b)
    if kb == "multipoint":
        return _transpose(_relate_multipoint(b, a))
    if ka in ("multiline", "collection") or kb in ("multiline", "collection"):
        raise NotImplementedError(
            "combined DE-9IM for multiline/collection is not defined here; "
            "relate the parts (relate._parts) or use intersects()")
    if ka == "point" and kb == "point":
        return _relate_point_point(a, b)
    if ka == "point" and kb == "line":
        return _relate_point_line(a, b)
    if ka == "point" and kb == "polygon":
        return _relate_point_polygon(a, b)
    if ka == "line" and kb == "line":
        return _relate_line_line(a, b)
    if ka == "line" and kb == "polygon":
        return _relate_line_polygon(a, b)
    if ka == "polygon" and kb == "polygon":
        return _relate_polygon_polygon(a, b)
    # remaining pairs by transposition
    return _transpose(relate(b, a))


# ----------------------------------------------------------- batch / Spark

def relate_points_polygon(px, py, rings) -> np.ndarray:
    """Vectorized point-x-polygon relate: one matrix string per point.
    Same classification as `relate((x, y), rings)` (boundary-first, then
    even-odd interior), fused over a NumPy batch for mapInPandas use."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    on_b = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        on_b |= points_segments_distance(px, py, ring) <= _EPS
    inside = ~on_b & points_in_polygon(px, py, rings)
    out = np.where(on_b, "F0FFFF212", np.where(inside, "0FFFFF212", "FF0FFF212"))
    return out.astype(object)


# ------------------------------------------------------------- predicates

def matches(matrix: str, pattern: str) -> bool:
    """JTS-style pattern match: T = any non-empty, F = empty, * = any,
    0/1/2 = exact dimension."""
    if len(matrix) != 9 or len(pattern) != 9:
        raise ValueError("matrix and pattern must be 9 characters")
    for mc, pc in zip(matrix, pattern):
        if pc == "*":
            continue
        if pc == "T" and mc == "F":
            return False
        if pc == "F" and mc != "F":
            return False
        if pc in "012" and mc != pc:
            return False
    return True


def _dim_of(g) -> int:
    return {"point": 0, "line": 1, "polygon": 2}[_kind(g)]


def equals_topo(a, b) -> bool:
    return matches(relate(a, b), "T*F**FFF*")


def disjoint(a, b) -> bool:
    return matches(relate(a, b), "FF*FF****")


def intersects(a, b) -> bool:
    ka, kb = _kind(a), _kind(b)
    if ka in ("multiline", "collection", "multipoint") or kb in (
            "multiline", "collection", "multipoint"):
        # set union on either side: intersects decomposes exactly
        return any(
            intersects(pa, pb) for pa in _parts(a) for pb in _parts(b))
    return not disjoint(a, b)


def touches(a, b) -> bool:
    m = relate(a, b)
    return (
        matches(m, "FT*******")
        or matches(m, "F**T*****")
        or matches(m, "F***T****")
    )


def within(a, b) -> bool:
    return matches(relate(a, b), "T*F**F***")


def contains(a, b) -> bool:
    return within(b, a)


def covers(a, b) -> bool:
    m = relate(a, b)
    return (
        matches(m, "T*****FF*")
        or matches(m, "*T****FF*")
        or matches(m, "***T**FF*")
        or matches(m, "****T*FF*")
    )


def covered_by(a, b) -> bool:
    return covers(b, a)


def crosses(a, b) -> bool:
    da, db = _dim_of(a), _dim_of(b)
    m = relate(a, b)
    if da < db:
        return matches(m, "T*T******")
    if da > db:
        return matches(m, "T*****T**")
    if da == 1:  # line x line
        return matches(m, "0********")
    return False


def overlaps(a, b) -> bool:
    da, db = _dim_of(a), _dim_of(b)
    if da != db:
        return False
    m = relate(a, b)
    if da == 1:
        return matches(m, "1*T***T**")
    return matches(m, "T*T***T**")
