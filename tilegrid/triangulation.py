"""Delaunay triangulation + Voronoi dual (from scratch, Bowyer-Watson).

Reference: vector/src/main/scala/geotrellis/vector/triangulation/ (Delaunay
via JTS in the 1.0 era) — a per-collection algorithm there too, not a
distributed one. Here: an O(n^2) incremental Bowyer-Watson over a point
array (robust enough with double arithmetic for non-adversarial inputs),
plus the Voronoi dual (circumcenters + shared-edge adjacency). The
distributed form is per-group triangulation inside applyInPandas
(operators.vector.delaunay_per_group): each group (tile cell, region id,
...) triangulates its own points — the shape a TIN-per-partition pipeline
needs.
"""

from __future__ import annotations

import numpy as np


def _circumcircle(ax, ay, bx, by, cx, cy):
    """(center x, center y, radius^2) of the triangle's circumcircle."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return np.nan, np.nan, np.inf  # degenerate: swallow everything
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def delaunay(points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Delaunay triangulation of (n, 2) points (Bowyer-Watson incremental
    insertion). Returns (pts, tris): the deduplicated lexicographically-
    sorted points and (m, 3) int triangles indexing into them. Inputs with
    < 3 distinct points return zero triangles."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 3:
        return pts, np.empty((0, 3), dtype=np.int64)
    # super-triangle FAR outside all circumcircles of hull triangles — a
    # small multiplier (e.g. 64x) silently drops hull-adjacent triangles
    # whose circumcircles reach the super vertices (measured: 40/49
    # triangles on a jittered grid at 64x, complete at 1e4x)
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0) * 1e6
    sp = np.array(
        [[cx - span, cy - span], [cx + span, cy - span], [cx, cy + span]]
    )
    allp = np.vstack([pts, sp])
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    circ: list[tuple[float, float, float]] = [
        _circumcircle(*allp[s0], *allp[s1], *allp[s2])
    ]
    for i in range(n):
        px, py = allp[i]
        bad = []
        for t_i, (ux, uy, r2) in enumerate(circ):
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2:
                bad.append(t_i)
        # boundary polygon of the bad-triangle cavity: edges used once
        edge_count: dict[tuple[int, int], int] = {}
        for t_i in bad:
            a, b, c = tris[t_i]
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t_i in sorted(bad, reverse=True):
            tris.pop(t_i)
            circ.pop(t_i)
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                tris.append((a, b, i))
                circ.append(_circumcircle(*allp[a], *allp[b], *allp[i]))
    out = [t for t in tris if max(t) < n]
    return pts, np.asarray(out, dtype=np.int64).reshape(-1, 3)


def voronoi_edges(points: np.ndarray) -> np.ndarray:
    """Finite Voronoi edges as the Delaunay dual: for each pair of
    triangles sharing an edge, the segment between their circumcenters.
    Returns (k, 4) rows (x1, y1, x2, y2). Hull-adjacent infinite rays are
    omitted (clip against an extent downstream if needed)."""
    pts, tris = delaunay(points)
    if len(tris) == 0:
        return np.empty((0, 4))
    centers = np.array(
        [_circumcircle(*pts[a], *pts[b], *pts[c])[:2] for a, b, c in tris]
    )
    owner: dict[tuple[int, int], int] = {}
    segs = []
    for t_i, (a, b, c) in enumerate(tris):
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            if k in owner:
                o = owner[k]
                segs.append(
                    (centers[o, 0], centers[o, 1], centers[t_i, 0], centers[t_i, 1])
                )
            else:
                owner[k] = t_i
    return np.asarray(segs, dtype=np.float64).reshape(-1, 4)
