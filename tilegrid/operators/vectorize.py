"""Raster -> vector: per-tile region grouping + boundary tracing, and
raster-to-points explode.

Reference: Vectorize (raster/.../vectorize/Vectorize.scala:30-148) =
RegionGroup connected-components labelling + Polygonizer boundary tracing.
We implement two-pass union-find labelling and a pixel-edge boundary walk in
NumPy per tile. Cross-tile regions are per-tile first (the documented
limitation in SURVEY.md §2.10); stitch-level vectorize is available through
reshape.stitch for bounded extents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec
from ..geometry import wkb_encode_polygon
from ..grid import LayoutDefinition


def region_group(arr: np.ndarray, connectivity: int = 4) -> np.ndarray:
    """Label connected components of equal value (NoData = unlabelled, -1).
    Two-pass union-find, vectorized row merging."""
    h, w = arr.shape
    labels = np.full((h, w), -1, dtype=np.int64)
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 0
    for i in range(h):
        for j in range(w):
            v = arr[i, j]
            if np.isnan(v):
                continue
            left = j > 0 and not np.isnan(arr[i, j - 1]) and arr[i, j - 1] == v
            up = i > 0 and not np.isnan(arr[i - 1, j]) and arr[i - 1, j] == v
            if left and up:
                labels[i, j] = labels[i, j - 1]
                union(int(labels[i, j - 1]), int(labels[i - 1, j]))
            elif left:
                labels[i, j] = labels[i, j - 1]
            elif up:
                labels[i, j] = labels[i - 1, j]
            else:
                labels[i, j] = nxt
                parent.append(nxt)
                nxt += 1
    if nxt:
        roots = np.array([find(a) for a in range(nxt)], dtype=np.int64)
        # compact ids
        uniq, inv = np.unique(roots, return_inverse=True)
        remap = inv.astype(np.int64)
        m = labels >= 0
        labels[m] = remap[labels[m]]
    return labels


def _region_outline(mask: np.ndarray, ext, cols: int, rows: int) -> np.ndarray:
    """Trace the exterior outline of a pixel region as a closed ring of
    pixel-edge vertices in map coords (axis-aligned, exact)."""
    cw, ch = ext.width / cols, ext.height / rows
    # boundary edges: between a region pixel and a non-region pixel
    edges = set()
    idx = np.argwhere(mask)
    for i, j in idx:
        # corners in pixel-grid coords (x=j, y=i; y axis down)
        if i == 0 or not mask[i - 1, j]:
            edges.add(((j, i), (j + 1, i)))
        if i == rows - 1 or not mask[i + 1, j]:
            edges.add(((j + 1, i + 1), (j, i + 1)))
        if j == 0 or not mask[i, j - 1]:
            edges.add(((j, i + 1), (j, i)))
        if j == cols - 1 or not mask[i, j + 1]:
            edges.add(((j + 1, i), (j + 1, i + 1)))
    if not edges:
        return np.empty((0, 2))
    # walk the exterior ring starting from the topmost-leftmost vertex
    nxt: dict[tuple, list] = {}
    for a, b in edges:
        nxt.setdefault(a, []).append(b)
    start = min(nxt.keys(), key=lambda p: (p[1], p[0]))
    ring = [start]
    cur = start
    prev = None
    while True:
        outs = nxt[cur]
        cand = [o for o in outs if o != prev] or outs
        nxt_pt = cand[0]
        if nxt_pt == start:
            break
        ring.append(nxt_pt)
        prev, cur = cur, nxt_pt
        if len(ring) > 4 * len(edges):
            break  # safety
    r = np.array(ring, dtype=np.float64)
    # pixel-grid -> map coords
    out = np.empty_like(r)
    out[:, 0] = ext.xmin + r[:, 0] * cw
    out[:, 1] = ext.ymax - r[:, 1] * ch
    return out


def vectorize(layer: DataFrame, layout: LayoutDefinition) -> DataFrame:
    """Tile -> polygon features: (zoom, col, row, region_id, value, wkb,
    n_pixels). Exterior rings only (holes become separate regions of the
    hole's value, matching even-odd downstream use)."""
    mt = layout.map_transform

    def run(it):
        for pdf in it:
            rows_out = {
                "zoom": [], "col": [], "row": [], "region_id": [], "value": [],
                "wkb": [], "n_pixels": [],
            }
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                labels = region_group(arr)
                ext = mt.extent_for_key(int(t.col), int(t.row))
                h, w = arr.shape
                for rid in range(labels.max() + 1 if labels.size else 0):
                    m = labels == rid
                    if not m.any():
                        continue
                    ring = _region_outline(m, ext, w, h)
                    if len(ring) < 3:
                        continue
                    i, j = np.argwhere(m)[0]
                    rows_out["zoom"].append(int(t.zoom))
                    rows_out["col"].append(int(t.col))
                    rows_out["row"].append(int(t.row))
                    rows_out["region_id"].append(int(rid))
                    rows_out["value"].append(float(arr[i, j]))
                    rows_out["wkb"].append(wkb_encode_polygon([ring]))
                    rows_out["n_pixels"].append(int(m.sum()))
            yield pd.DataFrame(rows_out)

    return layer.mapInPandas(
        run,
        "zoom int, col int, row int, region_id int, value double, wkb binary, n_pixels long",
    )


def raster_to_points(layer: DataFrame, layout: LayoutDefinition) -> DataFrame:
    """Each data cell -> (x, y, value) point row (RasterToPoints.scala).
    Columnar explode: one DataFrame row per pixel, built as flat arrays."""
    mt = layout.map_transform

    def run(it):
        for pdf in it:
            xs, ys, vs, cols_, rows_ = [], [], [], [], []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = arr.shape
                ext = mt.extent_for_key(int(t.col), int(t.row))
                cw, ch = ext.width / w, ext.height / h
                ii, jj = np.nonzero(~np.isnan(arr))
                xs.append(ext.xmin + (jj + 0.5) * cw)
                ys.append(ext.ymax - (ii + 0.5) * ch)
                vs.append(arr[ii, jj])
                cols_.append(np.full(len(ii), t.col, dtype=np.int64))
                rows_.append(np.full(len(ii), t.row, dtype=np.int64))
            if xs:
                yield pd.DataFrame(
                    {
                        "col": np.concatenate(cols_),
                        "row": np.concatenate(rows_),
                        "x": np.concatenate(xs),
                        "y": np.concatenate(ys),
                        "value": np.concatenate(vs),
                    }
                )

    return layer.mapInPandas(run, "col int, row int, x double, y double, value double")
