"""Iterative raster propagation: cost distance, hydrology (fill / D8 flow
direction / flow accumulation), viewshed, euclidean distance.

Reference counterparts (semantics matched exactly; execution redesigned for
Spark):
  * CostDistance (raster/.../costdistance/CostDistance.scala:43-66,117-216):
    single-tile Dijkstra with edge cost factor(dir) * (f_a + f_b) / 2
    (factor = sqrt(2) on diagonals). The reference's "around the corner"
    refinement (CostDistance.scala:128-158) only accelerates its queue — the
    converged fixpoint equals plain shortest-path distance, which is what
    both our engine and the oracle compute. Distributed here as BLOCK
    DIJKSTRA: each tile solves Dijkstra over its 1-cell-buffered array
    seeded by in-tile sources plus boundary-distance offers from neighbor
    tiles; offers iterate (monotonically decreasing) until no offer
    improves. Rounds ~= max number of tile-boundary crossings of any
    shortest path — the delta-stepping-style shape that survives 1000
    executors because every round is one groupBy over (zoom,col,row).
  * Fill (raster/.../hydrology/Fill.scala:37-99): pure focal op — a cell
    whose 8 in-bounds neighbors ALL differ by more than `threshold` is a
    sink and becomes the neighbor mean; one BufferTiles pass.
  * FlowDirection (raster/.../hydrology/FlowDirection.scala:36-106): pure
    focal op — Greenlee bit encoding (E=1, SE=2, S=4, SW=8, W=16, NW=32,
    N=64, NE=128), drop = (center - neighbor) / distance with distance
    sqrt(2) on diagonals, ties sum their bits, sinks (all drops < 0) are
    NODATA (NaN here).
  * Accumulation (raster/.../hydrology/Accumulation.scala:29-216): the
    reference walks a driver-side stack; the recurrence is
    acc(c) = sum over inflowing neighbors n of (acc(n) + 1). Distributed
    here as iterative per-tile topological sweeps (Kahn) exchanging
    boundary contributions until the cross-tile fixpoint — the same
    hash-min/label-propagation shape vectorize_merged uses.
  * Viewshed (raster/.../viewshed/Viewshed.scala:26-126): per-tile op in the
    reference too (it takes a single Tile); we run one vectorized NumPy
    pass per tile inside mapInPandas — embarrassingly parallel across
    tiles, bit-faithful to the reference's two inclusive sweeps, its
    exact-integer interpolation branch, and its `height >= required - 0.5`
    visibility test.
  * EuclideanDistanceTile (raster/.../distance/EuclideanDistanceTile.scala:
    26-46): distance from every pixel CENTER to the nearest input point.
    The reference rasterizes Voronoi cells; relationally the same result is
    min over points of the pixel-center distance — here a vectorized
    per-tile pass against the (small, broadcast) point set; at 10^6+ points
    the candidate set per tile comes from the existing cell-ring kNN
    (operators.join.knn_join_df) instead of a full broadcast.

All kernels are NaN-aware float64; NODATA == NaN throughout.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_encode
from ..grid import LayoutDefinition
from . import LAYER_SCHEMA
from .focal import _assemble, buffer_parts

SQRT2 = 1.4142135623730951

# Greenlee direction encoding: bit -> (dcol, drow); drow grows southward
# (FlowDirection.scala:61-71).
DIR_OFFSETS = {
    1: (1, 0), 2: (1, 1), 4: (0, 1), 8: (-1, 1),
    16: (-1, 0), 32: (-1, -1), 64: (0, -1), 128: (1, -1),
}


def _tile_meta(pdf: pd.DataFrame) -> tuple[int, int, int]:
    first = pdf.iloc[0]
    return int(first["zoom"]), int(first["tcol"]), int(first["trow"])


def _layer_row(zoom: int, col: int, row: int, arr: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "zoom": [zoom], "col": [col], "row": [row],
            "cell": [int(z2_encode(col, row))],
            "tile": [codec.raw_encode(np.ascontiguousarray(arr))],
            "h": [arr.shape[0]], "w": [arr.shape[1]], "fmt": ["raw"],
        }
    )


def _empty_layer_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {c: [] for c in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
    )


def _neighbor_stack(buf: np.ndarray, h: int, w: int):
    """(8, h, w) neighbor values + per-dir distance weights from a 1-cell
    buffered array; order follows DIR_OFFSETS iteration."""
    bits, vals, dists = [], [], []
    for bit, (dc, dr) in DIR_OFFSETS.items():
        vals.append(buf[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w])
        dists.append(SQRT2 if dc != 0 and dr != 0 else 1.0)
        bits.append(bit)
    return np.array(bits), np.stack(vals), np.array(dists)


# ------------------------------------------------------------------ fill

def fill(layer: DataFrame, threshold: float = 20.0) -> DataFrame:
    """Sink fill (Fill.scala:37-99): cells whose in-bounds neighbors ALL
    differ from the center by more than `threshold` become the neighbor
    mean; everything else passes through. One BufferTiles(1) pass."""
    parts = buffer_parts(layer, 1)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf, 1)
        if asm is None:
            return _empty_layer_pdf()
        buf, h, w = asm
        center = buf[1 : 1 + h, 1 : 1 + w]
        _, nb, _ = _neighbor_stack(buf, h, w)
        avail = ~np.isnan(nb)
        with np.errstate(invalid="ignore"):
            differs = avail & (np.abs(nb - center[None]) > threshold)
        total = avail.sum(axis=0)
        nsum = np.where(avail, nb, 0.0).sum(axis=0)
        all_differ = (differs.sum(axis=0) == total) & (total > 0)
        out = np.where(all_differ, nsum / np.maximum(total, 1), center)
        out = np.where(np.isnan(center), np.nan, out)
        zoom, col, row = _tile_meta(pdf)
        return _layer_row(zoom, col, row, out)

    return parts.groupBy("zoom", "tcol", "trow").applyInPandas(run, LAYER_SCHEMA)


# -------------------------------------------------------- flow direction

def _flow_direction_array(buf: np.ndarray, h: int, w: int) -> np.ndarray:
    """D8 direction bitmask for the interior of a 1-cell buffered array.
    NaN = NODATA (sink or NoData center)."""
    center = buf[1 : 1 + h, 1 : 1 + w]
    bits, nb, dists = _neighbor_stack(buf, h, w)
    avail = ~np.isnan(nb)
    with np.errstate(invalid="ignore"):
        drop = (center[None] - nb) / dists[:, None, None]
    drop = np.where(avail, drop, -np.inf)
    dmax = drop.max(axis=0)
    is_tie = drop == dmax[None]
    code = (is_tie * bits[:, None, None]).sum(axis=0).astype(np.float64)
    sink = dmax < 0  # all in-bounds drops negative (FlowDirection.isSink)
    nodata = np.isnan(center) | sink | ~avail.any(axis=0)
    return np.where(nodata, np.nan, code)


def flow_direction(layer: DataFrame) -> DataFrame:
    """D8 flow direction (FlowDirection.scala:36-106) as a BufferTiles(1)
    focal pass. Output float tiles holding the Greenlee bitmask; sinks and
    NoData cells are NaN."""
    parts = buffer_parts(layer, 1)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf, 1)
        if asm is None:
            return _empty_layer_pdf()
        buf, h, w = asm
        zoom, col, row = _tile_meta(pdf)
        return _layer_row(zoom, col, row, _flow_direction_array(buf, h, w))

    return parts.groupBy("zoom", "tcol", "trow").applyInPandas(run, LAYER_SCHEMA)


# ----------------------------------------------------- flow accumulation

def _targets_of(code: float) -> list[tuple[int, int]]:
    """Decode a Greenlee bitmask into (dc, dr) offsets (multi-bit on ties —
    Accumulation.doesFlow semantics)."""
    if np.isnan(code):
        return []
    c = int(code)
    return [off for bit, off in DIR_OFFSETS.items() if c & bit]


def _local_accumulation(
    dirs: np.ndarray, inflow: np.ndarray
) -> tuple[np.ndarray, list[tuple[int, int, float]]]:
    """Kahn topological sweep of one tile's in-tile flow DAG.

    dirs: (h, w) Greenlee bitmask (NaN = sink/NoData). inflow: (h, w)
    external contributions (sum of upstream acc+1 entering each cell from
    other tiles). Returns (acc array, list of (px, py, value) boundary
    emissions where value = acc + 1 and px/py are OUT-OF-TILE offsets
    relative to this tile's origin — the caller maps them to neighbor
    keys). Cells on unresolvable cycles (flat ties looping) stay NaN, like
    the reference which never terminates on them — we fail soft instead."""
    h, w = dirs.shape
    targets: list[list[list[tuple[int, int]]]] = [
        [_targets_of(dirs[y, x]) for x in range(w)] for y in range(h)
    ]
    indeg = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            for dc, dr in targets[y][x]:
                tx, ty = x + dc, y + dr
                if 0 <= tx < w and 0 <= ty < h:
                    indeg[ty, tx] += 1
    acc = inflow.astype(np.float64).copy()
    done = np.zeros((h, w), dtype=bool)
    queue = [(y, x) for y in range(h) for x in range(w) if indeg[y, x] == 0]
    emits: list[tuple[int, int, float]] = []
    while queue:
        y, x = queue.pop()
        done[y, x] = True
        contribution = acc[y, x] + 1.0
        for dc, dr in targets[y][x]:
            tx, ty = x + dc, y + dr
            if 0 <= tx < w and 0 <= ty < h:
                acc[ty, tx] += contribution
                indeg[ty, tx] -= 1
                if indeg[ty, tx] == 0:
                    queue.append((ty, tx))
            else:
                emits.append((tx, ty, contribution))
    acc[~done] = np.nan  # in-tile cycles (flat ties): unresolvable
    return acc, emits


_INFLOW_SCHEMA = "zoom int, col int, row int, px int, py int, v double"


def flow_accumulation(
    dir_layer: DataFrame, max_rounds: int = 64, final: bool = True
) -> DataFrame:
    """D8 flow accumulation (Accumulation.scala:29-216):
    acc(c) = sum over inflowing neighbors n of (acc(n) + 1), distributed as
    iterative per-tile Kahn sweeps exchanging boundary contributions.

    Round k: every tile runs a local topological sweep seeded by the
    accumulated external inflows, then emits (neighbor tile, px, py,
    acc+1) rows for flow leaving the tile. Inflows grow monotonically to
    the cross-tile fixpoint; convergence = boundary emission (count, sum)
    unchanged — checked with one tiny driver aggregate per round, exactly
    the vectorize_merged label-propagation loop shape. Rounds needed = max
    tile-boundary crossings of any flow path (<= layout diameter)."""
    spark = dir_layer.sparkSession
    # one-time hash partitioning on the group key: per-round cogroups then
    # shuffle only the small inflow rows (see cost_distance's note)
    tiles = dir_layer.repartition(
        spark.sparkContext.defaultParallelism, "zoom", "col", "row"
    ).persist()

    def sweep(emit_layer: bool):
        def run(tile_pdf: pd.DataFrame, inflow_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(tile_pdf) == 0:
                return (
                    _empty_layer_pdf() if emit_layer
                    else pd.DataFrame({c: [] for c in (
                        "zoom", "col", "row", "px", "py", "v")})
                )
            t = tile_pdf.iloc[0]
            zoom, col, row = int(t["zoom"]), int(t["col"]), int(t["row"])
            dirs = codec.decode_tile(bytes(t["tile"]), t["fmt"]).astype(np.float64)
            h, w = dirs.shape
            inflow = np.zeros((h, w), dtype=np.float64)
            for r in inflow_pdf.itertuples(index=False):
                inflow[int(r.py), int(r.px)] += float(r.v)
            acc, emits = _local_accumulation(dirs, inflow)
            if emit_layer:
                return _layer_row(zoom, col, row, acc)
            out = {"zoom": [], "col": [], "row": [], "px": [], "py": [], "v": []}
            for ex, ey, v in emits:
                ncol, nrow = col + (1 if ex >= w else (-1 if ex < 0 else 0)), \
                    row + (1 if ey >= h else (-1 if ey < 0 else 0))
                out["zoom"].append(zoom)
                out["col"].append(ncol)
                out["row"].append(nrow)
                out["px"].append(ex % w)
                out["py"].append(ey % h)
                out["v"].append(v)
            return pd.DataFrame(out)
        return run

    inflows = spark.createDataFrame([], _INFLOW_SCHEMA)
    prev = (-1, 0.0)
    for _ in range(max_rounds):
        # localCheckpoint, not persist: cuts lineage so the plan stays O(1)
        # per round instead of growing with round count (see the rationale
        # comment in vectorize._merged_labels)
        new_inflows = (
            tiles.groupBy("zoom", "col", "row")
            .cogroup(inflows.groupBy("zoom", "col", "row"))
            .applyInPandas(sweep(emit_layer=False), _INFLOW_SCHEMA)
            .localCheckpoint()
        )
        agg = new_inflows.agg(
            F.count("*").alias("n"), F.sum("v").alias("s")
        ).collect()[0]
        cur = (int(agg["n"] or 0), float(agg["s"] or 0.0))
        inflows = new_inflows
        if cur == prev:
            break
        prev = cur
    if not final:
        return inflows
    return (
        tiles.groupBy("zoom", "col", "row")
        .cogroup(inflows.groupBy("zoom", "col", "row"))
        .applyInPandas(sweep(emit_layer=True), LAYER_SCHEMA)
    )


# --------------------------------------------------------- cost distance

def _local_dijkstra(
    friction: np.ndarray, seeds: list[tuple[int, int, float]]
) -> np.ndarray:
    """Dijkstra over one (buffered) friction array. Edge cost from a to b is
    factor * (f_a + f_b) / 2 with factor sqrt(2) on diagonals
    (CostDistance.scala:196-208). NaN friction blocks the cell. Returns the
    distance array (inf where unreachable)."""
    h, w = friction.shape
    dist = np.full((h, w), np.inf)
    pq: list[tuple[float, int, int]] = []
    for y, x, d in seeds:
        if d < dist[y, x]:
            dist[y, x] = d
            heapq.heappush(pq, (d, y, x))
    offs = [(dc, dr, SQRT2 if dc and dr else 1.0)
            for bit, (dc, dr) in DIR_OFFSETS.items()]
    while pq:
        d, y, x = heapq.heappop(pq)
        if d > dist[y, x]:
            continue
        fa = friction[y, x]
        if np.isnan(fa):
            continue
        for dc, dr, factor in offs:
            ty, tx = y + dr, x + dc
            if not (0 <= ty < h and 0 <= tx < w):
                continue
            fb = friction[ty, tx]
            if np.isnan(fb):
                continue
            nd = d + factor * (fa + fb) / 2.0
            if nd < dist[ty, tx]:
                dist[ty, tx] = nd
                heapq.heappush(pq, (nd, ty, tx))
    return dist


_OFFER_SCHEMA = "zoom int, col int, row int, bx int, by int, d double"


def cost_distance(
    friction_layer: DataFrame,
    sources: list[tuple[int, int]],
    layout: LayoutDefinition,
    max_rounds: int = 64,
) -> DataFrame:
    """Accumulated-cost surface (CostDistance.scala:43-66) from global-pixel
    `sources` [(gx, gy), ...] over a friction layer, distributed as block
    Dijkstra: each tile solves Dijkstra on its 1-cell-buffered friction
    array seeded by in-tile sources + boundary offers from neighbors, then
    offers its border distances back; offers decrease monotonically to the
    global shortest-path fixpoint. Convergence = offer (count, min-sum)
    fingerprint unchanged. Returns the cost layer (NaN = unreachable)."""
    spark = friction_layer.sparkSession
    tw = layout.tile_layout.tile_cols
    th = layout.tile_layout.tile_rows
    src_by_tile: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for gx, gy in sources:
        src_by_tile.setdefault((gx // tw, gy // th), []).append((gx % tw, gy % th))
    parts = buffer_parts(friction_layer, 1).persist()

    def solve(emit_layer: bool):
        def run(part_pdf: pd.DataFrame, offer_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(part_pdf) == 0:
                return (
                    _empty_layer_pdf() if emit_layer
                    else pd.DataFrame({c: [] for c in (
                        "zoom", "col", "row", "bx", "by", "d")})
                )
            asm = _assemble(part_pdf, 1)
            if asm is None:
                return (
                    _empty_layer_pdf() if emit_layer
                    else pd.DataFrame({c: [] for c in (
                        "zoom", "col", "row", "bx", "by", "d")})
                )
            buf, h, w = asm
            first = part_pdf.iloc[0]
            zoom, col, row = int(first["zoom"]), int(first["col"]), int(first["row"])
            seeds = [(py + 1, px + 1, 0.0)
                     for px, py in src_by_tile.get((col, row), [])]
            for r in offer_pdf.itertuples(index=False):
                seeds.append((int(r.by), int(r.bx), float(r.d)))
            dist = _local_dijkstra(buf, seeds)
            if emit_layer:
                interior = dist[1 : 1 + h, 1 : 1 + w]
                out = np.where(np.isinf(interior), np.nan, interior)
                return _layer_row(zoom, col, row, out)
            # offer border-cell distances into each adjacent neighbor's
            # buffered coordinates
            out = {"zoom": [], "col": [], "row": [], "bx": [], "by": [], "d": []}
            for py in range(h):
                for px in range(w):
                    if 0 < px < w - 1 and 0 < py < h - 1:
                        continue
                    d = dist[py + 1, px + 1]
                    if not np.isfinite(d):
                        continue
                    for dx in (-1, 0, 1):
                        for dy in (-1, 0, 1):
                            if dx == 0 and dy == 0:
                                continue
                            # neighbor (col+dx, row+dy) sees our (px,py) at
                            # buffered coords (px - dx*w + 1, py - dy*h + 1)
                            bx = px - dx * w + 1
                            by = py - dy * h + 1
                            if 0 <= bx <= w + 1 and 0 <= by <= h + 1:
                                out["zoom"].append(zoom)
                                out["col"].append(col + dx)
                                out["row"].append(row + dy)
                                out["bx"].append(bx)
                                out["by"].append(by)
                                out["d"].append(float(d))
            return pd.DataFrame(out)
        return run

    def regroup(df: DataFrame) -> DataFrame:
        # keep only the best offer per (tile, buffered cell)
        return df.groupBy("zoom", "col", "row", "bx", "by").agg(
            F.min("d").alias("d")
        )

    key = ["zoom", "col", "row"]
    # pre-hash-partition the heavy buffered-tile side ONCE: cogroup needs
    # ClusteredDistribution(key), which HashPartitioning(key, N) already
    # satisfies, so every round's cogroup shuffles only the tiny offer
    # table instead of re-exchanging the tile bytes each iteration
    part_keyed = (
        parts.withColumnRenamed("tcol", "col")
        .withColumnRenamed("trow", "row")
        .repartition(spark.sparkContext.defaultParallelism, *key)
        .persist()
    )
    offers = spark.createDataFrame([], _OFFER_SCHEMA)
    prev = (-1, 0.0)
    for _ in range(max_rounds):
        # localCheckpoint, not persist: keeps the per-round plan O(1)
        # (see vectorize._merged_labels rationale comment)
        new_offers = regroup(
            part_keyed.groupBy(*key)
            .cogroup(offers.groupBy(*key))
            .applyInPandas(solve(emit_layer=False), _OFFER_SCHEMA)
        ).localCheckpoint()
        agg = new_offers.agg(
            F.count("*").alias("n"), F.sum("d").alias("s")
        ).collect()[0]
        cur = (int(agg["n"] or 0), float(agg["s"] or 0.0))
        offers = new_offers
        if abs(cur[1] - prev[1]) < 1e-9 and cur[0] == prev[0]:
            break
        prev = cur
    return (
        part_keyed.groupBy(*key)
        .cogroup(offers.groupBy(*key))
        .applyInPandas(solve(emit_layer=True), LAYER_SCHEMA)
    )


# -------------------------------------------------------------- viewshed

def viewshed_array(dem: np.ndarray, sc: int, sr: int) -> np.ndarray:
    """Reference-faithful per-tile viewshed (Viewshed.scala:26-126),
    vectorized: required(col,row) = max over the two inclusive sweeps of
    the extrapolated grazing height; visible iff
    dem[sr,sc] >= required - 0.5. Returns a 0/1 float array."""
    h, w = dem.shape
    vp = dem[sr, sc]
    rows = np.arange(h)
    cols = np.arange(w)
    required = np.full((h, w), -np.inf)

    def sweep(grid: np.ndarray, p0: int, c0: int):
        # generic sweep: grid is (primary, cross); the viewpoint sits at
        # (p0, c0); intermediates t run along the primary axis and the
        # cross coordinate interpolates between adjacent cells
        primary_len, cross_len = grid.shape
        P = np.arange(primary_len, dtype=np.float64)  # target primary
        T = np.arange(primary_len, dtype=np.float64)  # intermediate
        C = np.arange(cross_len, dtype=np.float64)    # target cross
        # t in [min(p0, p)+1, max(p0, p)], t != p (t == p is the reference's
        # division-by-zero NaN no-op, Viewshed.scala:80-90)
        lo = np.minimum(p0, P)[:, None] + 1
        hi = np.maximum(p0, P)[:, None]
        valid = (T[None, :] >= lo) & (T[None, :] <= hi) & (T[None, :] != P[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = (T[None, :] - p0) / (P[:, None] - p0)      # (P, T)
            x = frac[:, None, :] * (C[None, :, None] - c0) + c0  # (P, C, T)
            xi = np.floor(x)
            exact = x == xi
            # rows with target-primary == viewpoint-primary are masked out by
            # `valid` below; squash their NaN/inf indices to 0 first so the
            # int cast stays defined
            xi0 = np.clip(
                np.nan_to_num(xi, nan=0.0, posinf=0.0, neginf=0.0).astype(np.int64),
                0, cross_len - 1)
            xi1 = np.clip(xi0 + 1, 0, cross_len - 1)
        t_idx = np.broadcast_to(np.arange(primary_len)[None, None, :], x.shape)
        z0 = grid[t_idx, xi0]
        z1 = grid[t_idx, xi1]
        with np.errstate(invalid="ignore"):
            z = np.where(exact, z0, (xi + 1 - x) * z0 + (x - xi) * z1)
            height = grid[:, :, None]                         # (P, C, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            req = (p0 - P[:, None, None]) / (T[None, None, :] - P[:, None, None]) \
                * (z - height) + height
        req = np.where(valid[:, None, :], req, -np.inf)
        req = np.where(np.isnan(req), -np.inf, req)  # NaN contribs skipped
        return req.max(axis=2)                        # (P, C)

    # row sweep: primary = row, cross = col
    req_rows = sweep(dem, sr, sc)
    # col sweep: primary = col, cross = row
    req_cols = sweep(dem.T, sc, sr)
    required = np.maximum(req_rows, req_cols.T)
    with np.errstate(invalid="ignore"):
        vis = vp >= required - 0.5
    return vis.astype(np.float64)


def viewshed(layer: DataFrame, px: int | None = None, py: int | None = None) -> DataFrame:
    """Per-tile viewshed (the reference op is single-tile too:
    Viewshed.apply takes one Tile): viewpoint at pixel (px, py) of each
    tile (default: tile center). One vectorized Arrow batch pass;
    embarrassingly parallel across tiles."""

    def run(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                dem = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = dem.shape
                vc = w // 2 if px is None else px
                vr = h // 2 if py is None else py
                vis = viewshed_array(dem, vc, vr)
                outs.append(_layer_row(int(t.zoom), int(t.col), int(t.row), vis))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return layer.mapInPandas(run, LAYER_SCHEMA)


def cost_distance_paths(
    cost: np.ndarray, source: tuple[int, int]
) -> tuple[np.ndarray, dict[int, list[int]]]:
    """Single-tile Dijkstra keeping ALL tied min-cost predecessors
    (CostDistanceWithPaths.scala:73-201). Edge cost from a to b is
    (v_a + v_b) / 2 orthogonally and (v_a + v_b) / sqrt(2) diagonally —
    the reference's own formula (getTileCost :85-95), which differs from
    CostDistance.scala's sqrt(2)*(v_a+v_b)/2 diagonal; reproduced verbatim.
    Returns (dist array, parents: flat-index -> tied parent indices).
    Parent semantics match the reference fixpoint — p is a parent of n iff
    dist[p] + edge(p, n) == dist[n] — except that the reference's
    mutable-comparator duplicate-pop quirk (:163-195) can append the same
    parent twice; each distinct parent is recorded once here."""
    h, w = cost.shape
    v = cost.astype(np.float64)
    sx, sy = source
    sidx = sy * w + sx
    dist = np.full(h * w, np.inf)
    dist[sidx] = 0.0
    parents: dict[int, list[int]] = {}
    pq: list[tuple[float, int]] = [(0.0, sidx)]
    offs = [(dc, dr, SQRT2 if dc and dr else 2.0)
            for bit, (dc, dr) in DIR_OFFSETS.items()]
    flat = v.ravel()
    while pq:
        d, cur = heapq.heappop(pq)
        if d > dist[cur]:
            continue
        cy, cx = divmod(cur, w)
        for dc, dr, div in offs:
            ty, tx = cy + dr, cx + dc
            if not (0 <= ty < h and 0 <= tx < w):
                continue
            n = ty * w + tx
            alt = d + (flat[cur] + flat[n]) / div
            if alt < dist[n]:
                dist[n] = alt
                parents[n] = [cur]
                heapq.heappush(pq, (alt, n))
            elif alt == dist[n] and cur not in parents.setdefault(n, []):
                parents[n].append(cur)
    return dist.reshape(h, w), parents


def min_path_cells(
    parents: dict[int, list[int]], dest: tuple[int, int], w: int
) -> set[int]:
    """Flat indices of every cell lying on ANY min-cost path to `dest`
    (the least-cost corridor): BFS from dest through the tied-parent DAG.
    Bounded by the cell count even when the number of tied paths is
    exponential — use this, not enumerate_paths, at scale."""
    dx, dy = dest
    start = dy * w + dx
    seen = {start}
    stack = [start]
    while stack:
        n = stack.pop()
        for p in parents.get(n, ()):
            if p not in seen:
                seen.add(p)
                stack.append(p)
    return seen


def enumerate_paths(
    parents: dict[int, list[int]], dest: tuple[int, int], w: int
) -> list[list[tuple[int, int]]]:
    """All min-cost paths to `dest` as (x, y) vertex lists source-first —
    CostDistanceWithPathsResult.getPath (:34-62). Exponential in the tie
    count by nature; intended for single destinations on modest tiles."""
    dx, dy = dest
    out: list[list[tuple[int, int]]] = []

    def walk(prefix: list[int]) -> None:
        ps = parents.get(prefix[0], ())
        if not ps:
            out.append(prefix)
            return
        for p in ps:
            walk([p] + prefix)

    walk([dy * w + dx])
    return [[(i % w, i // w) for i in path] for path in out]


def cost_paths(
    layer: DataFrame,
    source: tuple[int, int] = (0, 0),
    dest: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-tile least-cost corridor (CostDistanceWithPaths distributed the
    same way the reference offers it — per Tile): Dijkstra from `source`
    pixel, then every cell on any tied min-cost path to `dest` (default:
    bottom-right pixel), with its accumulated cost. One mapInPandas pass,
    embarrassingly parallel across tiles."""

    def run(it):
        for pdf in it:
            outs = []
            for tr in pdf.itertuples(index=False):
                fric = codec.decode_tile(bytes(tr.tile), tr.fmt).astype(np.float64)
                h, w = fric.shape
                dst = (w - 1, h - 1) if dest is None else dest
                dist, parents = cost_distance_paths(fric, source)
                cells = sorted(min_path_cells(parents, dst, w))
                idx = np.asarray(cells, dtype=np.int64)
                outs.append(pd.DataFrame({
                    "zoom": np.full(len(idx), int(tr.zoom), dtype=np.int32),
                    "col": np.full(len(idx), int(tr.col), dtype=np.int32),
                    "row": np.full(len(idx), int(tr.row), dtype=np.int32),
                    "px": (idx % w).astype(np.int32),
                    "py": (idx // w).astype(np.int32),
                    "val": dist.ravel()[idx],
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return layer.mapInPandas(
        run, "zoom int, col int, row int, px int, py int, val double"
    )


def approx_viewshed_offsets(dem: np.ndarray, sc: int, sr: int) -> np.ndarray:
    """Reference-faithful ApproxViewshed.offsets (ApproxViewshed.scala:
    31-121): R2-style ring propagation — each square ring (Chebyshev layer)
    extrapolates the grazing height from the previous ring with the
    reference's exact-integer / linear-interpolation branch, and stores
    max(own height, extrapolated). Vectorized one ring-side at a time (four
    NumPy gathers per layer instead of per-cell loops; every read is from
    the previous ring so sides are independent)."""
    h, w = dem.shape
    k = float(dem[sr, sc])
    t = np.full((h, w), np.nan)
    t[sr, sc] = k
    max_layer = max(h - sr, w - sc, sr + 1, sc + 1)

    def do_y(xs: np.ndarray, y: int) -> None:
        m = (xs >= 0) & (xs < w) & (0 <= y < h)
        if not m.any():
            return
        xs = xs[m]
        z = dem[y, xs]
        # xVal = |1/(sr-y)| * (sc-x) + x  (ApproxViewshed.scala:53)
        xv = abs(1.0 / (sr - y)) * (sc - xs) + xs
        xi = xv.astype(np.int64)  # toInt truncation; xv >= 0 here
        yprev = y - int(np.sign(y - sr))
        exact = xv == xi
        z0 = t[yprev, xi]
        z1 = t[yprev, np.minimum(xi + 1, w - 1)]
        closest = np.where(exact, z0, (xi + 1 - xv) * z0 + (xv - xi) * z1)
        if y > sr:
            val = 1.0 / (sr - (y - 1)) * (k - closest) + closest
        else:
            val = -1.0 / (sr - (y + 1)) * (k - closest) + closest
        t[y, xs] = np.maximum(z, val)

    def do_x(ys: np.ndarray, x: int) -> None:
        m = (ys >= 0) & (ys < h) & (0 <= x < w)
        if not m.any():
            return
        ys = ys[m]
        z = dem[ys, x]
        yv = abs(1.0 / (sc - x)) * (sr - ys) + ys
        yi = yv.astype(np.int64)
        xprev = x - int(np.sign(x - sc))
        exact = yv == yi
        z0 = t[yi, xprev]
        z1 = t[np.minimum(yi + 1, h - 1), xprev]
        closest = np.where(exact, z0, (yi + 1 - yv) * z0 + (yv - yi) * z1)
        if x > sc:
            val = 1.0 / (sc - (x - 1)) * (k - closest) + closest
        else:
            val = -1.0 / (sc - (x + 1)) * (k - closest) + closest
        t[ys, x] = np.maximum(z, val)

    for layer in range(1, max_layer):
        if layer == 1:
            # ring 1 copies raw heights (ApproxViewshed.scala:50-51)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = sr + dy, sc + dx
                    if (dx or dy) and 0 <= yy < h and 0 <= xx < w:
                        t[yy, xx] = dem[yy, xx]
            continue
        ii = np.arange(2 * layer)
        do_y(sc - layer + ii, sr - layer)           # top row, corners: left
        do_y(sc + layer - ii, sr + layer)           # bottom row, corner: right
        do_x(np.ascontiguousarray((sr + layer - ii)[::-1]), sc - layer)
        do_x(np.ascontiguousarray((sr - layer + ii)[::-1]), sc + layer)
    return t


def approx_viewshed_array(dem: np.ndarray, sc: int, sr: int) -> np.ndarray:
    """ApproxViewshed.apply (ApproxViewshed.scala:27-29): visible iff the
    offset surface equals the raw height (localEqual). 0/1 float array."""
    off = approx_viewshed_offsets(dem, sc, sr)
    with np.errstate(invalid="ignore"):
        return (dem == off).astype(np.float64)


def approx_viewshed(
    layer: DataFrame, px: int | None = None, py: int | None = None
) -> DataFrame:
    """Per-tile approximate (R2) viewshed — one vectorized batch pass,
    embarrassingly parallel across tiles (same shape as `viewshed`)."""

    def run(it):
        for pdf in it:
            outs = []
            for tr in pdf.itertuples(index=False):
                dem = codec.decode_tile(bytes(tr.tile), tr.fmt).astype(np.float64)
                h, w = dem.shape
                vc = w // 2 if px is None else px
                vr = h // 2 if py is None else py
                vis = approx_viewshed_array(dem, vc, vr)
                outs.append(_layer_row(int(tr.zoom), int(tr.col), int(tr.row), vis))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return layer.mapInPandas(run, LAYER_SCHEMA)


# ---------------------------------------------------- euclidean distance

def euclidean_distance(
    layer: DataFrame,
    points: pd.DataFrame,
    layout: LayoutDefinition,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Distance-transform raster (EuclideanDistanceTile.scala:26-46): every
    pixel CENTER's distance to the nearest input point. `points` is a
    (small) pandas frame broadcast to every tile — the reference's
    Voronoi-rasterize produces the identical values. For 10^6+ points,
    prune candidates per tile with the cell-ring kNN first; the per-tile
    vectorized min is unchanged."""
    spark = layer.sparkSession
    pts = np.ascontiguousarray(points[[x, y]].values.astype(np.float64))
    bc = spark.sparkContext.broadcast(pts)
    ext = layout.extent
    tw, th = layout.tile_width, layout.tile_height
    cw, ch = layout.cell_width, layout.cell_height

    def run(it):
        p = bc.value
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                h, w = int(t.h), int(t.w)
                x0 = ext.xmin + t.col * tw
                y0 = ext.ymax - t.row * th
                xs = x0 + (np.arange(w) + 0.5) * cw
                ys = y0 - (np.arange(h) + 0.5) * ch
                gx, gy = np.meshgrid(xs, ys)
                d2 = (
                    (gx[:, :, None] - p[None, None, :, 0]) ** 2
                    + (gy[:, :, None] - p[None, None, :, 1]) ** 2
                )
                dist = np.sqrt(d2.min(axis=2))
                outs.append(_layer_row(int(t.zoom), int(t.col), int(t.row), dist))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return layer.mapInPandas(run, LAYER_SCHEMA)
