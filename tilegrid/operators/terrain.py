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
from ..grid import LayoutDefinition, TileLayout
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

def _shift_add(dst: np.ndarray, src: np.ndarray, dc: int, dr: int) -> None:
    """dst[y+dr, x+dc] += src[y, x] for all in-bounds targets."""
    h, w = dst.shape
    ys = slice(max(0, -dr), h - max(0, dr))
    xs = slice(max(0, -dc), w - max(0, dc))
    yd = slice(max(0, dr), h + min(0, dr))
    xd = slice(max(0, dc), w + min(0, dc))
    dst[yd, xd] += src[ys, xs]


def _local_accumulation(
    dirs: np.ndarray, inflow: np.ndarray
) -> tuple[np.ndarray, list[tuple[int, int, float]]]:
    """Kahn topological sweep of one tile's in-tile flow DAG, VECTORIZED:
    peel indegree-0 layers with whole-array shifts (8 gathers per layer)
    instead of the former per-cell Python queue (O(h*w) interpreter
    iterations per tile per round).

    dirs: (h, w) Greenlee bitmask (NaN = sink/NoData). inflow: (h, w)
    external contributions (sum of upstream acc+1 entering each cell from
    other tiles). Returns (acc array, list of (px, py, value) boundary
    emissions where value = acc + 1 and px/py are OUT-OF-TILE offsets
    relative to this tile's origin — the caller maps them to neighbor
    keys). Cells on unresolvable cycles (flat ties looping) stay NaN, like
    the reference which never terminates on them — we fail soft instead.
    A layer-peel iteration count equals the longest in-tile flow path;
    no same-layer edges exist (an edge a->b forces indeg(b) >= 1 while a
    is ready), so every ready cell's acc is final when it contributes."""
    h, w = dirs.shape
    code = np.where(np.isnan(dirs), 0, dirs).astype(np.int64)
    flows = {bit: (code & bit) > 0 for bit in DIR_OFFSETS}
    indeg = np.zeros((h, w), dtype=np.int64)
    for bit, (dc, dr) in DIR_OFFSETS.items():
        _shift_add(indeg, flows[bit].astype(np.int64), dc, dr)
    acc = inflow.astype(np.float64).copy()
    done = np.zeros((h, w), dtype=bool)
    ready = indeg == 0
    while ready.any():
        contrib = np.where(ready, acc + 1.0, 0.0)
        for bit, (dc, dr) in DIR_OFFSETS.items():
            firing = flows[bit] & ready
            if not firing.any():
                continue
            _shift_add(acc, np.where(firing, contrib, 0.0), dc, dr)
            _shift_add(indeg, -firing.astype(np.int64), dc, dr)
        done |= ready
        ready = (indeg == 0) & ~done
    # boundary emissions: done cells whose flow target falls outside the
    # tile contribute acc+1 there (value depends only on the final acc,
    # so emitting after the sweep is equivalent to emitting on pop)
    emits: list[tuple[int, int, float]] = []
    border = np.zeros((h, w), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    for bit, (dc, dr) in DIR_OFFSETS.items():
        src = flows[bit] & done & border
        if not src.any():
            continue
        yy, xx = np.nonzero(src)
        tx, ty = xx + dc, yy + dr
        m = (tx < 0) | (tx >= w) | (ty < 0) | (ty >= h)
        if m.any():
            vals = acc[yy[m], xx[m]] + 1.0
            emits.extend(zip(tx[m].tolist(), ty[m].tolist(), vals.tolist()))
    acc[~done] = np.nan  # in-tile cycles (flat ties): unresolvable
    return acc, emits


_INFLOW_SCHEMA = "zoom int, col int, row int, px int, py int, v double"
# emissions keyed by the EMITTING tile too, so an unchanged tile's rows can
# be carried over instead of re-swept
_EMIT_SCHEMA = (
    "zoom int, scol int, srow int, col int, row int, px int, py int, v double"
)

# driver-side instrumentation (same contract as cost_distance's): tiles
# swept per round on the most recent flow_accumulation call
LAST_ACC_FRONTIER_SIZES: list[int] = []

# above this many frontier keys, fall back from a codegen InSet filter to a
# broadcast semi-join (an In-list of 10^5 literals bloats the plan)
_ISIN_CAP = 10_000
_KOFF = 1 << 20  # tile cols/rows are < 2^20 on any registered layout
_KMUL = 1 << 22


def _frontier_filter(df: DataFrame, keys: list[tuple[int, int]],
                     col: str = "col", row: str = "row",
                     anti: bool = False) -> DataFrame:
    """Keep (or with anti=True drop) rows whose (col, row) is in the
    frontier key list. Small frontiers become ONE codegen InSet over an
    encoded long — no broadcast exchange, no extra job, and the filter runs
    narrow over the cached partitioning; huge frontiers fall back to a
    broadcast semi/anti-join."""
    if len(keys) <= _ISIN_CAP:
        enc = (F.col(col).cast("long") + F.lit(_KOFF)) * F.lit(_KMUL) \
            + (F.col(row).cast("long") + F.lit(_KOFF))
        pred = enc.isin([(c + _KOFF) * _KMUL + (r + _KOFF) for c, r in keys])
        return df.filter(~pred if anti else pred)
    fdf = df.sparkSession.createDataFrame(keys, f"{col} int, {row} int")
    return df.join(F.broadcast(fdf), [col, row],
                   "left_anti" if anti else "left_semi")


# ------------------------------------------------- halo-k round batching

def _superkey_cols(s: int) -> list:
    return [
        F.col("zoom"),
        F.expr(f"CAST(floor(col / {s}) AS INT)").alias("scol"),
        F.expr(f"CAST(floor(row / {s}) AS INT)").alias("srow"),
    ]


def _to_supertiles(layer: DataFrame, s: int) -> DataFrame:
    """Merge each s x s block of tiles into ONE supertile row (NaN holes
    where a member tile is absent — NaN is blocked friction / NoData flow
    direction, so a hole behaves exactly like the missing tile did at
    batch=1: nothing propagates through it).

    This is the halo-k round-batching step for the propagation loops
    (cost_distance / flow_accumulation, batch=s): one extra groupBy
    shuffle up front buys a wavefront that crosses s tile boundaries per
    Spark round instead of one, cutting the serial round chain ~s x — the
    fixed ~0.4 s/round job latency, not compute, dominates those loops at
    depth. Frontier filtering still applies, at supertile granularity."""

    def merge(kdf: pd.DataFrame) -> pd.DataFrame:
        first = kdf.iloc[0]
        zoom = int(first["zoom"])
        scol = int(np.floor(first["col"] / s))
        srow = int(np.floor(first["row"] / s))
        t0 = codec.decode_tile(bytes(first["tile"]), first["fmt"])
        h, w = t0.shape[:2]
        big = np.full((h * s, w * s), np.nan)
        for t in kdf.itertuples(index=False):
            arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
            ti, tj = int(t.col) - scol * s, int(t.row) - srow * s
            big[tj * h : (tj + 1) * h, ti * w : (ti + 1) * w] = arr
        return _layer_row(zoom, scol, srow, big)

    return (
        layer.groupBy(*_superkey_cols(s))
        .applyInPandas(lambda _k, pdf: merge(pdf), LAYER_SCHEMA)
    )


def _split_supertiles(
    big: DataFrame, original: DataFrame, s: int
) -> DataFrame:
    """Slice supertile result rows back into the ORIGINAL layer's tiles
    (members absent from the input layer are dropped, not emitted as NaN
    tiles — batch=s must return the same row set as batch=1). One cogroup
    shuffle: the member-key side is key-only rows."""
    keys = original.select(
        *_superkey_cols(s), F.col("col").alias("mcol"),
        F.col("row").alias("mrow"),
    )
    gk = [F.col("zoom"), F.col("col"), F.col("row")]

    def split(big_pdf: pd.DataFrame, key_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(big_pdf) == 0 or len(key_pdf) == 0:
            return _empty_layer_pdf()
        t = big_pdf.iloc[0]
        zoom = int(t["zoom"])
        arr = codec.decode_tile(bytes(t["tile"]), t["fmt"])
        h, w = arr.shape[0] // s, arr.shape[1] // s
        scol, srow = int(t["col"]), int(t["row"])
        out = []
        for m in key_pdf.itertuples(index=False):
            ti, tj = int(m.mcol) - scol * s, int(m.mrow) - srow * s
            out.append(_layer_row(
                zoom, int(m.mcol), int(m.mrow),
                arr[tj * h : (tj + 1) * h, ti * w : (ti + 1) * w],
            ))
        return pd.concat(out, ignore_index=True)

    return (
        big.groupBy(*gk)
        .cogroup(
            keys.withColumnRenamed("scol", "col")
            .withColumnRenamed("srow", "row").groupBy(*gk)
        )
        .applyInPandas(split, LAYER_SCHEMA)
    )


def flow_accumulation(
    dir_layer: DataFrame, max_rounds: int = 64, final: bool = True,
    frontier: str = "auto", batch: int = 1,
) -> DataFrame:
    """D8 flow accumulation (Accumulation.scala:29-216):
    acc(c) = sum over inflowing neighbors n of (acc(n) + 1), distributed as
    FRONTIER-FILTERED per-tile Kahn sweeps exchanging boundary
    contributions.

    A tile's emissions are a pure function of (dirs, aggregated inflow), so
    only tiles whose inflow CHANGED since the last round are re-swept;
    everyone else's emission rows (keyed by emitting tile) carry over.
    Round 0 sweeps every tile with zero inflow (each tile has internal
    flow); from round 1 on, work per round is O(frontier) — the set of
    tiles downstream of a change — instead of O(layer). Inflow values are
    exact integers (upstream cell counts), so the changed-cell comparison
    is exact. Convergence = no inflow cell changed. Rounds needed = max
    tile-boundary crossings of any flow path (<= layout diameter).
    `frontier="auto"` applies the filter only when the skipped work clears
    the per-round fixed latency (same rule and rationale as
    cost_distance); a full re-sweep is result-identical because unchanged
    tiles reproduce their old emissions exactly.

    `batch=s` runs the HALO-BATCHED variant: tiles are merged s x s into
    supertiles first (one extra groupBy), so flow crosses s tile
    boundaries per Kahn round and the serial round chain shrinks ~s x —
    the cure for the fixed per-round job latency at propagation depth.
    Result-identical to batch=1 (NaN holes block exactly like missing
    tiles; pytest asserts bit-equality and the round-count drop)."""
    if batch > 1:
        if not final:
            raise ValueError("batch>1 requires final=True (inflow rows "
                             "would be in supertile coordinates)")
        big = flow_accumulation(
            _to_supertiles(dir_layer, batch), max_rounds, True, frontier
        )
        return _split_supertiles(big, dir_layer, batch)
    spark = dir_layer.sparkSession
    key = ["zoom", "col", "row"]
    # one-time hash partitioning on the group key: per-round cogroups then
    # shuffle only the small inflow rows (see cost_distance's note)
    tiles = dir_layer.repartition(
        spark.sparkContext.defaultParallelism, *key
    ).persist()

    def sweep(emit_layer: bool):
        def run(tile_pdf: pd.DataFrame, inflow_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(tile_pdf) == 0:
                return (
                    _empty_layer_pdf() if emit_layer
                    else pd.DataFrame({c: [] for c in (
                        "zoom", "scol", "srow", "col", "row", "px", "py", "v")})
                )
            t = tile_pdf.iloc[0]
            zoom, col, row = int(t["zoom"]), int(t["col"]), int(t["row"])
            dirs = codec.decode_tile(bytes(t["tile"]), t["fmt"]).astype(np.float64)
            h, w = dirs.shape
            inflow = np.zeros((h, w), dtype=np.float64)
            if len(inflow_pdf):
                np.add.at(
                    inflow,
                    (inflow_pdf["py"].to_numpy(np.int64),
                     inflow_pdf["px"].to_numpy(np.int64)),
                    inflow_pdf["v"].to_numpy(np.float64),
                )
            acc, emits = _local_accumulation(dirs, inflow)
            if emit_layer:
                return _layer_row(zoom, col, row, acc)
            out = {"zoom": [], "scol": [], "srow": [], "col": [], "row": [],
                   "px": [], "py": [], "v": []}
            for ex, ey, v in emits:
                ncol, nrow = col + (1 if ex >= w else (-1 if ex < 0 else 0)), \
                    row + (1 if ey >= h else (-1 if ey < 0 else 0))
                out["zoom"].append(zoom)
                out["scol"].append(col)
                out["srow"].append(row)
                out["col"].append(ncol)
                out["row"].append(nrow)
                out["px"].append(ex % w)
                out["py"].append(ey % h)
                out["v"].append(v)
            return pd.DataFrame(out)
        return run

    empty_inflow = spark.createDataFrame([], _INFLOW_SCHEMA)
    cell_key = ["zoom", "col", "row", "px", "py"]
    LAST_ACC_FRONTIER_SIZES.clear()
    # round 0: full sweep, zero inflow (localCheckpoint, not persist — keeps
    # the per-round plan O(1), see vectorize._merged_labels rationale)
    emissions = (
        tiles.groupBy(*key)
        .cogroup(empty_inflow.groupBy(*key))
        .applyInPandas(sweep(emit_layer=False), _EMIT_SCHEMA)
        .localCheckpoint()
    )
    n_tiles = tiles.select(*key).distinct().count()  # cached by round 0
    LAST_ACC_FRONTIER_SIZES.append(n_tiles)
    par = spark.sparkContext.defaultParallelism
    inflow_prev = empty_inflow
    inflow_cur = empty_inflow
    # Mode decided ONCE up front (same rule + rationale as cost_distance):
    # the filter can only engage when skipped tiles can exceed ~100 x
    # parallelism, and n_tiles bounds skipped tiles. Small layers run the
    # LEGACY loop — re-sweep everything, fingerprint convergence, 2 jobs
    # per round instead of 3 (no tagged-union changed-flag pass) — which
    # is result-identical because an unchanged tile reproduces its old
    # emissions exactly.
    use_frontier = frontier == "always" or (
        frontier == "auto" and n_tiles > 100 * par
    )
    if not use_frontier:
        prev = (-1, 0.0)
        for _ in range(max_rounds):
            # lineage stays O(1): emissions is checkpointed, the groupBy
            # on top is recomputed cheaply by each consumer
            inflow_cur = emissions.groupBy(*cell_key).agg(
                F.sum("v").alias("v"))
            agg = inflow_cur.agg(
                F.count("*").alias("n"), F.sum("v").alias("s")
            ).collect()[0]
            cur = (int(agg["n"] or 0), float(agg["s"] or 0.0))
            if cur == prev:
                break
            prev = cur
            LAST_ACC_FRONTIER_SIZES.append(n_tiles)
            emissions = (
                tiles.groupBy(*key)
                .cogroup(inflow_cur.groupBy(*key))
                .applyInPandas(sweep(emit_layer=False), _EMIT_SCHEMA)
                .localCheckpoint()
            )
    for _ in range(max_rounds if use_frontier else 0):
        # ONE tagged-union aggregation carries the new inflow totals AND the
        # changed-cell flags; checkpointed (localCheckpoint, not persist —
        # keeps the per-round plan O(1)) because three consumers read it:
        # the frontier collect, the sweep input, and next round's old side.
        vn = F.sum(F.when(F.col("_new"), F.col("v")))
        vo = F.sum(F.when(~F.col("_new"), F.col("v")))
        merged = (
            emissions.select(*cell_key, "v").withColumn("_new", F.lit(True))
            .unionByName(
                inflow_prev.select(*cell_key, "v")
                .withColumn("_new", F.lit(False))
            )
            .groupBy(*cell_key)
            .agg(vn.alias("v"), (~vn.eqNullSafe(vo)).alias("_changed"))
            .localCheckpoint()
        )
        inflow_cur = merged.filter("v IS NOT NULL").select(*cell_key, "v")
        frontier_keys = [
            tuple(r) for r in
            merged.filter("_changed").select("col", "row").distinct().collect()
        ]
        if not frontier_keys:
            break
        # same adaptive rule as cost_distance: re-sweeping a tile whose
        # inflow is unchanged reproduces its old emissions exactly, so a
        # full sweep is equivalent — and cheaper until the skipped work
        # clears the per-round fixed latency
        use_filter = frontier == "always" or (
            frontier == "auto"
            and n_tiles - len(frontier_keys) > 100 * par
        )
        if use_filter:
            LAST_ACC_FRONTIER_SIZES.append(len(frontier_keys))
            active = _frontier_filter(tiles, frontier_keys)
            active_inflow = _frontier_filter(inflow_cur, frontier_keys)
            kept = _frontier_filter(emissions, frontier_keys, "scol", "srow",
                                    anti=True)
        else:
            LAST_ACC_FRONTIER_SIZES.append(n_tiles)
            active, active_inflow = tiles, inflow_cur
            kept = emissions.limit(0)
        new_emits = (
            active.groupBy(*key)
            .cogroup(active_inflow.groupBy(*key))
            .applyInPandas(sweep(emit_layer=False), _EMIT_SCHEMA)
        )
        emissions = kept.unionByName(new_emits).localCheckpoint()
        inflow_prev = inflow_cur
    if not final:
        return inflow_cur
    return (
        tiles.groupBy(*key)
        .cogroup(inflow_cur.groupBy(*key))
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

# driver-side instrumentation: tiles solved per round on the most recent
# cost_distance call ([round0, round1, ...]); tests assert the frontier
# shrinks to the wavefront instead of re-solving the whole layer
LAST_FRONTIER_SIZES: list[int] = []


def _emit_border_offers(
    dist: np.ndarray, zoom: int, col: int, row: int, h: int, w: int
) -> pd.DataFrame:
    """Vectorized border-offer emit: finite border-ring distances of a
    buffered (h+2, w+2) dist array, translated into each adjacent
    neighbor's buffered coordinates. Replaces the old per-pixel Python
    double loop (65k iterations/tile on 256^2 tiles) with 8 masked
    gathers."""
    interior = dist[1 : 1 + h, 1 : 1 + w]
    border = np.zeros((h, w), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    py, px = np.nonzero(border & np.isfinite(interior))
    if len(px) == 0:
        return pd.DataFrame({c: [] for c in (
            "zoom", "col", "row", "bx", "by", "d")})
    d = interior[py, px]
    cols_, rows_, bxs, bys, ds = [], [], [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            # neighbor (col+dx, row+dy) sees our (px,py) at buffered
            # coords (px - dx*w + 1, py - dy*h + 1)
            bx = px - dx * w + 1
            by = py - dy * h + 1
            m = (bx >= 0) & (bx <= w + 1) & (by >= 0) & (by <= h + 1)
            if not m.any():
                continue
            n = int(m.sum())
            cols_.append(np.full(n, col + dx, dtype=np.int32))
            rows_.append(np.full(n, row + dy, dtype=np.int32))
            bxs.append(bx[m].astype(np.int32))
            bys.append(by[m].astype(np.int32))
            ds.append(d[m])
    return pd.DataFrame({
        "zoom": np.full(sum(len(a) for a in bxs), zoom, dtype=np.int32),
        "col": np.concatenate(cols_), "row": np.concatenate(rows_),
        "bx": np.concatenate(bxs), "by": np.concatenate(bys),
        "d": np.concatenate(ds),
    })


def cost_distance(
    friction_layer: DataFrame,
    sources: list[tuple[int, int]],
    layout: LayoutDefinition,
    max_rounds: int = 64,
    frontier: str = "auto",
    batch: int = 1,
) -> DataFrame:
    """Accumulated-cost surface (CostDistance.scala:43-66) from global-pixel
    `sources` [(gx, gy), ...] over a friction layer, distributed as
    FRONTIER-FILTERED block Dijkstra.

    State = the accumulated best offer per (tile, buffered border cell)
    (min over all rounds — monotone decreasing, so a tile's converged
    distance is Dijkstra(friction, in-tile sources + accumulated offers)).
    Round k solves ONLY the frontier: tiles whose accumulated offer set
    improved in round k-1 (round 0: the tiles containing sources). Tiles
    off the frontier are provably unchanged — their inputs didn't move —
    so per-round compute is O(wavefront), not O(layer), while the shuffle
    stays offers-only (the heavy buffered-tile side is hash-partitioned
    once and cached; the per-round frontier restriction is a narrow codegen
    InSet filter over that cache — no broadcast exchange — so cogroup's
    ClusteredDistribution stays satisfied). `frontier="auto"` applies the
    filter only when the skipped work clears the per-round fixed latency
    (skipped tiles > ~100 x parallelism); small layers solve everything,
    which is result-identical since re-solved tiles re-emit non-improving
    offers. Convergence = no offer improved (exact, per cell). Returns the
    cost layer (NaN = unreachable).

    `batch=s` runs the HALO-BATCHED variant: the friction layer is merged
    s x s into supertiles first (one extra groupBy), so each block-Dijkstra
    round advances the wavefront s tile boundaries and the serial round
    chain — the fixed ~0.4 s/round job latency that dominates deep
    propagation at scale — shrinks ~s x, at the cost of s^2 more pixels
    per ACTIVE (frontier) solve. Result-identical to batch=1: NaN holes
    block exactly like missing tiles, and the converged fixpoint is the
    global shortest-path distance regardless of blocking (pytest asserts
    bit-equality and the round-count drop)."""
    if batch > 1:
        lt = layout.tile_layout
        blayout = LayoutDefinition(layout.extent, TileLayout(
            -(-lt.layout_cols // batch), -(-lt.layout_rows // batch),
            lt.tile_cols * batch, lt.tile_rows * batch,
        ))
        big = cost_distance(
            _to_supertiles(friction_layer, batch), sources, blayout,
            max_rounds, frontier,
        )
        return _split_supertiles(big, friction_layer, batch)
    spark = friction_layer.sparkSession
    tw = layout.tile_layout.tile_cols
    th = layout.tile_layout.tile_rows
    src_by_tile: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for gx, gy in sources:
        src_by_tile.setdefault((gx // tw, gy // th), []).append((gx % tw, gy % th))
    parts = buffer_parts(friction_layer, 1)

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
            return _emit_border_offers(dist, zoom, col, row, h, w)
        return run

    key = ["zoom", "col", "row"]
    cell_key = ["zoom", "col", "row", "bx", "by"]
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
    # accumulated best offers (min per tile border cell over all rounds)
    acc = spark.createDataFrame([], _OFFER_SCHEMA)
    # round-0 frontier: the tiles containing sources. Frontier keys live on
    # the driver — the wavefront's TILE KEYS are tiny (the tile data never
    # moves), and a local list makes the per-round semi-join a free
    # broadcast and the emptiness check free, so each round costs exactly
    # 2 Spark jobs: the merge checkpoint and the improved-keys collect.
    # Keys are (col, row) only — zoom stays out of the frontier so no job
    # is spent discovering the layer's zoom levels.
    frontier_keys = sorted(src_by_tile)
    # existing CENTER keys, collected once: offers also land on pure-margin
    # neighbor keys outside the layer — solving those is a no-op, so they
    # are dropped from every frontier (at sf0.1 they are 12 of 16 keys).
    # One job over the (about-to-be-cached) parts; the key list is 16 bytes
    # a tile — fine into the millions, and _ISIN_CAP bounds the plan cost.
    existing = {
        (r[0], r[1])
        for r in part_keyed.filter("dx = 0 AND dy = 0")
        .select("col", "row").distinct().collect()
    }
    frontier_keys = [k for k in frontier_keys if k in existing]
    # Adaptive frontier rule, decided ONCE up front: the filter can only
    # ever engage when skipped_tiles = existing - frontier can exceed
    # ~100 x parallelism (~0.2-0.3 s of cluster compute — rounds are
    # fixed-latency-bound below that), and existing is an upper bound on
    # skipped tiles. Small layers therefore run the LEGACY loop — last
    # round's offers as seeds, fingerprint convergence, one lighter
    # merge job per round (no accumulated-state union) — which is
    # result-identical: every tile re-solves every round, so last-round
    # offers ARE the accumulated minima at convergence. Large layers run
    # the frontier loop: accumulated per-cell min offers + exact per-cell
    # improvement flags, solving only tiles whose inputs changed.
    # "always"/"never" force the choice (tests pin "always" for the
    # wavefront assertions; "never" pins the legacy loop).
    par = spark.sparkContext.defaultParallelism
    LAST_FRONTIER_SIZES.clear()
    use_frontier = frontier == "always" or (
        frontier == "auto" and len(existing) > 100 * par
    )
    if not use_frontier:
        offers = acc  # empty
        prev = (-1, 0.0)
        for _ in range(max_rounds):
            LAST_FRONTIER_SIZES.append(len(existing))
            new_offers = (
                part_keyed.groupBy(*key)
                .cogroup(offers.groupBy(*key))
                .applyInPandas(solve(emit_layer=False), _OFFER_SCHEMA)
                .groupBy(*cell_key)
                .agg(F.min("d").alias("d"))
                .localCheckpoint()
            )
            agg = new_offers.agg(
                F.count("*").alias("n"), F.sum("d").alias("s")
            ).collect()[0]
            cur = (int(agg["n"] or 0), float(agg["s"] or 0.0))
            offers = new_offers
            if abs(cur[1] - prev[1]) < 1e-9 and cur[0] == prev[0]:
                break
            prev = cur
        acc = offers
    for _ in range(max_rounds if use_frontier else 0):
        if not frontier_keys:
            break
        if frontier == "always" or len(existing) - len(frontier_keys) > 100 * par:
            LAST_FRONTIER_SIZES.append(len(frontier_keys))
            active = _frontier_filter(part_keyed, frontier_keys)
            active_acc = _frontier_filter(acc, frontier_keys)
        else:
            LAST_FRONTIER_SIZES.append(len(existing))
            active, active_acc = part_keyed, acc
        new_raw = (
            active.groupBy(*key)
            .cogroup(active_acc.groupBy(*key))
            .applyInPandas(solve(emit_layer=False), _OFFER_SCHEMA)
        )
        # ONE tagged-union aggregation carries the min-merge AND the
        # improvement flag (improved iff a new offer beats every old one at
        # that cell), so each round costs a single shuffle + checkpoint —
        # the same plan weight as an unfiltered round. localCheckpoint, not
        # persist, keeps the per-round plan O(1) (see
        # vectorize._merged_labels rationale comment).
        merged = (
            acc.withColumn("_new", F.lit(False))
            .unionByName(new_raw.withColumn("_new", F.lit(True)))
            .groupBy(*cell_key)
            .agg(
                F.min("d").alias("d"),
                (
                    F.min(F.when(F.col("_new"), F.col("d")))
                    < F.coalesce(
                        F.min(F.when(~F.col("_new"), F.col("d"))),
                        F.lit(float("inf")),
                    )
                ).alias("_improved"),
            )
            .localCheckpoint()
        )
        acc = merged.select(*cell_key, "d")
        frontier_keys = [
            tuple(r) for r in
            merged.filter("_improved").select("col", "row").distinct().collect()
            if (r[0], r[1]) in existing
        ]
    return (
        part_keyed.groupBy(*key)
        .cogroup(acc.groupBy(*key))
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

# point-axis block size ceiling: the (h*w, block) temp stays <= ~32 MB of
# float64 regardless of how many points there are (running min over blocks)
_ED_BLOCK_FLOATS = 4_000_000


def _min_dist2(gx: np.ndarray, gy: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Running min of squared pixel-center->point distance over point
    blocks: O(h*w) memory however large the point set (the old one-shot
    (h, w, P) tensor OOMed past ~10^4 points)."""
    best = np.full(gx.shape, np.inf)
    if len(p) == 0:
        return best
    block = max(1, _ED_BLOCK_FLOATS // max(1, gx.size))
    for i in range(0, len(p), block):
        blk = p[i : i + block]
        d2 = (
            (gx[:, :, None] - blk[None, None, :, 0]) ** 2
            + (gy[:, :, None] - blk[None, None, :, 1]) ** 2
        )
        np.minimum(best, d2.min(axis=2), out=best)
    return best


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
    Voronoi-rasterize produces the identical values. Per-tile memory is
    bounded by a running min over point blocks (_min_dist2); for 10^6+
    points use euclidean_distance_pruned, which gathers a per-tile
    candidate set with the cell-ring kNN instead of broadcasting."""
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
                dist = np.sqrt(_min_dist2(gx, gy, p))
                outs.append(_layer_row(int(t.zoom), int(t.col), int(t.row), dist))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return layer.mapInPandas(run, LAYER_SCHEMA)


def euclidean_distance_pruned(
    layer: DataFrame,
    points: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Distance transform for LARGE point sets (10^6+) — no broadcast of the
    point table. Exact, in two DataFrame stages:

      1. knn_join_df (operators/join.py) with k=1 and the TILE CENTERS as
         queries gives each tile r_c = distance(center -> nearest point).
      2. Any pixel q in the tile satisfies |q - center| <= g (tile
         half-diagonal), so q's nearest point lies within r_c + 2g of the
         center. Gather exactly the points in that disc per tile with a
         cell-ring explode + equi-join on the point grid key, then run the
         same blocked per-tile min (cogroup, applyInPandas).

    Candidate volume per tile is O(density * (r_c + 2g)^2) — bounded by the
    local point density, independent of total P; both joins are key
    equi-joins, so the plan is two bounded shuffles at any scale.
    Reference: EuclideanDistanceTile.scala:26-46 (same output values)."""
    from .join import knn_join_df, with_key_columns

    spark = layer.sparkSession
    ext = layout.extent
    tw, th = layout.tile_width, layout.tile_height
    cw, ch = layout.cell_width, layout.cell_height
    g = 0.5 * (tw * tw + th * th) ** 0.5

    centers = layer.select(
        F.col("col").alias("_tc"), F.col("row").alias("_tr"),
        (F.lit(ext.xmin) + (F.col("col") + F.lit(0.5)) * F.lit(tw)).alias("cx"),
        (F.lit(ext.ymax) - (F.col("row") + F.lit(0.5)) * F.lit(th)).alias("cy"),
        F.concat_ws("_", "col", "row").alias("query_id"),
    )
    knn = knn_join_df(
        points.select(
            F.col(x), F.col(y),
            F.concat_ws("_", F.col(x).cast("string"), F.col(y).cast("string"))
            .alias("point_id"),
        ),
        centers.select("query_id", F.col("cx").alias(x), F.col("cy").alias(y)),
        layout, zoom, k=1, x=x, y=y,
    )
    radii = (
        knn.groupBy("query_id").agg(F.max("dist").alias("rc"))
        .join(centers, "query_id")
        .select("_tc", "_tr", "cx", "cy", (F.col("rc") + F.lit(2.0 * g)).alias("rad"))
    )
    # explode each tile to the grid cells its candidate disc touches, then
    # equi-join points on their own cell key: a bounded shuffle, never a
    # cross join
    # tile-offset reach of the disc: center sits mid-tile, so ceil(rad/t)+1
    # offsets per axis cover every tile the disc touches
    bc_ = F.ceil(F.col("rad") / F.lit(tw)).cast("int") + F.lit(1)
    br_ = F.ceil(F.col("rad") / F.lit(th)).cast("int") + F.lit(1)
    ring = (
        radii
        .withColumn("_dc", F.explode(F.sequence(-bc_, bc_)))
        .withColumn("_dr", F.explode(F.sequence(-br_, br_)))
        .select(
            "cx", "cy", "rad",
            F.col("_tc").alias("col"), F.col("_tr").alias("row"),
            (F.col("_tc") + F.col("_dc")).alias("pcol"),
            (F.col("_tr") + F.col("_dr")).alias("prow"),
        )
    )
    pts_keyed = with_key_columns(points, layout, x, y, zoom).select(
        F.col(x).alias("_px"), F.col(y).alias("_py"),
        F.col("col").alias("pcol"), F.col("row").alias("prow"),
    )
    cands = (
        ring.join(pts_keyed, ["pcol", "prow"])
        .filter(
            (F.col("_px") - F.col("cx")) ** 2 + (F.col("_py") - F.col("cy")) ** 2
            <= F.col("rad") ** 2
        )
        .select("col", "row", "_px", "_py")
    )

    def run(tile_pdf: pd.DataFrame, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(tile_pdf) == 0:
            return _empty_layer_pdf()
        t = tile_pdf.iloc[0]
        zm, col, row = int(t["zoom"]), int(t["col"]), int(t["row"])
        h, w = int(t["h"]), int(t["w"])
        p = np.ascontiguousarray(cand_pdf[["_px", "_py"]].values.astype(np.float64))
        x0 = ext.xmin + col * tw
        y0 = ext.ymax - row * th
        xs = x0 + (np.arange(w) + 0.5) * cw
        ys = y0 - (np.arange(h) + 0.5) * ch
        gx, gy = np.meshgrid(xs, ys)
        dist = np.sqrt(_min_dist2(gx, gy, p))
        return _layer_row(zm, col, row, np.where(np.isinf(dist), np.nan, dist))

    return (
        layer.groupBy("col", "row")
        .cogroup(cands.groupBy("col", "row"))
        .applyInPandas(run, LAYER_SCHEMA)
    )
