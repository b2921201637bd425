"""Hierarchical spatial cell index (from scratch, H3/S2-style over the ZXY grid).

A *cell* addresses one tile of the power-of-2 ZXY pyramid: resolution = zoom,
position = (col, row). Within a zoom, cells are linearized by a Z-order
(Morton) curve so that range predicates on the sorted `cell` column give
storage pruning for free (the reference achieves the same with
Z2 + FilterMapFileInputFormat: io/index/zcurve/Z2.scala:21-132,
io/hadoop/HadoopRDDReader.scala:40-101 — reimplemented here from the published
bit-interleave + quadtree-decomposition semantics, vectorized in NumPy).

API (all NumPy-vectorized; scalars accepted):
  z2_encode / z2_decode            Morton interleave of (col,row), 29 bits each
  cell_encode / cell_decode        packed (zoom, col, row) -> int64 id
  cell_parent / cell_children      quadtree navigation
  k_ring                           all cells within Chebyshev distance k
  zranges                          Z-index ranges covering a grid rectangle
  MergeQueue / merge_ranges        coalesce adjacent/overlapping ranges
  cover_extent / cover_polygon     cells of a layout intersecting a geometry
  z2_sql                           the same interleave as a SQL expression
                                   (Spark SQL and DuckDB dialects)
"""

from __future__ import annotations

import numpy as np

from .grid import Extent, GridBounds, LayoutDefinition

MAX_ZOOM = 29  # 29-bit coords x2 = 58 bits + 5 zoom bits = 63 (sign-safe int64)

_MASKS_SPLIT = (
    (32, np.uint64(0x00000000FFFFFFFF)),
    (16, np.uint64(0x0000FFFF0000FFFF)),
    (8, np.uint64(0x00FF00FF00FF00FF)),
    (4, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (2, np.uint64(0x3333333333333333)),
    (1, np.uint64(0x5555555555555555)),
)


def z2_split(v) -> np.ndarray:
    """Insert a 0 bit between every bit of v (low 29 bits considered)."""
    x = np.asarray(v).astype(np.uint64) & np.uint64((1 << MAX_ZOOM) - 1)
    for shift, mask in _MASKS_SPLIT:
        x = (x ^ (x << np.uint64(shift))) & mask
    return x


_MASKS_COMBINE = (
    (1, np.uint64(0x3333333333333333)),
    (2, np.uint64(0x0F0F0F0F0F0F0F0F)),
    (4, np.uint64(0x00FF00FF00FF00FF)),
    (8, np.uint64(0x0000FFFF0000FFFF)),
    (16, np.uint64(0x00000000FFFFFFFF)),
)


def z2_combine(z) -> np.ndarray:
    """Inverse of z2_split: gather every other bit."""
    x = np.asarray(z).astype(np.uint64) & np.uint64(0x5555555555555555)
    for shift, mask in _MASKS_COMBINE:
        x = (x ^ (x >> np.uint64(shift))) & mask
    return x


def z2_encode(col, row) -> np.ndarray:
    """Morton code ...y1x1y0x0 (col in even bits, row in odd bits)."""
    return (z2_split(col) | (z2_split(row) << np.uint64(1))).astype(np.int64)


def z2_decode(z) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z).astype(np.uint64)
    return (
        z2_combine(z).astype(np.int64),
        z2_combine(z >> np.uint64(1)).astype(np.int64),
    )


# ---- Z3: space-time Morton interleave (col, row, time-bin) ----
# Reference: spark/.../io/index/zcurve/Z3.scala + ZSpaceTimeKeyIndex.scala,
# rebuilt from the published split-by-3 magic-mask sequence. 21 bits per
# dimension -> 63 bits (sign-safe int64).

_MASKS3_SPLIT = (
    (32, np.uint64(0x1F00000000FFFF)),
    (16, np.uint64(0x1F0000FF0000FF)),
    (8, np.uint64(0x100F00F00F00F00F)),
    (4, np.uint64(0x10C30C30C30C30C3)),
    (2, np.uint64(0x1249249249249249)),
)


def z3_split(v) -> np.ndarray:
    """Insert two 0 bits between every bit of v (low 21 bits considered)."""
    x = np.asarray(v).astype(np.uint64) & np.uint64((1 << 21) - 1)
    for shift, mask in _MASKS3_SPLIT:
        x = (x | (x << np.uint64(shift))) & mask
    return x


_MASKS3_COMBINE = (
    (2, np.uint64(0x10C30C30C30C30C3)),
    (4, np.uint64(0x100F00F00F00F00F)),
    (8, np.uint64(0x1F0000FF0000FF)),
    (16, np.uint64(0x1F00000000FFFF)),
    (32, np.uint64((1 << 21) - 1)),
)


def z3_combine(z) -> np.ndarray:
    """Inverse of z3_split: gather every third bit."""
    x = np.asarray(z).astype(np.uint64) & np.uint64(0x1249249249249249)
    for shift, mask in _MASKS3_COMBINE:
        x = (x ^ (x >> np.uint64(shift))) & mask
    return x


def z3_encode(col, row, t) -> np.ndarray:
    """3-D Morton code: col in bits 0,3,6.., row in 1,4,7.., t in 2,5,8..
    (Z3.scala apply). `t` is a discretized time bin (e.g. day index)."""
    return (
        z3_split(col) | (z3_split(row) << np.uint64(1)) | (z3_split(t) << np.uint64(2))
    ).astype(np.int64)


def z3_decode(z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    z = np.asarray(z).astype(np.uint64)
    return (
        z3_combine(z).astype(np.int64),
        z3_combine(z >> np.uint64(1)).astype(np.int64),
        z3_combine(z >> np.uint64(2)).astype(np.int64),
    )


def _interleave3_sql(v: str, dialect: str) -> str:
    """Split-by-3 of the low 21 bits of expression `v` as SQL. Uses the
    overflow-safe identity (x | (x<<n)) & M == (x & M) | ((x & (M>>n)) << n)
    — DuckDB raises on int64 shift overflow, so only surviving bits shift."""
    if dialect == "spark":
        shl = "shiftleft({x}, {n})"
    elif dialect == "duckdb":
        shl = "({x} << {n})"
    else:
        raise ValueError(dialect)
    x = f"({v} & {(1 << 21) - 1})"
    for shift, mask in _MASKS3_SPLIT:
        m = int(mask)
        keep = f"({x} & {m})"
        shifted = shl.format(x=f"({x} & {m >> shift})", n=shift)
        x = f"({keep} | {shifted})"
    return x


def z3_sql(col_expr: str, row_expr: str, t_expr: str, dialect: str = "spark") -> str:
    """SQL expression computing z3_encode — identical bit math in Spark SQL
    and DuckDB for oracle parity."""
    cx = _interleave3_sql(f"CAST({col_expr} AS BIGINT)", dialect)
    rx = _interleave3_sql(f"CAST({row_expr} AS BIGINT)", dialect)
    tx = _interleave3_sql(f"CAST({t_expr} AS BIGINT)", dialect)
    if dialect == "spark":
        return f"({cx} | shiftleft({rx}, 1) | shiftleft({tx}, 2))"
    return f"({cx} | ({rx} << 1) | ({tx} << 2))"


# ---- packed cell ids: (zoom, col, row) -> int64 ----

_ZOOM_SHIFT = np.uint64(58)


def cell_encode(zoom, col, row) -> np.ndarray:
    zoom_a = np.asarray(zoom).astype(np.uint64)
    z = z2_encode(col, row).astype(np.uint64)
    return ((zoom_a << _ZOOM_SHIFT) | z).astype(np.int64)


def cell_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell).astype(np.uint64)
    zoom = (c >> _ZOOM_SHIFT).astype(np.int64)
    col, row = z2_decode(c & np.uint64((1 << 58) - 1))
    return zoom, col, row


def cell_parent(cell, steps: int = 1) -> np.ndarray:
    zoom, col, row = cell_decode(cell)
    s = np.int64(steps)
    return cell_encode(zoom - s, col >> s, row >> s)


def cell_children(cell) -> np.ndarray:
    """The 4 children of each cell; output shape (..., 4)."""
    zoom, col, row = cell_decode(cell)
    c2, r2 = col * 2, row * 2
    kids = [
        cell_encode(zoom + 1, c2 + dc, r2 + dr) for dr in (0, 1) for dc in (0, 1)
    ]
    return np.stack(kids, axis=-1)


def k_ring(cell: int, k: int, layout_cols: int | None = None, layout_rows: int | None = None):
    """All cells within Chebyshev distance k of `cell` (a (2k+1)^2 block,
    clipped to the layout grid). Drives kNN candidate expansion."""
    zoom, col, row = (int(a) for a in cell_decode(cell))
    n_cols = layout_cols if layout_cols is not None else (1 << zoom)
    n_rows = layout_rows if layout_rows is not None else (1 << zoom)
    c0, c1 = max(0, col - k), min(n_cols - 1, col + k)
    r0, r1 = max(0, row - k), min(n_rows - 1, row + k)
    cc, rr = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
    return cell_encode(zoom, cc.ravel(), rr.ravel())


def ring_offsets(k: int) -> np.ndarray:
    """(dc, dr) offsets of the ring at exactly Chebyshev distance k."""
    if k == 0:
        return np.array([[0, 0]], dtype=np.int64)
    offs = []
    for dc in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if max(abs(dc), abs(dr)) == k:
                offs.append((dc, dr))
    return np.array(offs, dtype=np.int64)


def z3ranges(
    col_min: int, row_min: int, t_min: int,
    col_max: int, row_max: int, t_max: int,
    max_ranges: int = 256,
) -> list[tuple[int, int]]:
    """Z3 index ranges (inclusive) covering a (space x time) box — the
    octree analogue of `zranges` (reference Z3.zranges): an octant fully
    inside the query reports its contiguous Z3 range, a partial octant
    recurses. Drives combined spatial+temporal storage pruning on a
    cell3-sorted layer."""
    out = MergeQueue()

    def covers(c0, r0, t0, c1, r1, t1) -> bool:
        return (
            c0 >= col_min and c1 <= col_max
            and r0 >= row_min and r1 <= row_max
            and t0 >= t_min and t1 <= t_max
        )

    def overlaps(c0, r0, t0, c1, r1, t1) -> bool:
        return (
            c0 <= col_max and c1 >= col_min
            and r0 <= row_max and r1 >= row_min
            and t0 <= t_max and t1 >= t_min
        )

    def rec(prefix: int, bits: int, c0: int, r0: int, t0: int):
        side = 1 << bits
        c1, r1, t1 = c0 + side - 1, r0 + side - 1, t0 + side - 1
        if not overlaps(c0, r0, t0, c1, r1, t1):
            return
        if covers(c0, r0, t0, c1, r1, t1):
            out.add(prefix, prefix + (1 << (3 * bits)) - 1)
            return
        if bits == 0:
            return
        h = side // 2
        step = 1 << (3 * (bits - 1))
        # child order = Z3 bit layout: col bit 0, row bit 1, t bit 2
        i = 0
        for dt in (0, h):
            for dr in (0, h):
                for dc in (0, h):
                    rec(prefix + i * step, bits - 1, c0 + dc, r0 + dr, t0 + dt)
                    i += 1

    bits = 1
    while (1 << bits) <= max(col_max, row_max, t_max):
        bits += 1
    rec(0, bits, 0, 0, 0)
    ranges = out.to_list()
    while len(ranges) > max_ranges:  # coarsen pairwise by smallest gap
        gaps = [
            (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
        ]
        _, i = min(gaps)
        ranges[i] = (ranges[i][0], ranges[i + 1][1])
        del ranges[i + 1]
    return ranges


# ---- RowMajor + Hilbert key indexes (io/index/rowmajor/, io/index/hilbert/) ----

def rowmajor_encode(col, row, layout_cols: int) -> np.ndarray:
    """RowMajorSpatialKeyIndex.toIndex: row * layoutCols + col."""
    return (
        np.asarray(row).astype(np.int64) * np.int64(layout_cols)
        + np.asarray(col).astype(np.int64)
    )


def rowmajor_sql(col_expr: str, row_expr: str, layout_cols: int) -> str:
    """Same expression text in Spark SQL and DuckDB."""
    return f"(CAST({row_expr} AS BIGINT) * {layout_cols} + CAST({col_expr} AS BIGINT))"


def hilbert_encode(col, row, order: int) -> np.ndarray:
    """Hilbert curve index of (col, row) on a 2^order x 2^order grid
    (HilbertSpatialKeyIndex.scala:52-120 delegates to the Uzaygezen
    library; this is the published iterative xy->d bit algorithm,
    vectorized)."""
    x = np.asarray(col).astype(np.int64).copy()
    y = np.asarray(row).astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_decode(d, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of hilbert_encode (published d->xy iterative algorithm)."""
    t = np.asarray(d).astype(np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    top = np.int64(1) << np.int64(order)
    while s < top:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


# ---- range coalescing (reference io/index/MergeQueue.scala semantics) ----

def merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Coalesce overlapping or adjacent [lo, hi] (inclusive) ranges."""
    if not ranges:
        return []
    rs = sorted(ranges)
    out = [list(rs[0])]
    for lo, hi in rs[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [(lo, hi) for lo, hi in out]


class MergeQueue:
    def __init__(self):
        self._ranges: list[tuple[int, int]] = []

    def add(self, lo: int, hi: int) -> None:
        self._ranges.append((lo, hi))

    def to_list(self) -> list[tuple[int, int]]:
        return merge_ranges(self._ranges)


# ---- Z-order range decomposition over a grid rectangle ----

def zranges(
    col_min: int, row_min: int, col_max: int, row_max: int, max_ranges: int = 256
) -> list[tuple[int, int]]:
    """Z-index ranges (inclusive) covering the rectangle — quadtree recursion:
    a quad fully inside the query reports its whole contiguous Z range;
    a partially-covered quad recurses into its 4 children. Equivalent to the
    reference's Z2.zranges (Z2.scala:101-131), rebuilt from the published
    algorithm. `max_ranges` bounds the output by merging when exceeded
    (coarser ranges scan slightly more but stay correct as a superset filter
    plus residual predicate)."""
    out = MergeQueue()

    def covers(qc0, qr0, qc1, qr1) -> bool:
        return qc0 >= col_min and qc1 <= col_max and qr0 >= row_min and qr1 <= row_max

    def overlaps(qc0, qr0, qc1, qr1) -> bool:
        return qc0 <= col_max and qc1 >= col_min and qr0 <= row_max and qr1 >= row_min

    def rec(prefix: int, bits: int, qc0: int, qr0: int):
        side = 1 << bits
        qc1, qr1 = qc0 + side - 1, qr0 + side - 1
        if not overlaps(qc0, qr0, qc1, qr1):
            return
        if covers(qc0, qr0, qc1, qr1):
            out.add(prefix, prefix + (1 << (2 * bits)) - 1)
            return
        if bits == 0:
            return
        h = side // 2
        step = 1 << (2 * (bits - 1))
        rec(prefix + 0 * step, bits - 1, qc0, qr0)
        rec(prefix + 1 * step, bits - 1, qc0 + h, qr0)
        rec(prefix + 2 * step, bits - 1, qc0, qr0 + h)
        rec(prefix + 3 * step, bits - 1, qc0 + h, qr0 + h)

    # smallest power-of-2 square covering the rectangle
    bits = 1
    while (1 << bits) <= max(col_max, row_max):
        bits += 1
    rec(0, bits, 0, 0)
    ranges = out.to_list()
    while len(ranges) > max_ranges:  # coarsen pairwise by smallest gap
        gaps = [
            (ranges[i + 1][0] - ranges[i][1], i) for i in range(len(ranges) - 1)
        ]
        _, i = min(gaps)
        ranges[i] = (ranges[i][0], ranges[i + 1][1])
        del ranges[i + 1]
    return ranges


# ---- even-volume SFC breaks (reference io/index/KeyIndex.scala:29-72) ----

def index_breaks(ranges: list[tuple[int, int]], count: int) -> list[int]:
    """Divide the index space covered by sorted, disjoint, inclusive [lo, hi]
    ranges into bins of (near-)equal VOLUME, returning up to `count` break
    points. Every break point lies inside one of the ranges (never in a gap
    between ranges — gap indices are never observed, so splitting there
    would skew real bin loads). Reference semantics KeyIndex.scala:43-72:
    bin capacity is max(ceil(total / (count+1)), 1); a break is emitted each
    time the running volume fills a bin, i.e. at cumulative volumes
    k*cap (k = 1, 2, ...); the final break falling on the very end of the
    last range is dropped via the `count` cap.

    Vectorized: cumulative range volumes + searchsorted instead of the
    reference's per-range fold — same outputs, O(R + count) not O(R*count).
    """
    if count < 1:
        raise ValueError("breaks count must be at least one")
    if not ranges:
        return []
    lo = np.asarray([r[0] for r in ranges], dtype=np.int64)
    hi = np.asarray([r[1] for r in ranges], dtype=np.int64)
    lens = hi - lo + 1
    cum = np.cumsum(lens)  # cum[i] = volume through range i
    total = int(cum[-1])
    cap = max(-(-total // (count + 1)), 1)
    # target cumulative volumes k*cap that fit inside the total volume
    vols = np.arange(cap, total + 1, cap, dtype=np.int64)
    # range containing each target volume: first i with cum[i] >= vol
    idx = np.searchsorted(cum, vols, side="left")
    before = np.where(idx > 0, cum[np.minimum(idx - 1, len(cum) - 1)], 0)
    breaks = lo[idx] + (vols - before) - 1
    return [int(b) for b in breaks[:count]]


def bucket_sql(breaks: list[int], col: str = "cell") -> str:
    """SQL expression assigning a row to its even-volume bin: the number of
    breaks strictly below `col` (break b is the inclusive END of its bin).
    Emitted as a balanced binary-search CASE tree so codegen evaluates
    log2(len(breaks)) comparisons per row instead of a linear filter() over
    the whole break array (higher-order functions stay interpreted and
    O(count) per row — wrong shape for thousands of partitions)."""
    if not breaks:
        return "0"

    def rec(lo: int, hi: int) -> str:  # buckets [lo, hi] inclusive
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2  # cell <= breaks[mid] -> bucket in [lo, mid]
        return (
            f"(CASE WHEN {col} <= {breaks[mid]}"
            f" THEN {rec(lo, mid)} ELSE {rec(mid + 1, hi)} END)"
        )

    return rec(0, len(breaks))


def murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a single int32 value, matching Spark's hash() for
    IntegerType columns (public algorithm; Spark uses seed 42). Needed
    driver-side to pre-image hash-partition placement (see
    layer_io.write_layer's deterministic break-partitioning)."""
    M = 0xFFFFFFFF
    k = x & M
    k = (k * 0xCC9E2D51) & M
    k = ((k << 15) | (k >> 17)) & M
    k = (k * 0x1B873593) & M
    h = seed & M
    h ^= k
    h = ((h << 13) | (h >> 19)) & M
    h = (h * 5 + 0xE6546B64) & M
    h ^= 4  # total byte length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h  # signed int32


def partition_tokens(n: int) -> list[int]:
    """For each target partition p in [0, n): the smallest non-negative int
    token t with pmod(murmur3_int32(t), n) == p. Mapping bucket b ->
    token[b] and calling df.repartition(n, token_col) places every bucket
    EXACTLY in its own partition — hash partitioning becomes deterministic
    identity placement with no RDD-level custom partitioner and no
    repartitionByRange sampling pass over the data."""
    tokens: list[int | None] = [None] * n
    found, t = 0, 0
    while found < n:
        p = murmur3_int32(t) % n  # python % is already non-negative
        if tokens[p] is None:
            tokens[p] = t
            found += 1
        t += 1
    return tokens  # type: ignore[return-value]


# ---- geometry covers ----

def cover_extent(layout: LayoutDefinition, extent: Extent) -> np.ndarray:
    """Cells (z2 within this layout) of tiles intersecting the extent."""
    gb = layout.map_transform.gridbounds_for_extent(extent)
    gb = _clip_gb(gb, layout)
    if gb is None:
        return np.empty(0, dtype=np.int64)
    cc, rr = np.meshgrid(
        np.arange(gb.col_min, gb.col_max + 1), np.arange(gb.row_min, gb.row_max + 1)
    )
    return z2_encode(cc.ravel(), rr.ravel())


def _clip_gb(gb: GridBounds, layout: LayoutDefinition) -> GridBounds | None:
    tl = layout.tile_layout
    return gb.intersection(GridBounds(0, 0, tl.layout_cols - 1, tl.layout_rows - 1))


def cover_polygon(layout: LayoutDefinition, rings: list[np.ndarray]) -> np.ndarray:
    """Cells of tiles intersecting a polygon (exterior ring rings[0], holes
    after). Coarse bbox gridbounds, then exact tile-extent x polygon
    intersection test per candidate tile (vectorized)."""
    from .geometry import polygon_intersects_extents

    ext = rings[0]
    bbox = Extent(
        float(ext[:, 0].min()), float(ext[:, 1].min()),
        float(ext[:, 0].max()), float(ext[:, 1].max()),
    )
    gb = layout.map_transform.gridbounds_for_extent(bbox)
    gb = _clip_gb(gb, layout)
    if gb is None:
        return np.empty(0, dtype=np.int64)
    cc, rr = np.meshgrid(
        np.arange(gb.col_min, gb.col_max + 1), np.arange(gb.row_min, gb.row_max + 1)
    )
    cc, rr = cc.ravel(), rr.ravel()
    xmin, ymin, xmax, ymax = layout.map_transform.extents_for_keys(cc, rr)
    hit = polygon_intersects_extents(rings, xmin, ymin, xmax, ymax)
    return z2_encode(cc[hit], rr[hit])


def cover_line(layout: LayoutDefinition, coords: np.ndarray) -> np.ndarray:
    """Cells of tiles a polyline passes through — the supercover grid
    traversal (Rasterizer.foreachCellByLineString) run at layout resolution,
    so cover cost scales with line length in tiles, not bbox area."""
    from .operators.rasterize import rasterize_line

    tl = layout.tile_layout
    mask = rasterize_line(
        np.asarray(coords, np.float64), layout.extent,
        tl.layout_cols, tl.layout_rows,
    )
    rr, cc = np.nonzero(mask)
    return z2_encode(cc.astype(np.int64), rr.astype(np.int64))


def zranges_for_extent(
    layout: LayoutDefinition, extent: Extent, max_ranges: int = 256
) -> list[tuple[int, int]]:
    """Z-order cell ranges covering an extent — the pushdown-pruning path:
    `WHERE cell BETWEEN lo AND hi [OR ...]` on the sorted cell column."""
    gb = layout.map_transform.gridbounds_for_extent(extent)
    gb = _clip_gb(gb, layout)
    if gb is None:
        return []
    return zranges(gb.col_min, gb.row_min, gb.col_max, gb.row_max, max_ranges)


# ---- SQL expression builders (same math, JVM/DuckDB side — no UDF) ----

def _interleave_sql(v: str, dialect: str) -> str:
    """Spread the low 29 bits of expression `v` (one 0 bit between each)."""
    if dialect == "spark":
        shl, band, bxor = "shiftleft({x}, {n})", "({a} & {b})", "({a} ^ {b})"
    elif dialect == "duckdb":
        shl, band, bxor = "({x} << {n})", "({a} & {b})", "xor({a}, {b})"
    else:
        raise ValueError(dialect)
    x = f"({v} & 536870911)"  # 2^29 - 1
    for shift, mask in _MASKS_SPLIT:
        m = int(mask)
        shifted = shl.format(x=x, n=shift)
        x = band.format(a=bxor.format(a=x, b=shifted), b=str(m))
        x = f"({x})"
    return x


def z2_sql(col_expr: str, row_expr: str, dialect: str = "spark") -> str:
    """SQL expression computing z2_encode(col_expr, row_expr). Identical bit
    math in Spark SQL and DuckDB, so engine and oracle agree exactly."""
    cx = _interleave_sql(f"CAST({col_expr} AS BIGINT)", dialect)
    rx = _interleave_sql(f"CAST({row_expr} AS BIGINT)", dialect)
    if dialect == "spark":
        return f"({cx} | shiftleft({rx}, 1))"
    return f"({cx} | ({rx} << 1))"


# ---- Geohash (public base32 lat/lon cell code; Niemeyer 2008) ----
# Complements the integer curves above with the interoperable string cell
# id the rest of the geo ecosystem exchanges: the same Morton interleave,
# but lon leads the bit stream and the 5-bit groups are base32 chars.
# For precision p (chars), total = 5p bits; lon gets ceil(total/2) bits,
# lat floor(total/2). When total is even the leading (MSB) lon bit lands
# on an odd Morton position -> z2_encode(lat, lon); when odd, on an even
# position -> z2_encode(lon, lat). Encode/decode/SQL share one quantizer
# so NumPy, Spark SQL, and DuckDB agree bit-for-bit.

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_DEC = {c: i for i, c in enumerate(GEOHASH32)}


def _gh_nbits(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 11:
        raise ValueError("geohash precision must be in 1..11")
    total = 5 * precision
    return (total + 1) // 2, total // 2  # (lon bits, lat bits)


def geohash_int(lon, lat, precision: int = 6) -> np.ndarray:
    """The 5*precision-bit geohash integer (bits of the base32 string)."""
    nlon, nlat = _gh_nbits(precision)
    lon_q = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
                     * (1 << nlon))
    lat_q = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
                     * (1 << nlat))
    lon_q = np.clip(lon_q, 0, (1 << nlon) - 1).astype(np.int64)
    lat_q = np.clip(lat_q, 0, (1 << nlat) - 1).astype(np.int64)
    if precision % 2 == 0:
        return z2_encode(lat_q, lon_q)
    return z2_encode(lon_q, lat_q)


def geohash_encode(lon, lat, precision: int = 6) -> np.ndarray:
    """Base32 geohash strings (vectorized)."""
    g = np.asarray(geohash_int(lon, lat, precision)).astype(np.uint64)
    tbl = np.array(list(GEOHASH32))
    out = None
    for j in range(precision):
        sh = np.uint64(5 * (precision - 1 - j))
        ch = tbl[((g >> sh) & np.uint64(31)).astype(np.int64)]
        out = ch if out is None else np.char.add(out, ch)
    return out


def geohash_decode(gh) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell centers + half-widths: (lon, lat, lon_err, lat_err)."""
    ghs = np.atleast_1d(np.asarray(gh, dtype=str))
    precision = len(ghs.flat[0])
    nlon, nlat = _gh_nbits(precision)
    g = np.zeros(ghs.shape, dtype=np.uint64)
    for j in range(precision):
        vals = np.array([_GH_DEC[s[j]] for s in ghs.ravel()],
                        dtype=np.uint64).reshape(ghs.shape)
        g = (g << np.uint64(5)) | vals
    if precision % 2 == 0:
        lat_q, lon_q = z2_decode(g)
    else:
        lon_q, lat_q = z2_decode(g)
    lon_err = 180.0 / (1 << nlon)
    lat_err = 90.0 / (1 << nlat)
    lon = (lon_q.astype(np.float64) + 0.5) * (360.0 / (1 << nlon)) - 180.0
    lat = (lat_q.astype(np.float64) + 0.5) * (180.0 / (1 << nlat)) - 90.0
    return lon, lat, np.full_like(lon, lon_err), np.full_like(lat, lat_err)


def geohash_int_sql(lon_expr: str, lat_expr: str, precision: int = 6,
                    dialect: str = "spark") -> str:
    """SQL expression for geohash_int — identical quantize + interleave in
    Spark SQL and DuckDB (pure IEEE-double + integer bit math, no UDF).
    Compute it once (CTE / withColumn), then render chars from the column
    with geohash_chars_sql to avoid repeating the interleave per char."""
    nlon, nlat = _gh_nbits(precision)
    lon_q = (f"LEAST(GREATEST(CAST(floor((({lon_expr}) + 180.0) / 360.0 "
             f"* {1 << nlon}) AS BIGINT), 0), {(1 << nlon) - 1})")
    lat_q = (f"LEAST(GREATEST(CAST(floor((({lat_expr}) + 90.0) / 180.0 "
             f"* {1 << nlat}) AS BIGINT), 0), {(1 << nlat) - 1})")
    if precision % 2 == 0:
        return z2_sql(lat_q, lon_q, dialect)
    return z2_sql(lon_q, lat_q, dialect)


def geohash_chars_sql(ghi_expr: str, precision: int = 6,
                      dialect: str = "spark") -> str:
    """Render a geohash integer column/expression as its base32 string."""
    parts = []
    for j in range(precision):
        sh = 5 * (precision - 1 - j)
        if sh == 0:
            v = f"({ghi_expr})"
        elif dialect == "spark":
            v = f"shiftrightunsigned({ghi_expr}, {sh})"
        else:
            v = f"(({ghi_expr}) >> {sh})"
        parts.append(
            f"substr('{GEOHASH32}', CAST(({v} & 31) AS INT) + 1, 1)"
        )
    return "concat(" + ", ".join(parts) + ")"


def _gh_from_quant(lon_q, lat_q, precision: int) -> np.ndarray:
    if precision % 2 == 0:
        g = z2_encode(lat_q, lon_q)
    else:
        g = z2_encode(lon_q, lat_q)
    g = np.asarray(g).astype(np.uint64)
    tbl = np.array(list(GEOHASH32))
    out = None
    for j in range(precision):
        sh = np.uint64(5 * (precision - 1 - j))
        ch = tbl[((g >> sh) & np.uint64(31)).astype(np.int64)]
        out = ch if out is None else np.char.add(out, ch)
    return out


def geohash_neighbors(gh: str) -> list[str]:
    """The <= 8 adjacent geohash cells (proximity blocking: a radius-r
    search over geohash-bucketed data probes a cell + its neighbors, the
    string-cell analogue of k_ring). Longitude wraps at the antimeridian;
    latitude neighbors past the poles are dropped."""
    ghs = np.atleast_1d(np.asarray(gh, dtype=str))
    precision = len(ghs.flat[0])
    nlon, nlat = _gh_nbits(precision)
    g = np.uint64(0)
    for j in range(precision):
        g = (g << np.uint64(5)) | np.uint64(_GH_DEC[str(gh)[j]])
    if precision % 2 == 0:
        lat_q, lon_q = z2_decode(g)
    else:
        lon_q, lat_q = z2_decode(g)
    lon_q, lat_q = int(lon_q), int(lat_q)
    out = []
    for dlat in (-1, 0, 1):
        la = lat_q + dlat
        if not 0 <= la < (1 << nlat):
            continue
        for dlon in (-1, 0, 1):
            if dlat == 0 and dlon == 0:
                continue
            lo = (lon_q + dlon) % (1 << nlon)
            out.append(
                str(_gh_from_quant(
                    np.int64(lo), np.int64(la), precision
                ).item())
            )
    return out


# ---- Quadkey (Bing/Azure tile id: base-4 string of the ZXY address) ----
# digit j of a zoom-z quadkey is (row_bit << 1) | col_bit at level j+1 —
# exactly two bits of the Z2 Morton code (col in even bits, row in odd),
# so encode/decode/SQL all reuse the interleave above.

def quadkey_encode(zoom: int, col, row) -> np.ndarray:
    """Quadkey strings for (col,row) tiles at `zoom` (vectorized)."""
    z = np.asarray(z2_encode(col, row)).astype(np.uint64)
    tbl = np.array(list("0123"))
    out = None
    for j in range(zoom):
        sh = np.uint64(2 * (zoom - 1 - j))
        ch = tbl[((z >> sh) & np.uint64(3)).astype(np.int64)]
        out = ch if out is None else np.char.add(out, ch)
    return out if out is not None else np.full(np.shape(z), "", dtype=object)


def quadkey_decode(qk) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(zoom, col, row) of quadkey strings (all must share one length)."""
    qks = np.atleast_1d(np.asarray(qk, dtype=str))
    zoom = len(qks.flat[0])
    z = np.zeros(qks.shape, dtype=np.uint64)
    for j in range(zoom):
        digits = np.array(
            [int(s[j]) for s in qks.ravel()], dtype=np.uint64
        ).reshape(qks.shape)
        z = (z << np.uint64(2)) | digits
    col, row = z2_decode(z)
    return np.full(qks.shape, zoom, dtype=np.int64), col, row


def quadkey_sql(
    col_expr: str, row_expr: str, zoom: int, dialect: str = "spark"
) -> str:
    """SQL expression for quadkey_encode — compute the z2 interleave once
    (CTE/withColumn) with z2_sql, then render with quadkey_chars_sql; this
    form inlines both for convenience at small zooms."""
    return quadkey_chars_sql(z2_sql(col_expr, row_expr, dialect), zoom, dialect)


def quadkey_chars_sql(z2_expr: str, zoom: int, dialect: str = "spark") -> str:
    """Render a Z2 Morton column/expression as its zoom-level quadkey."""
    parts = []
    for j in range(zoom):
        sh = 2 * (zoom - 1 - j)
        if sh == 0:
            v = f"({z2_expr})"
        elif dialect == "spark":
            v = f"shiftrightunsigned({z2_expr}, {sh})"
        else:
            v = f"(({z2_expr}) >> {sh})"
        parts.append(f"substr('0123', CAST(({v} & 3) AS INT) + 1, 1)")
    return "concat(" + ", ".join(parts) + ")"
