"""Local (per-pixel) map algebra.

The reference's ~45 LocalTileBinaryOp/unary kernels
(raster/.../mapalgebra/local/*.scala, spark wrappers
spark/.../mapalgebra/local/*TileRDDMethods.scala) collapse into one dispatch
table of NumPy ufuncs under a NoData mask. NoData propagation: either operand
NoData -> NoData (local/Add.scala:31-38). Tiles are float64 'raw' with NaN
NoData at compute time.

Plan shapes:
  unary    — mapInPandas, no shuffle
  binary   — equi-join on (zoom,col,row) (co-partitioned when both sides were
             written partitioned by cell) + mapInPandas kernel
  n-ary    — unionByName + one groupBy(keys) + stacked-reduce kernel
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from . import KEY_COLS, LAYER_SCHEMA

# ---- kernels over float64-with-NaN arrays ----

UNARY_OPS = {
    "abs": np.abs,
    "negate": np.negative,
    "ceil": np.ceil,
    "floor": np.floor,
    "round": np.round,
    "log": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "defined": lambda a: (~np.isnan(a)).astype(np.float64),
    "undefined": lambda a: np.isnan(a).astype(np.float64),
    "not": lambda a: (a == 0).astype(np.float64),
    "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "sinh": np.sinh, "cosh": np.cosh, "tanh": np.tanh,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
}

BINARY_OPS = {
    "add": np.add,
    "subtract": np.subtract,
    "multiply": np.multiply,
    "divide": np.divide,
    "pow": np.power,
    "min": np.fmin,  # NaN-propagation handled by the mask below
    "max": np.fmax,
    "atan2": np.arctan2,
    "equal": lambda a, b: (a == b).astype(np.float64),
    "unequal": lambda a, b: (a != b).astype(np.float64),
    "greater": lambda a, b: (a > b).astype(np.float64),
    "greaterorequal": lambda a, b: (a >= b).astype(np.float64),
    "less": lambda a, b: (a < b).astype(np.float64),
    "lessorequal": lambda a, b: (a <= b).astype(np.float64),
    "and": lambda a, b: ((a != 0) & (b != 0)).astype(np.float64),
    "or": lambda a, b: ((a != 0) | (b != 0)).astype(np.float64),
    "xor": lambda a, b: ((a != 0) ^ (b != 0)).astype(np.float64),
}

# n-ary reducers over a (n_layers, h, w) stack
NARY_OPS = {
    "sum": lambda s: np.nansum(s, axis=0),
    "min": lambda s: np.nanmin(s, axis=0),
    "max": lambda s: np.nanmax(s, axis=0),
    "mean": lambda s: np.nanmean(s, axis=0),
    "variance": lambda s: np.nanvar(s, axis=0, ddof=1),
    "variety": lambda s: _variety(s),
    "majority": lambda s: _majority(s, True),
    "minority": lambda s: _majority(s, False),
}


def _variety(s: np.ndarray) -> np.ndarray:
    srt = np.sort(s, axis=0)  # NaNs go last
    fresh = ~np.isnan(srt) & (
        np.concatenate([np.ones((1,) + s.shape[1:], bool), srt[1:] != srt[:-1]])
    )
    return fresh.sum(axis=0).astype(np.float64)


def _majority(s: np.ndarray, most: bool) -> np.ndarray:
    """Per-pixel mode (most=True) / anti-mode across the layer axis,
    NaN-excluded; ties resolve to the SMALLEST value (np.unique order —
    the reference's Majority/Minority TreeMap iteration order). Vectorized:
    sort along the stack axis, label value-runs, scatter-count run lengths,
    then argmax/argmin over runs — no per-pixel Python."""
    n, h, w = s.shape
    srt = np.sort(s, axis=0)  # NaNs sort last
    valid = ~np.isnan(srt)
    fresh = np.ones((n, h, w), dtype=bool)
    fresh[1:] = srt[1:] != srt[:-1]
    run_id = np.cumsum(fresh, axis=0) - 1  # 0-based run index per pixel
    counts = np.zeros((n, h, w), dtype=np.int64)
    jj, yy, xx = np.nonzero(valid)
    np.add.at(counts, (run_id[jj, yy, xx], yy, xx), 1)
    # value of each run = the sorted value at the run's first slot
    vals = np.full((n, h, w), np.nan)
    fj, fy, fx = np.nonzero(fresh & valid)
    vals[run_id[fj, fy, fx], fy, fx] = srt[fj, fy, fx]
    if most:
        best = np.argmax(counts, axis=0)  # first max -> smallest value
    else:
        masked = np.where(counts == 0, np.iinfo(np.int64).max, counts)
        best = np.argmin(masked, axis=0)  # first min -> smallest value
    out = np.take_along_axis(vals, best[None], axis=0)[0]
    return out  # all-NaN pixels: counts all 0 -> run 0 -> vals NaN


def _dec(b, f) -> np.ndarray:
    return codec.decode_tile(bytes(b), f).astype(np.float64)


def local_unary(layer: DataFrame, op: str, scalar: float | None = None) -> DataFrame:
    """tile.mapDouble(f) (Tile.scala:215). `op` from UNARY_OPS, or a BINARY_OPS
    name with `scalar` for tile-vs-constant (localAdd(5) etc.)."""
    if scalar is None:
        fn = UNARY_OPS[op]
    else:
        bop = BINARY_OPS[op]
        fn = lambda a: bop(a, scalar)  # noqa: E731

    def run(it):
        for pdf in it:
            tiles = []
            for t, f in zip(pdf["tile"], pdf["fmt"]):
                arr = _dec(t, f)
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = fn(arr)
                r[np.isnan(arr)] = np.nan
                tiles.append(codec.raw_encode(r))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def local_binary(a: DataFrame, b: DataFrame, op: str) -> DataFrame:
    """combineValues binary (CombineMethods.scala:29-33): inner join on key +
    per-pixel kernel with NoData propagation."""
    fn = BINARY_OPS[op]
    right = b.select(
        *KEY_COLS, F.col("tile").alias("tile_b"), F.col("fmt").alias("fmt_b")
    )
    joined = a.join(right, KEY_COLS, "inner")

    def run(it):
        for pdf in it:
            tiles = []
            for t1, f1, t2, f2 in zip(pdf["tile"], pdf["fmt"], pdf["tile_b"], pdf["fmt_b"]):
                x, y = _dec(t1, f1), _dec(t2, f2)
                with np.errstate(invalid="ignore", divide="ignore"):
                    r = fn(x, y)
                r = np.asarray(r, dtype=np.float64)
                r[np.isnan(x) | np.isnan(y)] = np.nan
                tiles.append(codec.raw_encode(r))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return joined.mapInPandas(run, LAYER_SCHEMA)


def local_nary(layers: list[DataFrame], op: str) -> DataFrame:
    """combineValues n-ary (CombineMethods.scala:35-42): union + one groupBy."""
    fn = NARY_OPS[op]
    u = layers[0]
    for nxt in layers[1:]:
        u = u.unionByName(nxt)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack([_dec(t, f) for t, f in zip(pdf["tile"], pdf["fmt"])])
        with np.errstate(invalid="ignore"):
            r = fn(stack)
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "zoom": [first["zoom"]], "col": [first["col"]], "row": [first["row"]],
                "cell": [first["cell"]], "tile": [codec.raw_encode(np.asarray(r, np.float64))],
                "h": [first["h"]], "w": [first["w"]], "fmt": ["raw"],
            }
        )

    return u.groupBy(*KEY_COLS).applyInPandas(reduce_group, LAYER_SCHEMA)


def local_mask(a: DataFrame, b: DataFrame, readMask=None, inverse: bool = False) -> DataFrame:
    """localMask/localInverseMask (LocalTileRDDMethods.scala:57-75): NoData-out
    cells of `a` where mask layer `b` is (not) NoData."""
    right = b.select(
        *KEY_COLS, F.col("tile").alias("tile_b"), F.col("fmt").alias("fmt_b")
    )
    joined = a.join(right, KEY_COLS, "inner")

    def run(it):
        for pdf in it:
            tiles = []
            for t1, f1, t2, f2 in zip(pdf["tile"], pdf["fmt"], pdf["tile_b"], pdf["fmt_b"]):
                x, m = _dec(t1, f1), _dec(t2, f2)
                keep = np.isnan(m) if inverse else ~np.isnan(m)
                r = np.where(keep, x, np.nan)
                tiles.append(codec.raw_encode(r))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return joined.mapInPandas(run, LAYER_SCHEMA)


def local_if(layer: DataFrame, cond, true_value: float, false_value: float | None = None) -> DataFrame:
    """IfCell (conditional.scala): set value where cond(pixels) holds."""

    def run(it):
        for pdf in it:
            tiles = []
            for t, f in zip(pdf["tile"], pdf["fmt"]):
                arr = _dec(t, f)
                c = cond(arr)
                if false_value is None:
                    r = np.where(c, true_value, arr)
                else:
                    r = np.where(c, true_value, false_value).astype(np.float64)
                r = np.asarray(r, np.float64)
                r[np.isnan(arr)] = np.nan
                tiles.append(codec.raw_encode(r))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def reclassify(
    layer: DataFrame,
    break_map: dict[float, float],
    boundary: str = "lte",
    fallback: float = float("nan"),
) -> DataFrame:
    """BreakMap reclassification (raster/.../render/BreakMap.scala:36-135):
    each cell maps to the value of the break bucket it falls in under the
    boundary rule — "lte" (the reference's MapStrategy default: smallest
    break >= z), "lt", "gte" (largest break <= z), "gt", or "exact".
    Cells outside every bucket get `fallback` (the reference's non-strict
    NODATA default); NoData stays NoData. The per-tile binary search is a
    vectorized np.searchsorted over the sorted breaks — one batch pass."""
    breaks = np.asarray(sorted(break_map), np.float64)
    values = np.asarray([break_map[b] for b in sorted(break_map)], np.float64)
    if boundary not in ("lte", "lt", "gte", "gt", "exact"):
        raise ValueError(f"unknown boundary {boundary!r}")

    def classify(arr: np.ndarray) -> np.ndarray:
        if boundary in ("lte", "lt"):
            idx = np.searchsorted(breaks, arr,
                                  side="left" if boundary == "lte" else "right")
            ok = idx < len(breaks)
        elif boundary in ("gte", "gt"):
            idx = np.searchsorted(breaks, arr,
                                  side="right" if boundary == "gte" else "left") - 1
            ok = idx >= 0
        else:  # exact
            idx = np.searchsorted(breaks, arr, side="left")
            ok = (idx < len(breaks)) & (breaks[np.minimum(idx, len(breaks) - 1)] == arr)
        out = np.full(arr.shape, fallback)
        np.copyto(out, values[np.clip(idx, 0, len(breaks) - 1)], where=ok)
        out[np.isnan(arr)] = np.nan
        return out

    def run(it):
        for pdf in it:
            tiles = []
            for t, f in zip(pdf["tile"], pdf["fmt"]):
                tiles.append(codec.raw_encode(classify(_dec(t, f))))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)
