"""Batch helpers shared by all tile UDFs: decode/encode whole Arrow batches,
NoData-aware paste/merge, resampling.

Pixel placement follows the reference's Tile.merge semantics
(raster/.../merge/*.scala): paste `other` into `this` where `this` is NoData,
resampling `other` by extent alignment (NearestNeighbor default). All loops
are over *tiles in a batch*, never over pixels or rows of a DataFrame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import codec
from .grid import Extent


def decode_batch(tile_bytes: pd.Series, fmts: pd.Series | str) -> list[np.ndarray]:
    if isinstance(fmts, str):
        return [codec.decode_tile(bytes(b), fmts) for b in tile_bytes]
    return [codec.decode_tile(bytes(b), f) for b, f in zip(tile_bytes, fmts)]


def encode_batch(arrs: list[np.ndarray], fmt: str) -> list[bytes]:
    return [codec.encode_tile(a, fmt) for a in arrs]


def nn_patch(
    target_shape: tuple[int, int],
    target_ext: Extent,
    src: np.ndarray,
    src_ext: Extent,
) -> tuple[int, int, np.ndarray] | None:
    """NN-resample src onto the target grid, clipped: returns (y0, x0,
    patch) — the covered target pixel window and its values — or None if
    disjoint. This is the shuffle-compact form of a CutTiles part: only the
    defined sub-rectangle travels, not a full mostly-NoData tile.
    src may be (h, w) or (h, w, bands); bands ride along."""
    th, tw = target_shape[:2]
    sh, sw = src.shape[:2]
    inter = target_ext.intersection(src_ext)
    if inter is None or inter.width <= 0 or inter.height <= 0:
        return None
    tcw = target_ext.width / tw
    tch = target_ext.height / th
    # target pixel index range covered by the intersection (center-in rule)
    x0 = max(0, int(np.ceil((inter.xmin - target_ext.xmin) / tcw - 0.5)))
    x1 = min(tw - 1, int(np.floor((inter.xmax - target_ext.xmin) / tcw - 0.5)))
    y0 = max(0, int(np.ceil((target_ext.ymax - inter.ymax) / tch - 0.5)))
    y1 = min(th - 1, int(np.floor((target_ext.ymax - inter.ymin) / tch - 0.5)))
    if x1 < x0 or y1 < y0:
        return None
    # centers of those target pixels in map coords
    cx = target_ext.xmin + (np.arange(x0, x1 + 1) + 0.5) * tcw
    cy = target_ext.ymax - (np.arange(y0, y1 + 1) + 0.5) * tch
    # nearest source pixel
    scw = src_ext.width / sw
    sch = src_ext.height / sh
    sx = np.clip(((cx - src_ext.xmin) / scw).astype(np.int64), 0, sw - 1)
    sy = np.clip(((src_ext.ymax - cy) / sch).astype(np.int64), 0, sh - 1)
    return y0, x0, src[np.ix_(sy, sx)]


def paste_patch(target: np.ndarray, y0: int, x0: int, patch: np.ndarray, nodata_mask_fn) -> None:
    """First-wins paste of a patch window into target (in place)."""
    block = target[y0 : y0 + patch.shape[0], x0 : x0 + patch.shape[1]]
    mask = nodata_mask_fn(block)
    block[mask] = patch[mask]


def nn_paste(
    target: np.ndarray,
    target_ext: Extent,
    src: np.ndarray,
    src_ext: Extent,
    nodata_mask_fn,
) -> None:
    """Nearest-neighbor paste of src into target where target is NoData
    (in place). Both arrays are single-band (h, w); grids need not align."""
    got = nn_patch(target.shape, target_ext, src, src_ext)
    if got is None:
        return
    y0, x0, patch = got
    paste_patch(target, y0, x0, patch, nodata_mask_fn)


def nodata_mask_uint8(a: np.ndarray) -> np.ndarray:
    return a == 0  # reference UByteConstantNoData sentinel = 0


def nodata_mask_nan(a: np.ndarray) -> np.ndarray:
    return np.isnan(a)


def resample_nearest(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    sh, sw = src.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * sh / out_h).astype(np.int64).clip(0, sh - 1)
    xs = ((np.arange(out_w) + 0.5) * sw / out_w).astype(np.int64).clip(0, sw - 1)
    return src[np.ix_(ys, xs)]


def resample_bilinear(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    sh, sw = src.shape[:2]
    fy = (np.arange(out_h) + 0.5) * sh / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * sw / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, sh - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, sw - 1)
    y1 = np.clip(y0 + 1, 0, sh - 1)
    x1 = np.clip(x0 + 1, 0, sw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
    if src.ndim == 3:  # bands ride along on the trailing axis
        wy, wx = wy[..., None], wx[..., None]
    a = src.astype(np.float64)
    top = a[np.ix_(y0, x0)] * (1 - wx) + a[np.ix_(y0, x1)] * wx
    bot = a[np.ix_(y1, x0)] * (1 - wx) + a[np.ix_(y1, x1)] * wx
    return top * (1 - wy) + bot * wy


def block_reduce(src: np.ndarray, factor: int, how: str = "average") -> np.ndarray:
    """Aggregate resample by integer factor (Average/Max/Min/Sum kernels)."""
    h, w = src.shape[:2]
    b = src[: h - h % factor, : w - w % factor].reshape(
        h // factor, factor, w // factor, factor
    ).astype(np.float64)
    with np.errstate(invalid="ignore"):
        if how == "average":
            return np.nanmean(b, axis=(1, 3))
        if how == "max":
            return np.nanmax(b, axis=(1, 3))
        if how == "min":
            return np.nanmin(b, axis=(1, 3))
        if how == "sum":
            return np.nansum(b, axis=(1, 3))
    raise ValueError(how)
