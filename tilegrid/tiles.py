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


def rowwise_mode(rows: np.ndarray) -> np.ndarray:
    """Mode of each row, fully vectorized: sort, run-length via a
    maximum.accumulate start-index trick, argmax of the running run count.
    NaNs are skipped (NaN != NaN makes each its own length-1 run, so a NaN
    only wins when the whole row is NaN); ties resolve to the smallest
    value — the same semantics as np.unique + argmax per row."""
    n, m = rows.shape
    vs = np.sort(rows, axis=1)  # NaNs sort to the end
    idx = np.arange(m)
    neq = np.ones((n, m), dtype=bool)
    neq[:, 1:] = vs[:, 1:] != vs[:, :-1]
    start = np.maximum.accumulate(np.where(neq, idx, 0), axis=1)
    count = idx - start + 1
    return vs[np.arange(n), np.argmax(count, axis=1)]


def block_reduce(src: np.ndarray, factor: int, how: str = "average") -> np.ndarray:
    """Aggregate resample by integer factor
    (Average/Max/Min/Sum/Median/Mode kernels, Resample.scala:25-36).
    Trailing band axes ride along (mode is single-band only)."""
    h, w = src.shape[:2]
    b = src[: h - h % factor, : w - w % factor].reshape(
        (h // factor, factor, w // factor, factor) + src.shape[2:]
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
        if how == "median":
            return np.nanmedian(b, axis=(1, 3))
        if how == "mode":
            if src.ndim != 2:
                raise ValueError("mode block_reduce is single-band only")
            oh, ow = b.shape[0], b.shape[2]
            rows = b.transpose(0, 2, 1, 3).reshape(oh * ow, factor * factor)
            return rowwise_mode(rows).reshape(oh, ow)
    raise ValueError(how)


def _sample_axis(n_out: int, n_src: int, taps: int, weight_fn):
    """Separable-kernel sampling plan for one axis: (indices (n_out, taps)
    edge-clamped, weights (n_out, taps)). Center rule fy=(i+0.5)*s/o-0.5."""
    f = (np.arange(n_out) + 0.5) * n_src / n_out - 0.5
    i0 = np.floor(f).astype(np.int64)
    t = f - i0
    offs = np.arange(taps) - (taps // 2 - 1)  # e.g. taps=4 -> -1..2
    idx = np.clip(i0[:, None] + offs[None, :], 0, n_src - 1)
    wts = weight_fn(t[:, None], offs[None, :])
    return idx, wts


def _cubic_w(t, offs, a: float = -0.5):
    """Cubic-convolution (Keys) kernel weights at |s| = |offs - t|."""
    s = np.abs(offs - t)
    return np.where(
        s <= 1,
        (a + 2) * s**3 - (a + 3) * s**2 + 1,
        np.where(s < 2, a * s**3 - 5 * a * s**2 + 8 * a * s - 4 * a, 0.0),
    )


def _bspline_w(t, offs):
    """Cubic B-spline kernel (Resample.scala CubicSpline): smoothing, not
    interpolating — partition of unity, so constants are preserved."""
    s = np.abs(offs - t)
    return np.where(
        s <= 1,
        2.0 / 3.0 - s**2 + s**3 / 2.0,
        np.where(s < 2, (2.0 - s) ** 3 / 6.0, 0.0),
    )


def _lanczos_w(t, offs, a: int = 3):
    s = offs - t
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.sinc(s) * np.sinc(s / a)
    w = np.where(np.abs(s) < a, w, 0.0)
    return w / w.sum(axis=1, keepdims=True)  # normalized (standard Lanczos)


def _separable_resample(src: np.ndarray, out_h: int, out_w: int, taps: int, weight_fn):
    sh, sw = src.shape[:2]
    yi, yw = _sample_axis(out_h, sh, taps, weight_fn)
    xi, xw = _sample_axis(out_w, sw, taps, weight_fn)
    a = src.astype(np.float64)
    tmp = np.einsum("okw,ok->ow", a[yi, :], yw)          # rows pass
    return np.einsum("hok,ok->ho", tmp[:, xi], xw)       # cols pass


def resample_cubic(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """CubicConvolution (Keys a=-0.5; Resample.scala CubicConvolution),
    edge-clamped, separable."""
    return _separable_resample(src, out_h, out_w, 4, _cubic_w)


def resample_lanczos(src: np.ndarray, out_h: int, out_w: int, a: int = 3) -> np.ndarray:
    """Lanczos-3 windowed sinc (Resample.scala Lanczos), edge-clamped,
    separable, normalized weights."""
    return _separable_resample(
        src, out_h, out_w, 2 * a, lambda t, o: _lanczos_w(t, o, a)
    )


def resample_cubicspline(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Cubic B-spline (Resample.scala CubicSpline), edge-clamped,
    separable."""
    return _separable_resample(src, out_h, out_w, 4, _bspline_w)


RESAMPLERS = {
    "nearest": resample_nearest,
    "bilinear": resample_bilinear,
    "cubic": resample_cubic,
    "cubicspline": resample_cubicspline,
    "lanczos": resample_lanczos,
}
