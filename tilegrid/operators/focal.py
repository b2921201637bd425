"""Focal (stencil) map algebra: BufferTiles + neighborhood kernels.

BufferTiles (reference spark/.../buffer/BufferTiles.scala:31-145) is THE
distributed stencil mechanism: every tile contributes itself plus 8 edge
slivers to its neighbors' keys; one groupBy assembles each key's buffered
(h+2s, w+2s) array; the kernel sweeps it and crops the center back out.
We reproduce that shape exactly — explode-9 (mapInPandas, slivers only, so
the shuffle carries ~ (1 + 8*s/tile) x the layer, not 9x) + one groupBy.

Kernels are vectorized NumPy (sliding_window_view / Horn stencils), replacing
the reference's Cursor/Cellwise sweep machinery
(raster/.../focal/FocalCalculation.scala:45-170). Missing-neighbor margins
are NaN: mean/sum/... then clip the window (matches FocalCalculation edge
behavior); slope/aspect/hillshade substitute the focal value
(SurfacePointCalculation.scala edge note).

At 100TB scale: the groupBy shuffles on (zoom,col,row); writing layers
sorted/partitioned by cell makes most sliver traffic partition-local (the
reference's SpacePartitioner rationale, PartitionerIndex.scala:34-45).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec
from ..cell import z2_encode
from ..oracle import (  # the same vetted kernels the oracle uses, applied
    _horn_derivatives,  # per buffered tile instead of per whole raster
)
from . import LAYER_SCHEMA

_BUFFER_SCHEMA = (
    "zoom int, tcol int, trow int, dx int, dy int, part binary, ph int, pw int, "
    "h int, w int"
)


def buffer_parts(layer: DataFrame, size: int) -> DataFrame:
    """Explode each tile into (target_key, direction, sliver) rows.
    dx,dy = src_key - target_key (so dx=-1 means the sliver comes from the
    tile west of the target and lands on the buffered array's west margin)."""

    def emit(it):
        for pdf in it:
            rows = {k: [] for k in (
                "zoom", "tcol", "trow", "dx", "dy", "part", "ph", "pw", "h", "w")}
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = arr.shape[:2]  # (h, w) or (h, w, bands)
                s = size
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            part = arr
                        else:
                            # target east of src (dx=1) gets src's RIGHT strip
                            # (lands on the target's west margin), etc.
                            xs = slice(w - s, w) if dx == 1 else (slice(0, s) if dx == -1 else slice(0, w))
                            ys = slice(h - s, h) if dy == 1 else (slice(0, s) if dy == -1 else slice(0, h))
                            part = arr[ys, xs]
                        rows["zoom"].append(t.zoom)
                        rows["tcol"].append(t.col + dx)
                        rows["trow"].append(t.row + dy)
                        rows["dx"].append(-dx)
                        rows["dy"].append(-dy)
                        rows["part"].append(codec.raw_encode(np.ascontiguousarray(part)))
                        rows["ph"].append(part.shape[0])
                        rows["pw"].append(part.shape[1])
                        rows["h"].append(h)
                        rows["w"].append(w)
            yield pd.DataFrame(rows)

    return layer.mapInPandas(emit, _BUFFER_SCHEMA)


def _assemble(pdf: pd.DataFrame, size: int) -> tuple[np.ndarray, int, int] | None:
    """Build the buffered array for one target key. Returns None when the
    target key has no center tile (pure-margin key outside the layer).
    Multiband tiles ((h, w, bands) arrays — MultibandTileLayerRDDMethods
    parity) buffer band-wise into a (h+2s, w+2s, bands) array."""
    s = size
    h, w = int(pdf.iloc[0]["h"]), int(pdf.iloc[0]["w"])
    parts = [
        (codec.decode_tile(bytes(t.part), "raw"), int(t.dx), int(t.dy))
        for t in pdf.itertuples(index=False)
    ]
    nb = max(p.shape[2] if p.ndim == 3 else 0 for p, _, _ in parts)
    shape = (h + 2 * s, w + 2 * s, nb) if nb else (h + 2 * s, w + 2 * s)
    buf = np.full(shape, np.nan)
    has_center = False
    for part, dx, dy in parts:
        if nb and part.ndim == 2:  # mixed layers: broadcast across bands
            part = part[:, :, None]
        if dx == 0 and dy == 0:
            buf[s : s + h, s : s + w] = part
            has_center = True
        else:
            x0 = 0 if dx == -1 else (s + w if dx == 1 else s)
            y0 = 0 if dy == -1 else (s + h if dy == 1 else s)
            buf[y0 : y0 + part.shape[0], x0 : x0 + part.shape[1]] = part
    return (buf, h, w) if has_center else None


def _win_kernels(size: int):
    k = 2 * size + 1

    def windows(buf):
        return np.lib.stride_tricks.sliding_window_view(buf, (k, k))

    def guard(fn):
        def run(buf):
            w = windows(buf)
            with np.errstate(invalid="ignore", all="ignore"):
                return fn(w)
        return run

    return {
        "mean": guard(lambda w: np.nanmean(w, axis=(2, 3))),
        "sum": guard(lambda w: np.nansum(w, axis=(2, 3))),
        "min": guard(lambda w: np.nanmin(w, axis=(2, 3))),
        "max": guard(lambda w: np.nanmax(w, axis=(2, 3))),
        "median": guard(lambda w: np.nanmedian(w, axis=(2, 3))),
        "stddev": guard(lambda w: np.nanstd(w, axis=(2, 3))),
        # Conway (focal/Conway.scala:21-65 via focalConway): 1 where the
        # window's DATA-cell count (center included) is 2 or 3, else NoData
        "conway": guard(lambda w: np.where(
            np.isin(np.count_nonzero(~np.isnan(w), axis=(2, 3)), (2, 3)),
            1.0, np.nan)),
    }


def focal(
    layer: DataFrame,
    op: str,
    size: int = 1,
    cell_size: tuple[float, float] | None = None,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    kernel: np.ndarray | None = None,
) -> DataFrame:
    """FocalOperation (FocalOperation.scala:29-63): bufferTiles(size) ->
    stencil kernel -> center crop. `op` in {mean,sum,min,max,median,stddev,
    conway,mode,convolve,slope,aspect,hillshade}. slope/aspect/hillshade
    need cell_size=(cw,ch) and force size=1 (3x3 Horn stencil)."""
    surface = op in ("slope", "aspect", "hillshade")
    if surface:
        size = 1
        if cell_size is None:
            raise ValueError(f"{op} requires cell_size=(cw, ch)")
        cw, ch = cell_size
    if op == "convolve":
        if kernel is None:
            raise ValueError("convolve requires kernel")
        size = kernel.shape[0] // 2
    parts = buffer_parts(layer, size)
    win = _win_kernels(size)

    def compute2d(buf: np.ndarray, h: int, w: int) -> np.ndarray:
        s = size
        if op in win:
            return win[op](buf)  # window view already yields (h, w)
        if op == "mode":
            return _focal_mode_crop(buf, s, h, w)
        if op == "convolve":
            kw = np.lib.stride_tricks.sliding_window_view(buf, kernel.shape)
            kz = np.where(np.isnan(kw), 0.0, kw)
            return np.einsum("ijkl,kl->ij", kz, kernel)
        if surface:
            dzdx, dzdy = _horn_derivatives(buf, cw, ch)
            dzdx, dzdy = dzdx[s : s + h, s : s + w], dzdy[s : s + h, s : s + w]
            if op == "slope":
                res = np.degrees(np.arctan(z_factor * np.sqrt(dzdx**2 + dzdy**2)))
            elif op == "aspect":
                a = np.arctan2(dzdy, -dzdx)
                a = np.where(a < 0, a + 2 * np.pi, a)
                a = np.where((dzdx == 0) & (dzdy == 0), np.nan, a)
                res = np.degrees(np.where(a == 2 * np.pi, 0.0, a))
            else:
                res = _hillshade(dzdx, dzdy, azimuth, altitude)
            return np.asarray(res, np.float64)
        raise ValueError(f"unknown focal op {op!r}")

    def apply_group(pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf, size)
        if asm is None:
            return pd.DataFrame(
                {c: [] for c in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            )
        buf, h, w = asm
        if buf.ndim == 3:
            # multiband: each band is an independent stencil pass
            # (MultibandTileLayerRDDMethods focal parity)
            res = np.stack(
                [compute2d(np.ascontiguousarray(buf[:, :, i]), h, w)
                 for i in range(buf.shape[2])], axis=-1)
        else:
            res = compute2d(buf, h, w)
        first = pdf.iloc[0]
        zoom, col, row = int(first["zoom"]), int(first["tcol"]), int(first["trow"])
        return pd.DataFrame(
            {
                "zoom": [zoom], "col": [col], "row": [row],
                "cell": [int(z2_encode(col, row))],
                "tile": [codec.raw_encode(np.ascontiguousarray(res))],
                "h": [h], "w": [w], "fmt": ["raw"],
            }
        )

    return parts.groupBy("zoom", "tcol", "trow").applyInPandas(apply_group, LAYER_SCHEMA)


def _focal_mode_crop(buf: np.ndarray, s: int, h: int, w: int) -> np.ndarray:
    """Fully vectorized mode (tiles.rowwise_mode over the flattened
    windows): same semantics as the per-pixel np.unique formulation —
    NaN-skipping, ties to the smallest value, all-NaN stays NaN — without
    the 65k-iteration Python loop."""
    from ..tiles import rowwise_mode

    k = 2 * s + 1
    win = np.lib.stride_tricks.sliding_window_view(buf, (k, k))
    return rowwise_mode(win.reshape(h * w, k * k)).reshape(h, w)


def _hillshade(dzdx, dzdy, azimuth, altitude):
    az = math.radians(90.0 - azimuth)
    ze = math.radians(90.0 - altitude)
    denom = np.sqrt(dzdx**2 + dzdy**2 + 1.0)
    cos_slope = 1.0 / denom
    sin_slope = np.sqrt(dzdx**2 + dzdy**2) / denom
    mag = np.sqrt(dzdx**2 + dzdy**2)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos_aspect = np.where(
            dzdx == 0,
            np.where(dzdy == 0, -1.0, 0.0),
            np.where(dzdy == 0, np.where(dzdx < 0, 1.0, -1.0), -dzdx / mag),
        )
        sin_aspect = np.where(
            dzdy == 0, 0.0, np.where(dzdx == 0, np.sign(dzdy), dzdy / mag)
        )
    c = math.cos(az) * cos_aspect + math.sin(az) * sin_aspect
    return np.round(127.0 * np.maximum(0.0, math.cos(ze) * cos_slope + math.sin(ze) * sin_slope * c))


def _layer_scalar_stats(layer: DataFrame) -> tuple[int, float, float]:
    """(n, mean, population variance) over all data cells, from exact
    integer-friendly partials (n, sum x, sum x^2): mean = sx/n,
    var = (sx2 - sx*sx/n)/n — the same formula text the SQL oracle uses."""

    def part(it):
        for pdf in it:
            n, sx, sx2 = 0, 0.0, 0.0
            for t in pdf.itertuples(index=False):
                v = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                v = v[~np.isnan(v)]
                n += int(v.size)
                sx += float(v.sum())
                sx2 += float((v * v).sum())
            yield pd.DataFrame({"n": [n], "sx": [sx], "sx2": [sx2]})

    import pyspark.sql.functions as F

    r = (
        layer.mapInPandas(part, "n long, sx double, sx2 double")
        .agg(F.sum("n").alias("n"), F.sum("sx").alias("sx"), F.sum("sx2").alias("sx2"))
        .collect()[0]
    )
    n, sx, sx2 = int(r["n"]), float(r["sx"]), float(r["sx2"])
    mean = sx / n
    var = (sx2 - sx * sx / n) / n
    return n, mean, var


def _morans_parts(layer: DataFrame, size: int, mean: float, var: float) -> DataFrame:
    """Per-pixel local Moran's I + neighbor count as a (li, w) layer pass.
    Semantics follow Moran.scala TileMoransICalculation: base = x - mean;
    z = sum over in-bounds non-NaN window cells != focus of (x_j - mean);
    li = base / var * z / w. Computed as z = (S - x) - w*mean with S the
    integer-exact window sum, so the per-pixel float path is reproducible
    in SQL."""
    parts = buffer_parts(layer, size)

    def apply_group(pdf: pd.DataFrame) -> pd.DataFrame:
        asm = _assemble(pdf, size)
        if asm is None:
            return pd.DataFrame(
                {c: [] for c in
                 ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt", "wtile")}
            )
        buf, h, w = asm
        s = size
        k = 2 * s + 1
        win = np.lib.stride_tricks.sliding_window_view(buf, (k, k))
        with np.errstate(invalid="ignore"):
            S = np.nansum(win, axis=(2, 3))
            wfull = (~np.isnan(win)).sum(axis=(2, 3))
        center = buf[s : s + h, s : s + w]
        wn = wfull - 1  # neighbors excluding the focus
        base = center - mean
        z = (S - center) - wn * mean
        with np.errstate(invalid="ignore", divide="ignore"):
            li = base / var * z / wn
        li[np.isnan(center) | (wn <= 0)] = np.nan
        first = pdf.iloc[0]
        zoom, col, row = int(first["zoom"]), int(first["tcol"]), int(first["trow"])
        wn_out = np.where(np.isnan(center), np.nan, wn.astype(np.float64))
        return pd.DataFrame(
            {
                "zoom": [zoom], "col": [col], "row": [row],
                "cell": [int(z2_encode(col, row))],
                "tile": [codec.raw_encode(np.ascontiguousarray(li))],
                "h": [h], "w": [w], "fmt": ["raw"],
                "wtile": [codec.raw_encode(np.ascontiguousarray(wn_out))],
            }
        )

    return parts.groupBy("zoom", "tcol", "trow").applyInPandas(
        apply_group, LAYER_SCHEMA + ", wtile binary"
    )


def morans_i(layer: DataFrame, size: int = 1) -> DataFrame:
    """Focal (local) Moran's I layer (Moran.scala TileMoransICalculation):
    two passes — global mean/variance, then the buffered stencil."""
    layer = layer.persist()
    _, mean, var = _layer_scalar_stats(layer)
    return _morans_parts(layer, size, mean, var).drop("wtile")


def morans_i_global(layer: DataFrame, size: int = 1) -> DataFrame:
    """Global Moran's I scalar (Moran.scala ScalarMoransICalculation):
    sum over cells of base/var*z divided by the total neighbor count.
    Returns a 1-row DataFrame (morans_i double)."""
    import pyspark.sql.functions as F

    layer = layer.persist()
    _, mean, var = _layer_scalar_stats(layer)
    parts = _morans_parts(layer, size, mean, var)

    def partials(it):
        for pdf in it:
            num, ws = 0.0, 0
            for t in pdf.itertuples(index=False):
                li = codec.decode_tile(bytes(t.tile), "raw")
                wn = codec.decode_tile(bytes(t.wtile), "raw")
                ok = ~np.isnan(li)
                # contribution = base/var*z = li * w per cell
                num += float((li[ok] * wn[ok]).sum())
                ws += int(wn[ok].sum())
            yield pd.DataFrame({"num": [num], "ws": [ws]})

    agg = parts.mapInPandas(partials, "num double, ws long").agg(
        F.sum("num").alias("num"), F.sum("ws").alias("ws")
    )
    return agg.select((F.col("num") / F.col("ws")).alias("morans_i"))


def focal_mean(layer, size=1):
    return focal(layer, "mean", size)


def focal_sum(layer, size=1):
    return focal(layer, "sum", size)


def focal_min(layer, size=1):
    return focal(layer, "min", size)


def focal_max(layer, size=1):
    return focal(layer, "max", size)


def focal_median(layer, size=1):
    return focal(layer, "median", size)


def focal_mode(layer, size=1):
    return focal(layer, "mode", size)


def focal_stddev(layer, size=1):
    return focal(layer, "stddev", size)


def convolve(layer, kernel: np.ndarray):
    return focal(layer, "convolve", kernel=kernel)


def slope(layer, cell_size, z_factor=1.0):
    return focal(layer, "slope", cell_size=cell_size, z_factor=z_factor)


def aspect(layer, cell_size):
    return focal(layer, "aspect", cell_size=cell_size)


def hillshade(layer, cell_size, azimuth=315.0, altitude=45.0, z_factor=1.0):
    return focal(
        layer, "hillshade", cell_size=cell_size,
        azimuth=azimuth, altitude=altitude, z_factor=z_factor,
    )
