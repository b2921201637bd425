"""Layer reshaping: crop, mask, merge, split, stitch, zoom resample,
histogram equalization / matching.

Reference: spark/.../crop/Crop.scala:30-70, mask/Mask.scala:70-139,
merge/TileRDDMerge.scala:28-43, resample/ZoomResample.scala:28-120,
stitch/StitchRDDMethods.scala:30-55,
equalization/RDDHistogramEqualization.scala:44-120.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codec
from ..cell import z2_encode
from ..geometry import polygon_contains_extent, wkb_decode
from ..grid import Extent, GridBounds, LayoutDefinition
from . import KEY_COLS, LAYER_SCHEMA
from .rasterize import scanline_rasterize


def crop(layer: DataFrame, ext: Extent, layout: LayoutDefinition) -> DataFrame:
    """Drop tiles outside the extent, NoData-out pixels outside it on
    boundary tiles (Crop.scala:30-70)."""
    gb = layout.map_transform.gridbounds_for_extent(ext)
    filtered = layer.where(
        (F.col("col") >= gb.col_min) & (F.col("col") <= gb.col_max)
        & (F.col("row") >= gb.row_min) & (F.col("row") <= gb.row_max)
    )
    mt = layout.map_transform

    def run(it):
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                text = mt.extent_for_key(int(t.col), int(t.row))
                inter = text.intersection(ext)
                if inter is None:
                    arr[:] = np.nan
                elif inter != text:
                    h, w = arr.shape
                    cw, ch = text.width / w, text.height / h
                    cx = text.xmin + (np.arange(w) + 0.5) * cw
                    cy = text.ymax - (np.arange(h) + 0.5) * ch
                    outside = (
                        (cx[None, :] < ext.xmin) | (cx[None, :] > ext.xmax)
                        | (cy[:, None] < ext.ymin) | (cy[:, None] > ext.ymax)
                    )
                    arr[outside] = np.nan
                tiles.append(codec.raw_encode(arr))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return filtered.mapInPandas(run, LAYER_SCHEMA)


def mask(layer: DataFrame, rings: list[np.ndarray], layout: LayoutDefinition) -> DataFrame:
    """NoData-out pixels not covered by the polygon; prefilter tiles by cell
    cover (Mask.scala:70-139)."""
    from ..cell import cover_polygon

    cells = [int(c) for c in cover_polygon(layout, rings)]
    filtered = layer.where(F.col("cell").isin(cells)) if cells else layer.limit(0)
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast([r.tolist() for r in rings])
    mt = layout.map_transform

    def run(it):
        rr = [np.asarray(r) for r in bc.value]
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                text = mt.extent_for_key(int(t.col), int(t.row))
                if not polygon_contains_extent(rr, text):
                    h, w = arr.shape
                    m = scanline_rasterize(rr, text, w, h)
                    arr[~m] = np.nan
                tiles.append(codec.raw_encode(arr))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return filtered.mapInPandas(run, LAYER_SCHEMA)


def merge_layers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Mosaic: full-outer join on keys; where both exist, b fills a's NoData
    (TileRDDMerge.scala:28-43)."""
    right = b.select(
        *KEY_COLS, F.col("cell").alias("cell_b"), F.col("tile").alias("tile_b"),
        F.col("fmt").alias("fmt_b"), F.col("h").alias("h_b"), F.col("w").alias("w_b"),
    )
    joined = a.join(right, KEY_COLS, "full")

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            for t in pdf.itertuples(index=False):
                if t.tile is None:
                    arr = codec.decode_tile(bytes(t.tile_b), t.fmt_b).astype(np.float64)
                    h, w, cell = int(t.h_b), int(t.w_b), int(t.cell_b)
                else:
                    arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                    h, w, cell = int(t.h), int(t.w), int(t.cell)
                    if t.tile_b is not None:
                        other = codec.decode_tile(bytes(t.tile_b), t.fmt_b).astype(np.float64)
                        m = np.isnan(arr)
                        arr[m] = other[m]
                rows["zoom"].append(int(t.zoom))
                rows["col"].append(int(t.col))
                rows["row"].append(int(t.row))
                rows["cell"].append(cell)
                rows["tile"].append(codec.raw_encode(arr))
                rows["h"].append(h)
                rows["w"].append(w)
                rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, LAYER_SCHEMA)


def stitch(layer: DataFrame) -> tuple[np.ndarray, GridBounds]:
    """Collect a (bounded!) layer to one driver-side array
    (StitchRDDMethods.scala:30-55) — test/debug utility."""
    pdf = layer.toPandas()
    tiles = {
        (int(r["col"]), int(r["row"])): codec.decode_tile(bytes(r["tile"]), r["fmt"])
        .astype(np.float64)
        for _, r in pdf.iterrows()
    }
    from ..oracle import stitch as _st

    return _st(tiles)


def zoom_resample(layer: DataFrame, from_zoom: int, to_zoom: int) -> DataFrame:
    """Zoom z -> higher zoom z' by key arithmetic + per-tile NN upsample
    (ZoomResample.scala:28-120): each source tile explodes into 4^(dz)
    children."""
    dz = to_zoom - from_zoom
    if dz <= 0:
        raise ValueError("to_zoom must be > from_zoom")
    n = 1 << dz

    def run(it):
        for pdf in it:
            rows = {k: [] for k in ("zoom", "col", "row", "cell", "tile", "h", "w", "fmt")}
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                h, w = arr.shape
                sub_h, sub_w = h // n, w // n
                for dy in range(n):
                    for dx in range(n):
                        block = arr[
                            dy * sub_h : (dy + 1) * sub_h, dx * sub_w : (dx + 1) * sub_w
                        ]
                        up = np.repeat(np.repeat(block, n, axis=0), n, axis=1)
                        c, r = int(t.col) * n + dx, int(t.row) * n + dy
                        rows["zoom"].append(to_zoom)
                        rows["col"].append(c)
                        rows["row"].append(r)
                        rows["cell"].append(int(z2_encode(c, r)))
                        rows["tile"].append(codec.raw_encode(up))
                        rows["h"].append(h)
                        rows["w"].append(w)
                        rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return layer.mapInPandas(run, LAYER_SCHEMA)


def histogram_equalization(layer: DataFrame, num_buckets: int = 256) -> DataFrame:
    """Global-stat-then-map (RDDHistogramEqualization.scala:44-120): pass 1
    bucket counts -> broadcast CDF -> pass 2 per-pixel transfer
    out = lo + cdf[bucket(v)] * (hi - lo).

    Bucketing uses the floor rule bucket(v) = clip(floor((v-lo)/(hi-lo)*nb),
    0, nb-1) in BOTH passes (count and transfer). Every step is +,-,*,/ of
    exact integer counts — no transcendentals — so the transfer is
    bit-identical to the SQL oracle twin."""

    def bucket_of(arr: np.ndarray, lo: float, hi: float, nb: int) -> np.ndarray:
        return np.floor((arr - lo) / (hi - lo) * nb).clip(0, nb - 1).astype(np.int64)

    from .summary import min_max

    mm = min_max(layer).collect()[0]
    lo, hi = float(mm["vmin"]), float(mm["vmax"])
    if hi <= lo:
        hi = lo + 1.0

    def count_buckets(it):
        for pdf in it:
            acc = np.zeros(num_buckets, dtype=np.int64)
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                v = arr[~np.isnan(arr)]
                if v.size:
                    acc += np.bincount(bucket_of(v, lo, hi, num_buckets),
                                       minlength=num_buckets)
            yield pd.DataFrame({"bucket": np.arange(num_buckets), "n": acc})

    bucket_rows = (
        layer.mapInPandas(count_buckets, "bucket int, n long")
        .groupBy("bucket").agg(F.sum("n").alias("n")).collect()
    )
    counts = np.zeros(num_buckets, dtype=np.int64)
    for r in bucket_rows:
        counts[int(r["bucket"])] = int(r["n"])
    cdf = np.cumsum(counts).astype(np.float64)
    cdf = cdf / cdf[-1] if cdf[-1] > 0 else cdf
    spark = layer.sparkSession
    bc = spark.sparkContext.broadcast((lo, hi, cdf.tolist()))

    def run(it):
        lo_, hi_, cdf_l = bc.value
        cdf_a = np.asarray(cdf_l)
        nb = len(cdf_a)
        for pdf in it:
            tiles = []
            for t in pdf.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt).astype(np.float64)
                out = np.where(np.isnan(arr), np.nan, 0.0)
                ok = ~np.isnan(arr)
                out[ok] = lo_ + cdf_a[bucket_of(arr[ok], lo_, hi_, nb)] * (hi_ - lo_)
                tiles.append(codec.raw_encode(out))
            pdf = pdf.copy()
            pdf["tile"] = tiles
            pdf["fmt"] = "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)
