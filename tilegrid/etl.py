"""Config-driven ETL: declarative multi-source ingest descriptors.

Reference: spark-etl — `Etl.ingest` lifecycle (Etl.scala:54-76: load ->
tile -> save+pyramid), JSON descriptors (config/Input.scala:24-35,
config/Output.scala:29-46, EtlConf.scala / BaseEtlConf.scala CLI shape:
``--input input.json --output output.json``). The reference registers
backend modules (Etl.scala:43 defaultModules); we support the ``file``
backend (any Hadoop-FS path: local / hdfs:// / s3a://), the ``render``
z/x/y tree, and the ``avro`` layer store (sources/avro_store.py — the
reference's HadoopRDDWriter KeyValueRecord format), rejecting others
with the same fail-fast error style (ConfigParse validation).

Input formats:

- ``parquet`` — the BASELINE.json image-corpus table (image_id, bytes,
  w, h, fmt, caption, phash, lon, lat); centers project to the output
  CRS with whole-stage-codegen Column expressions (no UDF).
- ``geotiff`` — a directory/glob of .tif files, read distributed via
  ``spark.read.format("binaryFile")`` and georeferenced from their
  ModelPixelScale/ModelTiepoint tags (HadoopGeoTiffRDD.spatial parity,
  spark/.../io/hadoop/HadoopGeoTiffRDD.scala:39-214). Header-only tag
  parse places each file; full pixel decode happens inside the tiler's
  single mapInPandas pass (fmt='tiff' codec).
- ``layer`` — an already-stored layer level (re-tile / re-index / crop
  an existing store entry), extents derived from its layout.

Unlike jobs/ingest.py (the argparse front for one corpus), an EtlConf
carries a LIST of inputs: each is loaded, clipped, tiled to the shared
output layout, written under its own name, and pyramided — one
SparkSession, one config file, N layers.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, fsutil
from .celltype import FLOAT64
from .grid import (
    LATLNG_WORLD,
    WEBMERCATOR_WORLD,
    Extent,
    GridBounds,
    LayoutDefinition,
    TileLayout,
)
from .meta import LayerMeta

_BACKENDS = ("file", "render", "avro")
_FORMATS = ("parquet", "geotiff", "layer")
_KEY_INDEXES = ("zorder", "hilbert", "rowmajor")
_RESAMPLES = ("average", "max", "min", "sum", "median", "mode")
_ENCODINGS = ("png", "geotiff")


def parse_color_map(blob: str):
    """SpatialRenderOutput.parseColorMaps parity: ``"BREAK:RRGGBBAA;..."``
    -> ColorMap. The alpha byte is accepted but NoData transparency is
    what drives the output alpha channel (ColorMap.apply semantics)."""
    from .sources.render import ColorMap

    try:
        pairs = [p.strip().split(":") for p in blob.split(";") if p.strip()]
        breaks = [float(p[0]) for p in pairs]
        colors = [
            (int(p[1][0:2], 16), int(p[1][2:4], 16), int(p[1][4:6], 16))
            for p in pairs
        ]
    except (IndexError, ValueError) as e:
        raise EtlConfigError(
            f"unable to parse breaks, expected '{{limit}}:{{RGBA}};...' "
            f"got: {blob!r}") from e
    return ColorMap(breaks, colors)


class EtlConfigError(ValueError):
    """Bad descriptor — message names the field and the allowed values."""


def _backend(d: dict, ctx: str, allowed: tuple = _BACKENDS) -> tuple[str, str]:
    b = d.get("backend")
    if not isinstance(b, dict) or "type" not in b or "path" not in b:
        raise EtlConfigError(
            f"{ctx}.backend must be {{'type': ..., 'path': ...}}, got {b!r}")
    if b["type"] not in allowed:
        raise EtlConfigError(
            f"{ctx}.backend.type {b['type']!r} unsupported; this engine "
            f"implements {allowed} (a 'file' path may be local, hdfs:// "
            f"or s3a:// — the store resolves through Hadoop FileSystem)")
    return str(b["type"]), str(b["path"])


@dataclass
class EtlInput:
    """One source descriptor (config/Input.scala:24-35)."""

    name: str
    format: str
    path: str
    crs: str = "latlng"  # CRS the source coordinates are in
    clip: Extent | None = None
    no_data: float | None = None
    cache: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "EtlInput":
        if "name" not in d:
            raise EtlConfigError("input.name is required")
        fmt = d.get("format")
        if fmt not in _FORMATS:
            raise EtlConfigError(
                f"input.format {fmt!r} unsupported; one of {_FORMATS}")
        clip = d.get("clip")
        return cls(
            name=str(d["name"]),
            format=fmt,
            path=_backend(d, f"input[{d['name']}]", allowed=("file",))[1],
            crs=str(d.get("crs", "latlng")),
            clip=Extent(*(float(v) for v in clip)) if clip else None,
            no_data=None if d.get("noData") is None else float(d["noData"]),
            cache=bool(d.get("cache", False)),
        )


@dataclass
class EtlOutput:
    """Sink + layout descriptor (config/Output.scala:29-46)."""

    path: str
    max_zoom: int
    min_zoom: int
    backend: str = "file"
    tile_size: int = 256
    pyramid: bool = True
    crs: str = "latlng"
    layout_extent: Extent | None = None
    key_index: str = "zorder"
    resample_method: str = "average"
    partitions: int | None = None
    multiband: bool = False
    resume: bool = False
    encoding: str = "png"  # render backend only (Output.encoding)
    breaks: str | None = None  # render colormap blob (Output.breaks)

    @classmethod
    def from_dict(cls, d: dict) -> "EtlOutput":
        if "maxZoom" not in d:
            raise EtlConfigError("output.maxZoom is required")
        kim = d.get("keyIndexMethod", {"type": "zorder"})
        kind = kim.get("type") if isinstance(kim, dict) else kim
        if kind not in _KEY_INDEXES:
            raise EtlConfigError(
                f"output.keyIndexMethod {kind!r} unsupported; one of "
                f"{_KEY_INDEXES}")
        rm = str(d.get("resampleMethod", "average"))
        if rm not in _RESAMPLES:
            raise EtlConfigError(
                f"output.resampleMethod {rm!r} unsupported; one of "
                f"{_RESAMPLES}")
        enc = str(d.get("encoding", "png"))
        if enc not in _ENCODINGS:
            raise EtlConfigError(
                f"output.encoding {enc!r} unsupported; one of {_ENCODINGS}")
        if d.get("breaks"):
            parse_color_map(str(d["breaks"]))  # fail fast on a bad blob
        le = d.get("layoutExtent")
        btype, path = _backend(d, "output")
        return cls(
            path=path,
            backend=btype,
            max_zoom=int(d["maxZoom"]),
            min_zoom=int(d.get("minZoom", d["maxZoom"])),
            tile_size=int(d.get("tileSize", 256)),
            pyramid=bool(d.get("pyramid", True)),
            crs=str(d.get("crs", "latlng")),
            layout_extent=Extent(*(float(v) for v in le)) if le else None,
            key_index=str(kind),
            resample_method=rm,
            partitions=None if d.get("partitions") is None
            else int(d["partitions"]),
            multiband=bool(d.get("multiband", False)),
            resume=bool(d.get("resume", False)),
            encoding=str(d.get("encoding", "png")),
            breaks=str(d["breaks"]) if d.get("breaks") else None,
        )

    def layout(self, zoom: int) -> LayoutDefinition:
        if self.crs == "latlng":
            world = LATLNG_WORLD
        elif self.crs in ("webmercator", "epsg:3857"):
            world = WEBMERCATOR_WORLD
        elif self.layout_extent is not None:
            world = self.layout_extent
        else:
            raise EtlConfigError(
                f"output.crs {self.crs!r} needs output.layoutExtent")
        n = 1 << zoom
        return LayoutDefinition(
            world, TileLayout(n, n, self.tile_size, self.tile_size))


@dataclass
class EtlConf:
    """Parsed --input + --output pair (EtlConf.scala)."""

    inputs: list[EtlInput]
    output: EtlOutput

    @classmethod
    def from_dicts(cls, inputs, output: dict) -> "EtlConf":
        if isinstance(inputs, dict):
            inputs = [inputs]
        if not inputs:
            raise EtlConfigError("input list is empty")
        conf = cls([EtlInput.from_dict(d) for d in inputs],
                   EtlOutput.from_dict(output))
        names = [i.name for i in conf.inputs]
        if len(set(names)) != len(names):
            raise EtlConfigError(f"duplicate input names: {names}")
        conf.output.layout(conf.output.max_zoom)  # fail fast on crs/extent
        return conf

    @classmethod
    def from_files(cls, input_path: str, output_path: str) -> "EtlConf":
        with open(input_path) as f:
            inputs = json.load(f)
        with open(output_path) as f:
            output = json.load(f)
        return cls.from_dicts(inputs, output)


# --------------------------------------------------------------------------
# load: one DataFrame of placed source rasters per input
# (columns: image_id, tile, fmt, w, h, xmin, ymin, xmax, ymax)

_PLACED = ("image_id", "tile", "fmt", "w", "h", "xmin", "ymin", "xmax", "ymax")
_GEOTIFF_SCHEMA = (
    "image_id string, tile binary, fmt string, w int, h int, "
    "xmin double, ymin double, xmax double, ymax double"
)


def _load_parquet(spark: SparkSession, inp: EtlInput, out: EtlOutput,
                  layout: LayoutDefinition) -> DataFrame:
    from .operators.tiler import with_extent_from_center

    df = spark.read.parquet(inp.path)
    if "bytes" in df.columns and "tile" not in df.columns:
        df = df.withColumnRenamed("bytes", "tile")
    px, py = "lon", "lat"
    if out.crs != "latlng":
        from .proj import crs as crs_fn

        xc, yc = crs_fn(out.crs).forward_cols("lon", "lat")
        df = df.withColumn("px", xc).withColumn("py", yc)
        px, py = "px", "py"
    placed = with_extent_from_center(df, layout, px, py)
    return placed.select(*_PLACED)


def _same_crs(a: str, b: str) -> bool:
    alias = {"epsg:3857": "webmercator", "epsg:4326": "latlng"}
    return alias.get(a, a) == alias.get(b, b)


def _warp_raster(arr: np.ndarray, ext: Extent, src_crs: str,
                 dst_crs: str) -> tuple[np.ndarray, Extent]:
    """Per-raster reproject (Ingest.scala:62-103 reprojects the loaded
    RDD[(ProjectedExtent, Tile)] BEFORE tiling): resample one source
    raster onto a regular dst-CRS grid by NN gather through the inverse
    transform. Target extent = bbox of the densely-sampled source
    boundary (handles curved edges); target shape keeps the source pixel
    count per axis (ReprojectRasterExtent's cell-count preservation)."""
    from .proj import transform

    h, w = arr.shape[:2]
    n = 33
    xs = np.linspace(ext.xmin, ext.xmax, n)
    ys = np.linspace(ext.ymin, ext.ymax, n)
    bx = np.concatenate([xs, xs, np.full(n, ext.xmin), np.full(n, ext.xmax)])
    by = np.concatenate([np.full(n, ext.ymin), np.full(n, ext.ymax), ys, ys])
    with np.errstate(invalid="ignore", divide="ignore"):
        tx, ty = transform(src_crs, dst_crs, bx, by)
    m = np.isfinite(tx) & np.isfinite(ty)
    if not m.any():
        raise ValueError(
            f"raster extent {ext} has no finite image in {dst_crs!r}")
    dext = Extent(float(tx[m].min()), float(ty[m].min()),
                  float(tx[m].max()), float(ty[m].max()))
    cw, ch = dext.width / w, dext.height / h
    gx = dext.xmin + (np.arange(w) + 0.5) * cw
    gy = dext.ymax - (np.arange(h) + 0.5) * ch
    gxx, gyy = np.meshgrid(gx, gy)
    with np.errstate(invalid="ignore", divide="ignore"):
        sx, sy = transform(dst_crs, src_crs, gxx.ravel(), gyy.ravel())
    ix = np.floor((sx - ext.xmin) / (ext.width / w)).astype(np.int64)
    iy = np.floor((ext.ymax - sy) / (ext.height / h)).astype(np.int64)
    ok = (np.isfinite(sx) & np.isfinite(sy)
          & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))
    out = np.full((h * w,) + arr.shape[2:], np.nan)
    out[ok] = arr.astype(np.float64)[iy[ok], ix[ok]]
    return out.reshape((h, w) + arr.shape[2:]), dext


def _load_geotiff(spark: SparkSession, inp: EtlInput,
                  dst_crs: str) -> DataFrame:
    """Distributed GeoTiff directory scan: binaryFile source + header-only
    georeferencing (HadoopGeoTiffRDD.spatial parity). Files without
    ModelPixelScale/ModelTiepoint tags raise — same contract as the
    reference, which cannot place an unreferenced tiff either. When the
    input CRS differs from the output CRS, each raster is warped here
    (full decode + NN gather) before tiling; same-CRS inputs stay as raw
    tiff bytes, decoded only inside the tiler's single mapInPandas pass."""
    from .geotiff import _geo_extent, _open_tiff, tiff_decode

    path = inp.path
    if fsutil.exists(path) and not path.endswith((".tif", ".tiff")):
        path = os.path.join(path, "*.tif*")
    src = spark.read.format("binaryFile").load(path)
    warp = not _same_crs(inp.crs, dst_crs)

    def place(it):
        for pdf in it:
            rows = []
            for p, data in zip(pdf["path"], pdf["content"]):
                data = bytes(data)
                _, tags = _open_tiff(data)
                h = int(tags[257][0])
                w = int(tags[256][0])
                ext = _geo_extent(tags, h, w)
                if ext is None:
                    raise EtlConfigError(
                        f"{p}: no ModelPixelScale/ModelTiepoint tags — "
                        "cannot georeference")
                fmt = "tiff"
                if warp:
                    arr, _ = tiff_decode(data)
                    arr, ext = _warp_raster(arr, ext, inp.crs, dst_crs)
                    data, fmt = codec.raw_encode(
                        np.ascontiguousarray(arr)), "raw"
                rows.append((p, data, fmt, w, h,
                             ext.xmin, ext.ymin, ext.xmax, ext.ymax))
            yield pd.DataFrame(rows, columns=list(_PLACED))

    return src.select("path", "content").mapInPandas(place, _GEOTIFF_SCHEMA)


def _load_layer(spark: SparkSession, inp: EtlInput) -> DataFrame:
    """Re-ingest a stored layer level: path = <root>/<name>@<zoom>."""
    from .sources.layer_io import read_layer
    from .meta import AttributeStore

    root, spec = os.path.split(inp.path)
    if "@" not in spec:
        raise EtlConfigError(
            f"layer input path must be <root>/<name>@<zoom>, got {inp.path!r}")
    name, zoom_s = spec.rsplit("@", 1)
    zoom = int(zoom_s)
    meta = AttributeStore(root).read_meta(name, zoom)
    lo = meta.layout
    lyr = read_layer(spark, root, name, zoom)
    # tile extent per key as Column expressions (MapKeyTransform.keyToExtent)
    cw = lo.extent.width / lo.tile_layout.layout_cols
    ch = lo.extent.height / lo.tile_layout.layout_rows
    return lyr.select(
        F.concat(F.lit(f"{name}@{zoom}/"), F.col("cell").cast("string"))
        .alias("image_id"),
        "tile", "fmt", "w", "h",
        (F.lit(lo.extent.xmin) + F.col("col") * F.lit(cw)).alias("xmin"),
        (F.lit(lo.extent.ymax) - (F.col("row") + 1) * F.lit(ch)).alias("ymin"),
        (F.lit(lo.extent.xmin) + (F.col("col") + 1) * F.lit(cw)).alias("xmax"),
        (F.lit(lo.extent.ymax) - F.col("row") * F.lit(ch)).alias("ymax"),
    )


def load_input(spark: SparkSession, inp: EtlInput, out: EtlOutput,
               layout: LayoutDefinition) -> DataFrame:
    if inp.format == "parquet":
        placed = _load_parquet(spark, inp, out, layout)
    elif inp.format == "geotiff":
        placed = _load_geotiff(spark, inp, out.crs)
    else:
        placed = _load_layer(spark, inp)
    if inp.clip is not None:
        c = inp.clip  # extent-overlap predicate, pushed into the scan
        placed = placed.where(
            (F.col("xmax") > c.xmin) & (F.col("xmin") < c.xmax)
            & (F.col("ymax") > c.ymin) & (F.col("ymin") < c.ymax))
    if inp.cache:
        placed = placed.persist()
    return placed


# --------------------------------------------------------------------------
# save: key index + per-level write with metadata


def _apply_key_index(layer: DataFrame, out: EtlOutput, zoom: int) -> DataFrame:
    """Rewrite the cell column under the configured SFC
    (Output.getKeyIndexMethod, config/Output.scala:63-70). The tiler
    emits zorder cells, so that's a no-op."""
    if out.key_index == "zorder":
        return layer
    if out.key_index == "rowmajor":
        from .cell import rowmajor_sql

        return layer.withColumn(
            "cell", F.expr(rowmajor_sql("col", "row", 1 << zoom)).cast("long"))
    from pyspark.sql.functions import pandas_udf

    from .cell import hilbert_encode

    order = max(zoom, 1)

    @pandas_udf("long")
    def henc(col: pd.Series, row: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_encode(col.to_numpy(np.int64), row.to_numpy(np.int64),
                           order))

    return layer.withColumn("cell", henc("col", "row"))


def _meta_for(layer: DataFrame, out: EtlOutput, zoom: int) -> LayerMeta:
    lo = out.layout(zoom)
    r = layer.agg(
        F.min("col").alias("c0"), F.min("row").alias("r0"),
        F.max("col").alias("c1"), F.max("row").alias("r1"),
    ).collect()[0]
    bounds = GridBounds(int(r["c0"]), int(r["r0"]), int(r["c1"]), int(r["r1"]))
    return LayerMeta(
        cell_type=FLOAT64, layout=lo,
        extent=lo.map_transform.extent_for_gridbounds(bounds),
        crs=out.crs, bounds=bounds, zoom=zoom,
    )


def _no_data_to_nan(layer: DataFrame, value: float) -> DataFrame:
    """Input.noData: sentinel cells become NaN NoData after decode."""
    from .operators import LAYER_SCHEMA

    def run(it):
        for pdf in it:
            tiles = []
            for t, f in zip(pdf["tile"], pdf["fmt"]):
                arr = codec.decode_tile(bytes(t), f).astype(np.float64)
                arr[arr == value] = np.nan
                tiles.append(codec.raw_encode(arr))
            pdf = pdf.copy()
            pdf["tile"], pdf["fmt"] = tiles, "raw"
            yield pdf[["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]]

    return layer.mapInPandas(run, LAYER_SCHEMA)


def _render_level(layer: DataFrame, out: EtlOutput, name: str,
                  zoom: int) -> None:
    """SpatialRenderOutput parity: the 'render' backend writes a z/x/y
    tile tree instead of a layer store — PNG (optional BREAK:COLOR
    colormap) or per-tile georeferenced GeoTiff (Output.encoding)."""
    base = os.path.join(out.path, name)
    if out.encoding == "png":
        from .sources.render import render_png, write_slippy

        cm = parse_color_map(out.breaks) if out.breaks else None
        write_slippy(render_png(layer, cm), base)
        return
    lo = out.layout(zoom)
    cw = lo.extent.width / lo.tile_layout.layout_cols
    ch = lo.extent.height / lo.tile_layout.layout_rows
    x0, y1 = lo.extent.xmin, lo.extent.ymax

    def write_part(rows):
        from .geotiff import tiff_encode

        for r in rows:
            arr = codec.decode_tile(bytes(r["tile"]), r["fmt"]).astype(
                np.float64)
            ext = Extent(x0 + r["col"] * cw, y1 - (r["row"] + 1) * ch,
                         x0 + (r["col"] + 1) * cw, y1 - r["row"] * ch)
            d = os.path.join(base, str(r["zoom"]), str(r["col"]))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r['row']}.tif"), "wb") as f:
                f.write(tiff_encode(arr, extent=ext))

    layer.foreachPartition(write_part)


def run_etl(spark: SparkSession, conf: EtlConf) -> dict:
    """Etl.ingest over every input: load -> clip -> tile -> write ->
    pyramid (Etl.scala:54-76). Returns per-input/per-level metrics.
    Resume (output.resume) skips levels whose checkpoint marker exists —
    our addition; the reference restarts from scratch."""
    from .cell import zranges
    from .operators.pyramid import pyramid_up
    from .operators.tiler import tile_to_layout
    from .sources.layer_io import read_layer, write_layer

    out = conf.output
    base_layout = out.layout(out.max_zoom)
    if out.crs != "latlng":  # fail fast: the tiler needs a codegen forward
        from .proj import crs as crs_fn

        crs_fn(out.crs).forward_cols("lon", "lat")
    metrics: dict = {"inputs": {}, "started_at": time.time()}

    def done(name: str, z: int) -> bool:
        # render trees carry no store/checkpoints: no resume there
        return out.backend == "file" and out.resume and fsutil.exists(
            os.path.join(out.path, "_checkpoints", name, f"zoom={z}.done"))

    for inp in conf.inputs:
        levels: dict = {}
        metrics["inputs"][inp.name] = levels
        if done(inp.name, out.max_zoom):
            layer = read_layer(spark, out.path, inp.name, out.max_zoom)
            levels[out.max_zoom] = {"skipped": True}
        else:
            placed = load_input(spark, inp, out, base_layout)
            t = time.time()
            layer = tile_to_layout(
                placed, base_layout, out.max_zoom,
                multiband=out.multiband).persist()
            if inp.no_data is not None:
                layer = _no_data_to_nan(layer, inp.no_data).persist()
            layer = _apply_key_index(layer, out, out.max_zoom)
            n_tiles = layer.count()
            if out.backend == "render":
                _render_level(layer, out, inp.name, out.max_zoom)
            elif out.backend == "avro":
                from .sources.avro_store import write_layer_avro

                write_layer_avro(
                    layer, out.path, inp.name, out.max_zoom,
                    meta=_meta_for(layer, out, out.max_zoom),
                    target_partitions=out.partitions)
            else:
                meta = _meta_for(layer, out, out.max_zoom)
                b = meta.bounds
                write_layer(
                    layer, out.path, inp.name, out.max_zoom, meta=meta,
                    target_partitions=out.partitions,
                    # even-volume SFC breaks only follow the zorder curve;
                    # other indexes fall back to sampled range partitioning
                    index_ranges=zranges(b.col_min, b.row_min, b.col_max,
                                         b.row_max)
                    if out.key_index == "zorder" else None,
                )
            levels[out.max_zoom] = {
                "tiles": n_tiles, "sec": round(time.time() - t, 2)}
        if not out.pyramid:
            continue
        cur = layer
        for z in range(out.max_zoom, out.min_zoom, -1):
            if done(inp.name, z - 1):
                cur = read_layer(spark, out.path, inp.name, z - 1)
                levels[z - 1] = {"skipped": True}
                continue
            t = time.time()
            nxt = _apply_key_index(
                pyramid_up(cur, method=out.resample_method), out, z - 1
            ).persist()
            n_tiles = nxt.count()
            if out.backend == "render":
                _render_level(nxt, out, inp.name, z - 1)
            elif out.backend == "avro":
                from .sources.avro_store import write_layer_avro

                write_layer_avro(nxt, out.path, inp.name, z - 1,
                                 meta=_meta_for(nxt, out, z - 1),
                                 target_partitions=out.partitions)
            else:
                write_layer(nxt, out.path, inp.name, z - 1,
                            meta=_meta_for(nxt, out, z - 1),
                            target_partitions=out.partitions)
            levels[z - 1] = {"tiles": n_tiles, "sec": round(time.time() - t, 2)}
            cur = nxt
    metrics["total_sec"] = round(time.time() - metrics.pop("started_at"), 2)
    return metrics
