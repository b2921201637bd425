"""Avro-backed layer store: the reference's HadoopRDDWriter/Reader storage
contract re-expressed over the from-scratch Avro codec (tilegrid/avro.py).

Reference shape (spark/.../io/hadoop/HadoopRDDWriter.scala:37-120 +
HadoopRDDReader.scala:40-101): a layer level is stored SFC-sorted as blocks
of (key, tile) pairs — each block one Avro ``KeyValueRecord`` — with the
writer schema and the block index kept in the AttributeStore; filtered
reads skip non-matching blocks without decoding them
(FilterMapFileInputFormat semantics).

Our mirror: one Avro object-container file per output partition whose
container *records* are KeyValueRecord blocks, written one record per
container block so every block is independently skippable via its byte-size
prefix. The KeyValueRecord schema rides in the container header
(self-describing — any spec-compliant Avro reader decodes the tiles) and in
the AttributeStore ``avro_schema`` attribute (the reference keeps it there
too, HadoopLayerReader.scala:58-63). Per-file and per-block cell ranges go
to the ``avro_manifest`` attribute — the MapFile index analogue that drives
file- and block-level pruning on read.

Paths are driver/executor-visible filesystem paths (same scope as the
slippy writer); the parquet/Iceberg store remains the scale backend — this
one exists for storage-format parity with the reference.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import avro, codec
from ..celltype import CellType
from ..meta import AttributeStore, LayerMeta
from .layer_io import _filter_to_sql, _layer_path

_MANIFEST_SCHEMA = (
    "file string, min_cell long, max_cell long, n_pairs long, blocks string"
)


def write_layer_avro(
    df: DataFrame,
    root: str,
    name: str,
    zoom: int,
    meta: LayerMeta,
    block_pairs: int = 64,
    target_partitions: int | None = None,
    ts_col: str | None = None,
) -> int:
    """Write one zoom level as SFC-sorted Avro container files; returns the
    pair count. `df` carries the standard layer columns (LAYER_SCHEMA).
    `ts_col` (a BIGINT epoch-millis column) switches keys to SpaceTimeKey
    records (KeyCodecs.scala spaceTimeKeyAvroFormat) — the layer's `cell`
    should then already be a space-time SFC index (e.g. cell.z3_encode)."""
    ct = meta.cell_type
    spark = df.sparkSession
    n = target_partitions or max(spark.sparkContext.defaultParallelism, 4)
    path = _layer_path(root, name, zoom) + "-avro"
    os.makedirs(path, exist_ok=True)

    cols = ["col", "row", "cell", "tile", "fmt"] + ([ts_col] if ts_col else [])
    sorted_df = (
        df.select(*cols)
        .repartitionByRange(n, "cell")
        .sortWithinPartitions("cell")
    )
    spacetime = ts_col is not None

    def write_part(it):
        frames = [pdf for pdf in it if len(pdf)]
        if not frames:
            return
        rows = pd.concat(frames, ignore_index=True)
        recs, blocks = [], []
        pairs_ct, bands = ct, 0
        for start in range(0, len(rows), block_pairs):
            chunk = rows.iloc[start:start + block_pairs]
            pairs = []
            for t in chunk.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt)
                if arr.ndim == 3:  # (h, w, bands) at rest -> band-major
                    arr = np.moveaxis(arr, 2, 0)
                    bands = arr.shape[0]
                if arr.dtype.name != pairs_ct.dtype:
                    # decoded storage dtype wins (e.g. png tiles of a
                    # float-typed layer); constant-NoData convention
                    nd = float("nan") if arr.dtype.kind == "f" else None
                    pairs_ct = CellType(arr.dtype.name, nd)
                key = (int(t.col), int(t.row))
                if spacetime:
                    key += (int(getattr(t, ts_col)),)
                pairs.append((key, arr))
            recs.append(avro.tile_pairs_record(
                pairs, pairs_ct, spacetime=spacetime, bands=bands))
            blocks.append([int(chunk["cell"].min()), int(chunk["cell"].max()),
                           len(chunk)])
        schema = avro.pairs_schema(pairs_ct, spacetime=spacetime, bands=bands)
        data = avro.write_container(schema, recs, records_per_block=1)
        fname = f"part-{int(rows['cell'].min()):016x}.avro"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(data)
        yield pd.DataFrame({
            "file": [fname],
            "min_cell": [int(rows["cell"].min())],
            "max_cell": [int(rows["cell"].max())],
            "n_pairs": [len(rows)],
            "blocks": [json.dumps(blocks)],
        })

    manifest = sorted_df.mapInPandas(write_part, _MANIFEST_SCHEMA).collect()
    store = AttributeStore(root)
    store.write_meta(name, meta)
    store.write_attr(
        name, zoom, "avro_schema",
        avro.pairs_schema(ct, spacetime=spacetime, bands=0),
    )
    store.write_attr(
        name, zoom, "avro_manifest",
        {
            "spacetime": spacetime,
            "files": sorted(
                (
                    {
                        "file": r["file"],
                        "min_cell": r["min_cell"],
                        "max_cell": r["max_cell"],
                        "n_pairs": r["n_pairs"],
                        "blocks": json.loads(r["blocks"]),
                    }
                    for r in manifest
                ),
                key=lambda d: d["min_cell"],
            )
        },
    )
    return int(sum(r["n_pairs"] for r in manifest))


def value_reader_avro(root: str, name: str, zoom: int):
    """ValueReader against the Avro store (the reference's per-backend
    reader contract, ValueReader.scala): random access to one tile by key.
    Binary-searches the AttributeStore manifest for the file whose cell
    range contains the key, then walks ONLY the one container block whose
    index range matches — every other block is skipped by its byte-size
    prefix without decompress/decode. Driver-side (no Spark job), like the
    reference's direct backend seek. Returns `read(col, row) ->
    (np.ndarray, CellType) | None`."""
    from bisect import bisect_right

    from ..cell import z2_encode

    store = AttributeStore(root)
    manifest = store.read_attr(name, zoom, "avro_manifest")
    path = _layer_path(root, name, zoom) + "-avro"
    files = manifest["files"]
    mins = [f["min_cell"] for f in files]

    def read(col: int, row: int):
        c = int(z2_encode(col, row))
        i = bisect_right(mins, c) - 1
        if i < 0 or c > files[i]["max_cell"]:
            return None
        f = files[i]
        with open(os.path.join(path, f["file"]), "rb") as fh:
            data = fh.read()
        for ordinal, _n, mk in avro.iter_container_blocks(data):
            lo, hi, _cnt = f["blocks"][ordinal]
            if not (lo <= c <= hi):
                continue
            for rec in mk():
                for pair in rec["pairs"]:
                    k = pair["_1"]
                    if k["col"] == col and k["row"] == row:
                        v = pair["_2"]
                        if v.name.endswith("ArrayMultibandTile"):
                            tiles = [avro.record_to_tile(b) for b in v["bands"]]
                            return (np.stack([a for a, _ in tiles], axis=2),
                                    tiles[0][1])
                        return avro.record_to_tile(v)
        return None

    return read


def _ranges_hit(lo: int, hi: int, ranges) -> bool:
    return any(lo <= b and a <= hi for a, b in ranges)


def read_layer_avro(
    spark: SparkSession,
    root: str,
    name: str,
    zoom: int,
    cell_ranges: list[tuple[int, int]] | None = None,
    where=None,
    cell_of=None,
) -> DataFrame:
    """Read an Avro-stored level back as a standard layer DataFrame
    (tiles re-encoded as 'raw'). `cell_ranges` prunes files driver-side via
    the manifest and skips non-matching container blocks executor-side
    before any decompress/decode — HadoopRDDReader.readFiltered parity.
    `where` applies the layer-query DSL residual filter on top. Space-time
    layers (written with ts_col) come back with a `ts` epoch-millis column;
    their SFC `cell` is recomputed by `cell_of(col, row, ts_ms) -> int`
    (pass the same binning used at write time, e.g. a z3 day-bin lambda) —
    without it, `cell` falls back to the spatial z2 of (col, row)."""
    from ..cell import z2_encode

    store = AttributeStore(root)
    meta = store.read_meta(name, zoom)
    manifest = store.read_attr(name, zoom, "avro_manifest")
    path = _layer_path(root, name, zoom) + "-avro"
    spacetime = bool(manifest.get("spacetime"))
    out_schema = (
        "zoom int, col int, row int, cell long, tile binary, "
        "h int, w int, fmt string" + (", ts long" if spacetime else "")
    )
    files = manifest["files"]
    if cell_ranges:
        files = [f for f in files
                 if _ranges_hit(f["min_cell"], f["max_cell"], cell_ranges)]
    if not files:
        return spark.createDataFrame([], out_schema)
    block_map = {f["file"]: f["blocks"] for f in files}
    paths = [os.path.join(path, f["file"]) for f in files]
    raw = spark.read.format("binaryFile").load(paths)
    bm = spark.sparkContext.broadcast(block_map)
    cr = spark.sparkContext.broadcast(cell_ranges)

    keys = ["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"] + (
        ["ts"] if spacetime else [])

    def decode_part(it):
        for pdf in it:
            out = {k: [] for k in keys}
            for t in pdf.itertuples(index=False):
                fname = os.path.basename(t.path)
                blocks = bm.value[fname]
                ranges = cr.value
                for ordinal, _n, mk in avro.iter_container_blocks(bytes(t.content)):
                    lo, hi, _cnt = blocks[ordinal]
                    if ranges and not _ranges_hit(lo, hi, ranges):
                        continue  # skipped: never decompressed or decoded
                    for rec in mk():
                        for pair in rec["pairs"]:
                            k, v = pair["_1"], pair["_2"]
                            if v.name.endswith("ArrayMultibandTile"):
                                tiles = [avro.record_to_tile(b)
                                         for b in v["bands"]]
                                arr = np.stack([a for a, _ in tiles], axis=2)
                            else:
                                arr, _ = avro.record_to_tile(v)
                            ts = k.get("instant")
                            if spacetime and cell_of is not None:
                                cellv = int(cell_of(k["col"], k["row"], ts))
                            else:
                                cellv = int(z2_encode(k["col"], k["row"]))
                            if ranges and not _ranges_hit(cellv, cellv, ranges):
                                continue
                            out["zoom"].append(zoom)
                            out["col"].append(k["col"])
                            out["row"].append(k["row"])
                            out["cell"].append(cellv)
                            out["tile"].append(codec.raw_encode(arr))
                            out["h"].append(arr.shape[0])
                            out["w"].append(arr.shape[1])
                            out["fmt"].append("raw")
                            if spacetime:
                                out["ts"].append(ts)
            yield pd.DataFrame(out)

    df = raw.mapInPandas(decode_part, out_schema)
    if where:
        for f in where:
            df = df.where(_filter_to_sql(f, meta))
    return df
