"""Layer reader/writer with query pushdown, per-partition lineage manifests,
and checkpointed resumability.

Reference contracts reproduced:
  * LayerWriter/HadoopRDDWriter (io/LayerWriter.scala:31-83,
    io/hadoop/HadoopRDDWriter.scala:37-120): sort by the SFC index and write
    block-sized files -> repartitionByRange("cell") + sortWithinPartitions +
    parquet (file/row-group min-max stats on the sorted cell column give the
    same block-skipping the reference built by hand).
  * FilteringLayerReader + LayerQuery/LayerFilter DSL
    (io/FilteringLayerReader.scala:30-87, io/LayerQuery.scala:28-70,
    io/LayerFilter.scala:63-235): Intersects/Contains/At/Between filters fold
    to Z-order cell ranges (tilegrid.cell.zranges, the Z2.zranges analogue)
    pushed into the parquet scan as `cell BETWEEN lo AND hi OR ...`, plus an
    exact residual predicate on (col,row).
  * AttributeStore JSON sidecars (io/AttributeStore.scala).

Beyond the reference (north rule): every write emits a lineage manifest —
one row per output file with cell range, row count, and a value checksum —
and a checkpoint marker; `write_layer(..., resume=True)` skips zoom levels
whose marker exists (resumable ingest).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import cell as cell_mod, fsutil
from ..cell import zranges_for_extent
from ..grid import Extent
from ..meta import AttributeStore, LayerMeta


# ------------------------------------------------------------- query DSL

class Intersects:
    """Keep tiles whose key range intersects an extent (map coords) or an
    explicit key-bounds tuple (col_min,row_min,col_max,row_max)."""

    def __init__(self, extent: Extent | None = None, key_bounds=None, polygon=None):
        self.extent = extent
        self.key_bounds = key_bounds
        self.polygon = polygon


class Contains:
    def __init__(self, x: float, y: float):
        self.x, self.y = x, y


class At:
    def __init__(self, ts):
        self.ts = ts


class Between:
    def __init__(self, t1, t2):
        self.t1, self.t2 = t1, t2


def _filter_to_sql(f, meta: LayerMeta) -> str:
    from ..cell import zranges, cover_polygon, merge_ranges

    mt = meta.layout.map_transform
    if isinstance(f, Intersects):
        if f.extent is not None:
            ranges = zranges_for_extent(meta.layout, f.extent)
            gb = mt.gridbounds_for_extent(f.extent)
            residual = (
                f"col BETWEEN {gb.col_min} AND {gb.col_max} "
                f"AND row BETWEEN {gb.row_min} AND {gb.row_max}"
            )
        elif f.key_bounds is not None:
            c0, r0, c1, r1 = f.key_bounds
            ranges = zranges(c0, r0, c1, r1)
            residual = f"col BETWEEN {c0} AND {c1} AND row BETWEEN {r0} AND {r1}"
        else:  # polygon: enumerate covering cells (LayerFilter.scala:136-188)
            cells = cover_polygon(meta.layout, f.polygon)
            ranges = merge_ranges([(int(c), int(c)) for c in cells])
            residual = None
        range_sql = " OR ".join(f"(cell BETWEEN {lo} AND {hi})" for lo, hi in ranges)
        if not range_sql:
            return "false"
        return f"(({range_sql})" + (f" AND ({residual}))" if residual else ")")
    if isinstance(f, Contains):
        c, r = mt.key_for_point(f.x, f.y)
        return f"(col = {c} AND row = {r})"
    if isinstance(f, At):
        return f"(ts = timestamp'{f.ts}')"
    if isinstance(f, Between):
        return f"(ts BETWEEN timestamp'{f.t1}' AND timestamp'{f.t2}')"
    raise TypeError(f)


# ---------------------------------------------------------------- writer

def _layer_path(root: str, name: str, zoom: int) -> str:
    return os.path.join(root, name, f"zoom={zoom}")


def write_layer(
    df: DataFrame,
    root: str,
    name: str,
    zoom: int,
    meta: LayerMeta | None = None,
    target_partitions: int | None = None,
    resume: bool = False,
    index_ranges: list[tuple[int, int]] | None = None,
) -> bool:
    """Write one zoom level sorted by cell; emit lineage manifest +
    checkpoint marker. Returns False when skipped via resume.

    When `index_ranges` (the layer's SFC index ranges, e.g. from
    cell.zranges over its key bounds) is given, partition boundaries are
    the reference's even-VOLUME breaks (KeyIndex.scala:29-72 semantics via
    cell.index_breaks) instead of repartitionByRange's sampled quantiles:
    deterministic splits that never land in never-observed index gaps, so
    store splits stay balanced and reproducible across identical writes —
    required for lineage-manifest comparison between runs. Placement is
    exact: bucket -> mined murmur3 token (cell.partition_tokens) so hash
    partitioning puts each break bin alone in its own output partition."""
    store = AttributeStore(root)
    ckpt = os.path.join(root, "_checkpoints", name, f"zoom={zoom}.done")
    # markers resolve through Hadoop FileSystem (fsutil) so --resume works
    # when root is hdfs://... or s3a://..., not only a driver-local path
    if resume and fsutil.exists(ckpt):
        return False
    path = _layer_path(root, name, zoom)
    n = target_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 4)
    if index_ranges is not None and n > 1:
        breaks = cell_mod.index_breaks(cell_mod.merge_ranges(index_ranges), n - 1)
        toks = cell_mod.partition_tokens(len(breaks) + 1)
        tok_arr = "array(" + ",".join(str(t) for t in toks) + ")"
        bucketed = df.withColumn(
            "_tok",
            F.expr(
                f"element_at({tok_arr}, {cell_mod.bucket_sql(breaks)} + 1)"
            ).cast("int"),
        )
        out = bucketed.repartition(len(toks), "_tok").drop("_tok")
    else:
        out = df.repartitionByRange(n, "cell")
    (
        out.sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(path)
    )
    # lineage manifest: per output file, cell range + rows + value checksum.
    # Cheap: column-pruned scan of (cell) with input_file_name().
    spark = df.sparkSession
    rows = (
        spark.read.parquet(path)
        .select("cell", F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(
            F.min("cell").alias("min_cell"),
            F.max("cell").alias("max_cell"),
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(xxhash64(cell))").alias("checksum"),
        )
        .orderBy("min_cell")
        .collect()
    )
    store.write_attr(
        name, zoom, "manifest",
        {
            "written_at": time.time(),
            "n_files": len(rows),
            "files": [
                {
                    "file": os.path.basename(r["file"]),
                    "min_cell": r["min_cell"],
                    "max_cell": r["max_cell"],
                    "n_rows": r["n_rows"],
                    "checksum": r["checksum"],
                }
                for r in rows
            ],
        },
    )
    if meta is not None:
        store.write_meta(name, meta)
    fsutil.write_text(ckpt, json.dumps({"zoom": zoom, "ts": time.time()}))
    return True


def read_layer(
    spark: SparkSession,
    root: str,
    name: str,
    zoom: int,
    where=None,
) -> DataFrame:
    """Read a layer level; `where` is a list of query-DSL filters (ANDed) —
    folded to cell ranges + residual predicates pushed into the scan."""
    df = spark.read.parquet(_layer_path(root, name, zoom))
    if where:
        store = AttributeStore(root)
        meta = store.read_meta(name, zoom)
        for f in where:
            df = df.where(_filter_to_sql(f, meta))
    return df


def update_layer(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    name: str,
    zoom: int,
    mode: str = "replace",
) -> None:
    """LayerUpdater.update (spark/.../io/LayerUpdater.scala:34-71): merge
    incoming records into a stored level. mode="replace" is the
    reference's default mergeFunc `(existing, updating) => updating` —
    incoming tiles replace whole stored tiles at their keys, other keys
    pass through (pure Catalyst: union + left-anti, no pixel work).
    mode="merge" combines per pixel — incoming wins where it has data,
    the stored tile fills its NoData (TileRDDMerge paste semantics).
    Stored metadata bounds and data extent expand to cover the update
    (the Mergable metadata combine); an empty update raises (EmptyBounds
    parity, LayerUpdater.scala:68-69).

    The merged level is localCheckpoint-materialized to break the
    read->overwrite cycle, then rewritten through write_layer so SFC
    sort, lineage manifest, and checkpoint marker are all refreshed. The
    level must fit executor storage (memory+disk) during the swap; for
    out-of-core updates, write to a staging name and swap paths."""
    from ..grid import GridBounds
    from ..operators.reshape import merge_layers

    kb = df.agg(
        F.min("col"), F.max("col"), F.min("row"), F.max("row"), F.count("*")
    ).collect()[0]
    if kb[4] == 0:
        raise ValueError(f"cannot update layer {name} with empty bounds")
    existing = read_layer(spark, root, name, zoom)
    if mode == "replace":
        keys = ["zoom", "col", "row"]
        merged = df.unionByName(existing.join(df.select(keys), keys, "left_anti"))
    elif mode == "merge":
        merged = merge_layers(df, existing)
    else:
        raise ValueError(f"mode must be 'replace' or 'merge', got {mode!r}")
    merged = merged.localCheckpoint()
    store = AttributeStore(root)
    meta = store.read_meta(name, zoom)
    if meta is not None:
        upd = GridBounds(int(kb[0]), int(kb[2]), int(kb[1]), int(kb[3]))
        nb = meta.bounds.combine(upd)
        mt = meta.layout.map_transform
        ext = meta.extent.expand_to_include(
            mt.extent_for_key(upd.col_min, upd.row_min)
        ).expand_to_include(mt.extent_for_key(upd.col_max, upd.row_max))
        meta = dataclasses.replace(meta, bounds=nb, extent=ext)
    # marker must not short-circuit the rewrite
    ckpt = os.path.join(root, "_checkpoints", name, f"zoom={zoom}.done")
    if fsutil.exists(ckpt):
        fsutil.write_text(ckpt, json.dumps({"zoom": zoom, "stale": True}))
    write_layer(merged, root, name, zoom, meta=meta)


def verify_manifest(spark: SparkSession, root: str, name: str, zoom: int) -> bool:
    """Recompute per-file checksums and compare with the stored manifest
    (lineage audit)."""
    store = AttributeStore(root)
    m = store.read_attr(name, zoom, "manifest")
    path = _layer_path(root, name, zoom)
    cur = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.xxhash64("cell").alias("h"))
        .groupBy("file")
        .agg(F.expr("bit_xor(h)").alias("checksum"), F.count("*").alias("n_rows"))
        .collect()
    )
    got = {os.path.basename(r["file"]): (r["checksum"], r["n_rows"]) for r in cur}
    want = {f["file"]: (f["checksum"], f["n_rows"]) for f in m["files"]}
    return got == want


# ---------------------------------------------------- layer management
# Reference: spark/.../io/{LayerDeleter,LayerCopier,LayerMover,
# GenericLayerCopier,GenericLayerMover,GenericLayerReindexer,
# LayerManager,ValueReader}.scala. Delete removes data + every sidecar;
# copy re-writes through write_layer so the destination gets its own SFC
# sort, lineage manifest, and checkpoint marker; move = copy + delete
# (GenericLayerMover.scala:30-38); reindex = rewrite under a different
# KeyIndex (GenericLayerReindexer.scala:44-58 does copy->delete->move,
# ours rewrites in place via a staging name).


def delete_layer(root: str, name: str, zoom: int | None = None) -> None:
    """LayerDeleter.delete: remove stored data + metadata/manifest/marker
    sidecars. zoom=None removes every level (LayerManager.delete)."""
    store = AttributeStore(root)
    if zoom is not None and not store.layer_exists(name, zoom):
        # LayerDeleter raises LayerNotFoundError for missing layers
        raise ValueError(f"layer {name!r} zoom {zoom} not found")
    zooms = [zoom] if zoom is not None else store.zooms(name)
    if not zooms:
        raise ValueError(f"layer {name!r} not found")  # AttributeStore parity
    for z in zooms:
        fsutil.delete(_layer_path(root, name, z))
        for attr in ("metadata", "manifest"):
            fsutil.delete(os.path.join(root, "_layers", name, f"{z}.{attr}.json"))
        fsutil.delete(os.path.join(root, "_checkpoints", name, f"zoom={z}.done"))


def copy_layer(
    spark: SparkSession, root: str, src: str, dst: str, zoom: int
) -> None:
    """LayerCopier.copy: duplicate one stored level under a new name."""
    store = AttributeStore(root)
    if store.layer_exists(dst, zoom):
        raise ValueError(f"layer {dst!r} zoom {zoom} already exists")
    meta = store.read_meta(src, zoom)
    write_layer(read_layer(spark, root, src, zoom), root, dst, zoom, meta=meta)


def move_layer(
    spark: SparkSession, root: str, src: str, dst: str, zoom: int
) -> None:
    """LayerMover.move == copy + delete (GenericLayerMover.scala:30-38)."""
    copy_layer(spark, root, src, dst, zoom)
    delete_layer(root, src, zoom)


def reindex_layer(
    spark: SparkSession, root: str, name: str, zoom: int, index: str = "hilbert"
) -> None:
    """LayerReindexer.reindex: rewrite a stored level under a different
    SFC key index ('z2' | 'hilbert' | 'rowmajor'). z2/rowmajor recompute the
    cell column with pure Catalyst expressions; hilbert uses one
    Arrow-batched pandas UDF (the iterative quadrant rotation has no flat
    SQL form). The level is rewritten sorted by the new index, so range
    queries and the lineage manifest follow the new curve."""
    from ..cell import rowmajor_sql, z2_sql

    store = AttributeStore(root)
    meta = store.read_meta(name, zoom)
    tl = meta.layout.tile_layout
    order = max(int(tl.layout_cols - 1).bit_length(), int(tl.layout_rows - 1).bit_length(), 1)
    df = read_layer(spark, root, name, zoom)
    if index == "z2":
        df = df.withColumn("cell", F.expr(z2_sql("col", "row")).cast("long"))
    elif index == "rowmajor":
        df = df.withColumn(
            "cell", F.expr(rowmajor_sql("col", "row", tl.layout_cols)).cast("long")
        )
    elif index == "hilbert":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _hilbert(col, row):
            import pandas as pd

            from ..cell import hilbert_encode

            return pd.Series(hilbert_encode(col.to_numpy(), row.to_numpy(), order))

        df = df.withColumn("cell", _hilbert("col", "row"))
    else:
        raise ValueError(f"unknown index {index!r}")
    df = df.localCheckpoint()
    delete_layer(root, name, zoom)
    write_layer(df, root, name, zoom, meta=meta)
    store.write_attr(name, zoom, "key_index", {"index": index, "order": order})


def value_reader(spark: SparkSession, root: str, name: str, zoom: int):
    """ValueReader.reader: random access to single tiles by key. Returns a
    `read(col, row) -> Row | None` closure whose scan pushes `cell = <sfc>`
    into the parquet source, so only the one sorted block containing the
    key is read (the reference's backend seek-by-index). The SFC used is
    the layer's stored key_index attribute (reindex_layer updates it)."""
    from ..cell import hilbert_encode, rowmajor_encode, z2_encode

    df = spark.read.parquet(_layer_path(root, name, zoom))
    store = AttributeStore(root)
    try:
        ki = store.read_attr(name, zoom, "key_index") or {}
    except Exception:
        ki = {}
    index, order = ki.get("index", "z2"), int(ki.get("order", 1))
    meta = store.read_meta(name, zoom)
    layout_cols = meta.layout.tile_layout.layout_cols if meta else 0

    def read(col: int, row: int):
        if index == "hilbert":
            c = int(hilbert_encode(col, row, order))
        elif index == "rowmajor":
            c = int(rowmajor_encode(col, row, layout_cols))
        else:
            c = int(z2_encode(col, row))
        got = df.where(
            (F.col("cell") == c) & (F.col("col") == col) & (F.col("row") == row)
        ).collect()
        return got[0] if got else None

    return read
