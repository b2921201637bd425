#!/usr/bin/env python
"""Ingest job: image+caption corpus -> tiled layer + zoom pyramid, written
with per-partition lineage manifests and per-level checkpoint markers.

Run (cluster or local):

    zip -r tilegrid.zip tilegrid
    spark-submit --py-files tilegrid.zip jobs/ingest.py \\
        --corpus /path/to/corpus_parquet --out /path/to/layers \\
        --name images --zoom 6 --min-zoom 2 [--resume]

Resumability: each zoom level is an atomic unit — `write_layer` drops a
`_checkpoints/<name>/zoom=<z>.done` marker after the parquet + manifest
commit; with --resume, completed levels are skipped and the pyramid restarts
from the deepest completed level (reference analogue: per-level sink in
Ingest.scala:90-99; the reference has no resume — ours is required by the
north rule). The manifest records per-output-file cell ranges, row counts
and value checksums (lineage + audit via `verify_manifest`).

Reference lifecycle being reproduced: Etl.ingest (spark-etl/.../Etl.scala:54-76)
= load -> collect metadata -> tile -> pyramid -> write per level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# bare-script fallback: repo root on sys.path (spark-submit --py-files
# provides the package archive instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet dir of the image table")
    ap.add_argument("--out", required=True, help="layer store root")
    ap.add_argument("--name", default="images")
    ap.add_argument("--zoom", type=int, default=6)
    ap.add_argument("--min-zoom", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--crs", default="latlng",
        help="output layout CRS: latlng (default), webmercator, or any "
             "tilegrid.proj name/proj-string whose projection has a Column "
             "expression form (tmerc/utm, lcc, merc, sinu, eqc, longlat); "
             "non-world CRS also needs --layout-extent",
    )
    ap.add_argument(
        "--layout-extent", default=None,
        help="xmin,ymin,xmax,ymax world extent for a custom --crs layout",
    )
    ap.add_argument(
        "--multiband", action="store_true",
        help="keep RGB bands through the tiler instead of collapsing to luma",
    )
    ap.add_argument("--cores", default=None, help="local[N] when not on a cluster")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/master comes from the launcher; the
    # local fallback builder only kicks in when run as a bare script
    if args.cores:
        from tilegrid.session import get_spark

        spark = get_spark("tilegrid-ingest", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("tilegrid-ingest").getOrCreate()

    from tilegrid.celltype import FLOAT64
    from tilegrid.grid import (
        Extent, GridBounds, LATLNG_WORLD, LayoutDefinition, TileLayout,
        WEBMERCATOR_WORLD,
    )
    from tilegrid.meta import LayerMeta
    from tilegrid.operators.pyramid import pyramid_up
    from tilegrid.operators.tiler import tile_to_layout, with_extent_from_center
    from tilegrid.sources.layer_io import write_layer

    # output-CRS layout (Etl.scala:54-76 reprojects to the output CRS during
    # ingest; image centers transform via tilegrid.proj forward_cols — pure
    # whole-stage codegen, no UDF)
    n = 1 << args.zoom
    if args.crs != "latlng":
        from tilegrid.proj import crs as crs_fn

        try:  # fail fast: the tiler needs the codegen forward
            crs_fn(args.crs).forward_cols("lon", "lat")
        except (NotImplementedError, ValueError) as e:
            ap.error(f"--crs {args.crs}: {e}")
    if args.crs == "latlng":
        world = LATLNG_WORLD
    elif args.crs in ("webmercator", "epsg:3857"):
        world = WEBMERCATOR_WORLD
    elif args.layout_extent:
        world = Extent(*(float(v) for v in args.layout_extent.split(",")))
    else:
        ap.error(f"--crs {args.crs} needs --layout-extent")
    layout = LayoutDefinition(world, TileLayout(n, n, 256, 256))

    def meta_for(lyr, zoom, lo):
        from pyspark.sql import functions as F

        r = lyr.agg(
            F.min("col").alias("c0"), F.min("row").alias("r0"),
            F.max("col").alias("c1"), F.max("row").alias("r1"),
        ).collect()[0]
        bounds = GridBounds(int(r["c0"]), int(r["r0"]), int(r["c1"]), int(r["r1"]))
        ext = lo.map_transform.extent_for_gridbounds(bounds)
        return LayerMeta(
            cell_type=FLOAT64, layout=lo, extent=ext, crs=args.crs,
            bounds=bounds, zoom=zoom,
        )

    metrics: dict = {"levels": {}, "started_at": time.time()}
    t0 = time.time()

    # resume: find the deepest already-checkpointed level

    from tilegrid import fsutil

    def done(z: int) -> bool:
        # resolved via Hadoop FileSystem so --resume works with hdfs://
        # or s3a:// --out paths, not only driver-local directories
        return args.resume and fsutil.exists(
            os.path.join(args.out, "_checkpoints", args.name, f"zoom={z}.done")
        )

    from tilegrid.sources.layer_io import read_layer

    if done(args.zoom):
        layer = read_layer(spark, args.out, args.name, args.zoom)
        metrics["levels"][args.zoom] = {"skipped": True}
        print(f"[resume] zoom {args.zoom} already done", file=sys.stderr)
    else:
        imgs = spark.read.parquet(args.corpus)
        # the input_hint schema names the image column `bytes`; the tiler
        # reads `tile` — accept either
        if "bytes" in imgs.columns and "tile" not in imgs.columns:
            imgs = imgs.withColumnRenamed("bytes", "tile")
        parallelism = spark.sparkContext.defaultParallelism
        imgs = imgs.repartition(parallelism * 2, "image_id")
        px, py = "lon", "lat"
        if args.crs != "latlng":
            from tilegrid.proj import crs as crs_fn

            xc, yc = crs_fn(args.crs).forward_cols("lon", "lat")
            imgs = imgs.withColumn("px", xc).withColumn("py", yc)
            px, py = "px", "py"
        placed = with_extent_from_center(imgs, layout, px, py)
        layer = tile_to_layout(
            placed, layout, args.zoom, multiband=args.multiband
        ).persist()
        t = time.time()
        n_tiles = layer.count()
        meta = meta_for(layer, args.zoom, layout)
        from tilegrid.cell import zranges

        b = meta.bounds
        write_layer(
            layer, args.out, args.name, args.zoom,
            meta=meta,
            # even-volume SFC breaks over the occupied key bounds: the base
            # level is the bulk of the store; deterministic balanced splits
            # beat repartitionByRange's sampling pass at this size
            index_ranges=zranges(b.col_min, b.row_min, b.col_max, b.row_max),
        )
        metrics["levels"][args.zoom] = {
            "tiles": n_tiles, "sec": round(time.time() - t, 2),
        }

    cur = layer
    for z in range(args.zoom, args.min_zoom, -1):
        if done(z - 1):
            cur = read_layer(spark, args.out, args.name, z - 1)
            metrics["levels"][z - 1] = {"skipped": True}
            print(f"[resume] zoom {z - 1} already done", file=sys.stderr)
            continue
        t = time.time()
        nxt = pyramid_up(cur, method="average").persist()
        n_tiles = nxt.count()
        m = 1 << (z - 1)
        lo = LayoutDefinition(world, TileLayout(m, m, 256, 256))
        # per-level metadata like the reference's Pyramid.levelStream sink
        write_layer(nxt, args.out, args.name, z - 1, meta=meta_for(nxt, z - 1, lo))
        metrics["levels"][z - 1] = {
            "tiles": n_tiles, "sec": round(time.time() - t, 2),
        }
        cur = nxt

    metrics["total_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
