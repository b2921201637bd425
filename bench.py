#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs (a) the flagship image-corpus pipeline — distributed synth of the
BASELINE.json input table (image_id, bytes, w, h, fmt, caption, phash),
tile-to-layout at zoom 6, 4-level pyramid, PIP spatial join to a polygon
set — and (b) the headline oracle-checked queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "tiles+join-rows/sec", "value": <flagship throughput>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": ...,
   "flagship": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_IMAGES        flagship corpus size (default 2000)
  BENCH_QUERIES       csv of query names, "all" (default), or "" to skip
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "100000"))
QUERIES_ENV = os.environ.get("BENCH_QUERIES", "all")

HEADLINE = [
    "tile_assign",
    "spatial_join",
    "pip_join",
    "knn",
    "rasterize_count",
    "focal_sum",
    "pyramid_sum",
    "zonal_hist",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "quality",
    "ann_topk",
    "focal_mean",
    "polygonal_summary",
    "crop",
    "zoom_resample",
    "pricing_summary",
    # round-2 additions
    "reproject_wm",
    "band_stats",
    "ndvi",
    "morans_local",
    "vectorize",
    "zoom_resample_bilinear",
    "temporal_mean",
    "embed_dups",
    "idw",
    "hillshade",
    "hist_matching",
    # round-3 additions: propagation family + overlay + streaming
    "cost_distance",
    "flow_accumulation",
    "viewshed",
    "fill",
    "euclidean_distance",
    "polygon_overlay",
    "streaming_counts",
    # round-4 additions: datum reproject, line geometry, Avro store,
    # multiband focal, ETL-era pipeline ops
    "reproject_datum",
    "line_clip",
    "avro_roundtrip",
    "focal_mean_multiband",
    "dedup_clusters",
    "sessionize",
    "tfidf",
    "repetition",
    "phash_dups",
    "train_split",
    "corpus_filter",
    "mix_oversample",
    # round-5 additions: halo-batched propagation, image decode path,
    # LAEA reprojection, ANN retrieval quality
    "cost_distance_batched",
    "flow_accumulation_batched",
    "image_features",
    "reproject_laea",
    "ann_recall",
    "decontaminate",
    "dedup_paragraphs",
    "stream_dedup",
    "pack_sequences",
    "aspect_buckets",
    "resize_roundtrip",
    "stream_pip",
    "ann_recall_ivf",
    "temporal_gapfill",
    "temporal_trend",
    "temporal_composite",
    # round-5 endgame: geohash cells, corpus QA, skew census, lossy-codec
    # invariant, fixed-radius pair join
    "geohash_topk",
    "profile_docs",
    "skew_cells",
    "psnr_lossy",
    "distance_pairs",
    "quadkey_topk",
    "dedup_keep_best",
]

FLAGSHIP_ZOOM = int(os.environ.get("BENCH_ZOOM", "6"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def images_df(spark, n: int):
    """Distributed deterministic synth of the input_hint image table —
    generation is a narrow mapInPandas over spark.range (no driver bottleneck
    at 10^12-image scale; ids are the only thing shipped)."""
    from tilegrid import codec, fixtures

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                image_id = f"img{i:010d}"
                sizes = (64, 128, 256)
                w, h = sizes[i % 3], sizes[(i // 3) % 3]
                arr = fixtures.make_pattern(i, h, w)
                fmt = "png" if i % 2 == 0 else "fjpg"
                lon, lat = fixtures.image_lonlat(image_id)
                rows.append(
                    (
                        image_id,
                        codec.encode_tile(arr, fmt),
                        np.int32(w),
                        np.int32(h),
                        fmt,
                        f"caption-{i}",
                        np.int64(fixtures.phash64(arr)),
                        lon,
                        lat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "tile", "w", "h", "fmt", "caption", "phash",
                    "lon", "lat",
                ],
            )

    schema = (
        "image_id string, tile binary, w int, h int, fmt string, "
        "caption string, phash long, lon double, lat double"
    )
    # fixed 64-way layout so the stored corpus parallelizes the same at any
    # reader core count (16 files would cap a 32-core decode stage)
    return spark.range(n).repartition(64).mapInPandas(gen, schema)


def corpus_path(n: int) -> str:
    return f"/tmp/tilegrid_bench_corpus_{n}"


def ensure_corpus(spark, n: int) -> str:
    """Materialize the image+caption corpus as a parquet table (UNTIMED —
    the north-rule metric reads a stored Iceberg/parquet table; synthesis
    is not part of the measured job)."""
    path = corpus_path(n)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        log(f"materializing corpus: {n} images -> {path}")
        images_df(spark, n).write.mode("overwrite").parquet(path)
    return path


def flagship_pipeline(spark) -> dict:
    """BASELINE.json metric: tiles+join-rows/sec for tiler + pyramid + PIP
    join over the stored image corpus."""
    from tilegrid import fixtures
    from tilegrid.grid import LATLNG_WORLD, LayoutDefinition, TileLayout
    from tilegrid.operators.join import pip_join_df
    from tilegrid.operators.pyramid import build_pyramid
    from tilegrid.operators.tiler import tile_to_layout, with_extent_from_center

    n = 1 << FLAGSHIP_ZOOM
    layout = LayoutDefinition(LATLNG_WORLD, TileLayout(n, n, 256, 256))
    path = ensure_corpus(spark, N_IMAGES)

    # untimed warmup: boot python workers + JIT/codegen (cluster spin-up is
    # not part of steady-state throughput, which is what the metric rates)
    spark.range(10000).repartition(CPUS).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    spark.read.parquet(path).count()

    t0 = time.time()
    # spread the scan across all cores before the decode-heavy UDF stages:
    # mapInPandas chains narrowly on scan splits, so file-count must not cap
    # parallelism. Only shuffle when the scan is actually starved (small
    # corpora coalesce to a handful of splits under maxPartitionBytes) — at
    # full volume the scan already carries >= 2 splits/core and the
    # unconditional repartition was a pure full-corpus-bytes shuffle tax
    # (~16 GB at 1.6M images) on the measured path
    imgs = spark.read.parquet(path)
    if imgs.rdd.getNumPartitions() < CPUS * 2:
        imgs = imgs.repartition(CPUS * 2, "image_id")
    imgs = imgs.persist()
    placed = with_extent_from_center(imgs, layout, "lon", "lat")
    layer = tile_to_layout(placed, layout, FLAGSHIP_ZOOM).persist()
    n_tiles = layer.count()
    t_tile = time.time()
    log(f"  phase tile: {t_tile - t0:.1f}s ({n_tiles} tiles)")

    levels = build_pyramid(layer, FLAGSHIP_ZOOM, FLAGSHIP_ZOOM - 4)
    from functools import reduce

    n_pyr = reduce(
        lambda a, b: a.unionByName(b),
        [d for z, d in levels.items() if z < FLAGSHIP_ZOOM],
    ).count()  # one job; levels persist inside build_pyramid
    t_pyr = time.time()
    log(f"  phase pyramid: {t_pyr - t_tile:.1f}s ({n_pyr} tiles)")

    polys = spark.createDataFrame(
        fixtures.polygons_table(1000)[["polygon_id", "wkb"]]
    )
    join = pip_join_df(
        imgs.select("image_id", "lon", "lat", "caption"),
        polys,
        layout,
        FLAGSHIP_ZOOM,
        x="lon",
        y="lat",
        point_cols=("image_id", "caption"),
    )
    n_join = join.count()
    elapsed = time.time() - t0
    log(f"  phase join: {elapsed - (t_pyr - t0):.1f}s ({n_join} rows)")

    for df in list(levels.values()) + [imgs]:
        try:
            df.unpersist()
        except Exception:
            pass
    total = n_tiles + n_pyr + n_join
    return {
        "images": N_IMAGES,
        "tiles_z6": n_tiles,
        "pyramid_tiles": n_pyr,
        "join_rows": n_join,
        "total_rows": total,
        "sec": round(elapsed, 3),
        "rows_per_sec": round(total / elapsed, 1),
    }


def run_queries(spark) -> dict:
    from tilegrid import queries as Q

    if QUERIES_ENV == "":
        return {}
    names = HEADLINE if QUERIES_ENV == "all" else QUERIES_ENV.split(",")
    out = {}
    for name in names:
        fn = Q.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench alive; report the failure
            log(f"query {name} failed: {e}")
            out[name] = None
    return out


def main() -> None:
    os.environ.setdefault("TILEGRID_DRIVER_MEM", "12g")
    from tilegrid.session import get_spark

    # >= 64 reduce partitions regardless of core count: keeps reduce
    # partitions small (large applyInPandas partitions at high data volume
    # risk multi-GB Arrow streams per task and straggler skew)
    # RAM-backed shuffle dirs: the sandbox has ONE disk shared by all cores,
    # so at high volume shuffle I/O (not CPU) caps scaling — a cluster has
    # per-executor local disks; tmpfs models that aggregate bandwidth
    os.makedirs("/dev/shm/tilegrid-shuffle", exist_ok=True)
    spark = get_spark(
        "tilegrid-bench", cores=CPUS, shuffle_partitions=max(64, CPUS * 2),
        **{"spark.local.dir": "/dev/shm/tilegrid-shuffle"},
    )
    load_before = os.getloadavg()
    log(f"bench: cores={CPUS} sf_dir={SF_DIR} images={N_IMAGES} "
        f"loadavg_before={load_before}")

    flag = flagship_pipeline(spark)
    log(f"flagship: {flag}")
    queries = run_queries(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "tiles+join-rows/sec",
        "value": flag["rows_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": CPUS,
        "flagship": flag,
        # external-load context: 1/5/15-min loadavg sampled before the run —
        # the box has noisy co-tenants, so a regressed number with
        # loadavg >> cores-in-use is noise, not a plan regression
        "loadavg_before": list(load_before),
        "loadavg_after": list(os.getloadavg()),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
