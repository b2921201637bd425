#!/usr/bin/env python
"""Corpus QA job: one pass of data-quality gates over an image+caption
corpus BEFORE it is tiled / trained on, written as a JSON report.

Run (cluster or local):

    zip -r tilegrid.zip tilegrid
    spark-submit --py-files tilegrid.zip jobs/corpus_qa.py \\
        --corpus /path/to/corpus_parquet --out /path/to/qa [--resume]

Gates (each a documented operator with its own oracle-tier query):
  1. metadata profile  — per-column nulls / cardinality / min-max /
     rendered lengths in ONE aggregation pass (operators/profile.py;
     a silently-null caption column fails a training run, catch it here)
  2. size-skew census  — hottest (w, h) shapes with exact share/x-mean
     ratios (decode batches are shape-homogeneous; one dominant shape
     means one hot decode bucket)
  3. lossy-codec QA    — every lossy-format image round-tripped, exact
     integer SSE, north-rule PSNR>=40dB flag (multimodal.codec_error_stats)
  4. phash dup census  — banded Hamming near-dup pair count (dedup.py;
     exact by pigeonhole, hot buckets capped)

Resumability: the report commit drops `<out>/_qa.done`; with --resume a
completed report is skipped (same marker protocol as jobs/ingest.py).
The report itself records row counts per gate — the per-partition lineage
manifests of the ingest job cover file-level audit; this job covers
corpus-level audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet dir of the image table")
    ap.add_argument("--out", required=True, help="report output dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", default=None, help="local[N] when not on a cluster")
    ap.add_argument("--max-hamming", type=int, default=8)
    ap.add_argument("--top-shapes", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilegrid import fsutil
    from tilegrid.operators import multimodal as MM
    from tilegrid.operators import profile as PF
    from tilegrid.operators.dedup import hamming_dup_pairs
    from tilegrid.session import get_spark

    done = os.path.join(args.out, "_qa.done")
    report_path = os.path.join(args.out, "report.json")
    spark = get_spark("corpus-qa", cores=int(args.cores) if args.cores else None)
    if args.resume and fsutil.exists(done):
        print(f"qa report skipped (marker {done})")
        print(fsutil.read_text(report_path))
        return 0

    t0 = time.time()
    df = spark.read.parquet(args.corpus)
    data_col = "bytes" if "bytes" in df.columns else "tile"
    meta_cols = [c for c in ("image_id", "fmt", "w", "h", "caption") if c in df.columns]

    profile = [
        r.asDict() for r in PF.profile_columns(df, meta_cols).orderBy("column").collect()
    ]

    skew = []
    if "w" in df.columns and "h" in df.columns:
        skew = [
            r.asDict()
            for r in PF.key_skew(df, ["w", "h"], top=args.top_shapes).collect()
        ]

    lossy = df.where(F.col("fmt").isin("fjpg", "jpeg"))
    lossy_qa = {"n_lossy": 0, "n_psnr_ok": 0}
    if lossy.limit(1).count():
        stats = MM.codec_error_stats(
            lossy.select("image_id", F.col(data_col).alias("tile"), "fmt"),
            "fjpg",
        )
        agg = stats.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("psnr_ge_40").cast("bigint")).alias("ok"),
            F.max(F.col("sse")).alias("max_sse"),
        ).collect()[0]
        lossy_qa = {
            "n_lossy": int(agg["n"]),
            "n_psnr_ok": int(agg["ok"]),
            "max_sse": int(agg["max_sse"]),
        }

    n_dup_pairs = 0
    if "phash" in df.columns:
        n_dup_pairs = hamming_dup_pairs(
            df, max_hamming=args.max_hamming, max_bucket=10_000
        ).count()

    report = {
        "corpus": args.corpus,
        "n_rows": int(profile[0]["n_rows"]) if profile else 0,
        "profile": profile,
        "size_skew_top": skew,
        "lossy_qa": lossy_qa,
        "phash_dup_pairs": int(n_dup_pairs),
        "max_hamming": args.max_hamming,
        "wall_s": round(time.time() - t0, 2),
    }
    fsutil.write_text(report_path, json.dumps(report, indent=2, default=str))
    fsutil.write_text(done, "done")
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
