#!/usr/bin/env python
"""Config-driven ETL job (reference spark-etl CLI shape,
BaseEtlConf.scala: ``--input input.json --output output.json``).

    zip -r tilegrid.zip tilegrid
    spark-submit --py-files tilegrid.zip jobs/etl.py \\
        --input input.json --output output.json

input.json — LIST of source descriptors (config/Input.scala):
    [{"name": "images", "format": "parquet",
      "backend": {"type": "file", "path": "/data/corpus"},
      "clip": [-10.0, 40.0, 10.0, 55.0], "cache": true},
     {"name": "dem", "format": "geotiff",
      "backend": {"type": "file", "path": "/data/tiffs"},
      "noData": -9999.0}]

output.json — sink + layout (config/Output.scala):
    {"backend": {"type": "file", "path": "/data/layers"},
     "maxZoom": 6, "minZoom": 2, "tileSize": 256, "pyramid": true,
     "crs": "latlng", "keyIndexMethod": {"type": "zorder"},
     "resampleMethod": "average", "resume": false}

Backend type "render" writes z/x/y tile trees instead of a layer store
(SpatialRenderOutput): "encoding": "png" (optional "breaks":
"10:ff0000ff;100:00ff00ff" colormap) or "geotiff" (per-tile
georeferenced).

Prints one JSON metrics line (per-input, per-level tile counts + timings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input descriptors JSON")
    ap.add_argument("--output", required=True, help="output descriptor JSON")
    ap.add_argument("--cores", default=None, help="local[N] when not on a cluster")
    args = ap.parse_args()

    from tilegrid.etl import EtlConf, EtlConfigError, run_etl

    try:
        conf = EtlConf.from_files(args.input, args.output)
    except EtlConfigError as e:
        ap.error(str(e))

    if args.cores:
        from tilegrid.session import get_spark

        spark = get_spark("tilegrid-etl", cores=args.cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("tilegrid-etl").getOrCreate()

    print(json.dumps(run_etl(spark, conf)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
