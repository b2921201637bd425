"""SparkSession builder tuned for tile workloads.

Arrow is on (all tile kernels are pandas/Arrow UDFs); AQE is on with skew-join
splitting (the reference has no skew handling — SpacePartitioner degrades to
modulo on overflow, SpacePartitioner.scala:47-52 — we must, per the north
rule). maxRecordsPerBatch is kept small because one record can carry a
256x256 tile (~64-512 KB): 128 records/batch ~ 8-64 MB per Arrow batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tilegrid",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    **extra_conf,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_shuffle = shuffle_partitions or (int(cores) * 2 if str(cores).isdigit() else 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(n_shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("TILEGRID_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
