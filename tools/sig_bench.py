#!/usr/bin/env python
"""Signature-stage benchmark: Arrow/NumPy MinHash pass vs the JVM
expression path (with_minhash vs with_minhash_sql), and the SimHash Arrow
pass. Writes one JSON line; the measurement backs the module docstrings'
choice of default path.

Usage: python tools/sig_bench.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000
    cores = sys.argv[2] if len(sys.argv) > 2 else "8"
    from pyspark.sql import functions as F

    from tilegrid.operators import dedup as D
    from tilegrid.session import get_spark

    spark = get_spark("sig-bench", cores=cores)
    # synthetic corpus: ~120 tokens/doc, deterministic
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 119), i -> "
            "concat('w', CAST((id * 131 + i * 17) % 5000 AS STRING))), ' ')"
        ).alias("text"),
    ).persist()
    docs.count()

    def run(fn, col):
        t0 = time.time()
        fn(docs).select(F.expr(f"sum({col} % 1000000)")).collect()
        return time.time() - t0

    t_py = run(D.with_minhash, "sig_0")
    t_sql = run(D.with_minhash_sql, "sig_0")
    t_sim = run(D.with_simhash, "simhash")
    # parity spot check: both paths identical on a sample
    a = (
        D.with_minhash(docs.limit(200))
        .select("doc_id", *[f"sig_{j}" for j in range(D.N_MINHASH)])
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        D.with_minhash_sql(docs.limit(200))
        .select("doc_id", *[f"sig_{j}" for j in range(D.N_MINHASH)])
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert a.equals(b), "arrow vs sql signature mismatch"
    print(
        json.dumps(
            {
                "n_docs": n,
                "cores": cores,
                "minhash_arrow_sec": round(t_py, 2),
                "minhash_sql_sec": round(t_sql, 2),
                "simhash_arrow_sec": round(t_sim, 2),
                "sql_over_arrow": round(t_sql / t_py, 2),
                "parity": "identical",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
