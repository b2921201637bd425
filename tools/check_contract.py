"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_contract.py [--json PATH] [query ...]

--json writes a CORRECTNESS-shaped result file (rows/schema/hash match per
query) so a full local sweep can be committed as evidence even when the
driver's own per-round sweep caps the number of queries it checks.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None or v != v:
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "|".join(norm_cell(v) for v in rec) for rec in pdf[cols].itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    from tilegrid.session import get_spark
    from tilegrid import queries as Q

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)
    spark = get_spark("check-contract", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    results: dict[str, dict] = {}
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"err": f"spark: {str(e)[:200]}"}
            continue
        if name not in Q.ORACLES:
            print(f"[ ok ] {name}: {len(sdf)} rows (rows-only, no oracle)")
            continue
        try:
            odf = con.execute(Q.ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {str(e)[:300]}")
            failures.append(name)
            results[name] = {"err": f"oracle: {str(e)[:200]}"}
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            cols = sorted(sdf.columns)
            a = set(
                "|".join(norm_cell(v) for v in r)
                for r in sdf[cols].itertuples(index=False)
            )
            b = set(
                "|".join(norm_cell(v) for v in r)
                for r in odf[cols].itertuples(index=False)
            )
            for x in list(a - b)[:3]:
                print(f"    spark-only: {x}")
            for x in list(b - a)[:3]:
                print(f"    oracle-only: {x}")
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": None,
        }
        if problems:
            print(f"[FAIL] {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"[ ok ] {name}: {len(sdf)} rows")
    if json_path:
        import json as _json
        import os as _os
        import time as _time

        merged = {}
        if _os.path.exists(json_path):  # merge split-run halves
            with open(json_path) as f:
                merged = _json.load(f)
        merged.pop("_meta", None)
        merged.update(results)
        n_green = sum(
            1 for v in merged.values()
            if isinstance(v, dict) and v.get("hash_match")
        )
        merged["_meta"] = {
            "checked": len(merged),
            "hash_green": n_green,
            "generated_by": "tools/check_contract.py --json",
            "sf_dir": SF_DIR,
            "written_at": _time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        with open(json_path, "w") as f:
            _json.dump(merged, f, indent=1)
        print(f"wrote {json_path} ({len(merged) - 1} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
