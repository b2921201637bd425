"""Deterministic scale-factor amplifier for the driver's testdata tables.

The sandbox ships sf{0.001,0.01,0.1} only; the round brief asks for scale
evidence at sf >= 0.3 with no external data. This replicates every fact
table K times with consistent key offsets — the same shape TPC-H scaling
has: fixed dims (region/nation) stay fixed, every fact/entity table grows
K x, foreign keys stay valid because each copy shifts ALL key columns by
copy * (max_key + 1) of the base table, and value columns (dates, prices,
text, embeddings) are byte-identical per copy. Fully deterministic: no
RNG, no clock.

Replicated documents get a per-copy deterministic token permutation and
embeddings a per-copy component roll: byte-exact clones would put EVERY row
in a duplicate group, inflating pair-producing dedup outputs ~K^2 x (each
group of g clones emits g(g-1)/2 pairs) — a corpus-density change, not a
scale change. The permutation preserves token/stopword/distinct counts
(quality + language distributions are unchanged) while decorrelating the
3-gram shingle sets that minhash/simhash hash, so duplicate DENSITY stays
at the base corpus's level as the row count grows — what a real larger
scale factor looks like. Pass --clones to keep byte-exact copies instead.

Usage: python tools/make_sf.py [K] [src_dir] [dst_dir] [--clones]
Defaults: K=3, src=/root/testdata/sf0.1, dst=/tmp/tilegrid_sf0.3
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# table -> {column: key-space it belongs to}; every key column shifts by
# copy * stride(space) so cross-table joins stay consistent
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# key space -> (table, column) that defines its stride
STRIDE_OF = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
FIXED_DIMS = ("region", "nation")


def _perturb_documents(tbl: pa.Table, copy: int) -> pa.Table:
    """Per-copy token permutation, seeded by (doc_id, copy) — deterministic,
    count-preserving, shingle-decorrelating."""
    texts = tbl.column("text").to_pylist()
    ids = tbl.column("doc_id").to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        toks = text.split()
        rng = np.random.default_rng(doc_id * 1000003 + copy)
        out.append(" ".join(toks[i] for i in rng.permutation(len(toks))))
    i = tbl.schema.get_field_index("text")
    return tbl.set_column(i, "text", pa.array(out, pa.string()))


def _perturb_embeddings(tbl: pa.Table, copy: int) -> pa.Table:
    """Per-copy component roll: same norm and component histogram, but a
    rolled vector is uncorrelated with its origin under cosine."""
    vecs = tbl.column("embedding").to_pylist()
    rolled = [np.roll(np.asarray(v, np.float32), 7 * copy).tolist() for v in vecs]
    i = tbl.schema.get_field_index("embedding")
    return tbl.set_column(i, "embedding", pa.array(rolled, pa.list_(pa.float32())))


PERTURB = {"documents": _perturb_documents, "embeddings": _perturb_embeddings}


def make_sf(k: int, src: str, dst: str, clones: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    stride = {
        space: con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        for space, (t, col) in STRIDE_OF.items()
    }
    for t in FIXED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (fixed dim)")
    for t, keys in KEYED.items():
        if not clones and t in PERTURB:
            base = pq.read_table(f"{src}/{t}.parquet")
            key_col = next(iter(keys))
            parts = [base]
            for copy in range(1, k):
                shifted = base.set_column(
                    base.schema.get_field_index(key_col), key_col,
                    pa.compute.add(base.column(key_col), copy * stride[keys[key_col]]),
                )
                parts.append(PERTURB[t](shifted, copy))
            out = pa.concat_tables(parts)
            pq.write_table(out, f"{dst}/{t}.parquet", row_group_size=131072)
            print(f"{t}: {out.num_rows} rows ({k}x, copies perturbed)")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for copy in range(k):
            exprs = ", ".join(
                f"{c} + {copy * stride[keys[c]]} AS {c}" if c in keys else c
                for c in cols
            )
            selects.append(f"SELECT {exprs} FROM read_parquet('{src}/{t}.parquet')")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--clones"]
    k = int(args[0]) if len(args) > 0 else 3
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    dst = args[2] if len(args) > 2 else "/tmp/tilegrid_sf0.3"
    make_sf(k, src, dst, clones="--clones" in sys.argv[1:])
