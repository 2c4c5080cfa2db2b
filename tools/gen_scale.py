"""Synthesize a larger deterministic dataset from sf0.1 for SCALING
measurements (r12, VERDICT r11 next-round #5).

sf0.1 (~600k-row fact) is dominated by fixed per-query cost, so 8-vs-32
core ratios sit at ~1 and cannot evidence data-parallel plan quality.
This replicates each sf0.1 table K times with disjoint key ranges
(replica i adds i*BASE to every join/entity key), preserving the exact
arrow schemas so the engine's loaders treat the output identically to
driver testdata.  Replicated documents get a per-replica text prefix so
text/dedup kernels do real per-replica work instead of finding 20 exact
clones of everything.

This is MEASUREMENT tooling only: nothing in the query paths reads the
output directory; bench.py still reads $SPARK_GRAFT_SF_DIR.

    python tools/gen_scale.py --out /tmp/sfscale \
        [--src /root/testdata/sf0.1] [--tpch 10] [--docs 20] [--emb 50]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = 10_000_000  # > any key in sf0.1; replica i shifts keys by i*BASE

# per-table: (replication-factor group, key columns to offset)
KEYS = {
    "customer": ("tpch", ["c_custkey"]),
    "orders": ("tpch", ["o_orderkey", "o_custkey"]),
    "lineitem": ("tpch", ["l_orderkey", "l_partkey", "l_suppkey"]),
    "supplier": ("tpch", ["s_suppkey"]),
    "part": ("tpch", ["p_partkey"]),
    "nation": ("dim", []),
    "region": ("dim", []),
    "events": ("tpch", ["event_id", "user_id"]),
    "documents": ("docs", ["doc_id"]),
    "embeddings": ("emb", ["vec_id"]),
}


def replicate(table: pa.Table, keys: list[str], n: int, name: str) -> pa.Table:
    out = []
    for i in range(n):
        t = table
        for k in keys:
            col = t.column(k)
            shifted = pc.add(col, pa.scalar(i * BASE, type=col.type))
            t = t.set_column(t.schema.get_field_index(k), k, shifted)
        if name == "documents" and i > 0:
            # per-replica shingle prefix: text stays unique across replicas
            prefix = f"r{i} "
            txt = pc.binary_join_element_wise(
                pa.scalar(prefix), t.column("text").cast(pa.string()), ""
            ).cast(t.schema.field("text").type)
            t = t.set_column(t.schema.get_field_index("text"), "text", txt)
            nc = pc.add(t.column("n_chars"), pa.scalar(len(prefix), type=pa.int64()))
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars", nc)
        out.append(t)
    return pa.concat_tables(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tpch", type=int, default=10)
    ap.add_argument("--docs", type=int, default=20)
    ap.add_argument("--emb", type=int, default=50)
    args = ap.parse_args()
    factors = {"tpch": args.tpch, "dim": 1, "docs": args.docs, "emb": args.emb}
    os.makedirs(args.out, exist_ok=True)
    for name, (group, keys) in KEYS.items():
        src = os.path.join(args.src, f"{name}.parquet")
        dst = os.path.join(args.out, f"{name}.parquet")
        table = pq.read_table(src)
        big = replicate(table, keys, factors[group], name)
        # bounded row groups so Spark's parquet splits parallelize the
        # scan: target ~128 row groups per table (row groups are the
        # minimum split granularity — a single 100k-row group would give
        # the documents scan exactly ONE task and serialize every
        # tokenization-heavy query, which is a generator artifact, not an
        # engine property)
        rg = max(big.num_rows // 128, 1_000)
        pq.write_table(big, dst, row_group_size=rg)
        print(f"{name}: {table.num_rows} x {factors[group]} -> {big.num_rows}")


if __name__ == "__main__":
    main()
