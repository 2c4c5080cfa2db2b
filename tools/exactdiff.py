"""Exact (bit-level) value diff between a query's Spark result and its
DuckDB oracle — stricter than the driver's hash gate, so queries that
pass here pass the gate.

For each named query: run both sides, sort columns by name, sort rows by
their full repr, and report the first row/column where the exact Python
repr differs (floats via ``float.hex`` so 1-ulp drift is visible).

Usage: python tools/exactdiff.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_spark_models_spark.sources.testdata import TABLES, table_path


def canon(v):
    if isinstance(v, float):
        return v.hex()
    return repr(v)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from dbt_spark_models_spark.operators import REGISTRY, load_all
    from dbt_spark_models_spark.session import get_spark

    load_all()
    spark = get_spark("exactdiff")

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    for name in args:
        q = REGISTRY[name]
        sdf = q.fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(canon(r[c]) for c in scols) for r in sdf.collect()
        )
        res = con.execute(q.oracle)
        ocols_raw = [d[0] for d in res.description]
        orows_raw = res.fetchall()
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = sorted(
            tuple(canon(r[i]) for i in order) for r in orows_raw
        )
        if scols != ocols:
            print(f"DIFF  {name}: columns {scols} vs {ocols}")
            continue
        if srows == orows:
            print(f"EXACT {name}: {len(srows)} rows identical")
            continue
        if len(srows) != len(orows):
            # Count mismatch first: positional zip would truncate and
            # misalign every per-row diff after the first missing row.
            # Diff as multisets instead so the reported rows are the ones
            # actually unique to each side.
            print(f"DIFF  {name}: row counts {len(srows)} vs {len(orows)}")
            from collections import Counter

            sc, oc = Counter(srows), Counter(orows)
            only_s = list((sc - oc).elements())
            only_o = list((oc - sc).elements())
            for r in only_s[:5]:
                print(f"DIFF  {name} spark-only row: {r}")
            for r in only_o[:5]:
                print(f"DIFF  {name} oracle-only row: {r}")
            print(
                f"DIFF  {name}: {len(only_s)} spark-only rows, "
                f"{len(only_o)} oracle-only rows"
            )
            continue
        ndiff = 0
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            if sr != orow:
                for c, sv, ov in zip(scols, sr, orow):
                    if sv != ov:
                        ndiff += 1
                        if ndiff <= 5:
                            print(f"DIFF  {name} row {i} col {c}: spark={sv} oracle={ov}")
        print(f"DIFF  {name}: {ndiff} differing cells")


if __name__ == "__main__":
    main()
