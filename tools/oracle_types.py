"""Flag oracle SQL columns whose DuckDB type degrades in pandas.

DuckDB returns HUGEINT for SUM(<integer>) / COUNT_IF, and pandas
``fetchdf`` converts HUGEINT to float64 — so a driver that compares via
pandas sees ``265.0`` vs Spark's ``265`` and the value hash diverges even
though the values are identical integers. Every oracle must therefore
cast such columns to BIGINT explicitly.

Usage: python tools/oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_spark_models_spark.sources.testdata import TABLES, table_path

BAD_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dbt_spark_models_spark.operators import REGISTRY, load_all

    load_all()
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    flagged = 0
    for name, q in sorted(REGISTRY.items()):
        if not q.oracle:
            continue
        try:
            desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {str(e).splitlines()[0][:120]}")
            flagged += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(b in t for b in BAD_TYPES)]
        if bad:
            flagged += 1
            print(f"FLAG  {name}: {bad}")
    print(f"{flagged} flagged / {sum(1 for q in REGISTRY.values() if q.oracle)} oracles")


if __name__ == "__main__":
    main()
