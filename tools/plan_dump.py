"""Dump queries' .explain('formatted') plans to plans/r11/<name>_<tag>.txt.

    python tools/plan_dump.py <query_name> [query_name ...] <tag> [sf_dir]

The LAST one or two arguments are the tag and (optionally) the sf_dir —
every earlier argument is a query name, all dumped from ONE Spark
session (iterative trainers run real driver jobs while building their
plan, so a session per query is needlessly slow).

Evidence artifact for the optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
files without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if argv and os.path.isdir(argv[-1]):
        sf_dir = argv.pop()
    tag = argv.pop() if len(argv) > 1 else "after"
    names = argv

    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.session import get_spark

    spark = get_spark("plan_dump")
    registry = load_all()
    for name in names:
        fn = registry[name].fn
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r11",
            f"{name}_{tag}.txt",
        )
        with open(out, "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(out)


if __name__ == "__main__":
    main()
