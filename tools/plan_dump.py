"""Dump one query's .explain('formatted') plan to plans/r11/<name>_<tag>.txt.

    python tools/plan_dump.py <query_name> <tag> [sf_dir]

Evidence artifact for the optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
files without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "after"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.session import get_spark

    spark = get_spark("plan_dump")
    fn = load_all()[name].fn
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
    print(out)


if __name__ == "__main__":
    main()
