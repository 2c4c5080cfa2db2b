"""Dump queries' .explain('formatted') plans to plans/<round>/<name>_<tag>.txt.

    python tools/plan_dump.py <query_name> [query_name ...] \
        [--tag after] [--sf /root/testdata/sf0.1] [--round r12]

All names are dumped from ONE Spark session (iterative trainers run real
driver jobs while building their plan, so a session per query is
needlessly slow).  Flags replace the old positional tag/sf_dir parsing,
which silently swallowed a query name as the tag when two names were
passed without a tag (r11 ADVICE #4) — a query name is now rejected as a
tag value.

Evidence artifact for the optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
files without running Spark.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="registered query names")
    ap.add_argument("--tag", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--round", dest="round_dir", default="r12")
    args = ap.parse_args()

    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.session import get_spark

    spark = get_spark("plan_dump")
    registry = load_all()
    unknown = [n for n in args.names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown}")
    if args.tag in registry:
        raise SystemExit(
            f"--tag {args.tag!r} is a registered query name — pass the tag "
            "explicitly to avoid dumping under a corrupted filename"
        )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        fn = registry[name].fn
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(out)


if __name__ == "__main__":
    main()
