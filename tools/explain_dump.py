"""Dump formatted physical plans of the headline queries to EXPLAIN.md —
direct evidence of pushdown / broadcast / codegen / shuffle structure.

    python tools/explain_dump.py [sf_dir] [out_path]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/EXPLAIN.md"

    from bench import HEADLINE
    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.session import get_spark

    spark = get_spark("explain")
    registry = load_all()
    # headline (plan-bound) queries + the DeltaLite family: the ACID gates
    # aren't benched (their cost is commit orchestration, not plan-bound)
    # but their SCAN plans are the pruning/DPP evidence the docstrings
    # cite — pruned parquet scans, DV anti-joins, partition-pruned tails
    extra = sorted(
        n
        for n in registry
        if "deltalite" in n and not n.startswith("streaming_")
    ) + ["sink_ivf_partitioned_layout", "multimodal_metadata_partition_plan"]
    names = list(HEADLINE) + [n for n in extra if n not in HEADLINE]
    lines = [
        "# EXPLAIN — formatted physical plans of the headline queries",
        "",
        f"Generated from `{sf_dir}`. Things to look for: `PushedFilters` on",
        "every parquet scan, `BroadcastHashJoin` on dimension joins (no",
        "`SortMergeJoin` in the star queries), `Expand` for grouping sets,",
        "window exchanges partitioned by high-cardinality keys.",
        "",
    ]
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines += [f"## {name}", "", "```", plan.strip(), "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(out_path)


if __name__ == "__main__":
    main()
