"""Grouped-map Pandas path: applyInPandas with per-group pandas logic.

The designated slow path (Arrow-batched, ~10-100× faster than row-at-a-time
UDFs) for semantics the built-ins can't express. Here the semantics ARE
SQL-expressible (per-group z-normalization) on purpose: the DuckDB oracle
verifies the pandas path end-to-end — group routing, Arrow round-trip,
float math — against the pure-SQL formulation.

Scale notes: applyInPandas shuffles once on the group key and streams one
group at a time through Python with bounded memory; group size is the
memory unit, so at 100 TB you salt oversized groups first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables


def _normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"]
    # ddof=1 (sample std) to match STDDEV_SAMP in the oracle
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "zvalue": (v - v.mean()) / v.std(ddof=1),
        }
    )


@query(
    "grouped_pandas_znormalize",
    oracle="""
WITH eligible AS (
    SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 2
)
SELECT e.event_id, e.user_id,
       ROUND((e.value - AVG(e.value) OVER w) / STDDEV_SAMP(e.value) OVER w, 6)
           AS zvalue
FROM events e
JOIN eligible USING (user_id)
WINDOW w AS (PARTITION BY e.user_id)
""",
)
def grouped_pandas_znormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-normalization through applyInPandas, verified against the
    window-function formulation (reference grouped-map shape from the
    PySpark guide; groups with <2 events excluded so std is defined)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    eligible = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 2
    )
    out = (
        ev.join(F.broadcast(eligible.select("user_id")), "user_id")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            _normalize_group, "event_id long, user_id long, zvalue double"
        )
    )
    return out.select("event_id", "user_id", F.round("zvalue", 6).alias("zvalue"))
