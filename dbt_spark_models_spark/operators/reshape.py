"""PIVOT / UNPIVOT reshaping operators.

Surface-completeness beyond the reference (the corpus builds its wide
reports with CASE-ladder conditional aggregation, SURVEY §2.4; PIVOT is
the declarative form an analytics engine should also offer). The Spark
side uses the real ``groupBy().pivot(col, values)`` and ``unpivot``
APIs; oracles express the same reshape with portable SQL (conditional
aggregation / UNION ALL).

Scale: a pivot with an explicit value list is a single map-side-combined
hash aggregate — one shuffle on the grouping key, output width fixed at
plan time (never give Spark an open-ended pivot at 100 TB: the value
discovery pass scans the input twice and the schema becomes data-driven).
Unpivot is a row-local Expand — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_daily_event_matrix",
    oracle=f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: day × event-type count matrix via ``groupBy().pivot()`` with
    an explicit value list (fixed output schema, single aggregate pass —
    the plan-time-width requirement that keeps pivot scalable). Oracle:
    conditional aggregation, the reference's CASE-ladder idiom."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wide = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot emits null for absent (day, type) combos; counts must be 0
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


@query(
    "unpivot_type_metrics",
    oracle="""
WITH wide AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY event_type
)
SELECT event_type, 'n_events' AS metric, n_events AS metric_value FROM wide
UNION ALL
SELECT event_type, 'total_value', total_value FROM wide
UNION ALL
SELECT event_type, 'avg_value', avg_value FROM wide
""",
)
def unpivot_type_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): a wide per-type metrics row reshaped to long
    (event_type, metric, metric_value) via the native ``unpivot`` — a
    row-local Expand, zero shuffles beyond the feeding aggregate. Oracle:
    the portable UNION ALL formulation."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    wide = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["n_events", "total_value", "avg_value"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )
