"""Correctness-gate wrappers for the Structured Streaming pipelines.

Each runs a real streaming query (readStream → watermark → windowed /
session aggregation → memory sink, driven to completion) and is verified
against a DuckDB batch oracle computing the same semantics — proving the
streaming and batch paths agree, which is what lets the engine swap the
reference's nightly-batch event handling (SURVEY.md §2.10) for continuous
ingest without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_spark_models_spark.operators import query


@query(
    "streaming_daily_type_counts",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY day, event_type
""",
)
def streaming_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day streaming windows ≡ batch daily group-by."""
    from dbt_spark_models_spark.streaming import stream_daily_type_counts

    return stream_daily_type_counts(spark, sf_dir)


@query(
    "streaming_session_counts",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_seq
""",
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30-min gap) ≡ batch
    gaps-and-islands with session_end = last event + gap."""
    from dbt_spark_models_spark.streaming import stream_session_counts

    return stream_session_counts(spark, sf_dir)


@query(
    "streaming_dedup_events",
    oracle="""
SELECT event_id, event_type, ROUND(value, 2) AS val
FROM events
""",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery (stream ∪ stream) collapsed to exactly-once by
    watermark-bounded streaming dedup ≡ the batch table itself."""
    from dbt_spark_models_spark.streaming import stream_dedup_events

    return stream_dedup_events(spark, sf_dir)


@query(
    "streaming_sliding_window_counts",
    oracle="""
WITH expanded AS (
    SELECT CAST(UNNEST([date_trunc('day', ts) - INTERVAL 1 DAY,
                        date_trunc('day', ts)]) AS DATE) AS window_start,
           event_type, value
    FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM expanded
GROUP BY window_start, event_type
""",
)
def streaming_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-day/1-day streaming windows ≡ batch double-expansion (each
    event contributes to its two containing windows) + group-by."""
    from dbt_spark_models_spark.streaming import stream_sliding_window_counts

    return stream_sliding_window_counts(spark, sf_dir)


@query(
    "streaming_stateful_user_gaps",
    oracle="""
WITH gaps AS (
    SELECT user_id, value,
           date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id,
       COUNT(*) AS n_events,
       COALESCE(MAX(gap_us), 0) // 1000000 AS max_gap_seconds,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM gaps
GROUP BY user_id
""",
)
def streaming_stateful_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary keyed state via ``applyInPandasWithState`` (per-user max
    inter-event gap — inexpressible with windowed/session aggregates) ≡
    the batch LAG + group-by oracle, exact to the cent."""
    from dbt_spark_models_spark.streaming import stream_user_gap_stats

    return stream_user_gap_stats(spark, sf_dir)


@query(
    "streaming_stream_static_join",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
""",
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (stream fact ⋈ batch dim) ≡ the batch
    join + group-by."""
    from dbt_spark_models_spark.streaming import stream_static_enriched_counts

    return stream_static_enriched_counts(spark, sf_dir)


@query(
    "streaming_stream_stream_join",
    oracle="""
SELECT e.user_id, e.event_id AS err_id, c.event_id AS click_id,
       e.ts AS err_ts, c.ts AS click_ts
FROM events e
JOIN events c
  ON e.user_id = c.user_id
 AND e.event_type = 'error' AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL 30 MINUTE AND c.ts <= e.ts
""",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream watermarked interval join (error events ⋈ same-user
    clicks in the preceding 30 min, BOTH sides unbounded) ≡ the batch
    self-interval-join — the join shape where the engine must buffer both
    sides in bounded state and the reference's nightly batch has no
    continuous equivalent."""
    from dbt_spark_models_spark.streaming import stream_stream_error_click_join

    return stream_stream_error_click_join(spark, sf_dir)


@query(
    "streaming_deltalite_exactly_once",
    oracle="""
SELECT event_type,
       CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18, 6))), 2) AS DOUBLE)
           AS total_value
FROM events
GROUP BY event_type, day
""",
)
def streaming_deltalite_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → DeltaLite transactional sink with the spec's
    ``txn`` idempotence token: 4 micro-batches each commit data + their
    (appId, batchId) token atomically, and the sink DELIBERATELY replays
    every batch a second time (the retry-after-crash path) — the
    duplicates must no-op, so the final table equals the batch ground
    truth EXACTLY (the oracle is the plain batch aggregate; any double
    count or lost batch breaks the hash). Partial sums ride as
    DECIMAL(18,6), so cross-batch re-aggregation is exact on both
    engines."""
    from dbt_spark_models_spark.streaming import (
        stream_into_deltalite_exactly_once,
    )

    return stream_into_deltalite_exactly_once(spark, sf_dir)
