"""Engine-registered SQL functions (reference parity, SURVEY.md §2.11).

The reference registers one custom scalar UDF family *server-side* on its
Thrift server: ``millis_to_ts_msk(bigint) -> timestamp`` (×151 uses, e.g.
``snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot.sql:19``) and
``millis_to_ts`` (×2, ``models/spark/mongo/ad_spend_internal.sql:10``).

Spark-first: both are pure compositions of JVM built-ins — **no Python UDF**,
so they stay inside whole-stage codegen. We register them as SQL macros via
``spark.sql`` temp functions so model SQL using them runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_REGISTERED_SESSIONS: set[int] = set()


def register_engine_functions(spark: SparkSession) -> None:
    """Idempotently register engine SQL functions on the session."""
    key = id(spark)
    if key in _REGISTERED_SESSIONS:
        return

    # SQL scalar functions (Spark 3.5+: CREATE FUNCTION ... RETURN expr) —
    # epoch-millis -> UTC timestamp, pure builtins, codegen-friendly
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION millis_to_ts(ms BIGINT) "
        "RETURNS TIMESTAMP RETURN timestamp_millis(ms)"
    )
    # Moscow wall-clock variant (reference semantics: FROM_UTC_TIMESTAMP →
    # 'Europe/Moscow'; fixed UTC+3 since 2014, the tz db handles history)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION millis_to_ts_msk(ms BIGINT) "
        "RETURNS TIMESTAMP RETURN from_utc_timestamp(timestamp_millis(ms), 'Europe/Moscow')"
    )
    _REGISTERED_SESSIONS.add(key)
