"""Source/sink format coverage beyond parquet (SURVEY.md §2.1).

The reference's storage formats are parquet ×171 and delta ×197 configs;
seeds are CSV; event payloads carry JSON text. Delta needs jars absent
from this container (stubbed behind import-try in plans/materialize —
parquet path is the default), so the roundtrips here exercise the other
first-class Spark connectors: JSON lines, CSV, and ORC.

Each query WRITES a deterministic slice through the connector and reads
it back through the same connector before aggregating — the oracle
computes from the original parquet, so any serialization drift
(timestamp formats, float text roundtrip, header/schema handling) fails
the gate.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

_FMT_DIR = "/tmp/spark_models_engine/formats"

_AGG_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS total_value,
       MIN(ts) AS first_ts
FROM events
WHERE user_id < 30
GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **read_opts) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("user_id") < 30
    )
    from dbt_spark_models_spark.operators import run_scope

    # per-(process, sf) workspace: concurrent graders never share a dir
    path = os.path.join(_FMT_DIR, run_scope(sf_dir), f"{fmt}_events")
    shutil.rmtree(path, ignore_errors=True)
    # default text-format timestamps truncate to ms — force µs precision
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    writer = ev.write.mode("overwrite").format(fmt)
    if fmt in ("csv", "json"):
        writer = writer.option("timestampFormat", ts_fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.schema(ev.schema).option("timestampFormat", ts_fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.load(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.min("ts").alias("first_ts"),
    )


@query("format_json_roundtrip", oracle=_AGG_ORACLE)
def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → source roundtrip with explicit schema (no
    inference in prod paths)."""
    return _roundtrip(spark, sf_dir, "json")


@query("format_csv_roundtrip", oracle=_AGG_ORACLE)
def format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → source roundtrip: header, µs-precision timestamp format,
    float text roundtrip."""
    return _roundtrip(spark, sf_dir, "csv")


@query("format_orc_roundtrip", oracle=_AGG_ORACLE)
def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source roundtrip (columnar alternative to parquet)."""
    return _roundtrip(spark, sf_dir, "orc")
