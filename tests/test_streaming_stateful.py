"""Stateful streaming (applyInPandasWithState) + skew-salting technique
tests — capabilities demonstrated in test form because their outputs are
either stateful-timing-dependent (streaming state) or physical-only
(salting changes the plan, not the result)."""

from __future__ import annotations

import pandas as pd
import pytest


def test_apply_in_pandas_with_state_running_counts(spark, sf_dir):
    """Custom stateful streaming operator: per-event-type running totals
    kept in GroupState across micro-batches (the applyInPandasWithState
    surface from SURVEY's streaming headroom)."""
    import tempfile, os, uuid

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    from dbt_spark_models_spark.sources.testdata import table_path

    path = table_path(sf_dir, "events")
    batch = spark.read.parquet(path)
    stream_dir = tempfile.mkdtemp(prefix="state-src-")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    if dict(batch.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    agg = (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    name = f"state_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per type must equal the batch aggregate
    got = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in spark.table(name).collect()
    }
    from dbt_spark_models_spark.sources.testdata import load_tables

    want = {
        r["event_type"]: (r["n"], r["v"])
        for r in load_tables(spark, sf_dir, ("events",))["events"]
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .collect()
    }
    assert got == want


def test_user_gap_state_carries_across_micro_batches(spark, tmp_path):
    """The per-user gap tracker must remember last_ts ACROSS micro-batches:
    with maxFilesPerTrigger=1 and a gap that spans the file boundary, the
    final emission only sees that gap if GroupState carried the previous
    batch's last timestamp."""
    import os

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    t0 = 1_700_000_000  # epoch seconds
    batch1 = [(1, t0, 1.0), (1, t0 + 10, 2.0), (2, t0, 5.0)]
    batch2 = [(1, t0 + 100, 3.0), (2, t0 + 7, 1.5)]
    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "gap-src")
    os.makedirs(src)
    import datetime as dt

    for i, rows in enumerate((batch1, batch2)):
        df = spark.createDataFrame(
            [(u, dt.datetime.utcfromtimestamp(ts), v) for u, ts, v in rows],
            schema,
        )
        df.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))

    from dbt_spark_models_spark.streaming.pipelines import _run_to_memory

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_gap_seconds", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ts_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("max_gap_us", T.LongType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        last_ts_us, n, max_gap_us = (
            state.get if state.exists else (None, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for t in pdf["ts"].astype("datetime64[us]").astype("int64"):
                if last_ts_us is not None:
                    max_gap_us = max(max_gap_us, int(t) - last_ts_us)
                last_ts_us = int(t)
            n += len(pdf)
        state.update((last_ts_us, n, max_gap_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_gap_seconds": [max_gap_us // 1_000_000],
            }
        )

    stats = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    rows = _run_to_memory(stats, "append").collect()
    # multiple micro-batches -> multiple emissions; final = max n_events
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["max_gap_seconds"])
    # user 1: gaps 10s then 90s ACROSS the file boundary; user 2: 7s across
    assert final == {1: (3, 90), 2: (2, 7)}
    # and the per-batch emission count proves >1 micro-batch actually ran
    assert len(rows) > len(final)


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Skew mitigation by salting: explode the small side × salt, add a
    deterministic salt on the big side, join on (key, salt) — result must
    equal the plain join. (At 100 TB this spreads a hot key over N tasks;
    AQE skew-join does it adaptively, this is the manual form.)"""
    from pyspark.sql import functions as F

    from dbt_spark_models_spark.sources.testdata import load_tables

    n_salt = 8
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    plain = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    salted_orders = t["orders"].withColumn(
        "salt", (F.col("o_orderkey") % n_salt).cast("int")
    )
    salted_cust = t["customer"].withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    salted = (
        salted_orders.join(
            salted_cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (salted_orders.salt == salted_cust.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_stream_into_partitioned_table_idempotent(spark, sf_dir):
    """foreachBatch insert-overwrite sink: streaming ingest lands in a
    day-partitioned table equal to the batch daily aggregate, and
    re-running the stream (a full replay) leaves the table unchanged —
    idempotent partition overwrite, not duplicate appends."""
    from pyspark.sql import functions as F

    from dbt_spark_models_spark.sources.testdata import read_parquet_normalized, table_path
    from dbt_spark_models_spark.streaming import stream_into_partitioned_table

    tbl = "stream_bridge_daily"
    out1 = stream_into_partitioned_table(spark, sf_dir, tbl).collect()
    expected = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_value"])
        for r in (
            read_parquet_normalized(spark, table_path(sf_dir, "events"))
            .withColumn("day", F.col("ts").cast("date"))
            .groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        )
    }
    got1 = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_value"])
        for r in out1
    }
    assert got1 == expected
    # replay: same data streamed again must overwrite, not duplicate
    out2 = stream_into_partitioned_table(spark, sf_dir, tbl).collect()
    got2 = {
        (r["event_type"], r["day"]): (r["n_events"], r["total_value"])
        for r in out2
    }
    assert got2 == expected
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_state_recovers_across_query_restart(spark, tmp_path):
    """Stop the query entirely, then start a NEW query on the SAME
    checkpoint: the state store must reload user 1's last_ts from the
    checkpoint (the restarted source skips already-committed files, so
    the cross-restart 90 s gap is only visible if recovery worked). This
    is the production contract: executors die, queries redeploy, state
    persists."""
    import datetime as dt
    import os

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    t0 = 1_700_000_000
    schema = "user_id long, ts timestamp, value double"
    src = str(tmp_path / "restart-src")
    out = str(tmp_path / "restart-out")
    ckpt = str(tmp_path / "restart-ckpt")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(
            [(u, dt.datetime.utcfromtimestamp(ts), v) for u, ts, v in rows],
            schema,
        ).coalesce(1).write.parquet(os.path.join(src, name))

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_gap_seconds", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ts_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("max_gap_us", T.LongType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        last_ts_us, n, max_gap_us = state.get if state.exists else (None, 0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for t in pdf["ts"].astype("datetime64[us]").astype("int64"):
                if last_ts_us is not None:
                    max_gap_us = max(max_gap_us, int(t) - last_ts_us)
                last_ts_us = int(t)
            n += len(pdf)
        state.update((last_ts_us, n, max_gap_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_gap_seconds": [max_gap_us // 1_000_000],
            }
        )

    def run_once():
        stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
        stats = stream.groupBy("user_id").applyInPandasWithState(
            fold, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
        q = (
            stats.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    write_batch("b0", [(1, t0, 1.0), (1, t0 + 10, 2.0)])
    run_once()  # first deployment: sees only b0
    write_batch("b1", [(1, t0 + 100, 3.0)])
    run_once()  # restarted deployment: same checkpoint, sees only b1

    rows = spark.read.parquet(out).collect()
    final = max(
        (r for r in rows if r["user_id"] == 1), key=lambda r: r["n_events"]
    )
    # 90 s gap spans the RESTART boundary: only recovered state knows t0+10
    assert final["n_events"] == 3
    assert final["max_gap_seconds"] == 90
