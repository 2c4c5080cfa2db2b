"""Structured Streaming pipelines.

The reference has NO true streaming (SURVEY.md §2.10): events land in
daily-partitioned tables and late data is handled by re-overwriting a
lookback window in batch. These pipelines are the optional-headroom
equivalents: the same event semantics expressed with readStream +
watermarks, so the engine can ingest continuously instead of re-running
nightly batch.

Local smoke strategy (per the PySpark guide): drive a finite parquet
directory through the streaming query with ``processAllAvailable()`` into
a memory sink, then read the sink table — deterministic, synchronous, and
comparable to a batch oracle.

Scale notes: tumbling-window and session-window aggregations keep state
per (window, key) in the state store; watermarks bound that state. The
memory sink is test-only — production uses parquet/kafka sinks with
checkpointing.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.sources.testdata import read_parquet_normalized, table_path


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the batch-derived schema.

    The ns-timestamp conversion is applied on the stream exactly as in
    batch (streams are just unbounded DataFrames — same expressions work).
    """
    import os

    path = table_path(sf_dir, "events")
    batch = spark.read.parquet(path)
    # file streams require a directory; stage the single file via symlink
    stream_dir = path
    if os.path.isfile(path):
        stream_dir = tempfile.mkdtemp(prefix="stream-src-")
        os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    ts_type = dict(batch.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    """Drive the streaming query to completion into a memory sink.

    Stateful streaming cost is dominated by state-STORE count, not state
    SIZE: every shuffle partition gets its own state store instance
    (checkpoint dir, provider, commit per micro-batch), and the partition
    count is pinned at checkpoint creation. The session default (32, sized
    for batch shuffles) pays 32 store setups for KB-scale test state —
    measured 4× slower than 8 stores on the local gates. So streaming
    queries get their own partition knob (``SPARK_GRAFT_STREAM_PARTITIONS``,
    default 8 locally; production sizes it to the cluster once, at first
    checkpoint), set for the stream's lifetime and restored after.
    """
    import os

    spark = agg.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"),
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return agg.sparkSession.table(name)


def stream_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window × event_type counts with a 1-hour watermark.
    Complete mode → every window emitted, equal to the batch group-by."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").cast("date").alias("day"),
        "event_type",
        "n_events",
        "total_value",
    )


def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) per user — the streaming twin of
    the batch gaps-and-islands sessionization (SURVEY.md §2.5)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the stream unioned with itself (every
    event arrives twice, as with at-least-once sources like Kafka replays)
    is collapsed back to one row per event_id by
    ``dropDuplicatesWithinWatermark`` — the state-store-backed dedup whose
    state is bounded by the watermark instead of growing forever.

    Scale notes: dedup state is keyed by event_id only within the watermark
    horizon; at 100 TB/day the state store holds one horizon's worth of
    keys per partition (RocksDB state store in production), not the full
    history.
    """
    ev = _events_stream(spark, sf_dir)
    doubled = ev.unionAll(ev)
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", F.round("value", 2).alias("val"))
    )
    return _run_to_memory(deduped, "append")


def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-day windows advancing 1 day (each event lands in exactly
    two overlapping windows) × event_type, with a 1-day watermark.

    The overlap is what tumbling windows can't express: a rolling 48-hour
    health metric updated daily. Complete mode → every window emitted,
    equal to the batch per-window expansion (each row duplicated into its
    two containing windows, then grouped).

    Scale notes: state per (window, event_type) — the watermark closes a
    window 1 day after its end, so live state is ~3 window generations per
    key regardless of stream length.
    """
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").cast("date").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def stream_stream_error_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each error event joined to the click
    events of the same user in the preceding 30 minutes ("which
    interaction preceded this failure"), both sides watermarked.

    This is the one join shape only Structured Streaming can run
    continuously: BOTH inputs are unbounded, so the engine must buffer
    each side in the state store just long enough for the other side's
    matching rows to arrive. The time-range predicate plus the two
    watermarks is what makes that buffer finite — Spark derives a state
    eviction bound from (watermark, join interval) and drops buffered
    rows once they can no longer match.

    Scale notes: state per side is bounded by (watermark + interval)
    worth of events, partitioned by user_id (the equi-key), regardless of
    total stream length; append mode emits each pair exactly once when
    the watermark passes the join window.
    """
    errors = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    pairs = errors.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "inner",
    ).select("user_id", "err_id", "click_id", "err_ts", "click_ts")
    return _run_to_memory(pairs, "append")


def stream_static_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the (batch)
    customer dimension, then aggregated by market segment — the canonical
    continuous-ingest enrichment (stream fact ⋈ slowly-changing dim).

    Scale notes: Spark broadcasts the static side per micro-batch (or
    re-reads it, picking up dim updates between batches); the stream side
    never shuffles for the join — state exists only for the downstream
    windowless aggregate, keyed by segment (bounded cardinality).
    """
    ev = _events_stream(spark, sf_dir)
    cust = read_parquet_normalized(spark, table_path(sf_dir, "customer")).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(cust, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return _run_to_memory(agg, "complete")


def stream_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user inter-event-gap statistics (event count, max gap between
    consecutive events in seconds, rounded total value).

    Max-inter-event-gap is the canonical "needs arbitrary keyed state"
    metric: windowed/session aggregates can't carry "timestamp of the
    previous event" across micro-batches, so the operator keeps
    (last_ts, n, max_gap, total) per user in the state store and folds each
    Arrow batch into it with pandas.

    Scale notes: state is four scalars per user (bounded by key
    cardinality, not stream length); each micro-batch group arrives as
    Arrow-batched pandas (sorted in-func — Spark guarantees grouping, not
    order). Emission per batch keeps append-mode semantics; the driver runs
    the finite source as a single micro-batch (one file), so the emitted
    rows ARE the final per-user stats and hash-match the batch LAG oracle.
    Production variant: GroupStateTimeout.ProcessingTimeTimeout to emit on
    key quiescence instead of per batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("max_gap_seconds", LongType()),
            StructField("total_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ts_us", LongType()),
            StructField("n", LongType()),
            StructField("max_gap_us", LongType()),
            StructField("cents", LongType()),
        ]
    )

    def fold_gaps(key, pdf_iter, state: GroupState):
        if state.exists:
            last_ts_us, n, max_gap_us, cents = state.get
        else:
            last_ts_us, n, max_gap_us, cents = None, 0, 0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            ts_us = (
                pdf["ts"].astype("datetime64[us]").astype("int64")
            )  # epoch micros regardless of pandas datetime resolution
            for t in ts_us:
                if last_ts_us is not None:
                    gap = int(t) - last_ts_us
                    if gap > max_gap_us:
                        max_gap_us = gap
                last_ts_us = int(t)
            n += len(pdf)
            # 2-decimal doubles -> exact integer cents: associative, no
            # float summation-order drift vs the oracle
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((last_ts_us, n, max_gap_us, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "max_gap_seconds": [max_gap_us // 1_000_000],
                "total_cents": [cents],
            }
        )

    ev = _events_stream(spark, sf_dir).select("user_id", "ts", "value")
    stats = ev.groupBy("user_id").applyInPandasWithState(
        fold_gaps,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(stats, "append")


def stream_into_partitioned_table(
    spark: SparkSession, sf_dir: str, table: str
) -> DataFrame:
    """Streaming → incremental-table bridge: a ``foreachBatch`` sink where
    each micro-batch aggregates its slice and INSERT OVERWRITEs *only the
    day partitions present in that batch* (dynamic partition overwrite) —
    the continuous twin of the framework's ``insert_overwrite``
    materialization (`plans/materialize.py`). Late replays re-overwrite
    their day idempotently instead of appending duplicates.

    Scale notes: per batch, one map-side-combined aggregate and a
    partition-surgical write; table history outside the batch's days is
    never touched, exactly like the reference's nightly lookback
    overwrite (``models/spark/base/active_devices.sql:46-48``) but driven
    by arrival instead of schedule.
    """
    from dbt_spark_models_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    ev_batch = read_parquet_normalized(spark, table_path(sf_dir, "events"))
    daily = lambda df: (  # noqa: E731
        df.withColumn("day", F.col("ts").cast("date"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("event_type", "n_events", "total_value", "day")
    )
    # partitioned target, created empty with the aggregate's schema
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    daily(ev_batch).filter(F.lit(False)).write.mode("overwrite").partitionBy(
        "day"
    ).format("parquet").saveAsTable(table)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        daily(batch_df).write.mode("overwrite").insertInto(table)

    ev = _events_stream(spark, sf_dir)
    q = (
        ev.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(table)


def stream_into_deltalite_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming → ACID table sink with REAL exactly-once semantics: each
    micro-batch appends its partial aggregate through
    ``deltalite.txn_append``, which commits the data files and the
    (appId, batchId) idempotence token in ONE atomic log entry — the
    spec's ``txn`` action, i.e. how real Delta makes foreachBatch
    exactly-once. To prove it, the sink deliberately RE-APPLIES every
    micro-batch a second time (the retry-after-sink-crash path); the
    duplicates must no-op, so the final table equals the batch ground
    truth exactly.

    The source is staged as 4 files with maxFilesPerTrigger=1, forcing a
    real multi-batch run (4 commits + 4 no-op retries). Partial sums ride
    as DECIMAL(18,6) so re-aggregation across micro-batches is exact and
    engine-portable.

    Scale: per batch one map-side-combined aggregate + one metadata
    commit; the retry path costs one log replay, no data rewrite. The
    final re-aggregation reads only partial rows (n_batches × groups),
    not raw events."""
    import os

    from dbt_spark_models_spark.sources import deltalite

    ev_batch = read_parquet_normalized(spark, table_path(sf_dir, "events"))
    src_dir = tempfile.mkdtemp(prefix="stream-dl-src-")
    # 4 deterministic slices → 4 micro-batches (one file per trigger);
    # dir names avoid the key=value shape so no partition inference fires
    for i in range(4):
        ev_batch.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"slice_{i}"))
    table_dir = tempfile.mkdtemp(prefix="deltalite-stream-")

    def _partial(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("day", F.col("ts").cast("date"))
            .groupBy("event_type", "day")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum"),
            )
        )

    app_id = "deltalite_stream_gate"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        part = _partial(batch_df).localCheckpoint()  # compute once, commit twice
        deltalite.txn_append(spark, part, table_dir, app_id, batch_id)
        # simulated retry after a crash between commit and checkpoint ack:
        # the token makes the duplicate a no-op
        retried = deltalite.txn_append(spark, part, table_dir, app_id, batch_id)
        if retried is not None:
            raise AssertionError("txn token failed to deduplicate a retry")

    schema = spark.read.parquet(os.path.join(src_dir, "slice_0")).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src_dir + "/slice_*")
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        deltalite.read(spark, table_dir)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("value_sum"), 2).cast("double").alias("total_value"),
        )
    )


def stream_user_type_switches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``transformWithStateInPandas``
    (the Spark 4 arbitrary-state API that supersedes
    ``applyInPandasWithState``: named state handles, timers, TTL): per-user
    count of event-TYPE SWITCHES between consecutive events — the
    "previous event's type" must survive across micro-batches, so it lives
    in a ValueState alongside the running counters.

    CONTAINER LIMITATION: the transformWithState state-server protocol
    needs `google.protobuf`, which this container lacks — the operator is
    environment-gated like Delta (tests skip without protobuf; the
    registry keeps the applyInPandasWithState twin
    `streaming_stateful_user_gaps` as the hash-gated stateful path).

    Scale notes: state is (last_type, n, switches) per user — bounded by
    key cardinality. Ordering inside a batch is (ts, event_id) — ties on
    ts are broken deterministically so the emitted counts hash-match the
    batch LAG oracle. The driver runs the finite source as one micro-batch;
    production uses timers/TTL from the same handle for quiescence-based
    emission."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("n_switches", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_type", StringType()),
            StructField("n", LongType()),
            StructField("switches", LongType()),
        ]
    )

    class SwitchCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("switch_state", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                last_type, n, switches = self._st.get()
            else:
                last_type, n, switches = None, 0, 0
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for t in pdf["event_type"]:
                    if last_type is not None and t != last_type:
                        switches += 1
                    last_type = t
                n += len(pdf)
            self._st.update((last_type, n, switches))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_switches": [switches],
                }
            )

        def close(self) -> None:
            pass

    ev = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    stats = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SwitchCounter(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
    return _run_to_memory(stats, "append")
