"""SCD2 snapshots (SURVEY.md §3.2).

Reference semantics (54 snapshot blocks, e.g.
``snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot.sql:8-15``):

- ``strategy='timestamp'``: a source row is a new version when its
  ``updated_at`` is newer than the stored current row's.
- ``strategy='check'``: new version when any of ``check_cols`` (or all
  columns) changed.
- ``invalidate_hard_deletes=True``: current rows whose key vanished from
  the source are closed at the run timestamp.
- Output columns: source columns + ``dbt_scd_id``, ``dbt_updated_at``,
  ``dbt_valid_from``, ``dbt_valid_to`` (NULL = current).

The reference runs this as a Delta MERGE; this container has no Delta, so
the engine uses the **full-outer-join rewrite** (SURVEY.md §7 step 4
fallback): history is immutable, only the current slice joins against the
source batch, and the new state is rebuilt as
``closed_history ∪ still_current ∪ closed_now ∪ new_versions`` and swapped
in via a staging table. At 100 TB the join is an equi join on the snapshot
key (shuffle-partitioned, AQE-sized); history rows never re-shuffle because
they bypass the join entirely.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.plans.materialize import MaterializeResult, table_exists

SCD2_COLS = ("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")


def _with_scd2(df: DataFrame, key: str, updated_at_col) -> DataFrame:
    return (
        df.withColumn("dbt_updated_at", updated_at_col)
        .withColumn(
            "dbt_scd_id",
            F.md5(F.concat_ws("|", F.col(key).cast("string"),
                              F.col("dbt_updated_at").cast("string"))),
        )
        .withColumn("dbt_valid_from", F.col("dbt_updated_at"))
        .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
    )


def snapshot(
    spark: SparkSession,
    name: str,
    source_df: DataFrame,
    config: dict[str, Any],
    database: str | None = None,
    run_ts: str | None = None,
) -> MaterializeResult:
    """Apply one SCD2 snapshot batch to the target table."""
    key = config["unique_key"]
    strategy = config.get("strategy", "timestamp")
    hard_deletes = bool(config.get("invalidate_hard_deletes", False))
    ident = f"{database}.{name}" if database else name
    now = F.to_timestamp(F.lit(run_ts)) if run_ts else F.current_timestamp()

    src, data_cols = _prepare_source(source_df, key, strategy, config, now)

    if not table_exists(spark, database, name):
        src.write.mode("overwrite").format("parquet").saveAsTable(ident)
        return MaterializeResult(ident, "snapshot_created", rows=src.count())

    target = spark.table(ident)
    result = _scd2_next_state(
        target, src, data_cols, key, strategy, config, hard_deletes, now
    )

    # staging swap: can't overwrite a table that feeds the plan
    staging = f"{ident}__snapshot_staging"
    result.write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.table(staging).write.mode("overwrite").format("parquet").saveAsTable(ident)
    spark.sql(f"DROP TABLE {staging}")
    return MaterializeResult(ident, "snapshot_merged")


def snapshot_deltalite(
    spark: SparkSession,
    table_path: str,
    source_df: DataFrame,
    config: dict[str, Any],
    run_ts: str | None = None,
) -> int:
    """SCD2 snapshot against a DeltaLite table — the reference's actual
    shape (all 54 snapshot blocks target delta,
    ``snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot.sql:8-15``).
    Same state transition as ``snapshot()``, but the swap is ONE atomic
    log commit instead of a staging-table double-write: the new state's
    files are written beside the old ones (still invisible), then the
    overwrite commit removes the old set and adds the new — readers see
    the pre- or post-snapshot table, never a partial swap, and a crash
    mid-write leaves the old state intact with only vacuum-able garbage.
    Returns the committed version (so time travel = snapshot history)."""
    from dbt_spark_models_spark.sources import deltalite

    key = config["unique_key"]
    strategy = config.get("strategy", "timestamp")
    hard_deletes = bool(config.get("invalidate_hard_deletes", False))
    now = F.to_timestamp(F.lit(run_ts)) if run_ts else F.current_timestamp()

    src, data_cols = _prepare_source(source_df, key, strategy, config, now)
    if deltalite.latest_version(table_path) is None:
        return deltalite.write(spark, src, table_path, "overwrite")
    target = deltalite.read(spark, table_path)
    result = _scd2_next_state(
        target, src, data_cols, key, strategy, config, hard_deletes, now
    )
    return deltalite.write(spark, result, table_path, "overwrite")


def _prepare_source(
    source_df: DataFrame, key: str, strategy: str, config: dict[str, Any], now
) -> tuple[DataFrame, list[str]]:
    """Dedupe the input batch and stamp the SCD2 columns. Returns
    (prepared source, data column names)."""
    if strategy == "timestamp":
        updated_at = F.col(config["updated_at"]).cast("timestamp")
    else:
        updated_at = now

    # Duplicate-key input batches (SURVEY §7 "what's hard"): dbt-spark's
    # MERGE fails or silently multiplies current rows. The engine instead
    # keeps ONE row per key deterministically — latest updated_at, ties
    # broken by a content hash — unless the caller opts out.
    if bool(config.get("dedupe_source", True)):
        from pyspark.sql import Window

        # Null-sensitive row encoding: concat_ws silently DROPS null fields,
        # so (a, NULL, b) and (a, b, NULL) would hash identically and the
        # tie-break would become nondeterministic. Encode NULL as a sentinel
        # no real cast-to-string value contains.
        tie = F.md5(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
                    for c in source_df.columns
                ],
            )
        )
        w_dedupe = Window.partitionBy(key).orderBy(
            updated_at.desc_nulls_last(), tie
        )
        source_df = (
            source_df.withColumn("__snap_rn", F.row_number().over(w_dedupe))
            .filter(F.col("__snap_rn") == 1)
            .drop("__snap_rn")
        )
    return _with_scd2(source_df, key, updated_at), list(source_df.columns)


def _scd2_next_state(
    target: DataFrame,
    src: DataFrame,
    data_cols: list[str],
    key: str,
    strategy: str,
    config: dict[str, Any],
    hard_deletes: bool,
    now,
) -> DataFrame:
    """Pure SCD2 state transition: (previous table state, prepared source
    batch) → next table state. Shared by the catalog-table snapshot (above,
    staging-swap write) and the DeltaLite snapshot (atomic-commit write)."""
    closed_history = target.filter(F.col("dbt_valid_to").isNotNull())
    current = target.filter(F.col("dbt_valid_to").isNull())

    cur = current.alias("cur")
    new = src.alias("new")
    joined = cur.join(new, F.col(f"cur.{key}") == F.col(f"new.{key}"), "full_outer")

    if strategy == "timestamp":
        is_newer = F.col("new.dbt_updated_at") > F.col("cur.dbt_updated_at")
    else:
        check_cols = config.get("check_cols", "all")
        if check_cols == "all":
            check_cols = [c for c in data_cols if c != key]
        is_newer = F.lit(False)
        for c in check_cols:
            is_newer = is_newer | ~(
                F.col(f"new.{c}").eqNullSafe(F.col(f"cur.{c}"))
            )

    matched = F.col(f"cur.{key}").isNotNull() & F.col(f"new.{key}").isNotNull()
    only_cur = F.col(f"new.{key}").isNull() & F.col(f"cur.{key}").isNotNull()
    only_new = F.col(f"cur.{key}").isNull() & F.col(f"new.{key}").isNotNull()

    def cur_cols() -> list:
        return [F.col(f"cur.{c}").alias(c) for c in data_cols + list(SCD2_COLS)]

    def new_cols() -> list:
        return [F.col(f"new.{c}").alias(c) for c in data_cols + list(SCD2_COLS)]

    # 1. unchanged current rows (matched, not newer) stay open
    still_current = joined.filter(matched & ~is_newer).select(*cur_cols())
    # 2. matched + newer: close the old row at the new version's valid_from …
    closed_now = (
        joined.filter(matched & is_newer)
        .select(
            *[F.col(f"cur.{c}").alias(c) for c in data_cols],
            F.col("cur.dbt_scd_id").alias("dbt_scd_id"),
            F.col("cur.dbt_updated_at").alias("dbt_updated_at"),
            F.col("cur.dbt_valid_from").alias("dbt_valid_from"),
            F.col("new.dbt_valid_from").alias("dbt_valid_to"),
        )
    )
    # … and open the new version
    new_versions = joined.filter(matched & is_newer).select(*new_cols())
    # 3. brand-new keys
    inserts = joined.filter(only_new).select(*new_cols())
    # 4. hard deletes: close at run timestamp (or keep open if disabled)
    gone = joined.filter(only_cur).select(*cur_cols())
    if hard_deletes:
        gone = gone.withColumn("dbt_valid_to", now)

    return (
        closed_history.select(*[c for c in data_cols + list(SCD2_COLS)])
        .unionByName(still_current)
        .unionByName(closed_now)
        .unionByName(new_versions)
        .unionByName(inserts)
        .unionByName(gone)
    )
