"""Correctness gates for DeltaLite as the framework's delta table format
(VERDICT r8 #1): the ``examples/delta_mart`` project — every materialized
node ``file_format='delta'`` — built end-to-end through the Runner
(seed-less: sources → staging view → incremental dynamic-partition-
overwrite mart → MERGE rollup → downstream table → SCD2 snapshot), then
verified against DuckDB oracles that recompute the final states from
scratch.

What these prove beyond the existing engine gates: the jar-free delta
routing in ``plans/materialize.py`` (no silent parquet fallback), ref
resolution through committed-snapshot temp views, DeltaLite dynamic
partition overwrite (one atomic commit replacing only the increment's
partitions), MERGE as the incremental upsert, snapshot_deltalite through
the Runner, and time travel back to the first run's commit.

Reference parity: the reference declares ``file_format='delta'`` on 197
model/snapshot configs (e.g. ``snapshots/spark/b2b_mart/
scd2_merchant_orders_v2_snapshot.sql:8-15``); a ported project now gets
delta semantics — ACID commits, upserts, history — without Delta jars.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from dbt_spark_models_spark.operators import query, run_scope

_EXAMPLE_PROJECT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "examples",
    "delta_mart",
)

_CUTOFF1 = "1996-01-01"  # first build: orders strictly before this
_CUTOFF2 = "1995-07-01"  # incremental: months >= this are REPLACED

# (session id, sf_dir) -> db of an already-built delta mart
_CACHE: dict[tuple[int, str], str] = {}


def _shared_delta_mart(spark: SparkSession, sf_dir: str) -> str:
    from dbt_spark_models_spark.plans import deltalite_tables as dlt

    db = "delta_mart_" + run_scope(sf_dir)
    key = (id(spark), sf_dir)
    view = dlt.view_name(db, "customer_rollup")
    if _CACHE.get(key) != db or not spark.catalog.tableExists(view):
        _build(spark, sf_dir, db)
        _CACHE[key] = db
    return db


def _build(spark: SparkSession, sf_dir: str, db: str) -> None:
    """Full build at _CUTOFF1, then an incremental run at _CUTOFF2 that
    OVERLAPS the first build — months in [_CUTOFF2, _CUTOFF1) already
    exist and are replaced by the dynamic-partition-overwrite commit,
    months >= _CUTOFF1 are added, and the MERGE rollup upserts every
    customer active after _CUTOFF2. Then one snapshot batch + checks."""
    from dbt_spark_models_spark.plans import Project, Runner

    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_delta_mart/{db}", ignore_errors=True)
    spark.sql(
        f"CREATE DATABASE {db} LOCATION '/tmp/spark_models_delta_mart/{db}'"
    )
    project = Project.load(_EXAMPLE_PROJECT)
    r1 = Runner(
        spark=spark,
        project=project,
        database=db,
        vars={"sf_dir": sf_dir, "cutoff_date": _CUTOFF1},
    )
    run1 = r1.run()
    if any(r.status != "success" for r in run1):
        raise RuntimeError(f"first delta run failed: {run1}")
    r2 = Runner(
        spark=spark,
        project=project,
        database=db,
        vars={"sf_dir": sf_dir, "cutoff_date": _CUTOFF2},
    )
    run2 = r2.run()
    if any(r.status != "success" for r in run2):
        raise RuntimeError(f"incremental delta run failed: {run2}")
    snaps = r2.snapshot(run_ts="2024-02-01 00:00:00")
    if any(r.status != "success" for r in snaps):
        raise RuntimeError(f"delta snapshot failed: {snaps}")
    tests = r2.test()
    if any(t.status != "success" for t in tests):
        raise RuntimeError(f"delta checks failed: {tests}")


_STG = """
SELECT o_custkey, o_orderstatus, o_orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
"""


@query(
    "engine_deltalite_table_format",
    oracle=f"""
WITH stg AS ({_STG}),
b1 AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents,
           MAX(o_orderdate) AS last_order
    FROM stg WHERE o_orderdate < DATE '{_CUTOFF1}' GROUP BY o_custkey
),
src AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents,
           MAX(o_orderdate) AS last_order
    FROM stg GROUP BY o_custkey
    HAVING MAX(o_orderdate) >= DATE '{_CUTOFF2}'
)
SELECT o_custkey, n_orders, total_cents, last_order FROM src
UNION ALL
SELECT o_custkey, n_orders, total_cents, last_order FROM b1
WHERE o_custkey NOT IN (SELECT o_custkey FROM src)
""",
)
def engine_deltalite_table_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-build state of the MERGE-upserted rollup on a DeltaLite table
    (``examples/delta_mart/models/customer_rollup.sql``): batch 1 below
    _CUTOFF1, then a MERGE of every customer active after _CUTOFF2 —
    matched keys replaced wholesale, new keys inserted, untouched keys
    preserved. The oracle reconstructs the expected post-merge state from
    scratch; agreement proves the delta routing, the MERGE commit, and
    ref resolution through the committed snapshot."""
    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db = _shared_delta_mart(spark, sf_dir)
    return dlt.read(spark, db, "customer_rollup").select(
        "o_custkey", "n_orders", "total_cents", "last_order"
    )


@query(
    "engine_deltalite_dynamic_overwrite",
    oracle=f"""
WITH stg AS ({_STG}),
per AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           SUM(price_cents) AS total_cents
    FROM stg GROUP BY 1, 2
)
SELECT order_month,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(n_customers) AS BIGINT) AS n_customers_by_status,
       CAST(SUM(total_cents) AS BIGINT) AS total_cents
FROM per
GROUP BY order_month
""",
)
def engine_deltalite_dynamic_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Final state of the dynamic-partition-overwrite mart, re-aggregated
    to month grain: months < _CUTOFF2 survive from the first commit,
    months in [_CUTOFF2, _CUTOFF1) were REPLACED (their first-run files
    removed in the same atomic commit that added the recomputed ones),
    months >= _CUTOFF1 are new. Equality with a from-scratch full rebuild
    proves the replacement removed exactly the overlapped partitions —
    one lost or doubled file and the counts diverge."""
    from pyspark.sql import functions as F

    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db = _shared_delta_mart(spark, sf_dir)
    monthly = dlt.read(spark, db, "orders_monthly")
    # n_customers is per (month,status); distinct customers per month is
    # not derivable from the mart — recompute counts that ARE derivable
    return monthly.groupBy("order_month").agg(
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.sum("n_customers").cast("bigint").alias("n_customers_by_status"),
        F.sum("total_cents").cast("bigint").alias("total_cents"),
    ).select("order_month", "n_orders", "n_customers_by_status", "total_cents")


@query(
    "engine_deltalite_time_travel",
    oracle=f"""
WITH stg AS ({_STG})
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents
FROM stg
WHERE o_orderdate < DATE '{_CUTOFF1}'
GROUP BY 1, 2
""",
)
def engine_deltalite_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel to version 0 of the mart — the FIRST run's create
    commit, before the property commit and the dynamic-partition
    overwrite. The oracle recomputes batch 1 from scratch: agreement
    proves the overwrite commit's removes did not destroy history and
    replay at a pinned version reconstructs the exact pre-overwrite
    snapshot."""
    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db = _shared_delta_mart(spark, sf_dir)
    return dlt.read(spark, db, "orders_monthly", version=0).select(
        "order_month", "o_orderstatus", "n_orders", "total_cents"
    )


@query(
    "engine_deltalite_cdf_overwrite",
    oracle=f"""
WITH stg AS ({_STG}),
full_m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           o_orderstatus, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents
    FROM stg GROUP BY 1, 2
),
b1_m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           o_orderstatus, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents
    FROM stg WHERE o_orderdate < DATE '{_CUTOFF1}' GROUP BY 1, 2
)
SELECT order_month, o_orderstatus, n_orders, n_customers, total_cents,
       'insert' AS change_type
FROM full_m WHERE order_month >= DATE '{_CUTOFF2}'
UNION ALL
SELECT order_month, o_orderstatus, n_orders, n_customers, total_cents,
       'delete' AS change_type
FROM b1_m WHERE order_month >= DATE '{_CUTOFF2}'
""",
)
def engine_deltalite_cdf_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed of the dynamic-partition-overwrite commit alone:
    exactly one ``delete`` per first-run row in a replaced month and one
    ``insert`` per recomputed row — months before _CUTOFF2 must not
    appear at all (their files were untouched, so they generate no
    changes). This pins the CDF contract of the new write mode: an
    incremental consumer (the reference's downstream daily marts) sees
    precisely the replaced slice, never a full-table churn."""
    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources import deltalite
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db = _shared_delta_mart(spark, sf_dir)
    path = dlt.table_path(spark, db, "orders_monthly")
    ver = next(
        h["version"]
        for h in deltalite.describe_history(path)
        if h["operation"] == "OVERWRITE_PARTITIONS"
    )
    feed = deltalite.read_changes(spark, path, ver, ver)
    from pyspark.sql import functions as F

    return feed.select(
        "order_month",
        "o_orderstatus",
        "n_orders",
        "n_customers",
        "total_cents",
        F.col("_change_type").alias("change_type"),
    )


@query(
    "engine_deltalite_snapshot_tier",
    oracle=f"""
WITH stg AS ({_STG}),
b1 AS (
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM stg WHERE o_orderdate < DATE '{_CUTOFF1}' GROUP BY o_custkey
),
src AS (
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM stg GROUP BY o_custkey
    HAVING MAX(o_orderdate) >= DATE '{_CUTOFF2}'
),
rollup AS (
    SELECT * FROM src
    UNION ALL
    SELECT * FROM b1 WHERE o_custkey NOT IN (SELECT o_custkey FROM src)
)
SELECT o_custkey,
       CASE WHEN n_orders >= 20 THEN 'gold'
            WHEN n_orders >= 10 THEN 'silver'
            ELSE 'bronze' END AS tier,
       n_orders
FROM rollup
""",
)
def engine_deltalite_snapshot_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current slice of the SCD2 snapshot the Runner routed through
    ``snapshot_deltalite`` (check strategy on a delta target — the
    reference's actual snapshot shape ×54). One batch → every row open
    (dbt_valid_to NULL); values must equal a from-scratch recompute of
    the tier assignment over the post-merge rollup."""
    from pyspark.sql import functions as F

    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db = _shared_delta_mart(spark, sf_dir)
    snap = dlt.read(spark, db, "customer_tier_snapshot")
    return snap.filter(F.col("dbt_valid_to").isNull()).select(
        "o_custkey", "tier", "n_orders"
    )


# --- in-process DAG-parallel execution (VERDICT r10 #1) -----------------

_PAR_CACHE: dict[tuple[int, str], str] = {}


def _shared_parallel_mart(spark: SparkSession, sf_dir: str) -> str:
    """The same two-run delta_mart build as _shared_delta_mart, executed
    by the threads=4 ready-set scheduler (plans/runner.py _run_parallel):
    the stg → {customer_rollup, orders_monthly} → status_summary diamond
    runs its independent middle models concurrently; dependency edges,
    failure-skip semantics and per-model inputs are identical to serial,
    so the final state must be bit-equal."""
    from dbt_spark_models_spark.plans import Project, Runner
    from dbt_spark_models_spark.plans import deltalite_tables as dlt

    db = "delta_mart_par_" + run_scope(sf_dir)
    key = (id(spark), sf_dir)
    view = dlt.view_name(db, "customer_rollup")
    if _PAR_CACHE.get(key) == db and spark.catalog.tableExists(view):
        return db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_delta_mart/{db}", ignore_errors=True)
    spark.sql(
        f"CREATE DATABASE {db} LOCATION '/tmp/spark_models_delta_mart/{db}'"
    )
    project = Project.load(_EXAMPLE_PROJECT)
    for cutoff in (_CUTOFF1, _CUTOFF2):
        r = Runner(
            spark=spark,
            project=project,
            database=db,
            vars={"sf_dir": sf_dir, "cutoff_date": cutoff},
        )
        res = r.run(threads=4)
        if any(x.status != "success" for x in res):
            raise RuntimeError(f"parallel delta run (cutoff={cutoff}) failed: {res}")
    checks = r.test()
    if any(t.status != "success" for t in checks):
        raise RuntimeError(f"parallel delta checks failed: {checks}")
    _PAR_CACHE[key] = db
    return db


@query(
    "engine_parallel_dag_build",
    oracle=f"""
WITH stg AS ({_STG}),
b1 AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents,
           MAX(o_orderdate) AS last_order
    FROM stg WHERE o_orderdate < DATE '{_CUTOFF1}' GROUP BY o_custkey
),
src AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents,
           MAX(o_orderdate) AS last_order
    FROM stg GROUP BY o_custkey
    HAVING MAX(o_orderdate) >= DATE '{_CUTOFF2}'
)
SELECT o_custkey, n_orders, total_cents, last_order FROM src
UNION ALL
SELECT o_custkey, n_orders, total_cents, last_order FROM b1
WHERE o_custkey NOT IN (SELECT o_custkey FROM src)
""",
)
def engine_parallel_dag_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta_mart built by the in-process DAG-parallel scheduler
    (``Runner.run(threads=4)``, VERDICT r10 #1 — the in-engine twin of
    the reference's Airflow task fan-out, ``deploy.sh:29-35``): final
    MERGE-rollup state must hash-match the from-scratch DuckDB oracle,
    AND every materialized table must be row-identical to the serial
    build of the same project (checked here; a divergence raises)."""
    from dbt_spark_models_spark.plans import deltalite_tables as dlt
    from dbt_spark_models_spark.sources.testdata import register_views

    register_views(spark, sf_dir, ("orders",))
    db_par = _shared_parallel_mart(spark, sf_dir)
    db_ser = _shared_delta_mart(spark, sf_dir)
    for t in ("customer_rollup", "orders_monthly", "status_summary"):
        a = dlt.read(spark, db_par, t)
        b = dlt.read(spark, db_ser, t)
        if a.exceptAll(b).count() or b.exceptAll(a).count():
            raise RuntimeError(
                f"threads=4 build diverged from the serial build on {t}"
            )
    return dlt.read(spark, db_par, "customer_rollup").select(
        "o_custkey", "n_orders", "total_cents", "last_order"
    )
