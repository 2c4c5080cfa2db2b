"""examples/campaign_funnels — replica of the reference's largest model
(onfy_source_campaign_funnels.sql, 1,407 lines): rolling-window
insert_overwrite, idle-gap sessionization, MIN_BY session dedup, interval
attribution chain, flat UNION of funnel variants."""

from __future__ import annotations

import os

from tests.conftest import SF_DIR

PROJECT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "campaign_funnels",
)


def _runner(spark, db, run_date):
    from dbt_spark_models_spark.plans import Project, Runner

    return Runner(
        spark=spark,
        project=Project.load(PROJECT_DIR),
        database=db,
        target_name="dev",
        vars={"sf_dir": SF_DIR, "run_date": run_date},
    )


def _assert_ok(results):
    bad = [r for r in results if r.status != "success"]
    assert not bad, bad


def test_rolling_window_incremental(spark):
    """Run 1 (full @ 01-22) materializes window [01-08, 01-21]; run 2
    (incremental @ 01-30) overwrites only its own window's partitions
    [01-16, 01-29] — history before the window survives untouched, the
    reference's 120-day rolling insert_overwrite shape."""
    from pyspark.sql import functions as F

    db = "t_campaign_funnels"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db}")
    r1 = _runner(spark, db, "2024-01-22")
    _assert_ok(r1.seed() + r1.run() + r1.test())
    t = spark.table(f"{db}.campaign_funnels")
    assert t.agg(F.min("event_dt")).head()[0].isoformat() == "2024-01-08"
    assert t.agg(F.max("event_dt")).head()[0].isoformat() == "2024-01-21"
    old_slice = [
        tuple(r)
        for r in t.where("event_dt < DATE '2024-01-16'").collect()
    ]

    r2 = _runner(spark, db, "2024-01-30")
    res2 = r2.run()
    _assert_ok(res2)
    actions = {r.node: r.action for r in res2}
    assert actions["campaign_funnels"] == "overwritten_partitions"
    t2 = spark.table(f"{db}.campaign_funnels")
    assert t2.agg(F.max("event_dt")).head()[0].isoformat() == "2024-01-29"
    # pre-window partitions are byte-for-byte the run-1 rows
    new_old_slice = [
        tuple(r)
        for r in t2.where("event_dt < DATE '2024-01-16'").collect()
    ]
    assert sorted(map(str, new_old_slice)) == sorted(map(str, old_slice))


def test_session_dedup_and_chain_integrity(spark):
    """One row per session (event ids unique per funnel position), and
    every attributed chain is ordered preview <= opening/adding."""
    from dbt_spark_models_spark.operators.campaign_funnels_gate import _build

    db = _build(spark, SF_DIR)
    t = spark.table(f"{db}.campaign_funnels")
    previews = t.select("preview_event_id").distinct().count()
    # each preview appears exactly once per source slice
    assert t.count() == t.select("source", "preview_event_id").distinct().count()
    assert previews > 0
    # funnel is monotone: openings ≤ previews, orders ≤ addings
    agg = t.groupBy().agg(
        {"opening_event_id": "count", "adding_event_id": "count", "order_id": "count"}
    ).head()
    n_open, n_add, n_ord = (
        agg["count(opening_event_id)"],
        agg["count(adding_event_id)"],
        agg["count(order_id)"],
    )
    assert n_ord <= n_add
    assert n_open <= t.count()
