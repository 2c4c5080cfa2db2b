"""CDC-driven incremental materialization through the Runner
(VERDICT r9 #4): ref_changes() resolution, watermark bookkeeping, and
the failure-replay contract. The driver-graded parity gates live in
operators/cdf_incremental_gate.py; here are the behaviors an oracle
can't see: an empty change window is a no-op, a failed consumer run
does NOT advance the watermark (the next run replays the missed
window), and misuse errors are loud.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dbt_spark_models_spark.plans import deltalite_tables as dlt
from dbt_spark_models_spark.plans.project import ModelNode, Project
from dbt_spark_models_spark.plans.runner import Runner
from dbt_spark_models_spark.sources import deltalite

_UP = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='o_orderkey', file_format='delta') }}
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) * {{ var('price_mult', 1) }}
           AS price_cents
FROM {{ source('testdata', 'orders') }}
WHERE o_orderkey % 4 <= {{ var('batch', 0) }}
"""

_DOWN = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='o_custkey', file_format='delta') }}
{% if is_incremental() %}
SELECT o.{{ var('col', 'o_custkey') }} AS o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(o.price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }} o
WHERE o.o_custkey IN (
    SELECT DISTINCT c.o_custkey FROM {{ ref_changes('orders_cdc') }} c
)
GROUP BY o.{{ var('col', 'o_custkey') }}
{% else %}
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }}
GROUP BY o_custkey
{% endif %}
"""

_WM_PROP = "dbt_spark_models.cdf.lastVersion.orders_cdc"


def _project() -> Project:
    return Project(
        root=".",
        name="cdf_test",
        sources={"testdata": {"orders": "{sf_dir}/orders.parquet"}},
        models={
            "orders_cdc": ModelNode("orders_cdc", "inline", _UP),
            "cust_rev_cdc": ModelNode("cust_rev_cdc", "inline", _DOWN),
        },
    )


def _run(spark, db, sf_dir, **vars):
    r = Runner(
        spark=spark,
        project=_project(),
        database=db,
        vars={"sf_dir": sf_dir, **vars},
    )
    return r.run()


def _watermark(spark, db) -> int | None:
    path = dlt.table_path(spark, db, "cust_rev_cdc")
    cfg = (deltalite._replay_state(path)["meta"].get("configuration")) or {}
    v = cfg.get(_WM_PROP)
    return int(v) if v is not None else None


def _expected(spark, db):
    return (
        dlt.read(spark, db, "orders_cdc")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").cast("long").alias("revenue_cents"),
        )
    )


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def db(spark):
    name = "cdf_rt"
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_cdf_rt/{name}", ignore_errors=True)
    spark.sql(
        f"CREATE DATABASE {name} LOCATION '/tmp/spark_models_cdf_rt/{name}'"
    )
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_empty_window_is_noop_and_failed_run_replays(spark, sf_dir, db):
    # run 1: full build — watermark seeded at the upstream's version
    res1 = _run(spark, db, sf_dir, batch=0)
    assert all(r.status == "success" for r in res1), res1
    up_path = dlt.table_path(spark, db, "orders_cdc")
    assert _watermark(spark, db) == deltalite.latest_version(up_path)
    assert _same(dlt.read(spark, db, "cust_rev_cdc"), _expected(spark, db))

    # run 2: nothing changed upstream-side values-wise, but the MERGE
    # commit still advances the upstream version; the downstream consumes
    # that window and stays correct
    res2 = _run(spark, db, sf_dir, batch=0)
    assert all(r.status == "success" for r in res2), res2
    wm2 = _watermark(spark, db)
    assert wm2 == deltalite.latest_version(up_path)
    assert _same(dlt.read(spark, db, "cust_rev_cdc"), _expected(spark, db))

    # run 3: upstream widens (batch=1) but the CONSUMER fails (bad column)
    # — upstream committed, downstream errored, watermark must NOT move
    res3 = _run(spark, db, sf_dir, batch=1, col="boom")
    by_node = {r.node: r.status for r in res3}
    assert by_node["orders_cdc"] == "success"
    assert by_node["cust_rev_cdc"] == "error"
    assert _watermark(spark, db) == wm2
    # downstream still shows the PRE-failure state (missing batch-1 keys)
    assert not _same(dlt.read(spark, db, "cust_rev_cdc"), _expected(spark, db))

    # run 4: recovery — the replayed window covers BOTH missed upstream
    # commits (run 3's widen and run 4's own merge); parity restored
    res4 = _run(spark, db, sf_dir, batch=1, price_mult=2)
    assert all(r.status == "success" for r in res4), res4
    assert _watermark(spark, db) == deltalite.latest_version(up_path)
    assert _same(dlt.read(spark, db, "cust_rev_cdc"), _expected(spark, db))


def test_ref_changes_requires_delta_upstream(spark, sf_dir, db):
    proj = _project()
    proj.models["orders_cdc"] = ModelNode(
        "orders_cdc",
        "inline",
        _UP.replace(", file_format='delta'", ""),
    )
    r = Runner(
        spark=spark, project=proj, database=db,
        vars={"sf_dir": sf_dir, "batch": 0},
    )
    res1 = r.run()
    assert all(x.status == "success" for x in res1), res1
    res2 = Runner(
        spark=spark, project=proj, database=db,
        vars={"sf_dir": sf_dir, "batch": 1},
    ).run()
    down = next(x for x in res2 if x.node == "cust_rev_cdc")
    assert down.status == "error"
    assert "file_format='delta'" in down.message


def test_ref_changes_without_runner_is_loud(spark):
    from dbt_spark_models_spark.plans import jinja

    proj = _project()
    node = proj.models["cust_rev_cdc"]
    jinja.parse_node(proj, node)
    assert set(node.depends_on) == {"orders_cdc"}
    with pytest.raises(ValueError, match="Runner-provided resolver"):
        jinja.compile_node(
            proj, node, lambda n: n, lambda s, t: f"{s}.{t}", {},
            is_incremental=True, this="cust_rev_cdc",
        )


def test_partition_surgical_keeps_untouched_month_files(spark, sf_dir):
    """Run 3 updated only orders from _CHANGE_FROM on, so the
    partition-surgical consumer's dynamic-overwrite commit must have
    replaced exactly those months: earlier months keep their run-2 file
    bytes (same add entries), later months are fully replaced."""
    from dbt_spark_models_spark.operators.cdf_incremental_gate import (
        _CHANGE_FROM,
        _shared_build,
    )

    state = _shared_build(spark, sf_dir)
    path = state["monthly_path"]
    at_run2 = deltalite._replay_state(path, state["monthly_run2_version"])[
        "active"
    ]
    now = deltalite._replay_state(path)["active"]

    def month(add):
        return (add.get("partitionValues") or {}).get("order_month", "")

    cut = _CHANGE_FROM[:7] + "-01"
    untouched = [p for p in now if month(now[p]) < cut]
    replaced_months = {month(now[p]) for p in now if month(now[p]) >= cut}
    assert untouched, "expected pre-window months to exist"
    assert all(p in at_run2 for p in untouched), "pre-window files rewritten"
    assert replaced_months, "expected post-window months to exist"
    assert all(
        p not in at_run2 for p in now if month(now[p]) >= cut
    ), "post-window months kept stale files"


def test_delta_applied_equals_changed_keys_state(spark, sf_dir):
    """The signed-delta consumer and the changed-keys consumer are two
    strategies over the same feed — their final states must be
    row-identical."""
    from dbt_spark_models_spark.operators.cdf_incremental_gate import (
        _shared_build,
    )

    state = _shared_build(spark, sf_dir)
    a = dlt.read(spark, state["db"], "cust_rev_cdc").select(
        "o_custkey", "n_orders", "revenue_cents"
    )
    b = dlt.read(spark, state["db"], "cust_rev_delta_applied").select(
        "o_custkey", "n_orders", "revenue_cents"
    )
    assert _same(a, b)


def test_lost_window_is_loud_and_fallback_is_opt_in(spark, sf_dir, db):
    """Retention-clean the upstream log past the consumer's watermark:
    the next incremental run must FAIL with guidance (failOnDataLoss
    semantics) — and succeed with parity once the model opts into the
    full-snapshot substitute (sound for changed-keys recompute)."""
    res1 = _run(spark, db, sf_dir, batch=0)
    assert all(r.status == "success" for r in res1), res1
    up_path = dlt.table_path(spark, db, "orders_cdc")
    # advance the upstream several commits past the watermark, then
    # retention-clean the head so the consumed window is gone
    for batch in (1, 2, 3):
        res = _run_model_only(spark, db, sf_dir, batch=batch)
        assert all(r.status == "success" for r in res), res
    # anchor checkpoint must sit at or below the retention horizon
    deltalite._write_checkpoint(
        up_path, deltalite.latest_version(up_path) - 1
    )
    dropped = deltalite.cleanup_expired_logs(up_path, retain_versions=1)
    assert dropped, "expected head commits to be cleaned"

    res_fail = _run(spark, db, sf_dir, batch=3)
    down = next(r for r in res_fail if r.node == "cust_rev_cdc")
    assert down.status == "error"
    assert "change window lost" in down.message
    assert "full_snapshot" in down.message

    proj = _project()
    proj.models["cust_rev_cdc"] = ModelNode(
        "cust_rev_cdc",
        "inline",
        _DOWN.replace(
            "unique_key='o_custkey'",
            "unique_key='o_custkey', on_cdf_data_loss='full_snapshot'",
        ),
    )
    res_ok = Runner(
        spark=spark, project=proj, database=db,
        vars={"sf_dir": sf_dir, "batch": 3},
    ).run()
    assert all(r.status == "success" for r in res_ok), res_ok
    assert _same(dlt.read(spark, db, "cust_rev_cdc"), _expected(spark, db))
    # tracking resumes: watermark re-seeded at the consumed version
    assert _watermark(spark, db) == deltalite.latest_version(up_path)


def _run_model_only(spark, db, sf_dir, **vars):
    """Run only the upstream model (consumer skips runs — the scenario
    where maintenance outpaces a consumer's watermark)."""
    proj = _project()
    del proj.models["cust_rev_cdc"]
    r = Runner(
        spark=spark, project=proj, database=db,
        vars={"sf_dir": sf_dir, **vars},
    )
    return r.run()
