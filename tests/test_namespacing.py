"""Dev-namespacing parity: the reference's generate_schema_name /
generate_alias_name macros (macros/get_custom_schema.sql:1-21,
macros/generate_alias_name.sql:14-24) — custom schema/alias honored in
prod; in dev every overridden model collapses into the single dev
database as <schema>__<alias>; dev_nodes_to_override limits the set."""

from __future__ import annotations

import textwrap

import pytest

from dbt_spark_models_spark.plans import Project, Runner


@pytest.fixture()
def ns_project(tmp_path, sf_dir):
    root = tmp_path / "nsproj"
    (root / "models").mkdir(parents=True)
    (root / "project.yml").write_text(
        textwrap.dedent(
            f"""\
            name: ns_mart
            vars:
              dbt_default_production_schema: ns_default
            sources:
              testdata:
                orders: {sf_dir}/orders.parquet
            """
        )
    )
    (root / "models" / "orders_base.sql").write_text(
        "{{ config(materialized='table', schema='ns_gold', alias='orders_fact') }}\n"
        "SELECT o_orderkey, o_totalprice FROM {{ source('testdata', 'orders') }}"
    )
    (root / "models" / "orders_rollup.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT COUNT(*) AS n, SUM(o_totalprice) AS total"
        " FROM {{ ref('orders_base') }}"
    )
    return Project.load(str(root))


def _statuses(results):
    return {r.node: r.status for r in results}


def test_prod_honors_custom_schema_and_alias(spark, ns_project):
    r = Runner(spark=spark, project=ns_project, database="ns_prod_main",
               target_name="prod")
    res = r.run()
    assert _statuses(res) == {"orders_base": "success", "orders_rollup": "success"}
    # custom schema + alias verbatim
    assert spark.catalog.tableExists("ns_gold.orders_fact")
    # no custom schema → dbt_default_production_schema var
    assert spark.catalog.tableExists("ns_default.orders_rollup")
    n = spark.table("ns_default.orders_rollup").collect()[0]["n"]
    assert n == spark.table("ns_gold.orders_fact").count()
    for db in ("ns_gold", "ns_default", "ns_prod_main"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_dev_collapses_into_one_database(spark, ns_project):
    r = Runner(spark=spark, project=ns_project, database="ns_dev_alice",
               target_name="dev")
    res = r.run()
    assert _statuses(res) == {"orders_base": "success", "orders_rollup": "success"}
    # overridden: single dev db, <schema>__<alias> naming
    assert spark.catalog.tableExists("ns_dev_alice.ns_gold__orders_fact")
    assert spark.catalog.tableExists("ns_dev_alice.orders_rollup")
    # ref() resolution followed the rewrite (rollup read the dev table)
    assert not spark.catalog.tableExists("ns_gold.orders_fact")
    spark.sql("DROP DATABASE IF EXISTS ns_dev_alice CASCADE")


def test_dev_nodes_to_override_limits_rewrite(spark, ns_project):
    # build prod first so the non-overridden model can read prod output
    Runner(spark=spark, project=ns_project, database="ns_prod2",
           target_name="prod").run()
    r = Runner(
        spark=spark, project=ns_project, database="ns_dev_bob",
        target_name="dev", vars={"dev_nodes_to_override": "orders_rollup"},
    )
    res = r.run()
    assert _statuses(res) == {"orders_base": "success", "orders_rollup": "success"}
    # orders_base NOT overridden → written to its prod schema; rollup
    # overridden → dev db, reading the prod orders_base
    assert spark.catalog.tableExists("ns_dev_bob.orders_rollup")
    assert not spark.catalog.tableExists("ns_dev_bob.ns_gold__orders_fact")
    for db in ("ns_gold", "ns_default", "ns_prod2", "ns_dev_bob"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
