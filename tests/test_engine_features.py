"""Tests for framework parity features: append strategy, on_schema_change,
copy-from-prod, full_reload_on, backfill, tblproperties/comments."""

from __future__ import annotations

import textwrap

import pytest

from dbt_spark_models_spark.plans import Project, Runner


def _mk_project(tmp_path, sf_dir, models: dict[str, str]) -> str:
    root = tmp_path / "proj"
    (root / "models").mkdir(parents=True)
    (root / "project.yml").write_text(
        textwrap.dedent(
            f"""\
            name: feat_test
            vars:
              day: '2024-01-05'
            sources:
              testdata:
                events: {sf_dir}/events.parquet
            """
        )
    )
    for name, sql in models.items():
        (root / "models" / f"{name}.sql").write_text(sql)
    return str(root)


INCREMENTAL_DAILY = """\
{{ config(materialized='incremental',
          incremental_strategy='insert_overwrite',
          partition_by=['day']) }}
SELECT user_id, COUNT(*) AS n, CAST(ts AS DATE) AS day
FROM {{ source('testdata', 'events') }}
{% if is_incremental() %}
WHERE CAST(ts AS DATE) = date'{{ var("day") }}'
{% endif %}
GROUP BY user_id, day
"""


def test_append_strategy(spark, tmp_path, sf_dir):
    proj_dir = _mk_project(
        tmp_path,
        sf_dir,
        {
            "run_log": (
                "{{ config(materialized='incremental', "
                "incremental_strategy='append') }}\n"
                "SELECT '{{ var(\"day\") }}' AS run_day, COUNT(*) AS n\n"
                "FROM {{ source('testdata', 'events') }}"
            )
        },
    )
    db = "feat_append"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(proj_dir), database=db)
    r.run()
    r.vars = {"day": "2024-01-06"}
    results = r.run()
    assert results[-1].action == "appended"
    rows = spark.table(f"{db}.run_log").collect()
    assert len(rows) == 2
    assert {r["run_day"] for r in rows} == {"2024-01-05", "2024-01-06"}


def test_on_schema_change_append_new_columns(spark, tmp_path, sf_dir):
    proj_dir = _mk_project(
        tmp_path,
        sf_dir,
        {
            "evolving": (
                "{{ config(materialized='incremental', "
                "incremental_strategy='insert_overwrite', "
                "partition_by=['day'], on_schema_change='append_new_columns') }}\n"
                "SELECT user_id, COUNT(*) AS n, CAST(ts AS DATE) AS day\n"
                "FROM {{ source('testdata', 'events') }}\n"
                "{% if is_incremental() %}WHERE CAST(ts AS DATE) = "
                "date'{{ var(\"day\") }}'{% endif %}\n"
                "GROUP BY user_id, day"
            )
        },
    )
    db = "feat_schema"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(proj_dir), database=db)
    r.run()
    assert "extra" not in spark.table(f"{db}.evolving").columns

    # model evolves: adds a column
    import os

    with open(os.path.join(proj_dir, "models", "evolving.sql"), "w") as f:
        f.write(
            "{{ config(materialized='incremental', "
            "incremental_strategy='insert_overwrite', "
            "partition_by=['day'], on_schema_change='append_new_columns') }}\n"
            "SELECT user_id, COUNT(*) AS n, "
            "COUNT(DISTINCT event_type) AS extra, CAST(ts AS DATE) AS day\n"
            "FROM {{ source('testdata', 'events') }}\n"
            "{% if is_incremental() %}WHERE CAST(ts AS DATE) = "
            "date'{{ var(\"day\") }}'{% endif %}\n"
            "GROUP BY user_id, day"
        )
    r2 = Runner(spark=spark, project=Project.load(proj_dir), database=db)
    results = r2.run()
    assert results[-1].status == "success"
    t = spark.table(f"{db}.evolving")
    assert "extra" in t.columns
    # old partitions have NULL extra, the re-run day has values
    assert t.filter("day = date'2024-01-05' AND extra IS NOT NULL").count() > 0
    assert t.filter("day <> date'2024-01-05' AND extra IS NULL").count() > 0


def test_copy_from_prod(spark, tmp_path, sf_dir):
    proj_dir = _mk_project(tmp_path, sf_dir, {"daily": INCREMENTAL_DAILY})
    prod_db, dev_db = "feat_prod", "feat_dev"
    for db in (prod_db, dev_db):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    project = Project.load(proj_dir)
    Runner(spark=spark, project=project, database=prod_db).run()
    dev = Runner(
        spark=spark,
        project=project,
        database=dev_db,
        copy_from_prod={"daily"},
        prod_database=prod_db,
    )
    results = dev.run()
    assert results[-1].action == "copied_from_prod"
    assert (
        spark.table(f"{dev_db}.daily").count()
        == spark.table(f"{prod_db}.daily").count()
    )


def test_full_reload_on_dow(spark, tmp_path, sf_dir):
    # 2024-01-06 is a Saturday (dow 6)
    proj_dir = _mk_project(
        tmp_path,
        sf_dir,
        {
            "weekly": (
                "{{ config(materialized='incremental', "
                "incremental_strategy='insert_overwrite', "
                "partition_by=['day'], full_reload_on='6') }}\n"
                "SELECT user_id, COUNT(*) AS n, CAST(ts AS DATE) AS day\n"
                "FROM {{ source('testdata', 'events') }}\n"
                "{% if is_incremental() %}WHERE CAST(ts AS DATE) = "
                "date'{{ var(\"run_date\") }}'{% endif %}\n"
                "GROUP BY user_id, day"
            )
        },
    )
    db = "feat_weekly"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(proj_dir), database=db)
    r.vars = {"run_date": "2024-01-03"}
    r.run()
    table = f"{db}.weekly"
    full_count = spark.table(table).count()

    def poison(day: str) -> None:
        spark.sql(
            f"INSERT OVERWRITE TABLE {table} SELECT user_id, 0 AS n, day "
            f"FROM {table} WHERE day = date'{day}'"
        )

    # weekday incremental run only recomputes run_date's partition:
    # a poisoned OTHER day stays poisoned
    poison("2024-01-20")
    r.vars = {"run_date": "2024-01-10"}
    r.run()
    assert spark.table(table).filter("day = date'2024-01-20' AND n = 0").count() > 0

    # Saturday (2024-01-06, dow 6) → full reload restores every partition
    r.vars = {"run_date": "2024-01-06"}
    r.run()
    t = spark.table(table)
    assert t.count() == full_count
    assert t.filter("n = 0").count() == 0


def test_backfill_days(spark, tmp_path, sf_dir):
    proj_dir = _mk_project(
        tmp_path,
        sf_dir,
        {
            "daily": INCREMENTAL_DAILY.replace(
                'var("day")', 'var("run_date", var("day"))'
            )
        },
    )
    db = "feat_backfill"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(proj_dir), database=db)
    r.run()  # initial full build
    table = f"{db}.daily"
    n_total = spark.table(table).count()
    # poison three days, then backfill exactly those days
    spark.sql(
        f"INSERT OVERWRITE TABLE {table} SELECT user_id, 0 AS n, day "
        f"FROM {table} WHERE day BETWEEN date'2024-01-10' AND date'2024-01-12'"
    )
    results = r.backfill("2024-01-10", "2024-01-12")
    assert all(x.status == "success" for x in results)
    assert len(results) == 3
    t = spark.table(table)
    assert t.count() == n_total
    assert t.filter(
        "day BETWEEN date'2024-01-10' AND date'2024-01-12' AND n = 0"
    ).count() == 0


def test_tblproperties_and_comment(spark, tmp_path, sf_dir):
    proj_dir = _mk_project(
        tmp_path,
        sf_dir,
        {
            "documented": (
                "{{ config(materialized='table', "
                "tblproperties={'team': 'data-eng', 'pii': 'false'}, "
                "description='Documented table') }}\n"
                "SELECT user_id, COUNT(*) AS n "
                "FROM {{ source('testdata', 'events') }} GROUP BY user_id"
            )
        },
    )
    db = "feat_props"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    Runner(spark=spark, project=Project.load(proj_dir), database=db).run()
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {db}.documented").collect()
    }
    assert props.get("team") == "data-eng"
    assert props.get("pii") == "false"


def test_snapshot_via_project(spark, tmp_path, sf_dir):
    import textwrap as tw

    root = tmp_path / "snapproj"
    (root / "models").mkdir(parents=True)
    (root / "snapshots").mkdir()
    (root / "project.yml").write_text(
        tw.dedent(
            f"""\
            name: snap_proj
            vars:
              cutoff: '2024-01-15 00:00:00'
            sources:
              testdata:
                events: {sf_dir}/events.parquet
            """
        )
    )
    (root / "snapshots" / "user_state.sql").write_text(
        tw.dedent(
            """\
            {{ config(unique_key='user_id', strategy='timestamp',
                      updated_at='last_ts') }}
            SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
            FROM {{ source('testdata', 'events') }}
            WHERE ts < timestamp'{{ var("cutoff") }}'
            GROUP BY user_id
            """
        )
    )
    db = "feat_snap_proj"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    project = Project.load(str(root))
    r = Runner(spark=spark, project=project, database=db)
    res1 = r.snapshot()
    assert res1[0].status == "success"
    t1 = spark.table(f"{db}.user_state")
    n_users_1 = t1.count()
    assert t1.filter("dbt_valid_to IS NOT NULL").count() == 0

    # widen the cutoff: users active after Jan 15 get a new version
    r.vars = {"cutoff": "2024-02-01 00:00:00"}
    res2 = r.snapshot()
    assert res2[0].status == "success"
    t2 = spark.table(f"{db}.user_state")
    n_current = t2.filter("dbt_valid_to IS NULL").count()
    n_history = t2.filter("dbt_valid_to IS NOT NULL").count()
    assert n_history > 0
    assert n_current >= n_users_1
    # changed users: current n_events strictly greater than the closed version
    changed = spark.sql(
        f"""SELECT cur.user_id FROM {db}.user_state cur
            JOIN {db}.user_state old
              ON cur.user_id = old.user_id
             AND cur.dbt_valid_to IS NULL AND old.dbt_valid_to IS NOT NULL
            WHERE cur.n_events <= old.n_events"""
    ).count()
    assert changed == 0


def test_seed_column_types(spark, tmp_path):
    root = tmp_path / "seedproj"
    (root / "seeds").mkdir(parents=True)
    (root / "project.yml").write_text(
        'name: seed_proj\nseeds:\n  rates:\n    column_types: {"code": "string", "rate": "double"}\n'
    )
    (root / "seeds" / "rates.csv").write_text("code,rate\n001,1.5\n002,2\n")
    db = "feat_seed_types"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(str(root)), database=db)
    res = r.seed()
    assert res[0].status == "success"
    t = spark.table(f"{db}.rates")
    types = dict(t.dtypes)
    assert types["code"] == "string"  # would infer int and drop the left zeros
    assert types["rate"] == "double"
    assert {r["code"] for r in t.collect()} == {"1", "2"}  # cast from inferred int


def test_macro_generated_models(spark, sf_dir):
    """The reference's macro-as-model-generator pattern: one macro emits
    two model variants (gold_active_users_and_devices style)."""
    import os

    db = "feat_macro"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "mini_mart",
    )
    project = Project.load(root)
    r = Runner(
        spark=spark, project=project, database=db, vars={"sf_dir": sf_dir}
    )
    r.seed()
    results = r.run(select=["tag:activity"])
    assert [x.status for x in results] == ["success", "success"]
    by_user = spark.table(f"{db}.activity_by_user")
    by_type = spark.table(f"{db}.activity_by_type")
    assert by_type.count() == 5  # five event types
    assert {r["entity_kind"] for r in by_type.collect()} == {"event_type"}
    # both variants total the same number of events
    tot_u = by_user.agg({"n_events": "sum"}).collect()[0][0]
    tot_t = by_type.agg({"n_events": "sum"}).collect()[0][0]
    assert tot_u == tot_t


def test_manifest_and_run_results(spark, tmp_path, sf_dir):
    import json
    import os

    from dbt_spark_models_spark.plans import jinja
    from dbt_spark_models_spark.plans.manifest import (
        build_manifest,
        write_manifest,
        write_run_results,
    )

    proj_dir = _mk_project(tmp_path, sf_dir, {"daily": INCREMENTAL_DAILY})
    project = Project.load(proj_dir)
    for node in project.models.values():
        jinja.parse_node(project, node)
    m = build_manifest(project)
    assert "model.feat_test.daily" in m["nodes"]
    node = m["nodes"]["model.feat_test.daily"]
    assert node["config"]["materialized"] == "incremental"
    assert node["depends_on"]["sources"] == [["testdata", "events"]]
    assert "source.feat_test.testdata.events" in m["sources"]
    path = write_manifest(project, str(tmp_path / "target"))
    assert os.path.exists(path)

    db = "feat_manifest"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=project, database=db)
    results = r.run()
    rr_path = write_run_results(results, project, str(tmp_path / "target"))
    rr = json.load(open(rr_path))
    assert rr["results"][0]["unique_id"] == "model.feat_test.daily"
    assert rr["results"][0]["status"] == "success"
    assert rr["elapsed_time"] > 0


def test_generic_schema_checks(spark, tmp_path, sf_dir):
    import textwrap as tw

    root = tmp_path / "checksproj"
    (root / "models").mkdir(parents=True)
    (root / "project.yml").write_text(
        tw.dedent(
            f"""\
            name: checks_proj
            sources:
              testdata:
                events: {sf_dir}/events.parquet
            checks:
              stg:
                not_null: ["event_id", "user_id"]
                unique: ["event_id"]
                accepted_values: {{"event_type": ["view", "click", "purchase", "signup", "error"]}}
              bad:
                unique: ["user_id"]
                accepted_values: {{"event_type": ["view"]}}
            """
        )
    )
    (root / "models" / "stg.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT * FROM {{ source('testdata', 'events') }}"
    )
    (root / "models" / "bad.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT * FROM {{ source('testdata', 'events') }}"
    )
    db = "feat_checks"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(str(root)), database=db)
    r.run()
    results = r.test()
    by_name = {x.node: x for x in results}
    assert by_name["stg__not_null__event_id"].status == "success"
    assert by_name["stg__unique__event_id"].status == "success"
    assert by_name["stg__accepted_values__event_type"].status == "success"
    # duplicate user_ids and non-'view' types must FAIL the bad model's checks
    assert by_name["bad__unique__user_id"].status == "fail"
    assert by_name["bad__accepted_values__event_type"].status == "fail"
    assert "failing rows" in by_name["bad__unique__user_id"].message


def test_relationships_check(spark, tmp_path, sf_dir):
    import textwrap as tw

    root = tmp_path / "relproj"
    (root / "models").mkdir(parents=True)
    (root / "seeds").mkdir()
    (root / "project.yml").write_text(
        tw.dedent(
            f"""\
            name: rel_proj
            sources:
              testdata:
                events: {sf_dir}/events.parquet
            checks:
              stg:
                relationships: {{"event_type": "dim_types.event_type"}}
                not_null: ["value"]
            """
        )
    )
    (root / "seeds" / "dim_types.csv").write_text(
        "event_type\nview\nclick\npurchase\nsignup\n"  # 'error' missing!
    )
    (root / "models" / "stg.sql").write_text(
        "{{ config(materialized='table') }}\n"
        "SELECT * FROM {{ source('testdata', 'events') }}"
    )
    db = "feat_rel"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    r = Runner(spark=spark, project=Project.load(str(root)), database=db)
    r.seed()
    r.run()
    results = r.test()
    by_name = {x.node: x for x in results}
    # 'error' events have no parent row -> relationship violated
    assert by_name["stg__relationships__event_type"].status == "fail"
    assert by_name["stg__not_null__value"].status == "success"
