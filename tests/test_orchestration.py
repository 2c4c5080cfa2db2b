"""Airflow jobs-graph export (SURVEY.md §3.4; deploy.sh:20-22,
infra/dags_schedule.yaml:1-19). Pure metadata — no Spark session."""

from __future__ import annotations

import json
import os

from dbt_spark_models_spark.plans import jinja
from dbt_spark_models_spark.plans.orchestration import (
    build_jobs_graph,
    load_schedule,
    route_model,
    write_jobs_graph,
)
from dbt_spark_models_spark.plans.project import Project

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

SCHEDULE = {
    "default": {
        "dag-name": "dbt-etl",
        "crontab": "15 0 * * *",
        "excluded-tags": ["manual"],
        "slo-hour": 18,
    },
    "marts": {
        "dag-name": "marts",
        "crontab": "0 9 * * *",
        "tags": ["mart"],
        "slo-hour": 15,
    },
}


def _mini_mart() -> Project:
    project = Project.load(os.path.join(EXAMPLES, "mini_mart"))
    for node in project.models.values():
        jinja.parse_node(project, node)
    return project


def test_routing_rules():
    # last tag wins (dags_schedule.yaml:10); excluded tag unschedules
    assert route_model(["staging", "mart"], SCHEDULE) == "marts"
    assert route_model(["mart", "staging"], SCHEDULE) == "default"
    assert route_model(["mart", "manual"], SCHEDULE) is None
    assert route_model([], SCHEDULE) == "default"


def test_jobs_graph_partitions_and_edges():
    project = _mini_mart()
    graph = build_jobs_graph(project, SCHEDULE)
    dags = graph["dags"]
    assert set(dags) == {"dbt-etl", "marts"}

    marts = dags["marts"]
    assert marts["crontab"] == "0 9 * * *" and marts["slo_hour"] == 15
    # intra-DAG edge: user_lifetime <- daily_user_stats (both mart-tagged)
    assert marts["tasks"]["user_lifetime"]["upstream"] == ["daily_user_stats"]
    # cross-DAG sensor edge: daily_user_stats (marts) <- stg_events (dbt-etl)
    task = marts["tasks"]["daily_user_stats"]
    assert task["upstream"] == []
    assert task["external_upstream"] == [{"dag": "dbt-etl", "task": "stg_events"}]

    etl = dags["dbt-etl"]
    # seed refs (event_categories) are data edges, not task edges
    assert etl["tasks"]["stg_events"]["upstream"] == []
    # default DAG params flow through
    assert etl["crontab"] == "15 0 * * *" and etl["slo_hour"] == 18


def test_manual_tag_unschedules_and_meta_flows():
    project = _mini_mart()
    # simulate the reference's gold_orders.sql:12-15 meta block and a
    # manual-tagged model
    project.models["activity_by_type"].config["tags"] = ["manual"]
    project.models["user_lifetime"].config["meta"] = {
        "airflow_pool": "dbt_heavy",
        "priority_weight": "1000",
    }
    graph = build_jobs_graph(project, SCHEDULE)
    assert "activity_by_type" in graph["unscheduled"]
    all_tasks = {
        t for d in graph["dags"].values() for t in d["tasks"]
    }
    assert "activity_by_type" not in all_tasks
    task = graph["dags"]["marts"]["tasks"]["user_lifetime"]
    assert task["pool"] == "dbt_heavy" and task["priority_weight"] == 1000


def test_write_jobs_graph_artifact(tmp_path):
    project = _mini_mart()
    path = write_jobs_graph(project, SCHEDULE, target_dir=str(tmp_path))
    with open(path) as f:
        loaded = json.load(f)
    assert loaded == build_jobs_graph(project, SCHEDULE)


def test_schedule_yaml_roundtrip(tmp_path):
    text = """
default:
  dag-name: dbt-etl
  crontab: 15 0 * * *
  excluded-tags: ["manual"]
  slo-hour: 18
pulse:
  dag-name: pulse
  crontab: 0 9 * * *
  tags: ["pulse"]
  slo-hour: 15
"""
    p = tmp_path / "dags_schedule.yaml"
    p.write_text(text)
    sched = load_schedule(str(p))
    assert sched["default"]["slo-hour"] == 18
    assert sched["pulse"]["tags"] == ["pulse"]
    assert route_model(["pulse"], sched) == "pulse"
