"""Airflow jobs-graph export (SURVEY.md §3.4, the deploy-time path).

The reference deploys by compiling the manifest and feeding it to a graph
generator that emits one Airflow task per model with per-model retries,
pools, and priorities (``deploy.sh:20-22`` →
``src/main/airflow/jobs_graph.json``), and partitions models into
per-domain DAGs by tag with per-DAG cron / SLO / alert channel
(``infra/dags_schedule.yaml:1-19``).  This module reproduces that
contract engine-side:

- ``load_schedule`` parses a dags_schedule-style YAML/JSON config: a
  ``default`` section plus per-DAG overrides (``dag-name``, ``crontab``,
  ``tags`` filter, ``excluded-tags``, ``slo-hour``, ``alerts-channel``).
- ``build_jobs_graph`` routes every parsed model to a DAG and emits the
  task graph.  Routing follows the reference's documented rules
  (``dags_schedule.yaml:9-10``): when a model carries several tags, the
  LAST one decides the DAG; models carrying an excluded tag (default
  ``manual``) are not scheduled at all.  Dependencies that stay inside a
  DAG become task ``upstream`` edges; dependencies that cross DAGs are
  emitted as ``external_upstream`` (dag, task) pairs — the Airflow side
  turns those into ExternalTaskSensor-style waits.  Per-task ``pool`` /
  ``priority_weight`` come from model ``meta``
  (``models/spark/gold/gold_orders.sql:12-15``).

The export is pure metadata: no Spark session is needed, so a CI deploy
step can run it in milliseconds, exactly like the reference's compile-only
deploy pass.
"""

from __future__ import annotations

import json
import os
from typing import Any

from dbt_spark_models_spark.plans import jinja
from dbt_spark_models_spark.plans.project import Project, _parse_simple_yaml

DEFAULT_SCHEDULE: dict[str, Any] = {
    "default": {
        "dag-name": "dbt-etl",
        "crontab": "15 0 * * *",
        "excluded-tags": ["manual"],
        "slo-hour": 18,
    }
}


def load_schedule(path_or_dict: str | dict[str, Any] | None) -> dict[str, Any]:
    """Parse a dags_schedule config (YAML subset or JSON file, or a dict).

    Returns the raw {section: params} mapping with the ``default`` section
    guaranteed present.
    """
    if path_or_dict is None:
        raw: dict[str, Any] = dict(DEFAULT_SCHEDULE)
    elif isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            text = f.read()
        raw = (
            json.loads(text)
            if path_or_dict.endswith(".json")
            else _parse_simple_yaml(text)
        )
    raw.setdefault("default", dict(DEFAULT_SCHEDULE["default"]))
    return raw


def _dag_params(schedule: dict[str, Any], section: str) -> dict[str, Any]:
    """Effective params for one DAG section: default overlaid by section."""
    merged = dict(schedule.get("default", {}))
    merged.update(schedule.get(section, {}))
    merged.setdefault("dag-name", section)
    return merged


def route_model(
    tags: list[str], schedule: dict[str, Any]
) -> str | None:
    """DAG section for a model, or None when the model is unscheduled.

    Reference semantics (``dags_schedule.yaml:9-10``): the model's LAST
    tag is the routing tag; any tag in the default section's
    ``excluded-tags`` unschedules the model entirely.
    """
    excluded = set(schedule.get("default", {}).get("excluded-tags", []) or [])
    if excluded.intersection(tags):
        return None
    routing = tags[-1] if tags else None
    if routing is not None:
        for section, params in schedule.items():
            if section == "default":
                continue
            if routing in (params.get("tags") or []):
                return section
    return "default"


def build_jobs_graph(
    project: Project, schedule: dict[str, Any] | str | None = None
) -> dict[str, Any]:
    """One Airflow task per model, partitioned into per-tag DAGs.

    Returns ``{"dags": {section: {dag params..., "tasks": {...}}}}`` where
    each task records intra-DAG ``upstream`` edges, cross-DAG
    ``external_upstream`` (dag, task) pairs, and pool/priority meta.
    """
    sched = load_schedule(schedule) if not isinstance(schedule, dict) else schedule
    sched.setdefault("default", dict(DEFAULT_SCHEDULE["default"]))

    for node in project.models.values():
        if not node.config and not node.depends_on:
            jinja.parse_node(project, node)

    assignment: dict[str, str | None] = {}
    for name, node in project.models.items():
        tags = list(node.config.get("tags") or [])
        assignment[name] = route_model(tags, sched)

    dags: dict[str, dict[str, Any]] = {}
    for name, node in project.models.items():
        section = assignment[name]
        if section is None:
            continue
        params = _dag_params(sched, section)
        dag = dags.setdefault(
            params["dag-name"],
            {
                "crontab": params.get("crontab"),
                "slo_hour": params.get("slo-hour"),
                "alerts_channel": params.get("alerts-channel"),
                "dag_tags": params.get("dag-tags") or [],
                "tasks": {},
            },
        )
        meta = node.config.get("meta") or {}
        upstream: list[str] = []
        external: list[dict[str, str]] = []
        for dep in node.depends_on:
            if dep not in project.models:
                continue  # seeds/sources are data-ready, not task edges
            dep_section = assignment.get(dep)
            if dep_section is None:
                continue  # manual-tagged upstream: no sensor, data assumed
            dep_dag = _dag_params(sched, dep_section)["dag-name"]
            if dep_dag == params["dag-name"]:
                upstream.append(dep)
            else:
                external.append({"dag": dep_dag, "task": dep})
        task: dict[str, Any] = {"upstream": sorted(upstream)}
        if external:
            task["external_upstream"] = sorted(
                external, key=lambda e: (e["dag"], e["task"])
            )
        if meta.get("airflow_pool"):
            task["pool"] = meta["airflow_pool"]
        if meta.get("priority_weight") is not None:
            task["priority_weight"] = int(meta["priority_weight"])
        dag["tasks"][name] = task

    return {"dags": dags, "unscheduled": sorted(
        n for n, s in assignment.items() if s is None
    )}


def write_jobs_graph(
    project: Project,
    schedule: dict[str, Any] | str | None = None,
    target_dir: str | None = None,
) -> str:
    """Emit target/jobs_graph.json (deploy.sh:20-22 artifact)."""
    graph = build_jobs_graph(project, schedule)
    out_dir = target_dir or os.path.join(project.root, "target")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "jobs_graph.json")
    with open(path, "w") as f:
        json.dump(graph, f, indent=2, sort_keys=True)
    return path
