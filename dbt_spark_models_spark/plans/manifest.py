"""Manifest + run-results artifacts (SURVEY.md §3.1 stages 2 and 7).

The reference's tooling consumes ``target/manifest.json`` (node shape
modeled at ``infra/dbtjoom/types.py:46-92``) and ``target/run_results.json``
(``types.py:11-23``) — Airflow graph generation, changed-model selection,
and cleanup all read them. This module emits the same artifacts so that
class of tooling can run against this engine.
"""

from __future__ import annotations

import json
import os
from typing import Any

from dbt_spark_models_spark.plans.project import Project


def build_manifest(project: Project) -> dict[str, Any]:
    """Serializable project manifest (parse pass must have run)."""
    nodes: dict[str, Any] = {}
    for name, node in {**project.models, **project.snapshots}.items():
        nodes[f"{node.kind}.{project.name}.{name}"] = {
            "name": name,
            "resource_type": node.kind,
            "path": os.path.relpath(node.path, project.root),
            "config": node.config,
            "depends_on": {
                "nodes": [
                    f"model.{project.name}.{d}"
                    if d in project.models
                    else f"seed.{project.name}.{d}"
                    for d in node.depends_on
                ],
                "sources": [list(s) for s in node.sources],
            },
        }
    for name, path in project.seeds.items():
        nodes[f"seed.{project.name}.{name}"] = {
            "name": name,
            "resource_type": "seed",
            "path": os.path.relpath(path, project.root),
            "config": project.seed_configs.get(name, {}),
            "depends_on": {"nodes": [], "sources": []},
        }
    for name, node in project.tests.items():
        nodes[f"test.{project.name}.{name}"] = {
            "name": name,
            "resource_type": "test",
            "path": os.path.relpath(node.path, project.root),
            "config": node.config,
            "depends_on": {"nodes": [], "sources": []},
        }
    return {
        "metadata": {"project_name": project.name, "generator": "dbt_spark_models_spark"},
        "nodes": nodes,
        "sources": {
            f"source.{project.name}.{schema}.{table}": {"schema": schema, "name": table, "target": target}
            for schema, tables in project.sources.items()
            for table, target in tables.items()
        },
        "vars": project.vars,
    }


def write_manifest(project: Project, target_dir: str | None = None) -> str:
    target_dir = target_dir or os.path.join(project.root, "target")
    os.makedirs(target_dir, exist_ok=True)
    path = os.path.join(target_dir, "manifest.json")
    with open(path, "w") as f:
        json.dump(build_manifest(project), f, indent=2, default=str)
    return path


def write_run_results(results, project: Project, target_dir: str | None = None) -> str:
    """Per-node status/timing (reference run_results shape)."""
    target_dir = target_dir or os.path.join(project.root, "target")
    os.makedirs(target_dir, exist_ok=True)
    path = os.path.join(target_dir, "run_results.json")
    payload = {
        "results": [
            {
                "unique_id": f"{r.kind}.{project.name}.{r.node}",
                "status": r.status,
                "execution_time": round(r.seconds, 3),
                "message": r.message or r.action,
            }
            for r in results
        ],
        "elapsed_time": round(sum(r.seconds for r in results), 3),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path
