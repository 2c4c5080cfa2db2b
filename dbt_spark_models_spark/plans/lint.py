"""Policy lint — the reference's CI gate checks (SURVEY.md §5).

Reproduced checks:
- every model/snapshot must declare an owner in ``meta.model_owner``
  (``.github/scripts/get_no_owner.py:9-17``)
- non-view models must set ``file_format``
  (``get_no_fileformat.py:25-45``)
- sources declared in project.yml but never referenced are flagged
  (``get_unused_sources.py:4-18``)
- ``ref()`` targets must exist (compile gate, ``test.sh:13``)

Checks run on the parsed project — no Spark session needed — so they can
gate CI exactly like the reference's PR workflow.
"""

from __future__ import annotations

from dataclasses import dataclass

from dbt_spark_models_spark.plans.project import Project


@dataclass
class LintIssue:
    rule: str
    node: str
    message: str


def lint_project(
    project: Project,
    require_owner: bool = True,
    require_file_format: bool = True,
) -> list[LintIssue]:
    issues: list[LintIssue] = []
    used_sources: set[tuple[str, str]] = set()

    for name, node in {**project.models, **project.snapshots}.items():
        meta = node.config.get("meta") or {}
        if require_owner and not (
            meta.get("model_owner") or node.config.get("model_owner")
        ):
            issues.append(
                LintIssue("model_owner", name, "missing meta.model_owner")
            )
        mat = node.config.get("materialized", "view")
        if (
            require_file_format
            and node.kind == "model"
            and mat not in ("view", "ephemeral")
            and "file_format" not in node.config
        ):
            issues.append(
                LintIssue(
                    "file_format",
                    name,
                    f"materialized='{mat}' without explicit file_format",
                )
            )
        for dep in node.depends_on:
            if (
                dep not in project.models
                and dep not in project.seeds
                and dep not in project.snapshots
            ):
                issues.append(
                    LintIssue("unknown_ref", name, f"ref('{dep}') does not exist")
                )
        used_sources.update(node.sources)

    for schema, tables in project.sources.items():
        for table in tables:
            if (schema, table) not in used_sources:
                issues.append(
                    LintIssue(
                        "unused_source",
                        f"{schema}.{table}",
                        "declared in project.yml but never referenced",
                    )
                )
    return issues
