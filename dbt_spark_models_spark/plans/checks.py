"""Generic schema tests (dbt's not_null / unique / accepted_values /
relationships).

The reference's YAMLs are docs-only (SURVEY.md §5 — no ``tests:`` keys);
its assertions are singular SQL files. This engine supports both: singular
tests (``Runner.test()``) and the generic declarative kind below, declared
per model in project.yml:

    checks:
      stg_events:
        not_null: [event_id, user_id]
        unique: [event_id]
        accepted_values:
          event_type: [view, click, purchase, signup, error]
        relationships:
          event_type: dim_event_types.event_type

Each check compiles to a Spark SQL assertion query that must return 0
rows — same execution contract as singular tests, so failures surface
identically in run results.
"""

from __future__ import annotations

from typing import Any


def build_check_queries(
    model_ident: str, checks: dict[str, Any], resolve_ref
) -> dict[str, str]:
    """Compile a model's generic checks into named 0-row assertion SQLs."""
    out: dict[str, str] = {}
    for col in checks.get("not_null", []) or []:
        out[f"not_null__{col}"] = (
            f"SELECT * FROM {model_ident} WHERE `{col}` IS NULL"
        )
    for col in checks.get("unique", []) or []:
        out[f"unique__{col}"] = (
            f"SELECT `{col}`, COUNT(*) AS n FROM {model_ident} "
            f"GROUP BY `{col}` HAVING COUNT(*) > 1"
        )
    for col, values in (checks.get("accepted_values") or {}).items():
        quoted = ", ".join(f"'{v}'" for v in values)
        out[f"accepted_values__{col}"] = (
            f"SELECT * FROM {model_ident} "
            f"WHERE `{col}` IS NOT NULL AND `{col}` NOT IN ({quoted})"
        )
    for col, target in (checks.get("relationships") or {}).items():
        ref_model, _, ref_col = str(target).partition(".")
        target_ident = resolve_ref(ref_model)
        out[f"relationships__{col}"] = (
            f"SELECT t.`{col}` FROM {model_ident} t "
            f"LEFT ANTI JOIN {target_ident} r ON t.`{col}` = r.`{ref_col}` "
            f"WHERE t.`{col}` IS NOT NULL"
        )
    return out
