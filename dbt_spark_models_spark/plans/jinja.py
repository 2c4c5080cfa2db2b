"""Jinja rendering layer (SURVEY.md §3.1 stages 2+4).

Two passes, like dbt:

1. **parse pass** — render with capturing stubs to extract ``config()``
   kwargs and ``ref()``/``source()`` dependency edges (manifest building,
   ``infra/dbtjoom/load.py:33-58`` models the result).
2. **compile pass** — render with resolving implementations so the output
   is executable Spark SQL text: ``ref('m')`` → target identifier,
   ``var('start_date_ymd')`` → literal, ``is_incremental()`` → bool branch
   (the reference's compile-time control flow, SURVEY.md §7 "What's hard" —
   predicates must become literals *before* submission so Catalyst can
   prune partitions statically, SURVEY.md §4).

Supports project macros: ``macros/*.sql`` files containing
``{% macro name(args) %}...{% endmacro %}`` are preloaded into the
environment (reference: ``macros/format_time.sql:1-5`` and the 405-line
model generator ``macros/gold_active_users_and_devices_with_ephemeral.sql``).
"""

from __future__ import annotations

import os
from typing import Any

import jinja2

from dbt_spark_models_spark.plans.project import ModelNode, Project


def _macro_source(project: Project) -> str:
    mdir = os.path.join(project.root, "macros")
    chunks = []
    if os.path.isdir(mdir):
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".sql"):
                with open(os.path.join(mdir, fn)) as f:
                    chunks.append(f.read())
    return "\n".join(chunks)


def _env(project: Project, ctx: dict[str, Any] | None = None) -> jinja2.Environment:
    """Build the render environment. ``ctx`` (config/ref/source/var/...)
    must be installed as globals BEFORE macros load — Jinja macros resolve
    names against their defining environment, not the caller's render
    kwargs (reference macros call source()/ref()/var() freely,
    e.g. ``macros/gold_active_users_and_devices_with_ephemeral.sql``)."""
    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    env.globals.update(ctx or {})
    macros = _macro_source(project)
    if macros:
        module = env.from_string(macros).module
        for attr in dir(module):
            if not attr.startswith("_"):
                env.globals[attr] = getattr(module, attr)
    return env


def parse_node(project: Project, node: ModelNode) -> None:
    """Parse pass: capture config + deps into the node (in place)."""
    captured_cfg: dict[str, Any] = {}
    deps: list[str] = []
    srcs: list[tuple[str, str]] = []
    cdf_deps: list[str] = []

    def config(**kw: Any) -> str:
        captured_cfg.update(kw)
        return ""

    def ref(name: str) -> str:
        deps.append(name)
        return name

    def ref_changes(name: str) -> str:
        # a CDF read IS a dependency on the upstream — and is ALSO
        # tracked separately so the Runner can seed consumed-version
        # watermarks from parse info instead of a raw-SQL regex
        deps.append(name)
        cdf_deps.append(name)
        return name

    def source(schema: str, table: str) -> str:
        srcs.append((schema, table))
        return f"{schema}.{table}"

    ctx = dict(
        config=config,
        ref=ref,
        source=source,
        ref_changes=ref_changes,
        var=lambda k, default=None: project.vars.get(k, default),
        is_incremental=lambda: False,
        this=node.name,
    )
    env = _env(project, ctx)
    env.from_string(node.raw_sql).render(**ctx)
    # second parse render with is_incremental()=True: deps referenced ONLY
    # inside the incremental branch (the ref_changes() pattern) must still
    # land in the DAG; best-effort — a branch that needs live state to
    # render can't run at parse time
    try:
        ctx_inc = {**ctx, "is_incremental": lambda: True}
        env.from_string(node.raw_sql).render(**ctx_inc)
    except Exception:  # noqa: BLE001
        pass
    node.config = {**project.model_defaults, **captured_cfg}
    node.depends_on = list(dict.fromkeys(deps))
    node.sources = list(dict.fromkeys(srcs))
    node.cdf_depends_on = list(dict.fromkeys(cdf_deps))


def compile_node(
    project: Project,
    node: ModelNode,
    resolve_ref,
    resolve_source,
    vars: dict[str, Any],
    is_incremental: bool,
    this: str,
    resolve_ref_changes=None,
) -> str:
    """Compile pass: produce executable Spark SQL text.

    ``resolve_ref_changes(name)`` backs the ``ref_changes()`` Jinja
    function — the Change-Data-Feed twin of ``ref()``: inside an
    incremental run it must resolve to a relation holding the upstream
    delta table's row changes since this model last consumed it
    (``_change_type``/``_commit_version`` columns included). Only the
    Runner can supply it (it owns the consumed-version bookkeeping);
    compiling a model that calls it without a Runner is an error."""

    def _no_ref_changes(name: str) -> str:
        raise ValueError(
            "ref_changes() needs a Runner-provided resolver (CDF "
            "consumed-version state lives in the target's delta log)"
        )

    merged_vars = {**project.vars, **vars}

    def var(k: str, default: Any = None) -> Any:
        return merged_vars.get(k, default)

    ctx = dict(
        config=lambda **kw: "",
        ref=resolve_ref,
        source=resolve_source,
        ref_changes=resolve_ref_changes or _no_ref_changes,
        var=var,
        is_incremental=lambda: is_incremental,
        this=this,
    )
    env = _env(project, ctx)
    sql = env.from_string(node.raw_sql).render(**ctx)
    return sql.strip().rstrip(";")
