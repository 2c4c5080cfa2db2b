"""Dependency DAG: build, topo-sort, select (SURVEY.md §1.1 "DAG of models",
§3.1 stage 3).

Reproduces the reference's graph tooling semantics:
- child closure (``infra/dbtjoom/find.py:9-15``)
- node selection with +graph operators (dbt ``--select``)
- gap-filling between selected nodes A→B→C when A and C are selected
  (``infra/dbtjoom/find.py:18-46``).
"""

from __future__ import annotations

from graphlib import TopologicalSorter

from dbt_spark_models_spark.plans.project import Project


def build_order(project: Project) -> list[str]:
    """Topological execution order of models (seeds are implicit roots)."""
    ts: TopologicalSorter = TopologicalSorter()
    for name, node in project.models.items():
        deps = [
            d
            for d in node.depends_on
            if d in project.models or d in project.seeds or d in project.snapshots
        ]
        ts.add(name, *deps)
    return [n for n in ts.static_order() if n in project.models]


def children_closure(project: Project, roots: set[str]) -> set[str]:
    """All transitive downstream models of ``roots`` (find.py:9-15)."""
    out = set(roots)
    changed = True
    while changed:
        changed = False
        for name, node in project.models.items():
            if name not in out and any(d in out for d in node.depends_on):
                out.add(name)
                changed = True
    return out


def parents_closure(project: Project, roots: set[str]) -> set[str]:
    out = set(roots)
    frontier = list(roots)
    while frontier:
        cur = frontier.pop()
        node = project.models.get(cur)
        if not node:
            continue
        for d in node.depends_on:
            if d in project.models and d not in out:
                out.add(d)
                frontier.append(d)
    return out


def gap_fill(project: Project, selected: set[str]) -> set[str]:
    """If A and C are selected and A→B→C exists, pull B in so the chain
    runs consistently (``infra/dbtjoom/find.py:18-46``)."""
    out = set(selected)
    for name in project.models:
        if name in out:
            continue
        down = children_closure(project, {name})
        down.discard(name)
        up = parents_closure(project, {name})
        up.discard(name)
        if (down & selected) and (up & selected):
            out.add(name)
    return out


def select_nodes(
    project: Project,
    select: list[str] | None = None,
    exclude: list[str] | None = None,
) -> list[str]:
    """dbt-style selection: names, ``tag:x``, ``model+`` (children),
    ``+model`` (parents); exclusions applied last; gap-filling applied
    when more than one disjoint node is selected."""
    order = build_order(project)
    if not select:
        chosen = set(order)
    else:
        chosen = set()
        for sel in select:
            plus_children = sel.endswith("+")
            plus_parents = sel.startswith("+")
            base = sel.strip("+")
            if base.startswith("tag:"):
                tag = base[4:]
                hits = {
                    n
                    for n, node in project.models.items()
                    if tag in (node.config.get("tags") or [])
                }
            else:
                hits = {base} if base in project.models else set()
            if plus_children:
                hits = children_closure(project, hits)
            if plus_parents:
                hits = parents_closure(project, hits)
            chosen |= hits
        chosen = gap_fill(project, chosen)
    for ex in exclude or []:
        base = ex.strip("+")
        if base.startswith("tag:"):
            tag = base[4:]
            chosen -= {
                n
                for n, node in project.models.items()
                if tag in (node.config.get("tags") or [])
            }
        else:
            chosen.discard(base)
    return [n for n in order if n in chosen]
