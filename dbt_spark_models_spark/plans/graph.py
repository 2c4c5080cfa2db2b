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


def changed_models(project: Project, base_ref: str = "origin/master") -> set[str]:
    """Model/snapshot names whose SOURCE FILE differs from ``base_ref``,
    is modified in the working tree, or is untracked — the reference's
    changed-file detection (``infra/dbtjoom/utils.py:28-34``: index vs
    origin/master + unstaged + untracked), mapped onto nodes by file
    path (``infra/dbtjoom/find.py:49-51`` ``is_changed``). Nodes without
    an on-disk path (inline tests) never match. Git failures (no repo,
    unknown ref) contribute nothing rather than raising — CI decides
    whether an empty selection is an error."""
    import os
    import subprocess

    root = os.path.abspath(project.root)
    changed: set[str] = set()
    for cmd in (
        ["git", "diff", "--name-only", base_ref],
        ["git", "diff", "--name-only"],
        ["git", "ls-files", "--others", "--exclude-standard"],
    ):
        try:
            out = subprocess.run(
                cmd, cwd=root, capture_output=True, text=True, check=True
            ).stdout
        except Exception:  # noqa: BLE001 — missing git/ref: contribute nothing
            continue
        changed.update(ln.strip() for ln in out.splitlines() if ln.strip())
    # run from a subdirectory of the git repo: git paths are repo-relative;
    # resolve both sides to absolute paths for the comparison
    try:
        top = subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            cwd=root, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        top = root
    changed_abs = {os.path.abspath(os.path.join(top, p)) for p in changed}
    out_names: set[str] = set()
    for name, node in {**project.models, **project.snapshots}.items():
        p = node.path
        if not p or p == "inline":
            continue
        if os.path.abspath(os.path.join(root, p)) in changed_abs or (
            os.path.isabs(p) and os.path.abspath(p) in changed_abs
        ):
            out_names.add(name)
    return out_names


def select_changed(
    project: Project,
    base_ref: str = "origin/master",
    dependencies: str | None = None,
) -> list[str]:
    """``--changed-only`` selection in topo order (reference
    ``find_nodes(changed_only=True, select_dependencies=...)``,
    ``infra/dbtjoom/find.py:93-106``):

    - ``dependencies=None``: exactly the changed models;
    - ``'fill_gaps'``: changed models plus every intermediate node on a
      dependency path between two of them;
    - ``'all_children'``: the changed models' transitive DESCENDANTS
      (reference parity: ``find_children_models`` collects each node's
      children only, never the node itself — a changed node appears in
      the result only when it descends from ANOTHER changed node; the
      CI pairs this with the changed set itself when it wants both)."""
    changed = {n for n in changed_models(project, base_ref) if n in project.models}
    if dependencies == "fill_gaps":
        chosen = gap_fill(project, changed)
    elif dependencies == "all_children":
        chosen = set()
        for n in changed:
            chosen |= children_closure(project, {n}) - {n}
    else:
        chosen = changed
    return [n for n in build_order(project) if n in chosen]


def failed_models(project: Project, target_dir: str | None = None) -> set[str]:
    """Node names whose LAST run_results status was not success — the
    reference's retry selection (``find_nodes(failed_only=True)``,
    ``infra/dbtjoom/find.py:108-110`` over dbt's run_results.json)."""
    import json
    import os

    path = os.path.join(
        target_dir or os.path.join(project.root, "target"), "run_results.json"
    )
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        payload = json.load(f)
    out: set[str] = set()
    for res in payload.get("results", []):
        if res.get("status") == "success":
            continue
        uid = res.get("unique_id", "")
        out.add(uid.rsplit(".", 1)[-1])
    return out
