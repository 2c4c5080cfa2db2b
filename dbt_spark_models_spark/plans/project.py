"""Project loading: discovery of models, seeds, snapshots, tests.

Mirrors the reference's dbt project layout (``dbt_project.yml:5-43``,
SURVEY.md §3.1 stage 1): a project directory containing

    project.yml          name, vars, sources, model defaults
    models/**/*.sql      Jinja-templated SELECTs with {{ config(...) }}
    seeds/*.csv          version-controlled dimension tables
    snapshots/*.sql      SCD2 snapshot definitions (config block + SELECT)
    tests/*.sql          singular data tests (fail when rows returned)

project.yml is parsed with a minimal YAML-subset reader (flat keys +
one nesting level) so the engine has no dependency beyond stdlib; it
also accepts JSON.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any


def _parse_simple_yaml(text: str) -> dict[str, Any]:
    """Tiny YAML-subset parser: nested dicts by 2-space indent, scalars,
    flow lists. Enough for project.yml; full YAML is out of scope."""
    root: dict[str, Any] = {}
    stack: list[tuple[int, dict[str, Any]]] = [(-1, root)]
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        key, _, val = raw.strip().partition(":")
        val = val.strip()
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1]
        if not val:
            child: dict[str, Any] = {}
            parent[key] = child
            stack.append((indent, child))
        else:
            parent[key] = _parse_scalar(val)
    return root


def _parse_scalar(val: str) -> Any:
    if val.startswith("[") or val.startswith("{"):
        try:
            return json.loads(val.replace("'", '"'))
        except json.JSONDecodeError:
            return val
    low = val.lower()
    if low in ("true", "false"):
        return low == "true"
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    return val.strip("'\"")


@dataclass
class ModelNode:
    """One model/snapshot/test node (≈ the reference's manifest Node,
    ``infra/dbtjoom/types.py:46-92``)."""

    name: str
    path: str
    raw_sql: str
    kind: str = "model"  # model | snapshot | test | seed
    config: dict[str, Any] = field(default_factory=dict)
    depends_on: list[str] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)
    # the subset of depends_on reached via ref_changes() (captured at
    # parse time, both is_incremental branches): the Runner seeds these
    # models' consumed-version watermarks on a non-incremental build,
    # where the incremental branch never renders (r10 ADVICE #4 — a
    # raw-SQL regex misses dynamic targets like ref_changes(var(...)))
    cdf_depends_on: list[str] = field(default_factory=list)


@dataclass
class Project:
    root: str
    name: str = "project"
    vars: dict[str, Any] = field(default_factory=dict)
    sources: dict[str, dict[str, str]] = field(default_factory=dict)
    model_defaults: dict[str, Any] = field(default_factory=dict)
    seed_configs: dict[str, Any] = field(default_factory=dict)
    checks: dict[str, Any] = field(default_factory=dict)
    models: dict[str, ModelNode] = field(default_factory=dict)
    seeds: dict[str, str] = field(default_factory=dict)  # name -> csv path
    snapshots: dict[str, ModelNode] = field(default_factory=dict)
    tests: dict[str, ModelNode] = field(default_factory=dict)

    @classmethod
    def load(cls, root: str) -> "Project":
        cfg: dict[str, Any] = {}
        for fname in ("project.yml", "project.yaml", "project.json"):
            p = os.path.join(root, fname)
            if os.path.exists(p):
                with open(p) as f:
                    text = f.read()
                cfg = (
                    json.loads(text)
                    if fname.endswith(".json")
                    else _parse_simple_yaml(text)
                )
                break
        proj = cls(
            root=root,
            name=str(cfg.get("name", os.path.basename(root.rstrip("/")))),
            vars=dict(cfg.get("vars", {})),
            sources=dict(cfg.get("sources", {})),
            model_defaults=dict(cfg.get("models", {})),
            seed_configs=dict(cfg.get("seeds", {})),
            checks=dict(cfg.get("checks", {})),
        )
        proj._discover()
        return proj

    def _discover(self) -> None:
        mdir = os.path.join(self.root, "models")
        for dirpath, _, files in os.walk(mdir) if os.path.isdir(mdir) else []:
            for fn in sorted(files):
                if fn.endswith(".sql"):
                    name = fn[:-4]
                    path = os.path.join(dirpath, fn)
                    with open(path) as f:
                        self.models[name] = ModelNode(name, path, f.read())
        sdir = os.path.join(self.root, "seeds")
        if os.path.isdir(sdir):
            for fn in sorted(os.listdir(sdir)):
                if fn.endswith(".csv"):
                    self.seeds[fn[:-4]] = os.path.join(sdir, fn)
        pdir = os.path.join(self.root, "snapshots")
        if os.path.isdir(pdir):
            for fn in sorted(os.listdir(pdir)):
                if fn.endswith(".sql"):
                    with open(os.path.join(pdir, fn)) as f:
                        self.snapshots[fn[:-4]] = ModelNode(
                            fn[:-4], os.path.join(pdir, fn), f.read(), kind="snapshot"
                        )
        tdir = os.path.join(self.root, "tests")
        if os.path.isdir(tdir):
            for fn in sorted(os.listdir(tdir)):
                if fn.endswith(".sql"):
                    with open(os.path.join(tdir, fn)) as f:
                        self.tests[fn[:-4]] = ModelNode(
                            fn[:-4], os.path.join(tdir, fn), f.read(), kind="test"
                        )
