"""--changed-only / --failed-only selection (SURVEY §3.1 stage 3; the
reference's ``infra/dbtjoom`` changed-file detection vs origin/master +
working-tree + untracked, ``utils.py:28-34`` / ``find.py:49-110``):
git-based changed-model detection, dependency expansion modes, retry
selection from run_results, and the CLI slim-CI flow end-to-end.
"""

from __future__ import annotations

import json
import os
import subprocess

from dbt_spark_models_spark.plans import graph
from dbt_spark_models_spark.plans.project import ModelNode, Project

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(cwd, *args):
    subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True,
        env={**os.environ,
             "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
             "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"},
    )


def _chain_project(root=".") -> Project:
    # a -> b -> c
    return Project(
        root=root,
        name="chg",
        models={
            "a": ModelNode("a", "models/a.sql", "SELECT 1"),
            "b": ModelNode("b", "models/b.sql", "SELECT 1",
                           depends_on=["a"]),
            "c": ModelNode("c", "models/c.sql", "SELECT 1",
                           depends_on=["b"]),
        },
    )


def test_changed_models_git_detection(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "models"))
    for m in ("a", "b"):
        with open(os.path.join(root, "models", f"{m}.sql"), "w") as f:
            f.write("SELECT 1\n")
    _git(root, "init", "-q")
    _git(root, "add", "-A")
    _git(root, "commit", "-qm", "init")
    _git(root, "branch", "base")
    # b: committed change vs base; c: untracked new file; a: untouched
    with open(os.path.join(root, "models", "b.sql"), "a") as f:
        f.write("-- changed\n")
    _git(root, "add", "models/b.sql")
    _git(root, "commit", "-qm", "change b")
    with open(os.path.join(root, "models", "c.sql"), "w") as f:
        f.write("SELECT 2\n")
    proj = _chain_project(root)
    assert graph.changed_models(proj, base_ref="base") == {"b", "c"}
    # unknown base ref: committed diffs invisible, untracked still caught
    assert graph.changed_models(proj, base_ref="no_such_ref") == {"c"}


def test_select_changed_dependency_modes(monkeypatch):
    proj = _chain_project()
    monkeypatch.setattr(graph, "changed_models", lambda p, base_ref: {"a", "c"})
    # bare: exactly the changed models, topo order
    assert graph.select_changed(proj, "x") == ["a", "c"]
    # fill_gaps: the intermediate b on the a->b->c path joins
    assert graph.select_changed(proj, "x", "fill_gaps") == ["a", "b", "c"]
    # all_children (reference parity): descendants only — c appears
    # because it descends from changed a, a itself does not
    assert graph.select_changed(proj, "x", "all_children") == ["b", "c"]


def test_failed_models_from_run_results(tmp_path):
    proj = _chain_project(str(tmp_path))
    target = tmp_path / "target"
    target.mkdir()
    (target / "run_results.json").write_text(json.dumps({
        "results": [
            {"unique_id": "model.chg.a", "status": "success"},
            {"unique_id": "model.chg.b", "status": "error"},
            {"unique_id": "model.chg.c", "status": "skipped"},
            {"unique_id": "test.chg.t1", "status": "fail"},
        ]
    }))
    assert graph.failed_models(proj) == {"b", "c", "t1"}
    assert graph.failed_models(proj, target_dir=str(tmp_path / "nope")) == set()


def test_changed_only_slim_ci_flow(spark, tmp_path):
    """The reference's PR flow: full build once, then a source edit →
    the changed-only selection rebuilds exactly the touched model (via
    Runner.run(names=...), the same path the CLI's --changed-only takes;
    one session, since the test catalog is in-memory — production
    metastores persist views across invocations)."""
    import shutil

    from dbt_spark_models_spark.plans.project import Project as P
    from dbt_spark_models_spark.plans.runner import Runner

    root = str(tmp_path / "proj")
    shutil.copytree(os.path.join(REPO, "examples", "mini_mart"), root)
    _git(root, "init", "-q")
    _git(root, "add", "-A")
    _git(root, "commit", "-qm", "init")
    _git(root, "branch", "-M", "master")

    db = "chg_ci_flow"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_chg/{db}", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '/tmp/spark_models_chg/{db}'")
    vars_ = {"sf_dir": "/root/testdata/sf0.001"}
    full = Runner(
        spark=spark, project=P.load(root), database=db, vars=vars_
    ).build()
    assert all(r.status == "success" for r in full), full

    # touch one model (comment only — plan identical, file changed)
    with open(os.path.join(root, "models", "daily_user_stats.sql"), "a") as f:
        f.write("\n-- slim-ci touch\n")
    proj2 = P.load(root)
    names = graph.select_changed(proj2, "master")
    assert names == ["daily_user_stats"], names
    slim = Runner(
        spark=spark, project=proj2, database=db, vars=vars_
    ).run(names=names)
    assert [(r.node, r.status) for r in slim] == [
        ("daily_user_stats", "success")
    ], slim
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_cli_changed_only_no_match_is_clean_noop(tmp_path):
    """CLI flag wiring: a clean tree with no changes vs base selects
    nothing, reports it, and exits 0."""
    import shutil
    import sys

    root = str(tmp_path / "proj")
    shutil.copytree(os.path.join(REPO, "examples", "mini_mart"), root)
    _git(root, "init", "-q")
    _git(root, "add", "-A")
    _git(root, "commit", "-qm", "init")
    _git(root, "branch", "-M", "master")
    r = subprocess.run(
        [
            sys.executable, "-m", "dbt_spark_models_spark.plans.cli",
            "run", "--changed-only", "--base-ref", "master",
            "--project", root,
            "--vars", json.dumps({"sf_dir": "/root/testdata/sf0.001"}),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert "matched no models" in r.stdout
