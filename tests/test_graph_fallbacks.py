"""Broadcast-ceiling audit across the iterative graph ops (VERDICT r9 #3):
BFS gets the PageRank treatment — a conf-gated frontier-size auto-select
between broadcast and co-partitioned frontier joins, hash-identical on
both paths, plan-asserted no-broadcast on the fallback. Triangle
counting, k-core, and LPA must not FORCE any broadcast (no F.broadcast
hint on node-scale degree/label/edge tables): join strategy stays with
Spark's size-based selection, proven by running them with
autoBroadcastJoinThreshold=-1 (pure shuffle-join world) and getting
identical results.
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.clustering import (
    _BFS_MODE_CONF,
    _bfs_expand,
    graph_bfs_hops,
    graph_kcore_peel,
    graph_label_propagation,
    graph_triangle_copurchase,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _with_conf(spark, key, value, fn):
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, value)
        return fn()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_bfs_both_paths_identical(spark, sf_dir):
    base = _rows(graph_bfs_hops(spark, sf_dir))
    fb = _with_conf(
        spark, _BFS_MODE_CONF, "0", lambda: _rows(graph_bfs_hops(spark, sf_dir))
    )
    assert base == fb
    assert base  # non-degenerate: the seed cohort reaches something


def test_bfs_fallback_expand_plan_has_no_broadcast(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    frontier = spark.createDataFrame([("a",)], "node string")
    fb = _bfs_expand(edges, frontier, 1, 0, 4, {"edges_by_src": None})
    plan = fb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    bc = _bfs_expand(edges, frontier, 1, 10, 4, {"edges_by_src": None})
    bc_plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in bc_plan


def test_bfs_fallback_shuffles_edges_once(spark):
    """The co-partitioned edge layout must be built on the FIRST big
    round and memoized for the rest — one edge-sized shuffle total."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    frontier = spark.createDataFrame([("a",)], "node string")
    state = {"edges_by_src": None}
    _bfs_expand(edges, frontier, 1, 0, 4, state)
    first = state["edges_by_src"]
    assert first is not None
    _bfs_expand(edges, frontier, 1, 0, 4, state)
    assert state["edges_by_src"] is first
    first.unpersist()


@pytest.mark.parametrize(
    "fn",
    [graph_triangle_copurchase, graph_kcore_peel, graph_label_propagation],
    ids=["triangle", "kcore", "lpa"],
)
def test_graph_ops_force_no_broadcast(fn, spark, sf_dir):
    """No F.broadcast hint in the op source (Spark's size-based selection
    owns the decision), and the op survives — identically — in a world
    where nothing is broadcast-eligible at all."""
    assert "F.broadcast(" not in inspect.getsource(fn.fn if hasattr(fn, "fn") else fn)
    f = fn.fn if hasattr(fn, "fn") else fn
    base = _rows(f(spark, sf_dir))
    shuffled = _with_conf(
        spark,
        "spark.sql.autoBroadcastJoinThreshold",
        "-1",
        lambda: _rows(f(spark, sf_dir)),
    )
    assert base == shuffled
    assert base
