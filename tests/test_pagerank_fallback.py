"""PageRank strategy auto-selection (VERDICT r8 #4): the broadcast path
and the co-partitioned fallback must produce identical ranks, the
fallback plan must not broadcast the rank side, and the node-count probe
must pick the fallback past the configured threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.clustering import (
    _PR_MODE_CONF,
    _pagerank_loop,
)


def _graph(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
            ("c", "d"), ("d", "c"), ("d", "a"), ("a", "d"),
            ("e", "a"), ("a", "e"), ("e", "b"), ("b", "e"),
        ],
        "src string, dst string",
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n_nodes = float(deg.count())  # the 1-row probe graph_pagerank performs
    return edges, deg, n_nodes


def _ranks(spark, broadcast_ranks):
    edges, nodes, n_nodes = _graph(spark)
    out = _pagerank_loop(
        edges, nodes, n_nodes, 4, broadcast_ranks=broadcast_ranks
    )
    return out.select("node", F.round("r", 6).alias("r"))


def test_both_paths_identical_to_1e6(spark):
    bc = {r["node"]: r["r"] for r in _ranks(spark, True).collect()}
    cp = {r["node"]: r["r"] for r in _ranks(spark, False).collect()}
    assert bc == cp
    assert abs(sum(bc.values()) - 1.0) < 1e-4


def test_fallback_plan_has_no_broadcast(spark):
    plan = _ranks(spark, False)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    bc_plan = _ranks(spark, True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in bc_plan


@pytest.mark.slow  # 38s: two full real-data pagerank runs — slow tier (r12)
def test_threshold_conf_selects_fallback(spark, sf_dir):
    """With the threshold forced to 0 the gate query must still produce
    the same result it produces on the broadcast path (hash-equal)."""
    from dbt_spark_models_spark.operators.clustering import graph_pagerank

    default = spark.conf.get(_PR_MODE_CONF, None)
    base = {
        (r["node"],): (r["degree"], r["pagerank"])
        for r in graph_pagerank(spark, sf_dir).collect()
    }
    try:
        spark.conf.set(_PR_MODE_CONF, "0")
        fb = {
            (r["node"],): (r["degree"], r["pagerank"])
            for r in graph_pagerank(spark, sf_dir).collect()
        }
    finally:
        if default is None:
            spark.conf.unset(_PR_MODE_CONF)
        else:
            spark.conf.set(_PR_MODE_CONF, default)
    assert base == fb
