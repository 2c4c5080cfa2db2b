"""Invariant tests for the round-3 session-4 operators (value-level
correctness is the DuckDB oracle gate; these check the semantic properties
the oracle can't express)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.grouped_pandas import (
    pandas_udaf_weighted_median,
)
from dbt_spark_models_spark.operators.quality import quality_distribution_drift
from dbt_spark_models_spark.operators.tokenizer import train_bpe_merges
from dbt_spark_models_spark.sources.testdata import load_tables


def test_bpe_merges_monotone_and_recounted(spark, sf_dir):
    rows = sorted(train_bpe_merges(spark, sf_dir).collect(), key=lambda r: r[0])
    assert [r["merge_round"] for r in rows] == [1, 2, 3]
    # pair frequency of the chosen merge can never increase round over
    # round: a merge only removes pair occurrences, and round r's top was
    # already available (and not chosen) in round r-1 unless it was created
    # or kept; the chosen max is non-increasing.
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 1 for c in counts)
    # round 1's top pair must equal the brute-force most frequent adjacent
    # token pair computed independently
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    tk = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    brute = (
        d.select(tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(tk, 1, size(tk) - 1),"
                    " slice(tk, 2, size(tk) - 1),"
                    " (a, b) -> struct(a AS l, b AS r))"
                )
            ).alias("p")
        )
        .groupBy("p.l", "p.r")
        .count()
        .orderBy(F.col("count").desc(), "l", "r")
        .first()
    )
    assert (rows[0]["l_tok"], rows[0]["r_tok"]) == (brute["l"], brute["r"])
    assert rows[0]["pair_count"] == brute["count"]


def test_weighted_median_is_a_price_and_bounded(spark, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in pandas_udaf_weighted_median(spark, sf_dir).collect():
        lo, hi = bounds[r["l_returnflag"]]
        assert lo <= r["weighted_median_price"] <= hi


def test_psi_drift_probabilities_and_total(spark, sf_dir):
    rows = quality_distribution_drift(spark, sf_dir).collect()
    assert rows
    # smoothed probabilities form (near-)distributions; psi_total is the
    # same on every row and equals the sum of terms
    for col in ("p_a", "p_b"):
        s = sum(r[col] for r in rows)
        assert math.isclose(s, 1.0, abs_tol=1e-4)
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1
    assert math.isclose(
        totals.pop(), sum(r["psi_term"] for r in rows), abs_tol=1e-5
    )
    # identical periods would give PSI 0; drift is always >= 0 in total
    assert all(r["n_a"] + r["n_b"] > 0 for r in rows)
    assert sum(r["psi_term"] for r in rows) >= -1e-12


def test_kcore_survivors_are_plausible(spark, sf_dir):
    from dbt_spark_models_spark.operators.clustering import (
        _KCORE_K,
        graph_kcore_peel,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    co = (
        a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    orig_deg = {
        r["node"]: r["d"]
        for r in co.select(F.col("u").alias("node"))
        .unionAll(co.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    rows = graph_kcore_peel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # peeling only removes edges: degree can't grow, and a survivor
        # must have had original degree >= k (necessary condition)
        assert 1 <= r["degree"] <= orig_deg[r["node"]]
        assert orig_deg[r["node"]] >= _KCORE_K


def test_ks_statistic_bounds(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import eval_ks_statistic

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    total = ev.count()
    row = eval_ks_statistic(spark, sf_dir).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n_a"] + row["n_b"] == total
    assert row["n_a"] > 0 and row["n_b"] > 0


def test_minhash_recall_counts_consistent(spark, sf_dir):
    from dbt_spark_models_spark.operators.dedup import dedup_minhash_recall

    rows = dedup_minhash_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_caught"] <= r["n_truth"]
        assert 0.0 <= r["recall"] <= 1.0
        assert abs(r["recall"] - r["n_caught"] / r["n_truth"]) < 1e-4


def test_chi2_terms_nonnegative_and_total(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import eval_chi_squared_drift

    rows = eval_chi_squared_drift(spark, sf_dir).collect()
    assert rows
    totals = {r["chi2_total"] for r in rows}
    assert len(totals) == 1
    assert all(r["chi2_term"] >= 0.0 for r in rows)
    assert math.isclose(
        totals.pop(), sum(r["chi2_term"] for r in rows), abs_tol=1e-4
    )
    assert rows[0]["dof"] == len(rows) - 1


def test_negative_samples_are_true_negatives(spark, sf_dir):
    from dbt_spark_models_spark.operators.curation import sample_negative_pairs

    li = load_tables(spark, sf_dir, ("orders", "lineitem"))
    pur = {
        (r["o_custkey"], r["l_partkey"])
        for r in li["orders"]
        .join(li["lineitem"], li["orders"]["o_orderkey"] == li["lineitem"]["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    rows = sample_negative_pairs(spark, sf_dir).collect()
    assert rows
    per_cust = {}
    for r in rows:
        # a sampled negative must never be a real purchase
        assert (r["o_custkey"], r["neg_partkey"]) not in pur
        assert r["rk"] in (1, 2)
        per_cust.setdefault(r["o_custkey"], set()).add(r["neg_partkey"])
    # no duplicate negatives within a customer
    assert all(len(v) == len(v) and len(v) <= 2 for v in per_cust.values())


def test_runner_erase_rewrites_only_matching_tables(spark, sf_dir, tmp_path):
    import os

    from dbt_spark_models_spark.plans import Project, Runner

    db = "erase_unit_db"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/erase_unit_db'")
    proj_dir = os.path.join(os.path.dirname(__file__), "..", "examples", "mini_mart")
    project = Project.load(proj_dir)
    runner = Runner(
        spark=spark,
        project=project,
        database=db,
        vars={"sf_dir": sf_dir, "cutoff_date": "2024-01-15"},
    )
    assert all(r.status == "success" for r in runner.seed())
    assert all(r.status == "success" for r in runner.run())
    before = spark.table(f"{db}.daily_user_stats")
    victims = [
        r["user_id"]
        for r in before.select("user_id").distinct().limit(3).collect()
    ]
    n_before = before.count()
    n_victim_rows = before.filter(F.col("user_id").isin(victims)).count()
    results = runner.erase("user_id", victims)
    assert results and all(r.status == "success" for r in results)
    # views are recomputed from upstreams, not rewritten in place
    assert all(r.action == "erase" for r in results)
    after = spark.table(f"{db}.daily_user_stats")
    assert after.filter(F.col("user_id").isin(victims)).count() == 0
    assert after.count() == n_before - n_victim_rows
    # event_type_log has no user_id column -> untouched by the sweep
    assert "event_type_log" not in {r.node for r in results}
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_logbucket_quantiles_within_relative_error(spark, sf_dir):
    from dbt_spark_models_spark.operators.aggregates import (
        agg_logbucket_quantiles,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
        for r in li.filter(F.col("l_extendedprice") > 0)
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for r in agg_logbucket_quantiles(spark, sf_dir).collect():
        for est, ex in zip(
            (r["p50_est"], r["p95_est"], r["p99_est"]), exact[r["l_returnflag"]]
        ):
            # bucket width 0.05 in log space -> ±2.5% plus the rank-vs-
            # midpoint convention gap; 6% is a safe hard bound
            assert abs(est - ex) / ex < 0.06


def test_transform_with_state_switch_counts(spark, sf_dir):
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs protobuf (not in container)")
    from pyspark.sql import Window as W

    from dbt_spark_models_spark.streaming import stream_user_type_switches

    got = {
        r["user_id"]: (r["n_events"], r["n_switches"])
        for r in stream_user_type_switches(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    exp = {
        r["user_id"]: (r["n_events"], r["n_switches"])
        for r in ev.withColumn("prev", F.lag("event_type").over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(
                F.col("prev").isNotNull()
                & (F.col("prev") != F.col("event_type"))
            ).alias("n_switches"),
        )
        .collect()
    }
    assert got == exp


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Catalyst's dynamic partition pruning must kick in when a
    partitioned fact joins a filtered dim: the fact scan receives a
    runtime `dynamicpruning` subquery filter, so only the partitions the
    dim filter selects are read — THE mechanism that makes star joins on a
    100 TB date-partitioned fact read days, not the table.

    Catalyst gotcha this test pins: the dim-side filter must be a
    COMPARISON (isLikelySelective) — a bare boolean attribute predicate
    (`WHERE is_hot`) does NOT qualify and silently disables DPP."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    fact_path = str(tmp_path / "events_by_day")
    (
        ev.withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim0 = fact.select("day").distinct().withColumn(
        "hot_rank", F.dayofmonth("day")
    )
    dim_path = str(tmp_path / "day_dim")
    dim0.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("hot_rank") <= 3)
    joined = fact.join(dim, "day").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = {r["event_type"]: r["n"] for r in joined.collect()}
    exp = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.dayofmonth(F.to_date("ts")) <= 3)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_rolling_hll_bounds_vs_exact(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import agg_hll_rolling_7d_users

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    days = ev.select(F.to_date("ts").alias("day"), "user_id")
    exact = {}
    for r in days.select("day").distinct().collect():
        d = r["day"]
        exact[d] = (
            days.filter(
                (F.col("day") <= F.lit(d))
                & (F.col("day") > F.date_sub(F.lit(d), 7))
            )
            .select("user_id")
            .distinct()
            .count()
        )
    rows = agg_hll_rolling_7d_users(spark, sf_dir).collect()
    assert {r["day"] for r in rows} == set(exact)
    for r in rows:
        assert 1 <= r["n_days_merged"] <= 7
        # the gate carries the exact rolling distinct plus the sketch's
        # own ±3% bound claim (lgk=12 -> ~1.6% standard error)
        assert r["users_7d_exact"] == exact[r["day"]]
        assert r["est_within_3pct"], (r["day"], r["users_7d_exact"])


def test_embedding_drift_bounds(spark, sf_dir):
    from dbt_spark_models_spark.operators.similarity import eval_embedding_drift

    rows = eval_embedding_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["centroid_cosine"] <= 1.0 + 1e-9
        assert abs((1.0 - r["centroid_cosine"]) - r["drift"]) < 1e-5
