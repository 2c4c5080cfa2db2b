"""Invariant tests for the round-3 session-3 operators (value-level
correctness is the DuckDB oracle gate; these check the semantic properties
the oracle can't express — bounds, losslessness vs brute force, partial
re-aggregation equivalence)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.aggregates import (
    agg_multigrain_rollup_reuse,
)
from dbt_spark_models_spark.operators.dedup import (
    dedup_containment_pairs,
    dedup_edit_distance_blocked,
)
from dbt_spark_models_spark.operators.engine_gate import (
    engine_snapshot_table_diff,
)
from dbt_spark_models_spark.operators.funnels import (
    spine_forward_fill_daily,
    window_interval_coverage,
)
from dbt_spark_models_spark.operators.quality import (
    agg_bitmap_exact_distinct,
    eval_calibration_curve,
    quality_profile_table_stats,
    train_group_ols_regression,
)
from dbt_spark_models_spark.sources.testdata import load_tables


def test_interval_coverage_bounds(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = window_interval_coverage(spark, sf_dir).collect()
    assert set(r["user_id"] for r in rows) == set(per_user)
    for r in rows:
        n = per_user[r["user_id"]]
        # each event opens a 30-min interval: union is at least one
        # interval and at most n disjoint intervals
        assert 1 <= r["n_islands"] <= n
        assert 1800.0 <= r["covered_sec"] <= 1800.0 * n
        # islands of merged 30-min intervals each cover >= 30 min
        assert r["covered_sec"] >= 1800.0 * r["n_islands"]


def test_forward_fill_carries_last_observation(spark, sf_dir):
    rows = spine_forward_fill_daily(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        assert len(rs) == 30  # complete spine
        last = None
        for r in rs:
            if r["is_observed"]:
                assert r["filled_value"] is not None
                last = r["filled_value"]
            else:
                assert r["filled_value"] == last  # LOCF (None before first)


def test_ols_matches_numpy_per_group(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    pdf = (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .select("p_brand", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    got = {r["p_brand"]: r for r in train_group_ols_regression(spark, sf_dir).collect()}
    for brand, g in pdf.groupby("p_brand"):
        slope, intercept = np.polyfit(
            g["l_quantity"].astype(float), g["l_extendedprice"].astype(float), 1
        )
        assert abs(got[brand]["slope"] - slope) < 1e-4, brand
        assert abs(got[brand]["intercept"] - intercept) < 1e-3, brand
        assert 0.0 <= got[brand]["r2"] <= 1.0


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    exact = {
        (r["event_type"], r["month"]): r["n"]
        for r in ev.groupBy(
            "event_type", F.date_trunc("month", "ts").cast("date").alias("month")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        (r["event_type"], r["month"]): r["n_users"]
        for r in agg_bitmap_exact_distinct(spark, sf_dir).collect()
    }
    assert got == exact


def test_containment_lossless_vs_bruteforce(spark, sf_dir):
    d = load_tables(spark, sf_dir, ("documents",))["documents"].collect()
    toks = {
        r["doc_id"]: set(
            t for t in __import__("re").split(r"[^a-z0-9]+", r["text"].lower()) if t
        )
        for r in d
    }
    expected = set()
    ids = sorted(toks)
    for a in ids:
        for b in ids:
            if a != b and len(toks[a] & toks[b]) * 10 >= len(toks[a]) * 9:
                expected.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_containment_pairs(spark, sf_dir).collect()
    }
    assert got == expected  # prefix filter provably loses nothing


def test_edit_distance_pairs_within_declared_blocks(spark, sf_dir):
    rows = dedup_edit_distance_blocked(spark, sf_dir).collect()
    assert rows
    docs = {
        r["doc_id"]: r
        for r in load_tables(spark, sf_dir, ("documents",))["documents"].collect()
    }
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["rel_dist"] <= 0.25
        a, b = docs[r["doc_a"]], docs[r["doc_b"]]
        assert a["lang"] == b["lang"]
        assert len(a["text"]) // 40 == len(b["text"]) // 40


def test_snapshot_diff_classification(spark, sf_dir):
    rows = engine_snapshot_table_diff(spark, sf_dir).collect()
    assert rows
    keys = [r["o_custkey"] for r in rows]
    assert len(keys) == len(set(keys))  # one verdict per key
    for r in rows:
        assert r["change_type"] in ("added", "changed")  # cutoffs only grow
        assert r["new_n_orders"] is not None


def test_calibration_bins_partition_corpus(spark, sf_dir):
    rows = eval_calibration_curve(spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_docs = docs.filter(F.length("text") > 0).count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert abs(r["calib_gap"] - round(r["mean_pred"] - r["frac_pos"], 6)) <= 1e-6


def test_profile_stats_shape(spark, sf_dir):
    rows = {r["column_name"]: r for r in quality_profile_table_stats(spark, sf_dir).collect()}
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    n = o.count()
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate",
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key


def test_multigrain_reuse_matches_direct_monthly(spark, sf_dir):
    got = {
        (r["n_name"], r["month"]): (r["month_rev"], r["month_orders"], r["n_active_days"])
        for r in agg_multigrain_rollup_reuse(spark, sf_dir).collect()
    }
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    direct = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["nation"], F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("rev"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.col("o_orderdate").cast("date")).alias("days"),
        )
        .collect()
    )
    assert got == {
        (r["n_name"], r["month"]): (r["rev"], r["n"], r["days"]) for r in direct
    }
