"""Round-5 operator invariants (non-DeltaLite additions)."""

import math

from dbt_spark_models_spark.sources.testdata import load_tables


def test_theta_sketch_overlap_bounds(spark, sf_dir):
    """KMV/theta intersection estimate must land inside the sketch's own
    error envelope against the exact |click ∩ view| the gate publishes,
    and the sample must be a subset of both sketches by construction."""
    from dbt_spark_models_spark.operators.aggregates import (
        agg_theta_sketch_overlap,
    )

    r = agg_theta_sketch_overlap(spark, sf_dir).collect()[0]
    k = 256
    assert r["exact_overlap"] >= 0
    assert 0 <= r["sample_size"] <= k
    # KMV relative standard error ~ 1/sqrt(k-1); allow 4 sigma plus an
    # absolute slack of 5 for tiny-overlap scale factors.
    tol = 4.0 / math.sqrt(k - 1) * max(r["exact_overlap"], 1) + 5
    assert abs(r["est_overlap"] - r["exact_overlap"]) <= tol, r


def test_theta_sketch_deterministic(spark, sf_dir):
    """Seeded md5 hashing makes the ESTIMATE itself reproducible — two
    independent evaluations return identical rows (this is what lets the
    driver hash-match an approximate operator)."""
    from dbt_spark_models_spark.operators.aggregates import (
        agg_theta_sketch_overlap,
    )

    a = agg_theta_sketch_overlap(spark, sf_dir).collect()
    b = agg_theta_sketch_overlap(spark, sf_dir).collect()
    assert a == b


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """The Poisson-bootstrap interval must contain the point estimate,
    be properly ordered, and both replicate-order statistics must come
    from B=64 replicate means."""
    from dbt_spark_models_spark.operators.quality import (
        eval_bootstrap_metric_ci,
    )

    r = eval_bootstrap_metric_ci(spark, sf_dir).collect()[0]
    assert r["b"] == 64
    assert r["ci_lo"] <= r["ci_hi"]
    # the mean of a full Poisson(1)-weighted resample concentrates around
    # the point estimate; the 95% interval must bracket it
    assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"], r


def test_bootstrap_ci_deterministic(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import (
        eval_bootstrap_metric_ci,
    )

    assert (
        eval_bootstrap_metric_ci(spark, sf_dir).collect()
        == eval_bootstrap_metric_ci(spark, sf_dir).collect()
    )


def test_cohens_kappa_identities(spark, sf_dir):
    """kappa == (po - pe) / (1 - pe) from the published po/pe, all three
    in their mathematical ranges."""
    from dbt_spark_models_spark.operators.quality import eval_cohens_kappa

    r = eval_cohens_kappa(spark, sf_dir).collect()[0]
    assert r["n"] > 0
    assert 0.0 <= r["po"] <= 1.0
    assert 0.0 <= r["pe"] <= 1.0
    assert -1.0 <= r["kappa"] <= 1.0
    expect = (r["po"] - r["pe"]) / (1.0 - r["pe"])
    assert abs(r["kappa"] - expect) < 2e-6, (r, expect)


def test_k_anonymity_flags_only_small_classes(spark, sf_dir):
    """Every flagged class really has n < 5, and the flagged set equals
    the brute-force recomputation from the raw table."""
    import pyspark.sql.functions as F

    from dbt_spark_models_spark.operators.quality import (
        quality_k_anonymity_audit,
    )

    rows = quality_k_anonymity_audit(spark, sf_dir).collect()
    assert all(r["n"] < 5 for r in rows)
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    brute = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): r["n"]
        for r in c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["n"] < 5
    }
    got = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): r["n"]
        for r in rows
    }
    assert got == brute


def test_dp_noise_is_laplace_shaped_and_consistent(spark, sf_dir):
    """noisy_n must equal exact_n + noise, the noise must be bounded by
    the inverse-CDF's guard ceiling, and the draw is deterministic."""
    from dbt_spark_models_spark.operators.quality import (
        quality_dp_noisy_counts,
    )

    rows = quality_dp_noisy_counts(spark, sf_dir).collect()
    assert len(rows) == 5  # one row per market segment
    for r in rows:
        assert abs((r["exact_n"] + r["noise"]) - r["noisy_n"]) < 2e-6
        assert abs(r["noise"]) <= 28.0  # ln(1e-12) guard ceiling
    assert rows == quality_dp_noisy_counts(spark, sf_dir).collect()


def test_ivf_partitioned_layout_prunes_scan(spark, sf_dir):
    """The physical ANN layout: one directory per IVF cell, and the
    query join on the partition column carries a dynamic-partition-
    pruning subquery on the corpus scan — the access path that reads
    ~1/n_cells of a 100 TB corpus. Results must equal the in-memory
    IVF top-k."""
    import os

    import pyspark.sql.functions as F

    from dbt_spark_models_spark.operators.similarity import (
        ivf_partitioned_corpus,
        sink_ivf_partitioned_layout,
        similarity_ivf_topk,
    )

    corpus, path = ivf_partitioned_corpus(spark, sf_dir, gate="pytest")
    cells = {
        d for d in os.listdir(path) if d.startswith("cell=")
    }
    n_cells = corpus.select("cell").distinct().count()
    assert len(cells) == n_cells  # one directory per assigned cell
    # the gate's join plans a DPP subquery on the partitioned scan
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    joined = F.broadcast(q).join(corpus.alias("a"), on="cell")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # access-path change, not an answer change
    got = {
        (r.q_id, r.neighbor_id, r.rnk)
        for r in sink_ivf_partitioned_layout(spark, sf_dir).collect()
    }
    expect = {
        (r.q_id, r.neighbor_id, r.rnk)
        for r in similarity_ivf_topk(spark, sf_dir).collect()
        if r.q_id < 3
    }
    assert got == expect
