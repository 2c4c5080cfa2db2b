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
