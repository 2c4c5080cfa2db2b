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
