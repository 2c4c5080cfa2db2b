"""Round-7 operator invariants: Bradley-Terry strengths, preference
pairs, pass@k, URL canonicalization, gradient-boost stumps, nearest
as-of join."""

from pyspark.sql import functions as F


def test_bradley_terry_strengths_are_positive_and_normalized(spark, sf_dir):
    from dbt_spark_models_spark.operators.preference import (
        curation_bradley_terry_strengths,
    )

    rows = curation_bradley_terry_strengths(spark, sf_dir).collect()
    assert rows, "no items estimated"
    strengths = [r.strength for r in rows]
    assert all(s > 0 for s in strengths)
    # sum-normalized to the item count (within final rounding)
    assert abs(sum(strengths) - len(strengths)) < 1e-3
    # win counts are consistent: total wins == half the directed matches
    assert sum(r.wins for r in rows) * 2 == sum(r.n_matches for r in rows)


def test_preference_pairs_have_nonnegative_margins(spark, sf_dir):
    from dbt_spark_models_spark.operators.preference import (
        pipeline_preference_pair_construction,
    )

    rows = pipeline_preference_pair_construction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # chosen ranks above rejected by construction
        assert r.min_margin >= 0, r
        assert r.max_margin >= r.avg_margin >= r.min_margin


def test_pass_at_k_bounds_and_monotonicity(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import eval_pass_at_k

    row = eval_pass_at_k(spark, sf_dir).collect()[0]
    assert 0.0 <= row.pass_at_1 <= row.pass_at_5 <= 1.0  # pass@k grows in k
    assert row.n_problems > 0


def test_url_canonicalization_collapses_noise_only(spark, sf_dir):
    from dbt_spark_models_spark.operators.dedup import (
        dedup_url_canonical_groups,
    )

    rows = dedup_url_canonical_groups(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_canonical <= r.n_urls
        assert r.n_dups == r.n_urls - r.n_canonical
        # canonical groups are bounded by the synthetic key space
        # (path bucket x whitelisted ref param): 50 paths x 5 langs
        assert r.n_canonical <= 250


def test_gradient_boost_round2_reduces_mse(spark, sf_dir):
    from dbt_spark_models_spark.operators.quality import (
        train_gradient_boost_stumps,
    )

    row = train_gradient_boost_stumps(spark, sf_dir).collect()[0]
    assert row.mse_round2 <= row.mse_round1  # boosting never hurts train MSE
    assert 0.0 < row.f1_low < 1.0 and 0.0 < row.f1_high < 1.0
    assert 1 <= row.split_month <= 12


def test_asof_nearest_agrees_with_backward_when_backward_wins(spark, sf_dir):
    """Where direction='backward', the nearest join must pick exactly the
    backward as-of join's answer; forward picks must be strictly closer
    than any backward candidate."""
    from dbt_spark_models_spark.operators.joins import (
        join_asof,
        join_asof_nearest,
    )

    nearest = join_asof_nearest(spark, sf_dir)
    backward = join_asof(spark, sf_dir).select(
        "event_id", F.col("last_view_ts").alias("b_ts")
    )
    j = nearest.join(backward, "event_id")
    # backward-direction rows agree with the backward-only operator
    mismatch = j.filter(
        (F.col("direction") == "backward")
        & (F.col("nearest_view_ts") != F.col("b_ts"))
    ).count()
    assert mismatch == 0
    # forward rows are strictly closer than the backward candidate (or
    # there was no backward candidate at all)
    fwd_bad = j.filter(
        (F.col("direction") == "forward")
        & F.col("b_ts").isNotNull()
        & (
            F.unix_micros("nearest_view_ts") - F.unix_micros("ts")
            >= F.unix_micros("ts") - F.unix_micros("b_ts")
        )
    ).count()
    assert fwd_bad == 0
    assert nearest.filter(F.col("gap_us") < 0).count() == 0


def test_markov_transition_rows_are_distributions(spark, sf_dir):
    from dbt_spark_models_spark.operators.funnels import (
        funnel_markov_transitions,
    )

    rows = funnel_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r.p)
        assert r.n_transitions > 0
    for src, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 1e-3, (src, sum(ps))  # rows normalize
    # the absorbing state absorbs: one <end> transition per user
    ends = sum(r.n_transitions for r in rows if r.to_type == "<end>")
    from dbt_spark_models_spark.sources.testdata import load_tables

    n_users = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select("user_id")
        .distinct()
        .count()
    )
    assert ends == n_users
