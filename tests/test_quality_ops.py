"""Invariant tests for quality.py operators (the value-level gate is the
DuckDB oracle; these check structural/semantic properties pytest-fast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.quality import (
    agg_hll_mergeable_distinct,
    dedup_semantic_survivors,
    text_length_histogram,
    text_quality_linear_score,
)


def test_linear_score_keep_consistent(spark, sf_dir):
    df = text_quality_linear_score(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["keep_prob"] <= 1.0
        # keep flag == (prob >= 0.5) away from the rounding boundary
        if abs(r["keep_prob"] - 0.5) > 1e-3:
            assert r["keep"] == (r["keep_prob"] > 0.5), r


def test_semantic_survivors_first_in_cell_kept(spark, sf_dir):
    df = dedup_semantic_survivors(spark, sf_dir)
    first = (
        df.groupBy("assigned_cell")
        .agg(F.min("vec_id").alias("first_id"))
        .join(df, F.col("first_id") == F.col("vec_id"))
        .collect()
    )
    assert first
    # the lowest-id vector in each cell can never be a duplicate
    for r in first:
        assert not r["is_dup"], r
    # every vector appears exactly once
    assert df.count() == df.select("vec_id").distinct().count()


def test_length_histogram_shares(spark, sf_dir):
    rows = text_length_histogram(spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        total_share = sum(r["share"] for r in rs)
        assert abs(total_share - 1.0) < 0.01, (lang, total_share)
        last = max(rs, key=lambda r: r["bucket"])
        assert abs(last["cum_share"] - 1.0) < 1e-6
        for r in rs:
            assert r["lo_chars"] == r["bucket"] * 200
            assert 0 <= r["bucket"] <= 9


def test_hll_estimates_within_tolerance(spark, sf_dir):
    from dbt_spark_models_spark.sources.testdata import load_tables

    got = {
        r["group_key"]: r
        for r in agg_hll_mergeable_distinct(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, r in got.items():
        # the gate carries the exact count plus the sketch's own ±3%
        # bound claim (lgk=12 → ~1.6% standard error)
        assert r["exact_users"] == exact[k], (k, r)
        assert r["est_within_3pct"], (k, r)


def test_ivf_topk_exact_within_probe_cell(spark, sf_dir):
    """IVF's contract: within the probed cell, results are EXACTLY the
    brute-force cosine top-3 (the index prunes cells, never ranks wrong).
    Checked by recomputing the within-cell ranking from the shared
    quantizer. (Full-corpus recall is ~1/n_cells here by construction —
    the synthetic embeddings are isotropic, so nprobe=1 can't do better
    on this data; correctness of the pruning contract is the invariant.)"""
    import math

    from dbt_spark_models_spark.operators.similarity import (
        _ivf_assigned,
        similarity_ivf_topk,
    )
    from dbt_spark_models_spark.sources.testdata import load_tables

    e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    assigned = {
        r["vec_id"]: (r["cell"], list(r["embedding"]))
        for r in _ivf_assigned(e).collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(dot / (na * nb), 4)

    ivf = {}
    for r in similarity_ivf_topk(spark, sf_dir).collect():
        ivf.setdefault(r["q_id"], []).append((r["rnk"], r["neighbor_id"]))
    assert ivf, "IVF returned nothing"
    for q_id, got in ivf.items():
        cell, q_emb = assigned[q_id]
        in_cell = [
            (-cos(q_emb, emb), vid)
            for vid, (c, emb) in assigned.items()
            if c == cell and vid != q_id
        ]
        expect = [vid for _, vid in sorted(in_cell)[:3]]
        assert [v for _, v in sorted(got)] == expect, (q_id, got, expect)
