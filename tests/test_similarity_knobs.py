"""ANN sizing knobs (SCALE.md): sign-LSH plane count and IVF sub-cell
refinement must scale bucket/cell counts predictably — the VERDICT r1
requirement that 8-bit buckets / per-label cells not be hard-coded."""

import pyspark.sql.functions as F
import pytest

from dbt_spark_models_spark.operators.similarity import (
    _ivf_assigned,
    cosine_near_dup_pairs,
    lsh_bucket_histogram,
    sign_lsh_signature,
)
from dbt_spark_models_spark.sources.testdata import load_tables


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"].cache()


def test_signature_width_matches_n_planes(emb):
    row = emb.select(
        sign_lsh_signature("embedding", 8).alias("s8"),
        sign_lsh_signature("embedding", 12).alias("s12"),
    ).first()
    assert len(row.s8) == 8 and len(row.s12) == 12
    # planes are prefix-stable: wider signatures refine, never remap
    assert row.s12[:8] == row.s8


def test_more_planes_refine_buckets(emb):
    h8 = lsh_bucket_histogram(emb, 8).count()
    h12 = lsh_bucket_histogram(emb, 12).count()
    assert h12 > h8  # more planes → strictly more (smaller) buckets here
    # and the max bucket shrinks or stays equal
    m8 = lsh_bucket_histogram(emb, 8).agg(F.max("n_vecs")).first()[0]
    m12 = lsh_bucket_histogram(emb, 12).agg(F.max("n_vecs")).first()[0]
    assert m12 <= m8


def test_near_dup_candidates_subset_under_refinement(emb):
    pairs8 = {
        (r.vec_a, r.vec_b)
        for r in cosine_near_dup_pairs(emb, n_planes=8).collect()
    }
    pairs10 = {
        (r.vec_a, r.vec_b)
        for r in cosine_near_dup_pairs(emb, n_planes=10).collect()
    }
    assert pairs10 <= pairs8  # refinement only splits buckets


def test_ivf_sub_bits_multiply_cells(emb):
    base = _ivf_assigned(emb)
    refined = _ivf_assigned(emb, sub_bits=2)
    n = emb.count()
    # total assignment: every vector in exactly one cell, both ways
    assert base.count() == n and refined.count() == n
    base_cells = base.select("cell").distinct().count()
    refined_cells = refined.select("cell").distinct().count()
    assert base_cells < refined_cells <= base_cells * 4
    # refined cell id embeds its parent cell (partition-pruning compatible)
    bad = refined.filter(
        F.split(F.col("cell"), "/")[0].isin(
            [r.cell for r in base.select("cell").distinct().collect()]
        )
        == False  # noqa: E712
    ).count()
    assert bad == 0
