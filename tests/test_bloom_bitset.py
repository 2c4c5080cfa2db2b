"""The Bloom decontamination probe's two representations must agree.

`contamination_bloom_probe` models the filter as a distinct-positions table
(relational form, join-able). The deployment form at 100 TB is a packed
bitmap: 1024 longs built with a map-side `bit_or` aggregate, broadcast to
every probe task. This test builds the packed bitmap for the same eval set
and proves both forms decide membership identically for every candidate
shingle — i.e. the registry query's semantics ARE the bitset's semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_spark_models_spark.operators.contamination import (
    _BLOOM_K,
    _BLOOM_M,
    _EVAL_SOURCE,
    _N,
    _bloom_pos_spark,
    _shingles_expr,
    _tokens,
)
from dbt_spark_models_spark.sources.testdata import load_tables

_WORDS = 64  # bits per long
_N_LONGS = _BLOOM_M // _WORDS


def _shingled(spark, sf_dir):
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        d.select("doc_id", "source", _tokens().alias("tokens"))
        .filter(F.size("tokens") >= _N)
        .select("doc_id", "source", F.expr(_shingles_expr()).alias("shingles"))
    )


def test_packed_bitmap_matches_positions_table(spark, sf_dir):
    sh = _shingled(spark, sf_dir)
    eval_grams = (
        sh.filter(F.col("source") == _EVAL_SOURCE)
        .select(F.explode("shingles").alias("g"))
        .distinct()
    )
    # position stream: (word index, bit mask) per (gram, hash j)
    pos = None
    for j in range(_BLOOM_K):
        p = eval_grams.select(_bloom_pos_spark(F.col("g"), j).alias("pos"))
        pos = p if pos is None else pos.unionAll(p)
    words = (
        pos.select(
            (F.col("pos") / _WORDS).cast("int").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORDS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    # pack to a python list once (this is the broadcast payload: 8 KB)
    packed = [0] * _N_LONGS
    for r in words.collect():
        packed[r["word"]] = r["bits"]
    assert len(packed) == _N_LONGS

    # membership via the bitset, computed row-locally with the broadcast
    # array — no join at all
    lit_bits = F.array(*[F.lit(v).cast("long") for v in packed])
    cand = (
        sh.filter(F.col("source") != _EVAL_SOURCE)
        .select("doc_id", F.explode("shingles").alias("g"))
        .distinct()
    )
    checks = [
        (
            F.bit_get(
                F.element_at(
                    lit_bits,
                    (_bloom_pos_spark(F.col("g"), j) / _WORDS).cast("int") + 1,
                ),
                (_bloom_pos_spark(F.col("g"), j) % _WORDS).cast("int"),
            )
            == 1
        )
        for j in range(_BLOOM_K)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    via_bitset = cand.select("doc_id", "g", cond.alias("bloom_positive"))

    # membership via the positions table (the registry query's form)
    bloom = None
    for j in range(_BLOOM_K):
        p = eval_grams.select(_bloom_pos_spark(F.col("g"), j).alias("pos"))
        bloom = p if bloom is None else bloom.unionAll(p)
    bloom = bloom.distinct()
    probes = cand.select(
        "doc_id",
        "g",
        F.explode(
            F.array(*[_bloom_pos_spark(F.col("g"), j) for j in range(_BLOOM_K)])
        ).alias("pos"),
    )
    via_table = (
        probes.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id", "g")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_positive"))
    )

    diff = via_bitset.join(via_table, ["doc_id", "g"]).filter(
        via_bitset.bloom_positive != via_table.bloom_positive
    )
    assert diff.count() == 0
    # sanity: the filter admits every true member (no false negatives, ever)
    truth = cand.join(eval_grams, "g", "left_semi")
    fn = truth.join(
        via_bitset.filter(~F.col("bloom_positive")), ["doc_id", "g"], "left_semi"
    )
    assert fn.count() == 0
    # and it has SOME false positives at this fill ratio (it's a Bloom
    # filter, not a set) — deterministic, so stable across runs
    n_pos = via_bitset.filter("bloom_positive").count()
    n_true = truth.count()
    assert n_pos >= n_true
