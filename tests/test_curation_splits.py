"""Invariants of the sampling/split curation operators beyond the oracle
hash gate: exact per-stratum proportions, leakage-freeness, repeat-plan
budget accounting, and cleaned-corpus properties of span removal."""

import math

from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import load_all

REGISTRY = load_all()


def test_stratified_split_exact_proportions(spark, sf_dir):
    out = REGISTRY["curation_stratified_split"].fn(spark, sf_dir)
    per = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    langs = {l for l, _ in per}
    for lang in langs:
        n = sum(per.get((lang, s), 0) for s in ("train", "val", "test"))
        assert per.get((lang, "train"), 0) == math.ceil(0.8 * n)
        assert per.get((lang, "train"), 0) + per.get((lang, "val"), 0) == math.ceil(
            0.9 * n
        )
    # leakage-free: each doc in exactly one split
    total = out.count()
    assert out.select("doc_id").distinct().count() == total


def test_temperature_resample_budget_and_flattening(spark, sf_dir):
    out = REGISTRY["curation_temperature_resample"].fn(spark, sf_dir).collect()
    docs = REGISTRY["curation_stratified_split"].fn(spark, sf_dir)
    cnt = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(cnt.values())
    # exact p^alpha targets recomputed in python
    alpha = 0.5
    pa = {l: (c / total) ** alpha for l, c in cnt.items()}
    s = sum(pa.values())
    target = {l: math.floor(pa[l] / s * total) for l in cnt}
    got = {}
    for r in out:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_repeats"] * r["n_docs"]
    for lang in cnt:
        assert got[lang] == target[lang], (lang, got[lang], target[lang])
    # flattening: any lang rarer than another never gets a SMALLER target
    for a in cnt:
        for b in cnt:
            if cnt[a] < cnt[b]:
                assert target[a] <= target[b] + 1  # floor jitter
                # upsampling ratio grows as counts shrink
                assert target[a] / cnt[a] >= target[b] / cnt[b] - 1e-9


def test_span_removal_is_lossless_on_unique_spans(spark, sf_dir):
    """Every 20-token span in the cleaned corpus appears exactly once, and
    kept+dropped spans account for every original span."""
    out = REGISTRY["dedup_span_removal_reassembled"].fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_kept_chunks").alias("kept"),
        F.sum("n_dropped_chunks").alias("dropped"),
    ).collect()[0]
    # re-chunk the cleaned text: every chunk globally unique now
    rechunk = (
        out.filter(F.length("clean_text") > 0)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(clean_text, ' ')) / 20)) - 1),"
                    " i -> array_join(slice(split(clean_text, ' '), i * 20 + 1, 20), ' '))"
                )
            ).alias("chunk")
        )
        .groupBy("chunk")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert rechunk == 0
    assert agg["kept"] > 0 and agg["kept"] + agg["dropped"] >= agg["kept"]
