"""Quality-classifier scoring, semantic dedup, corpus histograms, and
mergeable distinct-count sketches.

Beyond-reference surface (BASELINE.json north star), rounding out the
LLM-data-curation families:

- ``text_quality_linear_score``: closed-form linear quality classifier
  (fixed weights over engineered features + sigmoid) — the shape of a
  fasttext/logistic quality gate, expressed entirely as JVM-side column
  math so it streams row-local over 100 TB with zero shuffles.
- ``dedup_semantic_survivors``: SemDedup-style embedding dedup — coarse
  k-cell assignment (per-label centroids, same quantizer as
  ``similarity_ivf_assign``) confines pairwise cosine checks to within a
  cell; a vector is a duplicate if a lower-id in-cell neighbor is within
  the cosine threshold.
- ``text_length_histogram``: fixed-width per-language length histogram
  with share / cumulative share — the corpus-composition report every
  curation run emits.
- ``agg_hll_mergeable_distinct``: Apache DataSketches HLL via
  ``hll_sketch_agg`` / ``hll_union_agg`` — partial sketches merge
  associatively across partitions *and across groups*, which is the only
  way distinct counting scales to 100 TB (exact COUNT(DISTINCT) is a
  full shuffle of every key). Rows-only gate: sketch internals are
  engine-specific (no DuckDB equivalent); a pytest bounds the estimate
  against the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.operators.text import _STOPWORDS, _tokens
from dbt_spark_models_spark.sources.testdata import load_tables, spread

# fixed classifier weights: (bias, log-length, stopword, distinct,
# chars-per-token, digit-token). Integer-ish literals keep the double
# math bit-identical across engines.
_W = {"bias": -2.0, "len": 0.5, "stop": 2.5, "dist": 1.5, "cpt": -0.1, "dig": -3.0}


def _token_stats(d: DataFrame, *keep: str) -> DataFrame:
    """(keep..., n_tok, n_distinct, n_digit) for non-empty-token docs —
    the shared corpus pass behind every quality-score query
    (``text.token_count_stats``: JVM expressions that fuse into the scan;
    see its r11 measurement note — an Arrow-kernel variant measured
    slower on these short arrays). The counts are exact integers, so
    every downstream JVM score expression is bit-identical."""
    from dbt_spark_models_spark.operators.text import token_count_stats

    return token_count_stats(
        d.select(*keep, _tokens().alias("tokens"))
    ).filter(F.col("n_tok") > 0)


def _s_quality():
    """The shared UNROUNDED quality-score expression over the _token_stats
    columns: ln(1+n)·0.5 + (distinct/n)·1.5 − (digit/n)·3.0 — identical
    arithmetic (and operation order) to the former inline HOF form."""
    n_tok = F.col("n_tok")
    return (
        F.log(F.lit(1) + n_tok) * 0.5
        + (F.col("n_distinct") / n_tok) * 1.5
        - (F.col("n_digit") / n_tok) * 3.0
    )


@query(
    "text_quality_linear_score",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang, n_chars,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), feats AS (
    SELECT doc_id, lang,
           LN(1 + len(tokens)) AS f_len,
           len(list_filter(tokens, x -> list_contains({list(_STOPWORDS)!r}, x)))
               / len(tokens) AS f_stop,
           len(list_distinct(tokens)) / len(tokens) AS f_dist,
           n_chars / len(tokens) AS f_cpt,
           len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
               / len(tokens) AS f_dig
    FROM toks WHERE len(tokens) > 0
), scored AS (
    SELECT doc_id, lang,
           {_W['bias']} + {_W['len']} * f_len + {_W['stop']} * f_stop
               + {_W['dist']} * f_dist + {_W['cpt']} * f_cpt
               + {_W['dig']} * f_dig AS score
    FROM feats
)
SELECT doc_id, lang,
       ROUND(score, 4) AS quality_score,
       ROUND(1.0 / (1.0 + EXP(-score)), 4) AS keep_prob,
       score >= 0 AS keep
FROM scored
""",
)
def text_quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier: engineered features (log length,
    stopword ratio, lexical diversity, chars/token, digit-token ratio)
    dotted with fixed weights, sigmoid-calibrated, thresholded at 0.
    This is the production shape of a learned quality gate with the
    training externalized: scoring is pure column math, so at 100 TB it
    fuses into the scan (one WholeStageCodegen pass, no shuffle, no UDF).
    Swapping learned weights in means changing literals, not the plan."""
    from dbt_spark_models_spark.operators.text import token_count_stats

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    # token counts via the shared JVM-expression helper (see
    # token_count_stats's r11 measurement note) — exact integers, so the
    # feature arithmetic is bit-identical across implementations
    n_tok = F.col("n_tok")
    feats = (
        token_count_stats(
            d.select("doc_id", "lang", "n_chars", _tokens().alias("tokens")),
            stopwords=_STOPWORDS,
        )
        .filter(n_tok > 0)
        .select(
            "doc_id",
            "lang",
            F.log(F.lit(1) + n_tok).alias("f_len"),
            (F.col("n_stop") / n_tok).alias("f_stop"),
            (F.col("n_distinct") / n_tok).alias("f_dist"),
            (F.col("n_chars") / n_tok).alias("f_cpt"),
            (F.col("n_digit") / n_tok).alias("f_dig"),
        )
    )
    score = (
        F.lit(_W["bias"])
        + F.lit(_W["len"]) * F.col("f_len")
        + F.lit(_W["stop"]) * F.col("f_stop")
        + F.lit(_W["dist"]) * F.col("f_dist")
        + F.lit(_W["cpt"]) * F.col("f_cpt")
        + F.lit(_W["dig"]) * F.col("f_dig")
    )
    return feats.withColumn("score", score).select(
        "doc_id",
        "lang",
        F.round("score", 4).alias("quality_score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), 4).alias(
            "keep_prob"
        ),
        (F.col("score") >= 0).alias("keep"),
    )


_CENTROID_CTE = """
pos AS (
    SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS c
    FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i
), centroids AS (
    SELECT label AS c_label, LIST(c ORDER BY i) AS c_emb FROM pos GROUP BY label
)"""


@query(
    "dedup_semantic_survivors",
    oracle=f"""
WITH {_CENTROID_CTE}, norms AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)))
               AS nrm
    FROM embeddings
), scored AS (
    SELECT n.vec_id, c.c_label,
           ROUND(list_dot_product(n.emb, c.c_emb)
                 / (n.nrm * SQRT(list_sum(list_transform(c.c_emb, x -> x * x)))),
                 6) AS cosine
    FROM norms n CROSS JOIN centroids c
), assigned AS (
    SELECT s.vec_id, s.c_label AS cell, n.emb, n.nrm
    FROM (
        SELECT vec_id, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, c_label) AS rn
        FROM scored
    ) s JOIN norms n ON n.vec_id = s.vec_id
    WHERE s.rn = 1
), dups AS (
    SELECT DISTINCT b.vec_id AS dup_id
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= 0.5
)
SELECT a.vec_id, a.cell AS assigned_cell,
       (d.dup_id IS NOT NULL) AS is_dup
FROM assigned a LEFT JOIN dups d ON d.dup_id = a.vec_id
""",
)
def dedup_semantic_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic dedup: coarse quantizer (per-label centroid
    cells, as in ``similarity_ivf_assign``) → pairwise cosine ONLY within
    a cell → a vector is a duplicate if any lower-id in-cell neighbor has
    cosine ≥ 0.5. Pairwise cost drops from n² to Σ cell² — and the cell id
    is the shuffle/partition key, so at 100 TB each cell dedups
    independently (train more centroids to bound cell sizes; the plan is
    unchanged). Cosines rounded to 6dp before comparisons so the
    float-ulp-sensitive argmax/threshold stay deterministic cross-engine.

    The within-cell pairwise stage runs as an Arrow-batched
    ``applyInPandas`` (one numpy matmul per cell) — the case the UDF
    guidance carves out: an interpreted JVM HOF fold over 400k pairs ×
    64 dims measured 2.6× slower than the vectorized BLAS path. Each
    cell's matrix is bounded by the quantizer's cell size, so Arrow batch
    memory stays bounded at any corpus scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from dbt_spark_models_spark.operators.similarity import _ivf_assigned

    e = spread(load_tables(spark, sf_dir, ("embeddings",))["embeddings"], "vec_id")
    assigned = _ivf_assigned(e)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("assigned_cell", T.IntegerType()),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        normed = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(normed @ normed.T, 6)
        # rows are vec_id-sorted: column j is a dup if any i<j has cos>=0.5
        dup = np.triu(cos >= 0.5, k=1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "assigned_cell": pdf["cell"].astype("int32"),
                "is_dup": dup,
            }
        )

    return assigned.groupBy("cell").applyInPandas(dedup_cell, schema)


@query(
    "text_length_histogram",
    oracle="""
WITH counts AS (
    SELECT lang, LEAST(n_chars // 200, 9) AS bucket, COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang, LEAST(n_chars // 200, 9)
)
SELECT lang, bucket, bucket * 200 AS lo_chars, n_docs,
       ROUND(n_docs / SUM(n_docs) OVER (PARTITION BY lang), 4) AS share,
       ROUND(SUM(n_docs) OVER (PARTITION BY lang ORDER BY bucket)
             / SUM(n_docs) OVER (PARTITION BY lang), 4) AS cum_share
FROM counts
""",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (200-char, clamped at 10 buckets) per-language length
    histogram with share + cumulative share. The bucketing is pure
    arithmetic (fuses into the scan), the count is a map-side-combined
    agg, and the window runs over ≤10 rows per language — the whole
    report is one small shuffle regardless of corpus size."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    bucket = F.least(F.expr("n_chars div 200"), F.lit(9).cast("long"))
    counts = (
        d.select("lang", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w_all = Window.partitionBy("lang")
    w_cum = Window.partitionBy("lang").orderBy("bucket")
    return counts.select(
        "lang",
        "bucket",
        (F.col("bucket") * 200).alias("lo_chars"),
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_all), 4).alias("share"),
        F.round(
            F.sum("n_docs").over(w_cum) / F.sum("n_docs").over(w_all), 4
        ).alias("cum_share"),
    )


@query(
    "agg_hll_mergeable_distinct",
    oracle="""
WITH per_type AS (
    SELECT event_type AS group_key,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users
    FROM events GROUP BY event_type
), merged AS (
    SELECT 'ALL' AS group_key,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users
    FROM events
)
SELECT group_key, n_events, exact_users, TRUE AS est_within_3pct
FROM per_type
UNION ALL
SELECT group_key, n_events, exact_users, TRUE AS est_within_3pct
FROM merged
""",
)
def agg_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    ``hll_sketch_agg``): one sketch per event_type, then the per-type
    sketches are *re-merged* with ``hll_union_agg`` into a global 'ALL'
    estimate — demonstrating the associative partial-aggregation property
    that makes sketch counting the 100 TB path (map-side partials merge
    without shuffling raw keys; exact COUNT(DISTINCT) shuffles every key).

    Error-bound oracle (VERDICT r3 #5): sketch binaries are
    engine-specific, so the gate outputs the EXACT counts plus a boolean
    claiming the HLL estimate lands within ±3% of exact (lgk=12 → ~1.6%
    standard error, deterministic for a fixed input); the oracle
    recomputes the exact counts and asserts TRUE. The exact distinct here
    is the verification harness, not the production path — production
    ships the sketch only."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    within = (
        F.abs(F.hll_sketch_estimate(F.col("sk")) - F.col("exact_users"))
        <= 0.03 * F.col("exact_users")
    ).alias("est_within_3pct")
    per_type = sketches.select(
        F.col("event_type").alias("group_key"), "n_events", "exact_users", within
    )
    merged = (
        sketches.agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(
            F.broadcast(
                ev.agg(F.countDistinct("user_id").alias("exact_users"))
            )
        )
        .select(F.lit("ALL").alias("group_key"), "n_events", "exact_users", within)
    )
    return per_type.unionByName(merged)


_GD_LR = 0.5
_GD_ITERS = 5


def _logreg_feats_sql() -> str:
    return """
toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), feats AS (
    SELECT LN(1 + len(tokens)) AS f1,
           len(list_distinct(tokens)) / len(tokens) AS f2,
           len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
               / len(tokens) AS f3,
           CASE WHEN lang IN ('en', 'es') THEN CAST(1 AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS y
    FROM toks WHERE len(tokens) > 0
)"""


def _logreg_oracle() -> str:
    """Unrolled batch-gradient-descent CTEs (same device as the PageRank
    oracle: a fixed iteration count makes training a pure function both
    engines evaluate identically up to summation-order float drift)."""
    head = (
        "WITH "
        + _logreg_feats_sql().strip()
        + """, w0 AS (
    SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS w1,
           CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3
)"""
    )
    sig = "1.0 / (1.0 + EXP(-(w.b + w.w1 * f.f1 + w.w2 * f.f2 + w.w3 * f.f3)))"
    its = []
    for i in range(_GD_ITERS):
        its.append(f""", w{i + 1} AS (
    SELECT MIN(b) - {_GD_LR} * AVG(p - y) AS b,
           MIN(w1) - {_GD_LR} * AVG((p - y) * f1) AS w1,
           MIN(w2) - {_GD_LR} * AVG((p - y) * f2) AS w2,
           MIN(w3) - {_GD_LR} * AVG((p - y) * f3) AS w3
    FROM (
        SELECT w.b, w.w1, w.w2, w.w3, f.f1, f.f2, f.f3, f.y, {sig} AS p
        FROM feats f CROSS JOIN w{i} w
    )
)""")
    return (
        head
        + "".join(its)
        + f"""
SELECT ROUND(MIN(b), 6) AS bias,
       ROUND(MIN(w1), 6) AS w_len,
       ROUND(MIN(w2), 6) AS w_dist,
       ROUND(MIN(w3), 6) AS w_dig,
       ROUND(AVG(-(y * LN(p) + (1 - y) * LN(1 - p))), 6) AS log_loss
FROM (
    SELECT w.b, w.w1, w.w2, w.w3, f.y, {sig} AS p
    FROM feats f CROSS JOIN w{_GD_ITERS} w
)"""
    )


@query("train_logreg_quality_weights", oracle=_logreg_oracle())
def train_logreg_quality_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-ENGINE classifier training: batch-gradient-descent logistic
    regression (5 fixed rounds, lr=0.5, w0=0) learning the weights that
    ``text_quality_linear_score`` consumes as frozen literals — closing
    the train→score loop entirely inside the engine. Features are the
    same engineered columns (log token count, lexical diversity, digit
    ratio); the label marks the en/es slice. Output: the learned weight
    vector + final training log-loss, one row, matched to the unrolled-CTE
    oracle at the rounded 6th decimal.

    Scale: each GD round is ONE map-side-combined aggregate over the
    feature scan (gradient = 4 running sums — no per-row state, no
    shuffle of the corpus itself). The 1-row weight vector lives at the
    DRIVER between rounds (r11 — the same bounded-state pattern as the
    k-means centroids and the BPE argmax; pre-r11 each round broadcast
    it back as a 1-row BNLJ build, paying a broadcast-build job per
    round) and is stamped into the next round's expressions as literals:
    the same IEEE doubles, so the trained weights are bit-identical.
    r12 quiet interleaved A/B (load <2, 7 alternating rounds, noop sink)
    vs the restored pre-r11 chained form settled the r11 "+0.22 s"
    flag: driver-held min 1.215 s / med 1.334 s beats chained min
    1.319 s / med 1.402 s with identical output rows — the r11 ambient
    inflation, not a regression; kept.
    Features persist once across rounds; 100 TB cost = 5 scans of a
    cached narrow projection, or 1 scan with the rounds fused via
    treeAggregate-style partial batching if the cache doesn't fit."""
    from dbt_spark_models_spark.operators.text import token_count_stats

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    # token counts via the shared JVM-expression helper (see
    # token_count_stats's r11 measurement note) — exact integers, so the
    # feature arithmetic below is bit-identical across implementations
    n_tok = F.col("n_tok")
    feats = (
        token_count_stats(d.select("lang", _tokens().alias("tokens")))
        .filter(n_tok > 0)
        .select(
            F.log(F.lit(1) + n_tok).alias("f1"),
            (F.col("n_distinct") / n_tok).alias("f2"),
            (F.col("n_digit") / n_tok).alias("f3"),
            F.when(F.col("lang").isin("en", "es"), 1.0).otherwise(0.0).alias("y"),
        )
        .persist()
    )

    def sig(b: float, w1: float, w2: float, w3: float):
        # identical expression tree to the former column form, with the
        # weight columns replaced by the SAME double values as literals
        return 1.0 / (
            1.0
            + F.exp(
                -(
                    F.lit(b)
                    + F.lit(w1) * F.col("f1")
                    + F.lit(w2) * F.col("f2")
                    + F.lit(w3) * F.col("f3")
                )
            )
        )

    b = w1 = w2 = w3 = 0.0
    for _ in range(_GD_ITERS):
        j = feats.withColumn("p", sig(b, w1, w2, w3))
        err = F.col("p") - F.col("y")
        row = j.agg(
            (F.lit(b) - _GD_LR * F.avg(err)).alias("b"),
            (F.lit(w1) - _GD_LR * F.avg(err * F.col("f1"))).alias("w1"),
            (F.lit(w2) - _GD_LR * F.avg(err * F.col("f2"))).alias("w2"),
            (F.lit(w3) - _GD_LR * F.avg(err * F.col("f3"))).alias("w3"),
        ).collect()[0]  # bounded: 1-row weight vector per GD round
        b, w1, w2, w3 = (
            float(row["b"]),
            float(row["w1"]),
            float(row["w2"]),
            float(row["w3"]),
        )
    final = feats.withColumn("p", sig(b, w1, w2, w3))
    out = final.agg(
        F.round(F.min(F.lit(b)), 6).alias("bias"),
        F.round(F.min(F.lit(w1)), 6).alias("w_len"),
        F.round(F.min(F.lit(w2)), 6).alias("w_dist"),
        F.round(F.min(F.lit(w3)), 6).alias("w_dig"),
        F.round(
            F.avg(
                -(
                    F.col("y") * F.log("p")
                    + (1 - F.col("y")) * F.log(1.0 - F.col("p"))
                )
            ),
            6,
        ).alias("log_loss"),
    )
    return out


@query(
    "eval_classifier_auc",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS s,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), buckets AS (
    SELECT s, SUM(y) AS n_pos, SUM(1 - y) AS n_neg
    FROM scored GROUP BY s
), cum AS (
    SELECT n_pos, n_neg,
           COALESCE(SUM(n_neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
    FROM buckets
)
SELECT ROUND(SUM(n_pos * neg_below + 0.5 * n_pos * n_neg)
             / (SUM(n_pos) * SUM(n_neg)), 6) AS auc,
       CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg
FROM cum
""",
)
def eval_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a quality classifier via the rank-sum identity
    AUC = P(score_pos > score_neg) + ½·P(tie) — computed WITHOUT a
    per-document global sort: scores are quantized to 6 decimals (the
    published-metric precision), bucketed by one map-side-combined
    groupBy, and the pair-counting runs as a cumulative window over the
    BUCKET table. Ties (same bucket) take the standard ½ credit, so the
    quantization is part of the metric definition, not an approximation
    error.

    Scale: the doc-level stage is scan + one agg keyed by score bucket
    (≤10⁶ distinct values by construction at ANY corpus size — that's the
    point of quantizing first); the ordered cumulative runs over the
    bounded bucket frame. This is how AUC stays computable at 100 TB
    where a global rank of every document would single-partition sort
    the corpus."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        F.round(_s_quality(), 6).alias("s"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    buckets = scored.groupBy("s").agg(
        F.sum("y").alias("n_pos"), F.sum(1 - F.col("y")).alias("n_neg")
    )
    # ordered cumulative over the bounded bucket frame (constant-key
    # partition — non-foldable, see pipeline_domain_mixture)
    # bounded: <=1e6 quantized score buckets by construction (ROUND to 6dp)
    w = (
        Window.partitionBy(F.col("s").isNotNull())
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = buckets.withColumn(
        "neg_below", F.coalesce(F.sum("n_neg").over(w), F.lit(0))
    )
    return cum.agg(
        F.round(
            F.sum(
                F.col("n_pos") * F.col("neg_below")
                + 0.5 * F.col("n_pos") * F.col("n_neg")
            )
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
    )


# Count-min sketch geometry: depth (independent hash rows) x width.
# Cell hash j of token t = int(md5(t || '#cms' || j)[:8 hex]) % width —
# portable, so the sketch contents (and its overestimates) are
# deterministic and the DuckDB oracle rebuilds the identical sketch.
_CMS_DEPTH = 4
_CMS_WIDTH = 1024


@query(
    "agg_countmin_heavy_hitters",
    oracle=f"""
WITH occ AS (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), cells AS (
    SELECT j, ('0x' || substr(md5(token || '#cms' || j), 1, 8))::BIGINT
               % {_CMS_WIDTH} AS bucket,
           COUNT(*) AS c
    FROM occ, UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(j)
    GROUP BY j, bucket
), exact AS (
    SELECT token, COUNT(*) AS exact_cnt FROM occ GROUP BY token
), top AS (
    SELECT token, exact_cnt,
           ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, token) AS rk
    FROM exact
), probes AS (
    SELECT t.token, t.exact_cnt, t.rk, g.j,
           ('0x' || substr(md5(t.token || '#cms' || g.j), 1, 8))::BIGINT
               % {_CMS_WIDTH} AS bucket
    FROM top t, UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(j)
    WHERE t.rk <= 20
)
SELECT p.token, p.rk,
       CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(c.c) AS BIGINT) AS cms_est,
       CAST(MIN(c.c) - p.exact_cnt AS BIGINT) AS overcount
FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.token, p.rk, p.exact_cnt
""",
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, probed at the top-20 heavy
    hitters: a 4x1024 counter grid where every token occurrence increments
    one cell per hash row and a point estimate is the MIN over its 4 cells
    — always an overestimate, by at most eN/width with probability
    1-2^-depth.

    This is the third mergeable sketch in the family (HLL = distinct,
    Bloom = membership, CMS = frequency): the grid is a fixed 4096-long
    array that merges across shards by cell-wise ADDITION — at 100 TB the
    token-frequency table this replaces has billions of rows and a
    full-key shuffle, while the CMS build is one map-side-combined
    aggregate into 4096 cells and the probe side joins a broadcast grid.
    Portable md5 cell hashes make the sketch bit-identical in DuckDB, so
    the driver hash-gates the overestimates themselves (the `overcount`
    column IS the sketch's collision error, deterministically reproduced).
    The exact top-20 ranking comes from a full groupBy here so the oracle
    can verify est >= exact cell by cell; a production 100 TB flow ranks
    candidates BY the sketch instead and never materializes exact counts.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    occ = d.select(F.explode(_tokens()).alias("token"))
    js = F.array(*[F.lit(j) for j in range(_CMS_DEPTH)])
    # ONE tokenize + token-count aggregate feeds everything: the sketch
    # cells sum the per-token counts (identical cell totals — grouping
    # occurrences by (j, bucket) is the same integers as grouping counts),
    # so the 4 md5 hashes run once per VOCAB entry instead of once per
    # corpus occurrence, and the corpus is tokenized once, not twice
    exact = (
        occ.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt")).persist()
    )
    cells = (
        exact.select(F.explode(js).alias("j"), "token", "exact_cnt")
        .select(
            "j",
            "exact_cnt",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("token"), F.lit("#cms"), F.col("j"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CMS_WIDTH
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.sum("exact_cnt").alias("c"))
    )
    # Distributed top-20: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps merged at the driver), never pulling the
    # vocabulary-scale exact table through one task; the rank window then
    # runs on the bounded 20-row result.
    top20 = exact.orderBy(F.col("exact_cnt").desc(), "token").limit(20)
    # bounded: 20-row frame (limit above); token is non-nullable here so
    # isNotNull would FOLD (empty partition spec warning) — use the
    # non-foldable arithmetic constant instead (the exact_ntile device)
    w = Window.partitionBy(F.col("exact_cnt") % F.lit(1)).orderBy(
        F.col("exact_cnt").desc(), "token"
    )
    top = top20.withColumn("rk", F.row_number().over(w))
    probes = top.select(
        "token",
        "rk",
        "exact_cnt",
        F.explode(js).alias("j"),
    ).select(
        "token",
        "rk",
        "exact_cnt",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("token"), F.lit("#cms"), F.col("j"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CMS_WIDTH
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("token", "rk", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "token",
            "rk",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
    )


@query(
    "eval_calibration_curve",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT 1.0 / (1.0 + EXP(-ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6))) AS p,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
)
SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
       COUNT(*) AS n_docs,
       ROUND(AVG(p), 6) AS mean_pred,
       ROUND(AVG(CAST(y AS DOUBLE)), 6) AS frac_pos,
       ROUND(AVG(p) - AVG(CAST(y AS DOUBLE)), 6) AS calib_gap
FROM scored GROUP BY bin
""",
)
def eval_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for the same quality
    classifier ``eval_classifier_auc`` grades: sigmoid the 6-decimal
    quantized score into a probability, bucket into 10 fixed-width bins,
    and report mean predicted probability vs observed positive rate per
    bin — the standard companion metric to AUC (AUC says the ranking is
    right; calibration says the probabilities mean what they claim).

    Scale: fixed-width bins need NO global statistics (contrast
    quantile-based bins, which need a distributed quantile pass first) —
    the whole metric is one map-side-combined groupBy on a 10-value key.
    The per-doc sigmoid is row-local column math over the quantized
    score, so the bin assignment is deterministic and the oracle
    reproduces it exactly.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        (1.0 / (1.0 + F.exp(-F.round(_s_quality(), 6)))).alias("p"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 6).alias("mean_pred"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("frac_pos"),
            F.round(
                F.avg("p") - F.avg(F.col("y").cast("double")), 6
            ).alias("calib_gap"),
        )
    )


@query(
    "train_group_ols_regression",
    oracle="""
WITH joined AS (
    SELECT p.p_brand,
           CAST(l.l_quantity AS DOUBLE) AS x,
           CAST(l.l_extendedprice AS DOUBLE) AS y
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), stats AS (
    SELECT p_brand, COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM joined GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept,
       ROUND(POW(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM stats
""",
)
def train_group_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price-vs-quantity slope per part brand):
    simple linear regression fitted for EVERY group in one pass from the
    five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) — the grouped
    companion to ``train_logreg_quality_weights``'s iterative GD, and the
    standard "thousands of tiny models" shape (one fit per brand / SKU /
    region) that per-group scikit loops cannot do at corpus scale.

    Scale: ONE map-side-combined groupBy — the sufficient statistics are
    associative sums, so partials combine before the shuffle and the fit
    itself is row-local arithmetic on the 25-row stats table. No
    per-group data movement, no driver loop, no UDF. Both engines
    evaluate the identical normal-equation formula, so cancellation
    behaves identically and drift is summation-order only (~1e-15
    relative; results rounded to 6 decimals).
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_brand",
            F.col("l_quantity").cast("double").alias("x"),
            F.col("l_extendedprice").cast("double").alias("y"),
        )
    )
    stats = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "quality_profile_table_stats",
    oracle="""
WITH base AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS c_orderkey,
           CAST(o_custkey AS VARCHAR) AS c_custkey,
           o_orderstatus, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS c_totalprice,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS c_orderdate,
           o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
)
SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderkey) AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
FROM base
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
FROM base
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
       MAX(o_orderpriority)
FROM base
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate),
       CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
       CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
FROM base
""",
)
def quality_profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per column, row count / null count / exact
    distinct count / min / max — the data-quality profile every warehouse
    job runs before trusting an input (the reference's singular null-rate
    and duplicate-key tests, e.g.
    ``tests/spark/pulse/brand_name_absolute_null_check.sql:1-9``, are
    hand-written slices of exactly this).

    Scale: ONE UNION BRANCH PER COLUMN, not one Expand-based
    multi-distinct aggregate. On columnar storage the branches together
    read the same bytes a single all-column scan would (each parquet scan
    prunes to its one column), but each branch runs its own two-phase
    partial-distinct agg on narrow rows — measured 6.5× faster at sf0.1
    than the single-agg form, whose Expand widens EVERY row ×(columns+1)
    and shuffles the multiplied union of all columns' values through one
    aggregate. Multi-distinct-over-Expand is the right plan when the
    distinct columns must land in the same output row; for a profile
    (one row per column) the union shape is strictly better, at any
    scale. Numeric min/max are canonicalized (decimal / date casts) so
    the string forms are engine-portable.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]

    def branch(c, mn, mx) -> DataFrame:
        return o.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        )

    specs = [
        ("o_orderkey", F.min("o_orderkey").cast("string"),
         F.max("o_orderkey").cast("string")),
        ("o_custkey", F.min("o_custkey").cast("string"),
         F.max("o_custkey").cast("string")),
        ("o_orderstatus", F.min("o_orderstatus"), F.max("o_orderstatus")),
        ("o_orderpriority", F.min("o_orderpriority"),
         F.max("o_orderpriority")),
        ("o_totalprice",
         F.min("o_totalprice").cast("decimal(18,2)").cast("string"),
         F.max("o_totalprice").cast("decimal(18,2)").cast("string")),
        ("o_orderdate",
         F.min(F.col("o_orderdate").cast("date")).cast("string"),
         F.max(F.col("o_orderdate").cast("date")).cast("string")),
    ]
    out = branch(*specs[0])
    for s in specs[1:]:
        out = out.unionAll(branch(*s))
    return out


@query(
    "agg_bitmap_exact_distinct",
    oracle="""
SELECT event_type,
       CAST(date_trunc('month', ts) AS DATE) AS month,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type, month
""",
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through mergeable bitmaps (Spark 3.5+
    ``bitmap_construct_agg`` family) — the fourth mergeable structure in
    the family and the only exact one: HLL estimates distinct, Bloom
    answers membership, CMS estimates frequency, bitmaps COUNT exactly
    and still merge with OR.

    The plan is the 100 TB pattern Snowflake/ClickHouse ship for exact
    rollup distinct: user ids bucket into 32k-bit segments
    (``bitmap_bucket_number``), each (type, day, bucket) partial
    aggregates map-side into a bitmap, daily partials merge into months
    with ``bitmap_or_agg`` — so the monthly grain NEVER re-shuffles raw
    user ids, only fixed-size bitmap segments, and a day→month→year
    rollup chain reuses the same partials at every grain. The oracle is
    plain COUNT(DISTINCT): the bitmap path must reproduce it exactly.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("month", "ts").cast("date").alias("month"),
            F.col("ts").cast("date").alias("day"),
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "month", "day", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    monthly = daily.groupBy("event_type", "month", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return monthly.groupBy("event_type", "month").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


@query(
    "quality_distribution_drift",
    oracle="""
WITH flagged AS (
    SELECT event_type,
           CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_a
    FROM events
), counts AS (
    SELECT event_type,
           CAST(SUM(is_a) AS BIGINT) AS n_a,
           CAST(SUM(1 - is_a) AS BIGINT) AS n_b
    FROM flagged GROUP BY 1
), probs AS (
    SELECT event_type, n_a, n_b,
           (n_a + 1.0) / (SUM(n_a) OVER () + COUNT(*) OVER ()) AS p_a,
           (n_b + 1.0) / (SUM(n_b) OVER () + COUNT(*) OVER ()) AS p_b
    FROM counts
)
SELECT event_type, n_a, n_b,
       ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
       ROUND((p_a - p_b) * LN(p_a / p_b), 6) AS psi_term,
       ROUND(SUM((p_a - p_b) * LN(p_a / p_b)) OVER (), 6) AS psi_total
FROM probs
""",
)
def quality_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index (PSI) drift monitor: event_type mix in
    the first half of the month vs the second, with add-one (Laplace)
    smoothing so a category vanishing from one period yields a finite,
    comparable term instead of log(0). The standard pre-training guard
    against a source's composition silently shifting between snapshots.

    Scale: one map-side-combined groupBy over the fact table; everything
    after is windows over #categories rows (the isNotNull partition key is
    non-foldable, so no empty-partition-spec global sort on real data)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    counts = (
        ev.select(
            "event_type",
            (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("a"),
        )
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("a")).alias("n_a"),
            F.count_if(~F.col("a")).alias("n_b"),
        )
    )
    # bounded: one row per distinct event_type (enum-scale post-agg)
    tot = Window.partitionBy(F.col("event_type").isNotNull())
    p_a = (F.col("n_a") + 1.0) / (
        F.sum("n_a").over(tot) + F.count(F.lit(1)).over(tot)
    )
    p_b = (F.col("n_b") + 1.0) / (
        F.sum("n_b").over(tot) + F.count(F.lit(1)).over(tot)
    )
    probs = counts.select(
        "event_type", "n_a", "n_b", p_a.alias("p_a"), p_b.alias("p_b")
    )
    term = (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))
    return probs.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(tot), 6).alias("psi_total"),
    )


@query(
    "eval_ks_statistic",
    oracle="""
WITH g AS (
    SELECT ROUND(value, 4) AS bucket,
           SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n_a,
           SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS n_b
    FROM events GROUP BY 1
), c AS (
    SELECT SUM(n_a) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) * 1.0
               / SUM(n_a) OVER () AS cdf_a,
           SUM(n_b) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) * 1.0
               / SUM(n_b) OVER () AS cdf_b
    FROM g
)
SELECT ROUND(MAX(ABS(cdf_a - cdf_b)), 6) AS ks_d,
       (SELECT CAST(SUM(n_a) AS BIGINT) FROM g) AS n_a,
       (SELECT CAST(SUM(n_b) AS BIGINT) FROM g) AS n_b
FROM c
""",
)
def eval_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov D between the event-value
    distributions of the two month halves — the continuous-variable
    companion to ``quality_distribution_drift``'s categorical PSI.

    Sort-free at corpus scale, same trick as ``eval_classifier_auc``:
    values quantize to 4-decimal buckets, so the only ordered pass is a
    cumulative window over the BOUNDED bucket table (distinct buckets ≤
    value-range / step, independent of row count; for unbounded ranges
    substitute quantile bins). The fact scan is one map-side-combined
    groupBy."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    g = (
        ev.select(
            F.round("value", 4).alias("bucket"),
            (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("a"),
        )
        .groupBy("bucket")
        .agg(
            F.count_if(F.col("a")).alias("n_a"),
            F.count_if(~F.col("a")).alias("n_b"),
        )
    )
    # bounded: fixed bucket grid (post-agg, one row per bucket)
    part = Window.partitionBy(F.col("bucket").isNotNull())
    ordered = part.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf_a = F.sum("n_a").over(ordered) / F.sum("n_a").over(part)
    cdf_b = F.sum("n_b").over(ordered) / F.sum("n_b").over(part)
    c = g.select(
        F.abs(cdf_a - cdf_b).alias("d"), F.col("n_a"), F.col("n_b")
    )
    return c.groupBy().agg(
        F.round(F.max("d"), 6).alias("ks_d"),
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
    )


@query(
    "eval_chi_squared_drift",
    oracle="""
WITH counts AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END)
                AS BIGINT) AS n_b
    FROM events GROUP BY 1
), tot AS (
    SELECT event_type, n_a, n_b,
           SUM(n_a) OVER () AS ta, SUM(n_b) OVER () AS tb,
           SUM(n_a + n_b) OVER () AS n
    FROM counts
), ex AS (
    SELECT event_type, n_a, n_b,
           (n_a + n_b) * ta * 1.0 / n AS e_a,
           (n_a + n_b) * tb * 1.0 / n AS e_b
    FROM tot
)
SELECT event_type, n_a, n_b,
       ROUND((n_a - e_a) * (n_a - e_a) / e_a
             + (n_b - e_b) * (n_b - e_b) / e_b, 6) AS chi2_term,
       ROUND(SUM((n_a - e_a) * (n_a - e_a) / e_a
                 + (n_b - e_b) * (n_b - e_b) / e_b) OVER (), 6) AS chi2_total,
       (COUNT(*) OVER () - 1) AS dof
FROM ex
""",
)
def eval_chi_squared_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared homogeneity test of the event-type mix across the two
    month halves (2×k contingency): per-category contribution plus the
    total statistic and degrees of freedom — completing the drift-test
    family (categorical PSI, continuous KS, frequentist chi²).

    Scale: identical shape to ``quality_distribution_drift`` — one
    map-side-combined groupBy over the fact table, then windows over
    #categories rows keyed on a non-foldable constant."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    counts = (
        ev.select(
            "event_type",
            (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("a"),
        )
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("a")).alias("n_a"),
            F.count_if(~F.col("a")).alias("n_b"),
        )
    )
    # bounded: one row per distinct event_type (enum-scale post-agg)
    w = Window.partitionBy(F.col("event_type").isNotNull())
    ta, tb = F.sum("n_a").over(w), F.sum("n_b").over(w)
    n = F.sum(F.col("n_a") + F.col("n_b")).over(w)
    e_a = (F.col("n_a") + F.col("n_b")) * ta / n
    e_b = (F.col("n_a") + F.col("n_b")) * tb / n
    term = (F.col("n_a") - e_a) ** 2 / e_a + (F.col("n_b") - e_b) ** 2 / e_b
    return counts.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(term, 6).alias("chi2_term"),
        F.round(F.sum(term).over(w), 6).alias("chi2_total"),
        (F.count(F.lit(1)).over(w) - 1).alias("dof"),
    )


@query(
    "agg_hll_rolling_7d_users",
    oracle="""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
    SELECT DISTINCT day FROM du
), exact7 AS (
    SELECT d.day,
           COUNT(DISTINCT u.user_id) AS users_7d_exact,
           COUNT(DISTINCT u.day) AS n_days_merged
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
)
SELECT day, n_days_merged, users_7d_exact, TRUE AS est_within_3pct
FROM exact7 ORDER BY day
""",
)
def agg_hll_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from MERGEABLE day sketches: one HLL
    sketch per day (one scan of the facts), then each day's trailing-7
    window is a ``hll_union_agg`` over AT MOST 7 pre-built sketches — the
    100 TB rolling-MAU/WAU pattern. Exact rolling distinct would re-shuffle
    every (day × user) pair per window position; sketch re-merge touches
    7 × n_days kilobyte blobs, computable on the driver of a dashboard.

    The trailing window is an equi-join of the day spine to its 7
    contributing days (generated arithmetically, no range join).

    Error-bound oracle (VERDICT r3 #5): sketch blobs are engine-specific,
    so the gate ALSO computes the exact rolling distinct (verification
    harness only — production ships the sketch path) and a boolean
    claiming every day's estimate is within ±3% of exact (lgk=12 → ~1.6%
    SE, deterministic for a fixed input); the oracle recomputes exact and
    asserts TRUE."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    day_sketch = du.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    spine = day_sketch.select(
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("back"),
    ).select("day", F.date_sub("day", F.col("back")).alias("src_day"))
    est = (
        spine.join(day_sketch.withColumnRenamed("day", "src_day"), "src_day")
        .groupBy("day")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, true))")
            .cast("long")
            .alias("users_7d_est"),
            F.count(F.lit(1)).alias("n_days_merged"),
        )
    )
    exact = (
        spine.join(du.withColumnRenamed("day", "src_day"), "src_day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d_exact"))
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            "n_days_merged",
            "users_7d_exact",
            (
                F.abs(F.col("users_7d_est") - F.col("users_7d_exact"))
                <= 0.03 * F.col("users_7d_exact")
            ).alias("est_within_3pct"),
        )
        .orderBy("day")
    )


@query(
    "eval_ab_proportion_ztest",
    oracle="""
WITH assign AS (
    SELECT user_id,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
           MAX(CASE WHEN event_type = 'purchase' AND value >= 150
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id
), arms AS (
    SELECT arm, COUNT(*) AS n,
           CAST(SUM(converted) AS BIGINT) AS conv,
           SUM(converted) * 1.0 / COUNT(*) AS rate
    FROM assign GROUP BY arm
), wide AS (
    SELECT MAX(CASE WHEN arm = 'control' THEN n END) AS n_c,
           MAX(CASE WHEN arm = 'control' THEN conv END) AS conv_c,
           MAX(CASE WHEN arm = 'control' THEN rate END) AS rate_c,
           MAX(CASE WHEN arm = 'treatment' THEN n END) AS n_t,
           MAX(CASE WHEN arm = 'treatment' THEN conv END) AS conv_t,
           MAX(CASE WHEN arm = 'treatment' THEN rate END) AS rate_t
    FROM arms
)
SELECT n_c, conv_c, ROUND(rate_c, 6) AS rate_c,
       n_t, conv_t, ROUND(rate_t, 6) AS rate_t,
       ROUND(rate_t - rate_c, 6) AS lift,
       ROUND((rate_t - rate_c)
             / NULLIF(SQRT(((conv_c + conv_t) * 1.0 / (n_c + n_t))
                    * (1 - (conv_c + conv_t) * 1.0 / (n_c + n_t))
                    * (1.0 / n_c + 1.0 / n_t)), 0), 6) AS z_score
FROM wide
""",
)
def eval_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment (hash-split arms by
    user id, conversion = any purchase event): per-arm rates, lift, and
    the pooled-variance z-score — the experimentation readout every
    product mart ships beside the Wilson interval
    (``agg_wilson_interval``).

    Scale: one map-side-combined per-user groupBy (conversion flag), one
    2-row arm rollup, then row-local math on a 1-row pivot. Nothing
    shuffles more than once."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    assign = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 150),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "control")
            .otherwise("treatment")
            .alias("arm"),
            "converted",
        )
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.groupBy().pivot("arm", ["control", "treatment"]).agg(
        F.max("n").alias("n"), F.max("conv").alias("conv")
    )
    n_c, conv_c = F.col("control_n"), F.col("control_conv")
    n_t, conv_t = F.col("treatment_n"), F.col("treatment_conv")
    rate_c, rate_t = conv_c / n_c, conv_t / n_t
    pooled = (conv_c + conv_t) / (n_c + n_t)
    # NULL (not error) when an arm is degenerate: pooled variance 0
    z = F.try_divide(
        rate_t - rate_c,
        F.nullif(
            F.sqrt(pooled * (1 - pooled) * (1 / n_c + 1 / n_t)), F.lit(0.0)
        ),
    )
    return wide.select(
        n_c.alias("n_c"),
        conv_c.alias("conv_c"),
        F.round(rate_c, 6).alias("rate_c"),
        n_t.alias("n_t"),
        conv_t.alias("conv_t"),
        F.round(rate_t, 6).alias("rate_t"),
        F.round(rate_t - rate_c, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "train_target_encoding_loo",
    oracle="""
WITH base AS (
    SELECT o_custkey, o_orderpriority AS cat, o_totalprice AS y
    FROM orders
), stats AS (
    SELECT cat, COUNT(*) AS n, SUM(y) AS s FROM base GROUP BY cat
)
SELECT b.o_custkey, b.cat,
       ROUND((st.s - b.y) / (st.n - 1), 4) AS te_loo,
       st.n AS cat_n
FROM base b JOIN stats st ON st.cat = b.cat
WHERE st.n > 1
""",
)
def train_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's categorical feature is
    replaced by the mean target of its category EXCLUDING the row itself
    ((sum − own)/(n − 1)) — the leakage-free form of the classic ML
    feature, since plain category means let every row see its own label.

    Scale: one map-side-combined stats aggregate per category, broadcast
    back (categories are a dim), then row-local math — the naive
    "window mean excluding current row" form would sort every category
    partition for no reason."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("cat"),
        F.col("o_totalprice").alias("y"),
    )
    stats = base.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    return (
        base.join(F.broadcast(stats), "cat")
        .filter(F.col("n") > 1)
        .select(
            "o_custkey",
            "cat",
            F.round((F.col("s") - F.col("y")) / (F.col("n") - 1), 4).alias(
                "te_loo"
            ),
            F.col("n").alias("cat_n"),
        )
    )


# Poisson(1) inverse-CDF thresholds (cumulative pmf), embedded as IDENTICAL
# double literals on both engines so the seeded-uniform comparison picks the
# same branch everywhere.
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
)
_BOOT_B = 64

_BOOT_W_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c} THEN {i}" for i, c in enumerate(_POIS1_CDF)
    )
    + " ELSE 7 END"
)


@query(
    "eval_bootstrap_metric_ci",
    oracle=f"""
WITH reps AS (SELECT r FROM range({_BOOT_B}) t(r)),
drawn AS (
    SELECT r, n_chars,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':boot:'
                               || CAST(r AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
    FROM documents CROSS JOIN reps
),
weighted AS (SELECT r, n_chars, {_BOOT_W_SQL} AS w FROM drawn),
means AS (
    SELECT r, SUM(w * n_chars) / SUM(w) AS m FROM weighted GROUP BY r
),
ordered AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn FROM means)
SELECT CAST(ROUND((SELECT AVG(n_chars) FROM documents), 6) AS DOUBLE)
           AS point_mean,
       CAST(ROUND(MIN(CASE WHEN rn = 2 THEN m END), 6) AS DOUBLE) AS ci_lo,
       CAST(ROUND(MAX(CASE WHEN rn = {_BOOT_B - 1} THEN m END), 6) AS DOUBLE)
           AS ci_hi,
       CAST({_BOOT_B} AS BIGINT) AS b
FROM ordered
""",
)
def eval_bootstrap_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for a corpus metric (mean document
    length), the distributed bootstrap of Chamandy et al. (Google,
    "Estimating Uncertainty for Massive Data Streams", 2012): instead of
    resampling N rows B times (impossible at 100 TB — each replicate is a
    full shuffle), every row contributes Poisson(1) weight to each of
    B=64 replicates, drawn by inverting the Poisson CDF at a seeded
    md5-uniform. Replicate means are weighted means; the CI is the
    2.5th/97.5th order statistic of the B means. Deterministic end to
    end — the DuckDB oracle reproduces the identical interval, so even
    the resampling noise is hash-gated.

    Scale: the explode is CPU-only row-local fan-out (B small ints per
    row); partial aggregation combines map-side, so the shuffle carries
    ≤ B rows per task regardless of N, and the order statistic runs over
    a B-row frame. One extra scan computes the point estimate. Compare:
    naive bootstrap = B full-data shuffles."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    drawn = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
    ).select(
        "n_chars",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":boot:"),
                            F.col("r").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    weighted = drawn.withColumn("w", F.expr(_BOOT_W_SQL))
    means = weighted.groupBy("r").agg(
        (F.sum(F.col("w") * F.col("n_chars")) / F.sum("w")).alias("m")
    )
    # bounded: 64-row bootstrap-replicate frame; m is nullable (division)
    # so isNotNull doesn't fold
    ordered = means.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.col("m").isNotNull()).orderBy("m")
        ),
    )
    ci = ordered.agg(
        F.round(F.min(F.when(F.col("rn") == 2, F.col("m"))), 6)
        .cast("double")
        .alias("ci_lo"),
        F.round(F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))), 6)
        .cast("double")
        .alias("ci_hi"),
    )
    point = docs.agg(
        F.round(F.avg("n_chars"), 6).cast("double").alias("point_mean")
    )
    return point.join(F.broadcast(ci)).select(
        "point_mean", "ci_lo", "ci_hi", F.lit(_BOOT_B).cast("long").alias("b")
    )


@query(
    "eval_cohens_kappa",
    oracle="""
WITH toks AS (
    SELECT n_chars,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), labeled AS (
    SELECT CASE WHEN len(list_distinct(tokens)) >= 0.5 * len(tokens)
               THEN 1 ELSE 0 END AS a,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b
    FROM toks WHERE len(tokens) > 0
), counts AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(a * b) AS n11, SUM(a * (1 - b)) AS n10,
           SUM((1 - a) * b) AS n01, SUM((1 - a) * (1 - b)) AS n00
    FROM labeled
)
SELECT n,
       CAST(ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS DOUBLE) AS po,
       CAST(ROUND(((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS DOUBLE)
           AS pe,
       CAST(ROUND(((n11 + n00) / CAST(n AS DOUBLE)
                   - ((n11 + n10) * (n11 + n01)
                      + (n01 + n00) * (n10 + n00))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  / (1.0 - ((n11 + n10) * (n11 + n01)
                            + (n01 + n00) * (n10 + n00))
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
            AS DOUBLE) AS kappa
FROM counts
""",
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent quality annotators — the
    label-agreement audit every human- or model-labeled training set
    needs before the labels are trusted (kappa corrects raw agreement
    for the agreement two annotators would reach by chance from their
    marginals). Annotator A judges lexical quality (distinct-token
    ratio ≥ 0.5); annotator B judges by size (n_chars ≥ 300); kappa =
    (po − pe)/(1 − pe) from the 2×2 contingency table.

    Scale: labels are row-local column math and the contingency table is
    ONE map-side-combined global aggregate of four conditional sums —
    a single 4-counter row crosses the wire per task, at any corpus
    size. All downstream algebra is on that one row."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    toks = d.withColumn("tokens", _tokens()).filter(F.size("tokens") > 0)
    a = F.when(
        F.size(F.array_distinct("tokens")) >= 0.5 * F.size("tokens"), 1
    ).otherwise(0)
    b = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    labeled = toks.select(a.alias("a"), b.alias("b"))
    counts = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    n_d = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n_d
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (n_d * n_d)
    return counts.select(
        "n",
        F.round(po, 6).cast("double").alias("po"),
        F.round(pe, 6).cast("double").alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).cast("double").alias("kappa"),
    )


@query(
    "eval_krippendorff_alpha",
    oracle="""
WITH ratings AS (
    SELECT doc_id AS u, 'a' AS rater,
           CASE WHEN n_chars >= 400 THEN 'long'
                WHEN n_chars >= 150 THEN 'mid' ELSE 'short' END AS c
    FROM documents
    UNION ALL
    SELECT doc_id, 'b',
           CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 >= 70
                  THEN 'long'
                WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 >= 25
                  THEN 'mid' ELSE 'short' END
    FROM documents
    UNION ALL
    SELECT doc_id, 'c',
           CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, '.', '')) >= 8
                  THEN 'long'
                WHEN LENGTH(text) - LENGTH(REPLACE(text, '.', '')) >= 3
                  THEN 'mid' ELSE 'short' END
    FROM documents WHERE doc_id % 3 = 0
),
m AS (SELECT u, COUNT(*) AS mu FROM ratings GROUP BY u),
r AS (
    SELECT ratings.u, ratings.rater, ratings.c, m.mu
    FROM ratings JOIN m ON ratings.u = m.u WHERE m.mu >= 2
),
o AS (
    SELECT r1.c AS c1, r2.c AS c2, SUM(1.0 / (r1.mu - 1)) AS o_ck
    FROM r r1 JOIN r r2 ON r1.u = r2.u AND r1.rater <> r2.rater
    GROUP BY r1.c, r2.c
),
tot AS (
    SELECT SUM(o_ck) AS n,
           SUM(CASE WHEN c1 <> c2 THEN o_ck ELSE 0 END) AS do_num
    FROM o
),
nc AS (SELECT c1 AS c, SUM(o_ck) AS n_c FROM o GROUP BY c1),
de AS (SELECT SUM(a.n_c * b.n_c) AS de_num FROM nc a JOIN nc b ON a.c <> b.c)
SELECT CAST((SELECT COUNT(*) FROM m WHERE mu >= 2) AS BIGINT) AS n_units,
       tot.n AS n_ratings,
       1.0 - (tot.n - 1.0) * tot.do_num / de.de_num AS alpha
FROM tot, de
""",
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over three synthetic annotators
    with MISSING ratings — the agreement statistic that, unlike Cohen's
    kappa (``eval_cohens_kappa``), handles >2 raters and units some
    raters skipped: annotator C labels only every third document.
    Coincidence-matrix formulation: each ordered within-unit rating pair
    contributes 1/(m_u−1); alpha = 1 − (n−1)·Σ_{c≠k}o_ck / Σ_{c≠k}n_c·n_k.

    Exactness: m_u ∈ {2,3} so every pair weight is 1.0 or 0.5 — all sums
    and the marginal products are exact doubles, and the single final
    division is bit-identical across engines (no in-query ROUND needed).

    Scale: the pair join is WITHIN-unit (m_u ≤ #raters, so ≤ m·(m−1)
    rows per unit — never a corpus blowup); everything after is one
    label-pair aggregate of at most |labels|² rows. One shuffle on the
    unit key, map-side combined."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + 1
    )
    dots = F.length("text") - F.length(F.replace(F.col("text"), F.lit(".")))
    lab = (
        lambda x, hi, mid: F.when(x >= hi, "long")
        .when(x >= mid, "mid")
        .otherwise("short")
    )
    ratings = (
        d.select(
            F.col("doc_id").alias("u"),
            F.lit("a").alias("rater"),
            lab(F.col("n_chars"), 400, 150).alias("c"),
        )
        .unionByName(
            d.select(
                F.col("doc_id").alias("u"),
                F.lit("b").alias("rater"),
                lab(words, 70, 25).alias("c"),
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 3 == 0).select(
                F.col("doc_id").alias("u"),
                F.lit("c").alias("rater"),
                lab(dots, 8, 3).alias("c"),
            )
        )
    )
    m = ratings.groupBy("u").agg(F.count(F.lit(1)).alias("mu"))
    r = ratings.join(m, "u").filter(F.col("mu") >= 2)
    r1, r2 = r.alias("r1"), r.alias("r2")
    o = (
        r1.join(
            r2,
            (F.col("r1.u") == F.col("r2.u"))
            & (F.col("r1.rater") != F.col("r2.rater")),
        )
        .select(
            F.col("r1.c").alias("c1"),
            F.col("r2.c").alias("c2"),
            (F.lit(1.0) / (F.col("r1.mu") - 1)).alias("w"),
        )
        .groupBy("c1", "c2")
        .agg(F.sum("w").alias("o_ck"))
        .persist()
    )
    tot = o.agg(
        F.sum("o_ck").alias("n"),
        F.sum(F.when(F.col("c1") != F.col("c2"), F.col("o_ck")).otherwise(0.0)).alias(
            "do_num"
        ),
    )
    nc = o.groupBy("c1").agg(F.sum("o_ck").alias("n_c"))
    de = (
        nc.alias("a")
        .join(F.broadcast(nc.alias("b")), F.col("a.c1") != F.col("b.c1"))
        .agg(F.sum(F.col("a.n_c") * F.col("b.n_c")).alias("de_num"))
    )
    n_units = m.filter(F.col("mu") >= 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_units")
    )
    return (
        n_units.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(de))
        .select(
            "n_units",
            F.col("n").alias("n_ratings"),
            (
                F.lit(1.0)
                - (F.col("n") - F.lit(1.0)) * F.col("do_num") / F.col("de_num")
            ).alias("alpha"),
        )
    )


@query(
    "quality_k_anonymity_audit",
    oracle="""
WITH classes AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 2000.0) AS INTEGER) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, bal_band, n
FROM classes WHERE n < 5
""",
)
def quality_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier tuple
    (nation, market segment, account-balance band): every equivalence
    class with fewer than k=5 members is a re-identification risk — a
    row in such a class is distinguishable among <k candidates even
    after direct identifiers are dropped. This is the release gate a
    training corpus with user-derived columns runs before export; the
    output is exactly the violating classes (publish nothing, fix by
    coarsening bands or suppressing rows).

    Scale: one map-side-combined groupBy on the QI tuple — the class
    table is bounded by the QI domain (nations × segments × bands), not
    by row count, and the k-filter prunes it further. Audit cost is a
    single aggregation pass at any corpus size."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return classes.filter(F.col("n") < 5)


@query(
    "quality_dp_noisy_counts",
    oracle="""
WITH counts AS (
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS exact_n
    FROM customer GROUP BY c_mktsegment
), drawn AS (
    SELECT c_mktsegment, exact_n,
           ('0x' || substr(md5(c_mktsegment || ':dp'), 1, 8))::BIGINT
               / 4294967296.0 - 0.5 AS v
    FROM counts
)
SELECT c_mktsegment, exact_n,
       CAST(ROUND(-1.0 * SIGN(v)
                  * LN(GREATEST(1e-12, 1.0 - 2.0 * ABS(v))), 6) AS DOUBLE)
           AS noise,
       CAST(ROUND(exact_n - 1.0 * SIGN(v)
                  * LN(GREATEST(1e-12, 1.0 - 2.0 * ABS(v))), 6) AS DOUBLE)
           AS noisy_n
FROM drawn
""",
)
def quality_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release shape: per-segment counts
    plus Laplace(b = 1/epsilon, epsilon = 1) noise drawn by inverse-CDF
    (noise = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|)) from a seeded
    md5-uniform. The seed makes this gate AUDITABLE — the oracle
    reproduces the identical noise, and the exact count ships alongside
    as verification harness. Production DP swaps the seeded uniform for
    a fresh secure draw and drops the exact column; everything else
    (the scan, the single group-count aggregate, the row-local
    inverse-CDF math) is unchanged.

    Scale: one map-side-combined groupBy; the noise math runs on the
    k-row group table, not the data."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    counts = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    v = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("c_mktsegment"), F.lit(":dp"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
        - 0.5
    )
    noise = -F.lit(1.0) * F.signum(v) * F.log(
        F.greatest(F.lit(1e-12), F.lit(1.0) - 2.0 * F.abs(v))
    )
    return counts.select(
        "c_mktsegment",
        "exact_n",
        F.round(noise, 6).cast("double").alias("noise"),
        F.round(F.col("exact_n") + noise, 6).cast("double").alias("noisy_n"),
    )


@query(
    "train_decision_stump_histogram",
    oracle="""
WITH h AS (
    SELECT CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS pos
    FROM orders GROUP BY bin
), cum AS (
    SELECT bin,
           SUM(n)   OVER w AS nl,
           SUM(pos) OVER w AS posl,
           SUM(n)   OVER () AS nt,
           SUM(pos) OVER () AS post
    FROM h
    WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), splits AS (
    SELECT bin AS split_bin,
           CAST(nl AS BIGINT) AS n_left,
           CAST(nt - nl AS BIGINT) AS n_right,
           CAST(posl AS BIGINT) AS pos_left,
           CAST(post - posl AS BIGINT) AS pos_right,
           ROUND((nl * (1.0 - (posl * 1.0 / nl) * (posl * 1.0 / nl)
                            - ((nl - posl) * 1.0 / nl)
                              * ((nl - posl) * 1.0 / nl))
                + (nt - nl) * (1.0
                    - ((post - posl) * 1.0 / (nt - nl))
                      * ((post - posl) * 1.0 / (nt - nl))
                    - ((nt - nl - post + posl) * 1.0 / (nt - nl))
                      * ((nt - nl - post + posl) * 1.0 / (nt - nl))))
                / nt, 6) AS gini
    FROM cum WHERE nl > 0 AND nt - nl > 0
)
SELECT * FROM splits ORDER BY gini, split_bin LIMIT 1
""",
)
def train_decision_stump_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump training (the split-finding core
    of LightGBM/XGBoost's ``tree_method=hist``): bin the feature
    (o_totalprice, 10k-wide bins), reduce each bin to sufficient stats
    (count, positives) with ONE map-side-combined aggregation, then scan
    the cumulative histogram for the weighted-Gini-minimizing split.

    Scale: the only pass over the data is the binned agg — the split
    scan runs on the bounded bin table (≤ ~100 rows regardless of corpus
    size; that's the point of histogram split-finding), as a cumulative
    window with a non-foldable constant partition key. Tie-break on
    (gini, bin) makes the argmin deterministic cross-engine."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    h = (
        o.select(
            F.floor(F.col("o_totalprice") / 10000).cast("long").alias("bin"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    # non-foldable constant partition key (bin is non-nullable, so
    # isNotNull would fold away and leave "No Partition Defined")
    one = F.col("bin") % F.lit(1)
    w_cum = (
        Window.partitionBy(one)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(one).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = h.select(
        "bin",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("pos").over(w_cum).alias("posl"),
        F.sum("n").over(w_all).alias("nt"),
        F.sum("pos").over(w_all).alias("post"),
    )
    nl, posl = F.col("nl"), F.col("posl")
    nr, posr = F.col("nt") - nl, F.col("post") - posl
    pl, ql = posl / nl, (nl - posl) / nl
    pr, qr = posr / nr, (nr - posr) / nr
    gini = (nl * (1.0 - pl * pl - ql * ql) + nr * (1.0 - pr * pr - qr * qr)) / F.col("nt")
    splits = cum.filter((nl > 0) & (nr > 0)).select(
        F.col("bin").alias("split_bin"),
        nl.cast("long").alias("n_left"),
        nr.cast("long").alias("n_right"),
        posl.cast("long").alias("pos_left"),
        posr.cast("long").alias("pos_right"),
        F.round(gini, 6).alias("gini"),
    )
    return splits.orderBy("gini", "split_bin").limit(1)


@query(
    "eval_average_precision",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS s,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), buckets AS (
    SELECT s, SUM(y) AS n_pos, COUNT(*) AS n
    FROM scored GROUP BY s
), cum AS (
    SELECT n_pos,
           SUM(n_pos) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
           SUM(n) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
           SUM(n_pos) OVER () AS tot_pos,
           SUM(n) OVER () AS tot
    FROM buckets
)
SELECT ROUND(SUM((n_pos * 1.0 / tot_pos) * (cpos * 1.0 / cn)), 6)
           AS average_precision,
       CAST(MIN(tot_pos) AS BIGINT) AS n_pos,
       CAST(MIN(tot) AS BIGINT) AS n
FROM cum
""",
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-AUC as average precision, AP = Σ_k ΔR_k · P_k over distinct
    score thresholds descending (sklearn's step-wise definition, tied
    scores processed as one group) — the ranking metric that matters for
    imbalanced retrieval/filter tasks where ROC-AUC flatters. Same
    quantize-then-bucket discipline as ``eval_classifier_auc``: scores
    round to 6 decimals, one map-side-combined groupBy reduces the corpus
    to ≤10⁶ buckets, and the precision/recall cumulatives run over the
    bounded bucket frame (non-foldable constant partition key) — no
    global per-document sort at any size."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        F.round(_s_quality(), 6).alias("s"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    buckets = scored.groupBy("s").agg(
        F.sum("y").alias("n_pos"), F.count(F.lit(1)).alias("n")
    )
    # non-foldable constant key: n_pos is an INTEGER column, so % 1 is
    # identically 0 (s is a double — s % 1 would be its fractional part)
    one = F.col("n_pos") % F.lit(1)
    w_cum = (
        Window.partitionBy(one)
        .orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(one).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "n_pos",
        F.sum("n_pos").over(w_cum).alias("cpos"),
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("n_pos").over(w_all).alias("tot_pos"),
        F.sum("n").over(w_all).alias("tot"),
    )
    return cum.agg(
        F.round(
            F.sum(
                (F.col("n_pos") / F.col("tot_pos"))
                * (F.col("cpos") / F.col("cn"))
            ),
            6,
        ).alias("average_precision"),
        F.min("tot_pos").cast("long").alias("n_pos"),
        F.min("tot").cast("long").alias("n"),
    )


@query(
    "eval_ndcg_quality_ranking",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT doc_id,
           ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS s,
           CASE WHEN lang = 'en' THEN 2
                WHEN lang = 'es' THEN 1 ELSE 0 END AS rel
    FROM toks WHERE len(tokens) > 0
), ranked AS (
    SELECT rel, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rnk
    FROM scored
), ideal AS (
    SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk
    FROM scored
), dcg AS (
    SELECT SUM((POW(2, rel) - 1) / LOG2(rnk + 1)) AS v
    FROM ranked WHERE rnk <= 20
), idcg AS (
    SELECT SUM((POW(2, rel) - 1) / LOG2(rnk + 1)) AS v
    FROM ideal WHERE rnk <= 20
)
SELECT ROUND(dcg.v, 6) AS dcg_20,
       ROUND(idcg.v, 6) AS idcg_20,
       ROUND(dcg.v / idcg.v, 6) AS ndcg_20
FROM dcg, idcg
""",
)
def eval_ndcg_quality_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@20 of the quality-score ranking against graded language
    relevance (en=2, es=1, other=0) — the position-discounted ranking
    metric retrieval evals standardize on. Deterministic tie-breaks
    ((score desc, doc_id) and, for the ideal ranking, (rel desc,
    doc_id)) make the metric hash-checkable.

    Scale: both rankings only ever need their TOP 20 — Spark plans
    ``orderBy(...).limit(k)`` as distributed TakeOrdered (per-partition
    heaps merged on the driver), so no global sort of the corpus
    happens; the DCG sums then run over k rows."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "doc_id", "lang").select(
        "doc_id",
        F.round(_s_quality(), 6).alias("s"),
        F.when(F.col("lang") == "en", 2)
        .when(F.col("lang") == "es", 1)
        .otherwise(0)
        .alias("rel"),
    )
    k = 20
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("rnk") + 1)
    one = F.col("rel") % F.lit(1)  # non-foldable (rel is non-nullable)
    top = scored.orderBy(F.col("s").desc(), "doc_id").limit(k)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(one).orderBy(F.col("s").desc(), "doc_id")
        ),
    )
    itop = scored.orderBy(F.col("rel").desc(), "doc_id").limit(k)
    ideal = itop.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy(one).orderBy(F.col("rel").desc(), "doc_id")
        ),
    )
    dcg = ranked.agg(F.sum(gain).alias("v"))
    idcg = ideal.agg(F.sum(gain).alias("v"))
    return dcg.crossJoin(idcg.withColumnRenamed("v", "iv")).select(
        F.round("v", 6).alias("dcg_20"),
        F.round("iv", 6).alias("idcg_20"),
        F.round(F.col("v") / F.col("iv"), 6).alias("ndcg_20"),
    )


@query(
    "train_naive_bayes_tokens",
    oracle="""
WITH tok AS (
    SELECT lang,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> len(x) > 0)) AS token
    FROM documents
), cnt AS (
    SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
), totals AS (
    SELECT lang, SUM(c) AS t FROM cnt GROUP BY 1
), vocab AS (
    SELECT COUNT(DISTINCT token) AS v FROM tok
), ranked AS (
    SELECT c.lang, c.token,
           ROUND(LN((c.c + 1.0) / (t.t + v.v)), 6) AS logprob,
           ROW_NUMBER() OVER (PARTITION BY c.lang
                              ORDER BY c.c DESC, c.token) AS rnk
    FROM cnt c JOIN totals t ON c.lang = t.lang CROSS JOIN vocab v
)
SELECT lang, token, logprob, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
""",
)
def train_naive_bayes_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training over (lang → token) — the
    classic one-pass distributed text classifier: per-class token counts
    with Laplace smoothing, published as each language's top-5 tokens by
    smoothed log-likelihood (count-desc, token-asc tie-break).

    Scale: training IS aggregation — one map-side-combined
    (lang, token) count, one per-class total, one global distinct-vocab
    count broadcast as a 1-row frame; the per-class top-k is a window
    over each class's token counts, partitioned by class. No iteration,
    no driver-side data."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    tok = d.select(
        "lang", F.explode(_tokens()).alias("token")
    )
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    totals = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    vocab = tok.agg(F.countDistinct("token").alias("v"))
    ranked = (
        cnt.join(totals, "lang")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logprob",
            F.round(F.log((F.col("c") + 1.0) / (F.col("t") + F.col("v"))), 6),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.col("c").desc(), "token"
                )
            ),
        )
    )
    return ranked.filter(F.col("rnk") <= 5).select(
        "lang", "token", "logprob", F.col("rnk").cast("long").alias("rnk")
    )


@query(
    "eval_brier_decomposition",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT ROUND(1.0 / (1.0 + EXP(-(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0 - 2.0))), 3) AS p,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), bins AS (
    SELECT p, COUNT(*) AS n, AVG(y * 1.0) AS obar
    FROM scored GROUP BY p
), tot AS (
    SELECT SUM(n) AS nt, SUM(n * obar) / SUM(n) AS obar_all FROM bins
)
SELECT ROUND(SUM(b.n * (b.p - b.obar) * (b.p - b.obar)) / t.nt, 6)
           AS reliability,
       ROUND(SUM(b.n * (b.obar - t.obar_all) * (b.obar - t.obar_all)) / t.nt,
             6) AS resolution,
       ROUND(MIN(t.obar_all) * (1 - MIN(t.obar_all)), 6) AS uncertainty,
       ROUND(SUM(b.n * ((b.p - b.obar) * (b.p - b.obar)
                        + b.obar * (1 - b.obar))) / t.nt, 6) AS brier,
       CAST(MIN(t.nt) AS BIGINT) AS n
FROM bins b CROSS JOIN tot t
GROUP BY t.nt
""",
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — reliability (calibration
    error) − resolution (discrimination) + uncertainty (base-rate
    entropy) = Brier — for the quality classifier's sigmoid probability,
    quantized to 3 decimals so every probability bin is EXACT (all
    members share p, making the decomposition identity hold exactly,
    not approximately).

    Scale: one map-side-combined groupBy collapses the corpus to ≤1001
    probability bins; the three components are single aggs over that
    bounded frame joined with a 1-row total. The same
    quantize-then-bucket discipline as AUC/AP — no per-document state
    ever leaves the mappers."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    s_expr = _s_quality() - 2.0
    scored = _token_stats(d, "lang").select(
        F.round(1.0 / (1.0 + F.exp(-s_expr)), 3).alias("p"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("y") * 1.0).alias("obar")
    )
    tot = bins.agg(
        F.sum("n").alias("nt"),
        (F.sum(F.col("n") * F.col("obar")) / F.sum("n")).alias("obar_all"),
    )
    b, o = F.col("p") - F.col("obar"), F.col("obar") - F.col("obar_all")
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.round(F.sum(F.col("n") * b * b) / F.min("nt"), 6).alias(
                "reliability"
            ),
            F.round(F.sum(F.col("n") * o * o) / F.min("nt"), 6).alias(
                "resolution"
            ),
            F.round(
                F.min("obar_all") * (1 - F.min("obar_all")), 6
            ).alias("uncertainty"),
            F.round(
                F.sum(
                    F.col("n")
                    * (b * b + F.col("obar") * (1 - F.col("obar")))
                )
                / F.min("nt"),
                6,
            ).alias("brier"),
            F.min("nt").cast("long").alias("n"),
        )
        .drop("nt")
    )


@query(
    "eval_expected_calibration_error",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT 1.0 / (1.0 + EXP(-ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6))) AS p,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), bins AS (
    SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
           COUNT(*) AS n, AVG(p) AS conf, AVG(CAST(y AS DOUBLE)) AS acc
    FROM scored GROUP BY bin
)
SELECT ROUND(SUM(n * ABS(acc - conf)) / SUM(n), 6) AS ece,
       ROUND(MAX(ABS(acc - conf)), 6) AS mce,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used
FROM bins
""",
)
def eval_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected / Maximum Calibration Error over the same 10 fixed-width
    probability bins as ``eval_calibration_curve``: ECE is the
    bin-weight-averaged |accuracy − confidence| gap, MCE the worst bin —
    the single-number summaries model-quality dashboards track per
    checkpoint.

    Scale: identical shape to the calibration curve — one
    map-side-combined groupBy onto a ≤10-value key, then a 10-row final
    agg. No global statistics, no sort, no second pass over the corpus.
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        (1.0 / (1.0 + F.exp(-F.round(_s_quality(), 6)))).alias("p"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("p").alias("conf"),
        F.avg(F.col("y").cast("double")).alias("acc"),
    )
    gap = F.abs(F.col("acc") - F.col("conf"))
    return bins.agg(
        F.round(F.sum(F.col("n") * gap) / F.sum("n"), 6).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
    )


@query(
    "eval_mrr_first_relevant",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang, source,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT doc_id, lang, source,
           ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS s
    FROM toks WHERE len(tokens) > 0
), ranked AS (
    SELECT lang, source, s, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY s DESC, doc_id ASC) AS rnk
    FROM scored
)
SELECT lang,
       CAST(MIN(CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
                     THEN rnk END) AS BIGINT) AS first_rank,
       ROUND(1.0 / MIN(CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
                            THEN rnk END), 6) AS reciprocal_rank,
       CAST(COUNT(*) AS BIGINT) AS n_ranked
FROM ranked GROUP BY lang
""",
)
def eval_mrr_first_relevant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank inputs: per query group (language), the rank
    of the first RELEVANT document (source ∈ src0..src3) under the
    quality-score ranking (score DESC, doc_id tie-break) and its
    reciprocal — the retrieval metric for "how high does the first good
    hit appear".

    Scale: NO per-group global sort. The rank of the first relevant doc
    is computed as 1 + |{docs strictly better than the best relevant
    doc}|: (1) an argmax agg finds each group's best relevant (score,
    doc_id) pair — map-side combined; (2) a broadcast join + one more
    keyed agg counts the better docs. Two aggs and a broadcast replace
    the full ranking window — at 100 TB the per-lang window would funnel
    a skewed language (half the corpus is 'en') through one task, while
    both aggs here keep map-side partials.

    (The oracle states the same semantics with ROW_NUMBER, which DuckDB
    evaluates exactly on the small gate corpus.)"""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "doc_id", "lang", "source").select(
        "doc_id",
        "lang",
        "source",
        F.round(_s_quality(), 6).alias("s"),
    )
    rel = F.col("source").isin("src0", "src1", "src2", "src3")
    # argmax: the best relevant doc per lang = max (s, -doc_id) lexicographic
    best = (
        scored.filter(rel)
        .groupBy("lang")
        .agg(
            F.max(F.struct(F.col("s"), (-F.col("doc_id")).alias("nid"))).alias(
                "b"
            )
        )
        .select(
            "lang",
            F.col("b.s").alias("bs"),
            (-F.col("b.nid")).alias("bid"),
        )
    )
    counted = (
        scored.join(F.broadcast(best), "lang", "left")
        .groupBy("lang")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        (F.col("s") > F.col("bs"))
                        | (
                            (F.col("s") == F.col("bs"))
                            & (F.col("doc_id") < F.col("bid"))
                        ),
                        1,
                    ).otherwise(0)
                )
            ).alias("better_plus_one"),
            F.max(F.col("bs").isNotNull()).alias("has_rel"),
            F.count(F.lit(1)).alias("n_ranked"),
        )
    )
    return counted.select(
        "lang",
        F.when(F.col("has_rel"), F.col("better_plus_one"))
        .cast("long")
        .alias("first_rank"),
        F.round(
            F.when(F.col("has_rel"), 1.0 / F.col("better_plus_one")), 6
        ).alias("reciprocal_rank"),
        F.col("n_ranked").cast("long").alias("n_ranked"),
    )


@query(
    "train_gradient_boost_stumps",
    oracle="""
WITH cells AS MATERIALIZED (
    SELECT CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS ba,
           CAST(MONTH(o_orderdate) AS BIGINT) AS bb,
           COUNT(*) AS n,
           SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS pos
    FROM orders GROUP BY ba, bb
), h1 AS (
    SELECT ba, SUM(n) AS n, SUM(pos) AS pos FROM cells GROUP BY ba
), cum1 AS (
    SELECT ba,
           SUM(n)   OVER w AS nl,
           SUM(pos) OVER w AS posl,
           SUM(n)   OVER () AS nt,
           SUM(pos) OVER () AS post
    FROM h1
    WINDOW w AS (ORDER BY ba ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), best1 AS MATERIALIZED (
    SELECT ba AS split_a, nl, posl, nt, post,
           ROUND((nl * (1.0 - (posl * 1.0 / nl) * (posl * 1.0 / nl)
                            - ((nl - posl) * 1.0 / nl)
                              * ((nl - posl) * 1.0 / nl))
                + (nt - nl) * (1.0
                    - ((post - posl) * 1.0 / (nt - nl))
                      * ((post - posl) * 1.0 / (nt - nl))
                    - ((nt - nl - post + posl) * 1.0 / (nt - nl))
                      * ((nt - nl - post + posl) * 1.0 / (nt - nl))))
                / nt, 6) AS gini
    FROM cum1 WHERE nl > 0 AND nt - nl > 0
    ORDER BY gini, split_a LIMIT 1
), leaf AS MATERIALIZED (
    SELECT split_a,
           ROUND(post * 1.0 / nt
                 + 0.5 * (posl * 1.0 - nl * (post * 1.0 / nt)) / nl,
                 9) AS f1_lo,
           ROUND(post * 1.0 / nt
                 + 0.5 * ((post - posl) * 1.0
                          - (nt - nl) * (post * 1.0 / nt)) / (nt - nl),
                 9) AS f1_hi,
           nt
    FROM best1
), cells2 AS (
    SELECT c.bb,
           CASE WHEN c.ba <= l.split_a THEN l.f1_lo ELSE l.f1_hi END AS f1,
           c.n, c.pos
    FROM cells c CROSS JOIN leaf l
), perb AS (
    SELECT bb,
           SUM(pos - n * f1) AS sr,
           SUM(pos * (1 - 2 * f1) + n * f1 * f1) AS sr2,
           SUM(n) AS n
    FROM cells2 GROUP BY bb
), cum2 AS (
    SELECT bb,
           SUM(sr)  OVER w AS srl,
           SUM(sr2) OVER w AS sr2l,
           SUM(n)   OVER w AS nl,
           SUM(sr)  OVER () AS srt,
           SUM(sr2) OVER () AS sr2t,
           SUM(n)   OVER () AS nt
    FROM perb
    WINDOW w AS (ORDER BY bb ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
), best2 AS (
    SELECT bb AS split_b,
           ROUND(((sr2l - srl * srl / nl)
                  + ((sr2t - sr2l)
                     - (srt - srl) * (srt - srl) / (nt - nl))) / nt,
                 6) AS mse_round2,
           ROUND((sr2t - srt * srt / nt) / nt, 6) AS mse_round1
    FROM cum2 WHERE nl > 0 AND nt - nl > 0
    ORDER BY mse_round2, split_b LIMIT 1
)
SELECT CAST(l.split_a AS BIGINT) AS split_bin_price,
       ROUND(l.f1_lo, 6) AS f1_low,
       ROUND(l.f1_hi, 6) AS f1_high,
       CAST(b.split_b AS BIGINT) AS split_month,
       b.mse_round1, b.mse_round2,
       CAST(l.nt AS BIGINT) AS n
FROM leaf l CROSS JOIN best2 b
""",
)
def train_gradient_boost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-round gradient boosting with histogram stumps (the inner loop
    of LightGBM/XGBoost ``hist``): round 1 picks the Gini-best split on
    the binned price feature and nudges the base-rate prediction by
    lr=0.5 of each side's mean residual; round 2 fits a second stump on
    the order-month feature over the UPDATED residuals, choosing the
    split that minimizes post-round SSE/n. Reports both stumps' splits,
    round-1 leaf values, and train MSE before/after round 2.

    Scale — the histogram-boosting contract: the corpus is scanned
    EXACTLY ONCE, into the joint (price_bin × month) cell table (≤ a few
    hundred rows at any data size). Everything after — round-1 marginal
    histogram, split scan, leaf values, residual sufficient statistics
    (Σr, Σr² per cell derive from (n, pos, F1) because y is 0/1 and F1
    is constant per round-1 side), round-2 split scan — runs on that
    bounded table with cumulative windows (non-foldable constant key)
    and 1-row broadcasts. Adding boosting rounds adds zero corpus
    passes, only more tiny cell-table scans.

    Cross-engine float discipline: leaf values round to 9 decimals
    before entering round-2 sums; split metrics round to 6 with (metric,
    bin) tie-breaks, so both engines' argmins agree."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cells = (
        o.select(
            F.floor(F.col("o_totalprice") / 10000).cast("long").alias("ba"),
            F.month("o_orderdate").cast("long").alias("bb"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .localCheckpoint(eager=True)  # referenced by both rounds
    )
    h1 = cells.groupBy("ba").agg(F.sum("n").alias("n"), F.sum("pos").alias("pos"))
    one_a = F.col("ba") % F.lit(1)
    w_cum1 = (
        Window.partitionBy(one_a)
        .orderBy("ba")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all1 = Window.partitionBy(one_a).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum1 = h1.select(
        "ba",
        F.sum("n").over(w_cum1).alias("nl"),
        F.sum("pos").over(w_cum1).alias("posl"),
        F.sum("n").over(w_all1).alias("nt"),
        F.sum("pos").over(w_all1).alias("post"),
    )
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    nr, posr = nt - nl, post - posl
    pl, ql = posl / nl, (nl - posl) / nl
    pr, qr = posr / nr, (nr - posr) / nr
    gini = (
        nl * (1.0 - pl * pl - ql * ql) + nr * (1.0 - pr * pr - qr * qr)
    ) / nt
    best1 = (
        cum1.filter((nl > 0) & (nr > 0))
        .select(
            F.col("ba").alias("split_a"),
            "nl",
            "posl",
            "nt",
            "post",
            F.round(gini, 6).alias("gini"),
        )
        .orderBy("gini", "split_a")
        .limit(1)
    )
    ybar = post / nt
    leaf = best1.select(
        "split_a",
        F.round(ybar + 0.5 * (posl - nl * ybar) / nl, 9).alias("f1_lo"),
        F.round(ybar + 0.5 * ((post - posl) - (nt - nl) * ybar) / (nt - nl), 9)
        .alias("f1_hi"),
        "nt",
    )
    cells2 = cells.crossJoin(F.broadcast(leaf)).select(
        "bb",
        F.when(F.col("ba") <= F.col("split_a"), F.col("f1_lo"))
        .otherwise(F.col("f1_hi"))
        .alias("f1"),
        "n",
        "pos",
    )
    f1 = F.col("f1")
    perb = cells2.groupBy("bb").agg(
        F.sum(F.col("pos") - F.col("n") * f1).alias("sr"),
        F.sum(F.col("pos") * (1 - 2 * f1) + F.col("n") * f1 * f1).alias("sr2"),
        F.sum("n").alias("n"),
    )
    one_b = F.col("bb") % F.lit(1)
    w_cum2 = (
        Window.partitionBy(one_b)
        .orderBy("bb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all2 = Window.partitionBy(one_b).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum2 = perb.select(
        "bb",
        F.sum("sr").over(w_cum2).alias("srl"),
        F.sum("sr2").over(w_cum2).alias("sr2l"),
        F.sum("n").over(w_cum2).alias("nl"),
        F.sum("sr").over(w_all2).alias("srt"),
        F.sum("sr2").over(w_all2).alias("sr2t"),
        F.sum("n").over(w_all2).alias("nt"),
    )
    srl, sr2l, n2l = F.col("srl"), F.col("sr2l"), F.col("nl")
    srt, sr2t, n2t = F.col("srt"), F.col("sr2t"), F.col("nt")
    best2 = (
        cum2.filter((n2l > 0) & (n2t - n2l > 0))
        .select(
            F.col("bb").alias("split_b"),
            F.round(
                (
                    (sr2l - srl * srl / n2l)
                    + ((sr2t - sr2l) - (srt - srl) * (srt - srl) / (n2t - n2l))
                )
                / n2t,
                6,
            ).alias("mse_round2"),
            F.round((sr2t - srt * srt / n2t) / n2t, 6).alias("mse_round1"),
        )
        .orderBy("mse_round2", "split_b")
        .limit(1)
    )
    return leaf.crossJoin(F.broadcast(best2)).select(
        F.col("split_a").cast("long").alias("split_bin_price"),
        F.round("f1_lo", 6).alias("f1_low"),
        F.round("f1_hi", 6).alias("f1_high"),
        F.col("split_b").cast("long").alias("split_month"),
        "mse_round1",
        "mse_round2",
        F.col("nt").cast("long").alias("n"),
    )


@query(
    "eval_pass_at_k",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT doc_id % 50 AS problem_id,
           CASE WHEN ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) > 2.7 THEN 1 ELSE 0 END AS ok
    FROM toks WHERE len(tokens) > 0
), probs AS (
    SELECT problem_id, COUNT(*) AS n, SUM(ok) AS c
    FROM scored GROUP BY problem_id
    HAVING COUNT(*) >= 5
), pk AS (
    SELECT problem_id,
           ROUND(1.0 - (n - c) * 1.0 / n, 6) AS p1,
           CASE WHEN n - c < 5 THEN 1.0
                ELSE ROUND(1.0 - ((n - c) * (n - c - 1) * (n - c - 2)
                                  * (n - c - 3) * (n - c - 4)) * 1.0
                                 / (n * (n - 1) * (n - 2) * (n - 3)
                                    * (n - 4)), 6)
           END AS p5
    FROM probs
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_problems,
       ROUND(CAST(SUM(CAST(p1 AS DECIMAL(18, 6))) AS DOUBLE)
             / COUNT(*), 6) AS pass_at_1,
       ROUND(CAST(SUM(CAST(p5 AS DECIMAL(18, 6))) AS DOUBLE)
             / COUNT(*), 6) AS pass_at_5
FROM pk
""",
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k — the unbiased code-generation eval estimator (Chen et al.
    2021, Codex): per problem with n samples of which c pass,
    pass@k = 1 − C(n−c, k)/C(n, k), averaged over problems. Documents
    stand in as samples (problem = doc_id mod 50, "passing" = quality
    score above 2.7); reported for k = 1 and k = 5 over problems
    with ≥ 5 samples.

    Exactness: C(n−c,k)/C(n,k) is computed as a ratio of INTEGER falling
    factorials — exact in both engines' int64 (n ≤ ~10⁴ per problem
    before n⁵ nears the range; shard larger n by sampling, as the
    estimator itself prescribes). Per-problem values quantize to 6
    decimals and sum as DECIMAL(18,6), so the cross-problem average
    cannot drift with summation order.

    Scale: one map-side-combined groupBy to (problem → n, c), then
    row-local arithmetic and one exact-decimal agg — no sort, no second
    corpus pass, no per-sample state."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "doc_id").select(
        (F.col("doc_id") % 50).alias("problem_id"),
        F.when(F.round(_s_quality(), 6) > 2.7, 1).otherwise(0).alias("ok"),
    )
    probs = (
        scored.groupBy("problem_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("c"))
        .filter(F.col("n") >= 5)
    )
    n, c = F.col("n"), F.col("c")
    m = n - c

    def falling(base, k):
        prod = base
        for i in range(1, k):
            prod = prod * (base - i)
        return prod

    pk = probs.select(
        "problem_id",
        F.round(1.0 - m / n, 6).alias("p1"),
        F.when(m < 5, F.lit(1.0))
        .otherwise(F.round(1.0 - falling(m, 5) / falling(n, 5), 6))
        .alias("p5"),
    )
    return pk.agg(
        F.count(F.lit(1)).cast("long").alias("n_problems"),
        F.round(
            F.sum(F.col("p1").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pass_at_1"),
        F.round(
            F.sum(F.col("p5").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("pass_at_5"),
    )


@query(
    "eval_confusion_at_thresholds",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT 1.0 / (1.0 + EXP(-ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6))) AS p,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), fanned AS (
    SELECT t.tau, s.p, s.y
    FROM scored s CROSS JOIN (VALUES (0.3), (0.5), (0.7)) t(tau)
), cm AS (
    SELECT tau,
           SUM(CASE WHEN p >= tau AND y = 1 THEN 1 ELSE 0 END) AS tp,
           SUM(CASE WHEN p >= tau AND y = 0 THEN 1 ELSE 0 END) AS fp,
           SUM(CASE WHEN p < tau AND y = 1 THEN 1 ELSE 0 END) AS fn,
           SUM(CASE WHEN p < tau AND y = 0 THEN 1 ELSE 0 END) AS tn
    FROM fanned GROUP BY tau
)
SELECT tau,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       ROUND(tp * 1.0 / NULLIF(tp + fp, 0), 6) AS precision_,
       ROUND(tp * 1.0 / NULLIF(tp + fn, 0), 6) AS recall_,
       ROUND(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS f1,
       ROUND((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy
FROM cm
""",
)
def eval_confusion_at_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1/accuracy at a lattice of
    decision thresholds (0.3 / 0.5 / 0.7) for the quality classifier —
    the table every model-promotion dashboard renders next to AUC.

    Scale: the threshold lattice fans each row out 3× ROW-LOCALLY
    (explode of a 3-element literal array — no join, no second scan) and
    ONE map-side-combined groupBy on the 3-value threshold key reduces
    the corpus to 3 rows of integer counts; all ratios are row-local math
    on exact counts (NULLIF guards empty cells, ANSI-safe both engines).
    """
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        (1.0 / (1.0 + F.exp(-F.round(_s_quality(), 6)))).alias("p"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    fanned = scored.select(
        F.explode(F.array(F.lit(0.3), F.lit(0.5), F.lit(0.7))).alias("tau"),
        "p",
        "y",
    )
    p, y, tau = F.col("p"), F.col("y"), F.col("tau")
    cm = fanned.groupBy("tau").agg(
        F.sum(F.when((p >= tau) & (y == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((p >= tau) & (y == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((p < tau) & (y == 1), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((p < tau) & (y == 0), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return cm.select(
        "tau",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(tp / F.nullif(tp + fp, F.lit(0)), 6).alias("precision_"),
        F.round(tp / F.nullif(tp + fn, F.lit(0)), 6).alias("recall_"),
        F.round(2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)), 6).alias("f1"),
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
    )


@query(
    "eval_spearman_rank_correlation",
    oracle="""
WITH toks AS (
    SELECT doc_id, n_chars,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT n_chars AS y_val,
           ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS x_val
    FROM toks WHERE len(tokens) > 0
), xr AS (
    SELECT x_val,
           SUM(c) OVER (ORDER BY x_val ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - c + (c + 1) / 2.0 AS rx
    FROM (SELECT x_val, COUNT(*) AS c FROM scored GROUP BY x_val)
), yr AS (
    SELECT y_val,
           SUM(c) OVER (ORDER BY y_val ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - c + (c + 1) / 2.0 AS ry
    FROM (SELECT y_val, COUNT(*) AS c FROM scored GROUP BY y_val)
), ranked AS (
    SELECT xr.rx, yr.ry
    FROM scored s JOIN xr ON s.x_val = xr.x_val JOIN yr ON s.y_val = yr.y_val
), moments AS (
    SELECT COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
           SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           AS spearman_rho
FROM moments
""",
)
def eval_spearman_rank_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation (with mid-rank tie handling) between the
    quality score and document length — the monotone-association check
    run before trusting a heuristic filter as a training-signal proxy.

    Sort-free ranking at scale: NO global per-row sort. Each variable
    reduces to its DISTINCT-VALUE histogram (quantized scores: ≤10⁶
    values; lengths: bounded domain) with a map-side-combined groupBy;
    mid-ranks come from a cumulative window over that bounded frame
    (rank = cum_count − c + (c+1)/2); rows get their ranks back via two
    keyed equi-joins on the value. Pearson over the mid-ranks is one
    5-moment aggregate. Rank sums are exact (integers and halves well
    inside 2⁵³ at gate scale), so cross-engine summation order cannot
    drift the result."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "n_chars").select(
        F.col("n_chars").alias("y_val"),
        F.round(_s_quality(), 6).alias("x_val"),
    )

    def midranks(df: DataFrame, col: str, out: str) -> DataFrame:
        h = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        # non-foldable constant key over the bounded distinct-value frame
        one = F.col("c") % F.lit(1)
        w = (
            Window.partitionBy(one)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return h.select(
            col,
            (F.sum("c").over(w) - F.col("c") + (F.col("c") + 1) / 2.0).alias(
                out
            ),
        )
    ranked = scored.join(midranks(scored, "x_val", "rx"), "x_val").join(
        midranks(scored, "y_val", "ry"), "y_val"
    )
    rx, ry = F.col("rx"), F.col("ry")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx).alias("sx"),
        F.sum(ry).alias("sy"),
        F.sum(rx * ry).alias("sxy"),
        F.sum(rx * rx).alias("sxx"),
        F.sum(ry * ry).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        n.cast("long").alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


@query(
    "eval_corpus_bleu2",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS ref
    FROM documents
), pairs AS (
    SELECT doc_id, ref,
           list_transform(
               range(1, CAST(CEIL(len(ref) * 0.8) AS BIGINT) + 1),
               i -> CASE WHEN i % 7 = 3 THEN 'the' ELSE ref[i] END) AS hyp
    FROM toks WHERE len(ref) >= 5
), uni_h AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS ch
    FROM pairs, UNNEST(hyp) AS u(g) GROUP BY doc_id, u.g
), uni_r AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS cr
    FROM pairs, UNNEST(ref) AS u(g) GROUP BY doc_id, u.g
), bi_h AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS ch
    FROM (SELECT doc_id,
                 list_transform(range(1, len(hyp)),
                                i -> hyp[i] || ' ' || hyp[i + 1]) AS bs
          FROM pairs), UNNEST(bs) AS u(g)
    GROUP BY doc_id, u.g
), bi_r AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS cr
    FROM (SELECT doc_id,
                 list_transform(range(1, len(ref)),
                                i -> ref[i] || ' ' || ref[i + 1]) AS bs
          FROM pairs), UNNEST(bs) AS u(g)
    GROUP BY doc_id, u.g
), p1 AS (
    SELECT SUM(LEAST(h.ch, COALESCE(r.cr, 0))) AS clipped, SUM(h.ch) AS total
    FROM uni_h h LEFT JOIN uni_r r USING (doc_id, gram)
), p2 AS (
    SELECT SUM(LEAST(h.ch, COALESCE(r.cr, 0))) AS clipped, SUM(h.ch) AS total
    FROM bi_h h LEFT JOIN bi_r r USING (doc_id, gram)
), lens AS (
    SELECT SUM(len(ref)) AS r, SUM(len(hyp)) AS h,
           COUNT(*) AS n_docs
    FROM pairs
)
SELECT CAST(lens.n_docs AS BIGINT) AS n_docs,
       ROUND(p1.clipped * 1.0 / p1.total, 6) AS p1,
       ROUND(p2.clipped * 1.0 / p2.total, 6) AS p2,
       ROUND(LEAST(1.0, EXP(1 - lens.r * 1.0 / lens.h)), 6) AS brevity_penalty,
       ROUND(LEAST(1.0, EXP(1 - lens.r * 1.0 / lens.h))
             * EXP(0.5 * (LN(p1.clipped * 1.0 / p1.total)
                          + LN(p2.clipped * 1.0 / p2.total))), 6) AS bleu2
FROM p1, p2, lens
""",
)
def eval_corpus_bleu2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 (Papineni et al. 2002): clipped modified
    unigram/bigram precision + brevity penalty, over deterministic
    (hypothesis, reference) pairs — the hypothesis is each document
    truncated to 80% with every 7th token substituted, so all three BLEU
    components are non-trivial and engine-reproducible. The generation
    eval every translation/summarization pipeline reports.

    Scale — BLEU as keyed aggregation, no alignment pass: the corpus is
    tokenized ONCE and every n-gram (hyp/ref × uni/bi) flows through a
    single explode tagged with (n, role) flags, so clipping needs no
    hyp⋈ref join at all — one (doc, n, gram) count aggregate yields ch
    and cr side by side, ``least(ch, cr)`` is row-local, and corpus
    precision is one SUM of exact integer counts per n. The corpus
    lengths and doc count ride the same aggregate (h = Σch, r = Σcr at
    n=1; a per-doc n=0 seed row counts docs), so the whole query is one
    corpus scan, one keyed shuffle, and 1-row arithmetic — the former
    shape re-ran the tokenization subtree five times and paid two keyed
    joins for the clipping."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    pairs = (
        d.withColumn("ref", _tokens())
        .filter(F.size("ref") >= 5)
        .select(
            "doc_id",
            "ref",
            F.expr(
                "transform(sequence(1, CAST(CEIL(size(ref) * 0.8) AS INT)), "
                "i -> CASE WHEN i % 7 = 3 THEN 'the' ELSE ref[i - 1] END)"
            ).alias("hyp"),
        )
    )
    bigrams = "transform(sequence(1, size({c}) - 1), i -> concat({c}[i - 1], ' ', {c}[i]))"
    tag = (
        "transform({src}, g -> struct({n} AS n, {h} AS h, {r} AS r, g AS gram))"
    )
    grams = pairs.select(
        "doc_id",
        F.explode(
            F.expr(
                "concat("
                # one seed row per doc: n_docs = sum(ch) of the n=0 group
                + "array(struct(0 AS n, 1 AS h, 0 AS r, '' AS gram)), "
                + tag.format(src="hyp", n=1, h=1, r=0)
                + ", "
                + tag.format(src="ref", n=1, h=0, r=1)
                + ", "
                + tag.format(src=bigrams.format(c="hyp"), n=2, h=1, r=0)
                + ", "
                + tag.format(src=bigrams.format(c="ref"), n=2, h=0, r=1)
                + ")"
            )
        ).alias("x"),
    )
    counts = grams.groupBy("doc_id", F.col("x.n").alias("n"), F.col("x.gram")).agg(
        F.sum("x.h").alias("ch"), F.sum("x.r").alias("cr")
    )
    # ref-only grams have ch=0: least(0, cr)=0 and 0 into Σch — the sums
    # equal the old hyp-side LEFT-join form exactly (integer arithmetic)
    pre = counts.groupBy("n").agg(
        F.sum(F.least(F.col("ch"), F.col("cr"))).alias("clipped"),
        F.sum("ch").alias("total"),
        F.sum("cr").alias("rtot"),
    )
    one = pre.agg(
        F.max(F.when(F.col("n") == 0, F.col("total"))).alias("n_docs"),
        F.max(
            F.when(F.col("n") == 1, F.col("clipped") / F.col("total"))
        ).alias("p1v"),
        F.max(
            F.when(F.col("n") == 2, F.col("clipped") / F.col("total"))
        ).alias("p2v"),
        F.max(F.when(F.col("n") == 1, F.col("rtot"))).alias("r"),
        F.max(F.when(F.col("n") == 1, F.col("total"))).alias("h"),
    )
    # Standard BP cap: 1 when the hypothesis corpus is longer than the
    # reference (here h < r always — hyp truncated to 80% — but the cap
    # keeps the helper correct if the pairing is reused, ADVICE r7 #3).
    bp = F.least(F.lit(1.0), F.exp(1 - F.col("r") / F.col("h")))
    return one.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("p1v", 6).alias("p1"),
        F.round("p2v", 6).alias("p2"),
        F.round(bp, 6).alias("brevity_penalty"),
        F.round(
            bp * F.exp(0.5 * (F.log("p1v") + F.log("p2v"))), 6
        ).alias("bleu2"),
    )


@query(
    "eval_auc_delong_ci",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT ROUND(LN(1 + len(tokens)) * 0.5
                 + (len(list_distinct(tokens)) / len(tokens)) * 1.5
                 - (len(list_filter(tokens, x -> regexp_matches(x, '^[0-9]+$')))
                    / len(tokens)) * 3.0, 6) AS s,
           CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS y
    FROM toks WHERE len(tokens) > 0
), buckets AS (
    SELECT s, SUM(y) AS p, COUNT(*) - SUM(y) AS q FROM scored GROUP BY s
), cum AS (
    SELECT p, q,
           SUM(q) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - q AS q_below,
           SUM(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - p AS p_above,
           SUM(p) OVER () AS np, SUM(q) OVER () AS nq
    FROM buckets
), placed AS (
    SELECT p, q, np, nq,
           (q_below + 0.5 * q) / nq AS v10,
           (p_above + 0.5 * p) / np AS v01
    FROM cum
), auc_t AS (
    SELECT SUM(p * v10) / MIN(np) AS auc, MIN(np) AS np, MIN(nq) AS nq
    FROM placed
)
SELECT ROUND(a.auc, 6) AS auc,
       ROUND(SQRT(
           (SELECT SUM(p * (v10 - a.auc) * (v10 - a.auc)) FROM placed)
               / (a.np - 1) / a.np
         + (SELECT SUM(q * (v01 - (1 - a.auc)) * (v01 - (1 - a.auc)))
            FROM placed) / (a.nq - 1) / a.nq), 6) AS se,
       ROUND(a.auc - 1.96 * SQRT(
           (SELECT SUM(p * (v10 - a.auc) * (v10 - a.auc)) FROM placed)
               / (a.np - 1) / a.np
         + (SELECT SUM(q * (v01 - (1 - a.auc)) * (v01 - (1 - a.auc)))
            FROM placed) / (a.nq - 1) / a.nq), 6) AS ci_lo,
       ROUND(a.auc + 1.96 * SQRT(
           (SELECT SUM(p * (v10 - a.auc) * (v10 - a.auc)) FROM placed)
               / (a.np - 1) / a.np
         + (SELECT SUM(q * (v01 - (1 - a.auc)) * (v01 - (1 - a.auc)))
            FROM placed) / (a.nq - 1) / a.nq), 6) AS ci_hi,
       CAST(a.np AS BIGINT) AS n_pos, CAST(a.nq AS BIGINT) AS n_neg
FROM auc_t a
""",
)
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC with a DeLong (1988) confidence interval — the standard
    answer to "is this AUC actually better, or just noise": AUC is the
    mean positive placement (fraction of negatives below, mid-rank
    ties), and the DeLong variance is the placement variance of the
    positives plus that of the negatives, each over its own class size.

    Scale — same quantize-then-bucket discipline as the exact AUC:
    scores round to 6 decimals, ONE map-side-combined groupBy reduces
    the corpus to score buckets, placements come from two cumulative
    windows over the bounded bucket frame (negatives-below ascending,
    positives-above descending), and the variance terms are one more
    agg over that frame joined to the 1-row AUC. No per-pair comparison
    (naive DeLong is O(m·n)), no global per-document sort."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    scored = _token_stats(d, "lang").select(
        F.round(_s_quality(), 6).alias("s"),
        F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
    )
    buckets = scored.groupBy("s").agg(
        F.sum("y").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).alias("q"),
    )
    one = F.col("p") % F.lit(1)
    w_up = (
        Window.partitionBy(one)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_dn = (
        Window.partitionBy(one)
        .orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(one).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    placed = buckets.select(
        "p",
        "q",
        ((F.sum("q").over(w_up) - F.col("q") + 0.5 * F.col("q"))
         / F.sum("q").over(w_all)).alias("v10"),
        ((F.sum("p").over(w_dn) - F.col("p") + 0.5 * F.col("p"))
         / F.sum("p").over(w_all)).alias("v01"),
        F.sum("p").over(w_all).alias("np"),
        F.sum("q").over(w_all).alias("nq"),
    )
    auc_t = placed.agg(
        (F.sum(F.col("p") * F.col("v10")) / F.min("np")).alias("auc")
    )
    j = placed.crossJoin(F.broadcast(auc_t))
    auc = F.col("auc")
    var = j.agg(
        F.min("auc").alias("auc"),
        F.min("np").alias("np"),
        F.min("nq").alias("nq"),
        (
            F.sum(F.col("p") * (F.col("v10") - auc) * (F.col("v10") - auc))
            / (F.min("np") - 1)
            / F.min("np")
            + F.sum(
                F.col("q")
                * (F.col("v01") - (1 - auc))
                * (F.col("v01") - (1 - auc))
            )
            / (F.min("nq") - 1)
            / F.min("nq")
        ).alias("var"),
    )
    se = F.sqrt(F.col("var"))
    return var.select(
        F.round("auc", 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(F.col("auc") - 1.96 * se, 6).alias("ci_lo"),
        F.round(F.col("auc") + 1.96 * se, 6).alias("ci_hi"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nq").cast("long").alias("n_neg"),
    )


@query(
    "eval_rouge2_f1",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS ref
    FROM documents
), pairs AS (
    SELECT doc_id, lang, ref,
           list_transform(
               range(1, CAST(CEIL(len(ref) * 0.8) AS BIGINT) + 1),
               i -> CASE WHEN i % 7 = 3 THEN 'the' ELSE ref[i] END) AS hyp
    FROM toks WHERE len(ref) >= 5
), bi_h AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS ch
    FROM (SELECT doc_id,
                 list_transform(range(1, len(hyp)),
                                i -> hyp[i] || ' ' || hyp[i + 1]) AS bs
          FROM pairs), UNNEST(bs) AS u(g)
    GROUP BY doc_id, u.g
), bi_r AS (
    SELECT doc_id, u.g AS gram, COUNT(*) AS cr
    FROM (SELECT doc_id,
                 list_transform(range(1, len(ref)),
                                i -> ref[i] || ' ' || ref[i + 1]) AS bs
          FROM pairs), UNNEST(bs) AS u(g)
    GROUP BY doc_id, u.g
), matched AS (
    SELECT doc_id,
           SUM(LEAST(h.ch, COALESCE(r.cr, 0))) AS m,
           SUM(h.ch) AS n_hyp
    FROM bi_h h LEFT JOIN bi_r r USING (doc_id, gram)
    GROUP BY doc_id
), per_doc AS (
    SELECT p.lang,
           m.m * 1.0 / m.n_hyp AS prec,
           m.m * 1.0 / (len(p.ref) - 1) AS rec
    FROM matched m JOIN pairs p USING (doc_id)
)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(prec), 6) AS rouge2_precision,
       ROUND(AVG(rec), 6) AS rouge2_recall,
       ROUND(AVG(CASE WHEN prec + rec = 0 THEN 0.0
                      ELSE 2 * prec * rec / (prec + rec) END), 6) AS rouge2_f1
FROM per_doc
GROUP BY lang
""",
)
def eval_rouge2_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (Lin 2004) per-language macro averages over the same
    deterministic (hypothesis, reference) pairing as eval_corpus_bleu2:
    per doc, clipped matched bigrams give precision (vs hypothesis
    bigrams) and RECALL (vs reference bigrams — the half BLEU doesn't
    measure), combined as F1; macro-averaged per language.  The standard
    summarization eval.

    Scale: identical discipline to BLEU — row-local bigram construction,
    per-doc (doc_id, gram) equi-join for clipping (build side is each
    doc's own grams, never a corpus vocabulary), then arithmetic on the
    per-lang frame."""
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    pairs = (
        d.withColumn("ref", _tokens())
        .filter(F.size("ref") >= 5)
        .select(
            "doc_id",
            "lang",
            "ref",
            F.expr(
                "transform(sequence(1, CAST(CEIL(size(ref) * 0.8) AS INT)), "
                "i -> CASE WHEN i % 7 = 3 THEN 'the' ELSE ref[i - 1] END)"
            ).alias("hyp"),
        )
    )
    bigrams = (
        "transform(sequence(1, size({c}) - 1), i -> concat({c}[i - 1], ' ', {c}[i]))"
    )

    def gram_counts(col: str, out: str) -> DataFrame:
        return (
            pairs.select("doc_id", F.explode(F.expr(bigrams.format(c=col))).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).alias(out))
        )

    h = gram_counts("hyp", "ch")
    r = gram_counts("ref", "cr")
    matched = (
        h.join(r, ["doc_id", "gram"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.least(F.col("ch"), F.coalesce(F.col("cr"), F.lit(0)))).alias("m"),
            F.sum("ch").alias("n_hyp"),
        )
    )
    per_doc = matched.join(
        pairs.select("doc_id", "lang", (F.size("ref") - 1).alias("n_ref")),
        "doc_id",
    ).select(
        "lang",
        (F.col("m") / F.col("n_hyp")).alias("prec"),
        (F.col("m") / F.col("n_ref")).alias("rec"),
    )
    f1 = F.when(F.col("prec") + F.col("rec") == 0, F.lit(0.0)).otherwise(
        2 * F.col("prec") * F.col("rec") / (F.col("prec") + F.col("rec"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("prec"), 6).alias("rouge2_precision"),
        F.round(F.avg("rec"), 6).alias("rouge2_recall"),
        F.round(F.avg(f1), 6).alias("rouge2_f1"),
    )
