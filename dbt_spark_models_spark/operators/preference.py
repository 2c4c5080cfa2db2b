"""Preference-data operators for RLHF-style training pipelines:
pairwise-comparison construction and Bradley-Terry strength estimation.

Beyond-reference surface (BASELINE.json north star): preference tuning
needs (chosen, rejected) pairs mined from ranked corpora and a
principled aggregate of noisy pairwise outcomes into per-item strengths
— the two ops here, expressed Spark-first:

- ``pipeline_preference_pair_construction``: per query group (language),
  pair the k-th best document with the k-th worst under the quality
  ranking — the standard margin-maximising pair-mining scheme for DPO /
  reward-model training data.
- ``curation_bradley_terry_strengths``: Bradley-Terry MM estimation
  (Hunter 2004's minorization-maximization update) over pairwise match
  outcomes between document SOURCES. The corpus is touched exactly once
  (match extraction + matrix aggregation); the fixed-point iterations
  run on the tiny aggregated win matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.operators.text import _tokens
from dbt_spark_models_spark.sources.testdata import load_tables, spread

_BT_ITERS = 3
_BT_EPS = "0.000001"

_SCORED_SQL = """toks AS (
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
)"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared quantized quality score (same feature math as
    ``text_quality_linear_score`` / ``eval_classifier_auc``).

    r11: the three token counts come from the shared
    ``token_count_stats`` helper (JVM expressions — see its measurement
    note; an Arrow-kernel variant was tried and measured slower on these
    short token arrays); the score arithmetic runs over exact integer
    counts, so the quantized value is bit-identical either way."""
    from dbt_spark_models_spark.operators.text import token_count_stats

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    stats = token_count_stats(
        d.select("doc_id", "lang", "source", _tokens().alias("tokens"))
    )
    n_tok = F.col("n_tok")
    return stats.filter(n_tok > 0).select(
        "doc_id",
        "lang",
        "source",
        F.round(
            F.log(F.lit(1) + n_tok) * 0.5
            + (F.col("n_distinct") / n_tok) * 1.5
            - (F.col("n_digit") / n_tok) * 3.0,
            6,
        ).alias("s"),
    )


@query(
    "pipeline_preference_pair_construction",
    oracle=f"""
WITH {_SCORED_SQL}, ranked AS (
    SELECT lang, doc_id, s,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY s DESC, doc_id ASC) AS rd,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY s ASC, doc_id DESC) AS ra,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM scored
), pairs AS (
    SELECT t.lang, t.doc_id AS chosen_id, b.doc_id AS rejected_id,
           t.s - b.s AS margin
    FROM ranked t
    JOIN ranked b ON t.lang = b.lang AND b.ra = t.rd
    WHERE t.rd <= CAST(FLOOR(t.n / 4) AS INT)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(margin AS DECIMAL(18, 6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_margin,
       ROUND(MIN(margin), 6) AS min_margin,
       ROUND(MAX(margin), 6) AS max_margin,
       CAST(MIN(chosen_id) AS BIGINT) AS min_chosen_id,
       CAST(MIN(rejected_id) AS BIGINT) AS min_rejected_id
FROM pairs GROUP BY lang
""",
)
def pipeline_preference_pair_construction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(chosen, rejected) preference-pair mining for DPO / reward-model
    training: within each query group (language), rank documents by the
    quality score and pair the k-th BEST with the k-th WORST for k up to
    ⌊n/4⌋ — maximal-margin pairs, the standard scheme when converting a
    scored corpus into pairwise preference data. Reports per-group pair
    counts and margin statistics.

    The reverse rank is derived, not recomputed: ordering by (s ASC,
    doc_id DESC) is the exact reversal of (s DESC, doc_id ASC), so
    ra = n + 1 - rd and the k-th-worst partner is the row whose reverse
    rank equals k. The pairing join is keyed on (lang, rank) — an
    equi-join, never a cross product.

    Scale: the per-group ranking window is the one skewed stage (half
    the corpus is one language); at 100 TB swap it for the
    ``exact_ntile``/``distributed_cumsum`` primitive (range shuffle +
    broadcast per-partition offsets, `operators/windows.py`) applied per
    group — the pairing join and the final agg are already keyed and
    map-side combinable."""
    scored = _scored(spark, sf_dir)
    w_desc = Window.partitionBy("lang").orderBy(
        F.col("s").desc(), F.col("doc_id").asc()
    )
    w_n = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "doc_id",
        "s",
        F.row_number().over(w_desc).alias("rd"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    # reverse rank by identity, not a second sort: ra = n + 1 - rd
    ranked = ranked.withColumn("ra", F.col("n") + 1 - F.col("rd"))
    quarter = F.floor(F.col("n") / 4).cast("int")
    top = ranked.filter(F.col("rd") <= quarter).select(
        "lang",
        F.col("rd").alias("k"),
        F.col("doc_id").alias("chosen_id"),
        F.col("s").alias("s_top"),
    )
    bottom = ranked.select(
        "lang",
        F.col("ra").alias("k"),
        F.col("doc_id").alias("rejected_id"),
        F.col("s").alias("s_bot"),
    )
    pairs = top.join(bottom, ["lang", "k"]).select(
        "lang",
        "chosen_id",
        "rejected_id",
        (F.col("s_top") - F.col("s_bot")).alias("margin"),
    )
    # margins are differences of 6-decimal-quantized scores: summing as
    # DECIMAL(18,6) is exact and associative, so the average can't drift
    # across engines' summation orders (the round-4 lesson)
    return pairs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("margin").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_margin"),
        F.round(F.min("margin"), 6).alias("min_margin"),
        F.round(F.max("margin"), 6).alias("max_margin"),
        F.min("chosen_id").cast("long").alias("min_chosen_id"),
        F.min("rejected_id").cast("long").alias("min_rejected_id"),
    )


def _bt_oracle() -> str:
    """Unrolled Bradley-Terry MM iterations (same device as the
    PageRank / logreg oracles: a fixed iteration count makes the
    estimator a pure function both engines evaluate identically up to
    rounding, which the per-iteration ROUND(..., 9) absorbs).
    MATERIALIZED CTEs: each w{{t}} is referenced twice by iteration
    t+1 — without materialization DuckDB re-evaluates the chain
    exponentially (k-core oracle lesson)."""
    head = f"""WITH {_SCORED_SQL}, seq AS (
    SELECT lang, source, s, doc_id,
           LAG(source) OVER (PARTITION BY lang ORDER BY doc_id) AS psrc,
           LAG(s) OVER (PARTITION BY lang ORDER BY doc_id) AS ps
    FROM scored
), matches AS (
    SELECT CASE WHEN s > ps THEN source ELSE psrc END AS winner,
           CASE WHEN s > ps THEN psrc ELSE source END AS loser
    FROM seq
    WHERE psrc IS NOT NULL AND s <> ps AND source <> psrc
), mat AS MATERIALIZED (
    SELECT i, j, SUM(win) AS w_ij, COUNT(*) AS n_ij
    FROM (
        SELECT winner AS i, loser AS j, 1 AS win FROM matches
        UNION ALL
        SELECT loser AS i, winner AS j, 0 AS win FROM matches
    ) GROUP BY i, j
), w0 AS MATERIALIZED (
    SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS w FROM mat
)"""
    its = []
    for t in range(_BT_ITERS):
        its.append(f""", r{t + 1} AS MATERIALIZED (
    SELECT m.i,
           ROUND(SUM(m.w_ij) / SUM(m.n_ij / (wi.w + wj.w)), 9) AS w_raw
    FROM mat m
    JOIN w{t} wi ON wi.i = m.i
    JOIN w{t} wj ON wj.i = m.j
    GROUP BY m.i
), w{t + 1} AS MATERIALIZED (
    SELECT i, GREATEST(ROUND(w_raw * (SELECT COUNT(*) FROM r{t + 1})
                             / (SELECT SUM(w_raw) FROM r{t + 1}), 9),
                       {_BT_EPS}) AS w
    FROM r{t + 1}
)""")
    return (
        head
        + "".join(its)
        + f"""
SELECT w.i AS item,
       ROUND(w.w, 6) AS strength,
       CAST(t.wins AS BIGINT) AS wins,
       CAST(t.n_matches AS BIGINT) AS n_matches
FROM w{_BT_ITERS} w
JOIN (SELECT i, SUM(w_ij) AS wins, SUM(n_ij) AS n_matches
      FROM mat GROUP BY i) t ON t.i = w.i
"""
    )


@query("curation_bradley_terry_strengths", oracle=_bt_oracle())
def curation_bradley_terry_strengths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bradley-Terry strength estimation over pairwise preference
    outcomes — the aggregate behind reward-model data curation and
    arena-style eval leaderboards. Matches: consecutive documents within
    a language (by doc_id) play one comparison, the higher quality score
    wins (score ties and same-source matches skipped). The MM update
    (Hunter 2004) runs {n} fixed rounds on the aggregated win matrix:
    w_i ← W_i / Σ_j n_ij/(w_i + w_j), sum-normalized, per-iteration
    rounding to 9 decimals so both engines' float paths agree.

    Scale: the CORPUS is touched exactly once — a lag window per
    language extracts matches in one linear scan, and one
    map-side-combined groupBy reduces them to the ≤|items|² win matrix
    (items = sources, so hundreds of rows at any corpus size). The MM
    iterations then run entirely on that broadcast-size matrix: 3 tiny
    keyed aggs + broadcast joins, zero further passes over the data. No
    all-pairs stage anywhere (contrast naive pairwise mining, which is
    O(n²) per group).""".format(n=_BT_ITERS)
    scored = _scored(spark, sf_dir)
    w_seq = Window.partitionBy("lang").orderBy("doc_id")
    seq = scored.select(
        "lang",
        "source",
        "s",
        "doc_id",
        F.lag("source").over(w_seq).alias("psrc"),
        F.lag("s").over(w_seq).alias("ps"),
    )
    matches = seq.filter(
        F.col("psrc").isNotNull()
        & (F.col("s") != F.col("ps"))
        & (F.col("source") != F.col("psrc"))
    ).select(
        F.when(F.col("s") > F.col("ps"), F.col("source"))
        .otherwise(F.col("psrc"))
        .alias("winner"),
        F.when(F.col("s") > F.col("ps"), F.col("psrc"))
        .otherwise(F.col("source"))
        .alias("loser"),
    )
    edges = matches.select(
        F.col("winner").alias("i"), F.col("loser").alias("j"), F.lit(1).alias("win")
    ).unionAll(
        matches.select(
            F.col("loser").alias("i"),
            F.col("winner").alias("j"),
            F.lit(0).alias("win"),
        )
    )
    # the ONLY pass over the corpus ends here: mat is ≤ |items|² rows
    # (items = SOURCES, a fixed enum — bounded at any corpus size), pulled
    # to the driver as one probe. The MM fixed-point then runs in plain
    # Python over that tiny matrix — the pre-r11 in-plan form burned ~25
    # sub-millisecond stages (per-round broadcasts + joins + a
    # localCheckpoint job) of pure driver latency for the same arithmetic.
    # Rounding uses HALF_UP over the double's shortest decimal repr,
    # exactly Spark's round(double) (Python repr == Java Double.toString:
    # both emit the shortest round-trip string); sums of counts are exact
    # integers; the one order-sensitive float sum (Σ n/(wi+wj)) has the
    # same ~1e-15 drift class the per-iteration ROUND(.., 9) contract
    # already absorbs between Spark and DuckDB.
    mat_rows = (
        edges.groupBy("i", "j")
        .agg(F.sum("win").alias("w_ij"), F.count(F.lit(1)).alias("n_ij"))
        .collect()  # bounded: ≤ |sources|² rows
    )
    from decimal import ROUND_HALF_UP, Decimal

    def _round(x: float, nd: int) -> float:
        q = Decimal(1).scaleb(-nd)
        return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

    mat = [(r["i"], r["j"], int(r["w_ij"]), int(r["n_ij"])) for r in mat_rows]
    items = sorted({i for i, _, _, _ in mat})
    eps = float(_BT_EPS)
    w = {i: 1.0 for i in items}
    for _ in range(_BT_ITERS):
        raw = {}
        for i in items:
            num = sum(w_ij for mi, mj, w_ij, _ in mat if mi == i)
            den = sum(
                n_ij / (w[mi] + w[mj])
                for mi, mj, _, n_ij in mat
                if mi == i
            )
            raw[i] = _round(num / den, 9)
        k, s = len(raw), sum(raw.values())
        w = {i: max(_round(r * k / s, 9), eps) for i, r in raw.items()}
    wins = {i: 0 for i in items}
    n_matches = {i: 0 for i in items}
    for mi, _, w_ij, n_ij in mat:
        wins[mi] += w_ij
        n_matches[mi] += n_ij
    return spark.createDataFrame(
        [
            (i, _round(w[i], 6), wins[i], n_matches[i])
            for i in items
        ],
        "item string, strength double, wins bigint, n_matches bigint",
    )


@query(
    "preference_group_relative_advantages",
    oracle="""
WITH cents AS (
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           event_id,
           value AS reward,
           CAST(ROUND(value * 100) AS BIGINT) AS c
    FROM events
), stats AS (
    SELECT *,
           COUNT(*) OVER w AS n,
           SUM(c) OVER w AS s1,
           SUM(c * c) OVER w AS s2
    FROM cents
    WINDOW w AS (PARTITION BY user_id, day)
)
SELECT user_id, day, event_id,
       ROUND(reward, 2) AS reward,
       CAST(n AS BIGINT) AS group_n,
       ROUND(CASE WHEN n <= 1 OR n * s2 - s1 * s1 <= 0 THEN 0.0
                  ELSE GREATEST(-4.0, LEAST(4.0,
                      (n * c - s1) / (n * SQRT((n * s2 - s1 * s1) * 1.0
                                               / (n * (n - 1))))))
             END, 6) AS advantage
FROM stats
""",
)
def preference_group_relative_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative reward normalization (the GRPO advantage: each
    completion's reward standardized against the OTHER completions of
    the same prompt group, no learned value baseline).  Groups are
    (user, day); advantage = (r - mean_group) / std_group, 0 for
    singleton / zero-variance groups, clipped to ±4 — the normalization
    PPO-free group-relative policy optimization feeds the policy
    gradient.

    Numerics: mean/std derive from EXACT integer cent sums (rewards have
    2 decimals), so a constant group's variance is exactly zero on both
    engines and the remaining expression is the same sequence of
    correctly-rounded IEEE ops — a Welford-vs-naive stddev would disagree
    by ~1e-14 at near-zero variance and flip 0 into a clipped ±4.

    Scale: one window over the (user, day) partition key computes count
    and the two power sums in a single exchange — no join back, no
    per-group collect; 10^9 prompt groups stream through the same plan."""
    e = spread(load_tables(spark, sf_dir, ("events",))["events"], "event_id")
    w = Window.partitionBy("user_id", F.to_date("ts"))
    c = F.round(F.col("value") * 100).cast("long")
    stats = e.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_id",
        F.col("value").alias("reward"),
        c.alias("c"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(c).over(w).alias("s1"),
        F.sum(c * c).over(w).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    adv = (
        F.when((F.col("n") <= 1) | (var_num <= 0), F.lit(0.0))
        .otherwise(
            F.greatest(
                F.lit(-4.0),
                F.least(
                    F.lit(4.0),
                    (F.col("n") * F.col("c") - F.col("s1"))
                    / (
                        F.col("n")
                        * F.sqrt(
                            var_num * F.lit(1.0)
                            / (F.col("n") * (F.col("n") - 1))
                        )
                    ),
                ),
            )
        )
    )
    return stats.select(
        "user_id",
        "day",
        "event_id",
        F.round("reward", 2).alias("reward"),
        F.col("n").cast("long").alias("group_n"),
        F.round(adv, 6).alias("advantage"),
    )


@query(
    "preference_best_of_n",
    oracle="""
WITH ranked AS (
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           event_id,
           value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY value DESC, event_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS group_n
    FROM events
)
SELECT user_id, day,
       CAST(MAX(group_n) AS BIGINT) AS group_n,
       MAX(CASE WHEN rn = 1 THEN event_id END) AS best_event_id,
       ROUND(MAX(CASE WHEN rn = 1 THEN value END), 2) AS best_reward,
       ROUND(MAX(CASE WHEN rn = 1 THEN value END)
             - MAX(CASE WHEN rn = 2 THEN value END), 2) AS margin
FROM ranked
GROUP BY user_id, day
""",
)
def preference_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n selection (rejection sampling over candidate
    completions): per (user, day) prompt group, pick the highest-reward
    completion with a deterministic (reward DESC, event_id) tie-break,
    and report the margin over the runner-up (NULL for singleton
    groups) — the filter that turns K sampled completions into one
    SFT/BoN training example.

    Scale: one window rank + one grouped conditional agg over the same
    (user, day) exchange — no self-join, no per-group collect."""
    e = spread(load_tables(spark, sf_dir, ("events",))["events"], "event_id")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    wc = Window.partitionBy("user_id", F.to_date("ts"))
    ranked = e.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("group_n"),
    )
    return ranked.groupBy("user_id", "day").agg(
        F.max("group_n").cast("long").alias("group_n"),
        F.max(F.when(F.col("rn") == 1, F.col("event_id"))).alias("best_event_id"),
        F.round(F.max(F.when(F.col("rn") == 1, F.col("value"))), 2).alias(
            "best_reward"
        ),
        F.round(
            F.max(F.when(F.col("rn") == 1, F.col("value")))
            - F.max(F.when(F.col("rn") == 2, F.col("value"))),
            2,
        ).alias("margin"),
    )
