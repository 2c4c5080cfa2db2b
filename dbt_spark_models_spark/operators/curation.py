"""Training-data curation operators beyond the dedup/similarity families:
prefix dedup, boilerplate n-gram mining, deterministic reservoir sampling,
unigram-entropy quality scoring, PII scrubbing.

These extend the LLM-data-pipeline surface (BASELINE.json north star) the
same way ``dedup.py``/``text.py`` do, over the ``documents`` table.

Scale notes (100 TB design):
- Every operator is a scan → narrow per-row transform → one keyed shuffle.
  No driver collects, no Python UDFs — all expressions are built-in
  (JVM/codegen) column functions.
- Prefix dedup groups on the literal prefix string here so the DuckDB
  oracle can replicate it; at production scale the group key would be
  ``xxhash64(prefix)`` (engine-specific hashes can't cross-check) — one
  64-bit shuffle key instead of a ~150-byte string, same plan shape.
- Reservoir sampling uses a multiplicative-hash priority (exact integer
  arithmetic, engine-portable, seed-stable) so the "random" sample is
  reproducible run-to-run and across engines — the property a curation
  pipeline needs for auditable subsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, spread


@query(
    "dedup_prefix_survivors",
    oracle="""
WITH pref AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
             AS prefix
    FROM documents
)
SELECT MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS group_size
FROM pref
GROUP BY prefix
HAVING COUNT(*) > 1
""",
)
def dedup_prefix_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix dedup (first-20-token fingerprint): documents sharing a prefix
    are near-duplicate continuations; keep the lowest doc_id as survivor.

    A standard pre-LLM-training pass (prefix/suffix dedup catches truncated
    re-crawls that exact-hash misses). Group key is the prefix string for
    oracle parity; at scale use ``xxhash64(prefix)`` (docstring of module).
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 20)).alias(
                "prefix"
            ),
        )
        .groupBy("prefix")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
        .drop("prefix")
    )


@query(
    "text_boilerplate_ngrams",
    oracle="""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS gram
    FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
)
SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq
FROM grams
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 5
""",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: word 3-grams occurring in ≥5 distinct documents —
    the candidate list a cleaning pass would strip (header/footer/navigation
    text in web crawls).

    The 3-gram array is built row-locally with TRANSFORM over an index
    SEQUENCE (no join, no UDF), then one explode + distinct-count shuffle.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 5)
    )


@query(
    "sample_reservoir_per_group",
    oracle="""
WITH prio AS (
    SELECT doc_id, lang,
           (doc_id * 2654435761) % 1000000007 AS priority
    FROM documents
),
ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY priority, doc_id) AS rn
    FROM prio
)
SELECT lang, doc_id, rn
FROM ranked
WHERE rn <= 3
""",
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir sample: 3 documents per language, priority =
    Knuth multiplicative hash of doc_id (exact integer arithmetic → identical
    sample on any engine, any partitioning, any run — auditable curation).

    One window shuffle on ``lang``; at scale swap ROW_NUMBER for a
    per-partition bounded heap only if group cardinality is tiny relative to
    rows (Spark's window top-k already stops at the frame, no full sort
    spill thanks to the rank filter pushdown in WindowGroupLimit).
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    prio = docs.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000007)).alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        prio.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", "rn")
    )


@query(
    "text_word_entropy",
    oracle="""
WITH tokens AS (
    SELECT doc_id, t.word
    FROM documents, UNNEST(string_split(text, ' ')) AS t(word)
),
counts AS (
    SELECT doc_id, word, COUNT(*) AS c
    FROM tokens GROUP BY doc_id, word
),
totals AS (
    SELECT doc_id, SUM(c) AS n, SUM(c * LN(c)) AS sum_clnc
    FROM counts GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       ROUND(LN(n) - sum_clnc / n, 4) AS entropy
FROM totals
""",
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-entropy quality score per document: H = ln N − Σc·ln c / N.
    Low entropy = repetitive/templated text (a standard cheap quality filter
    next to the length/stopword ratios in ``text_quality_scores``).

    Two keyed shuffles: (doc, word) count then per-doc combine — both
    partial-aggregated map-side. The algebraic form avoids computing p=c/N
    per word before the final aggregate (one pass, no join back to totals).
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("sum_clnc"),
        )
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_words"),
            F.round(F.log(F.col("n")) - F.col("sum_clnc") / F.col("n"), 4).alias(
                "entropy"
            ),
        )
    )


@query(
    "text_pii_scrub",
    oracle="""
WITH contact AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@' || source
                || '.example.com or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
    FROM documents
),
scrubbed AS (
    SELECT doc_id, raw,
           regexp_replace(
               regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\\+[0-9][0-9-]{6,}', '<PHONE>', 'g') AS clean
    FROM contact
)
SELECT doc_id,
       len(regexp_extract_all(raw,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(raw, '\\+[0-9][0-9-]{6,}')) AS n_phones,
       length(clean) AS clean_len,
       substr(clean, length(clean) - 29, 30) AS clean_tail
FROM scrubbed
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails/phone numbers with per-doc
    redaction counts. The testdata corpus contains no organic PII, so a
    deterministic contact line derived from (doc_id, source) is appended on
    BOTH engine sides first — the redaction logic is what is verified.

    Pure built-in regexp functions (codegen'd, no UDF); at 100 TB this is a
    map-only pass with zero shuffle.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+[0-9][0-9-]{6,}"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    contact = docs.select("doc_id", raw.alias("raw"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("raw"), email_re, "<EMAIL>"),
        phone_re,
        "<PHONE>",
    )
    return contact.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(email_re), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(phone_re), 0)).alias(
            "n_phones"
        ),
        F.length(clean).alias("clean_len"),
        F.substring(clean, -30, 30).alias("clean_tail"),
    ).select(
        "doc_id",
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_phones").cast("bigint").alias("n_phones"),
        F.col("clean_len").cast("bigint").alias("clean_len"),
        "clean_tail",
    )


@query(
    "text_repetition_ratios",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), sized AS (
    SELECT doc_id, tokens, len(tokens) AS n_tokens
    FROM toks WHERE len(tokens) >= 2
), bigrams AS (
    SELECT doc_id, n_tokens,
           UNNEST(list_transform(generate_series(1, len(tokens) - 1),
                  i -> tokens[i] || ' ' || tokens[i+1])) AS bigram
    FROM sized
), counted AS (
    SELECT doc_id, n_tokens, bigram, COUNT(*) AS cnt
    FROM bigrams GROUP BY doc_id, n_tokens, bigram
)
SELECT doc_id,
       CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       ROUND(MAX(cnt) / SUM(cnt), 4) AS top_bigram_share,
       ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / SUM(cnt), 4)
           AS dup_bigram_fraction
FROM counted
GROUP BY doc_id
""",
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/RefinedWeb family):
    share of the document's bigrams taken by its single most frequent
    bigram, and the fraction of bigram occurrences that are duplicates.
    High values flag boilerplate/spam that per-token stats miss.

    Scale: the ENTIRE computation is doc-local — per-doc bigram counts
    are a run-length pass over the doc's own sorted bigram array, so the
    query is one corpus scan with ZERO exchanges (the pre-r11 form paid
    two: a groupBy(doc_id, bigram) count and a groupBy(doc_id)
    re-aggregate, shuffling every distinct bigram of every document for
    per-document answers)."""
    from dbt_spark_models_spark.sources.testdata import spread

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    sized = (
        d.select("doc_id", toks.alias("tokens"))
        .withColumn("n_tokens", F.size("tokens"))
        .filter(F.col("n_tokens") >= 2)
    )
    # per-doc bigram multiset as a SORTED array; equal bigrams are then
    # adjacent, so max count / duplicated mass fall out of one run-length
    # aggregate — identical integers to the old groupBy counts
    runs = F.expr(
        """
        aggregate(
          sort_array(transform(sequence(1, size(tokens) - 1),
                     i -> concat(element_at(tokens, i), ' ',
                                 element_at(tokens, i + 1)))),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
                       'maxrun', 0L, 'dup', 0L),
          (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
            named_struct('prev', x, 'run', acc.run + 1L,
                         'maxrun', acc.maxrun, 'dup', acc.dup),
            named_struct('prev', x, 'run', 1L,
                         'maxrun', greatest(acc.maxrun, acc.run),
                         'dup', acc.dup
                                + IF(acc.run > 1L, acc.run, 0L))),
          acc -> named_struct(
            'maxrun', greatest(acc.maxrun, acc.run),
            'dup', acc.dup + IF(acc.run > 1L, acc.run, 0L))
        )
        """
    )
    return sized.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens") - 1).cast("long").alias("n_bigrams"),
        runs.alias("rl"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        F.round(F.col("rl.maxrun") / F.col("n_bigrams"), 4).alias(
            "top_bigram_share"
        ),
        F.round(F.col("rl.dup") / F.col("n_bigrams"), 4).alias(
            "dup_bigram_fraction"
        ),
    )


@query(
    "curation_length_percentile_bands",
    oracle="""
WITH ranked AS (
    SELECT doc_id, lang, n_chars,
           PERCENT_RANK() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS pr,
           CUME_DIST() OVER (PARTITION BY lang
                             ORDER BY n_chars, doc_id) AS cd
    FROM documents
)
SELECT doc_id, lang, n_chars,
       ROUND(pr, 4) AS length_pctile,
       ROUND(cd, 4) AS length_cume,
       pr >= 0.05 AND pr <= 0.95 AS in_band
FROM ranked
""",
)
def curation_length_percentile_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language percentile banding of document length (drop the
    extreme 5% tails — truncated fragments and runaway concatenations).
    ``percent_rank``/``cume_dist`` with a doc_id tie-break so equal
    lengths rank deterministically.

    Scale: one window shuffle partitioned by lang; at 100 TB sub-shard
    the key or pre-aggregate to a length histogram per lang and band on
    the (tiny) histogram instead."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    pr = F.percent_rank().over(w)
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(pr, 4).alias("length_pctile"),
        F.round(F.cume_dist().over(w), 4).alias("length_cume"),
        ((pr >= 0.05) & (pr <= 0.95)).alias("in_band"),
    )


_MIX_WEIGHTS = (("src1", 0.4), ("src2", 0.3), ("src3", 0.2), ("src4", 0.1))


@query(
    "pipeline_domain_mixture",
    oracle=f"""
WITH w(source, w) AS (VALUES {", ".join(f"('{s}', CAST({v} AS DOUBLE))" for s, v in _MIX_WEIGHTS)}),
j AS (
    SELECT d.doc_id, d.source, w.w FROM documents d JOIN w USING (source)
), counts AS (
    SELECT source, w, COUNT(*) AS cnt FROM j GROUP BY source, w
), scale AS (
    SELECT MIN(cnt / w) AS s FROM counts
), quota AS (
    SELECT source, CAST(FLOOR(w * (SELECT s FROM scale)) AS BIGINT) AS n_s
    FROM counts
), ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS mix_rank
    FROM j
)
SELECT r.doc_id, r.source, CAST(r.mix_rank AS BIGINT) AS mix_rank,
       q.n_s AS source_quota
FROM ranked r JOIN quota q USING (source)
WHERE r.mix_rank <= q.n_s
""",
)
def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: select documents per source so the output
    matches target mixture weights exactly, scaled to the binding
    (fully-consumed) source — the standard way a pre-training corpus hits
    a prescribed domain distribution without oversampling any domain.

    Deterministic: per-source selection order is md5(doc_id), so the
    sample is reproducible and auditable (same property as the reservoir
    operator), and the quota math is the same double expression tree on
    both engines.

    Scale: counts are one map-side-combined agg; quotas come from a
    constant-key window over the #sources-row counts (then broadcast);
    selection is one window rank per source partition (at
    100 TB, rank-free variant: keep hash(doc_id) below a per-source
    threshold found by quantile — no per-partition sort; documented trade,
    exact quotas need the rank)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    wdf = spark.createDataFrame(
        [(s, float(v)) for s, v in _MIX_WEIGHTS], "source string, w double"
    )
    j = d.join(F.broadcast(wdf), "source").select("doc_id", "source", "w")
    counts = j.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    # Global min over the #sources-row counts via a constant-valued window.
    # The partition key must be non-foldable (a plain literal is folded away,
    # reintroducing either the "No Partition Defined" warning or — for a
    # literal equi-join — a BroadcastNestedLoopJoin): `source IS NOT NULL`
    # is constant-true here but references a column, so it survives as a
    # partition spec. counts is post-agg (one row per mixture source), so
    # the single partition holds only #sources rows.
    # bounded: one row per mixture source (enum-scale post-agg)
    scale_w = Window.partitionBy(F.col("source").isNotNull())
    quota = counts.select(
        "source",
        F.floor(F.col("w") * F.min(F.col("cnt") / F.col("w")).over(scale_w))
        .cast("long")
        .alias("source_quota"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = j.select(
        "doc_id", "source", F.row_number().over(w_rank).cast("long").alias("mix_rank")
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("mix_rank") <= F.col("source_quota"))
        .select("doc_id", "source", "mix_rank", "source_quota")
    )


_TEMP_ALPHA = 0.5


@query(
    "curation_temperature_resample",
    oracle=f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
), powed AS (
    SELECT lang, cnt,
           POW(cnt / SUM(cnt) OVER (), {_TEMP_ALPHA}) AS pa,
           SUM(cnt) OVER () AS total
    FROM counts
), scaled AS (
    SELECT lang, cnt, pa / SUM(pa) OVER () AS q, total FROM powed
), quota AS (
    SELECT lang, cnt,
           CAST(FLOOR(q * total) AS BIGINT) AS target_n
    FROM scaled
), ranked AS (
    SELECT d.doc_id, d.lang,
           ROW_NUMBER() OVER (PARTITION BY d.lang
                              ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                       d.doc_id) AS r
    FROM documents d
), repeats AS (
    SELECT r.lang,
           q.target_n // q.cnt
               + CASE WHEN r.r <= q.target_n % q.cnt THEN 1 ELSE 0 END
               AS n_repeats
    FROM ranked r JOIN quota q USING (lang)
)
SELECT lang, CAST(n_repeats AS BIGINT) AS n_repeats,
       COUNT(*) AS n_docs
FROM repeats
GROUP BY lang, n_repeats
""",
)
def curation_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual resampling (the XLM-R / mT5
    p^alpha scheme, alpha=0.5): per-language sampling weights
    q_l = p_l^a / sum(p^a) flatten the language distribution, the total
    token budget stays the corpus size, and each language's target count
    is met by integer per-document repeat factors — low-resource languages
    are up-sampled (repeats > 1), high-resource down-weighted. The
    remainder after the integral repeat is assigned deterministically to
    the md5(doc_id)-first-ranked documents, so the epoch plan is exactly
    reproducible. Output: (lang, n_repeats) histogram — the full repeat
    plan compressed to its audit form.

    Scale: language counts are one map-side-combined agg; the weight math
    runs on the #langs-row table (constant-key windows over a post-agg
    frame, same device as ``pipeline_domain_mixture``); the per-doc rank
    is one window per lang partition, and the quota table joins back by
    broadcast. No global sort, no driver round-trip."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    # constant-true but non-foldable partition key (see pipeline_domain_mixture)
    # bounded: one row per distinct lang (enum-scale post-agg)
    all_w = Window.partitionBy(F.col("lang").isNotNull())
    p = F.col("cnt") / F.sum("cnt").over(all_w)
    quota = counts.select(
        "lang",
        "cnt",
        F.floor(
            F.pow(p, F.lit(_TEMP_ALPHA))
            / F.sum(F.pow(p, F.lit(_TEMP_ALPHA))).over(all_w)
            * F.sum("cnt").over(all_w)
        )
        .cast("long")
        .alias("target_n"),
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "lang", F.row_number().over(w_rank).alias("r"))
    rep = ranked.join(F.broadcast(quota), "lang").select(
        "lang",
        (
            (F.col("target_n") / F.col("cnt")).cast("long")
            + F.when(F.col("r") <= F.col("target_n") % F.col("cnt"), 1).otherwise(0)
        ).alias("n_repeats"),
    )
    return rep.groupBy("lang", "n_repeats").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "curation_stratified_split",
    oracle="""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS r,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN r <= CEIL(0.8 * n) THEN 'train'
            WHEN r <= CEIL(0.9 * n) THEN 'val'
            ELSE 'test' END AS split
FROM ranked
""",
)
def curation_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split (80/10/10 WITHIN each
    language stratum, exact to the ceiling — not the approximate
    hash-threshold split, which only hits proportions in expectation):
    documents are ranked by md5(doc_id) inside their stratum and the rank
    cut at ceil(0.8n)/ceil(0.9n). Reproducible (pure function of doc_id),
    leakage-free (each doc in exactly one split), and auditable — the
    standard corpus split a training pipeline freezes before any
    experimentation.

    Scale: one window per stratum partition (rank + count share a single
    exchange on lang); for mega-strata the same distributed rank device as
    ``windows.exact_ntile`` applies. No global sort, no driver loop."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.when(F.col("r") <= F.ceil(0.8 * F.col("n")), "train")
        .when(F.col("r") <= F.ceil(0.9 * F.col("n")), "val")
        .otherwise("test")
        .alias("split"),
    )


_RRF_K = 60


@query(
    "curation_rrf_ensemble",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), feats AS (
    SELECT doc_id, lang,
           len(list_distinct(tokens)) / len(tokens) AS diversity,
           len(tokens) AS n_tok
    FROM toks WHERE len(tokens) > 0
), ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY diversity DESC, doc_id) AS r_div,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY n_tok DESC, doc_id) AS r_len
    FROM feats
), fused AS (
    SELECT doc_id, lang,
           CAST(1 AS DOUBLE) / ({_RRF_K} + r_div)
             + CAST(1 AS DOUBLE) / ({_RRF_K} + r_len) AS rrf,
           r_div, r_len
    FROM ranked
)
SELECT doc_id, lang, ROUND(rrf, 6) AS rrf_score,
       CAST(r_div AS BIGINT) AS rank_diversity,
       CAST(r_len AS BIGINT) AS rank_length,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY rrf DESC, doc_id) AS BIGINT)
           AS rank_fused
FROM fused
QUALIFY rank_fused <= 20
""",
)
def curation_rrf_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion ensemble selection: two independent quality
    rankings per language (lexical diversity; document length) fused with
    the standard RRF formula Σ 1/(60+rank), top-20 per language kept —
    how a curation pipeline combines incommensurable quality signals
    (model scores, heuristics, retrieval ranks) without calibrating them
    onto one scale. Ties broken by doc_id at every ranking stage, so the
    selection is fully deterministic.

    Scale: all three rankings are windows PARTITIONED by lang (bounded
    per-partition state, no global sort); the two source ranks share one
    exchange. RRF math is pure column arithmetic; 1/(k+rank) with
    integer rank is exact enough that both engines agree at the rounded
    6th decimal without float-order concerns."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    feats = (
        d.withColumn("tokens", toks)
        .filter(F.size("tokens") > 0)
        .select(
            "doc_id",
            "lang",
            (F.size(F.array_distinct("tokens")) / F.size("tokens")).alias(
                "diversity"
            ),
            F.size("tokens").alias("n_tok"),
        )
    )
    w_div = Window.partitionBy("lang").orderBy(
        F.col("diversity").desc(), "doc_id"
    )
    w_len = Window.partitionBy("lang").orderBy(F.col("n_tok").desc(), "doc_id")
    ranked = feats.select(
        "doc_id",
        "lang",
        F.row_number().over(w_div).alias("r_div"),
        F.row_number().over(w_len).alias("r_len"),
    )
    rrf = (
        F.lit(1.0) / (_RRF_K + F.col("r_div"))
        + F.lit(1.0) / (_RRF_K + F.col("r_len"))
    ).alias("rrf")
    fused = ranked.select("doc_id", "lang", rrf, "r_div", "r_len")
    w_f = Window.partitionBy("lang").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rank_fused", F.row_number().over(w_f).cast("long"))
        .filter(F.col("rank_fused") <= 20)
        .select(
            "doc_id",
            "lang",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("r_div").cast("long").alias("rank_diversity"),
            F.col("r_len").cast("long").alias("rank_length"),
            "rank_fused",
        )
    )


@query(
    "sample_weighted_without_replacement",
    oracle="""
WITH keyed AS (
    SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS w,
           -LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp'), 1, 8))::BIGINT + 1)
               / 4294967296.0) / CAST(n_chars AS DOUBLE) AS k
    FROM documents
    WHERE n_chars > 0
),
ranked AS (
    SELECT doc_id, lang, w,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k, doc_id) AS rn
    FROM keyed
)
SELECT lang, doc_id, CAST(w AS BIGINT) AS weight, rn
FROM ranked WHERE rn <= 5
""",
)
def sample_weighted_without_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    exponential race): 5 docs per language, inclusion probability
    proportional to ``n_chars``. Each doc draws u = md5-uniform in (0,1]
    and races with key = −ln(u)/w; the k smallest keys per group are the
    sample. Deterministic and seedable (the ':wsamp' salt is the seed), so
    curation samples are auditable and reproducible on any engine — the
    DuckDB oracle reproduces the EXACT same sample.

    One window shuffle on ``lang`` (WindowGroupLimit prunes to the top-k
    per partition before the sort spills); the race key is row-local math.
    At 100 TB this is THE way to draw a weighted eval slice: no
    ``sample()`` nondeterminism, no driver-side reservoir.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wsamp"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("double").alias("w"),
        (-F.log(u) / F.col("n_chars").cast("double")).alias("k"),
    )
    w = Window.partitionBy("lang").orderBy("k", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", F.col("w").cast("bigint").alias("weight"), "rn")
    )


# DSIR (Data Selection via Importance Resampling, Xie et al. 2023): score
# raw documents by how target-like their hashed n-gram profile is.
_DSIR_BUCKETS = 1024
_DSIR_TARGET_SOURCE = "src0"


@query(
    "curation_dsir_importance",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), bigrams AS (
    SELECT doc_id, source,
           ('0x' || substr(md5(tokens[i] || ' ' || tokens[i + 1]), 1, 8))::BIGINT
               % {_DSIR_BUCKETS} AS b
    FROM toks, UNNEST(generate_series(1, len(tokens) - 1)) AS g(i)
    WHERE len(tokens) >= 2
), tgt AS (
    SELECT b, COUNT(*) AS c FROM bigrams
    WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY b
), raw AS (
    SELECT b, COUNT(*) AS c FROM bigrams
    WHERE source <> '{_DSIR_TARGET_SOURCE}' GROUP BY b
), totals AS (
    SELECT (SELECT SUM(c) FROM tgt) AS nt, (SELECT SUM(c) FROM raw) AS nr
), llr AS (
    SELECT b.b,
           LN((COALESCE(t.c, 0) + 1.0) / (tt.nt + {_DSIR_BUCKETS}))
           - LN((COALESCE(r.c, 0) + 1.0) / (tt.nr + {_DSIR_BUCKETS})) AS w
    FROM (SELECT DISTINCT b FROM bigrams) b
    LEFT JOIN tgt t ON t.b = b.b
    LEFT JOIN raw r ON r.b = b.b
    CROSS JOIN totals tt
)
SELECT g.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(SUM(l.w) / COUNT(*), 4) AS avg_loglik_ratio
FROM bigrams g JOIN llr l ON g.b = l.b
WHERE g.source <> '{_DSIR_TARGET_SOURCE}'
GROUP BY g.doc_id
""",
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per raw document, the mean hashed-bigram
    log-likelihood ratio between a target-domain LM (docs from
    ``source='src0'``) and the raw-corpus LM — the standard
    importance-resampling score for "pick raw data that looks like the
    target domain" (Xie et al. 2023, used for domain-targeted pre-training
    mixes).

    Structure: bigrams hash into 1024 buckets (portable md5 hash, so the
    oracle reproduces the exact buckets); both LMs are 1024-row tables with
    add-one smoothing → the LLR table is broadcast; scoring the 100 TB raw
    side is then one BroadcastHashJoin + per-doc aggregate. Nothing scales
    with vocabulary: the hashed feature space is FIXED — that is DSIR's
    whole scale trick, and it maps 1:1 onto a broadcast join.
    """
    from dbt_spark_models_spark.sources.testdata import spread

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    toks = docs.select(
        "doc_id",
        "source",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        ).alias("tokens"),
    )
    bigrams = (
        toks.filter(F.size("tokens") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tokens) - 1), "
                    "i -> concat(element_at(tokens, i), ' ', element_at(tokens, i + 1)))"
                )
            ).alias("gram"),
        )
        .select(
            "doc_id",
            "source",
            (
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
                % _DSIR_BUCKETS
            ).alias("b"),
        )
    )
    bigrams = bigrams.persist()
    tgt = (
        bigrams.filter(F.col("source") == _DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    raw = (
        bigrams.filter(F.col("source") != _DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    # 1024-row LM tables: join them on b, then take the corpus totals as a
    # window over the joined (<=1024-row) table itself — every observed
    # bucket appears in the distinct-b spine, so sum(tc)/sum(rc) over it ARE
    # nt/nr, and no 1-row crossJoin (=> BNLJ) is needed. The partition key
    # must be non-foldable (see pipeline_domain_mixture).
    # bounded: <=1024-row LM bucket table (fixed hash width)
    tot_w = Window.partitionBy(F.col("b").isNotNull())
    llr = (
        bigrams.select("b")
        .distinct()
        .join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b", "left")
        .withColumn("nt", F.sum(F.coalesce(F.col("tc"), F.lit(0))).over(tot_w))
        .withColumn("nr", F.sum(F.coalesce(F.col("rc"), F.lit(0))).over(tot_w))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                    / (F.col("nt") + _DSIR_BUCKETS)
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)) + 1.0)
                    / (F.col("nr") + _DSIR_BUCKETS)
                )
            ).alias("w"),
        )
    )
    return (
        bigrams.filter(F.col("source") != _DSIR_TARGET_SOURCE)
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("w") / F.count(F.lit(1)), 4).alias("avg_loglik_ratio"),
        )
    )


@query(
    "sample_negative_pairs",
    oracle="""
WITH pur AS (
    SELECT DISTINCT o.o_custkey, l.l_partkey
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), custs AS (
    SELECT DISTINCT o_custkey FROM pur
), cand0 AS (
    SELECT o_custkey, i,
           ('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ':neg:'
                               || CAST(i AS VARCHAR)), 1, 8))::BIGINT AS h
    FROM custs CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i)
), cand AS (
    SELECT o_custkey,
           h % (SELECT COUNT(*) FROM part) + 1 AS neg_partkey,
           MIN(h) AS h
    FROM cand0 GROUP BY 1, 2
), neg AS (
    SELECT c.o_custkey, c.neg_partkey, c.h
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM pur p
                      WHERE p.o_custkey = c.o_custkey
                        AND p.l_partkey = c.neg_partkey)
)
SELECT o_custkey, neg_partkey, rk FROM (
    SELECT o_custkey, neg_partkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY h, neg_partkey) AS rk
    FROM neg
) WHERE rk <= 2
""",
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    purchasing customer gets 2 parts they never bought, drawn by a seeded
    md5 race (the ':neg:' salt is the seed) — auditable and bit-identical
    on any engine, like ``sample_weighted_without_replacement``.

    The scale-critical trick: candidates are GENERATED ARITHMETICALLY
    (customer × 8 salted hashes mapped into the contiguous part-key
    space), never by crossing customers with the catalog — cost is
    O(customers × 8) rows regardless of catalog size.

    Plan (r11, guide §2.4): ONE exchange total. The corpus pass reduces
    straight to the per-customer bought-set (map-side-combined
    ``collect_set``), and everything downstream is ROW-LOCAL: the 8
    salted candidates are an in-row array, deduped by part keeping the
    min hash, anti-filtered against the row's own bought-set, and ranked
    by (h, partkey) with a bounded fold — replacing the pre-r11 chain of
    distinct + candidate groupBy + anti-join + ranking window (4 extra
    exchanges of customer×8 rows). The bought-set stays bounded by a
    customer's own purchase history, never by catalog size."""
    li = load_tables(spark, sf_dir, ("orders", "lineitem", "part"))
    n_parts = li["part"].count()  # catalog-size constant (1-row probe)
    # the ONLY data-sized exchange: per-customer distinct purchase set
    # (collect_set dedups; partial aggregation combines map-side)
    bought = (
        li["lineitem"]
        .select("l_orderkey", "l_partkey")
        .join(
            li["orders"].select("o_orderkey", "o_custkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.collect_set("l_partkey").alias("bought"))
    )

    def h(i: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_custkey").cast("string"), F.lit(f":neg:{i}")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    # +1 lands candidates in the REAL part-key space 1..n_parts — h % n
    # alone emits a nonexistent partkey 0 that trivially survives the
    # bought-filter and can never sample the max key (ADVICE r3)
    cands = F.array_sort(
        F.array(
            *[
                F.struct(
                    h(i).alias("h"),
                    (h(i) % F.lit(n_parts) + 1).alias("pk"),
                )
                for i in range(1, 9)
            ]
        )
    )
    # bounded fold over the 8 sorted candidates: keep the first (=min-h)
    # occurrence of each part, skip bought parts, stop at 2 survivors —
    # exactly the groupBy-min + anti-join + ROW_NUMBER<=2 semantics
    kept = F.expr(
        "aggregate(cands, CAST(array() AS ARRAY<STRUCT<h: BIGINT, pk: BIGINT>>),"
        " (acc, x) -> CASE WHEN size(acc) >= 2 THEN acc"
        "  WHEN array_contains(bought, x.pk) THEN acc"
        "  WHEN exists(acc, a -> a.pk = x.pk) THEN acc"
        "  ELSE array_append(acc, x) END)"
    )
    # rebalance before the hash-heavy candidate projection: the bought-set
    # aggregate's output is tiny in BYTES, so AQE coalesces it to 1-2
    # partitions — correct for shuffle cost, wrong for the md5-bound
    # projection that follows (it serialized on 2 cores). The round-robin
    # exchange moves ~16 B/customer and buys full-width CPU; at 100 TB the
    # aggregate output is large enough that AQE never over-coalesces and
    # this is a cheap rebalance of key+set rows.
    parallelism = spark.sparkContext.defaultParallelism
    return (
        bought.repartition(parallelism)
        .withColumn("cands", cands)
        .select("o_custkey", F.posexplode(kept).alias("pos", "x"))
        .select(
            "o_custkey",
            F.col("x.pk").alias("neg_partkey"),
            (F.col("pos") + 1).alias("rk"),
        )
    )


@query(
    "sample_neyman_allocation",
    oracle="""
WITH strata AS (
    SELECT lang, COUNT(*) AS n_h, STDDEV_SAMP(n_chars) AS sd_h
    FROM documents GROUP BY lang
), alloc AS (
    SELECT lang, n_h,
           CAST(FLOOR(50.0 * (n_h * sd_h) / SUM(n_h * sd_h) OVER ()) AS BIGINT)
               AS n_alloc
    FROM strata
), ranked AS (
    SELECT d.lang, d.doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':neyman'), d.doc_id
           ) AS rk
    FROM documents d
)
SELECT r.lang, r.doc_id, r.rk
FROM ranked r JOIN alloc a ON a.lang = r.lang
WHERE r.rk <= a.n_alloc
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with NEYMAN allocation: a 50-doc eval budget is
    split across languages ∝ N_h·σ_h (stratum size × length variance) —
    the allocation that minimizes the estimator's variance for a fixed
    budget, versus the proportional 1-in-k of
    ``sample_stratified_deterministic``. Within a stratum the draw is the
    seeded md5 race (auditable, engine-reproducible; ':neyman' is the
    seed).

    Scale: one map-side-combined moment aggregate per stratum (count +
    stddev), allocation math over the #languages-row table, then one
    per-stratum top-n_h window (WindowGroupLimit prunes to the per-group
    heap before any sort spills). FLOOR (not ROUND) keeps the allocation
    identical across engines at .5 boundaries."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    strata = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.stddev_samp("n_chars").alias("sd_h"),
    )
    # bounded: one row per distinct lang (enum-scale post-agg)
    tot = Window.partitionBy(F.col("lang").isNotNull())
    alloc = strata.select(
        "lang",
        F.floor(
            50.0
            * (F.col("n_h") * F.col("sd_h"))
            / F.sum(F.col("n_h") * F.col("sd_h")).over(tot)
        )
        .cast("long")
        .alias("n_alloc"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":neyman"))),
        "doc_id",
    )
    ranked = d.select("lang", "doc_id").withColumn(
        "rk", F.row_number().over(w)
    )
    return ranked.join(F.broadcast(alloc), "lang").filter(
        F.col("rk") <= F.col("n_alloc")
    ).select("lang", "doc_id", "rk")


@query(
    "curation_quantile_normalize_scores",
    oracle="""
WITH src_pct AS (
    SELECT doc_id, source, n_chars,
           PERCENT_RANK() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS pct
    FROM documents
), gdist AS (
    SELECT n_chars AS v,
           CUME_DIST() OVER (ORDER BY n_chars) AS cume
    FROM (SELECT DISTINCT n_chars FROM documents)
), stepped AS (
    SELECT v, cume,
           COALESCE(LAG(cume) OVER (ORDER BY v), 0.0) AS prev_cume
    FROM gdist
), ref AS (
    SELECT lvl, MIN(v) AS ref_v
    FROM (
        SELECT v,
               UNNEST(generate_series(
                   CAST(FLOOR(prev_cume * 100) AS BIGINT) + 1,
                   CAST(FLOOR(cume * 100) AS BIGINT))) AS lvl
        FROM stepped
        UNION ALL
        SELECT MIN(v) AS v, 0 AS lvl FROM gdist
    )
    GROUP BY lvl
)
SELECT s.source,
       CAST(FLOOR(s.pct * 100) AS BIGINT) AS lvl,
       COUNT(*) AS n_docs,
       MIN(r.ref_v) AS normalized_score,
       ROUND(AVG(s.n_chars), 2) AS avg_raw_score
FROM src_pct s
JOIN ref r ON r.lvl = CAST(FLOOR(s.pct * 100) AS BIGINT)
GROUP BY 1, 2
""",
)
def curation_quantile_normalize_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization of a quality score ACROSS sources: each
    document's within-source percentile is mapped onto the GLOBAL score
    distribution (ref[L] = smallest global score whose cumulative share
    reaches L%), making scores comparable when sources have wildly
    different raw-score scales — the harmonization step before any
    cross-source quality threshold.

    Scale: the only global ordered pass is over DISTINCT scores (bounded
    domain — lengths here; quantize first for continuous scores), and the
    level table is built by a ROW-LOCAL sequence explode over each
    distinct score's cumulative span — no theta join of docs × levels.
    Per-source percent ranks partition by source; the final level join is
    a 101-row broadcast."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    src_w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    src_pct = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(src_w).alias("pct"),
    )
    distinct_scores = d.select("n_chars").distinct()
    # bounded: distinct score values — the n_chars VALUE DOMAIN (capped by
    # max document length), not the corpus row count
    gw = Window.partitionBy(F.col("n_chars").isNotNull()).orderBy("n_chars")
    glob = distinct_scores.select(
        F.col("n_chars").alias("v"), F.cume_dist().over(gw).alias("cume")
    )
    stepped = glob.withColumn(
        "prev_cume",
        F.coalesce(
            F.lag("cume").over(
                # bounded: same distinct-score value-domain frame as gw
                Window.partitionBy(F.col("v").isNotNull()).orderBy("v")
            ),
            F.lit(0.0),
        ),
    )
    start = (F.floor(F.col("prev_cume") * 100) + 1).cast("long")
    stop = F.floor(F.col("cume") * 100).cast("long")
    # Spark's sequence(a, b) DESCENDS when a > b (DuckDB returns empty) —
    # guard the no-integer-level span explicitly
    spans = stepped.select(
        "v",
        F.explode(
            F.when(start <= stop, F.sequence(start, stop)).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("lvl"),
    )
    zero = glob.groupBy().agg(F.min("v").alias("v")).select(
        "v", F.lit(0).cast("long").alias("lvl")
    )
    ref = spans.unionByName(zero).groupBy("lvl").agg(F.min("v").alias("ref_v"))
    lvl = F.floor(F.col("pct") * 100).cast("long")
    return (
        src_pct.withColumn("lvl", lvl)
        .join(F.broadcast(ref), "lvl")
        .groupBy("source", "lvl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ref_v").alias("normalized_score"),
            F.round(F.avg("n_chars"), 2).alias("avg_raw_score"),
        )
    )


@query(
    "curation_pareto_frontier",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), scored AS (
    SELECT doc_id, len(tokens) AS n_tokens,
           ROUND(len(list_distinct(tokens)) * 1.0 / len(tokens), 6) AS q
    FROM toks WHERE len(tokens) > 0
), per_n AS (
    SELECT n_tokens, MAX(q) AS mq FROM scored GROUP BY n_tokens
), cum AS (
    SELECT n_tokens, mq,
           MAX(mq) OVER (ORDER BY n_tokens
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_strictly_shorter
    FROM per_n
)
SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.q
FROM scored s JOIN cum ON cum.n_tokens = s.n_tokens
WHERE s.q = cum.mq
  AND (cum.best_strictly_shorter IS NULL
       OR s.q > cum.best_strictly_shorter)
ORDER BY n_tokens, doc_id
""",
)
def curation_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of the corpus on (shorter is better,
    higher lexical diversity is better): the docs no other doc dominates
    — the classic "best tradeoff set" curation primitive (pick exemplar
    docs per length budget). A doc survives iff it has the MAX diversity
    at its exact length AND strictly beats the best diversity of every
    strictly shorter doc.

    Scale: the naive skyline is an all-pairs dominance join; this is the
    sort-free two-phase form — one map-side-combined (length → max
    quality) agg collapses the corpus to the DISTINCT-length frame
    (bounded: ≤ max doc length rows at any corpus size), a cumulative
    max runs over that tiny frame, and the verdict broadcasts back as an
    equi-join on length. Same bounded-frame discipline as the histogram
    stump and the AUC buckets."""
    from dbt_spark_models_spark.operators.text import _tokens
    from dbt_spark_models_spark.sources.testdata import spread

    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"], "doc_id")
    n_tok = F.size("tokens")
    scored = (
        d.withColumn("tokens", _tokens())
        .filter(n_tok > 0)
        .select(
            "doc_id",
            n_tok.alias("n_tokens"),
            F.round(F.size(F.array_distinct("tokens")) / n_tok, 6).alias("q"),
        )
    )
    per_n = scored.groupBy("n_tokens").agg(F.max("q").alias("mq"))
    one = F.col("n_tokens") % F.lit(1)  # non-foldable constant key
    w = (
        Window.partitionBy(one)
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_n.withColumn("best_strictly_shorter", F.max("mq").over(w))
    out = (
        scored.join(F.broadcast(cum), "n_tokens")
        .filter(
            (F.col("q") == F.col("mq"))
            & (
                F.col("best_strictly_shorter").isNull()
                | (F.col("q") > F.col("best_strictly_shorter"))
            )
        )
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "q")
    )
    return out.orderBy("n_tokens", "doc_id")
