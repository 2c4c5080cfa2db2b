"""Sparse retrieval over the documents corpus: BM25 (Robertson &
Spärck Jones probabilistic weighting, the Okapi BM25 form) as a
distributed inverted-index scoring pipeline.

Part of the beyond-reference LLM-data-pipeline family (build brief):
large-scale training-data work needs retrieval for decontamination-by-
search, hard-negative mining, and RAG corpus curation. The plan is the
100 TB shape: one shuffle to build postings (doc, term, tf), one
map-side-combined aggregate per statistic (df, dl), a BROADCAST join of
the (tiny) query-term table against the postings, and a per-query top-k
window — never a doc×query cartesian.

Cross-engine determinism: scores are quantized to DECIMAL(18,4) BEFORE
ranking and the tie-break is doc_id, so the DuckDB oracle ranks the
identical total order (see memory: order-dependent double sums flip
rounding boundaries between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

# fixed benchmark queries: multi-term, one rare term ('dup' appears in
# ~5% of docs → high idf — the discriminative case), duplicated literals
# in the oracle below
_QUERIES: list[tuple[str, list[str]]] = [
    ("q_hash_join", ["hash", "join"]),
    ("q_window_sort_merge", ["window", "sort", "merge"]),
    ("q_rare_dup", ["dup"]),
    ("q_scan_filter_column", ["scan", "filter", "column"]),
]

_K1 = 1.2
_B = 0.75
_TOP_K = 10

_QUERY_ROWS_SQL = " UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, '{t}' AS term"
    for qid, terms in _QUERIES
    for t in terms
)


@query(
    "retrieval_bm25_topk",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> len(x) > 0) AS tokens
    FROM documents
), postings AS (
    SELECT doc_id, unnest(tokens) AS term FROM toks
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM postings GROUP BY doc_id, term
), dl AS (
    SELECT doc_id, len(tokens) AS dl FROM toks WHERE len(tokens) > 0
), stats AS (
    SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), qterms AS (
    {_QUERY_ROWS_SQL}
), scored AS (
    SELECT q.query_id, t.doc_id,
           SUM(
               LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
               * t.tf * ({_K1} + 1)
               / (t.tf + {_K1} * (1 - {_B} + {_B} * l.dl / s.avgdl))
           ) AS score
    FROM qterms q
    JOIN tf t ON t.term = q.term
    JOIN df d ON d.term = q.term
    JOIN dl l ON l.doc_id = t.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, t.doc_id
), ranked AS (
    SELECT query_id, doc_id,
           CAST(ROUND(score, 4) AS DECIMAL(18, 4)) AS bm25,
           ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY CAST(ROUND(score, 4) AS DECIMAL(18, 4)) DESC, doc_id
           ) AS rank
    FROM scored
)
SELECT query_id, rank, doc_id, CAST(bm25 AS DOUBLE) AS bm25
FROM ranked WHERE rank <= {_TOP_K}
""",
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval (Robertson et al., TREC-3; k1=1.2,
    b=0.75) for a fixed query set, as one inverted-index pipeline:

    1. postings (doc, term, tf): one shuffle, map-side combined;
    2. df and avgdl: keyed/global aggregates off the postings;
    3. the query-term table (a few rows) joins the postings BROADCAST —
       only postings of query terms survive, so the scored set is
       |matching postings|, never |docs| × |queries|;
    4. per-query top-k by a rank window over the quantized score.

    At 100 TB the postings build dominates (it is the same shuffle an
    inverted-index build pays); df for query terms is a broadcast-sized
    side input. Scores quantize to DECIMAL(18,4) before ranking with a
    doc_id tie-break → the ranking is a total order identical on any
    engine."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    # tokens feed three branches (query-term postings, doc lengths, corpus
    # stats); persist so the regex tokenization runs once per corpus scan
    # instead of once per branch
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        ).alias("tokens"),
    ).persist()
    # the query set is a LITERAL, so the term filter is known at plan
    # time: pushing it below the tf aggregate means the postings shuffle
    # carries only query-term postings (a few terms) instead of the whole
    # inverted index — tf and df for the surviving terms are unchanged,
    # because both aggregate per (doc, term) / term and the filter is
    # per-term. This replaces TWO full-corpus postings shuffles (tf was
    # also re-built from scratch for the df branch) with one tiny one.
    all_terms = sorted({t for _, terms in _QUERIES for t in terms})
    postings = toks.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term").isin(all_terms))
    tf = postings.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.filter(F.size("tokens") > 0).select(
        "doc_id", F.size("tokens").cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id string, term string",
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (_K1 + 1)
                / (
                    F.col("tf")
                    + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    ranked = scored.select(
        "query_id",
        "doc_id",
        F.round("score", 4).cast("decimal(18,4)").alias("bm25"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("bm25").desc(), F.col("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= _TOP_K).select(
        "query_id",
        "rank",
        "doc_id",
        # rank on the exact DECIMAL, publish as DOUBLE (decimal output
        # renders as Decimal on the Spark side but float64 through the
        # driver's DuckDB fetch — a guaranteed hash mismatch)
        F.col("bm25").cast("double").alias("bm25"),
    )
