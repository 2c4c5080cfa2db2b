"""Tokenizer-training operators: distributed BPE merge learning.

Beyond-reference surface (the reference has no tokenizer tooling; its text
processing is plain SQL string functions, e.g.
``models/spark/mart/dim_product.sql``): byte-pair-encoding merge learning is
the canonical tokenizer-training step of an LLM data pipeline, and its
inner loop — count adjacent token pairs, pick the most frequent, merge —
is a textbook Spark aggregation, so the 100 TB formulation is natural:

- pair construction is ROW-LOCAL (``zip_with`` over two array slices — no
  posexplode + window, no shuffle to form pairs);
- pair counting is one map-side-combined ``groupBy`` per round;
- the argmax pair is a 1-row driver probe per round (same pattern as the
  connected-components convergence probe, ``clustering.py``);
- applying a merge is a row-local string ``replace`` over a
  delimiter-encoded token stream: tokens are wrapped ``<tok>`` and joined,
  so the search key ``<l><r>`` can only match whole-token boundaries, and
  left-to-right non-overlapping replacement gives identical greedy-merge
  semantics in Spark and DuckDB (the glue byte 0x1f marks merged tokens).

At 100 TB you'd batch the top-M pairwise-compatible merges per round
(amortizing the scan over M merges) and checkpoint the state column every
~10 rounds to bound lineage; the single-merge round here keeps exact
oracle parity with the unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

_BPE_ROUNDS = 3
_GLUE = "\x1f"

_BPE_STATE0_DUCK = """
    SELECT doc_id, '<' || array_to_string(tk, '><') || '>' AS state
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> len(x) > 0) AS tk
          FROM documents)
    WHERE len(tk) >= 2
"""


def _bpe_round_duck(r: int) -> str:
    """One unrolled BPE round: count pairs in s{r-1}, pick top, emit s{r}."""
    return f"""c{r} AS (
    SELECT p.l_tok AS l_tok, p.r_tok AS r_tok, COUNT(*) AS pair_count
    FROM (
        SELECT unnest(list_transform(range(1, len(tk)),
                      i -> {{'l_tok': tk[i], 'r_tok': tk[i + 1]}})) AS p
        FROM (SELECT string_split(substring(state, 2, length(state) - 2),
                                  '><') AS tk
              FROM s{r - 1})
    )
    GROUP BY 1, 2
), t{r} AS (
    SELECT l_tok, r_tok, pair_count
    FROM c{r} ORDER BY pair_count DESC, l_tok, r_tok LIMIT 1
), s{r} AS (
    SELECT doc_id,
           replace(state,
                   '<' || t.l_tok || '><' || t.r_tok || '>',
                   '<' || t.l_tok || chr(31) || t.r_tok || '>') AS state
    FROM s{r - 1} CROSS JOIN t{r} t
)"""


_BPE_ORACLE = (
    "WITH s0 AS (" + _BPE_STATE0_DUCK + "),\n"
    + ",\n".join(_bpe_round_duck(r) for r in range(1, _BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, l_tok, r_tok, pair_count FROM t{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
)


@query("train_bpe_merges", oracle=_BPE_ORACLE)
def train_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merge rules over the corpus (word-level BPE:
    merged tokens are glued with 0x1f). Output = one row per learned merge
    (round, left, right, corpus pair frequency), fully deterministic via
    the (count DESC, left, right) tie-break.

    Each round is one row-local pair build + one map-side-combined count +
    a 1-row argmax probe + a row-local replace — per-round cost is a single
    corpus scan regardless of vocabulary size."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    tk = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    # ONE corpus tokenization, cached as the delimiter-encoded state
    # string only (doc_id never reaches the output, so caching it would
    # just widen every round's scan). Round r's pair count materializes
    # state_r FROM the cached state_{r-1} (a row-local replace), and ONLY
    # THEN is state_{r-1} dropped — the pre-r11 loop unpersisted the
    # parent before the child ever ran, so every round re-ran the regex
    # tokenization of the whole corpus from parquet.
    cur = (
        d.select(tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.concat(
                F.lit("<"), F.array_join("tk", "><"), F.lit(">")
            ).alias("state"),
        )
        .persist()
    )
    pairs = F.expr(
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1),"
        " (a, b) -> struct(a AS l_tok, b AS r_tok))"
    )
    merges: list[tuple[int, str, str, int]] = []
    prev = None
    for rnd in range(1, _BPE_ROUNDS + 1):
        counted = (
            cur.select(
                F.expr(
                    "split(substring(state, 2, length(state) - 2), '><')"
                ).alias("tk")
            )
            .select(F.explode(pairs).alias("p"))
            .groupBy("p.l_tok", "p.r_tok")
            .agg(F.count(F.lit(1)).alias("pair_count"))
        )
        # 1-row argmax probe (total order -> deterministic), the same
        # driver-probe budget as the iterative-CC convergence check
        top = counted.orderBy(
            F.col("pair_count").desc(), "l_tok", "r_tok"
        ).first()
        # cur is materialized now; its parent's cache can finally go
        if prev is not None:
            prev.unpersist()
            prev = None
        merges.append((rnd, top["l_tok"], top["r_tok"], top["pair_count"]))
        if rnd < _BPE_ROUNDS:
            nxt = cur.withColumn(
                "state",
                F.replace(
                    F.col("state"),
                    F.lit(f"<{top['l_tok']}><{top['r_tok']}>"),
                    F.lit(f"<{top['l_tok']}{_GLUE}{top['r_tok']}>"),
                ),
            )
            if rnd < _BPE_ROUNDS - 1:
                # state_r is read twice (round r+1's count AND state_{r+1}'s
                # build) -> cache it; the penultimate round's output is read
                # exactly once, so the final count streams the replace
                # straight off the parent's cache instead of paying a cache
                # write nothing ever reads back
                nxt = nxt.persist()
            prev = cur
            cur = nxt
        else:
            cur.unpersist()  # no-op when the final state was never persisted
    return spark.createDataFrame(
        merges,
        "merge_round INT, l_tok STRING, r_tok STRING, pair_count BIGINT",
    )
