"""Python UDTF gate: document sequence-chunking for training-data prep.

Demonstrates the Spark 4 Python UDTF surface (`pyspark.sql.functions.udtf`,
Arrow-optimized) on a real LLM-pipeline operator: splitting documents into
fixed-size overlapping context-window chunks (size 64, overlap 16 estimated
tokens — sized so the test corpus actually fans out to multiple chunks),
the step between curation and tokenized-shard writing.

The chunk-span math is pure integer arithmetic, so the UDTF hash-matches a
DuckDB ``generate_series`` lateral oracle exactly — a hard gate for the UDTF
execution path itself (serialization, lateral join semantics, multi-row
yield), not just the arithmetic.

Scale notes: a UDTF runs row-at-a-time in Python workers — fine here because
each input row fans out to few output rows and carries only two ints in and
three ints out (Arrow-batched both ways). For a 100 TB corpus the same spans
are expressible as pure column math (``sequence`` + ``transform`` + explode,
the plan `text_token_counts_bpe` uses); the UDTF form is the extension-point
API a user reaches for when span logic outgrows SQL (e.g. sentence-boundary
snapping), and this gate proves that path produces byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

_CHUNK = 64  # chunk size in estimated tokens (sized so testdata docs multi-chunk)
_OVERLAP = 16  # tokens shared between consecutive chunks
_STEP = _CHUNK - _OVERLAP


def _chunk_spans_udtf():
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_id: bigint, chunk_start: bigint, chunk_len: bigint",
        useArrow=True,
    )
    class ChunkSpans:
        def eval(self, n_tokens: int, size: int, overlap: int):
            if n_tokens is None or n_tokens <= 0:
                return
            step = size - overlap
            start, i = 0, 0
            while start < n_tokens:
                yield i, start, min(size, n_tokens - start)
                if start + size >= n_tokens:
                    break
                start += step
                i += 1

    return ChunkSpans


@query(
    "udtf_chunk_spans",
    oracle=f"""
WITH est AS (
    SELECT doc_id, lang, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, lang, n_tokens,
       i AS chunk_id,
       i * {_STEP} AS chunk_start,
       LEAST({_CHUNK}, n_tokens - i * {_STEP}) AS chunk_len
FROM est, LATERAL (
    SELECT UNNEST(generate_series(0,
        GREATEST(0, CAST(CEIL((n_tokens - {_CHUNK})
                              / CAST({_STEP} AS DOUBLE)) AS BIGINT)))) AS i
) s
""",
)
def udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunk spans per document via a Python
    UDTF in a SQL LATERAL join. One output row per (doc, chunk): chunk_id,
    token offset, and length (last chunk truncated, never empty)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    spark.udtf.register("chunk_spans", _chunk_spans_udtf())
    d.select(
        "doc_id",
        "lang",
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens"),
    ).createOrReplaceTempView("udtf_chunk_input")
    return spark.sql(
        f"""
        SELECT i.doc_id, i.lang, i.n_tokens,
               c.chunk_id, c.chunk_start, c.chunk_len
        FROM udtf_chunk_input i,
             LATERAL chunk_spans(i.n_tokens, {_CHUNK}, {_OVERLAP}) c
        """
    )
