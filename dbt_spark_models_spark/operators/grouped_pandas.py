"""Grouped-map Pandas path: applyInPandas with per-group pandas logic.

The designated slow path (Arrow-batched, ~10-100× faster than row-at-a-time
UDFs) for semantics the built-ins can't express. Here the semantics ARE
SQL-expressible (per-group z-normalization) on purpose: the DuckDB oracle
verifies the pandas path end-to-end — group routing, Arrow round-trip,
float math — against the pure-SQL formulation.

Scale notes: applyInPandas shuffles once on the group key and streams one
group at a time through Python with bounded memory; group size is the
memory unit, so at 100 TB you salt oversized groups first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables


def _normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"]
    # ddof=1 (sample std) to match STDDEV_SAMP in the oracle
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "zvalue": (v - v.mean()) / v.std(ddof=1),
        }
    )


@query(
    "grouped_pandas_znormalize",
    oracle="""
WITH eligible AS (
    SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 2
)
SELECT e.event_id, e.user_id,
       ROUND((e.value - AVG(e.value) OVER w) / STDDEV_SAMP(e.value) OVER w, 6)
           AS zvalue
FROM events e
JOIN eligible USING (user_id)
WINDOW w AS (PARTITION BY e.user_id)
""",
)
def grouped_pandas_znormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-normalization through applyInPandas, verified against the
    window-function formulation (reference grouped-map shape from the
    PySpark guide; groups with <2 events excluded so std is defined)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    eligible = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 2
    )
    out = (
        ev.join(F.broadcast(eligible.select("user_id")), "user_id")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            _normalize_group, "event_id long, user_id long, zvalue double"
        )
    )
    return out.select("event_id", "user_id", F.round("zvalue", 6).alias("zvalue"))


@query(
    "pandas_udf_nfc_normalize",
    oracle="""
WITH mixed AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % 2 = 1
                        THEN ' caf' || 'e' || chr(769)   -- decomposed e + U+0301
                        ELSE ' caf' || chr(233) END      -- precomposed U+00E9
               AS raw
    FROM documents
)
SELECT doc_id,
       md5(nfc_normalize(raw)) AS norm_md5,
       length(raw) AS raw_len,
       length(nfc_normalize(raw)) AS norm_len,
       nfc_normalize(raw) <> raw AS changed
FROM mixed
""",
)
def pandas_udf_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization through a VECTORIZED scalar Pandas UDF —
    the sanctioned Python escape hatch for logic Spark has no builtin for
    (JVM SQL exposes no Unicode normalizer), hash-gated against DuckDB's
    ``nfc_normalize`` so the Arrow round-trip and Python logic get the
    same hard driver signal as JVM operators. Half the docs get a
    DECOMPOSED suffix (e + combining acute), half the precomposed é —
    NFC collapses both to identical strings, so the oracle discriminates
    real normalization from a pass-through.

    Scale: Arrow-batched columnar transfer (not per-row pickling);
    row-local, so the UDF stage fuses into the scan with no shuffle."""
    import unicodedata

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 2 == 1, F.lit(" café")).otherwise(
            F.lit(" café")
        ),
    )
    mixed = d.select("doc_id", raw.alias("raw"))
    return mixed.select(
        "doc_id",
        F.md5(nfc(F.col("raw"))).alias("norm_md5"),
        F.length("raw").cast("long").alias("raw_len"),
        F.length(nfc(F.col("raw"))).cast("long").alias("norm_len"),
        (nfc(F.col("raw")) != F.col("raw")).alias("changed"),
    )


@query(
    "pandas_udaf_weighted_median",
    oracle="""
WITH per_value AS (
    SELECT l_returnflag, l_extendedprice AS v, SUM(l_quantity) AS w
    FROM lineitem GROUP BY 1, 2
), cum AS (
    SELECT l_returnflag, v,
           SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
           SUM(w) OVER (PARTITION BY l_returnflag) AS tw
    FROM per_value
)
SELECT l_returnflag,
       ROUND(MIN(v), 2) AS weighted_median_price
FROM cum WHERE cw >= tw / 2
GROUP BY l_returnflag
""",
)
def pandas_udaf_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag through a GROUPED-AGG
    Pandas UDF (Series -> scalar) — the UDAF flavor of the Pandas surface
    (scalar / grouped-map / UDTF are covered elsewhere), hash-gated against
    the cumulative-weight window formulation in SQL.

    Tie semantics: weights are summed per DISTINCT value before the
    cumulative scan, so the Python path reproduces the SQL window's
    RANGE-frame behavior exactly.

    Scale: grouped-agg UDFs get partial Arrow batches per partition only
    when the plan allows; here the group key is low-cardinality, so the
    one shuffle is on l_returnflag and each group streams through Python
    once. For high-cardinality keys prefer built-in aggregates; this shape
    is for small-group custom math."""

    @F.pandas_udf("double")
    def wmedian(v: pd.Series, w: pd.Series) -> float:
        per_value = (
            pd.DataFrame({"v": v, "w": w}).groupby("v", sort=True)["w"].sum()
        )
        cw = per_value.cumsum()
        total = per_value.sum()
        return round(float(cw.index[(cw >= total / 2).argmax()]), 2)

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        wmedian(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "weighted_median_price"
        )
    )


@query(
    "arrow_map_byte_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
           AS total_spaces
FROM documents
GROUP BY lang
""",
)
def arrow_map_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document byte/char/space counts through ``mapInArrow`` — the
    zero-copy Arrow-native UDF flavor (no pandas conversion at all;
    ``pyarrow.compute`` kernels run directly on the Arrow buffers Spark
    ships), completing the Python surface: scalar pandas_udf, grouped-map,
    grouped-agg, UDTF, mapInPandas, and now mapInArrow. The distinction
    matters at 100 TB: for byte-level work on large string columns, the
    pandas hop costs an object-array materialization per batch that Arrow
    kernels skip.

    Row-local (fuses with the scan, no shuffle); the rollup after is one
    map-side-combined groupBy, hash-gated against DuckDB's byte/char
    semantics (strlen vs length)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for b in batches:
            txt = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("lang")),
                    pc.cast(pc.binary_length(txt), pa.int64()),
                    pc.cast(pc.utf8_length(txt), pa.int64()),
                    pc.cast(pc.count_substring(txt, " "), pa.int64()),
                ],
                names=["lang", "n_bytes", "n_chars", "n_spaces"],
            )

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    stats = d.select("lang", "text").mapInArrow(
        batch_stats,
        "lang string, n_bytes long, n_chars long, n_spaces long",
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_spaces").alias("total_spaces"),
    )
