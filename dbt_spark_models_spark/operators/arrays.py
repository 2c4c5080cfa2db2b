"""Array / table-generating / nested-data coverage (SURVEY.md §2.8, §2.9).

Reference usage: EXPLODE ×194, LATERAL VIEW ×32, POSEXPLODE ×8, date spine
via EXPLODE(SEQUENCE(...)) (``models/spark/onfy/stock_monitoring.sql:16``),
83 higher-order lambda arrows (``models/spark/mongo/merchant_order.sql:23-26``
``ELEMENT_AT(TRANSFORM(FILTER(st.st, e -> e.s == 0), x -> x.t), 1)``),
FROM_JSON with inline DDL schema
(``models/spark/b2b_mart/merchant/merchant_funnel.sql:45``),
GET_JSON_OBJECT (``.../procurement_orders.sql:244-257``), MAP_FROM_ENTRIES ×16.

Scale notes: explode multiplies rows *within* a partition — no shuffle;
higher-order functions run inside whole-stage codegen (no Python). The
date-spine explode materializes a tiny dimension that is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, spread


def _tokens(col="text"):
    # documents.text is single-space separated words; filter guards blanks
    return F.filter(F.split(F.col(col), " "), lambda x: F.length(x) > 0)


@query(
    "explode_word_counts",
    oracle="""
SELECT token, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
WHERE len(token) > 0
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 50
""",
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLODE(SPLIT(...)) word frequencies — the lateral-view workhorse
    (reference ``models/spark/platform/s3_file_usage_v2.sql:17``)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("cnt").desc(), "token")
        .limit(50)
    )


@query(
    "posexplode_leading_tokens",
    oracle="""
SELECT doc_id, i AS pos, toks[i + 1] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     LATERAL (SELECT unnest(generate_series(0, len(toks) - 1)) AS i)
WHERE i < 3
""",
)
def posexplode_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSEXPLODE with position filter (reference
    ``models/spark/b2b_mart/fact/fact_order_change.sql:132``)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        d.select("doc_id", F.posexplode(_tokens()).alias("pos", "token"))
        .filter(F.col("pos") < 3)
        .select("doc_id", "pos", "token")
    )


@query(
    "date_spine_daily_activity",
    oracle="""
WITH spine AS (
    SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31',
                                       INTERVAL 1 DAY)) AS DATE) AS day
)
SELECT s.day,
       COUNT(e.event_id) AS n_events,
       ROUND(COALESCE(SUM(e.value), 0.0), 2) AS day_value
FROM spine s
LEFT JOIN events e ON CAST(e.ts AS DATE) = s.day
GROUP BY s.day
""",
)
def date_spine_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine via EXPLODE(SEQUENCE(d1, d2)) left-joined to facts so
    empty days appear (reference ``models/spark/onfy/stock_monitoring.sql:16``,
    ``onfy_metric_sheet.sql:152``). Spine side is broadcast."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    return (
        F.broadcast(spine)
        .join(ev, F.col("ts").cast("date") == F.col("day"), "left")
        .groupBy("day")
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("day_value"),
        )
    )


@query(
    "hof_lambda_chain",
    oracle="""
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       list_filter(toks, x -> len(x) > 5)[1] AS first_long_token,
       len(list_filter(toks, x -> len(x) > 5)) AS n_long_tokens,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_transform(list_filter(toks, x -> len(x) > 5), x -> upper(x)))), ','), '')
           AS long_tokens_upper
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
)
def hof_lambda_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested higher-order lambda chain — ELEMENT_AT(FILTER(...), 1),
    CARDINALITY(ARRAY_DISTINCT(TRANSFORM(FILTER(...)))) (reference
    ``models/spark/mongo/merchant_order.sql:23-26``,
    ``models/spark/engagement/user_segments.sql:70-80``). All JVM-side."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = _tokens()
    long_toks = F.filter(toks, lambda x: F.length(x) > 5)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.try_element_at(long_toks, F.lit(1)).alias("first_long_token"),
        F.size(long_toks).alias("n_long_tokens"),
        F.array_join(
            F.array_sort(F.array_distinct(F.transform(long_toks, F.upper))), ","
        ).alias("long_tokens_upper"),
    )


@query(
    "json_extraction",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
""",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET_JSON_OBJECT + FROM_JSON with inline DDL schema (reference
    ``models/spark/b2b_mart/merchant/merchant_funnel.sql:45``,
    ``.../procurement_orders.sql:244-257``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    parsed = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
    )
    return parsed.filter(F.col("k_int") >= 50).select(
        "event_id", "k_str", "k_int", (F.col("k_int") % 10).alias("k_bucket")
    )


@query(
    "map_from_entries_access",
    oracle="""
WITH per_type AS (
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY user_id, event_type
), m AS (
    SELECT user_id, MAP(LIST(event_type ORDER BY event_type),
                        LIST(cnt ORDER BY event_type)) AS type_counts
    FROM per_type GROUP BY user_id
)
SELECT user_id,
       COALESCE(type_counts['purchase'][1], 0) AS n_purchases,
       COALESCE(type_counts['view'][1], 0) AS n_views,
       len(map_keys(type_counts)) AS n_types
FROM m
""",
)
def map_from_entries_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP_FROM_ENTRIES + map access (reference ×16;
    ``models/spark/gold/gold_orders.sql:70`` map-path access)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", F.lit("purchase")), F.lit(0)).alias(
            "n_purchases"
        ),
        F.coalesce(F.element_at("type_counts", F.lit("view")), F.lit(0)).alias(
            "n_views"
        ),
        F.size(F.map_keys("type_counts")).alias("n_types"),
    )


@query(
    "array_embedding_norms",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       ROUND(SQRT(list_sum(list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
           AS l2_norm,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS comp_sum,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS comp_max
FROM embeddings
""",
)
def array_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.aggregate fold over a float vector column — the JVM-side pattern
    for embedding math (no Python UDF). Both engines compute in float64 on
    exactly the same float32 inputs, so results match bit-for-bit before
    rounding."""
    e = spread(load_tables(spark, sf_dir, ("embeddings",))["embeddings"], "vec_id")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    comp_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(comp_sum, 4).alias("comp_sum"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("comp_max"),
    )


@query(
    "explode_outer_rare_tokens",
    oracle="""
SELECT d.doc_id, u.token
FROM documents d
LEFT JOIN LATERAL (
    SELECT unnest(list_filter(string_split(d.text, ' '), x -> len(x) > 8))
        AS token
) u ON TRUE
WHERE d.doc_id < 50
""",
)
def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLODE_OUTER (reference ×2): documents with NO >8-char token keep
    one NULL row instead of disappearing."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 50
    )
    rare = F.filter(
        F.split(F.col("text"), " "), lambda x: F.length(x) > 8
    )
    return d.select("doc_id", F.explode_outer(rare).alias("token"))


@query(
    "array_function_battery",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
    FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       array_to_string(toks[1:3], ',') AS first3,
       list_position(toks, 'the') AS pos_the,
       list_has_any(toks, ['spark', 'query']) AS mentions_spark,
       len(flatten([toks[1:2], toks[3:4]])) AS flat_len,
       list_sort(toks)[1] AS min_token,
       list_sort(toks)[-1] AS max_token,
       array_to_string(list_reverse(toks[1:3]), ',') AS first3_rev
FROM t
""",
)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLICE / ARRAY_POSITION / ARRAYS_OVERLAP / FLATTEN / ARRAY_MIN-MAX /
    REVERSE (SURVEY.md §2.9 array family tail)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    toks = _tokens()
    return d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_position(toks, "the").alias("pos_the"),
        F.arrays_overlap(toks, F.array(F.lit("spark"), F.lit("query"))).alias(
            "mentions_spark"
        ),
        F.size(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2)))
        ).alias("flat_len"),
        F.array_min(toks).alias("min_token"),
        F.array_max(toks).alias("max_token"),
        F.array_join(F.reverse(F.slice(toks, 1, 3)), ",").alias("first3_rev"),
    )


@query(
    "map_function_battery",
    oracle="""
WITH per_type AS (
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       COUNT(*) FILTER (cnt >= 3) AS n_types_ge3,
       CAST(SUM(cnt) AS BIGINT) AS total_events,
       COUNT(*) AS n_types
FROM per_type GROUP BY user_id
""",
)
def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP_FILTER / MAP_VALUES / MAP_ENTRIES battery (reference §2.9:
    MAP_FILTER ×1, MAP_VALUES ×1, MAP_ENTRIES ×5): per-user type→count
    map, filtered and folded entirely with map higher-order functions.
    The oracle computes the same numbers straight from the long table —
    verifying the map ops against ground truth rather than porting them.
    Row-local after one combiner-friendly groupBy."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.size(
            F.map_filter("type_counts", lambda k, v: v >= 3)
        ).cast("long").alias("n_types_ge3"),
        F.aggregate(
            F.map_values("type_counts"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_events"),
        F.size(F.map_entries("type_counts")).cast("long").alias("n_types"),
    )


@query(
    "scalar_variant_shred",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
           AS k_sum
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1
""",
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` shreds the props payload ONCE into the binary variant
    encoding, then ``try_variant_get`` does TYPED extraction (no
    string-hopping per access, unlike ``get_json_object`` — compare
    ``json_extraction``). At 100 TB the variant column is what you'd
    persist: parse cost is paid at ingest, every downstream read gets
    typed access and pushdown-friendly shredding. The oracle reproduces
    the same rollup via DuckDB's JSON functions — VARIANT is an encoding
    choice, not a semantics change."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select(k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )


@query(
    "scalar_json_malformed_tolerance",
    oracle="""
WITH corrupted AS (
    SELECT event_id,
           CASE WHEN event_id % 7 = 0
                THEN substring(props, 1, length(props) - 2)  -- truncated JSON
                ELSE props END AS raw
    FROM events
)
SELECT CASE WHEN json_valid(raw) THEN 'ok' ELSE 'malformed' END AS parse_class,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_valid(raw)
                     THEN CAST(json_extract_string(raw, '$.k') AS INT)
                     ELSE 0 END) AS BIGINT) AS k_sum
FROM corrupted
GROUP BY 1
""",
)
def scalar_json_malformed_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance in semi-structured parsing: every 7th
    payload is deterministically truncated, and the pipeline must COUNT
    (not crash on) the bad records while aggregating the good ones — the
    dead-letter accounting every ingest job needs. Spark's
    ``get_json_object`` returns NULL on malformed input; the explicit
    ``json_valid``-style classification keeps the tally auditable.

    Scale: row-local parse + one map-side-combined groupBy; bad records
    cost one branch, never a task failure."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    raw = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substring(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    # classify on JSON VALIDITY (try_parse_json, NULL iff malformed) to
    # mirror the oracle's json_valid(raw) — classifying on '$.k' presence
    # would call a valid payload WITHOUT k 'malformed' while DuckDB calls
    # it 'ok' (ADVICE r3)
    parsed = ev.select(
        F.expr("try_parse_json("
               + "CASE WHEN event_id % 7 = 0"
               + " THEN substring(props, 1, length(props) - 2)"
               + " ELSE props END) IS NOT NULL").alias("is_valid"),
        F.get_json_object(raw, "$.k").alias("k_str"),
    )
    parse_class = F.when(F.col("is_valid"), "ok").otherwise("malformed")
    # Jackson's lenient get_json_object can still extract k from a
    # truncated payload, so gate the contribution on validity like the
    # oracle's CASE WHEN json_valid ... ELSE 0
    k_contrib = F.when(
        F.col("is_valid"), F.coalesce(F.col("k_str").cast("int"), F.lit(0))
    ).otherwise(F.lit(0))
    return parsed.groupBy(parse_class.alias("parse_class")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k_contrib).cast("long").alias("k_sum"),
    )
