"""Scalar function families (SURVEY.md §2.9) + set operations (§2.7).

String: LOWER ×212, CONCAT ×54, UPPER ×30, SPLIT ×24, REPLACE ×23,
SUBSTR ×20, REGEXP_EXTRACT ×19, CONCAT_WS ×16, INSTR ×12, REGEXP_REPLACE
×10, LPAD ×5, TRIM, hashing (MD5/SHA2/HASH/XXHASH64).
Date/time: DATE_TRUNC ×134, DATEDIFF ×112, ADD_MONTHS ×15, LAST_DAY ×8,
DATE_FORMAT ×12, UNIX_DATE ×10, INTERVAL literals ×363.
Set ops: UNION ALL ×716, UNION ×12.

All stay inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables


@query(
    "scalar_string_functions",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       REPLACE(p_name, ' ', '_') AS name_snake,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       STRPOS(p_name, 'a') AS first_a,
       TRIM(CONCAT(' ', p_name, ' ')) AS name_trimmed,
       REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
       REVERSE(p_type) AS type_rev,
       REPEAT('-', 3) AS dashes
FROM part
""",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (reference sites:
    ``new_pp_prices_history.sql:20`` SPLIT indexing, ``format_time.sql:3``
    LPAD, etc.)."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_name", "a").alias("first_a"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat(F.lit("-"), 3).alias("dashes"),
    )


@query(
    "scalar_hash_functions",
    oracle="""
SELECT doc_id,
       MD5(text) AS text_md5,
       SHA256(text) AS text_sha256
FROM documents
""",
)
def scalar_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing for signatures (reference SHA2 content signature,
    ``models/spark/onfy/onfy_product_analogues.sql:56``; MD5/HASH/XXHASH64).
    MD5/SHA-256 are standard, so both engines agree byte-for-byte."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "scalar_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS order_week,
       EXTRACT(YEAR FROM o_orderdate) AS order_year,
       EXTRACT(MONTH FROM o_orderdate) AS order_month_num,
       ISODOW(o_orderdate) AS order_isodow,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS review_date,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       STRFTIME(o_orderdate, '%Y-%m') AS month_str,
       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS unix_day
FROM orders
""",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: DATE_TRUNC, EXTRACT, DATEDIFF, INTERVAL arithmetic,
    ADD_MONTHS, LAST_DAY, DATE_FORMAT, UNIX_DATE (reference §2.9 date family;
    ``conversion_funnel.sql:17-19`` date ± INTERVAL)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("order_month"),
        F.date_trunc("week", d).cast("date").alias("order_week"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month_num"),
        (F.weekday(d) + 1).alias("order_isodow"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        (d + F.expr("INTERVAL 30 DAY")).cast("date").alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("month_str"),
        F.unix_date(d.cast("date")).cast("long").alias("unix_day"),
    )


@query(
    "setop_union_all_ledger",
    oracle="""
SELECT entity_id, kind, ROUND(amount, 2) AS amount
FROM (
    SELECT c_custkey AS entity_id, 'customer_balance' AS kind, c_acctbal AS amount
    FROM customer
    UNION ALL
    SELECT s_suppkey, 'supplier_balance', s_acctbal FROM supplier
    UNION ALL
    SELECT o_custkey, 'order_total', o_totalprice FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL ledger stacking — the reference's dominant set op (×716,
    ``search_success_aggregated.sql:194``). unionByName keeps schemas
    aligned by name, not position."""
    t = load_tables(spark, sf_dir, ("customer", "supplier", "orders"))
    c = t["customer"].select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer_balance").alias("kind"),
        F.col("c_acctbal").alias("amount"),
    )
    s = t["supplier"].select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier_balance").alias("kind"),
        F.col("s_acctbal").alias("amount"),
    )
    o = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select(
            F.col("o_custkey").alias("entity_id"),
            F.lit("order_total").alias("kind"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    return (
        c.unionByName(s)
        .unionByName(o)
        .select("entity_id", "kind", F.round("amount", 2).alias("amount"))
    )


@query(
    "setop_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
UNION
SELECT user_id FROM events WHERE value > 190
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained bare UNION with dedup semantics (reference
    ``models/spark/engagement/user_segments.sql:34-62``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    c = ev.filter(F.col("value") > 190).select("user_id")
    return a.union(b).union(c).distinct()


@query(
    "setop_except_intersect",
    oracle="""
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT 'buyer_not_clicker' AS segment, user_id
FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
UNION ALL
SELECT 'buyer_and_clicker', user_id
FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM clickers)
""",
)
def setop_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT (zero real uses in the reference §2.7, provided
    for surface completeness; Catalyst plans them as anti/semi joins)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    return (
        buyers.exceptAll(clickers)
        .distinct()
        .select(F.lit("buyer_not_clicker").alias("segment"), "user_id")
        .unionByName(
            buyers.intersect(clickers).select(
                F.lit("buyer_and_clicker").alias("segment"), "user_id"
            )
        )
    )


@query(
    "scalar_parse_url",
    oracle="""
WITH urls AS (
    SELECT doc_id,
           'https://' || source || '.example.com/' || lang || '/doc?q='
               || doc_id || '&ref=' || lang AS url
    FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
       regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
       regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param
FROM urls
""",
)
def scalar_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARSE_URL parity gate (reference ×1:
    ``models/spark/onfy/ads_dashboard.sql:139`` extracts the ``gclid``
    query param): host/path/query-param extraction from constructed URLs.
    Spark side uses the real ``parse_url`` builtin; the oracle mirrors it
    with anchored regexes (DuckDB has no parse_url). Row-local."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc?q="), F.col("doc_id"),
        F.lit("&ref="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


@query(
    "setop_union_by_name_evolution",
    oracle="""
WITH old_snap AS (
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders WHERE o_orderdate < DATE '1996-01-01'
    GROUP BY o_custkey
), new_snap AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders WHERE o_orderdate >= DATE '1996-01-01'
    GROUP BY o_custkey
)
SELECT o_custkey, n_orders, CAST(NULL AS DOUBLE) AS total_spend,
       'old' AS snapshot
FROM old_snap
UNION ALL
SELECT o_custkey, n_orders, total_spend, 'new' AS snapshot
FROM new_snap
""",
)
def setop_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (``unionByName(allowMissingColumns=True)``):
    an old snapshot lacking a later-added measure unions with the new
    one by COLUMN NAME, the missing column null-filled — the append-log
    shape every long-lived incremental table hits when its schema grows
    (`on_schema_change` handling at read time rather than write time).
    Positional UNION ALL would silently misalign columns; by-name is the
    only safe form once schemas diverge."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    old_snap = (
        o.filter(F.col("o_orderdate") < F.lit("1996-01-01"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("snapshot", F.lit("old"))
    )
    new_snap = (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .withColumn("snapshot", F.lit("new"))
    )
    return old_snap.unionByName(new_snap, allowMissingColumns=True).select(
        "o_custkey",
        "n_orders",
        F.col("total_spend").cast("double").alias("total_spend"),
        "snapshot",
    )


@query(
    "scalar_aes_roundtrip",
    oracle="""
SELECT doc_id,
       text AS recovered,
       LENGTH(text) AS n_chars_out
FROM documents
""",
)
def scalar_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption for PII at rest (``aes_encrypt`` →
    ``try_aes_decrypt``, AES-GCM with a per-call random IV embedded in the
    ciphertext): the gate decrypts what it encrypted and must recover the
    exact plaintext — the oracle is the identity projection, so any
    corruption in the encrypt/decrypt path (key handling, IV framing,
    binary↔string casts) hash-fails.

    Scale: both sides are row-local JVM expressions (no shuffle, fuses
    with the scan); at 100 TB the encrypted column is what you'd persist,
    with the key in a KMS-backed session conf, and `try_` decryption
    yields NULL (not a job abort) on rows encrypted under a rotated key."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    key = F.lit("0123456789abcdef")  # 16-byte demo key (AES-128)
    enc = F.aes_encrypt(F.col("text").cast("binary"), key, F.lit("GCM"))
    dec = F.try_aes_decrypt(enc, key, F.lit("GCM")).cast("string")
    return d.select(
        "doc_id",
        dec.alias("recovered"),
        F.length(dec).cast("long").alias("n_chars_out"),
    )
