"""Advanced relational coverage: subqueries (scalar/correlated/NOT IN),
CASE-aggregation, complex OR pushdown, HAVING join-back, pivot/unpivot,
dynamic regex from a table, engine SQL functions.

Reference sites: scalar subquery in predicate
(``models/spark/uzum/uzum_available_products.sql:42-43``), dynamic regex
built from a table (``uzum_available_products.sql:15-18``), IN/NOT IN
subqueries (``uzum_available_products.sql:35-39``), CASE ladders
(``models/spark/gold/gold_orders.sql:97-119``), millis_to_ts_msk ×151
(SURVEY.md §2.11).

Scale notes: correlated aggregates are written in decorrelated pre-агg
join form (what Catalyst rewrites to anyway, stated explicitly so the
shuffle keys are visible); scalar subqueries evaluate once and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, register_views


@query(
    "q12_priority_shipmode_case",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
       COUNT(*) AS n_lines
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-ladder aggregation over a fact join."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'E%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: LIKE-predicated conditional ratio; part dim
    broadcast."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.col("p_type").like("E%")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(promo, rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
    SELECT l_partkey AS pk, 0.5 * AVG(l_quantity) AS half_avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part_avg ON l_partkey = pk
WHERE l_quantity < half_avg_qty
""",
)
def q17_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery, written in its
    decorrelated pre-aggregate-then-join form (one shuffle on partkey,
    the plan Catalyst would rewrite to anyway)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q18_large_volume_orders",
    oracle="""
WITH big AS (
    SELECT l_orderkey AS ok, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM big
JOIN orders ON o_orderkey = ok
JOIN customer ON c_custkey = o_custkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING filter then join back to headers."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    big = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("ok"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 5 AND l_quantity <= 35)
   OR (p_type = 'SMALL' AND p_size BETWEEN 1 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
""",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive ranges (tests CNF
    conversion + partial pushdown of OR branches)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 35)
    )
    c3 = (
        (F.col("p_type") == "SMALL")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(c1 | c2 | c3)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q16_supplier_counts_not_in",
    oracle="""
WITH partsupp AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%1%')
GROUP BY p_brand, p_type, p_size
""",
)
def q16_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: derived partsupp + NOT IN subquery (anti join) +
    multi-key distinct count."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    partsupp = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad_supp = t["supplier"].filter(F.col("s_name").like("%1%")).select("s_suppkey")
    return (
        partsupp.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") != "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (reference
    ``uzum_available_products.sql:42-43``); evaluates once, broadcast."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
       ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0), 2)
           AS revenue_f
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (wide conditional aggregation)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("rev"),
        )
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("O_cnt"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("F_cnt"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("P_cnt"), F.lit(0)).alias("status_p"),
        F.coalesce(F.col("F_rev"), F.lit(0.0)).alias("revenue_f"),
    )


@query(
    "unpivot_stack_balances",
    oracle="""
SELECT n_nationkey AS nationkey, 'customers' AS kind,
       CAST(COUNT(c_custkey) AS BIGINT) AS cnt
FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY n_nationkey
UNION ALL
SELECT n_nationkey, 'suppliers',
       CAST(COUNT(s_suppkey) AS BIGINT)
FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_nationkey
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide per-nation counts → long (kind, cnt)."""
    t = load_tables(spark, sf_dir, ("nation", "customer", "supplier"))
    wide = (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_nationkey")
        .agg(F.count("c_custkey").alias("n_cust"))
        .join(
            t["nation"]
            .join(
                t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"), "left"
            )
            .groupBy(F.col("n_nationkey").alias("nk2"))
            .agg(F.count("s_suppkey").alias("n_supp")),
            F.col("n_nationkey") == F.col("nk2"),
        )
    )
    return wide.selectExpr(
        "n_nationkey AS nationkey",
        "stack(2, 'customers', n_cust, 'suppliers', n_supp) AS (kind, cnt)",
    )


@query(
    "dynamic_regex_from_table",
    oracle="""
WITH top_tokens AS (
    SELECT token FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE len(token) > 3
    GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 5
), pattern AS (
    SELECT '(' || string_agg(token, '|' ORDER BY token) || ')' AS re
    FROM top_tokens
)
SELECT d.doc_id, d.lang
FROM documents d, pattern p
WHERE regexp_matches(d.text, p.re)
""",
)
def dynamic_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex alternation built FROM A TABLE at runtime (reference stopword
    pattern, ``uzum_available_products.sql:15-18``): top-5 frequent long
    tokens → '(a|b|c)' → RLIKE via scalar subquery. No driver collect —
    the pattern is a broadcast scalar-subquery result."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH top_tokens AS (
            SELECT token FROM (
                SELECT explode(split(text, ' ')) AS token FROM documents
            ) WHERE length(token) > 3
            GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 5
        ), pattern AS (
            SELECT CONCAT('(', ARRAY_JOIN(SORT_ARRAY(COLLECT_LIST(token)), '|'), ')')
                AS re
            FROM top_tokens
        )
        SELECT d.doc_id, d.lang
        FROM documents d, pattern p
        WHERE d.text RLIKE p.re
        """
    )


@query(
    "functions_millis_roundtrip",
    oracle="""
SELECT event_id,
       epoch_ms(ts) AS ts_millis,
       epoch_ms(epoch_ms(ts)) AS ts_utc,
       epoch_ms(epoch_ms(ts)) + INTERVAL 3 HOUR AS ts_msk,
       CAST(epoch_ms(epoch_ms(ts)) + INTERVAL 3 HOUR AS DATE) AS date_msk
FROM events
""",
)
def functions_millis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-registered millis_to_ts / millis_to_ts_msk (reference's only
    custom UDF family, ×151 uses, SURVEY.md §2.11) — pure-builtin SQL
    functions, exercised end-to-end. Moscow is UTC+3 (no DST since 2014),
    which the oracle hard-codes.

    Note: ms truncation (epoch_ms vs unix_millis) floors on both engines;
    sub-ms precision is dropped identically.
    """
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id,
               unix_millis(ts) AS ts_millis,
               millis_to_ts(unix_millis(ts)) AS ts_utc,
               millis_to_ts_msk(unix_millis(ts)) AS ts_msk,
               CAST(millis_to_ts_msk(unix_millis(ts)) AS DATE) AS date_msk
        FROM events
        """
    )


@query(
    "q4_order_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join with a
    non-equi residual condition."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with a filtered ON clause, then a
    distribution over per-key counts (two-level aggregate)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") != "F"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
    SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT SUBSTRING(c_name, 1, 10) AS name_prefix,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY name_prefix
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join
    + substring grouping."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    avg_bal = t["customer"].filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            t["orders"].filter(
                F.col("o_orderdate")
                >= F.lit("1999-01-01 00:00:00").cast("timestamp")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.substring("c_name", 1, 10).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
