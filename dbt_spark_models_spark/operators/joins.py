"""Join-kind coverage (SURVEY.md §2.3).

The reference exercises LEFT ×1197, INNER ×216, FULL ×21, CROSS ×10,
LEFT SEMI ×3, RIGHT ×1, LEFT ANTI ×1, plus range joins
(``models/spark/merchant/cancel_rates.sql:83``), as-of/temporal joins
(``models/spark/onfy/auto_discount_rules.sql:32``), self-joins
(``models/spark/dashboards/dim_pair_currency_rate.sql:18-19``) and
pair-enumeration cross joins (``models/spark/points/current_points_liability.sql:40``).

Scale notes:
- Semi/anti joins broadcast the filter side when it is an aggregated key
  set (small); otherwise they shuffle on the key like any equi join.
- The as-of join is implemented with the **union + last-non-null window**
  pattern, not a broadcast nested-loop: O(n log n) per user partition,
  scales to arbitrarily many users because the window partitions by key.
- The calendar range join is implemented by **binning** (truncate the
  probe timestamp to the bucket and equi-join), the standard rewrite that
  avoids a BNLJ at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: IN-subquery rewrite (reference:
    ``models/spark/engagement/segments/frequent_buyers.sql:35``)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "join_anti_customers_without_recent_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: blacklist-subtraction pattern (reference:
    ``models/spark/category_management/joom_select_v2/js2_proposals.sql:140``)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_full_outer_nation_balance",
    oracle="""
WITH c AS (
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS cust_balance
    FROM customer GROUP BY c_nationkey
), s AS (
    SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS supp_balance
    FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(cust_balance, 0.0) AS cust_balance,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       COALESCE(supp_balance, 0.0) AS supp_balance
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER of two pre-aggregated sides (reference:
    ``models/spark/onfy/ads_dashboard.sql:152``). Pre-aggregation before the
    join keeps both shuffle inputs minimal."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("cust_balance"),
        )
    )
    s = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("supp_balance"),
        )
    )
    return (
        c.join(s, F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("cust_balance"), F.lit(0.0)).alias("cust_balance"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
            F.coalesce(F.col("supp_balance"), F.lit(0.0)).alias("supp_balance"),
        )
    )


@query(
    "join_cross_region_status_grid",
    oracle="""
WITH statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
     grid AS (SELECT r_regionkey, r_name, o_orderstatus FROM region CROSS JOIN statuses),
     per_nation AS (
        SELECT n_regionkey, o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey, o_orderstatus
     )
SELECT g.r_name, g.o_orderstatus, COALESCE(p.n_orders, 0) AS n_orders
FROM grid g
LEFT JOIN per_nation p
  ON g.r_regionkey = p.n_regionkey AND g.o_orderstatus = p.o_orderstatus
""",
)
def join_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN for dense-grid construction (reference constant-params
    pattern, ``models/spark/points/current_points_liability.sql:40``):
    region × status grid left-joined with actual counts so empty cells
    surface as 0."""
    t = load_tables(spark, sf_dir, ("region", "nation", "customer", "orders"))
    statuses = t["orders"].select("o_orderstatus").distinct()
    grid = t["region"].crossJoin(statuses)
    per_nation = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        grid.join(
            per_nation,
            (F.col("r_regionkey") == F.col("n_regionkey"))
            & (F.col("o_orderstatus") == F.col("status")),
            "left",
        )
        .select(
            "r_name",
            "o_orderstatus",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


@query(
    "join_self_nation_pairs",
    oracle="""
SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
FROM nation a
JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
""",
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join pair enumeration within a group (reference currency-pair
    pattern, ``models/spark/dashboards/dim_pair_currency_rate.sql:18-19``)."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("regionkey"),
        )
    )


@query(
    "join_range_signup_window_purchases",
    oracle="""
WITH signups AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY user_id
)
SELECT s.user_id,
       COUNT(e.event_id) AS purchases_first_week,
       ROUND(COALESCE(SUM(e.value), 0.0), 2) AS revenue_first_week
FROM signups s
LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.event_type = 'purchase'
 AND e.ts >= s.signup_ts
 AND e.ts <  s.signup_ts + INTERVAL 7 DAY
GROUP BY s.user_id
""",
)
def join_range_signup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join with an equi key (reference date-in-[start,end]
    pattern, ``models/spark/merchant/cancel_rates.sql:83``): purchases within
    7 days of first signup. The equi user_id key makes this a hash join with
    a residual range filter — no BNLJ at scale."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), "ts", "value", "event_id"
    )
    return (
        signups.join(
            purchases,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("ts") >= F.col("signup_ts"))
            & (F.col("ts") < F.col("signup_ts") + F.expr("INTERVAL 7 DAY")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.count("event_id").alias("purchases_first_week"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias(
                "revenue_first_week"
            ),
        )
    )


@query(
    "join_range_calendar_bins",
    oracle="""
WITH spine AS (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-29',
                                  INTERVAL 7 DAY)) AS week_start
)
SELECT CAST(week_start AS DATE) AS week_start_date,
       COUNT(e.event_id) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM spine s
LEFT JOIN events e
  ON e.ts >= s.week_start AND e.ts < s.week_start + INTERVAL 7 DAY
GROUP BY week_start_date
""",
)
def join_range_calendar_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure (no equi-key) range join against a calendar spine, rewritten as
    **binning**: truncate event ts to its 7-day bucket and equi-join the
    spine. Catalyst turns the naive theta version into a BNLJ that dies at
    scale; the bin rewrite is a broadcast equi join. The spine left join
    keeps empty weeks (reference date-spine pattern,
    ``models/spark/onfy/stock_monitoring.sql:16``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    spine = spark.sql(
        "SELECT explode(sequence(timestamp'2024-01-01', timestamp'2024-01-29',"
        " interval 7 days)) AS week_start"
    )
    # bin events: week index = floor(days since epoch anchor / 7)
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp")
    binned = ev.withColumn(
        "week_start",
        anchor
        + F.expr(
            "make_interval(0, 0, 0, CAST(floor((unix_timestamp(ts) -"
            " unix_timestamp(timestamp'2024-01-01')) / 604800) * 7 AS INT), 0, 0, 0)"
        ),
    )
    return (
        F.broadcast(spine)
        .join(binned, "week_start", "left")
        .groupBy(F.col("week_start").cast("date").alias("week_start_date"))
        .agg(
            F.count("event_id").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "join_asof_purchase_last_view",
    oracle="""
WITH views AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'view'
), purchases AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id,
       p.user_id,
       p.ts,
       ROUND(p.value, 2) AS purchase_value,
       ROUND(v.value, 2) AS last_view_value,
       v.ts AS last_view_ts
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (reference SCD2 temporal-join pattern,
    ``models/spark/onfy/auto_discount_rules.sql:32``): each purchase picks
    the most recent view at-or-before it per user.

    Spark-first implementation: **union + last-non-null window** — tag both
    streams, union, and take ``last(value, ignorenulls)`` over
    (user, ts, side) ordering. One shuffle on user_id, no nested-loop; at
    100 TB the window partitions by key so state stays bounded per user.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("purchase_value"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("view_value"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(1).alias("side"),
    )
    # views sort before purchases at equal ts => matches oracle's p.ts >= v.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        "purchase_value",
        F.last("view_value", ignorenulls=True).over(w).alias("last_view_value_raw"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_ts"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.round("purchase_value", 2).alias("purchase_value"),
        F.round("last_view_value_raw", 2).alias("last_view_value"),
        "last_view_ts",
    )


@query(
    "join_right_outer_supplier_nation",
    oracle="""
SELECT n_nationkey, n_name,
       COUNT(s_suppkey) AS n_suppliers,
       ROUND(COALESCE(SUM(s_acctbal), 0.0), 2) AS supplier_balance
FROM supplier
RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (reference ×1,
    ``models/spark/b2b_mart/key/interactions_funnel.sql:303``): every
    nation appears even with zero suppliers."""
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias(
                "supplier_balance"
            ),
        )
    )


@query(
    "affinity_part_pairs",
    oracle="""
WITH order_parts AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM order_parts a JOIN order_parts b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), counted AS (
    SELECT part_a, part_b, COUNT(*) AS n_orders
    FROM pairs GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_orders, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b)
               AS rnk
    FROM counted
) WHERE rnk <= 20
""",
)
def affinity_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top-20 part pairs co-occurring in the same
    order — the within-group pair-generation pattern (reference:
    ``models/spark/onfy/onfy_product_analogues.sql:73-80`` POSEXPLODE
    pairing) applied to a fact table via self-join on the group key.

    Scale: pairs are generated per order (self-join shuffles on orderkey,
    pair count bounded by lines-per-order², ~4² here), then one
    combiner-friendly count. The global top-20 is taken with
    ``orderBy().limit(20)`` — Spark plans that as TakeOrderedAndProject
    (per-partition top-20 heaps merged at the driver), so no partition ever
    holds the full counted-pair table; ``row_number`` then ranks only the
    20 surviving rows."""
    from pyspark.sql import Window

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    order_parts = li.select("l_orderkey", "l_partkey").distinct()
    a = order_parts.alias("a")
    b = order_parts.alias("b")
    counted = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    order_cols = [F.col("n_orders").desc(), F.col("part_a"), F.col("part_b")]
    top = counted.orderBy(*order_cols).limit(20)
    w = Window.orderBy(*order_cols)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("part_a", "part_b", "n_orders", "rnk")
    )


@query(
    "join_null_safe_equality",
    oracle="""
WITH a AS (
    SELECT NULLIF(event_type, 'error') AS k, value FROM events
), b AS (
    SELECT NULLIF(event_type, 'error') AS k,
           LENGTH(event_type) AS w
    FROM (SELECT DISTINCT event_type FROM events)
)
SELECT COALESCE(a.k, '<null>') AS join_key,
       COUNT(*) AS n,
       ROUND(SUM(a.value * b.w), 2) AS weighted
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
""",
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics dbt
    models reach for when a nullable dimension key must still enrich
    ('unknown' buckets). Derived NULLs (event_type='error' → NULL) prove
    the distinction: a plain join loses those rows, the null-safe join
    keeps them.

    Scale: EqualNullSafe is a hashable join key (Spark plans a normal
    hash join on the null-wrapped key, broadcast here) — no BNLJ fallback,
    unlike OR-based null handling."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a = ev.select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("k"), "value"
    )
    b = (
        ev.select("event_type")
        .distinct()
        .select(
            F.nullif(F.col("event_type"), F.lit("error")).alias("kb"),
            F.length("event_type").alias("w"),
        )
    )
    j = a.join(F.broadcast(b), a["k"].eqNullSafe(F.col("kb")))
    return j.groupBy(
        F.coalesce(F.col("k"), F.lit("<null>")).alias("join_key")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value") * F.col("w")), 2).alias("weighted"),
    )


@query(
    "join_asof_nearest_view",
    oracle="""
WITH views AS (
    SELECT user_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), paired AS (
    SELECT p.event_id, p.user_id, p.ts,
           b.ts AS b_ts, f.ts AS f_ts
    FROM purchases p
    ASOF LEFT JOIN views b ON p.user_id = b.user_id AND p.ts >= b.ts
    ASOF LEFT JOIN views f ON p.user_id = f.user_id AND p.ts <= f.ts
)
SELECT event_id, user_id, ts,
       CASE
         WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
         WHEN f_ts IS NULL THEN b_ts
         WHEN b_ts IS NULL THEN f_ts
         WHEN epoch_us(ts) - epoch_us(b_ts)
              <= epoch_us(f_ts) - epoch_us(ts) THEN b_ts
         ELSE f_ts
       END AS nearest_view_ts,
       CASE
         WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
         WHEN f_ts IS NULL THEN 'backward'
         WHEN b_ts IS NULL THEN 'forward'
         WHEN epoch_us(ts) - epoch_us(b_ts)
              <= epoch_us(f_ts) - epoch_us(ts) THEN 'backward'
         ELSE 'forward'
       END AS direction,
       CAST(CASE
         WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
         WHEN f_ts IS NULL THEN epoch_us(ts) - epoch_us(b_ts)
         WHEN b_ts IS NULL THEN epoch_us(f_ts) - epoch_us(ts)
         ELSE LEAST(epoch_us(ts) - epoch_us(b_ts),
                    epoch_us(f_ts) - epoch_us(ts))
       END AS BIGINT) AS gap_us
FROM paired
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof
    direction='nearest'``): each purchase picks the view closest in time
    per user — backward on ties. Completes the as-of family
    (``join_asof_purchase_last_view`` is the backward-only variant).

    Spark-first: the same union + keyed-window device as the backward
    as-of, run in BOTH directions over ONE shuffle — the union is
    exchanged once on user_id, then two in-partition sorts feed (a) a
    last-non-null PRECEDING window ordered (ts, side) so equal-ts views
    precede purchases (backward ≥), and (b) a first-non-null FOLLOWING
    window ordered (ts, side DESC) so equal-ts views follow purchases
    (forward ≤). Nearest = whichever candidate's µs gap is smaller. No
    nested loop, bounded per-user window state at any scale."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side")
    )
    merged = views.unionByName(purchases)
    view_ts = F.when(F.col("side") == 0, F.col("ts"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = merged.select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last(view_ts, ignorenulls=True).over(w_back).alias("b_ts"),
        F.first(view_ts, ignorenulls=True).over(w_fwd).alias("f_ts"),
    ).filter(F.col("side") == 1)
    gb = F.unix_micros("ts") - F.unix_micros("b_ts")
    gf = F.unix_micros("f_ts") - F.unix_micros("ts")
    back_wins = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (gb <= gf)
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(back_wins, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "nearest_view_ts"
        ),
        F.when(
            F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None)
        )
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.when(back_wins, gb).otherwise(gf).cast("long").alias("gap_us"),
    )
