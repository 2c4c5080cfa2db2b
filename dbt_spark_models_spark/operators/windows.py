"""Window-function coverage (SURVEY.md §2.5).

Reference usage: FIRST_VALUE ×192, ROW_NUMBER ×160, LEAD ×92, LAG ×71,
RANK ×17, LAST_VALUE ×13, DENSE_RANK ×6; ROWS BETWEEN ×50, RANGE BETWEEN ×14;
sessionization via gaps-and-islands
(``models/spark/b2b_mart/ss/ss_events_by_session.sql:95-134``); retention
flags via RANGE + FOLLOWING buckets over UNIX_DATE
(``macros/gold_active_users_and_devices_with_ephemeral.sql:256-315``);
nested aggregate-in-window SUM(SUM(x)) OVER ()
(``macros/gold_active_users_and_devices_with_ephemeral.sql:81-82``).

Scale notes: every window here partitions by a high-cardinality key
(user_id / customer) so per-partition state is bounded; one shuffle per
distinct partitioning, and consecutive windows sharing a partitioning
reuse the same exchange (Catalyst collapses them into one sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables, register_views


@query(
    "window_topk_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 3
""",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ROW_NUMBER (reference dedup-keep-first pattern,
    ``models/spark/gold/gold_orders.sql:24``)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_running_total_per_user",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_value
FROM events
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with ROWS frame (reference rolling-sum pattern,
    ``models/spark/category_management/joom_select_v2/js2_1688_price_index.sql:138``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@query(
    "window_lag_lead_gaps",
    oracle="""
SELECT event_id, user_id,
       epoch_ms(ts) - epoch_ms(LAG(ts) OVER w  ) AS ms_since_prev,
       epoch_ms(LEAD(ts) OVER w) - epoch_ms(ts) AS ms_until_next,
       LAG(event_type, 2) OVER w AS type_2_back
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with offsets (reference:
    ``models/spark/engagement/user_segments.sql:123-126`` uses LAG(col, 3))."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        (ms - F.unix_millis(F.lag("ts").over(w))).alias("ms_since_prev"),
        (F.unix_millis(F.lead("ts").over(w)) - ms).alias("ms_until_next"),
        F.lag("event_type", 2).over(w).alias("type_2_back"),
    )


@query(
    "window_first_last_event",
    oracle="""
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type)  OVER w AS last_type,
       FIRST_VALUE(ts) OVER w AS first_ts
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over an unbounded frame + DISTINCT (reference
    dominant-attribute pattern,
    ``macros/gold_active_users_and_devices_with_ephemeral.sql:114-115``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("ts").over(w).alias("first_ts"),
    ).distinct()


@query(
    "window_range_interval_7d",
    oracle="""
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                                        AND CURRENT ROW), 2) AS value_7d,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                                AND CURRENT ROW) AS n_events_7d
FROM events
""",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a time interval (reference:
    ``models/spark/search/success_by_relevance/search_success_aggregated.sql:81-90``,
    RANGE BETWEEN INTERVAL 27 DAYS PRECEDING). The DataFrame API can't express
    interval ranges, so this stays in SQL-text form (SURVEY.md §7)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                                                AND CURRENT ROW), 2) AS value_7d,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                                        AND CURRENT ROW) AS n_events_7d
        FROM events
        """
    )


@query(
    "window_retention_flags",
    oracle="""
WITH daily AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), numbered AS (
    SELECT user_id, day,
           CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num
    FROM daily
)
SELECT user_id, day,
       CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY day_num
                                RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) > 0
            THEN 1 ELSE 0 END AS rd1,
       CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY day_num
                                RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING) > 0
            THEN 1 ELSE 0 END AS rw1,
       CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY day_num
                                RANGE BETWEEN 8 FOLLOWING AND 14 FOLLOWING) > 0
            THEN 1 ELSE 0 END AS rw2
FROM numbered
""",
)
def window_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention flags via RANGE + FOLLOWING buckets over UNIX_DATE
    (reference rd1/rw1/rw2 flags,
    ``macros/gold_active_users_and_devices_with_ephemeral.sql:256-315``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    numbered = daily.withColumn("day_num", F.unix_date(F.col("day")).cast("long"))
    base = Window.partitionBy("user_id").orderBy("day_num")

    def active_in(lo: int, hi: int):
        return (
            F.when(F.count(F.lit(1)).over(base.rangeBetween(lo, hi)) > 0, 1)
            .otherwise(0)
        )

    return numbered.select(
        "user_id",
        "day",
        active_in(1, 1).alias("rd1"),
        active_in(1, 7).alias("rw1"),
        active_in(8, 14).alias("rw2"),
    )


@query(
    "window_sessionization",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id
                                                           ORDER BY ts, event_id))
                     > 3600000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
), sessions AS (
    SELECT user_id, ts, event_id, value,
           CAST(SUM(is_new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
               AS session_seq
    FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_seq
""",
)
def window_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: LAG → new-session flag → running SUM
    → session aggregate (reference
    ``models/spark/b2b_mart/ss/ss_events_by_session.sql:95-134``). 1h gap."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "is_new_session",
        F.when(
            prev_ts.isNull()
            | ((F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts)) > 3600000),
            1,
        ).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_seq", F.sum("is_new_session").over(run)
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list,
    n_buckets: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global NTILE without a single-partition sort.

    A bare ``NTILE(k) OVER (ORDER BY ...)`` moves the whole relation to ONE
    partition — the classic 100 TB scale-killer. This computes the identical
    bucket assignment distributed:

    1. ``repartitionByRange`` on the order keys (the same distributed range
       shuffle a global ``ORDER BY`` uses — TeraSort-scalable);
    2. per-partition ``ROW_NUMBER`` (partitioned window, bounded state);
    3. per-partition counts → prefix-sum offsets (tiny: one row per
       partition) broadcast back, giving each row its exact global rank;
    4. SQL NTILE's bucket formula from (rank, n): the first ``n % k``
       buckets get ``n div k + 1`` rows, the rest ``n div k``.

    Range boundaries come from sampling, but the global rank is exact and
    deterministic for any boundary placement (ranges are ordered and
    disjoint; make the order key unique with a tie-break column, as NTILE
    determinism demands anyway).
    """
    spark = df.sparkSession
    nparts = int(
        num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(nparts, *order_cols)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    # localCheckpoint, not persist (r6 ADVICE #4, same leak as
    # distributed_cumsum): the ranked relation feeds both the output rows
    # and the per-partition counts; without materialization each branch
    # re-scans AND re-range-shuffles the input (the branches prune
    # different columns, so AQE can't reuse the exchange), and a bare
    # persist leaked session-lifetime cache blocks while leaving __pid
    # re-derivable on eviction+recompute. Checkpoint freezes the pids and
    # lets the ContextCleaner reclaim the blocks.
    local = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(w_local))
        .localCheckpoint(eager=False)
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # Prefix sums over the per-partition counts: one row per range
    # partition, so a single-partition window is O(num_partitions). The
    # partition key must be non-foldable (a plain literal is folded away
    # and Spark warns "No Partition Defined"; __pid IS NOT NULL folds too
    # since spark_partition_id() is non-nullable): __pid % 1 is constant 0
    # but survives as a partition spec.
    one = F.col("__pid") % F.lit(1)
    w_cum = (
        Window.partitionBy(one)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(one).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "__pid",
        (F.sum("__cnt").over(w_cum) - F.col("__cnt")).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    rank = F.col("__lrn") + F.col("__off")
    n, k = F.col("__n"), F.lit(n_buckets)
    base, extra = (n / k).cast("long"), n % k
    cut = extra * (base + F.lit(1))
    bucket = F.when(
        rank <= cut, ((rank - 1) / (base + 1)).cast("long") + 1
    ).otherwise(
        # base can only be 0 when n < k, and then every rank <= cut = n,
        # so this branch never divides by it — but guard for ANSI mode.
        extra + ((rank - cut - 1) / F.greatest(base, F.lit(1))).cast("long") + 1
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__lrn", "__off", "__n")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
    _keep_pid: bool = False,
) -> DataFrame:
    """Exact global running sum without a single-partition sort — the
    cumulative twin of :func:`exact_ntile`, same TeraSort shape:

    1. ``repartitionByRange`` on the order keys (distributed range
       shuffle);
    2. per-partition cumulative sum (partitioned window, bounded state);
    3. per-partition totals → prefix-sum offsets (one row per partition)
       broadcast back; each row's global running sum = local cumsum +
       its partition's offset.

    A bare ``SUM(x) OVER (ORDER BY ...)`` moves the whole relation to ONE
    partition; this keeps the identical result (order keys must be unique
    — add a tie-break — for the window to be deterministic at all) while
    every stage stays partition-parallel."""
    spark = df.sparkSession
    nparts = int(
        num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(nparts, *order_cols)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # localCheckpoint, not persist (r6 ADVICE #4): a bare persist leaked
    # cached blocks for the session (nothing ever unpersisted it), and a
    # cache eviction + recompute was the one path where spark_partition_id
    # could be re-derived differently between the local-cumsum pass and
    # the offsets pass. Checkpoint MATERIALIZES the ranged partitioning —
    # pids are frozen, blocks are reclaimed by the ContextCleaner when the
    # result goes out of scope.
    local = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lcs", F.sum(val_col).over(w_local))
        .localCheckpoint(eager=False)
    )
    # one row per range partition; non-foldable constant partition key
    # (see exact_ntile) keeps the tiny prefix-sum window warning-free
    one = F.col("__pid") % F.lit(1)
    w_cum = (
        Window.partitionBy(one)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs = (
        local.groupBy("__pid")
        .agg(F.sum(val_col).alias("__s"))
        .select(
            "__pid", (F.sum("__s").over(w_cum) - F.col("__s")).alias("__off")
        )
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__lcs") + F.col("__off"))
        .drop(*([] if _keep_pid else ["__pid"]), "__lcs", "__off")
    )


@query(
    "window_exact_ntile_distributed",
    oracle="""
SELECT quartile,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey
FROM (
    SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
)
GROUP BY quartile
""",
)
def window_exact_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact NTILE (see ``exact_ntile``): bucket assignment is
    bit-identical to SQL ``NTILE(4) OVER (ORDER BY ...)`` — the oracle IS
    the plain NTILE — but the plan has no single-partition sort: a range
    shuffle + partitioned windows + a broadcast of per-partition offsets.
    The primitive behind scale-safe quantile segmentation
    (``segment_rfm_quartiles``)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    bucketed = exact_ntile(
        o.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        4,
        "quartile",
    )
    return bucketed.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.min("o_orderkey").cast("long").alias("min_orderkey"),
    )


@query(
    "window_rank_parts_by_price",
    oracle="""
SELECT p_partkey, p_type,
       RANK()       OVER (PARTITION BY p_type ORDER BY p_retailprice DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC) AS price_dense_rank,
       NTILE(4)     OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS price_quartile
FROM part
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE within groups."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    w = Window.partitionBy("p_type").orderBy(F.col("p_retailprice").desc())
    wt = Window.partitionBy("p_type").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        "p_type",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("price_quartile"),
    )


@query(
    "window_nested_agg_share",
    oracle="""
SELECT o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       ROUND(SUM(o_totalprice) / SUM(SUM(o_totalprice)) OVER (), 6) AS revenue_share
FROM orders
GROUP BY o_orderpriority
""",
)
def window_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregate-in-window SUM(SUM(x)) OVER () (reference
    ``macros/gold_active_users_and_devices_with_ephemeral.sql:81-82``).
    Kept in SQL form — Spark SQL supports the nesting directly."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               ROUND(SUM(o_totalprice) / SUM(SUM(o_totalprice)) OVER (), 6)
                   AS revenue_share
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "window_cumulative_distinct_users",
    oracle="""
WITH first_seen AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
    FROM events GROUP BY user_id
), new_per_day AS (
    SELECT first_day AS day, COUNT(*) AS n_new FROM first_seen GROUP BY 1
), spine AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
)
SELECT s.day,
       COALESCE(n.n_new, 0) AS n_new_users,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY s.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
FROM spine s LEFT JOIN new_per_day n ON n.day = s.day
""",
)
def window_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve query that is
    NOT expressible as COUNT(DISTINCT) OVER a running frame (Spark and
    most engines reject distinct aggregates in windows, and the naive
    re-scan per day is O(days × events)). The rewrite: distinct-ness is
    equivalent to "counted once, on the user's FIRST day", so two
    map-side-combined aggregates (first-seen per user, new-users per day)
    plus a running sum over the DAYS spine give the exact curve.

    Scale: shuffles are keyed on user then day; the only ordered pass is
    over the day spine (calendar-sized). This is the canonical example of
    restating a quadratic window as a linear aggregate."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    first_seen = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_per_day = first_seen.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    spine = ev.select(F.to_date("ts").alias("day")).distinct()
    joined = spine.join(new_per_day, "day", "left").select(
        "day", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new_users")
    )
    # bounded: one row per distinct calendar day (post-agg spine)
    w = Window.partitionBy(F.col("day").isNotNull()).orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cumulative_users"),
    )


@query(
    "window_rolling_regression_slope",
    oracle="""
WITH o AS (
    SELECT o_custkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS DOUBLE)
               AS x,
           CAST(o_totalprice AS DOUBLE) AS y,
           o_orderdate, o_orderkey
    FROM orders
), wins AS (
    SELECT o_custkey, o_orderdate, o_orderkey,
           COUNT(*) OVER w AS n,
           SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
           SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 180 DAYS PRECEDING AND CURRENT ROW)
)
SELECT o_custkey,
       CAST(n AS BIGINT) AS n_orders_180d,
       ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 4)
           AS slope_per_day
FROM wins
WHERE rn = 1 AND n >= 3
""",
)
def window_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ordinary-least-squares TREND per customer: the OLS slope
    of order value vs time over each customer's trailing 180-day RANGE
    window, reported at their latest order for customers with ≥3 orders
    in the window — the spend-trajectory feature churn/LTV models
    consume.

    Scale — regression BY WINDOW FRAME without refitting: the slope
    needs only the frame's sufficient statistics (n, Σx, Σy, Σxy, Σx²),
    each a built-in SUM over the same RANGE frame, so Spark computes all
    five in ONE window pass with bounded per-customer state — no
    per-frame refit, no self-join of each order against its trailing
    window (the O(n·w) shape this replaces). One shuffle on o_custkey
    shared by both the frame and the latest-row ranking. x is integer
    days since epoch-anchor and y money, so the frame sums stay exact in
    doubles; the slope rounds at 4 decimals."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    days = lambda n: n * 86400  # RANGE on a timestamp orders by seconds
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-days(180), 0)
    )
    w_last = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    x, y = F.col("x"), F.col("y")
    wins = o.select(
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * y).over(w).alias("sxy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.row_number().over(w_last).alias("rn"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    return wins.filter((F.col("rn") == 1) & (n >= 3)).select(
        "o_custkey",
        n.cast("long").alias("n_orders_180d"),
        F.round(
            (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0)), 4
        ).alias("slope_per_day"),
    )
