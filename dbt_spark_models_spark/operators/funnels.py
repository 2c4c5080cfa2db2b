"""Funnel + anomaly-detection patterns.

Reference sites: conversion funnels with INTERVAL windows
(``models/spark/onfy/conversion_funnel.sql:14-120`` — steps must happen
within ``source_dt + INTERVAL 30 days``), anomaly-detection models
(``models/spark/anomaly_detection/gmv_initial_for_sop.sql`` — the engine
computes the statistical part; Prophet forecasting is external meta).

Scale notes: funnels are per-user MIN-aggregates + conditional joins —
one shuffle on user_id; the z-score anomaly pass is a tiny second
aggregate over the daily rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables


@query(
    "funnel_signup_view_purchase",
    oracle="""
WITH signup AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY user_id
), step_view AS (
    SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_view_ts
    FROM signup s
    JOIN events e ON e.user_id = s.user_id
     AND e.event_type = 'view'
     AND e.ts >= s.signup_ts
     AND e.ts < s.signup_ts + INTERVAL 7 DAY
    GROUP BY s.user_id, s.signup_ts
), step_purchase AS (
    SELECT v.user_id, MIN(e.ts) AS first_purchase_ts
    FROM step_view v
    JOIN events e ON e.user_id = v.user_id
     AND e.event_type = 'purchase'
     AND e.ts >= v.first_view_ts
     AND e.ts < v.signup_ts + INTERVAL 7 DAY
    GROUP BY v.user_id
)
SELECT (SELECT COUNT(*) FROM signup) AS n_signup,
       (SELECT COUNT(*) FROM step_view) AS n_viewed,
       (SELECT COUNT(*) FROM step_purchase) AS n_purchased,
       ROUND((SELECT COUNT(*) FROM step_view)
             / (SELECT COUNT(*) FROM signup), 4) AS view_rate,
       ROUND((SELECT COUNT(*) FROM step_purchase)
             / (SELECT COUNT(*) FROM signup), 4) AS purchase_rate
""",
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step conversion funnel inside a 7-day window from signup
    (reference ``conversion_funnel.sql`` shape): each step must follow the
    previous one in time and stay inside the window."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    window = F.expr("INTERVAL 7 DAY")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"), F.col("ts").alias("v_ts")
    )
    step_view = (
        signup.join(
            views,
            (F.col("v_uid") == F.col("user_id"))
            & (F.col("v_ts") >= F.col("signup_ts"))
            & (F.col("v_ts") < F.col("signup_ts") + window),
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("v_ts").alias("first_view_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    step_purchase = (
        step_view.join(
            purchases,
            (F.col("p_uid") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("first_view_ts"))
            & (F.col("p_ts") < F.col("signup_ts") + window),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    counts = (
        signup.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(step_view.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(step_purchase.agg(F.count(F.lit(1)).alias("n_purchased")))
    )
    return counts.select(
        "n_signup",
        "n_viewed",
        "n_purchased",
        F.round(F.col("n_viewed") / F.col("n_signup"), 4).alias("view_rate"),
        F.round(F.col("n_purchased") / F.col("n_signup"), 4).alias(
            "purchase_rate"
        ),
    )


@query(
    "anomaly_zscore_daily_counts",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY day, event_type
), stats AS (
    SELECT event_type,
           AVG(n) AS mean_n,
           STDDEV_SAMP(n) AS sd_n
    FROM daily GROUP BY event_type
)
SELECT d.day, d.event_type, d.n,
       ROUND((d.n - s.mean_n) / s.sd_n, 4) AS zscore,
       CASE WHEN ABS((d.n - s.mean_n) / s.sd_n) > 2 THEN 1 ELSE 0 END
           AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flags over the daily metric rollup (the statistical
    core of the reference's anomaly_detection family)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("n").alias("mean_n"), F.stddev_samp("n").alias("sd_n")
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd_n")
    return (
        daily.join(F.broadcast(stats), F.col("event_type") == F.col("et"))
        .select(
            "day",
            "event_type",
            "n",
            F.round(z, 4).alias("zscore"),
            F.when(F.abs(z) > 2, 1).otherwise(0).alias("is_anomaly"),
        )
    )


@query(
    "anomaly_seasonal_residuals",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           dayofweek(CAST(ts AS DATE)) AS dow,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2, 3
), scored AS (
    SELECT event_type, day, n,
           AVG(n) OVER (PARTITION BY event_type, dow) AS dow_mean,
           STDDEV_SAMP(n) OVER (PARTITION BY event_type) AS sd
    FROM daily
)
SELECT event_type, day, n,
       ROUND(dow_mean, 4) AS dow_mean,
       ROUND(n - dow_mean, 4) AS residual,
       ABS(n - dow_mean) > 2 * sd AS is_anomaly
FROM scored
""",
)
def anomaly_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly detection (the engine-side analog of the
    reference's Prophet ``predictor_*`` meta,
    ``models/spark/anomaly_detection/gmv_initial_for_sop.sql:8-16``):
    predict each (event_type, day) count by its day-of-week mean, flag
    residuals beyond 2σ of the type's count distribution. Two windows
    over a tiny daily-rollup table — the raw stream is reduced by one
    map-side-combined groupBy first, so window state is bounded by
    (types × days), not events."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        )
        .groupBy("event_type", "day", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_dow = Window.partitionBy("event_type", "dow")
    w_type = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(w_dow).alias("dow_mean"),
        F.stddev_samp("n").over(w_type).alias("sd"),
    )
    return scored.select(
        "event_type",
        "day",
        "n",
        F.round("dow_mean", 4).alias("dow_mean"),
        F.round(F.col("n") - F.col("dow_mean"), 4).alias("residual"),
        (F.abs(F.col("n") - F.col("dow_mean")) > 2 * F.col("sd")).alias(
            "is_anomaly"
        ),
    )


@query(
    "cohort_retention_matrix",
    oracle="""
WITH user_months AS (
    SELECT user_id, CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS m
    FROM events GROUP BY 1, 2
), firsts AS (
    SELECT user_id, MIN(m) AS cohort FROM user_months GROUP BY 1
), joined AS (
    SELECT f.cohort, datediff('day', f.cohort, um.m) // 7 AS week_offset,
           um.user_id
    FROM user_months um JOIN firsts f ON um.user_id = f.user_id
), sizes AS (
    SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
)
SELECT j.cohort AS cohort_week, j.week_offset,
       COUNT(DISTINCT j.user_id) AS n_active,
       s.cohort_size,
       ROUND(COUNT(DISTINCT j.user_id) / s.cohort_size, 4) AS retention
FROM joined j JOIN sizes s ON s.cohort = j.cohort
GROUP BY 1, 2, s.cohort_size
""",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the aggregate twin of the per-user
    retention flags (reference family:
    ``macros/gold_active_users_and_devices_with_ephemeral.sql:256-315``):
    users bucketed by first-active week, retention = share of the cohort
    active at each week offset (weekly grain because the synthetic event
    stream spans ~1 month; the month version is the same plan with a
    different trunc unit).

    Scale: raw events collapse to distinct (user, month) first — one
    map-side-combined groupBy whose output is bounded by users × months,
    not events; everything after runs on that reduced table. The firsts
    table re-joins by user (same shuffle key, co-partitioned)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    user_months = (
        ev.select(
            "user_id",
            F.trunc(F.col("ts").cast("date"), "week").alias("m"),
        )
        .distinct()
    )
    firsts = user_months.groupBy("user_id").agg(F.min("m").alias("cohort"))
    joined = user_months.join(firsts, "user_id").select(
        "cohort",
        (F.datediff(F.col("m"), F.col("cohort")) / 7).cast("long").alias(
            "week_offset"
        ),
        "user_id",
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        joined.groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(sizes, "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
    )


@query(
    "session_conversion_rates",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_type,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id, ts, event_type,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
    FROM flagged
), per_session AS (
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
    FROM sessions GROUP BY user_id, session_seq
)
SELECT LEAST(n_events, 5) AS length_band,
       COUNT(*) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       ROUND(SUM(converted) / COUNT(*), 4) AS conversion_rate
FROM per_session
GROUP BY LEAST(n_events, 5)
""",
)
def session_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion attribution: batch gaps-and-islands
    sessionization (reference
    ``models/spark/b2b_mart/ss/ss_events_by_session.sql:95-134``) composed
    with a per-session conversion flag, rolled up to conversion rate by
    session-length band (clamped at 5+).

    Scale: both windows partition by user_id (high cardinality); the
    session rollup shuffles on (user, session) and the final band
    aggregate on ≤5 keys — events never shuffle unkeyed."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            # µs arithmetic: casting to whole seconds truncates and flips
            # sessions whose gap straddles the 30-min boundary sub-second
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_seq", F.sum("is_new").over(w_run))
    per_session = sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return per_session.groupBy(
        F.least(F.col("n_events"), F.lit(5)).alias("length_band")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 4).alias(
            "conversion_rate"
        ),
    )


@query(
    "anomaly_robust_mad_daily_counts",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY day, event_type
), med AS (
    SELECT event_type, MEDIAN(n) AS med_n FROM daily GROUP BY event_type
), mad AS (
    SELECT d.event_type, MEDIAN(ABS(d.n - m.med_n)) AS mad_n
    FROM daily d JOIN med m ON d.event_type = m.event_type
    GROUP BY d.event_type
)
SELECT d.day, d.event_type, d.n,
       CASE WHEN mad.mad_n = 0 THEN NULL
            ELSE ROUND(0.6745 * (d.n - m.med_n) / mad.mad_n, 4) END
           AS robust_z,
       CASE WHEN mad.mad_n <> 0
                 AND ABS(0.6745 * (d.n - m.med_n) / mad.mad_n) > 3.5
            THEN 1 ELSE 0 END AS is_anomaly
FROM daily d
JOIN med m ON d.event_type = m.event_type
JOIN mad ON d.event_type = mad.event_type
""",
)
def anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly flags — the outlier-resistant variant
    of the z-score detector: a single wild day cannot shift the median or
    the MAD, so real spikes stand out where mean/stddev would be dragged
    toward them (the Iglewicz-Hoaglin modified z-score, |z| > 3.5).

    Scale: two keyed aggregates over the (days x event_types)-sized
    rollup plus broadcast re-joins — the rollup, not the fact table, pays
    the exact medians."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy(F.col("event_type").alias("et1")).agg(
        F.expr("percentile(n, 0.5)").alias("med_n")
    )
    with_med = daily.join(
        F.broadcast(med), F.col("event_type") == F.col("et1")
    )
    mad = with_med.groupBy(F.col("event_type").alias("et2")).agg(
        F.expr("percentile(abs(n - med_n), 0.5)").alias("mad_n")
    )
    z = 0.6745 * (F.col("n") - F.col("med_n")) / F.col("mad_n")
    return (
        with_med.join(F.broadcast(mad), F.col("event_type") == F.col("et2"))
        .select(
            "day",
            "event_type",
            "n",
            F.when(F.col("mad_n") == 0, F.lit(None)).otherwise(
                F.round(z, 4)
            ).alias("robust_z"),
            F.when((F.col("mad_n") != 0) & (F.abs(z) > 3.5), 1)
            .otherwise(0)
            .alias("is_anomaly"),
        )
    )


@query(
    "funnel_path_regex_match",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_seq
    FROM flagged
), paths AS (
    SELECT user_id, session_seq,
           string_agg(CASE event_type WHEN 'signup' THEN 'S'
                                      WHEN 'view' THEN 'V'
                                      WHEN 'click' THEN 'C'
                                      WHEN 'purchase' THEN 'P'
                                      ELSE 'E' END, '' ORDER BY ts, event_id)
               AS path,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_seq
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, path,
       CAST(n_events AS BIGINT) AS n_events,
       regexp_matches(path, 'V.*P') AS browsed_then_bought,
       regexp_matches(path, '^[^P]*E[^P]*$') AS errored_never_bought
FROM paths
WHERE regexp_matches(path, 'V.*P') OR regexp_matches(path, '^[^P]*E[^P]*$')
""",
)
def funnel_path_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-equivalent path analysis without the operator Spark
    lacks: sessionize (30-min gaps), encode each session's ordered event
    types as a compact path string, then run PATTERN REGEXES over the
    paths — 'V.*P' (browsed then bought) and '^[^P]*E[^P]*$' (hit an
    error and never purchased). This covers the row-pattern-matching
    family (Trino/Flink MATCH_RECOGNIZE, funnel path analysis) with two
    portable primitives: gaps-and-islands + ordered string aggregation.

    Scale: both windows and the path aggregation partition by user_id
    (bounded per-user state); the regex scan is row-local over one
    compact string per session — at 100 TB the paths table is ~1000×
    smaller than the event log, and any new pattern is a regex change,
    not a new shuffle."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            # exact micros, not cast("long") (whole-second truncation flips
            # gaps within 1s of the boundary vs the oracle's INTERVAL math)
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                >= 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    letter = (
        F.when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("E")
    )
    paths = (
        sess.withColumn("sym", letter)
        .groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id, sym))),"
                    " s -> s.sym)"
                ),
                "",
            ).alias("path"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = paths.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "path",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("path").rlike("V.*P").alias("browsed_then_bought"),
        F.col("path").rlike("^[^P]*E[^P]*$").alias("errored_never_bought"),
    )
    return out.filter(
        F.col("browsed_then_bought") | F.col("errored_never_bought")
    )


@query(
    "funnel_attribution_models",
    oracle="""
WITH purchases AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
), touches AS (
    SELECT p.p_id, e.event_type AS touch_type, e.ts AS t_ts, e.event_id AS t_id
    FROM purchases p
    JOIN events e ON e.user_id = p.user_id
     AND e.event_type IN ('view', 'click')
     AND e.ts < p.p_ts
     AND e.ts >= p.p_ts - INTERVAL 7 DAY
), sized AS (
    SELECT *,
           COUNT(*) OVER (PARTITION BY p_id) AS n_touches,
           ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rk_first,
           ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC) AS rk_last
    FROM touches
)
SELECT touch_type,
       COUNT(*) AS n_touches,
       CAST(SUM(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS first_touch_wins,
       CAST(SUM(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS last_touch_wins,
       ROUND(SUM(1.0 / n_touches), 4) AS linear_credit
FROM sized
GROUP BY touch_type
""",
)
def funnel_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over the marketing-touch → purchase graph:
    for every purchase, credit the view/click touches of the same user in
    the prior 7 days under the three standard models at once —
    first-touch (earliest touch takes the conversion), last-touch
    (latest), and linear (1/n per touch). Ties break on event_id so every
    model is deterministic. The reference's session-attribution marts
    (``models/spark/b2b_mart/ss/ss_events_by_session.sql:95-134`` ordering
    events inside sessions) are this shape with sessions for windows.

    Plan (r11, guide §2.3 "aggregate before you shuffle"): the
    purchase⨝touch join is keyed on user_id (equi) with the time window
    as a residual predicate — per-user event lists are short, so the
    join output is bounded. The former per-purchase windows (two
    ROW_NUMBER sorts + a COUNT frame over an exchange keyed p_id) are
    now ONE ordinary aggregate keyed p_id: MIN_BY/MAX_BY over
    (t_ts, t_id) pick the first/last touch (identical tie-breaks to the
    ROW_NUMBER orderings), and the per-type counts are conditional sums.
    Every touch row of a purchase shares the purchase's user, so the
    join output already co-locates each p_id inside one task and the
    partial (map-side) aggregation collapses the exchange to ONE ROW PER
    PURCHASE — the windows shipped and sorted every touch row. linear
    credit per type becomes cnt_type·(1/n) per purchase instead of
    1/n summed cnt_type times — a ~1e-16 float-association difference,
    the same class of cross-engine summation-order drift the ROUND(.,4)
    oracle contract already absorbs. No global window, no cross join."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_uid") == F.col("p_uid"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    )
    order_key = F.struct(F.col("t_ts"), F.col("t_id"))
    per_p = joined.groupBy("p_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("touch_type") == "view", 1).otherwise(0)).alias(
            "n_view"
        ),
        F.min_by("touch_type", order_key).alias("first_type"),
        F.max_by("touch_type", order_key).alias("last_type"),
    )
    # unpivot the two touch types (a type contributes rows to the oracle's
    # GROUP BY touch_type only where it has >= 1 touch for the purchase)
    stacked = per_p.select(
        "n",
        "first_type",
        "last_type",
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("t"), F.col("n_view").alias("cnt")
                ),
                F.struct(
                    F.lit("click").alias("t"),
                    (F.col("n") - F.col("n_view")).alias("cnt"),
                ),
            )
        ).alias("x"),
    ).select("n", "first_type", "last_type", "x.t", "x.cnt")
    return (
        stacked.filter(F.col("cnt") > 0)
        .groupBy(F.col("t").alias("touch_type"))
        .agg(
            F.sum("cnt").alias("n_touches"),
            F.sum(
                F.when(F.col("first_type") == F.col("t"), 1).otherwise(0)
            ).alias("first_touch_wins"),
            F.sum(
                F.when(F.col("last_type") == F.col("t"), 1).otherwise(0)
            ).alias("last_touch_wins"),
            F.round(F.sum(F.col("cnt") / F.col("n")), 4).alias(
                "linear_credit"
            ),
        )
    )


@query(
    "window_interval_coverage",
    oracle="""
WITH iv AS (
    SELECT user_id,
           epoch_ms(ts) AS s_ms,
           epoch_ms(ts) + 1800000 AS e_ms,
           event_id
    FROM events
), flagged AS (
    SELECT user_id, s_ms, e_ms,
           CASE WHEN MAX(e_ms) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR s_ms > MAX(e_ms) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island,
           event_id
    FROM iv
), islands AS (
    SELECT user_id, s_ms, e_ms,
           SUM(new_island) OVER (PARTITION BY user_id ORDER BY s_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
    FROM flagged
), merged AS (
    SELECT user_id, island_id, MIN(s_ms) AS start_ms, MAX(e_ms) AS end_ms
    FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       COUNT(*) AS n_islands,
       CAST(SUM(end_ms - start_ms) / 1000.0 AS DOUBLE) AS covered_sec
FROM merged GROUP BY user_id
""",
)
def window_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union / coverage (merge overlapping intervals): each event
    opens a 30-minute activity interval; per user, merge the overlapping
    intervals into islands and report island count + total covered
    seconds. The canonical gaps-and-islands generalization the reference's
    sessionization (``ss_events_by_session.sql:95-134``) is a special case
    of — here the island rule is interval OVERLAP (running MAX of prior
    interval ends), not a fixed inactivity gap.

    Scale: all three window passes and the island aggregate share ONE
    partition key (user_id) — a single shuffle; per-user state is the
    running max end, O(1). Millisecond integer math end-to-end (no
    timestamp arithmetic), so the oracle is bit-exact.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    iv = ev.select(
        "user_id",
        F.unix_millis("ts").alias("s_ms"),
        (F.unix_millis("ts") + F.lit(1800000)).alias("e_ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s_ms", "event_id")
    prev_max_end = F.max("e_ms").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s_ms",
        "e_ms",
        F.when(
            prev_max_end.isNull() | (F.col("s_ms") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("new_island"),
        "event_id",
    )
    islands = flagged.select(
        "user_id",
        "s_ms",
        "e_ms",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s_ms").alias("start_ms"), F.max("e_ms").alias("end_ms")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        (F.sum(F.col("end_ms") - F.col("start_ms")) / 1000.0)
        .cast("double")
        .alias("covered_sec"),
    )


@query(
    "spine_forward_fill_daily",
    oracle="""
WITH obs AS (
    SELECT user_id, CAST(ts AS DATE) AS day, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events WHERE event_type = 'purchase'
), daily AS (
    SELECT user_id, day, value FROM obs WHERE rk = 1
), spine AS (
    SELECT u.user_id, g.day
    FROM (SELECT DISTINCT user_id FROM events) u,
         (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                             DATE '2024-01-30',
                                             INTERVAL 1 DAY)) AS DATE) AS day) g
)
SELECT s.user_id, s.day,
       last_value(d.value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value,
       CASE WHEN d.value IS NULL THEN 0 ELSE 1 END AS is_observed
FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
""",
)
def spine_forward_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-grid forward fill (last observation carried forward): the
    reference's ``*_daily_snapshot`` tables materialize "state as of each
    day" from sparse change events — this is that shape as one operator.
    Per user: the last purchase value of each day, left-joined onto a
    complete date spine (``EXPLODE(SEQUENCE(...))``, the reference's date
    spine idiom, ``models/spark/onfy/stock_monitoring.sql:16``), then
    LOCF via ``last(value, ignorenulls=True)`` over an unbounded-preceding
    frame.

    Scale: the spine explodes per-user (30 rows/user — no users×days
    cross join materialized on the driver); the dedup window, the spine
    join, and the fill window all key on user_id — one shuffle
    end-to-end. Carried state per user is one value. Values pass through
    untouched (no float math), so the oracle is bit-exact.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"), "value", "ts",
                "event_id")
        .withColumn("rk", F.row_number().over(w_day))
        .filter(F.col("rk") == 1)
        .select("user_id", "day", "value")
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-01-30").cast("date"),
                )
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("value", ignorenulls=True).over(w_fill).alias("filled_value"),
        F.when(F.col("value").isNull(), 0).otherwise(1).alias("is_observed"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
), deltas AS (
    SELECT user_id,
           date_diff('second', t_signup, t_purchase) AS sec_to_convert
    FROM firsts
    WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
      AND t_purchase >= t_signup
)
SELECT COUNT(*) AS n_converted,
       CAST(MIN(sec_to_convert) AS BIGINT) AS min_sec,
       ROUND(CAST(QUANTILE_CONT(sec_to_convert, 0.5) AS DOUBLE), 2) AS p50_sec,
       ROUND(CAST(QUANTILE_CONT(sec_to_convert, 0.9) AS DOUBLE), 2) AS p90_sec,
       CAST(MAX(sec_to_convert) AS BIGINT) AS max_sec
FROM deltas
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first signup → first purchase per
    user, then exact latency percentiles — the funnel-velocity readout
    that complements step-conversion rates
    (``funnel_signup_view_purchase``).

    Scale: ONE conditional-min aggregate per user computes both step
    timestamps in a single map-side-combined pass (no per-step self-join),
    then the percentile runs over the converted-user table (users-sized,
    not events-sized)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    deltas = firsts.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_signup")
        ).alias("sec_to_convert")
    )
    return deltas.groupBy().agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("sec_to_convert").cast("long").alias("min_sec"),
        F.round(F.percentile("sec_to_convert", F.lit(0.5)), 2).alias("p50_sec"),
        F.round(F.percentile("sec_to_convert", F.lit(0.9)), 2).alias("p90_sec"),
        F.max("sec_to_convert").cast("long").alias("max_sec"),
    )


@query(
    "funnel_markov_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), trans AS (
    SELECT event_type AS from_type,
           COALESCE(next_type, '<end>') AS to_type,
           COUNT(*) AS n
    FROM seq GROUP BY from_type, to_type
), tot AS (
    SELECT from_type, SUM(n) AS row_n FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       ROUND(t.n * 1.0 / tt.row_n, 6) AS p
FROM trans t JOIN tot tt USING (from_type)
""",
)
def funnel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys:
    P(next event type | current event type), with an explicit ``<end>``
    absorbing state for each user's final event — the drop-off map
    behind journey-flow (Sankey) dashboards and Markov-chain attribution
    (removal effects are computed from exactly this matrix).

    Scale: one user-keyed window (LEAD over the per-user ordered stream,
    bounded state: one row lookahead), then TWO map-side-combined
    groupBys onto the (from, to) key — the matrix is
    |event types|² ≤ a few hundred rows at any corpus size, and the
    row-normalization joins happen on that bounded table, not the
    events. The same user_id exchange the sessionization family already
    pays; no sort beyond the per-user window order."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = (
        seq.select(
            F.col("event_type").alias("from_type"),
            F.coalesce(F.col("next_type"), F.lit("<end>")).alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
    )


@query(
    "funnel_window_funnel_levels",
    oracle="""
WITH t1 AS (
    SELECT user_id, MIN(ts) AS ts1
    FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, MIN(e.ts) AS ts2
    FROM events e JOIN t1 ON t1.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.ts1
      AND e.ts <= t1.ts1 + INTERVAL 7 DAY
    GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, MIN(e.ts) AS ts3
    FROM events e JOIN t2 ON t2.user_id = e.user_id
    JOIN t1 ON t1.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      AND e.ts <= t1.ts1 + INTERVAL 7 DAY
    GROUP BY e.user_id
), levels AS (
    SELECT t1.user_id,
           CASE WHEN t3.user_id IS NOT NULL THEN 3
                WHEN t2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS level
    FROM t1
    LEFT JOIN t2 ON t2.user_id = t1.user_id
    LEFT JOIN t3 ON t3.user_id = t1.user_id
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS min_user_id
FROM levels GROUP BY level
""",
)
def funnel_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style ``windowFunnel(7 days)(view, click, purchase)``:
    per user, the deepest funnel step reached by STRICTLY ORDERED events
    inside a 7-day window anchored at the first step — the sequential
    conversion metric plain step-presence funnels
    (``funnel_signup_view_purchase``) can't express, because here each
    step must happen AFTER the previous one and inside the window.

    Scale — one exchange, zero self-joins: the chained "earliest step k
    after step k-1" times are nested window aggregates over the SAME
    user_id partitioning (t1 = min view ts; t2 = min click ts > t1
    within t1+7d, with t1 available to every row of the partition; t3
    likewise after t2) — Spark plans one hashpartitioning(user_id)
    exchange and three window passes over it. The oracle states the same
    chain as per-level keyed aggregates + joins, the relational
    equivalent. Level counts are a final map-side-combined groupBy on a
    3-value key."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w_user = Window.partitionBy("user_id")
    horizon = F.expr("INTERVAL 7 DAYS")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w_user)
    stage1 = ev.select("user_id", "event_type", "ts", t1.alias("ts1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("ts1"))
            & (F.col("ts") <= F.col("ts1") + horizon),
            F.col("ts"),
        )
    ).over(w_user)
    stage2 = stage1.select("user_id", "event_type", "ts", "ts1", t2.alias("ts2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("ts2"))
            & (F.col("ts") <= F.col("ts1") + horizon),
            F.col("ts"),
        )
    ).over(w_user)
    stage3 = stage2.select("user_id", "ts1", "ts2", t3.alias("ts3")).groupBy(
        "user_id"
    ).agg(
        F.max("ts1").alias("ts1"),
        F.max("ts2").alias("ts2"),
        F.max("ts3").alias("ts3"),
    )
    levels = stage3.filter(F.col("ts1").isNotNull()).select(
        "user_id",
        F.when(F.col("ts3").isNotNull(), 3)
        .when(F.col("ts2").isNotNull(), 2)
        .otherwise(1)
        .alias("level"),
    )
    return levels.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("user_id").cast("long").alias("min_user_id"),
    )
