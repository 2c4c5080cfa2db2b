"""Time-series repair and smoothing over the events table: date-spine
gap fill with LOCF + linear interpolation, and exponentially-weighted
moving averages — the daily-mart shapes the reference's models build by
hand with spines and window SQL (date-spine EXPLODE(SEQUENCE) is already
a §2.8 gate; this family adds the REPAIR semantics on top).

Scale notes: every op is (partition key = series id) windows over
day-grain aggregates — the window input is |series| × |days|, already
reduced by a map-side-combined daily rollup, so partitions stay small at
any corpus size; no driver loops, no UDFs.

Determinism: daily sums use DECIMAL(18,6) (associative, engine-neutral);
derived doubles are quantized with ROUND(.., 4) on both engines (see
memory note on order-dependent double sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

# deterministic artificial gaps: drop day-of-month % 7 ∈ {2, 5} from the
# observed set, then prove the repair restores a dense spine
_GAP_SQL = "EXTRACT(DAY FROM day) % 7 IN (2, 5)"


@query(
    "timeseries_gap_fill_locf_interp",
    oracle=f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18, 6))) AS observed
    FROM events
    GROUP BY 1, 2
), observed AS (
    SELECT * FROM daily WHERE NOT ({_GAP_SQL})
), bounds AS (
    SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
    FROM observed GROUP BY 1
), spine AS (
    SELECT event_type,
           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
), joined AS (
    SELECT s.event_type, s.day, o.observed
    FROM spine s LEFT JOIN observed o
      ON o.event_type = s.event_type AND o.day = s.day
), anno AS (
    SELECT event_type, day, observed,
           LAST_VALUE(observed IGNORE NULLS) OVER w_back AS locf,
           LAST_VALUE(CASE WHEN observed IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_back AS prev_day,
           FIRST_VALUE(observed IGNORE NULLS) OVER w_fwd AS next_val,
           FIRST_VALUE(CASE WHEN observed IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_fwd AS next_day
    FROM joined
    WINDOW w_back AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_fwd AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       (observed IS NULL) AS is_gap,
       CAST(ROUND(COALESCE(locf, next_val), 4) AS DOUBLE) AS filled_locf,
       CAST(ROUND(
           CASE
               WHEN observed IS NOT NULL THEN CAST(observed AS DOUBLE)
               WHEN locf IS NOT NULL AND next_val IS NOT NULL
                    AND prev_day <> next_day THEN
                   CAST(locf AS DOUBLE)
                   + (CAST(next_val AS DOUBLE) - CAST(locf AS DOUBLE))
                     * (day - prev_day) / (next_day - prev_day)
               ELSE CAST(COALESCE(locf, next_val) AS DOUBLE)
           END, 4) AS DOUBLE) AS filled_interp
FROM anno
""",
)
def timeseries_gap_fill_locf_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair on a daily series: build the complete per-series date
    spine (EXPLODE(SEQUENCE) from aggregated bounds — rows ∝ series ×
    days, tiny), left-join the observations, then repair with (a) LOCF
    (last observation carried forward, the SCD/sensor default) and (b)
    linear interpolation between the bracketing observations — both as
    IGNORE-NULLS window functions, no self-join, no driver loop.

    The gaps are injected deterministically (day-of-month % 7 ∈ {2,5})
    so the oracle can verify repair values, not just shape. At 100 TB
    the window partitions by series id — per-partition size is the day
    count, constant in corpus size; the daily rollup above it is the
    only data-sized shuffle."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("observed"))
        .filter(~(F.dayofmonth("day") % 7).isin(2, 5))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("observed").isNotNull(), F.col("day"))
    anno = joined.select(
        "event_type",
        "day",
        "observed",
        F.last("observed", ignorenulls=True).over(w_back).alias("locf"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("observed", ignorenulls=True).over(w_fwd).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    locf_d = F.col("locf").cast("double")
    next_d = F.col("next_val").cast("double")
    interp = (
        F.when(F.col("observed").isNotNull(), F.col("observed").cast("double"))
        .when(
            F.col("locf").isNotNull()
            & F.col("next_val").isNotNull()
            & (F.col("prev_day") != F.col("next_day")),
            locf_d
            + (next_d - locf_d)
            * F.datediff("day", "prev_day")
            / F.datediff("next_day", "prev_day"),
        )
        .otherwise(F.coalesce(locf_d, next_d))
    )
    return anno.select(
        "event_type",
        "day",
        F.col("observed").isNull().alias("is_gap"),
        F.round(F.coalesce(F.col("locf"), F.col("next_val")), 4)
        .cast("double")
        .alias("filled_locf"),
        F.round(interp, 4).cast("double").alias("filled_interp"),
    )


_ALPHA = 0.2  # smoothing factor; r = 1 - alpha


@query(
    "timeseries_ewma_daily",
    oracle=f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18, 6))) AS x
    FROM events
    GROUP BY 1, 2
), idx AS (
    SELECT event_type, day, CAST(x AS DOUBLE) AS x,
           day - MIN(day) OVER (PARTITION BY event_type) AS i
    FROM daily
), parts AS (
    SELECT event_type, day, x,
           SUM(x * POW({1 - _ALPHA}, -i)) OVER w AS num,
           SUM(POW({1 - _ALPHA}, -i)) OVER w AS den
    FROM idx
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CAST(ROUND(x, 4) AS DOUBLE) AS daily_value,
       CAST(ROUND(num / den, 4) AS DOUBLE) AS ewma
FROM parts
""",
)
def timeseries_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted EWMA (pandas ``adjust=True`` form, α=0.2):
    ewma_t = Σ_{{i≤t}} (1-α)^(t-i) x_i / Σ (1-α)^(t-i).  The recursive
    definition becomes ONE running-sum window via the factorization
    (1-α)^(t-i) = (1-α)^t · (1-α)^(-i): the (1-α)^t factor cancels in
    the num/den ratio, leaving two cumulative sums of row-local terms —
    no recursion, no driver loop, no per-row dependency chain.

    The exponent i is the per-series day offset (≤ the series length, 30
    here), so (1-α)^(-i) stays well inside double range; for years-long
    series the production variant restarts the index per month-chunk and
    carries a per-chunk scale — same algebra, documented here."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    w_all = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        F.col("x").cast("double").alias("x"),
        F.datediff("day", F.min("day").over(w_all)).alias("i"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = 1 - _ALPHA
    parts = idx.select(
        "event_type",
        "day",
        "x",
        F.sum(F.col("x") * F.pow(F.lit(r), -F.col("i"))).over(w).alias("num"),
        F.sum(F.pow(F.lit(r), -F.col("i"))).over(w).alias("den"),
    )
    return parts.select(
        "event_type",
        "day",
        F.round("x", 4).cast("double").alias("daily_value"),
        F.round(F.col("num") / F.col("den"), 4).cast("double").alias("ewma"),
    )
