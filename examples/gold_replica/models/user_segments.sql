{{
  config(
    materialized='table',
    schema='engagement',
    file_format='parquet',
    meta={'model_owner': '@analytics.duty', 'priority_weight': '150'}
  )
}}

-- Purchase-frequency segmentation with effective/next_effective validity
-- ranges, mirroring the reference's
-- models/spark/engagement/user_segments.sql:13-185 shape exactly:
-- COLLECT_SET window -> calculation-date UNION fan-out -> HOF
-- (FILTER/TRANSFORM/ARRAY_DISTINCT/CARDINALITY) trailing-window stats ->
-- nested-IF segment -> LAG/LEAD effective ranges -> per-stretch agg.
-- The reference's 3/6/12 MONTH windows map to 3/6/12 DAYS over the
-- 30-day gate corpus; '9999-12-31' is the same open-ended horizon.

WITH purchases AS (
    SELECT DISTINCT
        real_user_id,
        partition_date,
        MIN(partition_date) OVER (PARTITION BY real_user_id) AS day_join_msk,
        -- SORT_ARRAY for determinism: DISTINCT / UNION dedupe compares the
        -- array column, and COLLECT_SET order is unspecified
        SORT_ARRAY(COLLECT_SET(partition_date) OVER (PARTITION BY real_user_id)) AS partition_date_set
    FROM (
        SELECT real_user_id, order_date_msk AS partition_date
        FROM {{ ref('gold_orders') }}
        WHERE real_user_id IS NOT NULL
    )
),

calculation_dates AS (
    SELECT real_user_id, partition_date_set, day_join_msk AS partition_date_new
    FROM purchases
    UNION
    SELECT real_user_id, partition_date_set, partition_date AS partition_date_new
    FROM purchases
    UNION
    SELECT real_user_id, partition_date_set, partition_date + INTERVAL '3' DAY AS partition_date_new
    FROM purchases
    UNION
    SELECT real_user_id, partition_date_set, partition_date + INTERVAL '6' DAY AS partition_date_new
    FROM purchases
    UNION
    SELECT real_user_id, partition_date_set, partition_date + INTERVAL '12' DAY AS partition_date_new
    FROM purchases
),

purchase_stats AS (
    SELECT
        real_user_id,
        partition_date_new AS active_window_dt,
        CARDINALITY(ARRAY_DISTINCT(TRANSFORM(FILTER(
            partition_date_set,
            x -> x > partition_date_new - INTERVAL '3' DAY AND x <= partition_date_new
        ), x -> DAY(x) % 3))) AS stat_3d,
        CARDINALITY(ARRAY_DISTINCT(TRANSFORM(FILTER(
            partition_date_set,
            x -> x > partition_date_new - INTERVAL '6' DAY AND x <= partition_date_new
        ), x -> DAY(x) % 6))) AS stat_6d,
        CARDINALITY(ARRAY_DISTINCT(TRANSFORM(FILTER(
            partition_date_set,
            x -> x > partition_date_new - INTERVAL '12' DAY AND x <= partition_date_new
        ), x -> DAY(x)))) AS stat_12d
    FROM calculation_dates
),

user_segments_process AS (
    SELECT
        t1.*,
        active_window_dt AS day_msk,
        IF(
            stat_12d >= 10,
            'Frequent buyers',
            IF(
                stat_3d = 3 OR stat_6d >= 4,
                'Regular buyers',
                IF(stat_3d = 0, 'Non-buyers', 'Occasional buyers')
            )
        ) AS user_segment,
        LAG(active_window_dt, 3) OVER (
            PARTITION BY t1.real_user_id ORDER BY active_window_dt
        ) AS active_window_dt_prev3,
        LAG(active_window_dt, 2) OVER (
            PARTITION BY t1.real_user_id ORDER BY active_window_dt
        ) AS active_window_dt_prev2,
        LAG(active_window_dt, 1) OVER (
            PARTITION BY t1.real_user_id ORDER BY active_window_dt
        ) AS active_window_dt_prev
    FROM purchase_stats AS t1
),

user_segments_start AS (
    SELECT
        *,
        day_msk + INTERVAL 1 DAY AS effective_ts,
        IF(
            user_segment != LAG(user_segment) OVER (
                PARTITION BY real_user_id ORDER BY active_window_dt
            ),
            1,
            0
        ) AS user_segment_change_flg
    FROM user_segments_process
),

user_segments_end AS (
    SELECT
        *,
        COALESCE(
            LEAD(effective_ts) OVER (
                PARTITION BY real_user_id ORDER BY active_window_dt
            ) - INTERVAL 1 DAY,
            '9999-12-31'
        ) AS next_effective_ts,
        SUM(user_segment_change_flg) OVER (
            PARTITION BY real_user_id ORDER BY active_window_dt
        ) AS user_segment_change_cnt
    FROM user_segments_start
),

user_segments_agg AS (
    SELECT
        real_user_id,
        user_segment,
        user_segment_change_cnt,
        MIN(TIMESTAMP(effective_ts)) AS effective_ts,
        MAX(TIMESTAMP(next_effective_ts)) AS next_effective_ts
    FROM user_segments_end
    GROUP BY 1, 2, 3
)

SELECT
    real_user_id,
    user_segment,
    effective_ts,
    next_effective_ts
FROM user_segments_agg
