{{ config(materialized='table', tags=['mart']) }}
-- lifetime rollup over the daily mart (reference shape: gold_* rollups)
SELECT user_id,
       CAST(SUM(n_events) AS BIGINT) AS lifetime_events,
       ROUND(SUM(total_value), 2) AS lifetime_value,
       MIN(day) AS first_day,
       MAX(day) AS last_day,
       COUNT(*) AS active_days
FROM {{ ref('daily_user_stats') }}
GROUP BY user_id
