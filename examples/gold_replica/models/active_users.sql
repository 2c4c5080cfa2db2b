{{
  config(
    materialized='incremental',
    file_format='parquet',
    incremental_strategy='insert_overwrite',
    partition_by=['week_msk'],
    full_reload_on='6',
    meta={'model_owner': '@analytics.duty', 'priority_weight': '1000', 'full_reload_on': '6'}
  )
}}

-- Base daily-activity table at user grain. Mirrors the reference's
-- models/spark/base/active_devices.sql:20-93 composition: per-day
-- grouped attrs + an unfiltered min_dates CTE for join_day, a
-- lookback-windowed incremental branch, and a hash-bucketed sink.
-- The reference's month_msk granularity maps to week_msk here because
-- the gate corpus spans 30 days (same TRUNC + dynamic-partition path).

WITH user_info AS (
    SELECT
        e.user_id,
        CAST(e.ts AS DATE) AS day,
        MAX(CASE WHEN pmod(e.event_id, 3) = 0 THEN 'ios'
                 WHEN pmod(e.event_id, 3) = 1 THEN 'android'
                 ELSE 'web' END) AS platform,
        MIN(CAST(e.value < 2.0 AS INT)) = 1 AS is_ephemeral,
        MAX(c.c_mktsegment) AS app_language,
        MAX(n.n_name) AS country,
        MAX(IF(c.c_nationkey < 12, 'SIA', 'JMT')) AS legal_entity,
        e.user_id AS real_user_id
    FROM {{ source('mart', 'events') }} AS e
    JOIN {{ source('mart', 'customer') }} AS c ON e.user_id = c.c_custkey
    JOIN {{ source('mart', 'nation') }} AS n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(e.ts AS DATE) < DATE '{{ var("run_date") }}'
    {% if is_incremental() %}
        AND CAST(e.ts AS DATE) >= TRUNC(DATE '{{ var("run_date") }}' - INTERVAL {{ var("lookback_days") }} DAYS, 'WEEK')
    {% endif %}
    GROUP BY 1, 2
),

min_dates AS (
    SELECT
        user_id,
        MIN(CAST(ts AS DATE)) AS dt
    FROM {{ source('mart', 'events') }}
    WHERE CAST(ts AS DATE) < DATE '{{ var("run_date") }}'
    GROUP BY 1
)

SELECT
    d.user_id,
    d.day,
    min_dates.dt AS join_day,
    d.country,
    d.platform,
    d.app_language,
    d.legal_entity,
    d.is_ephemeral,
    d.day = min_dates.dt AS is_new_user,
    d.real_user_id,
    TRUNC(d.day, 'WEEK') AS week_msk
FROM user_info AS d
INNER JOIN min_dates USING (user_id)
DISTRIBUTE BY week_msk, ABS(HASH(d.user_id)) % 10
