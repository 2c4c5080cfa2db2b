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

-- Device-grain twin of active_users, mirroring the reference's
-- models/spark/base/active_devices.sql funnel booleans (:35-42): one
-- boolean per funnel stage, MAX'd per device-day. A user owns three
-- deterministic devices (device_id = user_id*3 + event_id%3).

WITH device_info AS (
    SELECT
        e.user_id * 3 + pmod(e.event_id, 3) AS device_id,
        CAST(e.ts AS DATE) AS day,
        MAX(CASE WHEN pmod(e.event_id, 3) = 0 THEN 'ios'
                 WHEN pmod(e.event_id, 3) = 1 THEN 'android'
                 ELSE 'web' END) AS platform,
        MIN(CAST(e.value < 2.0 AS INT)) = 1 AS is_ephemeral,
        MAX(c.c_mktsegment) AS app_language,
        MAX(n.n_name) AS country,
        MAX(IF(c.c_nationkey < 12, 'SIA', 'JMT')) AS legal_entity,
        MAX(e.user_id) AS real_user_id,
        MAX(e.event_type = 'view') AS is_product_opened,
        MAX(e.event_type = 'click') AS is_product_added_to_cart,
        MAX(e.event_type = 'purchase') AS is_product_purchased,
        MAX(e.event_type = 'signup') AS is_checkout_started,
        MAX(e.event_type = 'error') AS is_cart_opened
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
        user_id * 3 + pmod(event_id, 3) AS device_id,
        MIN(CAST(ts AS DATE)) AS dt
    FROM {{ source('mart', 'events') }}
    WHERE CAST(ts AS DATE) < DATE '{{ var("run_date") }}'
    GROUP BY 1
)

SELECT
    d.device_id,
    d.day,
    min_dates.dt AS join_day,
    d.country,
    d.platform,
    d.app_language,
    d.legal_entity,
    d.is_ephemeral,
    d.is_product_opened,
    d.is_product_added_to_cart,
    d.is_product_purchased,
    d.is_checkout_started,
    d.is_cart_opened,
    d.day = min_dates.dt AS is_new_device,
    d.real_user_id,
    TRUNC(d.day, 'WEEK') AS week_msk
FROM device_info AS d
INNER JOIN min_dates USING (device_id)
DISTRIBUTE BY week_msk, ABS(HASH(d.device_id)) % 10
