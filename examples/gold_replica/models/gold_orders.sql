{{
  config(
    materialized='incremental',
    schema='gold',
    file_format='parquet',
    incremental_strategy='insert_overwrite',
    partition_by=['order_week_msk'],
    full_reload_on='6',
    meta={'model_owner': '@analytics.duty', 'priority_weight': '1000'}
  )
}}

-- Order-grain fact mirroring the money-column family of the reference's
-- models/spark/gold/gold_orders.sql (gmv_initial/gmv_final,
-- order_gross_profit_*, ecgp_*) and its hash-bucketed DISTRIBUTE BY sink
-- (gold_orders.sql:696). One purchase event = one order; money columns
-- are deterministic per-row derivations rounded at 2dp so the downstream
-- sums stay oracle-stable.

SELECT
    e.event_id AS order_id,
    e.user_id,
    e.user_id * 3 + pmod(e.event_id, 3) AS device_id,
    e.user_id AS real_user_id,
    CAST(e.ts AS DATE) AS order_date_msk,
    n.n_name AS country_code,
    CASE WHEN pmod(e.event_id, 3) = 0 THEN 'ios'
         WHEN pmod(e.event_id, 3) = 1 THEN 'android'
         ELSE 'web' END AS platform,
    -- money is derived through exact integer cents (value has 2 decimals)
    -- so every amount sits exactly on the 2-decimal grid: downstream
    -- ROUND(SUM(...), 2) can then never land on a .005 tie, where Spark
    -- (BigDecimal HALF_UP) and other engines (binary-double rounding)
    -- disagree
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) AS DOUBLE) / 100 AS gmv_initial,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 95 DIV 100 AS DOUBLE) / 100 AS gmv_final,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 22 DIV 100 AS DOUBLE) / 100 AS order_gross_profit_final_estimated,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 20 DIV 100 AS DOUBLE) / 100 AS order_gross_profit_final,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 18 DIV 100 AS DOUBLE) / 100 AS ecgp_initial,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 16 DIV 100 AS DOUBLE) / 100 AS ecgp_final,
    TRUNC(CAST(e.ts AS DATE), 'WEEK') AS order_week_msk
FROM {{ source('mart', 'events') }} AS e
JOIN {{ source('mart', 'customer') }} AS c ON e.user_id = c.c_custkey
JOIN {{ source('mart', 'nation') }} AS n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
  AND CAST(e.ts AS DATE) < DATE '{{ var("run_date") }}'
{% if is_incremental() %}
  AND CAST(e.ts AS DATE) >= TRUNC(DATE '{{ var("run_date") }}' - INTERVAL {{ var("lookback_days") }} DAYS, 'WEEK')
{% endif %}
DISTRIBUTE BY order_week_msk, ABS(HASH(e.event_id)) % 10
