{{ config(materialized='table', file_format='parquet', meta={'model_owner': '@onfy.replica'}) }}

-- Order-grain purchase facts (reference orders_info CTE :57-82): money
-- through exact integer cents so downstream sums stay oracle-stable.

SELECT
    e.event_id AS order_id,
    e.user_id AS device_id,
    e.ts AS order_ts,
    CAST(e.ts AS DATE) AS order_dt,
    pmod(CAST(get_json_object(e.props, '$.k') AS INT), 10) AS product_id,
    1 + pmod(e.event_id, 3) AS quantity,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) AS DOUBLE) / 100 AS products_price,
    CAST(CAST(ROUND(e.value * 100) AS BIGINT) * 110 DIV 100 AS DOUBLE) / 100 AS before_products_price
FROM {{ source('mart', 'events') }} AS e
WHERE e.event_type = 'purchase'
  AND CAST(e.ts AS DATE) < DATE '{{ var("run_date") }}'
