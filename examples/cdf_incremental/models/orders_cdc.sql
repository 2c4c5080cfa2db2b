{{ config(materialized='incremental',
          incremental_strategy='merge',
          unique_key='o_orderkey',
          file_format='delta') }}
-- upstream fact: each run upserts the selected key band at the current
-- price multiplier. MERGE commits make every run's row changes
-- CDF-addressable for downstream ref_changes() consumers: widening the
-- band inserts new keys, re-running at a new multiplier updates
-- existing ones. Incremental batches can be date-restricted
-- (change_from) so an update run touches only SOME months — the shape
-- that lets partition-surgical consumers prove they replace only the
-- touched partitions.
SELECT o_orderkey,
       o_custkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) * {{ var('price_mult') }} AS price_cents
FROM {{ source('testdata', 'orders') }}
WHERE o_orderkey % 4 <= {{ var('batch') }}
{% if is_incremental() %}
  AND o_orderdate >= date'{{ var("change_from", "1990-01-01") }}'
{% endif %}
