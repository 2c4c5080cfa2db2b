{{ config(materialized='incremental',
          incremental_strategy='merge',
          unique_key='o_orderkey',
          file_format='delta') }}
-- upstream fact: each run upserts the selected key band at the current
-- price multiplier. MERGE commits make every run's row changes
-- CDF-addressable for downstream ref_changes() consumers: widening the
-- band inserts new keys, re-running at a new multiplier updates
-- existing ones.
SELECT o_orderkey,
       o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) * {{ var('price_mult') }} AS price_cents
FROM {{ source('testdata', 'orders') }}
WHERE o_orderkey % 4 <= {{ var('batch') }}
