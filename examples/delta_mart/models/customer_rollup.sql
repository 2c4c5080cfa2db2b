{{ config(materialized='incremental',
          incremental_strategy='merge',
          unique_key='o_custkey',
          file_format='delta',
          tags=['mart']) }}
-- per-customer rollup upserted by DeltaLite MERGE: matched keys replaced
-- wholesale, new keys inserted, untouched files keep their bytes
-- (stats-pruned copy-on-write — the reference's delta merge targets,
-- macros/spark_adapter_patch/create_table.sql:21-38)
SELECT o_custkey,
       COUNT(*) AS n_orders,
       SUM(price_cents) AS total_cents,
       MAX(o_orderdate) AS last_order
FROM {{ ref('stg_orders') }}
{% if is_incremental() %}
GROUP BY o_custkey
HAVING MAX(o_orderdate) >= date'{{ var("cutoff_date") }}'
{% else %}
WHERE o_orderdate < date'{{ var("cutoff_date") }}'
GROUP BY o_custkey
{% endif %}
