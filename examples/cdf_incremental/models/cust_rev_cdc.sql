{{ config(materialized='incremental',
          incremental_strategy='merge',
          unique_key='o_custkey',
          file_format='delta') }}
-- CDC-driven incremental aggregate: the changed-keys MERGE pattern.
-- ref_changes('orders_cdc') is the upstream's Change Data Feed since the
-- version this model last consumed (watermark in this table's own delta
-- log, advanced only when this model's commit succeeds); the run
-- recomputes exactly the customers those changes touched and MERGEs them
-- in. Per-run read cost is |change window| + the changed keys' upstream
-- rows — never the full upstream (contrast the reference's 200-day
-- lookback insert_overwrite, models/spark/base/active_devices.sql:46-48).
{% if is_incremental() %}
SELECT o.o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(o.price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }} o
WHERE o.o_custkey IN (
    SELECT DISTINCT c.o_custkey FROM {{ ref_changes('orders_cdc') }} c
)
GROUP BY o.o_custkey
{% else %}
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }}
GROUP BY o_custkey
{% endif %}
