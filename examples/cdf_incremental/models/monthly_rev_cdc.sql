{{ config(materialized='incremental',
          incremental_strategy='insert_overwrite',
          partition_by=['order_month'],
          file_format='delta') }}
-- CDC-driven PARTITION-SURGICAL incremental: the change feed names the
-- months the upstream delta touched; exactly those partitions are
-- recomputed from the current upstream snapshot and replaced in one
-- dynamic-partition-overwrite commit. Untouched months keep their
-- bytes. The delta-native form of the reference's daily
-- insert_overwrite models (models/spark/base/active_devices.sql): the
-- lookback window is replaced by the feed's exact touched-partition
-- set.
{% if is_incremental() %}
SELECT o.order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(o.price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }} o
WHERE o.order_month IN (
    SELECT DISTINCT c.order_month FROM {{ ref_changes('orders_cdc') }} c
)
GROUP BY o.order_month
{% else %}
SELECT order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }}
GROUP BY order_month
{% endif %}
