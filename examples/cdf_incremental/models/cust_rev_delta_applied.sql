{{ config(materialized='incremental',
          incremental_strategy='merge',
          unique_key='o_custkey',
          file_format='delta') }}
-- CDC-driven SIGNED-DELTA application: the streaming-aggregate shape.
-- The change feed's insert/update_postimage rows count +, delete/
-- update_preimage rows count -, so the per-key delta aggregate merges
-- onto the previous state ({{ this }}) WITHOUT ever re-reading the
-- upstream table - per-run cost is |change window| + the key-grain
-- state table. Exact for additive aggregates (COUNT/SUM); the
-- changed-keys pattern (cust_rev_cdc.sql) is the general fallback.
{% if is_incremental() %}
SELECT COALESCE(t.o_custkey, d.o_custkey) AS o_custkey,
       CAST(COALESCE(t.n_orders, 0) + COALESCE(d.dn, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(t.revenue_cents, 0) + COALESCE(d.ds, 0) AS BIGINT) AS revenue_cents
FROM (
    SELECT c.o_custkey,
           SUM(CASE WHEN c._change_type IN ('insert', 'update_postimage')
                    THEN 1 ELSE -1 END) AS dn,
           SUM(CASE WHEN c._change_type IN ('insert', 'update_postimage')
                    THEN c.price_cents ELSE -c.price_cents END) AS ds
    FROM {{ ref_changes('orders_cdc') }} c
    GROUP BY c.o_custkey
) d
FULL OUTER JOIN {{ this }} t ON t.o_custkey = d.o_custkey
{% else %}
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
FROM {{ ref('orders_cdc') }}
GROUP BY o_custkey
{% endif %}
