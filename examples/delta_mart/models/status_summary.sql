{{ config(materialized='table',
          file_format='delta',
          description='order status rollup over the monthly delta mart',
          tags=['gold']) }}
-- downstream table model reading a DeltaLite ref: proves the ref chain
-- resolves through the committed snapshot (temp-view attach), and that a
-- delta 'table' materialization is one atomic overwrite commit
SELECT o_orderstatus,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       SUM(total_cents) AS total_cents,
       MIN(order_month) AS first_month,
       MAX(order_month) AS last_month
FROM {{ ref('orders_monthly') }}
GROUP BY o_orderstatus
