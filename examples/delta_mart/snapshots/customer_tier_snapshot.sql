{{ config(strategy='check',
          unique_key='o_custkey',
          check_cols=['tier'],
          file_format='delta',
          invalidate_hard_deletes=True) }}
-- SCD2 snapshot on a DeltaLite target: each batch is ONE atomic commit,
-- history browsing = time travel (reference shape: all 54 snapshot
-- blocks, snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot.sql:8-15)
SELECT o_custkey,
       CASE WHEN n_orders >= 20 THEN 'gold'
            WHEN n_orders >= 10 THEN 'silver'
            ELSE 'bronze' END AS tier,
       n_orders
FROM {{ ref('customer_rollup') }}
