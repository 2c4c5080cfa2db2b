{{
  config(
    unique_key='real_user_id',
    strategy='check',
    check_cols=['user_segment'],
    invalidate_hard_deletes=True,
    meta={'model_owner': '@analytics.duty'}
  )
}}

-- SCD2 history of each user's CURRENT segment (reference snapshot blocks,
-- e.g. snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot.sql:8-15):
-- one batch per engine run; segment changes between runs open/close rows.

SELECT real_user_id, user_segment
FROM {{ ref('user_segments') }}
WHERE TO_DATE(next_effective_ts) = DATE '9999-12-31'
