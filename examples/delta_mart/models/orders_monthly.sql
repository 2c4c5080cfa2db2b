{{ config(materialized='incremental',
          incremental_strategy='insert_overwrite',
          partition_by=['order_month'],
          file_format='delta',
          tblproperties={'delta.enableChangeDataFeed': 'true'},
          tags=['mart']) }}
-- monthly order mart on a DeltaLite table: the incremental run lands as
-- ONE dynamic-partition-overwrite commit that replaces only the months
-- present in the increment (reference shape: daily insert_overwrite
-- delta models, e.g. models/spark/base/active_devices.sql)
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       SUM(price_cents) AS total_cents
FROM {{ ref('stg_orders') }}
{% if is_incremental() %}
WHERE o_orderdate >= date'{{ var("cutoff_date") }}'
{% else %}
WHERE o_orderdate < date'{{ var("cutoff_date") }}'
{% endif %}
GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE), o_orderstatus
