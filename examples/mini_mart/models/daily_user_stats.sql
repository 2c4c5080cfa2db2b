{{ config(materialized='incremental',
          incremental_strategy='insert_overwrite',
          partition_by=['day'],
          tags=['mart']) }}
-- incremental daily mart, insert-overwrite by day partition
-- (reference shape: models/spark/base/active_devices.sql)
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       ROUND(SUM(value), 2) AS total_value,
       ROUND(SUM(value * weight), 2) AS weighted_value,
       day
FROM {{ ref('stg_events') }}
{% if is_incremental() %}
WHERE day >= date'{{ var("cutoff_date") }}'
{% endif %}
GROUP BY user_id, day
