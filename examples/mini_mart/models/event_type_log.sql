{{ config(materialized='incremental',
          incremental_strategy='append',
          tags=['mart']) }}
-- append-only daily fact with a high-water-mark predicate
-- (reference shape: fact_table_update.sql append strategy ---
--  each run inserts only rows newer than what the table holds)
SELECT day,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM {{ ref('stg_events') }}
{% if is_incremental() %}
WHERE day > (SELECT MAX(day) FROM {{ this }})
{% else %}
WHERE day < date'{{ var("cutoff_date") }}'
{% endif %}
GROUP BY day, event_type
