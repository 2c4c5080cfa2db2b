{# Parameterized model generator (reference pattern:
   macros/gold_active_users_and_devices_with_ephemeral.sql:1-405, invoked
   for device_id/user_id variants): one macro emits the whole model body
   for a given entity key. #}
{% macro activity_rollup(entity_col) %}
SELECT {{ entity_col }} AS entity_id,
       '{{ entity_col }}' AS entity_kind,
       COUNT(*) AS n_events,
       COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
       ROUND(SUM(value), 2) AS total_value,
       MIN(ts) AS first_seen,
       MAX(ts) AS last_seen
FROM {{ source('testdata', 'events') }}
GROUP BY {{ entity_col }}
{% endmacro %}
