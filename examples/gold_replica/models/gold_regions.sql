{{ config(materialized='view', schema='gold', meta={'model_owner': '@analytics.duty'}) }}

-- Region dimension view (reference ref('gold_regions') consumed by the
-- gold macro at macros/gold_active_users_and_devices_with_ephemeral.sql:53).
-- is_uniq=FALSE on one country exercises the macro's WHERE is_uniq filter
-- (that country falls back to region 'Other').

SELECT
    n.n_name AS country_code,
    r.r_name AS region_name,
    n.n_nationkey <> 4 AS is_uniq
FROM {{ source('mart', 'nation') }} AS n
JOIN {{ source('mart', 'region') }} AS r ON n.n_regionkey = r.r_regionkey
