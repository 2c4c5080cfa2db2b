{% macro gold_active_entities_with_ephemeral(entity_id) %}

{#
  Model-pair generator mirroring the reference's 405-line
  macros/gold_active_users_and_devices_with_ephemeral.sql:1-405: one macro
  body, two physical models (user/device grain), config chosen by the
  entity argument, 16-day-lookback incremental insert_overwrite on the
  week partition (reference: 200-day lookback on month_msk), weekly full
  reload (full_reload_on='6'), GMV-priority country/platform adjustment
  (SUM(SUM()) OVER + FIRST_VALUE, :81-117), LAG/LEAD activity chain
  (:119-204), retention RANGE-FOLLOWING flags (:253-317, CURRENT_DATE
  replaced by var('run_date') for a deterministic oracle), region/country
  dims (:319-329), user-segments as-of join (:331-342), and the
  DISTRIBUTE BY week,hash-bucket sink (:403).
#}

{% if entity_id == 'device_id' %}
    {% set naming_field = 'device' %}
    {{
        config(
            materialized='incremental',
            alias='active_devices_with_ephemeral',
            file_format='parquet',
            schema='gold',
            full_reload_on='6',
            meta={'model_owner': '@analytics.duty', 'priority_weight': '1000', 'full_reload_on': '6'},
            incremental_strategy='insert_overwrite',
            partition_by=['week_msk']
        )
    }}
{% elif entity_id == 'user_id' %}
    {% set naming_field = 'user' %}
    {{
        config(
            materialized='incremental',
            alias='active_users_with_ephemeral',
            file_format='parquet',
            schema='gold',
            full_reload_on='6',
            meta={'model_owner': '@analytics.duty', 'priority_weight': '1000', 'full_reload_on': '6'},
            incremental_strategy='insert_overwrite',
            partition_by=['week_msk']
        )
    }}
{% endif %}

WITH
uniq_regions AS (
    SELECT * FROM {{ ref('gold_regions') }} WHERE is_uniq = TRUE
),

first_order_dates AS (
    SELECT
        {{ entity_id }},
        MIN(order_date_msk) AS dt
    FROM {{ ref('gold_orders') }}
    GROUP BY 1
),

orders_ext1 AS (
    SELECT
        {{ entity_id }},
        order_date_msk AS date_msk,
        country_code,
        platform,
        SUM(gmv_initial) AS gmv_per_day_initial,
        SUM(gmv_final) AS gmv_per_day_final,
        SUM(order_gross_profit_final_estimated) AS order_gross_profit_per_day_final_estimated,
        SUM(order_gross_profit_final) AS order_gross_profit_per_day_final,
        SUM(ecgp_initial) AS ecgp_per_day_initial,
        SUM(ecgp_final) AS ecgp_per_day_final,
        COUNT(order_id) AS number_of_orders,
        COUNT(order_id) > 0 AS is_converted,

        -- country/platform of record = the one with the most GMV that day
        SUM(SUM(gmv_initial)) OVER (PARTITION BY {{ entity_id }}, order_date_msk, country_code) AS gmv_initial_per_country_code,
        SUM(SUM(gmv_initial)) OVER (PARTITION BY {{ entity_id }}, order_date_msk, platform) AS gmv_initial_per_platform
    FROM {{ ref('gold_orders') }}
    {% if is_incremental() %}
        WHERE order_week_msk >= TRUNC(DATE '{{ var("run_date") }}' - INTERVAL {{ var("lookback_days") }} DAYS, 'WEEK')
    {% endif %}
    GROUP BY 1, 2, 3, 4
),

orders_ext2 AS (
    SELECT
        {{ entity_id }},
        date_msk,
        SUM(gmv_per_day_initial) AS gmv_per_day_initial,
        SUM(gmv_per_day_final) AS gmv_per_day_final,
        SUM(order_gross_profit_per_day_final_estimated) AS order_gross_profit_per_day_final_estimated,
        SUM(order_gross_profit_per_day_final) AS order_gross_profit_per_day_final,
        SUM(ecgp_per_day_initial) AS ecgp_per_day_initial,
        SUM(ecgp_per_day_final) AS ecgp_per_day_final,
        SUM(number_of_orders) AS number_of_orders,
        MAX(is_converted) AS is_converted
    FROM orders_ext1
    GROUP BY 1, 2
),

adjusted_slices AS (
    SELECT DISTINCT
        {{ entity_id }},
        date_msk AS day,
        FIRST_VALUE(country_code) OVER (PARTITION BY {{ entity_id }}, date_msk ORDER BY gmv_initial_per_country_code DESC, country_code) AS country_code_based_on_gmv_initial,
        FIRST_VALUE(platform) OVER (PARTITION BY {{ entity_id }}, date_msk ORDER BY gmv_initial_per_platform DESC, platform) AS platform_based_on_gmv_initial
    FROM orders_ext1
),

active_ext0 AS (
    -- previous/next activity day and whole-history ephemerality: windows
    -- run over the UNFILTERED base table, the incremental filter applies
    -- downstream at active_ext1 (reference :119-133)
    SELECT
        {{ entity_id }},
        day,
        LAG(day) OVER (PARTITION BY {{ entity_id }} ORDER BY day) AS prev_date_msk,
        LEAD(day) OVER (PARTITION BY {{ entity_id }} ORDER BY day) AS next_date_msk,
        MIN(is_ephemeral) OVER (PARTITION BY {{ entity_id }}) AS min_is_ephemeral
    {% if entity_id == 'user_id' %}
        FROM {{ ref('active_users') }}
    {% else %}
        FROM {{ ref('active_devices') }}
    {% endif %}
),

active_ext1 AS (
    SELECT
        main.{{ entity_id }},
        main.day AS date_msk,
        main.real_user_id,
        main.join_day AS join_date_msk,
        main.legal_entity,
        {% if entity_id == 'device_id' %}
            main.is_product_opened,
            main.is_product_added_to_cart,
            main.is_product_purchased,
            main.is_checkout_started,
            main.is_cart_opened,
        {% endif %}
        COALESCE(adjusted_slices.country_code_based_on_gmv_initial, main.country) AS country_code,
        main.app_language,
        COALESCE(adjusted_slices.platform_based_on_gmv_initial, main.platform) AS platform,
        main.is_ephemeral,
        DATEDIFF(main.day, main.join_day) AS {{ naming_field }}_lifetime,

        aux.prev_date_msk,
        aux.next_date_msk,
        aux.min_is_ephemeral,

        main.day = main.join_day AS is_new_{{ naming_field }}

    {% if entity_id == 'user_id' %}
        FROM {{ ref('active_users') }} AS main
    {% else %}
        FROM {{ ref('active_devices') }} AS main
    {% endif %}
    JOIN active_ext0 AS aux USING ({{ entity_id }}, day)
    LEFT JOIN adjusted_slices USING ({{ entity_id }}, day)
    {% if is_incremental() %}
        WHERE main.week_msk >= TRUNC(DATE '{{ var("run_date") }}' - INTERVAL {{ var("lookback_days") }} DAYS, 'WEEK')
    {% endif %}
),

active_ext2 AS (
    -- activity-recency grouping (reference :182-204; the 1..28 'regular'
    -- band maps to 1..7 over the 30-day corpus)
    SELECT
        *,
        CASE
            WHEN is_new_{{ naming_field }} THEN 'new'
            WHEN prev_date_msk_lag BETWEEN 1 AND 7 THEN 'regular'
            ELSE 'reactivated'
        END AS previous_activity_{{ naming_field }}_group
    FROM (
        SELECT
            *,
            IF(a_l = 0, {{ naming_field }}_lifetime, a_l) AS prev_date_msk_lag,
            DATEDIFF(next_date_msk, date_msk) AS next_date_msk_lag
        FROM (
            SELECT
                *,
                COALESCE(DATEDIFF(date_msk, prev_date_msk), 0) AS a_l
            FROM active_ext1
        )
    )
),

active_ext3 AS (
    SELECT
        a.{{ entity_id }},
        a.date_msk,
        a.real_user_id,
        a.country_code,
        a.platform,
        a.legal_entity,
        {% if entity_id == 'device_id' %}
            a.is_product_opened,
            a.is_product_added_to_cart,
            a.is_product_purchased,
            a.is_checkout_started,
            a.is_cart_opened,
        {% endif %}
        a.app_language,
        a.is_new_{{ naming_field }},
        a.join_date_msk,
        a.{{ naming_field }}_lifetime,
        a.prev_date_msk_lag,
        a.next_date_msk_lag,
        a.previous_activity_{{ naming_field }}_group,
        a.min_is_ephemeral AS is_ephemeral_{{ naming_field }},

        COALESCE(b.gmv_per_day_initial, 0) AS gmv_per_day_initial,
        COALESCE(b.gmv_per_day_final, 0) AS gmv_per_day_final,
        COALESCE(b.order_gross_profit_per_day_final_estimated, 0) AS order_gross_profit_per_day_final_estimated,
        COALESCE(b.order_gross_profit_per_day_final, 0) AS order_gross_profit_per_day_final,
        COALESCE(b.ecgp_per_day_initial, 0) AS ecgp_per_day_initial,
        COALESCE(b.ecgp_per_day_final, 0) AS ecgp_per_day_final,
        COALESCE(b.number_of_orders, 0) AS number_of_orders,

        COALESCE(a.date_msk >= f.dt, FALSE) AS is_payer,
        COALESCE(b.is_converted, FALSE) AS is_converted
    FROM active_ext2 AS a
    LEFT JOIN orders_ext2 AS b USING ({{ entity_id }}, date_msk)
    LEFT JOIN first_order_dates AS f USING ({{ entity_id }})
),

active_ext4 AS (
    -- retention flags: RANGE-FOLLOWING windows over day numbers, NULL
    -- until mature (reference :253-317 with CURRENT_DATE -> run_date)
    SELECT
        *,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}' - INTERVAL 1 DAY, date_msk) >= 1,
            (COUNT(*) OVER (PARTITION BY {{ entity_id }} ORDER BY UNIX_DATE(date_msk) RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING)) > 0,
            NULL
        ) AS is_rd1,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}' - INTERVAL 1 DAY, date_msk) >= 3,
            (COUNT(*) OVER (PARTITION BY {{ entity_id }} ORDER BY UNIX_DATE(date_msk) RANGE BETWEEN 3 FOLLOWING AND 3 FOLLOWING)) > 0,
            NULL
        ) AS is_rd3,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}' - INTERVAL 1 DAY, date_msk) >= 7,
            (COUNT(*) OVER (PARTITION BY {{ entity_id }} ORDER BY UNIX_DATE(date_msk) RANGE BETWEEN 7 FOLLOWING AND 7 FOLLOWING)) > 0,
            NULL
        ) AS is_rd7,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}' - INTERVAL 1 DAY, date_msk) >= 7,
            (COUNT(*) OVER (PARTITION BY {{ entity_id }} ORDER BY UNIX_DATE(date_msk) RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING)) > 0,
            NULL
        ) AS is_rw1,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}', date_msk) >= 7,
            (next_date_msk_lag > 7 OR (next_date_msk_lag IS NULL AND DATEDIFF(DATE '{{ var("run_date") }}', date_msk) >= 7)),
            NULL
        ) AS is_churned_7,
        IF(
            DATEDIFF(DATE '{{ var("run_date") }}' - INTERVAL 1 DAY, date_msk) >= 7,
            MAX(is_converted) OVER (PARTITION BY {{ entity_id }} ORDER BY UNIX_DATE(date_msk) RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING),
            NULL
        ) AS is_converted_next_w1
    FROM active_ext3
),

active_ext5 AS (
    SELECT
        a.*,
        COALESCE(c.top_country_code, 'Other') AS top_country_code,
        COALESCE(c.country_priority_type, 'Other') AS country_priority_type,
        COALESCE(b.region_name, 'Other') AS region_name
    FROM active_ext4 AS a
    LEFT JOIN uniq_regions AS b USING (country_code)
    LEFT JOIN {{ ref('gold_countries') }} AS c USING (country_code)
),

active_ext6 AS (
    -- point-in-time segment (as-of range join on the validity interval)
    SELECT
        a.*,
        COALESCE(b.user_segment, 'Non-buyers') AS real_user_segment
    FROM active_ext5 AS a
    LEFT JOIN {{ ref('user_segments') }} AS b
        ON
            a.real_user_id = b.real_user_id
            AND a.date_msk >= TO_DATE(b.effective_ts)
            AND a.date_msk <= TO_DATE(b.next_effective_ts)
)

SELECT
    date_msk,
    {{ entity_id }},
    real_user_id,

    country_code,
    top_country_code,
    country_priority_type,
    region_name,
    app_language,
    platform,
    legal_entity,
    {% if entity_id == 'device_id' %}
        is_product_opened,
        is_product_added_to_cart,
        is_product_purchased,
        is_checkout_started,
        is_cart_opened,
    {% endif %}
    join_date_msk,
    real_user_segment,
    is_new_{{ naming_field }},
    is_ephemeral_{{ naming_field }},
    {{ naming_field }}_lifetime,

    previous_activity_{{ naming_field }}_group,
    prev_date_msk_lag,
    next_date_msk_lag,
    ROUND(gmv_per_day_initial, 2) AS gmv_per_day_initial,
    ROUND(gmv_per_day_final, 2) AS gmv_per_day_final,
    ROUND(order_gross_profit_per_day_final_estimated, 2) AS order_gross_profit_per_day_final_estimated,
    ROUND(order_gross_profit_per_day_final, 2) AS order_gross_profit_per_day_final,
    ROUND(ecgp_per_day_initial, 2) AS ecgp_per_day_initial,
    ROUND(ecgp_per_day_final, 2) AS ecgp_per_day_final,
    number_of_orders,

    is_payer,
    is_converted,
    is_rd1,
    is_rd3,
    is_rd7,
    is_rw1,
    is_churned_7,
    is_converted_next_w1,
    TRUNC(date_msk, 'WEEK') AS week_msk
FROM active_ext6
DISTRIBUTE BY week_msk, ABS(HASH({{ entity_id }})) % 10

{% endmacro %}
