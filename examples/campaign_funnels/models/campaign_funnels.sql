{{
  config(
    materialized='incremental',
    file_format='parquet',
    incremental_strategy='insert_overwrite',
    partition_by=['event_dt'],
    meta={'model_owner': '@onfy.replica', 'alerts_channel': '#etl-monitoring'}
  )
}}

-- Replica of the reference's LARGEST single model,
-- models/spark/onfy/onfy_source_campaign_funnels.sql (1,407 lines):
-- nested-payload event projection -> per-(device, product, event type)
-- idle-gap sessionization -> session-first dedup (MIN_BY) -> a chain of
-- bounded interval attribution joins (preview -> opening -> cart adding
-- via medicine-group mates -> order) -> a flat UNION ALL of funnel
-- source variants, rebuilt over a rolling event window and
-- insert-overwritten by event date (reference config :1-15, window
-- :115-116).  Granularity mapping for the 30-day gate corpus: the
-- reference's 120-day window becomes var('event_window_days')=14, its
-- 30-minute session/attribution horizon becomes 12h gap / 24h
-- attribution.

WITH dim_product_dict AS (
    SELECT product_id, medicine_group_id, product_name
    FROM {{ ref('dim_products') }}
),

medicine_group_products AS (
    -- group-mate expansion (reference :44-51): an adding counts for a
    -- preview of ANY product in the same medicine group
    SELECT
        dpd1.product_id AS initial_product_id,
        dpd2.product_id AS medicine_group_product_id
    FROM dim_product_dict AS dpd1
    INNER JOIN dim_product_dict AS dpd2
        ON dpd1.medicine_group_id = dpd2.medicine_group_id
),

orders_info AS (
    SELECT order_id, device_id, order_ts, product_id,
           quantity, products_price, before_products_price
    FROM {{ ref('orders_info') }}
    WHERE order_dt >= DATE '{{ var("run_date") }}' - INTERVAL {{ var("event_window_days") }} DAYS
),

raw_events AS (
    -- nested-payload projection + platform normalization (reference
    -- :83-122); product id comes out of the JSON payload exactly like
    -- payload.productId
    SELECT
        e.user_id AS device_id,
        CASE WHEN pmod(e.event_id, 3) = 0 THEN 'apps'
             WHEN pmod(e.event_id, 3) = 1 THEN 'mobile'
             ELSE 'desktop' END AS platform,
        e.event_id,
        e.ts AS event_ts,
        CAST(e.ts AS DATE) AS event_dt,
        e.event_type,
        pmod(CAST(get_json_object(e.props, '$.k') AS INT), 10) AS product_id,
        CASE WHEN pmod(e.event_id, 5) = 0 THEN 'searchProduct'
             WHEN pmod(e.event_id, 5) = 1 THEN 'searchCarousel'
             WHEN pmod(e.event_id, 5) = 2 THEN 'recommendations'
             WHEN pmod(e.event_id, 5) = 3 THEN 'previouslyBought'
             ELSE '' END AS widget_type,
        CASE WHEN pmod(e.event_id, 4) = 0 THEN 'home'
             WHEN pmod(e.event_id, 4) = 1 THEN 'search'
             WHEN pmod(e.event_id, 4) = 2 THEN 'product'
             ELSE 'cart' END AS source_screen,
        CONCAT('camp_', CAST(pmod(e.user_id, 7) AS STRING)) AS utm_campaign
    FROM {{ source('mart', 'events') }} AS e
    WHERE CAST(e.ts AS DATE) < DATE '{{ var("run_date") }}'
      AND CAST(e.ts AS DATE) >= DATE '{{ var("run_date") }}' - INTERVAL {{ var("event_window_days") }} DAYS
      AND e.event_type IN ('view', 'click', 'signup', 'error')
),

events_with_lag AS (
    SELECT *,
        LAG(event_ts) OVER (
            PARTITION BY device_id, product_id, event_type ORDER BY event_ts
        ) AS prev_event_ts
    FROM raw_events
),

events_with_flags AS (
    SELECT *,
        -- new session: first event or >12h idle (reference :133-144,
        -- 30-minute horizon scaled to the corpus density)
        CASE
            WHEN prev_event_ts IS NULL THEN 1
            WHEN CAST(event_ts AS LONG) - CAST(prev_event_ts AS LONG) > 43200 THEN 1
            ELSE 0
        END AS is_new_session
    FROM events_with_lag
),

sessionized_events AS (
    SELECT *,
        SUM(is_new_session) OVER (
            PARTITION BY device_id, product_id, event_type ORDER BY event_ts
            ROWS UNBOUNDED PRECEDING
        ) AS session_number
    FROM events_with_flags
),

aggregated_session_events AS (
    -- one row per session: first event wins (reference :156-235 MIN_BY
    -- aggregation; event timestamps are unique per device so the
    -- MIN_BY tie-break is deterministic)
    SELECT
        device_id,
        MIN_BY(platform, event_ts) AS platform,
        CASE WHEN event_type = 'view' THEN 'preview'
             WHEN event_type = 'click' THEN 'opening'
             WHEN event_type = 'signup' THEN 'adding'
             ELSE 'banner' END AS event_type,
        session_number,
        MIN_BY(event_id, event_ts) AS event_id,
        MIN(event_dt) AS event_dt,
        MIN(event_ts) AS event_ts,
        product_id,
        MIN_BY(widget_type, event_ts) AS widget_type,
        MIN_BY(source_screen, event_ts) AS source_screen,
        utm_campaign
    FROM sessionized_events
    GROUP BY
        device_id,
        CASE WHEN event_type = 'view' THEN 'preview'
             WHEN event_type = 'click' THEN 'opening'
             WHEN event_type = 'signup' THEN 'adding'
             ELSE 'banner' END,
        session_number,
        product_id,
        utm_campaign
),

product_previews AS (
    SELECT *,
        LEAD(event_ts) OVER (
            PARTITION BY device_id, product_id ORDER BY event_ts
        ) AS next_event_ts
    FROM aggregated_session_events
    WHERE event_type = 'preview'
),

product_opens AS (
    SELECT *,
        LEAD(event_ts) OVER (
            PARTITION BY device_id, product_id ORDER BY event_ts
        ) AS next_event_ts
    FROM aggregated_session_events
    WHERE event_type = 'opening'
),

cart_addings AS (
    SELECT * FROM aggregated_session_events WHERE event_type = 'adding'
),

-- Preview -> Opening within the preview's validity window
-- (reference preview_to_openings :368-390)
preview_to_openings AS (
    -- first opening per preview (funnel-step semantics: the earliest
    -- conversion wins, keeping the flat table 1:1 per preview)
    SELECT
        pp.event_id AS preview_event_id,
        MIN_BY(po.event_id, po.event_ts) AS opening_event_id
    FROM product_previews AS pp
    INNER JOIN product_opens AS po
        ON pp.device_id = po.device_id
        AND pp.product_id = po.product_id
        AND pp.event_ts <= po.event_ts
        AND COALESCE(pp.next_event_ts, pp.event_ts + INTERVAL 24 HOURS) > po.event_ts
    GROUP BY pp.event_id
),

-- Preview -> Cart Adding of any medicine-group mate
-- (reference preview_to_cart_addings :391-417)
preview_to_cart_addings AS (
    SELECT
        pp.event_id AS preview_event_id,
        MIN_BY(ca.event_id, ca.event_ts) AS adding_event_id
    FROM product_previews AS pp
    INNER JOIN medicine_group_products AS mg
        ON pp.product_id = mg.initial_product_id
    INNER JOIN cart_addings AS ca
        ON pp.device_id = ca.device_id
        AND mg.medicine_group_product_id = ca.product_id
        AND pp.event_ts <= ca.event_ts
        AND COALESCE(pp.next_event_ts, pp.event_ts + INTERVAL 24 HOURS) > ca.event_ts
    GROUP BY pp.event_id
),

-- Cart Adding -> first Order within 24h (reference
-- cart_addings_to_orders pattern: MIN_BY earliest order)
cart_addings_to_orders AS (
    SELECT
        ca.event_id AS adding_event_id,
        MIN_BY(o.order_id, o.order_ts) AS order_id,
        MIN_BY(o.quantity, o.order_ts) AS order_quantity,
        MIN_BY(o.products_price, o.order_ts) AS order_products_price,
        MIN_BY(o.before_products_price, o.order_ts) AS order_before_products_price
    FROM cart_addings AS ca
    INNER JOIN orders_info AS o
        ON ca.device_id = o.device_id
        AND ca.product_id = o.product_id
        AND ca.event_ts <= o.order_ts
        AND ca.event_ts + INTERVAL 24 HOURS > o.order_ts
    GROUP BY ca.event_id
)

-- flat funnel table: one UNION ALL branch per source variant
-- (reference :1100-1407)
SELECT
    event_dt,
    source,
    platform,
    placement,
    utm_campaign,
    product_id,
    preview_event_id,
    opening_event_id,
    adding_event_id,
    order_id,
    order_quantity,
    order_products_price,
    order_before_products_price
FROM (
    -- search-driven previews
    SELECT
        pp.event_dt,
        'search' AS source,
        pp.platform,
        pp.source_screen AS placement,
        pp.utm_campaign,
        pp.product_id,
        pp.event_id AS preview_event_id,
        p2o.opening_event_id,
        p2a.adding_event_id,
        a2o.order_id,
        a2o.order_quantity,
        a2o.order_products_price,
        a2o.order_before_products_price
    FROM product_previews AS pp
    LEFT JOIN preview_to_openings AS p2o
        ON pp.event_id = p2o.preview_event_id
    LEFT JOIN preview_to_cart_addings AS p2a
        ON pp.event_id = p2a.preview_event_id
    LEFT JOIN cart_addings_to_orders AS a2o
        ON p2a.adding_event_id = a2o.adding_event_id
    WHERE pp.widget_type IN ('searchProduct', 'searchCarousel', '')

    UNION ALL

    -- recommendation-driven previews
    SELECT
        pp.event_dt,
        'recommendation' AS source,
        pp.platform,
        pp.widget_type AS placement,
        pp.utm_campaign,
        pp.product_id,
        pp.event_id AS preview_event_id,
        p2o.opening_event_id,
        p2a.adding_event_id,
        a2o.order_id,
        a2o.order_quantity,
        a2o.order_products_price,
        a2o.order_before_products_price
    FROM product_previews AS pp
    LEFT JOIN preview_to_openings AS p2o
        ON pp.event_id = p2o.preview_event_id
    LEFT JOIN preview_to_cart_addings AS p2a
        ON pp.event_id = p2a.preview_event_id
    LEFT JOIN cart_addings_to_orders AS a2o
        ON p2a.adding_event_id = a2o.adding_event_id
    WHERE pp.widget_type IN ('recommendations', 'previouslyBought')
)
DISTRIBUTE BY event_dt, ABS(HASH(preview_event_id)) % 10
