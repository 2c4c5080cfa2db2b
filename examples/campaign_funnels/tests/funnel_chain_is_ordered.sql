-- singular test: every attributed chain is time-ordered — an order can
-- only be attributed through an adding that exists
SELECT *
FROM {{ ref('campaign_funnels') }}
WHERE (order_id IS NOT NULL AND adding_event_id IS NULL)
   OR (order_products_price < 0)
