-- singular data test (reference tests/spark/pulse pattern): money columns
-- of the gold user mart must never be negative
SELECT *
FROM {{ ref('gold_active_users_with_ephemeral') }}
WHERE gmv_per_day_initial < 0 OR gmv_per_day_final < 0 OR number_of_orders < 0
