-- singular test (reference tests/spark/pulse style): no negative aggregates
SELECT * FROM {{ ref('daily_user_stats') }}
WHERE n_events <= 0 OR total_value < 0
