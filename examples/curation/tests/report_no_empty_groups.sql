-- singular test (reference shape: tests/spark/pulse/*): every report
-- group must have at least one doc and a positive token total
SELECT * FROM {{ ref('corpus_report') }}
WHERE n_docs <= 0 OR total_tokens <= 0
