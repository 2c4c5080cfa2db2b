{{ config(materialized='table', file_format='parquet', tags=['dedup']) }}
-- exact dedup keep-first by content hash (reference content-signature
-- pattern: models/spark/onfy/onfy_product_analogues.sql:50-57)
SELECT doc_id, lang, source, n_tokens, distinct_ratio, est_tokens
FROM (
    SELECT q.*,
           ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                              ORDER BY doc_id) AS rn
    FROM {{ ref('doc_quality') }} q
)
WHERE rn = 1
