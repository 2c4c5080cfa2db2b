{{ config(materialized='view', tags=['staging']) }}
-- staging: tokenized documents (Spark higher-order filter in SQL text,
-- reference staging-view shape: models/spark/base/*)
SELECT doc_id,
       lang,
       source,
       n_chars,
       text,
       filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS tokens
FROM {{ source('testdata', 'documents') }}
