{{ config(materialized='view', tags=['quality']) }}
-- quality gate: length + lexical diversity (vars compiled to literals,
-- so the predicates are pushdown-able constants)
SELECT doc_id,
       lang,
       source,
       text,
       size(tokens) AS n_tokens,
       size(array_distinct(tokens)) / size(tokens) AS distinct_ratio,
       CAST(CEIL(n_chars / 4.0) AS BIGINT) AS est_tokens
FROM {{ ref('stg_documents') }}
WHERE size(tokens) >= {{ var('min_tokens') }}
  AND size(array_distinct(tokens)) / size(tokens) >= {{ var('min_distinct_ratio') }}
