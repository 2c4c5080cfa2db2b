{{ config(materialized='table', file_format='parquet',
          partition_by=['lang'], tags=['report']) }}
-- corpus composition after curation, partitioned by language
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(est_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(distinct_ratio), 4) AS avg_distinct_ratio,
       lang
FROM {{ ref('doc_dedup') }}
GROUP BY source, lang
