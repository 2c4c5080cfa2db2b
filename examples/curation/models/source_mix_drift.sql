{{ config(materialized='table', file_format='parquet', tags=['report']) }}
-- drift monitor: PSI of the source mix, curated corpus vs raw corpus —
-- flags when the quality gate + dedup reshapes corpus composition more
-- than expected (same Laplace-smoothed PSI as the engine operator
-- quality_distribution_drift)
WITH raw_counts AS (
    SELECT source, COUNT(*) AS n_raw
    FROM {{ ref('stg_documents') }}
    GROUP BY source
), kept_counts AS (
    SELECT source, COUNT(*) AS n_kept
    FROM {{ ref('doc_dedup') }}
    GROUP BY source
), joined AS (
    SELECT r.source, r.n_raw, COALESCE(k.n_kept, 0) AS n_kept
    FROM raw_counts r LEFT JOIN kept_counts k ON r.source = k.source
), probs AS (
    SELECT source, n_raw, n_kept,
           (n_raw + 1.0) / (SUM(n_raw) OVER () + COUNT(*) OVER ()) AS p_raw,
           (n_kept + 1.0) / (SUM(n_kept) OVER () + COUNT(*) OVER ()) AS p_kept
    FROM joined
)
SELECT source, n_raw, n_kept,
       ROUND((p_kept - p_raw) * LN(p_kept / p_raw), 6) AS psi_term,
       ROUND(SUM((p_kept - p_raw) * LN(p_kept / p_raw)) OVER (), 6) AS psi_total
FROM probs
