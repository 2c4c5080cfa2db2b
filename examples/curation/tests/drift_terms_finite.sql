-- singular test: smoothing must keep every PSI term finite and defined
SELECT * FROM {{ ref('source_mix_drift') }}
WHERE psi_term IS NULL OR isnan(psi_term) OR abs(psi_term) > 100
