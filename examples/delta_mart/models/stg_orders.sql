{{ config(materialized='view', tags=['staging']) }}
-- staging view: exact integer cents keep every downstream money sum on
-- the 2-decimal grid (cross-engine deterministic)
SELECT o_orderkey,
       o_custkey,
       o_orderstatus,
       o_orderdate,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM {{ source('testdata', 'orders') }}
