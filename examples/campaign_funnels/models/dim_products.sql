{{ config(materialized='view', meta={'model_owner': '@onfy.replica'}) }}

-- Product dictionary (reference onfy_source_campaign_funnels.sql:23-42
-- dim_product_dict): one row per product with its medicine-group key,
-- which drives the group-mate expansion used by the
-- preview -> cart-adding attribution step.

SELECT
    p_partkey AS product_id,
    p_brand AS medicine_group_id,
    p_name AS product_name,
    p_type AS unit,
    p_retailprice AS price
FROM {{ source('mart', 'part') }}
WHERE p_partkey < 10
