{{ config(materialized='view', tags=['staging']) }}
-- staging layer: typed event stream + seed-joined category
-- (reference shape: models/spark/base/* staging views)
SELECT e.event_id,
       e.user_id,
       e.event_type,
       c.category,
       CAST(c.weight AS INT) AS weight,
       e.value,
       e.ts,
       CAST(e.ts AS DATE) AS day
FROM {{ source('testdata', 'events') }} e
LEFT JOIN {{ ref('event_categories') }} c USING (event_type)
