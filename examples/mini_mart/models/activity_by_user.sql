{{ config(materialized='view', tags=['activity']) }}
{{ activity_rollup('user_id') }}
