{{ config(materialized='view', tags=['activity']) }}
{{ activity_rollup('event_type') }}
