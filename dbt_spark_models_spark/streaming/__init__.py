from dbt_spark_models_spark.streaming.pipelines import (
    stream_daily_type_counts,
    stream_dedup_events,
    stream_session_counts,
    stream_sliding_window_counts,
    stream_static_enriched_counts,
    stream_stream_error_click_join,
    stream_into_deltalite_exactly_once,
    stream_into_partitioned_table,
    stream_user_gap_stats,
    stream_user_type_switches,
)

__all__ = [
    "stream_daily_type_counts",
    "stream_dedup_events",
    "stream_session_counts",
    "stream_sliding_window_counts",
    "stream_static_enriched_counts",
    "stream_stream_error_click_join",
    "stream_into_deltalite_exactly_once",
    "stream_into_partitioned_table",
    "stream_user_gap_stats",
    "stream_user_type_switches",
]
