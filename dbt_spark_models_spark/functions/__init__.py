from dbt_spark_models_spark.functions.registry import register_engine_functions

__all__ = ["register_engine_functions"]
