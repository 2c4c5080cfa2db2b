from dbt_spark_models_spark.sources.testdata import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
