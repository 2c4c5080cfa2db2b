"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
operators) as ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate. Implementations live in
``dbt_spark_models_spark/operators/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from dbt_spark_models_spark.functions.registry import register_engine_functions
    from dbt_spark_models_spark.operators import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_spark_models_spark.operators.relational import q1_pricing_summary

    return _prepared(q1_pricing_summary)(spark, "/root/testdata/sf0.001")


def _prepared(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query so required dynamic confs + engine functions are applied
    to whatever session the driver passes in."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dbt_spark_models_spark.session import ensure_session_confs

        return fn(ensure_session_confs(spark), sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _prepared(q.fn) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL ops)."""
    return {
        name: q.oracle for name, q in _registry().items() if q.oracle is not None
    }
