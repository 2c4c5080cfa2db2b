"""Operator/query registry.

Each operator module registers named queries with the ``@query`` decorator.
A query is a callable ``(spark, sf_dir) -> DataFrame`` built with the
DataFrame API / Spark SQL; ``oracle`` is the equivalent ANSI SQL for the
DuckDB correctness oracle (None for non-SQL-expressible ops — the driver
then records a weaker rows-only check).

Importing this package imports all operator modules, populating REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (side effect: registry population).

    Import order IS registry order IS the driver's grading order: a driver
    with a fixed query budget grades from the front.  Modules whose queries
    have never received a hard driver signal (TPC-H battery, joins, windows,
    scalars, nested, funnels, formats, similarity, streaming, multimodal,
    reshape, grouped_pandas, quality, text) come first; modules whose
    queries were driver-graded green in rounds 1-2 (aggregates, arrays,
    clustering, contamination, curation, dedup, engine_gate) come last.
    """
    from dbt_spark_models_spark.operators import (  # noqa: F401
        relational,
        relational2,
        relational3,
        joins,
        formats,
        windows,
        scalars,
        nested,
        funnels,
        similarity,
        streaming_gate,
        multimodal,
        reshape,
        grouped_pandas,
        tokenizer,
        skew,
        pysource_gate,
        udtf_gate,
        quality,
        text,
        aggregates,
        arrays,
        clustering,
        contamination,
        curation,
        dedup,
        engine_gate,
    )

    return REGISTRY
