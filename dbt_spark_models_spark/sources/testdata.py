"""Parquet source loader for the driver's synthetic testdata (TESTDATA.md).

Spark-first: each table is a lazy ``spark.read.parquet`` DataFrame; Catalyst
pushes projections/filters down to the parquet scan, so registering all
tables as temp views costs nothing until an action runs. At cluster scale
the same code reads a partitioned table directory; nothing here collects
to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# small dimension tables worth broadcasting in joins at any scale
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load testdata parquet tables as lazy DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            df = spark.read.parquet(p)
            # TIMESTAMP(NANOS) columns surface as long under
            # spark.sql.legacy.parquet.nanosAsLong — convert to µs
            # timestamps (floor, identical to DuckDB's ns→µs cast)
            if name == "events" and isinstance(
                df.schema["ts"].dataType, T.LongType
            ):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load and register each table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
