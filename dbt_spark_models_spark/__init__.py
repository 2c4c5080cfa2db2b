"""dbt_spark_models_spark — a PySpark-native analytics/transformation engine.

Re-implements, Spark-first, the capabilities of the reference dbt-on-Spark
project (``david-but-its-daweed/dbt-spark-models``, surveyed in SURVEY.md):

- ``plans/``     — the transformation framework: Jinja-templated SQL models,
                   ref()/source() dependency DAG, materializations (view /
                   table / incremental insert-overwrite / append), seeds,
                   SCD2 snapshots, singular tests. (Reference layer 1.)
- ``operators/`` — the query surface the reference's ~423 models exercise
                   (SURVEY.md §2) expressed idiomatically via the DataFrame
                   API / Spark SQL, plus LLM-data-pipeline operators
                   (dedup, similarity search, text analysis, multimodal).
- ``sources/``   — readers/writers: parquet testdata loader, CSV seeds,
                   partitioned sinks.
- ``functions/`` — engine-registered SQL functions (e.g. millis_to_ts_msk,
                   SURVEY.md §2.11).
- ``streaming/`` — Structured Streaming equivalents of the batch event
                   patterns (optional headroom; reference has none, §2.10).

Everything is designed for a large multi-executor cluster (partition-pruned
scans, broadcast-able dims, AQE) while being testable on local[N].
"""

__version__ = "0.1.0"
