"""The transformation framework (reference layer 1, SURVEY.md §1/§3).

A PySpark-native re-expression of what dbt + dbt-spark + the reference's
custom macros do, with the dbt→Thrift→server chain replaced by one
in-process SparkSession (SURVEY.md §7 architecture decision):

- ``project``     — project.yml + model/seed/snapshot/test discovery
- ``jinja``       — Jinja rendering with ref/source/var/config/
                    is_incremental/this (SURVEY.md §3.1 stages 2-4)
- ``graph``       — ref()/source() dependency DAG, topo order, selection
- ``materialize`` — view / table / incremental insert_overwrite / append
                    (SURVEY.md §2.1 sinks)
- ``snapshots``   — SCD2 timestamp/check strategies with
                    invalidate_hard_deletes (SURVEY.md §3.2)
- ``runner``      — execute a project: seeds → models → tests, with
                    run results (SURVEY.md §3.1 stage 7)
"""

from dbt_spark_models_spark.plans.project import Project
from dbt_spark_models_spark.plans.runner import RunResult, Runner

__all__ = ["Project", "Runner", "RunResult"]
