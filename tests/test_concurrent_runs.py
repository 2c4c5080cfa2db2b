"""Concurrent-run isolation (VERDICT r8 #2).

Two layers:

1. THREADS, one SparkSession: two Runner builds of different projects in
   different databases execute simultaneously with zero cross-talk —
   results identical to serial builds. (The reference's real parallelism
   is Airflow fan-out of independent tasks; within one Spark app, jobs
   from concurrent threads are the supported equivalent.)
2. PROCESSES, separate JVMs: gate workspaces are pid-scoped
   (``operators.run_scope``), so two processes grading the same sf_dir
   never derive the same physical /tmp location — the r8 parallel-pytest
   FileScanRDD failure (shard A rmtree'ing a db dir shard B was mid-scan
   on) is structurally impossible now.
"""

from __future__ import annotations

import pytest

# thread/process isolation arenas: multi-minute by design — slow tier (r11 VERDICT #2);
# the default `pytest tests/` deselects it so the driver-visible
# suite completes in minutes.  Full sweep: pytest tests/ -m ''
pytestmark = pytest.mark.slow

import os
import shutil
import subprocess
import sys
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_db(spark, db):
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_conc/{db}", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '/tmp/spark_models_conc/{db}'")


def _build_mini_mart(spark, sf_dir, db):
    from dbt_spark_models_spark.plans import Project, Runner

    project = Project.load(os.path.join(REPO, "examples", "mini_mart"))
    r = Runner(
        spark=spark, project=project, database=db,
        vars={"sf_dir": sf_dir, "cutoff_date": "2024-01-10"},
    )
    res = [*r.seed(), *r.run()]
    assert all(x.status == "success" for x in res), res
    return f"{db}.daily_user_stats"


def _build_delta_mart(spark, sf_dir, db):
    from dbt_spark_models_spark.plans import Project, Runner

    project = Project.load(os.path.join(REPO, "examples", "delta_mart"))
    r = Runner(
        spark=spark, project=project, database=db,
        vars={"sf_dir": sf_dir, "cutoff_date": "1996-01-01"},
    )
    res = r.run()
    assert all(x.status == "success" for x in res), res
    from dbt_spark_models_spark.plans import deltalite_tables as dlt

    return dlt.view_name(db, "customer_rollup")


def test_two_runners_in_parallel_threads(spark, sf_dir):
    """mini_mart (catalog/parquet) and delta_mart (DeltaLite) build
    SIMULTANEOUSLY in one session; row counts match serial reference
    builds done afterwards."""
    for db in ("conc_mm", "conc_dm", "serial_mm", "serial_dm"):
        _fresh_db(spark, db)

    results: dict[str, object] = {}

    def run(name, fn, db):
        try:
            results[name] = fn(spark, sf_dir, db)
        except Exception as e:  # noqa: BLE001
            results[name] = e

    t1 = threading.Thread(target=run, args=("mm", _build_mini_mart, "conc_mm"))
    t2 = threading.Thread(target=run, args=("dm", _build_delta_mart, "conc_dm"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not isinstance(results["mm"], Exception), results["mm"]
    assert not isinstance(results["dm"], Exception), results["dm"]

    # serial reference builds
    ref_mm = _build_mini_mart(spark, sf_dir, "serial_mm")
    ref_dm = _build_delta_mart(spark, sf_dir, "serial_dm")

    mm = spark.table(results["mm"])
    dm = spark.table(results["dm"])
    assert mm.count() == spark.table(ref_mm).count()
    assert dm.count() == spark.table(ref_dm).count()
    assert mm.exceptAll(spark.table(ref_mm)).count() == 0
    assert dm.exceptAll(spark.table(ref_dm)).count() == 0


def test_same_project_two_databases_in_parallel(spark, sf_dir):
    """The sharper case: the SAME project built twice concurrently into
    different databases — staging names, source views, and DeltaLite temp
    views must all be namespaced per-db."""
    for db in ("conc_a", "conc_b"):
        _fresh_db(spark, db)
    results: dict[str, object] = {}

    def run(name, db):
        try:
            results[name] = _build_delta_mart(spark, sf_dir, db)
        except Exception as e:  # noqa: BLE001
            results[name] = e

    t1 = threading.Thread(target=run, args=("a", "conc_a"))
    t2 = threading.Thread(target=run, args=("b", "conc_b"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not isinstance(results["a"], Exception), results["a"]
    assert not isinstance(results["b"], Exception), results["b"]
    a = spark.table(results["a"])
    b = spark.table(results["b"])
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0


_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from dbt_spark_models_spark.session import get_spark
from dbt_spark_models_spark.operators.engine_gate import _shared_mini_mart
import tempfile
spark = get_spark("conc-child", shuffle_partitions=4,
                  extra_conf={{"spark.sql.warehouse.dir":
                               tempfile.mkdtemp(prefix="wh-conc-")}})
db = _shared_mini_mart(spark, {sf!r})
n = spark.table(f"{{db}}.daily_user_stats").count()
assert n > 0, n
print("CHILD_OK", n, flush=True)
spark.stop()
"""


def test_two_processes_grade_same_sf_without_clobbering(sf_dir):
    """Replicates the r8 failure shape: two separate JVMs build the
    engine-gate mini mart for the SAME sf_dir at the same time. With
    pid-scoped gate workspaces both must succeed and agree."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=REPO, sf=sf_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=480)[0] for p in procs]
    counts = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("CHILD_OK")]
        assert line, out[-3000:]
        counts.append(int(line[0].split()[1]))
    assert counts[0] == counts[1]
