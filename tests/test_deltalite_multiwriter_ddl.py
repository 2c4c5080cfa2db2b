"""Multi-writer fuzz, widened op alphabet (VERDICT r9 #5): the protocol
verbs most likely to race wrong — RESTORE racing appends, shallow CLONE
taken mid-mutation, schema evolution (append-new-column) racing plain
appends, CHECK-constraint ADD racing violating appends, and VACUUM
racing live writers and time-travel readers.

Semantics differ per arena, so unlike test_deltalite_multiwriter's
per-writer serial models, the universal invariants here are the
semantics-independent ones (shared ``_verify_chain``): contiguous
version chain, every version replays, protocol monotone, active files
exist, change feed telescopes to the final state — plus one arena-
specific invariant each (clone == some source version; evolved column
present and null-filled; no committed constraint violation; VACUUM
never eats a live writer's rows — the grace_ms regression).

Schedule count scales with SPARK_GRAFT_FUZZ_SCHEDULES like the base
fuzz (proof runs use 20+ per arena).
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import test_deltalite_multiwriter as mw  # noqa: E402
from dbt_spark_models_spark.sources import deltalite  # noqa: E402

N_SCHEDULES = int(os.environ.get("SPARK_GRAFT_FUZZ_SCHEDULES", "1"))
SEED_BASE = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED_BASE", "0"))
_retry = mw._retry


def _seed_table(spark, tdir):
    path = os.path.join(tdir, "t")
    deltalite.write(
        spark,
        spark.createDataFrame([(-1, "seed")], "k int, v string"),
        path,
        "overwrite",
    )
    return path


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def _run_threads(targets):
    errors: list[BaseException] = []

    def wrap(fn):
        def go():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        return go

    threads = [threading.Thread(target=wrap(t)) for t in targets]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[0]


def test_restore_races_appends(spark):
    """RESTORE is a whole-table rollback, so per-writer models cannot
    hold; what must: every restore commits against a consistent snapshot
    (put-if-absent, retried), the chain replays, and the change feed —
    which surfaces the rollback as deletes+inserts — telescopes to the
    final state."""
    for schedule in range(N_SCHEDULES):
        rng = random.Random(SEED_BASE + schedule)
        with tempfile.TemporaryDirectory(prefix="dlmw-restore-") as tdir:
            path = _seed_table(spark, tdir)

            def appender(wid):
                def go():
                    r = random.Random(SEED_BASE * 31 + schedule * 7 + wid)
                    for i in range(5):
                        rows = [(wid * 100 + i, r.choice("abcdef"))]
                        _retry(
                            lambda rr=rows: deltalite.write(
                                spark, _df(spark, rr), path, "append"
                            )
                        )

                return go

            def restorer():
                for _ in range(2):
                    time.sleep(rng.uniform(0.05, 0.3))
                    vs = deltalite._list_versions(path)
                    target = rng.choice(vs)
                    _retry(lambda t=target: deltalite.restore(spark, path, t))

            _run_threads([appender(w) for w in range(3)] + [restorer])
            final = mw._verify_chain(spark, path)
            # value vocabulary: every surviving row was written by a writer
            assert all(
                v[0] in "abcdef" or v[0] == "seed" for v in final.values()
            )


def test_clone_mid_mutation(spark):
    """A shallow clone taken while writers mutate the source must be a
    readable table whose active file set equals the SOURCE's at exactly
    one committed version (replay reads only committed log files, so a
    clone can never observe a torn snapshot)."""
    for schedule in range(N_SCHEDULES):
        with tempfile.TemporaryDirectory(prefix="dlmw-clone-") as tdir:
            path = _seed_table(spark, tdir)
            clones: list[str] = []

            def writer(wid):
                def go():
                    mw._writer_ops(
                        spark, path, wid, SEED_BASE + schedule, n_ops=4
                    )

                return go

            def cloner():
                r = random.Random(SEED_BASE + schedule + 977)
                for i in range(3):
                    time.sleep(r.uniform(0.02, 0.25))
                    dst = os.path.join(tdir, f"clone{i}")
                    deltalite.clone(spark, path, dst)
                    clones.append(dst)

            _run_threads([writer(w) for w in range(2)] + [cloner])

            def abs_active(p, version=None):
                st = deltalite._replay_state(p, version)
                return {
                    a if os.path.isabs(a) else os.path.join(os.path.abspath(p), a)
                    for a in st["active"]
                }

            src_versions = deltalite._list_versions(path)
            src_sets = {v: abs_active(path, v) for v in src_versions}
            for dst in clones:
                got = abs_active(dst)
                matches = [v for v, s in src_sets.items() if s == got]
                assert matches, f"clone {dst} matches no source version"
                v = matches[-1]
                assert (
                    deltalite.read(spark, dst).count()
                    == deltalite.read(spark, path, version=v).count()
                )


def test_schema_evolution_races_appends(spark):
    """One writer appends batches carrying a NEW column (additive
    evolution: one metadata commit, zero rewrites) while two others
    append the old shape. Final schema must carry the column, old-shape
    rows must null-fill it, and no writer's rows are lost."""
    for schedule in range(N_SCHEDULES):
        with tempfile.TemporaryDirectory(prefix="dlmw-evo-") as tdir:
            path = _seed_table(spark, tdir)
            wide_keys: list[int] = []

            def plain(wid):
                def go():
                    r = random.Random(SEED_BASE + schedule * 13 + wid)
                    for i in range(5):
                        rows = [(wid * 100 + i, r.choice("abc"))]
                        _retry(
                            lambda rr=rows: deltalite.write(
                                spark, _df(spark, rr), path, "append"
                            )
                        )

                return go

            def evolver():
                for i in range(4):
                    k = 900 + schedule * 10 + i
                    rows = [(k, "w", i)]
                    _retry(
                        lambda rr=rows: deltalite.write(
                            spark,
                            _df(spark, rr, "k int, v string, extra int"),
                            path,
                            "append",
                        )
                    )
                    wide_keys.append(k)

            _run_threads([plain(0), plain(1), evolver])
            final = mw._verify_chain(spark, path, value_cols=("v", "extra"))
            assert "extra" in deltalite.read(spark, path).columns
            for k, (v, extra) in final.items():
                if k in wide_keys:
                    assert extra is not None and v == "w"
                else:
                    assert extra is None, f"old-shape row {k} gained extra"


def test_constraint_add_races_appends(spark):
    """ADD CONSTRAINT validates the snapshot then commits metadata with
    put-if-absent — a concurrent append forces revalidation on retry.
    Once committed, every writer's next batch is checked before ITS
    commit: post-constraint violating appends must be refused loudly and
    leave no trace."""
    for schedule in range(N_SCHEDULES):
        with tempfile.TemporaryDirectory(prefix="dlmw-cons-") as tdir:
            path = _seed_table(spark, tdir)
            landed = threading.Event()
            refusals: list[int] = []

            def writer(wid):
                def go():
                    r = random.Random(SEED_BASE + schedule * 17 + wid)
                    for i in range(6):
                        if landed.is_set() and i == 4:
                            # violating append AFTER the constraint:
                            # must raise, never commit
                            try:
                                _retry(
                                    lambda: deltalite.write(
                                        spark,
                                        _df(spark, [(wid * 100 + 99, "zz")]),
                                        path,
                                        "append",
                                    )
                                )
                            except ValueError:
                                refusals.append(wid)
                            else:
                                raise AssertionError(
                                    "violating append committed"
                                )
                            continue
                        rows = [(wid * 100 + i, r.choice("abc"))]
                        _retry(
                            lambda rr=rows: deltalite.write(
                                spark, _df(spark, rr), path, "append"
                            )
                        )

                return go

            def constrainer():
                time.sleep(0.05)
                _retry(
                    lambda: deltalite.add_check_constraint(
                        spark, path, "no_zz", "v <> 'zz'"
                    )
                )
                landed.set()

            _run_threads([writer(0), writer(1), constrainer])
            final = mw._verify_chain(spark, path)
            assert all(v[0] != "zz" for v in final.values())
            cfg = deltalite._replay_state(path)["meta"]["configuration"]
            assert cfg.get("delta.constraints.no_zz") == "v <> 'zz'"
            assert len(refusals) == 2, refusals


def test_vacuum_races_writers_and_readers(spark):
    """VACUUM with a retention horizon runs WHILE writers append/optimize
    and readers time-travel. The grace window must keep it from eating a
    live writer's just-moved uncommitted files (no lost rows — the
    regression for vacuum grace_ms); reads at the latest version always
    succeed; reads past the horizon may fail but only LOUDLY (missing
    file), never with wrong data."""
    for schedule in range(N_SCHEDULES):
        with tempfile.TemporaryDirectory(prefix="dlmw-vac-") as tdir:
            path = _seed_table(spark, tdir)
            stop = threading.Event()
            models: dict[int, dict] = {}

            def writer(wid):
                def go():
                    r = random.Random(SEED_BASE + schedule * 23 + wid)
                    model = {}
                    for i in range(6):
                        rows = [(wid * 100 + i, r.choice("abc"))]
                        _retry(
                            lambda rr=rows: deltalite.write(
                                spark, _df(spark, rr), path, "append"
                            )
                        )
                        model.update(rows)
                        if i % 3 == 2:
                            _retry(lambda: deltalite.optimize(spark, path))
                    models[wid] = model

                return go

            def maintainer():
                while not stop.is_set():
                    time.sleep(0.1)
                    _retry(lambda: deltalite.vacuum(path, retain_versions=2))

            def reader():
                r = random.Random(SEED_BASE + schedule + 555)
                while not stop.is_set():
                    vs = deltalite._list_versions(path)
                    deltalite.read(spark, path).count()  # latest: must work
                    old = r.choice(vs)
                    try:
                        deltalite.read(spark, path, version=old).count()
                    except Exception:  # noqa: BLE001
                        # past the retention horizon: loud failure is the
                        # documented trade — never wrong data
                        assert old < max(vs) - 1
                    time.sleep(0.05)

            ws = [writer(w) for w in range(2)]
            aux = [threading.Thread(target=maintainer), threading.Thread(target=reader)]
            for t in aux:
                t.start()
            try:
                _run_threads(ws)
            finally:
                stop.set()
                for t in aux:
                    t.join()
            final = mw._verify_chain(spark, path, check_files=False)
            flat = {k: v[0] for k, v in final.items()}
            for wid, model in models.items():
                got = {
                    k: v
                    for k, v in flat.items()
                    if wid * 100 <= k <= wid * 100 + 99
                }
                assert got == model, (
                    f"vacuum ate writer {wid}'s rows: {got} != {model}"
                )


def test_vacuum_grace_unit(spark, tmp_path):
    """Deterministic core of the in-flight-writer protection: a fresh
    never-committed file survives the default grace; the same file aged
    past the grace is garbage; a COMMITTED file that fell out of the
    retention horizon goes regardless of age."""
    path = str(tmp_path / "t")
    deltalite.write(spark, _df(spark, [(1, "a")]), path, "overwrite")
    v0_files = set(deltalite._replay_state(path)["active"])
    # fabricate an in-flight writer's file: moved into place, no commit
    src = os.path.join(path, sorted(v0_files)[0])
    inflight = os.path.join(path, "part-inflight.parquet")
    import shutil

    shutil.copyfile(src, inflight)
    assert deltalite.vacuum(path) == []  # fresh: protected by grace
    old = time.time() - 3600
    os.utime(inflight, (old, old))
    assert deltalite.vacuum(path) == ["part-inflight.parquet"]  # aged: garbage
    # committed file outside the retention horizon: age-independent
    deltalite.write(spark, _df(spark, [(2, "b")]), path, "overwrite")
    removed = deltalite.vacuum(path, retain_versions=0)
    assert set(removed) == v0_files
