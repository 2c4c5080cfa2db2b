"""Property-based DeltaLite protocol test: random DML sequences vs a
plain-dict model.

Hypothesis drives arbitrary interleavings of append / overwrite / merge /
delete / optimize / restore against a DeltaLite table while a dict
mirrors the expected keyspace. After EVERY committed version:
- the latest snapshot equals the model exactly;
- every historical version still equals its recorded model state
  (time travel never decays as the log grows);
- the signed change feed telescopes to the final state (each change
  surfaced exactly once with the right polarity, through rewrites,
  layout-only commits, and restores).
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_spark_models_spark.sources import deltalite

# ops: ("append", rows) | ("overwrite", rows) | ("merge", rows) |
#      ("delete", cutoff) | ("optimize", n) | ("restore", rel_pos)
_rows = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from("abcdef")),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("overwrite"), _rows),
    st.tuples(st.just("merge"), _rows),
    st.tuples(st.just("delete"), st.integers(0, 9)),
    st.tuples(st.just("dvdelete"), st.integers(0, 9)),
    st.tuples(st.just("dvmerge"), _rows),
    st.tuples(st.just("update"), st.integers(0, 9)),
    st.tuples(st.just("optimize"), st.integers(1, 2)),
    st.tuples(st.just("restore"), st.integers(0, 100)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    first=_rows,
    ops=st.lists(_op, min_size=1, max_size=4),
)
def test_deltalite_random_dml_matches_model(spark, first, ops):
    with tempfile.TemporaryDirectory(prefix="dlprop-") as tdir:
        def df_of(rows):
            return spark.createDataFrame(rows, "k int, v string").coalesce(1)

        model: dict[int, str] = dict(first)
        deltalite.write(spark, df_of(first), tdir)
        history = {0: dict(model)}  # version -> expected state
        for kind, arg in ops:
            if kind == "append":
                # keep appends key-disjoint from the live state (the
                # table has no PK constraint; the model is a dict)
                rows = [(k, v) for k, v in arg if k not in model]
                if not rows:
                    continue
                v = deltalite.write(spark, df_of(rows), tdir, "append")
                model.update(rows)
            elif kind == "overwrite":
                v = deltalite.write(spark, df_of(arg), tdir, "overwrite")
                model = dict(arg)
            elif kind == "merge":
                v = deltalite.merge(spark, df_of(arg), tdir, ["k"])
                model.update(arg)
            elif kind == "dvmerge":  # merge-on-read upsert
                v = deltalite.merge(
                    spark, df_of(arg), tdir, ["k"], deletion_vectors=True
                )
                model.update(arg)
            elif kind == "delete":
                v, _, _ = deltalite.delete(spark, tdir, [("k", "<=", arg)])
                model = {k: x for k, x in model.items() if k > arg}
            elif kind == "update":  # COW or DV picked by parity
                v, _, touched = deltalite.update(
                    spark,
                    tdir,
                    [("k", "<=", arg)],
                    {"v": "upper(v)"},
                    deletion_vectors=bool(arg % 2),
                )
                if not touched and v in history:
                    continue  # no-op: stats matched nothing, no commit
                model = {
                    k: (x.upper() if k <= arg else x)
                    for k, x in model.items()
                }
            elif kind == "dvdelete":  # merge-on-read tombstones
                v, _, touched = deltalite.delete(
                    spark, tdir, [("k", ">=", arg)], deletion_vectors=True
                )
                if not touched and v in history:
                    continue  # no-op: nothing matched, no commit
                model = {k: x for k, x in model.items() if k < arg}
            elif kind == "optimize":
                v = deltalite.optimize(spark, tdir, n_files=arg)
                # layout only: state unchanged
            else:  # restore to an arbitrary recorded version
                versions = sorted(history)
                target = versions[arg % len(versions)]
                v = deltalite.restore(spark, tdir, target)
                model = dict(history[target])
            history[v] = dict(model)
            got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
            assert got == model, f"after {kind}: {got} != {model}"
        # every historical version still replays exactly
        for ver, expected in history.items():
            got = {
                r.k: r.v
                for r in deltalite.read(spark, tdir, version=ver).collect()
            }
            assert got == expected, f"version {ver} decayed"
        # the signed change feed telescopes to the final state
        feed = deltalite.read_changes(spark, tdir).collect()
        state: dict[int, str] = {}
        # within one commit, deletes apply before inserts (an overwrite
        # deletes and re-inserts the same key in the same commit)
        order = {"delete": 0, "update_preimage": 0, "insert": 1, "update_postimage": 1}
        for r in sorted(
            feed, key=lambda r: (r._commit_version, order[r._change_type])
        ):
            if r._change_type in ("insert", "update_postimage"):
                state[r.k] = r.v
            elif r._change_type == "delete":
                state.pop(r.k, None)
        assert state == model, "change feed does not telescope to final state"


# schema-lifecycle alphabet: rename (metadata-only, toggles the value
# column's logical name), evolve (append that adds / carries the extra
# column s), plain append (OMITS s — readers null-fill), overwrite
# (resets schema: drops s and the mapping), merge (full current columns),
# delete, optimize (exercises the mapped compaction path), restore.
_srows = st.lists(
    st.tuples(
        st.integers(0, 9), st.sampled_from("abcdef"), st.integers(0, 99)
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: r[0],
)
_sop = st.one_of(
    st.tuples(st.just("rename"), st.none()),
    st.tuples(st.just("evolve"), _srows),
    st.tuples(st.just("append"), _srows),
    st.tuples(st.just("overwrite"), _srows),
    st.tuples(st.just("merge"), _srows),
    st.tuples(st.just("delete"), st.integers(0, 9)),
    st.tuples(st.just("optimize"), st.integers(1, 2)),
    st.tuples(st.just("restore"), st.integers(0, 100)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(first=_srows, ops=st.lists(_sop, min_size=1, max_size=5))
def test_deltalite_schema_lifecycle_random(spark, first, ops):
    """Random interleavings of column RENAME, additive schema EVOLUTION
    (on mapped and unmapped tables), schema-resetting OVERWRITE, DML,
    OPTIMIZE, and RESTORE: after every commit the snapshot AND every
    historical version must match the model, including which logical
    column names and which columns each version's schema exposes."""
    with tempfile.TemporaryDirectory(prefix="dlprop-") as tdir:

        def df2(rows, colname):
            return spark.createDataFrame(
                [(k, v) for k, v, _ in rows], f"k int, {colname} string"
            ).coalesce(1)

        def df3(rows, colname):
            return spark.createDataFrame(
                [(k, v, s) for k, v, s in rows],
                f"k int, {colname} string, s int",
            ).coalesce(1)

        colname, has_s = "v", False
        model = {k: (v, None) for k, v, _ in first}
        deltalite.write(spark, df2(first, colname), tdir)
        history = {0: (colname, has_s, dict(model))}
        for kind, arg in ops:
            if kind == "rename":
                new = "w" if colname == "v" else "v"
                ver = deltalite.rename_column(tdir, colname, new)
                colname = new
            elif kind == "evolve":
                rows = [r for r in arg if r[0] not in model]
                if not rows:
                    continue
                ver = deltalite.write(spark, df3(rows, colname), tdir, "append")
                model.update({k: (v, s) for k, v, s in rows})
                has_s = True
            elif kind == "append":
                rows = [r for r in arg if r[0] not in model]
                if not rows:
                    continue
                ver = deltalite.write(spark, df2(rows, colname), tdir, "append")
                model.update({k: (v, None) for k, v, _ in rows})
            elif kind == "overwrite":
                ver = deltalite.write(spark, df2(arg, colname), tdir)
                model = {k: (v, None) for k, v, _ in arg}
                has_s = False
            elif kind == "merge":
                src = df3(arg, colname) if has_s else df2(arg, colname)
                ver = deltalite.merge(spark, src, tdir, ["k"])
                model.update(
                    {k: (v, s if has_s else None) for k, v, s in arg}
                )
            elif kind == "delete":
                ver, _, _ = deltalite.delete(spark, tdir, [("k", "<=", arg)])
                model = {k: t for k, t in model.items() if k > arg}
            elif kind == "optimize":
                ver = deltalite.optimize(spark, tdir, n_files=arg)
            else:
                versions = sorted(history)
                target = versions[arg % len(versions)]
                ver = deltalite.restore(spark, tdir, target)
                colname, has_s, past = history[target]
                model = dict(past)
            history[ver] = (colname, has_s, dict(model))
            got_df = deltalite.read(spark, tdir)
            expect_cols = ["k", colname] + (["s"] if has_s else [])
            assert got_df.columns == expect_cols, (kind, got_df.columns)
            got = {
                r["k"]: (r[colname], r["s"] if has_s else None)
                for r in got_df.collect()
            }
            assert got == model, f"after {kind}: {got} != {model}"
        for ver, (cn, hs, expected) in history.items():
            tv = deltalite.read(spark, tdir, version=ver)
            assert tv.columns == ["k", cn] + (["s"] if hs else [])
            got = {
                r["k"]: (r[cn], r["s"] if hs else None) for r in tv.collect()
            }
            assert got == expected, f"version {ver} decayed"
