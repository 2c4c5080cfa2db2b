"""DeltaLite transaction-log protocol invariants (sources/deltalite.py):
the ACID corners the registry gates can't hash-check — commit atomicity
races, uncommitted-file invisibility, vacuum safety, empty snapshots."""

from __future__ import annotations

import pytest
# DeltaLite protocol suite, 81 multi-action tests (923s measured in the r12 full-sweep duration run): slow tier
# (r11 VERDICT #2) so the driver-visible default `pytest tests/`
# completes in minutes.  Full sweep: pytest tests/ -m ''
pytestmark = pytest.mark.slow

import json
import os
import tempfile

import pytest

from dbt_spark_models_spark.sources import deltalite


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory(prefix="deltalite-") as d:
        yield d


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_create_append_overwrite_versions(spark, tdir):
    assert deltalite.write(spark, _df(spark, [(1, "a")]), tdir) == 0
    assert deltalite.write(spark, _df(spark, [(2, "b")]), tdir, "append") == 1
    assert deltalite.write(spark, _df(spark, [(3, "c")]), tdir, "overwrite") == 2
    assert deltalite.latest_version(tdir) == 2
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {3}
    assert {r.k for r in deltalite.read(spark, tdir, version=1).collect()} == {1, 2}
    assert {r.k for r in deltalite.read(spark, tdir, version=0).collect()} == {1}


def test_uncommitted_files_invisible(spark, tdir):
    """Spec property: a data file is invisible until an add-action commits
    it — a crashed writer can leave garbage, never corrupt a snapshot."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    # simulate a crashed writer: a parquet file in the root, no commit
    _df(spark, [(99, "garbage")]).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tdir, "_crash_staging")
    )
    for f in os.listdir(os.path.join(tdir, "_crash_staging")):
        if f.endswith(".parquet"):
            os.rename(
                os.path.join(tdir, "_crash_staging", f),
                os.path.join(tdir, "part-deadbeef.parquet"),
            )
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1}
    # vacuum deletes exactly the never-committed garbage (grace_ms=0:
    # no concurrent writer in this test; the default grace would keep
    # the fresh-mtime garbage as a possible in-flight writer's file)
    removed = deltalite.vacuum(tdir, grace_ms=0)
    assert removed == ["part-deadbeef.parquet"]
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1}


def test_vacuum_keeps_time_travel_files(spark, tdir):
    """Files removed by an overwrite stay on disk (still referenced by
    earlier versions' add-actions) so time travel keeps working."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]), tdir, "overwrite")
    assert deltalite.vacuum(tdir) == []
    assert {r.k for r in deltalite.read(spark, tdir, version=0).collect()} == {1}


def test_concurrent_commit_race_loses_cleanly(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    # both writers computed version 1; the second O_EXCL create must fail
    deltalite._commit(tdir, 1, [{"commitInfo": {"operation": "X"}}])
    with pytest.raises(deltalite.ConcurrentWriteError):
        deltalite._commit(tdir, 1, [{"commitInfo": {"operation": "Y"}}])


def test_empty_snapshot_keeps_schema(spark, tdir):
    deltalite.write(spark, _df(spark, []), tdir)
    got = deltalite.read(spark, tdir)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]


def test_merge_updates_and_inserts_one_commit(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]), tdir)
    v = deltalite.merge(
        spark, _df(spark, [(2, "B"), (3, "c")]), tdir, ["k"]
    )
    assert v == 1  # rewrite + swap in ONE commit
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # pre-merge snapshot unchanged
    pre = {r.k: r.v for r in deltalite.read(spark, tdir, version=0).collect()}
    assert pre == {1: "a", 2: "b"}


def test_checkpoint_compacts_replay(spark, tdir):
    """After CHECKPOINT_INTERVAL commits a parquet checkpoint +
    _last_checkpoint pointer appear, reads resolve from it, and
    time travel to PRE-checkpoint versions still works (JSON log kept)."""
    import os as _os

    for i in range(deltalite.CHECKPOINT_INTERVAL + 2):
        deltalite.write(spark, _df(spark, [(i, str(i))]), tdir, "append")
    log = _os.path.join(tdir, "_delta_log")
    assert "_last_checkpoint" in _os.listdir(log)
    assert any(f.endswith(".checkpoint.parquet") for f in _os.listdir(log))
    n = deltalite.CHECKPOINT_INTERVAL + 2
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == set(range(n))
    # pre-checkpoint time travel unaffected
    assert {r.k for r in deltalite.read(spark, tdir, version=2).collect()} == {0, 1, 2}
    # corrupt checkpoint pointer → reader falls back to full JSON replay
    with open(_os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write("not json")
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == set(range(n))


def test_txn_append_is_exactly_once(spark, tdir):
    """The spec's txn token: a retried micro-batch (same appId+version)
    must be a no-op, a new version must append."""
    assert deltalite.txn_append(spark, _df(spark, [(1, "a")]), tdir, "job", 0) == 0
    # failure-retry of batch 0: already committed → no-op
    assert deltalite.txn_append(spark, _df(spark, [(1, "a")]), tdir, "job", 0) is None
    assert deltalite.txn_append(spark, _df(spark, [(2, "b")]), tdir, "job", 1) == 1
    # another app's batch 0 is independent
    assert deltalite.txn_append(spark, _df(spark, [(3, "c")]), tdir, "other", 0) == 2
    got = sorted(r.k for r in deltalite.read(spark, tdir).collect())
    assert got == [1, 2, 3]


def test_data_skipping_prunes_disjoint_files_losslessly(spark, tdir):
    """Three single-file commits with disjoint k ranges: a k<=15 read must
    plan over exactly 2 files and still return every matching row."""
    for lo in (0, 10, 20):
        deltalite.write(
            spark,
            _df(spark, [(lo + j, f"v{lo + j}") for j in range(5)]).coalesce(1),
            tdir,
            "overwrite" if lo == 0 else "append",
        )
    filt = [("k", "<=", 15)]
    kept, total = deltalite.scan_file_counts(tdir, skip_filters=filt)
    assert (kept, total) == (2, 3)
    got = {
        r.k
        for r in deltalite.read(spark, tdir, skip_filters=filt)
        .filter("k <= 15")
        .collect()
    }
    assert got == set(range(5)) | {10, 11, 12, 13, 14}
    # equality and lower-bound predicates prune too
    assert deltalite.scan_file_counts(tdir, skip_filters=[("k", "=", 21)])[0] == 1
    assert deltalite.scan_file_counts(tdir, skip_filters=[("k", ">=", 20)])[0] == 1


def test_data_skipping_keeps_files_without_stats(spark, tdir):
    """Pruning must be lossless: a file whose add-action lacks stats (or
    lacks the filtered column) is never skipped."""
    import json as _json
    import os as _os

    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    log = _os.path.join(tdir, "_delta_log")
    vf = _os.path.join(log, f"{0:020d}.json")
    lines = []
    with open(vf) as f:
        for line in f:
            a = _json.loads(line)
            if "add" in a:
                a["add"].pop("stats", None)
            lines.append(_json.dumps(a))
    with open(vf, "w") as f:
        f.write("\n".join(lines) + "\n")
    kept, total = deltalite.scan_file_counts(
        tdir, skip_filters=[("k", ">=", 999)]
    )
    assert (kept, total) == (1, 1)
    # string stats: skip on lexicographic range
    deltalite.write(spark, _df(spark, [(2, "mmm")]).coalesce(1), tdir, "append")
    kept, _ = deltalite.scan_file_counts(tdir, skip_filters=[("v", ">=", "zzz")])
    assert kept == 1  # only the stats-less file survives


def test_optimize_compacts_without_changing_content(spark, tdir):
    """OPTIMIZE: content bit-identical, fewer files, dataChange=false on
    every add/remove, and pre-optimize versions still time-travel."""
    import json as _json
    import os as _os

    for i in range(5):
        deltalite.write(
            spark,
            _df(spark, [(i, f"v{i}")]).coalesce(1),
            tdir,
            "overwrite" if i == 0 else "append",
        )
    before = deltalite.scan_file_counts(tdir)[1]
    v = deltalite.optimize(spark, tdir, n_files=1)
    assert v == 5
    after = deltalite.scan_file_counts(tdir)[1]
    assert before == 5 and after == 1
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == set(range(5))
    # the optimize commit is layout-only
    with open(_os.path.join(tdir, "_delta_log", f"{v:020d}.json")) as f:
        for line in f:
            a = _json.loads(line)
            for kind in ("add", "remove"):
                if kind in a:
                    assert a[kind]["dataChange"] is False
    # pre-optimize snapshots unaffected
    assert {r.k for r in deltalite.read(spark, tdir, version=2).collect()} == {0, 1, 2}


def test_delete_rewrites_only_intersecting_files(spark, tdir):
    """Copy-on-write DELETE: stats-disjoint files keep their exact paths
    (never rewritten), a fully-matching file disappears with no
    replacement, NULL predicate values are kept, all in one commit."""
    for lo in (0, 10, 20):
        deltalite.write(
            spark,
            _df(spark, [(lo + j, f"v{lo + j}") for j in range(5)]).coalesce(1),
            tdir,
            "overwrite" if lo == 0 else "append",
        )
    paths_before = set(deltalite._replay(tdir)[0])
    v, untouched, rewritten = deltalite.delete(spark, tdir, [("k", "<=", 12)])
    assert v == 3 and untouched == 1 and rewritten == 2
    paths_after = set(deltalite._replay(tdir)[0])
    # the 20..24 file survives byte-identical (same committed path)
    assert len(paths_before & paths_after) == 1
    got = sorted(r.k for r in deltalite.read(spark, tdir).collect())
    assert got == [13, 14, 20, 21, 22, 23, 24]
    # pre-delete snapshot intact
    assert len(deltalite.read(spark, tdir, version=2).collect()) == 15


def test_delete_keeps_null_predicate_rows(spark, tdir):
    deltalite.write(
        spark,
        spark.createDataFrame([(1, "a"), (None, "n")], "k int, v string")
        .coalesce(1),
        tdir,
    )
    deltalite.delete(spark, tdir, [("k", "<=", 5)])
    got = {r.v for r in deltalite.read(spark, tdir).collect()}
    assert got == {"n"}  # NULL k does not match the predicate → kept


def _run_stream_batch(spark, tdir, ckpt, out_rows):
    """Drive the deltalite_stream source over all available commits via
    foreachBatch, accumulating rows into out_rows."""
    from dbt_spark_models_spark.sources.deltalite_stream import (
        DeltaLiteStreamSource,
    )

    try:
        spark.dataSource.register(DeltaLiteStreamSource)
    except Exception:  # noqa: BLE001
        pass
    stream = spark.readStream.format("deltalite_stream").option("path", tdir).load()

    def _sink(df, _bid):
        out_rows.extend((r.k, r.v) for r in df.collect())

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_source_resumes_from_checkpoint(spark, tdir):
    """Offsets are log versions persisted in the query checkpoint: a
    restarted query emits ONLY commits made since the last run."""
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "append")
    ckpt = _tf.mkdtemp(prefix="dlstream-ckpt-")
    got: list = []
    _run_stream_batch(spark, tdir, ckpt, got)
    assert sorted(got) == [(1, "a"), (2, "b")]
    # restart after two more commits (and an invisible OPTIMIZE)
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "append")
    deltalite.optimize(spark, tdir, n_files=1)
    deltalite.write(spark, _df(spark, [(4, "d")]).coalesce(1), tdir, "append")
    got2: list = []
    _run_stream_batch(spark, tdir, ckpt, got2)
    assert sorted(got2) == [(3, "c"), (4, "d")]  # no re-emission, no optimize rows


def test_stream_source_rejects_data_rewrite(spark, tdir):
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "overwrite")
    got: list = []
    with pytest.raises(Exception, match="append-style|STREAM_FAILED|rewrites"):
        _run_stream_batch(
            spark, tdir, _tf.mkdtemp(prefix="dlstream-ckpt-"), got
        )


def test_schema_evolution_append_new_column(spark, tdir):
    """Appending a batch with an extra column evolves the table schema
    (latest commit's metaData wins): old files null-fill the new column,
    and time travel still sees the old schema."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    wide = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, score double")
    deltalite.write(spark, wide.coalesce(1), tdir, "append")
    got = deltalite.read(spark, tdir)
    assert [f.name for f in got.schema.fields] == ["k", "v", "score"]
    rows = {r.k: r.score for r in got.collect()}
    assert rows == {1: None, 2: 9.5}
    assert deltalite.read(spark, tdir, version=0).columns == ["k", "v"]


def test_vacuum_retention_drops_old_snapshots_only(spark, tdir):
    """retain_versions=1 keeps the files of the last two versions; a file
    referenced only by older snapshots is physically deleted, recent time
    travel still works."""
    for i in range(3):
        deltalite.write(
            spark, _df(spark, [(i, str(i))]).coalesce(1), tdir, "overwrite"
        )
    removed = deltalite.vacuum(tdir, retain_versions=1)
    assert len(removed) == 1  # v0's file, referenced by no retained version
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {2}
    assert {r.k for r in deltalite.read(spark, tdir, version=1).collect()} == {1}


def test_merge_rejects_duplicate_source_keys(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    with pytest.raises(ValueError, match="duplicate"):
        deltalite.merge(
            spark, _df(spark, [(2, "x"), (2, "y")]), tdir, ["k"]
        )


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, day string")


def test_partitioned_write_layout_and_read(spark, tdir):
    """partition_by gives hive-style dirs + partitionValues on every add;
    read() reconstructs the partition column (it is NOT in the files) in
    the committed order."""
    df = _pdf(spark, [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d2")])
    deltalite.write(spark, df.repartition("day"), tdir, partition_by=["day"])
    assert os.path.isdir(os.path.join(tdir, "day=d1"))
    got = deltalite.read(spark, tdir)
    assert got.columns == ["k", "v", "day"]
    assert {(r.k, r.day) for r in got.collect()} == {
        (1, "d1"), (2, "d2"), (3, "d2")
    }
    # the data files must NOT contain the partition column
    import pyarrow.parquet as pq

    f = next(
        os.path.join(tdir, "day=d1", x)
        for x in os.listdir(os.path.join(tdir, "day=d1"))
        if x.endswith(".parquet")
    )
    assert "day" not in pq.ParquetFile(f).schema_arrow.names


def test_partition_pruning_skips_files(spark, tdir):
    df = _pdf(spark, [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")])
    deltalite.write(spark, df.repartition("day"), tdir, partition_by=["day"])
    kept, total = deltalite.scan_file_counts(
        tdir, skip_filters=[("day", "=", "d2")]
    )
    assert (kept, total) == (1, 3)
    got = deltalite.read(spark, tdir, skip_filters=[("day", "=", "d2")])
    assert [(r.k, r.day) for r in got.collect()] == [(2, "d2")]


def test_partition_pruning_int_range_and_null(spark, tdir):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "k int, bucket int"
    )
    deltalite.write(
        spark, df.repartition("bucket"), tdir, partition_by=["bucket"]
    )
    # int-typed partitionValues compare numerically, not lexically
    kept, total = deltalite.scan_file_counts(
        tdir, skip_filters=[("bucket", ">=", 15)]
    )
    assert (kept, total) == (1, 3)  # null partition provably disjoint too
    got = deltalite.read(spark, tdir, skip_filters=[("bucket", ">=", 15)])
    assert [r.k for r in got.collect()] == [2]


def test_partitioned_append_delete_vacuum(spark, tdir):
    deltalite.write(
        spark,
        _pdf(spark, [(1, "a", "d1")]).coalesce(1),
        tdir,
        partition_by=["day"],
    )
    # append inherits the table's partitioning without restating it
    deltalite.write(
        spark, _pdf(spark, [(2, "b", "d2")]).coalesce(1), tdir, "append"
    )
    with pytest.raises(ValueError, match="partitioning"):
        deltalite.write(
            spark,
            _pdf(spark, [(9, "x", "d9")]).coalesce(1),
            tdir,
            "append",
            partition_by=["v"],
        )
    # targeted delete leaves the d1 file untouched (partitionValues prove
    # disjointness) and rewrites only d2's
    version, untouched, rewritten = deltalite.delete(
        spark, tdir, [("day", "=", "d2")]
    )
    assert (untouched, rewritten) == (1, 1)
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1}
    # vacuum walks partition subdirectories
    removed = deltalite.vacuum(tdir, retain_versions=0)
    assert len(removed) == 1 and removed[0].startswith("day=d2/")


def test_partitioned_stream_source_rebuilds_partition_column(spark, tdir):
    from dbt_spark_models_spark.sources.deltalite_stream import (
        DeltaLiteStreamReader,
    )

    deltalite.write(
        spark,
        _pdf(spark, [(1, "a", "d1"), (2, "b", "d2")]).repartition("day"),
        tdir,
        partition_by=["day"],
    )
    rows = sorted(DeltaLiteStreamReader({"path": tdir})._rows_for_versions(-1, 0))
    assert rows == [(1, "a", "d1"), (2, "b", "d2")]


def test_rename_column_metadata_only(spark, tdir):
    """rename_column is ONE metadata commit: no file is added, removed,
    or rewritten; reads alias physical→logical; time travel before the
    rename sees the old name; appends after it keep working (new files
    carry physical names)."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    files_before = {
        f for f in os.listdir(tdir) if f.endswith(".parquet")
    }
    v = deltalite.rename_column(tdir, "v", "label")
    assert v == 1
    assert {
        f for f in os.listdir(tdir) if f.endswith(".parquet")
    } == files_before
    assert deltalite.read(spark, tdir).columns == ["k", "label"]
    assert deltalite.read(spark, tdir, version=0).columns == ["k", "v"]
    # append with the NEW logical name, then read both files coherently
    two = spark.createDataFrame([(2, "b")], "k int, label string")
    deltalite.write(spark, two.coalesce(1), tdir, "append")
    assert {(r.k, r.label) for r in deltalite.read(spark, tdir).collect()} == {
        (1, "a"), (2, "b")
    }
    # data skipping on the renamed column's stats still works (stats are
    # keyed by physical name in the log)
    kept, total = deltalite.scan_file_counts(
        tdir, skip_filters=[("k", ">=", 2)]
    )
    assert (kept, total) == (1, 2)


def test_rename_column_guards(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    with pytest.raises(ValueError, match="no column"):
        deltalite.rename_column(tdir, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        deltalite.rename_column(tdir, "v", "k")
    deltalite.rename_column(tdir, "v", "label")
    # retyping an existing column is still rejected on a mapped table
    bad = spark.createDataFrame([(2, 9)], "k int, label int")
    with pytest.raises(ValueError, match="retypes"):
        deltalite.write(spark, bad.coalesce(1), tdir, "append")


def test_mapped_append_schema_evolution(spark, tdir):
    """Additive schema evolution on a COLUMN-MAPPED table: the new field
    mints a fresh physical name (col-<uuid>), old files null-fill, and
    the new column is itself immediately renameable metadata-only."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.rename_column(tdir, "v", "label")
    wide = spark.createDataFrame(
        [(2, "b", 1.5)], "k int, label string, s double"
    )
    deltalite.write(spark, wide.coalesce(1), tdir, "append")
    got = {
        (r.k, r.label, r.s) for r in deltalite.read(spark, tdir).collect()
    }
    assert got == {(1, "a", None), (2, "b", 1.5)}
    # the evolved field carries a col-<uuid> physical name in the log
    state = deltalite._replay_state(tdir)
    fields = {
        f["name"]: (f.get("metadata") or {})
        for f in json.loads(state["meta"]["schemaString"])["fields"]
    }
    assert fields["s"].get(deltalite._PHYS_KEY, "").startswith("col-")
    # a batch may still OMIT existing columns (readers null-fill)
    deltalite.write(
        spark,
        spark.createDataFrame([(3,)], "k int").coalesce(1),
        tdir,
        "append",
    )
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2, 3}
    # renaming the evolved column is one metadata commit
    files_before = {
        f for f in os.listdir(tdir) if f.endswith(".parquet")
    }
    deltalite.rename_column(tdir, "s", "score")
    assert {
        f for f in os.listdir(tdir) if f.endswith(".parquet")
    } == files_before
    assert deltalite.read(spark, tdir).columns == ["k", "label", "score"]


def test_optimize_zorder_within_partitions(spark, tdir):
    """ZORDER on a hive-partitioned table clusters WITHIN each partition:
    every partition directory ends up with ≤ n_files files, all rows
    survive, and the partition layout + metaData are preserved."""
    rows = [(i, f"d{i % 3}", i % 7, (i * 5) % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "id int, day string, xk int, yk int")
    deltalite.write(spark, df.repartition(4), tdir, partition_by=["day"])
    v = deltalite.optimize(spark, tdir, n_files=2, zorder_by=("xk", "yk"))
    got = deltalite.read(spark, tdir).collect()
    assert len(got) == 60
    assert {r.id for r in got} == set(range(60))
    state = deltalite._replay_state(tdir, v)
    assert state["meta"]["partitionColumns"] == ["day"]
    per_part: dict[str, int] = {}
    for p in state["active"]:
        part = p.split("/")[0]
        assert part.startswith("day=")
        per_part[part] = per_part.get(part, 0) + 1
    assert set(per_part) == {"day=d0", "day=d1", "day=d2"}
    assert all(n <= 2 for n in per_part.values())


def test_optimize_preserves_mapping_and_config(spark, tdir):
    """OPTIMIZE is layout-only: the metaData (column mapping + table
    configuration) survives verbatim, and reads before/after agree."""
    deltalite.write(
        spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(3), tdir
    )
    deltalite.rename_column(tdir, "v", "label")
    before = {(r.k, r.label) for r in deltalite.read(spark, tdir).collect()}
    v = deltalite.optimize(spark, tdir, n_files=1)
    after = {(r.k, r.label) for r in deltalite.read(spark, tdir).collect()}
    assert before == after
    meta = deltalite._replay_state(tdir, v)["meta"]
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    # compacted files carry PHYSICAL headers, consistent with the mapping
    assert deltalite.read(spark, tdir, version=1).columns == ["k", "label"]


def test_rename_then_delete_and_merge(spark, tdir):
    from pyspark.sql import functions as F  # noqa: N812

    deltalite.write(
        spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), tdir
    )
    deltalite.rename_column(tdir, "v", "label")
    deltalite.delete(spark, tdir, [("k", "=", 2)])
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 3}
    src = spark.createDataFrame([(3, "C"), (4, "d")], "k int, label string")
    deltalite.merge(spark, src, tdir, ["k"])
    got = {(r.k, r.label) for r in deltalite.read(spark, tdir).collect()}
    assert got == {(1, "a"), (3, "C"), (4, "d")}


def test_optimize_zorder_routes_null_keys_to_bucket_zero(spark, tdir):
    """A layout-only OPTIMIZE must never drop rows: NULL cluster keys
    (Morton interleave evaluates to NULL) route to bucket 0 instead of
    falling out of every bucket filter."""
    rows = [(i, i % 7, (i * 3) % 7) for i in range(40)]
    rows += [(100, None, 3), (101, 4, None), (102, None, None)]
    df = spark.createDataFrame(rows, "id int, xk int, yk int")
    deltalite.write(spark, df.coalesce(2), tdir)
    deltalite.optimize(spark, tdir, n_files=4, zorder_by=("xk", "yk"))
    got = deltalite.read(spark, tdir).collect()
    assert len(got) == 43
    assert {r.id for r in got if r.xk is None or r.yk is None} == {100, 101, 102}


def test_merge_rewrites_only_overlapping_files(spark, tdir):
    """Stats pruning on MERGE: a file whose key range is disjoint from
    the source's min/max keeps its bytes — only overlapping files are
    removed and rewritten."""
    lo = spark.createDataFrame([(i, "lo") for i in range(1, 11)], "k int, v string")
    hi = spark.createDataFrame([(i, "hi") for i in range(100, 111)], "k int, v string")
    deltalite.write(spark, lo.coalesce(1), tdir)
    deltalite.write(spark, hi.coalesce(1), tdir, "append")
    before, _ = deltalite._replay(tdir)
    lo_file = [p for p in before if p in before][0]
    src = spark.createDataFrame([(105, "UP"), (200, "new")], "k int, v string")
    deltalite.merge(spark, src.coalesce(1), tdir, ["k"])
    after, _ = deltalite._replay(tdir)
    # the low-range file survived untouched; the overlapping high file didn't
    survivors = set(before) & set(after)
    assert len(survivors) == 1
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got[105] == "UP" and got[200] == "new" and got[1] == "lo"
    assert len(got) == 22


def test_merge_insert_only_touches_no_files(spark, tdir):
    """A source entirely outside every file's key range is pure insert:
    zero files removed, one commit, all prior bytes untouched."""
    deltalite.write(
        spark,
        spark.createDataFrame([(i, "a") for i in range(10)], "k int, v string").coalesce(1),
        tdir,
    )
    before, _ = deltalite._replay(tdir)
    src = spark.createDataFrame([(500, "new")], "k int, v string")
    deltalite.merge(spark, src.coalesce(1), tdir, ["k"])
    after, _ = deltalite._replay(tdir)
    assert set(before) <= set(after)  # prior files all survive
    assert len(deltalite.read(spark, tdir).collect()) == 11


def test_merge_concurrent_commit_raises_not_clobbers(spark, tdir, monkeypatch):
    """A commit landing between MERGE's snapshot and its O_EXCL create
    must raise ConcurrentWriteError — and the concurrent rows survive."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    orig = deltalite._write_data_files
    state = {"raced": False}

    def sneaky(df, table_path, partition_by=None):
        adds = orig(df, table_path, partition_by)
        if not state["raced"]:
            state["raced"] = True
            deltalite.write(
                spark, _df(spark, [(9, "z")]).coalesce(1), tdir, "append"
            )
        return adds

    monkeypatch.setattr(deltalite, "_write_data_files", sneaky)
    with pytest.raises(deltalite.ConcurrentWriteError):
        deltalite.merge(spark, _df(spark, [(1, "A")]).coalesce(1), tdir, ["k"])
    monkeypatch.undo()
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got == {1: "a", 9: "z"}  # the concurrent append was NOT clobbered


def test_append_rejects_retyped_column(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    bad = spark.createDataFrame([("one", "b")], "k string, v string")
    with pytest.raises(ValueError, match="retypes column"):
        deltalite.write(spark, bad.coalesce(1), tdir, "append")
    # and the narrower batch did not replace the table schema
    assert deltalite.read(spark, tdir).columns == ["k", "v"]


def test_append_missing_column_null_fills(spark, tdir):
    """An append batch may omit existing columns (its files simply lack
    them; reads null-fill) — the table schema must NOT narrow."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    narrow = spark.createDataFrame([(2,)], "k int")
    deltalite.write(spark, narrow.coalesce(1), tdir, "append")
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got == {1: "a", 2: None}
    assert deltalite.read(spark, tdir).columns == ["k", "v"]


def test_txn_append_preserves_partitioning_and_schema(spark, tdir):
    """txn_append must reuse the table's metaData: partitionColumns stay
    (files land in the hive layout) and a narrower batch can't shrink
    the schema for readers."""
    df = spark.createDataFrame(
        [(1, "x", "p1"), (2, "y", "p2")], "k int, v string, part string"
    )
    deltalite.write(spark, df.coalesce(1), tdir, partition_by=["part"])
    out = deltalite.txn_append(
        spark,
        spark.createDataFrame([(3, "z", "p1")], "k int, v string, part string"),
        tdir,
        "app",
        0,
    )
    assert out is not None
    _, meta = deltalite._replay(tdir)
    assert meta.get("partitionColumns") == ["part"]
    kept, total = deltalite.scan_file_counts(tdir, skip_filters=[("part", "=", "p1")])
    assert kept == 2 and total == 3  # pruning still works on the appended file
    assert len(deltalite.read(spark, tdir).collect()) == 3


def _changes(spark, tdir, start=0, end=None):
    rows = deltalite.read_changes(spark, tdir, start, end).collect()
    return sorted(
        (r._commit_version, r._change_type, r.k, r.v) for r in rows
    )


def test_change_feed_append_overwrite_optimize(spark, tdir):
    """Blind appends surface as inserts, overwrite as deletes+inserts —
    derived from the adds/removes, no CDC files needed; dataChange=false
    OPTIMIZE contributes nothing to the feed."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "append")
    deltalite.optimize(spark, tdir, n_files=1)
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "overwrite")
    got = _changes(spark, tdir)
    assert got == [
        (0, "insert", 1, "a"),
        (1, "insert", 2, "b"),
        (3, "delete", 1, "a"),
        (3, "delete", 2, "b"),
        (3, "insert", 3, "c"),
    ]
    # a bounded window sees only its commits
    assert _changes(spark, tdir, 1, 1) == [(1, "insert", 2, "b")]


def test_change_feed_merge_pre_post_images(spark, tdir):
    """MERGE commits are represented ONLY by their CDC files: updated
    rows appear twice (update_preimage with the old values,
    update_postimage with the new), pure inserts once — and the
    carried-over unmatched rows do NOT appear, even though the
    copy-on-write rewrite rewrote their file."""
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.merge(spark, _df(spark, [(2, "B"), (3, "c")]).coalesce(1), tdir, ["k"])
    got = _changes(spark, tdir, 1, 1)
    assert got == [
        (1, "insert", 3, "c"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
    ]


def test_change_feed_delete_rows_only(spark, tdir):
    """DELETE's CDC carries exactly the deleted rows — kept rows in the
    rewritten file stay out of the feed."""
    deltalite.write(
        spark, _df(spark, [(1, "a"), (5, "e"), (9, "i")]).coalesce(1), tdir
    )
    deltalite.delete(spark, tdir, [("k", "<=", 5)])
    assert _changes(spark, tdir, 1, 1) == [
        (1, "delete", 1, "a"),
        (1, "delete", 5, "e"),
    ]


def test_change_feed_survives_default_vacuum(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.delete(spark, tdir, [("k", "=", 1)])
    removed = deltalite.vacuum(tdir)
    assert removed == []  # cdc files are referenced, not garbage
    assert _changes(spark, tdir, 1, 1) == [(1, "delete", 1, "a")]


def test_restore_rolls_back_metadata_only(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "append")
    deltalite.write(spark, _df(spark, [(9, "z")]).coalesce(1), tdir, "overwrite")
    v = deltalite.restore(spark, tdir, 1)
    assert v == 3
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2}
    # history preserved: the overwritten state stays time-travelable
    assert {r.k for r in deltalite.read(spark, tdir, version=2).collect()} == {9}
    # and the rollback itself is visible in the change feed
    got = _changes(spark, tdir, 3, 3)
    assert got == [
        (3, "delete", 9, "z"),
        (3, "insert", 1, "a"),
        (3, "insert", 2, "b"),
    ]


def test_restore_after_vacuum_raises(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "overwrite")
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "overwrite")
    deltalite.vacuum(tdir, retain_versions=0)  # drops v0/v1-only files
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        deltalite.restore(spark, tdir, 0)


def _run_cdf_stream_batch(spark, tdir, ckpt, out_rows):
    from dbt_spark_models_spark.sources.deltalite_stream import (
        DeltaLiteStreamSource,
    )

    try:
        spark.dataSource.register(DeltaLiteStreamSource)
    except Exception:  # noqa: BLE001
        pass
    stream = (
        spark.readStream.format("deltalite_stream")
        .option("path", tdir)
        .option("changeFeed", "true")
        .load()
    )

    def _sink(df, _bid):
        out_rows.extend(
            (r._commit_version, r._change_type, r.k, r.v) for r in df.collect()
        )

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_cdf_follows_rewrites_and_resumes(spark, tdir):
    """changeFeed mode streams THROUGH merge/delete (the plain source
    raises): updates as pre/post pairs, deletes as deletes; a restart
    from the checkpoint emits only commits since the last run."""
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.merge(spark, _df(spark, [(2, "B"), (3, "c")]).coalesce(1), tdir, ["k"])
    ckpt = _tf.mkdtemp(prefix="dlcdf-ckpt-")
    got: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got)
    assert sorted(got) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "insert", 3, "c"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
    ]
    # restart after a delete and an invisible OPTIMIZE
    deltalite.delete(spark, tdir, [("k", "=", 1)])
    deltalite.optimize(spark, tdir, n_files=1)
    got2: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got2)
    assert sorted(got2) == [(2, "delete", 1, "a")]


def _run_dist_stream_batch(spark, tdir, ckpt, out_rows, change_feed=False):
    from dbt_spark_models_spark.sources.deltalite_stream import (
        DeltaLiteDistStreamSource,
    )

    try:
        spark.dataSource.register(DeltaLiteDistStreamSource)
    except Exception:  # noqa: BLE001
        pass
    reader = (
        spark.readStream.format("deltalite_stream_dist").option("path", tdir)
    )
    if change_feed:
        reader = reader.option("changeFeed", "true")
    stream = reader.load()

    def _sink(df, _bid):
        if change_feed:
            out_rows.extend(
                (r._commit_version, r._change_type, r.k, r.v)
                for r in df.collect()
            )
        else:
            out_rows.extend((r.k, r.v) for r in df.collect())

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_dist_stream_reader_parallel_files(spark, tdir):
    """The partitioned reader (one InputPartition per file, executor-side
    reads) emits the same rows as the Simple reader and resumes from its
    checkpoint emitting only new commits."""
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(2), tdir)
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "append")
    ckpt = _tf.mkdtemp(prefix="dldist-ckpt-")
    got: list = []
    _run_dist_stream_batch(spark, tdir, ckpt, got)
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]
    deltalite.optimize(spark, tdir, n_files=1)
    deltalite.write(spark, _df(spark, [(4, "d")]).coalesce(1), tdir, "append")
    got2: list = []
    _run_dist_stream_batch(spark, tdir, ckpt, got2)
    assert sorted(got2) == [(4, "d")]


def test_dist_stream_reader_change_feed(spark, tdir):
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.merge(spark, _df(spark, [(2, "B"), (3, "c")]).coalesce(1), tdir, ["k"])
    deltalite.delete(spark, tdir, [("k", "=", 1)])
    got: list = []
    _run_dist_stream_batch(
        spark, tdir, _tf.mkdtemp(prefix="dldist-ckpt-"), got, change_feed=True
    )
    assert sorted(got) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "insert", 3, "c"),
        (1, "update_postimage", 2, "B"),
        (1, "update_preimage", 2, "b"),
        (2, "delete", 1, "a"),
    ]


def test_dist_stream_reader_rejects_rewrite_without_cdf(spark, tdir):
    import tempfile as _tf

    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "overwrite")
    with pytest.raises(Exception, match="changeFeed|STREAM_FAILED|rewrites"):
        _run_dist_stream_batch(
            spark, tdir, _tf.mkdtemp(prefix="dldist-ckpt-"), []
        )


def test_change_feed_after_column_rename(spark, tdir):
    """CDC files carry LOGICAL names: a feed read spanning a rename works
    for both derived (add/remove) and explicit (cdc) change commits."""
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.rename_column(tdir, "v", "label")
    deltalite.delete(spark, tdir, [("k", "=", 1)])
    rows = deltalite.read_changes(spark, tdir).collect()
    got = sorted((r._commit_version, r._change_type, r.k, r.label) for r in rows)
    assert got == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (2, "delete", 1, "a"),
    ]


def test_describe_history_reports_operations(spark, tdir):
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "append")
    deltalite.merge(spark, _df(spark, [(2, "B")]).coalesce(1), tdir, ["k"])
    deltalite.optimize(spark, tdir, n_files=1)
    hist = deltalite.describe_history(tdir)
    assert [h["operation"] for h in hist] == [
        "OPTIMIZE", "MERGE", "APPEND", "OVERWRITE",
    ]
    merge_row = hist[1]
    assert merge_row["num_cdc_files"] >= 1  # change feed recorded
    assert hist[0]["version"] == 3


def test_timestamp_as_of_resolves_to_wall_clock_snapshot(spark, tdir):
    """timestampAsOf picks the LAST version committed at or before the
    target instant; targets before the first commit raise."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    hist = deltalite.describe_history(tdir)
    t0 = hist[0]["timestamp"]
    # make the next commit strictly later on the millisecond clock
    import time as _t

    _t.sleep(0.01)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), tdir, "append")
    t1 = deltalite.describe_history(tdir)[0]["timestamp"]
    assert t1 > t0
    assert deltalite.version_at_timestamp(tdir, t0) == 0
    assert deltalite.version_at_timestamp(tdir, t1 - 1) == 0
    assert deltalite.version_at_timestamp(tdir, t1) == 1
    got = {r.k for r in deltalite.read(spark, tdir, timestamp=t0).collect()}
    assert got == {1}
    got = {r.k for r in deltalite.read(spark, tdir, timestamp=t1).collect()}
    assert got == {1, 2}
    with pytest.raises(ValueError, match="predates"):
        deltalite.version_at_timestamp(tdir, t0 - 1)
    with pytest.raises(ValueError, match="not both"):
        deltalite.read(spark, tdir, version=0, timestamp=t0)


def test_convert_to_delta_flat_in_place(spark, tdir):
    """CONVERT TO DELTA on a flat parquet directory: no file rewritten,
    stats harvested (data skipping works immediately), and the converted
    table takes the full DML surface."""
    path = os.path.join(tdir, "plain")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, v string"
    )
    df.repartition(4).write.parquet(path)
    files_before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    v = deltalite.convert_to_delta(spark, path)
    assert v == 0
    assert {
        f for f in os.listdir(path) if f.endswith(".parquet")
    } == files_before  # adoption, not rewrite
    got = {(r.k, r.v) for r in deltalite.read(spark, path).collect()}
    assert got == {(i, f"v{i}") for i in range(20)}
    kept, total = deltalite.scan_file_counts(
        path, skip_filters=[("k", ">=", 100)]
    )
    assert total == 4 and kept == 0  # footer stats prune everything
    # post-convert DML + time travel back to the converted snapshot
    deltalite.delete(spark, path, [("k", "<", 10)])
    assert {r.k for r in deltalite.read(spark, path).collect()} == set(
        range(10, 20)
    )
    assert len(deltalite.read(spark, path, version=0).collect()) == 20
    with pytest.raises(ValueError, match="already"):
        deltalite.convert_to_delta(spark, path)


def test_convert_to_delta_partitioned(spark, tdir):
    """Hive-partitioned conversion: partitionValues come from directory
    names, partition pruning works on the log, appends keep the layout."""
    path = os.path.join(tdir, "hive")
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", i * 10) for i in range(12)],
        "id int, day string, x int",
    )
    df.coalesce(1).write.partitionBy("day").parquet(path)
    deltalite.convert_to_delta(spark, path, partition_by=["day"])
    got = {(r.id, r.day, r.x) for r in deltalite.read(spark, path).collect()}
    assert got == {(i, f"d{i % 3}", i * 10) for i in range(12)}
    kept, total = deltalite.scan_file_counts(
        path, skip_filters=[("day", "=", "d1")]
    )
    assert total == 3 and kept == 1
    add = spark.createDataFrame([(99, "d9", 0)], "id int, day string, x int")
    deltalite.write(spark, add.coalesce(1), path, "append")
    assert (99, "d9", 0) in {
        (r.id, r.day, r.x) for r in deltalite.read(spark, path).collect()
    }
    with pytest.raises(ValueError, match="partition_by"):
        p2 = os.path.join(tdir, "hive2")
        df.coalesce(1).write.partitionBy("day").parquet(p2)
        deltalite.convert_to_delta(spark, p2, partition_by=["nope"])


def test_shallow_clone_zero_copy_and_divergence(spark, tdir):
    """SHALLOW CLONE is one metadata commit (no parquet under the clone
    root), reads identically, and diverges copy-on-write in BOTH
    directions: clone DML writes local files and never touches the
    source; source appends never reach the clone."""
    src = os.path.join(tdir, "src")
    dst = os.path.join(tdir, "dst")
    deltalite.write(
        spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]).repartition(3), src
    )
    deltalite.clone(spark, src, dst)
    assert not any(f.endswith(".parquet") for f in os.listdir(dst))
    assert {(r.k, r.v) for r in deltalite.read(spark, dst).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    # stats traveled: data skipping works on the clone immediately
    kept, total = deltalite.scan_file_counts(dst, skip_filters=[("k", "=", 2)])
    assert (kept, total) == (1, 3)
    # copy-on-write: merge on the clone, source untouched
    deltalite.merge(spark, _df(spark, [(2, "B"), (9, "z")]), dst, ["k"])
    assert {r.v for r in deltalite.read(spark, dst).collect()} == {
        "a", "B", "c", "z"
    }
    assert {r.v for r in deltalite.read(spark, src).collect()} == {
        "a", "b", "c"
    }
    assert any(f.endswith(".parquet") for f in os.listdir(dst))
    # source appends after the clone are invisible to the clone
    deltalite.write(spark, _df(spark, [(50, "x")]).coalesce(1), src, "append")
    assert 50 not in {r.k for r in deltalite.read(spark, dst).collect()}
    # the clone's vacuum only ever touches files under the clone root
    src_files = {
        f for f in os.listdir(src) if f.endswith(".parquet")
    }
    deltalite.vacuum(dst, retain_versions=0)
    assert {
        f for f in os.listdir(src) if f.endswith(".parquet")
    } == src_files


def test_shallow_clone_at_version_and_guards(spark, tdir):
    src = os.path.join(tdir, "src")
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), src)
    deltalite.write(spark, _df(spark, [(2, "b")]).coalesce(1), src, "append")
    old = os.path.join(tdir, "old")
    deltalite.clone(spark, src, old, version=0)
    assert {r.k for r in deltalite.read(spark, old).collect()} == {1}
    with pytest.raises(ValueError, match="already"):
        deltalite.clone(spark, src, old)

def test_shallow_clone_partitioned_source(spark, tdir):
    """Partitioned-source clone: partition columns come back through the
    log's partitionValues (broadcast join on the unique file name), log-
    level partition pruning still works, and DML on the clone mixes
    local and foreign files correctly."""
    src = os.path.join(tdir, "psrc")
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", i * 10) for i in range(12)],
        "id int, day string, x int",
    )
    deltalite.write(spark, df.coalesce(1), src, partition_by=["day"])
    dst = os.path.join(tdir, "pdst")
    deltalite.clone(spark, src, dst)
    got = {(r.id, r.day, r.x) for r in deltalite.read(spark, dst).collect()}
    assert got == {(i, f"d{i % 3}", i * 10) for i in range(12)}
    kept, total = deltalite.scan_file_counts(
        dst, skip_filters=[("day", "=", "d1")]
    )
    assert (kept, total) == (1, 3)  # log-level partition pruning intact
    # DML on the clone: local new files + foreign originals coexist
    add = spark.createDataFrame([(99, "d1", 0)], "id int, day string, x int")
    deltalite.write(spark, add.coalesce(1), dst, "append")
    got = {(r.id, r.day) for r in deltalite.read(spark, dst).collect()}
    assert (99, "d1") in got and len(got) == 13
    deltalite.delete(spark, dst, [("id", "=", 0)])
    assert 0 not in {r.id for r in deltalite.read(spark, dst).collect()}
    # source untouched throughout
    assert {r.id for r in deltalite.read(spark, src).collect()} == set(range(12))


def test_optimize_min_file_size_compacts_only_dust(spark, tdir):
    """Selective compaction: files at or above the threshold keep their
    bytes (same path stays active, never removed); only the small-file
    dust is rewritten; content identical; too-few-qualifying is a no-op
    without a commit."""
    big = _df(spark, [(i, f"v{i}") for i in range(100)]).coalesce(1)
    deltalite.write(spark, big, tdir)
    for k in (200, 201, 202):
        deltalite.write(
            spark, _df(spark, [(k, "s")]).coalesce(1), tdir, "append"
        )
    state = deltalite._replay_state(tdir)
    sizes = {p: a["size"] for p, a in state["active"].items()}
    big_path = max(sizes, key=sizes.get)
    threshold = sizes[big_path]  # strictly-below comparison spares it
    v = deltalite.optimize(spark, tdir, min_file_size=threshold)
    after = deltalite._replay_state(tdir, v)["active"]
    assert big_path in after  # the bulk kept its bytes
    assert len(after) == 2  # big + one compacted dust file
    got = {r.k for r in deltalite.read(spark, tdir).collect()}
    assert got == set(range(100)) | {200, 201, 202}
    # all three dust files merged; layout-only commit
    hist = deltalite.describe_history(tdir)[0]
    assert hist["operation"] == "OPTIMIZE"
    assert hist["num_removed_files"] == 3
    # no-op when fewer than two files qualify: same version, no commit
    assert deltalite.optimize(spark, tdir, min_file_size=10) == v
    assert deltalite.latest_version(tdir) == v


def test_dv_delete_merge_on_read(spark, tdir):
    """Deletion-vector DELETE: no data file is rewritten — matching row
    addresses go to one tombstone sidecar, readers anti-join them away,
    time travel still sees them, and stats-disjoint files are never
    touched."""
    for lo in (0, 10, 20):
        deltalite.write(
            spark,
            _df(spark, [(lo + j, f"v{lo + j}") for j in range(5)]).coalesce(1),
            tdir,
            "overwrite" if lo == 0 else "append",
        )
    data_before = {
        f for f in os.listdir(tdir) if f.startswith("part-")
    }
    v, untouched, touched = deltalite.delete(
        spark, tdir, [("k", "<=", 2)], deletion_vectors=True
    )
    assert (untouched, touched) == (2, 1)  # stats prune two of three
    assert {
        f for f in os.listdir(tdir) if f.startswith("part-")
    } == data_before  # merge-on-read: zero data files rewritten
    assert any(f.startswith("dv-") for f in os.listdir(tdir))
    got = {r.k for r in deltalite.read(spark, tdir).collect()}
    assert got == {3, 4} | set(range(10, 15)) | set(range(20, 25))
    # the dead rows are still in the old snapshot
    assert len(deltalite.read(spark, tdir, version=v - 1).collect()) == 15
    # the change feed carries exactly the deleted rows
    feed = deltalite.read_changes(spark, tdir, v, v).collect()
    assert {(r.k, r._change_type) for r in feed} == {
        (0, "delete"), (1, "delete"), (2, "delete")
    }


def test_dv_delete_unions_and_full_file_drop(spark, tdir):
    """A second DV delete on the same file unions tombstones; deleting
    every remaining row of a file drops it from the active set without
    a rewrite; COW DML afterwards never resurrects dead rows."""
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(6)]).coalesce(1), tdir
    )
    deltalite.delete(spark, tdir, [("k", "<=", 1)], deletion_vectors=True)
    deltalite.delete(spark, tdir, [("k", "=", 2)], deletion_vectors=True)
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {3, 4, 5}
    # kill the rest: the file is fully dead -> removed, no re-add
    v, _, _ = deltalite.delete(
        spark, tdir, [("k", ">=", 3)], deletion_vectors=True
    )
    state = deltalite._replay_state(tdir, v)
    assert state["active"] == {}
    assert deltalite.read(spark, tdir).count() == 0
    # history intact at every step
    assert deltalite.read(spark, tdir, version=1).count() == 4
    assert deltalite.read(spark, tdir, version=2).count() == 3


def test_dv_then_cow_interplay_and_optimize_purge(spark, tdir):
    """COW operations on a DV'd table must apply tombstones when they
    rewrite: merge doesn't resurrect dead keys, and OPTIMIZE purges the
    tombstones into clean files."""
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(8)]).coalesce(1), tdir
    )
    deltalite.delete(spark, tdir, [("k", "<=", 2)], deletion_vectors=True)
    deltalite.merge(spark, _df(spark, [(3, "B"), (9, "z")]), tdir, ["k"])
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got == {3: "B", 4: "v4", 5: "v5", 6: "v6", 7: "v7", 9: "z"}
    v = deltalite.optimize(spark, tdir, n_files=1)
    state = deltalite._replay_state(tdir, v)
    assert all(
        not a.get("deletionVector") for a in state["active"].values()
    )  # tombstones purged into clean files
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {
        3, 4, 5, 6, 7, 9
    }


def test_dv_vacuum_and_restore(spark, tdir):
    """Default vacuum keeps referenced DV sidecars; restore to a
    pre-delete version resurrects the rows (payload-level re-add), and
    restoring back to the DV version re-applies the tombstones."""
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(5)]).coalesce(1), tdir
    )
    vdel, _, _ = deltalite.delete(
        spark, tdir, [("k", "=", 0)], deletion_vectors=True
    )
    assert deltalite.vacuum(tdir) == []  # DV sidecar is referenced
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2, 3, 4}
    v_back = deltalite.restore(spark, tdir, 0)
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {
        0, 1, 2, 3, 4
    }
    deltalite.restore(spark, tdir, vdel)
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2, 3, 4}
    assert v_back == vdel + 1
    with pytest.raises(ValueError, match="change_feed"):
        deltalite.delete(
            spark, tdir, [("k", "=", 1)], change_feed=False,
            deletion_vectors=True,
        )


def test_dv_merge_on_read(spark, tdir):
    """DV MERGE: matched pre-images are tombstoned in place, the whole
    source lands as one append — candidate files keep their bytes, the
    change feed carries exact pre/post images, and the result equals a
    COW merge."""
    for lo in (0, 10, 20):
        deltalite.write(
            spark,
            _df(spark, [(lo + j, f"v{lo + j}") for j in range(5)]).coalesce(1),
            tdir,
            "overwrite" if lo == 0 else "append",
        )
    data_before = {f for f in os.listdir(tdir) if f.startswith("part-")}
    src = _df(spark, [(1, "ONE"), (2, "TWO"), (99, "NEW")]).coalesce(1)
    v = deltalite.merge(spark, src, tdir, ["k"], deletion_vectors=True)
    after = {f for f in os.listdir(tdir) if f.startswith("part-")}
    assert data_before < after and len(after - data_before) == 1  # one append
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    expect = {i: f"v{i}" for i in list(range(5)) + list(range(10, 15)) + list(range(20, 25))}
    expect.update({1: "ONE", 2: "TWO", 99: "NEW"})
    assert got == expect
    # stats-disjoint files (10-14, 20-24) were never re-pointed
    state = deltalite._replay_state(tdir, v)
    dv_files = {
        p: a.get("deletionVector")
        for p, a in state["active"].items()
        if a.get("deletionVector")
    }
    assert len(dv_files) == 1  # only the 0-4 file carries tombstones
    assert list(dv_files.values())[0]["cardinality"] == 2
    # exact CDF: two updates (pre+post) and one insert
    feed = deltalite.read_changes(spark, tdir, v, v).collect()
    assert {(r.k, r.v, r._change_type) for r in feed} == {
        (1, "v1", "update_preimage"), (1, "ONE", "update_postimage"),
        (2, "v2", "update_preimage"), (2, "TWO", "update_postimage"),
        (99, "NEW", "insert"),
    }
    # time travel unaffected; OPTIMIZE purges the tombstones
    assert len(deltalite.read(spark, tdir, version=v - 1).collect()) == 15
    vo = deltalite.optimize(spark, tdir, n_files=1)
    state = deltalite._replay_state(tdir, vo)
    assert all(not a.get("deletionVector") for a in state["active"].values())
    assert {r.k: r.v for r in deltalite.read(spark, tdir).collect()} == expect


def test_dv_merge_insert_only_repoints_nothing(spark, tdir):
    """A DV merge whose source keys graze file stats but match no row is
    a pure append: no file re-pointed, no sidecar left behind."""
    deltalite.write(
        spark, _df(spark, [(0, "a"), (4, "b")]).coalesce(1), tdir
    )
    v = deltalite.merge(
        spark, _df(spark, [(2, "mid")]), tdir, ["k"], deletion_vectors=True
    )
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {0, 2, 4}
    state = deltalite._replay_state(tdir, v)
    assert all(not a.get("deletionVector") for a in state["active"].values())
    assert not any(f.startswith("dv-") for f in os.listdir(tdir))
    with pytest.raises(ValueError, match="change_feed"):
        deltalite.merge(
            spark, _df(spark, [(0, "x")]), tdir, ["k"],
            change_feed=False, deletion_vectors=True,
        )


def test_update_cow_and_dv(spark, tdir):
    """UPDATE ... SET ... WHERE in both strategies: stats-disjoint files
    untouched; COW rewrites candidates; DV re-points them and appends
    only the updated rows; CDF carries exact pre/post images; SET
    expressions conform to the committed column types."""
    for lo in (0, 10, 20):
        deltalite.write(
            spark,
            _df(spark, [(lo + j, f"v{lo + j}") for j in range(5)]).coalesce(1),
            tdir,
            "overwrite" if lo == 0 else "append",
        )
    # COW: uppercase v where k <= 1
    v, untouched, touched = deltalite.update(
        spark, tdir, [("k", "<=", 1)], {"v": "upper(v)"}
    )
    assert (untouched, touched) == (2, 1)
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got[0] == "V0" and got[1] == "V1" and got[2] == "v2"
    feed = deltalite.read_changes(spark, tdir, v, v).collect()
    assert {(r.k, r.v, r._change_type) for r in feed} == {
        (0, "v0", "update_preimage"), (0, "V0", "update_postimage"),
        (1, "v1", "update_preimage"), (1, "V1", "update_postimage"),
    }
    # DV: k = 10 gets a computed value, zero candidate bytes rewritten
    data_before = {f for f in os.listdir(tdir) if f.startswith("part-")}
    v2, untouched2, touched2 = deltalite.update(
        spark, tdir, [("k", "=", 10)], {"v": "concat(v, '!')"},
        deletion_vectors=True,
    )
    assert touched2 == 1
    after = {f for f in os.listdir(tdir) if f.startswith("part-")}
    assert data_before < after  # only the appended updated-rows file
    got = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert got[10] == "v10!" and got[11] == "v11"
    assert len(got) == 15
    feed = deltalite.read_changes(spark, tdir, v2, v2).collect()
    assert {(r.k, r.v, r._change_type) for r in feed} == {
        (10, "v10", "update_preimage"), (10, "v10!", "update_postimage"),
    }
    # guards
    with pytest.raises(ValueError, match="unknown column"):
        deltalite.update(spark, tdir, [("k", "=", 0)], {"nope": "1"})
    # no matching stats range: pure no-op, no commit
    v3, _, t3 = deltalite.update(
        spark, tdir, [("k", ">=", 999)], {"v": "upper(v)"}
    )
    assert t3 == 0 and deltalite.latest_version(tdir) == v2


def test_check_constraints_enforced_on_every_writer(spark, tdir):
    """CHECK constraints (spec checkConstraints feature): adding one
    validates existing rows, every write path refuses violating batches
    BEFORE committing (table state unchanged), compliant writes pass,
    and DROP CONSTRAINT lifts enforcement."""
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    # existing violation blocks creation
    with pytest.raises(ValueError, match="existing row"):
        deltalite.add_check_constraint(spark, tdir, "big_k", "k >= 2")
    v = deltalite.add_check_constraint(spark, tdir, "pos_k", "k > 0")
    assert v == 1
    # append / txn_append / merge / update all refuse violating rows
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.write(spark, _df(spark, [(0, "x")]).coalesce(1), tdir, "append")
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.txn_append(spark, _df(spark, [(-1, "x")]), tdir, "app", 0)
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.merge(spark, _df(spark, [(0, "x")]), tdir, ["k"])
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.update(spark, tdir, [("k", "=", 1)], {"k": "k - 1"})
    # NULL predicate counts as a violation (CHECK must be TRUE)
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.write(
            spark,
            spark.createDataFrame([(None, "x")], "k int, v string").coalesce(1),
            tdir,
            "append",
        )
    # nothing committed by any refused writer
    assert deltalite.latest_version(tdir) == v
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2}
    # compliant writes pass through every verb
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "append")
    deltalite.merge(spark, _df(spark, [(2, "B"), (4, "d")]), tdir, ["k"])
    deltalite.update(spark, tdir, [("k", "=", 1)], {"k": "k + 10"})
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {
        11, 2, 3, 4
    }
    # drop lifts enforcement
    deltalite.drop_check_constraint(tdir, "pos_k")
    deltalite.write(spark, _df(spark, [(0, "z")]).coalesce(1), tdir, "append")
    assert 0 in {r.k for r in deltalite.read(spark, tdir).collect()}
    with pytest.raises(ValueError, match="no constraint"):
        deltalite.drop_check_constraint(tdir, "nope")


def test_stream_cdf_follows_deletion_vectors(spark, tdir):
    """The changeFeed stream tails DV commits exactly like COW ones —
    merge-on-read is invisible to CDF consumers: the cdc rows are
    authoritative and the re-pointed adds contribute nothing."""
    import tempfile as _tf

    deltalite.write(
        spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), tdir
    )
    ckpt = _tf.mkdtemp(prefix="dlcdfdv-ckpt-")
    got: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got)
    assert sorted(got) == [
        (0, "insert", 1, "a"), (0, "insert", 2, "b"), (0, "insert", 3, "c")
    ]
    deltalite.delete(spark, tdir, [("k", "=", 2)], deletion_vectors=True)
    deltalite.merge(
        spark, _df(spark, [(3, "C"), (4, "d")]).coalesce(1), tdir, ["k"],
        deletion_vectors=True,
    )
    got2: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got2)
    assert sorted(got2) == [
        (1, "delete", 2, "b"),
        (2, "insert", 4, "d"),
        (2, "update_postimage", 3, "C"),
        (2, "update_preimage", 3, "c"),
    ]


def test_clone_of_clone_keeps_original_pointers(spark, tdir):
    """A clone of a clone re-adds the ORIGINAL absolute pointers (no
    chain of indirection): removing the intermediate clone's log leaves
    the grandchild fully readable from the source's files."""
    import shutil as _sh

    src = os.path.join(tdir, "src")
    mid = os.path.join(tdir, "mid")
    leaf = os.path.join(tdir, "leaf")
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), src)
    deltalite.clone(spark, src, mid)
    deltalite.clone(spark, mid, leaf)
    state = deltalite._replay_state(leaf)
    assert all(
        os.path.isabs(p) and p.startswith(os.path.abspath(src))
        for p in state["active"]
    )
    _sh.rmtree(mid)  # the intermediate is not load-bearing
    assert {(r.k, r.v) for r in deltalite.read(spark, leaf).collect()} == {
        (1, "a"), (2, "b")
    }


def test_rename_then_dv_delete(spark, tdir):
    """Column mapping and deletion vectors compose: tombstones key on
    file name + row index (rename-agnostic), the CDF delete rows carry
    physical names (rename-stable feed), and reads under the new
    logical name apply the tombstones."""
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(6)]).coalesce(1), tdir
    )
    deltalite.rename_column(tdir, "v", "label")
    v, _, touched = deltalite.delete(
        spark, tdir, [("k", "<=", 1)], deletion_vectors=True
    )
    assert touched == 1
    got = {(r.k, r.label) for r in deltalite.read(spark, tdir).collect()}
    assert got == {(i, f"v{i}") for i in range(2, 6)}
    feed = deltalite.read_changes(spark, tdir, v, v).collect()
    assert {(r.k, r.label, r._change_type) for r in feed} == {
        (0, "v0", "delete"), (1, "v1", "delete")
    }
    # a later rename still works and the tombstones follow
    deltalite.rename_column(tdir, "label", "name")
    assert {(r.k, r.name) for r in deltalite.read(spark, tdir).collect()} == {
        (i, f"v{i}") for i in range(2, 6)
    }


def test_optimize_zorder_three_columns(spark, tdir):
    """n-column ZORDER: all rows survive (NULLs included) and each
    output file's stats are tight enough to prune on ANY of the three
    clustered columns."""
    rows = [(i, i % 4, (i * 3) % 4, (i * 5) % 4) for i in range(64)]
    rows.append((100, None, 1, 2))
    df = spark.createDataFrame(rows, "id int, a int, b int, c int")
    deltalite.write(spark, df.coalesce(2), tdir)
    deltalite.optimize(spark, tdir, n_files=4, zorder_by=("a", "b", "c"))
    got = deltalite.read(spark, tdir).collect()
    assert len(got) == 65
    for col in ("a", "b", "c"):
        kept, total = deltalite.scan_file_counts(
            tdir, skip_filters=[(col, ">=", 99)]
        )
        assert kept < total  # stats prune on every clustered column


def test_optimize_zorder_single_column_range_clusters(spark, tdir):
    """OPTIMIZE ... ZORDER BY (one_col) is legal (the common case for
    date-clustered facts): the interleave degenerates to range
    clustering on the column's low bits, all rows survive (NULLs routed
    to bucket 0), and the output files' stats prune on that column."""
    rows = [(i, i % 64) for i in range(128)] + [(1000, None)]
    df = spark.createDataFrame(rows, "id int, a int")
    deltalite.write(spark, df.coalesce(2), tdir)
    deltalite.optimize(spark, tdir, n_files=4, zorder_by=("a",))
    got = deltalite.read(spark, tdir).collect()
    assert len(got) == 129
    kept, total = deltalite.scan_file_counts(
        tdir, skip_filters=[("a", ">=", 48)]
    )
    assert kept < total  # range clustering gives prunable stats
    with pytest.raises(ValueError, match="at least one"):
        deltalite.optimize(spark, tdir, n_files=2, zorder_by=())


def test_check_constraint_null_counts_as_violation(spark, tdir):
    """Pinned NULL semantics for CHECK constraints: an expression that
    evaluates to NULL (UNKNOWN) is a VIOLATION — Delta's invariant rule
    (CheckDeltaInvariant rejects non-TRUE), deliberately diverging from
    standard SQL CHECK (which passes UNKNOWN). A differential test
    against real delta-spark must expect the Delta behavior."""
    deltalite.write(spark, _df(spark, [(1, "a")]).coalesce(1), tdir)
    deltalite.add_check_constraint(spark, tdir, "pos_k", "k > 0")
    null_batch = spark.createDataFrame([(None, "n")], "k int, v string")
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.write(spark, null_batch.coalesce(1), tdir, "append")
    # same rule on every other constrained writer
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.merge(spark, null_batch, tdir, ["v"])
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.update(spark, tdir, [("k", "=", 1)], {"k": "NULL"})
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1}


def test_overwrite_preserves_and_enforces_check_constraints(spark, tdir):
    """INSERT OVERWRITE replaces data, not table policy: the overwrite
    batch is validated against existing CHECK constraints BEFORE the
    commit, and the constraints survive into the new metaData (spec: a
    writer unable to enforce checkConstraints must refuse to write)."""
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    deltalite.add_check_constraint(spark, tdir, "pos_k", "k > 0")
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.write(
            spark, _df(spark, [(0, "x")]).coalesce(1), tdir, "overwrite"
        )
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2}
    v = deltalite.write(
        spark, _df(spark, [(5, "e")]).coalesce(1), tdir, "overwrite"
    )
    meta = deltalite._replay_state(tdir, v)["meta"]
    assert "delta.constraints.pos_k" in meta["configuration"]
    # still enforced after the overwrite
    with pytest.raises(ValueError, match="pos_k"):
        deltalite.write(spark, _df(spark, [(-1, "x")]).coalesce(1), tdir, "append")


def test_cow_zero_match_update_and_delete_are_noops(spark, tdir):
    """A predicate that grazes file stats but matches NO row must not
    rewrite candidates: COW UPDATE and DELETE probe for a match first
    and commit nothing (no full-file delete+insert churn in the change
    feed), mirroring the DV paths' touched counter."""
    deltalite.write(
        spark,
        spark.createDataFrame(
            [(0, "a"), (2, "b"), (4, "c")], "k int, v string"
        ).coalesce(1),
        tdir,
    )
    v0 = deltalite.latest_version(tdir)
    # k=3 is inside the file's [0,4] stats range but matches nothing
    v, untouched, touched = deltalite.update(
        spark, tdir, [("k", "=", 3)], {"v": "'x'"}
    )
    assert (v, untouched, touched) == (v0, 1, 0)
    v, untouched, touched = deltalite.delete(spark, tdir, [("k", "=", 3)])
    assert (v, untouched, touched) == (v0, 1, 0)
    assert deltalite.latest_version(tdir) == v0  # no commit happened
    assert deltalite.read_changes(spark, tdir, v0 + 1).count() == 0


def test_timestamp_as_of_monotonizes_non_monotone_log(spark, tdir):
    """Wall-clock steps between writers can produce a non-monotone
    commitInfo sequence; timestampAsOf monotonizes (each commit's
    effective ts >= its parent's) like real Delta, so a skewed-high
    early commit hides later lower-stamped versions instead of the scan
    returning a later version for an earlier time."""
    for i in range(3):
        deltalite.write(
            spark, _df(spark, [(i, "x")]).coalesce(1), tdir, mode="append" if i else "overwrite"
        )
    stamps = {0: 1000, 1: 5000, 2: 2000}  # v2's clock stepped back
    for v, ts in stamps.items():
        p = deltalite._version_file(tdir, v)
        lines = [json.loads(l) for l in open(p) if l.strip()]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(p, "w") as f:
            for a in lines:
                f.write(json.dumps(a) + "\n")
    assert deltalite.version_at_timestamp(tdir, 2000) == 0
    assert deltalite.version_at_timestamp(tdir, 4999) == 0
    assert deltalite.version_at_timestamp(tdir, 5000) == 2  # v2 eff ts 5000
    with pytest.raises(ValueError, match="predates"):
        deltalite.version_at_timestamp(tdir, 999)


def test_clone_of_dv_table_resolves_sidecars(spark, tdir):
    """SHALLOW CLONE of a table with deletion vectors: the clone's adds
    carry ABSOLUTE sidecar pointers (like data paths), so reads, DML and
    clone-of-clone on the clone keep applying the source's tombstones."""
    src = os.path.join(tdir, "src")
    c1 = os.path.join(tdir, "c1")
    c2 = os.path.join(tdir, "c2")
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(6)]).coalesce(1), src
    )
    deltalite.delete(spark, src, [("k", "<=", 1)], deletion_vectors=True)
    deltalite.clone(spark, src, c1)
    assert {r.k for r in deltalite.read(spark, c1).collect()} == {2, 3, 4, 5}
    state = deltalite._replay_state(c1)
    for a in state["active"].values():
        if a.get("deletionVector"):
            assert os.path.isabs(a["deletionVector"]["path"])
    # clone-of-clone flattens both data and sidecar pointers
    deltalite.clone(spark, c1, c2)
    assert {r.k for r in deltalite.read(spark, c2).collect()} == {2, 3, 4, 5}
    # DML on the clone diverges copy-on-write without touching the source
    deltalite.delete(spark, c1, [("k", "=", 2)])
    assert {r.k for r in deltalite.read(spark, c1).collect()} == {3, 4, 5}
    assert {r.k for r in deltalite.read(spark, src).collect()} == {2, 3, 4, 5}
    # restore of the clone's DV snapshot still resolves the sidecar
    deltalite.restore(spark, c1, 0)
    assert {r.k for r in deltalite.read(spark, c1).collect()} == {2, 3, 4, 5}


def test_dv_sidecar_shards_across_files(spark, tdir, monkeypatch):
    """A bulk DV operation shards its tombstone sidecar (directory of
    parquet parts, hash-distributed by file name) instead of funnelling
    through one coalesce(1) task; readers, vacuum and restore treat the
    directory exactly like a single-file sidecar."""
    monkeypatch.setattr(deltalite, "_DV_SHARD_ROWS", 2)
    deltalite.write(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(12)], "k int, v string"
        ).repartition(3),
        tdir,
    )
    v, _, touched = deltalite.delete(
        spark, tdir, [("k", "<=", 7)], deletion_vectors=True
    )
    assert touched >= 1
    dv_dirs = [
        f
        for f in os.listdir(tdir)
        if f.startswith("dv-") and os.path.isdir(os.path.join(tdir, f))
    ]
    assert dv_dirs, "sidecar should be a directory of shards"
    shards = [
        f for f in os.listdir(os.path.join(tdir, dv_dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(shards) > 1, "bulk tombstone set should fan out"
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {
        8, 9, 10, 11
    }
    assert deltalite.vacuum(tdir) == []  # shards are referenced via the dir
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {
        8, 9, 10, 11
    }
    deltalite.restore(spark, tdir, 0)
    assert deltalite.read(spark, tdir).count() == 12


def test_cdf_derived_path_honors_deletion_vectors(spark, tdir):
    """The derived CDF path (commits without cdc actions) must read DV
    files through their tombstones: a zero-match DV repoint contributes
    NOTHING (no resurrect of previously-deleted rows — the exact failure
    change_feed=True exists to prevent), and an overwrite of a DV table
    surfaces only the LIVE rows as deletes."""
    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(6)]).coalesce(1), tdir
    )
    v1, _, _ = deltalite.delete(
        spark, tdir, [("k", "<=", 1)], deletion_vectors=True
    )
    # predicate grazes the file's [0,5] stats but k=0 is already dead:
    # zero rows matched, yet the file had a DV so the commit re-points it
    v2, _, touched = deltalite.delete(
        spark, tdir, [("k", "=", 0)], deletion_vectors=True
    )
    assert v2 == v1 + 1 and touched == 1
    assert deltalite.read_changes(spark, tdir, v2, v2).count() == 0
    # overwrite (no cdc): derived deletes are the LIVE rows only
    v3 = deltalite.write(spark, _df(spark, [(9, "z")]).coalesce(1), tdir)
    feed = deltalite.read_changes(spark, tdir, v3, v3).collect()
    deletes = {r.k for r in feed if r._change_type == "delete"}
    inserts = {r.k for r in feed if r._change_type == "insert"}
    assert deletes == {2, 3, 4, 5}, "tombstoned rows must not resurrect"
    assert inserts == {9}


def test_stream_cdf_derived_path_honors_deletion_vectors(spark, tdir):
    """Both streaming readers share the batch derived-CDF contract: a
    zero-match DV repoint commit streams nothing and an overwrite of a
    DV table streams only live rows as deletes."""
    import tempfile as _tf

    deltalite.write(
        spark, _df(spark, [(i, f"v{i}") for i in range(4)]).coalesce(1), tdir
    )
    deltalite.delete(spark, tdir, [("k", "=", 0)], deletion_vectors=True)
    ckpt = _tf.mkdtemp(prefix="dlcdfdv2-ckpt-")
    got: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got)  # consume v0..v1
    # zero-match repoint (grazes stats, k=0 already dead) then overwrite
    deltalite.delete(spark, tdir, [("k", "=", 0)], deletion_vectors=True)
    v3 = deltalite.write(spark, _df(spark, [(7, "w")]).coalesce(1), tdir)
    got2: list = []
    _run_cdf_stream_batch(spark, tdir, ckpt, got2)
    assert sorted(got2) == [
        (v3, "delete", 1, "v1"),
        (v3, "delete", 2, "v2"),
        (v3, "delete", 3, "v3"),
        (v3, "insert", 7, "w"),
    ]


def test_append_only_table_property(spark, tdir):
    """Spec delta.appendOnly writer feature: once set (one SET
    TBLPROPERTIES metadata commit), every data-removing verb is refused
    — overwrite, DELETE (COW and DV), UPDATE, MERGE, RESTORE-with-
    removes — while appends and layout-only OPTIMIZE stay legal; unset
    re-enables DML."""
    deltalite.write(spark, _df(spark, [(1, "a"), (2, "b")]).coalesce(1), tdir)
    v = deltalite.set_table_property(tdir, "delta.appendOnly", "true")
    assert v == 1
    deltalite.write(spark, _df(spark, [(3, "c")]).coalesce(1), tdir, "append")
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.write(spark, _df(spark, [(9, "z")]).coalesce(1), tdir)
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.delete(spark, tdir, [("k", "=", 1)])
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.delete(spark, tdir, [("k", "=", 1)], deletion_vectors=True)
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.update(spark, tdir, [("k", "=", 1)], {"v": "'x'"})
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.merge(spark, _df(spark, [(1, "A")]), tdir, ["k"])
    with pytest.raises(ValueError, match="appendOnly"):
        deltalite.restore(spark, tdir, 0)  # would remove the appended file
    # layout-only maintenance (dataChange=false) is NOT a data change
    deltalite.optimize(spark, tdir, n_files=1)
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {1, 2, 3}
    deltalite.set_table_property(tdir, "delta.appendOnly", "false")
    deltalite.delete(spark, tdir, [("k", "=", 1)])
    assert {r.k for r in deltalite.read(spark, tdir).collect()} == {2, 3}
    with pytest.raises(ValueError, match="add_check_constraint"):
        deltalite.set_table_property(tdir, "delta.constraints.x", "k > 0")


def test_drop_column_metadata_only(spark, tdir):
    """Metadata-only DROP COLUMN: one commit, zero rewrites, time travel
    preserved — and a LATER column with the same logical name mints a
    fresh physical name, so the dropped data can never resurrect (the
    reason the spec gates DROP COLUMN on column mapping)."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, v string, w int"
    )
    deltalite.write(spark, df.coalesce(1), tdir)
    files_before = {
        f for f in os.listdir(tdir) if f.endswith(".parquet")
    }
    v = deltalite.drop_column(tdir, "v")
    assert {f for f in os.listdir(tdir) if f.endswith(".parquet")} == (
        files_before
    )  # zero rewrites
    got = deltalite.read(spark, tdir)
    assert [f.name for f in got.schema.fields] == ["k", "w"]
    # time travel before the drop still sees the column and its data
    old = deltalite.read(spark, tdir, version=v - 1)
    assert {(r.k, r.v) for r in old.select("k", "v").collect()} == {
        (1, "a"), (2, "b")
    }
    # append without the dropped column, then re-add the NAME as a new
    # column: old rows null-fill — the dropped values must NOT come back
    deltalite.write(spark, spark.createDataFrame(
        [(3, 30)], "k int, w int").coalesce(1), tdir, "append")
    deltalite.write(spark, spark.createDataFrame(
        [(4, 40, "NEW")], "k int, w int, v string").coalesce(1), tdir, "append")
    rows = {r.k: r.v for r in deltalite.read(spark, tdir).collect()}
    assert rows == {1: None, 2: None, 3: None, 4: "NEW"}
    # guards
    with pytest.raises(ValueError, match="last column"):
        d2 = os.path.join(tdir, "one")
        deltalite.write(
            spark, spark.createDataFrame([(1,)], "x int").coalesce(1), d2
        )
        deltalite.drop_column(d2, "x")
    deltalite.add_check_constraint(spark, tdir, "w_pos", "w > 0 OR w IS NULL")
    with pytest.raises(ValueError, match="w_pos"):
        deltalite.drop_column(tdir, "w")


def test_drop_partition_column_rejected(spark, tdir):
    df = spark.createDataFrame([(1, "x", "p1")], "k int, v string, p string")
    deltalite.write(spark, df.coalesce(1), tdir, partition_by=["p"])
    with pytest.raises(ValueError, match="partition column"):
        deltalite.drop_column(tdir, "p")


def test_optimize_zorder_single_pass_job_count(spark, tdir):
    """r6 verdict #4: ZORDER compaction is ONE Spark job regardless of
    n_files — the old per-bucket ``filter(bucket == i).coalesce(1)`` loop
    ran n_files jobs, each a full pass over the snapshot. The write
    repartitions on the throwaway __zb column and splits files via
    partitionBy, so the job count must be IDENTICAL for 2 and 8 buckets."""
    sc = spark.sparkContext

    def jobs_for(n_files: int, path: str) -> int:
        df = spark.createDataFrame(
            [(i, i % 8, (i * 3) % 8) for i in range(256)], "id int, a int, b int"
        )
        deltalite.write(spark, df.coalesce(4), path)
        group = f"zopt-{n_files}"
        sc.setJobGroup(group, "optimize zorder")
        try:
            deltalite.optimize(spark, path, n_files=n_files, zorder_by=("a", "b"))
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    with tempfile.TemporaryDirectory() as d2:
        j2 = jobs_for(2, os.path.join(d2, "t2"))
        j8 = jobs_for(8, os.path.join(d2, "t8"))
    assert j2 == j8, f"job count grew with n_files: {j2} vs {j8}"


def test_optimize_default_binpacks_to_target_file_size(spark, tdir):
    """n_files=None (the Runner.maintain shape): output count =
    ceil(active bytes / target_file_size) — a big table never funnels
    through one task, a small one still folds to a single file — with
    content identical and per-add stats intact (r10 VERDICT watch #1)."""
    import math

    rows = [(i, "x" * 50) for i in range(2000)]
    for start in range(0, 2000, 250):
        deltalite.write(
            spark,
            _df(spark, rows[start : start + 250]).coalesce(1),
            tdir,
            "overwrite" if start == 0 else "append",
        )
    state = deltalite._replay_state(tdir)
    total = sum(a["size"] for a in state["active"].values())
    assert len(state["active"]) == 8
    target = total // 3 + 1  # ceil(total/target) == 3
    v = deltalite.optimize(spark, tdir, target_file_size=target)
    after = deltalite._replay_state(tdir)["active"]
    assert len(after) == math.ceil(total / target) == 3
    assert all(a.get("stats") for a in after.values()), "stats lost"
    assert deltalite.read(spark, tdir).count() == 2000
    assert v == deltalite.latest_version(tdir)
    # small-table default: everything fits one 128MiB target file
    deltalite.optimize(spark, tdir)
    assert len(deltalite._replay_state(tdir)["active"]) == 1
    assert deltalite.read(spark, tdir).count() == 2000
