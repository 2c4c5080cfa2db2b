"""Commit-protocol semantics of the Python DataSource JSONL writer,
exercised directly (no Spark session needed): staged tmp files become
visible only via driver commit; abort leaves nothing behind."""

import json
import os
import tempfile

from dbt_spark_models_spark.sources.pydatasource import (
    JsonlWriter,
    JsonlWriterMessage,
)


def _write_batch(writer, rows):
    return writer.write(iter(rows))


def test_commit_renames_staged_files_in_order():
    out = tempfile.mkdtemp(prefix="jsonl-sink-")
    w = JsonlWriter({"path": out}, overwrite=True)
    m1 = _write_batch(w, [(1, "en", "aa"), (2, "de", "bb")])
    m2 = _write_batch(w, [(3, "fr", "cc")])
    assert isinstance(m1, JsonlWriterMessage) and m1.n_rows == 2
    # staged: nothing visible as a part file yet
    assert all(f.startswith(".tmp-") for f in os.listdir(out))
    w.commit([m1, m2])
    parts = sorted(os.listdir(out))
    assert parts == ["part-00000.json", "part-00001.json"]
    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]


def test_abort_removes_staged_files():
    out = tempfile.mkdtemp(prefix="jsonl-sink-")
    w = JsonlWriter({"path": out}, overwrite=True)
    m1 = _write_batch(w, [(1, "en", "aa")])
    m2 = _write_batch(w, [(2, "de", "bb")])
    w.abort([m1, m2, None])
    assert os.listdir(out) == []


def test_speculative_duplicate_task_staged_file_never_committed():
    """A speculated/retried task's message is simply not in the commit
    list; its staged file stays invisible (and abort-able) — the
    exactly-once property the sink gate checks end-to-end."""
    out = tempfile.mkdtemp(prefix="jsonl-sink-")
    w = JsonlWriter({"path": out}, overwrite=True)
    kept = _write_batch(w, [(1, "en", "aa")])
    lost = _write_batch(w, [(1, "en", "aa")])  # duplicate attempt
    w.commit([kept])
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert parts == ["part-00000.json"]
    # the orphaned tmp is still there but never part of the dataset
    tmps = [f for f in os.listdir(out) if f.startswith(".tmp-")]
    assert len(tmps) == 1
    w.abort([lost])
    assert [f for f in os.listdir(out) if f.startswith(".tmp-")] == []
