"""DeltaLite: a Delta-Lake-transaction-log subset over parquet, no jars.

The container has no Delta jars (the one §2 gap every prior round carried:
the reference sets ``file_format='delta'`` on 197 models and all 54
snapshots, e.g. ``snapshots/spark/b2b_mart/scd2_merchant_orders_v2_snapshot
.sql:8-15``). The delta FORMAT is unavailable without the runtime, but the
thing that makes delta delta — the transaction LOG protocol — is a public
spec (Delta Transaction Log Protocol, delta.io; PROTOCOL.md in
delta-io/delta). This module implements the subset that gives parquet
tables ACID commits, snapshot reads, and time travel:

- every commit is ONE atomically-created JSON file
  ``_delta_log/{version:020d}.json`` holding ``protocol`` / ``metaData`` /
  ``add`` / ``remove`` actions (same action vocabulary as the spec);
- data files are written with globally-unique names directly under the
  table root and are INVISIBLE until an ``add`` action commits them —
  a crashed writer leaves garbage files, never a corrupt table;
- readers replay the log: active files = adds minus removes up to the
  requested version — so ``versionAsOf`` time travel is just stopping
  the replay early;
- concurrent writers race on ``O_CREAT|O_EXCL`` of the next version file
  (the local-FS equivalent of the spec's "put-if-absent on the log
  object"); the loser gets a ``ConcurrentWriteError`` and retries on a
  fresh snapshot — optimistic concurrency, exactly the spec's model.

Scale: the log is metadata (KBs per commit); readers replay JSON, then
Spark scans ONLY the active parquet files — partition pruning and
predicate pushdown work unchanged because the data path IS plain parquet.
Checkpoints (spec: ``_last_checkpoint`` + a compacted snapshot every N
commits) are implemented, so replay cost is O(commits since last
checkpoint), not O(#commits) — the piece that keeps a
years-of-streaming-appends table readable. ``txn`` actions (the spec's
appId/version idempotence tokens) make ``txn_append`` a retry-safe
exactly-once sink for Structured Streaming foreachBatch. Column-stat
data skipping remains the documented out-of-subset piece. The
single-JSON-commit + put-if-absent is how the real protocol works on
HDFS/local; object stores need a commit coordinator.

Data skipping (the spec's ``stats`` JSON on ``add`` actions) is also
implemented: every committed file carries per-column min/max harvested
from its parquet footer (free — the row groups already store them), and
``read(..., skip_filters=...)`` prunes files whose stats prove them
disjoint from the predicate BEFORE Spark ever lists them. At 100 TB this
is the difference between planning over millions of files and planning
over the handful a selective predicate touches; within the surviving
files, Spark's own row-group pushdown still applies.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"

# a compacted snapshot is written after every N commits (spec:
# "checkpoints"); readers then replay at most N-1 JSON files
CHECKPOINT_INTERVAL = 10


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first (optimistic-concurrency
    loser). Re-read the table and retry the transaction."""


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def _version_file(table_path: str, version: int) -> str:
    return os.path.join(_log_path(table_path), f"{version:020d}.json")


def _list_versions(table_path: str) -> list[int]:
    log = _log_path(table_path)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".json"):
            try:
                out.append(int(f[:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table_path: str) -> int | None:
    vs = _list_versions(table_path)
    return vs[-1] if vs else None


def _checkpoint_file(table_path: str, version: int) -> str:
    return os.path.join(
        _log_path(table_path), f"{version:020d}.checkpoint.parquet"
    )


def _last_checkpoint_version(table_path: str) -> int | None:
    lc = os.path.join(_log_path(table_path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    try:
        with open(lc) as f:
            return int(json.load(f)["version"])
    except (ValueError, KeyError, json.JSONDecodeError, OSError):
        return None  # corrupt hint → fall back to full JSON replay


def _apply_action(state: dict, action: dict) -> None:
    if "add" in action:
        state["active"][action["add"]["path"]] = action["add"]
    elif "remove" in action:
        state["active"].pop(action["remove"]["path"], None)
    elif "metaData" in action:
        state["meta"] = action["metaData"]
    elif "txn" in action:
        t = action["txn"]
        state["txns"][t["appId"]] = max(
            t["version"], state["txns"].get(t["appId"], -1)
        )


def _replay_state(table_path: str, version: int | None = None) -> dict:
    """Replay up to ``version`` (inclusive; None = latest). Starts from the
    newest checkpoint ≤ version when one exists (so the JSON tail is at
    most CHECKPOINT_INTERVAL-1 files), else from version 0. Returns
    {"active": {path: add}, "meta": metaData, "txns": {appId: version}}."""
    versions = _list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no DeltaLite log at {table_path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"version {version} not in log (have {versions[0]}..{versions[-1]})"
        )
    state: dict = {"active": {}, "meta": {}, "txns": {}}
    start = 0
    ckpt = _last_checkpoint_version(table_path)
    if ckpt is not None and ckpt <= version:
        path = _checkpoint_file(table_path, ckpt)
        if os.path.exists(path):
            import pyarrow.parquet as pq

            for blob in pq.read_table(path).column("action_json").to_pylist():
                _apply_action(state, json.loads(blob))
            start = ckpt + 1
    for v in versions:
        if v < start or v > version:
            continue
        with open(_version_file(table_path, v)) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))
    return state


def _replay(table_path: str, version: int | None = None) -> tuple[list[str], dict]:
    """(active data-file relative paths, last metaData action)."""
    state = _replay_state(table_path, version)
    return sorted(state["active"]), state["meta"]


def _write_checkpoint(table_path: str, version: int) -> None:
    """Compact the state at ``version`` into one parquet file + the
    ``_last_checkpoint`` pointer (spec shape; this lite variant stores one
    action-JSON string per row instead of the spec's typed struct
    columns). Failure is non-fatal: a missing/corrupt checkpoint only
    costs a longer JSON replay, never correctness."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    state = _replay_state(table_path, version)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": state["meta"]},
        *({"txn": {"appId": a, "version": v}} for a, v in sorted(state["txns"].items())),
        *({"add": state["active"][p]} for p in sorted(state["active"])),
    ]
    blobs = [json.dumps(a, separators=(",", ":")) for a in actions]
    pq.write_table(
        pa.table({"action_json": pa.array(blobs, pa.string())}),
        _checkpoint_file(table_path, version),
    )
    tmp = os.path.join(_log_path(table_path), "_last_checkpoint.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": len(actions)}, f)
    os.replace(tmp, os.path.join(_log_path(table_path), "_last_checkpoint"))


def _json_safe(v):
    """Stat values → JSON-serializable (dates/timestamps as ISO strings,
    bytes dropped — comparisons on binary stats aren't supported)."""
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat()
    if isinstance(v, _dec.Decimal):
        return float(v)
    if isinstance(v, bytes):
        return None
    if isinstance(v, float) and (v != v):  # NaN orders unreliably
        return None
    return v


def _file_stats(path: str) -> dict | None:
    """Per-column min/max + row count from the parquet footer (already
    computed by the writer per row group — harvesting is metadata-only).
    Shape matches the spec's ``stats`` JSON: {numRecords, minValues,
    maxValues}. Returns None when the footer can't be read; stats are an
    optimization, never required for correctness."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if "." in name:  # nested — skip
                    continue
                # per-column guard: pyarrow can't extract stats for some
                # physical types (DECIMAL raises from .min even with
                # has_min_max=True) — one such column must not cost every
                # OTHER column its stats
                try:
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        raise ValueError("no min/max")
                    lo, hi = _json_safe(st.min), _json_safe(st.max)
                except Exception:  # noqa: BLE001
                    mins[name] = maxs[name] = None
                    continue
                if name not in mins:
                    mins[name], maxs[name] = lo, hi
                elif mins[name] is not None and lo is not None:
                    mins[name] = min(mins[name], lo)
                    maxs[name] = max(maxs[name], hi)
                else:
                    mins[name] = maxs[name] = None
        return {
            "numRecords": md.num_rows,
            "minValues": {k: v for k, v in mins.items() if v is not None},
            "maxValues": {k: v for k, v in maxs.items() if v is not None},
        }
    except Exception:  # noqa: BLE001 — skipping stats only loses pruning
        return None


def _write_data_files(df: DataFrame, table_path: str) -> list[dict]:
    """Write df's rows as parquet files with globally-unique names under
    the table root (spec: data files are inert until committed). Returns
    the ``add`` payloads, each carrying footer-derived column stats."""
    staging = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    now_ms = int(time.time() * 1000)
    for f in os.listdir(staging):
        if not f.endswith(".parquet"):
            continue
        unique = f"part-{uuid.uuid4().hex}.parquet"
        src = os.path.join(staging, f)
        dest = os.path.join(table_path, unique)
        os.rename(src, dest)
        stats = _file_stats(dest)
        if stats is not None and stats["numRecords"] == 0:
            os.remove(dest)  # empty part files are never committed
            continue
        add = {
            "path": unique,
            "size": os.path.getsize(dest),
            "modificationTime": now_ms,
            "dataChange": True,
        }
        if stats is not None:
            add["stats"] = json.dumps(stats, separators=(",", ":"))
        adds.append(add)
    shutil.rmtree(staging, ignore_errors=True)
    return adds


def _commit(
    table_path: str,
    version: int,
    actions: list[dict],
) -> None:
    """Atomically create the version file (O_CREAT|O_EXCL = the local-FS
    put-if-absent). Losing the race raises ConcurrentWriteError."""
    os.makedirs(_log_path(table_path), exist_ok=True)
    path = _version_file(table_path, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError as exc:
        raise ConcurrentWriteError(
            f"version {version} already committed at {table_path}"
        ) from exc
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())
    if version > 0 and version % CHECKPOINT_INTERVAL == 0:
        try:
            _write_checkpoint(table_path, version)
        except Exception:  # noqa: BLE001 — checkpoint is an optimization;
            pass  # losing one costs replay time, never correctness


def _meta_action(df: DataFrame, table_id: str) -> dict:
    return {
        "metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": [],
            "configuration": {},
        }
    }


def write(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    mode: str = "overwrite",
) -> int:
    """Commit ``df`` to the table. ``overwrite`` removes every currently
    active file and adds the new ones in ONE commit; ``append`` only adds.
    Returns the committed version."""
    os.makedirs(table_path, exist_ok=True)
    versions = _list_versions(table_path)
    if not versions:
        version = 0
        prior: list[str] = []
        meta: dict = {}
    else:
        version = versions[-1] + 1
        prior, meta = _replay(table_path)
    adds = _write_data_files(df, table_path)
    actions: list[dict] = [
        {"commitInfo": {"operation": mode.upper(), "timestamp": int(time.time() * 1000)}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(df, meta.get("id", uuid.uuid4().hex)),
    ]
    if mode == "overwrite":
        now_ms = int(time.time() * 1000)
        actions += [
            {"remove": {"path": p, "deletionTimestamp": now_ms, "dataChange": True}}
            for p in prior
        ]
    elif mode != "append":
        raise ValueError(f"unknown mode {mode!r}")
    actions += [{"add": a} for a in adds]
    _commit(table_path, version, actions)
    return version


def _maybe_skip(add: dict, skip_filters) -> bool:
    """True iff the file's stats PROVE it cannot contain a matching row.
    A file without stats (or without stats for the filtered column) is
    never skipped — pruning must be lossless."""
    if not skip_filters or "stats" not in add:
        return False
    try:
        stats = json.loads(add["stats"])
        mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
    except (json.JSONDecodeError, AttributeError):
        return False
    for col, op, lit in skip_filters:
        if col not in mins or col not in maxs:
            continue
        lo, hi = mins[col], maxs[col]
        try:
            if op in ("<", "<=") and lo > lit:
                return True  # every row is above the upper bound
            if op in (">", ">=") and hi < lit:
                return True
            if op in ("=", "==") and (lit < lo or lit > hi):
                return True
        except TypeError:  # incomparable stat/literal types → keep file
            continue
    return False


def read(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    skip_filters: list[tuple] | None = None,
) -> DataFrame:
    """Snapshot read at ``version`` (None = latest) by log replay. The
    scan is plain parquet over the active file set — pushdown/pruning
    intact. An empty snapshot returns an empty DataFrame with the
    committed schema.

    ``skip_filters`` = [(column, op, literal), ...] with op in
    {<, <=, >, >=, =}: file-level data skipping on the adds' stats — the
    file LIST shrinks before Spark plans the scan. Lossless (files
    lacking stats are kept), and the caller must still apply the actual
    row filter; skipping only removes provably-disjoint files."""
    state = _replay_state(table_path, version)
    active = state["active"]
    meta = state["meta"]
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    kept = [
        p for p in sorted(active) if not _maybe_skip(active[p], skip_filters)
    ]
    if not kept:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table_path, p) for p in kept]
    return spark.read.schema(schema).parquet(*paths)


def scan_file_counts(
    table_path: str,
    version: int | None = None,
    skip_filters: list[tuple] | None = None,
) -> tuple[int, int]:
    """(files after skipping, total active files) — the pruning evidence
    the data-skipping gate publishes."""
    state = _replay_state(table_path, version)
    active = state["active"]
    kept = sum(
        1 for p in active if not _maybe_skip(active[p], skip_filters)
    )
    return kept, len(active)


def merge(
    spark: SparkSession,
    source: DataFrame,
    table_path: str,
    keys: list[str],
) -> int:
    """MERGE by copy-on-write rewrite, the parquet-table strategy real
    Delta uses for matched files: matched keys update every column,
    unmatched insert (dbt-spark merge semantics,
    ``macros/spark_adapter_patch/create_table.sql:21-38``). The rewrite
    and the swap land in ONE atomic commit — remove(all prior) +
    add(rewritten), so readers see pre- or post-merge state, never
    between. Duplicate-key sources are rejected like delta's MERGE.

    At scale, real delta rewrites only files whose key-range min/max
    overlap the source (data skipping); this subset rewrites the table —
    documented, and the COMMIT protocol (the hard part) is identical."""
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("merge source has duplicate unique_key rows")
    target = read(spark, table_path)
    result = target.join(source, on=keys, how="left_anti").unionByName(
        source.select(*target.columns)
    )
    # one commit: remove every prior active file, add the rewrite
    versions = _list_versions(table_path)
    version = versions[-1] + 1
    prior, meta = _replay(table_path)
    adds = _write_data_files(result, table_path)
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {"commitInfo": {"operation": "MERGE", "timestamp": now_ms}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(result, meta.get("id", uuid.uuid4().hex)),
        *(
            {"remove": {"path": p, "deletionTimestamp": now_ms, "dataChange": True}}
            for p in prior
        ),
        *({"add": a} for a in adds),
    ]
    _commit(table_path, version, actions)
    return version


def txn_append(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    app_id: str,
    txn_version: int,
) -> int | None:
    """Idempotent transactional append — the spec's ``txn`` action
    (appId/version), which is exactly how real Delta makes Structured
    Streaming foreachBatch exactly-once: the sink records (app_id,
    txn_version) IN THE SAME atomic commit as the data, so a retried
    micro-batch (same batchId after a failure) sees its token already
    committed and becomes a no-op instead of a duplicate.

    Returns the committed log version, or None when this (app_id,
    txn_version) was already applied. Loses a concurrent-writer race by
    raising ConcurrentWriteError — the caller (foreachBatch) retries,
    re-reads, and then no-ops via the token."""
    os.makedirs(table_path, exist_ok=True)
    versions = _list_versions(table_path)
    if versions:
        state = _replay_state(table_path)
        if state["txns"].get(app_id, -1) >= txn_version:
            return None  # retry of an already-committed micro-batch
        version = versions[-1] + 1
        meta_id = state["meta"].get("id", uuid.uuid4().hex)
    else:
        version = 0
        meta_id = uuid.uuid4().hex
    adds = _write_data_files(df, table_path)
    actions: list[dict] = [
        {"commitInfo": {"operation": "STREAMING UPDATE", "timestamp": int(time.time() * 1000)}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(df, meta_id),
        {"txn": {"appId": app_id, "version": txn_version}},
        *({"add": a} for a in adds),
    ]
    _commit(table_path, version, actions)
    return version


def delete(
    spark: SparkSession,
    table_path: str,
    filters: list[tuple],
) -> tuple[int, int, int]:
    """Targeted copy-on-write DELETE: remove every row matching ALL
    ``filters`` (the same (column, op, literal) triples data skipping
    uses). Files whose stats PROVE they hold no matching row are left
    untouched — their bytes are never read or rewritten; only
    potentially-matching files are rewritten without the matching rows,
    and the whole operation is ONE atomic commit (removes for the
    rewritten files + adds for their replacements; a fully-matched file
    simply gets no replacement).

    Returns (committed version, files untouched, files rewritten).

    This is how DML on an immutable-file format stays tractable at
    100 TB: a deletion predicate aligned with the table's clustering
    (Z-order, range commits) touches the handful of files that actually
    contain the rows — contrast ``plans/runner.py:erase``, which must
    rewrite every table wholesale when keys are scattered. Real delta
    works identically (file-skipping + copy-on-write + one commit)."""
    _OPS = {
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "=": lambda c, v: c == v,
        "==": lambda c, v: c == v,
    }
    state = _replay_state(table_path)
    active, meta = state["active"], state["meta"]
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    untouched, rewrite = [], []
    for p in sorted(active):
        (untouched if _maybe_skip(active[p], filters) else rewrite).append(p)
    adds: list[dict] = []
    if rewrite:
        df = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, p) for p in rewrite]
        )
        match = F.lit(True)
        for col, op, lit in filters:
            match = match & _OPS[op](F.col(col), F.lit(lit))
        # NULL predicate = row does NOT match = row is KEPT (SQL DELETE)
        kept = df.filter(F.coalesce(~match, F.lit(True)))
        adds = _write_data_files(kept, table_path)
    now_ms = int(time.time() * 1000)
    versions = _list_versions(table_path)
    version = versions[-1] + 1
    actions: list[dict] = [
        {"commitInfo": {"operation": "DELETE", "timestamp": now_ms}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": meta},
        *(
            {"remove": {"path": p, "deletionTimestamp": now_ms, "dataChange": True}}
            for p in rewrite
        ),
        *({"add": a} for a in adds),
    ]
    _commit(table_path, version, actions)
    return version, len(untouched), len(rewrite)


def optimize(
    spark: SparkSession,
    table_path: str,
    n_files: int = 1,
    zorder_by: tuple[str, str] | None = None,
    zorder_bits: int = 6,
) -> int:
    """Compact the active file set into ``n_files`` files in ONE commit —
    the small-files op every long-lived streaming-append table needs.
    With ``zorder_by=(x, y)`` the rows are clustered by the Morton
    interleave of the two (integer) columns' low ``zorder_bits`` bits:
    each output file covers one contiguous Z-range, so its min/max stats
    are tight on BOTH columns and data skipping prunes on either — the
    jar-free equivalent of Delta's OPTIMIZE ZORDER BY.

    Spec semantics: the commit's add/remove actions carry
    ``dataChange: false`` — the table's CONTENT is untouched (readers of
    any version, including streaming readers, can ignore the commit);
    only the layout changed. The Z-bucket assignment is pure arithmetic
    (z // width), deterministic on any engine — no sampled range
    boundaries.

    Scale: one read + n_files writes + one metadata commit; run it on the
    cold partition set on a schedule, exactly like production OPTIMIZE."""
    snap = read(spark, table_path)
    if zorder_by is not None:
        x, y = zorder_by
        terms = []
        for b in range(zorder_bits):
            terms.append(f"((((`{x}`) >> {b}) & 1) << {2 * b})")
            terms.append(f"((((`{y}`) >> {b}) & 1) << {2 * b + 1})")
        z = F.expr(" + ".join(terms))
        width = max(1, (1 << (2 * zorder_bits)) // n_files)
        # clamp so a non-dividing n_files can't push rows past the loop
        bucket = F.least((z / width).cast("long"), F.lit(n_files - 1))
    else:
        bucket = None
    versions = _list_versions(table_path)
    prior, meta = _replay(table_path)
    adds: list[dict] = []
    for i in range(n_files):
        part = (
            snap.filter(bucket == i) if bucket is not None else snap
        ).coalesce(1)
        adds += _write_data_files(part, table_path)
        if bucket is None:
            break
    now_ms = int(time.time() * 1000)
    for a in adds:
        a["dataChange"] = False
    actions: list[dict] = [
        {"commitInfo": {"operation": "OPTIMIZE", "timestamp": now_ms}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(snap, meta.get("id", uuid.uuid4().hex)),
        *(
            {"remove": {"path": p, "deletionTimestamp": now_ms, "dataChange": False}}
            for p in prior
        ),
        *({"add": a} for a in adds),
    ]
    version = versions[-1] + 1
    _commit(table_path, version, actions)
    return version


def vacuum(table_path: str, retain_versions: int | None = None) -> list[str]:
    """Delete unreferenced data files.

    Default (``retain_versions=None``): only never-committed garbage goes
    (crashed writers' staging leftovers) — every committed version stays
    time-travelable.

    With ``retain_versions=N``: keep only the files some version in the
    last N+1 commits still references; files that exist solely for OLDER
    snapshots are deleted, after which time travel past the horizon
    raises on its missing files — the same trade real VACUUM makes with
    its retention window (production sets it to hours/days so running
    readers don't lose files under them; a version count keeps the gate
    deterministic)."""
    versions = _list_versions(table_path)
    referenced: set[str] = set()
    if retain_versions is None:
        for v in versions:
            with open(_version_file(table_path, v)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        referenced.add(action["add"]["path"])
    else:
        horizon = versions[-1] - retain_versions if versions else -1
        for v in versions:
            if v >= horizon:
                referenced.update(_replay(table_path, v)[0])
    removed = []
    for f in os.listdir(table_path):
        if f.endswith(".parquet") and f not in referenced:
            os.remove(os.path.join(table_path, f))
            removed.append(f)
    return sorted(removed)
