"""Custom source connector via the Spark 4 Python DataSource API
(`pyspark.sql.datasource`) — the sanctioned way to plug a new format or
system into the DataFrame reader from Python, with REAL partition
semantics: `partitions()` returns one `InputPartition` per underlying
part-file, and each executor task calls `read(partition)` for exactly one
of them, so reads parallelize like any file scan (the JVM never sees
Python until the Arrow batches come back).

The demo format is JSON-lines over a directory of part files (what
`df.write.json(dir)` emits) — the connector shape any external system
(an internal KV store, a feed API, a bespoke format) would follow:
list splits on the driver, read one split per task.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlDataSource(DataSource):
    """`spark.read.format("jsonl_lines").option("path", dir)` with a fixed
    (doc_id, lang, text) schema."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_lines"

    def schema(self) -> str:
        return "doc_id bigint, lang string, text string"

    def reader(self, schema) -> "JsonlReader":
        return JsonlReader(self.options)

    def writer(self, schema, overwrite: bool):
        if JsonlWriter is None:  # pragma: no cover
            raise NotImplementedError(
                "pyspark.sql.datasource writer API unavailable"
            )
        return JsonlWriter(self.options, overwrite)


class JsonlReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.startswith("part-") and f.endswith(".json")
        )
        # one split per part file — task parallelism mirrors file layout
        return [InputPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition):
        with open(partition.value) as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    yield rec.get("doc_id"), rec.get("lang"), rec.get("text")

try:  # pyspark >= 4 exposes the writer half of the API
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class JsonlWriterMessage(WriterCommitMessage):
        """Per-task commit message: the staged temp file this task wrote
        (must be picklable — it travels executor → driver)."""

        def __init__(self, tmp_path: str, n_rows: int):
            self.tmp_path = tmp_path
            self.n_rows = n_rows

    class JsonlWriter(DataSourceWriter):
        """Distributed JSON-lines sink with a real two-phase commit: each
        task streams its partition to a ``.tmp-`` file and reports it in
        its commit message; only the DRIVER's ``commit()`` renames staged
        files to final ``part-NNNNN.json`` names (and ``abort()`` removes
        them) — a failed or speculated task can never leave a half-visible
        file, the same contract JVM file committers give parquet sinks."""

        def __init__(self, options, overwrite: bool):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            import uuid

            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
            n = 0
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(
                        json.dumps(
                            {"doc_id": row[0], "lang": row[1], "text": row[2]}
                        )
                        + "\n"
                    )
                    n += 1
            return JsonlWriterMessage(tmp, n)

        def commit(self, messages):
            ordered = sorted(m.tmp_path for m in messages if m is not None)
            for i, tmp in enumerate(ordered):
                os.rename(tmp, os.path.join(self.path, f"part-{i:05d}.json"))

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)

except ImportError:  # pragma: no cover — older pyspark without writer API
    JsonlWriter = None  # type: ignore[assignment]
