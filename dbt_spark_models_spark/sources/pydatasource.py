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
