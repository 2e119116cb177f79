"""Custom JSONL sink as a PySpark Python DataSource **writer** (Spark 4).

The reference's egress is a per-element side-effect sink — String
records pushed to Kafka from inside ``foreach`` (KafkaProducer.java:
12-43), with no transactional story: a task retry double-sends. This
module implements the same "engine hands records to an external writer"
contract through the Python DataSource WRITE path, the API Spark 4
added so custom sinks get the full task-commit protocol instead of
user-managed side effects:

- executors serialize their partition to a TEMP file and return a
  :class:`WriterCommitMessage` describing it — nothing is visible yet;
- the driver's ``commit(messages)`` publishes every temp file with an
  atomic rename and drops a ``_SUCCESS`` manifest listing the parts;
- ``abort(messages)`` removes temp files, so failed/speculative tasks
  leave no partial output — exactly-once publication per job, the
  upgrade over the reference's at-least-once ``foreach`` push.

The streaming form (:class:`JsonlStreamWriter`) applies the same
protocol per micro-batch, publishing into ``epoch=<batchId>/``
directories — idempotent under epoch replay because commit overwrites
the epoch's manifest atomically.

Scale: one temp file per task, no driver data movement (the driver
touches only commit messages — O(tasks) paths), renames are O(files)
metadata ops. On object stores the rename step swaps for a manifest
commit, same protocol shape.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    """One task's output: the hidden temp file and its publish name."""

    tmp_path: str
    final_name: str
    n_rows: int


def _write_partition(path: str, fields, iterator) -> JsonlCommit:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else 0
    final_name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
    tmp_path = os.path.join(path, f".{final_name}.tmp")
    os.makedirs(path, exist_ok=True)
    n = 0
    with open(tmp_path, "w", encoding="utf-8") as f:
        for row in iterator:
            rec = {k: row[k] for k in fields}
            f.write(json.dumps(rec, sort_keys=True, ensure_ascii=False))
            f.write("\n")
            n += 1
    return JsonlCommit(tmp_path=tmp_path, final_name=final_name, n_rows=n)


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a 'path' option")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        return _write_partition(self.path, self.fields, iterator)

    def commit(self, messages) -> None:
        # Publish phase (driver): clear prior contents on overwrite,
        # then atomically rename every task's temp file into place and
        # record the part list in _SUCCESS.
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        parts = []
        for m in messages:
            final = os.path.join(self.path, m.final_name)
            os.rename(m.tmp_path, final)
            parts.append({"file": m.final_name, "rows": m.n_rows})
        manifest = os.path.join(self.path, "_SUCCESS")
        with open(manifest, "w", encoding="utf-8") as f:
            json.dump({"parts": parts}, f, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a 'path' option")
        self.fields = [f.name for f in schema.fields]

    def _epoch_dir(self, batch_id: int) -> str:
        return os.path.join(self.path, f"epoch={batch_id}")

    def write(self, iterator):
        from pyspark import TaskContext

        # Epoch id travels via the task context's stream epoch when
        # available; fall back to a shared staging dir + commit-time move.
        ctx = TaskContext.get()
        epoch = getattr(ctx, "getLocalProperty", lambda k: None)(
            "streaming.sql.batchId"
        )
        stage = os.path.join(self.path, ".staging" if epoch is None else f"epoch={epoch}")
        return _write_partition(stage, self.fields, iterator)

    def commit(self, messages, batchId: int) -> None:
        edir = self._epoch_dir(batchId)
        os.makedirs(edir, exist_ok=True)
        # Epoch replay after a crash mid-commit: part files are
        # uuid-named, so a second attempt would otherwise publish a
        # second set NEXT TO the stale ones and glob-readers would
        # double-count. Clearing the epoch dir first makes commit
        # idempotent regardless of where the previous attempt died
        # (mirrors the batch writer's overwrite clearing).
        for stale in os.listdir(edir):
            if stale.endswith(".jsonl") or stale == "_SUCCESS":
                try:
                    os.remove(os.path.join(edir, stale))
                except FileNotFoundError:
                    pass
        parts = []
        for m in messages:
            final = os.path.join(edir, m.final_name)
            os.replace(m.tmp_path, final)
            parts.append({"file": m.final_name, "rows": m.n_rows})
        with open(os.path.join(edir, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"parts": parts, "epoch": batchId}, f, sort_keys=True)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlDirDataSource(DataSource):
    """format('jsonl_dir') — register with
    ``spark.dataSource.register(JsonlDirDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool):
        return JsonlBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamWriter(self.options, schema)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)


# --- oracle-checked roundtrip query ---------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from ..catalog import load  # noqa: E402
from ..registry import register  # noqa: E402

SCRATCH = "/root/repo/.scratch"
DOC_DDL = "doc_id bigint, lang string, source string, n_chars bigint"


@register(
    "sink_python_datasource_roundtrip",
    tags=("sink", "source", "datasource"),
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
)
def sink_python_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write document metadata through the custom Python DataSource sink
    (task temp files → driver commit → atomic publish + _SUCCESS
    manifest), then scan the published JSONL back with the built-in
    reader under an explicit schema. Hash-matching the original table
    proves the sink's serialization, commit protocol, and the
    reader/writer schema contract end-to-end."""
    register_sink(spark)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(SCRATCH, f"jsonl_sink_{tag}")
    (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .write.format("jsonl_dir")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    return spark.read.schema(DOC_DDL).json(os.path.join(path, "*.jsonl"))
