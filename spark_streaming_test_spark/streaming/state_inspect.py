"""State-store introspection: read a streaming query's checkpointed
state back as a DataFrame (Spark 4 ``statestore`` data source).

The reference's only state is a static in-JVM ConcurrentMap
(KafkaProducer.java:34-41) — invisible, unqueryable, lost on restart.
Structured Streaming externalizes the same role into the checkpointed
state store, and Spark 4's reader turns that store into a scannable
table: the operational "what does the engine currently remember?"
question (state audits, skew debugging, TTL verification) becomes a
plain batch query.

The pipeline here is the reference's dedup shape: a bounded
``dropDuplicates`` stream over the events feed, run to completion with
``Trigger.AvailableNow`` against a fresh checkpoint, after which the
state store is read back. For exact-dedup state, the store's keys ARE
the distinct key set — so the whole round trip (stream → checkpoint →
state scan) is oracle-checkable against ``SELECT DISTINCT``.

Scale: state is partitioned by ``spark.sql.shuffle.partitions`` HDFS/
RocksDB stores; the reader exposes ``partition_id``, and a scan reads
each store file independently — embarrassingly parallel, no shuffle.
The staged source copy exists only because the sandbox test feed is a
single parquet file (file streams need directories); a production feed
is already a directory/Kafka topic and streams in place.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

SCRATCH = "/root/repo/.scratch"


@register(
    "stream_state_store_reader",
    tags=("streaming", "state", "source"),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a bounded dropDuplicates stream to a fresh checkpoint, then
    scan the checkpoint's state store and project the state keys — which
    must equal the batch DISTINCT of the same input. Proves the state
    checkpoint is complete, typed, and externally queryable."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(SCRATCH, f"state_reader_src_{tag}")
    ck = os.path.join(SCRATCH, f"state_reader_ck_{tag}")
    out = os.path.join(SCRATCH, f"state_reader_out_{tag}")
    for d in (src, ck, out):
        shutil.rmtree(d, ignore_errors=True)

    # Stage the bounded feed (file streams require a directory source).
    load(spark, sf_dir, "events").select("user_id", "event_type").write.mode(
        "overwrite"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, event_type string")
        .parquet(src)
        .dropDuplicates(["user_id", "event_type"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("state_store_reader: bounded stream did not finish")

    state = spark.read.format("statestore").load(ck)
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("key.event_type").alias("event_type"),
    )
