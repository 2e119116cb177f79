"""``format("kafka_wire")`` — a Structured Streaming SOURCE speaking the
Kafka fetch wire protocol (``sources/kafka_wire.py``), no connector jar.

This is the full O14 loop made streaming: the built-in kafka source
cannot load here (no spark-sql-kafka jar — COVERAGE.md), but the Python
DataSource API (Spark 4) + the hand-built FetchRequest v2 client give
the same contract:

* offsets ARE the streaming cursor — ``initialOffset``/``latestOffset``
  report per-partition high watermarks straight from the broker, and
  each micro-batch reads exactly the [start, end) slice, so replay
  after restart re-reads the same offsets (exactly-once source
  semantics, like the real Kafka source);
* partitions are the parallelism unit — ``partitions(start, end)``
  fans out one :class:`TopicPartitionSlice` per topic-partition, each
  executor task draining its slice over its OWN socket.

The reference's producer-side O14 plus this source close the loop:
alerts produced over the wire can be consumed back as a live stream
by the same engine (``tests/test_kafka_wire.py``)."""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "topic string, partition int, offset bigint, key binary, "
    "value binary, timestamp_ms bigint"
)


@dataclass
class TopicPartitionSlice(InputPartition):
    """One topic-partition × one offset range = one Spark task (the
    real Kafka source's work unit). Picklable — shipped to executors."""

    host: str
    port: int
    topic: str
    partition: int
    start_offset: int
    end_offset: int
    fetch_version: int = 2


class KafkaWireStreamReader(DataSourceStreamReader):
    """Per-partition offset cursor over the broker's high watermarks."""

    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", "0"))
        self.topic = options.get("topic", "alerts")
        self.parts = [
            int(p) for p in str(options.get("partitions", "0")).split(",")
        ]
        self.starting = options.get("startingOffsets", "earliest")
        if self.starting not in ("earliest", "latest"):
            raise ValueError(
                f"startingOffsets must be earliest|latest, got {self.starting}"
            )
        if not self.port:
            raise ValueError("kafka_wire source requires a 'port' option")
        # 2 = message-format v1 responses, 4 = record-batch v2 (KIP-98);
        # the decode path sniffs the magic byte so both yield identical
        # rows. "auto" negotiates via ApiVersions at plan time (driver
        # side, once) — the consumer twin of the producer's
        # message_format="auto", and the only setting that talks to
        # BOTH a legacy broker and a v2-only (Kafka >= 4.0) broker.
        raw_fv = str(options.get("fetchVersion", "2"))
        if raw_fv == "auto":
            from spark_streaming_test_spark.sources.kafka_wire import (
                KafkaWireConsumer,
            )

            with KafkaWireConsumer(self.host, self.port) as consumer:
                self.fetch_version = consumer.negotiate_fetch_version()
        else:
            self.fetch_version = int(raw_fv)
        if self.fetch_version not in (2, 4):
            raise ValueError(
                f"fetchVersion must be 2, 4 or auto, got {self.fetch_version}"
            )

    def _offsets_at(self, timestamp: int) -> dict:
        from spark_streaming_test_spark.sources.kafka_wire import (
            KafkaWireConsumer,
        )

        out = {}
        with KafkaWireConsumer(self.host, self.port) as consumer:
            for p in self.parts:
                out[str(p)] = consumer.list_offset(self.topic, p, timestamp)
        return out

    def _high_watermarks(self) -> dict:
        from spark_streaming_test_spark.sources.kafka_wire import TS_LATEST

        return self._offsets_at(TS_LATEST)

    def initialOffset(self) -> dict:
        # Same semantics as the real source's startingOffsets option:
        # earliest = the log start offset, latest = only records produced
        # AFTER the stream starts. Resolved via ListOffsets v1.
        from spark_streaming_test_spark.sources.kafka_wire import (
            TS_EARLIEST,
            TS_LATEST,
        )

        return self._offsets_at(
            TS_EARLIEST if self.starting == "earliest" else TS_LATEST
        )

    def latestOffset(self) -> dict:
        return self._high_watermarks()

    def partitions(self, start: dict, end: dict):
        return [
            TopicPartitionSlice(
                self.host,
                self.port,
                self.topic,
                p,
                int(start.get(str(p), 0)),
                int(end.get(str(p), 0)),
                self.fetch_version,
            )
            for p in self.parts
            if int(end.get(str(p), 0)) > int(start.get(str(p), 0))
        ]

    def read(self, partition: TopicPartitionSlice) -> Iterator[tuple]:
        from spark_streaming_test_spark.sources.kafka_wire import (
            KafkaWireConsumer,
        )

        with KafkaWireConsumer(
            partition.host,
            partition.port,
            fetch_version=partition.fetch_version,
        ) as consumer:
            cursor = partition.start_offset
            while cursor < partition.end_offset:
                _, batch = consumer.fetch(partition.topic, partition.partition, cursor)
                if not batch:
                    # planned offsets must exist — an empty response below
                    # the promised end means broker-side truncation; fail
                    # the task rather than silently emit fewer rows
                    raise ValueError(
                        f"offset {cursor} missing below planned end "
                        f"{partition.end_offset} for {partition.topic}/"
                        f"{partition.partition}"
                    )
                for off, key, value, ts in batch:
                    if off >= partition.end_offset:
                        return
                    yield (
                        partition.topic,
                        partition.partition,
                        off,
                        key,
                        value,
                        ts,
                    )
                cursor = batch[-1][0] + 1

    def commit(self, end: dict) -> None:
        pass  # broker retains the log; nothing to release


class KafkaWireBatchReader(DataSourceReader):
    """Batch ``spark.read.format("kafka_wire")``: offsets resolved at
    plan time (earliest..latest via ListOffsets), one task per
    topic-partition — the snapshot-read twin of the stream reader."""

    def __init__(self, options):
        self.stream = KafkaWireStreamReader(options)

    def partitions(self):
        from spark_streaming_test_spark.sources.kafka_wire import TS_EARLIEST

        start = self.stream._offsets_at(TS_EARLIEST)
        end = self.stream._high_watermarks()
        return self.stream.partitions(start, end)

    def read(self, partition: TopicPartitionSlice) -> Iterator[tuple]:
        return self.stream.read(partition)


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("kafka_wire").option("host", ...)
    .option("port", ...).option("topic", ...)`` — and the same format
    for a batch snapshot read via ``spark.read``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType):
        return KafkaWireStreamReader(self.options)

    def reader(self, schema: StructType):
        return KafkaWireBatchReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)
