"""Custom packet-capture source (O1) as a PySpark DataSource.

The reference's ingest is a custom receiver opening every NIC via pcap4j
and emitting (nifName, rawPacketBytes) into Spark's block store, one
capture thread per NIC (CaptureNetworkReceiver.java:23-128; emit at
:97-102; per-NIC threads :68-75; snaplen/readTimeout config :27-40).

Live pcap capture has no Structured Streaming built-in; per SURVEY.md
§2 O1 the engine defines ONE schema and interchangeable sources behind
it: Kafka (production), file/parquet (replay), and this registered
Python DataSource ``synthetic_packets`` — a deterministic frame
generator whose offset-based replay makes it a *reliable* source
(exactly-once on restart), which the reference's receiver was not.

Schema (FIXTURES.md §12): nif string, raw binary, ts timestamp.

Options:
    nifs              number of synthetic NICs            (default 4)
    packets_per_batch packets per NIC per micro-batch     (default 300,
                      the reference's capture-cycle bound,
                      CaptureNetworkReceiver.java:97)
    snaplen           max raw-payload bytes               (default 65536,
                      CaptureNetworkReceiver.java:32-35)
    max_batches       stop advancing offsets after N batches (default
                      unbounded; finite values make tests terminate)
    start_epoch_s     event-time base (default 2024-01-01)

Parallelism note: this simple reader generates on one task (fine for a
test source); the production path is Kafka where partitions = NICs
gives the per-NIC parallelism of the reference's thread-per-NIC model.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

SCHEMA_DDL = "nif string, raw binary, ts timestamp"

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def _packet(nif_idx: int, batch: int, seq: int, snaplen: int):
    """Deterministic synthetic frame: size and payload derive from a
    hash of (nif, batch, seq) so any offset range replays identically."""
    h = hashlib.sha256(f"{nif_idx}:{batch}:{seq}".encode()).digest()
    size = 64 + int.from_bytes(h[:2], "big") % (snaplen - 64)
    payload = (h * (size // len(h) + 1))[:size]
    ts = datetime.fromtimestamp(
        _EPOCH_2024 + batch * 300 + (seq % 300), tz=timezone.utc
    ).replace(tzinfo=None) + timedelta(milliseconds=seq % 1000)
    return (f"eth{nif_idx}", bytearray(payload), ts)


class _Conf:
    def __init__(self, options):
        self.nifs = int(options.get("nifs", 4))
        self.packets_per_batch = int(options.get("packets_per_batch", 300))
        self.snaplen = int(options.get("snaplen", 65536))
        self.max_batches = int(options.get("max_batches", -1))


def _gen_batch(conf: _Conf, batch: int) -> Iterator[tuple]:
    for nif_idx in range(conf.nifs):
        for seq in range(conf.packets_per_batch):
            yield _packet(nif_idx, batch, seq, conf.snaplen)


class SyntheticPacketStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.conf = _Conf(options)

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict):
        batch = start["batch"]
        if 0 <= self.conf.max_batches <= batch:
            return iter([]), start  # exhausted: offset stops advancing
        # list-iterator, not a generator: the harness caches and pickles
        # the prefetched rows, and generators are unpicklable
        return iter(list(_gen_batch(self.conf, batch))), {"batch": batch + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return [
            row
            for batch in range(start["batch"], end["batch"])
            for row in _gen_batch(self.conf, batch)
        ]


class SyntheticPacketBatchReader(DataSourceReader):
    def __init__(self, options):
        self.conf = _Conf(options)

    def read(self, partition) -> Iterator[tuple]:
        batches = self.conf.max_batches if self.conf.max_batches >= 0 else 1
        for batch in range(batches):
            yield from _gen_batch(self.conf, batch)


class SyntheticPacketDataSource(DataSource):
    """format('synthetic_packets') — register with
    ``spark.dataSource.register(SyntheticPacketDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_packets"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return SyntheticPacketStreamReader(self.options)

    def reader(self, schema: StructType):
        return SyntheticPacketBatchReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticPacketDataSource)
