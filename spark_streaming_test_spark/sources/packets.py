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

Parallelism: one input partition per NIC, in both the batch reader
(``partitions()``) and the stream reader (``DataSourceStreamReader``) —
the planner schedules one task per NIC, matching the reference's
thread-per-NIC capture model (CaptureNetworkReceiver.java:68-75). At
scale the same shape holds: partitions = capture interfaces, so adding
NICs adds parallel read tasks with no code change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
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
        yield from _gen_nif_batch(conf, nif_idx, batch)


def _gen_nif_batch(conf: _Conf, nif_idx: int, batch: int) -> Iterator[tuple]:
    """One NIC's frames for one micro-batch — the unit of task work."""
    for seq in range(conf.packets_per_batch):
        yield _packet(nif_idx, batch, seq, conf.snaplen)


@dataclass
class NicPartition(InputPartition):
    """One capture interface × one offset range = one Spark task, the
    same work unit as the reference's per-NIC capture thread
    (CaptureNetworkReceiver.java:68-75). Must stay picklable — it is
    shipped to executors by the Python data-source harness."""

    nif_idx: int
    start_batch: int
    end_batch: int


class SyntheticPacketStreamReader(DataSourceStreamReader):
    """Partitioned stream reader: ``partitions(start, end)`` fans the
    offset range out to one :class:`NicPartition` per NIC, so each
    micro-batch reads all NICs in parallel tasks instead of one."""

    def __init__(self, options):
        self.conf = _Conf(options)
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        # One generated batch per poll, capped at max_batches so tests
        # (and availableNow triggers) terminate.
        if self.conf.max_batches < 0 or self._latest < self.conf.max_batches:
            self._latest += 1
        return {"batch": self._latest}

    def partitions(self, start: dict, end: dict):
        # On restart Spark replans from checkpointed offsets without
        # calling initialOffset — keep the poll counter ahead of any
        # offset Spark already knows so latestOffset never goes backward.
        self._latest = max(self._latest, end["batch"])
        return [
            NicPartition(nif_idx, start["batch"], end["batch"])
            for nif_idx in range(self.conf.nifs)
        ]

    def read(self, partition: NicPartition) -> Iterator[tuple]:
        for batch in range(partition.start_batch, partition.end_batch):
            yield from _gen_nif_batch(self.conf, partition.nif_idx, batch)

    def commit(self, end: dict) -> None:
        # Synthetic frames are derived from offsets — nothing to
        # release; just keep the poll counter monotone across restarts.
        self._latest = max(self._latest, end["batch"])


class SyntheticPacketBatchReader(DataSourceReader):
    """Batch reader with FILTER PUSHDOWN (Spark 4.1 Python DataSource
    API): equality filters on the partition-defining ``nif`` column
    are accepted in :meth:`pushFilters` and applied at PLANNING time —
    ``partitions()`` simply does not emit the pruned NICs, so filtered
    scans schedule fewer tasks and generate zero dead rows (the
    Python-source analogue of parquet partition pruning; the
    capture-source equivalent of only opening the requested
    interface). All other filters are returned to Spark to evaluate
    post-scan, per the API contract."""

    def __init__(self, options):
        self.conf = _Conf(options)
        self._nif_filter: set[int] | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo

        # The filter list is a CONJUNCTION: several EqualTo on nif must
        # INTERSECT (nif='eth0' AND nif='eth1' selects nothing), not
        # union — a union would claim the filters fully applied while
        # emitting rows from both NICs.
        nif_sets: list[set[int]] = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("nif",)
                and isinstance(f.value, str)
                and f.value.startswith("eth")
                and f.value[3:].isdigit()
            ):
                nif_sets.append({int(f.value[3:])})
            else:
                yield f  # not handled here — Spark evaluates it
        if nif_sets:
            self._nif_filter = set.intersection(*nif_sets)

    def partitions(self):
        batches = self.conf.max_batches if self.conf.max_batches >= 0 else 1
        nifs = range(self.conf.nifs)
        if self._nif_filter is not None:
            nifs = [i for i in nifs if i in self._nif_filter]
        return [NicPartition(nif_idx, 0, batches) for nif_idx in nifs]

    def read(self, partition: NicPartition) -> Iterator[tuple]:
        if partition is None:
            # Spark substitutes [None] for an empty partitions() list —
            # reached when pushed filters contradict (empty nif set).
            return
        for batch in range(partition.start_batch, partition.end_batch):
            yield from _gen_nif_batch(self.conf, partition.nif_idx, batch)


class SyntheticPacketDataSource(DataSource):
    """format('synthetic_packets') — register with
    ``spark.dataSource.register(SyntheticPacketDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_packets"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType):
        return SyntheticPacketStreamReader(self.options)

    def reader(self, schema: StructType):
        return SyntheticPacketBatchReader(self.options)


def register(spark) -> None:
    # The batch reader implements pushFilters(); Spark refuses to plan a
    # pushdown-capable Python source while the feature flag is off, so
    # registration enables it (runtime-settable) for whichever session
    # is handed in — including a driver's plain default session.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticPacketDataSource)
