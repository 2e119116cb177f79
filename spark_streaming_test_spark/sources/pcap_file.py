"""Batch reader for REAL ``.pcap`` capture files (O1 fidelity path).

The reference ingests live packets via pcap4j and stores each frame's
raw bytes (``CaptureNetworkReceiver.java:99`` — ``packet.getRawData()``).
The sandbox has no libpcap and no NICs, so live capture is covered by
the synthetic DataSource twin (``sources/packets.py``); what a real
user replays instead is capture FILES — and those are a fully public,
stable byte format (the classic libpcap format: 24-byte global header,
then per-record 16-byte headers + raw frame bytes). This module parses
that format from Spark ``binaryFile`` scans, closing the last O1
fidelity gap: the engine consumes actual pcap bytes, not just synth
frames.

Format (pcap file format, public spec):

    global header: magic u32 | ver_major u16 | ver_minor u16 |
                   thiszone i32 | sigfigs u32 | snaplen u32 | network u32
    per record:    ts_sec u32 | ts_usec u32 | incl_len u32 | orig_len u32
                   followed by incl_len raw bytes

Magic 0xa1b2c3d4 read back as-written means native byte order matched
the writer; 0xd4c3b2a1 means the file was written on the opposite
endianness — both are handled (the nanosecond-precision 0xa1b23c4d
variant maps ts_usec to nanos/1000 so the schema stays microseconds).

Scale posture: ``binaryFile`` yields one row per capture file, so the
parse parallelizes across FILES (the unit capture hardware rotates at —
one file per NIC per interval). A single record stream is inherently
sequential (variable-length records chain off each other), so a
monolithic multi-GB pcap should be rotated at capture time; the parser
streams each file's records out in bounded Arrow batches rather than
materializing one giant row list.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

PCAP_SCHEMA = (
    "path string, pkt_index bigint, ts_sec bigint, ts_usec bigint, "
    "incl_len int, orig_len int, data binary"
)

_MAGIC_USEC = 0xA1B2C3D4
_MAGIC_NSEC = 0xA1B23C4D
_GLOBAL_HDR = 24
_REC_HDR = 16
_BATCH_ROWS = 2048  # rows per emitted Arrow batch


def _detect(buf: bytes) -> tuple[str, int]:
    """Return (struct endian prefix, nanos divisor) for the file magic."""
    if len(buf) < _GLOBAL_HDR:
        raise ValueError("pcap file shorter than global header")
    for endian in ("<", ">"):
        magic = struct.unpack(endian + "I", buf[:4])[0]
        if magic == _MAGIC_USEC:
            return endian, 1
        if magic == _MAGIC_NSEC:
            return endian, 1000
    raise ValueError(f"not a pcap file (magic {buf[:4].hex()})")


def parse_pcap_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield (path, pkt_index, ts_sec, ts_usec, incl_len, orig_len, data)
    for every complete record; a truncated trailing record (torn
    capture) is dropped, mirroring what tcpdump tolerates."""
    endian, nsdiv = _detect(buf)
    unpack = struct.Struct(endian + "IIII").unpack_from
    off, idx, n = _GLOBAL_HDR, 0, len(buf)
    while off + _REC_HDR <= n:
        ts_sec, ts_frac, incl, orig = unpack(buf, off)
        if off + _REC_HDR + incl > n:
            break  # torn final record
        data = buf[off + _REC_HDR : off + _REC_HDR + incl]
        yield (path, idx, ts_sec, ts_frac // nsdiv, incl, orig, data)
        off += _REC_HDR + incl
        idx += 1


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (file, dir, or glob of ``.pcap``) into one row per
    captured packet. One parse task per file via ``binaryFile``; records
    stream out in bounded batches."""

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_pcap_bytes(path_, bytes(content)):
                    rows.append(rec)
                    if len(rows) >= _BATCH_ROWS:
                        yield pd.DataFrame(rows, columns=_COLS)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)

    _COLS = [
        "path", "pkt_index", "ts_sec", "ts_usec",
        "incl_len", "orig_len", "data",
    ]
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, PCAP_SCHEMA)
    )


def write_pcap(path: str, packets, *, nanos: bool = False, big_endian: bool = False) -> None:
    """Write a standard pcap file from (ts_sec, ts_frac, incl_len,
    orig_len, data) tuples — the fixture generator for tests/oracles
    (and a usable mini-writer: tcpdump/wireshark open its output)."""
    endian = ">" if big_endian else "<"
    magic = _MAGIC_NSEC if nanos else _MAGIC_USEC
    with open(path, "wb") as f:
        f.write(struct.pack(endian + "IHHiIII", magic, 2, 4, 0, 0, 65535, 1))
        for ts_sec, ts_frac, incl, orig, data in packets:
            f.write(struct.pack(endian + "IIII", ts_sec, ts_frac, incl, orig))
            f.write(data)


# --- oracle-checked fixture query ------------------------------------------

SCRATCH = "/root/repo/.scratch"
PCAP_N = 200


def _fixture_packets():
    """Deterministic capture: packet i is (1700000000+3i, i^2 mod 1e6)
    with a printable single-byte payload pattern — every field is a
    closed-form function of i, which is what lets DuckDB recompute the
    expected parse output from range() without reading the binary."""
    for i in range(PCAP_N):
        plen = 20 + (i * 7) % 200
        data = bytes([33 + i % 94]) * plen
        yield (1700000000 + 3 * i, (i * i) % 1000000, plen, plen + i % 3, data)


def _fixture_path(tag: str) -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    os.makedirs(SCRATCH, exist_ok=True)
    # Recipe hash in the name: changing the formula or PCAP_N can't
    # silently reuse a stale binary (fixtures.py rationale).
    rev = fixture_rev(_fixture_packets, write_pcap, PCAP_N)
    path = os.path.join(SCRATCH, f"capture_{tag}_{rev}.pcap")
    if not os.path.exists(path):
        tmp = path + ".tmp"  # write-then-rename: no torn fixture on crash
        write_pcap(tmp, _fixture_packets())
        os.replace(tmp, path)
    return path


@register(
    "scan_pcap_file",
    tags=("source", "pcap", "binary"),
    oracle=f"""
SELECT CAST(i AS BIGINT) AS pkt_index,
       CAST(1700000000 + 3 * i AS BIGINT) AS ts_sec,
       CAST((i * i) % 1000000 AS BIGINT) AS ts_usec,
       CAST(20 + (i * 7) % 200 AS INTEGER) AS incl_len,
       CAST(20 + (i * 7) % 200 + i % 3 AS INTEGER) AS orig_len,
       md5(repeat(chr(CAST(33 + i % 94 AS INTEGER)),
                  CAST(20 + (i * 7) % 200 AS INTEGER))) AS payload_md5
FROM range({PCAP_N}) t(i)
""",
)
def scan_pcap_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse REAL pcap bytes (standard libpcap file format: 24-byte
    global header, 16-byte record headers, raw frame bytes — the format
    the reference's pcap4j capture would be replayed from,
    CaptureNetworkReceiver.java:99) into one row per packet, then
    md5-fingerprint each payload. The fixture file is generated once
    from a closed-form formula, so the DuckDB oracle reconstructs every
    header field and payload hash from range() — the parse is verified
    against independently recomputed bytes, not against itself."""
    path = _fixture_path("fixture")
    df = read_pcap(spark, path)
    return df.select(
        "pkt_index",
        "ts_sec",
        "ts_usec",
        "incl_len",
        "orig_len",
        F.md5("data").alias("payload_md5"),
    )


# --- reference pipeline over real pcap bytes --------------------------------

PCAP_NIFS = 3
PCAP_TRAFFIC_N = 300


def _traffic_packets(nif_idx: int):
    """Per-NIC capture with bursty sizes: both routing branches of the
    reference's threshold (150) are reachable (85 alert / 101 info
    windows across the 3 NICs)."""
    for i in range(PCAP_TRAFFIC_N):
        plen = 1 + (13 * i + 5 * nif_idx) % 60
        data = bytes([65 + nif_idx]) * plen
        yield (1700000000 + 61 * i, (i * 37) % 1000000, plen, plen, data)


def _traffic_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    rev = fixture_rev(_traffic_packets, write_pcap, PCAP_NIFS, PCAP_TRAFFIC_N)
    d = os.path.join(SCRATCH, f"pcap_traffic_{rev}")
    os.makedirs(d, exist_ok=True)
    for n in range(PCAP_NIFS):
        path = os.path.join(d, f"eth{n}.pcap")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            write_pcap(tmp, _traffic_packets(n))
            os.replace(tmp, path)
    return d


@register(
    "traffic_pcap_pipeline",
    tags=("flagship", "pcap", "routing", "source"),
    oracle=f"""
WITH limits(limit_name, limit_value) AS (VALUES ('min', 50), ('max', 150)),
mx AS (
  SELECT limit_value FROM (
    SELECT limit_name, limit_value FROM limits
    WHERE limit_name IN ('min','max') ORDER BY limit_value LIMIT 2
  ) t ORDER BY limit_value DESC LIMIT 1
),
pk AS (
  SELECT 'eth' || CAST(n AS VARCHAR) AS nif,
         (1700000000 + 61 * i) - (1700000000 + 61 * i) % 300
           AS window_start_epoch,
         1 + (13 * i + 5 * n) % 60 AS len
  FROM range({PCAP_TRAFFIC_N}) t(i) CROSS JOIN range({PCAP_NIFS}) u(n)
),
agg AS (
  SELECT nif, CAST(window_start_epoch AS BIGINT) AS window_start_epoch,
         CAST(SUM(len) AS BIGINT) AS total_bytes
  FROM pk GROUP BY 1, 2
)
SELECT agg.nif, agg.window_start_epoch, agg.total_bytes,
       agg.total_bytes > mx.limit_value AS is_alert,
       CASE WHEN agg.total_bytes > mx.limit_value
            THEN 'Alert: the amount of data suppressed the limit'
            ELSE 'Info: the amount of data is under the limit'
       END AS message
FROM agg, mx
""",
)
def traffic_pcap_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL pipeline (O1 source -> O3 projection -> O11
    sum-by-key -> O4-O8 limits lookup -> O12 threshold routing) running
    over REAL pcap bytes: one capture file per NIC (the rotation layout
    live capture produces), parsed by the standard-format reader, byte
    totals per NIC per 5-minute tumbling window (epoch-floor arithmetic
    — timezone-free), routed against the traffic_limits max exactly as
    MainApp.java:51-64. The DuckDB oracle recomputes everything from
    the fixture's closed-form formula, so the parse, the per-file NIC
    attribution, the window arithmetic, and both routing branches are
    all independently verified (85 alert / 101 info windows).

    Scale: parse parallelism = capture files; the one shuffle is the
    (nif, window) aggregate, partial-combined map-side. Identical plan
    shape to the events-table flagship, fed by bytes instead of rows."""
    from ..operators.traffic import ALERT_MSG, INFO_MSG, lookup_max_limit

    d = _traffic_fixture_dir()
    max_limit = lookup_max_limit(spark)
    pk = read_pcap(spark, os.path.join(d, "*.pcap")).select(
        F.regexp_extract("path", r"(eth\d+)\.pcap$", 1).alias("nif"),
        (F.col("ts_sec") - F.col("ts_sec") % 300).alias("window_start_epoch"),
        F.col("incl_len").cast("bigint").alias("len"),
    )
    agg = pk.groupBy("nif", "window_start_epoch").agg(
        F.sum("len").alias("total_bytes")
    )
    is_alert = F.col("total_bytes") > F.lit(max_limit)
    return agg.select(
        "nif",
        "window_start_epoch",
        "total_bytes",
        is_alert.alias("is_alert"),
        F.when(is_alert, ALERT_MSG).otherwise(INFO_MSG).alias("message"),
    )


# --- pcap directory source (batch + stream) ---------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


@dataclass
class PcapFilePartition(InputPartition):
    """One capture file = one Spark task (picklable; shipped to
    executors by the Python data-source harness)."""

    path: str


def _read_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_pcap_bytes(path, buf)


class PcapDirBatchReader(DataSourceReader):
    # Subclass hooks: the rotated-dir reading/offset machinery is format-
    # agnostic (sources/warc.py reuses it for WARC segments) — only the
    # glob and the per-file parser vary.
    _GLOB = "*.pcap"
    _parse_file = staticmethod(_read_file)

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError(f"{type(self).__name__} requires a 'path' option")

    def _files(self) -> list[str]:
        import glob

        return sorted(glob.glob(os.path.join(self.dir, self._GLOB)))

    def partitions(self):
        return [PcapFilePartition(p) for p in self._files()]

    def read(self, partition: PcapFilePartition | None) -> Iterator[tuple]:
        if partition is None:  # empty dir: Spark substitutes [None]
            return
        yield from self._parse_file(partition.path)


class PcapDirStreamReader(DataSourceStreamReader):
    """Tail a directory of ROTATED capture files — the layout live
    capture produces (tcpdump -G / -C writes a complete file, then the
    next): the offset is the NAME of the last consumed file, and a
    batch is every listed file lexicographically after it. Rotation
    names files monotonically, so lexicographic order is arrival
    order, and the write-then-rename rotation contract means a listed
    file is complete. Replay of an offset range re-reads exactly the
    same files — a RELIABLE source (exactly-once with a checkpointed
    sink), which the reference's in-memory receiver was not
    (CaptureNetworkReceiver.java:97-102 drops frames on restart).

    Name-anchored (not count-anchored) on purpose: capture RETENTION
    deletes old files, and a consumed-prefix COUNT shifts when the
    listing shrinks — replaying wrong files or re-reading consumed
    ones. A name comparison is monotone under deletion of anything
    already consumed, so retention cleanup and offsets never interact.

    One file per partition: each micro-batch parses its new files in
    parallel tasks, the same work unit as the batch reader."""

    # Same subclass hooks as PcapDirBatchReader (warc_dir reuses the
    # whole name-anchored offset machinery with only these two swapped).
    _GLOB = "*.pcap"
    _parse_file = staticmethod(_read_file)

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError(f"{type(self).__name__} requires a 'path' option")
        # back-pressure: at most N new files per micro-batch (<=0 =
        # unbounded) — the maxFilesPerTrigger analogue, so a backlog of
        # thousands of rotated files drains in bounded batches instead
        # of one giant catch-up batch
        self._cap = int(options.get("max_files_per_trigger", -1) or -1)
        # Latest name ever OFFERED (not consumed). Mutating reader state
        # here is safe only because of the Python streaming API's
        # lifecycle contract, which the exactly-once tests pin: Spark
        # constructs exactly ONE stream-reader instance per run on the
        # driver, and calls latestOffset()/partitions() serially on it.
        # After a driver bounce a FRESH instance starts with _high=""
        # but partitions(start, end) re-seeds it from the CHECKPOINTED
        # end offset (max below) before the next latestOffset() call, so
        # consumed files are never re-offered even when retention has
        # deleted everything below the checkpoint. Any refactor that
        # caches offsets elsewhere or constructs extra reader instances
        # breaks exactly-once — see
        # test_pcap_stream_restart_retention_no_rereads.
        self._high = ""

    def _names(self) -> list[str]:
        import glob

        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(self.dir, self._GLOB))
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        newer = [n for n in self._names() if n > self._high]
        if newer:
            take = len(newer) if self._cap <= 0 else min(self._cap, len(newer))
            self._high = newer[take - 1]
        return {"last": self._high}

    def partitions(self, start: dict, end: dict):
        self._high = max(self._high, end["last"])
        return [
            PcapFilePartition(os.path.join(self.dir, n))
            for n in self._names()
            if start["last"] < n <= end["last"]
        ]

    def read(self, partition: PcapFilePartition | None) -> Iterator[tuple]:
        if partition is None:
            return
        yield from self._parse_file(partition.path)

    def commit(self, end: dict) -> None:
        pass  # files stay on disk; offsets alone define progress


class PcapDirDataSource(DataSource):
    """format('pcap_dir') — register with
    ``spark.dataSource.register(PcapDirDataSource)``.

    Options:
        path                   capture directory (required)
        max_files_per_trigger  back-pressure cap on new files offered
                               per micro-batch offset (<=0 = unbounded;
                               stream reader only)
    """

    @classmethod
    def name(cls) -> str:
        return "pcap_dir"

    def schema(self) -> str:
        return PCAP_SCHEMA

    def reader(self, schema):
        return PcapDirBatchReader(self.options)

    def streamReader(self, schema):
        return PcapDirStreamReader(self.options)


def register_pcap_source(spark: SparkSession) -> None:
    spark.dataSource.register(PcapDirDataSource)


# --- protocol-header parsing with BUILT-IN functions (no Python) ------------

FLOW_N = 400


def _flow_frame(i: int) -> bytes:
    """A real Ethernet II + IPv4 + TCP frame (header layout per the
    public specs), fields driven by closed-form formulas of i so the
    oracle can recompute every parsed value."""
    payload_len = 6 + (i * 3) % 40
    total_len = 20 + 20 + payload_len
    eth = bytes(6) + bytes(6) + struct.pack(">H", 0x0800)
    ip = struct.pack(
        ">BBHHHBBH4s4s",
        0x45, 0, total_len, i % 65536, 0, 64, 6, 0,
        bytes([10, 0, i % 8, i % 29]),
        bytes([10, 1, i % 5, i % 17]),
    )
    tcp = struct.pack(
        ">HHIIBBHHH",
        1024 + i % 1000, (80, 443, 22)[i % 3],
        i, 0, 0x50, 0x18, 8192, 0, 0,
    )
    return eth + ip + tcp + bytes([i % 251]) * payload_len


def _flow_fixture_path() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    os.makedirs(SCRATCH, exist_ok=True)
    rev = fixture_rev(_flow_frame, write_pcap, FLOW_N)
    path = os.path.join(SCRATCH, f"capture_flows_{rev}.pcap")
    if not os.path.exists(path):
        # write-then-rename: a crash mid-write must not leave a torn
        # file that the exists-check would then treat as the fixture
        tmp = path + ".tmp"
        frames = [_flow_frame(i) for i in range(FLOW_N)]
        write_pcap(
            tmp,
            [
                (1700000000 + i, 0, len(f), len(f), f)
                for i, f in enumerate(frames)
            ],
        )
        os.replace(tmp, path)
    return path


@register(
    "traffic_pcap_flows",
    tags=("flagship", "pcap", "protocol", "codegen"),
    oracle=f"""
WITH pk AS (
  SELECT i,
         '10.0.' || CAST(i % 8 AS VARCHAR) || '.' || CAST(i % 29 AS VARCHAR)
           AS src_ip,
         '10.1.' || CAST(i % 5 AS VARCHAR) || '.' || CAST(i % 17 AS VARCHAR)
           AS dst_ip,
         CAST([80, 443, 22][i % 3 + 1] AS INTEGER) AS dst_port,
         54 + 6 + (i * 3) % 40 AS frame_bytes
  FROM range({FLOW_N}) t(i)
)
SELECT src_ip, dst_ip, dst_port,
       CAST(COUNT(*) AS BIGINT) AS n_packets,
       CAST(SUM(frame_bytes) AS BIGINT) AS total_bytes
FROM pk GROUP BY src_ip, dst_ip, dst_port
""",
)
def traffic_pcap_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-aware flow aggregation from RAW FRAME BYTES with
    BUILT-IN functions only — no Python touches a packet after the
    file-level parse: Ethernet/IPv4/TCP header fields come out of the
    binary column via substring/hex/conv (fixed offsets per the public
    header layouts: ethertype at byte 12, IPv4 src/dst at 26/30, TCP
    dst port at 36), so field extraction runs inside whole-stage
    codegen on the JVM. This is the idiomatic-Spark answer to per-
    packet imperative code — the engine's row loop, not Python's —
    and the shape a 100 TB flow pipeline needs: parse parallelism =
    capture files, extraction fused into the scan stage, ONE shuffle
    on the flow key.

    Output: top-talker matrix per (src_ip, dst_ip, dst_port) with
    packet and byte counts; the oracle recomputes every field from the
    frame-generation formulas, so a single mis-offset byte breaks the
    hash."""
    path = _flow_fixture_path()
    pk = read_pcap(spark, path).filter(
        # ethertype 0x0800 (IPv4) + protocol TCP: real captures mix
        # protocols, so the filters are part of the contract even
        # though this fixture is all-TCP.
        (F.conv(F.hex(F.expr("substring(data, 13, 2)")), 16, 10) == "2048")
        & (F.conv(F.hex(F.expr("substring(data, 24, 1)")), 16, 10) == "6")
    )

    def byte_at(pos: int) -> F.Column:  # 1-based offset into the frame
        return F.conv(F.hex(F.expr(f"substring(data, {pos}, 1)")), 16, 10)

    def ip_at(pos: int) -> F.Column:
        return F.concat_ws(
            ".", byte_at(pos), byte_at(pos + 1), byte_at(pos + 2), byte_at(pos + 3)
        )

    flows = pk.select(
        ip_at(27).alias("src_ip"),
        ip_at(31).alias("dst_ip"),
        F.conv(F.hex(F.expr("substring(data, 37, 2)")), 16, 10)
        .cast("int")
        .alias("dst_port"),
        F.col("incl_len").cast("bigint").alias("frame_bytes"),
    )
    return flows.groupBy("src_ip", "dst_ip", "dst_port").agg(
        F.count(F.lit(1)).alias("n_packets"),
        F.sum("frame_bytes").alias("total_bytes"),
    )
