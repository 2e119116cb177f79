"""Batch reader for REAL ``.zip`` archives (PKWARE APPNOTE layout).

Zip is the other container datasets actually ship in (Kaggle dumps,
scraped corpora, model checkpoints). Like tar/WARC/pcap, the format is
parsed from its ACTUAL bytes — no zipfile import on the hot path: the
end-of-central-directory record is located by scanning back from the
tail, the central directory (the authoritative index — local headers
can lie, which is why every serious unzipper walks the CD first) is
decoded entry by entry, payloads are extracted at each entry's local-
header offset, raw-DEFLATE members inflate via stdlib zlib
(wbits=-15), and every payload is verified against the central
directory's CRC-32 before a single row is emitted.

Scale posture: one parse task per archive via ``binaryFile``. The
central-directory-first design is also the SEEKABILITY story: at
100 TB a reader can list a 10 GB archive's entries from its last ~64 KB
and fetch one member by offset — the same property the .warc.gz member
index provides — so projection pushdown on entry NAME never inflates
unwanted payloads (parse_zip_bytes takes a name predicate for exactly
that)."""

from __future__ import annotations

import binascii
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

ZIP_SCHEMA = (
    "path string, entry_index bigint, name string, method string, "
    "size bigint, payload binary"
)

ZIP_N = 8
ZIP_ENTRIES = 20

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"


def write_zip(path: str, entries) -> None:
    """Write a zip from (name, payload bytes, method) tuples, method in
    {'stored', 'deflate'}: local file headers, raw-DEFLATE compression
    for 'deflate' members, a central directory mirroring every entry,
    and the end-of-central-directory record."""
    lfhs = []
    cds = []
    out = bytearray()
    for name, payload, method in entries:
        nb = name.encode("utf-8")
        crc = binascii.crc32(payload) & 0xFFFFFFFF
        if method == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = comp.compress(payload) + comp.flush()
            m = 8
        elif method == "stored":
            data = payload
            m = 0
        else:
            raise ValueError(f"unsupported zip method {method!r}")
        offset = len(out)
        lfh = _LFH_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0, m, 0, 0, crc, len(data), len(payload),
            len(nb), 0,
        )
        out += lfh + nb + data
        cds.append(
            _CD_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0, m, 0, 0, crc, len(data),
                len(payload), len(nb), 0, 0, 0, 0, 0, offset,
            )
            + nb
        )
        lfhs.append(offset)
    cd_off = len(out)
    for cd in cds:
        out += cd
    cd_size = len(out) - cd_off
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(entries), len(entries), cd_size, cd_off, 0
    )
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_zip_bytes(path: str, buf: bytes, want=None) -> Iterator[tuple]:
    """Yield (path, entry_index, name, method, size, payload) per
    central-directory entry. ``want(name) -> bool`` skips extraction
    (not just emission) of unwanted members — the seekability win.
    Raises on CRC mismatch, unknown compression method, or a payload
    that inflates to the wrong length."""
    eocd = buf.rfind(_EOCD_SIG)
    if eocd < 0:
        raise ValueError("zip: no end-of-central-directory record")
    n_entries, _, cd_size, cd_off = struct.unpack_from("<HHII", buf, eocd + 8)
    off, idx = cd_off, 0
    for _ in range(n_entries):
        if buf[off : off + 4] != _CD_SIG:
            raise ValueError(f"zip: bad central-directory signature at {off}")
        (
            _vmade, _vneed, _flags, m, _mt, _md, crc, csize, usize,
            nlen, elen, clen, _disk, _iattr, _eattr, lfh_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", buf, off + 4)
        name = buf[off + 46 : off + 46 + nlen].decode("utf-8")
        off += 46 + nlen + elen + clen
        this_idx = idx
        idx += 1
        if want is not None and not want(name):
            continue
        if buf[lfh_off : lfh_off + 4] != _LFH_SIG:
            raise ValueError(f"zip: bad local header for {name!r}")
        lnlen, lelen = struct.unpack_from("<HH", buf, lfh_off + 26)
        data_off = lfh_off + 30 + lnlen + lelen
        data = buf[data_off : data_off + csize]
        if m == 0:
            payload = data
            method = "stored"
        elif m == 8:
            payload = zlib.decompress(data, -15)
            method = "deflate"
        else:
            raise ValueError(f"zip: unsupported method {m} for {name!r}")
        if len(payload) != usize:
            raise ValueError(
                f"zip: {name!r} inflated to {len(payload)} bytes, "
                f"central directory says {usize}"
            )
        if binascii.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: {name!r} fails CRC-32")
        yield (path, this_idx, name, method, usize, payload)


def read_zip(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (file, dir, or glob of ``.zip``) into one row per
    entry. One parse task per archive via ``binaryFile``."""

    _COLS = ["path", "entry_index", "name", "method", "size", "payload"]

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_zip_bytes(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=_COLS)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, ZIP_SCHEMA)
    )


# --- fixture archives --------------------------------------------------------


def _zip_payload(i: int) -> bytes:
    return bytes((5 * i + 3 * k) % 256 for k in range(30 + i % 23))


def _zip_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_zip_payload, write_zip, ZIP_N, ZIP_ENTRIES)
    d = os.path.join(SCRATCH, f"zip_archives_{rev}")
    os.makedirs(d, exist_ok=True)
    for z in range(ZIP_N):
        p = os.path.join(d, f"arc_{z:04d}.zip")
        if not os.path.exists(p):
            entries = []
            for j in range(ZIP_ENTRIES):
                i = z * ZIP_ENTRIES + j
                entries.append(
                    (
                        f"doc_{i:05d}.bin",
                        _zip_payload(i),
                        "stored" if i % 2 == 0 else "deflate",
                    )
                )
            tmp = p + ".tmp"
            write_zip(tmp, entries)
            os.replace(tmp, p)
    return d


@register(
    "scan_zip_entries",
    tags=("source", "zip", "real-bytes"),
    oracle=f"""
WITH entries AS (
  SELECT z.z AS arc, j.j AS j, z.z * {ZIP_ENTRIES} + j.j AS i
  FROM range({ZIP_N}) z(z), LATERAL unnest(range({ZIP_ENTRIES})) AS j(j)
),
sized AS (SELECT arc, j, i, 30 + i % 23 AS plen FROM entries),
sums AS (
  SELECT i, CAST(SUM((5 * i + 3 * k.k) % 256) AS BIGINT) AS bsum
  FROM sized, LATERAL unnest(range(0, plen)) AS k(k)
  GROUP BY i
)
SELECT CAST(arc AS INTEGER) AS arc_id,
       CAST(j AS BIGINT) AS entry_index,
       'doc_' || lpad(CAST(i AS VARCHAR), 5, '0') || '.bin' AS name,
       CASE WHEN i % 2 = 0 THEN 'stored' ELSE 'deflate' END AS method,
       CAST(plen AS BIGINT) AS size,
       sums.bsum AS byte_sum,
       CAST((5 * i) % 256 AS INTEGER) AS first_byte,
       CAST((5 * i + 3 * (plen - 1)) % 256 AS INTEGER) AS last_byte
FROM sized JOIN sums USING (i)
""",
)
def scan_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL zip parsing end-to-end: fixture archives (half stored, half
    raw-DEFLATE members) re-parsed from bytes — EOCD scan-back, central
    directory walk, local-header offsets, zlib inflate, CRC-32 check —
    with every entry's size, exact byte sum and POSITION-SENSITIVE
    first/last bytes verified against a closed-form DuckDB oracle. The
    method column proves both decompression paths produced identical
    content streams. Scale: one parse task per archive; only O(1) probe
    columns shuffle."""
    d = _zip_fixture_dir()
    entries = read_zip(spark, os.path.join(d, "*.zip"))
    arc_id = F.regexp_extract(F.col("path"), r"arc_(\d{4})\.zip", 1).cast("int")
    byte_at = lambda k: F.ascii(  # noqa: E731
        F.decode(F.substring("payload", k, 1), "ISO-8859-1")
    )
    byte_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.col("size").cast("int")),
            lambda k: byte_at(k).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return entries.select(
        arc_id.alias("arc_id"),
        "entry_index",
        "name",
        "method",
        "size",
        byte_sum.alias("byte_sum"),
        byte_at(F.lit(1)).cast("int").alias("first_byte"),
        byte_at(F.col("size").cast("int")).cast("int").alias("last_byte"),
    )


# --- streaming/batch DataSource: archives landing in a directory ------------

from pyspark.sql.datasource import DataSource  # noqa: E402

from .pcap_file import PcapDirBatchReader, PcapDirStreamReader  # noqa: E402


def _read_zip_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_zip_bytes(path, buf)


class ZipDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.zip"
    _parse_file = staticmethod(_read_zip_file)


class ZipDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.zip"
    _parse_file = staticmethod(_read_zip_file)


class ZipDirDataSource(DataSource):
    """format('zip_dir') — the pcap_dir contract (name-anchored
    offsets, one archive per partition, max_files_per_trigger) for zip
    archives landing in a directory: each dataset drop is consumed
    exactly once, CRC-gated."""

    @classmethod
    def name(cls) -> str:
        return "zip_dir"

    def schema(self) -> str:
        return ZIP_SCHEMA

    def reader(self, schema):
        return ZipDirBatchReader(self.options)

    def streamReader(self, schema):
        return ZipDirStreamReader(self.options)


def register_zip_source(spark: SparkSession) -> None:
    spark.dataSource.register(ZipDirDataSource)
