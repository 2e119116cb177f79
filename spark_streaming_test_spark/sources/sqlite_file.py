"""Batch reader for REAL SQLite database files.

SQLite is the most widely deployed container of tabular data on earth
and a common dataset interchange format (HuggingFace metadata dumps,
app telemetry, scraped archives). Its file format is a frozen public
spec (sqlite.org/fileformat2): a 100-byte header, fixed-size pages,
table b-trees whose leaf cells hold varint-framed RECORDS with
serial-type-tagged values. This module parses those actual bytes —
page-1 schema table walk to resolve a table's root page, interior-page
b-tree traversal in key order, 9-byte big-endian varints, and all the
record serial types a typical table uses (NULL/int widths/float64/
text/blob, plus the constant-0/1 types) — with the stdlib ``sqlite3``
module as the INDEPENDENT fixture writer (it produces the files; we
never use it to read them on the engine path).

Scope guards: WAL-mode files, freelist reuse and overflow-page
payloads raise rather than misparse (the fixture uses a 512-byte page
size precisely to force REAL interior-node traversal while keeping
every payload local). Scale posture: one parse task per database file
via ``binaryFile`` — the sharded-.db layout crawler dumps actually
use; only decoded columns shuffle."""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

SQLITE_FILES = 3
SQLITE_ROWS = 500  # per file; at 512-byte pages this forces interior nodes

SQLITE_SCHEMA_COLS = (
    "path string, rowid bigint, name string, score double, "
    "tag_len bigint, tag_sum bigint, flag bigint"
)

_MAGIC = b"SQLite format 3\x00"


def _varint(buf: bytes, off: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte
    contributes all 8 bits."""
    val = 0
    for k in range(8):
        b = buf[off + k]
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            return val, off + k + 1
    return (val << 8) | buf[off + 8], off + 9


def _record_values(buf: bytes, off: int) -> list:
    """Decode one record payload at ``off``: header of serial types,
    then the values."""
    hdr_len, p = _varint(buf, off)
    hdr_end = off + hdr_len
    stypes = []
    while p < hdr_end:
        st, p = _varint(buf, p)
        stypes.append(st)
    vals = []
    p = hdr_end
    for st in stypes:
        if st == 0:
            vals.append(None)
        elif 1 <= st <= 6:
            width = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}[st]
            raw = buf[p : p + width]
            v = int.from_bytes(raw, "big", signed=True)
            vals.append(v)
            p += width
        elif st == 7:
            vals.append(struct.unpack_from(">d", buf, p)[0])
            p += 8
        elif st == 8:
            vals.append(0)
        elif st == 9:
            vals.append(1)
        elif st >= 13 and st % 2 == 1:
            n = (st - 13) // 2
            vals.append(buf[p : p + n].decode("utf-8"))
            p += n
        elif st >= 12:
            n = (st - 12) // 2
            vals.append(bytes(buf[p : p + n]))
            p += n
        else:
            raise ValueError(f"sqlite: reserved serial type {st}")
    return vals


def _walk_table_btree(buf: bytes, page_size: int, page_no: int) -> Iterator[tuple]:
    """Yield (rowid, values) from a table b-tree rooted at ``page_no``
    (1-based), in key order — leaf cells decoded, interior pages
    recursed left-to-right then the rightmost pointer."""
    base = (page_no - 1) * page_size
    hdr = base + (100 if page_no == 1 else 0)
    ptype = buf[hdr]
    ncells = struct.unpack_from(">H", buf, hdr + 3)[0]
    if ptype == 0x05:  # interior table page
        ptr_array = hdr + 12
        for c in range(ncells):
            (cell_off,) = struct.unpack_from(">H", buf, ptr_array + 2 * c)
            (child,) = struct.unpack_from(">I", buf, base + cell_off)
            yield from _walk_table_btree(buf, page_size, child)
        (rightmost,) = struct.unpack_from(">I", buf, hdr + 8)
        yield from _walk_table_btree(buf, page_size, rightmost)
    elif ptype == 0x0D:  # leaf table page
        ptr_array = hdr + 8
        usable = page_size  # no reserved bytes in our fixtures
        local_max = usable - 35
        for c in range(ncells):
            (cell_off,) = struct.unpack_from(">H", buf, ptr_array + 2 * c)
            p = base + cell_off
            payload_len, p = _varint(buf, p)
            rowid, p = _varint(buf, p)
            if payload_len > local_max:
                raise ValueError(
                    f"sqlite: page {page_no} cell spills to overflow pages "
                    f"({payload_len} > {local_max}) — unsupported by design"
                )
            yield rowid, _record_values(buf, p)
    else:
        raise ValueError(f"sqlite: page {page_no} has type 0x{ptype:02x}")


def parse_sqlite_table(buf: bytes, table: str) -> Iterator[tuple]:
    """Yield (rowid, values) for every row of ``table``: header checks,
    sqlite_schema walk on the page-1 b-tree to find the root page,
    then the full table b-tree traversal."""
    if buf[:16] != _MAGIC:
        raise ValueError("not a SQLite 3 database file")
    (raw_ps,) = struct.unpack_from(">H", buf, 16)
    page_size = 65536 if raw_ps == 1 else raw_ps
    if struct.unpack_from(">I", buf, 96)[0] == 0 and buf[18] not in (1, 2):
        raise ValueError("sqlite: unknown file-format write version")
    if buf[18] == 2 or buf[19] == 2:
        raise ValueError("sqlite: WAL-mode files are unsupported")
    root = None
    for _rowid, vals in _walk_table_btree(buf, page_size, 1):
        # sqlite_schema: (type, name, tbl_name, rootpage, sql)
        if vals[0] == "table" and vals[1] == table:
            root = vals[3]
            break
    if root is None:
        raise ValueError(f"sqlite: table {table!r} not found in schema")
    yield from _walk_table_btree(buf, page_size, root)


# --- fixture databases --------------------------------------------------------


def _sq_name(i: int) -> str:
    return f"row-{i}"


def _sq_tag(i: int) -> bytes:
    return bytes((i * 7 + k) % 256 for k in range(5 + i % 4))


def _sqlite_fixture_dir() -> str:
    import sqlite3

    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_sq_name, _sq_tag, SQLITE_FILES, SQLITE_ROWS)
    d = os.path.join(SCRATCH, f"sqlite_dbs_{rev}")
    os.makedirs(d, exist_ok=True)
    for fidx in range(SQLITE_FILES):
        p = os.path.join(d, f"events_{fidx:04d}.db")
        if not os.path.exists(p):
            tmp = p + ".tmp"
            if os.path.exists(tmp):
                os.remove(tmp)
            con = sqlite3.connect(tmp)
            con.execute("PRAGMA page_size = 512")
            con.execute("PRAGMA journal_mode = DELETE")
            con.execute(
                "CREATE TABLE events_log ("
                "id INTEGER PRIMARY KEY, name TEXT, score REAL, "
                "tag BLOB, flag INTEGER)"
            )
            rows = []
            for j in range(SQLITE_ROWS):
                i = fidx * SQLITE_ROWS + j
                rows.append(
                    (i + 1, _sq_name(i), i + 0.25, _sq_tag(i), i % 2)
                )
            con.executemany("INSERT INTO events_log VALUES (?,?,?,?,?)", rows)
            con.commit()
            con.close()
            os.replace(tmp, p)
    return d


@register(
    "scan_sqlite_table",
    tags=("source", "sqlite", "real-bytes"),
    oracle=f"""
WITH rows_f AS (
  SELECT f.f AS file_id, j.j AS j, f.f * {SQLITE_ROWS} + j.j AS i
  FROM range({SQLITE_FILES}) f(f), LATERAL unnest(range({SQLITE_ROWS})) AS j(j)
),
tags AS (
  SELECT i, CAST(SUM((i * 7 + k.k) % 256) AS BIGINT) AS tsum,
         CAST(COUNT(*) AS BIGINT) AS tlen
  FROM rows_f, LATERAL unnest(range(0, 5 + i % 4)) AS k(k)
  GROUP BY i
)
SELECT CAST(i + 1 AS BIGINT) AS rowid,
       CAST(file_id AS INTEGER) AS file_id,
       'row-' || CAST(i AS VARCHAR) AS name,
       CAST(i AS DOUBLE) + CAST(0.25 AS DOUBLE) AS score,
       tags.tlen AS tag_len,
       tags.tsum AS tag_sum,
       CAST(i % 2 AS BIGINT) AS flag
FROM rows_f JOIN tags USING (i)
""",
)
def scan_sqlite_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL SQLite file parsing end-to-end: fixture databases written
    by the stdlib sqlite3 module (512-byte pages, so the 500-row table
    spans a multi-level b-tree with interior pages) are re-read from
    raw bytes — header, page-1 schema walk, interior traversal in key
    order, varint cell framing, serial-type record decode (ints of
    every width, float64, text, blob, the 0/1 constants, and the
    INTEGER-PRIMARY-KEY-as-NULL rowid aliasing rule). Every field
    checks against the closed-form oracle. Scale: one parse task per
    .db shard; payload blobs reduce to O(1) probes before shuffling."""
    d = _sqlite_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.db"))
        .select("path", "content")
    )

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                file_id = int(path.rsplit("events_", 1)[1][:4])
                for rowid, vals in parse_sqlite_table(bytes(content), "events_log"):
                    _id, name, score, tag, flag = vals
                    # INTEGER PRIMARY KEY columns store NULL in the
                    # record; the value IS the rowid (spec §2.1)
                    assert _id is None
                    rows.append(
                        (
                            path, rowid, name, score,
                            len(tag), sum(tag), flag, file_id,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "rowid", "name", "score",
                    "tag_len", "tag_sum", "flag", "file_id",
                ],
            )

    parsed = src.mapInPandas(parse, SQLITE_SCHEMA_COLS + ", file_id int")
    return parsed.select(
        "rowid", "file_id", "name", "score", "tag_len", "tag_sum", "flag"
    )


# --- streaming/batch DataSource: .db files landing in a directory -----------

from pyspark.sql.datasource import DataSource  # noqa: E402

from .pcap_file import PcapDirBatchReader, PcapDirStreamReader  # noqa: E402

SQLITE_STREAM_SCHEMA = (
    "path string, rowid bigint, name string, score double, "
    "tag binary, flag bigint"
)
SQLITE_STREAM_TABLE = "events_log"


def _read_sqlite_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    for rowid, vals in parse_sqlite_table(buf, SQLITE_STREAM_TABLE):
        _id, name, score, tag, flag = vals
        yield (path, rowid, name, score, tag, flag)


class SqliteDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.db"
    _parse_file = staticmethod(_read_sqlite_file)


class SqliteDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.db"
    _parse_file = staticmethod(_read_sqlite_file)


class SqliteDirDataSource(DataSource):
    """format('sqlite_dir') — the pcap_dir contract (name-anchored
    offsets, one database per partition, max_files_per_trigger) for
    SQLite telemetry drops landing in a directory. Reads the fixed
    ``events_log`` table of each arriving file."""

    @classmethod
    def name(cls) -> str:
        return "sqlite_dir"

    def schema(self) -> str:
        return SQLITE_STREAM_SCHEMA

    def reader(self, schema):
        return SqliteDirBatchReader(self.options)

    def streamReader(self, schema):
        return SqliteDirStreamReader(self.options)


def register_sqlite_source(spark: SparkSession) -> None:
    spark.dataSource.register(SqliteDirDataSource)
