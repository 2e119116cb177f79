"""Hand-parsed Parquet FOOTERS (Thrift compact protocol).

Parquet's footer is a Thrift-compact-serialized ``FileMetaData`` struct
followed by its 4-byte length and the ``PAR1`` magic. Catalog and
manifest services (Iceberg/Delta planners, pruning sidecars) read ONLY
this footer to plan scans — no data pages, no engine. This module does
that from the raw bytes: a generic Thrift compact-protocol reader
(field-delta headers, zigzag varints, length-prefixed binaries, list
headers, nested structs, unknown-field tolerance) applied to the REAL
parquet files the whole test bed runs on — and the oracle is DuckDB's
OWN independent footer reader (``parquet_file_metadata`` /
``parquet_metadata``), so a hand parser bug cannot hide: two unrelated
implementations must report identical numbers for the same files.

Scale posture: footers are O(columns x row groups) KBs at the END of
arbitrarily large files — a production reader fetches the last ~1 MB
by range request (here ``binaryFile`` loads the small fixture-scale
files whole); one parse task per file; only O(1) catalog columns ever
shuffle. The files parsed are pinned to the sf0.001 testdata (a
CONSTANT catalog sample, like the .scratch fixtures) so the oracle's
literal paths and the Spark scan always agree regardless of the
harness's sf_dir."""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

FOOTER_SF_DIR = "/root/testdata/sf0.001"  # constant catalog sample
FOOTER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FOOTER_SCHEMA = (
    "path string, format_version bigint, num_rows bigint, "
    "num_row_groups bigint, n_column_chunks bigint, created_by string"
)


def _uvarint(buf: bytes, off: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        if off >= len(buf):
            raise ValueError("thrift: varint past end of buffer")
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _zigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def thrift_read_struct(buf: bytes, off: int) -> tuple[dict, int]:
    """Generic Thrift COMPACT protocol struct reader: returns
    {field_id: value} with nested structs as dicts and lists as Python
    lists. Unknown fields are parsed by TYPE and kept (the caller
    ignores ids it doesn't need) — the same forward-compat posture as
    the protobuf reader."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        if off >= len(buf):
            raise ValueError("thrift: struct missing STOP")
        b = buf[off]
        off += 1
        if b == 0:
            return fields, off
        delta, typ = b >> 4, b & 0x0F
        if delta == 0:
            z, off = _uvarint(buf, off)
            fid = _zigzag(z)
        else:
            fid += delta
        val, off = _thrift_value(buf, off, typ)
        fields[fid] = val


def _thrift_value(buf: bytes, off: int, typ: int) -> tuple[object, int]:
    if typ == 1:
        return True, off
    if typ == 2:
        return False, off
    if typ == 3:  # i8: one raw byte
        return struct.unpack_from("<b", buf, off)[0], off + 1
    if typ in (4, 5, 6):  # i16/i32/i64: zigzag varint
        z, off = _uvarint(buf, off)
        return _zigzag(z), off
    if typ == 7:  # double: 8 bytes little-endian per the compact spec
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if typ == 8:  # binary/string
        ln, off = _uvarint(buf, off)
        return bytes(buf[off : off + ln]), off + ln
    if typ in (9, 10):  # list/set
        hdr = buf[off]
        off += 1
        size, etype = hdr >> 4, hdr & 0x0F
        if size == 15:
            size, off = _uvarint(buf, off)
        out = []
        for _ in range(size):
            if etype in (1, 2):  # bools are 1 byte each INSIDE lists
                out.append(buf[off] == 1)
                off += 1
            else:
                v, off = _thrift_value(buf, off, etype)
                out.append(v)
        return out, off
    if typ == 11:  # map
        size, off = _uvarint(buf, off)
        m = {}
        if size:
            hdr = buf[off]
            off += 1
            ktype, vtype = hdr >> 4, hdr & 0x0F
            for _ in range(size):
                k, off = _thrift_value(buf, off, ktype)
                v, off = _thrift_value(buf, off, vtype)
                m[k] = v
        return m, off
    if typ == 12:  # struct
        return thrift_read_struct(buf, off)
    raise ValueError(f"thrift: unsupported compact type {typ}")


def parse_parquet_footer(buf: bytes) -> dict:
    """FileMetaData summary from whole-file (or tail) parquet bytes:
    verifies both PAR1 magics, reads the footer length, thrift-decodes
    FileMetaData and projects the catalog fields (parquet.thrift ids:
    1 version, 3 num_rows, 4 row_groups [1: columns], 6 created_by)."""
    if buf[-4:] != b"PAR1":
        raise ValueError("not a parquet file (no trailing PAR1)")
    if buf[:4] != b"PAR1":
        raise ValueError("not a parquet file (no leading PAR1)")
    (mlen,) = struct.unpack("<I", buf[-8:-4])
    meta = buf[-8 - mlen : -8]
    fmd, _ = thrift_read_struct(meta, 0)
    row_groups = fmd.get(4, [])
    return {
        "format_version": fmd[1],
        "num_rows": fmd[3],
        "num_row_groups": len(row_groups),
        "n_column_chunks": sum(len(rg.get(1, [])) for rg in row_groups),
        "created_by": fmd.get(6, b"").decode("utf-8", "replace"),
    }


def _footer_oracle() -> str:
    parts = []
    for t in FOOTER_TABLES:
        p = f"{FOOTER_SF_DIR}/{t}.parquet"
        parts.append(
            f"SELECT '{t}' AS table_name,\n"
            f"       format_version, num_rows, num_row_groups,\n"
            f"       (SELECT COUNT(*) FROM parquet_metadata('{p}'))"
            f" AS n_column_chunks,\n"
            f"       created_by\n"
            f"FROM parquet_file_metadata('{p}')"
        )
    return "\nUNION ALL\n".join(parts)


@register(
    "scan_parquet_footer",
    tags=("source", "parquet", "thrift", "real-bytes"),
    oracle=_footer_oracle(),
)
def scan_parquet_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer catalog of the ten testdata tables by HAND-PARSING the
    Thrift compact protocol, verified against DuckDB's own footer
    reader on the same files — a cross-implementation check on
    production bytes rather than a fixture formula. Emits per table:
    format version, row count, row-group count, total column chunks,
    writer string."""
    src = (
        spark.read.format("binaryFile")
        .load([f"{FOOTER_SF_DIR}/{t}.parquet" for t in FOOTER_TABLES])
        .select("path", "content")
    )

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = parse_parquet_footer(bytes(content))
                rows.append(
                    (
                        path, m["format_version"], m["num_rows"],
                        m["num_row_groups"], m["n_column_chunks"],
                        m["created_by"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "format_version", "num_rows",
                    "num_row_groups", "n_column_chunks", "created_by",
                ],
            )

    parsed = src.mapInPandas(parse, FOOTER_SCHEMA)
    table_name = F.regexp_extract(F.col("path"), r"/(\w+)\.parquet$", 1)
    return parsed.select(
        table_name.alias("table_name"),
        "format_version", "num_rows", "num_row_groups",
        "n_column_chunks", "created_by",
    )
