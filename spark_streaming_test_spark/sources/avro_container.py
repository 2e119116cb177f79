"""Batch reader for REAL Avro Object Container files.

The pyspark distribution here ships WITHOUT the spark-avro connector
module (``format("avro")`` cannot load — probed and recorded in
COVERAGE.md every round). The Avro 1.x container format itself is a
small public spec, so the env constraint only blocks the CONNECTOR,
not the capability: this module parses the actual bytes — the
``Obj\\x01`` magic, the metadata map (avro.schema JSON + avro.codec),
the 16-byte sync marker, per-block record counts and byte sizes,
zigzag-varint longs, length-prefixed UTF-8 strings, little-endian
IEEE doubles, and the ``null``, ``deflate`` (raw zlib), ``snappy``
(round-9 hand codec + the spec's big-endian CRC32 suffix) and
``zstandard`` (RFC 8878 frame, no checksum suffix per the spec)
codecs.

Scope: record schemas whose fields are long / string / double (the
shapes event logs actually use), resolved IN ORDER from the embedded
schema JSON — unsupported types raise rather than guess. Sync markers
are verified after every block; a torn trailing block is dropped (the
pcap convention).

Scale posture: one parse task per container file via ``binaryFile``;
the sync-marker design is what makes BIG Avro files splittable in a
real connector (scan to the next marker) — here files are the split
unit, which is how containerized event logs ship anyway."""

from __future__ import annotations

import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

AVRO_SCHEMA_COLS = (
    "path string, rec_index bigint, id bigint, name string, score double, "
    "codec string"
)

AVRO_FILES = 4
AVRO_RECS = 120
AVRO_BLOCK = 20  # records per container block

_MAGIC = b"Obj\x01"

_FIXTURE_SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
    ],
}


def _zz_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zz_long(buf: bytes, off: int) -> tuple[int, int]:
    z = shift = 0
    while True:
        if off >= len(buf):
            raise ValueError("avro: varint runs past end of buffer")
        b = buf[off]
        off += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return (z >> 1) ^ -(z & 1), off
        shift += 7
        if shift > 63:
            raise ValueError("avro: long varint wider than 64 bits")


def _enc_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz_long(len(b)) + b


def _enc_bytes(b: bytes) -> bytes:
    return _zz_long(len(b)) + b


def write_avro_container(path: str, records, codec: str, sync: bytes) -> None:
    """Write an Avro object container of (id, name, score) records with
    the fixture schema, ``codec`` in {'null', 'deflate'}, blocks of
    AVRO_BLOCK records, and the given 16-byte sync marker."""
    if len(sync) != 16:
        raise ValueError("avro sync marker must be 16 bytes")
    out = bytearray()
    out += _MAGIC
    meta = {
        "avro.schema": json.dumps(_FIXTURE_SCHEMA).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zz_long(len(meta))
    for k, v in meta.items():
        out += _enc_string(k) + _enc_bytes(v)
    out += _zz_long(0)  # end of map
    out += sync
    for i in range(0, len(records), AVRO_BLOCK):
        chunk = records[i : i + AVRO_BLOCK]
        body = bytearray()
        for rid, name, score in chunk:
            body += _zz_long(rid)
            body += _enc_string(name)
            body += struct.pack("<d", score)
        data = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        elif codec == "snappy":
            # Avro spec: raw snappy block + 4-byte BIG-ENDIAN CRC32 of
            # the UNCOMPRESSED data (round-9 hand codec, kafka_wire)
            from .kafka_wire import snappy_compress

            data = (
                snappy_compress(data)
                + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
            )
        elif codec == "zstandard":
            # Avro spec: one zstd frame per block, no extra checksum
            from .zstd_codec import zstd_compress_lz

            data = zstd_compress_lz(data)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        out += _zz_long(len(chunk)) + _zz_long(len(data)) + data + sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def parse_avro_container(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield (path, rec_index, id, name, score, codec) per record:
    magic + metadata map + sync, then (count, size, data, sync) blocks,
    fields decoded in the order the EMBEDDED schema declares them.
    Raises on bad magic, unsupported codec/field types, or a sync
    marker mismatch (block corruption); drops a torn trailing block."""
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    off = 4
    meta: dict[str, bytes] = {}
    while True:
        n, off = _read_zz_long(buf, off)
        if n == 0:
            break
        if n < 0:  # negative count: size-prefixed chunk form
            _, off = _read_zz_long(buf, off)
            n = -n
        for _ in range(n):
            klen, off = _read_zz_long(buf, off)
            key = buf[off : off + klen].decode("utf-8")
            off += klen
            vlen, off = _read_zz_long(buf, off)
            meta[key] = buf[off : off + vlen]
            off += vlen
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(
            f"avro codec {codec!r} unsupported "
            "(null/deflate/snappy/zstandard)"
        )
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, ftype in fields:
        if ftype not in ("long", "string", "double"):
            raise ValueError(f"avro field type {ftype!r} unsupported")
    sync = buf[off : off + 16]
    off += 16
    idx = 0
    n_buf = len(buf)
    while off < n_buf:
        try:
            count, o2 = _read_zz_long(buf, off)
            size, o3 = _read_zz_long(buf, o2)
        except ValueError:
            break  # torn block header
        if o3 + size + 16 > n_buf:
            break  # torn block payload or missing sync
        data = buf[o3 : o3 + size]
        if buf[o3 + size : o3 + size + 16] != sync:
            raise ValueError(f"avro block at {off} has a bad sync marker")
        off = o3 + size + 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec == "snappy":
            from .kafka_wire import snappy_decompress

            (want_crc,) = struct.unpack_from(">I", data, len(data) - 4)
            data = snappy_decompress(data[:-4])
            if zlib.crc32(data) & 0xFFFFFFFF != want_crc:
                raise ValueError(f"avro snappy block at {off}: bad CRC32")
        elif codec == "zstandard":
            from .zstd_codec import zstd_decompress

            data = zstd_decompress(data)
        p = 0
        for _ in range(count):
            vals: dict[str, object] = {}
            for fname, ftype in fields:
                if ftype == "long":
                    vals[fname], p = _read_zz_long(data, p)
                elif ftype == "string":
                    ln, p = _read_zz_long(data, p)
                    vals[fname] = data[p : p + ln].decode("utf-8")
                    p += ln
                else:  # double
                    (vals[fname],) = struct.unpack_from("<d", data, p)
                    p += 8
            yield (path, idx, vals["id"], vals["name"], vals["score"], codec)
            idx += 1


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (file, dir, or glob of ``.avro``) into one row per
    record. One parse task per container via ``binaryFile``."""

    _COLS = ["path", "rec_index", "id", "name", "score", "codec"]

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_avro_container(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=_COLS)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, AVRO_SCHEMA_COLS)
    )


# --- fixture containers --------------------------------------------------------


def _avro_record(i: int) -> tuple:
    # .25 offsets are dyadic — exact in IEEE double on both engines
    return (i, f"ev-{i}", (i % 97) + 0.25)


def _avro_fixture_dir() -> str:
    import hashlib

    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        _avro_record, write_avro_container, AVRO_FILES, AVRO_RECS, AVRO_BLOCK,
        4,  # codec rotation null/deflate/snappy/zstandard
    )
    d = os.path.join(SCRATCH, f"avro_containers_{rev}")
    os.makedirs(d, exist_ok=True)
    for fidx in range(AVRO_FILES):
        p = os.path.join(d, f"events_{fidx:04d}.avro")
        if not os.path.exists(p):
            recs = [_avro_record(fidx * AVRO_RECS + j) for j in range(AVRO_RECS)]
            sync = hashlib.md5(f"avro-sync-{fidx}".encode()).digest()
            tmp = p + ".tmp"
            write_avro_container(
                tmp,
                recs,
                ["null", "deflate", "snappy", "zstandard"][fidx % 4],
                sync,
            )
            os.replace(tmp, p)
    return d


@register(
    "scan_avro_records",
    tags=("source", "avro", "real-bytes"),
    oracle=f"""
WITH recs AS (
  SELECT f.f AS file_id, j.j AS j, f.f * {AVRO_RECS} + j.j AS i
  FROM range({AVRO_FILES}) f(f), LATERAL unnest(range({AVRO_RECS})) AS j(j)
)
SELECT CAST(file_id AS INTEGER) AS file_id,
       CAST(j AS BIGINT) AS rec_index,
       CAST(i AS BIGINT) AS id,
       'ev-' || CAST(i AS VARCHAR) AS name,
       CAST(i % 97 AS DOUBLE) + CAST(0.25 AS DOUBLE) AS score,
       CASE file_id % 4 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate'
            WHEN 2 THEN 'snappy' ELSE 'zstandard' END AS codec
FROM recs
""",
)
def scan_avro_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Avro container parsing end-to-end, closing the recorded
    spark-avro env gap at the FORMAT level: fixture containers (codec
    rotating null / raw-deflate / snappy+CRC32 / zstandard) are
    re-parsed from bytes — magic,
    metadata map, embedded schema JSON, zigzag longs, length-prefixed
    strings, IEEE doubles, per-block sync-marker verification — and
    every field is checked against a closed-form DuckDB oracle. Scale:
    one parse task per container; decoded columns only."""
    d = _avro_fixture_dir()
    recs = read_avro(spark, os.path.join(d, "*.avro"))
    file_id = (
        F.regexp_extract(F.col("path"), r"events_(\d{4})\.avro", 1).cast("int")
    )
    return recs.select(
        file_id.alias("file_id"), "rec_index", "id", "name", "score", "codec"
    )


# --- streaming/batch DataSource: containers landing in a directory ----------

from pyspark.sql.datasource import DataSource  # noqa: E402

from .pcap_file import PcapDirBatchReader, PcapDirStreamReader  # noqa: E402


def _read_avro_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_avro_container(path, buf)


class AvroDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.avro"
    _parse_file = staticmethod(_read_avro_file)


class AvroDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.avro"
    _parse_file = staticmethod(_read_avro_file)


class AvroDirDataSource(DataSource):
    """format('avro_dir') — register with
    ``spark.dataSource.register(AvroDirDataSource)``. Inherits the
    pcap_dir contract (name-anchored offsets, one file per partition,
    ``max_files_per_trigger`` back-pressure) for Avro containers
    landing in a directory — the streaming shape the absent
    spark-avro connector would otherwise own."""

    @classmethod
    def name(cls) -> str:
        return "avro_dir"

    def schema(self) -> str:
        return AVRO_SCHEMA_COLS

    def reader(self, schema):
        return AvroDirBatchReader(self.options)

    def streamReader(self, schema):
        return AvroDirStreamReader(self.options)


def register_avro_source(spark: SparkSession) -> None:
    spark.dataSource.register(AvroDirDataSource)
