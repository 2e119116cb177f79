"""Batch reader for REAL ``.warc`` web-archive files.

WARC (ISO 28500, the public CommonCrawl format) is THE ingestion format
of large-scale LLM training pipelines — a 100 TB text corpus usually
starts life as WARC segments. This module parses the format's actual
bytes from Spark ``binaryFile`` scans, the same real-bytes discipline as
``sources/pcap_file.py``: no format library, just the public spec.

Format (WARC/1.0, uncompressed records):

    WARC/1.0<CRLF>
    <Header-Name>: <value><CRLF>    (Content-Length is mandatory)
    ...
    <CRLF>
    <Content-Length bytes of payload>
    <CRLF><CRLF>                    (record terminator)

Real crawls store one gzip member per record; the sandbox parses the
uncompressed form (the gzip variant is the same parser behind a
``gzip.decompress`` per member — member splitting, not parsing, is the
only extra step).

Scale posture: ``binaryFile`` gives one parse task per WARC segment —
exactly the unit CommonCrawl ships (~1 GB segments), so a 100 TB crawl
parallelizes across ~100k segment files with no coordination. Records
stream out in bounded Arrow batches; payloads stay in the executor
unless a query projects them.
"""

from __future__ import annotations

import os
import struct  # noqa: F401  (parity with pcap module; header math is str-based)
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

WARC_SCHEMA = (
    "path string, rec_index bigint, warc_type string, record_id string, "
    "target_uri string, content_length bigint, payload binary"
)

_CRLF = b"\r\n"
_BATCH_ROWS = 2048


def parse_warc_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield (path, rec_index, warc_type, record_id, target_uri,
    content_length, payload) per complete record; a torn trailing
    record is dropped (the pcap torn-tail convention)."""
    off, idx, n = 0, 0, len(buf)
    while off < n:
        # version line
        eol = buf.find(_CRLF, off)
        if eol < 0 or not buf[off:eol].startswith(b"WARC/"):
            break
        off = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(_CRLF, off)
            if eol < 0:
                return  # torn inside headers
            line = buf[off:eol]
            off = eol + 2
            if not line:
                break  # blank line: payload follows
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return  # unparseable record: stop (no resync heuristic)
        if off + clen > n:
            break  # torn payload
        payload = buf[off : off + clen]
        off += clen
        if buf[off : off + 4] == _CRLF + _CRLF:
            off += 4
        yield (
            path,
            idx,
            headers.get("warc-type", ""),
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", ""),
            clen,
            payload,
        )
        idx += 1


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (file, dir, or glob of ``.warc``) into one row per
    WARC record. One parse task per segment file via ``binaryFile``."""

    _COLS = [
        "path", "rec_index", "warc_type", "record_id",
        "target_uri", "content_length", "payload",
    ]

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(path_, bytes(content)):
                    rows.append(rec)
                    if len(rows) >= _BATCH_ROWS:
                        yield pd.DataFrame(rows, columns=_COLS)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, WARC_SCHEMA)
    )


def write_warc(path: str, records) -> None:
    """Write an uncompressed WARC/1.0 file from (warc_type, record_id,
    target_uri, payload bytes) tuples — the fixture generator (and a
    spec-conformant mini-writer)."""
    with open(path, "wb") as f:
        for warc_type, rec_id, uri, payload in records:
            f.write(b"WARC/1.0\r\n")
            f.write(f"WARC-Type: {warc_type}\r\n".encode())
            f.write(f"WARC-Record-ID: {rec_id}\r\n".encode())
            if uri:
                f.write(f"WARC-Target-URI: {uri}\r\n".encode())
            f.write(f"Content-Length: {len(payload)}\r\n".encode())
            f.write(b"\r\n")
            f.write(payload)
            f.write(b"\r\n\r\n")


# --- oracle-checked fixture queries -----------------------------------------

SCRATCH = "/root/repo/.scratch"
WARC_FILES = 4
WARC_RECS = 50


def _warc_records(f: int):
    """Deterministic segment f: record j's type, uri, and payload are
    closed-form functions of (f, j), so DuckDB can recompute the parse
    output from range() without reading the binary."""
    for j in range(WARC_RECS):
        warc_type = "request" if j % 5 == 0 else "response"
        uri = f"http://site{(3 * j + f) % 7}.test/page/{j}"
        # every 9th page mirrors the previous one verbatim (jj = j-1), so
        # the corpus carries exact-duplicate pressure for the dedup and
        # curation queries to detect
        jj = j - 1 if j % 9 == 8 else j
        words = " ".join(f"w{(jj * k + f) % 13}" for k in range(5 + jj % 11))
        yield (
            warc_type,
            f"<urn:uuid:{f:04d}-{j:04d}>",
            uri,
            words.encode("ascii"),
        )


def _warc_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    rev = fixture_rev(_warc_records, write_warc, WARC_FILES, WARC_RECS)
    d = os.path.join(SCRATCH, f"warc_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(WARC_FILES):
            tmp = os.path.join(d, f"seg_{f:04d}.warc.tmp")
            write_warc(tmp, _warc_records(f))
            os.replace(tmp, os.path.join(d, f"seg_{f:04d}.warc"))
        open(os.path.join(d, "_DONE"), "w").close()
    return d


# Shared closed-form record CTE for the oracles.
_SQL_WARC = f"""
recs AS (
  SELECT f.f, j.j,
         CASE WHEN j.j % 5 = 0 THEN 'request' ELSE 'response' END AS warc_type,
         'http://site' || CAST((3 * j.j + f.f) % 7 AS VARCHAR)
           || '.test/page/' || CAST(j.j AS VARCHAR) AS target_uri,
         array_to_string(list_transform(
             range(0, 5 + (CASE WHEN j.j % 9 = 8 THEN j.j - 1 ELSE j.j END) % 11),
             k -> 'w' || CAST(((CASE WHEN j.j % 9 = 8 THEN j.j - 1 ELSE j.j END)
                                 * k + f.f) % 13 AS VARCHAR)),
             ' ') AS body
  FROM range({WARC_FILES}) f(f), range({WARC_RECS}) j(j)
)
"""


@register(
    "scan_warc_records",
    tags=("source", "warc", "binary"),
    oracle=f"""
WITH {_SQL_WARC}
SELECT CAST(f AS BIGINT) AS file_id, CAST(j AS BIGINT) AS rec_index,
       warc_type, target_uri,
       CAST(length(body) AS BIGINT) AS content_length,
       md5(body) AS payload_md5
FROM recs
""",
)
def scan_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse REAL WARC bytes (ISO 28500 / the CommonCrawl container:
    version line, CRLF headers, Content-Length payload, double-CRLF
    terminator) from binaryFile scans and emit per-record metadata +
    payload md5. The DuckDB oracle recomputes every value from the
    fixture's closed-form record formulas, so the byte-level parse is
    verified against independent arithmetic — the scan_pcap_file
    discipline applied to the web-archive format.

    Scale: one parse task per segment (the unit CommonCrawl ships);
    only metadata and a 16-byte digest leave the executor here."""
    d = _warc_fixture_dir()
    df = read_warc(spark, os.path.join(d, "*.warc"))
    return df.select(
        F.regexp_extract("path", r"seg_(\d+)\.warc", 1)
        .cast("bigint")
        .alias("file_id"),
        "rec_index",
        "warc_type",
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "warc_text_pipeline",
    tags=("source", "warc", "llm", "pipeline"),
    oracle=f"""
WITH {_SQL_WARC},
resp AS (
  SELECT regexp_extract(target_uri, 'http://([^/]+)/', 1) AS host,
         body
  FROM recs WHERE warc_type = 'response'
),
tok AS (
  SELECT host, len(string_split(body, ' ')) AS n_tokens,
         len(list_distinct(string_split(body, ' '))) AS n_distinct
  FROM resp
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_distinct) AS BIGINT) AS total_distinct_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_page_tokens
FROM tok GROUP BY host
""",
)
def warc_text_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC->corpus ingestion composition: parse real segment
    bytes, keep response records, extract host + text, and roll up
    per-host token statistics (the per-domain report a crawl-curation
    pipeline builds before sampling domains). Everything after the
    parse is JVM-side (regexp_extract / split / size inside codegen);
    the per-host aggregate map-side combines, so the shuffle carries
    O(hosts) rows."""
    d = _warc_fixture_dir()
    df = read_warc(spark, os.path.join(d, "*.warc"))
    toks = F.split(F.col("payload").cast("string"), " ")
    resp = df.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"http://([^/]+)/", 1).alias("host"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    return resp.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_distinct").cast("bigint").alias("total_distinct_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_page_tokens"),
    )


# --- warc_dir DataSource (batch + stream over rotated crawl segments) -------
#
# Crawlers land complete segment files into a directory (the CommonCrawl
# layout); tailing that directory is the streaming ingestion path. The
# name-anchored offset machinery is format-agnostic and lives in
# sources/pcap_file.py — only the glob and the per-file parser differ.

from pyspark.sql.datasource import DataSource  # noqa: E402

from .pcap_file import (  # noqa: E402
    PcapDirBatchReader,
    PcapDirStreamReader,
)


def _read_warc_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_warc_bytes(path, buf)


class WarcDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.warc"
    _parse_file = staticmethod(_read_warc_file)


class WarcDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.warc"
    _parse_file = staticmethod(_read_warc_file)


class WarcDirDataSource(DataSource):
    """format('warc_dir') — register with
    ``spark.dataSource.register(WarcDirDataSource)``.

    Options:
        path                   segment directory (required)
        max_files_per_trigger  back-pressure cap on new files offered
                               per micro-batch offset (<=0 = unbounded;
                               stream reader only)

    Inherits the pcap_dir contract: offsets are the NAME of the last
    consumed file (retention-safe), one file per partition, replay of
    an offset range re-reads exactly the same files (reliable source —
    exactly-once with a checkpointed sink)."""

    @classmethod
    def name(cls) -> str:
        return "warc_dir"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcDirBatchReader(self.options)

    def streamReader(self, schema):
        return WarcDirStreamReader(self.options)


def _read_warc_zst_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_warc_zst_bytes(path, buf)


class WarcZstDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.warc.zst"
    _parse_file = staticmethod(_read_warc_zst_file)


class WarcZstDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.warc.zst"
    _parse_file = staticmethod(_read_warc_zst_file)


class WarcZstDirDataSource(DataSource):
    """format('warc_zst_dir') — the compressed-segment twin of
    ``warc_dir``: zstd frame-per-record crawl segments landing in a
    directory, streamed with the same named-offset replay contract.
    Decompression happens executor-side inside the partition read (the
    pure-stdlib RFC 8878 decoder), so the driver plans by file NAME
    and never touches segment bytes."""

    @classmethod
    def name(cls) -> str:
        return "warc_zst_dir"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcZstDirBatchReader(self.options)

    def streamReader(self, schema):
        return WarcZstDirStreamReader(self.options)


def register_warc_source(spark: SparkSession) -> None:
    spark.dataSource.register(WarcDirDataSource)
    spark.dataSource.register(WarcZstDirDataSource)


# --- .warc.gz: one gzip member per record (the actual CommonCrawl layout) ---
#
# Record-level gzip members are what make a multi-GB segment seekable:
# an index of member offsets lets a reader fetch ONE record without
# decompressing the file. Members concatenate legally (RFC 1952 allows
# multi-member streams), so `gunzip` on the whole file also works.


def write_warc_gz(path: str, records) -> None:
    """Write a .warc.gz segment: each record is its own gzip member
    (wrapping the exact bytes write_warc would emit for it)."""
    import gzip
    import io

    with open(path, "wb") as f:
        for warc_type, rec_id, uri, payload in records:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(b"WARC/1.0\r\n")
                gz.write(f"WARC-Type: {warc_type}\r\n".encode())
                gz.write(f"WARC-Record-ID: {rec_id}\r\n".encode())
                if uri:
                    gz.write(f"WARC-Target-URI: {uri}\r\n".encode())
                gz.write(f"Content-Length: {len(payload)}\r\n".encode())
                gz.write(b"\r\n")
                gz.write(payload)
                gz.write(b"\r\n\r\n")
            f.write(buf.getvalue())


def parse_warc_gz_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Split the RFC 1952 multi-member stream (zlib's unused_data gives
    the member boundary without any heuristic header scan), then parse
    each member's decompressed bytes with the plain-WARC parser.
    rec_index restarts at the FILE level (continuous across members); a
    torn final member is dropped."""
    import zlib

    idx = 0
    rest = buf
    while rest:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            raw = d.decompress(rest)
            raw += d.flush()
        except zlib.error:
            break  # torn final member
        if not d.eof:
            break  # member truncated mid-stream
        for rec in parse_warc_bytes(path, raw):
            yield (path, idx, *rec[2:])
            idx += 1
        rest = d.unused_data


WARC_GZ_RECS = 60


def _warc_gz_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    rev = fixture_rev(_warc_records, write_warc_gz, WARC_FILES, WARC_GZ_RECS)
    d = os.path.join(SCRATCH, f"warcgz_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(WARC_FILES):
            recs = list(_warc_records(f))[:WARC_GZ_RECS]
            tmp = os.path.join(d, f"seg_{f:04d}.warc.gz.tmp")
            write_warc_gz(tmp, recs)
            os.replace(tmp, os.path.join(d, f"seg_{f:04d}.warc.gz"))
        open(os.path.join(d, "_DONE"), "w").close()
    return d


@register(
    "scan_warc_gz_records",
    tags=("source", "warc", "binary", "gzip"),
    oracle=f"""
WITH {_SQL_WARC}
SELECT CAST(f AS BIGINT) AS file_id, CAST(j AS BIGINT) AS rec_index,
       warc_type, target_uri,
       CAST(length(body) AS BIGINT) AS content_length,
       md5(body) AS payload_md5
FROM recs WHERE j < {WARC_GZ_RECS}
""",
)
def scan_warc_gz_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the REAL CommonCrawl container: ``.warc.gz`` with one gzip
    member per record (RFC 1952 multi-member). Member boundaries come
    from zlib's ``unused_data`` — no header-scan heuristic — and each
    member's bytes go through the same plain-WARC parser, so the two
    container forms are pinned to one record grammar. The oracle is the
    identical closed form as scan_warc_records: compression must be
    perfectly invisible to the parse.

    Scale: per-record members are what make crawl segments seekable
    (offset index -> fetch one record without touching the rest); the
    batch scan stays one task per segment file."""
    import pandas as pd  # noqa: F401

    d = _warc_gz_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = [
            "path", "rec_index", "warc_type", "record_id",
            "target_uri", "content_length", "payload",
        ]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_gz_bytes(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.warc.gz"))
        .select("path", "content")
        .mapInPandas(_parse, WARC_SCHEMA)
    )
    return df.select(
        F.regexp_extract("path", r"seg_(\d+)\.warc\.gz", 1)
        .cast("bigint")
        .alias("file_id"),
        "rec_index",
        "warc_type",
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


# --- .warc.zst: one zstd frame per record (the modern crawl layout) ---------
#
# Common Crawl's zstd-compressed segments use frame-per-chunk layouts
# for the same reason the gzip form uses members: an offset index can
# fetch one record without touching the rest. RFC 8878 frames
# concatenate legally, so a whole-file decompress also works. The
# frames here come from the pure-stdlib encoder in zstd_codec.py and
# are read back by its full decoder.


def write_warc_zst(path: str, records) -> None:
    """Write a .warc.zst segment: each record is its own zstd frame
    (checksummed — xxHash64 rides every frame) wrapping the exact
    bytes write_warc would emit for it."""
    import io

    from .zstd_codec import zstd_compress_lz

    with open(path, "wb") as f:
        for warc_type, rec_id, uri, payload in records:
            buf = io.BytesIO()
            buf.write(b"WARC/1.0\r\n")
            buf.write(f"WARC-Type: {warc_type}\r\n".encode())
            buf.write(f"WARC-Record-ID: {rec_id}\r\n".encode())
            if uri:
                buf.write(f"WARC-Target-URI: {uri}\r\n".encode())
            buf.write(f"Content-Length: {len(payload)}\r\n".encode())
            buf.write(b"\r\n")
            buf.write(payload)
            buf.write(b"\r\n\r\n")
            f.write(zstd_compress_lz(buf.getvalue(), checksum=True))


def parse_warc_zst_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Walk the concatenated zstd frames (the frame grammar itself
    gives the boundary — no heuristic scan), parse each frame's bytes
    with the plain-WARC parser. rec_index is continuous across frames;
    a torn final frame is dropped (the .warc.gz convention)."""
    from .zstd_codec import iter_zstd_frames

    idx = 0
    try:
        for raw, _end in iter_zstd_frames(buf):
            for rec in parse_warc_bytes(path, raw):
                yield (path, idx, *rec[2:])
                idx += 1
    except (ValueError, IndexError, struct.error):
        return  # torn final frame


WARC_ZST_RECS = 60


def _warc_zst_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev

    rev = fixture_rev(_warc_records, write_warc_zst, WARC_FILES, WARC_ZST_RECS)
    d = os.path.join(SCRATCH, f"warczst_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(WARC_FILES):
            recs = list(_warc_records(f))[:WARC_ZST_RECS]
            tmp = os.path.join(d, f"seg_{f:04d}.warc.zst.tmp")
            write_warc_zst(tmp, recs)
            os.replace(tmp, os.path.join(d, f"seg_{f:04d}.warc.zst"))
        open(os.path.join(d, "_DONE"), "w").close()
    return d


@register(
    "scan_warc_zst_records",
    tags=("source", "warc", "binary", "zstd"),
    oracle=f"""
WITH {_SQL_WARC}
SELECT CAST(f AS BIGINT) AS file_id, CAST(j AS BIGINT) AS rec_index,
       warc_type, target_uri,
       CAST(length(body) AS BIGINT) AS content_length,
       md5(body) AS payload_md5
FROM recs WHERE j < {WARC_ZST_RECS}
""",
)
def scan_warc_zst_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zstd twin of ``scan_warc_gz_records``: ``.warc.zst`` with
    one RFC 8878 frame per record, the layout modern crawls ship for
    seekability. Frame boundaries come from the zstd frame grammar
    itself (walked by the pure-stdlib decoder, xxHash64 verified per
    frame) and each frame's bytes go through the same plain-WARC
    parser — three container forms (plain / .gz / .zst) now pin one
    record grammar, under the identical closed-form oracle.

    Scale: same as the gz form — one task per segment file; at crawl
    scale an offset index turns per-record frames into point reads."""
    import pandas as pd  # noqa: F401

    d = _warc_zst_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = [
            "path", "rec_index", "warc_type", "record_id",
            "target_uri", "content_length", "payload",
        ]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_zst_bytes(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.warc.zst"))
        .select("path", "content")
        .mapInPandas(_parse, WARC_SCHEMA)
    )
    return df.select(
        F.regexp_extract("path", r"seg_(\d+)\.warc\.zst", 1)
        .cast("bigint")
        .alias("file_id"),
        "rec_index",
        "warc_type",
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "corpus_warc_ingest_report",
    tags=("source", "warc", "llm", "curation", "flagship"),
    oracle=f"""
WITH {_SQL_WARC},
resp AS (
  SELECT regexp_extract(target_uri, 'http://([^/]+)/', 1) AS host,
         body, md5(body) AS h
  FROM recs WHERE warc_type = 'response'
),
pages AS (
  SELECT host, h,
         len(string_split(body, ' ')) AS n_tokens,
         COUNT(*) OVER (PARTITION BY h) AS copies
  FROM resp
),
hosts AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(COUNT(*) FILTER (copies > 1) AS BIGINT) AS dup_pages,
         CAST(COUNT(DISTINCT h) AS BIGINT) AS distinct_pages,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM pages GROUP BY host
)
SELECT host, n_pages, dup_pages, distinct_pages, total_tokens,
       CAST(dup_pages AS DOUBLE) / CAST(n_pages AS DOUBLE) AS dup_ratio,
       (CAST(dup_pages AS DOUBLE) / CAST(n_pages AS DOUBLE)
          < CAST(0.5 AS DOUBLE)
        AND CAST(total_tokens AS DOUBLE) / CAST(n_pages AS DOUBLE)
          >= CAST(9.9 AS DOUBLE)) AS keep
FROM hosts
""",
)
def corpus_warc_ingest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-curation report card, end to end from segment BYTES:
    parse real WARC, keep responses, fingerprint each page (md5 of
    payload), and roll up per host the page counts, exact-duplicate
    pressure, and token volume, ending in the keep/drop verdict a
    domain-sampling stage consumes (drop hosts that are mostly mirrors
    or too thin). This is the composition a training-data team runs
    FIRST on a new crawl — source parse, dedup signal, and curation
    decision in one declarative plan.

    Scale: the only shuffles are the page-hash window (32-byte keys)
    and the per-host aggregate (map-side combined, O(hosts) out);
    payload bodies never leave the parse stage — only hashes and
    counts."""
    d = _warc_fixture_dir()
    df = read_warc(spark, os.path.join(d, "*.warc"))
    toks = F.split(F.col("payload").cast("string"), " ")
    resp = df.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"http://([^/]+)/", 1).alias("host"),
        F.md5("payload").alias("h"),
        F.size(toks).alias("n_tokens"),
    )
    from pyspark.sql import Window

    pages = resp.select(
        "host",
        "h",
        "n_tokens",
        F.count(F.lit(1)).over(Window.partitionBy("h")).alias("copies"),
    )
    hosts = pages.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.count(F.when(F.col("copies") > 1, 1)).cast("bigint").alias("dup_pages"),
        F.count_distinct("h").cast("bigint").alias("distinct_pages"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    dup_ratio = F.col("dup_pages").cast("double") / F.col("n_pages").cast("double")
    return hosts.select(
        "host",
        "n_pages",
        "dup_pages",
        "distinct_pages",
        "total_tokens",
        dup_ratio.alias("dup_ratio"),
        (
            (dup_ratio < F.lit(0.5))
            & (
                F.col("total_tokens").cast("double")
                / F.col("n_pages").cast("double")
                >= F.lit(9.9)
            )
        ).alias("keep"),
    )
