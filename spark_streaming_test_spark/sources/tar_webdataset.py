"""Batch + streaming reader for REAL ``.tar`` shards (WebDataset layout).

Sharded tar files are the de-facto container for large-scale multimodal
training data (the WebDataset convention: a *sample* is the group of
adjacent members sharing a basename key — ``sample000123.txt`` holds
the caption, ``sample000123.bin``/``.jpg`` the payload). A 100 TB image
-text corpus ships as ~100k tar shards; the loader's unit of
parallelism IS the shard, and sample assembly never crosses a shard
boundary — which is exactly what makes the format scale: no global
index, no cross-file joins, resumable by shard name.

This module parses the ACTUAL tar bytes (POSIX ustar, public since
1988) with no tarfile import on the hot path — 512-byte headers, octal
fields, the space-padded checksum rule — the same real-bytes
discipline as ``sources/pcap_file.py`` (reference parity:
CaptureNetworkReceiver.java:23-128 ingests a framed byte format; tar
is the training-data analogue). Interop is proven in tests BOTH ways
against the stdlib ``tarfile`` module (our files parse with tarfile,
tarfile's files parse with us).

Scale posture: ``binaryFile`` gives one parse task per shard; member
payloads stay inside the Arrow batch unless projected; the
``tar_dir`` streaming source reuses the name-anchored offset machinery
of ``pcap_dir`` (retention-safe exactly-once), which is precisely the
"training shards landing in a directory" ingestion pattern.
"""

from __future__ import annotations

import glob  # noqa: F401  (parity with sibling source modules)
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource

from ..registry import register
from .pcap_file import PcapDirBatchReader, PcapDirStreamReader

TAR_SCHEMA = (
    "path string, member_index bigint, name string, typeflag string, "
    "size bigint, mtime bigint, payload binary"
)

TAR_SHARDS = 6
TAR_SAMPLES = 25  # samples per shard; 2 members (txt + bin) per sample
TAR_MTIME0 = 1700000000

_BLOCK = 512


def _octal(v: int, width: int) -> bytes:
    return (b"%0*o" % (width - 1, v)) + b"\0"


def write_tar(path: str, members) -> None:
    """Write a POSIX ustar archive from (name, mtime, payload bytes)
    tuples: 512-byte headers with octal fields, the checksum computed
    over the header with the chksum field blanked to spaces, payloads
    zero-padded to block size, two zero blocks as the terminator."""
    with open(path, "wb") as f:
        for name, mtime, payload in members:
            hdr = bytearray(_BLOCK)
            nb = name.encode("utf-8")
            if len(nb) > 100:
                raise ValueError(f"member name too long for ustar: {name!r}")
            hdr[0 : len(nb)] = nb
            hdr[100:108] = _octal(0o644, 8)
            hdr[108:116] = _octal(0, 8)
            hdr[116:124] = _octal(0, 8)
            hdr[124:136] = _octal(len(payload), 12)
            hdr[136:148] = _octal(mtime, 12)
            hdr[148:156] = b" " * 8  # blanked for the checksum pass
            hdr[156] = ord("0")  # regular file
            hdr[257:263] = b"ustar\0"
            hdr[263:265] = b"00"
            chk = sum(hdr)
            hdr[148:156] = (b"%06o" % chk) + b"\0 "
            f.write(bytes(hdr))
            f.write(payload)
            f.write(b"\0" * ((-len(payload)) % _BLOCK))
        f.write(b"\0" * (2 * _BLOCK))


def parse_tar_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield (path, member_index, name, typeflag, size, mtime, payload)
    per member. Verifies every header checksum (sum over the header
    with chksum blanked to spaces — the tar spec's rule), accepts both
    POSIX ("ustar\\0") and GNU ("ustar ") magic, stops cleanly at the
    zero-block terminator, and drops a torn trailing member (the pcap
    torn-tail convention)."""
    off, idx, n = 0, 0, len(buf)
    while off + _BLOCK <= n:
        hdr = buf[off : off + _BLOCK]
        if hdr == b"\0" * _BLOCK:
            break  # end-of-archive marker
        if hdr[257:262] != b"ustar":
            raise ValueError(f"tar member {idx} lacks the ustar magic")
        stored = int(bytes(hdr[148:156]).split(b"\0")[0].strip() or b"0", 8)
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if calc != stored:
            raise ValueError(
                f"tar member {idx} header checksum mismatch "
                f"(stored {stored}, computed {calc})"
            )
        name = bytes(hdr[0:100]).split(b"\0", 1)[0].decode("utf-8")
        size = int(bytes(hdr[124:136]).split(b"\0")[0].strip() or b"0", 8)
        mtime = int(bytes(hdr[136:148]).split(b"\0")[0].strip() or b"0", 8)
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        off += _BLOCK
        if off + size > n:
            break  # torn payload
        payload = buf[off : off + size]
        off += size + ((-size) % _BLOCK)
        yield (path, idx, name, typeflag, size, mtime, payload)
        idx += 1


def read_tar(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (file, dir, or glob of ``.tar``) into one row per
    member. One parse task per shard via ``binaryFile``."""

    _COLS = ["path", "member_index", "name", "typeflag", "size", "mtime", "payload"]

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_tar_bytes(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=_COLS)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_parse, TAR_SCHEMA)
    )


# --- streaming/batch DataSource: tar shards landing in a directory ----------


def _read_tar_file(path: str) -> Iterator[tuple]:
    with open(path, "rb") as f:
        buf = f.read()
    yield from parse_tar_bytes(path, buf)


class TarDirBatchReader(PcapDirBatchReader):
    _GLOB = "*.tar"
    _parse_file = staticmethod(_read_tar_file)


class TarDirStreamReader(PcapDirStreamReader):
    _GLOB = "*.tar"
    _parse_file = staticmethod(_read_tar_file)


class TarDirDataSource(DataSource):
    """format('tar_dir') — register with
    ``spark.dataSource.register(TarDirDataSource)``.

    Inherits the pcap_dir contract: offsets are the NAME of the last
    consumed shard (retention-safe), one shard per partition, replay of
    an offset range re-reads exactly the same shards; plus the
    ``max_files_per_trigger`` back-pressure option."""

    @classmethod
    def name(cls) -> str:
        return "tar_dir"

    def schema(self) -> str:
        return TAR_SCHEMA

    def reader(self, schema):
        return TarDirBatchReader(self.options)

    def streamReader(self, schema):
        return TarDirStreamReader(self.options)


def register_tar_source(spark: SparkSession) -> None:
    spark.dataSource.register(TarDirDataSource)


# --- WebDataset fixture shards ------------------------------------------------


def _wds_caption(i: int) -> str:
    return f"object {(7 * i) % 50} in scene {i % 9}"


def _wds_bin(i: int) -> bytes:
    return bytes((3 * i + k) % 256 for k in range(40 + i % 17))


def _tar_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        _wds_caption, _wds_bin, write_tar, TAR_SHARDS, TAR_SAMPLES, TAR_MTIME0
    )
    d = os.path.join(SCRATCH, f"wds_shards_{rev}")
    os.makedirs(d, exist_ok=True)
    for s in range(TAR_SHARDS):
        p = os.path.join(d, f"shard_{s:04d}.tar")
        if not os.path.exists(p):
            members = []
            for j in range(TAR_SAMPLES):
                i = s * TAR_SAMPLES + j
                key = f"sample{i:06d}"
                members.append(
                    (f"{key}.txt", TAR_MTIME0 + i, _wds_caption(i).encode())
                )
                members.append((f"{key}.bin", TAR_MTIME0 + i, _wds_bin(i)))
            tmp = p + ".tmp"
            write_tar(tmp, members)
            os.replace(tmp, p)
    return d


_SQL_WDS = f"""
samples AS (
  SELECT s.s AS shard, j.j AS j, s.s * {TAR_SAMPLES} + j.j AS i
  FROM range({TAR_SHARDS}) s(s), LATERAL unnest(range({TAR_SAMPLES})) AS j(j)
),
caps AS (
  SELECT shard, j, i,
         'object ' || CAST((7 * i) % 50 AS VARCHAR)
           || ' in scene ' || CAST(i % 9 AS VARCHAR) AS caption,
         40 + i % 17 AS blen
  FROM samples
),
binsum AS (
  SELECT i, CAST(SUM((3 * i + k.k) % 256) AS BIGINT) AS bsum
  FROM caps, LATERAL unnest(range(0, blen)) AS k(k)
  GROUP BY i
)"""


@register(
    "scan_tar_members",
    tags=("source", "tar", "webdataset", "real-bytes"),
    oracle=f"""
WITH {_SQL_WDS}
SELECT CAST(shard AS INTEGER) AS shard_id,
       CAST(2 * j AS BIGINT) AS member_index,
       'sample' || lpad(CAST(i AS VARCHAR), 6, '0') || '.txt' AS name,
       '0' AS typeflag,
       CAST(length(caption) AS BIGINT) AS size,
       CAST({TAR_MTIME0} + i AS BIGINT) AS mtime,
       'txt' AS kind, caption, CAST(NULL AS BIGINT) AS bin_sum
FROM caps
UNION ALL
SELECT CAST(shard AS INTEGER), CAST(2 * j + 1 AS BIGINT),
       'sample' || lpad(CAST(i AS VARCHAR), 6, '0') || '.bin',
       '0', CAST(blen AS BIGINT), CAST({TAR_MTIME0} + i AS BIGINT),
       'bin', CAST(NULL AS VARCHAR), bsum
FROM caps JOIN binsum USING (i)
""",
)
def scan_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL tar parsing end-to-end: the fixture shards are written and
    re-parsed byte-for-byte (headers, octal fields, checksums, block
    padding), and every member's name/size/mtime plus a content probe
    (decoded caption for .txt, exact byte sum for .bin) is verified
    against a closed-form DuckDB oracle that recomputes the WebDataset
    formulas with independent arithmetic. Scale: one parse task per
    shard, payloads never shuffle — only the O(1) probe columns do."""
    d = _tar_fixture_dir()
    members = read_tar(spark, os.path.join(d, "*.tar"))
    shard_id = (
        F.regexp_extract(F.col("path"), r"shard_(\d{4})\.tar", 1).cast("int")
    )
    kind = F.element_at(F.split(F.col("name"), r"\."), 2)
    return members.select(
        shard_id.alias("shard_id"),
        "member_index",
        "name",
        "typeflag",
        "size",
        "mtime",
        kind.alias("kind"),
        F.when(kind == "txt", F.decode(F.col("payload"), "UTF-8")).alias(
            "caption"
        ),
        F.when(
            kind == "bin",
            F.aggregate(
                # binary -> byte values via substring over the payload;
                # getbit-free exact sum inside whole-stage codegen
                F.transform(
                    F.sequence(F.lit(1), F.col("size").cast("int")),
                    lambda k: F.ascii(
                        F.decode(F.substring("payload", k, 1), "ISO-8859-1")
                    ).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        ).alias("bin_sum"),
    )


@register(
    "mm_webdataset_pairs",
    tags=("llm", "multimodal", "tar", "webdataset"),
    oracle=f"""
WITH {_SQL_WDS}
SELECT 'sample' || lpad(CAST(i AS VARCHAR), 6, '0') AS key,
       CAST(shard AS INTEGER) AS shard_id,
       CAST(2 AS BIGINT) AS n_parts,
       caption,
       CAST(blen AS BIGINT) AS bin_size,
       bsum AS bin_sum
FROM caps JOIN binsum USING (i)
""",
)
def mm_webdataset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset sample assembly: members group by basename KEY within
    a shard (the convention that keeps assembly shard-local — no
    cross-file shuffle at 100 TB, because a sample's parts are adjacent
    in one tar). Emits one row per sample with the caption and the
    binary part's size + exact byte sum; the oracle recomputes the pair
    from the fixture formulas, so a pairing bug (key off-by-one, parts
    leaking across samples) breaks the hash."""
    d = _tar_fixture_dir()
    members = read_tar(spark, os.path.join(d, "*.tar"))
    shard_id = (
        F.regexp_extract(F.col("path"), r"shard_(\d{4})\.tar", 1).cast("int")
    )
    split = F.split(F.col("name"), r"\.")
    parts = members.select(
        shard_id.alias("shard_id"),
        F.element_at(split, 1).alias("key"),
        F.element_at(split, 2).alias("kind"),
        "size",
        "payload",
    )
    byte_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.col("size").cast("int")),
            lambda k: F.ascii(
                F.decode(F.substring("payload", k, 1), "ISO-8859-1")
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return parts.groupBy("key", "shard_id").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.max(
            F.when(F.col("kind") == "txt", F.decode(F.col("payload"), "UTF-8"))
        ).alias("caption"),
        F.max(F.when(F.col("kind") == "bin", F.col("size"))).alias("bin_size"),
        F.max(F.when(F.col("kind") == "bin", byte_sum)).alias("bin_sum"),
    )


# --- WebDataset epoch ordering (tar shards -> reproducible training order) ----
#
# The piece between ingest and the data loader: assembled samples get
# the sample_epoch_shuffle treatment — a DETERMINISTIC per-epoch
# permutation keyed md5(epoch:key) — so a preempted training run
# resumes mid-epoch in the identical order, with the tar shard as the
# unit of ingest and the sample key as the unit of shuffling. The
# oracle recomputes assembly AND ordering from the closed-form fixture
# formulas. Scale: the permutation key is a projection; each epoch
# sorts independently (range partition by epoch); payload columns
# never enter the sort — only keys and O(1) probe columns.

WDS_EPOCHS = 3


@register(
    "mm_webdataset_epoch",
    tags=("llm", "multimodal", "tar", "webdataset", "ordering"),
    oracle=f"""
WITH {_SQL_WDS},
keys AS (
  SELECT 'sample' || lpad(CAST(i AS VARCHAR), 6, '0') AS key,
         CAST(shard AS INTEGER) AS shard_id, caption, bsum
  FROM caps JOIN binsum USING (i)
),
epochs AS (SELECT CAST(t.i AS INTEGER) AS epoch
           FROM unnest(range(0, {WDS_EPOCHS})) AS t(i)),
keyed AS (
  SELECT epoch, key, shard_id, caption, bsum,
         md5(CAST(epoch AS VARCHAR) || ':' || key) AS shuffle_key
  FROM keys CROSS JOIN epochs
)
SELECT epoch, key, shard_id, shuffle_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                               ORDER BY shuffle_key, key) AS BIGINT)
         AS position,
       caption, bsum AS bin_sum
FROM keyed
""",
)
def mm_webdataset_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{WDS_EPOCHS} reproducible training epochs over the assembled
    WebDataset samples: each epoch re-permutes every sample by
    md5(epoch:key) and assigns its position; captions and binary byte
    sums ride along so the oracle pins both the ORDER and that the
    ordered rows still carry the right sample content (an off-by-one
    in assembly or a stale shard would break the hash)."""
    pairs = mm_webdataset_pairs(spark, sf_dir).select(
        "key", "shard_id", "caption", "bin_sum"
    )
    epochs = spark.range(WDS_EPOCHS).select(
        F.col("id").cast("int").alias("epoch")
    )
    keyed = pairs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "key",
        "shard_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("key"))
        ).alias("shuffle_key"),
        "caption",
        "bin_sum",
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "key")
    return keyed.select(
        "epoch",
        "key",
        "shard_id",
        "shuffle_key",
        F.row_number().over(w).cast("bigint").alias("position"),
        "caption",
        "bin_sum",
    )
