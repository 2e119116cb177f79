"""Hand-rolled Parquet DATA-PAGE reader — footers were round 6; this
round reads the ACTUAL VALUES, no pyarrow/engine in the read path.

Parquet's data layer (parquet-format spec, public) on top of the
round-6 Thrift compact reader:

  * per column chunk: Thrift ``PageHeader`` + page bytes, repeated
    until the chunk's ``num_values`` are consumed,
  * page decompression: UNCOMPRESSED, SNAPPY (codec 1 — the RAW snappy
    block format; the round-9 hand-written decoder in
    ``sources/kafka_wire.py`` gets its second consumer here), and
    GZIP (codec 2, stdlib zlib), ZSTD (codec 6, the pure-stdlib
    RFC 8878 decoder in zstd_codec.py — pyarrow writes real libzstd
    pages and this reader decodes them),
  * DATA_PAGE v1 payload: definition levels as a length-prefixed
    RLE/bit-packed HYBRID run (the same encoding Parquet uses for
    dictionary indexes and rep levels — both run kinds implemented),
    then PLAIN-encoded values for the non-null slots,
  * PLAIN decode for INT64, DOUBLE and BYTE_ARRAY (length-prefixed).

  * DICTIONARY chunks — the pyarrow/production DEFAULT layout: a
    PLAIN dictionary page, then RLE_DICTIONARY data pages (one raw
    bit-width byte + an index run in the same hybrid encoding),
    including the mid-chunk PLAIN fallback pyarrow emits when the
    dictionary outgrows its limit.

Scope is explicit: PLAIN + RLE_DICTIONARY encodings, flat schemas (no
repetition levels), data page v1; v2 pages and nested columns raise.
The fixtures are written by pyarrow, and THAT is the cross-engine
proof: pyarrow WRITES the bytes, this module reads them by hand, and
the DuckDB oracle (plus a pyarrow read-back in tests) must agree
row-for-row.

Scale posture: the reader is per-file inside ``mapInPandas`` over a
``binaryFile`` scan — the demonstration path. The production path for
parquet at 100 TB is of course the native Spark scan (pushdown,
pruning, vectorized readers); this module exists to prove the FORMAT
is understood to the byte level, the same posture as the Kafka wire
and JPEG modules.
"""

from __future__ import annotations

import os as _os
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

PQ_N = 20

# parquet.thrift enums (public spec)
_TYPE_INT64 = 2
_TYPE_DOUBLE = 5
_TYPE_BYTE_ARRAY = 6
_CODEC_UNCOMPRESSED = 0
_CODEC_SNAPPY = 1
_CODEC_GZIP = 2
_CODEC_ZSTD = 6
_PAGE_DATA_V1 = 0
_PAGE_DICTIONARY = 2
_PAGE_DATA_V2 = 3
_ENC_PLAIN = 0
_ENC_PLAIN_DICTIONARY = 2
_ENC_RLE_DICTIONARY = 8


def rle_bitpacked_hybrid(data: bytes, width: int, count: int) -> list[int]:
    """Parquet's RLE/bit-packed hybrid: uvarint header, LSB set =>
    bit-packed run of (header >> 1) GROUPS of 8 values (LSB-first
    within each byte), LSB clear => RLE run of (header >> 1) copies of
    one little-endian ceil(width/8)-byte value. Trailing bit-packed
    padding values beyond ``count`` are discarded per the spec."""
    out: list[int] = []
    pos = 0
    mask = (1 << width) - 1
    while len(out) < count:
        header = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if header & 1:  # bit-packed groups
            groups = header >> 1
            nbytes = groups * width
            bits = int.from_bytes(data[pos : pos + nbytes], "little")
            pos += nbytes
            for j in range(groups * 8):
                out.append((bits >> (j * width)) & mask)
        else:  # RLE run
            run = header >> 1
            nb = (width + 7) // 8
            v = int.from_bytes(data[pos : pos + nb], "little")
            pos += nb
            out.extend([v] * run)
    return out[:count]


def _decompress(page: bytes, codec: int, want: int) -> bytes:
    if codec == _CODEC_UNCOMPRESSED:
        raw = page
    elif codec == _CODEC_SNAPPY:
        from .kafka_wire import snappy_decompress

        raw = snappy_decompress(page)
    elif codec == _CODEC_ZSTD:
        from .zstd_codec import zstd_decompress

        raw = zstd_decompress(page)
    elif codec == _CODEC_GZIP:
        import zlib

        raw = zlib.decompress(page, wbits=47)
    else:
        raise ValueError(f"unsupported parquet codec {codec}")
    if len(raw) != want:
        raise ValueError(
            f"page decompressed to {len(raw)} bytes, header says {want}"
        )
    return raw


def read_parquet_plain(buf: bytes) -> dict[str, list]:
    """{column_name: python values (None for nulls)} from whole-file
    parquet bytes — footer walk, per-chunk page loop (dictionary page
    first when the chunk has one), def-level decode, PLAIN or
    RLE_DICTIONARY value decode with per-page encoding dispatch (the
    mid-chunk PLAIN fallback is real pyarrow behavior). Raises on v2
    pages / nested schemas (out of the declared scope)."""
    from .parquet_footer import thrift_read_struct

    if buf[-4:] != b"PAR1" or buf[:4] != b"PAR1":
        raise ValueError("not a parquet file")
    (mlen,) = _struct.unpack("<I", buf[-8:-4])
    fmd, _ = thrift_read_struct(buf[-8 - mlen : -8], 0)

    # flat-schema check + per-leaf (type, optional) from SchemaElement
    schema = fmd[2]
    root = schema[0]
    leaves: dict[bytes, tuple[int, bool]] = {}
    for se in schema[1:]:
        if se.get(5):  # num_children on a non-root element: nested
            raise ValueError("nested parquet schemas unsupported here")
        leaves[se[4]] = (se[1], se.get(3, 0) == 1)  # OPTIONAL = 1
    if root.get(5) != len(leaves):
        raise ValueError("schema walk out of sync with root child count")

    out: dict[str, list] = {name.decode(): [] for name in leaves}
    for rg in fmd[4]:
        for cc in rg[1]:
            md = cc[3]
            path = md[3]
            if len(path) != 1:
                raise ValueError("nested column paths unsupported here")
            name = path[0]
            typ, optional = leaves[name]
            if typ != md[1]:
                raise ValueError("chunk type disagrees with schema")
            codec = md[4]
            nvals = md[5]

            def plain_values(raw: bytes, p: int, n_vals: int, typ: int):
                vals = []
                for _ in range(n_vals):
                    if typ == _TYPE_INT64:
                        vals.append(_struct.unpack_from("<q", raw, p)[0])
                        p += 8
                    elif typ == _TYPE_DOUBLE:
                        vals.append(_struct.unpack_from("<d", raw, p)[0])
                        p += 8
                    elif typ == _TYPE_BYTE_ARRAY:
                        (sl,) = _struct.unpack_from("<I", raw, p)
                        p += 4
                        vals.append(raw[p : p + sl].decode("utf-8"))
                        p += sl
                    else:
                        raise ValueError(f"PLAIN type {typ} unsupported")
                return vals

            dictionary: list | None = None
            dict_off = md.get(11)
            # the chunk starts at the dictionary page when present
            off = dict_off if dict_off is not None else md[9]
            col = out[name.decode()]
            got = 0
            while got < nvals:
                ph, body = thrift_read_struct(buf, off)
                if ph[1] == _PAGE_DICTIONARY:
                    dph = ph[7]  # dictionary_page_header
                    if dph.get(2, _ENC_PLAIN) not in (
                        _ENC_PLAIN,
                        _ENC_PLAIN_DICTIONARY,
                    ):
                        raise ValueError("non-PLAIN dictionary page")
                    raw = _decompress(
                        buf[body : body + ph[3]], codec, ph[2]
                    )
                    dictionary = plain_values(raw, 0, dph[1], typ)
                    off = body + ph[3]
                    continue
                if ph[1] == _PAGE_DATA_V2:
                    raise ValueError("data page v2 unsupported (v1 scope)")
                if ph[1] != _PAGE_DATA_V1:
                    raise ValueError(f"unknown page type {ph[1]}")
                dph = ph[5]
                nv = dph[1]
                enc = dph[2]
                raw = _decompress(buf[body : body + ph[3]], codec, ph[2])
                p = 0
                if optional:
                    (ln,) = _struct.unpack_from("<I", raw, p)
                    p += 4
                    defs = rle_bitpacked_hybrid(raw[p : p + ln], 1, nv)
                    p += ln
                else:
                    defs = [1] * nv
                n_present = sum(defs)
                if enc == _ENC_PLAIN:
                    vals = plain_values(raw, p, n_present, typ)
                elif enc in (_ENC_RLE_DICTIONARY, _ENC_PLAIN_DICTIONARY):
                    if dictionary is None:
                        raise ValueError(
                            "dictionary-encoded page before any dictionary"
                        )
                    # one raw bit-width byte, then an RLE/bit-packed
                    # hybrid run of indexes extending to the page end
                    width = raw[p]
                    p += 1
                    idxs = rle_bitpacked_hybrid(raw[p:], width, n_present)
                    vals = [dictionary[ix] for ix in idxs]
                else:
                    raise ValueError(f"encoding {enc} unsupported")
                it = iter(vals)
                for d in defs:
                    col.append(next(it) if d else None)
                got += nv
                off = body + ph[3]
    lens = {len(v) for v in out.values()}
    if len(lens) != 1:
        raise ValueError(f"column lengths disagree: {lens}")
    return out


# --- fixtures + query ---------------------------------------------------------


def _pq_n_rows(i: int) -> int:
    return 80 + 10 * (i % 5)


def _pq_val(r: int, i: int):
    return None if (r + i) % 7 == 0 else ((r * r * 3 + i) % 1000) / 8.0


def _pq_name(r: int, i: int):
    return None if (r + i) % 11 == 0 else f"n{(r * 13 + i) % 97}"


def _pq_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_pq_n_rows, _pq_val, _pq_name, PQ_N, 3)
    d = _os.path.join(SCRATCH, f"pq_plain_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(PQ_N):
        p = _os.path.join(d, f"shard_{i:04d}.parquet")
        if _os.path.exists(p):
            continue
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = _pq_n_rows(i)
        tbl = pa.table(
            {
                "row_id": pa.array(range(n), pa.int64()),
                "val": pa.array([_pq_val(r, i) for r in range(n)], pa.float64()),
                "name": pa.array([_pq_name(r, i) for r in range(n)], pa.string()),
            }
        )
        tmp = p + ".tmp"
        # rotate the codec so SNAPPY (hand decoder), GZIP (zlib),
        # ZSTD (RFC 8878 hand decoder reading real libzstd pages) and
        # UNCOMPRESSED chunks all appear in the driver-facing query
        codec = ["snappy", "none", "gzip", "zstd"][i % 4]
        pq.write_table(
            tbl,
            tmp,
            use_dictionary=False,
            compression=codec,
            data_page_version="1.0",
        )
        _os.replace(tmp, p)
    return d


@register(
    "scan_parquet_pages_handrolled",
    tags=("scan", "format", "pandas-udf"),
    # every row of every shard, regenerated from the closed forms; the
    # bytes were written by pyarrow, decoded by the hand reader, and
    # must hash-match DuckDB's recomputation — three implementations
    # agreeing on the same values
    oracle=f"""
WITH shards AS (
  SELECT i, 80 + 10 * (i % 5) AS n FROM range({PQ_N}) t(i)
),
rows_ AS (
  SELECT i, rr.r AS r FROM shards, LATERAL unnest(range(0, n)) AS rr(r)
)
SELECT CAST(i AS BIGINT) AS shard,
       CAST(r AS BIGINT) AS row_id,
       CASE WHEN (r + i) % 7 = 0 THEN NULL
            ELSE ((r * r * 3 + i) % 1000) / 8.0 END AS val,
       CASE WHEN (r + i) % 11 = 0 THEN NULL
            ELSE 'n' || CAST((r * 13 + i) % 97 AS VARCHAR) END AS name
FROM rows_
""",
)
def scan_parquet_pages_handrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet read WITHOUT a parquet engine: Thrift footer walk, page
    headers, SNAPPY/GZIP/ZSTD page decompression (snappy and zstd are
    the hand-written decoders), RLE/bit-packed definition levels, PLAIN
    value decode — every row of pyarrow-written shards reproduced
    byte-exactly. Cross-engine triangle: pyarrow wrote the bytes, this
    reader decodes them, DuckDB recomputes the truth from closed
    forms (tests add a fourth corner: pyarrow reads back the same
    files). Codec rotates snappy/none/gzip/zstd across shards so each
    decompressor is load-bearing — the zstd shards are REAL libzstd
    output decoded by the pure-stdlib RFC 8878 decoder."""
    d = _pq_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.parquet"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(path.rsplit("shard_", 1)[1][:4])
                cols = read_parquet_plain(bytes(content))
                frames.append(
                    pd.DataFrame(
                        {
                            "shard": shard,
                            "row_id": cols["row_id"],
                            "val": cols["val"],
                            "name": cols["name"],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return src.mapInPandas(
        decode,
        schema="shard bigint, row_id bigint, val double, name string",
    )


def _pq_dict_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_pq_n_rows, _pq_val, _pq_name, PQ_N, "dict", 3)
    d = _os.path.join(SCRATCH, f"pq_dict_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(PQ_N):
        p = _os.path.join(d, f"shard_{i:04d}.parquet")
        if _os.path.exists(p):
            continue
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = _pq_n_rows(i)
        tbl = pa.table(
            {
                "row_id": pa.array(range(n), pa.int64()),
                "val": pa.array([_pq_val(r, i) for r in range(n)], pa.float64()),
                "name": pa.array([_pq_name(r, i) for r in range(n)], pa.string()),
            }
        )
        tmp = p + ".tmp"
        # dictionary ON (the default) + small pages so chunks carry a
        # dictionary page plus multiple RLE_DICTIONARY data pages
        pq.write_table(
            tbl,
            tmp,
            compression=["snappy", "none", "gzip", "zstd"][i % 4],
            data_page_version="1.0",
            data_page_size=512,
        )
        _os.replace(tmp, p)
    return d


@register(
    "scan_parquet_dict_handrolled",
    tags=("scan", "format", "pandas-udf"),
    # identical truth to the PLAIN twin — the dictionary layout is a
    # different ENCODING of the same rows, so the same closed-form
    # oracle must hash-match: dictionary page decode, bit-width header,
    # hybrid index runs and the def-level interleave all load-bearing
    oracle=f"""
WITH shards AS (
  SELECT i, 80 + 10 * (i % 5) AS n FROM range({PQ_N}) t(i)
),
rows_ AS (
  SELECT i, rr.r AS r FROM shards, LATERAL unnest(range(0, n)) AS rr(r)
)
SELECT CAST(i AS BIGINT) AS shard,
       CAST(r AS BIGINT) AS row_id,
       CASE WHEN (r + i) % 7 = 0 THEN NULL
            ELSE ((r * r * 3 + i) % 1000) / 8.0 END AS val,
       CASE WHEN (r + i) % 11 = 0 THEN NULL
            ELSE 'n' || CAST((r * 13 + i) % 97 AS VARCHAR) END AS name
FROM rows_
""",
)
def scan_parquet_dict_handrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DICTIONARY-encoded twin of ``scan_parquet_pages_handrolled``
    — pyarrow's default production layout: per-chunk PLAIN dictionary
    page + RLE_DICTIONARY data pages (raw bit-width byte + hybrid index
    runs), small pages forcing several pages per chunk, codec rotating
    snappy/none/gzip/zstd. Same rows, same oracle, different bytes: a
    correct reader must agree with its PLAIN twin hash-for-hash."""
    d = _pq_dict_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.parquet"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = int(path.rsplit("shard_", 1)[1][:4])
                cols = read_parquet_plain(bytes(content))
                frames.append(
                    pd.DataFrame(
                        {
                            "shard": shard,
                            "row_id": cols["row_id"],
                            "val": cols["val"],
                            "name": cols["name"],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return src.mapInPandas(
        decode,
        schema="shard bigint, row_id bigint, val double, name string",
    )
