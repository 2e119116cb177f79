"""Hand-rolled parquet data-page reader tests: the fourth corner of
the cross-engine triangle — pyarrow reads back the same files the
hand reader decodes, and they must agree exactly (including null
positions and string payloads)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_streaming_test_spark.sources.parquet_pages import (
    read_parquet_plain,
    rle_bitpacked_hybrid,
)


def _write(tmp_path, tbl, **kw):
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        tbl, p, use_dictionary=False, data_page_version="1.0", **kw
    )
    return open(p, "rb").read()


def _expected(tbl):
    return {c: tbl.column(c).to_pylist() for c in tbl.column_names}


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip"])
def test_reader_matches_pyarrow_roundtrip(tmp_path, codec):
    import random

    rng = random.Random(11)
    n = 500
    tbl = pa.table(
        {
            "a": pa.array(
                [None if rng.random() < 0.2 else rng.randint(-(2**62), 2**62)
                 for _ in range(n)],
                pa.int64(),
            ),
            "b": pa.array(
                [None if rng.random() < 0.2 else rng.random()
                 for _ in range(n)],
                pa.float64(),
            ),
            "c": pa.array(
                [None if rng.random() < 0.2 else "s" * rng.randint(0, 30)
                 for _ in range(n)],
                pa.string(),
            ),
        }
    )
    buf = _write(tmp_path, tbl, compression=codec)
    assert read_parquet_plain(buf) == _expected(tbl)


def test_multiple_row_groups_and_pages(tmp_path):
    n = 5000
    tbl = pa.table({"x": pa.array(range(n), pa.int64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        tbl, p, use_dictionary=False, data_page_version="1.0",
        compression="snappy", row_group_size=700, data_page_size=1024,
    )
    buf = open(p, "rb").read()
    assert read_parquet_plain(buf)["x"] == list(range(n))


def test_dictionary_encoded_chunks_decode(tmp_path):
    """The pyarrow DEFAULT layout: dictionary page + RLE_DICTIONARY
    data pages. Low-cardinality strings with nulls across several
    pages must reproduce exactly."""
    import random

    rng = random.Random(3)
    n = 3000
    vals = [
        None if rng.random() < 0.15 else f"cat{rng.randint(0, 9)}"
        for _ in range(n)
    ]
    nums = [
        None if rng.random() < 0.15 else rng.randint(0, 5) for _ in range(n)
    ]
    tbl = pa.table(
        {"s": pa.array(vals, pa.string()), "k": pa.array(nums, pa.int64())}
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        tbl, p, compression="snappy", data_page_version="1.0",
        data_page_size=2048,
    )  # dictionary ON (the pyarrow default)
    got = read_parquet_plain(open(p, "rb").read())
    assert got == _expected(tbl)


def test_dictionary_fallback_to_plain_mid_chunk(tmp_path):
    """pyarrow falls back to PLAIN pages when the dictionary outgrows
    its limit — a single chunk then MIXES RLE_DICTIONARY and PLAIN
    pages, and the per-page encoding dispatch must handle both."""
    n = 4000
    vals = [f"unique-{i:05d}" for i in range(n)]  # unbounded cardinality
    tbl = pa.table({"s": pa.array(vals, pa.string())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        tbl, p, compression="none", data_page_version="1.0",
        dictionary_pagesize_limit=2048, data_page_size=2048,
    )
    got = read_parquet_plain(open(p, "rb").read())
    assert got == _expected(tbl)


def test_nested_schema_rejected(tmp_path):
    tbl = pa.table({"s": pa.array([{"k": 1}, {"k": 2}])})
    buf = _write(tmp_path, tbl, compression="none")
    with pytest.raises(ValueError, match="nested"):
        read_parquet_plain(buf)


def test_rle_hybrid_both_run_kinds():
    # RLE run: header = count<<1 (LSB clear), one value byte
    assert rle_bitpacked_hybrid(bytes([10 << 1, 1]), 1, 10) == [1] * 10
    # bit-packed run: header = groups<<1 | 1; 1 group of 8 1-bit values
    assert rle_bitpacked_hybrid(bytes([(1 << 1) | 1, 0b10110100]), 1, 8) == [
        0, 0, 1, 0, 1, 1, 0, 1,
    ]
    # trailing bit-packed padding beyond count is discarded
    assert rle_bitpacked_hybrid(bytes([(1 << 1) | 1, 0xFF]), 1, 5) == [1] * 5
    # width 3, RLE of value 5
    assert rle_bitpacked_hybrid(bytes([4 << 1, 5]), 3, 4) == [5, 5, 5, 5]


def test_truncated_snappy_page_raises(tmp_path):
    """Raw snappy carries no checksum (a flipped literal byte is
    silent by format design — parquet's optional page CRC exists for
    exactly that reason), but SIZE lies are always caught: the
    decompressed length must equal the header's uncompressed size."""
    tbl = pa.table({"x": pa.array(range(100), pa.int64())})
    buf = bytearray(_write(tmp_path, tbl, compression="snappy"))
    # zero out the tail of the first page's compressed body: the
    # snappy stream ends early / mis-expands and the length check fires
    i = buf.index(b"PAR1") + 4
    buf[i + 40 : i + 200] = bytes(160)
    with pytest.raises(ValueError):
        read_parquet_plain(bytes(buf))
