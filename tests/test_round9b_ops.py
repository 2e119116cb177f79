"""Round-9 second-wave operators: .warc.zst containers, CCNet-style
paragraph dedup, and domain-scoped boilerplate spans.

Correctness of the registered queries rides test_oracle_parity (hash
vs DuckDB); these tests pin the parts an oracle can't: container
torn-tail behavior, cross-container agreement, first-occurrence-wins
semantics on a hand-built corpus, and the plan shapes that make the
text operators scale (hash-not-body shuffles, zero Python eval)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_warc_zst_frame_roundtrip_and_torn_tail(tmp_path):
    """Frame-per-record .warc.zst roundtrips exactly, the whole file is
    one legal concatenated-frame stream, and a torn final frame drops
    cleanly (the .warc.gz convention)."""
    from spark_streaming_test_spark.sources import warc as W
    from spark_streaming_test_spark.sources.zstd_codec import zstd_decompress

    recs = [
        ("response", "<urn:z1>", "http://h.test/1", b"hello zst"),
        ("request", "<urn:z2>", "http://h.test/1", b""),
        ("response", "<urn:z3>", "http://h.test/2", b"bye " * 50),
    ]
    p = str(tmp_path / "seg.warc.zst")
    W.write_warc_zst(p, recs)
    buf = open(p, "rb").read()
    got = list(W.parse_warc_zst_bytes(p, buf))
    assert [(r[2], r[3], r[4], r[6]) for r in got] == recs
    assert [r[1] for r in got] == [0, 1, 2]  # file-level rec_index
    # whole-stream decompress is the same plain WARC (frame concat law)
    plain = zstd_decompress(buf)
    assert len(list(W.parse_warc_bytes(p, plain))) == 3
    # torn final frame: complete records survive, the tail is dropped
    got2 = list(W.parse_warc_zst_bytes(p, buf[:-5]))
    assert [r[3] for r in got2] == ["<urn:z1>", "<urn:z2>"]


def test_warc_three_containers_agree(spark):
    """plain / .gz / .zst fixture scans produce identical parse output
    (same record grammar under three compressions) on the shared
    record prefix."""
    from spark_streaming_test_spark import registry

    qs = registry.queries()
    cols = ["file_id", "rec_index", "warc_type", "target_uri",
            "content_length", "payload_md5"]
    plain = {
        tuple(r) for r in qs["scan_warc_records"](spark, SF_DIR)
        .filter(F.col("rec_index") < 50).select(cols).collect()
    }
    gz = {
        tuple(r) for r in qs["scan_warc_gz_records"](spark, SF_DIR)
        .filter(F.col("rec_index") < 50).select(cols).collect()
    }
    zst = {
        tuple(r) for r in qs["scan_warc_zst_records"](spark, SF_DIR)
        .filter(F.col("rec_index") < 50).select(cols).collect()
    }
    assert plain == gz == zst
    assert len(plain) == 200  # 4 files x 50 shared records


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Hand-built corpus: doc 0 and doc 2 share a verbatim 20-word
    paragraph; the doc-0 copy (smaller doc_id) survives, the doc-2
    copy is removed, unique paragraphs are untouched."""
    from spark_streaming_test_spark.llm.dedup import (
        PARA_WORDS,
        _word_chunks,
    )

    shared = " ".join(f"s{i}" for i in range(PARA_WORDS))
    uniq = [" ".join(f"u{d}w{i}" for i in range(PARA_WORDS)) for d in range(3)]
    df = spark.createDataFrame(
        [
            (0, shared + " " + uniq[0]),
            (1, uniq[1]),
            (2, uniq[2] + " " + shared),
        ],
        "doc_id long, text string",
    )
    paras = df.select(
        "doc_id", F.explode(_word_chunks(F.col("text"), PARA_WORDS)).alias("p")
    ).select("doc_id", "p.idx", F.md5("p.chunk").alias("h"))
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id", "idx")
    ranked = paras.withColumn("rn", F.row_number().over(w))
    removed = {
        (r["doc_id"], r["idx"])
        for r in ranked.filter(F.col("rn") > 1).collect()
    }
    assert removed == {(2, 1)}  # only doc 2's copy of the shared para


def test_text_dedup_plans_shuffle_hashes_not_bodies(spark):
    """Scale gate for the two text passes: no Python eval node at all
    (pure built-ins), and every exchange key set is (hash[, idx/doc_id/
    source]) — document text never crosses a shuffle boundary."""
    from spark_streaming_test_spark import registry

    qs = registry.queries()
    for name in ("text_paragraph_dedup", "text_boilerplate_spans"):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text#" not in line, (name, line)
                assert "chunk" not in line, (name, line)


# --- H.264 NAL/SPS metadata demux --------------------------------------------


def test_h264_exp_golomb_and_escape_roundtrip():
    """Property: ue(v) write->read is identity, and emulation
    prevention escape->unescape is identity on adversarial byte runs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_streaming_test_spark.sources.h264_nal import (
        _BitReader,
        _BitWriter,
        escape_rbsp,
        unescape_rbsp,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 100000), min_size=1, max_size=30))
    def golomb(values):
        w = _BitWriter()
        for v in values:
            w.ue(v)
        r = _BitReader(w.rbsp())
        assert [r.ue() for _ in values] == values

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def escape(payload):
        # bias toward the dangerous alphabet
        twisted = bytes(b % 5 for b in payload)
        for data in (payload, twisted):
            assert unescape_rbsp(escape_rbsp(data)) == data
            # escaped form never contains a start code
            assert b"\x00\x00\x01" not in escape_rbsp(data)
            assert b"\x00\x00\x00" not in escape_rbsp(data)

    golomb()
    escape()


def test_h264_annexb_split_and_forbidden_bit():
    from spark_streaming_test_spark.sources.h264_nal import (
        split_annexb,
        write_annexb,
    )
    import pytest as _pytest

    nals = [(7, b"\x42\x00\x1e\x80"), (8, b"\x01\x00\x00\x01\x80"),
            (5, b"\x00\x00\x02\x00\x00\x00\x03\x80")]
    buf = write_annexb(nals)
    got = split_annexb(buf)
    assert [(i, t) for i, t, _ in got] == [(0, 7), (1, 8), (2, 5)]
    from spark_streaming_test_spark.sources.h264_nal import unescape_rbsp

    assert [unescape_rbsp(e) for _, _, e in got] == [p for _, p in nals]
    # forbidden_zero_bit: a header byte with the top bit set must raise
    bad = b"\x00\x00\x01" + bytes([0x80 | 7]) + b"\x42"
    with _pytest.raises(ValueError, match="forbidden"):
        split_annexb(bad)


def test_h264_sps_crop_math_1080p():
    """1920x1080 codes as 120x68 macroblocks (1088 rows); only correct
    4:2:0 crop-unit math recovers 1080."""
    from spark_streaming_test_spark.sources.h264_nal import (
        build_sps,
        parse_sps,
    )

    m = parse_sps(build_sps(77, 40, 1920, 1080))
    assert (m["width"], m["height"]) == (1920, 1080)
    # and a non-multiple-of-16 width too
    m2 = parse_sps(build_sps(66, 30, 1366, 768))
    assert (m2["width"], m2["height"]) == (1366, 768)


# --- web-document operators ---------------------------------------------------


def test_html_extractor_drops_invisible_and_decodes_entities():
    from spark_streaming_test_spark.llm.webdoc import extract_html

    html = (
        "<html><head><title>T &amp; U</title>"
        "<script>var leak = 'SECRET';</script>"
        "<style>b { }</style></head>"
        "<body><p>alpha &lt;beta&gt;</p><noscript>NOPE</noscript>"
        "<p><a href='x'>go</a> gamma</p></body></html>"
    )
    r = extract_html(html)
    assert r["title"] == "T & U"
    assert r["text"] == "alpha <beta> go gamma"
    assert "SECRET" not in r["text"] and "NOPE" not in r["text"]
    assert r["n_links"] == 1 and r["n_paragraphs"] == 2
    assert r["dropped_chars"] > 0


def test_documents_text_single_spaced_invariant():
    """The html_extract_text oracle rebuilds the extraction by splitting
    documents.text on single spaces; that is only hash-exact while the
    corpus text is single-spaced with no leading/trailing whitespace
    (the extractor normalizes whitespace, the oracle preserves it).
    Pin the invariant so a datagen change fails here, not in the
    driver's hash compare (ADVICE r9 item 1)."""
    import duckdb

    bad = duckdb.sql(
        f"""
        SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE text LIKE '  %' OR text LIKE '% ' OR text LIKE ' %'
           OR contains(text, '  ') OR contains(text, chr(9))
           OR contains(text, chr(10))
        """
    ).fetchone()[0]
    assert bad == 0


def test_robots_prefix_semantics():
    import urllib.robotparser as rp

    from spark_streaming_test_spark.llm.webdoc import _robots_txt

    p = rp.RobotFileParser()
    p.parse(_robots_txt("src3").splitlines())  # odd: disallow 3, 7, 11
    assert not p.can_fetch("*", "http://src3.example/p/3")
    assert not p.can_fetch("*", "http://src3.example/p/11")
    assert p.can_fetch("*", "http://src3.example/p/1")  # 1 != prefix of 11 rule
    assert p.can_fetch("*", "http://src3.example/p/13")  # /p/3 not a prefix
    p2 = rp.RobotFileParser()
    p2.parse(_robots_txt("src4").splitlines())
    assert not p2.can_fetch("*", "http://src4.example/p/0")
    assert not p2.can_fetch("*", "http://src4.example/private/x")
    assert p2.can_fetch("*", "http://src4.example/p/3")


def test_png_adam7_equals_sequential_decode(tmp_path):
    """Same pixel formula written interlaced and straight must decode
    to identical arrays, across shapes with empty Adam7 passes."""
    import numpy as np

    from spark_streaming_test_spark.llm.multimodal import (
        _png_pixel,
        decode_png_rgb8,
        write_png_rgb8,
    )

    for w, h in [(1, 1), (2, 3), (7, 1), (1, 9), (13, 11), (16, 5)]:
        pa = str(tmp_path / "a.png")
        pb = str(tmp_path / "b.png")
        write_png_rgb8(pa, w, h, _png_pixel(4), interlace=0)
        write_png_rgb8(pb, w, h, _png_pixel(4), interlace=1)
        _, _, seq = decode_png_rgb8(open(pa, "rb").read())
        _, _, adam = decode_png_rgb8(open(pb, "rb").read())
        assert (seq == adam).all(), (w, h)
        want = np.array(
            [[_png_pixel(4)(x, y) for x in range(w)] for y in range(h)],
            dtype=np.uint8,
        )
        assert (adam == want).all(), (w, h)


def test_png_interlaced_trailing_bytes_detected(tmp_path):
    """An interlaced stream with leftover bytes after the last pass
    (a pass-geometry bug) must raise, not silently succeed."""
    import struct
    import zlib

    import pytest as _pytest

    from spark_streaming_test_spark.llm.multimodal import (
        _png_pixel,
        decode_png_rgb8,
        write_png_rgb8,
    )

    p = str(tmp_path / "t.png")
    write_png_rgb8(p, 9, 7, _png_pixel(2), interlace=1)
    buf = bytearray(open(p, "rb").read())
    # rebuild with one junk byte appended inside the deflate stream
    # (cheap route: decode IDAT, append, re-deflate, re-chunk)
    import binascii

    off, idat, chunks = 8, bytearray(), []
    while off + 12 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        ctype = bytes(buf[off + 4 : off + 8])
        data = bytes(buf[off + 8 : off + 8 + ln])
        chunks.append((ctype, data))
        if ctype == b"IDAT":
            idat += data
        off += 12 + ln
    bad_stream = zlib.decompress(bytes(idat)) + b"\x00"
    comp = zlib.compress(bad_stream, 6)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n" + b"".join(
        chunk(t, d) for t, d in chunks if t not in (b"IDAT", b"IEND")
    ) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="trailing|filter|short"):
        decode_png_rgb8(out)


# --- TIFF ----------------------------------------------------------------------


def test_tiff_error_paths_and_packbits_vectors():
    import pytest as _pytest

    from spark_streaming_test_spark.sources import tiff_file as T

    # spec example vector (TIFF 6.0 §9): mixed literal + repeat runs
    enc = bytes.fromhex("fe aa 02 80 00 2a fd aa 03 80 00 2a 22 f7 aa".replace(" ", ""))
    dec = T.packbits_decode(enc, 24)
    assert dec == bytes.fromhex(
        "aa aa aa 80 00 2a aa aa aa aa 80 00 2a 22 aa aa aa aa aa aa aa aa aa aa".replace(" ", "")
    )
    with _pytest.raises(ValueError, match="byte-order"):
        list(T.parse_tiff(b"XX\x2a\x00"))
    with _pytest.raises(ValueError, match="magic"):
        list(T.parse_tiff(b"II\x2b\x00\x08\x00\x00\x00"))


def test_tiff_multipage_both_endians_agree(tmp_path):
    """Identical pixels written LE and BE decode to identical bytes."""
    from spark_streaming_test_spark.sources import tiff_file as T

    pages = [(9, 7, 1, T._tiff_px_gray(0, 0)), (10, 8, 3, T._tiff_px_rgb(0, 1))]
    a, b = str(tmp_path / "le.tif"), str(tmp_path / "be.tif")
    T.write_tiff(a, pages, big_endian=False)
    T.write_tiff(b, pages, big_endian=True)
    pa = [pg["pixels"] for pg in T.parse_tiff(open(a, "rb").read())]
    pb = [pg["pixels"] for pg in T.parse_tiff(open(b, "rb").read())]
    assert pa == pb and len(pa) == 2


def test_tiff_circular_ifd_detected(tmp_path):
    import struct as _s

    import pytest as _pytest

    from spark_streaming_test_spark.sources import tiff_file as T

    p = str(tmp_path / "c.tif")
    T.write_tiff(p, [(4, 3, 1, T._tiff_px_gray(1, 0))])
    buf = bytearray(open(p, "rb").read())
    (ifd0,) = _s.unpack_from("<I", buf, 4)
    buf[-4:] = _s.pack("<I", ifd0)  # last IFD points back at itself
    with _pytest.raises(ValueError, match="circular"):
        list(T.parse_tiff(bytes(buf)))


# --- tokenized binary export ----------------------------------------------------


def test_tokenized_bin_shards_memmap_roundtrip(spark, tmp_path):
    """Materialize actual .bin/.idx shards from the export plan, then
    slice every document back out with numpy memory-maps: the byte
    offsets computed by the window must land exactly on each doc's
    token run, and the packed uint16 bytes must hash to ids_md5."""
    import hashlib
    import struct

    import numpy as np

    from spark_streaming_test_spark import registry
    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.llm.export_bin import (
        N_SHARDS,
        token_ids,
    )
    import pyspark.sql.functions as F

    plan = {
        r["doc_id"]: r
        for r in registry.queries()["export_tokenized_bin"](
            spark, SF_DIR
        ).collect()
    }
    docs = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", token_ids(F.col("text")).alias("ids"))
        .collect()
    )
    ids_by_doc = {r["doc_id"]: r["ids"] for r in docs}
    # write shards in idx_pos order (what a real exporter does per task)
    shards: dict[int, list] = {s: [] for s in range(N_SHARDS)}
    for doc_id, row in plan.items():
        shards[row["shard_id"]].append((row["idx_pos"], doc_id, row))
    for s, entries in shards.items():
        entries.sort()
        binf = tmp_path / f"shard_{s}.bin"
        idxf = tmp_path / f"shard_{s}.idx"
        with open(binf, "wb") as bf, open(idxf, "wb") as xf:
            for _pos, doc_id, row in entries:
                arr = np.asarray(ids_by_doc[doc_id], dtype="<u2")
                assert bf.tell() == row["byte_offset"], (s, doc_id)
                bf.write(arr.tobytes())
                xf.write(struct.pack("<qqq", doc_id, row["byte_offset"],
                                     row["byte_len"]))
        # memmap slice-back: every doc recoverable in O(1) by offset
        mm = np.memmap(binf, dtype="<u2", mode="r")
        for _pos, doc_id, row in entries:
            lo = row["byte_offset"] // 2
            n = row["byte_len"] // 2
            got = mm[lo : lo + n]
            assert list(got) == list(ids_by_doc[doc_id]), doc_id
            joined = ",".join(str(int(v)) for v in got)
            assert hashlib.md5(joined.encode()).hexdigest() == row["ids_md5"]


def test_token_ids_fit_uint16():
    from spark_streaming_test_spark.llm.export_bin import VOCAB

    assert VOCAB <= 0xFFFF + 1


def test_warc_zst_dir_stream_exactly_once(spark, tmp_path):
    """warc_zst_dir streaming source: compressed crawl segments land in
    two waves; each record is consumed exactly once across
    micro-batches (the warc_dir contract under zstd frames, with
    decompression executor-side)."""
    import os

    from spark_streaming_test_spark.sources.warc import (
        register_warc_source,
        write_warc_zst,
    )

    register_warc_source(spark)
    src = str(tmp_path / "segs")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "got")
    os.makedirs(src)

    def land(name, recs):
        write_warc_zst(os.path.join(src, name), recs)

    land("seg_000.warc.zst",
         [("response", "<urn:z0>", "http://a.test/0", b"aa bb " * 50)])
    q = (
        spark.readStream.format("warc_zst_dir")
        .option("path", src)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        land(
            "seg_001.warc.zst",
            [
                ("response", "<urn:z1>", "http://b.test/1", b"cc dd ee"),
                ("request", "<urn:z2>", "http://b.test/1", b""),
            ],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # idle trigger must not re-read
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["record_id"] for r in rows)
    assert ids == ["<urn:z0>", "<urn:z1>", "<urn:z2>"]
    by_id = {r["record_id"]: r for r in rows}
    assert bytes(by_id["<urn:z1>"]["payload"]) == b"cc dd ee"
    assert by_id["<urn:z0>"]["content_length"] == 300


# --- MP3 / ID3v2 ----------------------------------------------------------------


def test_mp3_id3_roundtrip_and_error_paths(tmp_path):
    import pytest as _pytest

    from spark_streaming_test_spark.sources import mp3_id3 as M

    p = str(tmp_path / "t.mp3")
    M.write_mp3(p, [("TIT2", "héllo"), ("TALB", "ångström")],
                [(9, 0, 0, 1), (5, 0, 1, 2), (14, 0, 0, 3)])
    buf = open(p, "rb").read()
    tags, frames = M.parse_mp3(buf)
    assert tags == {"TIT2": "héllo", "TALB": "ångström"}  # UTF-8 decode
    assert [fr["bitrate_kbps"] for fr in frames] == [128, 64, 320]
    # padding adds exactly one byte
    assert frames[1]["bytes"] == 144 * 64000 // 44100 + 1
    # torn final frame drops
    _, fr2 = M.parse_mp3(buf[:-1])
    assert len(fr2) == 2
    # junk between tag and first sync: hard error, not silent resync
    tag = M.build_id3v2([("TIT2", "x")])
    with _pytest.raises(ValueError, match="sync"):
        M.parse_mp3(tag + b"\x00\x01\x02\x03" + buf[len(tag):])
    # free-format / invalid bitrate index rejected
    import struct as _s

    bad = _s.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) | (0 << 12) | (0 << 10))
    with _pytest.raises(ValueError, match="bitrate"):
        M.parse_mp3(bad + b"\x00" * 100)


def test_id3v2_syncsafe_roundtrip():
    from spark_streaming_test_spark.sources.mp3_id3 import (
        _read_syncsafe,
        _syncsafe,
    )

    for n in (0, 1, 127, 128, 0x3FFF, 0x4000, (1 << 28) - 1):
        assert _read_syncsafe(_syncsafe(n)) == n


# --- WebM / EBML ---------------------------------------------------------------


def test_webm_unknown_elements_skipped_and_errors(tmp_path):
    """EBML forward compat: an unknown element injected into Tracks is
    skipped by size; unknown-size elements and wrong doctypes raise."""
    import pytest as _pytest

    from spark_streaming_test_spark.sources import webm_ebml as W

    p = str(tmp_path / "v.webm")
    W.write_webm(p, "V_VP8", 64, 48, W._webm_clusters(0), duration_ms=320.0)
    buf = open(p, "rb").read()
    # inject an unknown element (ID 0xBF = CRC-32, valid anywhere) at
    # the head of the Segment payload
    eid, s0, s1, _ = W.read_element(buf, 0)  # EBML header
    seg_id, g0, g1, _ = W.read_element(buf, s1)
    unknown = W.element(0xBF, b"\xde\xad\xbe\xef")
    patched = (
        buf[:s1]
        + W._id_bytes(W.SEGMENT)
        + W.encode_vint_size((g1 - g0) + len(unknown))
        + unknown
        + buf[g0:g1]
    )
    m = W.parse_webm(patched)
    assert (m["width"], m["height"], m["n_blocks"]) == (64, 48, 8)
    # unknown-size element: all-ones size vint must raise
    bad = buf[:s1] + W._id_bytes(W.SEGMENT) + b"\xff" + buf[g0:g1]
    with _pytest.raises(ValueError, match="unknown-size"):
        W.parse_webm(bad)
    # doctype gate
    with _pytest.raises(ValueError, match="doctype"):
        W.parse_webm(
            W.element(W.EBML_HEADER, W.element(W.DOCTYPE, b"avi"))
            + buf[s1:]
        )


def test_ebml_vint_widths():
    from spark_streaming_test_spark.sources.webm_ebml import (
        _read_vint,
        encode_vint_size,
    )

    assert encode_vint_size(0) == b"\x80"
    assert encode_vint_size(126) == b"\xfe"
    assert encode_vint_size(127) == b"\x40\x7f"  # all-ones is reserved
    assert encode_vint_size(16382) == b"\x7f\xfe"
    assert encode_vint_size(16383) == b"\x20\x3f\xff"
    v, n = _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True)
    assert (v, n) == (0x1A45DFA3, 4)  # the EBML header ID, verbatim


# --- Ogg pages -----------------------------------------------------------------


def test_ogg_page_grammar_and_integrity():
    import pytest as _pytest

    from spark_streaming_test_spark.sources import ogg_pages as O

    buf = b"".join(
        O.build_page(7, p, (p + 1) * 960, O._ogg_packets(0, p),
                     bos=(p == 0), eos=(p == 2))
        for p in range(3)
    )
    st = O.parse_ogg(buf)[7]
    assert (st["n_pages"], st["n_packets"]) == (3, 6)
    assert st["bos_seen"] and st["eos_seen"]
    # exact-multiple-of-255 packet: lacing 255,255,0 (terminator 0)
    one = O.build_page(1, 0, 0, [b"x" * 510])
    assert one[26] == 3 and list(one[27:30]) == [255, 255, 0]
    assert O.parse_ogg(one)[1]["n_packets"] == 1
    # unreflected CRC is verified with the field zeroed
    bad = bytearray(buf)
    bad[40] ^= 1
    with _pytest.raises(ValueError, match="CRC"):
        O.parse_ogg(bytes(bad))
    # page sequence gaps are loss, not noise
    gap = O.build_page(7, 0, 0, [b"a"], bos=True) + O.build_page(7, 2, 0, [b"b"])
    with _pytest.raises(ValueError, match="gap"):
        O.parse_ogg(gap)
    # torn final page drops
    assert O.parse_ogg(buf[:-5])[7]["n_pages"] == 2


def test_ogg_packet_reassembly_spans_pages():
    """iter_packets must rejoin a packet split across pages (trailing
    255-run, continuation flag) and reject continuation-flag abuse."""
    import pytest as _pytest

    from spark_streaming_test_spark.sources import ogg_pages as O

    big = bytes(k % 251 for k in range(700))
    pages = O.build_spanned_packet_pages(9, 0, big, 510, trailing=[b"tail"])
    got = list(O.iter_packets(b"".join(pages)))
    assert [(s, p) for s, _g, p in got] == [(9, big), (9, b"tail")]
    # first (incomplete) page carries granule -1; completion page 0
    assert [g for _s, g, _p in got] == [0, 0]
    # continuation flag without an open packet is corruption
    orphan = O.build_page(9, 0, 0, [b"a"], bos=True, continued=True)
    with _pytest.raises(ValueError, match="continues no open packet"):
        list(O.iter_packets(orphan))
    # an open packet followed by a non-continued page is loss
    drop = pages[0].replace(b"OggS", b"OggS", 1) + O.build_page(9, 1, 0, [b"b"])
    with _pytest.raises(ValueError, match="drops an open packet"):
        list(O.iter_packets(drop))


def test_ogg_codec_headers_roundtrip():
    """Vorbis id/comment and OpusHead/OpusTags encode->parse inverts,
    and malformed headers raise."""
    import pytest as _pytest

    from spark_streaming_test_spark.sources import ogg_pages as O

    m = O.parse_codec_headers(
        O.build_vorbis_id(2, 44100, 6, 9),
        O.build_vorbis_comment("vend", [("TITLE", "a b"), ("K", "v=w")]),
    )
    assert m["codec"] == "vorbis"
    assert (m["channels"], m["sample_rate"]) == (2, 44100)
    assert (m["blocksize_0"], m["blocksize_1"]) == (64, 512)
    assert m["pre_skip"] is None
    assert m["vendor"] == "vend" and m["tags"] == ["TITLE=a b", "K=v=w"]

    m = O.parse_codec_headers(
        O.build_opus_head(1, 312, 24000),
        O.build_opus_tags("opusv", [("ARTIST", "x")]),
    )
    assert m["codec"] == "opus"
    assert (m["channels"], m["sample_rate"], m["pre_skip"]) == (1, 24000, 312)
    assert m["blocksize_0"] is None and m["vendor"] == "opusv"

    bad_id = bytearray(O.build_vorbis_id(2, 44100))
    bad_id[-1] = 0  # framing bit unset
    with _pytest.raises(ValueError, match="framing"):
        O.parse_codec_headers(bytes(bad_id), O.build_vorbis_comment("v", []))
    with _pytest.raises(ValueError, match="OpusTags"):
        O.parse_codec_headers(O.build_opus_head(1, 0, 48000), b"junk")
    with _pytest.raises(ValueError, match="unrecognized"):
        O.parse_codec_headers(b"\x01theora??", b"")


def test_ogg_codec_meta_spanning_fixture():
    """File 2's comment packet must actually span two pages in the
    committed fixture (the PAD tag pushes it past 510 bytes), and
    parse_ogg_codec_meta must recover every field through the span."""
    from spark_streaming_test_spark.sources import ogg_pages as O

    d = O._ogg_codec_fixture_dir()
    buf = open(f"{d}/c_0002.ogg", "rb").read()
    pages = list(O.iter_pages(buf))
    # page 1 ends mid-packet (all-255 lacing), page 2 continues
    assert all(v == 255 for v in pages[1][4]) and pages[1][1] == -1
    assert pages[2][0] & 1  # continuation flag
    (m,) = O.parse_ogg_codec_meta(buf)
    assert m["codec"] == "vorbis" and m["channels"] == 3
    assert len(m["tags"]) == 3 and m["tags"][2].startswith("PAD=")
    assert m["last_granule"] == 2 * (1200 + 240 * 2)


def test_opus_toc_semantics():
    """RFC 6716 §3.1-3.2: config ranges map to mode/bandwidth/duration,
    frame-count codes 0-3 count correctly, and the 120 ms cap (R5) and
    zero-frame code-3 packets raise."""
    import pytest as _pytest

    from spark_streaming_test_spark.sources import ogg_pages as O

    # config 0: SILK NB 10 ms; code 0 = one frame
    m = O.parse_opus_toc(bytes([0b00000000]) + b"x")
    assert (m["mode"], m["bandwidth"], m["frame_tenths_ms"]) == ("silk", "NB", 100)
    assert m["n_frames"] == 1 and not m["stereo"]
    # config 14: hybrid FB 10 ms; code 1 = two equal frames, stereo
    m = O.parse_opus_toc(bytes([(14 << 3) | (1 << 2) | 1]))
    assert (m["mode"], m["bandwidth"]) == ("hybrid", "FB")
    assert m["n_frames"] == 2 and m["stereo"]
    # config 16: CELT NB 2.5 ms; code 3 with M=48 -> 120 ms exactly (legal)
    m = O.parse_opus_toc(bytes([(16 << 3) | 3, 48]))
    assert (m["mode"], m["frame_tenths_ms"], m["n_frames"]) == ("celt", 25, 48)
    # config 31: CELT FB 20 ms; code 3 with M=7 -> 140 ms violates R5
    with _pytest.raises(ValueError, match="120 ms"):
        O.parse_opus_toc(bytes([(31 << 3) | 3, 7]))
    with _pytest.raises(ValueError, match="zero frames"):
        O.parse_opus_toc(bytes([(0 << 3) | 3, 0]))
    with _pytest.raises(ValueError, match="count byte"):
        O.parse_opus_toc(bytes([(0 << 3) | 3]))
    # full config sweep stays in-table and positive
    for cfg in range(32):
        m = O.parse_opus_toc(bytes([cfg << 3]) + b"p")
        assert m["mode"] in ("silk", "hybrid", "celt")
        assert m["bandwidth"] in ("NB", "MB", "WB", "SWB", "FB")
        assert m["frame_tenths_ms"] in (25, 50, 100, 200, 400, 600)


def test_opus_toc_fixture_skips_vorbis_and_headers():
    """parse_opus_packet_stats must emit only Opus AUDIO packets: both
    header packets skipped, Vorbis files produce nothing."""
    from spark_streaming_test_spark.sources import ogg_pages as O

    d = O._ogg_codec_fixture_dir()
    for f in range(O.OGG_CODEC_FILES):
        stats = O.parse_opus_packet_stats(
            open(f"{d}/c_{f:04d}.ogg", "rb").read()
        )
        if f % 2 == 0:
            assert stats == []
        else:
            assert [m["packet_idx"] for m in stats] == [0, 1, 2, 3]
            assert [m["n_frames"] for m in stats] == [1, 2, 1, 3]


def test_vorbis_audio_packet_semantics():
    """Vorbis I §4.3.1 preamble, LSB-first: type flag routes
    audio/not-audio, the 1-bit mode picks short/long blocksize from
    the id-header exponents, window flags only exist on long blocks,
    and truncated comment blocks raise the ValueError convention."""
    import pytest as _pytest

    from spark_streaming_test_spark.sources import ogg_pages as O

    # even byte, mode bit 0 -> short block, no window flags
    m = O.parse_vorbis_audio_packet(bytes([0b00000000, 7]), 256, 2048)
    assert m["is_audio"] and m["mode"] == 0 and m["blocksize"] == 256
    assert m["prev_window_flag"] is None and m["next_window_flag"] is None
    # mode bit 1 -> long block; bits 2/3 are the window flags
    m = O.parse_vorbis_audio_packet(bytes([0b00000110]), 256, 2048)
    assert m["mode"] == 1 and m["blocksize"] == 2048
    assert m["prev_window_flag"] is True and m["next_window_flag"] is False
    m = O.parse_vorbis_audio_packet(bytes([0b00001010]), 64, 512)
    assert m["blocksize"] == 512
    assert m["prev_window_flag"] is False and m["next_window_flag"] is True
    # type flag set -> not an audio packet, everything else null
    m = O.parse_vorbis_audio_packet(bytes([0b00000001]), 256, 2048)
    assert m["is_audio"] is False and m["mode"] is None
    with _pytest.raises(ValueError, match="empty"):
        O.parse_vorbis_audio_packet(b"", 256, 2048)
    # ilog: the §9.2.1 table rows
    assert [O.ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]
    # truncated comment blocks raise ValueError (module convention)
    with _pytest.raises(ValueError, match="vorbis: comment"):
        O.parse_codec_headers(
            O.build_vorbis_id(2, 44100),
            b"\x03vorbis" + b"\x40\x00\x00\x00",  # vendor len 64, no bytes
        )
    with _pytest.raises(ValueError, match="opus: comment"):
        O.parse_codec_headers(
            O.build_opus_head(1, 0, 48000),
            b"OpusTags\x00\x00\x00\x00\x02\x00\x00\x00",  # 2 tags, none
        )
    with _pytest.raises(ValueError, match="shorter than 30"):
        O.parse_codec_headers(b"\x01vorbis", b"")
    with _pytest.raises(ValueError, match="shorter than 19"):
        O.parse_codec_headers(b"OpusHead\x01", b"OpusTags")


def test_vorbis_packet_stats_fixture_census():
    """parse_vorbis_packet_stats over the committed fixture: Opus
    files produce nothing; Vorbis files yield one row per audio
    packet with framing validated, and the mode/flag census matches
    the closed-form byte-0 arithmetic of the fixture builder."""
    from spark_streaming_test_spark.sources import ogg_pages as O

    d = O._ogg_codec_fixture_dir()
    for f in range(O.OGG_CODEC_FILES):
        stats = O.parse_vorbis_packet_stats(
            open(f"{d}/c_{f:04d}.ogg", "rb").read()
        )
        if f % 2 == 1:
            assert stats == []
            continue
        assert [m["packet_idx"] for m in stats] == [0, 1, 2, 3]
        assert all(m["framing_ok"] for m in stats)
        for m in stats:
            i, j = divmod(m["packet_idx"], O.OGG_PACKETS_PER_PAGE)
            b0 = (f * 11 + i * 5 + j * 3) % 251
            assert m["is_audio"] == (b0 % 2 == 0)
            assert m["n_bytes"] == 60 + 10 * i + j
            assert m["granule"] == (i + 1) * (1200 + 240 * f)
            if m["is_audio"]:
                assert m["mode"] == (b0 >> 1) & 1
