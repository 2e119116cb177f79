"""PDF reader (sources/pdf_text.py): structural-integrity checks and
grammar corners the oracle can't express — xref lies, stream-length
lies, incremental updates (/Prev chains where the NEWEST entry must
win), escape/hex string decoding, and TJ concatenation."""

from __future__ import annotations

import re
import zlib

import pytest

from spark_streaming_test_spark.sources import pdf_text as P


def _fixture_bytes(tmp_path, f=0, nested=False):
    pages = [
        [P._pdf_line(f, p, i) for i in range(P.PDF_LINES)]
        for p in range(P._pdf_n_pages(f))
    ]
    path = str(tmp_path / "t.pdf")
    P.write_pdf(path, pages, nested_tree=nested)
    return open(path, "rb").read(), pages


def test_xref_offset_lie_detected(tmp_path):
    buf, _ = _fixture_bytes(tmp_path)
    m = re.search(rb"xref\n0 \d+\n", buf)
    table = bytearray(buf)
    # corrupt object 1's offset entry (first 'n' row after the free row)
    row = m.end() + 20
    table[row : row + 10] = b"0000000003"
    doc = P.PdfDocument(bytes(table))
    with pytest.raises(ValueError, match="offset for object 1"):
        doc.obj(("ref", 1, 0))


def test_stream_length_lie_detected(tmp_path):
    buf, _ = _fixture_bytes(tmp_path)
    # flip the first digit of the first /Length IN PLACE (same width,
    # so every other xref offset stays valid)
    m = re.search(rb"/Length (\d)", buf)
    d = m.group(1)
    wrong = b"9" if d != b"9" else b"8"
    bad = buf[: m.start(1)] + wrong + buf[m.end(1) :]
    with pytest.raises(ValueError, match="Length is wrong"):
        list(P.parse_pdf_text("x", bad))


def test_incremental_update_prev_chain(tmp_path):
    """Append an incremental update that REPLACES page 0's content
    stream (object 5): a new object + new xref with /Prev. The reader
    must take the newest xref entry for object 5 and the original
    entries for everything else — the spec's update semantics."""
    buf, pages = _fixture_bytes(tmp_path)
    new_ops = b"BT /F1 12 Tf 72 720 Td (updated!) Tj ET"
    data = zlib.compress(new_ops, 6)
    old_xref = int(re.search(rb"startxref\s+(\d+)", buf).group(1))
    add = bytearray(buf)
    new_obj_off = len(add)
    add += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
        + data
        + b"\nendstream\nendobj\n"
    )
    new_xref = len(add)
    add += b"xref\n0 1\n0000000000 65535 f \n"
    add += b"5 1\n" + b"%010d 00000 n \n" % new_obj_off
    add += (
        b"trailer\n<< /Size 11 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, new_xref)
    )
    runs = list(P.parse_pdf_text("x", bytes(add)))
    page0 = [t for _, p, _, t in runs if p == 0]
    assert page0 == ["updated!"]
    page1 = [t for _, p, _, t in runs if p == 1]
    assert page1 == pages[1]  # untouched objects resolve via /Prev


def test_string_escapes_and_hex_strings():
    lex = P._PdfLexer(rb"(a\(b\)c\\d\101\12e)")
    assert lex.value() == b"a(b)c\\dA\ne"
    lex = P._PdfLexer(b"<48656C6C6F2>")  # odd digit count pads with 0
    assert lex.value() == b"Hello "
    lex = P._PdfLexer(b"(nested (parens) survive)")
    assert lex.value() == b"nested (parens) survive"


def test_tj_concatenation_drops_kerning(tmp_path):
    buf, pages = _fixture_bytes(tmp_path, f=1, nested=True)
    runs = list(P.parse_pdf_text("x", buf))
    # odd lines were written as split TJ arrays; extraction must equal
    # the original full lines anyway
    assert [t for _, p, _, t in runs if p == 0] == pages[0]
    assert len({p for _, p, _, t in runs}) == len(pages)  # nested tree walked


def test_circular_prev_chain_rejected(tmp_path):
    buf, _ = _fixture_bytes(tmp_path)
    xref_pos = int(re.search(rb"startxref\s+(\d+)", buf).group(1))
    bad = buf.replace(
        b"trailer\n<< /Size",
        b"trailer\n<< /Prev %d /Size" % xref_pos,
        1,
    )
    with pytest.raises(ValueError, match="circular"):
        P.PdfDocument(bad)
