"""PDF text extraction (ISO 32000-1 subset) — pure stdlib.

Document corpora ship as PDF; a training-data pipeline's first PDF
step is text extraction, which needs the document's STRUCTURAL layer,
not rendering:

  * the cross-reference table (``xref`` sections + trailer,
    ``/Prev`` chains for incrementally-updated files) resolved from
    ``startxref`` at the tail — random access by object id, the
    property that makes huge PDFs seekable;
  * the object grammar: dictionaries, arrays, names, numbers,
    literal strings with escape sequences (``\\(``, ``\\)``,
    ``\\\\``, octal), hex strings, and indirect references
    ``n g R``;
  * streams (``/Length`` + FlateDecode via stdlib zlib);
  * the page tree: ``/Root -> /Pages -> /Kids`` with NESTED Pages
    nodes (a fixture exercises a two-level tree) and per-page
    ``/Contents`` as a single ref or an array of refs;
  * content-stream text operators: ``BT``/``ET`` blocks, ``(s) Tj``
    and ``[(a) -120 (b)] TJ`` show operators (kerning numbers
    skipped, segments concatenated per the spec's TJ semantics).

Rendering (fonts, glyph metrics, layout reconstruction) is out of
scope — the honest boundary: text runs are extracted in content-
stream order, the order a text pipeline consumes.

Fixture PDFs are written by a spec-conformant mini-writer (exact xref
offsets, FlateDecode content, escaped strings), so any standard PDF
reader opens them; the oracle recomputes every text run from the
fixture's closed form.
"""

from __future__ import annotations

import os
import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

# --- mini writer -------------------------------------------------------------


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf(path: str, pages: list[list[str]], nested_tree: bool = False) -> None:
    """Write a PDF 1.4 file: one FlateDecode content stream per page,
    Helvetica text lines via Tj (even lines) and a kerned TJ array
    (odd lines, split mid-line — the reader must concatenate).
    ``nested_tree`` inserts an intermediate Pages node so readers must
    recurse."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_id = 3
    first_page = 4
    kids_root: list[int] = []
    # page + content objects
    for p, lines in enumerate(pages):
        page_id = first_page + 2 * p
        content_id = page_id + 1
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append("0 -14 Td")
            if i % 2 == 0:
                ops.append(f"({_esc(line)}) Tj")
            else:
                mid = len(line) // 2
                ops.append(
                    f"[({_esc(line[:mid])}) -120 ({_esc(line[mid:])})] TJ"
                )
        ops.append("ET")
        data = zlib.compress("\n".join(ops).encode("latin-1"), 6)
        objs[content_id] = (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )
        kids_root.append(page_id)
    pages_id = 2
    if nested_tree and n_pages >= 2:
        # intermediate node holding all but the first page
        inner_id = first_page + 2 * n_pages
        inner_kids = " ".join(f"{k} 0 R" for k in kids_root[1:])
        objs[inner_id] = (
            f"<< /Type /Pages /Parent {pages_id} 0 R /Kids [{inner_kids}] "
            f"/Count {n_pages - 1} >>"
        ).encode()
        for p, page_id in enumerate(kids_root):
            parent = pages_id if p == 0 else inner_id
            objs[page_id] = (
                f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
                f"/Contents {page_id + 1} 0 R >>"
            ).encode()
        root_kids = f"{kids_root[0]} 0 R {inner_id} 0 R"
    else:
        for p, page_id in enumerate(kids_root):
            contents = (
                f"[{page_id + 1} 0 R]" if p == 0 else f"{page_id + 1} 0 R"
            )  # page 0 uses the ARRAY form of /Contents
            objs[page_id] = (
                f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
                f"/Contents {contents} >>"
            ).encode()
        root_kids = " ".join(f"{k} 0 R" for k in kids_root)
    objs[1] = f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode()
    objs[pages_id] = (
        f"<< /Type /Pages /Kids [{root_kids}] /Count {n_pages} >>"
    ).encode()
    objs[font_id] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_pos = len(out)
    max_id = max(objs)
    out += f"xref\n0 {max_id + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, max_id + 1):
        if oid in offsets:
            out += f"{offsets[oid]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {max_id + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


# --- object-grammar parser ---------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _PdfLexer:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = self.buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and buf[self.pos] not in (10, 13):
                    self.pos += 1
            else:
                return

    def value(self):
        """Parse one object value at the cursor."""
        self._skip_ws()
        buf = self.buf
        c = buf[self.pos]
        if buf.startswith(b"<<", self.pos):
            return self._dict()
        if c == 0x3C:  # <hex>
            end = buf.index(b">", self.pos)
            hx = re.sub(rb"\s", b"", buf[self.pos + 1 : end])
            if len(hx) % 2:
                hx += b"0"
            self.pos = end + 1
            return bytes.fromhex(hx.decode("ascii"))
        if c == 0x28:  # (literal string)
            return self._string()
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while (
                self.pos < len(buf)
                and buf[self.pos] not in _WS
                and buf[self.pos] not in _DELIM
            ):
                self.pos += 1
            return "/" + buf[start : self.pos].decode("latin-1")
        if c == 0x5B:  # [ array ]
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if buf[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.value())
        # number, reference, or keyword
        start = self.pos
        while (
            self.pos < len(buf)
            and buf[self.pos] not in _WS
            and buf[self.pos] not in _DELIM
        ):
            self.pos += 1
        tok = buf[start : self.pos]
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        # reference lookahead: "<int> <int> R"
        if re.fullmatch(rb"[+-]?\d+", tok):
            save = self.pos
            self._skip_ws()
            m = re.match(rb"(\d+)\s+R(?![A-Za-z])", buf[self.pos : self.pos + 32])
            if m:
                self.pos += m.end()
                return ("ref", int(tok), int(m.group(1)))
            self.pos = save
            return int(tok)
        try:
            return float(tok)
        except ValueError:
            return ("kw", tok.decode("latin-1"))

    def _dict(self):
        self.pos += 2
        d: dict = {}
        while True:
            self._skip_ws()
            if self.buf.startswith(b">>", self.pos):
                self.pos += 2
                return d
            key = self.value()
            d[key] = self.value()

    def _string(self) -> bytes:
        buf = self.buf
        self.pos += 1
        out = bytearray()
        depth = 1
        while depth:
            c = buf[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash escape
                e = buf[self.pos]
                self.pos += 1
                mapped = {
                    0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                    0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = chr(e)
                    for _ in range(2):
                        if 0x30 <= buf[self.pos] <= 0x37:
                            oct_digits += chr(buf[self.pos])
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_digits, 8) & 0xFF)
                # \<newline> = line continuation: emit nothing
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth:
                    out.append(c)
            else:
                out.append(c)
        return bytes(out)


class PdfDocument:
    """Random-access reader over one PDF byte buffer: xref-resolved
    object fetch, stream decode, page-tree walk, text extraction."""

    def __init__(self, buf: bytes):
        self.buf = buf
        if not buf.startswith(b"%PDF-"):
            raise ValueError("pdf: bad header")
        self.version = buf[5:8].decode("latin-1")
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._load_xref()

    def _load_xref(self) -> None:
        # the LAST startxref governs (incremental updates append new
        # ones; the newest trailer chains back via /Prev)
        idx = self.buf.rfind(b"startxref")
        m = (
            re.match(rb"startxref\s+(\d+)\s+%%EOF", self.buf[idx:])
            if idx >= 0
            else None
        )
        if not m:
            raise ValueError("pdf: startxref not found")
        pos = int(m.group(1))
        seen = set()
        while True:
            if pos in seen:
                raise ValueError("pdf: circular /Prev xref chain")
            seen.add(pos)
            if not self.buf.startswith(b"xref", pos):
                raise ValueError(f"pdf: xref keyword missing at {pos}")
            lex = _PdfLexer(self.buf, pos + 4)
            while True:
                lex._skip_ws()
                if self.buf.startswith(b"trailer", lex.pos):
                    lex.pos += 7
                    trailer = lex.value()
                    break
                first = lex.value()
                count = lex.value()
                lex._skip_ws()
                for i in range(count):
                    entry = self.buf[lex.pos : lex.pos + 20]
                    off = int(entry[0:10])
                    kind = entry[17:18]
                    oid = first + i
                    if kind == b"n" and oid not in self.xref:
                        self.xref[oid] = off
                    lex.pos += 20
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "/Prev" in trailer:
                pos = trailer["/Prev"]
            else:
                return

    def obj(self, ref):
        """Resolve an indirect reference (or pass a direct value through)."""
        if not (isinstance(ref, tuple) and ref and ref[0] == "ref"):
            return ref
        oid = ref[1]
        off = self.xref.get(oid)
        if off is None:
            raise ValueError(f"pdf: object {oid} not in xref")
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.buf[off : off + 32])
        if not m or int(m.group(1)) != oid:
            raise ValueError(f"pdf: xref offset for object {oid} is wrong")
        lex = _PdfLexer(self.buf, off + m.end())
        val = lex.value()
        lex._skip_ws()
        if self.buf.startswith(b"stream", lex.pos):
            p = lex.pos + 6
            if self.buf[p : p + 2] == b"\r\n":
                p += 2
            elif self.buf[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = self.obj(val["/Length"])
            data = self.buf[p : p + length]
            end = p + length
            if b"endstream" not in self.buf[end : end + 32]:
                raise ValueError(f"pdf: stream {oid} /Length is wrong")
            if val.get("/Filter") == "/FlateDecode":
                data = zlib.decompress(data)
            elif "/Filter" in val:
                raise ValueError(f"pdf: filter {val['/Filter']} unsupported")
            return (val, data)
        return val

    def pages(self) -> list[dict]:
        """Walk /Root -> /Pages -> /Kids recursively, depth-first —
        the spec's page order."""
        root = self.obj(self.trailer["/Root"])
        out: list[dict] = []

        def walk(node_ref):
            node = self.obj(node_ref)
            t = node.get("/Type")
            if t == "/Pages":
                for kid in node["/Kids"]:
                    walk(kid)
            elif t == "/Page":
                out.append(node)
            else:
                raise ValueError(f"pdf: unexpected page-tree node {t}")

        walk(root["/Pages"])
        return out

    def page_text_ops(self, page: dict) -> list[str]:
        """Text runs of one page in content order: Tj strings and TJ
        arrays (segments concatenated, kerning numbers dropped)."""
        contents = self.obj(page["/Contents"])
        if isinstance(contents, list):
            data = b"".join(self.obj(c)[1] for c in contents)
        else:
            data = contents[1]
        lex = _PdfLexer(data)
        runs: list[str] = []
        stack: list = []
        n = len(data)
        while True:
            lex._skip_ws()
            if lex.pos >= n:
                break
            v = lex.value()
            if isinstance(v, tuple) and v and v[0] == "kw":
                op = v[1]
                if op == "Tj" and stack:
                    runs.append(stack[-1].decode("latin-1"))
                elif op == "TJ" and stack:
                    arr = stack[-1]
                    runs.append(
                        "".join(
                            seg.decode("latin-1")
                            for seg in arr
                            if isinstance(seg, bytes)
                        )
                    )
                stack.clear()
            else:
                stack.append(v)
        return runs


def parse_pdf_text(path: str, buf: bytes):
    """Yield (path, page_idx, run_idx, text) for every text run."""
    doc = PdfDocument(buf)
    for p, page in enumerate(doc.pages()):
        for i, run in enumerate(doc.page_text_ops(page)):
            yield (path, p, i, run)


# --- fixtures + queries ------------------------------------------------------

PDF_FILES = 4
PDF_LINES = 5


def _pdf_line(f: int, p: int, i: int) -> str:
    # parentheses + backslash force the string-escape path in BOTH
    # writer and parser on every line
    return f"doc{f} page{p} line{i}: (w{(f * 7 + p * 3 + i) % 13}\\)"


def _pdf_n_pages(f: int) -> int:
    return 2 + f % 2


def _pdf_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_pdf_line, _pdf_n_pages, write_pdf, PDF_FILES, PDF_LINES)
    d = os.path.join(SCRATCH, f"pdf_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(PDF_FILES):
            pages = [
                [_pdf_line(f, p, i) for i in range(PDF_LINES)]
                for p in range(_pdf_n_pages(f))
            ]
            write_pdf(
                os.path.join(d, f"doc_{f:04d}.pdf"),
                pages,
                nested_tree=(f % 2 == 1),  # odd files: two-level page tree
            )
        open(os.path.join(d, "_DONE"), "w").close()
    return d


_SQL_PDF = f"""
runs AS (
  SELECT f.f, p.p, i.i,
         'doc' || f.f || ' page' || p.p || ' line' || i.i || ': (w'
           || CAST((f.f * 7 + p.p * 3 + i.i) % 13 AS VARCHAR) || '\\)'
           AS text
  FROM range({PDF_FILES}) f(f),
       LATERAL unnest(range(0, 2 + f.f % 2)) AS p(p),
       LATERAL unnest(range(0, {PDF_LINES})) AS i(i)
)
"""


@register(
    "scan_pdf_text",
    tags=("source", "pdf", "binary", "llm"),
    oracle=f"""
WITH {_SQL_PDF}
SELECT CAST(f AS INTEGER) AS file_id, CAST(p AS INTEGER) AS page_idx,
       CAST(i AS INTEGER) AS run_idx, text,
       CAST(length(text) AS INTEGER) AS text_len
FROM runs
""",
)
def scan_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract every text run from real PDF files: xref-resolved object
    fetch, FlateDecode content streams, recursive page-tree walk (odd
    fixtures nest an intermediate /Pages node), /Contents in both
    single-ref and array form, Tj AND kerned-TJ show operators, and
    literal-string escapes (every fixture line embeds ``(``/``\\)``).
    The oracle recomputes each run from the fixture's closed form —
    the parser must reassemble the exact characters through the
    escape/deflate/kerning layers.

    Scale: one parse task per document via binaryFile; the xref table
    is why this stays random-access on multi-GB PDFs."""
    import pandas as pd  # noqa: F401

    d = _pdf_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "page_idx", "run_idx", "text"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_pdf_text(path_, bytes(content)))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.pdf"))
        .select("path", "content")
        .mapInPandas(
            _parse, "path string, page_idx int, run_idx int, text string"
        )
    )
    return df.select(
        F.regexp_extract("path", r"doc_(\d{4})\.pdf", 1)
        .cast("int")
        .alias("file_id"),
        "page_idx",
        "run_idx",
        "text",
        F.length("text").cast("int").alias("text_len"),
    )


@register(
    "scan_pdf_doc_meta",
    tags=("source", "pdf", "binary"),
    oracle=f"""
SELECT CAST(f.f AS INTEGER) AS file_id,
       '1.4' AS version,
       CAST(2 + f.f % 2 AS INTEGER) AS n_pages,
       CAST((2 + f.f % 2) * {PDF_LINES} AS BIGINT) AS n_text_runs,
       CAST(3 + 2 * (2 + f.f % 2) + CASE WHEN f.f % 2 = 1 THEN 1 ELSE 0 END
            AS INTEGER) AS n_objects
FROM range({PDF_FILES}) f(f)
""",
)
def scan_pdf_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level PDF census: version, page count from the page-tree
    walk, text-run count, and live xref object count (catalog + pages
    node + font + 2 per page + the nested node on odd files) — the
    per-document stats a corpus report aggregates before any text
    lands downstream."""
    import pandas as pd  # noqa: F401

    d = _pdf_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "version", "n_pages", "n_text_runs", "n_objects"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                doc = PdfDocument(bytes(content))
                pages = doc.pages()
                n_runs = sum(len(doc.page_text_ops(pg)) for pg in pages)
                rows.append(
                    (path_, doc.version, len(pages), n_runs, len(doc.xref))
                )
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.pdf"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, version string, n_pages int, n_text_runs bigint, "
            "n_objects int",
        )
    )
    return df.select(
        F.regexp_extract("path", r"doc_(\d{4})\.pdf", 1)
        .cast("int")
        .alias("file_id"),
        "version",
        "n_pages",
        "n_text_runs",
        "n_objects",
    )
