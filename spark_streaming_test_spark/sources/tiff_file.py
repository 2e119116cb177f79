"""TIFF 6.0 baseline reader — the scanned-document / scientific-image
container (and the structure EXIF rides in; the IFD grammar here is
the standalone-file counterpart of llm/multimodal.py's APP1 parser).

Covered baseline subset, both byte orders:

  * header (II/MM + magic 42) and chained IFDs (multi-page files —
    each page is its own IFD, the format's page tree);
  * entries with inline values (count*size <= 4, stored IN the value
    field, offset-free — the corner readers get wrong first) and
    offset values;
  * strip-based image data: StripOffsets/StripByteCounts with
    RowsPerStrip, so pixel access is per-strip (the property that
    makes 100k-row scans range-readable);
  * grayscale (8-bit, 1 sample) and RGB (8-bit, 3 samples) pixels;
  * Compression 1 (none) and 32773 (PackBits RLE — the spec's own
    compression, decoded per strip).

Tiled TIFFs, LZW/JPEG-in-TIFF, and planar configuration 2 raise with
clear messages — the honest boundary.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

T_WIDTH = 256
T_HEIGHT = 257
T_BPS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SPP = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279


# --- PackBits (TIFF 6.0 §9) ---------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Real PackBits: literal runs and repeat runs (n in -127..-1 means
    1-n copies of the next byte); 128 is a no-op never emitted."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a repeat run of >= 3 (the spec's break-even point)
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(data[i])
            i = j + 1
            continue
        # literal run until the next >=3 repeat (or 128 bytes)
        lit_start = i
        while i < n and i - lit_start < 128:
            if (
                i + 2 < n
                and data[i + 1] == data[i]
                and data[i + 2] == data[i]
            ):
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal: b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat: 257-b copies of next byte
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"tiff: PackBits strip decoded {len(out)} bytes, want {expected}"
        )
    return bytes(out)


# --- writer --------------------------------------------------------------------


def write_tiff(
    path: str,
    pages: list[tuple[int, int, int, callable]],
    big_endian: bool = False,
    compression: int = 1,
    rows_per_strip: int = 4,
) -> None:
    """Multi-page baseline TIFF: pages = [(width, height, samples,
    pixel(x, y) -> int | (r,g,b))]. Strips of ``rows_per_strip`` rows;
    Compression 1 or 32773 (PackBits). Layout per page is
    [strip data][long arrays / wide BPS][IFD]; the header pointer and
    each IFD's next-IFD pointer are patched once positions are known."""
    e = ">" if big_endian else "<"

    def build_page(base: int, w: int, h: int, spp: int, pixel):
        """Page blob at absolute offset ``base`` -> (bytes, ifd_pos).
        The blob's LAST 4 bytes are the next-IFD pointer (zeroed)."""
        strips: list[bytes] = []
        for y0 in range(0, h, rows_per_strip):
            rows = bytearray()
            for y in range(y0, min(y0 + rows_per_strip, h)):
                for x in range(w):
                    v = pixel(x, y)
                    rows += bytes(v) if spp == 3 else bytes([v])
            strips.append(
                packbits_encode(bytes(rows))
                if compression == 32773
                else bytes(rows)
            )
        strip_offsets: list[int] = []
        off = base
        for srt in strips:
            strip_offsets.append(off)
            off += len(srt)
        extra = bytearray()
        extra_base = off

        def arr_field(values: list[int]) -> tuple[int, int, int]:
            if len(values) == 1:
                return 4, 1, values[0]
            at = extra_base + len(extra)
            for v in values:
                extra.extend(struct.pack(e + "I", v))
            return 4, len(values), at

        if spp == 3:
            bps_field = (3, 3, extra_base + len(extra))
            extra.extend(struct.pack(e + "HHH", 8, 8, 8) + b"\x00\x00")
        else:
            bps_field = (3, 1, 8)
        entries = [
            (T_WIDTH, 4, 1, w),
            (T_HEIGHT, 4, 1, h),
            (T_BPS, *bps_field),
            (T_COMPRESSION, 3, 1, compression),
            (T_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1),
            (T_STRIP_OFFSETS, *arr_field(strip_offsets)),
            (T_SPP, 3, 1, spp),
            (T_ROWS_PER_STRIP, 4, 1, rows_per_strip),
            (T_STRIP_COUNTS, *arr_field([len(srt) for srt in strips])),
        ]
        ifd_pos = extra_base + len(extra)
        ifd = bytearray(struct.pack(e + "H", len(entries)))
        for tag, typ, count, value in entries:
            if typ == 3 and count == 1:
                val = struct.pack(e + "HH", value, 0)
            else:
                val = struct.pack(e + "I", value)
            ifd += struct.pack(e + "HHI", tag, typ, count) + val
        ifd += struct.pack(e + "I", 0)  # next-IFD pointer, patched later
        return b"".join(strips) + bytes(extra) + bytes(ifd), ifd_pos

    blobs: list[bytes] = []
    ifd_positions: list[int] = []
    base = 8
    for w, h, spp, pixel in pages:
        blob, ifd_pos = build_page(base, w, h, spp, pixel)
        blobs.append(blob)
        ifd_positions.append(ifd_pos)
        base += len(blob)
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_positions[0])
    for i, blob in enumerate(blobs):
        blob = bytearray(blob)
        if i + 1 < len(blobs):  # patch the next-IFD pointer
            blob[-4:] = struct.pack(e + "I", ifd_positions[i + 1])
        out += blob
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


# --- reader --------------------------------------------------------------------


def _read_entry_values(buf: bytes, e: str, typ: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise ValueError(f"tiff: unsupported entry type {typ}")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(e + "I", raw)
        data = buf[off : off + total]
        if len(data) < total:
            raise ValueError("tiff: entry value runs past end of file")
    if typ == 3:
        return list(struct.unpack(e + f"{count}H", data))
    if typ in (1, 4):
        fmt = "B" if typ == 1 else "I"
        return list(struct.unpack(e + f"{count}{fmt}", data))
    return [data]


def parse_tiff(buf: bytes):
    """Yield one dict per page (IFD): geometry + decoded pixel bytes
    (row-major, interleaved samples)."""
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    (magic,) = struct.unpack_from(e + "H", buf, 2)
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("tiff: circular IFD chain")
        seen.add(ifd_off)
        (n_entries,) = struct.unpack_from(e + "H", buf, ifd_off)
        tags: dict[int, list] = {}
        pos = ifd_off + 2
        for _ in range(n_entries):
            tag, typ, count = struct.unpack_from(e + "HHI", buf, pos)
            raw = buf[pos + 8 : pos + 12]
            tags[tag] = _read_entry_values(buf, e, typ, count, raw)
            pos += 12
        (ifd_off,) = struct.unpack_from(e + "I", buf, pos)
        w = tags[T_WIDTH][0]
        h = tags[T_HEIGHT][0]
        spp = tags.get(T_SPP, [1])[0]
        comp = tags.get(T_COMPRESSION, [1])[0]
        bps = tags.get(T_BPS, [8])
        if any(b != 8 for b in bps):
            raise ValueError(f"tiff: only 8-bit samples supported, got {bps}")
        if comp not in (1, 32773):
            raise ValueError(
                f"tiff: compression {comp} unsupported (none/PackBits only)"
            )
        if 322 in tags or 323 in tags:
            raise ValueError("tiff: tiled files unsupported (strips only)")
        if tags.get(284, [1])[0] != 1:
            raise ValueError("tiff: planar configuration 2 unsupported")
        rps = tags.get(T_ROWS_PER_STRIP, [h])[0]
        offsets = tags[T_STRIP_OFFSETS]
        counts = tags[T_STRIP_COUNTS]
        if len(offsets) != len(counts):
            raise ValueError("tiff: StripOffsets/StripByteCounts mismatch")
        pixels = bytearray()
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            raw_strip = buf[off : off + cnt]
            if len(raw_strip) < cnt:
                raise ValueError(f"tiff: strip {i} runs past end of file")
            n_rows = min(rps, h - i * rps)
            want = n_rows * w * spp
            if comp == 32773:
                pixels += packbits_decode(raw_strip, want)
            else:
                if cnt != want:
                    raise ValueError(
                        f"tiff: strip {i} holds {cnt} bytes, want {want}"
                    )
                pixels += raw_strip
        if len(pixels) != w * h * spp:
            raise ValueError("tiff: assembled pixel data has wrong size")
        yield {
            "width": w,
            "height": h,
            "samples": spp,
            "compression": comp,
            "n_strips": len(offsets),
            "pixels": bytes(pixels),
        }


# --- fixtures + queries --------------------------------------------------------

TIFF_FILES = 4
TIFF_PAGES = 2


def _tiff_px_gray(f: int, p: int):
    return lambda x, y: (x * 7 + y * 13 + f * 3 + p * 29) % 256


def _tiff_px_rgb(f: int, p: int):
    return lambda x, y: (
        (2 * x + 3 * y + 5 * (f + p)) % 256,
        (x + 4 * y + 7 * f + p) % 256,
        (5 * x + y + 2 * f + 3 * p) % 256,
    )


def _tiff_dims(f: int, p: int) -> tuple[int, int]:
    return 9 + 2 * f + p, 6 + f + 2 * p  # never multiples of rows_per_strip


def _tiff_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        _tiff_px_gray, _tiff_px_rgb, _tiff_dims, write_tiff, packbits_encode,
        TIFF_FILES, TIFF_PAGES,
    )
    d = os.path.join(SCRATCH, f"tiff_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(TIFF_FILES):
            rgb = f % 2 == 1  # odd files: RGB, even: grayscale
            pages = []
            for p in range(TIFF_PAGES):
                w, h = _tiff_dims(f, p)
                pages.append(
                    (w, h, 3, _tiff_px_rgb(f, p))
                    if rgb
                    else (w, h, 1, _tiff_px_gray(f, p))
                )
            write_tiff(
                os.path.join(d, f"scan_{f:04d}.tif"),
                pages,
                big_endian=(f % 2 == 1),  # odd files big-endian too
                compression=32773 if f >= 2 else 1,  # files 2,3: PackBits
            )
        open(os.path.join(d, "_DONE"), "w").close()
    return d


_SQL_TIFF = f"""
pages AS (
  SELECT f.f, p.p,
         9 + 2 * f.f + p.p AS w, 6 + f.f + 2 * p.p AS h,
         CASE WHEN f.f % 2 = 1 THEN 3 ELSE 1 END AS spp,
         CASE WHEN f.f >= 2 THEN 32773 ELSE 1 END AS compression
  FROM range({TIFF_FILES}) f(f), range({TIFF_PAGES}) p(p)
),
px AS (
  SELECT f, p, w, h, spp, compression, xx.x AS x, yy.y AS y,
         CASE WHEN spp = 1
              THEN (x * 7 + y * 13 + f * 3 + p * 29) % 256
              ELSE (2 * x + 3 * y + 5 * (f + p)) % 256
                   + (x + 4 * y + 7 * f + p) % 256
                   + (5 * x + y + 2 * f + 3 * p) % 256 END AS pxsum
  FROM pages,
       LATERAL unnest(range(0, w)) AS xx(x),
       LATERAL unnest(range(0, h)) AS yy(y)
)
"""


@register(
    "mm_decode_tiff",
    tags=("multimodal", "image", "binary"),
    oracle=f"""
WITH {_SQL_TIFF}
SELECT CAST(f AS INTEGER) AS file_id, CAST(p AS INTEGER) AS page_idx,
       CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
       CAST(MAX(spp) AS INTEGER) AS samples,
       CAST(MAX(compression) AS INTEGER) AS compression,
       CAST(CEIL(MAX(h) / 4.0) AS INTEGER) AS n_strips,
       CAST(SUM(pxsum) AS BIGINT) AS sum_bytes,
       CAST((CASE WHEN MAX(spp) = 1
             THEN (f * 3 + p * 29) % 256
             ELSE (5 * (f + p)) % 256 END) AS INTEGER) AS topleft
FROM px GROUP BY f, p
""",
)
def mm_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode multi-page baseline TIFFs — both byte orders, inline AND
    offset IFD values, strip assembly with partial final strips, and
    PackBits RLE on half the files — and emit per-page geometry plus
    exact pixel-byte sums and the position-sensitive top-left sample.
    Gray/RGB, little/big endian, none/PackBits all rotate across the
    fixture set so every branch is load-bearing under one oracle.

    Scale: strips are the access unit (RowsPerStrip bounds memory per
    read at any image height); one parse task per file, O(1) features
    out."""
    import pandas as pd  # noqa: F401

    d = _tiff_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "page_idx", "width", "height", "samples",
                "compression", "n_strips", "sum_bytes", "topleft"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for p_idx, page in enumerate(parse_tiff(bytes(content))):
                    px = page["pixels"]
                    rows.append((
                        path_, p_idx, page["width"], page["height"],
                        page["samples"], page["compression"],
                        page["n_strips"],
                        sum(px),
                        px[0],
                    ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.tif"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, page_idx int, width int, height int, samples int, "
            "compression int, n_strips int, sum_bytes bigint, topleft int",
        )
    )
    return df.select(
        F.regexp_extract("path", r"scan_(\d{4})\.tif", 1)
        .cast("int")
        .alias("file_id"),
        "page_idx",
        "width",
        "height",
        "samples",
        "compression",
        "n_strips",
        "sum_bytes",
        "topleft",
    )
