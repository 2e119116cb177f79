"""REAL baseline JPEG (JFIF) decode — pure stdlib + numpy, no codec libs.

JPEG looked codec-gated behind PIL (module docstring of
``multimodal.py``), but baseline sequential JPEG (ITU-T T.81 / ISO
10918-1, a public spec) needs no library at all: marker segments,
quantization + Huffman tables, an entropy-coded segment with byte
stuffing, zigzag ordering, dequantization, an 8x8 inverse DCT, and a
level shift. This module implements the full baseline decode path:

* marker walk: SOI / APPn / COM / DQT / DHT / DRI / SOF0 / SOS / EOI,
* DQT 8- and 16-bit precision tables, zigzag order,
* DHT canonical Huffman reconstruction (BITS/HUFFVAL, Annex C),
* entropy decode: DC size-category + difference coding with per-
  component predictors, AC run/size symbols, ZRL (16-zero runs), EOB,
  0xFF00 byte unstuffing, RSTn restart markers (predictor reset +
  byte alignment),
* dequantize -> de-zigzag -> float64 separable IDCT -> +128 level
  shift -> clamp, and JFIF YCbCr->RGB for 3-component scans.

Supported profiles (everything else raises, like the PNG decoder):
8-bit baseline SOF0 with 1 or 3 components and sampling factors 1 or 2
per axis (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0), AND 8-bit progressive SOF2
(T.81 Annex G: spectral selection + successive approximation, EOB-RUN
codes, refinement correction bits — see ``decode_jpeg_progressive``).
12-bit, arithmetic coding, and hierarchical modes are out of scope.

The ORACLE trick: JPEG is lossy in general, but two DCT coefficient
families survive quantize->IDCT->round EXACTLY, making a closed-form
DuckDB oracle possible on real compressed bytes:

* a flat 8x8 block of value v has exactly one nonzero coefficient,
  DC = 8*(v-128) — an integer, unchanged by an all-ones quant table;
  IDCT reproduces v bitwise after rounding;
* the (4,4) basis function has entries +-1/8, so coefficient 8k adds
  +-k with sign pattern s(x)*s(y), s(x) = +1 for x in {0,3,4,7} else
  -1 — integers again. Its zigzag position is 39, so encoding it
  exercises TWO ZRL symbols before the run/size code.

Fixture images are built from such blocks: v and k come from
closed-form formulas of (block_x, block_y, img_id), so the DuckDB
oracle recomputes per-image pixel sums, a checkerboard-weighted sum
(which isolates the AC path: the +-k pattern cancels in the plain sum)
and position-sensitive corners from pure arithmetic — while the Spark
side must parse real markers, real Huffman codes, real stuffed bytes
and real restart markers to reproduce them.

Scale posture: decode parallelism = files via ``binaryFile`` +
``mapInPandas``; pixels never leave the Arrow batch — only O(1)
features per image shuffle. Reference parity: the reference engine has
no image path at all; this is part of the §2.1 multimodal family
(SURVEY.md) the 100 TB training-data pipeline needs.
"""

from __future__ import annotations

import os as _os
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

# zigzag position -> raster index (T.81 Figure A.6, public constant)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.1 luminance DC table: BITS (codes per length 1..16), HUFFVAL.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))

# s(x) for the (4,4) basis: cos((2x+1)*pi/4) sign, x = 0..7.
AC44_SIGN = [1, -1, -1, 1, 1, -1, -1, 1]
AC44_ZZ = ZIGZAG.index(36)  # zigzag position of raster (4,4) == 39


def _dct_matrix():
    import math

    import numpy as np

    a = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        c = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


# --- canonical Huffman ------------------------------------------------------


def build_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def uniform_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid (BITS, HUFFVAL) giving every symbol the same code length
    L = ceil(log2(n+1)) — the +1 keeps the all-ones code unassigned,
    matching the reference table-building algorithm's invariant."""
    n = len(symbols)
    # 2^bit_length(n) >= n + 1 always, so the all-ones code stays free
    length = max(1, n.bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bits, sorted(symbols)


# --- bit-level writer (encoder side) ----------------------------------------


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def byte_align_ones(self) -> None:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    # negative amplitudes are stored one's-complement style (T.81 F.1.4)
    return v if v >= 0 else v + (1 << size) - 1


# --- encoder (fixture writer) ------------------------------------------------


def encode_jpeg_baseline(
    width: int,
    height: int,
    coeff_blocks: list[list[int]],
    ncomp: int = 1,
    restart_interval: int = 0,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    """Assemble a real baseline JFIF byte stream from per-block DCT
    coefficient vectors (raster order, 64 ints each; quant table = all
    ones so the values are stored verbatim). ``ncomp=1`` grayscale or
    3 for interleaved color. ``sampling`` gives (h, v) factors per
    component — default all (1, 1) (4:4:4); ``[(2, 2), (1, 1), (1, 1)]``
    is 4:2:0. ``coeff_blocks`` holds blocks in MCU-interleaved order:
    per MCU, each component's h*v blocks row-major (for 4:2:0 that is
    [Y00, Y01, Y10, Y11, Cb, Cr] per 16x16 MCU). Huffman tables are
    built from the symbols the data actually uses — how optimizing
    encoders work."""
    samp = sampling if sampling is not None else [(1, 1)] * ncomp
    assert len(samp) == ncomp
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    assert width % (8 * hmax) == 0 and height % (8 * vmax) == 0
    n_mcu = (width // (8 * hmax)) * (height // (8 * vmax))
    # component index of each block within one MCU, in scan order
    mcu_layout = [c for c in range(ncomp) for _ in range(samp[c][0] * samp[c][1])]
    assert len(coeff_blocks) == n_mcu * len(mcu_layout)

    def scan_blocks():
        """(mcu_index, component, block) in entropy order."""
        i = 0
        for m in range(n_mcu):
            for c in mcu_layout:
                yield m, c, coeff_blocks[i]
                i += 1

    # ---- first pass: collect symbols, so tables cover exactly the data
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    preds = [0] * ncomp
    cur_mcu = 0
    for m, c, blk in scan_blocks():
        if restart_interval and m != cur_mcu:
            cur_mcu = m
            if m % restart_interval == 0:
                preds = [0] * ncomp
        diff = blk[0] - preds[c]
        preds[c] = blk[0]
        dc_syms.add(_size_cat(diff))
        run = 0
        for zz in range(1, 64):
            v = blk[ZIGZAG[zz]]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _size_cat(v))
            run = 0
    dc_bits, dc_vals = uniform_table(sorted(dc_syms))
    ac_bits, ac_vals = uniform_table(sorted(ac_syms))
    dc_codes = build_canonical_codes(dc_bits, dc_vals)
    ac_codes = build_canonical_codes(ac_bits, ac_vals)

    # ---- entropy-coded segment
    w = _BitWriter()
    preds = [0] * ncomp
    rst_inserts: list[tuple[int, int]] = []  # (byte offset, marker index)
    rst_n = 0
    cur_mcu = 0
    for m, c, blk in scan_blocks():
        if restart_interval and m != cur_mcu:
            cur_mcu = m
            if m % restart_interval == 0:
                w.byte_align_ones()
                rst_inserts.append((len(w.out), rst_n & 7))
                rst_n += 1
                preds = [0] * ncomp
        diff = blk[0] - preds[c]
        preds[c] = blk[0]
        s = _size_cat(diff)
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(_amplitude_bits(diff, s), s)
        run = 0
        for zz in range(1, 64):
            v = blk[ZIGZAG[zz]]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                run -= 16
            s = _size_cat(v)
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            w.put(_amplitude_bits(v, s), s)
            run = 0
        if blk[ZIGZAG[63]] == 0:  # EOB unless block ends at 63
            code, ln = ac_codes[0x00]
            w.put(code, ln)
    w.byte_align_ones()
    scan = bytearray(w.out)
    for off, idx in reversed(rst_inserts):
        scan[off:off] = bytes([0xFF, 0xD0 + idx])

    # ---- marker segments
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + _struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    if restart_interval:
        out += seg(0xDD, _struct.pack(">H", restart_interval))  # DRI
    comp_specs = b"".join(
        bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0])
        for cid in range(ncomp)
    )  # quant table 0
    out += seg(
        0xC0, bytes([8]) + _struct.pack(">HH", height, width) + bytes([ncomp]) + comp_specs
    )  # SOF0
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))  # DHT DC 0
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))  # DHT AC 0
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    out += seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def flat_ac44_blocks(v: int, k: int) -> list[int]:
    """Coefficient vector (raster order) for a block that decodes to
    pixel(x, y) = v + k*s(x)*s(y): DC = 8*(v-128), coeff(4,4) = 8*k."""
    blk = [0] * 64
    blk[0] = 8 * (v - 128)
    blk[36] = 8 * k  # raster (4,4)
    return blk


# --- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy segment exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_baseline(buf: bytes, dc_only: bool = False):
    """(width, height, ncomp, pixels) from baseline JFIF bytes; pixels
    is H x W (grayscale) or H x W x 3 RGB uint8, row 0 = top. Supported
    profile: 8-bit SOF0, 1 or 3 components, sampling factors 1 or 2 per
    axis — covering 4:4:4, 4:2:0 (the dominant real-world layout),
    4:2:2 and 4:4:0; chroma planes are replicated up to full resolution
    (the JFIF nearest-neighbor convention). Anything else (progressive,
    12-bit, factors > 2) raises rather than guessing.

    ``dc_only=True`` is the classic fast-thumbnail path: a DC-only
    block IDCTs to a flat DC/8 + 128, so one pixel per 8x8 block falls
    straight out of the entropy stream with NO inverse transform at
    all — returns (width//8-scale thumbnail dims, ncomp, thumbnail).
    AC coefficients are still entropy-DECODED (the bitstream is
    sequential; there is no skipping them) but never dequantized or
    transformed — which is the actual cost structure of production
    thumbnailers."""
    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    ncomp = 0
    comps: list[tuple[int, int, int, int]] = []  # (comp id, h, v, quant id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    restart_interval = 0
    pos = 2
    scan_data = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = _struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(body[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = [
                        _struct.unpack_from(">H", body, i + 2 * j)[0] for j in range(64)
                    ]
                    i += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                table = [0] * 64
                for zz in range(64):
                    table[ZIGZAG[zz]] = vals[zz]
                qt[tq] = table
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            height, width = _struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                h_f, v_f = samp >> 4, samp & 0x0F
                if h_f not in (1, 2) or v_f not in (1, 2):
                    raise ValueError(
                        f"sampling factors {h_f}x{v_f} unsupported (1 or 2)"
                    )
                comps.append((cid, h_f, v_f, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, (cc, *_) in enumerate(comps) if cc == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            # collect entropy bytes up to the next non-RST marker
            start = pos
            i = start
            while i + 1 < len(buf):
                if buf[i] == 0xFF and buf[i + 1] not in (0x00, *range(0xD0, 0xD8)):
                    break
                i += 1
            scan_data = buf[start:i]
            pos = i
        # APPn / COM / others: skipped by the generic segment advance
    if width is None or scan_data is None:
        raise ValueError("JPEG missing SOF0 or SOS")

    # split on restart markers, unstuff each interval
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan_data):
        b = scan_data[i]
        if b == 0xFF:
            nxt = scan_data[i + 1] if i + 1 < len(scan_data) else None
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    hmax = max(h_f for _, h_f, _, _ in comps)
    vmax = max(v_f for _, _, v_f, _ in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcus_x * mcus_y
    dct = None if dc_only else _dct_matrix()
    # each component decodes into its OWN (possibly subsampled) plane;
    # in dc_only mode the plane is one value per block, not per pixel
    px_per_block = 1 if dc_only else 8
    planes = [
        np.zeros(
            (mcus_y * px_per_block * v_f, mcus_x * px_per_block * h_f),
            dtype=np.float64,
        )
        for _, h_f, v_f, _ in comps
    ]
    reader = _BitReader(intervals[0])
    interval_idx = 0
    preds = [0] * ncomp
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("missing restart marker in scan")
            reader = _BitReader(intervals[interval_idx])
            preds = [0] * ncomp
        mcu_y, mcu_x = divmod(m, mcus_x)
        for comp_idx, dc_id, ac_id in scan_comps:
            _, h_f, v_f, tq = comps[comp_idx]
            for b in range(h_f * v_f):  # blocks within the MCU, row-major
                coeffs = np.zeros(64, dtype=np.float64)
                s = _read_symbol(reader, huff[(0, dc_id)])
                diff = _extend(reader.read_bits(s), s) if s else 0
                preds[comp_idx] += diff
                coeffs[0] = preds[comp_idx]
                zz = 1
                while zz < 64:
                    sym = _read_symbol(reader, huff[(1, ac_id)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        zz += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    zz += run
                    if zz > 63:
                        raise ValueError("AC coefficient index out of range")
                    coeffs[ZIGZAG[zz]] = _extend(reader.read_bits(size), size)
                    zz += 1
                by = mcu_y * v_f + b // h_f
                bx = mcu_x * h_f + b % h_f
                if dc_only:
                    planes[comp_idx][by, bx] = (
                        coeffs[0] * qt[tq][0] / 8.0 + 128.0
                    )
                else:
                    block = (
                        coeffs * np.asarray(qt[tq], dtype=np.float64)
                    ).reshape(8, 8)
                    planes[comp_idx][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = dct.T @ block @ dct + 128.0
    # replicate subsampled planes up to full resolution (JFIF nearest),
    # round each plane to exact integers, crop to the declared size
    out_h = (height + 7) // 8 if dc_only else height
    out_w = (width + 7) // 8 if dc_only else width
    up = []
    for (_, h_f, v_f, _), p in zip(comps, planes):
        if h_f < hmax:
            p = np.repeat(p, hmax // h_f, axis=1)
        if v_f < vmax:
            p = np.repeat(p, vmax // v_f, axis=0)
        up.append(p)
    planes = [np.clip(np.rint(p[:out_h, :out_w]), 0, 255) for p in up]
    if ncomp == 1:
        return out_w, out_h, 1, planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return out_w, out_h, 3, rgb


# --- progressive (SOF2) -------------------------------------------------------
#
# Progressive JPEG (T.81 Annex G) splits the coefficient data across
# MULTIPLE scans: spectral selection (each scan carries a zigzag band
# Ss..Se) and successive approximation (each scan carries a bit-plane
# slice, Ah..Al). The encoder below emits the classic script
#
#   1. DC first scan   — interleaved, Ss=Se=0, Ah=0, Al=1
#   2. AC first scans  — one per component, Ss=1, Se=63, Ah=0, Al=1
#   3. DC refinement   — interleaved, Ah=1, Al=0 (raw bits, no Huffman)
#   4. AC refinements  — one per component, Ss=1, Se=63, Ah=1, Al=0
#
# which exercises every decoder branch: DC point transform (arithmetic
# shift) + refinement OR-bit, AC point transform (truncate toward
# zero), EOB-RUN codes spanning blocks (EOBn = 2^n + extra bits), ZRL
# inside refinement runs, and interleaved correction bits for
# already-nonzero coefficients (G.1.2.3 ordering, the hairy part).
# After the last scan the coefficient planes feed the SAME dequantize
# -> IDCT -> level-shift path as baseline.


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward ZERO
    (T.81 G.1.2.2 — NOT an arithmetic shift, which floors)."""
    t = abs(v) >> al
    return t if v >= 0 else -t


def encode_jpeg_progressive(
    width: int,
    height: int,
    coeff_blocks: list[list[int]],
    ncomp: int = 1,
    al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a real progressive (SOF2) JFIF stream from per-block
    coefficient vectors (raster order, MCU-interleaved like
    :func:`encode_jpeg_baseline`; quant table all ones; sampling all
    1x1). ``al`` is the successive-approximation split for both DC and
    AC (first scans carry bits >= al, one refinement scan per extra
    bit). Huffman tables are built from the symbols actually used:
    DC table 0, AC table 0 (first scans), AC table 1 (refinements).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N units in EVERY scan — DC predictors, EOB runs, and buffered
    correction bits all reset at each boundary (an EOB run can never
    span a restart; T.81 F.2.1.3 applies per scan kind)."""
    assert width % 8 == 0 and height % 8 == 0
    wb, hb = width // 8, height // 8
    n_mcu = wb * hb
    assert len(coeff_blocks) == n_mcu * ncomp
    assert al >= 1, "al=0 would be sequential-in-one-scan; use >= 1"
    comp_blocks = [
        [coeff_blocks[m * ncomp + c] for m in range(n_mcu)]
        for c in range(ncomp)
    ]

    # ---- scan emitters, parameterized over (emit_sym, emit_bits) and a
    # [lo, hi) unit range (one restart interval) so a collection pass
    # (building the Huffman tables) and the real encoding pass share one
    # algorithm — any divergence would be a correctness bug, not a
    # silent table mismatch — and all per-interval state (predictors,
    # EOB runs, buffered bits) resets naturally at interval boundaries.

    def run_dc_first(emit_sym, emit_bits, lo: int = 0, hi: int | None = None):
        preds = [0] * ncomp
        for m in range(lo, n_mcu if hi is None else hi):
            for c in range(ncomp):
                t = comp_blocks[c][m][0] >> al  # DC: arithmetic shift
                diff = t - preds[c]
                preds[c] = t
                s = _size_cat(diff)
                emit_sym(s)
                if s:
                    emit_bits(_amplitude_bits(diff, s), s)

    def run_dc_refine(emit_bits, bit: int, lo: int = 0, hi: int | None = None):
        for m in range(lo, n_mcu if hi is None else hi):
            for c in range(ncomp):
                emit_bits((comp_blocks[c][m][0] >> bit) & 1, 1)

    def run_ac_first(
        emit_sym, emit_bits, c: int, cur_al: int,
        lo: int = 0, hi: int | None = None,
    ):
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(nbits << 4)
                if nbits:
                    emit_bits(eobrun - (1 << nbits), nbits)
                eobrun = 0

        for blk in comp_blocks[c][lo : n_mcu if hi is None else hi]:
            t = [_pt_ac(blk[ZIGZAG[z]], cur_al) for z in range(64)]
            ke = max((z for z in range(1, 64) if t[z]), default=0)
            if ke == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for z in range(1, ke + 1):
                v = t[z]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    emit_sym(0xF0)
                    run -= 16
                s = _size_cat(v)
                emit_sym((run << 4) | s)
                emit_bits(_amplitude_bits(v, s), s)
                run = 0
            if ke < 63:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()

    def run_ac_refine(
        emit_sym, emit_bits, c: int, cur_al: int,
        lo: int = 0, hi: int | None = None,
    ):
        # G.1.2.3 ordering (the libjpeg jcphuff shape is the canonical
        # public reading of it): correction bits for already-nonzero
        # coefficients are BUFFERED and emitted after the next Huffman
        # symbol (ZRL / run-size / EOBn) they precede.
        eobrun = 0
        pending: list[int] = []  # correction bits buffered across blocks

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                emit_sym(nbits << 4)
                if nbits:
                    emit_bits(eobrun - (1 << nbits), nbits)
                for b in pending:
                    emit_bits(b, 1)
                pending.clear()
                eobrun = 0

        for blk in comp_blocks[c][lo : n_mcu if hi is None else hi]:
            t = [_pt_ac(blk[ZIGZAG[z]], cur_al) for z in range(64)]
            absv = [abs(v) for v in t]
            # last NEWLY-significant position (becomes nonzero this scan)
            eob = max((z for z in range(1, 64) if absv[z] == 1), default=0)
            run = 0
            br: list[int] = []  # this block's buffered correction bits
            for z in range(1, 64):
                av = absv[z]
                if av == 0:
                    run += 1
                    continue
                while run > 15 and z <= eob:
                    flush_eob()
                    emit_sym(0xF0)
                    run -= 16
                    for b in br:
                        emit_bits(b, 1)
                    br = []
                if av > 1:  # already significant: one correction bit
                    br.append(av & 1)
                    continue
                flush_eob()
                emit_sym((run << 4) | 1)
                emit_bits(1 if t[z] > 0 else 0, 1)
                for b in br:
                    emit_bits(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()

    # restart-interval unit groups (all scans here have n_mcu units:
    # sampling is 1x1, so MCUs == per-component blocks)
    ri = restart_interval
    groups = (
        [(0, n_mcu)]
        if not ri
        else [(lo, min(n_mcu, lo + ri)) for lo in range(0, n_mcu, ri)]
    )

    # ---- pass 1: collect symbols per table (per restart group — EOB
    # runs truncate at boundaries, which changes the EOBn symbols used)
    dc_syms: set[int] = set()
    ac_first_syms: set[int] = set()
    ac_ref_syms: set[int] = set()

    def collect(bag):
        return bag.add, (lambda v, n: None)

    for lo, hi in groups:
        run_dc_first(*collect(dc_syms), lo, hi)
        # AC first scans happen once (at Al=al); refinements per lower bit
        for c in range(ncomp):
            sym_add, bit_drop = collect(ac_first_syms)
            run_ac_first(sym_add, bit_drop, c, al, lo, hi)
        for cur_al in range(al - 1, -1, -1):
            for c in range(ncomp):
                sym_add, bit_drop = collect(ac_ref_syms)
                run_ac_refine(sym_add, bit_drop, c, cur_al, lo, hi)
    if not ac_first_syms:
        ac_first_syms.add(0x00)
    if al >= 1 and not ac_ref_syms:
        ac_ref_syms.add(0x00)
    dc_bits, dc_vals = uniform_table(sorted(dc_syms))
    acf_bits, acf_vals = uniform_table(sorted(ac_first_syms))
    acr_bits, acr_vals = uniform_table(sorted(ac_ref_syms))
    dc_codes = build_canonical_codes(dc_bits, dc_vals)
    acf_codes = build_canonical_codes(acf_bits, acf_vals)
    acr_codes = build_canonical_codes(acr_bits, acr_vals)

    # ---- pass 2: emit each scan's entropy segment, one byte-aligned
    # chunk per restart group joined by cycling RSTn markers
    def emitters(w, codes):
        def emit_sym(sym):
            code, ln = codes[sym]
            w.put(code, ln)

        return emit_sym, w.put

    def scan_bytes(run, codes) -> bytes:
        out = bytearray()
        for gi, (lo, hi) in enumerate(groups):
            if gi:
                out += bytes([0xFF, 0xD0 + ((gi - 1) & 7)])
            w = _BitWriter()
            if codes is None:
                run(w.put, lo, hi)
            else:
                run(*emitters(w, codes), lo, hi)
            w.byte_align_ones()
            out += w.out
        return bytes(out)

    scans: list[tuple[bytes, bytes]] = []  # (SOS header body, entropy bytes)

    def sos_body(comp_ids, dc_tab, ac_tab, ss, se, ah, cur_al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid + 1, (dc_tab << 4) | ac_tab])
        return body + bytes([ss, se, (ah << 4) | cur_al])

    scans.append(
        (
            sos_body(list(range(ncomp)), 0, 0, 0, 0, 0, al),
            scan_bytes(
                lambda es, eb, lo, hi: run_dc_first(es, eb, lo, hi), dc_codes
            ),
        )
    )
    for c in range(ncomp):
        scans.append(
            (
                sos_body([c], 0, 0, 1, 63, 0, al),
                scan_bytes(
                    lambda es, eb, lo, hi, c=c: run_ac_first(
                        es, eb, c, al, lo, hi
                    ),
                    acf_codes,
                ),
            )
        )
    for bit in range(al - 1, -1, -1):
        scans.append(
            (
                sos_body(list(range(ncomp)), 0, 0, 0, 0, bit + 1, bit),
                scan_bytes(
                    lambda eb, lo, hi, bit=bit: run_dc_refine(
                        eb, bit, lo, hi
                    ),
                    None,
                ),
            )
        )
        for c in range(ncomp):
            scans.append(
                (
                    sos_body([c], 0, 1, 1, 63, bit + 1, bit),
                    scan_bytes(
                        lambda es, eb, lo, hi, c=c, bit=bit: run_ac_refine(
                            es, eb, c, bit, lo, hi
                        ),
                        acr_codes,
                    ),
                )
            )

    # ---- marker assembly
    def seg(marker: int, payload: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + _struct.pack(">H", len(payload) + 2)
            + payload
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    if ri:
        out += seg(0xDD, _struct.pack(">H", ri))  # DRI
    comp_specs = b"".join(bytes([cid + 1, 0x11, 0]) for cid in range(ncomp))
    out += seg(
        0xC2,  # SOF2: progressive DCT, Huffman coding
        bytes([8])
        + _struct.pack(">HH", height, width)
        + bytes([ncomp])
        + comp_specs,
    )
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(acf_bits) + bytes(acf_vals))
    out += seg(0xC4, bytes([0x11]) + bytes(acr_bits) + bytes(acr_vals))
    for body, entropy in scans:
        out += seg(0xDA, body)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_progressive(buf: bytes, dc_only: bool = False):
    """(width, height, ncomp, pixels) from progressive (SOF2) JFIF
    bytes. Full Annex G decode: spectral-selection bands, successive-
    approximation first scans (DC arithmetic-shift / AC truncate-
    toward-zero point transforms), EOB-RUN codes spanning blocks, and
    refinement scans (DC OR-bit; AC correction bits interleaved into
    zero-history runs). Coefficients accumulate across scans, then run
    through the same dequantize -> IDCT -> level-shift -> YCbCr->RGB
    tail as :func:`decode_jpeg_baseline`.

    ``dc_only=True`` decodes ONLY the first DC scan and returns the
    1/8-scale preview — the progressive byte layout makes this a pure
    PREFIX read (the classic "blurry first paint"), unlike baseline
    where AC codes must still be walked. Sampling factors other than
    1x1 are rejected (progressive subsampled fixtures aren't needed;
    the baseline decoder carries the subsampling coverage)."""
    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff_raw: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    ncomp = 0
    comps: list[tuple[int, int, int, int]] = []
    restart_interval = 0
    coef: list = []  # per component: np int32 array (blocks_y, blocks_x, 64)
    eobrun = 0
    wb = hb = 0
    saw_dc_first = False
    saw_eoi = False
    pos = 2
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        (seg_len,) = _struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(body[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = [
                        _struct.unpack_from(">H", body, i + 2 * j)[0]
                        for j in range(64)
                    ]
                    i += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                table = [0] * 64
                for zz in range(64):
                    table[ZIGZAG[zz]] = vals[zz]
                qt[tq] = table
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff_raw[(tc, th)] = _build_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xC2:  # SOF2 progressive
            if body[0] != 8:
                raise ValueError(f"unsupported precision {body[0]}")
            height, width = _struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled progressive scans unsupported"
                    )
                comps.append((cid, 1, 1, tq))
            wb = (width + 7) // 8
            hb = (height + 7) // 8
            coef = [
                np.zeros((hb, wb, 64), dtype=np.int32) for _ in range(ncomp)
            ]
        elif marker == 0xC0:
            raise ValueError("baseline SOF0 given to the progressive decoder")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:
            (restart_interval,) = _struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if width is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    i for i, (cc, *_) in enumerate(comps) if cc == cid
                )
                scan_comps.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, alo = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            # entropy bytes up to the next non-RST marker; a stream cut
            # mid-download ends WITHOUT one, and the dc_only prefix
            # read must still consume that last byte
            start = pos
            i = start
            end = len(buf)
            while i + 1 < len(buf):
                if buf[i] == 0xFF and buf[i + 1] not in (
                    0x00,
                    *range(0xD0, 0xD8),
                ):
                    end = i
                    break
                i += 1
            scan_data = buf[start:end]
            pos = end
            _progressive_scan(
                scan_data,
                coef,
                scan_comps,
                huff_raw,
                ss,
                se,
                ah,
                alo,
                wb,
                hb,
                restart_interval,
            )
            if ss == 0 and ah == 0:
                saw_dc_first = True
            if dc_only and saw_dc_first:
                break
        # APPn / COM: skipped
    if width is None or not saw_dc_first:
        raise ValueError("JPEG missing SOF2 or a DC scan")
    if not dc_only and not saw_eoi:
        # a progressive stream cut mid-download still DISPLAYS (that is
        # the format's point), but a data pipeline must never silently
        # emit half-refined pixels as if they were the full decode
        raise ValueError("truncated progressive stream (missing EOI)")

    # ---- shared tail: dequant + IDCT (or DC passthrough) + color
    dct = None if dc_only else _dct_matrix()
    px = 1 if dc_only else 8
    planes = [
        np.zeros((hb * px, wb * px), dtype=np.float64) for _ in range(ncomp)
    ]
    for ci, (_, _, _, tq) in enumerate(comps):
        q = np.asarray(qt[tq], dtype=np.float64)
        for by in range(hb):
            for bx in range(wb):
                c64 = coef[ci][by, bx].astype(np.float64)
                if dc_only:
                    planes[ci][by, bx] = c64[0] * q[0] / 8.0 + 128.0
                else:
                    block = (c64 * q).reshape(8, 8)
                    planes[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = dct.T @ block @ dct + 128.0
    out_h = (height + 7) // 8 if dc_only else height
    out_w = (width + 7) // 8 if dc_only else width
    planes = [np.clip(np.rint(p[:out_h, :out_w]), 0, 255) for p in planes]
    if ncomp == 1:
        return out_w, out_h, 1, planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return out_w, out_h, 3, rgb


def _split_intervals(scan_data: bytes) -> list[bytes]:
    """Unstuff 0xFF00 and split on RSTn markers."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan_data):
        b = scan_data[i]
        if b == 0xFF:
            nxt = scan_data[i + 1] if i + 1 < len(scan_data) else None
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def _progressive_scan(
    scan_data: bytes,
    coef: list,
    scan_comps: list[tuple[int, int, int]],
    huff: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    wb: int,
    hb: int,
    restart_interval: int,
) -> None:
    """Decode ONE progressive scan into the coefficient planes."""
    intervals = _split_intervals(scan_data)
    reader = _BitReader(intervals[0])
    interval_idx = 0
    eobrun = 0
    preds = [0] * len(scan_comps)
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("DC scan must have Se=0 (T.81 G.1.1.1)")
    if not dc_scan and len(scan_comps) != 1:
        raise ValueError("AC scans must be non-interleaved (single comp)")
    # unit count: MCUs for (possibly interleaved) DC scans, blocks of
    # the single component for AC scans — identical here because all
    # sampling factors are 1 (enforced at SOF2)
    n_units = wb * hb
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("missing restart marker in scan")
            reader = _BitReader(intervals[interval_idx])
            preds = [0] * len(scan_comps)
            eobrun = 0
        by, bx = divmod(u, wb)
        if dc_scan:
            for si, (ci, dc_id, _) in enumerate(scan_comps):
                block = coef[ci][by, bx]
                if ah == 0:  # first DC scan: diff-coded shifted DC
                    s = _read_symbol(reader, huff[(0, dc_id)])
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[si] += diff
                    block[0] = preds[si] << al
                else:  # refinement: one raw bit, OR'd in
                    if reader.read_bit():
                        block[0] = int(block[0]) | (1 << al)
        else:
            ci, _, ac_id = scan_comps[0]
            block = coef[ci][by, bx]
            table = huff[(1, ac_id)]
            if ah == 0:
                eobrun = _ac_first_block(
                    reader, table, block, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine_block(
                    reader, table, block, ss, se, al, eobrun
                )


def _ac_first_block(reader, table, block, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(reader, table)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.read_bits(r)
            return eobrun - 1  # this block IS the first of the run
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of band")
        block[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, table, block, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, table)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "AC refinement size must be 1 (T.81 G.1.2.3)"
                    )
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            # advance over r zero-history coefficients, applying
            # correction bits to already-nonzero ones crossed on the way
            while k <= se:
                cur = int(block[ZIGZAG[k]])
                if cur != 0:
                    if reader.read_bit() and (cur & p1) == 0:
                        block[ZIGZAG[k]] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        # end-of-band: correction bits only, for the rest of the band
        while k <= se:
            cur = int(block[ZIGZAG[k]])
            if cur != 0:
                if reader.read_bit() and (cur & p1) == 0:
                    block[ZIGZAG[k]] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# --- fixtures + registered query ---------------------------------------------

JPEG_N = 50


def _jpeg_block_v(bx: int, by: int, i: int) -> int:
    # flat level in [8, 247]: +-k (k <= 7) can never clip
    return 8 + (37 * bx + 59 * by + 11 * i) % 240


def _jpeg_block_k(bx: int, by: int, i: int) -> int:
    return 1 + (bx + by + i) % 7


def _jpeg_dims(i: int) -> tuple[int, int]:
    return 2 + i % 3, 1 + i % 2  # blocks wide, blocks high


def write_jpeg_fixture(path: str, i: int) -> None:
    wb, hb = _jpeg_dims(i)
    blocks = [
        flat_ac44_blocks(_jpeg_block_v(bx, by, i), _jpeg_block_k(bx, by, i))
        for by in range(hb)
        for bx in range(wb)
    ]
    # every 5th file uses restart markers (interval 2): RST handling +
    # predictor reset are load-bearing in the driver-facing query
    data = encode_jpeg_baseline(
        wb * 8, hb * 8, blocks, restart_interval=2 if i % 5 == 0 else 0
    )
    with open(path, "wb") as f:
        f.write(data)


def _jpeg_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        write_jpeg_fixture,
        encode_jpeg_baseline,
        flat_ac44_blocks,
        _jpeg_block_v,
        _jpeg_block_k,
        _jpeg_dims,
        JPEG_N,
    )
    d = _os.path.join(SCRATCH, f"jpeg_images_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(JPEG_N):
        p = _os.path.join(d, f"img_{i:04d}.jpg")
        if not _os.path.exists(p):
            tmp = p + ".tmp"
            write_jpeg_fixture(tmp, i)
            _os.replace(tmp, p)
    return d


@register(
    "mm_decode_jpeg",
    tags=("llm", "multimodal", "decode", "pandas-udf"),
    oracle=f"""
WITH imgs AS (
  SELECT i, 2 + i % 3 AS wb, 1 + i % 2 AS hb FROM range({JPEG_N}) t(i)
),
blk AS (
  SELECT i, wb, hb, bxx.bx AS bx, byy.by AS by,
         8 + (37 * bxx.bx + 59 * byy.by + 11 * i) % 240 AS v,
         1 + (bxx.bx + byy.by + i) % 7 AS k
  FROM imgs,
       LATERAL unnest(range(0, wb)) AS bxx(bx),
       LATERAL unnest(range(0, hb)) AS byy(by)
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(wb) * 8 AS INTEGER) AS width,
       CAST(MAX(hb) * 8 AS INTEGER) AS height,
       CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
       CAST(SUM(64 * k) AS BIGINT) AS checker_sum,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN v + k END) AS INTEGER)
         AS topleft,
       CAST(MAX(CASE WHEN bx = wb - 1 AND by = hb - 1 THEN v + k END)
            AS INTEGER) AS bottomright
FROM blk GROUP BY i
""",
)
def mm_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode, no codec libs: marker walk, DHT
    canonical Huffman, DC-difference + AC run/size entropy decode with
    ZRL and EOB, byte unstuffing, restart markers (every 5th fixture),
    dequantize, float IDCT, level shift. Emits per-image dimensions,
    the plain luminance sum, a CHECKERBOARD-WEIGHTED sum s(x%8)s(y%8)
    that isolates the AC-coefficient path (the +-k pattern cancels out
    of the plain sum by design), and position-sensitive corners. The
    DuckDB oracle recomputes all of it from the closed-form block
    formulas — possible on lossy JPEG because flat-block DC and the
    (4,4) basis survive quantize->IDCT->round exactly (see module
    docstring). Scale: files parallelize via binaryFile + mapInPandas;
    only O(1) features per image leave the Arrow batch."""
    import numpy as np

    d = _jpeg_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )
    sign = np.asarray(AC44_SIGN, dtype=np.int64)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                w, h, nc, px = decode_jpeg_baseline(bytes(content))
                assert nc == 1
                p = px.astype(np.int64)
                weights = np.outer(
                    np.tile(sign, h // 8), np.tile(sign, w // 8)
                )
                rows.append(
                    (
                        img_id, w, h,
                        int(p.sum()),
                        int((p * weights).sum()),
                        int(p[0, 0]), int(p[h - 1, w - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "sum_lum",
                    "checker_sum", "topleft", "bottomright",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, width int, height int, sum_lum bigint, "
            "checker_sum bigint, topleft int, bottomright int"
        ),
    )


@register(
    "mm_jpeg_thumbnail_dc",
    tags=("llm", "multimodal", "decode", "thumbnail", "pandas-udf"),
    # DC-only decode drops the AC checkerboard entirely: the thumbnail
    # pixel of a flat+AC44 block is exactly v — so the oracle is the
    # grayscale fixture formula WITHOUT the k term, and a thumbnailer
    # that accidentally runs the full IDCT+downsample would show the
    # checkerboard leaking into corner pixels and hash-mismatch.
    oracle=f"""
WITH imgs AS (
  SELECT i, 2 + i % 3 AS wb, 1 + i % 2 AS hb FROM range({JPEG_N}) t(i)
),
blk AS (
  SELECT i, wb, hb, bxx.bx AS bx, byy.by AS by,
         8 + (37 * bxx.bx + 59 * byy.by + 11 * i) % 240 AS v
  FROM imgs,
       LATERAL unnest(range(0, wb)) AS bxx(bx),
       LATERAL unnest(range(0, hb)) AS byy(by)
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(wb) AS INTEGER) AS thumb_w,
       CAST(MAX(hb) AS INTEGER) AS thumb_h,
       CAST(SUM(v) AS BIGINT) AS thumb_sum,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN v END) AS INTEGER)
         AS topleft,
       CAST(MAX(CASE WHEN bx = wb - 1 AND by = hb - 1 THEN v END)
            AS INTEGER) AS bottomright
FROM blk GROUP BY i
""",
)
def mm_jpeg_thumbnail_dc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production fast-thumbnail operator: one pixel per 8x8 block
    straight from the DC coefficients — the entropy stream is decoded
    (it is sequential; AC codes must be walked) but NO dequantization,
    NO inverse DCT, and 1/64th of the pixel writes. At 100 TB of images
    this is how gallery/preview/near-dup pipelines avoid paying the
    full codec: the avg-hash image dedup registered in
    ``llm/multimodal.py`` composes directly on these thumbnails. Same
    fixture set as ``mm_decode_jpeg`` (restart markers every 5th file),
    different oracle: DC-only drops the AC checkerboard, so the
    expected thumbnail is the flat level v alone."""
    import numpy as np

    d = _jpeg_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                tw, th, nc, thumb = decode_jpeg_baseline(
                    bytes(content), dc_only=True
                )
                assert nc == 1
                t = thumb.astype(np.int64)
                rows.append(
                    (
                        img_id, tw, th,
                        int(t.sum()),
                        int(t[0, 0]), int(t[th - 1, tw - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "thumb_w", "thumb_h", "thumb_sum",
                    "topleft", "bottomright",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, thumb_w int, thumb_h int, thumb_sum bigint, "
            "topleft int, bottomright int"
        ),
    )


# --- progressive fixtures + queries --------------------------------------------

JPEG_PROG_N = 50


def write_jpeg_progressive_fixture(path: str, i: int) -> None:
    wb, hb = _jpeg_dims(i)
    blocks = [
        flat_ac44_blocks(_jpeg_block_v(bx, by, i), _jpeg_block_k(bx, by, i))
        for by in range(hb)
        for bx in range(wb)
    ]
    # every 4th file uses al=2 (two successive-approximation rounds);
    # every 3rd uses restart markers (interval 2): the extra refinement
    # scans, deeper EOB runs, and per-interval predictor/EOB-run resets
    # are all load-bearing in the driver-facing query
    data = encode_jpeg_progressive(
        wb * 8,
        hb * 8,
        blocks,
        al=2 if i % 4 == 0 else 1,
        restart_interval=2 if i % 3 == 0 else 0,
    )
    with open(path, "wb") as f:
        f.write(data)


def _jpeg_progressive_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        write_jpeg_progressive_fixture,
        encode_jpeg_progressive,
        flat_ac44_blocks,
        _jpeg_block_v,
        _jpeg_block_k,
        _jpeg_dims,
        JPEG_PROG_N,
    )
    d = _os.path.join(SCRATCH, f"jpeg_progressive_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(JPEG_PROG_N):
        p = _os.path.join(d, f"img_{i:04d}.jpg")
        if not _os.path.exists(p):
            tmp = p + ".tmp"
            write_jpeg_progressive_fixture(tmp, i)
            _os.replace(tmp, p)
    return d


@register(
    "mm_decode_jpeg_progressive",
    tags=("llm", "multimodal", "decode", "pandas-udf"),
    # Same closed-form block formulas as mm_decode_jpeg: progressive is
    # a different WIRE layout of the same coefficients, so a correct
    # multi-scan decode must land on identical pixels — and therefore
    # identical sums/corners. The checkerboard term isolates the AC
    # scans (spectral band 1..63 + refinements); a decoder that ran
    # only the DC scan (or dropped refinement bits) hash-mismatches.
    oracle=f"""
WITH imgs AS (
  SELECT i, 2 + i % 3 AS wb, 1 + i % 2 AS hb FROM range({JPEG_PROG_N}) t(i)
),
blk AS (
  SELECT i, wb, hb, bxx.bx AS bx, byy.by AS by,
         8 + (37 * bxx.bx + 59 * byy.by + 11 * i) % 240 AS v,
         1 + (bxx.bx + byy.by + i) % 7 AS k
  FROM imgs,
       LATERAL unnest(range(0, wb)) AS bxx(bx),
       LATERAL unnest(range(0, hb)) AS byy(by)
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(wb) * 8 AS INTEGER) AS width,
       CAST(MAX(hb) * 8 AS INTEGER) AS height,
       CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
       CAST(SUM(64 * k) AS BIGINT) AS checker_sum,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN v + k END) AS INTEGER)
         AS topleft,
       CAST(MAX(CASE WHEN bx = wb - 1 AND by = hb - 1 THEN v + k END)
            AS INTEGER) AS bottomright
FROM blk GROUP BY i
""",
)
def mm_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive (SOF2) JPEG decode, no codec libs — the largest
    real-corpus modality gap after baseline (a big share of web-crawl
    images are progressive). Full T.81 Annex G: multiple SOS scans with
    spectral selection (DC scan + per-component AC band scans) and
    successive approximation (point-transformed first scans, then DC
    OR-bit and AC correction-bit refinement scans; every 4th fixture
    uses TWO approximation rounds), EOB-RUN codes spanning blocks, and
    coefficient accumulation across scans feeding the same dequantize ->
    IDCT -> level-shift tail as baseline. Features and oracle are
    identical to ``mm_decode_jpeg`` — same pixels, different wire
    layout — so the hash proves multi-scan reassembly is exact.
    Scale: files parallelize via binaryFile + mapInPandas; only O(1)
    features per image leave the Arrow batch."""
    import numpy as np

    d = _jpeg_progressive_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )
    sign = np.asarray(AC44_SIGN, dtype=np.int64)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                w, h, nc, px = decode_jpeg_progressive(bytes(content))
                assert nc == 1
                p = px.astype(np.int64)
                weights = np.outer(
                    np.tile(sign, h // 8), np.tile(sign, w // 8)
                )
                rows.append(
                    (
                        img_id, w, h,
                        int(p.sum()),
                        int((p * weights).sum()),
                        int(p[0, 0]), int(p[h - 1, w - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "sum_lum",
                    "checker_sum", "topleft", "bottomright",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, width int, height int, sum_lum bigint, "
            "checker_sum bigint, topleft int, bottomright int"
        ),
    )


@register(
    "mm_jpeg_progressive_preview",
    tags=("llm", "multimodal", "decode", "thumbnail", "pandas-udf"),
    # The DC-first-scan preview: with the fixtures' all-ones quant
    # table, DC = 8*(v-128) is a multiple of 8, so the Al-bit point
    # transform loses nothing and the 1/8-scale preview equals v
    # exactly — the oracle drops the k term entirely, so a previewer
    # secretly decoding further scans (checkerboard leaks into the
    # block pixel) hash-mismatches, and so does one that rounds the
    # truncated DC wrongly.
    oracle=f"""
WITH imgs AS (
  SELECT i, 2 + i % 3 AS wb, 1 + i % 2 AS hb FROM range({JPEG_PROG_N}) t(i)
),
blk AS (
  SELECT i, wb, hb, bxx.bx AS bx, byy.by AS by,
         8 + (37 * bxx.bx + 59 * byy.by + 11 * i) % 240 AS v
  FROM imgs,
       LATERAL unnest(range(0, wb)) AS bxx(bx),
       LATERAL unnest(range(0, hb)) AS byy(by)
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(wb) AS INTEGER) AS thumb_w,
       CAST(MAX(hb) AS INTEGER) AS thumb_h,
       CAST(SUM(v) AS BIGINT) AS thumb_sum,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN v END) AS INTEGER)
         AS topleft,
       CAST(MAX(CASE WHEN bx = wb - 1 AND by = hb - 1 THEN v END)
            AS INTEGER) AS bottomright
FROM blk GROUP BY i
""",
)
def mm_jpeg_progressive_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The progressive 'first paint': decode ONLY the first DC scan and
    stop — in a progressive stream that is a pure PREFIX read (the
    whole point of the format: previews without fetching the file),
    unlike baseline DC thumbnails which still walk every AC code. At
    100 TB this is the cheapest image triage there is: bytes read per
    image ~= header + one scan. Same fixture set as
    ``mm_decode_jpeg_progressive``; the oracle keeps only the flat
    level v (AC scans untouched by construction)."""
    import numpy as np

    d = _jpeg_progressive_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                tw, th, nc, thumb = decode_jpeg_progressive(
                    bytes(content), dc_only=True
                )
                assert nc == 1
                t = thumb.astype(np.int64)
                rows.append(
                    (
                        img_id, tw, th,
                        int(t.sum()),
                        int(t[0, 0]), int(t[th - 1, tw - 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "thumb_w", "thumb_h", "thumb_sum",
                    "topleft", "bottomright",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, thumb_w int, thumb_h int, thumb_sum bigint, "
            "topleft int, bottomright int"
        ),
    )


# --- color (3-component 4:4:4) ------------------------------------------------

JPEG_COLOR_N = 40


def _jc_y(bx: int, by: int, i: int) -> int:
    return 16 + (29 * bx + 31 * by + 7 * i) % 220


def _jc_cb(bx: int, by: int, i: int) -> int:
    return 16 + (13 * bx + 17 * by + 5 * i) % 220


def _jc_cr(bx: int, by: int, i: int) -> int:
    return 16 + (11 * bx + 23 * by + 3 * i) % 220


def _jc_dims(i: int) -> tuple[int, int]:
    return 2 + i % 2, 1 + i % 2


def write_jpeg_color_fixture(path: str, i: int) -> None:
    """Flat Y/Cb/Cr per block (AC coverage lives in the grayscale
    query); interleaved 4:4:4 MCUs."""
    wb, hb = _jc_dims(i)
    blocks: list[list[int]] = []
    for by in range(hb):
        for bx in range(wb):
            blocks.append(flat_ac44_blocks(_jc_y(bx, by, i), 0))
            blocks.append(flat_ac44_blocks(_jc_cb(bx, by, i), 0))
            blocks.append(flat_ac44_blocks(_jc_cr(bx, by, i), 0))
    data = encode_jpeg_baseline(wb * 8, hb * 8, blocks, ncomp=3)
    with open(path, "wb") as f:
        f.write(data)


def _jpeg_color_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        write_jpeg_color_fixture,
        encode_jpeg_baseline,
        flat_ac44_blocks,
        _jc_y,
        _jc_cb,
        _jc_cr,
        _jc_dims,
        JPEG_COLOR_N,
    )
    d = _os.path.join(SCRATCH, f"jpeg_color_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(JPEG_COLOR_N):
        p = _os.path.join(d, f"img_{i:04d}.jpg")
        if not _os.path.exists(p):
            tmp = p + ".tmp"
            write_jpeg_color_fixture(tmp, i)
            _os.replace(tmp, p)
    return d


@register(
    "mm_decode_jpeg_color",
    tags=("llm", "multimodal", "decode", "pandas-udf"),
    # The JFIF YCbCr->RGB conversion is mirrored FLOAT-FOR-FLOAT: the
    # decoder rounds each plane to exact integers before converting, so
    # both engines evaluate the same IEEE expression on the same
    # integers; test_round8_ops enumerates the whole fixture domain and
    # proves no channel value lands on an exact .5 tie (where numpy's
    # half-to-even and SQL's half-away would split). Constants must be
    # CAST AS DOUBLE — bare literals parse DECIMAL in DuckDB.
    oracle=f"""
WITH imgs AS (
  SELECT i, 2 + i % 2 AS wb, 1 + i % 2 AS hb FROM range({JPEG_COLOR_N}) t(i)
),
blk AS (
  SELECT i, wb, hb, bxx.bx AS bx, byy.by AS by,
         CAST(16 + (29 * bxx.bx + 31 * byy.by + 7 * i) % 220 AS DOUBLE) AS y,
         CAST(16 + (13 * bxx.bx + 17 * byy.by + 5 * i) % 220 AS DOUBLE) AS cb,
         CAST(16 + (11 * bxx.bx + 23 * byy.by + 3 * i) % 220 AS DOUBLE) AS cr
  FROM imgs,
       LATERAL unnest(range(0, wb)) AS bxx(bx),
       LATERAL unnest(range(0, hb)) AS byy(by)
),
rgb AS (
  SELECT i, wb, hb, bx, by,
         LEAST(255.0, GREATEST(0.0,
           round(y + CAST(1.402 AS DOUBLE) * (cr - 128.0)))) AS r,
         LEAST(255.0, GREATEST(0.0,
           round(y - CAST(0.344136 AS DOUBLE) * (cb - 128.0)
                   - CAST(0.714136 AS DOUBLE) * (cr - 128.0)))) AS g,
         LEAST(255.0, GREATEST(0.0,
           round(y + CAST(1.772 AS DOUBLE) * (cb - 128.0)))) AS b
  FROM blk
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(wb) * 8 AS INTEGER) AS width,
       CAST(MAX(hb) * 8 AS INTEGER) AS height,
       CAST(SUM(64 * r) AS BIGINT) AS sum_r,
       CAST(SUM(64 * g) AS BIGINT) AS sum_g,
       CAST(SUM(64 * b) AS BIGINT) AS sum_b,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 THEN r END) AS INTEGER)
         AS topleft_r,
       CAST(MAX(CASE WHEN bx = wb - 1 AND by = hb - 1 THEN b END) AS INTEGER)
         AS bottomright_b
FROM rgb GROUP BY i
""",
)
def mm_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR baseline JPEG decode: interleaved 4:4:4 YCbCr MCUs through
    the full entropy path, then the JFIF color conversion — per-image
    RGB channel sums and corners vs a closed-form oracle that mirrors
    the conversion float-for-float (flat blocks decode to exact
    integers first, so both engines round the identical IEEE doubles;
    the fixture domain is enumerated tie-free in tests). Scale: same
    binaryFile + mapInPandas shape as the grayscale query."""
    import numpy as np

    d = _jpeg_color_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                w, h, nc, px = decode_jpeg_baseline(bytes(content))
                assert nc == 3
                p = px.astype(np.int64)
                rows.append(
                    (
                        img_id, w, h,
                        int(p[:, :, 0].sum()),
                        int(p[:, :, 1].sum()),
                        int(p[:, :, 2].sum()),
                        int(p[0, 0, 0]), int(p[h - 1, w - 1, 2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "sum_r", "sum_g",
                    "sum_b", "topleft_r", "bottomright_b",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, width int, height int, sum_r bigint, "
            "sum_g bigint, sum_b bigint, topleft_r int, bottomright_b int"
        ),
    )


# --- 4:2:0 chroma subsampling (the dominant real-world layout) ----------------

JPEG_420_N = 40


def _j420_mcus(i: int) -> tuple[int, int]:
    return 1 + i % 3, 1 + i % 2  # MCUs (16x16 px) wide, high


def _j420_y(bx: int, by: int, i: int) -> int:
    return 16 + (29 * bx + 31 * by + 7 * i) % 220


def _j420_k(bx: int, by: int, i: int) -> int:
    return 1 + (bx + by + i) % 5


def _j420_cb(mx: int, my: int, i: int) -> int:
    return 16 + (13 * mx + 17 * my + 5 * i) % 220


def _j420_cr(mx: int, my: int, i: int) -> int:
    return 16 + (11 * mx + 23 * my + 3 * i) % 220


def write_jpeg_420_fixture(path: str, i: int) -> None:
    """4:2:0 MCUs: four flat+AC44 Y blocks + one flat Cb + one flat Cr
    per 16x16 MCU — Y carries the AC checkerboard (so the AC path runs
    UNDER subsampling), chroma is flat so 2x2 replication is exact."""
    mw, mh = _j420_mcus(i)
    blocks: list[list[int]] = []
    for my in range(mh):
        for mx in range(mw):
            for b in range(4):  # Y blocks row-major within the MCU
                bx, by = mx * 2 + b % 2, my * 2 + b // 2
                blocks.append(
                    flat_ac44_blocks(_j420_y(bx, by, i), _j420_k(bx, by, i))
                )
            blocks.append(flat_ac44_blocks(_j420_cb(mx, my, i), 0))
            blocks.append(flat_ac44_blocks(_j420_cr(mx, my, i), 0))
    data = encode_jpeg_baseline(
        mw * 16,
        mh * 16,
        blocks,
        ncomp=3,
        sampling=[(2, 2), (1, 1), (1, 1)],
        restart_interval=2 if i % 4 == 0 else 0,
    )
    with open(path, "wb") as f:
        f.write(data)


def _jpeg_420_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        write_jpeg_420_fixture,
        encode_jpeg_baseline,
        flat_ac44_blocks,
        _j420_mcus,
        _j420_y,
        _j420_k,
        _j420_cb,
        _j420_cr,
        JPEG_420_N,
    )
    d = _os.path.join(SCRATCH, f"jpeg_420_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(JPEG_420_N):
        p = _os.path.join(d, f"img_{i:04d}.jpg")
        if not _os.path.exists(p):
            tmp = p + ".tmp"
            write_jpeg_420_fixture(tmp, i)
            _os.replace(tmp, p)
    return d


@register(
    "mm_decode_jpeg_420",
    tags=("llm", "multimodal", "decode", "pandas-udf"),
    # Each Y block holds exactly two pixel values (v +- k on the AC44
    # checkerboard, 32 pixels each); chroma is flat per MCU and 2x2
    # replication of a constant is exact — so every pixel's RGB is one
    # of two closed-form conversions per block. Domain enumerated
    # tie-free in tests (numpy half-even == SQL half-away when no .5).
    oracle=f"""
WITH imgs AS (
  SELECT i, 1 + i % 3 AS mw, 1 + i % 2 AS mh FROM range({JPEG_420_N}) t(i)
),
yblk AS (
  SELECT i, mw, mh, bxx.bx AS bx, byy.by AS by,
         bxx.bx // 2 AS mx, byy.by // 2 AS my
  FROM imgs,
       LATERAL unnest(range(0, 2 * mw)) AS bxx(bx),
       LATERAL unnest(range(0, 2 * mh)) AS byy(by)
),
vals AS (
  SELECT i, mw, mh, bx, by,
         CAST(16 + (29 * bx + 31 * by + 7 * i) % 220 AS DOUBLE) AS y,
         CAST(1 + (bx + by + i) % 5 AS DOUBLE) AS k,
         CAST(16 + (13 * mx + 17 * my + 5 * i) % 220 AS DOUBLE) AS cb,
         CAST(16 + (11 * mx + 23 * my + 3 * i) % 220 AS DOUBLE) AS cr
  FROM yblk
),
px AS (
  SELECT i, mw, mh, bx, by, cls.sgn AS sgn, y + cls.sgn * k AS yy, cb, cr
  FROM vals, (SELECT 1 AS sgn UNION ALL SELECT -1 AS sgn) cls
),
rgb AS (
  SELECT i, mw, mh, bx, by, sgn,
         LEAST(255.0, GREATEST(0.0,
           round(yy + CAST(1.402 AS DOUBLE) * (cr - 128.0)))) AS r,
         LEAST(255.0, GREATEST(0.0,
           round(yy - CAST(0.344136 AS DOUBLE) * (cb - 128.0)
                    - CAST(0.714136 AS DOUBLE) * (cr - 128.0)))) AS g,
         LEAST(255.0, GREATEST(0.0,
           round(yy + CAST(1.772 AS DOUBLE) * (cb - 128.0)))) AS b
  FROM px
)
SELECT CAST(i AS BIGINT) AS img_id,
       CAST(MAX(mw) * 16 AS INTEGER) AS width,
       CAST(MAX(mh) * 16 AS INTEGER) AS height,
       CAST(SUM(32 * r) AS BIGINT) AS sum_r,
       CAST(SUM(32 * g) AS BIGINT) AS sum_g,
       CAST(SUM(32 * b) AS BIGINT) AS sum_b,
       CAST(MAX(CASE WHEN bx = 0 AND by = 0 AND sgn = 1 THEN r END)
            AS INTEGER) AS topleft_r,
       CAST(MAX(CASE WHEN bx = 2 * mw - 1 AND by = 2 * mh - 1 AND sgn = 1
                THEN b END) AS INTEGER) AS bottomright_b
FROM rgb GROUP BY i
""",
)
def mm_decode_jpeg_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 baseline JPEG decode — the layout virtually every camera
    and web encoder emits: 16x16 MCUs of four Y blocks + one Cb + one
    Cr, quarter-resolution chroma replicated back up (JFIF nearest)
    before conversion. Y carries the AC44 checkerboard so the AC
    entropy path runs UNDER subsampling, and every 4th fixture uses
    restart markers. Per-image RGB sums and corners vs the closed-form
    oracle (see the register comment for why lossy 4:2:0 is exactly
    predictable here). Same binaryFile + mapInPandas scale shape as the
    other decode queries."""
    import numpy as np

    d = _jpeg_420_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.jpg"))
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img_id = int(path.rsplit("img_", 1)[1][:4])
                w, h, nc, px = decode_jpeg_baseline(bytes(content))
                assert nc == 3
                p = px.astype(np.int64)
                rows.append(
                    (
                        img_id, w, h,
                        int(p[:, :, 0].sum()),
                        int(p[:, :, 1].sum()),
                        int(p[:, :, 2].sum()),
                        int(p[0, 0, 0]), int(p[h - 1, w - 1, 2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "sum_r", "sum_g",
                    "sum_b", "topleft_r", "bottomright_b",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "img_id bigint, width int, height int, sum_r bigint, "
            "sum_g bigint, sum_b bigint, topleft_r int, bottomright_b int"
        ),
    )
