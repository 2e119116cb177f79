"""FLAC (Free Lossless Audio Codec, RFC 9639) — pure-stdlib subset.

The third audio family (after G.711 companding and IMA ADPCM in
``multimodal.py``) and the first with real entropy coding: Rice-coded
prediction residuals under bit-level framing. Covered subset:

  * container: "fLaC" magic + STREAMINFO (the mandatory metadata
    block: geometry, total samples, and the MD5 of the raw PCM);
  * frames: fixed-blocking frame headers with UTF-8-coded frame
    numbers, the uncommon-blocksize escape for the partial final
    frame, CRC-8 over the header, CRC-16 over the whole frame;
  * subframes: CONSTANT, VERBATIM, and FIXED predictors (orders
    0-4 on decode; the encoder picks the cheapest of 0-2 per frame);
  * residuals: partitioned-Rice method 0, including the 4-bit
    escape-to-raw-bits code, zigzag folding, per-partition params;
  * stereo decorrelation: independent, left/side, right/side and
    mid/side on decode (side channels carry bps+1 bits per spec);
    the encoder writes mono and left/side.

LPC subframes (order-N quantized linear prediction) are rejected with
a clear error — the honest boundary: FIXED covers the prediction
recursion (the stateful part) while LPC adds only coefficient
plumbing.

Verification layers: (1) the decode recursion s[n] = res[n] +
2s[n-1] - s[n-2] must land exactly on the closed-form fixture signal
the DuckDB oracle computes DIRECTLY — two different computations of
the same samples, hash-compared per frame; (2) CRC-8/CRC-16 verified
on every frame (tamper tests); (3) the STREAMINFO MD5 must equal the
MD5 of the decoded PCM — and the per-frame oracle carries sums and
sample hashes a decoder that shortcuts to STREAMINFO cannot produce.

Format reference: RFC 9639 / xiph.org/flac/format.html (public spec).
The reference repo has no audio path (SURVEY.md §2); this family
serves the training-data-pipeline mandate.
"""

from __future__ import annotations

import hashlib
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (query projections)

from ..registry import register

FLAC_MAGIC = b"fLaC"

# --- CRCs (FLAC polynomials) -------------------------------------------------

_CRC8_TBL = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL.append(_c)

_CRC16_TBL = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TBL.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# --- MSB-first bit IO --------------------------------------------------------


class _Bits:
    """MSB-first bit writer with byte-aligned flush."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, value: int, bits: int) -> None:
        if bits and value >> bits:
            raise ValueError("flac: value wider than field")
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def s(self, value: int, bits: int) -> None:
        self.u(value & ((1 << bits) - 1), bits)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.n:
            self.u(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("flac: unaligned bit buffer")
        return bytes(self.out)


class _BitsReader:
    """MSB-first bit reader over a byte window."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def u(self, bits: int) -> int:
        v = 0
        bp = self.bitpos
        data = self.data
        for _ in range(bits):
            v = (v << 1) | ((data[bp >> 3] >> (7 - (bp & 7))) & 1)
            bp += 1
        self.bitpos = bp
        return v

    def s(self, bits: int) -> int:
        v = self.u(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def unary(self) -> int:
        q = 0
        bp = self.bitpos
        data = self.data
        while (data[bp >> 3] >> (7 - (bp & 7))) & 1 == 0:
            q += 1
            bp += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary code")
        self.bitpos = bp + 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        return self.bitpos >> 3


# --- UTF-8-style frame number (spec: like UTF-8, up to 36 bits) -------------


def encode_frame_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    parts = []
    if n < 0x800:
        lead, k = 0xC0, 1
    elif n < 0x10000:
        lead, k = 0xE0, 2
    elif n < 0x200000:
        lead, k = 0xF0, 3
    elif n < 0x4000000:
        lead, k = 0xF8, 4
    else:
        lead, k = 0xFC, 5
    for _ in range(k):
        parts.append(0x80 | (n & 0x3F))
        n >>= 6
    parts.append(lead | n)
    return bytes(reversed(parts))


def decode_frame_number(r: _BitsReader) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    if b0 == 0xFF:
        # 0xFF & 0xFE == 0xFE would false-match the 6-continuation
        # pattern below, but 0xFF is spec-invalid as a lead byte (the
        # UTF-8-style coding tops out at 0xFE).
        raise ValueError("flac: bad frame-number lead byte")
    k = 0
    for lead, kk in ((0xFE, 6), (0xFC, 5), (0xF8, 4), (0xF0, 3), (0xE0, 2), (0xC0, 1)):
        if (b0 & ~((1 << (7 - kk)) - 1)) == lead:
            k = kk
            n = b0 & ((1 << (7 - kk)) - 1)
            break
    else:
        raise ValueError("flac: bad frame-number lead byte")
    for _ in range(k):
        cont = r.u(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad frame-number continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


# --- fixed predictors --------------------------------------------------------


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    """Forward: residual of the order-N fixed predictor (successive
    differencing, the spec's definition)."""
    res = list(samples)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _fixed_restore(warmup: list[int], res: list[int], order: int) -> list[int]:
    """Inverse recursion — the STATEFUL decode: each sample depends on
    the previous ``order`` decoded samples."""
    s = list(warmup)
    if order == 0:
        return list(res)
    for r in res:
        if order == 1:
            s.append(r + s[-1])
        elif order == 2:
            s.append(r + 2 * s[-1] - s[-2])
        elif order == 3:
            s.append(r + 3 * s[-1] - 3 * s[-2] + s[-3])
        else:
            s.append(r + 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4])
    return s


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _best_rice_param(res: list[int], cap: int = 14) -> int:
    if not res:
        return 0
    total = sum(_zigzag(r) for r in res)
    mean = total / len(res) if res else 0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < cap:
        k += 1
    return k


# --- encoder -----------------------------------------------------------------

BLOCK = 576  # fixed block size (a spec-standard code-2 size)


def _write_subframe(w: _Bits, samples: list[int], bps: int) -> None:
    """Pick CONSTANT / FIXED(0-2) (VERBATIM is the escape hatch) and
    emit one subframe."""
    if all(v == samples[0] for v in samples):
        w.u(0, 1)
        w.u(0, 6)  # CONSTANT
        w.u(0, 1)
        w.s(samples[0], bps)
        return
    best_order, best_cost = 0, None
    for order in range(0, 3):
        if order >= len(samples):
            break
        res = _fixed_residual(samples, order)
        k = _best_rice_param(res)
        cost = order * bps + sum(_zigzag(r) >> k for r in res) + len(res) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    if best_cost is not None and best_cost > len(samples) * bps:
        w.u(0, 1)
        w.u(1, 6)  # VERBATIM
        w.u(0, 1)
        for v in samples:
            w.s(v, bps)
        return
    order = best_order
    res = _fixed_residual(samples, order)
    w.u(0, 1)
    w.u(8 | order, 6)  # FIXED
    w.u(0, 1)  # no wasted bits
    for v in samples[:order]:
        w.s(v, bps)
    # residual: method 0 (4-bit Rice), partition order 0
    w.u(0, 2)
    w.u(0, 4)
    k = _best_rice_param(res)
    max_u = max((_zigzag(r) for r in res), default=0)
    if (max_u >> k) > 1 << 16:  # pathological: escape to raw bits
        bits = max(max_u.bit_length() + 1, 2)
        w.u(0xF, 4)
        w.u(bits, 5)
        for r in res:
            w.s(r, bits)
        return
    w.u(k, 4)
    for r in res:
        u = _zigzag(r)
        w.unary(u >> k)
        if k:
            w.u(u & ((1 << k) - 1), k)


def write_flac(
    path: str,
    channels: list[list[int]],
    sample_rate: int = 44100,
    stereo_mode: str = "left_side",
) -> None:
    """Write a FLAC file: 16-bit PCM, fixed 576-sample blocks, mono
    (1 channel) or decorrelated stereo (2 channels; ``stereo_mode`` in
    left_side / right_side / mid_side / independent — all four wire
    forms, so every decoder reconstruction path is testable)."""
    n_ch = len(channels)
    if n_ch not in (1, 2):
        raise ValueError("flac: mono or stereo only")
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("flac: channel length mismatch")
    bps = 16
    # PCM md5: interleaved little-endian s16 (the spec's definition)
    md = hashlib.md5()
    for i in range(total):
        for c in channels:
            md.update(struct.pack("<h", c[i]))
    out = bytearray()
    out += FLAC_MAGIC
    info = _Bits()
    info.u(1, 1)  # last metadata block
    info.u(0, 7)  # STREAMINFO
    info.u(34, 24)
    info.u(BLOCK, 16)  # min block size
    info.u(BLOCK, 16)  # max block size
    info.u(0, 24)  # min frame size unknown
    info.u(0, 24)  # max frame size unknown
    info.u(sample_rate, 20)
    info.u(n_ch - 1, 3)
    info.u(bps - 1, 5)
    info.u(total, 36)
    body = info.bytes() + md.digest()
    out += body
    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(BLOCK, total - pos)
        w = _Bits()
        w.u(0x3FFE, 14)  # sync
        w.u(0, 1)
        w.u(0, 1)  # fixed blocking
        w.u(2 if n == BLOCK else 7, 4)  # 576, or uncommon-16bit escape
        w.u(0, 4)  # sample rate: from STREAMINFO
        if n_ch == 1:
            w.u(0, 4)  # mono
        else:
            w.u(
                {"independent": 1, "left_side": 8, "right_side": 9,
                 "mid_side": 10}[stereo_mode],
                4,
            )
        w.u(4, 3)  # 16 bps
        w.u(0, 1)
        for b in encode_frame_number(frame_idx):
            w.u(b, 8)
        if n != BLOCK:
            w.u(n - 1, 16)
        header = bytes(w.out) if w.n == 0 else None
        if header is None:
            raise ValueError("flac: header must be byte-aligned here")
        w.u(crc8(header), 8)
        if n_ch == 1:
            _write_subframe(w, channels[0][pos : pos + n], bps)
        else:
            left = channels[0][pos : pos + n]
            right = channels[1][pos : pos + n]
            side = [left[i] - right[i] for i in range(n)]
            if stereo_mode == "independent":
                _write_subframe(w, left, bps)
                _write_subframe(w, right, bps)
            elif stereo_mode == "left_side":
                _write_subframe(w, left, bps)
                _write_subframe(w, side, bps + 1)  # side carries bps+1
            elif stereo_mode == "right_side":
                _write_subframe(w, side, bps + 1)  # side comes FIRST
                _write_subframe(w, right, bps)
            else:  # mid_side
                mid = [(left[i] + right[i]) >> 1 for i in range(n)]
                _write_subframe(w, mid, bps)
                _write_subframe(w, side, bps + 1)
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
        pos += n
        frame_idx += 1
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


# --- decoder -----------------------------------------------------------------


def _read_residual(r: _BitsReader, n: int, order: int) -> list[int]:
    method = r.u(2)
    if method not in (0, 1):
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.u(4)
    res: list[int] = []
    n_parts = 1 << part_order
    for p in range(n_parts):
        count = n >> part_order
        if p == 0:
            count -= order
        param = r.u(pbits)
        if param == escape:
            bits = r.u(5)
            res.extend(r.s(bits) if bits else 0 for _ in range(count))
        else:
            for _ in range(count):
                q = r.unary()
                u = (q << param) | (r.u(param) if param else 0)
                res.append(_unzigzag(u))
    return res


def _read_subframe(r: _BitsReader, n: int, bps: int) -> list[int]:
    if r.u(1):
        raise ValueError("flac: subframe padding bit set")
    stype = r.u(6)
    wasted = 0
    if r.u(1):  # wasted-bits flag: unary count follows
        wasted = r.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        samples = [r.s(bps)] * n
    elif stype == 1:  # VERBATIM
        samples = [r.s(bps) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warmup = [r.s(bps) for _ in range(order)]
        res = _read_residual(r, n, order)
        samples = _fixed_restore(warmup, res, order)
    elif stype >= 32:
        raise ValueError("flac: LPC subframes out of scope (FIXED only)")
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = [v << wasted for v in samples]
    return samples


def parse_flac(buf: bytes):
    """Parse a FLAC file -> (streaminfo dict, [frame dicts]). Verifies
    the magic, the frame-header CRC-8, the frame CRC-16, and the
    STREAMINFO MD5 against the decoded PCM."""
    if buf[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        hdr = buf[pos]
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + length]
        if btype == 0:
            r = _BitsReader(body)
            info = {
                "min_block": r.u(16),
                "max_block": r.u(16),
                "min_frame": r.u(24),
                "max_frame": r.u(24),
                "sample_rate": r.u(20),
                "channels": r.u(3) + 1,
                "bps": r.u(5) + 1,
                "total_samples": r.u(36),
                "md5": body[18:34].hex(),
            }
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    frames = []
    md = hashlib.md5()
    decoded = 0
    while pos < len(buf) and decoded < info["total_samples"]:
        frame_start = pos
        r = _BitsReader(buf, pos)
        if r.u(14) != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        r.u(1)
        blocking = r.u(1)
        bs_code = r.u(4)
        sr_code = r.u(4)
        ch_code = r.u(4)
        ss_code = r.u(3)
        r.u(1)
        number = decode_frame_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = r.u(8) + 1
        elif bs_code == 7:
            n = r.u(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            r.u(8)
        elif sr_code in (13, 14):
            r.u(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        header_len = r.byte_pos() - pos
        want_crc8 = r.u(8)
        if crc8(buf[pos : pos + header_len]) != want_crc8:
            raise ValueError(f"flac: frame {number} header CRC-8 mismatch")
        bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, info["bps"])
        if ch_code < 8:
            chans = [_read_subframe(r, n, bps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, n, bps)
            side = _read_subframe(r, n, bps + 1)
            chans = [left, [left[i] - side[i] for i in range(n)]]
        elif ch_code == 9:  # right/side: side first
            side = _read_subframe(r, n, bps + 1)
            right = _read_subframe(r, n, bps)
            chans = [[right[i] + side[i] for i in range(n)], right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(r, n, bps)
            side = _read_subframe(r, n, bps + 1)
            chans = [[0] * n, [0] * n]
            for i in range(n):
                m2 = (mid[i] << 1) | (side[i] & 1)
                chans[0][i] = (m2 + side[i]) >> 1
                chans[1][i] = (m2 - side[i]) >> 1
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        r.align()
        body_len = r.byte_pos() - frame_start
        (want_crc16,) = struct.unpack_from(">H", buf, frame_start + body_len)
        if crc16(buf[frame_start : frame_start + body_len]) != want_crc16:
            raise ValueError(f"flac: frame {number} CRC-16 mismatch")
        pos = frame_start + body_len + 2
        for i in range(n):
            for c in chans:
                md.update(struct.pack("<h", c[i]))
        decoded += n
        frames.append(
            {
                "frame_idx": number,
                "n_samples": n,
                "blocking": blocking,
                "channels": chans,
            }
        )
    if decoded != info["total_samples"]:
        raise ValueError("flac: sample count mismatch vs STREAMINFO")
    if md.hexdigest() != info["md5"]:
        raise ValueError("flac: decoded PCM MD5 does not match STREAMINFO")
    return info, frames


# --- fixtures + queries ------------------------------------------------------

FLAC_FILES = 4


def _flac_signal(f: int, c: int, n: int) -> int:
    """Closed-form sample n of channel c, file f — integer arithmetic
    only, so DuckDB recomputes it bitwise. The quadratic term keeps
    order-2 residuals small between modulo wraps; the wraps inject
    occasional large residuals, which is exactly what the Rice coder
    must absorb."""
    return ((n * n * (3 + c) + n * (7 + f) + f * 13 + c * 5) % 3999) - 2000


def _flac_total(f: int) -> int:
    return BLOCK * 3 + 100 + f * 37  # 4 frames, last one partial


def _flac_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        _flac_signal, _flac_total, write_flac, _write_subframe, FLAC_FILES
    )
    d = os.path.join(SCRATCH, f"flac_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(FLAC_FILES):
            total = _flac_total(f)
            n_ch = 1 if f % 2 == 0 else 2
            chans = [
                [_flac_signal(f, c, n) for n in range(total)]
                for c in range(n_ch)
            ]
            write_flac(os.path.join(d, f"audio_{f:04d}.flac"), chans)
        open(os.path.join(d, "_DONE"), "w").close()
    return d


_SQL_FLAC_FRAMES = f"""
files AS (
  SELECT f.f, {BLOCK} * 3 + 100 + f.f * 37 AS total,
         CASE WHEN f.f % 2 = 0 THEN 1 ELSE 2 END AS n_ch
  FROM range({FLAC_FILES}) f(f)
),
frames AS (
  SELECT f, n_ch, fr.fr AS frame_idx,
         fr.fr * {BLOCK} AS start_n,
         least({BLOCK}, total - fr.fr * {BLOCK}) AS n_samples
  FROM files, LATERAL unnest(range(0, CAST(ceil(total / {BLOCK}.0) AS BIGINT)))
       AS fr(fr)
),
samples AS (
  SELECT fr.f, fr.frame_idx, fr.n_samples, c.c AS channel, i.i AS i,
         ((fr.start_n + i.i) * (fr.start_n + i.i) * (3 + c.c)
          + (fr.start_n + i.i) * (7 + fr.f) + fr.f * 13 + c.c * 5) % 3999
         - 2000 AS v
  FROM frames fr,
       LATERAL unnest(range(0, fr.n_ch)) AS c(c),
       LATERAL unnest(range(0, fr.n_samples)) AS i(i)
)
"""


@register(
    "mm_audio_flac_decode",
    tags=("multimodal", "audio", "binary", "stateful"),
    oracle=f"""
WITH {_SQL_FLAC_FRAMES}
SELECT CAST(f AS INTEGER) AS file_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(channel AS INTEGER) AS channel,
       CAST(n_samples AS INTEGER) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_samples,
       md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS samples_md5
FROM samples
GROUP BY f, frame_idx, channel, n_samples
""",
)
def mm_audio_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real FLAC files frame by frame — Rice residuals, fixed-
    predictor recursion, left/side stereo reconstruction, CRC-8/16 and
    STREAMINFO-MD5 verification — and emit per-frame per-channel sums
    and sample hashes. The oracle computes the SAME samples directly
    from the closed-form signal: the decoder's stateful recursion and
    DuckDB's direct formula must agree bitwise on every sample of
    every frame (the md5 rides the comma-joined sample list), so a
    decoder that shortcuts — reads STREAMINFO, skips residuals,
    mis-handles the partial final frame or the side channel's extra
    bit — hash-mismatches.

    Scale: one decode task per file via binaryFile; frames restart
    prediction state from their warmup samples, which is what makes
    frame-parallel decode legal (same property ADPCM blocks have)."""
    import pandas as pd  # noqa: F401

    d = _flac_fixture_dir()

    def _parse(iterator):
        import hashlib as _h

        import pandas as pd

        cols = ["path", "frame_idx", "channel", "n_samples",
                "sum_samples", "samples_md5"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                _info, frames = parse_flac(bytes(content))
                for fr in frames:
                    for c, samples in enumerate(fr["channels"]):
                        joined = ",".join(str(v) for v in samples)
                        rows.append((
                            path_, fr["frame_idx"], c, fr["n_samples"],
                            sum(samples),
                            _h.md5(joined.encode()).hexdigest(),
                        ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.flac"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, frame_idx int, channel int, n_samples int, "
            "sum_samples bigint, samples_md5 string",
        )
    )
    return df.select(
        F.regexp_extract("path", r"audio_(\d{4})\.flac", 1)
        .cast("int")
        .alias("file_id"),
        "frame_idx",
        "channel",
        "n_samples",
        "sum_samples",
        "samples_md5",
    )


@register(
    "mm_audio_flac_streaminfo",
    tags=("multimodal", "audio", "binary"),
    oracle=f"""
SELECT CAST(f.f AS INTEGER) AS file_id,
       44100 AS sample_rate,
       CAST(CASE WHEN f.f % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS channels,
       16 AS bps,
       CAST({BLOCK} * 3 + 100 + f.f * 37 AS BIGINT) AS total_samples,
       CAST(CEIL(({BLOCK} * 3 + 100 + f.f * 37) / {BLOCK}.0) AS INTEGER)
         AS n_frames
FROM range({FLAC_FILES}) f(f)
""",
)
def mm_audio_flac_streaminfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMINFO metadata + actual frame count per file: the header
    read a curation pipeline does first (duration, geometry), with the
    frame count proving the frame walk agrees with the header's
    total-sample claim."""
    import pandas as pd  # noqa: F401

    d = _flac_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "sample_rate", "channels", "bps",
                "total_samples", "n_frames"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                info, frames = parse_flac(bytes(content))
                rows.append((
                    path_, info["sample_rate"], info["channels"],
                    info["bps"], info["total_samples"], len(frames),
                ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.flac"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, sample_rate int, channels int, bps int, "
            "total_samples bigint, n_frames int",
        )
    )
    return df.select(
        F.regexp_extract("path", r"audio_(\d{4})\.flac", 1)
        .cast("int")
        .alias("file_id"),
        "sample_rate",
        "channels",
        "bps",
        "total_samples",
        "n_frames",
    )
