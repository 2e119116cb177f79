"""Pure-stdlib Zstandard (RFC 8878) codec.

Kafka codec id 4 (record-batch v2 only — zstd postdates message-format
v1 and brokers reject it there), parquet CompressionCodec ZSTD(6), and
the Avro ``zstandard`` container codec all carry this format; this
module lets the hand-rolled wire/file readers in this package decode
real zstd data with zero native dependencies.

Decoder: the complete frame format — raw / RLE / compressed blocks,
FSE table descriptions (normalized-count bitstream), Huffman literals
(direct and FSE-compressed weights, 1-stream and 4-stream), sequences
in all four modes (predefined / RLE / FSE-compressed / repeat), the
three-slot repeat-offset history with its literals-length-zero
special case, cross-block state reuse, skippable frames, and the
xxHash64 content checksum. Everything is validated against libzstd
via pyarrow in tests/test_zstd_codec.py: pyarrow-compressed data at
several levels must decode byte-exactly, and our frames (including
checksummed ones — libzstd verifies xxHash64 on its side) must
round-trip through pyarrow.

Encoders, two of them:
  * ``zstd_compress`` — raw/RLE-block frames ("stored blocks"):
    byte-deterministic with a CLOSED-FORM length
    (``zstd_raw_frame_len``), which is what wire-length oracles
    replay in SQL;
  * ``zstd_compress_lz`` — REAL compression: a greedy hash-match LZ
    pass whose sequences are FSE-entropy-coded under the spec's
    predefined distributions (raw literals, no table descriptions on
    the wire). Deterministic, conformant (libzstd round-trips it in
    tests), and the default for the Kafka producer, .warc.zst and
    Avro zstandard writers.

Format reference: RFC 8878 / github.com/facebook/zstd
doc/zstd_compression_format.md (public specification).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

MAX_BLOCK = 1 << 17  # 128 KiB, the format's Block_Maximum_Size cap

# --- xxHash64 (content checksum; low 32 bits are stored) -------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """xxHash64; xxhash64(b"") == 0xEF46DB3751D8E999. The checksummed-
    frame tests make libzstd verify this implementation independently."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while pos <= limit:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = (_rotl64((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= (_rotl64((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- bitstreams -------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward bitstream (FSE table descriptions)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte_pos = pos
        self.acc = 0
        self.navail = 0
        self.consumed = 0  # bits handed out

    def _fill(self, n: int) -> None:
        while self.navail < n:
            b = (
                self.data[self.byte_pos]
                if self.byte_pos < len(self.data)
                else 0
            )
            self.acc |= b << self.navail
            self.byte_pos += 1
            self.navail += 8

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.acc & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self._fill(n)
        self.acc >>= n
        self.navail -= n
        self.consumed += n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.skip(n)
        return v

    def byte_boundary(self, start: int) -> int:
        """Absolute byte offset of the next byte boundary after all
        bits consumed so far (stream began at ``start``)."""
        return start + (self.consumed + 7) // 8


class _BackBits:
    """Zstd backward bitstream: payload bits sit below a sentinel 1
    bit in the LAST byte and are consumed from the top downward.
    Reads past the start zero-fill and raise the ``deficit`` counter
    (mirroring libzstd's BIT_DStream overflow state, which the FSE
    two-state weight loop uses as its termination signal)."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty backward bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: backward bitstream missing sentinel")
        self.data = data
        self.nacc = last.bit_length() - 1  # bits below the sentinel
        self.acc = last & ((1 << self.nacc) - 1)
        self.byte_ptr = len(data) - 1  # bytes [0, byte_ptr) unread
        self.deficit = 0

    def _fill(self, n: int) -> None:
        while self.nacc < n and self.byte_ptr > 0:
            self.byte_ptr -= 1
            self.acc = (self.acc << 8) | self.data[self.byte_ptr]
            self.nacc += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        if self.nacc >= n:
            self.nacc -= n
            v = (self.acc >> self.nacc) & ((1 << n) - 1)
            self.acc &= (1 << self.nacc) - 1
            return v
        short = n - self.nacc
        v = self.acc << short  # zero-fill past the stream start
        self.acc = 0
        self.nacc = 0
        self.deficit += short
        return v

    def peek(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        if self.nacc >= n:
            return (self.acc >> (self.nacc - n)) & ((1 << n) - 1)
        return self.acc << (n - self.nacc)

    def skip(self, n: int) -> None:
        self.read(n)

    @property
    def overflowed(self) -> bool:
        return self.deficit > 0


# --- FSE --------------------------------------------------------------------


def fse_read_ncount(
    data: bytes, pos: int, max_symbol: int, max_accuracy: int
) -> tuple[int, list[int], int]:
    """Parse an FSE table description (RFC 8878 §4.1.1): the forward
    variable-bit normalized-count stream. Returns (accuracy_log,
    counts[0..max_symbol], next byte position)."""
    bits = _ForwardBits(data, pos)
    accuracy_log = bits.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"zstd: accuracy log {accuracy_log} > max {max_accuracy}"
        )
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nb_bits = accuracy_log + 1
    counts: list[int] = []
    previous0 = False
    while remaining > 1 and len(counts) <= max_symbol:
        if previous0:
            # runs of zero-probability symbols: 2-bit repeat flags,
            # value 3 chains
            while bits.peek(2) == 3:
                bits.skip(2)
                counts.extend([0, 0, 0])
            n0 = bits.read(2)
            counts.extend([0] * n0)
            if len(counts) > max_symbol:
                break
        maxv = (2 * threshold - 1) - remaining
        v = bits.peek(nb_bits)
        if (v & (threshold - 1)) < maxv:
            count = v & (threshold - 1)
            bits.skip(nb_bits - 1)
        else:
            count = v & (2 * threshold - 1)
            if count >= threshold:
                count -= maxv
            bits.skip(nb_bits)
        count -= 1  # -1 encodes the "less than one" probability
        remaining -= -count if count < 0 else count
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupted FSE normalized counts")
    if len(counts) > max_symbol + 1:
        raise ValueError("zstd: FSE table has too many symbols")
    counts.extend([0] * (max_symbol + 1 - len(counts)))
    return accuracy_log, counts, bits.byte_boundary(pos)


def fse_build_dtable(
    counts: list[int], accuracy_log: int
) -> list[tuple[int, int, int]]:
    """Decoding table: index by state, entry = (symbol, nb_bits,
    baseline); next state = baseline + read(nb_bits)."""
    size = 1 << accuracy_log
    table: list[int] = [-1] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:  # "less than one": a single cell at the table end
            table[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    symbol_next = [c if c > 0 else 1 for c in counts]
    out: list[tuple[int, int, int]] = []
    for state in range(size):
        s = table[state]
        nxt = symbol_next[s]
        symbol_next[s] += 1
        nb = accuracy_log - (nxt.bit_length() - 1)
        baseline = (nxt << nb) - size
        out.append((s, nb, baseline))
    return out


def _fse_rle_dtable(symbol: int) -> list[tuple[int, int, int]]:
    """Accuracy-log-0 table: always ``symbol``, zero update bits."""
    return [(symbol, 0, 0)]


# --- Huffman literals -------------------------------------------------------


def _huf_read_weights(data: bytes, pos: int) -> tuple[list[int], int]:
    """Huffman tree description (RFC 8878 §4.2.1): header byte >= 128
    means direct 4-bit weights; < 128 means an FSE-compressed weight
    stream of that many bytes, decoded with two alternating states."""
    header = data[pos]
    pos += 1
    if header >= 128:
        n = header - 127
        nbytes = (n + 1) // 2
        raw = data[pos : pos + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return weights, pos + nbytes
    comp = data[pos : pos + header]
    if len(comp) < header:
        raise ValueError("zstd: truncated FSE Huffman weights")
    al, counts, stream_pos = fse_read_ncount(comp, 0, 255, 6)
    dt = fse_build_dtable(counts, al)
    br = _BackBits(comp[stream_pos:])
    state1 = br.read(al)
    state2 = br.read(al)
    weights = []
    # libzstd's two-state interleave: decode+update until the stream
    # overflows, then flush one final symbol from the other state.
    while True:
        s, nb, base = dt[state1]
        weights.append(s)
        state1 = base + br.read(nb)
        if br.overflowed:
            weights.append(dt[state2][0])
            break
        s, nb, base = dt[state2]
        weights.append(s)
        state2 = base + br.read(nb)
        if br.overflowed:
            weights.append(dt[state1][0])
            break
        if len(weights) > 255:
            raise ValueError("zstd: runaway Huffman weight stream")
    return weights, pos + header


def huf_build_dtable(weights: list[int]) -> tuple[list[tuple[int, int]], int]:
    """Canonical Huffman decoding table from explicit weights (the
    last symbol's weight is implicit). Table is indexed by the next
    ``table_log`` bits; entries are (symbol, nb_bits). Filled in
    ascending weight, natural symbol order within a weight — lowest
    weights (longest codes) first, matching libzstd's rankVal fill."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: Huffman weights sum to zero")
    table_log = total.bit_length()  # smallest 2^k strictly > total
    if table_log > 11:
        raise ValueError(f"zstd: Huffman table log {table_log} > 11")
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise ValueError("zstd: Huffman weights do not complete a power of 2")
    last_weight = rest.bit_length()  # rest = 2^(w-1) → w
    full = weights + [last_weight]
    table: list[tuple[int, int]] = [(-1, 0)] * (1 << table_log)
    idx = 0
    for w in range(1, table_log + 1):
        run = 1 << (w - 1)
        nb = table_log + 1 - w
        for sym, ww in enumerate(full):
            if ww != w:
                continue
            for _ in range(run):
                table[idx] = (sym, nb)
                idx += 1
    if idx != 1 << table_log:
        raise ValueError("zstd: Huffman table fill incomplete")
    return table, table_log


def _huf_decode_stream(
    table: list[tuple[int, int]], table_log: int, data: bytes, out_len: int
) -> bytes:
    br = _BackBits(data)
    out = bytearray()
    for _ in range(out_len):
        sym, nb = table[br.peek(table_log)]
        if sym < 0:
            raise ValueError("zstd: invalid Huffman code")
        br.skip(nb)
        out.append(sym)
    return bytes(out)


# --- sequences: predefined distributions + code-to-value tables -------------

# RFC 8878 predefined FSE distributions (accuracy logs 6 / 5 / 6)
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
    1024, 2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [c + 3 for c in range(32)] + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515,
    1027, 2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

_MAX_LL_CODE = 35
_MAX_ML_CODE = 52
_MAX_OF_CODE = 31
# per-category accuracy-log ceilings (RFC 8878 table)
_MAX_AL = {"ll": 9, "of": 8, "ml": 9}

_PREDEFINED = {
    "ll": (_LL_DEFAULT, 6),
    "of": (_OF_DEFAULT, 5),
    "ml": (_ML_DEFAULT, 6),
}
_MAX_CODE = {"ll": _MAX_LL_CODE, "of": _MAX_OF_CODE, "ml": _MAX_ML_CODE}


class _FrameState:
    """Entropy state that persists across blocks within one frame:
    the Huffman literals table (treeless mode), the three sequence
    FSE tables (repeat mode), and the repeat-offset history."""

    def __init__(self) -> None:
        self.huf: tuple[list[tuple[int, int]], int] | None = None
        self.fse: dict[str, tuple[list[tuple[int, int, int]], int] | None] = {
            "ll": None,
            "of": None,
            "ml": None,
        }
        self.rep = [1, 4, 8]


def _decode_literals(
    block: bytes, state: _FrameState
) -> tuple[bytes, int]:
    """Literals section → (literals, bytes consumed from block)."""
    b0 = block[0]
    lit_type = b0 & 3
    if lit_type in (0, 1):  # Raw / RLE
        if (b0 >> 2) & 1 == 0:
            regen = b0 >> 3
            hlen = 1
        elif (b0 >> 2) & 3 == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hlen = 2
        else:  # size_format 0b11
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hlen = 3
        if lit_type == 0:
            lits = block[hlen : hlen + regen]
            if len(lits) < regen:
                raise ValueError("zstd: truncated raw literals")
            return bytes(lits), hlen + regen
        return bytes([block[hlen]]) * regen, hlen + 1
    # Compressed (2) / Treeless (3)
    size_format = (b0 >> 2) & 3
    if size_format == 0:
        hlen, rb, streams = 3, 10, 1
    elif size_format == 1:
        hlen, rb, streams = 3, 10, 4
    elif size_format == 2:
        hlen, rb, streams = 4, 14, 4
    else:
        hlen, rb, streams = 5, 18, 4
    h = int.from_bytes(block[:hlen], "little")
    regen = (h >> 4) & ((1 << rb) - 1)
    comp = (h >> (4 + rb)) & ((1 << rb) - 1)
    body = block[hlen : hlen + comp]
    if len(body) < comp:
        raise ValueError("zstd: truncated compressed literals")
    pos = 0
    if lit_type == 2:
        weights, pos = _huf_read_weights(body, 0)
        state.huf = huf_build_dtable(weights)
    if state.huf is None:
        raise ValueError("zstd: treeless literals before any Huffman table")
    table, tlog = state.huf
    streams_data = body[pos:]
    if streams == 1:
        lits = _huf_decode_stream(table, tlog, streams_data, regen)
    else:
        if len(streams_data) < 6:
            raise ValueError("zstd: truncated 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", streams_data, 0)
        cuts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3, len(streams_data)]
        seg_out = (regen + 3) // 4
        sizes = [seg_out, seg_out, seg_out, regen - 3 * seg_out]
        parts = []
        for i in range(4):
            seg = streams_data[cuts[i] : cuts[i + 1]]
            parts.append(_huf_decode_stream(table, tlog, seg, sizes[i]))
        lits = b"".join(parts)
    return lits, hlen + comp


def _read_seq_table(
    block: bytes, pos: int, mode: int, cat: str, state: _FrameState
) -> tuple[tuple[list[tuple[int, int, int]], int], int]:
    """One sequence-table description → ((dtable, accuracy_log), pos)."""
    if mode == 0:  # predefined
        counts, al = _PREDEFINED[cat]
        return (fse_build_dtable(counts, al), al), pos
    if mode == 1:  # RLE: one byte = the constant symbol
        sym = block[pos]
        if sym > _MAX_CODE[cat]:
            raise ValueError(f"zstd: RLE {cat} symbol {sym} out of range")
        return (_fse_rle_dtable(sym), 0), pos + 1
    if mode == 2:  # FSE-compressed
        al, counts, pos = fse_read_ncount(
            block, pos, _MAX_CODE[cat], _MAX_AL[cat]
        )
        return (fse_build_dtable(counts, al), al), pos
    prev = state.fse[cat]  # mode 3: repeat
    if prev is None:
        raise ValueError(f"zstd: repeat {cat} table with no previous table")
    return prev, pos


def _decode_block(block: bytes, out: bytearray, state: _FrameState) -> None:
    """Decode one compressed block, appending to the frame output
    (``out`` is the full frame history — match offsets may reach into
    earlier blocks)."""
    lits, pos = _decode_literals(block, state)
    if pos >= len(block):
        raise ValueError("zstd: missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        nseq = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    if nseq == 0:
        out += lits
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    (ll_tab, ll_al), pos = _read_seq_table(
        block, pos, (modes >> 6) & 3, "ll", state
    )
    (of_tab, of_al), pos = _read_seq_table(
        block, pos, (modes >> 4) & 3, "of", state
    )
    (ml_tab, ml_al), pos = _read_seq_table(
        block, pos, (modes >> 2) & 3, "ml", state
    )
    state.fse["ll"] = (ll_tab, ll_al)
    state.fse["of"] = (of_tab, of_al)
    state.fse["ml"] = (ml_tab, ml_al)

    br = _BackBits(block[pos:])
    ll_state = br.read(ll_al)
    of_state = br.read(of_al)
    ml_state = br.read(ml_al)
    lit_pos = 0
    rep = state.rep
    for i in range(nseq):
        of_code = of_tab[of_state][0]
        offset_value = (1 << of_code) + br.read(of_code)
        ml_e = ml_tab[ml_state]
        match_len = _ML_BASE[ml_e[0]] + br.read(_ML_BITS[ml_e[0]])
        ll_e = ll_tab[ll_state]
        lit_len = _LL_BASE[ll_e[0]] + br.read(_LL_BITS[ll_e[0]])
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            idx = offset_value + (1 if lit_len == 0 else 0)
            if idx == 1:
                offset = rep[0]
            elif idx == 2:
                offset = rep[1]
                rep[0], rep[1] = rep[1], rep[0]
            elif idx == 3:
                offset = rep[2]
                rep[:] = [rep[2], rep[0], rep[1]]
            else:  # offset_value 3 with lit_len == 0
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[:] = [offset, rep[0], rep[1]]
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if match_len:
            start = len(out) - offset
            if offset >= match_len:
                out += out[start : start + match_len]
            else:  # overlapping match: the RLE-style repeating pattern
                seg = bytes(out[start:])
                out += (seg * (match_len // offset + 1))[:match_len]
        if i + 1 < nseq:  # states are not updated after the last sequence
            ll_state = ll_e[2] + br.read(ll_e[1])
            ml_state = ml_e[2] + br.read(ml_e[1])
            of_e = of_tab[of_state]
            of_state = of_e[2] + br.read(of_e[1])
    out += lits[lit_pos:]


def _decode_frame(buf: bytes, pos: int, out: bytearray) -> int:
    """Decode ONE zstd frame starting at ``pos`` (after the magic has
    been verified) into ``out``; returns the position just past the
    frame. Frames are independent — match offsets never cross a frame
    boundary — which is what makes frame-per-record container layouts
    (.warc.zst and friends) seekable."""
    fhd = buf[pos]
    pos += 1
    single_segment = (fhd >> 5) & 1
    checksum_flag = (fhd >> 2) & 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_flag = fhd >> 6
    if not single_segment:
        pos += 1  # Window_Descriptor: parsed for bounds only
    if did_size:
        raise ValueError("zstd: dictionaries not supported")
    if fcs_flag == 0:
        fcs = buf[pos] if single_segment else None
        pos += 1 if single_segment else 0
    elif fcs_flag == 1:
        fcs = struct.unpack_from("<H", buf, pos)[0] + 256
        pos += 2
    elif fcs_flag == 2:
        (fcs,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        (fcs,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
    frame_start = len(out)
    state = _FrameState()
    while True:
        h = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = h & 1
        btype = (h >> 1) & 3
        bsize = h >> 3
        if btype == 0:  # raw
            out += buf[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: bsize = regenerated size, 1 byte
            out += bytes([buf[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if bsize > MAX_BLOCK:
                raise ValueError("zstd: block above maximum size")
            _decode_block(buf[pos : pos + bsize], out, state)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise ValueError(
            f"zstd: frame content size mismatch: "
            f"{len(out) - frame_start} != {fcs}"
        )
    if checksum_flag:
        (want,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        got = xxhash64(bytes(out[frame_start:])) & 0xFFFFFFFF
        if got != want:
            raise ValueError("zstd: content checksum mismatch")
    return pos


def iter_zstd_frames(buf: bytes):
    """Yield ``(decoded_bytes, end_pos)`` per zstd frame in a
    concatenated stream (skippable frames are skipped, yielding
    nothing). Strict: truncation mid-frame raises — callers that
    tolerate a torn final frame (container readers) catch it."""
    pos = 0
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("zstd: truncated magic")
        (magic,) = struct.unpack_from("<I", buf, pos)
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            (skip,) = struct.unpack_from("<I", buf, pos + 4)
            pos += 8 + skip
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08X}")
        out = bytearray()
        pos = _decode_frame(buf, pos + 4, out)
        yield bytes(out), pos


def zstd_decompress(buf: bytes) -> bytes:
    """Decompress one or more concatenated zstd frames (skippable
    frames are skipped). Dictionaries are not supported."""
    return b"".join(chunk for chunk, _ in iter_zstd_frames(buf))


# --- encoder: raw/RLE-block frames ------------------------------------------


def zstd_compress(data: bytes, checksum: bool = False) -> bytes:
    """Spec-valid zstd frame from raw/RLE blocks (see module
    docstring): byte-deterministic, accepted by every conformant
    decoder, closed-form length (``zstd_raw_frame_len``) so wire
    oracles can recompute it in SQL."""
    n = len(data)
    if n < 256:
        fcs_flag, fcs = 0, struct.pack("<B", n)
    elif n < 65536 + 256:
        fcs_flag, fcs = 1, struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fcs_flag, fcs = 2, struct.pack("<I", n)
    else:
        fcs_flag, fcs = 3, struct.pack("<Q", n)
    fhd = (fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out = bytearray(struct.pack("<IB", ZSTD_MAGIC, fhd) + fcs)
    pos = 0
    while True:
        chunk = data[pos : pos + MAX_BLOCK]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out.append(chunk[0])
        else:
            out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
        if last:
            break
    if checksum:
        out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)


def zstd_raw_frame_len(n: int) -> int:
    """Closed-form length of ``zstd_compress(data, checksum=False)``
    for incompressible ``data`` of length ``n`` (no RLE blocks) — the
    arithmetic a SQL oracle can replay: magic(4) + FHD(1) + FCS +
    3 bytes per block + the payload."""
    fcs_len = 1 if n < 256 else 2 if n < 65536 + 256 else 4
    nblocks = max(1, (n + MAX_BLOCK - 1) // MAX_BLOCK)
    return 4 + 1 + fcs_len + 3 * nblocks + n


# --- real compression: LZ sequences under the PREDEFINED FSE tables ----------
#
# The raw-block encoder above is the deterministic closed-form path;
# this section adds actual compression: a greedy hash-chain LZ matcher
# whose (literal_length, match_length, offset) sequences are entropy-
# coded with the spec's PREDEFINED FSE distributions (no table
# descriptions on the wire) and RAW literals — a fully conformant
# compressed block using the format's built-in tables, the same
# strategy zstd's own fast modes use for small inputs. libzstd
# round-trips the output in tests; our decoder reads it too.


class _FwdBitWriter:
    """zstd encode-side bitstream: values appended LSB-first; the
    decoder reads them BACKWARD from a final sentinel 1 bit."""

    def __init__(self) -> None:
        self.acc = 0
        self.n = 0

    def add(self, value: int, bits: int) -> None:
        if bits:
            self.acc |= (value & ((1 << bits) - 1)) << self.n
            self.n += bits

    def close(self) -> bytes:
        self.acc |= 1 << self.n  # sentinel
        self.n += 1
        return self.acc.to_bytes((self.n + 7) // 8, "little")


def fse_build_ctable(counts: list[int], accuracy_log: int):
    """Encode tables mirroring fse_build_dtable: per-symbol
    (delta_nb_bits, delta_find_state) + the nextState array."""
    size = 1 << accuracy_log
    table: list[int] = [-1] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            table[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    cumul = [0] * (len(counts) + 1)
    for s, c in enumerate(counts):
        cumul[s + 1] = cumul[s] + (1 if c == -1 else max(c, 0))
    next_state = [0] * size
    fill = list(cumul[:-1])
    for u in range(size):
        s = table[u]
        next_state[fill[s]] = size + u
        fill[s] += 1
    sym_tt = []
    total = 0
    for s, c in enumerate(counts):
        if c == 0:
            sym_tt.append(((accuracy_log + 1) << 16, 0))
        elif c in (-1, 1):
            sym_tt.append(((accuracy_log << 16) - (1 << accuracy_log), total - 1))
            total += 1
        else:
            # highbit(c-1) = bit_length-1: states for symbol s span
            # [c, 2c) after shifting; the top of that range needs
            # exactly accuracy_log - highbit(c-1) bits flushed
            max_bits_out = accuracy_log - ((c - 1).bit_length() - 1)
            min_state_plus = c << max_bits_out
            sym_tt.append(((max_bits_out << 16) - min_state_plus, total - c))
            total += c
    return next_state, sym_tt


class _FseEncoder:
    def __init__(self, ctable, accuracy_log: int):
        self.next_state, self.sym_tt = ctable
        self.log = accuracy_log
        self.state = 0

    def init(self, sym: int) -> None:
        delta_nb, delta_fs = self.sym_tt[sym]
        nb = (delta_nb + (1 << 15)) >> 16
        self.state = self.next_state[(((nb << 16) - delta_nb) >> nb) + delta_fs]

    def encode(self, sym: int, bits: _FwdBitWriter) -> None:
        delta_nb, delta_fs = self.sym_tt[sym]
        nb = (self.state + delta_nb) >> 16
        bits.add(self.state, nb)
        self.state = self.next_state[(self.state >> nb) + delta_fs]

    def flush(self, bits: _FwdBitWriter) -> None:
        bits.add(self.state, self.log)


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    for code in range(16, 36):
        if v < _LL_BASE[code] + (1 << _LL_BITS[code]):
            return code
    raise ValueError(f"literal length {v} out of range")


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    for code in range(32, 53):
        if v < _ML_BASE[code] + (1 << _ML_BITS[code]):
            return code
    raise ValueError(f"match length {v} out of range")


def _find_sequences(chunk: bytes):
    """Greedy 4-byte hash matcher -> (sequences, literal bytes).
    sequences = [(lit_len, match_len, offset_value)]; offset_value =
    offset + 3 (repeat-offset slots are never used — simple and always
    legal)."""
    n = len(chunk)
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = int.from_bytes(chunk[i : i + 4], "little")
        j = table.get(key)
        table[key] = i
        if j is not None and chunk[j : j + 4] == chunk[i : i + 4]:
            m = 4
            limit = n - i
            while m < limit and chunk[j + m] == chunk[i + m]:
                m += 1
            if m > 131070:  # stay inside ML code 52's 16-bit extra
                m = 131070
            lit_len = i - lit_start
            lits += chunk[lit_start:i]
            seqs.append((lit_len, m, (i - j) + 3))
            i += m
            lit_start = i
            continue
        i += 1
    lits += chunk[lit_start:]
    return seqs, bytes(lits)


def _raw_literals_section(lits: bytes) -> bytes:
    n = len(lits)
    if n < 32:
        return bytes([n << 3]) + lits  # 1-byte header, 5-bit size
    if n < 4096:
        h = 0 | (1 << 2) | (n << 4)
        return h.to_bytes(2, "little") + lits
    h = 0 | (3 << 2) | (n << 4)
    return h.to_bytes(3, "little") + lits


def _compress_block_lz(chunk: bytes) -> bytes | None:
    """One compressed block (raw literals + predefined-FSE sequences),
    or None when expansion would exceed the raw form."""
    seqs, lits = _find_sequences(chunk)
    if not seqs:
        return None
    out = bytearray(_raw_literals_section(lits))
    nseq = len(seqs)
    if nseq < 128:
        out.append(nseq)
    elif nseq < 0x7F00:
        out.append((nseq >> 8) + 128)
        out.append(nseq & 0xFF)
    else:
        out += bytes([255, nseq & 0xFF, (nseq - 0x7F00) >> 8])
    out.append(0)  # modes: predefined for LL / OF / ML
    ll_enc = _FseEncoder(fse_build_ctable(_LL_DEFAULT, 6), 6)
    of_enc = _FseEncoder(fse_build_ctable(_OF_DEFAULT, 5), 5)
    ml_enc = _FseEncoder(fse_build_ctable(_ML_DEFAULT, 6), 6)
    bits = _FwdBitWriter()
    ll, m, ov = seqs[-1]
    llc, mlc, ofc = _ll_code(ll), _ml_code(m), ov.bit_length() - 1
    ml_enc.init(mlc)
    of_enc.init(ofc)
    ll_enc.init(llc)
    bits.add(ll - _LL_BASE[llc], _LL_BITS[llc])
    bits.add(m - _ML_BASE[mlc], _ML_BITS[mlc])
    bits.add(ov - (1 << ofc), ofc)
    for ll, m, ov in reversed(seqs[:-1]):
        llc, mlc, ofc = _ll_code(ll), _ml_code(m), ov.bit_length() - 1
        of_enc.encode(ofc, bits)
        ml_enc.encode(mlc, bits)
        ll_enc.encode(llc, bits)
        bits.add(ll - _LL_BASE[llc], _LL_BITS[llc])
        bits.add(m - _ML_BASE[mlc], _ML_BITS[mlc])
        bits.add(ov - (1 << ofc), ofc)
    ml_enc.flush(bits)
    of_enc.flush(bits)
    ll_enc.flush(bits)
    out += bits.close()
    if len(out) >= len(chunk):
        return None
    return bytes(out)


def zstd_compress_lz(data: bytes, checksum: bool = False) -> bytes:
    """Compressing encoder: greedy-LZ sequences under the predefined
    FSE tables, falling back to raw/RLE blocks where that wins.
    Deterministic (fixed matcher, no RNG), conformant (libzstd
    round-trips it in tests), and self-readable."""
    n = len(data)
    if n < 256:
        fcs_flag, fcs = 0, struct.pack("<B", n)
    elif n < 65536 + 256:
        fcs_flag, fcs = 1, struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fcs_flag, fcs = 2, struct.pack("<I", n)
    else:
        fcs_flag, fcs = 3, struct.pack("<Q", n)
    fhd = (fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out = bytearray(struct.pack("<IB", ZSTD_MAGIC, fhd) + fcs)
    pos = 0
    while True:
        chunk = data[pos : pos + MAX_BLOCK]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out.append(chunk[0])
        else:
            comp = _compress_block_lz(chunk) if len(chunk) >= 16 else None
            if comp is not None:
                out += (last | (2 << 1) | (len(comp) << 3)).to_bytes(
                    3, "little"
                )
                out += comp
            else:
                out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(
                    3, "little"
                )
                out += chunk
        if last:
            break
    if checksum:
        out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)
