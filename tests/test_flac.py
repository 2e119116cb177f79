"""FLAC codec (llm/flac.py): roundtrips across all stereo modes and
subframe types, integrity-check tampering, the Rice escape path, and
the spec's corner encodings (UTF-8 frame numbers, partial final
frame). The registered queries' correctness rides test_oracle_parity;
these pin the codec itself."""

from __future__ import annotations

import struct

import pytest

from spark_streaming_test_spark.llm import flac as FL


def _signal(f, c, n):
    return FL._flac_signal(f, c, n)


def _write_tmp(tmp_path, name, chans, **kw):
    p = str(tmp_path / name)
    FL.write_flac(p, chans, **kw)
    return p, open(p, "rb").read()


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes_roundtrip(tmp_path, mode):
    total = FL.BLOCK + 73  # two frames, second partial
    chans = [
        [_signal(1, c, n) for n in range(total)] for c in range(2)
    ]
    _, buf = _write_tmp(tmp_path, f"{mode}.flac", chans, stereo_mode=mode)
    info, frames = FL.parse_flac(buf)
    assert info["channels"] == 2 and info["total_samples"] == total
    got = [[], []]
    for fr in frames:
        got[0].extend(fr["channels"][0])
        got[1].extend(fr["channels"][1])
    assert got == chans


def test_mono_roundtrip_and_compression(tmp_path):
    total = FL.BLOCK * 2
    chans = [[_signal(0, 0, n) for n in range(total)]]
    p, buf = _write_tmp(tmp_path, "mono.flac", chans)
    info, frames = FL.parse_flac(buf)
    assert [fr["n_samples"] for fr in frames] == [FL.BLOCK, FL.BLOCK]
    assert len(buf) < total * 2  # fixed predictors actually compress


def test_constant_and_verbatim_subframes(tmp_path):
    # constant channel -> CONSTANT subframe; white-noise-ish channel
    # whose fixed residuals cost more than raw -> VERBATIM
    import random

    rng = random.Random(99)
    total = FL.BLOCK
    const = [-123] * total
    noise = [rng.randrange(-32768, 32768) for _ in range(total)]
    for chans in ([const], [noise]):
        _, buf = _write_tmp(tmp_path, "one.flac", chans)
        info, frames = FL.parse_flac(buf)
        assert frames[0]["channels"][0] == chans[0]


def test_crc8_crc16_and_md5_tampering(tmp_path):
    total = FL.BLOCK + 10
    chans = [[_signal(2, 0, n) for n in range(total)]]
    _, buf = _write_tmp(tmp_path, "t.flac", chans)
    # locate first frame: after magic + 4-byte block header + 34 bytes
    frame0 = 4 + 4 + 34
    assert buf[frame0] == 0xFF and (buf[frame0 + 1] >> 2) == 0x3E  # sync
    # CRC-8 guards the header: flip the channel-assignment nibble
    b = bytearray(buf)
    b[frame0 + 3] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8"):
        FL.parse_flac(bytes(b))
    # CRC-16 guards the body: flip a residual bit mid-frame
    b = bytearray(buf)
    b[frame0 + 20] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16"):
        FL.parse_flac(bytes(b))
    # STREAMINFO md5 guards the whole stream: lie in the header
    b = bytearray(buf)
    b[4 + 4 + 18] ^= 0xFF  # first md5 byte
    with pytest.raises(ValueError, match="MD5"):
        FL.parse_flac(bytes(b))


def test_lpc_subframe_rejected():
    w = FL._Bits()
    w.u(0, 1)
    w.u(0x20, 6)  # LPC order 1
    w.u(0, 1)
    w.u(0, 8 * 4)
    r = FL._BitsReader(w.bytes())
    with pytest.raises(ValueError, match="LPC"):
        FL._read_subframe(r, 16, 16)


def test_rice_escape_raw_bits_path(tmp_path):
    """A channel alternating between huge +/- values makes every fixed
    order explode; the encoder falls back to VERBATIM, and the Rice
    ESCAPE path is exercised directly at the bits level."""
    w = FL._Bits()
    res = [30000, -30000, 29999, -29998]
    bits = 17
    w.u(0, 2)  # method 0
    w.u(0, 4)  # partition order 0
    w.u(0xF, 4)  # escape
    w.u(bits, 5)
    for v in res:
        w.s(v, bits)
    w.align()
    r = FL._BitsReader(w.bytes())
    assert FL._read_residual(r, 4, 0) == res


def test_frame_number_utf8_roundtrip():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, 65536, 1 << 20, (1 << 31) - 1):
        enc = FL.encode_frame_number(n)
        r = FL._BitsReader(enc)
        assert FL.decode_frame_number(r) == n, n


def test_frame_number_rejects_0xff_lead():
    """0xFF & 0xFE == 0xFE, so without an explicit guard the
    spec-invalid lead byte 0xFF silently decodes as a 6-continuation
    code (ADVICE r9 item 3)."""
    import pytest

    r = FL._BitsReader(bytes([0xFF] + [0x80] * 6))
    with pytest.raises(ValueError, match="lead byte"):
        FL.decode_frame_number(r)


def test_fixed_predictor_orders_roundtrip():
    samples = [_signal(3, 0, n) for n in range(50)]
    for order in range(0, 5):
        res = FL._fixed_residual(samples, order)
        assert FL._fixed_restore(samples[:order], res, order) == samples


def test_streaminfo_fields(tmp_path):
    total = FL.BLOCK * 3 + 1
    chans = [[_signal(0, 0, n) for n in range(total)]]
    _, buf = _write_tmp(tmp_path, "si.flac", chans)
    info, frames = FL.parse_flac(buf)
    assert info["sample_rate"] == 44100
    assert info["bps"] == 16
    assert info["total_samples"] == total
    assert len(frames) == 4 and frames[-1]["n_samples"] == 1
    (want,) = struct.unpack(">H", buf[-2:])  # last frame's CRC-16 parses
    assert isinstance(want, int)
