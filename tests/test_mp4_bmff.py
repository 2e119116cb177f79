"""MP4 (ISO BMFF) demux tests — the container half of the round-9
video work. The stbl chunk walk is the part real demuxers get wrong
(stsc runs are open-ended; the final chunk is usually partial), so
fixtures always include a partial final chunk and the tests poison
indexes to prove the cross-validation bites."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spark_streaming_test_spark.llm.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    flat_ac44_blocks,
)
from spark_streaming_test_spark.sources.mp4_bmff import (
    FIRST_SAMPLE_OFFSET,
    SAMPLES_PER_CHUNK,
    iter_boxes,
    read_mp4_mjpeg,
    read_mp4_sample_table,
    write_mp4_mjpeg,
)


def _jpeg(v: int, k: int) -> bytes:
    return encode_jpeg_baseline(
        16, 8, [flat_ac44_blocks(v, k), flat_ac44_blocks(v + 8, k)]
    )


def _mp4(tmp_path, samples, delta_ms=40):
    p = str(tmp_path / "t.mp4")
    write_mp4_mjpeg(p, samples, 16, 8, delta_ms)
    return open(p, "rb").read()


def test_roundtrip_with_partial_final_chunk(tmp_path):
    # 7 samples, chunks of 3 -> chunks [3, 3, 1]: two stsc runs
    samples = [_jpeg(60 + 10 * f, 1 + f % 7) for f in range(7)]
    buf = _mp4(tmp_path, samples)
    w, h, ts, codec, table = read_mp4_sample_table(buf)
    assert (w, h, ts, codec) == (16, 8, 1000, b"jpeg")
    assert len(table) == 7
    # offsets are contiguous from the fixed first offset
    expected_off = FIRST_SAMPLE_OFFSET
    for f, (off, size, pts, ci) in enumerate(table):
        assert off == expected_off
        assert size == len(samples[f])
        assert pts == 40 * f
        assert ci == f // SAMPLES_PER_CHUNK
        expected_off += size
        assert buf[off : off + size] == samples[f]
    # decode-everything convenience agrees
    w, h, delta, n, frames = read_mp4_mjpeg(buf)
    assert (delta, n) == (40, 7)
    assert frames == samples


def test_padded_samples_decode_ignoring_trailer(tmp_path):
    jpeg = _jpeg(100, 2)
    padded = jpeg + b"\x00" * 64
    buf = _mp4(tmp_path, [padded])
    _, _, _, _, frames = read_mp4_mjpeg(buf)
    w, h, nc, px = decode_jpeg_baseline(frames[0])
    assert (w, h, nc) == (16, 8, 1)
    assert int(px[0, 0]) == 102  # v + k


def test_box_walk_handles_largesize_and_to_end(tmp_path):
    payload = b"x" * 10
    large = struct.pack(">I", 1) + b"big " + struct.pack(">Q", 16 + 10) + payload
    toend = struct.pack(">I", 0) + b"rest" + payload
    buf = large + toend
    boxes = list(iter_boxes(buf, 0, len(buf)))
    assert [b[0] for b in boxes] == [b"big ", b"rest"]
    assert buf[boxes[0][1] : boxes[0][2]] == payload
    assert buf[boxes[1][1] : boxes[1][2]] == payload


def test_box_overrun_raises():
    bad = struct.pack(">I", 100) + b"bad " + b"x" * 4
    with pytest.raises(ValueError, match="overruns"):
        list(iter_boxes(bad, 0, len(bad)))


def test_lying_stco_offset_fails_bounds_check(tmp_path):
    samples = [_jpeg(80, 1), _jpeg(90, 2)]
    buf = bytearray(_mp4(tmp_path, samples))
    # find stco and point its first chunk offset past the file end
    i = buf.index(b"stco")
    entry_off = i + 4 + 4 + 4  # fourcc, version/flags, entry_count
    struct.pack_into(">I", buf, entry_off, len(buf) + 1000)
    with pytest.raises(ValueError, match="escapes mdat"):
        read_mp4_sample_table(bytes(buf))


def test_stsz_stts_disagreement_fails(tmp_path):
    samples = [_jpeg(80, 1), _jpeg(90, 2)]
    buf = bytearray(_mp4(tmp_path, samples))
    i = buf.index(b"stts")
    # shrink the single stts run from 2 samples to 1
    struct.pack_into(">I", buf, i + 4 + 4 + 4, 1)
    with pytest.raises(ValueError, match="stsz declares"):
        read_mp4_sample_table(bytes(buf))


def test_non_jpeg_codec_rejected_by_frame_reader(tmp_path):
    samples = [_jpeg(80, 1)]
    buf = bytearray(_mp4(tmp_path, samples))
    i = buf.index(b"jpeg", buf.index(b"stsd"))
    buf[i : i + 4] = b"avc1"
    with pytest.raises(ValueError, match="Motion-JPEG"):
        read_mp4_mjpeg(bytes(buf))


def test_stride_sampling_never_touches_skipped_bytes(tmp_path):
    """Samples at odd indices are POISON (not JPEG at all). A stride-2
    reader that slices only its kept byte ranges decodes fine; decoding
    everything raises — proving skipped bytes truly stay untouched."""
    good = [_jpeg(60 + 10 * f, 1) for f in range(4)]
    samples = [
        good[f] if f % 2 == 0 else b"\x00" * len(good[f]) for f in range(4)
    ]
    buf = _mp4(tmp_path, samples)
    _, _, _, _, table = read_mp4_sample_table(buf)
    for f, (off, size, _, _) in enumerate(table):
        if f % 2 == 0:
            w, h, nc, px = decode_jpeg_baseline(buf[off : off + size])
            assert (w, h) == (16, 8)
        else:
            with pytest.raises(ValueError):
                decode_jpeg_baseline(buf[off : off + size])


def test_sample_index_is_pure_arithmetic(tmp_path):
    """The demux must work on a buffer whose mdat payload is REDACTED
    (moov + headers only) as long as no sample bytes are requested —
    the 100 TB range-request story: index from kilobytes of moov."""
    samples = [_jpeg(70 + 5 * f, 2) for f in range(5)]
    buf = bytearray(_mp4(tmp_path, samples))
    mdat_start = buf.index(b"mdat") + 4
    mdat_len = struct.unpack_from(">I", buf, mdat_start - 8)[0] - 8
    buf[mdat_start : mdat_start + mdat_len] = b"\x00" * mdat_len
    w, h, ts, codec, table = read_mp4_sample_table(bytes(buf))
    assert len(table) == 5
    assert [t[0] for t in table] == [
        FIRST_SAMPLE_OFFSET + sum(len(s) for s in samples[:f])
        for f in range(5)
    ]


# --- EXIF-in-JPEG (round 9, lives here with the other container tests) -------


def test_jpeg_exif_app1_roundtrip_and_header_only():
    from spark_streaming_test_spark.llm.multimodal import (
        _exif_params,
        add_jpeg_exif,
        jpeg_exif,
        tiff_exif_bytes,
    )

    base = _jpeg(100, 2)
    buf = add_jpeg_exif(base, tiff_exif_bytes(*_exif_params(3)))
    m = jpeg_exif(buf)
    assert (m["endian"], m["width"], m["make"]) == ("big", 643, "Cam-3")
    # pixel decode is unaffected by the APP1 splice
    w, h, nc, px = decode_jpeg_baseline(buf)
    assert (w, h) == (16, 8) and int(px[0, 0]) == 102
    # header-only contract: the walk stops at SOS, so TRUNCATING the
    # file right after the headers still yields full metadata
    sos = buf.index(b"\xff\xda")
    assert jpeg_exif(buf[: sos + 2]) == m
    with pytest.raises(ValueError, match="no EXIF"):
        jpeg_exif(base)


def test_mulaw_expansion_matches_g711_anchors(tmp_path):
    """Known G.711 table anchors + full-range roundtrip through a real
    mu-law WAVE file."""
    from spark_streaming_test_spark.llm.multimodal import (
        _mulaw_table,
        decode_wav_mulaw,
        write_wav_mulaw,
    )

    table = _mulaw_table()
    assert table[0x00] == -32124 and table[0x80] == 32124  # loudest
    assert table[0xFF] == 0  # silence
    assert table[0x7F] == 0
    p = str(tmp_path / "t.wav")
    write_wav_mulaw(p, 8000, bytes(range(256)))
    rate, channels, pcm = decode_wav_mulaw(open(p, "rb").read())
    assert (rate, channels, len(pcm)) == (8000, 1, 256)
    assert list(pcm) == list(table)
    # PCM16 WAVE must be rejected by the mu-law reader and vice versa
    from spark_streaming_test_spark.llm.multimodal import (
        decode_wav16,
        write_wav16,
    )

    p2 = str(tmp_path / "p.wav")
    write_wav16(p2, 8000, [0, 100, -100])
    with pytest.raises(ValueError, match="not mu-law"):
        decode_wav_mulaw(open(p2, "rb").read())
    with pytest.raises(ValueError, match="unsupported WAVE"):
        decode_wav16(open(p, "rb").read())


def test_g711_tables_match_audioop_when_present():
    """Independent cross-check: both companding tables must equal the
    CPython reference implementation (audioop ships through 3.12; when
    absent the closed-form anchors below still pin the law)."""
    from spark_streaming_test_spark.llm.multimodal import (
        _alaw_table,
        _mulaw_table,
    )

    alaw, mulaw = _alaw_table(), _mulaw_table()
    # spec anchors that hold with or without audioop
    assert mulaw[0x00] == -32124 and mulaw[0x80] == 32124
    assert mulaw[0xFF] == 0 and mulaw[0x7F] == 0
    assert alaw[0xD5] == 8 and alaw[0x55] == -8  # A-law has no zero
    assert alaw[0xAA] == 32256 and alaw[0x2A] == -32256
    try:
        import struct as _s
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        return
    for c in range(256):
        assert alaw[c] == _s.unpack("<h", audioop.alaw2lin(bytes([c]), 2))[0]
        assert mulaw[c] == _s.unpack("<h", audioop.ulaw2lin(bytes([c]), 2))[0]


def test_ima_adpcm_transition_matches_audioop():
    """The per-nibble state machine must be byte-identical to CPython's
    audioop (independent implementation of the same IMA spec), swept
    over random (predictor, index, nibble) states — plus a WAV
    roundtrip with the LOW-nibble-first packing (audioop packs high
    first, so the repack is part of the test)."""
    import random
    import struct as _s
    import warnings

    from spark_streaming_test_spark.llm.multimodal import (
        ADPCM_BLOCK_ALIGN,
        decode_wav_ima_adpcm,
        ima_adpcm_step,
        write_wav_ima_adpcm,
    )

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        audioop = None
    rng = random.Random(17)
    if audioop is not None:
        for _ in range(2000):
            pred = rng.randint(-32768, 32767)
            idx = rng.randint(0, 88)
            nibs = [rng.randint(0, 15) for _ in range(4)]
            packed = bytes(
                ((nibs[0] << 4) | nibs[1], (nibs[2] << 4) | nibs[3])
            )
            out, _state = audioop.adpcm2lin(packed, 2, (pred, idx))
            ref = list(_s.unpack("<4h", out))
            mine = []
            p, ix = pred, idx
            for n in nibs:
                p, ix = ima_adpcm_step(p, ix, n)
                mine.append(p)
            assert mine == ref, (pred, idx, nibs)

    # WAV roundtrip: block headers restart state; low-nibble-first
    blocks = []
    for b in range(3):
        nibs = [rng.randint(0, 15) for _ in range((ADPCM_BLOCK_ALIGN - 4) * 2)]
        blocks.append((rng.randint(-30000, 30000), rng.randint(0, 88), nibs))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        write_wav_ima_adpcm(f.name, 8000, blocks)
        rate, spb, pcm = decode_wav_ima_adpcm(open(f.name, "rb").read())
    assert (rate, spb) == (8000, 65)
    assert len(pcm) == 3 * 65
    expect = []
    for pred0, idx0, nibs in blocks:
        p, ix = pred0, idx0
        expect.append(p)
        for n in nibs:
            p, ix = ima_adpcm_step(p, ix, n)
            expect.append(p)
    assert list(pcm) == expect
