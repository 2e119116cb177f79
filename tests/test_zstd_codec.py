"""Zstd codec (RFC 8878) vs libzstd (via pyarrow), both directions.

The independent-verifier pattern used for snappy/LZ4/ADPCM: libzstd
compresses at several levels and our pure-stdlib decoder must
reproduce the input byte-exactly (exercising FSE-compressed tables,
Huffman 1- and 4-stream literals, repeat modes, treeless blocks,
multi-block frames); our raw/RLE-block frames must decompress through
libzstd, including checksummed frames — which makes libzstd verify
our xxHash64 implementation too, since it validates content checksums
on decode.
"""

import random
import struct

import pyarrow as pa
import pytest

from spark_streaming_test_spark.sources.zstd_codec import (
    MAX_BLOCK,
    ZSTD_MAGIC,
    xxhash64,
    zstd_compress,
    zstd_decompress,
    zstd_raw_frame_len,
)


def _corpora() -> list[bytes]:
    rng = random.Random(20260816)
    words = [b"spark", b"zstd", b"frame", b"huffman", b"sequence", b"kafka"]
    return [
        b"",
        b"a",
        b"hello world",
        b"ab" * 4000,
        b" ".join(rng.choice(words) for _ in range(30000)),  # texty, ~180KB
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        bytes(rng.randrange(4) for _ in range(50000)),  # low-entropy
        b"abcdefgh" * 40000,  # 320 KB → multi-block frames
    ]


def test_xxhash64_reference_vectors():
    # the canonical xxHash64 seed-0 empty-input vector from the
    # xxHash reference implementation
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    # self-consistency across the three size regimes (tail-only,
    # 4/8-byte tail lanes, 32-byte stripe loop)
    assert xxhash64(b"abc") != xxhash64(b"abd")
    assert xxhash64(b"x" * 31) != xxhash64(b"x" * 32)


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_decode_libzstd_output(level):
    codec = pa.Codec("zstd", compression_level=level)
    for raw in _corpora():
        comp = codec.compress(raw, asbytes=True)
        assert zstd_decompress(comp) == raw


def test_libzstd_accepts_our_frames():
    codec = pa.Codec("zstd")
    for raw in _corpora():
        for checksum in (False, True):
            ours = zstd_compress(raw, checksum=checksum)
            back = codec.decompress(
                ours, decompressed_size=len(raw), asbytes=True
            )
            assert back == raw


def test_own_roundtrip_and_frame_len_formula():
    rng = random.Random(7)
    for n in (0, 1, 255, 256, 65536 + 255, 65536 + 256, MAX_BLOCK + 17):
        raw = bytes(rng.randrange(256) for _ in range(n))
        frame = zstd_compress(raw)
        assert zstd_decompress(frame) == raw
        assert len(frame) == zstd_raw_frame_len(n)


def test_rle_block_emitted_for_constant_runs():
    raw = b"\x55" * 10000
    frame = zstd_compress(raw)
    # RLE block stores 1 payload byte for 10000: far below raw size
    assert len(frame) < 100
    assert zstd_decompress(frame) == raw
    assert pa.Codec("zstd").decompress(
        frame, decompressed_size=len(raw), asbytes=True
    ) == raw


def test_checksum_tamper_detected():
    raw = b"the content checksum guards this payload " * 50
    frame = bytearray(zstd_compress(raw, checksum=True))
    frame[-10] ^= 0x01  # flip a payload bit, keep the stored checksum
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(frame))


def test_bad_magic_and_reserved_block_type():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")
    # single_segment frame, FCS=1, then a block header with type 3
    frame = struct.pack("<IBB", ZSTD_MAGIC, 0x20, 1) + (1 | (3 << 1) | (
        1 << 3
    )).to_bytes(3, "little")
    with pytest.raises(ValueError, match="reserved block"):
        zstd_decompress(frame + b"\x00")


def test_skippable_frame_and_concatenated_frames():
    a, b = b"first frame " * 20, b"second frame " * 20
    skippable = struct.pack("<II", 0x184D2A53, 5) + b"junk!"
    buf = zstd_compress(a) + skippable + zstd_compress(b)
    assert zstd_decompress(buf) == a + b


def test_frame_content_size_mismatch_detected():
    frame = bytearray(zstd_compress(b"hello"))
    frame[5] = 99  # FCS byte (single_segment, fcs_flag=0) now lies
    with pytest.raises(ValueError, match="content size"):
        zstd_decompress(bytes(frame))


def test_dictionary_frames_rejected():
    # FHD with Dictionary_ID_flag=1 (1-byte dict id)
    frame = struct.pack("<IBBB", ZSTD_MAGIC, 0x21, 7, 0)
    with pytest.raises(ValueError, match="dictionaries"):
        zstd_decompress(frame)


@pytest.mark.parametrize("checksum", [False, True])
def test_lz_compressor_roundtrips_both_decoders(checksum):
    from spark_streaming_test_spark.sources.zstd_codec import (
        zstd_compress_lz,
    )

    codec = pa.Codec("zstd")
    for raw in _corpora():
        frame = zstd_compress_lz(raw, checksum=checksum)
        assert zstd_decompress(frame) == raw
        assert codec.decompress(
            frame, decompressed_size=len(raw), asbytes=True
        ) == raw


def test_lz_compressor_actually_compresses():
    from spark_streaming_test_spark.sources.zstd_codec import (
        zstd_compress_lz,
    )

    texty = b"the quick brown fox jumps over the lazy dog. " * 500
    frame = zstd_compress_lz(texty)
    assert len(frame) < len(texty) // 3
    # incompressible input falls back to raw blocks: bounded overhead
    rng = random.Random(11)
    noise = bytes(rng.randrange(256) for _ in range(5000))
    assert len(zstd_compress_lz(noise)) <= len(noise) + 16


def test_fse_encoder_matches_decoder_all_predefined_tables():
    """Interleave-free single-table FSE roundtrip across the three
    predefined distributions — pins the encode-side state machine
    (delta_nb_bits / delta_find_state / nextState) against the
    decode-side table build."""
    from spark_streaming_test_spark.sources.zstd_codec import (
        _BackBits,
        _FseEncoder,
        _FwdBitWriter,
        _LL_DEFAULT,
        _ML_DEFAULT,
        _OF_DEFAULT,
        fse_build_ctable,
        fse_build_dtable,
    )

    rng = random.Random(1)
    for counts, al, nsym in (
        (_LL_DEFAULT, 6, 36),
        (_OF_DEFAULT, 5, 29),
        (_ML_DEFAULT, 6, 53),
    ):
        dt = fse_build_dtable(counts, al)
        ct = fse_build_ctable(counts, al)
        for _ in range(100):
            syms = [rng.randrange(nsym) for _ in range(rng.randrange(1, 50))]
            enc = _FseEncoder(ct, al)
            bits = _FwdBitWriter()
            enc.init(syms[-1])
            for s in reversed(syms[:-1]):
                enc.encode(s, bits)
            enc.flush(bits)
            br = _BackBits(bits.close())
            state = br.read(al)
            out = []
            for i in range(len(syms)):
                sym, nb, base = dt[state]
                out.append(sym)
                if i + 1 < len(syms):
                    state = base + br.read(nb)
            assert out == syms
