"""Round-8 operator tests: the pure-stdlib baseline JPEG codec
(llm/jpeg.py) — the one mainstream image codec still stubbed after
round 6's PNG/GIF/BMP/WAV/PNM. Decode correctness is pinned three
independent ways: closed-form flat+AC44 fixtures (also the DuckDB
oracle's basis), an independent float IDCT reference for arbitrary
coefficients, and protocol-level cases (byte stuffing, restart
markers, unsupported profiles)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spark_streaming_test_spark.llm.jpeg import (
    AC44_SIGN,
    AC44_ZZ,
    JPEG_N,
    ZIGZAG,
    _jpeg_block_k,
    _jpeg_block_v,
    _jpeg_dims,
    build_canonical_codes,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    flat_ac44_blocks,
    uniform_table,
)


def _idct_reference(blk: list[int]) -> np.ndarray:
    """Independent inverse DCT straight from the T.81 definition."""
    a = np.array(
        [
            [
                0.5
                * ((1 / math.sqrt(2)) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    return np.clip(np.rint(a.T @ np.array(blk, float).reshape(8, 8) @ a + 128), 0, 255)


def test_zigzag_is_a_permutation_and_ac44_position():
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[AC44_ZZ] == 36  # raster (4,4)
    assert AC44_ZZ == 39  # run of 38 zeros -> exercises two ZRL symbols


def test_canonical_codes_are_prefix_free():
    bits, vals = uniform_table([0x00, 0xF0, 0x64, 0x65, 0x66])
    codes = build_canonical_codes(bits, vals)
    assert len(codes) == 5
    items = list(codes.values())
    for i, (c1, l1) in enumerate(items):
        for c2, l2 in items[i + 1 :]:
            if l1 <= l2:
                assert (c2 >> (l2 - l1)) != c1  # no prefix collision
    # the all-ones code of each length stays unassigned (T.81 invariant)
    for code, length in items:
        assert code != (1 << length) - 1


def test_flat_ac44_block_roundtrip_exact():
    v, k = 100, 5
    w, h, nc, px = decode_jpeg_baseline(
        encode_jpeg_baseline(8, 8, [flat_ac44_blocks(v, k)])
    )
    s = np.array(AC44_SIGN)
    assert (w, h, nc) == (8, 8, 1)
    assert np.array_equal(px.astype(int), v + k * np.outer(s, s))


@pytest.mark.parametrize("i", [0, 1, 5, 17, 35, 49])
def test_fixture_images_decode_to_closed_form(i):
    """Fixture i (including i%5==0 restart-marker files) decodes to the
    exact closed-form pixel grid the DuckDB oracle integrates over."""
    wb, hb = _jpeg_dims(i)
    blocks = [
        flat_ac44_blocks(_jpeg_block_v(bx, by, i), _jpeg_block_k(bx, by, i))
        for by in range(hb)
        for bx in range(wb)
    ]
    data = encode_jpeg_baseline(
        wb * 8, hb * 8, blocks, restart_interval=2 if i % 5 == 0 else 0
    )
    w, h, nc, px = decode_jpeg_baseline(data)
    assert (w, h, nc) == (wb * 8, hb * 8, 1)
    s = np.array(AC44_SIGN)
    exp = np.zeros((h, w), dtype=int)
    for by in range(hb):
        for bx in range(wb):
            v, k = _jpeg_block_v(bx, by, i), _jpeg_block_k(bx, by, i)
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v + k * np.outer(s, s)
    assert np.array_equal(px.astype(int), exp)


def test_restart_markers_present_and_reset_predictors():
    """i%5==0 fixtures carry DRI + RSTn; a decoder that fails to reset
    the DC predictor at a restart produces shifted levels, so exact
    pixel equality (previous test) plus marker presence pins both."""
    wb, hb = _jpeg_dims(5 * 3)  # any i % 5 == 0 with >= 3 MCUs
    i = 15
    blocks = [
        flat_ac44_blocks(_jpeg_block_v(bx, by, i), _jpeg_block_k(bx, by, i))
        for by in range(hb)
        for bx in range(wb)
    ]
    data = encode_jpeg_baseline(wb * 8, hb * 8, blocks, restart_interval=2)
    scan = data.split(b"\xff\xda")[1]
    assert any(bytes([0xFF, 0xD0 + j]) in scan for j in range(8))
    assert b"\xff\xdd" in data  # DRI segment


def test_arbitrary_coefficients_match_independent_idct():
    blk = [0] * 64
    blk[0], blk[1], blk[8], blk[36], blk[50], blk[63] = -300, 45, -17, 24, -9, 3
    w, h, nc, px = decode_jpeg_baseline(encode_jpeg_baseline(8, 8, [blk]))
    assert np.array_equal(px.astype(float), _idct_reference(blk))


def test_byte_stuffing_roundtrip():
    """Dense +-255 coefficients force 0xFF bytes in the entropy stream;
    the encoder must stuff them and the decoder must unstuff — and the
    result still matches the independent IDCT bit-for-bit."""
    blk = [0] * 64
    blk[0] = 1016
    for j in range(1, 64):
        blk[j] = 255 if j % 2 else -255
    data = encode_jpeg_baseline(8, 8, [blk])
    scan = data.split(b"\xff\xda")[1]
    assert scan.count(b"\xff\x00") >= 1
    w, h, nc, px = decode_jpeg_baseline(data)
    assert np.array_equal(px.astype(float), _idct_reference(blk))


def test_color_ycbcr_conversion():
    """3-component 4:4:4 scan: flat Y/Cb/Cr planes through the JFIF
    conversion; expected RGB computed independently here."""
    y0, cb0, cr0 = 120, 90, 200
    data = encode_jpeg_baseline(
        8,
        8,
        [flat_ac44_blocks(y0, 0), flat_ac44_blocks(cb0, 0), flat_ac44_blocks(cr0, 0)],
        ncomp=3,
    )
    w, h, nc, px = decode_jpeg_baseline(data)
    assert nc == 3 and px.shape == (8, 8, 3)
    exp = (
        int(np.clip(round(y0 + 1.402 * (cr0 - 128)), 0, 255)),
        int(np.clip(round(y0 - 0.344136 * (cb0 - 128) - 0.714136 * (cr0 - 128)), 0, 255)),
        int(np.clip(round(y0 + 1.772 * (cb0 - 128)), 0, 255)),
    )
    assert np.array_equal(px, np.tile(np.array(exp, np.uint8), (8, 8, 1)))


def test_unsupported_profiles_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x00\x00\x00")
    # progressive SOF2 rejected explicitly
    data = bytearray(encode_jpeg_baseline(8, 8, [flat_ac44_blocks(100, 0)]))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_baseline(bytes(data))


def test_fixture_count_and_dims_formula():
    assert JPEG_N == 50
    for i in (0, 1, 2, 3, 49):
        wb, hb = _jpeg_dims(i)
        assert (wb, hb) == (2 + i % 3, 1 + i % 2)


# --- MJPEG-in-AVI video container (sources/avi_mjpeg.py) --------------------


def _fixture_frames(i: int) -> list[bytes]:
    from spark_streaming_test_spark.sources.avi_mjpeg import (
        FRAME_HB,
        FRAME_WB,
        _avi_n_frames,
        _frame_k,
        _frame_v,
    )

    return [
        encode_jpeg_baseline(
            FRAME_WB * 8,
            FRAME_HB * 8,
            [
                flat_ac44_blocks(_frame_v(bx, f, i), _frame_k(bx, f, i))
                for bx in range(FRAME_WB)
            ],
        )
        for f in range(_avi_n_frames(i))
    ]


def test_avi_container_roundtrip(tmp_path):
    """Writer -> reader roundtrip: headers (dims/fps/frame count) and
    every frame's exact JPEG bytes survive the RIFF container."""
    from spark_streaming_test_spark.sources.avi_mjpeg import (
        _avi_fps,
        _avi_n_frames,
        read_avi_mjpeg,
        write_avi_mjpeg,
    )

    i = 7
    frames = _fixture_frames(i)
    p = str(tmp_path / "v.avi")
    write_avi_mjpeg(p, frames, 16, 8, _avi_fps(i))
    w, h, fps, declared, got = read_avi_mjpeg(open(p, "rb").read())
    assert (w, h, fps, declared) == (16, 8, _avi_fps(i), _avi_n_frames(i))
    assert got == frames


def test_avi_frames_decode_to_closed_form(tmp_path):
    """Container walk + per-frame JPEG decode reproduces the closed-form
    pixel grid the video oracles integrate over."""
    from spark_streaming_test_spark.sources.avi_mjpeg import (
        _avi_fps,
        _frame_k,
        _frame_v,
        read_avi_mjpeg,
        write_avi_mjpeg,
    )

    i = 4
    frames = _fixture_frames(i)
    p = str(tmp_path / "v.avi")
    write_avi_mjpeg(p, frames, 16, 8, _avi_fps(i))
    _, _, _, _, got = read_avi_mjpeg(open(p, "rb").read())
    s = np.array(AC44_SIGN)
    for f, jpeg in enumerate(got):
        fw, fh, nc, px = decode_jpeg_baseline(jpeg)
        exp = np.zeros((8, 16), int)
        for bx in range(2):
            v, k = _frame_v(bx, f, i), _frame_k(bx, f, i)
            exp[:, bx * 8 : bx * 8 + 8] = v + k * np.outer(s, s)
        assert np.array_equal(px.astype(int), exp)


def test_avi_idx1_cross_validation(tmp_path):
    """A corrupted idx1 entry (wrong size) raises instead of decoding
    from a lying index — the container-level analogue of PNG's CRC."""
    import struct

    from spark_streaming_test_spark.sources.avi_mjpeg import (
        read_avi_mjpeg,
        write_avi_mjpeg,
    )

    p = str(tmp_path / "v.avi")
    write_avi_mjpeg(p, _fixture_frames(0), 16, 8, 10)
    buf = bytearray(open(p, "rb").read())
    pos = buf.find(b"idx1")
    struct.pack_into("<I", buf, pos + 8 + 8, 12345)  # first entry's size
    with pytest.raises(ValueError, match="idx1"):
        read_avi_mjpeg(bytes(buf))


def test_avi_declared_frame_count_enforced(tmp_path):
    """avih totalframes must equal the movi chunk count."""
    import struct

    from spark_streaming_test_spark.sources.avi_mjpeg import (
        read_avi_mjpeg,
        write_avi_mjpeg,
    )

    p = str(tmp_path / "v.avi")
    write_avi_mjpeg(p, _fixture_frames(0), 16, 8, 10)
    buf = bytearray(open(p, "rb").read())
    pos = buf.find(b"avih")
    struct.pack_into("<I", buf, pos + 8 + 16, 99)  # dwTotalFrames
    with pytest.raises(ValueError, match="declares"):
        read_avi_mjpeg(bytes(buf))


def test_avi_not_riff_raises():
    from spark_streaming_test_spark.sources.avi_mjpeg import read_avi_mjpeg

    with pytest.raises(ValueError, match="AVI"):
        read_avi_mjpeg(b"JUNKJUNKJUNKJUNK")


# --- 4:2:0 / 4:2:2 chroma subsampling ----------------------------------------


def _jfif_rgb(y, cb, cr):
    y, cb, cr = np.float64(y), np.float64(cb), np.float64(cr)
    return (
        int(np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255)),
        int(np.clip(np.rint(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)),
        int(np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255)),
    )


def test_jpeg_420_single_mcu_exact():
    """One 16x16 4:2:0 MCU (4 Y + Cb + Cr): chroma replicates 2x2 and
    every 8x8 Y region converts with its MCU's chroma — exactly."""
    yv = [100, 150, 60, 210]
    data = encode_jpeg_baseline(
        16, 16,
        [flat_ac44_blocks(v, 0) for v in yv]
        + [flat_ac44_blocks(90, 0), flat_ac44_blocks(200, 0)],
        ncomp=3,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )
    w, h, nc, px = decode_jpeg_baseline(data)
    assert (w, h, nc) == (16, 16, 3)
    for b, (oy, ox) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        exp = np.array(_jfif_rgb(yv[b], 90, 200), np.uint8)
        assert np.all(px[oy : oy + 8, ox : ox + 8] == exp)


def test_jpeg_420_ac_and_restart_markers():
    """AC checkerboard on Y blocks UNDER subsampling + restart interval:
    the R channel of every Y block matches the independent conversion
    of (v +- k) with the MCU's chroma."""
    s = np.array(AC44_SIGN)
    blocks = []
    for m in range(2):
        for b in range(4):
            blocks.append(flat_ac44_blocks(50 + 20 * b + 5 * m, 1 + b))
        blocks += [flat_ac44_blocks(80 + m, 0), flat_ac44_blocks(170 + m, 0)]
    data = encode_jpeg_baseline(
        32, 16, blocks, ncomp=3,
        sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=1,
    )
    w, h, nc, px = decode_jpeg_baseline(data)
    assert (w, h, nc) == (32, 16, 3)
    for m in range(2):
        for b, (oy, ox) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
            yb = 50 + 20 * b + 5 * m + (1 + b) * np.outer(s, s)
            exp_r = np.clip(np.rint(yb + 1.402 * (np.float64(170 + m) - 128.0)), 0, 255)
            got = px[oy : oy + 8, m * 16 + ox : m * 16 + ox + 8, 0]
            assert np.array_equal(got.astype(float), exp_r)


def test_jpeg_422_horizontal_subsampling():
    data = encode_jpeg_baseline(
        16, 8,
        [
            flat_ac44_blocks(100, 0), flat_ac44_blocks(180, 0),
            flat_ac44_blocks(90, 0), flat_ac44_blocks(200, 0),
        ],
        ncomp=3,
        sampling=[(2, 1), (1, 1), (1, 1)],
    )
    w, h, nc, px = decode_jpeg_baseline(data)
    assert (w, h, nc) == (16, 8, 3)
    assert np.all(px[:, :8, 0] == _jfif_rgb(100, 90, 200)[0])
    assert np.all(px[:, 8:, 0] == _jfif_rgb(180, 90, 200)[0])


def test_jpeg_sampling_factor_3_rejected():
    data = bytearray(
        encode_jpeg_baseline(8, 8, [flat_ac44_blocks(100, 0)])
    )
    sof = data.find(b"\xff\xc0")
    data[sof + 2 + 2 + 1 + 4 + 1 + 1] = 0x31  # comp 0 sampling byte -> 3x1
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg_baseline(bytes(data))


def test_jpeg_dc_thumbnail_drops_ac_exactly(tmp_path):
    """dc_only=True yields one pixel per block equal to the flat level v
    (the AC checkerboard vanishes), at 1/8 scale, for gray AND 4:2:0
    color — and the full-resolution decode of the same bytes is
    unchanged."""
    from spark_streaming_test_spark.llm.jpeg import (
        _jpeg_block_v,
        _jpeg_dims,
        write_jpeg_fixture,
    )

    i = 15  # restart-marker fixture
    p = str(tmp_path / "t.jpg")
    write_jpeg_fixture(p, i)
    buf = open(p, "rb").read()
    wb, hb = _jpeg_dims(i)
    tw, th, nc, thumb = decode_jpeg_baseline(buf, dc_only=True)
    assert (tw, th, nc) == (wb, hb, 1)
    exp = np.array(
        [[_jpeg_block_v(bx, by, i) for bx in range(wb)] for by in range(hb)]
    )
    assert np.array_equal(thumb.astype(int), exp)
    w, h, _, px = decode_jpeg_baseline(buf)
    assert (w, h) == (wb * 8, hb * 8)

    # color 4:2:0: thumbnail converts DC chroma per MCU
    yv = [100, 150, 60, 210]
    data = encode_jpeg_baseline(
        16, 16,
        [flat_ac44_blocks(v, 3) for v in yv]
        + [flat_ac44_blocks(90, 0), flat_ac44_blocks(200, 0)],
        ncomp=3,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )
    tw, th, nc, thumb = decode_jpeg_baseline(data, dc_only=True)
    assert (tw, th, nc) == (2, 2, 3)
    for b, (ty, tx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        assert tuple(thumb[ty, tx]) == _jfif_rgb(yv[b], 90, 200)


def test_jpeg_420_fixture_domain_is_tie_free():
    """The mm_decode_jpeg_420 oracle rounds the same IEEE doubles as the
    decoder; enumerate the (y +- k, cb, cr) domain and prove no exact .5."""
    from spark_streaming_test_spark.llm.jpeg import (
        JPEG_420_N,
        _j420_cb,
        _j420_cr,
        _j420_k,
        _j420_mcus,
        _j420_y,
    )

    triples = set()
    for i in range(JPEG_420_N):
        mw, mh = _j420_mcus(i)
        for by in range(2 * mh):
            for bx in range(2 * mw):
                mx, my = bx // 2, by // 2
                for sgn in (1, -1):
                    triples.add(
                        (
                            _j420_y(bx, by, i) + sgn * _j420_k(bx, by, i),
                            _j420_cb(mx, my, i),
                            _j420_cr(mx, my, i),
                        )
                    )
    assert triples
    for yv, cbv, crv in triples:
        y, cb, cr = np.float64(yv), np.float64(cbv), np.float64(crv)
        for v in (
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ):
            assert float(v) % 1.0 != 0.5, (yv, cbv, crv, float(v))


# --- color JPEG oracle safety ------------------------------------------------


def test_jpeg_property_random_blocks_roundtrip():
    """Property: ANY coefficient block within the baseline amplitude
    range encodes to a valid JFIF stream and decodes to the independent
    IDCT reference bit-for-bit — covering arbitrary Huffman tables
    (built from the data), arbitrary run lengths, ZRLs, amplitude sign
    handling, and stuffing wherever it happens to occur."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coeff = st.integers(min_value=-1023, max_value=1023)
    block = st.lists(coeff, min_size=64, max_size=64)

    @settings(max_examples=60, deadline=None)
    @given(blocks=st.lists(block, min_size=1, max_size=4))
    def run(blocks):
        n = len(blocks)
        data = encode_jpeg_baseline(8 * n, 8, blocks)
        w, h, nc, px = decode_jpeg_baseline(data)
        assert (w, h, nc) == (8 * n, 8, 1)
        for j, blk in enumerate(blocks):
            assert np.array_equal(
                px[:, 8 * j : 8 * j + 8].astype(float), _idct_reference(blk)
            )

    run()


def test_jpeg_property_restart_interval_any_stride():
    """Property: restart markers at ANY interval preserve exact decode
    (predictor resets + byte alignment are stride-independent)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=255), min_size=2, max_size=8
        ),
        interval=st.integers(min_value=1, max_value=4),
    )
    def run(vals, interval):
        blocks = [flat_ac44_blocks(v, 0) for v in vals]
        data = encode_jpeg_baseline(
            8 * len(vals), 8, blocks, restart_interval=interval
        )
        w, h, nc, px = decode_jpeg_baseline(data)
        for j, v in enumerate(vals):
            assert np.all(px[:, 8 * j : 8 * j + 8] == v)

    run()


def test_color_fixture_domain_is_tie_free():
    """The mm_decode_jpeg_color oracle mirrors the JFIF conversion
    float-for-float and both engines round — np.rint (half-even) vs SQL
    round (half-away) agree ONLY when no channel value lands exactly on
    .5. Enumerate the entire fixture (Y, Cb, Cr) domain and prove it."""
    from spark_streaming_test_spark.llm.jpeg import (
        JPEG_COLOR_N,
        _jc_cb,
        _jc_cr,
        _jc_dims,
        _jc_y,
    )

    triples = set()
    for i in range(JPEG_COLOR_N):
        wb, hb = _jc_dims(i)
        for by in range(hb):
            for bx in range(wb):
                triples.add(
                    (_jc_y(bx, by, i), _jc_cb(bx, by, i), _jc_cr(bx, by, i))
                )
    assert triples
    for yv, cbv, crv in triples:
        y, cb, cr = np.float64(yv), np.float64(cbv), np.float64(crv)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        for v in (r, g, b):
            assert float(v) % 1.0 != 0.5, (yv, cbv, crv, float(v))


def test_color_fixture_decodes_to_mirrored_conversion(tmp_path):
    """One color fixture end-to-end: decoder output equals the oracle's
    SQL-side arithmetic computed here in numpy (round + clip)."""
    from spark_streaming_test_spark.llm.jpeg import (
        _jc_cb,
        _jc_cr,
        _jc_dims,
        _jc_y,
        write_jpeg_color_fixture,
    )

    i = 11
    p = str(tmp_path / "c.jpg")
    write_jpeg_color_fixture(p, i)
    w, h, nc, px = decode_jpeg_baseline(open(p, "rb").read())
    wb, hb = _jc_dims(i)
    assert (w, h, nc) == (wb * 8, hb * 8, 3)
    for by in range(hb):
        for bx in range(wb):
            y = np.float64(_jc_y(bx, by, i))
            cb = np.float64(_jc_cb(bx, by, i))
            cr = np.float64(_jc_cr(bx, by, i))
            exp = [
                int(np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255)),
                int(
                    np.clip(
                        np.rint(
                            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
                        ),
                        0,
                        255,
                    )
                ),
                int(np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255)),
            ]
            block = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert np.array_equal(block, np.tile(np.array(exp, np.uint8), (8, 8, 1)))
