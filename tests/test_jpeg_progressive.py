"""Progressive (SOF2) JPEG codec tests — VERDICT r8 item 3.

The invariant under test everywhere: progressive is a different WIRE
LAYOUT of the same DCT coefficients, so decode(progressive bytes) must
equal decode(baseline bytes) PIXEL-FOR-PIXEL for any coefficient
content — the baseline decoder (independently tested against a
reference IDCT in test_round8_ops.py) is the oracle for the
progressive one.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_streaming_test_spark.llm.jpeg import (
    JPEG_PROG_N,
    ZIGZAG,
    _jpeg_block_k,
    _jpeg_block_v,
    _jpeg_dims,
    decode_jpeg_baseline,
    decode_jpeg_progressive,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    flat_ac44_blocks,
    write_jpeg_progressive_fixture,
)


def _decode_both(width, height, blocks, ncomp=1, al=1):
    base = decode_jpeg_baseline(
        encode_jpeg_baseline(width, height, blocks, ncomp=ncomp)
    )
    prog = decode_jpeg_progressive(
        encode_jpeg_progressive(width, height, blocks, ncomp=ncomp, al=al)
    )
    assert base[:3] == prog[:3]
    return base[3], prog[3]


def test_progressive_equals_baseline_on_fixture_blocks():
    blocks = [flat_ac44_blocks(100 + 10 * i, 1 + i % 7) for i in range(6)]
    pb, pp = _decode_both(24, 16, blocks)
    assert np.array_equal(pb, pp)


def test_progressive_color_equals_baseline():
    blocks = []
    for m in range(4):
        for c in range(3):
            blk = [0] * 64
            blk[0] = 8 * (50 + 20 * m + 5 * c - 128)
            blk[36] = 8 * (1 + m)
            blocks.append(blk)
    pb, pp = _decode_both(16, 16, blocks, ncomp=3)
    assert np.array_equal(pb, pp)


@pytest.mark.parametrize("al", [1, 2])
def test_progressive_property_random_blocks(al):
    """Randomized coefficients hammer every branch: EOB runs, ZRL in
    both scan kinds, newly-significant-at-refinement coefficients
    (|coef| small enough to vanish under the point transform), and
    interleaved correction bits."""
    rng = np.random.RandomState(1234 + al)
    for _trial in range(40):
        wb, hb = int(rng.randint(1, 5)), int(rng.randint(1, 4))
        blocks = []
        for _ in range(wb * hb):
            blk = [0] * 64
            blk[0] = int(rng.randint(-500, 500))
            for _ in range(int(rng.randint(0, 10))):
                blk[int(rng.randint(1, 64))] = int(rng.randint(-50, 50))
            blocks.append(blk)
        pb, pp = _decode_both(wb * 8, hb * 8, blocks, al=al)
        assert np.array_equal(pb, pp)


def test_eob_runs_span_blocks():
    """20 flat blocks -> the AC first scan is ONE EOBn code covering
    all 20 bands (2^4 + 4 extra-bit form), not 20 EOB0s; decode must
    count it down across blocks."""
    blocks = []
    for i in range(20):
        blk = [0] * 64
        blk[0] = 8 * (i * 10 - 60)
        blocks.append(blk)
    pb, pp = _decode_both(40, 32, blocks)
    assert np.array_equal(pb, pp)
    # the progressive stream must be SMALLER than per-block EOBs would
    # allow: 20 empty bands in one code keeps the AC scans tiny
    prog = encode_jpeg_progressive(40, 32, blocks)
    base = encode_jpeg_baseline(40, 32, blocks)
    assert len(prog) < len(base) + 200  # sanity: no pathological blowup


def test_zrl_inside_refinement_run():
    """A lone +-1 at zigzag position 39 vanishes under the Al=1 point
    transform, so it is coded ONLY in the refinement scan, preceded by
    a 38-position zero-history run -> two ZRLs + run-size there."""
    for sign in (1, -1):
        blk = [0] * 64
        blk[0] = 8 * (90 - 128)
        blk[36] = sign  # zigzag index 39
        pb, pp = _decode_both(8, 8, [blk])
        assert np.array_equal(pb, pp)


def test_correction_bits_interleave_with_new_coefficients():
    """A large coefficient (significant in the first scan) standing
    between zero-history positions and a newly-significant +-1 forces
    the correction-bit buffering path (G.1.2.3)."""
    blk = [0] * 64
    blk[0] = 8 * (100 - 128)
    blk[ZIGZAG[2]] = 9  # significant at Al=1 (9>>1 = 4)
    blk[ZIGZAG[5]] = 7  # odd -> its refinement correction bit is 1
    blk[ZIGZAG[30]] = -1  # newly significant in the refinement scan
    pb, pp = _decode_both(8, 8, [blk])
    assert np.array_equal(pb, pp)


def test_dc_only_preview_is_prefix_read():
    """dc_only must stop after the FIRST DC scan: decoding a buffer
    TRUNCATED right after that scan's entropy bytes yields the same
    preview as the full file — the progressive 'first paint' contract."""
    blocks = [flat_ac44_blocks(100 + 8 * i, 2) for i in range(6)]
    prog = encode_jpeg_progressive(24, 16, blocks)
    tw, th, nc, full_thumb = decode_jpeg_progressive(prog, dc_only=True)
    assert (tw, th, nc) == (3, 2, 1)
    assert np.array_equal(
        full_thumb, np.array([[100, 108, 116], [124, 132, 140]])
    )
    # find the SECOND SOS marker and cut the file just before it
    first_sos = prog.index(b"\xff\xda")
    second_sos = prog.index(b"\xff\xda", first_sos + 2)
    truncated = prog[:second_sos]
    _, _, _, trunc_thumb = decode_jpeg_progressive(truncated, dc_only=True)
    assert np.array_equal(trunc_thumb, full_thumb)
    # and a FULL decode of the truncated stream must fail loudly (the
    # AC scans are missing), never return half-decoded pixels silently
    with pytest.raises(Exception):
        decode_jpeg_progressive(truncated)
        raise AssertionError  # pragma: no cover - reached only if no raise


def test_wrong_decoder_rejected_both_ways():
    blocks = [flat_ac44_blocks(100, 2)]
    base = encode_jpeg_baseline(8, 8, blocks)
    prog = encode_jpeg_progressive(8, 8, blocks)
    with pytest.raises(ValueError, match="non-baseline SOF"):
        decode_jpeg_baseline(prog)
    with pytest.raises(ValueError, match="baseline SOF0"):
        decode_jpeg_progressive(base)


def test_fixture_files_decode_to_closed_form(tmp_path):
    """Every fixture file (including the al=2 quarter) decodes to the
    closed-form block values — the same math the DuckDB oracle uses."""
    for i in range(0, JPEG_PROG_N, 7):
        p = str(tmp_path / f"img_{i}.jpg")
        write_jpeg_progressive_fixture(p, i)
        buf = open(p, "rb").read()
        assert buf[:2] == b"\xff\xd8"
        assert b"\xff\xc2" in buf[:200]  # SOF2, not SOF0
        wb, hb = _jpeg_dims(i)
        w, h, nc, px = decode_jpeg_progressive(buf)
        assert (w, h, nc) == (wb * 8, hb * 8, 1)
        for by in range(hb):
            for bx in range(wb):
                v = _jpeg_block_v(bx, by, i)
                k = _jpeg_block_k(bx, by, i)
                blockpx = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert int(blockpx[0, 0]) == v + k
                assert int(blockpx[0, 1]) == v - k
                assert int(blockpx.sum()) == 64 * v


def test_hypothesis_progressive_roundtrip():
    from hypothesis import given, settings, strategies as st

    coeff = st.integers(min_value=-255, max_value=255)

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(-1000, 1000),
                st.dictionaries(st.integers(1, 63), coeff, max_size=12),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def roundtrip(specs):
        blocks = []
        for dc, acs in specs:
            blk = [0] * 64
            blk[0] = dc
            for zz, v in acs.items():
                blk[ZIGZAG[zz]] = v
            blocks.append(blk)
        w = len(blocks) * 8
        pb, pp = _decode_both(w, 8, blocks)
        assert np.array_equal(pb, pp)

    roundtrip()


@pytest.mark.parametrize("ri", [1, 2, 3])
@pytest.mark.parametrize("al", [1, 2])
def test_restart_markers_in_every_scan_kind(ri, al):
    """RSTn markers appear in ALL scan kinds (DC first, AC first, DC
    refine raw bits, AC refine) with per-interval resets of predictors,
    EOB runs, and buffered correction bits — and decode still equals
    baseline exactly."""
    rng = np.random.RandomState(7 * ri + al)
    blocks = []
    for _ in range(6):
        blk = [0] * 64
        blk[0] = int(rng.randint(-300, 300))
        for _ in range(6):
            blk[int(rng.randint(1, 64))] = int(rng.randint(-30, 30))
        blocks.append(blk)
    base = decode_jpeg_baseline(encode_jpeg_baseline(48, 8, blocks))[3]
    buf = encode_jpeg_progressive(
        48, 8, blocks, al=al, restart_interval=ri
    )
    assert any(bytes([0xFF, 0xD0 + j]) in buf for j in range(8))
    prog = decode_jpeg_progressive(buf)[3]
    assert np.array_equal(base, prog)
