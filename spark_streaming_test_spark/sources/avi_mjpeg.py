"""REAL video frames — MJPEG-in-AVI, pure stdlib + the baseline JPEG
decoder (``llm/jpeg.py``). No ffmpeg anywhere.

The module docstring of ``llm/multimodal.py`` groups video with the
codec-gated formats (MP4 needs ffmpeg), but Motion-JPEG inside an AVI
container does not: AVI is RIFF (little-endian fourcc chunks, a public
Microsoft spec), and each ``00dc`` chunk in the ``movi`` list is a
complete baseline JFIF image. Container walk + per-frame JPEG decode =
a real video decode path with zero media libraries — the same move as
round 6's PNG (zlib is enough) and this round's JPEG (T.81 is enough).

Implemented for real:
  * writer: RIFF/AVI assembly — ``avih`` main header, ``strl`` stream
    list (``strh`` 'vids'/'MJPG' with rate/scale timing + ``strf``
    BITMAPINFOHEADER), ``movi`` frame chunks with even-byte padding,
    and a full ``idx1`` index,
  * reader: chunk walk with size/padding discipline, header parse
    (frame count, fps from rate/scale, dimensions), frame extraction,
    and idx1 CROSS-VALIDATION — every index entry's offset/size must
    point at the exact ``00dc`` chunk bytes, so a corrupted container
    fails loudly (the PNG-CRC ethos at container level).

Two registered queries:
  * ``mm_video_mjpeg_frames`` — decode EVERY frame of every fixture
    video; per-frame exact features vs a closed-form DuckDB oracle
    (the flat+AC44 block construction from ``llm/jpeg.py`` makes lossy
    JPEG frames exactly predictable).
  * ``mm_video_frame_sample`` — stride sampling (every 2nd frame),
    the training-pipeline shape: SKIPPED FRAMES ARE NEVER DECODED —
    the container walk yields frame bytes lazily and only sampled
    frames enter the JPEG path. At 100 TB of video that skip IS the
    operator: decode cost scales with frames kept, not frames stored.

Scale posture: one container per ``binaryFile`` row, frames fan out
inside ``mapInPandas`` (1->N generator over Arrow batches); only O(1)
features per frame leave Python. Containers parallelize across files —
the standard layout for web-scale video corpora (many shards, each a
few hundred MB).
"""

from __future__ import annotations

import os as _os
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

AVI_N = 20
FRAME_WB, FRAME_HB = 2, 1  # 16 x 8 pixel frames
SAMPLE_STRIDE = 2


# --- writer -------------------------------------------------------------------


def write_avi_mjpeg(path: str, frames: list[bytes], width: int, height: int, fps: int) -> None:
    """Minimal REAL AVI container: RIFF('AVI ') with hdrl (avih + one
    'vids'/'MJPG' stream), movi holding one ``00dc`` chunk per frame
    (even-padded), and a complete idx1 index."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + _struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    avih = _struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,  # max bytes/sec, padding, AVIF_HASINDEX
        len(frames), 0, 1, 0,  # total frames, initial, streams, sugg. buffer
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + _struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, ~0 & 0xFFFFFFFF, 0, 0)
        + _struct.pack("<4H", 0, 0, width, height)
    )
    strf = _struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray(b"movi")
    index = []
    for f in frames:
        # idx1 offsets are relative to the start of the 'movi' fourcc,
        # which is byte 0 of movi_body — so the chunk lands at len().
        index.append((len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", bytes(movi_body))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + _struct.pack("<III", 0x10, off, size) for off, size in index
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as out:
        out.write(b"RIFF" + _struct.pack("<I", len(riff_body)) + riff_body)


# --- reader -------------------------------------------------------------------


def read_avi_mjpeg(buf: bytes):
    """(width, height, fps, n_frames_declared, frames) from AVI bytes;
    ``frames`` is a list of raw JPEG byte strings in stream order.
    Verifies RIFF framing, walks chunks with even-padding discipline,
    and cross-validates every idx1 entry against the actual ``00dc``
    chunk offsets/sizes — a broken index raises, never mis-decodes."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    (riff_size,) = _struct.unpack_from("<I", buf, 4)
    if riff_size + 8 > len(buf):
        raise ValueError("AVI RIFF size exceeds file length")
    width = height = fps = declared = None
    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []
    idx_entries: list[tuple[int, int]] = []
    movi_fourcc_pos = None

    def walk(start: int, end: int) -> None:
        nonlocal width, height, fps, declared, movi_fourcc_pos
        pos = start
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = _struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(f"chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                list_type = buf[body_start : body_start + 4]
                if list_type == b"movi":
                    movi_fourcc_pos = body_start
                walk(body_start + 4, body_end)
            elif fourcc == b"avih":
                vals = _struct.unpack_from("<14I", buf, body_start)
                declared = vals[4]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if buf[body_start : body_start + 4] == b"vids":
                    scale, rate = _struct.unpack_from("<II", buf, body_start + 20)
                    if scale == 0:
                        raise ValueError("strh scale is zero")
                    fps = rate // scale
            elif fourcc == b"00dc":
                frames.append(buf[body_start:body_end])
                frame_offsets.append((pos, size))
            elif fourcc == b"idx1":
                for i in range(size // 16):
                    ck, flags, off, ln = _struct.unpack_from(
                        "<4sIII", buf, body_start + 16 * i
                    )
                    if ck == b"00dc":
                        idx_entries.append((off, ln))
            pos = body_end + (size % 2)  # even padding

    walk(12, 8 + riff_size)
    if width is None or movi_fourcc_pos is None:
        raise ValueError("AVI missing avih or movi")
    if declared != len(frames):
        raise ValueError(
            f"avih declares {declared} frames, movi holds {len(frames)}"
        )
    if idx_entries:
        if len(idx_entries) != len(frames):
            raise ValueError("idx1 entry count != frame count")
        for (off, ln), (pos, size) in zip(idx_entries, frame_offsets):
            # offsets are relative to the 'movi' fourcc position
            if movi_fourcc_pos + off != pos or ln != size:
                raise ValueError("idx1 entry disagrees with movi layout")
    return width, height, fps, declared, frames


# --- fixtures -----------------------------------------------------------------


def _avi_n_frames(i: int) -> int:
    return 3 + i % 3


def _avi_fps(i: int) -> int:
    return 10 + i % 5


def _frame_v(bx: int, f: int, i: int) -> int:
    return 8 + (37 * bx + 23 * f + 11 * i) % 240


def _frame_k(bx: int, f: int, i: int) -> int:
    return 1 + (bx + f + i) % 7


def _avi_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.jpeg import (
        encode_jpeg_baseline,
        flat_ac44_blocks,
    )
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(
        write_avi_mjpeg,
        _frame_v,
        _frame_k,
        _avi_n_frames,
        _avi_fps,
        encode_jpeg_baseline,
        flat_ac44_blocks,
        AVI_N,
        FRAME_WB,
        FRAME_HB,
    )
    d = _os.path.join(SCRATCH, f"avi_videos_{rev}")
    _os.makedirs(d, exist_ok=True)
    for i in range(AVI_N):
        p = _os.path.join(d, f"vid_{i:04d}.avi")
        if _os.path.exists(p):
            continue
        frames = [
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
        tmp = p + ".tmp"
        write_avi_mjpeg(tmp, frames, FRAME_WB * 8, FRAME_HB * 8, _avi_fps(i))
        _os.replace(tmp, p)
    return d


_FRAME_ORACLE_CORE = f"""
vids AS (
  SELECT i, 3 + i % 3 AS nf, 10 + i % 5 AS fps FROM range({AVI_N}) t(i)
),
frames AS (
  SELECT i, nf, fps, ff.f AS f
  FROM vids, LATERAL unnest(range(0, nf)) AS ff(f)
),
blk AS (
  SELECT i, f, fps, nf, bxx.bx AS bx,
         8 + (37 * bxx.bx + 23 * f + 11 * i) % 240 AS v,
         1 + (bxx.bx + f + i) % 7 AS k
  FROM frames, LATERAL unnest(range(0, {FRAME_WB})) AS bxx(bx)
)
"""


@register(
    "mm_video_mjpeg_frames",
    tags=("llm", "multimodal", "video", "pandas-udf"),
    oracle=f"""
WITH {_FRAME_ORACLE_CORE}
SELECT CAST(i AS BIGINT) AS video_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(MAX(fps) AS INTEGER) AS fps,
       CAST(MAX(nf) AS INTEGER) AS n_frames,
       CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
       CAST(SUM(64 * k) AS BIGINT) AS checker_sum,
       CAST(MAX(CASE WHEN bx = 0 THEN v + k END) AS INTEGER) AS topleft
FROM blk GROUP BY i, f
""",
)
def mm_video_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode with no media libs: RIFF/AVI container walk
    (headers, even-padding, idx1 cross-validation) + per-frame baseline
    JPEG decode. Every frame of every fixture emits exact features the
    DuckDB oracle recomputes from the closed-form block formulas (the
    flat+AC44 exactness argument — see ``llm/jpeg.py``). Scale: 1->N
    frame fan-out inside mapInPandas; containers parallelize via
    binaryFile."""
    return _video_query(spark, stride=1)


@register(
    "mm_video_frame_sample",
    tags=("llm", "multimodal", "video", "sampling", "pandas-udf"),
    oracle=f"""
WITH {_FRAME_ORACLE_CORE}
SELECT CAST(i AS BIGINT) AS video_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(MAX(fps) AS INTEGER) AS fps,
       CAST(MAX(nf) AS INTEGER) AS n_frames,
       CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
       CAST(SUM(64 * k) AS BIGINT) AS checker_sum,
       CAST(MAX(CASE WHEN bx = 0 THEN v + k END) AS INTEGER) AS topleft
FROM blk WHERE f % {SAMPLE_STRIDE} = 0
GROUP BY i, f
""",
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride frame sampling (every 2nd frame) — the training-pipeline
    video shape: skipped frames are never JPEG-decoded (the container
    walk is cheap; the codec is the cost), so decode work scales with
    frames KEPT, not frames stored. Same features as
    ``mm_video_mjpeg_frames`` restricted to the sampled stride, which
    the oracle mirrors with ``WHERE f % 2 = 0``."""
    return _video_query(spark, stride=SAMPLE_STRIDE)


def _video_query(spark: SparkSession, stride: int) -> DataFrame:
    import numpy as np

    from spark_streaming_test_spark.llm.jpeg import (
        AC44_SIGN,
        decode_jpeg_baseline,
    )

    d = _avi_fixture_dir()
    src = (
        spark.read.format("binaryFile")
        .load(_os.path.join(d, "*.avi"))
        .select("path", "content")
    )
    sign = np.asarray(AC44_SIGN, dtype=np.int64)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                vid = int(path.rsplit("vid_", 1)[1][:4])
                w, h, fps, declared, frames = read_avi_mjpeg(bytes(content))
                weights = np.outer(
                    np.tile(sign, h // 8), np.tile(sign, w // 8)
                )
                for f_idx, jpeg in enumerate(frames):
                    if f_idx % stride:
                        continue  # sampled out: bytes stay undecoded
                    fw, fh, nc, px = decode_jpeg_baseline(jpeg)
                    if (fw, fh, nc) != (w, h, 1):
                        raise ValueError(
                            f"frame {f_idx} of {path} disagrees with header"
                        )
                    p = px.astype(np.int64)
                    rows.append(
                        (
                            vid, f_idx, fps, declared,
                            int(p.sum()),
                            int((p * weights).sum()),
                            int(p[0, 0]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "video_id", "frame_idx", "fps", "n_frames",
                    "sum_lum", "checker_sum", "topleft",
                ],
            )

    return src.mapInPandas(
        decode,
        schema=(
            "video_id bigint, frame_idx bigint, fps int, n_frames int, "
            "sum_lum bigint, checker_sum bigint, topleft int"
        ),
    )
