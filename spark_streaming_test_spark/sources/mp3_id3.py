"""MP3 (MPEG-1 Layer III) frame walk + ID3v2 tags — audio-corpus
triage without any audio decode.

A crawl's audio files are mostly MP3; the curation pipeline needs
duration / bitrate / tag metadata per file, all of which lives in the
stream's FRAME HEADERS and the ID3v2 container, not in the MDCT
coefficients:

  * ID3v2.4 header ("ID3", version, SYNCSAFE 28-bit size — the
    encoding that keeps tag bytes from faking a frame sync) and text
    frames (TIT2/TALB/..., encoding byte 3 = UTF-8), walked and
    skipped exactly so the frame walk starts at the first audio byte;
  * MPEG-1 Layer III frame headers: 11-bit sync, version/layer bits,
    the 14-entry bitrate table and 3-entry sample-rate table, padding
    bit — giving each frame's byte length
    (144 * bitrate / sample_rate + padding) and the constant
    1152-samples-per-frame duration law;
  * VBR streams: per-frame bitrate indexes may differ; duration
    comes from the frame COUNT, average bitrate from the byte/time
    ratio (the same numbers a Xing header would cache).

Huffman-coded spectral data is opaque payload here — the honest
boundary, as with H.264 slices. A torn final frame is dropped (the
pcap/warc convention); junk between tag and first sync raises rather
than resyncing silently.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

# MPEG-1 Layer III tables (ISO 11172-3): kbps by bitrate index, Hz by
# sample-rate index
BITRATE_KBPS = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
SAMPLE_RATE_HZ = [44100, 48000, 32000]
SAMPLES_PER_FRAME = 1152


def _syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _read_syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def build_id3v2(frames: list[tuple[str, str]]) -> bytes:
    """ID3v2.4 tag: text frames with encoding byte 3 (UTF-8)."""
    body = bytearray()
    for fid, text in frames:
        payload = b"\x03" + text.encode("utf-8")
        body += fid.encode("ascii") + _syncsafe(len(payload)) + b"\x00\x00"
        body += payload
    return b"ID3\x04\x00\x00" + _syncsafe(len(body)) + bytes(body)


def parse_id3v2(buf: bytes) -> tuple[dict[str, str], int]:
    """-> ({frame_id: text}, bytes consumed). No tag -> ({}, 0)."""
    if buf[:3] != b"ID3":
        return {}, 0
    major = buf[3]
    if major not in (3, 4):
        raise ValueError(f"mp3: ID3v2.{major} unsupported (v2.3/v2.4 only)")
    size = _read_syncsafe(buf[6:10])
    end = 10 + size
    pos = 10
    tags: dict[str, str] = {}
    while pos + 10 <= end:
        fid = buf[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw = buf[pos + 4 : pos + 8]
        flen = _read_syncsafe(raw) if major == 4 else struct.unpack(">I", raw)[0]
        payload = buf[pos + 10 : pos + 10 + flen]
        pos += 10 + flen
        if fid.startswith(b"T") and payload[:1] == b"\x03":
            tags[fid.decode("ascii")] = payload[1:].decode("utf-8").rstrip("\x00")
    return tags, end


def frame_length(bitrate_idx: int, sr_idx: int, padding: int) -> int:
    """MPEG-1 Layer III: floor(144 * bitrate / sample_rate) + padding."""
    return (
        144 * BITRATE_KBPS[bitrate_idx] * 1000 // SAMPLE_RATE_HZ[sr_idx]
        + padding
    )


def build_frame(bitrate_idx: int, sr_idx: int, padding: int, fill: int) -> bytes:
    """One spec-valid frame: real header, deterministic opaque body."""
    h = (
        (0x7FF << 21)  # sync
        | (3 << 19)  # MPEG-1
        | (1 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (bitrate_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | (0 << 6)  # stereo
    )
    n = frame_length(bitrate_idx, sr_idx, padding)
    body = bytes(((fill * 7 + k * 3) % 251 for k in range(n - 4)))
    return struct.pack(">I", h) + body


def write_mp3(path: str, tags: list[tuple[str, str]], frames) -> None:
    with open(path, "wb") as f:
        f.write(build_id3v2(tags))
        for spec in frames:
            f.write(build_frame(*spec))


def parse_mp3(buf: bytes):
    """-> (tags dict, [frame dicts], total stats). Walks the ID3v2 tag
    then every frame header; a torn final frame is dropped."""
    tags, pos = parse_id3v2(buf)
    frames = []
    n = len(buf)
    while pos + 4 <= n:
        (h,) = struct.unpack_from(">I", buf, pos)
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"mp3: lost frame sync at byte {pos}")
        if (h >> 19) & 3 != 3 or (h >> 17) & 3 != 1:
            raise ValueError("mp3: only MPEG-1 Layer III supported")
        bi = (h >> 12) & 0xF
        si = (h >> 10) & 3
        if bi in (0, 15) or si == 3:
            raise ValueError("mp3: invalid bitrate/samplerate index")
        pad = (h >> 9) & 1
        ln = frame_length(bi, si, pad)
        if pos + ln > n:
            break  # torn final frame
        frames.append(
            {"bitrate_kbps": BITRATE_KBPS[bi], "sr": SAMPLE_RATE_HZ[si],
             "bytes": ln}
        )
        pos += ln
    return tags, frames


# --- fixtures + query ---------------------------------------------------------

MP3_FILES = 4


def _mp3_frames(f: int):
    """5 + 2f frames; VBR on odd files (bitrate index varies per
    frame), CBR on even; padding toggles every 3rd frame."""
    out = []
    for j in range(5 + 2 * f):
        bi = 9 if f % 2 == 0 else 5 + (j % 7)  # 128k CBR / 64..112k VBR
        out.append((bi, f % 3, 1 if j % 3 == 2 else 0, f * 13 + j))
    return out


def _mp3_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_mp3_frames, write_mp3, build_frame, build_id3v2, MP3_FILES)
    d = os.path.join(SCRATCH, f"mp3_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(MP3_FILES):
            write_mp3(
                os.path.join(d, f"track_{f:04d}.mp3"),
                [("TIT2", f"track {f}"), ("TALB", f"album {f % 2}")],
                _mp3_frames(f),
            )
        open(os.path.join(d, "_DONE"), "w").close()
    return d


@register(
    "mm_audio_mp3_meta",
    tags=("multimodal", "audio", "binary"),
    oracle=f"""
WITH br(i, kbps) AS (
  VALUES (0,0),(1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),(8,112),
         (9,128),(10,160),(11,192),(12,224),(13,256),(14,320)
),
sr(i, hz) AS (VALUES (0, 44100), (1, 48000), (2, 32000)),
frames AS (
  SELECT f.f, j.j,
         CASE WHEN f.f % 2 = 0 THEN 9 ELSE 5 + (j.j % 7) END AS bi,
         f.f % 3 AS si,
         CASE WHEN j.j % 3 = 2 THEN 1 ELSE 0 END AS pad
  FROM range({MP3_FILES}) f(f),
       LATERAL unnest(range(0, 5 + 2 * f.f)) AS j(j)
),
sized AS (
  SELECT fr.f, fr.j, br.kbps, sr.hz,
         144 * br.kbps * 1000 // sr.hz + fr.pad AS nbytes
  FROM frames fr JOIN br ON br.i = fr.bi JOIN sr ON sr.i = fr.si
)
SELECT CAST(f AS INTEGER) AS file_id,
       'track ' || CAST(f AS VARCHAR) AS title,
       'album ' || CAST(f % 2 AS VARCHAR) AS album,
       CAST(COUNT(*) AS INTEGER) AS n_frames,
       CAST(MAX(hz) AS INTEGER) AS sample_rate,
       CAST(SUM(nbytes) AS BIGINT) AS audio_bytes,
       CAST(COUNT(*) * {SAMPLES_PER_FRAME} * 1000 // MAX(hz) AS BIGINT)
         AS duration_ms,
       CAST(MIN(kbps) AS INTEGER) AS min_kbps,
       CAST(MAX(kbps) AS INTEGER) AS max_kbps,
       COUNT(DISTINCT kbps) > 1 AS is_vbr
FROM sized GROUP BY f
""",
)
def mm_audio_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 triage from headers alone: skip the ID3v2.4 tag via its
    syncsafe size, walk every MPEG-1 Layer III frame header through
    the bitrate/sample-rate tables (VBR fixtures vary the index per
    frame; padding toggles so the +1 byte law is load-bearing), and
    emit duration (frame count x 1152 / rate), byte totals, bitrate
    spread, the VBR flag, and the UTF-8 tag texts. The oracle
    recomputes every column from the fixture formulas through the
    same ISO tables inlined as VALUES.

    Scale: metadata is a header walk (O(frames) on headers only, one
    task per file); spectral payloads are never interpreted."""
    import pandas as pd  # noqa: F401

    d = _mp3_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "title", "album", "n_frames", "sample_rate",
                "audio_bytes", "duration_ms", "min_kbps", "max_kbps",
                "is_vbr"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                tags, frames = parse_mp3(bytes(content))
                sr_ = frames[0]["sr"]
                kbps = [fr["bitrate_kbps"] for fr in frames]
                rows.append((
                    path_, tags.get("TIT2", ""), tags.get("TALB", ""),
                    len(frames), sr_,
                    sum(fr["bytes"] for fr in frames),
                    len(frames) * SAMPLES_PER_FRAME * 1000 // sr_,
                    min(kbps), max(kbps), len(set(kbps)) > 1,
                ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.mp3"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, title string, album string, n_frames int, "
            "sample_rate int, audio_bytes bigint, duration_ms bigint, "
            "min_kbps int, max_kbps int, is_vbr boolean",
        )
    )
    return df.select(
        F.regexp_extract("path", r"track_(\d{4})\.mp3", 1)
        .cast("int")
        .alias("file_id"),
        "title",
        "album",
        "n_frames",
        "sample_rate",
        "audio_bytes",
        "duration_ms",
        "min_kbps",
        "max_kbps",
        "is_vbr",
    )
