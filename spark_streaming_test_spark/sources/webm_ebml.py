"""Matroska / WebM (EBML) demux — metadata level, no codec decode.

The other web video container (alongside ISO BMFF): an EBML document
— the binary-XML scheme where every element is (vint ID, vint size,
payload) and "master" elements nest. Covered here:

  * EBML varints: element IDs keep their length-marker byte verbatim
    (the spec's convention), sizes strip it; widths 1-8;
  * the EBML header (DocType webm/matroska, version gates);
  * Segment -> Info (TimecodeScale, Duration as an IEEE-754 double),
    Tracks -> TrackEntry (number, type, CodecID, Video PixelWidth/
    PixelHeight), Clusters -> Timecode + SimpleBlocks;
  * SimpleBlock framing: track vint + int16 relative timecode +
    flags (bit 0x80 = keyframe) + opaque codec payload — giving the
    keyframe map and block accounting without touching VP8/VP9 bits
    (the same boundary as the H.264 and MP3 modules).

Unknown-size elements (live-streamed Matroska) raise explicitly;
unknown element IDs inside master elements are SKIPPED by size — the
EBML forward-compat rule that makes real-world files parseable."""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

# element IDs (stored verbatim, marker included)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTERS = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, CLUSTER}


def encode_vint_size(n: int) -> bytes:
    """EBML size vint: smallest width whose all-ones value exceeds n
    (all-ones is reserved for 'unknown size')."""
    for w in range(1, 9):
        if n < (1 << (7 * w)) - 1:
            b = n.to_bytes(w, "big")
            return bytes([b[0] | (0x80 >> (w - 1))]) + b[1:]
    raise ValueError("ebml: size too large")


def _id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def element(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + encode_vint_size(len(payload)) + payload


def uint_el(eid: int, v: int) -> bytes:
    return element(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _read_vint(buf: bytes, pos: int, keep_marker: bool):
    """EBML vint at ``pos`` -> (value, next_pos). The length-marker
    bit sits at global bit 7*w of the w-byte big-endian value; IDs
    keep it (the spec stores IDs verbatim), sizes clear it."""
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("ebml: invalid vint lead byte 0x00")
    w = 9 - b0.bit_length()
    raw = buf[pos : pos + w]
    if len(raw) < w:
        raise ValueError("ebml: vint past end of buffer")
    v = int.from_bytes(raw, "big")
    if not keep_marker:
        v ^= 1 << (7 * w)
    return v, pos + w


def read_element(buf: bytes, pos: int):
    """-> (element_id, payload_start, payload_end, next_pos)."""
    eid, pos = _read_vint(buf, pos, keep_marker=True)
    size_width = 9 - buf[pos].bit_length()
    size, pos = _read_vint(buf, pos, keep_marker=False)
    if size == (1 << (7 * size_width)) - 1:
        raise ValueError(
            "ebml: unknown-size (all-ones) elements unsupported"
        )
    end = pos + size
    if end > len(buf):
        raise ValueError(f"ebml: element 0x{eid:X} runs past end of buffer")
    return eid, pos, end, end


def walk(buf: bytes, start: int, end: int):
    """Yield (eid, payload_start, payload_end) for the children of a
    master element's payload range."""
    pos = start
    while pos < end:
        eid, p0, p1, pos = read_element(buf, pos)
        yield eid, p0, p1


# --- writer -------------------------------------------------------------------


def write_webm(
    path: str,
    codec_id: str,
    width: int,
    height: int,
    clusters: list[list[tuple[int, bool, bytes]]],
    timecode_scale: int = 1_000_000,
    duration_ms: float | None = None,
) -> None:
    """clusters = [[(rel_timecode_ms, keyframe, payload)]], one inner
    list per Cluster; cluster c gets Timecode c*1000."""
    header = element(
        EBML_HEADER,
        uint_el(0x4286, 1)  # EBMLVersion
        + uint_el(0x42F7, 1)  # EBMLReadVersion
        + uint_el(0x42F2, 4)  # EBMLMaxIDLength
        + uint_el(0x42F3, 8)  # EBMLMaxSizeLength
        + element(DOCTYPE, b"webm")
        + uint_el(0x4287, 4)  # DocTypeVersion
        + uint_el(0x4285, 2),  # DocTypeReadVersion
    )
    info = element(
        INFO,
        uint_el(TIMECODE_SCALE, timecode_scale)
        + (
            element(DURATION, struct.pack(">d", duration_ms))
            if duration_ms is not None
            else b""
        ),
    )
    video = element(
        VIDEO, uint_el(PIXEL_WIDTH, width) + uint_el(PIXEL_HEIGHT, height)
    )
    track = element(
        TRACK_ENTRY,
        uint_el(TRACK_NUMBER, 1)
        + uint_el(TRACK_TYPE, 1)  # video
        + element(CODEC_ID, codec_id.encode("ascii"))
        + video,
    )
    tracks = element(TRACKS, track)
    cluster_bytes = b""
    for c, blocks in enumerate(clusters):
        body = uint_el(CLUSTER_TIMECODE, c * 1000)
        for rel, key, payload in blocks:
            body += element(
                SIMPLE_BLOCK,
                bytes([0x80 | 1])  # track 1 as a 1-byte vint
                + struct.pack(">h", rel)
                + bytes([0x80 if key else 0x00])
                + payload,
            )
        cluster_bytes += element(CLUSTER, body)
    segment = element(SEGMENT, info + tracks + cluster_bytes)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header + segment)
    os.replace(tmp, path)


# --- reader -------------------------------------------------------------------


def parse_webm(buf: bytes) -> dict:
    eid, p0, p1, pos = read_element(buf, 0)
    if eid != EBML_HEADER:
        raise ValueError(f"ebml: first element is 0x{eid:X}, not EBML header")
    doctype = None
    for cid, c0, c1 in walk(buf, p0, p1):
        if cid == DOCTYPE:
            doctype = buf[c0:c1].decode("ascii")
    if doctype not in ("webm", "matroska"):
        raise ValueError(f"ebml: doctype {doctype!r} unsupported")
    eid, p0, p1, _ = read_element(buf, pos)
    if eid != SEGMENT:
        raise ValueError("ebml: Segment element missing")
    out = {
        "doctype": doctype,
        "timecode_scale": 1_000_000,
        "duration": None,
        "codec_id": None,
        "width": None,
        "height": None,
        "n_clusters": 0,
        "n_blocks": 0,
        "n_keyframes": 0,
        "payload_bytes": 0,
    }
    for cid, c0, c1 in walk(buf, p0, p1):
        if cid == INFO:
            for iid, i0, i1 in walk(buf, c0, c1):
                if iid == TIMECODE_SCALE:
                    out["timecode_scale"] = int.from_bytes(buf[i0:i1], "big")
                elif iid == DURATION:
                    out["duration"] = struct.unpack(">d", buf[i0:i1])[0]
        elif cid == TRACKS:
            for tid, t0, t1 in walk(buf, c0, c1):
                if tid != TRACK_ENTRY:
                    continue
                for fid, f0, f1 in walk(buf, t0, t1):
                    if fid == CODEC_ID:
                        out["codec_id"] = buf[f0:f1].decode("ascii")
                    elif fid == VIDEO:
                        for vid, v0, v1 in walk(buf, f0, f1):
                            if vid == PIXEL_WIDTH:
                                out["width"] = int.from_bytes(buf[v0:v1], "big")
                            elif vid == PIXEL_HEIGHT:
                                out["height"] = int.from_bytes(buf[v0:v1], "big")
        elif cid == CLUSTER:
            out["n_clusters"] += 1
            for kid, k0, k1 in walk(buf, c0, c1):
                if kid != SIMPLE_BLOCK:
                    continue
                track, p = _read_vint(buf, k0, keep_marker=False)
                flags = buf[p + 2]
                out["n_blocks"] += 1
                if flags & 0x80:
                    out["n_keyframes"] += 1
                out["payload_bytes"] += k1 - (p + 3)
    return out


# --- fixtures + query -----------------------------------------------------------

WEBM_FILES = 4
_WEBM_PARAMS = [
    ("V_VP8", 640, 360), ("V_VP9", 1280, 720),
    ("V_VP8", 320, 240), ("V_AV1", 1920, 1080),
]


def _webm_clusters(f: int):
    """2 + f clusters x 4 blocks; keyframe on each cluster's first
    block; payload sizes are the closed form 30 + 5*(c*4+j)."""
    out = []
    for c in range(2 + f):
        blocks = []
        for j in range(4):
            size = 30 + 5 * (c * 4 + j)
            payload = bytes(((f * 11 + c * 7 + j * 3 + k) % 253 for k in range(size)))
            blocks.append((j * 40, j == 0, payload))
        out.append(blocks)
    return out


def _webm_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_webm_clusters, write_webm, encode_vint_size, WEBM_FILES)
    d = os.path.join(SCRATCH, f"webm_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(WEBM_FILES):
            codec, w, h = _WEBM_PARAMS[f]
            write_webm(
                os.path.join(d, f"vid_{f:04d}.webm"),
                codec, w, h, _webm_clusters(f),
                duration_ms=float((2 + f) * 4 * 40),
            )
        open(os.path.join(d, "_DONE"), "w").close()
    return d


@register(
    "mm_video_webm_meta",
    tags=("multimodal", "video", "binary"),
    oracle=f"""
WITH params(f, codec_id, width, height) AS (
  VALUES (0, 'V_VP8', 640, 360), (1, 'V_VP9', 1280, 720),
         (2, 'V_VP8', 320, 240), (3, 'V_AV1', 1920, 1080)
),
blocks AS (
  SELECT f.f, c.c, j.j, 30 + 5 * (c.c * 4 + j.j) AS size
  FROM range({WEBM_FILES}) f(f),
       LATERAL unnest(range(0, 2 + f.f)) AS c(c),
       LATERAL unnest(range(0, 4)) AS j(j)
)
SELECT CAST(p.f AS INTEGER) AS file_id,
       'webm' AS doctype,
       p.codec_id,
       CAST(p.width AS INTEGER) AS width,
       CAST(p.height AS INTEGER) AS height,
       CAST(2 + p.f AS INTEGER) AS n_clusters,
       CAST((2 + p.f) * 4 AS INTEGER) AS n_blocks,
       CAST(2 + p.f AS INTEGER) AS n_keyframes,
       CAST(SUM(b.size) AS BIGINT) AS payload_bytes,
       CAST((2 + p.f) * 4 * 40 AS BIGINT) AS duration_ms
FROM params p JOIN blocks b ON b.f = p.f
GROUP BY p.f, p.codec_id, p.width, p.height
""",
)
def mm_video_webm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebM/Matroska triage from the EBML structure: doctype gate,
    CodecID + pixel geometry from the track entry, TimecodeScale-
    normalized Duration, and the keyframe/block/byte census from
    walking Cluster SimpleBlocks (flags bit 0x80) — VP8/VP9/AV1
    payloads stay opaque. Unknown elements are skipped by size, the
    EBML forward-compat rule, so extra elements in real files don't
    break the walk.

    Scale: pure structure walk, one task per file, O(1) rows out."""
    import pandas as pd  # noqa: F401

    d = _webm_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "doctype", "codec_id", "width", "height",
                "n_clusters", "n_blocks", "n_keyframes", "payload_bytes",
                "duration_ms"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                m = parse_webm(bytes(content))
                dur_ms = int(
                    m["duration"] * m["timecode_scale"] / 1_000_000.0
                )
                rows.append((
                    path_, m["doctype"], m["codec_id"], m["width"],
                    m["height"], m["n_clusters"], m["n_blocks"],
                    m["n_keyframes"], m["payload_bytes"], dur_ms,
                ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.webm"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, doctype string, codec_id string, width int, "
            "height int, n_clusters int, n_blocks int, n_keyframes int, "
            "payload_bytes bigint, duration_ms bigint",
        )
    )
    return df.select(
        F.regexp_extract("path", r"vid_(\d{4})\.webm", 1)
        .cast("int")
        .alias("file_id"),
        "doctype",
        "codec_id",
        "width",
        "height",
        "n_clusters",
        "n_blocks",
        "n_keyframes",
        "payload_bytes",
        "duration_ms",
    )
