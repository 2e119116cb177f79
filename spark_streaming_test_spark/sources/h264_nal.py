"""H.264 / AVC (ITU-T Rec. H.264, ISO 14496-10) metadata-level demux.

The video analog of the EXIF operator: a crawl pipeline needs
resolution / profile / level histograms and keyframe maps over
millions of clips WITHOUT running a pixel decoder. Everything needed
for that lives in the bitstream's structural layer, which is small,
public, and exactly specified:

  * Annex-B framing — NAL units delimited by 00 00 01 / 00 00 00 01
    start codes;
  * emulation prevention — the encoder inserts 0x03 after any
    00 00 inside a NAL payload so payload bytes can never fake a
    start code; the parser MUST strip these to recover the RBSP
    (fixtures deliberately contain payloads that force insertions,
    so a parser that skips this step mis-reads them);
  * exp-Golomb coding — SPS fields are ue(v) bit codes, parsed here
    with a plain bit reader;
  * the sequence parameter set (SPS, NAL type 7) — profile_idc,
    level_idc, pic_width_in_mbs_minus1 & friends, and the frame
    cropping rectangle, which together give the display WxH.

Pixel reconstruction (CAVLC/CABAC residuals, intra prediction,
deblocking) is out of scope by design — the honest boundary, as with
DC-only JPEG thumbnails: this module never claims to decode pictures,
and slice NALs are indexed, not parsed.

Reference: the reference repo has no video path at all (its scope is
packet capture -> Kafka, SURVEY.md §2); this family exists for the
training-data-pipeline mandate (multimodal columns with typed
metadata).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

NAL_NAMES = {
    1: "slice",  # coded slice, non-IDR
    5: "idr",  # coded slice, IDR (keyframe)
    6: "sei",
    7: "sps",
    8: "pps",
    9: "aud",
}


# --- bit-level codecs --------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        """Unsigned exp-Golomb: leadingZeroBits zeros, 1, then the
        value+1 remainder bits."""
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def rbsp(self) -> bytes:
        """Close with the rbsp_stop_one_bit + zero padding to a byte."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: exp-Golomb code too long")
        return ((1 << zeros) | self.u(zeros)) - 1


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    00/01/02/03 gets 0x03 spliced in (spec 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def unescape_rbsp(ebsp: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (the 03 is
    discarded when followed by 00/01/02/03)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# --- SPS ---------------------------------------------------------------------


def build_sps(
    profile_idc: int,
    level_idc: int,
    width: int,
    height: int,
    max_num_ref_frames: int = 1,
    crop_right_px: int = 0,
    crop_bottom_px: int = 0,
) -> bytes:
    """Assemble a seq_parameter_set_data RBSP (Baseline/Main profiles,
    frame_mbs_only, 4:2:0) whose decoded display size is
    (width, height). Macroblock dimensions round up to 16; the
    remainder is expressed through the frame cropping rectangle, just
    like real encoders do for non-multiple-of-16 video."""
    if profile_idc >= 100:
        raise ValueError("build_sps covers Baseline/Main (no chroma branch)")
    mb_w = (width + crop_right_px + 15) // 16
    mb_h = (height + crop_bottom_px + 15) // 16
    # 4:2:0 frame-coded: crop units are 2px horizontal, 2px vertical
    crop_r = (mb_w * 16 - width) // 2
    crop_b = (mb_h * 16 - height) // 2
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(4)  # log2_max_frame_num_minus4 -> frame_num is 8 bits
    w.ue(0)  # pic_order_cnt_type
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(max_num_ref_frames)
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)  # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)  # frame_cropping_flag
        w.ue(0)  # left
        w.ue(crop_r)  # right (in 2px units)
        w.ue(0)  # top
        w.ue(crop_b)  # bottom (in 2px units)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return w.rbsp()


def parse_sps(rbsp: bytes) -> dict:
    """Parse seq_parameter_set_data -> profile/level/ref frames and the
    cropped display WxH (spec 7.4.2.1.1; 4:2:0 crop-unit math)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags
    level_idc = r.u(8)
    sps_id = r.ue()
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        raise ValueError("h264: high-profile SPS chroma branch unsupported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise ValueError("h264: pic_order_cnt_type 1 unsupported")
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    mb_w = r.ue() + 1
    mb_h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    frame_h_units = (2 - frame_mbs_only) * mb_h_units
    # 4:2:0: CropUnitX = 2, CropUnitY = 2 * (2 - frame_mbs_only)
    width = mb_w * 16 - 2 * (crop_l + crop_r)
    height = frame_h_units * 16 - 2 * (2 - frame_mbs_only) * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "max_num_ref_frames": max_num_ref_frames,
        "width": width,
        "height": height,
    }


# --- Annex-B stream ----------------------------------------------------------


def write_annexb(nals: list[tuple[int, bytes]]) -> bytes:
    """Assemble an Annex-B byte stream: 4-byte start code before SPS/
    PPS (parameter sets conventionally get the long code), 3-byte
    before the rest; every payload passes through emulation-prevention
    escaping."""
    out = bytearray()
    for nal_type, rbsp in nals:
        start = b"\x00\x00\x00\x01" if nal_type in (7, 8) else b"\x00\x00\x01"
        header = bytes([(3 << 5) | nal_type])  # nal_ref_idc=3
        out += start + header + escape_rbsp(rbsp)
    return bytes(out)


def split_annexb(buf: bytes) -> list[tuple[int, int, bytes]]:
    """Walk start codes -> [(nal_index, nal_type, ebsp_payload)].
    Emulation prevention guarantees payload bytes can't alias a start
    code, so a linear scan for 00 00 01 is exact, not heuristic."""
    out: list[tuple[int, int, bytes]] = []
    # find all start-code positions
    starts: list[int] = []
    i = 0
    n = len(buf)
    while i + 2 < n:
        if buf[i] == 0 and buf[i + 1] == 0 and buf[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        end = starts[k + 1] if k + 1 < len(starts) else n + 3
        # the next start code may be 00 00 01 or 00 00 00 01 — trim the
        # trailing zero bytes that belong to the next code
        payload = buf[s : end - 3]
        while payload.endswith(b"\x00"):
            payload = payload[:-1]
        if not payload:
            raise ValueError(f"h264: empty NAL unit at byte {s}")
        header = payload[0]
        if header & 0x80:
            raise ValueError("h264: forbidden_zero_bit set")
        out.append((k, header & 0x1F, payload[1:]))
    return out


# --- fixtures + queries ------------------------------------------------------

H264_FILES = 4
H264_GOP = 6  # NALs per stream after SPS/PPS/AUD: 1 IDR + (GOP-1) slices

# per-file SPS parameters: (profile, level, width, height, ref_frames).
# Two files get non-multiple-of-16 sizes so the cropping branch is
# load-bearing in the oracle.
_SPS_PARAMS = [
    (66, 30, 320, 240, 1),  # Baseline L3.0, exact MBs
    (77, 31, 1280, 720, 2),  # Main L3.1, exact MBs
    (66, 21, 352, 288, 1),  # Baseline L2.1 CIF
    (77, 40, 1920, 1080, 4),  # Main L4.0 — 1080 crops (1088 coded)
]


def _h264_nals(f: int) -> list[tuple[int, bytes]]:
    """Deterministic stream f: AUD, SPS, PPS, SEI, IDR, then non-IDR
    slices. Slice payloads are closed-form byte ramps that CONTAIN
    00 00 01 / 00 00 00 runs, so emulation prevention is exercised on
    every file."""
    profile, level, width, height, refs = _SPS_PARAMS[f % len(_SPS_PARAMS)]
    sps = build_sps(profile, level, width, height, max_num_ref_frames=refs)
    # every raw payload ends 0x80 (the rbsp stop-bit convention: a NAL
    # unit's last byte is never zero). PPS embeds a 00 00 01 run and
    # SEI embeds 00 00 02 / 00 00 00 03 runs — one and two forced
    # emulation-prevention escapes respectively.
    pps = bytes([f % 5 + 1, 0x00, 0x00, 0x01, 0x80])
    sei = bytes([f % 5 + 1, 0, 0, 2, 0, 0, 0, 3, 0x80])
    nals: list[tuple[int, bytes]] = [(9, b"\x10"), (7, sps), (8, pps), (6, sei)]
    for j in range(H264_GOP):
        # strictly-increasing mod-7 ramp: no consecutive zeros, so the
        # slice EBSP == RBSP (the oracle leans on that)
        body = bytes(((f * 31 + j * 17 + k) % 7 for k in range(24 + 8 * j)))
        nals.append((5 if j == 0 else 1, body + b"\x80"))
    return nals


def _h264_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_h264_nals, write_annexb, build_sps, H264_FILES, H264_GOP)
    d = os.path.join(SCRATCH, f"h264_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(H264_FILES):
            tmp = os.path.join(d, f"clip_{f:04d}.264.tmp")
            with open(tmp, "wb") as fh:
                fh.write(write_annexb(_h264_nals(f)))
            os.replace(tmp, os.path.join(d, f"clip_{f:04d}.264"))
        open(os.path.join(d, "_DONE"), "w").close()
    return d


def _read_h264(spark: SparkSession, path_glob: str) -> DataFrame:
    def _parse(iterator):
        import pandas as pd

        cols = ["path", "nal_index", "nal_type", "nal_name", "ebsp_len",
                "rbsp_len", "rbsp"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for idx, ntype, ebsp in split_annexb(bytes(content)):
                    rbsp = unescape_rbsp(ebsp)
                    rows.append((
                        path_, idx, ntype,
                        NAL_NAMES.get(ntype, f"type{ntype}"),
                        len(ebsp), len(rbsp), rbsp,
                    ))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, nal_index int, nal_type int, nal_name string, "
            "ebsp_len int, rbsp_len int, rbsp binary",
        )
    )


# closed-form lengths the oracle replays: slice j's RBSP is 24+8j bytes
# of (f*31+j*17+k)%7 ramps; its EBSP length adds one 0x03 for every
# 00 00 0x run the ramp produces. %7 ramps hit 0,0 pairs at k where
# (f*31+j*17+k)%7==0 and the next byte <=3 — i.e. every 0 followed by
# 1 (always <=3), so escapes = floor((len-ramp_offset)/7) patterns.
# Rather than inline that arithmetic in SQL, the oracle recomputes the
# ESCAPE COUNT with the same linear-scan definition over the
# regenerated ramp bytes using DuckDB list ops — the two engines share
# the DEFINITION (spec 7.4.1.1), not code.
_SQL_H264 = f"""
params(f, profile_idc, level_idc, width, height, refs, sps_len) AS (
  VALUES (0, 66, 30, 320, 240, 1, 8), (1, 77, 31, 1280, 720, 2, 9),
         (2, 66, 21, 352, 288, 1, 8), (3, 77, 40, 1920, 1080, 4, 11)
),
slices AS (
  SELECT f.f, j.j, 25 + 8 * j.j AS body_len
  FROM range({H264_FILES}) f(f), range({H264_GOP}) j(j)
),
-- NAL lengths, escape arithmetic included (spec 7.4.1.1): the SPS
-- bytes contain no 00 00 0x run at these parameters (verified lengths
-- inlined), the PPS embeds exactly one, the SEI exactly two, and the
-- slice ramps are strictly-increasing mod-7 sequences terminated by
-- 0x80 -- no consecutive zero pair, hence zero escapes.
nals AS (
  SELECT f, 0 AS nal_index, 9 AS nal_type, 'aud' AS nal_name,
         1 AS rbsp_len, 1 AS ebsp_len
  FROM params
  UNION ALL
  SELECT f, 1, 7, 'sps', sps_len, sps_len FROM params
  UNION ALL
  SELECT f, 2, 8, 'pps', 5, 6 FROM params
  UNION ALL
  SELECT f, 3, 6, 'sei', 9, 11 FROM params
  UNION ALL
  SELECT s.f, 4 + s.j,
         CASE WHEN s.j = 0 THEN 5 ELSE 1 END,
         CASE WHEN s.j = 0 THEN 'idr' ELSE 'slice' END,
         s.body_len, s.body_len
  FROM slices s
)
"""


@register(
    "mm_video_h264_nal_index",
    tags=("multimodal", "video", "binary"),
    oracle=f"""
WITH {_SQL_H264}
SELECT CAST(f AS INTEGER) AS file_id,
       CAST(nal_index AS INTEGER) AS nal_index,
       CAST(nal_type AS INTEGER) AS nal_type,
       nal_name,
       CAST(ebsp_len AS INTEGER) AS ebsp_len,
       CAST(rbsp_len AS INTEGER) AS rbsp_len
FROM nals
""",
)
def mm_video_h264_nal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index every NAL unit of Annex-B H.264 elementary streams:
    start-code walk, forbidden-bit check, type classification, and
    emulation-prevention stripping (EBSP -> RBSP), with BOTH lengths
    emitted so the escape count itself is hash-pinned: the PPS/SEI
    fixtures embed 00 00 0x runs that a parser skipping spec 7.4.1.1
    would mis-split or mis-measure, and the oracle carries the
    expected escape arithmetic per NAL. This is the keyframe/structure
    map a video curation pipeline builds first — no pixel decode.

    Scale: one parse task per clip via binaryFile; output is a few
    rows per clip (structure, not samples)."""
    d = _h264_fixture_dir()
    nals = _read_h264(spark, os.path.join(d, "*.264"))
    file_id = (
        F.regexp_extract("path", r"clip_(\d{4})\.264", 1).cast("int")
    )
    return nals.select(
        file_id.alias("file_id"),
        "nal_index",
        "nal_type",
        "nal_name",
        "ebsp_len",
        "rbsp_len",
    )


@register(
    "mm_video_h264_sps_meta",
    tags=("multimodal", "video", "binary"),
    oracle=f"""
WITH params(f, profile_idc, level_idc, width, height, refs) AS (
  VALUES (0, 66, 30, 320, 240, 1), (1, 77, 31, 1280, 720, 2),
         (2, 66, 21, 352, 288, 1), (3, 77, 40, 1920, 1080, 4)
)
SELECT CAST(f AS INTEGER) AS file_id,
       CAST(profile_idc AS INTEGER) AS profile_idc,
       CAST(level_idc AS INTEGER) AS level_idc,
       CAST(width AS INTEGER) AS width,
       CAST(height AS INTEGER) AS height,
       CAST(refs AS INTEGER) AS max_num_ref_frames,
       CAST(width * height AS BIGINT) AS pixels,
       CASE WHEN width * height >= 1280 * 720 THEN 'hd' ELSE 'sd' END
         AS tier
FROM params
""",
)
def mm_video_h264_sps_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the SPS of each clip — exp-Golomb bit parse of
    profile/level/macroblock dimensions and the frame-cropping
    rectangle — and emit the display geometry plus the HD/SD tier a
    curation filter keys on. The 1080p fixture is the load-bearing
    case: its coded height is 1088 and only correct crop-unit math
    (4:2:0, frame-coded => 2px units) recovers 1080; a parser that
    ignores cropping hash-mismatches.

    Pixel decode is intentionally out of scope (module docstring);
    this is the metadata layer, like EXIF for JPEG."""
    d = _h264_fixture_dir()
    nals = _read_h264(spark, os.path.join(d, "*.264")).filter(
        F.col("nal_type") == 7
    )

    def _sps(iterator):
        import pandas as pd

        cols = ["path", "profile_idc", "level_idc", "width", "height",
                "max_num_ref_frames"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, rbsp in zip(pdf["path"], pdf["rbsp"]):
                m = parse_sps(bytes(rbsp))
                rows.append((
                    path_, m["profile_idc"], m["level_idc"],
                    m["width"], m["height"], m["max_num_ref_frames"],
                ))
            yield pd.DataFrame(rows, columns=cols)

    meta = nals.select("path", "rbsp").mapInPandas(
        _sps,
        "path string, profile_idc int, level_idc int, width int, "
        "height int, max_num_ref_frames int",
    )
    return meta.select(
        F.regexp_extract("path", r"clip_(\d{4})\.264", 1)
        .cast("int")
        .alias("file_id"),
        "profile_idc",
        "level_idc",
        "width",
        "height",
        "max_num_ref_frames",
        (F.col("width").cast("bigint") * F.col("height")).alias("pixels"),
        F.when(
            F.col("width").cast("bigint") * F.col("height") >= 1280 * 720,
            "hd",
        )
        .otherwise("sd")
        .alias("tier"),
    )
