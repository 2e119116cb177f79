"""Ogg container (RFC 3533) page demux — metadata level.

The container under Vorbis/Opus/Theora streams. Covered: the page
grammar ("OggS" capture pattern, version 0, header-type flags for
bos/continuation/eos, 64-bit granule position, stream serial, page
sequence numbers, the 255-terminated lacing-value segment table that
reassembles packets across pages) and the format's own CRC-32
(polynomial 0x04C11DB7, unreflected, init 0, no final xor — NOT the
zlib CRC; computed with the checksum field zeroed). Codec packets
stay opaque — the H.264/MP3/WebM boundary.

Page sequence gaps and CRC mismatches raise (the spec's loss-
detection design); a torn final page is dropped (the pcap/warc
convention)."""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

# Ogg CRC-32: 0x04C11DB7, MSB-first, init 0, no reflection, no xor-out
_OGG_CRC_TBL = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _c & 0x80000000 else (_c << 1) & 0xFFFFFFFF
    _OGG_CRC_TBL.append(_c)


def ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TBL[((c >> 24) ^ b) & 0xFF]
    return c


def build_page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    bos: bool = False,
    eos: bool = False,
    continued: bool = False,
) -> bytes:
    """One page holding whole packets (lacing: 255-runs + terminator)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)  # terminator < 255 (0 for exact multiples)
        body += p
    htype = (1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0)
    header = (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<qIII", granule, serial, seq, 0)  # CRC zeroed
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    crc = ogg_crc(header + bytes(body))
    page = bytearray(header + bytes(body))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def parse_ogg(buf: bytes):
    """-> per-stream dict keyed by serial: page/packet accounting.
    Verifies every page CRC and the per-stream sequence continuity."""
    pos = 0
    n = len(buf)
    streams: dict[int, dict] = {}
    while pos < n:
        if n - pos < 27:
            break  # torn final page header
        if buf[pos : pos + 4] != b"OggS":
            raise ValueError(f"ogg: lost capture pattern at byte {pos}")
        if buf[pos + 4] != 0:
            raise ValueError(f"ogg: version {buf[pos + 4]} unsupported")
        htype = buf[pos + 5]
        granule, serial, seq, want_crc = struct.unpack_from("<qIII", buf, pos + 6)
        nsegs = buf[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > n:
            break  # torn lacing table
        lacing = buf[pos + 27 : lace_end]
        body_len = sum(lacing)
        end = lace_end + body_len
        if end > n:
            break  # torn body
        page = bytearray(buf[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != want_crc:
            raise ValueError(f"ogg: page {seq} (serial {serial}) CRC mismatch")
        st = streams.setdefault(
            serial,
            {"n_pages": 0, "n_packets": 0, "payload_bytes": 0,
             "first_granule": granule, "last_granule": granule,
             "bos_seen": False, "eos_seen": False, "next_seq": seq},
        )
        if seq != st["next_seq"]:
            raise ValueError(
                f"ogg: serial {serial} page sequence gap "
                f"({seq} after {st['next_seq'] - 1})"
            )
        st["next_seq"] = seq + 1
        st["n_pages"] += 1
        st["last_granule"] = granule
        if htype & 2:
            st["bos_seen"] = True
        if htype & 4:
            st["eos_seen"] = True
        # completed packets on this page = lacing values < 255 (a
        # 255-terminated run continues into the next segment/page)
        st["n_packets"] += sum(1 for v in lacing if v < 255)
        st["payload_bytes"] += body_len
        pos = end
    return streams


# --- fixtures + query ---------------------------------------------------------

OGG_FILES = 4


def _ogg_packets(f: int, p: int) -> list[bytes]:
    """Page p of file f: 2 packets; sizes exercise the 255-run lacing
    (incl. an exact multiple of 255 on file 3, whose terminator is 0)."""
    sizes = [40 + 30 * p + f, 510 if (f == 3 and p == 1) else 25 + 11 * p]
    return [
        bytes(((f * 13 + p * 7 + i * 3 + k) % 251 for k in range(sz)))
        for i, sz in enumerate(sizes)
    ]


def _ogg_n_pages(f: int) -> int:
    return 3 + f


def _ogg_fixture_dir() -> str:
    from spark_streaming_test_spark.fixtures import fixture_rev
    from spark_streaming_test_spark.llm.multimodal import SCRATCH

    rev = fixture_rev(_ogg_packets, _ogg_n_pages, build_page, OGG_FILES)
    d = os.path.join(SCRATCH, f"ogg_{rev}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        os.makedirs(d, exist_ok=True)
        for f in range(OGG_FILES):
            serial = 0xABC0 + f
            npages = _ogg_n_pages(f)
            with open(os.path.join(d, f"a_{f:04d}.ogg"), "wb") as fh:
                for p in range(npages):
                    fh.write(
                        build_page(
                            serial, p, (p + 1) * 960,
                            _ogg_packets(f, p),
                            bos=(p == 0), eos=(p == npages - 1),
                        )
                    )
        open(os.path.join(d, "_DONE"), "w").close()
    return d


@register(
    "mm_audio_ogg_pages",
    tags=("multimodal", "audio", "binary"),
    oracle=f"""
WITH pages AS (
  SELECT f.f, p.p,
         40 + 30 * p.p + f.f AS sz1,
         CASE WHEN f.f = 3 AND p.p = 1 THEN 510 ELSE 25 + 11 * p.p END AS sz2
  FROM range({OGG_FILES}) f(f),
       LATERAL unnest(range(0, 3 + f.f)) AS p(p)
)
SELECT CAST(f AS INTEGER) AS file_id,
       CAST(43968 + f AS BIGINT) AS serial,
       CAST(3 + f AS INTEGER) AS n_pages,
       CAST(2 * (3 + f) AS INTEGER) AS n_packets,
       CAST(SUM(sz1 + sz2) AS BIGINT) AS payload_bytes,
       CAST((3 + f) * 960 AS BIGINT) AS last_granule,
       TRUE AS bos_seen,
       TRUE AS eos_seen
FROM pages GROUP BY f
""",
)
def mm_audio_ogg_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg stream census from the page layer: per-serial page and
    packet counts (lacing-table reassembly — file 3 carries an
    exact-510-byte packet whose lacing is 255,255,0, the terminator
    case naive readers drop), payload byte totals, final granule
    position (the duration anchor), and bos/eos flags, with every
    page's unreflected CRC-32 verified and sequence gaps detected.
    Codec packets are never interpreted.

    Scale: one task per file; pages are the container's own streaming
    unit, so a range-read resumes at the next capture pattern."""
    import pandas as pd  # noqa: F401

    d = _ogg_fixture_dir()

    def _parse(iterator):
        import pandas as pd

        cols = ["path", "serial", "n_pages", "n_packets", "payload_bytes",
                "last_granule", "bos_seen", "eos_seen"]
        for pdf in iterator:
            rows: list[tuple] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for serial, st in sorted(parse_ogg(bytes(content)).items()):
                    rows.append((
                        path_, serial, st["n_pages"], st["n_packets"],
                        st["payload_bytes"], st["last_granule"],
                        st["bos_seen"], st["eos_seen"],
                    ))
            yield pd.DataFrame(rows, columns=cols)

    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(d, "*.ogg"))
        .select("path", "content")
        .mapInPandas(
            _parse,
            "path string, serial bigint, n_pages int, n_packets int, "
            "payload_bytes bigint, last_granule bigint, bos_seen boolean, "
            "eos_seen boolean",
        )
    )
    return df.select(
        F.regexp_extract("path", r"a_(\d{4})\.ogg", 1)
        .cast("int")
        .alias("file_id"),
        "serial",
        "n_pages",
        "n_packets",
        "payload_bytes",
        "last_granule",
        "bos_seen",
        "eos_seen",
    )
