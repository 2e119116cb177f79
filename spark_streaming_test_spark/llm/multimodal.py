"""Multimodal column conventions: opaque binary payloads + typed
metadata, with Arrow-batched Pandas-UDF plumbing for decode /
feature-extract / resize / frame-sample stages.

Contract (SURVEY.md §2.1 north star): image/audio/video travel as
``binary`` columns with sibling metadata columns; all heavy per-item
work runs in ``mapInPandas`` over Arrow batches so Python touches each
byte once per batch, never per row. The actual media decoding libraries
(PIL/ffmpeg/torchaudio) are NOT in this container — the decode step is
a clearly-marked stub (deterministic fake behind an import-try), but
the Spark-side plumbing (schema, batch iteration, partitioning, UDF
signatures) is real and tested.

The ``documents`` table stands in as the payload source: text bytes ==
the opaque blob. At 100 TB the payload column dominates storage — the
metadata-only queries below never deserialize it (column pruning reads
just the small columns), which is the whole point of the layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

FEATURE_DIM = 8

try:  # real decoders, if ever present in the image
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_LIBS = True
except ImportError:
    HAVE_IMAGE_LIBS = False


def decode_image(payload: bytes) -> object:
    """Real decode path — unavailable in this container by design."""
    if not HAVE_IMAGE_LIBS:
        raise NotImplementedError(
            "media decode libs not installed; use fake_features (stub) instead"
        )
    raise NotImplementedError("wire PIL decode here when libs are present")


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decode+embed stage: FEATURE_DIM
    floats derived from payload bytes (stable across runs/partitions)."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)
    ]


@register(
    "mm_binary_metadata",
    tags=("llm", "multimodal"),
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       md5(text) AS payload_md5,
       'text/plain' AS mime,
       octet_length(encode(text)) > 300 AS is_large
FROM documents
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata, computed without any
    Python: encode -> binary, octet_length, md5 digest, mime tag,
    size-class routing. At scale this query prunes to metadata only."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lit("text/plain").alias("mime"),
        (F.octet_length(payload) > 300).alias("is_large"),
    )


@register(
    "mm_feature_extract_stub",
    tags=("llm", "multimodal", "pandas-udf"),
    # rows-only: the fake feature vector is an engine-side construct;
    # determinism + batch shape are asserted in tests/test_llm.py.
)
def mm_feature_extract_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract plumbing over Arrow batches: binary
    payloads stream through ``mapInPandas`` (one Python roundtrip per
    ~10k-row batch), emitting a FEATURE_DIM float vector + byte size
    per item. The feature fn is the documented deterministic stub —
    swap ``_fake_features`` for a real decoder when libs exist."""
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return src.mapInPandas(
        extract, schema="doc_id long, n_bytes long, features array<double>"
    )


@register(
    "mm_frame_sample_stub",
    tags=("llm", "multimodal", "pandas-udf"),
    # rows-only (same rationale as mm_feature_extract_stub)
)
def mm_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: each payload yields ceil(n_bytes/256)
    'frames' (stand-in for video frame extraction) — a 1->N generator
    inside mapInPandas, the shape a real ffmpeg sampler would use.
    Output rows carry (doc_id, frame_idx, frame_md5)."""
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                chunks = [payload[i : i + 256] for i in range(0, len(payload), 256)]
                for idx, chunk in enumerate(chunks):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_md5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return src.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_md5 string"
    )


@register(
    "mm_resize_stub",
    tags=("llm", "multimodal", "pandas-udf"),
    # rows-only (engine-side stub; determinism asserted in tests/test_llm.py)
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payloads stream through ``mapInPandas``
    and come back re-scaled to a fixed TARGET_BYTES budget (truncate or
    cycle-pad — the deterministic stand-in for an image resample; swap
    the inner fn for PIL ``Image.resize`` when libs exist). Emits the
    resized payload WITH its provenance metadata (orig/new sizes, scale
    factor) — the payload column stays opaque binary end-to-end, which
    is the invariant that matters at 100 TB: Python touches bytes only
    inside the Arrow batch, the engine never interprets them."""
    TARGET_BYTES = 128
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resize_one(payload: bytes) -> bytes:
            if payload is None or len(payload) == 0:
                # empty payload: nothing to cycle-pad from — zero-fill
                return b"\x00" * TARGET_BYTES
            if len(payload) >= TARGET_BYTES:
                return bytes(payload[:TARGET_BYTES])
            reps = (TARGET_BYTES + len(payload) - 1) // len(payload)
            return bytes((payload * reps)[:TARGET_BYTES])

        for pdf in batches:
            resized = pdf["payload"].map(_resize_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["payload"].map(len),
                    "resized": resized,
                    "new_bytes": resized.map(len),
                }
            )

    return src.mapInPandas(
        resize,
        schema="doc_id long, orig_bytes long, resized binary, new_bytes long",
    )


# --- perceptual average-hash dedup (REAL numpy compute, not a stub) -------

AHASH_BITS = 32


@register(
    "mm_avg_hash_dedup",
    tags=("llm", "multimodal", "dedup", "pandas-udf"),
    oracle=f"""
WITH b AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         ord(substr(text, CAST(t.i AS INTEGER) + 1, 1)) AS byte,
         length(text) AS n
  FROM documents, LATERAL unnest(range(0, length(text))) AS t(i)
),
chunk AS (
  SELECT doc_id, (i * {AHASH_BITS}) // n AS c,
         SUM(byte) AS s_i, COUNT(*) AS n_i
  FROM b GROUP BY doc_id, (i * {AHASH_BITS}) // n
),
tot AS (SELECT doc_id, SUM(byte) AS s, COUNT(*) AS n FROM b GROUP BY doc_id),
hashes AS (
  SELECT chunk.doc_id AS doc_id,
         CAST(SUM(CASE WHEN s_i * tot.n > tot.s * n_i
                  THEN (CAST(1 AS BIGINT) << CAST(c AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS ahash
  FROM chunk JOIN tot ON chunk.doc_id = tot.doc_id
  GROUP BY chunk.doc_id
)
SELECT doc_id, ahash,
       CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same_hash,
       doc_id = MIN(doc_id) OVER (PARTITION BY ahash) AS keep
FROM hashes
""",
)
def mm_avg_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over the opaque binary payload — the
    image near-dup workhorse (aHash), computed for REAL with
    numpy-vectorized Arrow batches (this is not one of the decode
    stubs: byte-signal hashing needs no media libs). Per payload:
    resample the byte stream into {AHASH_BITS} equal spans, set bit i
    when span i's mean exceeds the global mean, then group identical
    hashes into duplicate clusters (min doc_id survives).

    The threshold compare stays in EXACT integer cross-multiplied form
    (span_sum · n_total > total_sum · span_len) — no float mean, so
    the Python path and the SQL oracle agree bit-for-bit; a real image
    pipeline would first decode+grayscale in this same mapInPandas
    slot. Scale: the hash pass is embarrassingly parallel over Arrow
    batches (payload bytes touched once); the dedup groupBy shuffles
    8-byte hashes, never payloads — identical shape to
    ``dedup_exact``."""
    import numpy as np

    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes) -> int:
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n = len(b)
            if n == 0:
                return 0
            idx = (np.arange(n) * AHASH_BITS) // n
            s_i = np.bincount(idx, weights=b, minlength=AHASH_BITS).astype(
                np.int64
            )
            n_i = np.bincount(idx, minlength=AHASH_BITS).astype(np.int64)
            bits = (s_i * n > b.sum() * n_i).astype(np.int64)
            return int((bits << np.arange(AHASH_BITS)).sum())

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": pdf["payload"].map(one)}
            )

    hashes = src.mapInPandas(ahash, schema="doc_id long, ahash long")
    from pyspark.sql import Window

    w = Window.partitionBy("ahash")
    return hashes.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_same_hash"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )
