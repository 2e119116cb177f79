"""Hash / binary-encoding and regexp scalar-function suites
(SURVEY.md §2.1 scalar-fns family, generalized from the reference's single
``byte[].length`` projection — ``MainApp.java:41-42``).

Content hashing is the workhorse of every 100 TB pipeline stage that needs
determinism: dedup keys, sampling decisions, split assignment, fingerprints.
All of these are JVM-side Catalyst expressions inside whole-stage codegen —
a pure narrow projection over the scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register


@register(
    "fn_hash_suite",
    tags=("function", "hash"),
    oracle="""
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       substr(md5(text), 1, 8) AS h_short,
       to_base64(encode(substr(text, 1, 12))) AS b64_prefix,
       hex(substr(text, 1, 8)) AS hex_prefix,
       length(text) * 8 AS bits
FROM documents
""",
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic + encoding functions: md5, sha2-256, truncated
    digest (the bucketing idiom), base64 and hex of a binary prefix,
    bit length. One codegen'd projection — the dedup/sampling key
    toolbox at scan speed."""
    d = spread(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.substring(F.md5("text"), 1, 8).alias("h_short"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64_prefix"),
        F.hex(F.substring("text", 1, 8).cast("binary")).alias("hex_prefix"),
        (F.length("text") * 8).alias("bits"),
    )


@register(
    "fn_regexp_suite",
    tags=("function", "regexp"),
    oracle=r"""
SELECT doc_id,
       regexp_replace(text, '[aeiou]+', '_', 'g') AS devoweled,
       len(regexp_extract_all(text, '[a-z]+')) AS n_lower_runs,
       nullif(regexp_extract(text, '[a-z]{5,}'), '') AS first_long_word,
       regexp_matches(text, '^[A-Z]') AS starts_upper,
       len(string_split_regex(text, '\s+')) AS n_fields
FROM documents
""",
)
def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: global replace (Spark's default = DuckDB's 'g'
    flag), match counting, first-match extraction (NULL on no match on
    both engines), anchored boolean match, regex split. All Java-regex
    compatible patterns so semantics agree engine-to-engine."""
    d = spread(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]+", "_").alias("devoweled"),
        F.regexp_count("text", F.lit("[a-z]+")).alias("n_lower_runs"),
        F.regexp_substr("text", F.lit("[a-z]{5,}")).alias("first_long_word"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
        F.size(F.split("text", r"\s+")).alias("n_fields"),
    )


@register(
    "fn_uuid_surrogate_keys",
    tags=("function", "hash", "keys"),
    oracle="""
WITH h AS (
  SELECT o_orderkey, md5('order:' || CAST(o_orderkey AS VARCHAR)) AS hx
  FROM orders
)
SELECT o_orderkey,
       substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5'
         || substr(hx, 14, 3) || '-8' || substr(hx, 18, 3) || '-'
         || substr(hx, 21, 12) AS surrogate_uuid,
       length(substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5'
         || substr(hx, 14, 3) || '-8' || substr(hx, 18, 3) || '-'
         || substr(hx, 21, 12)) AS n_chars
FROM h
""",
)
def fn_uuid_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based surrogate UUIDs (the UUIDv5 idea:
    namespace + natural key → stable id): md5 of 'order:<key>'
    formatted as a version-5/variant-1 UUID string. Unlike ``uuid()``
    (random, breaks replays and joins), the same row gets the same id
    on every run, engine, and backfill — the only kind of surrogate
    key a deterministic pipeline can ship. Pure codegen projection."""
    h = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.md5(F.concat(F.lit("order:"), F.col("o_orderkey").cast("string"))).alias(
            "hx"
        ),
    )
    uuid_col = F.concat(
        F.substring("hx", 1, 8), F.lit("-"),
        F.substring("hx", 9, 4), F.lit("-5"),
        F.substring("hx", 14, 3), F.lit("-8"),
        F.substring("hx", 18, 3), F.lit("-"),
        F.substring("hx", 21, 12),
    )
    return h.select(
        "o_orderkey",
        uuid_col.alias("surrogate_uuid"),
        F.length(uuid_col).alias("n_chars"),
    )


# --- AES column encryption roundtrip --------------------------------------

_AES_KEY = "0123456789abcdef"   # 16-byte demo key (AES-128)
_AES_WRONG = "ffffffffffffffff"


@register(
    "fn_aes_roundtrip",
    tags=("functions", "crypto"),
    oracle="""
SELECT doc_id,
       CAST(((length(text) // 16) + 1) * 16 AS BIGINT) AS cipher_len,
       length(text) = length(text) AS roundtrip_ok,
       TRUE AS wrong_key_differs
FROM documents
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: `aes_encrypt`/`aes_decrypt`
    (AES-128-ECB for determinism) with three verifiable claims per
    document — the ciphertext length equals the PKCS7-padded block
    count the oracle predicts from the plaintext length alone
    ((len/16 + 1)·16), decrypting with the right key returns the exact
    plaintext, and `try_aes_decrypt` with the WRONG key never
    reproduces the plaintext — usually NULL (padding check fails), in
    the ~1/256 of rows where PKCS7 happens to validate, garbage bytes
    that differ from the input (measured at sf0.1: a pure "wrong key
    ⇒ NULL" claim is falsified by those padding collisions).
    The oracle can't run AES, but it can falsify every claim — the
    `agg_heavy_hitters_claim` pattern applied to crypto.

    Pure projection — no shuffle; encryption cost is per-row CPU at
    scan time. ECB is used here for cross-run determinism of the
    length claim; production column crypto uses GCM with random IVs
    (same API surface, +28 bytes: 12 IV + 16 tag)."""
    d = load(spark, sf_dir, "documents")
    enc = F.expr(f"aes_encrypt(text, '{_AES_KEY}', 'ECB')")
    dec = F.expr(
        f"cast(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'), "
        f"'{_AES_KEY}', 'ECB') as string)"
    )
    wrong = F.expr(
        f"try_aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'), "
        f"'{_AES_WRONG}', 'ECB')"
    )
    return d.select(
        "doc_id",
        F.length(enc).cast("bigint").alias("cipher_len"),
        (dec == F.col("text")).alias("roundtrip_ok"),
        (
            wrong.isNull() | (wrong != F.col("text").cast("binary"))
        ).alias("wrong_key_differs"),
    )
