"""Tokenized-corpus binary export — the END of a training-data
pipeline: the Megatron/GPT-NeoX-style layout where token ids are
packed into flat ``.bin`` shards (little-endian uint16) and a ``.idx``
sidecar holds per-document (offset, length) so a data loader can
memory-map the shard and slice any document in O(1).

The registered query computes the full export PLAN — shard
assignment, within-shard index position, byte offsets from the
cumulative-length window, and an order-preserving hash of each
document's token ids — and the DuckDB oracle recomputes every column
from scratch (tokenization uses the repo's cross-engine md5-derived
hash family, so token ids are bitwise-identical in both engines). The
byte-level form is pinned by tests that actually WRITE the .bin/.idx
shards from the plan and slice documents back out with numpy
memory-maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

VOCAB = 50257  # GPT-2-sized vocabulary; ids fit uint16? No — see below.
# 50257 > 65535 is FALSE (50257 < 65536): ids fit uint16 exactly, the
# property the classic .bin format relies on for GPT-2-sized vocabs.
N_SHARDS = 4


def _token_id(word_col) -> F.Column:
    """Cross-engine token id: 60-bit md5-derived base hash mod VOCAB
    (same family as llm/dedup.py's _base_hash; DuckDB replays it as
    CAST('0x' || substr(md5(w),1,15) AS UBIGINT) % VOCAB)."""
    return (
        F.conv(F.substring(F.md5(word_col), 1, 15), 16, 10).cast("bigint")
        % VOCAB
    )


def token_ids(text_col) -> F.Column:
    """array<bigint> of token ids in word order (JVM-side)."""
    return F.transform(F.split(text_col, " "), _token_id)


@register(
    "export_tokenized_bin",
    tags=("llm", "export", "tokenize"),
    oracle=f"""
WITH d AS (
  SELECT doc_id, doc_id % {N_SHARDS} AS shard_id,
         list_transform(
           string_split(text, ' '),
           w -> CAST('0x' || substr(md5(w), 1, 15) AS UBIGINT) % {VOCAB}
         ) AS ids
  FROM documents
),
sized AS (
  SELECT doc_id, shard_id, ids, len(ids) AS n_tokens,
         md5(array_to_string(list_transform(ids,
             i -> CAST(i AS VARCHAR)), ',')) AS ids_md5
  FROM d
)
SELECT doc_id,
       CAST(shard_id AS INTEGER) AS shard_id,
       CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS idx_pos,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(2 * COALESCE(SUM(n_tokens) OVER (
         PARTITION BY shard_id ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS byte_offset,
       CAST(2 * n_tokens AS BIGINT) AS byte_len,
       ids_md5
FROM sized
WINDOW w AS (PARTITION BY shard_id ORDER BY doc_id)
""",
)
def export_tokenized_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The .bin/.idx export plan: tokenize every document (word ->
    md5-derived id mod {V}, uint16-safe), assign round-robin shards,
    and compute each document's index slot and byte extent inside its
    shard from one cumulative-length window — exactly the arithmetic
    the .idx sidecar stores, so the oracle hash IS the index file's
    content check. ``ids_md5`` preserves token ORDER (a shuffled
    tokenizer fails even with identical multisets).

    Scale shape: tokenization is a projection; the only exchange is
    the per-shard window (keys = {S} shards; for real exports shard
    count scales with cluster width, keeping partitions balanced).
    tests/test_round9b_ops.py materializes actual shards from this
    plan and slices documents back via numpy memmap."""
    d = spread(load(spark, sf_dir, "documents"))
    sized = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).cast("int").alias("shard_id"),
        token_ids(F.col("text")).alias("ids"),
    ).select(
        "doc_id",
        "shard_id",
        F.size("ids").cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(F.transform("ids", lambda i: i.cast("string")), ","))
        .alias("ids_md5"),
    )
    w = Window.partitionBy("shard_id").orderBy("doc_id")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    return sized.select(
        "doc_id",
        "shard_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("idx_pos"),
        "n_tokens",
        (2 * F.coalesce(F.sum("n_tokens").over(prior), F.lit(0)))
        .cast("bigint")
        .alias("byte_offset"),
        (2 * F.col("n_tokens")).cast("bigint").alias("byte_len"),
        "ids_md5",
    )
