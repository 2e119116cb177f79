"""Document chunking & sequence packing for LLM training corpora.

Three operators a training-data pipeline needs between "clean corpus" and
"batches on the accelerator":

* ``text_chunk_fixed`` — split each document into fixed-size overlapping
  windows (the retrieval/embedding chunking step). Expressed as
  ``explode(sequence(...))`` + ``substring`` — pure Catalyst generators,
  no Python, no shuffle: chunking is a flatMap over the scan, so at
  100 TB it streams source→sink embarrassingly parallel.
* ``text_pack_greedy`` — causal-LM sequence packing: concatenate
  documents in a stable order and cut every ``CTX`` tokens (next-fit by
  running token count). A running sum needs a sort; a GLOBAL order would
  serialize on one task, so packing is partitioned by ``source`` — each
  source packs independently (the standard sharded-packing layout: bins
  are keyed ``(source, bin_id)``), keeping every partition's window sort
  local after a hash shuffle.
* ``corpus_mixture_weights`` — per-(lang, source) token shares and the
  resampling weight that would flatten the mixture to uniform — the
  knob for domain-mixture tuning. One small aggregate + a broadcastable
  window over ~K group rows.

Reference parity note: the reference (rakrachok/spark-streaming-test) has
no text pipeline — these extend it per the SURVEY.md §2.1 north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, spread
from ..registry import register

# Chunk geometry: 200-char windows every 150 chars (50-char overlap).
CHUNK_CHARS = 200
CHUNK_STRIDE = 150

# Packing context length, in whitespace tokens.
CTX_TOKENS = 512


@register(
    "text_chunk_fixed",
    bench=True,
    tags=("llm", "chunking"),
    oracle=f"""
SELECT doc_id,
       CAST((start_pos - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
       start_pos AS chunk_start,
       substring(text, start_pos, {CHUNK_CHARS}) AS chunk_text,
       length(substring(text, start_pos, {CHUNK_CHARS})) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {CHUNK_STRIDE}))
           AS start_pos
  FROM documents
)
""",
)
def text_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap: 200-char windows, 150-char
    stride. ``sequence`` generates the window starts JVM-side and
    ``explode`` flat-maps them — one narrow stage fused into the scan
    (no shuffle, no Python). The tail chunk is allowed to be short;
    1-indexed ``substring`` clamps identically in Spark and DuckDB."""
    d = spread(load(spark, sf_dir, "documents"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.substring(F.col("text"), F.col("start_pos"), CHUNK_CHARS)
    return (
        # explode_outer avoids the implicit size>0 pushdown filter that
        # re-derives the sequence expression per row; starts is never
        # empty (greatest(len,1)), so rows are identical.
        d.select("doc_id", "text", F.explode_outer(starts).alias("start_pos"))
        .select(
            "doc_id",
            (((F.col("start_pos") - 1) / CHUNK_STRIDE).cast("int")).alias("chunk_id"),
            F.col("start_pos").alias("chunk_start"),
            chunk.alias("chunk_text"),
            F.length(chunk).alias("chunk_len"),
        )
    )


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment: running whitespace-token count
    within each ``source`` shard, cut into CTX_TOKENS bins."""
    d = spread(load(spark, sf_dir, "documents"))
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / CTX_TOKENS).alias(
                "bin_id"
            ),
            ((F.col("cum_tokens") - F.col("n_tokens")) % CTX_TOKENS).alias(
                "bin_offset"
            ),
        )
    )


_PACKED_SQL = f"""
SELECT doc_id, source, n_tokens,
       CAST(floor((cum_tokens - n_tokens) / {CTX_TOKENS}) AS BIGINT) AS bin_id,
       CAST((cum_tokens - n_tokens) % {CTX_TOKENS} AS BIGINT) AS bin_offset
FROM (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM documents
)
"""


@register(
    "text_pack_greedy",
    bench=True,
    tags=("llm", "packing"),
    oracle=_PACKED_SQL,
)
def text_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-LM sequence packing (next-fit): documents are concatenated
    in stable (source, doc_id) order and cut every CTX_TOKENS tokens;
    a doc may straddle two bins (exactly how packed pretraining batches
    are built). The running sum is a window PARTITIONED by source — the
    sort is per-shard, so no single-task global sort at 100 TB."""
    return _packed(spark, sf_dir)


@register(
    "text_pack_bin_stats",
    tags=("llm", "packing"),
    oracle=f"""
SELECT source, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM ({_PACKED_SQL})
GROUP BY source, bin_id
""",
)
def text_pack_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing audit: per-bin document count and token fill. Interior
    bins fill to >= CTX_TOKENS (a straddling doc tops them up); only a
    shard's final bin may be short — the packing-efficiency check run
    before shipping batches to training."""
    return (
        _packed(spark, sf_dir)
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "corpus_mixture_weights",
    tags=("llm", "mixture"),
    oracle="""
WITH grp AS (
  SELECT lang, source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents
  GROUP BY lang, source
)
SELECT lang, source, n_docs, total_chars,
       CAST(total_chars AS DOUBLE)
         / SUM(total_chars) OVER () AS char_share,
       (1.0 / COUNT(*) OVER ())
         / (CAST(total_chars AS DOUBLE) / SUM(total_chars) OVER ())
         AS uniform_weight
FROM grp
""",
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture audit: each (lang, source) cell's share of corpus
    chars, and the resampling weight that would flatten the mixture to
    uniform. The heavy part is one partial-aggregated groupBy; the
    unpartitioned window then runs over only K group rows (dozens), so
    the 'global' window is trivially cheap."""
    d = load(spark, sf_dir, "documents")
    grp = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.partitionBy()
    share = F.col("total_chars").cast("double") / F.sum("total_chars").over(w)
    return grp.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        share.alias("char_share"),
        ((F.lit(1.0) / F.count(F.lit(1)).over(w)) / share).alias("uniform_weight"),
    )


@register(
    "corpus_curation_funnel",
    tags=("llm", "pipeline", "curation"),
    oracle="""
WITH kept AS (
  SELECT doc_id, lang, text,
         length(text) >= 40
         AND len(string_split(text, ' ')) >= 8
         AND (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0
           AS q_keep
  FROM documents
),
deduped AS (
  SELECT doc_id, lang,
         doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text)) AS d_keep
  FROM kept WHERE q_keep
),
sampled AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
           <= CASE WHEN lang = 'en' THEN '1f' ELSE '7f' END AS s_keep
  FROM deduped WHERE d_keep
)
SELECT 'raw' AS stage, (SELECT COUNT(*) FROM kept) AS n_docs
UNION ALL
SELECT 'quality', (SELECT COUNT(*) FROM kept WHERE q_keep)
UNION ALL
SELECT 'exact_dedup', (SELECT COUNT(*) FROM deduped WHERE d_keep)
UNION ALL
SELECT 'sampled', (SELECT COUNT(*) FROM sampled WHERE s_keep)
""",
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation as ONE lazy plan: quality gate →
    exact dedup (min-id survivor per content hash) → stratified hash
    downsample, reporting the attrition count after each stage — the
    top-level report every training-corpus refresh produces.

    Composition shape at 100 TB: the quality gate is a scan-level
    filter; dedup survival is a window over the content hash (shuffles
    32-byte hashes + ids only — document bodies never move); sampling
    is again a pure filter. Stage counts are four tiny aggregates over
    the shared lineage — Spark recomputes the cheap filters rather than
    materializing intermediates (swap in .persist() between stages when
    the corpus iteration loop reuses them)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = F.size(F.split(t, " "))
    avg_tok = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_tokens
    q_keep = (F.length(t) >= 40) & (n_tokens >= 8) & avg_tok.between(2.0, 12.0)

    kept = d.select("doc_id", "lang", "text", q_keep.alias("q_keep"))
    w = Window.partitionBy(F.sha2("text", 256))
    deduped = (
        kept.filter("q_keep")
        .select(
            "doc_id",
            "lang",
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("d_keep"),
        )
    )
    sampled = deduped.filter("d_keep").select(
        "doc_id",
        (
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            <= F.when(F.col("lang") == "en", "1f").otherwise("7f")
        ).alias("s_keep"),
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("raw", kept)
        .unionByName(stage("quality", kept.filter("q_keep")))
        .unionByName(stage("exact_dedup", deduped.filter("d_keep")))
        .unionByName(stage("sampled", sampled.filter("s_keep")))
    )


@register(
    "export_jsonl_records",
    tags=("llm", "export", "serialization"),
    oracle="""
SELECT doc_id,
       concat('{"text":"', text,
              '","meta":{"source":"', source,
              '","lang":"', lang,
              '","n_chars":', CAST(n_chars AS VARCHAR), '}}') AS jsonl,
       length(concat('{"text":"', text,
              '","meta":{"source":"', source,
              '","lang":"', lang,
              '","n_chars":', CAST(n_chars AS VARCHAR), '}}')) AS n_bytes
FROM documents
""",
)
def export_jsonl_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-export step: serialize each curated document to the
    JSONL record shape every LLM data loader ingests
    (``{"text": ..., "meta": {...}}``). Built with explicit string
    concatenation on BOTH engines so the bytes are oracle-comparable —
    engine-native JSON writers disagree on key order and float
    formats, which is exactly why a production export pins the record
    template. (This corpus is [a-z ]-only; a general corpus inserts a
    JSON string-escape on ``text`` first — same plan.)

    Scale: a pure projection — the export IS the scan, and the
    byte-length column feeds the shard-size packing decision
    (`text_pack_bin_stats`). Writing then streams through the
    file sink with no shuffle at all."""
    d = load(spark, sf_dir, "documents")
    jsonl = F.concat(
        F.lit('{"text":"'),
        F.col("text"),
        F.lit('","meta":{"source":"'),
        F.col("source"),
        F.lit('","lang":"'),
        F.col("lang"),
        F.lit('","n_chars":'),
        F.col("n_chars").cast("string"),
        F.lit("}}"),
    )
    return d.select(
        "doc_id",
        jsonl.alias("jsonl"),
        F.length(jsonl).alias("n_bytes"),
    )


@register(
    "export_dpo_pairs",
    tags=("llm", "export", "preference"),
    oracle="""
WITH scored AS (
  SELECT source, doc_id, text, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS r_best,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars ASC, doc_id) AS r_worst
  FROM documents
),
best AS (
  SELECT source, doc_id AS chosen_id, text AS chosen, n_chars AS chosen_score
  FROM scored WHERE r_best = 1
),
worst AS (
  SELECT source, doc_id AS rejected_id, text AS rejected,
         n_chars AS rejected_score
  FROM scored WHERE r_worst = 1
)
SELECT b.source, b.chosen_id, w.rejected_id,
       CAST(b.chosen_score AS BIGINT) AS chosen_score,
       CAST(w.rejected_score AS BIGINT) AS rejected_score,
       concat('{"prompt":"', b.source,
              '","chosen":"', b.chosen,
              '","rejected":"', w.rejected, '"}') AS jsonl
FROM best b JOIN worst w ON b.source = w.source
WHERE b.chosen_id <> w.rejected_id
""",
)
def export_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair export (DPO/RLHF shape): per prompt group — the
    source stands in for the prompt — pair the best- and worst-scored
    responses into the ``{"prompt", "chosen", "rejected"}`` JSONL
    record preference-tuning loaders ingest. The score here is the
    n_chars quality proxy; production swaps in a reward-model column
    with the same plan.

    One exchange on the group key feeds BOTH rank orderings; the
    best/worst frames are group-sized and join back broadcast-small.
    The record template is pinned string concatenation (the
    ``export_jsonl_records`` rule) so output bytes hash-match across
    engines; degenerate single-document groups are dropped rather
    than emitting chosen == rejected."""
    d = load(spark, sf_dir, "documents")
    wb = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    ww = Window.partitionBy("source").orderBy(F.col("n_chars").asc(), "doc_id")
    scored = d.select(
        "source",
        "doc_id",
        "text",
        "n_chars",
        F.row_number().over(wb).alias("r_best"),
        F.row_number().over(ww).alias("r_worst"),
    )
    best = scored.filter(F.col("r_best") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("text").alias("chosen"),
        F.col("n_chars").alias("chosen_score"),
    )
    worst = scored.filter(F.col("r_worst") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("text").alias("rejected"),
        F.col("n_chars").alias("rejected_score"),
    )
    return (
        best.join(worst, "source")
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "source",
            "chosen_id",
            "rejected_id",
            F.col("chosen_score").cast("bigint").alias("chosen_score"),
            F.col("rejected_score").cast("bigint").alias("rejected_score"),
            F.concat(
                F.lit('{"prompt":"'),
                F.col("source"),
                F.lit('","chosen":"'),
                F.col("chosen"),
                F.lit('","rejected":"'),
                F.col("rejected"),
                F.lit('"}'),
            ).alias("jsonl"),
        )
    )


# --- SFT conversation export ----------------------------------------------

SFT_PROMPT_TOKENS = 12  # first N whitespace tokens become the "user" turn


@register(
    "export_sft_messages",
    tags=("llm", "export", "serialization", "sft"),
    oracle=f"""
SELECT doc_id,
       concat(
         '{{"messages":[',
         '{{"role":"user","content":"',
         array_to_string(string_split(text, ' ')[1:{SFT_PROMPT_TOKENS}], ' '),
         '"}},',
         '{{"role":"assistant","content":"',
         array_to_string(
           string_split(text, ' ')[{SFT_PROMPT_TOKENS + 1}:], ' '),
         '"}}]}}'
       ) AS sft_jsonl,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
WHERE len(string_split(text, ' ')) > {SFT_PROMPT_TOKENS}
""",
)
def export_sft_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT CONVERSATION export — the chat-format training artifact
    (OpenAI/HF messages schema): each document splits into a "user"
    turn (the first {SFT_PROMPT_TOKENS} tokens, standing in for the
    prompt) and an "assistant" turn (the continuation), serialized
    with a PINNED string template, not a native JSON writer — the
    `export_jsonl_records` rule: field order, spacing, and escaping
    are part of the artifact contract, and native writers differ
    across engines where a template is byte-identical. Completes the
    export trio: pretraining JSONL, DPO preference pairs, and now
    SFT conversations.

    Pure projection over the corpus (token split + two slices + one
    concat); documents too short to split are filtered with the same
    predicate on both engines."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ", -1)
    n = F.size(toks)
    prompt = F.concat_ws(" ", F.slice(toks, 1, SFT_PROMPT_TOKENS))
    completion = F.concat_ws(
        " ", F.expr(f"slice(split(text, ' ', -1), {SFT_PROMPT_TOKENS + 1}, 2147483647)")
    )
    jsonl = F.concat(
        F.lit('{"messages":[{"role":"user","content":"'),
        prompt,
        F.lit('"},{"role":"assistant","content":"'),
        completion,
        F.lit('"}]}'),
    )
    return (
        d.filter(n > SFT_PROMPT_TOKENS)
        .select(
            "doc_id",
            jsonl.alias("sft_jsonl"),
            n.cast("bigint").alias("n_tokens"),
        )
    )
