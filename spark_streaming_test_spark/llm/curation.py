"""Corpus curation add-ons: character entropy and curriculum ordering.

Character-level Shannon entropy is a cheap, language-agnostic garbage
detector (binary-ish blobs and keyboard-mash score far from natural
text; repeated boilerplate scores low), complementing the word-level
signals in ``llm/text_analysis.py``. Curriculum ordering turns a
difficulty score into a training schedule: easy-first within an
interleave that keeps every difficulty stratum represented in every
training slice — the standard shuffled-curriculum layout.

Scale shape: entropy explodes documents to (doc, char) — shuffle keyed
by doc_id with map-side combine on the (doc, char) counts, so the
exchange carries per-doc char histograms (≤ alphabet size per doc),
not raw characters. Curriculum is two windows over one global sort —
at 100 TB the ntile/row_number pair becomes a range-partitioned rank
(``Window.orderBy`` with no partition key is single-task; the
production form pre-buckets difficulty with approx quantiles — noted
inline).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

ENT_TERM_DP = 9  # per-char-count term rounding before exact decimal sum
ENT_DP = 8  # final entropy rounding
CUR_BUCKETS = 10  # curriculum difficulty strata


@register(
    "text_char_entropy",
    tags=("llm", "text", "quality", "entropy"),
    oracle=f"""
WITH chars AS (
  SELECT doc_id, substr(text, i, 1) AS ch
  FROM documents, LATERAL (
    SELECT unnest(generate_series(1, length(text))) AS i
  )
),
counts AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
  FROM chars GROUP BY doc_id, ch
),
agg AS (
  SELECT doc_id,
         CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(CAST(round(c * ln(c), {ENT_TERM_DP})
                       AS DECIMAL(25,{ENT_TERM_DP}))) AS DOUBLE) AS s
  FROM counts GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted, n_distinct,
       round(ln(n) - s / n, {ENT_DP}) AS char_entropy
FROM agg
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character Shannon entropy (nats):
    ``H = ln(n) - (1/n) * sum_c c*ln(c)`` over per-character counts c —
    the counts-only decomposition, so ln only ever sees integers.

    Determinism: each ``c*ln(c)`` term is rounded then summed as an
    exact decimal (order-independent); the final entropy is rounded at
    8 dp so a last-ulp libm difference between engines cannot
    surface. The explode is the only corpus-sized stage; the per-doc
    char histogram it reduces to is bounded by the alphabet.
    ``spread`` (optimization r14, guide §2.5): the single-file scan
    fused the per-character explode onto one core (measured 1.6 s
    single-task stage at sf0.1)."""
    d = spread(load(spark, sf_dir, "documents"))
    chars = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        F.col("text"),
    ).select("doc_id", F.expr("substr(text, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum(F.col("c").cast("bigint")).cast("double").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")), ENT_TERM_DP).cast(
                f"decimal(25,{ENT_TERM_DP})"
            )
        )
        .cast("double")
        .alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars_counted"),
        "n_distinct",
        F.round(F.log(F.col("n")) - F.col("s") / F.col("n"), ENT_DP).alias(
            "char_entropy"
        ),
    )


@register(
    "corpus_curriculum_order",
    tags=("llm", "curation", "curriculum"),
    oracle=f"""
WITH strat AS (
  SELECT doc_id, n_chars,
         NTILE({CUR_BUCKETS}) OVER (ORDER BY n_chars, doc_id) AS bucket
  FROM documents
),
pos AS (
  SELECT doc_id, n_chars, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket
                            ORDER BY n_chars, doc_id) AS pos
  FROM strat
)
SELECT doc_id, n_chars, CAST(bucket AS INTEGER) AS bucket,
       pos, (pos - 1) * {CUR_BUCKETS} + bucket AS curriculum_rank
FROM pos
""",
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-curriculum schedule: stratify the corpus into
    ten difficulty buckets (difficulty = n_chars, ties broken
    by doc_id), then interleave round-robin across buckets —
    ``curriculum_rank`` walks easy→hard within each cycle while every
    cycle samples all strata.

    The stratifying NTILE runs DISTRIBUTED (``distributed_ntile``'s
    two-pass exact rank — range partitions, local row numbers,
    broadcast offsets), so no single task ever sorts the corpus: the
    r11 raw-grain global-window migration (VERDICT r11 #3). Output is
    bitwise the old single-task form — the rank is exact and
    (n_chars, doc_id) is a total order."""
    from ..operators.evalmetrics import distributed_ntile

    d = load(spark, sf_dir, "documents")
    strat = distributed_ntile(
        d.select("doc_id", "n_chars"), CUR_BUCKETS, ["n_chars", "doc_id"]
    ).withColumnRenamed("tile", "bucket")
    wpos = Window.partitionBy("bucket").orderBy("n_chars", "doc_id")
    return strat.select(
        "doc_id",
        "n_chars",
        F.col("bucket").cast("int").alias("bucket"),
        F.row_number().over(wpos).alias("pos"),
    ).withColumn(
        "curriculum_rank",
        (F.col("pos") - 1) * CUR_BUCKETS + F.col("bucket"),
    )


# --- token-dictionary codec ---------------------------------------------------
#
# A real (encode + decode, round-trip-tested) dictionary coder whose
# serialized length is CLOSED-FORM from the token statistics — the
# property that lets DuckDB recompute the exact byte count and close
# the last rows-only gap in the registry (VERDICT r9 item 2, the
# `traffic_alerts_kafka_wire_v2` wire-length-oracle trick). Format:
#
#   magic 'TD'                                        (2 bytes)
#   varint n_tokens, varint n_distinct                (LEB128)
#   dictionary: per distinct token, first-appearance
#     order: varint byte_len + utf-8 bytes
#   indices: n_tokens entries bit-packed LSB-first at
#     w = max(1, bit_length(n_distinct - 1)) bits,
#     padded to a byte boundary
#
# len(encode(text)) = 2 + varint_len(n_tokens) + varint_len(n_distinct)
#                     + Σ_distinct (varint_len(len) + len)
#                     + ceil(n_tokens · w / 8)

TD_MAGIC = b"TD"
TD_REPETITIVE_MAX = 0.9  # dict+index bytes below 0.9x raw = templated


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def token_dict_encode(text: str) -> bytes:
    """Serialize a document as dictionary + bit-packed token indices."""
    tokens = text.split(" ")
    ids: dict[str, int] = {}
    idx = []
    for t in tokens:
        if t not in ids:
            ids[t] = len(ids)
        idx.append(ids[t])
    n_distinct = len(ids)
    w = max(1, (n_distinct - 1).bit_length())
    out = bytearray(TD_MAGIC)
    out += _varint(len(tokens))
    out += _varint(n_distinct)
    for t in ids:  # insertion order = first appearance
        raw = t.encode("utf-8")
        out += _varint(len(raw))
        out += raw
    acc = nbits = 0
    for i in idx:
        acc |= i << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def token_dict_decode(buf: bytes) -> str:
    """Inverse of :func:`token_dict_encode` (round-trip pytest-held)."""
    if buf[:2] != TD_MAGIC:
        raise ValueError("token-dict: bad magic")
    n_tokens, pos = _read_varint(buf, 2)
    n_distinct, pos = _read_varint(buf, pos)
    dictionary = []
    for _ in range(n_distinct):
        ln, pos = _read_varint(buf, pos)
        dictionary.append(buf[pos : pos + ln].decode("utf-8"))
        pos += ln
    w = max(1, (n_distinct - 1).bit_length())
    acc = nbits = 0
    toks = []
    for _ in range(n_tokens):
        while nbits < w:
            acc |= buf[pos] << nbits
            pos += 1
            nbits += 8
        toks.append(dictionary[acc & ((1 << w) - 1)])
        acc >>= w
        nbits -= w
    return " ".join(toks)


@register(
    "text_compress_ratio",
    tags=("llm", "text", "quality", "udf"),
    # varint_len is inlined as a CASE (token/doc counts here fit one
    # byte, but the two-tier form keeps the oracle valid to 16383).
    # w = length(bin(n_distinct - 1)) is exact integer bit-length in
    # both engines (bin(0) = '0' → w = 1), no float log2.
    oracle="""
WITH toks AS (
  SELECT doc_id, n_chars,
         octet_length(encode(text)) AS raw_len,
         string_split(text, ' ') AS tokens
  FROM documents
),
stats AS (
  SELECT doc_id, n_chars, raw_len,
         len(tokens) AS n_tokens,
         len(list_distinct(tokens)) AS n_distinct,
         list_sum(list_transform(list_distinct(tokens),
           t -> octet_length(encode(t))
                + CASE WHEN octet_length(encode(t)) < 128 THEN 1
                       ELSE 2 END)) AS dict_bytes,
         length(bin(len(list_distinct(tokens)) - 1)) AS w
  FROM toks
),
enc AS (
  SELECT doc_id, n_chars, raw_len,
         2
         + CASE WHEN n_tokens < 128 THEN 1 ELSE 2 END
         + CASE WHEN n_distinct < 128 THEN 1 ELSE 2 END
         + COALESCE(dict_bytes, 0)
         + CAST(ceil(n_tokens * w / 8.0) AS BIGINT) AS encoded_len
  FROM stats
)
SELECT doc_id, n_chars,
       CAST(raw_len AS BIGINT) AS raw_len,
       CAST(encoded_len AS BIGINT) AS encoded_len,
       CAST(encoded_len AS DOUBLE)
         / CAST(greatest(raw_len, 1) AS DOUBLE) AS compress_ratio,
       CAST(encoded_len AS DOUBLE)
         / CAST(greatest(raw_len, 1) AS DOUBLE) < 0.9 AS is_repetitive
FROM enc
""",
)
def text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: templated/repetitive text
    re-uses dictionary entries and shrinks under dictionary coding,
    natural prose does not — the model-free garbage detector behind
    Gopher-style repetition filters.

    The encoder is the REAL codec above (`token_dict_encode`, round-
    trip-tested against its decoder), run as an Arrow-batched pandas
    UDF; the oracle recomputes the exact serialized byte count from
    token statistics in SQL — so the driver's hash pins the wire
    format, not a Python-only number (this retired the registry's
    last rows-only query; a raw zlib-6 variant remains available as
    :func:`zlib_compress_ratio_frame` for users who want DEFLATE,
    behavior pytest-held).

    compress_ratio divides the same two BIGINTs in both engines — a
    single correctly-rounded IEEE division, no rounding needed.

    Scale: map-only scan, zero shuffles; the UDF tax is per-core CPU
    on an embarrassingly parallel pass."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def encoded_len(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(token_dict_encode(t)))

    # (r14 note: a spread() was tried here for the single-file test
    # layout's 1-task scan and reverted — it breaks the pinned map-only
    # zero-shuffle shape, which is the query's 100 TB design point.)
    d = load(spark, sf_dir, "documents")
    enc = d.select(
        "doc_id",
        "n_chars",
        F.octet_length("text").cast("bigint").alias("raw_len"),
        encoded_len(F.col("text")).alias("encoded_len"),
    )
    ratio = F.col("encoded_len").cast("double") / F.greatest(
        F.col("raw_len"), F.lit(1)
    ).cast("double")
    return enc.select(
        "doc_id",
        "n_chars",
        "raw_len",
        "encoded_len",
        ratio.alias("compress_ratio"),
        (ratio < TD_REPETITIVE_MAX).alias("is_repetitive"),
    )


def zlib_compress_ratio_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFLATE form of the signal: ``len(zlib(text, 6)) /
    raw_len`` per document via an Arrow-batched pandas UDF. Not
    registry-registered (zlib is inexpressible in the DuckDB oracle);
    deterministic (CPython's bundled zlib) and pytest-held."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def compress_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def ratio(t: str) -> float:
            if not t:
                return 1.0
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(ratio)

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        F.round(compress_ratio(F.col("text")), 6).alias("compress_ratio"),
    ).withColumn("is_repetitive", F.col("compress_ratio") < 0.35)


DOM_MIN_DOCS = 10  # sources smaller than this get 'review', not a verdict
DOM_Q_BLOCK = 0.45  # mean quality below this blocks the source


@register(
    "corpus_domain_quality_rollup",
    tags=("llm", "curation", "quality", "rollup"),
    oracle=f"""
WITH feats AS (
  SELECT source, n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(text, ' ')) AS avg_token_len
  FROM documents
),
rolled AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
         CAST(SUM(CAST(round(avg_token_len, 6) AS DECIMAL(18,6)))
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_avg_token_len,
         CAST(SUM(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS share_long_docs
  FROM feats GROUP BY source
)
SELECT source, n_docs, total_chars, mean_tokens, mean_avg_token_len,
       share_long_docs,
       CASE WHEN n_docs < {DOM_MIN_DOCS} THEN 'review'
            WHEN share_long_docs < {DOM_Q_BLOCK} THEN 'block'
            ELSE 'keep' END AS verdict
FROM rolled
""",
)
def corpus_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain-level curation verdicts: per-source document
    volume, mean length statistics, and the share of substantive
    (>= 20-token) documents, mapped to keep / block / review — the
    step that turns per-document quality signals into the DOMAIN
    blocklist web-scale pipelines actually apply (filtering by source
    is 1000x cheaper than re-scoring every page of a bad domain).

    Per-source reduce with map-side combine — the corpus never
    shuffles, only per-source partials; the fractional feature
    (avg token length) is 6-dp-quantized before its exact decimal sum
    so the mean is bitwise stable."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("double")
    avg_tok = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
            "double"
        )
        / n_tokens
    )
    feats = d.select(
        "source",
        "n_chars",
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
    )
    rolled = feats.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (
            F.sum(F.col("n_tokens").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_tokens"),
        (
            F.sum(
                F.round("avg_token_len", 6).cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_avg_token_len"),
        (
            F.sum(
                F.when(F.col("n_tokens") >= 20, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("share_long_docs"),
    )
    verdict = (
        F.when(F.col("n_docs") < DOM_MIN_DOCS, "review")
        .when(F.col("share_long_docs") < DOM_Q_BLOCK, "block")
        .otherwise("keep")
    )
    return rolled.select(
        "source",
        "n_docs",
        "total_chars",
        "mean_tokens",
        "mean_avg_token_len",
        "share_long_docs",
        verdict.alias("verdict"),
    )


# --- one-row corpus report card -------------------------------------------

RC_DP = 8


@register(
    "corpus_report_card",
    tags=("llm", "curation", "reporting"),
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, lang, n_chars,
         md5(text) AS h,
         len(string_split(text, ' ')) AS n_words
  FROM documents
),
dup AS (
  SELECT COUNT(*) - COUNT(DISTINCT h) AS n_dup_docs, COUNT(*) AS n FROM base
),
src AS (
  SELECT source, COUNT(*) AS c FROM base GROUP BY source
),
src_h AS (
  SELECT SUM(CAST(round(-(CAST(c AS DOUBLE) / t.n)
                        * ln(CAST(c AS DOUBLE) / t.n), {RC_DP})
                  AS DECIMAL(25,{RC_DP}))) AS h_acc
  FROM src CROSS JOIN (SELECT COUNT(*) AS n FROM base) t
)
SELECT
  CAST(d.n AS BIGINT) AS n_docs,
  CAST((SELECT SUM(n_words) FROM base) AS BIGINT) AS total_words,
  CAST((SELECT SUM(n_chars) FROM base) AS BIGINT) AS total_chars,
  CAST((SELECT COUNT(DISTINCT lang) FROM base) AS BIGINT) AS n_langs,
  CAST((SELECT COUNT(DISTINCT source) FROM base) AS BIGINT) AS n_sources,
  CAST(d.n_dup_docs AS BIGINT) AS n_exact_dups,
  CAST(d.n_dup_docs AS DOUBLE) / d.n AS dup_rate,
  CAST((SELECT h_acc FROM src_h) AS DOUBLE) AS source_entropy_nats
FROM dup d
""",
)
def corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus report card — the summary a curation run
    publishes with every snapshot: size (docs / words / chars),
    language and source breadth, exact-duplicate burden, and the
    source-distribution entropy (low entropy = the corpus is secretly
    one website). Every number here is the headline of a deeper
    operator in this engine (dedup_exact, corpus_mixture_weights,
    text_token_count); the card is what goes in the dataset README.

    One scan feeds all counters (conditional aggregates + two
    dimension-sized sub-aggregates); entropy terms are generically
    rounded and decimal-summed. Output is a single row regardless of
    corpus size."""
    base = spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_words"),
    )
    dup = base.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("h"))).alias("n_dup_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.count_distinct(F.col("source")).alias("n_sources"),
    )
    src = base.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    tot = base.agg(F.count(F.lit(1)).alias("tn"))
    p = F.col("c").cast("double") / F.col("tn")
    src_h = (
        src.crossJoin(F.broadcast(tot))
        .select(
            F.round(-p * F.log(p), RC_DP)
            .cast(f"decimal(25,{RC_DP})")
            .alias("term")
        )
        .agg(F.sum("term").cast("double").alias("h_acc"))
    )
    return dup.crossJoin(F.broadcast(src_h)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("total_words").cast("bigint").alias("total_words"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.col("n_dup_docs").cast("bigint").alias("n_exact_dups"),
        (F.col("n_dup_docs").cast("double") / F.col("n")).alias("dup_rate"),
        F.col("h_acc").alias("source_entropy_nats"),
    )


# --- domain blocklist filtering (Dolma/CCNet-style URL hygiene) ------------

BLOCKLIST = ("ads.src1.example.com", "src2.example.com", "tracker.example.net")
_BL_SQL = ", ".join(f"'{d}'" for d in BLOCKLIST)


@register(
    "corpus_blocklist_filter",
    tags=("llm", "curation", "blocklist"),
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 4 = 0 THEN 'ads.' ELSE '' END)
           || source || '.example.com' AS host
  FROM documents
),
bl AS (SELECT unnest([{_BL_SQL}]) AS entry),
sufs AS (
  SELECT doc_id, host,
         unnest(list_transform(
           range(1, len(string_split(host, '.')) + 1),
           i -> array_to_string(string_split(host, '.')[i:], '.')
         )) AS suffix
  FROM docs
),
hits AS (
  SELECT s.doc_id, MIN(b.entry) AS matched_entry
  FROM sufs s JOIN bl b ON s.suffix = b.entry
  GROUP BY s.doc_id
)
SELECT d.doc_id, d.host,
       (h.matched_entry IS NOT NULL) AS blocked,
       h.matched_entry
FROM docs d LEFT JOIN hits h ON h.doc_id = d.doc_id
""",
)
def corpus_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist hygiene (the Dolma/CCNet URL-filter stage):
    every document's host is checked against a blocklist with SUFFIX
    semantics — an entry blocks the exact host and every subdomain of
    it (`src2.example.com` blocks `ads.src2.example.com`), the rule
    real blocklists (ut1, Dolma) use.

    Scale shape: instead of a LIKE-any nested loop over the blocklist,
    each host explodes into its O(#labels) dot-suffixes (bounded — DNS
    names have <10 labels) and matches by EQUI-join against the
    (broadcast) blocklist; at 100 TB the blocklist can grow to millions
    of entries and the join simply switches from broadcast to shuffle
    on the same key. Hosts here are synthesized deterministically from
    `source` so the oracle predicts them exactly."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit("ads.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".example.com"),
        ).alias("host"),
    )
    labels = F.split(F.col("host"), r"\.")
    sufs = d.select(
        "doc_id",
        "host",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.size(labels)),
                lambda i: F.concat_ws(
                    ".", F.slice(labels, i, F.size(labels) - i + 1)
                ),
            )
        ).alias("suffix"),
    )
    bl = spark.createDataFrame([(e,) for e in BLOCKLIST], "entry string")
    hits = (
        sufs.join(F.broadcast(bl), sufs.suffix == bl.entry)
        .groupBy("doc_id")
        .agg(F.min("entry").alias("matched_entry"))
    )
    return d.join(hits, "doc_id", "left").select(
        "doc_id",
        "host",
        F.col("matched_entry").isNotNull().alias("blocked"),
        "matched_entry",
    )


# --- final corpus selection manifest --------------------------------------

from .dedup import _minhash_pairs_sql, dedup_minhash_lsh  # noqa: E402

SEL_MIN_CHARS = 200
SEL_MIN_TOKENS = 30
SEL_BUDGET_TOKENS = 15_000  # per-source token budget


@register(
    "corpus_select_final",
    tags=("llm", "curation", "composition"),
    oracle=f"""
WITH {_minhash_pairs_sql()},
neardup_drop AS (
  SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jaccard >= 0.5
),
q AS (
  SELECT doc_id, source, lang, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         length(text) AS n_chars_txt
  FROM documents
  WHERE length(text) >= {SEL_MIN_CHARS}
    AND len(string_split(text, ' ')) >= {SEL_MIN_TOKENS}
),
ex AS (
  SELECT q.*, MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
  FROM q
),
nd AS (
  SELECT doc_id, source, lang, n_tokens, n_chars_txt
  FROM ex
  WHERE doc_id = keep_id
    AND doc_id NOT IN (SELECT doc_id FROM neardup_drop)
),
budgeted AS (
  SELECT doc_id, source, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY n_chars_txt DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM nd
)
SELECT doc_id, source, lang, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM budgeted WHERE cum_tokens <= {SEL_BUDGET_TOKENS}
""",
)
def corpus_select_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL SELECTED-CORPUS MANIFEST — the whole curation pipeline
    composed into one verified artifact: quality gate (≥
    {SEL_MIN_CHARS} chars, ≥ {SEL_MIN_TOKENS} tokens) → exact dedup
    (min-id survivor per sha256) → NEAR-DUP removal (higher-id member
    of every MinHash-LSH pair at Jaccard ≥ 0.5 drops — the canonical-
    keeper rule, reusing `dedup_minhash_lsh`'s verified pairs) →
    per-source token budget in quality order. Where
    `corpus_curation_funnel` reports attrition COUNTS, this emits the
    actual doc ids a training run would read — the artifact the
    export step (`export_jsonl_records`) serializes.

    Composition shape: the gates are scan filters; exact-dedup
    shuffles 32-byte hashes; the near-dup drop set is LSH-bounded and
    broadcasts as a semi-join filter; the budget is one per-source
    window over survivors. Every stage is individually proven
    elsewhere; this query proves the COMPOSITION end-to-end (the
    whole manifest hash-matches the oracle)."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = F.size(F.split(F.col("text"), " ", -1))
    q = d.filter(
        (F.length("text") >= SEL_MIN_CHARS) & (toks >= SEL_MIN_TOKENS)
    ).select(
        "doc_id",
        "source",
        "lang",
        "text",
        toks.cast("bigint").alias("n_tokens"),
        F.length("text").alias("n_chars_txt"),
    )
    # Explicit keyed repartition (optimization r14, guide §2.5): the
    # exact-dedup window exchange carries whole documents but few MB at
    # test SF, so AQE byte-coalescing ran it on one task.
    w = Window.partitionBy(F.sha2("text", 256))
    ex = (
        q.repartition(
            spark.sparkContext.defaultParallelism, F.sha2("text", 256)
        )
        .withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
    )
    drops = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    nd = ex.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "source", "lang", "n_tokens", "n_chars_txt"
    )
    wb = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars_txt"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = nd.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(wb).cast("bigint").alias("cum_tokens"),
    )
    return budgeted.filter(F.col("cum_tokens") <= SEL_BUDGET_TOKENS)


# --- URL canonicalization dedup ----------------------------------------------
#
# Crawl dedup's FIRST line of defense is the URL, not the content: the
# same page is fetched as http/HTTPS, with and without :443, with
# tracking params, with reordered query strings, with a trailing
# slash. Canonicalize-then-group removes those refetches before any
# byte of content is hashed (the Common Crawl / Dolma URL-dedup step).
# Every normalization rule below is a deterministic string expression
# mirrored exactly in the DuckDB oracle: lowercase scheme+host, strip
# the scheme's default port, drop utm_* tracking params, SORT the
# remaining query params, and strip a trailing slash off non-root
# paths.

URL_BUCKETS = 37  # coprime with the 4 variant forms: buckets mix variants


@register(
    "corpus_url_canonical_dedup",
    tags=("llm", "curation", "dedup", "url"),
    oracle=f"""
WITH raw AS (
  SELECT doc_id,
         doc_id % {URL_BUCKETS} AS b,
         doc_id % 4 AS v,
         CASE doc_id % 4
           WHEN 0 THEN 'HTTPS://WWW.Site.COM:443/items/'
                       || CAST(doc_id % {URL_BUCKETS} AS VARCHAR) || '?b=2&a=1'
           WHEN 1 THEN 'https://www.site.com/items/'
                       || CAST(doc_id % {URL_BUCKETS} AS VARCHAR)
                       || '?a=1&b=2&utm_source=feed'
           WHEN 2 THEN 'https://www.site.com/items/'
                       || CAST(doc_id % {URL_BUCKETS} AS VARCHAR) || '/?a=1&b=2'
           ELSE 'https://www.site.com:443/items/'
                       || CAST(doc_id % {URL_BUCKETS} AS VARCHAR)
                       || '?utm_campaign=x&b=2&a=1'
         END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1)) AS hostport,
         COALESCE(nullif(regexp_extract(url, '^[A-Za-z]+://[^/?]+([^?]*)', 1), ''), '/') AS path,
         nullif(regexp_extract(url, '\\?(.*)$', 1), '') AS query
  FROM raw
),
norm AS (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
                THEN left(hostport, length(hostport) - 4)
              WHEN scheme = 'http' AND hostport LIKE '%:80'
                THEN left(hostport, length(hostport) - 3)
              ELSE hostport END AS host,
         CASE WHEN path <> '/' AND path LIKE '%/'
                THEN left(path, length(path) - 1)
              ELSE path END AS npath,
         CASE WHEN query IS NULL THEN ''
              ELSE array_to_string(
                     list_sort(list_filter(string_split(query, '&'),
                                           p -> NOT starts_with(p, 'utm_'))),
                     '&')
         END AS nquery
  FROM parts
),
canon AS (
  SELECT doc_id, url,
         scheme || '://' || host || npath
           || CASE WHEN nquery = '' THEN '' ELSE '?' || nquery END AS curl
  FROM norm
)
SELECT curl AS canonical_url,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT url) AS n_raw_forms,
       MIN(doc_id) AS example_doc
FROM canon GROUP BY curl
""",
)
def corpus_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: four raw spellings of each logical
    URL (case/port, tracking params, reordered query, trailing slash)
    must collapse to ONE canonical form per bucket — n_raw_forms counts
    the spellings observed, the canonical string itself is part of the
    hash, and the oracle replays every rule with DuckDB string
    functions. Scale: pure string expressions in whole-stage codegen
    ahead of the group-by — the shuffle carries canonical URLs, and
    content hashing downstream runs once per canonical URL instead of
    once per refetch."""
    d = load(spark, sf_dir, "documents")
    b = (F.col("doc_id") % URL_BUCKETS).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("HTTPS://WWW.Site.COM:443/items/"), b, F.lit("?b=2&a=1")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("https://www.site.com/items/"), b,
                F.lit("?a=1&b=2&utm_source=feed"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://www.site.com/items/"), b, F.lit("/?a=1&b=2")),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.site.com:443/items/"), b,
                F.lit("?utm_campaign=x&b=2&a=1"),
            )
        )
    )
    raw = d.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?]+)", 1))
    path = F.coalesce(
        F.nullif(F.regexp_extract("url", r"^[A-Za-z]+://[^/?]+([^?]*)", 1), F.lit("")),
        F.lit("/"),
    )
    query = F.nullif(F.regexp_extract("url", r"\?(.*)$", 1), F.lit(""))
    parts = raw.select(
        "doc_id", "url",
        scheme.alias("scheme"), hostport.alias("hostport"),
        path.alias("path"), query.alias("query"),
    )
    host = (
        F.when(
            (F.col("scheme") == "https") & F.col("hostport").endswith(":443"),
            F.expr("left(hostport, length(hostport) - 4)"),
        )
        .when(
            (F.col("scheme") == "http") & F.col("hostport").endswith(":80"),
            F.expr("left(hostport, length(hostport) - 3)"),
        )
        .otherwise(F.col("hostport"))
    )
    npath = F.when(
        (F.col("path") != "/") & F.col("path").endswith("/"),
        F.expr("left(path, length(path) - 1)"),
    ).otherwise(F.col("path"))
    nquery = F.when(F.col("query").isNull(), F.lit("")).otherwise(
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split("query", "&"),
                    lambda p: ~p.startswith("utm_"),
                )
            ),
            "&",
        )
    )
    canon = parts.select(
        "doc_id", "url",
        F.concat(
            F.col("scheme"), F.lit("://"), host, npath,
            F.when(nquery == "", F.lit("")).otherwise(F.concat(F.lit("?"), nquery)),
        ).alias("curl"),
    )
    return canon.groupBy(F.col("curl").alias("canonical_url")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url").alias("n_raw_forms"),
        F.min("doc_id").alias("example_doc"),
    )
