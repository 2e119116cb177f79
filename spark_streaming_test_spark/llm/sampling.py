"""Deterministic sampling & dataset splitting for training-data pipelines.

``df.sample()`` draws from a partition-seeded RNG, so its output changes
with partitioning, task retries, and engine — unacceptable both for the
oracle gate and for real pipelines (a retried task must not change the
training set). These operators instead key every decision on a CONTENT
HASH (md5 of the stable id): the same row lands in the same
sample/split on any cluster size, any engine, any rerun — and documents
added later don't reshuffle existing assignments (the property that
makes hash-splits the standard for 100 TB corpora).

All are pure projections/filters over the scan — no shuffle except the
small audit aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

# First two hex chars of md5 ~ uniform over 256 buckets; '00'..'19' is
# 26/256 ~ 10.2% of rows.
SAMPLE_CEIL = "19"


def _hash_key(col):
    return F.md5(F.col(col).cast("string"))


@register(
    "sample_hash_deterministic",
    tags=("llm", "sampling"),
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{SAMPLE_CEIL}'
""",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected by md5(doc_id) prefix — partition-count- and
    retry-invariant, unlike ``df.sample``. The predicate is a scan-level
    filter (no shuffle); at 100 TB the sample streams out of the source
    without materializing the corpus."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "source", "n_chars").filter(
        F.substring(_hash_key("doc_id"), 1, 2) <= SAMPLE_CEIL
    )


@register(
    "split_train_test",
    tags=("llm", "sampling", "split"),
    oracle="""
WITH assigned AS (
  SELECT lang,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY lang, split
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed train/val/test split (12/2/2 of 16 hex buckets =
    75%/12.5%/12.5%) with a per-language audit aggregate. Assignment is
    a projection; only the audit counts shuffle. Adding documents never
    moves an existing doc between splits (no train/test leakage on
    incremental corpus refreshes)."""
    d = spread(load(spark, sf_dir, "documents"))
    first = F.substring(_hash_key("doc_id"), 1, 1)
    split = (
        F.when(first <= "b", "train").when(first <= "d", "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "sample_stratified_hash",
    tags=("llm", "sampling", "stratified"),
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
      <= CASE WHEN lang = 'en' THEN '1f' ELSE '7f' END
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: downsample the dominant
    stratum (en at ~12.5%) while keeping minority languages at ~50% —
    the rebalancing step applied to over-represented web crawl sources.
    Same hash-key mechanics as sample_hash_deterministic, so the
    decision is retry/partition/engine-invariant and a later corpus
    refresh never flips an existing row; still a pure scan-level
    filter (no shuffle)."""
    d = load(spark, sf_dir, "documents")
    ceil = F.when(F.col("lang") == "en", "1f").otherwise("7f")
    return d.select("doc_id", "lang", "source", "n_chars").filter(
        F.substring(_hash_key("doc_id"), 1, 2) <= ceil
    )


TOKEN_BUDGET = 800  # per-source whitespace-token budget


@register(
    "sample_token_budget",
    tags=("llm", "sampling", "budget"),
    oracle=f"""
WITH scored AS (
  SELECT source, doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
running AS (
  SELECT source, doc_id, n_chars, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS running_tokens
  FROM scored
)
SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, running_tokens
FROM running WHERE running_tokens <= {TOKEN_BUDGET}
""",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: per source, take documents in quality
    order (longest-first proxy here; any score column slots in) until a
    fixed token budget is hit — how mixture targets are enforced when
    assembling a training corpus ("X billion tokens of domain Y").
    One hash exchange on source; the running sum reuses that partition
    (single window, no second shuffle); ints only, engine-exact."""
    d = spread(load(spark, sf_dir, "documents"))
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("source", "doc_id", "n_chars", n_tokens.alias("n_tokens"))
        .withColumn("running_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("running_tokens") <= TOKEN_BUDGET)
        .select(
            "source",
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "running_tokens",
        )
    )


RESERVOIR_N = 100


@register(
    "sample_weighted_reservoir",
    tags=("llm", "sampling", "weighted"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         round(
           ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                AS UBIGINT) + 0.5) / 4294967296.0)
           / CAST(n_chars AS DOUBLE), 12) AS res_key
  FROM documents
)
SELECT doc_id, source, n_chars, res_key
FROM keyed ORDER BY res_key DESC, doc_id LIMIT {RESERVOIR_N}
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row gets key ln(u)/w with
    u = md5(doc_id)-derived uniform and w = n_chars; the {RESERVOIR_N}
    largest keys ARE a weighted sample — longer documents
    proportionally more likely, yet every decision replayable on any
    engine/partitioning (u is content-keyed, not RNG).

    Scale: key assignment is a scan-level projection; selection is
    ORDER BY + LIMIT which Spark executes as TakeOrderedAndProject —
    each partition keeps its local top-{RESERVOIR_N}, only N×partitions
    candidate rows ever move. One pass, no full sort, no corpus
    shuffle — the one-pass distributed reservoir.

    Determinism note: u = (hex_int + 0.5) / 2^32 and the ln/divide
    chain are IEEE-identical on both engines (same libm, exact binary
    inputs); round(12) only stabilizes display."""
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(_hash_key("doc_id"), 1, 8), 16, 10).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 12)
    return (
        d.select("doc_id", "source", "n_chars", key.alias("res_key"))
        .orderBy(F.desc("res_key"), "doc_id")
        .limit(RESERVOIR_N)
    )


TEMPORAL_CUTOFF = "2024-01-25"  # events strictly before -> train


@register(
    "sample_temporal_split",
    tags=("llm", "sampling", "split", "temporal"),
    oracle=f"""
WITH labeled AS (
  SELECT user_id, event_id,
         CASE WHEN ts < TIMESTAMP '{TEMPORAL_CUTOFF}' THEN 'train'
              ELSE 'eval' END AS split
  FROM events
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM labeled
GROUP BY split
ORDER BY split
""",
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split at a fixed cutoff — the leakage-safe
    alternative to hash splitting for time-dependent data (the eval
    period must be strictly AFTER anything trained on; hash splits
    leak future events into train). The cutoff literal pushes into the
    parquet scan as a min/max row-group filter, so at 100 TB each
    split materializes from a fraction of the files. Reported as
    per-split event/user counts; the labeling projection is what a
    writer would partition the output by."""
    ev = load(spark, sf_dir, "events")
    split = F.when(
        F.col("ts") < F.lit(TEMPORAL_CUTOFF).cast("timestamp"), "train"
    ).otherwise("eval")
    return (
        ev.select(split.alias("split"), "event_id", "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("split")
    )


@register(
    "sample_balanced_classes",
    tags=("llm", "sampling", "class-balance"),
    oracle="""
WITH sized AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
),
floor_n AS (SELECT MIN(n) AS cap FROM sized),
ranked AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
  FROM embeddings
)
SELECT r.label, r.vec_id
FROM ranked r CROSS JOIN floor_n f
WHERE r.rk <= f.cap
""",
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-count rows, chosen by md5 rank so the selection is
    deterministic, partition-invariant, and replay-safe (the property
    all sampling in this engine shares — `df.sample` is none of those).

    One shuffle on label drives both the per-class rank and the class
    sizes; the 1-row floor broadcasts. At 100 TB the md5 order also
    makes the kept subset stable under corpus appends: existing rows
    keep their rank prefix unless new rows hash below them — the same
    property that makes hash sampling incremental-friendly."""
    e = load(spark, sf_dir, "embeddings")
    sized = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    cap = sized.agg(F.min("n").alias("cap"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        e.select("label", "vec_id")
        .withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(cap))
        .filter(F.col("rk") <= F.col("cap"))
        .select("label", "vec_id")
    )


@register(
    "sample_importance_weights",
    tags=("llm", "sampling", "estimation"),
    oracle="""
WITH tagged AS (
  SELECT CASE WHEN lang IN ('en', 'de', 'fr') THEN lang ELSE 'other' END
           AS stratum,
         n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
  FROM documents
),
capped AS (
  SELECT stratum, n_chars, h,
         CASE stratum WHEN 'en' THEN '3' WHEN 'de' THEN '7'
                      WHEN 'fr' THEN 'b' ELSE 'f' END AS ceil_digit
  FROM tagged
),
agg AS (
  SELECT stratum,
         CAST(COUNT(*) AS DOUBLE) AS n_total,
         CAST(SUM(CASE WHEN h <= ceil_digit THEN 1 ELSE 0 END) AS DOUBLE)
           AS n_kept,
         CAST(SUM(n_chars) AS DOUBLE) AS true_chars,
         CAST(SUM(CASE WHEN h <= ceil_digit THEN n_chars ELSE 0 END)
              AS DOUBLE) AS kept_chars
  FROM capped GROUP BY stratum
)
SELECT stratum,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_kept AS BIGINT) AS n_kept,
       n_total / n_kept AS weight,
       kept_chars * (n_total / n_kept) AS est_chars,
       CAST(true_chars AS BIGINT) AS true_chars,
       kept_chars * (n_total / n_kept) / true_chars AS est_ratio
FROM agg
""",
)
def sample_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with inverse-inclusion-probability weights:
    each language stratum keeps a DIFFERENT md5-prefix fraction (heavy
    downsampling of dominant strata — the mixture-rebalancing move),
    and the Horvitz–Thompson weight ``n_total / n_kept`` makes
    downstream statistics unbiased. ``est_ratio`` audits the estimator
    against the true total in-line.

    Counts and char totals are exact integers; the weight and estimate
    are one IEEE expression per stratum row. One shuffle, map-side
    combined — the corpus never moves, only per-stratum partials."""
    d = load(spark, sf_dir, "documents")
    stratum = F.when(
        F.col("lang").isin("en", "de", "fr"), F.col("lang")
    ).otherwise("other")
    ceil_digit = (
        F.when(F.col("stratum") == "en", "3")
        .when(F.col("stratum") == "de", "7")
        .when(F.col("stratum") == "fr", "b")
        .otherwise("f")
    )
    tagged = d.select(
        stratum.alias("stratum"),
        "n_chars",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("h"),
    ).withColumn("ceil_digit", ceil_digit)
    kept = F.col("h") <= F.col("ceil_digit")
    agg = tagged.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("double").alias("n_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("double").alias("n_kept"),
        F.sum("n_chars").cast("double").alias("true_chars"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("double")
        .alias("kept_chars"),
    )
    weight = F.col("n_total") / F.col("n_kept")
    est = F.col("kept_chars") * weight
    return agg.select(
        "stratum",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        weight.alias("weight"),
        est.alias("est_chars"),
        F.col("true_chars").cast("bigint").alias("true_chars"),
        (est / F.col("true_chars")).alias("est_ratio"),
    )


TEMP_TAU = 0.7  # mixture temperature (multilingual-LM convention)


@register(
    "sample_temperature_mixture",
    tags=("llm", "sampling", "mixture"),
    oracle=f"""
WITH s AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
  FROM documents GROUP BY source
),
t AS (SELECT SUM(chars) AS total FROM s),
q AS (
  SELECT source, n_docs, chars,
         CAST(chars AS DOUBLE) / total AS p,
         round(pow(CAST(chars AS DOUBLE) / total,
                   CAST({TEMP_TAU} AS DOUBLE)), 8) AS qn
  FROM s, t
),
z AS (SELECT CAST(SUM(CAST(qn AS DECIMAL(25,8))) AS DOUBLE) AS zsum FROM q)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(chars AS BIGINT) AS chars,
       p AS nat_share,
       qn / zsum AS sample_weight,
       (qn / zsum) / p AS boost
FROM q, z
""",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights: resample sources by
    p^τ (τ={TEMP_TAU}) renormalized — the standard move that upweights
    tail domains/languages without flattening the mixture entirely
    (τ=1 keeps natural token shares, τ=0 is uniform). ``boost`` is the
    effective epoch multiplier each source's data gets under the
    temperature mixture; feed ``sample_weight`` into the weighted
    reservoir sampler.

    Scale: ONE map-side-combined shuffle carrying (count, Σchars) per
    source; everything after runs on the source-cardinality frame
    (tiny, Heaps-bounded) with a broadcast grand total. pow() outputs
    are rounded at 8 dp then decimal-summed for a cross-engine-stable
    normalizer; the shares themselves are exact integer ratios."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    t = s.agg(F.sum("chars").alias("total"))
    q = s.join(F.broadcast(t), F.lit(True)).select(
        "source",
        "n_docs",
        "chars",
        (F.col("chars").cast("double") / F.col("total")).alias("p"),
        F.round(
            F.pow(F.col("chars").cast("double") / F.col("total"), TEMP_TAU), 8
        ).alias("qn"),
    )
    z = q.agg(F.sum(F.col("qn").cast("decimal(25,8)")).cast("double").alias("zsum"))
    return q.join(F.broadcast(z), F.lit(True)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("chars").cast("bigint").alias("chars"),
        F.col("p").alias("nat_share"),
        (F.col("qn") / F.col("zsum")).alias("sample_weight"),
        ((F.col("qn") / F.col("zsum")) / F.col("p")).alias("boost"),
    )


N_EPOCHS = 2  # epochs materialized by the demo query


@register(
    "sample_epoch_shuffle",
    tags=("llm", "sampling", "ordering"),
    oracle=f"""
WITH epochs AS (SELECT CAST(t.i AS INTEGER) AS epoch
                FROM unnest(range(0, {N_EPOCHS})) AS t(i)),
keyed AS (
  SELECT epoch, doc_id,
         md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))
           AS shuffle_key
  FROM documents CROSS JOIN epochs
)
SELECT epoch, doc_id, shuffle_key,
       ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY shuffle_key, doc_id)
         AS position
FROM keyed
""",
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch training order: every epoch re-shuffles
    the corpus by ``md5(epoch:doc_id)`` — a different but fully
    DETERMINISTIC permutation per epoch, so a preempted training run
    resumes mid-epoch at the exact same order with no shuffle files or
    RNG state to recover. The pattern every large-scale data loader
    needs and Spark's ``orderBy(rand())`` cannot give you.

    Scale: the shuffle key is a pure projection; the per-epoch
    ordering is a range-partitioned sort on that key (epochs are
    independent, so each epoch's sort parallelizes fully), and in
    production the WRITE inherits the order (`sortWithinPartitions` +
    ordered file naming) — the position column here makes the
    contract oracle-checkable."""
    d = load(spark, sf_dir, "documents")
    epochs = spark.range(N_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
    return keyed.withColumn("position", F.row_number().over(w))


KFOLDS = 5


@register(
    "sample_group_kfold",
    tags=("llm", "sampling", "splitting"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(source), 1, 8))::UBIGINT % {KFOLDS}
              AS INTEGER) AS fold
  FROM documents
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups
FROM assigned GROUP BY fold
""",
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment — cross-validation WITHOUT leakage: the
    fold is a hash of the GROUP (source), never the row, so every
    document from one source lands in the same fold and a model
    evaluated on fold i has truly never seen that source. The audit
    frame reports docs and groups per fold (group counts across folds
    sum to the distinct-source total ⇒ each group lives in exactly one
    fold — the invariant `split_train_test` holds at row grain, lifted
    to group grain).

    Scale: fold assignment is a pure projection (md5 in codegen, no
    group dictionary, no shuffle-by-group); the audit reduce carries
    O(folds × sources) partials. Deterministic and replay-safe like
    every hash split here."""
    d = load(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("bigint")
        % KFOLDS
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "source")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_groups"),
        )
    )


NEYMAN_BUDGET = 1000  # total sample size to allocate across strata
NEYMAN_DP = 8


@register(
    "sample_neyman_allocation",
    tags=("llm", "sampling", "statistics"),
    oracle=f"""
WITH strata AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(value * value, 4) AS DECIMAL(20,4)))
              AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
scored AS (
  SELECT event_type, n_h,
         round(n_h * sqrt(s2 / n_h - (s1 / n_h) * (s1 / n_h)), {NEYMAN_DP})
           AS weight
  FROM strata
),
tot AS (
  SELECT CAST(SUM(CAST(weight AS DECIMAL(25,{NEYMAN_DP}))) AS DOUBLE) AS z
  FROM scored
)
SELECT event_type, n_h,
       weight / z AS alloc_share,
       CAST(floor({NEYMAN_BUDGET} * weight / z) AS BIGINT) AS alloc_n,
       round({NEYMAN_BUDGET}.0 * weight / z / n_h, {NEYMAN_DP})
         AS sampling_rate
FROM scored CROSS JOIN tot
""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation: split a {NEYMAN_BUDGET}-row
    labeling/eval budget across strata ∝ N_h·σ_h — variance-heavy
    strata get more samples, (near-)constant ones almost none; this is
    provably the minimum-variance allocation for a fixed budget, and
    the difference between wasting annotation money and not.

    One map-side-combined pass collects exact decimal moments per
    stratum (the `agg_linreg_by_group` template: value² quantized once
    at 4 dp); σ is an IEEE sqrt of identical doubles, the N_h·σ_h
    weight rounds at {NEYMAN_DP} dp (generic, post-division) and
    normalizes against a decimal-summed total. Allocation integers
    floor deterministically."""
    ev = load(spark, sf_dir, "events")
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("s1"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 4).cast("decimal(20,4)")
        ).cast("double").alias("s2"),
    )
    nh = F.col("n_h").cast("double")
    sigma = F.sqrt(F.col("s2") / nh - (F.col("s1") / nh) * (F.col("s1") / nh))
    scored = strata.select(
        "event_type",
        "n_h",
        F.round(nh * sigma, NEYMAN_DP).alias("weight"),
    )
    tot = scored.agg(
        F.sum(F.col("weight").cast(f"decimal(25,{NEYMAN_DP})"))
        .cast("double")
        .alias("z")
    )
    return scored.join(F.broadcast(tot), F.lit(True)).select(
        "event_type",
        "n_h",
        (F.col("weight") / F.col("z")).alias("alloc_share"),
        F.floor(NEYMAN_BUDGET * F.col("weight") / F.col("z"))
        .cast("bigint")
        .alias("alloc_n"),
        F.round(
            NEYMAN_BUDGET * F.col("weight") / F.col("z") / F.col("n_h"),
            NEYMAN_DP,
        ).alias("sampling_rate"),
    )


# --- fractional-epoch oversampling ----------------------------------------

# Per-source epoch factor in HUNDREDTHS (integer): {50, 105, 160, 215}
# by source index mod 4 — stand-in for the mixture tuner's output
# (corpus_mixture_weights / sample_temperature_mixture feed real
# factors in the same shape).
_EPOCH_CENTS = "50 + (CAST(substr(source, 4) AS INT) % 4) * 55"


@register(
    "sample_poisson_epochs",
    tags=("llm", "sampling", "epochs"),
    oracle=f"""
WITH planned AS (
  SELECT doc_id, source,
         {_EPOCH_CENTS} AS cents,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep'), 1, 8))::BIGINT
           AS h
  FROM documents
),
copies AS (
  SELECT doc_id, source, cents,
         cents // 100
           + CASE WHEN h % 100 < cents % 100 THEN 1 ELSE 0 END AS n_copies
  FROM planned
)
SELECT doc_id, source,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
FROM copies
WHERE n_copies > 0
""",
)
def sample_poisson_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch oversampling — the step that realizes a mixture
    plan like "src3 gets 1.6 epochs": every document materializes
    floor(e) copies plus one more with probability frac(e), decided by
    an md5(doc_id)-derived uniform. Deterministic and replay-safe (the
    same doc makes the same copies on every run and engine — resumable
    training without persisting the sampled corpus), and in expectation
    each source contributes exactly e_s · n_s documents per pass.

    Scale: a pure projection + bounded explode — no shuffle at all;
    the epoch factors arrive as a broadcast plan in production. Integer
    arithmetic end-to-end (factors kept in hundredths), so the
    keep/copy decision can never waver."""
    d = load(spark, sf_dir, "documents")
    planned = d.select(
        "doc_id",
        "source",
        F.expr(_EPOCH_CENTS).alias("cents"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ep"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    copies = planned.select(
        "doc_id",
        "source",
        (
            F.expr("cents div 100")
            + F.when(F.col("h") % 100 < F.col("cents") % 100, 1).otherwise(0)
        ).alias("n_copies"),
    ).filter(F.col("n_copies") > 0)
    return copies.select(
        "doc_id",
        "source",
        F.col("n_copies").cast("bigint").alias("n_copies"),
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("_ci"),
    ).select(
        "doc_id",
        "source",
        "n_copies",
        F.col("_ci").cast("bigint").alias("copy_idx"),
    )


# --- probability-proportional-to-size systematic sampling -----------------

PPS_PER_DAY = 5  # sampling budget per order-day


@register(
    "sample_pps_systematic",
    tags=("sampling", "pps", "survey"),
    oracle=f"""
WITH orders_c AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
cum AS (
  SELECT o_orderkey, day, cents,
         SUM(cents) OVER (PARTITION BY day ORDER BY o_orderkey
                          ROWS UNBOUNDED PRECEDING) AS c_hi,
         SUM(cents) OVER (PARTITION BY day) AS day_tot
  FROM orders_c
),
stepped AS (
  SELECT o_orderkey, day, cents, c_hi, c_hi - cents AS c_lo,
         day_tot // {PPS_PER_DAY} AS step, day_tot
  FROM cum
)
SELECT o_orderkey, day,
       CAST(cents AS DOUBLE) / 100.0 AS totalprice,
       CAST(cents AS DOUBLE) * {PPS_PER_DAY} / CAST(day_tot AS DOUBLE)
         AS inclusion_prob
FROM stepped
WHERE step > 0 AND (c_hi // step) > (c_lo // step)
  AND (c_hi // step) <= {PPS_PER_DAY}
""",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling of orders —
    {PPS_PER_DAY} per day, selection probability ∝ order value: walk
    the day's cumulative value line in exact integer cents and take
    the order under each step boundary (an order is selected iff a
    multiple of step = day_total/{PPS_PER_DAY} falls inside its value
    interval). The survey-sampling primitive behind value-weighted
    audits: big orders are near-certain picks, the long tail is
    sampled at known, reportable inclusion probabilities
    (the Horvitz-Thompson input `sample_importance_weights` consumes).

    Fully integer — cumulative cents, integer division per boundary —
    so selection is bitwise identical on both engines; only the
    reported inclusion_prob divides. Plan: one window pass PARTITIONED
    BY DAY (per-partition state O(1), no global sort anywhere), then a
    filter — scale-independent by construction."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("day"),
        (F.col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    wp = Window.partitionBy("day")
    wc = wp.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = o.select(
        "o_orderkey",
        "day",
        "cents",
        F.sum("cents").over(wc).alias("c_hi"),
        F.sum("cents").over(wp).alias("day_tot"),
    )
    stepped = cum.select(
        "o_orderkey",
        "day",
        "cents",
        "c_hi",
        (F.col("c_hi") - F.col("cents")).alias("c_lo"),
        F.expr(f"day_tot div {PPS_PER_DAY}").alias("step"),
        "day_tot",
    )
    return stepped.filter(
        (F.col("step") > 0)
        & (F.expr("c_hi div step") > F.expr("c_lo div step"))
        & (F.expr("c_hi div step") <= PPS_PER_DAY)
    ).select(
        "o_orderkey",
        "day",
        (F.col("cents").cast("double") / 100.0).alias("totalprice"),
        (
            F.col("cents").cast("double")
            * PPS_PER_DAY
            / F.col("day_tot").cast("double")
        ).alias("inclusion_prob"),
    )


# --- survey raking (iterative proportional fitting) -----------------------

IPF_ITERS = 3
# Design targets the reweighted sample must hit: even variant split,
# calendar-share day-type split.
IPF_ROW_NUM, IPF_ROW_DEN = 1, 2    # target P(variant = A) = 1/2
IPF_COL_NUM, IPF_COL_DEN = 5, 7    # target P(weekday) = 5/7


def _sql_ipf_oracle() -> str:
    # One row carries all four cells; every IPF step is explicit
    # column arithmetic — no SUM over variable-order doubles anywhere.
    steps = []
    prev = "it0"
    steps.append("""
it0 AS (
  SELECT CAST(n_aw AS DOUBLE) AS w_aw, CAST(n_ae AS DOUBLE) AS w_ae,
         CAST(n_bw AS DOUBLE) AS w_bw, CAST(n_be AS DOUBLE) AS w_be,
         CAST(n_aw + n_ae + n_bw + n_be AS DOUBLE) AS n
  FROM cells
)""")
    for i in range(1, IPF_ITERS + 1):
        steps.append(f"""
r{i} AS (
  SELECT (w_aw * (n * {IPF_ROW_NUM}.0 / {IPF_ROW_DEN}) / (w_aw + w_ae)) AS w_aw,
         (w_ae * (n * {IPF_ROW_NUM}.0 / {IPF_ROW_DEN}) / (w_aw + w_ae)) AS w_ae,
         (w_bw * (n * (1.0 - {IPF_ROW_NUM}.0 / {IPF_ROW_DEN})) / (w_bw + w_be)) AS w_bw,
         (w_be * (n * (1.0 - {IPF_ROW_NUM}.0 / {IPF_ROW_DEN})) / (w_bw + w_be)) AS w_be,
         n
  FROM {prev}
),
it{i} AS (
  SELECT (w_aw * (n * {IPF_COL_NUM}.0 / {IPF_COL_DEN}) / (w_aw + w_bw)) AS w_aw,
         (w_ae * (n * (1.0 - {IPF_COL_NUM}.0 / {IPF_COL_DEN})) / (w_ae + w_be)) AS w_ae,
         (w_bw * (n * {IPF_COL_NUM}.0 / {IPF_COL_DEN}) / (w_aw + w_bw)) AS w_bw,
         (w_be * (n * (1.0 - {IPF_COL_NUM}.0 / {IPF_COL_DEN})) / (w_ae + w_be)) AS w_be,
         n
  FROM r{i}
)""")
        prev = f"it{i}"
    return f"""
WITH base AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(EXTRACT(dow FROM ts) AS INTEGER) BETWEEN 1 AND 5 AS weekday
  FROM events
),
cells AS (
  SELECT CAST(SUM(CASE WHEN variant = 'A' AND weekday THEN 1 ELSE 0 END) AS BIGINT) AS n_aw,
         CAST(SUM(CASE WHEN variant = 'A' AND NOT weekday THEN 1 ELSE 0 END) AS BIGINT) AS n_ae,
         CAST(SUM(CASE WHEN variant = 'B' AND weekday THEN 1 ELSE 0 END) AS BIGINT) AS n_bw,
         CAST(SUM(CASE WHEN variant = 'B' AND NOT weekday THEN 1 ELSE 0 END) AS BIGINT) AS n_be
  FROM base
),
{",".join(steps)}
SELECT c.n_aw, c.n_ae, c.n_bw, c.n_be,
       f.w_aw, f.w_ae, f.w_bw, f.w_be,
       f.w_aw / c.n_aw AS rake_aw,
       f.w_ae / c.n_ae AS rake_ae,
       f.w_bw / c.n_bw AS rake_bw,
       f.w_be / c.n_be AS rake_be,
       (f.w_aw + f.w_ae) / f.n AS row_a_share,
       (f.w_aw + f.w_bw) / f.n AS col_weekday_share
FROM cells c CROSS JOIN {prev} f
"""


@register(
    "sample_raking_ipf",
    tags=("sampling", "survey", "weights", "iterative"),
    oracle=_sql_ipf_oracle(),
)
def sample_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY RAKING (iterative proportional fitting): reweight the
    variant × day-type cells so BOTH margins hit their design targets
    (even variant split, 5/7 weekday share) — the post-stratification
    weighting every survey/panel pipeline applies when the collected
    sample's margins drift from the population's, and the classical
    IPF algorithm behind it ({IPF_ITERS} row/column scaling rounds).
    Output: raw cells, fitted weights, per-cell rake factors, and the
    achieved margins (the convergence evidence, in the verified
    result).

    ONE corpus pass reduces to the 2×2 table PIVOTED ONTO A SINGLE
    ROW; every IPF step is then explicit column arithmetic — there is
    no SUM over a variable-order float collection anywhere, so the
    whole fit is bitwise identical on both engines by construction."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7", "A"
        )
        .otherwise("B")
        .alias("variant"),
        F.dayofweek("ts").isin(2, 3, 4, 5, 6).alias("weekday"),
    )
    cells = base.agg(
        F.sum(F.when((F.col("variant") == "A") & F.col("weekday"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_aw"),
        F.sum(
            F.when((F.col("variant") == "A") & ~F.col("weekday"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_ae"),
        F.sum(F.when((F.col("variant") == "B") & F.col("weekday"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bw"),
        F.sum(
            F.when((F.col("variant") == "B") & ~F.col("weekday"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_be"),
    )
    c = F.col
    cur = cells.select(
        "n_aw",
        "n_ae",
        "n_bw",
        "n_be",
        c("n_aw").cast("double").alias("w_aw"),
        c("n_ae").cast("double").alias("w_ae"),
        c("n_bw").cast("double").alias("w_bw"),
        c("n_be").cast("double").alias("w_be"),
        (c("n_aw") + c("n_ae") + c("n_bw") + c("n_be"))
        .cast("double")
        .alias("n"),
    )
    row_t = IPF_ROW_NUM / IPF_ROW_DEN
    col_t = IPF_COL_NUM / IPF_COL_DEN
    for _ in range(IPF_ITERS):
        cur = cur.select(
            "n_aw", "n_ae", "n_bw", "n_be", "n",
            (c("w_aw") * (c("n") * F.lit(row_t)) / (c("w_aw") + c("w_ae"))).alias("w_aw"),
            (c("w_ae") * (c("n") * F.lit(row_t)) / (c("w_aw") + c("w_ae"))).alias("w_ae"),
            (c("w_bw") * (c("n") * (1.0 - F.lit(row_t))) / (c("w_bw") + c("w_be"))).alias("w_bw"),
            (c("w_be") * (c("n") * (1.0 - F.lit(row_t))) / (c("w_bw") + c("w_be"))).alias("w_be"),
        )
        cur = cur.select(
            "n_aw", "n_ae", "n_bw", "n_be", "n",
            (c("w_aw") * (c("n") * F.lit(col_t)) / (c("w_aw") + c("w_bw"))).alias("w_aw"),
            (c("w_ae") * (c("n") * (1.0 - F.lit(col_t))) / (c("w_ae") + c("w_be"))).alias("w_ae"),
            (c("w_bw") * (c("n") * F.lit(col_t)) / (c("w_aw") + c("w_bw"))).alias("w_bw"),
            (c("w_be") * (c("n") * (1.0 - F.lit(col_t))) / (c("w_ae") + c("w_be"))).alias("w_be"),
        )
    return cur.select(
        "n_aw", "n_ae", "n_bw", "n_be",
        "w_aw", "w_ae", "w_bw", "w_be",
        (c("w_aw") / c("n_aw")).alias("rake_aw"),
        (c("w_ae") / c("n_ae")).alias("rake_ae"),
        (c("w_bw") / c("n_bw")).alias("rake_bw"),
        (c("w_be") / c("n_be")).alias("rake_be"),
        ((c("w_aw") + c("w_ae")) / c("n")).alias("row_a_share"),
        ((c("w_aw") + c("w_bw")) / c("n")).alias("col_weekday_share"),
    )


# --- shuffle-quality audit -------------------------------------------------

SHUFFLE_SHARDS = 8  # writer shards of the shuffled epoch layout


@register(
    "sample_shuffle_quality",
    tags=("llm", "sampling", "shuffle", "audit"),
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {SHUFFLE_SHARDS} AS shard
  FROM documents
),
adj AS (
  SELECT source,
         LAG(source) OVER (PARTITION BY shard ORDER BY h) AS prev_source
  FROM keyed
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_adj,
         CAST(COUNT(CASE WHEN source = prev_source THEN 1 END) AS BIGINT)
           AS n_same
  FROM adj WHERE prev_source IS NOT NULL
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
bysrc AS (
  SELECT CAST(SUM(ns * (ns - 1)) AS BIGINT) AS same_pairs
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ns
        FROM documents GROUP BY source) g
)
SELECT t.n_docs, o.n_adj, o.n_same AS n_same_source_adj,
       CAST(o.n_same AS DOUBLE) / o.n_adj AS obs_adjacent_rate,
       CAST(b.same_pairs AS DOUBLE) / (t.n_docs * (t.n_docs - 1))
         AS exp_adjacent_rate
FROM tot t, obs o, bysrc b
""",
)
def sample_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit for the epoch layout: a training epoch is
    only as good as its global shuffle, and the cheap detector for a
    bad one is SERIAL CORRELATION — adjacent examples sharing a
    `source` more often than a random order would produce. Orders the
    corpus by its content-hash shuffle key (the ``sample_epoch_shuffle``
    layout), counts adjacent same-source pairs within each writer
    shard, and compares against the exact finite-population expectation
    sum_s n_s(n_s-1) / (n(n-1)). obs ~ exp means the shuffle destroyed
    source runs; obs >> exp means readers will see correlated batches
    (loss-spike fuel) even though every doc is present exactly once.

    Scale shape: the adjacency scan is {SHUFFLE_SHARDS} shard-local
    ordered windows with O(1) lag state — the shard IS the production
    writer partition, so adjacency-within-shard is exactly what a
    sequential reader consumes, and the (shards-1) cross-boundary pairs
    are excluded identically in both engines. The expectation side is
    one source-keyed aggregate. Nothing global is ordered; no driver
    state."""
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    keyed = d.withColumn(
        "shard",
        F.conv(F.substring("h", 1, 4), 16, 10).cast("bigint")
        % SHUFFLE_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("h")
    adj = keyed.withColumn("prev_source", F.lag("source").over(w))
    obs = adj.filter(F.col("prev_source").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adj"),
        F.count(F.when(F.col("source") == F.col("prev_source"), 1))
        .cast("bigint")
        .alias("n_same_source_adj"),
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    bysrc = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
        .agg(
            F.sum(F.col("ns") * (F.col("ns") - 1))
            .cast("bigint")
            .alias("same_pairs")
        )
    )
    return (
        tot.crossJoin(F.broadcast(obs))
        .crossJoin(F.broadcast(bysrc))
        .select(
            "n_docs",
            "n_adj",
            "n_same_source_adj",
            (
                F.col("n_same_source_adj").cast("double") / F.col("n_adj")
            ).alias("obs_adjacent_rate"),
            (
                F.col("same_pairs").cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - F.lit(1)))
            ).alias("exp_adjacent_rate"),
        )
    )

