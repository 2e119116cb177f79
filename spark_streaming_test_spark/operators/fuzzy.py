"""Fuzzy string matching: noisy-probe → canonical-dictionary resolution.

Entity normalization against a controlled vocabulary (product names,
country lists, label taxonomies) is the string cousin of the
reference's limits-table lookup (``MainApp.java:32-36``): a big noisy
stream joined against a small authoritative dimension — except the
join predicate is edit distance, not equality.

Scale shape: candidates come from a blocked EQUI-join on
(end-kind, end-char, length-bucket) — provably complete for the
top-1 here because the probe construction guarantees a dictionary
entry within edit distance 1 (see join_fuzzy_dictionary) — so the
plan is an ordinary hash join whose cost is sum-of-block-sizes, and
the dictionary may grow without ever hitting a broadcast limit or an
O(probes x |dict|) nested loop.

Probes are manufactured deterministically from the dictionary itself
(one character deleted at a key-dependent position), so the operator
is self-evaluating: ``correct`` reports whether fuzzy matching
recovered the true source name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

PROBE_MOD = 7  # 1-in-7 parts become noisy probes


@register(
    "join_fuzzy_dictionary",
    tags=("join", "fuzzy", "levenshtein"),
    oracle=f"""
WITH dict AS (
  SELECT DISTINCT p_name FROM part
),
probes AS (
  SELECT p_partkey AS probe_id, p_name AS src_name,
         substr(p_name, 1, (p_partkey % (length(p_name) - 2)) + 1)
           || substr(p_name, (p_partkey % (length(p_name) - 2)) + 3)
           AS probe
  FROM part WHERE p_partkey % {PROBE_MOD} = 0
),
scored AS (
  SELECT p.probe_id, p.probe, p.src_name, d.p_name AS cand,
         levenshtein(p.probe, d.p_name) AS dist,
         ROW_NUMBER() OVER (PARTITION BY p.probe_id
                            ORDER BY levenshtein(p.probe, d.p_name),
                                     d.p_name) AS rk
  FROM probes p CROSS JOIN dict d
)
SELECT probe_id, probe, cand AS best_match, CAST(dist AS INTEGER) AS dist,
       (cand = src_name) AS correct
FROM scored WHERE rk = 1
""",
)
def join_fuzzy_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve noisy strings (a part name with one character deleted at
    a key-dependent position) to the nearest canonical dictionary entry
    by Levenshtein distance; ties break alphabetically.

    Scale shape — blocked EQUI-join, not a nested-loop scan: the true
    source name is always in the dictionary at distance exactly 1, so
    the global best match has dist <= 1, and EVERY string within one
    edit of the probe (a) differs in length by at most 1 and (b) keeps
    the probe's first character OR its last character (a single edit
    cannot change both ends). Candidates therefore come from an
    equi-join on (end-kind, end-char, length-bucket) — probes emit 6
    keys (3 length buckets x first/last char), dictionary entries emit
    2 — which AQE plans as broadcast-hash while the dictionary is small
    and as a shuffle hash join when it outgrows the limit; compute is
    sum-of-block-sizes, never O(probes x |dict|). The per-probe top-1
    over the blocked candidates equals the global top-1 (same dist
    ranking, same alphabetical ties) because all dist<=1 candidates are
    blocked-in and the winner always has dist <= 1.

    The top-1 is a ``min(struct(dist, cand))`` HASH AGGREGATE, not a
    sort window: struct ordering compares dist then cand — exactly the
    ranking and tie-break — and min is insensitive to duplicate
    candidate pairs, so the blocked join needs no pair-level distinct.
    That removes a candidate-sized shuffle+sort vs the window-rank form;
    the partial min combines map-side, so the one remaining exchange
    moves one row per (probe, distinct block hit).

    ``correct`` makes recall measurable in-line (errors only occur
    between near-identical vocabulary entries)."""
    part = load(spark, sf_dir, "part")
    dict_keys = (
        load(spark, sf_dir, "part")
        .select(F.col("p_name").alias("cand"))
        .distinct()
        .select(
            "cand",
            F.length("cand").alias("blk_len"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("F").alias("kind"),
                        F.substring("cand", 1, 1).alias("ch"),
                    ),
                    F.struct(
                        F.lit("L").alias("kind"),
                        F.expr("substr(cand, length(cand), 1)").alias("ch"),
                    ),
                )
            ).alias("k"),
        )
        .select("cand", "blk_len", "k.kind", "k.ch")
    )
    # No fan-out needed: the bounded levenshtein makes per-pair work
    # O(len), the blocked join keeps pairs per probe at O(block size),
    # and the partial min combines before the one exchange — the probe
    # side's parallelism is whatever the scan provides, which on a
    # production multi-file layout is already >= cores.
    probes = part.filter(F.col("p_partkey") % PROBE_MOD == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.col("p_name").alias("src_name"),
        F.concat(
            F.expr("substr(p_name, 1, (p_partkey % (length(p_name) - 2)) + 1)"),
            F.expr("substr(p_name, (p_partkey % (length(p_name) - 2)) + 3)"),
        ).alias("probe"),
    )
    probe_keys = probes.select(
        "probe_id",
        "src_name",
        "probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kind).alias("kind"),
                        (
                            F.substring("probe", 1, 1)
                            if kind == "F"
                            else F.expr("substr(probe, length(probe), 1)")
                        ).alias("ch"),
                        (F.length("probe") + dl).alias("blk_len"),
                    )
                    for kind in ("F", "L")
                    for dl in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("probe_id", "src_name", "probe", "k.kind", "k.ch", "k.blk_len")
    candidates = probe_keys.join(dict_keys, ["kind", "ch", "blk_len"]).select(
        "probe_id", "src_name", "probe", "cand"
    )
    # Bounded edit distance: the winner provably has dist <= 1 (the
    # source name is blocked-in at distance exactly 1), so the banded
    # O(len x 1) levenshtein replaces the full O(len^2) matrix per
    # candidate pair — the dominant compute — and the -1 overflow rows
    # can't contain the winner and are dropped before the aggregate.
    scored = candidates.withColumn(
        "dist", F.expr("levenshtein(probe, cand, 1)")
    ).filter(F.col("dist") >= 0)
    best = (
        scored.groupBy("probe_id", "probe", "src_name")
        .agg(F.min(F.struct("dist", "cand")).alias("best"))
    )
    return best.select(
        "probe_id",
        "probe",
        F.col("best.cand").alias("best_match"),
        F.col("best.dist").cast("int").alias("dist"),
        (F.col("best.cand") == F.col("src_name")).alias("correct"),
    )


# --- Jaro-Winkler similarity ---------------------------------------------------
#
# The record-linkage similarity (Winkler 1990, Census Bureau): Jaro's
# windowed match/transposition count plus a common-prefix boost,
# applied only above the 0.7 threshold (the Census convention — DuckDB
# follows it, probed: jw('ab','ax') == jaro('ab','ax')). Spark has no
# built-in, so the engine side is a HAND implementation in Arrow
# batches, verified against DuckDB's NATIVE jaro_winkler_similarity —
# the two-independent-implementations pattern (NFC, tarfile, zipfile,
# punycode) applied to a string metric. 8-dp rounding both sides
# absorbs any last-ulp division-order difference.

JW_PREFIX_CAP = 4
JW_BOOST = 0.1
JW_THRESHOLD = 0.7


def jaro_winkler(a: str, b: str) -> float:
    """Textbook Jaro-Winkler with the 0.7 boost threshold."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= JW_THRESHOLD:
        return jaro
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= JW_PREFIX_CAP:
            break
        prefix += 1
    return jaro + prefix * JW_BOOST * (1.0 - jaro)


@register(
    "fuzzy_jaro_winkler",
    tags=("fuzzy", "entity", "similarity", "pandas-udf"),
    oracle="""
WITH pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
)
SELECT key_a, key_b,
       round(jaro_winkler_similarity(name_a, name_b), 8) AS jw,
       jaro_winkler_similarity(name_a, name_b) > 0.85 AS is_match
FROM pairs
""",
)
def fuzzy_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler scores over adjacent-key part-name pairs: the hand
    implementation (windowed matches, half-transpositions, thresholded
    prefix boost) runs in an Arrow-batched map and must reproduce
    DuckDB's NATIVE implementation to 8 dp for every pair — a genuine
    cross-implementation oracle, not a mirrored formula. Scale: the
    metric is a per-pair map; candidate generation is the equi-join
    (here adjacent keys; in production a blocking key, as in
    er_blocked_match), never all-pairs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    p = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = (
        p.alias("a")
        .join(
            p.alias("b"),
            F.col("b.p_partkey") == F.col("a.p_partkey") + 1,
        )
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
    )
    jw_udf = pandas_udf(
        lambda a, b: pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        ),
        "double",
    )
    # Round-robin the narrow pair frame before the Arrow UDF
    # (optimization r14, guide §2.5/§4, the kafka-wire r13 recipe): the
    # adjacent-key join output was AQE-coalesced to one task, so all
    # Python scoring ran on one core.
    scored = pairs.repartition(
        spark.sparkContext.defaultParallelism
    ).withColumn("raw", jw_udf("name_a", "name_b"))
    return scored.select(
        "key_a",
        "key_b",
        F.round("raw", 8).alias("jw"),
        (F.col("raw") > 0.85).alias("is_match"),
    )
