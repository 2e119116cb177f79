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

from ..catalog import load
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
