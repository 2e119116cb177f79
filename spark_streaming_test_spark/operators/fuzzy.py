"""Fuzzy string matching: noisy-probe → canonical-dictionary resolution.

Entity normalization against a controlled vocabulary (product names,
country lists, label taxonomies) is the string cousin of the
reference's limits-table lookup (``MainApp.java:32-36``): a big noisy
stream joined against a small authoritative dimension — except the
join predicate is edit distance, not equality.

Scale shape: the dictionary is SMALL by definition (a vocabulary), so
it broadcasts and the corpus streams through a broadcast nested-loop
join scored with ``levenshtein`` — zero shuffles on the big side
except the final per-probe top-1 window, which AQE plans over the
probe key. For dictionaries too big to broadcast, the same verify
step runs behind q-gram blocking instead (shared 3-gram candidates —
the ``dedup_ngram_jaccard`` inverted-index pattern); the broadcast
form is the right plan whenever the dictionary fits an executor.

Probes are manufactured deterministically from the dictionary itself
(one character deleted at a key-dependent position), so the operator
is self-evaluating: ``correct`` reports whether fuzzy matching
recovered the true source name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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

    The DISTINCT dictionary is tiny and explicitly broadcast; the probe
    stream never shuffles until the per-probe top-1 window. ``correct``
    makes recall measurable in-line (deleting one char keeps the true
    name at distance 1, so errors only occur between near-identical
    vocabulary entries)."""
    part = load(spark, sf_dir, "part")
    dict_df = part.select("p_name").distinct()
    probes = part.filter(F.col("p_partkey") % PROBE_MOD == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.col("p_name").alias("src_name"),
        F.concat(
            F.expr("substr(p_name, 1, (p_partkey % (length(p_name) - 2)) + 1)"),
            F.expr("substr(p_name, (p_partkey % (length(p_name) - 2)) + 3)"),
        ).alias("probe"),
    )
    scored = probes.crossJoin(
        F.broadcast(dict_df.withColumnRenamed("p_name", "cand"))
    ).withColumn("dist", F.levenshtein("probe", "cand"))
    w = Window.partitionBy("probe_id").orderBy("dist", "cand")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "probe_id",
            "probe",
            F.col("cand").alias("best_match"),
            F.col("dist").cast("int").alias("dist"),
            (F.col("cand") == F.col("src_name")).alias("correct"),
        )
    )
