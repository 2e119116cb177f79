"""Hierarchy rollups: subtree aggregation over an N-ary key tree.

Bill-of-materials explosions, org charts, category trees and account
hierarchies all need "aggregate every node's full subtree" — the query
recursive CTEs answer on one machine. The distributed form used here
flattens each node to its ANCESTOR CHAIN (depth is log_B(n) — single
digits even at billions of keys) and runs ONE map-side-combined
aggregate keyed by ancestor: shuffle volume is rows × depth partials,
no iteration, no driver-side recursion, and the plan is identical at
any corpus size. The tree is derived from the part key (parent =
(k-1) div 10 — a 10-ary tree, root 0); production tables carry a real
parent column and the chain expression swaps for it unchanged.

Determinism: ancestor arithmetic is guarded integer division (the k=0
root case never touches negative operands, where Spark's `div` and
DuckDB's `//` disagree); subtree values are exact decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register

TREE_ARITY = 10
MAX_DEPTH = 7  # 10-ary: covers 10^7 keys; raise with the key domain


@register(
    "hierarchy_subtree_rollup",
    tags=("hierarchy", "aggregate", "rollup"),
    oracle=f"""
WITH c0 AS (
  SELECT p_partkey AS k, p_retailprice AS v, p_partkey AS a0 FROM part
),
{", ".join(
    f"c{i} AS (SELECT *, CASE WHEN a{i-1} = 0 THEN 0 "
    f"ELSE (a{i-1} - 1) // {TREE_ARITY} END AS a{i} FROM c{i-1})"
    for i in range(1, MAX_DEPTH + 1)
)},
chains AS (
  SELECT k, v,
         list_distinct([{", ".join(f"a{i}" for i in range(MAX_DEPTH + 1))}])
           AS anc
  FROM c{MAX_DEPTH}
),
contrib AS (SELECT unnest(anc) AS node, v FROM chains),
rolled AS (
  SELECT node, COUNT(*) AS subtree_n, {sql_dsum('v')} AS subtree_value
  FROM contrib GROUP BY node
),
depths AS (SELECT k AS node, len(anc) - 1 AS depth FROM chains)
SELECT r.node AS part_id, CAST(d.depth AS INTEGER) AS depth,
       CAST(r.subtree_n AS BIGINT) AS subtree_n, r.subtree_value
FROM rolled r JOIN depths d ON r.node = d.node
""",
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node FULL-SUBTREE aggregate (descendant count + total retail
    value, self included) over the 10-ary part-key tree, via
    ancestor-chain flattening: each part explodes to its ≤{MAX_DEPTH}+1
    distinct ancestors and one hash aggregate keyed by ancestor rolls
    everything up — the recursive-CTE answer without recursion.

    Scale: fan-out is the tree DEPTH (logarithmic — 7 covers ten
    million keys), so the single shuffle carries rows × depth partials
    with map-side combine; there is no per-level iteration, no
    driver loop, and deep-but-narrow subtree skew lands on distinct
    ancestor keys rather than one hot row. Swap the derived parent
    expression for a real parent column and nothing else changes."""
    p = spread(load(spark, sf_dir, "part")).select(
        F.col("p_partkey").alias("k"), F.col("p_retailprice").alias("v")
    )
    chain_cols = [F.col("k")]
    for _ in range(MAX_DEPTH):
        prev = chain_cols[-1]
        chain_cols.append(
            F.when(prev == 0, F.lit(0)).otherwise(
                F.floor((prev - 1) / TREE_ARITY).cast("bigint")
            )
        )
    chains = p.select(
        "k", "v", F.array_distinct(F.array(*chain_cols)).alias("anc")
    )
    contrib = chains.select(F.explode("anc").alias("node"), "v")
    rolled = contrib.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("subtree_n"),
        dsum("v").alias("subtree_value"),
    )
    depths = chains.select(
        F.col("k").alias("node"), (F.size("anc") - 1).cast("int").alias("depth")
    )
    return rolled.join(depths, "node").select(
        F.col("node").alias("part_id"), "depth", "subtree_n", "subtree_value"
    )
