"""Iterative graph analytics: PageRank over a derived bipartite graph.

Training-corpus curation uses link analysis for source-quality priors
(rank web domains before sampling them) and the same message-passing
shape powers label propagation and the connected-components pass in
``llm/dedup.py``. The graph here derives from the TPC-H-ish fixtures:
customers and suppliers are nodes, an (undirected) edge exists where a
customer's order contains a supplier's line item.

PageRank is the canonical *iterative* DataFrame workload. The loop is
driver-side Python but every iteration is one declarative
join-aggregate: ranks live in a node-keyed frame, contributions flow
along edges, partial aggregation bounds the shuffle at O(edges) with
map-side combine. The iteration count is a fixed hyperparameter, so
plan depth is bounded; production loops checkpoint every ~5 iterations
to truncate lineage (`localCheckpoint`), as ``dedup_cluster_canonical``
does.

Determinism across engines: the entire iteration runs in FIXED-POINT
int64 (1e-12 units, integer division) — integer arithmetic is
associative and has no rounding mode, so Spark and the oracle agree
bitwise regardless of partitioning (float formulations diverged by
1 ulp; see the function docstring). Because the iteration count is
FIXED, the "iterative" algorithm is expressible as a finite SQL
unrolling — which is what makes a full value-hash oracle possible
where a data-dependent fixpoint would be rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio
PR_ITERS = 3
FP_ONE = 10**12  # fixed-point unit: ranks are int64 multiples of 1e-12

_SQL_EDGES = """
pairs AS (
  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT 'c:' || CAST(ck AS VARCHAR) AS src, 's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
  UNION ALL
  SELECT 's:' || CAST(sk AS VARCHAR) AS src, 'c:' || CAST(ck AS VARCHAR) AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)
"""


# Teleport mass per node in fixed-point units: (1 - d) * FP_ONE.
_TELEPORT_FP = (DAMP_DEN - DAMP_NUM) * FP_ONE // DAMP_DEN


def _sql_pr_iter(prev: str, out: str) -> str:
    """One unrolled PageRank iteration as a CTE (integer arithmetic)."""
    return f"""
{out} AS (
  SELECT e.dst AS node,
         CAST({_TELEPORT_FP} + ({DAMP_NUM} * SUM(r.r // d.outdeg))
              // {DAMP_DEN} AS BIGINT) AS r
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""


_SQL_ITERS = ",".join(
    _sql_pr_iter(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS)
)


@register(
    "graph_pagerank",
    tags=("graph", "iterative"),
    oracle=f"""
WITH {_SQL_EDGES},
r0 AS (SELECT src AS node, CAST({FP_ONE} AS BIGINT) AS r FROM deg),
{_SQL_ITERS}
SELECT r{PR_ITERS}.node AS node_id,
       CAST(r{PR_ITERS}.r AS DOUBLE) / {FP_ONE}.0 AS rank,
       CAST(deg.outdeg AS BIGINT) AS degree
FROM r{PR_ITERS} JOIN deg ON r{PR_ITERS}.node = deg.src
""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITERS} PageRank iterations (damping {DAMP_NUM}/{DAMP_DEN})
    over the customer<->supplier co-occurrence graph; ranks use the
    sum-to-N convention (r0 = 1.0). Undirected doubling means every
    node has outdegree >= 1, so there is no dangling mass to
    redistribute.

    Arithmetic is FIXED-POINT int64 (1e-12 units, integer division):
    float PageRank diverged between engines by 1 ulp at the 10th dp —
    first in the double `0.15 + 0.85*sum` rounding, then, after moving
    that to decimal, in the double->decimal conversion of the per-edge
    contribution. Integer ops have no rounding modes to disagree on;
    truncation drops <= outdeg * 1e-12 mass per node per iteration
    (immaterial, deterministic, and identical on both engines). The
    final rank converts exactly (< 2^53) to double for display.

    Plan per iteration: edges JOIN ranks (node-keyed — both sides hash
    on src, and AQE reuses the static edge exchange across iterations)
    -> contribution projection -> hash agg on dst with map-side partial
    combine, so each iteration shuffles O(nodes) partials, not O(edges)
    rows. The edge list itself derives from one orders-lineitem join,
    computed once and reused."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    edges = (
        pairs.select(c.alias("src"), s.alias("dst"))
        .unionAll(pairs.select(s.alias("src"), c.alias("dst")))
        # The edge list is reused 2x per iteration x N iterations;
        # persist so the orders-lineitem join runs once.
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(FP_ONE).cast("bigint").alias("r")
    )
    for _ in range(PR_ITERS):
        # `div` is int64 floor division (positive operands) — the same
        # operator as DuckDB's `//`; no float enters the loop.
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div outdeg").alias("w"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(_TELEPORT_FP).cast("bigint")
                + F.expr(f"({DAMP_NUM} * sum(w)) div {DAMP_DEN}")
            ).alias("r")
        )
    return (
        ranks.join(deg, ranks.node == deg.src)
        .select(
            F.col("node").alias("node_id"),
            (F.col("r").cast("double") / F.lit(float(FP_ONE))).alias("rank"),
            F.col("outdeg").alias("degree"),
        )
    )
