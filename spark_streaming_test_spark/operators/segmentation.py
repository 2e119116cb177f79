"""Customer segmentation and multi-objective frontier operators.

RFM (recency / frequency / monetary) quintile scoring is the classic
behavioral segmentation pass — the batch analogue of the reference's
threshold routing (SURVEY.md §2 O12: compare a measured value against
a derived bound and label the row), generalized from one threshold to
data-driven quantile bounds.

The Pareto frontier (skyline) query shows the decomposition pattern
for non-SQL-native operators: a 2-D skyline reduces to a per-key
partial aggregate (scalable, map-side combined) followed by a running
max over the tiny aggregated frame — the same
"aggregate-then-window-on-small" shape as agg_rollup_hierarchical_time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

N_TILES = 5
MONEY_DP = 2


@register(
    "rfm_segmentation",
    tags=("behavior", "segmentation", "window"),
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey AS custkey,
         MAX(o_orderdate) AS recency,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders
  GROUP BY o_custkey
),
scored AS (
  SELECT custkey, monetary,
         NTILE({N_TILES}) OVER (ORDER BY recency, custkey)   AS r_score,
         NTILE({N_TILES}) OVER (ORDER BY frequency, custkey) AS f_score,
         NTILE({N_TILES}) OVER (ORDER BY monetary, custkey)  AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(monetary) AS DECIMAL(18,2)) AS DOUBLE) AS total_monetary
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: per-customer recency/frequency/
    monetary from one pass over orders, quintile scores by NTILE with
    a fully deterministic order (metric, custkey), segment cells
    aggregated back to counts. Score 5 = most recent / most frequent /
    highest spend. Monetary sums run in DECIMAL(18,2) — associative,
    so Spark and the oracle agree bitwise under any partitioning; the
    exported total is that exact decimal cast to DOUBLE (both engines),
    the repo-wide deterministic-money convention, because decimal
    OUTPUT columns canonicalize engine-dependently downstream (Python
    Decimal vs float64) while a correctly-rounded double is identical.

    Scale note: the three quintile scores run on the per-CUSTOMER
    frame (orders of magnitude smaller than the fact table) and are
    computed DISTRIBUTED via ``distributed_ntile`` (two-pass exact
    rank — range partitions, local row numbers, broadcast offsets),
    so even at 10^9 customers no single task sorts the frame; the
    output is bitwise the single-task NTILE because each
    (metric, custkey) order is total. The cheaper approximate swap
    (approx_percentile cut points, map-only) remains available when
    exact equal-size buckets aren't required."""
    rfm = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
    )
    from .evalmetrics import distributed_ntile

    scored = rfm
    for metric, score in (
        ("recency", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        scored = distributed_ntile(
            scored, N_TILES, [metric, "custkey"]
        ).withColumnRenamed("tile", score)
    return (
        scored.select("monetary", "r_score", "f_score", "m_score")
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monetary")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "pareto_frontier",
    tags=("segmentation", "skyline", "window"),
    oracle="""
SELECT DISTINCT p_size, p_retailprice AS frontier_price
FROM part t
WHERE NOT EXISTS (
  SELECT 1 FROM part u
  WHERE u.p_size <= t.p_size AND u.p_retailprice >= t.p_retailprice
    AND (u.p_size < t.p_size OR u.p_retailprice > t.p_retailprice)
)
ORDER BY p_size
""",
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier over parts: minimize p_size, maximize
    p_retailprice — the points no other part dominates. Computed as
    max(price) per size (a partial-aggregated groupBy that bounds
    everything downstream at O(|size domain|) rows) then a strict
    running-max filter ordered by size. The oracle proves the same set
    through an INDEPENDENT formulation (NOT EXISTS domination
    anti-join), so a bug in either algorithm breaks the hash match.
    At 100 TB the groupBy is the only corpus-sized step; the window
    runs on the size-domain frame (dozens of rows)."""
    best = (
        load(spark, sf_dir, "part")
        .groupBy("p_size")
        .agg(F.max("p_retailprice").alias("frontier_price"))
    )
    prev_max = F.max("frontier_price").over(
        Window.orderBy("p_size").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    return (
        best.withColumn("prev_max", prev_max)
        .filter(
            F.col("prev_max").isNull()
            | (F.col("frontier_price") > F.col("prev_max"))
        )
        .select("p_size", "frontier_price")
        .orderBy("p_size")
    )
