"""Data-profiling operators: per-column statistics and deterministic
correlation — the audit stage a pipeline runs before training on a new
corpus drop.

``profile_table`` is the classic column-profile union; each per-column
aggregate is partial-aggregated (one scan, map-side combines) and the
union'd output is a handful of rows. ``agg_corr_manual`` shows why the
engine computes Pearson r from DECIMAL power sums instead of ``corr()``:
float accumulation order varies with partitioning, so built-in ``corr``
can differ in the last ulp between runs/engines — the decimal route is
bitwise reproducible anywhere (functions/deterministic.py rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


@register(
    "profile_table",
    tags=("profiling", "aggregation"),
    oracle="""
SELECT 'o_orderstatus' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
       COUNT(DISTINCT o_orderstatus) AS n_distinct,
       CAST(MIN(o_orderstatus) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderstatus) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
""",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: row/null/exact-distinct counts and
    min/max per column, one output row per column. Spark computes all
    three profiles from ONE cached scan; each distinct-count is its own
    expand+aggregate but they share the input. At 100 TB swap exact
    distinct for approx_count_distinct (same shape, no expand)."""
    o = load(spark, sf_dir, "orders").select(*_PROFILE_COLS).cache()
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            o.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            ).select(F.lit(c).alias("column_name"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_DEC = "decimal(28,4)"  # scale 4: true scale of 2-decimal products; scale 6 would push price^2*10^s past 2^53 where double->decimal rounding diverges between engines


def _dsumexpr(c: Column) -> Column:
    return F.sum(c.cast(_DEC)).cast("double")


def _sql_dsumexpr(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE)"


@register(
    "agg_corr_manual",
    tags=("aggregation", "statistics"),
    oracle=f"""
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {_sql_dsumexpr('l_quantity')} AS sx,
         {_sql_dsumexpr('l_extendedprice')} AS sy,
         {_sql_dsumexpr('l_quantity * l_quantity')} AS sxx,
         {_sql_dsumexpr('l_extendedprice * l_extendedprice')} AS syy,
         {_sql_dsumexpr('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 10)
         AS corr_qty_price
FROM sums
""",
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from decimal power sums (n, Σx, Σy, Σx², Σy², Σxy) — one
    partial-aggregated pass; the ratio arithmetic then happens on
    already-exact doubles, so the result is bitwise stable under any
    partitioning (built-in ``corr`` is not)."""
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dsumexpr(q).alias("sx"),
        _dsumexpr(p).alias("sy"),
        _dsumexpr(q * q).alias("sxx"),
        _dsumexpr(p * p).alias("syy"),
        _dsumexpr(q * p).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        # rounded to 10 dp: the decimal->double cast of a >2^53-scaled sum
        # can differ by 1 ulp between engines (two-step rounding in one,
        # correctly-rounded in the other); at |corr|<=1 that is ~1e-17 of
        # absolute error, which the round absorbs
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            10,
        ).alias("corr_qty_price"),
    )
