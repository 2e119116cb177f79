"""Scan / project / filter / sort / limit / set-op families.

Generalizes the reference's O3 (projection, MainApp.java:41-42), O5
(IN-list filter, MainApp.java:45), O6+O7 (sort+limit top-k,
MainApp.java:45-46) and O12 (threshold routing, MainApp.java:56-63) to
the full operator families, per SURVEY.md §2.1.

Every filter/projection here is expressed declaratively so Catalyst
pushes predicates and prunes columns into the parquet scan — at 100 TB
these queries read only the referenced columns and skip row groups via
min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "scan_project_filter",
    bench=True,
    tags=("scan", "filter", "project"),
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_quantity BETWEEN 10 AND 40
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
""",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with compound pushdown-able predicates (IN + BETWEEN +
    range) and a computed projection. The whole WHERE reaches the scan as
    PushedFilters; only 7 of 11 columns are read (ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 40)
            & (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "2000-01-01")
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )


@register(
    "filter_like_null_routing",
    tags=("filter", "routing"),
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
            THEN 'high' ELSE 'low' END AS priority_class,
       o_orderstatus = 'F' AS is_finished
FROM orders
WHERE o_orderpriority NOT LIKE '%NOT SPECIFIED%'
  AND o_totalprice IS NOT NULL
""",
)
def filter_like_null_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / IS NOT NULL predicates + when/otherwise routing —
    the O12 conditional-projection family."""
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%")
    return (
        o.filter(
            ~F.col("o_orderpriority").like("%NOT SPECIFIED%")
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(high, "high").otherwise("low").alias("priority_class"),
            (F.col("o_orderstatus") == "F").alias("is_finished"),
        )
    )


@register(
    "sort_limit_topk",
    tags=("sort", "limit", "topk"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit fuses to TakeOrderedAndProject (no full
    sort materialization — each partition keeps k rows, driver merges).
    o_orderkey tiebreak keeps the result total-ordered/deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "distinct_values",
    tags=("distinct",),
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns (partial+final, one
    shuffle on the distinct key)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "set_union_distinct",
    tags=("setops",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) via union + distinct — nations having customers or
    suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_union_all",
    tags=("setops",),
    oracle="""
SELECT c_acctbal AS acctbal, 'customer' AS side FROM customer
UNION ALL
SELECT s_acctbal AS acctbal, 'supplier' AS side FROM supplier
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, no shuffle at all (partitions concatenate)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_acctbal").alias("acctbal"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    tags=("setops",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations with both customers and suppliers (plans as a
    left-semi hash join under the hood)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    tags=("setops",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations with customers but no suppliers (left-anti join).
    ``subtract`` is EXCEPT DISTINCT; ``exceptAll`` would keep leftover
    multiplicities and diverge from the SQL oracle."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "set_union_by_name",
    tags=("setops",),
    oracle="""
SELECT c_custkey AS entity_key, c_nationkey AS nationkey, c_acctbal AS acctbal,
       NULL AS s_suppkey
FROM customer
UNION ALL BY NAME
SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, s_suppkey
FROM supplier
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: ``unionByName(allowMissingColumns=True)``
    aligns columns by NAME and null-fills the gaps — the pattern for
    unioning heterogeneous batches (e.g. crawl snapshots whose schemas
    drifted) without positional bugs. Still a zero-shuffle bag union."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        "s_suppkey",
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "fn_unpivot",
    tags=("reshape",),
    oracle="""
SELECT l_orderkey, l_linenumber, metric, CAST(val AS DOUBLE) AS val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem)
UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))
""",
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide measures -> long key/value rows) — the inverse of
    agg_pivot. Plans as an Expand node: each input row fans out to one
    row per measure with NO shuffle, so at 100 TB it's a map-side
    reshape that streams straight into whatever aggregation follows."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )
