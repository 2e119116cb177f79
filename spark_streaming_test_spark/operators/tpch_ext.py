"""Extended TPC-H-style coverage adapted to the driver's reduced star
schema (no ``partsupp``; fewer columns — see FIXTURES.md). These queries
exist to exercise the optimizer shapes the base suite (tpch.py) doesn't:
subquery decorrelation (scalar + correlated), EXISTS/NOT EXISTS chains,
aggregate-of-aggregate, CASE-conditional aggregation, and OR-of-conjuncts
join predicates — each the idiomatic Catalyst formulation, each with a
DuckDB oracle.

Reference parity note: the reference app (rakrachok/spark-streaming-test)
contains one SQL query (`MainApp.java:44-46`); this module generalizes
its scan→filter→sort→limit pattern to the full analytical-join family per
SURVEY.md §2.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum
from ..registry import register

# Adapted thresholds tuned to the driver's synthetic data (seed 42):
# per-order sum(l_quantity) median ~96 / p90 ~180, so 250 selects the
# ~1% tail; "late" shipping (l_shipdate - o_orderdate) median ~36d /
# p90 ~1404d, so 365d splits meaningfully.
Q18_QTY_THRESHOLD = 250
LATE_DAYS = 365


@register(
    "tpch_q7_volume_shipping",
    tags=("tpch", "join"),
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.
    The OR-of-pairs predicate lands on the join output after both nation
    dims broadcast; lineitem⋈orders stays the only shuffled join."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    tags=("tpch", "join", "case-agg"),
    oracle=f"""
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")}
         / {sql_dsum('volume')} AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: a nation's share of PROMO-part revenue into ASIA
    customers by order year — conditional aggregation (CASE inside SUM)
    over a 7-way join; every dimension chain broadcasts."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(F.lit(0.0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            nation_volume.alias("nation_volume"),
        )
        .groupBy("o_year")
        .agg((dsum("nation_volume") / dsum("volume")).alias("mkt_share"))
    )


@register(
    "tpch_q9_product_profit",
    tags=("tpch", "join"),
    oracle=f"""
SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp ⇒ profit = discounted revenue):
    per supplier-nation per order-year profit on parts named '%red%'.
    LIKE filter prunes `part` before its broadcast."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


@register(
    "tpch_q13_customer_distribution",
    tags=("tpch", "outer-join", "agg-of-agg"),
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: priority filter instead of o_comment LIKE):
    order-count-per-customer histogram — left outer join with a join-side
    predicate, then aggregate-of-aggregate. COUNT(col) counts non-nulls,
    so customers with only urgent orders land in the 0 bucket."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    tags=("tpch", "case-agg"),
    oracle=f"""
SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
       / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts —
    CASE-conditional sum over a fact⋈broadcast-dim join, single row."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(rev.alias("rev"), promo.alias("promo_rev"))
        .agg((F.lit(100.0) * dsum("promo_rev") / dsum("rev")).alias("promo_revenue"))
    )


@register(
    "tpch_q15_top_supplier",
    tags=("tpch", "scalar-subquery"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — an
    uncorrelated scalar subquery (global max) against a grouped view.
    The max is broadcast as a 1-row cross join; the revenue equality is
    exact because both sides come from the same decimal sum."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    tags=("tpch", "correlated-subquery"),
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * ({sql_davg('l2.l_quantity')})
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the classic
    correlated scalar subquery (per-part 0.2·avg quantity), decorrelated
    the way Catalyst would: pre-aggregate per part, broadcast-join back,
    filter. The threshold is an IEEE product of a deterministic average,
    identical in both engines."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "tpch_q18_large_volume_customer",
    tags=("tpch", "having", "topk"),
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {sql_dsum('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > {Q18_QTY_THRESHOLD}
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity threshold
    — IN-subquery with HAVING, expressed as a grouped filter semi-joined
    back to the fact, then top-100 (o_orderkey tiebreak keeps the limit
    deterministic across engines)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sq"))
        .filter(F.col("sq") > Q18_QTY_THRESHOLD)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(big, li.l_orderkey == big.big_ok, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    tags=("tpch", "or-predicates"),
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: brand/size/quantity in place of the missing
    container/shipmode columns): OR-of-conjunct predicates spanning both
    join sides — Catalyst extracts the common p_partkey equi-key and
    keeps the OR as a join residual."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    tags=("tpch", "exists", "anti-join"),
    oracle=f"""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY s.s_name
""",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: "late" = shipped >365d after order date, the
    schema's stand-in for receipt>commit): suppliers who were the SOLE
    late shipper on a finished multi-supplier order. EXISTS becomes a
    left-semi join, NOT EXISTS a left-anti join, both with non-equi
    residuals (supplier inequality)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q2_min_cost_supplier",
    tags=("tpch", "correlated-subquery", "topk"),
    oracle="""
WITH cost AS (
  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
         MIN(l.l_extendedprice) AS supply_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1, 2
)
SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, c.supply_cost
FROM part p
JOIN cost c ON p.p_partkey = c.partkey
JOIN supplier s ON s.s_suppkey = c.suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_size BETWEEN 1 AND 25 AND p.p_type = 'PROMO'
  AND c.supply_cost = (
    SELECT MIN(c2.supply_cost) FROM cost c2 WHERE c2.partkey = p.p_partkey
  )
ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp ⇒ supply cost = MIN(l_extendedprice)
    observed per part×supplier in lineitem): the cheapest EUROPE supplier
    per PROMO part. The correlated MIN subquery decorrelates to a per-part
    pre-aggregate broadcast-joined back — same rewrite Catalyst applies to
    the SQL form. MIN of doubles is order-independent, so no decimal
    routing is needed (cf. MainApp.java:44-46 for the reference's only
    sort+limit query, generalized here to top-k over a join tree)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 25) & (F.col("p_type") == "PROMO")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    cost = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            "s_suppkey", "s_name", "s_acctbal", "nation",
        )
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    min_cost = cost.groupBy(F.col("partkey").alias("mc_pk")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cost.join(
            F.broadcast(min_cost),
            (F.col("partkey") == F.col("mc_pk"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "nation", "p_partkey", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q11_important_stock",
    tags=("tpch", "scalar-subquery", "having"),
    oracle=f"""
WITH natval AS (
  SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey AS ps_partkey, {sql_dsum('value')} AS part_value
FROM natval
GROUP BY l_partkey
HAVING {sql_dsum('value')} > (
  SELECT {sql_dsum('value')} * 0.001 FROM natval
)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: no partsupp ⇒ "stock value" = discounted
    revenue per part from NATION_3 suppliers): parts whose value exceeds
    a fraction of the nation's total — HAVING against an uncorrelated
    scalar subquery, evaluated as a 1-row broadcast. Both sides of the
    threshold comparison route through the same exact decimal sum, so the
    > comparison is bitwise-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natval = (
        li.join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"),
        )
    )
    per_part = natval.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dsum("value").alias("part_value")
    )
    threshold = natval.agg((dsum("value") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold), F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
    )


@register(
    "tpch_q12_shipping_priority_class",
    tags=("tpch", "case-agg"),
    oracle=f"""
SELECT l.l_returnflag AS ship_class,
       COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
""",
)
def tpch_q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: l_returnflag stands in for the missing
    l_shipmode; "late" = shipped >365d after order date): count of
    urgent/high- vs low-priority lines among 1997's late shipments, per
    class — CASE-conditional counting over a fact⋈fact join with a
    non-equi date residual."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_part_count",
    tags=("tpch", "distinct-agg", "not-in"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: lineitem as the part↔supplier bridge; the
    "customer complaints" exclusion becomes negative-balance suppliers):
    distinct supplier count per (brand, type, size) — NOT IN on a
    not-null key lowers to a left-anti join, then COUNT(DISTINCT) over
    the surviving bridge rows."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("bad_sk"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_supply",
    tags=("tpch", "nested-in", "semi-join"),
    oracle=f"""
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_1'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
      )
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING {sql_dsum('l.l_quantity')} > 50
  )
""",
)
def tpch_q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: "excess stock" = shipped >50 units of a red
    part in 1997): NATION_1 suppliers who heavily supplied any red part —
    the nested IN chain (part-name IN inside supplier IN) becomes two
    stacked semi-joins over a grouped HAVING filter."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    red = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        F.col("p_partkey").alias("red_pk")
    )
    heavy = (
        li.join(F.broadcast(red), li.l_partkey == F.col("red_pk"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 50)
        .select(F.col("l_suppkey").alias("heavy_sk"))
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == F.col("heavy_sk"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "tpch_q22_global_sales_opportunity",
    tags=("tpch", "anti-join", "scalar-subquery"),
    oracle=f"""
SELECT c.c_nationkey, COUNT(*) AS numcust, {sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {sql_davg('c2.c_acctbal')} FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
""",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: nationkey for the missing phone country code;
    "no urgent orders" for "no orders" since every synthetic customer
    has orders): above-average-balance customers with no urgent orders,
    per nation — uncorrelated scalar subquery (deterministic avg,
    broadcast as a 1-row join) + left-anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
