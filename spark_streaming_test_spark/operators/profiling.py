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

from ..catalog import load, spread
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


# --- foreign-key discovery ------------------------------------------------

FK_MIN_CONTAINMENT = 0.99  # candidate FK: nearly every value resolves


@register(
    "dq_fk_discovery",
    tags=("quality", "profiling", "metadata"),
    oracle=f"""
WITH pairs AS (
  SELECT 'orders.o_custkey->customer.c_custkey' AS pair,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_fk,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS n_hit,
         (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS pk_distinct,
         (SELECT COUNT(*) FROM customer) AS pk_rows
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders.o_orderkey',
         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders)),
         (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part)),
         (SELECT COUNT(DISTINCT p_partkey) FROM part),
         (SELECT COUNT(*) FROM part)
  UNION ALL
  SELECT 'supplier.s_nationkey->nation.n_nationkey',
         (SELECT COUNT(DISTINCT s_nationkey) FROM supplier),
         (SELECT COUNT(DISTINCT s_nationkey) FROM supplier
          WHERE s_nationkey IN (SELECT n_nationkey FROM nation)),
         (SELECT COUNT(DISTINCT n_nationkey) FROM nation),
         (SELECT COUNT(*) FROM nation)
  UNION ALL
  SELECT 'customer.c_custkey->part.p_partkey',
         (SELECT COUNT(DISTINCT c_custkey) FROM customer),
         (SELECT COUNT(DISTINCT c_custkey) FROM customer
          WHERE c_custkey IN (SELECT p_partkey FROM part)),
         (SELECT COUNT(DISTINCT p_partkey) FROM part),
         (SELECT COUNT(*) FROM part)
)
SELECT pair,
       CAST(n_fk AS BIGINT) AS n_fk_distinct,
       CAST(n_hit AS DOUBLE) / n_fk AS containment,
       pk_distinct = pk_rows AS pk_unique,
       (CAST(n_hit AS DOUBLE) / n_fk >= {FK_MIN_CONTAINMENT})
         AND pk_distinct = pk_rows AS is_fk_candidate
FROM pairs
""",
)
def dq_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY (the Sindy/metadata-crawler shape): for
    each candidate (column → key) pair, measure value containment and
    referencee uniqueness and flag candidates where ≥{FK_MIN_CONTAINMENT:.0%}
    of distinct values resolve against a unique key — how schema-less
    lakes recover joinability metadata nobody declared. Includes a
    deliberate negative pair (customer→part) the verdict must reject.

    Each pair costs one distinct + broadcast-key LEFT probe and one
    key-profile aggregate, all inside a single declarative union — no
    driver-side actions; the result frame is O(pairs). At lake scale the
    candidate pair list comes from column-profile sketches and the
    same per-pair plan runs unchanged."""

    def pair(name, fk_df, fk_col, pk_df, pk_col):
        """One candidate pair as a 1-row DataFrame — declarative, no
        driver-side counts: distinct FK values LEFT-join the broadcast
        key column, one aggregate emits containment counts, and the
        key side's uniqueness profile cross-joins on (1-row × 1-row)."""
        probe = (
            fk_df.select(F.col(fk_col).alias("fk"))
            .distinct()
            .join(
                F.broadcast(
                    pk_df.select(F.col(pk_col).alias("pk")).distinct()
                ),
                F.col("fk") == F.col("pk"),
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_fk"),
                F.count("pk").alias("n_hit"),
            )
        )
        pk_prof = pk_df.agg(
            F.count_distinct(F.col(pk_col)).alias("pk_distinct"),
            F.count(F.lit(1)).alias("pk_rows"),
        )
        return probe.crossJoin(F.broadcast(pk_prof)).select(
            F.lit(name).alias("pair"), "n_fk", "n_hit", "pk_distinct", "pk_rows"
        )

    # spread the fact-side scans (optimization r14, guide §2.5): the
    # single-file test layout fused each probe's distinct partials onto
    # one core.
    o = spread(load(spark, sf_dir, "orders"))
    c = load(spark, sf_dir, "customer")
    li = spread(load(spark, sf_dir, "lineitem"))
    p = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    frames = [
        pair("orders.o_custkey->customer.c_custkey", o, "o_custkey", c, "c_custkey"),
        pair("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey", o, "o_orderkey"),
        pair("lineitem.l_partkey->part.p_partkey", li, "l_partkey", p, "p_partkey"),
        pair("supplier.s_nationkey->nation.n_nationkey", su, "s_nationkey", na, "n_nationkey"),
        pair("customer.c_custkey->part.p_partkey", c, "c_custkey", p, "p_partkey"),
    ]
    res = frames[0]
    for f in frames[1:]:
        res = res.unionAll(f)
    containment = F.col("n_hit").cast("double") / F.col("n_fk")
    pk_unique = F.col("pk_distinct") == F.col("pk_rows")
    return res.select(
        "pair",
        F.col("n_fk").cast("bigint").alias("n_fk_distinct"),
        containment.alias("containment"),
        pk_unique.alias("pk_unique"),
        ((containment >= FK_MIN_CONTAINMENT) & pk_unique).alias(
            "is_fk_candidate"
        ),
    )


# --- functional-dependency discovery --------------------------------------

# Candidate FDs probed across the fixtures: a known-true dependency
# (nation's key determines its region), two plausibly-violated ones
# (does a customer always use one order priority? does a part always
# ship from one supplier?), and a cross-domain one on documents.
_FD_CANDIDATES = [
    ("nation.n_nationkey->n_regionkey", "nation", "n_nationkey", "n_regionkey"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("documents.doc_id->lang", "documents", "doc_id", "lang"),
]


def _sql_fd_one(fd: str, table: str, x: str, y: str) -> str:
    return f"""
SELECT '{fd}' AS fd,
       CAST(SUM(tot) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(SUM(best) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE) AS strength
FROM (
  SELECT x, SUM(cnt) AS tot, MAX(cnt) AS best, COUNT(*) AS ny
  FROM (
    SELECT CAST({x} AS VARCHAR) AS x, CAST({y} AS VARCHAR) AS y,
           COUNT(*) AS cnt
    FROM {table} GROUP BY 1, 2
  ) pairs
  GROUP BY x
) keys"""


@register(
    "dq_fd_discovery",
    tags=("dq", "profiling", "discovery"),
    oracle="\nUNION ALL\n".join(
        _sql_fd_one(fd, t, x, y) for fd, t, x, y in _FD_CANDIDATES
    ),
)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate FUNCTIONAL-DEPENDENCY discovery (the schema-
    understanding pass beside `dq_fk_discovery`'s joinability probe):
    for each candidate X→Y, strength = the fraction of rows consistent
    with the best single mapping (Σ_x max_y count / N — the g₃-error
    complement). strength = 1.0 certifies the dependency holds exactly;
    n_violating_keys names how many keys break it.

    Per candidate: one (X, Y) count aggregate, one X-grain reduce —
    both map-side-combined, shuffles bounded by distinct pairs. All
    integers to one final division."""
    frames = []
    for fd, table, x, y in _FD_CANDIDATES:
        t = load(spark, sf_dir, table)
        pairs = t.groupBy(
            F.col(x).cast("string").alias("x"),
            F.col(y).cast("string").alias("y"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        keys = pairs.groupBy("x").agg(
            F.sum("cnt").alias("tot"),
            F.max("cnt").alias("best"),
            F.count(F.lit(1)).alias("ny"),
        )
        frames.append(
            keys.agg(
                F.lit(fd).alias("fd"),
                F.sum("tot").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("ny") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_keys"),
                (
                    F.sum("best").cast("double") / F.sum("tot").cast("double")
                ).alias("strength"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out
