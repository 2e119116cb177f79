"""Grouped-aggregation family — O11 (reduceByKey, MainApp.java:54-55)
generalized: multi-aggregate groupBy, distinct counts, rollup/cube/
grouping sets, pivot, ordered collect.

Scale notes: every groupBy here is a HashAggregate with map-side partial
aggregation before the single shuffle on the group key — the distributed
equivalent of the reference's ``reduceByKey`` combine. ``count_distinct``
plans as a two-phase expand+agg; ``approx_count_distinct`` (HLL) is the
100 TB path and is O(1) memory per group. Float sums go through the
decimal-cast determinism helpers (functions/deterministic.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum
from ..registry import register


@register(
    "agg_sum_by_key",
    bench=True,
    tags=("agg",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_davg('l_discount')} AS avg_disc,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate hash aggregation by a composite key."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        davg("l_discount").alias("avg_disc"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_count_distinct",
    tags=("agg", "distinct"),
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expand + two-phase agg)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_count_distinct",
    tags=("agg", "approx"),
    # The HLL estimate itself is engine-specific, so the oracle checks
    # the CLAIM instead: the estimate must land within the configured
    # relative error (5% >> the 2% rsd setting) of the exact count,
    # which DuckDB can verify as (exact_count, TRUE) per group.
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the O(1)-memory scale path for
    100 TB cardinality estimation. Returns the exact count plus a
    within-tolerance flag so the estimate's accuracy is oracle-checkable
    even though the raw estimate is implementation-defined."""
    li = load(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_orderkey", 0.02)
    exact = F.countDistinct("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_orders"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("within_tol"),
    )


@register(
    "agg_rollup",
    tags=("agg", "rollup"),
    oracle=f"""
SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals (flag, flag+status, grand total)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_cube",
    tags=("agg", "cube"),
    oracle=f"""
SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty")
    )


@register(
    "agg_grouping_sets",
    tags=("agg", "grouping-sets"),
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst Expand node
    as rollup/cube)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_pivot",
    tags=("agg", "pivot"),
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra distinct-scan job);
    the oracle is the equivalent conditional aggregation."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@register(
    "agg_collect_sorted",
    tags=("agg", "collect"),
    oracle="""
SELECT o_custkey,
       COALESCE(string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey), '')
         AS orderkeys
FROM orders
WHERE o_orderstatus = 'P'
GROUP BY o_custkey
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered in a distributed agg — sort_array makes
    it deterministic. The sorted list is serialized to a comma-joined
    string: the driver's pandas canonicalizer cannot hash list cells
    (round-1 crash), so array results travel as strings."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey")).cast("array<string>")
            ).alias("orderkeys")
        )
    )


@register(
    "agg_stats_moments",
    tags=("agg", "stats"),
    oracle=f"""
SELECT event_type,
       {sql_dsum('value')} AS sum_value,
       {sql_davg('value')} AS avg_value,
       ({sql_dsum('value * value')} / CAST(COUNT(value) AS DOUBLE)
        - {sql_davg('value')} * {sql_davg('value')}) AS var_pop_value
FROM events
GROUP BY event_type
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance from deterministic first/second moments
    (E[x²]−E[x]²) — built-in var_pop is a streaming one-pass algorithm
    whose float order differs by engine, so moments are the
    cross-engine-stable formulation."""
    ev = load(spark, sf_dir, "events")
    sum_v = dsum("value")
    avg_v = davg("value")
    sum_sq = dsum(F.col("value") * F.col("value"))
    cnt = F.count("value").cast("double")
    return ev.groupBy("event_type").agg(
        sum_v.alias("sum_value"),
        avg_v.alias("avg_value"),
        (sum_sq / cnt - avg_v * avg_v).alias("var_pop_value"),
    )


@register(
    "agg_percentile_median",
    tags=("agg", "percentile"),
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 10) AS qty_p25,
       round(median(l_quantity), 10) AS qty_median,
       round(quantile_cont(l_quantity, 0.75), 10) AS qty_p75,
       round(quantile_cont(l_extendedprice, 0.9), 10) AS price_p90
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group.

    ``F.percentile`` is the exact (sort-based) aggregate — same
    linear-interpolation semantics as DuckDB's ``quantile_cont``.
    Outputs are rounded to 10 dp on both sides (like agg_corr_manual)
    because the interpolation formula can differ in the last ulp
    between engines. At 100 TB the drop-in scale path is
    ``approx_percentile`` (KLL/GK sketch, bounded memory, mergeable
    across partitions); exact percentile shuffles every value of the
    group to one reducer.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 10).alias("qty_p25"),
        F.round(F.median("l_quantity"), 10).alias("qty_median"),
        F.round(F.percentile("l_quantity", 0.75), 10).alias("qty_p75"),
        F.round(F.percentile("l_extendedprice", 0.9), 10).alias("price_p90"),
    )


@register(
    "agg_argminmax_condcount",
    tags=("agg", "argminmax"),
    oracle="""
SELECT event_type,
       max_by(value, event_id) AS latest_value,
       min_by(value, event_id) AS earliest_value,
       CAST(count_if(value > 50.0) AS BIGINT) AS n_high,
       bool_or(value > 99.0) AS any_extreme,
       bool_and(value >= 0.0) AS all_nonneg
FROM events
GROUP BY event_type
""",
)
def agg_argminmax_condcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax (min_by/max_by over the unique event_id ordering —
    unique key makes the result deterministic) plus conditional count
    and boolean aggregates. All single-pass hash aggregates with
    map-side partial combine."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("value", "event_id").alias("latest_value"),
        F.min_by("value", "event_id").alias("earliest_value"),
        F.count_if(F.col("value") > 50.0).alias("n_high"),
        F.bool_or(F.col("value") > 99.0).alias("any_extreme"),
        F.bool_and(F.col("value") >= 0.0).alias("all_nonneg"),
    )


@register(
    "agg_rollup_hierarchical_time",
    tags=("agg", "rollup", "time"),
    oracle="""
WITH minute_agg AS (
  SELECT date_trunc('minute', ts) AS minute_ts, event_type,
         SUM(CAST(value AS DECIMAL(25,6))) AS v, COUNT(*) AS n
  FROM events
  GROUP BY 1, 2
)
SELECT date_trunc('hour', minute_ts) AS hour_ts, event_type,
       CAST(SUM(v) AS DOUBLE) AS total_value,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_minutes
FROM minute_agg
GROUP BY 1, 2
""",
)
def agg_rollup_hierarchical_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the continuous-aggregate / hypertable
    pattern): aggregate raw events to minute grain once, then derive the
    hour grain FROM THE MINUTE PARTIALS — never rescanning raw data.

    At 100 TB the minute layer is a materialized table ~1000x smaller
    than the events it summarizes; every coarser grain (hour/day/month)
    is an agg over partials. Sums stay in exact decimal between the two
    levels, so the re-aggregation is bit-identical to a direct
    hour-grain aggregate — which is what makes serving coarse grains
    from partials safe. ``n_active_minutes`` (count of non-empty minute
    buckets) is only expressible from the fine grain."""
    ev = load(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute_ts"), "event_type"
    ).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    return minute.groupBy(
        F.date_trunc("hour", "minute_ts").alias("hour_ts"), "event_type"
    ).agg(
        F.sum("v").cast("double").alias("total_value"),
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_minutes"),
    )


@register(
    "agg_bitwise",
    tags=("agg", "bitwise"),
    oracle="""
SELECT event_type,
       bit_and(user_id) AS all_bits,
       bit_or(user_id) AS any_bits,
       bit_xor(user_id) AS parity_bits
FROM events
GROUP BY event_type
""",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR over the group) — exact integer
    ops, single-pass hash agg with partial combine (bitwise ops are
    associative+commutative, so map-side partials are lossless)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("all_bits"),
        F.bit_or("user_id").alias("any_bits"),
        F.bit_xor("user_id").alias("parity_bits"),
    )


@register(
    "agg_hll_sketch_rollup",
    tags=("aggregation", "sketch", "approx"),
    # The sketch estimate is engine-specific, so the oracle checks the
    # CLAIM: the merged-sketch estimate per region must be within 5% of
    # the exact distinct customer count (DuckDB verifies exact counts +
    # an always-true flag).
    oracle="""
SELECT n_regionkey,
       COUNT(DISTINCT n_nationkey) AS n_nations,
       COUNT(DISTINCT c_custkey) AS exact_customers,
       TRUE AS within_tol
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
""",
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE pattern for distinct counting at
    100 TB: build one HyperLogLog sketch per fine-grained group
    (nation), then roll up to coarse groups (region) by MERGING the
    sketches (``hll_union_agg``) instead of rescanning the fact table.
    Partial aggregation means each executor ships one ~KB sketch per
    group, not its raw keys; the nation-level sketch table can be
    persisted and re-merged into any coarser grouping for free.

    Returns the exact region-level count plus a within-5%-tolerance
    flag for the merged-sketch estimate, so the rollup's accuracy is
    oracle-checkable even though raw sketch bytes are engine-specific.

    Generalizes the reference's sum-by-key aggregate (MainApp.java:54-55)
    to the approximate-distinct family."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    per_nation = joined.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
        F.countDistinct("c_custkey").alias("exact_nation_customers"),
    )
    approx = F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("double")
    exact = F.sum("exact_nation_customers")  # custkeys are disjoint across nations
    return per_nation.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        exact.alias("exact_customers"),
        (F.abs(approx - exact.cast("double")) <= 0.05 * exact.cast("double")).alias(
            "within_tol"
        ),
    )


@register(
    "agg_approx_percentile_check",
    tags=("agg", "approx", "percentile"),
    # Like agg_approx_count_distinct: the t-digest/GK estimate itself is
    # engine-specific, so the oracle verifies the CLAIM — the approx
    # median must land between the exact 45th and 55th percentiles
    # (rank-error bound of approx_percentile at accuracy 1000 is far
    # tighter than +-5 percentile points).
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS exact_p50,
       TRUE AS within_tol
FROM events
GROUP BY event_type
""",
)
def agg_approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile — the O(1)-memory quantile sketch for
    100 TB (exact percentile needs a full sort or all values in memory
    per group; the sketch is a bounded-size mergeable summary, exactly
    the map-side-combine shape). Returns the exact median (rounded:
    interpolation may differ in the last ulp across engines) plus a
    rank-tolerance flag making the estimate's accuracy oracle-checkable."""
    ev = load(spark, sf_dir, "events")
    approx = F.percentile_approx("value", 0.5, 1000)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("exact_p50"),
        approx.between(
            F.percentile("value", 0.45), F.percentile("value", 0.55)
        ).alias("within_tol"),
    )


HH_SUPPORT = 0.004  # heavy-hitter threshold as a fraction of all tokens


@register(
    "agg_heavy_hitters_claim",
    tags=("aggregates", "approx", "claim-oracle"),
    oracle=f"""
WITH tok AS (
  SELECT token FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents
  ) WHERE token <> ''
),
n AS (SELECT COUNT(*) AS total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count, TRUE AS found
FROM tok CROSS JOIN n
GROUP BY token, n.total
HAVING COUNT(*) > {HH_SUPPORT} * n.total
""",
)
def agg_heavy_hitters_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark's one-pass streaming summary
    (``df.stat.freqItems`` — Karp/Shenker/Papadimitriou), verified as a
    CLAIM: the sketch guarantees a superset of every token with
    frequency > support x N, so each true heavy hitter (exact count
    from a word-count aggregate) is emitted with ``found`` = membership
    in the sketch set. The oracle emits TRUE rows — any sketch miss
    hash-mismatches. Same oracle pattern as agg_approx_count_distinct.

    The sketch side is one map-side-combinable pass with an O(1/support)
    state bound per partition; the exact side is the word-count shape.
    The sketch result set itself may vary with partitioning — the
    CLAIM (superset of true heavy hitters) is the partition-invariant
    guarantee, which is exactly what this query checks."""
    from ..catalog import spread

    toks = (
        spread(load(spark, sf_dir, "documents"))
        .select(
            F.explode_outer(
                F.split(F.lower("text"), "[^a-z]+")
            ).alias("token")
        )
        .filter(F.col("token").isNotNull() & (F.col("token") != ""))
    )
    sketch_set = set(
        toks.stat.freqItems(["token"], HH_SUPPORT).collect()[0][0]
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    total = toks.count()
    return (
        counts.filter(F.col("exact_count") > HH_SUPPORT * total)
        .select(
            "token",
            "exact_count",
            F.col("token").isin(*sorted(sketch_set)).alias("found"),
        )
    )


@register(
    "agg_bitmap_distinct",
    tags=("aggregates", "bitmap", "distinct"),
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event type computed via Spark 4's
    bitmap aggregates instead of COUNT(DISTINCT): ids map to (bucket,
    bit position), per-bucket bitmaps OR-combine with map-side partial
    aggregation, and popcounts sum per group.

    Why it matters at 100 TB: COUNT(DISTINCT) shuffles every distinct
    (group, id) pair; the bitmap plan shuffles one <= 4 KB bitmap per
    (group, bucket) regardless of how many ids fall in the bucket —
    for dense id spaces that is orders of magnitude less traffic, while
    staying EXACT (the oracle is plain COUNT(DISTINCT); values match
    bitwise). The same bitmaps are mergeable rollup state, like the HLL
    sketches of agg_hll_sketch_rollup but lossless."""
    e = load(spark, sf_dir, "events")
    per_bucket = (
        e.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("bm")
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
    )


# --- count-min sketch -----------------------------------------------------

CM_DEPTH = 4     # independent hash rows
CM_WIDTH = 256   # buckets per row


@register(
    "agg_countmin_claim",
    tags=("aggregation", "sketch", "claim"),
    oracle="""
SELECT user_id, COUNT(*) AS n_exact, TRUE AS cm_overestimates
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def agg_countmin_claim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, verified as a CLAIM (the
    agg_heavy_hitters_claim pattern): the sketch's `est(x) =
    min_i sketch[i][h_i(x)]` can only OVER-estimate — counters only
    ever absorb additions — so the oracle pins the exact counts and
    asserts the overestimate invariant held for every key. The DuckDB
    engine cannot reproduce Spark's xxhash64, which is exactly why the
    sketch ships as a claim rather than a value hash.

    Scale design: the sketch build is ONE pass with map-side partial
    aggregation onto depth x width (4x256) keys — the shuffle is
    bounded by the sketch size per partition, NOT the input; this is
    what makes count-min the streaming/distributed-merge choice (sum
    sketches cell-wise to merge). The probe side broadcasts the
    1024-cell sketch onto the per-key frame."""
    ev = load(spark, sf_dir, "events")
    buckets = F.array(
        *[
            F.pmod(F.xxhash64(F.col("user_id"), F.lit(i)), F.lit(CM_WIDTH))
            for i in range(CM_DEPTH)
        ]
    )
    sketch = (
        ev.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = (
        exact.select("user_id", F.posexplode(buckets).alias("row_i", "bucket"))
        .join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_est"))
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "n_exact",
            (F.col("cm_est") >= F.col("n_exact")).alias("cm_overestimates"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_grouping_id",
    tags=("agg", "rollup", "grouping-id"),
    oracle="""
SELECT coalesce(o_orderstatus, '<all>') AS status,
       coalesce(o_orderpriority, '<all>') AS priority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over a ROLLUP — the disambiguator
    that lets consumers tell a real NULL group from a subtotal row
    (every BI layer on top of rollups needs it). Same single Expand +
    partial-agg plan as agg_rollup; the indicators are free metadata
    from the Expand node, not extra computation."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "priority"
            ),
            "g_status",
            "g_priority",
            "n",
        )
        .orderBy("status", "priority")
    )


@register(
    "agg_weighted_avg",
    tags=("agg", "weighted"),
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,4)))
                 AS DOUBLE)
            / CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
            AS DOUBLE) AS qty_weighted_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
         AS total_weight
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean (sum(w*x)/sum(w)) — the aggregation every mixture
    metric and weighted-sampling audit needs, with both sums in
    decimal (products of 2-decimal columns are exact at scale 4, per
    the determinism strategy) so the ratio is one IEEE division of
    identical doubles on any engine or partitioning."""
    li = load(spark, sf_dir, "lineitem")
    wsum = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(25,4)")
    )
    w = F.sum(F.col("l_quantity").cast("decimal(25,2)"))
    return li.groupBy("l_returnflag").agg(
        (wsum.cast("double") / w.cast("double")).alias("qty_weighted_price"),
        # exact decimal sum exported as double: decimal OUTPUT columns
        # canonicalize engine-dependently downstream (Decimal vs float64)
        w.cast("double").alias("total_weight"),
    )


OVERLAP_TOL = 0.15  # inclusion-exclusion compounds three sketch errors


@register(
    "agg_audience_overlap_estimate",
    tags=("agg", "approx", "sketch", "audience"),
    # Claim oracle (the approx_count_distinct pattern): the estimate is
    # engine-specific, so DuckDB verifies the exact overlaps and the
    # within-tolerance flags the Spark side must have produced.
    oracle=f"""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'click∩purchase' AS pair,
       (SELECT COUNT(*) FROM a) AS exact_a,
       (SELECT COUNT(*) FROM b) AS exact_b,
       (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_overlap,
       TRUE AS within_tol
""",
)
def agg_audience_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation by HLL inclusion-exclusion:
    |A∩B| ≈ |A| + |B| − |A∪B| from three sketch estimates — how
    ad/audience systems answer overlap questions across billions of
    ids WITHOUT materializing either set or shuffling ids into a join.
    The claim column asserts the estimate within {OVERLAP_TOL:.0%} of
    the exact join-counted overlap (three compounded 2%-rsd sketches).

    Scale: each estimate is one O(1)-memory pass (HLL registers merge
    map-side); the exact join exists here only to GRADE the estimate —
    production computes the sketch side alone. At higher precision
    needs the same query swaps to theta sketches; shape unchanged."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    u = ev.filter(F.col("event_type").isin("click", "purchase"))
    est_a = a.agg(
        F.approx_count_distinct("user_id", 0.02).alias("e")
    ).first()["e"]
    est_b = b.agg(
        F.approx_count_distinct("user_id", 0.02).alias("e")
    ).first()["e"]
    est_u = u.agg(
        F.approx_count_distinct("user_id", 0.02).alias("e")
    ).first()["e"]
    est_overlap = est_a + est_b - est_u
    exact = (
        a.select("user_id")
        .distinct()
        .join(b.select("user_id").distinct(), "user_id")
        .count()
    )
    exact_a = a.select("user_id").distinct().count()
    exact_b = b.select("user_id").distinct().count()
    within = abs(est_overlap - exact) <= OVERLAP_TOL * max(exact, 1)
    return spark.createDataFrame(
        [("click∩purchase", exact_a, exact_b, exact, bool(within))],
        "pair string, exact_a long, exact_b long, exact_overlap long, within_tol boolean",
    )


# --- higher central moments: skewness / kurtosis --------------------------

MOM_DP = 6  # centered powers are generic (mean is a non-terminating
            # rational) — round then decimal-sum, the corr/KM rule


@register(
    "agg_skew_kurtosis",
    tags=("agg", "statistics", "moments"),
    oracle=f"""
WITH mu AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS m
  FROM events GROUP BY event_type
),
centered AS (
  SELECT e.event_type, mu.n, mu.m,
         CAST(round((e.value - mu.m) * (e.value - mu.m), {MOM_DP})
              AS DECIMAL(30,{MOM_DP})) AS d2,
         CAST(round((e.value - mu.m) * (e.value - mu.m) * (e.value - mu.m),
                    {MOM_DP}) AS DECIMAL(30,{MOM_DP})) AS d3,
         CAST(round((e.value - mu.m) * (e.value - mu.m) * (e.value - mu.m)
                    * (e.value - mu.m), {MOM_DP})
              AS DECIMAL(30,{MOM_DP})) AS d4
  FROM events e JOIN mu ON e.event_type = mu.event_type
),
moments AS (
  SELECT event_type, MAX(n) AS n, MAX(m) AS mean,
         CAST(SUM(d2) AS DOUBLE) / MAX(n) AS m2,
         CAST(SUM(d3) AS DOUBLE) / MAX(n) AS m3,
         CAST(SUM(d4) AS DOUBLE) / MAX(n) AS m4
  FROM centered GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n, mean, m2,
       round(m3 / (m2 * sqrt(m2)), 8) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 8) AS excess_kurtosis
FROM moments
""",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per stream — the
    distribution-shape diagnostics (heavy tails break z-score
    thresholds; skew breaks symmetric CIs) that extend the
    mean/variance profile of ``agg_stats_moments``.

    Two passes: group means (exact decimal sums), then centered powers
    — each (v−μ)^k is a GENERIC double (μ is a non-terminating
    rational, so rounding ties are measure-zero) rounded at {MOM_DP}
    dp and decimal-summed, making the central moments order-invariant
    and bitwise cross-engine; the final shape ratios round generically
    at 8 dp (the wide decimal sums can cast to double an ulp apart
    between engines past 2^53 — see verify notes). Built-in skewness()/kurtosis() use
    streaming update order and cannot guarantee that. The group-mean
    frame is tiny and broadcasts."""
    ev = load(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(25,6)")).cast("double") /
         F.count(F.lit(1))).alias("m"),
    )
    d = F.col("value") - F.col("m")
    dec = f"decimal(30,{MOM_DP})"
    centered = ev.join(F.broadcast(mu), "event_type").select(
        "event_type",
        "n",
        "m",
        F.round(d * d, MOM_DP).cast(dec).alias("d2"),
        F.round(d * d * d, MOM_DP).cast(dec).alias("d3"),
        F.round(d * d * d * d, MOM_DP).cast(dec).alias("d4"),
    )
    moments = centered.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("m").alias("mean"),
        (F.sum("d2").cast("double") / F.max("n")).alias("m2"),
        (F.sum("d3").cast("double") / F.max("n")).alias("m3"),
        (F.sum("d4").cast("double") / F.max("n")).alias("m4"),
    )
    m2 = F.col("m2")
    return moments.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "mean",
        "m2",
        F.round(F.col("m3") / (m2 * F.sqrt(m2)), 8).alias("skewness"),
        F.round(F.col("m4") / (m2 * m2) - 3.0, 8).alias("excess_kurtosis"),
    )


# --- exact weighted median ------------------------------------------------


@register(
    "agg_weighted_median",
    tags=("agg", "percentile", "weighted"),
    oracle="""
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
grp AS (
  SELECT flag, price_c, CAST(SUM(wt) AS BIGINT) AS wt
  FROM w GROUP BY flag, price_c
),
cum AS (
  SELECT flag, price_c, wt,
         SUM(wt) OVER (PARTITION BY flag ORDER BY price_c
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY flag) AS tw
  FROM grp
)
SELECT flag,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_c END) AS DOUBLE) / 100.0
         AS weighted_median,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_prices
FROM cum GROUP BY flag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median: the smallest price whose cumulative
    quantity weight reaches half the group's total — the
    quantity-weighted "typical unit price" per return flag, where the
    unweighted median (`agg_percentile_median`) over-represents small
    orders. The boundary test is the integer cross-multiplication
    2·cw ≥ tw, so selection never divides and cannot waver.

    Plan: corpus → (flag, price) weight aggregate (map-side combine),
    a cumulative window over the DISTINCT-PRICE frame per flag
    (domain-bounded, same argument as the rank-statistics family),
    then one row per flag. At 100 TB this is the exact-selection
    path; the sketch path (`agg_approx_percentile_check`) trades
    exactness for a mergeable summary."""
    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    grp = w.groupBy("flag", "price_c").agg(F.sum("wt").cast("bigint").alias("wt"))
    wp = Window.partitionBy("flag")
    wc = wp.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.select(
        "flag",
        "price_c",
        "wt",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wp).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        (
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))
            ).cast("double")
            / 100.0
        ).alias("weighted_median"),
        F.max("tw").cast("bigint").alias("total_weight"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_prices"),
    )


# --- pre-aggregate cascade routing ----------------------------------------


@register(
    "agg_preagg_routing",
    tags=("agg", "rollup", "olap-serving"),
    oracle="""
SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
""",
)
def agg_preagg_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-AGGREGATE CASCADE: the monthly readout is answered from the
    DAILY rollup, which is itself the only thing built from raw rows —
    the OLAP-serving pattern where dashboards never touch the fact
    table (raw → daily → monthly → ...; each level is built from the
    level below, never from raw again). The oracle computes the SAME
    answer straight from raw events, so the hash match IS the proof
    that the cascade is lossless — which it is exactly because the
    additive measures are decimal-exact sums and counts (averages and
    distincts do NOT cascade; they must be carried as sum/count pairs
    and sketches, which is why the engine's HLL rollup exists).

    At 100 TB: raw→daily runs once per ingest window over new
    partitions only; every further level aggregates the tiny level
    below. The serving query here shuffles O(days × types) rows."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("total_d"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", "day").cast("date").alias("month"),
        "event_type",
    ).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("total_d").cast("double").alias("total"),
    )
    return monthly


# --- KMV (theta-sketch) set operations -------------------------------------

KMV_K = 64
KMV_SET_A = "purchase"
KMV_SET_B = "click"
_KMV_U01 = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"
    " AS DOUBLE) / CAST(4294967296.0 AS DOUBLE)"
)


@register(
    "agg_kmv_set_ops",
    tags=("agg", "sketch", "kmv", "set-ops"),
    oracle=f"""
WITH ua AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = '{KMV_SET_A}'),
ub AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = '{KMV_SET_B}'),
ha AS (SELECT user_id, {_KMV_U01} AS u01 FROM ua),
hb AS (SELECT user_id, {_KMV_U01} AS u01 FROM ub),
uni AS (
  SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         COALESCE(a.u01, b.u01) AS u01,
         CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL
              THEN 1 ELSE 0 END AS in_both
  FROM ha a FULL OUTER JOIN hb b ON a.user_id = b.user_id
),
ka AS (SELECT u01, ROW_NUMBER() OVER (ORDER BY u01) AS rn FROM ha),
kb AS (SELECT u01, ROW_NUMBER() OVER (ORDER BY u01) AS rn FROM hb),
ku AS (SELECT u01, in_both, ROW_NUMBER() OVER (ORDER BY u01) AS rn FROM uni),
sa AS (SELECT MAX(u01) AS theta, CAST(COUNT(*) AS BIGINT) AS k_eff
       FROM ka WHERE rn <= {KMV_K}),
sb AS (SELECT MAX(u01) AS theta, CAST(COUNT(*) AS BIGINT) AS k_eff
       FROM kb WHERE rn <= {KMV_K}),
su AS (SELECT MAX(u01) AS theta, CAST(COUNT(*) AS BIGINT) AS k_eff,
              CAST(SUM(in_both) AS BIGINT) AS n_both_in_sample
       FROM ku WHERE rn <= {KMV_K}),
ex AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ua) AS exact_a,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ub) AS exact_b,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS exact_union,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM uni WHERE in_both = 1)
           AS exact_intersection
)
SELECT ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_intersection,
       CASE WHEN ex.exact_a < {KMV_K} THEN CAST(ex.exact_a AS DOUBLE)
            ELSE ({KMV_K} - 1) / sa.theta END AS est_a,
       CASE WHEN ex.exact_b < {KMV_K} THEN CAST(ex.exact_b AS DOUBLE)
            ELSE ({KMV_K} - 1) / sb.theta END AS est_b,
       CASE WHEN ex.exact_union < {KMV_K} THEN CAST(ex.exact_union AS DOUBLE)
            ELSE ({KMV_K} - 1) / su.theta END AS est_union,
       CAST(su.n_both_in_sample AS DOUBLE) / su.k_eff AS jaccard_kmv,
       (CAST(su.n_both_in_sample AS DOUBLE) / su.k_eff)
         * (CASE WHEN ex.exact_union < {KMV_K}
                 THEN CAST(ex.exact_union AS DOUBLE)
                 ELSE ({KMV_K} - 1) / su.theta END) AS est_intersection
FROM ex CROSS JOIN sa CROSS JOIN sb CROSS JOIN su
""",
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch set operations: estimate |A|, |B|, |A∪B| AND
    |A∩B| from K-minimum-values sketches — the mergeable-sketch family
    member HLL cannot supply (HLL unions are lossless but it has no
    intersection). Keep the K smallest content-hash values of each
    set; the Kth value θ estimates cardinality as (K-1)/θ, the union
    sketch is the K smallest of the merged hashes, and the fraction of
    that sample present in both sets is an unbiased Jaccard estimate,
    so |A∩B| ≈ ρ·|A∪B|. Sets are the distinct '{KMV_SET_A}' vs
    '{KMV_SET_B}' user populations. Exact counts ride along as the
    audit columns.

    Scale shape: each sketch is a distributed top-K on the hash
    (TakeOrdered partial per partition — never a global sort), i.e.
    O(K) state per task and O(K) rows moved; sketches from shards
    merge by keeping the K smallest of the concatenation, which is
    what makes KMV a one-pass streaming/partitioned structure.
    Under-full sketches (n < K) fall back to the exact count on both
    engines identically. Hash draws are md5-derived integers scaled by
    2^-32 — no RNG, bitwise identical across engines."""
    ev = load(spark, sf_dir, "events")
    u01 = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )

    def users(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select("user_id")
            .distinct()
            .select("user_id", u01.alias("u01"))
        )

    ha, hb = users(KMV_SET_A), users(KMV_SET_B)
    uni = (
        ha.withColumnRenamed("u01", "ua01")
        .join(hb.withColumnRenamed("u01", "ub01"), "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce(F.col("ua01"), F.col("ub01")).alias("u01"),
            F.when(
                F.col("ua01").isNotNull() & F.col("ub01").isNotNull(), 1
            )
            .otherwise(0)
            .alias("in_both"),
        )
    )

    def sketch(df: DataFrame, extra: list = ()) -> DataFrame:
        return (
            df.orderBy("u01")
            .limit(KMV_K)
            .agg(
                F.max("u01").alias("theta"),
                F.count(F.lit(1)).cast("bigint").alias("k_eff"),
                *extra,
            )
        )

    sa = sketch(ha).select(
        F.col("theta").alias("theta_a"), F.col("k_eff").alias("keff_a")
    )
    sb = sketch(hb).select(
        F.col("theta").alias("theta_b"), F.col("k_eff").alias("keff_b")
    )
    su = sketch(
        uni, [F.sum("in_both").cast("bigint").alias("n_both_in_sample")]
    ).select(
        F.col("theta").alias("theta_u"),
        F.col("k_eff").alias("keff_u"),
        "n_both_in_sample",
    )
    ex = (
        uni.agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            F.sum("in_both").cast("bigint").alias("exact_intersection"),
        )
        .crossJoin(
            F.broadcast(ha.agg(F.count(F.lit(1)).cast("bigint").alias("exact_a")))
        )
        .crossJoin(
            F.broadcast(hb.agg(F.count(F.lit(1)).cast("bigint").alias("exact_b")))
        )
    )

    def est(exact: str, theta: str) -> Column:
        return F.when(
            F.col(exact) < KMV_K, F.col(exact).cast("double")
        ).otherwise(F.lit(KMV_K - 1) / F.col(theta))

    rho = F.col("n_both_in_sample").cast("double") / F.col("keff_u")
    return (
        ex.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(su))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
            est("exact_a", "theta_a").alias("est_a"),
            est("exact_b", "theta_b").alias("est_b"),
            est("exact_union", "theta_u").alias("est_union"),
            rho.alias("jaccard_kmv"),
            (rho * est("exact_union", "theta_u")).alias("est_intersection"),
        )
    )


@register(
    "agg_listagg_within_group",
    tags=("agg", "sql2023", "collect"),
    oracle="""
SELECT o_orderpriority,
       string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS keys_csv,
       string_agg(DISTINCT o_orderstatus, '' ORDER BY o_orderstatus)
         AS statuses
FROM orders
WHERE o_custkey % 311 = 0
GROUP BY o_orderpriority
""",
)
def agg_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ``LISTAGG ... WITHIN GROUP (ORDER BY ...)`` — the
    Spark-4 BUILT-IN ordered string aggregation (both plain and
    DISTINCT forms), distinct from the collect_list+sort_array
    composition in agg_collect_sorted: the within-group sort happens
    inside the aggregate operator, so there is no intermediate array
    allocation and the partial aggregation still combines map-side.
    DuckDB's ``string_agg(... ORDER BY ...)`` is the same SQL:2023
    feature, which is what makes the ordered concatenation
    hash-comparable across engines."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql("""
        SELECT o_orderpriority,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv,
               listagg(DISTINCT o_orderstatus, '')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        FROM orders_la
        WHERE o_custkey % 311 = 0
        GROUP BY o_orderpriority
    """)


# --- HDR-style log-linear histogram -------------------------------------------
#
# The observability-grade latency histogram (HdrHistogram's layout):
# one OCTAVE per power of two, HDR_SUBBUCKETS linear sub-buckets per
# octave — constant relative error at every magnitude where a
# fixed-width histogram wastes all its resolution on one end. Bucket
# assignment is pure INTEGER bit arithmetic (bit length via bin(),
# shifts for the sub-bucket), so both engines agree exactly and the
# aggregation is a plain map-side-combined count.

HDR_SUBBUCKETS = 8  # power of two; 3 shift bits


@register(
    "agg_hdr_histogram",
    tags=("aggregates", "histogram", "observability"),
    oracle=f"""
WITH vals AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM events
),
bucketed AS (
  SELECT v,
         length(bin(v)) - 1 AS major,
         ((v << 3) >> (length(bin(v)) - 1)) - {HDR_SUBBUCKETS} AS sub
  FROM vals
),
counts AS (
  SELECT major, sub,
         CAST(major * {HDR_SUBBUCKETS} + sub AS BIGINT) AS bucket_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(v) AS BIGINT) AS min_v,
         CAST(MAX(v) AS BIGINT) AS max_v
  FROM bucketed GROUP BY major, sub
)
SELECT bucket_id,
       CAST(major AS INTEGER) AS major,
       CAST(sub AS INTEGER) AS sub,
       CAST((1 << major) + sub * ((1 << major) / {HDR_SUBBUCKETS}) AS BIGINT)
         AS lo_bound,
       n, min_v, max_v,
       CAST(SUM(n) OVER (ORDER BY bucket_id) AS BIGINT) AS cum_n
FROM counts
""",
)
def agg_hdr_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR histogram of event values (centi-unit ints): bucket = octave
    (bit length) x {HDR_SUBBUCKETS} linear sub-buckets, assigned with
    bin()/shift integer arithmetic identical in both engines; emits
    per-bucket counts, observed min/max, the bucket's lower bound
    (2^major + sub * 2^major/{HDR_SUBBUCKETS}; zero width below the
    sub-bucket resolution collapses degenerately and is covered by the
    fixture's small octaves), and the cumulative count — the
    percentile-lookup table every latency dashboard reads. Scale: a
    single count aggregate over O(70) buckets regardless of row count;
    merging histograms across shards is count addition."""
    vals = load(spark, sf_dir, "events").select(
        (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("v")
    )
    major = F.length(F.bin("v")) - 1
    sub = F.expr(f"((v << 3) >> (length(bin(v)) - 1)) - {HDR_SUBBUCKETS}")
    counts = (
        vals.select(major.alias("major"), sub.alias("sub"), "v")
        .groupBy("major", "sub")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").cast("bigint").alias("min_v"),
            F.max("v").cast("bigint").alias("max_v"),
        )
        .withColumn(
            "bucket_id",
            (F.col("major") * HDR_SUBBUCKETS + F.col("sub")).cast("bigint"),
        )
    )
    w = Window.orderBy("bucket_id")
    return counts.select(
        "bucket_id",
        F.col("major").cast("int"),
        F.col("sub").cast("int"),
        F.expr(
            f"CAST((1 << major) + sub * ((1 << major) / {HDR_SUBBUCKETS}) AS BIGINT)"
        ).alias("lo_bound"),
        "n",
        "min_v",
        "max_v",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
    )


# --- count-min sketch heavy hitters ---------------------------------------

CMS_DEPTH = 4     # independent hash rows
CMS_WIDTH = 256   # counters per row
CMS_TOPK = 10     # heavy hitters to estimate


@register(
    "agg_cms_heavy_hitters",
    tags=("agg", "sketch", "heavy-hitters"),
    oracle=f"""
WITH exact AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM lineitem GROUP BY l_partkey
),
hashed AS (
  SELECT e.k, e.n_exact, r.range AS row_id,
         CAST(('0x' || substr(md5(r.range || ':' || e.k), 1, 8))::UBIGINT
              % {CMS_WIDTH} AS BIGINT) AS bucket
  FROM exact e CROSS JOIN range({CMS_DEPTH}) r
),
counters AS (
  SELECT row_id, bucket, CAST(SUM(n_exact) AS BIGINT) AS c
  FROM hashed GROUP BY row_id, bucket
),
topk AS (
  SELECT k, n_exact FROM exact
  ORDER BY n_exact DESC, k LIMIT {CMS_TOPK}
)
SELECT t.k AS l_partkey, t.n_exact,
       CAST(MIN(c.c) AS BIGINT) AS n_cms,
       CAST(MIN(c.c) - t.n_exact AS BIGINT) AS overestimate
FROM topk t
JOIN hashed h ON h.k = t.k
JOIN counters c ON c.row_id = h.row_id AND c.bucket = h.bucket
GROUP BY t.k, t.n_exact
""",
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan) heavy-hitter
    estimation, next to HLL (``agg_hll_sketch_rollup``) and KMV
    (``agg_kmv_set_ops``) in the mergeable-sketch family: {CMS_DEPTH}
    md5-derived hash rows x {CMS_WIDTH} counters, estimate = min over
    rows of the key's counter, always >= the exact count (the
    ``overestimate`` column exposes collision error; the audit shape of
    ``agg_approx_count_distinct`` / ``agg_hll_sketch_rollup``).

    Scale: counts pre-aggregate PER KEY first (the one corpus-sized
    shuffle, map-side combined), so the counter build fans out only the
    DISTINCT-key frame x {CMS_DEPTH} rows and reduces to a fixed
    {CMS_DEPTH}x{CMS_WIDTH} sketch — mergeable across shards/windows by
    plain counter addition, which is the whole point of CMS at 100 TB:
    a skewed key's counter never needs the key's rows co-located. The
    top-k extraction is a TakeOrdered (bounded); the estimate join
    touches O(k x depth) rows."""
    li = load(spark, sf_dir, "lineitem")
    exact = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    rows = spark.range(CMS_DEPTH).select(F.col("id").alias("row_id"))
    hashed = exact.crossJoin(F.broadcast(rows)).select(
        "k",
        "n_exact",
        "row_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("row_id").cast("string"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_WIDTH
        ).alias("bucket"),
    )
    counters = hashed.groupBy("row_id", "bucket").agg(
        F.sum("n_exact").cast("bigint").alias("c")
    )
    topk = exact.orderBy(F.col("n_exact").desc(), "k").limit(CMS_TOPK)
    est = (
        topk.join(hashed.select("k", "row_id", "bucket"), "k")
        .join(counters, ["row_id", "bucket"])
        .groupBy("k", "n_exact")
        .agg(F.min("c").cast("bigint").alias("n_cms"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).cast("bigint").alias("overestimate"),
    )
