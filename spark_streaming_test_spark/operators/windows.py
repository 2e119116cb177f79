"""Window-function family — the reference's sort+limit top-k (O6+O7,
MainApp.java:45-46) generalized to per-group ranking, running
aggregates, offsets, and frame-based windows (SURVEY.md §2.1).

Every window here uses a TOTAL order (unique tiebreaker column in the
ORDER BY) so results are deterministic and hash-stable across engines
and partitionings — rank/lag over a non-total order is a latent
nondeterminism bug at any scale.

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort. Keys here (custkey, user_id, suppkey) are high-cardinality and
unskewed; a low-cardinality partitionBy (or none — a global window)
would serialize onto one task and is avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register


@register(
    "window_topk_per_group",
    bench=True,
    tags=("window", "topk"),
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark pushes a per-partition limit
    below the shuffle for rank-filter patterns (WindowGroupLimit), so
    each group ships at most k rows — the distributed top-k idiom."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    tags=("window", "frame"),
    oracle="""
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over event time (ROWS frame with a total
    order; decimal-cast keeps the prefix sums engine-exact)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_lag_lead",
    tags=("window", "offset"),
    oracle="""
SELECT event_id, user_id, ts,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
       CAST(date_diff('second',
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT)
       AS gap_seconds
FROM events
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets + inter-event gap in seconds per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("gap_seconds"),
    )


@register(
    "window_rank_dense_ntile",
    tags=("window", "rank"),
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
       RANK() OVER w AS price_rank,
       DENSE_RANK() OVER w AS price_dense_rank,
       NTILE(4) OVER w AS price_quartile
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
""",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile sharing one window definition (one
    shuffle+sort serves all three)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "window_sliding_frame",
    tags=("window", "frame"),
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_3,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_3
FROM events
""",
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding ROWS frame (trailing window of 3 events)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("sum_3"),
        F.count(F.lit(1)).over(w).alias("cnt_3"),
    )


@register(
    "window_first_last",
    tags=("window", "frame"),
    oracle="""
SELECT DISTINCT user_id,
       FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_value,
       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
FROM events
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last event value per user over the full partition frame."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
    ).distinct()


@register(
    "window_cume_percent",
    tags=("window", "rank"),
    oracle="""
SELECT event_id, event_type,
       cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id)
         AS cd,
       percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id)
         AS pr,
       ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
         AS decile
FROM events
""",
)
def window_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (cume_dist / percent_rank / decile).

    The (value, event_id) composite ordering is a total order, so ranks
    are deterministic across engines. One shuffle on event_type, sort
    within partitions — same plan shape as any ranked window at scale.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
        F.ntile(10).over(w).alias("decile"),
    )


@register(
    "window_range_frame",
    tags=("window", "frame"),
    oracle="""
SELECT event_id, event_type, user_id,
       COUNT(*) OVER (PARTITION BY event_type ORDER BY user_id
         RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS n_near,
       CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER (
         PARTITION BY event_type ORDER BY user_id
         RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_near
FROM events
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (all rows within 50 user_ids below the
    current row's). Unlike ROWS frames, RANGE includes ALL peers of the
    boundary values, so the result is deterministic even where user_id
    ties — and the decimal-cast sum keeps the float total
    order-independent across engines."""
    # Explicit keyed repartition (optimization r14, guide §2.5): the
    # window exchange is ~2 MB, so AQE byte-coalescing ran the whole
    # RANGE-frame evaluation on one task (measured 1.1 s at sf0.1).
    # Parallelism is inherently bounded by the handful of event_type
    # keys (window semantics); the repartition at least gives each key
    # its own task.
    ev = load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "event_type"
    )
    w = Window.partitionBy("event_type").orderBy("user_id").rangeBetween(-50, 0)
    return ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("sum_near"),
    )


@register(
    "window_running_distinct",
    tags=("window", "distinct"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, ts, event_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM flagged
""",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream — which no SQL
    window supports directly — via the first-occurrence decomposition:
    flag each (user, value)'s first row (row_number = 1 over the
    value-partitioned window), then a running SUM of flags over the
    time-ordered window. Two WindowExecs over the SAME user_id hash
    exchange (the second adds only a sort), so the plan stays one
    shuffle; ties on ts break by event_id for full determinism. The
    standard trick for 'unique items seen so far' product metrics."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = (F.row_number().over(w_first) == 1).cast("int")
    return (
        ev.withColumn("first_seen", first_seen)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
        )
    )


@register(
    "window_gap_islands",
    tags=("window", "islands"),
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id,
         event_id - ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY event_id) AS island_key
  FROM events
)
SELECT user_id,
       MIN(event_id) AS island_start,
       MAX(event_id) AS island_end,
       COUNT(*) AS island_len
FROM tagged
GROUP BY user_id, island_key
ORDER BY user_id, island_start
""",
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE event_ids per user
    via the id-minus-row_number trick (consecutive ids share a constant
    difference to their rank — each run collapses to one group key).
    The integer-sequence twin of time-gap sessionization
    (window_sessionize): one hash exchange serves the rank window AND
    the island aggregate. Detects retention gaps / missing-id ranges in
    ingest audits."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.withColumn(
            "island_key", F.col("event_id") - F.row_number().over(w)
        )
        .groupBy("user_id", "island_key")
        .agg(
            F.min("event_id").alias("island_start"),
            F.max("event_id").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .select("user_id", "island_start", "island_end", "island_len")
        .orderBy("user_id", "island_start")
    )


MED_WIN = 21  # trailing frame width for the rolling median


@register(
    "window_moving_median",
    tags=("window", "median", "robust"),
    oracle=f"""
WITH framed AS (
  SELECT user_id, ts, event_id, value,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {MED_WIN - 1} PRECEDING AND CURRENT ROW)) AS arr
  FROM events
)
SELECT user_id, ts, event_id, value,
       arr[CAST((len(arr) + 1) // 2 AS INTEGER)] AS moving_median,
       CAST(len(arr) AS BIGINT) AS frame_n
FROM framed
""",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-window median (lower middle for even frames) of
    ``value`` per user — the robust-smoothing twin of a moving average,
    immune to the outliers that drag means around.

    No arithmetic at all: sort the bounded frame array and index the
    middle, so cross-engine equality is structural. The frame is
    capped at {MED_WIN} doubles — O(1) window state per row — and the
    single shuffle is the user_id hash exchange the sort rides on.
    Spark's built-in ``median`` window function would interpolate even
    frames with IEEE division; the index form keeps the result an
    actual data point (and bitwise stable)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MED_WIN - 1), Window.currentRow)
    )
    # Explicit keyed repartition (optimization r14, guide §2.5): AQE
    # byte-coalescing collapsed the ~2 MB user_id exchange to 2 tasks,
    # serializing the per-row frame sort.
    return (
        e.select("user_id", "ts", "event_id", "value").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
        .withColumn("arr", F.array_sort(F.collect_list("value").over(w)))
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.expr(
                "element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))"
            ).alias("moving_median"),
            F.size("arr").cast("bigint").alias("frame_n"),
        )
    )


@register(
    "window_time_range_frame",
    tags=("window", "range", "time"),
    oracle="""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
         AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
""",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-interval RANGE frame: each event aggregated with everything
    its user did in the trailing HOUR — the frame is bounded by event
    time, not row count, so bursty and sparse users get the same
    semantic window (what a ROWS frame cannot express). This is the
    SQL-window twin of the streaming sliding window, point-in-time
    correct per row.

    One exchange + one ordered frame; the boundary is inclusive at
    exactly −1h in both engines (SQL-standard RANGE), and the decimal
    sum keeps totals order-invariant."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
                 AS sum_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


# --- RSI (relative strength index) -------------------------------------------

RSI_N = 14  # Wilder's period


@register(
    "window_rsi",
    tags=("windows", "timeseries", "finance"),
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
  FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
),
deltas AS (
  SELECT event_type, h, v,
         v - LAG(v) OVER w AS d,
         ROW_NUMBER() OVER w AS rn
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
),
sums AS (
  SELECT event_type, h, rn,
         CAST(SUM(GREATEST(d, 0)) OVER s AS BIGINT) AS g,
         CAST(SUM(GREATEST(-d, 0)) OVER s AS BIGINT) AS l
  FROM deltas
  WINDOW s AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {RSI_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, h,
       g AS gain_sum, l AS loss_sum,
       CASE WHEN g + l = 0 THEN CAST(50 AS DOUBLE)
            ELSE CAST(100 AS DOUBLE) * g / (g + l) END AS rsi
FROM sums WHERE rn > {RSI_N}
""",
)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index over hourly exact-decimal series (SMA
    form): per-period deltas split into gain/loss, {RSI_N}-period
    rolling sums, RSI = 100*G/(G+L) — algebraically identical to
    100 - 100/(1+RS) with the SMA denominators cancelled, which keeps
    the whole pipeline in BIGINT until ONE final division (identical
    IEEE op in both engines; no rounding step, no dyadic-tie hazard).
    Flat windows (G+L=0) pin RSI to 50 by convention rather than
    dividing by zero. Scale: one bounded-frame window pass per series
    — the same partitioned-window shape as bollinger/donchian, linear
    in rows, no self-join."""
    hourly = load(spark, sf_dir, "events").groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    deltas = hourly.select(
        "event_type", "h",
        (F.col("v") - F.lag("v").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    s = w.rowsBetween(-(RSI_N - 1), 0)
    sums = deltas.select(
        "event_type", "h", "rn",
        F.sum(F.greatest("d", F.lit(0))).over(s).cast("bigint").alias("g"),
        F.sum(F.greatest(-F.col("d"), F.lit(0))).over(s).cast("bigint").alias("l"),
    )
    return sums.filter(F.col("rn") > RSI_N).select(
        "event_type", "h",
        F.col("g").alias("gain_sum"),
        F.col("l").alias("loss_sum"),
        F.when(F.col("g") + F.col("l") == 0, F.lit(50.0)).otherwise(
            F.lit(100.0) * F.col("g") / (F.col("g") + F.col("l"))
        ).alias("rsi"),
    )
