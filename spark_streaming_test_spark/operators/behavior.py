"""Behavioral / clickstream operators over ``events``: gap-based
sessionization and funnel analysis (SURVEY.md §2.1 window-function and
aggregation families, generalized to the event-analytics shapes every
clickstream warehouse runs).

Both are one-shuffle queries: a hash exchange on ``user_id`` co-locates
each user's events, then window functions / conditional aggregates run
partition-local. At 100 TB the per-user event count, not the user count,
bounds task memory — users hash-spread across all executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register

# Gap threshold: a pause longer than this starts a new session.
SESSION_GAP_MIN = 30


@register(
    "window_sessionize",
    tags=("window", "sessionize"),
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sessions
GROUP BY user_id, session_seq
""",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-minute pause starts a new
    session; session ids come from a running sum over the new-session
    flag (the lag/cumsum idiom — the batch twin of
    ``F.session_window``). Ties broken by event_id so the order — and
    therefore the session numbering — is fully deterministic. ONE
    shuffle on user_id serves both windows and the final group-by."""
    ev = load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    new_session = (
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
    ).cast("int")
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("session_seq", F.sum(new_session).over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
    )


@register(
    "events_funnel",
    tags=("aggregation", "funnel"),
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(first_view) AS n_viewed,
       COUNT(CASE WHEN first_click >= first_view THEN 1 END) AS n_clicked_after_view,
       COUNT(CASE WHEN first_purchase >= first_click
                   AND first_click >= first_view THEN 1 END)
         AS n_purchased_after_click
FROM stages
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view → click → purchase: per-user first-touch
    times via conditional MIN (one partial-aggregated groupBy), then
    ordered-stage counts in a single global aggregate over the tiny
    per-user frame. The classic two-level funnel plan — no joins, no
    window, two shuffles total (the second over one row per user)."""
    ev = load(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    stages = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(
            F.when(F.col("first_click") >= F.col("first_view"), 1)
        ).alias("n_clicked_after_view"),
        F.count(
            F.when(
                (F.col("first_purchase") >= F.col("first_click"))
                & (F.col("first_click") >= F.col("first_view")),
                1,
            )
        ).alias("n_purchased_after_click"),
    )


@register(
    "agg_mode_per_group",
    tags=("aggregation", "mode"),
    oracle="""
WITH counted AS (
  SELECT lang, source, COUNT(*) AS n
  FROM documents
  GROUP BY lang, source
),
ranked AS (
  SELECT lang, source, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, source)
           AS rk
  FROM counted
)
SELECT lang, source AS mode_source, n AS mode_count
FROM ranked WHERE rk = 1
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group — count-then-rank, the
    shape built-in ``mode()`` can't give deterministically (its ties
    are arbitrary; here ties break lexically on the value, so the
    answer is stable across engines and runs). Two shuffles over
    (group, value) pairs — at 100 TB both key on small aggregated
    frames, never raw rows."""
    d = load(spark, sf_dir, "documents")
    counted = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "lang",
            F.col("source").alias("mode_source"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "events_retention_cohorts",
    tags=("aggregation", "retention", "cohort"),
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(time_bucket(INTERVAL '1 week', ts)) AS cohort_week
  FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, time_bucket(INTERVAL '1 week', ts) AS active_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('week', f.cohort_week, a.active_week) AS INT) AS weeks_since,
       COUNT(DISTINCT a.user_id) AS n_active
FROM first_seen f
JOIN activity a ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, then
    distinct-active counts per (cohort, weeks-since) cell — THE
    product-analytics retention query. The cohort frame is one row per
    user (tiny next to the event log), so its join back onto per-week
    activity broadcasts at scale; everything else is partial-aggregated
    distinct counting."""
    ev = load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        activity.join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


TRANS_DP = 8


@register(
    "events_markov_transitions",
    tags=("behavior", "window", "markov"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
trans AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
),
marg AS (SELECT src, SUM(n) AS total FROM trans GROUP BY src)
SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
       round(CAST(t.n AS DOUBLE) / CAST(m.total AS DOUBLE), {TRANS_DP})
         AS p
FROM trans t JOIN marg m ON t.src = m.src
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream: for each (src, dst) adjacent pair, the count and the
    row-normalized transition probability — the behavioral model
    underlying next-event prediction and bot detection.

    One hash exchange on user_id for the lead() adjacency, then the
    transition counts partial-aggregate to |event_types|² rows; the
    marginal join is over that tiny matrix (**broadcast**). Integer
    counts divide as identical doubles cross-engine; p rounds at
    {TRANS_DP} dp."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    marg = trans.groupBy("src").agg(F.sum("n").alias("total"))
    return trans.join(F.broadcast(marg), "src").select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("total").cast("double"),
            TRANS_DP,
        ).alias("p"),
    )


FUNNEL_WINDOW_MIN = 60  # view -> purchase must complete within this many minutes


@register(
    "events_window_funnel",
    tags=("behavior", "funnel", "window"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_here
  FROM events
),
clicks AS (
  SELECT user_id, ts AS click_ts, next_purchase_here AS purchase_after_click
  FROM seq WHERE event_type = 'click'
),
views AS (
  SELECT s.user_id, s.ts AS view_ts, s.next_click,
         c.purchase_after_click
  FROM seq s
  LEFT JOIN clicks c
    ON c.user_id = s.user_id AND c.click_ts = s.next_click
  WHERE s.event_type = 'view'
),
levels AS (
  SELECT user_id,
         1
         + CASE WHEN next_click IS NOT NULL
                 AND next_click <= view_ts + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
                THEN 1 ELSE 0 END
         + CASE WHEN next_click IS NOT NULL
                 AND next_click <= view_ts + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
                 AND purchase_after_click IS NOT NULL
                 AND purchase_after_click <= view_ts + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
                THEN 1 ELSE 0 END AS level
  FROM views
),
per_user AS (SELECT user_id, MAX(level) AS max_level FROM levels GROUP BY user_id)
SELECT max_level, COUNT(*) AS n_users
FROM per_user GROUP BY max_level ORDER BY max_level
""",
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-``windowFunnel`` semantics: deepest view -> click ->
    purchase chain where each NEXT stage follows the previous one and
    the whole chain completes within {W} minutes of the anchoring view.
    Differs from ``events_funnel`` (global first-touch) by enforcing
    strict per-chain ordering and a bounded time window.

    Plan: one window pass over user-ordered events computes, at every
    row, the next click / next purchase strictly after it (reverse
    running MIN — no self-join against the raw stream). Each view then
    needs the purchase-after-ITS-click, which is a key-equi join back
    to the click rows on (user_id, next_click) — shuffle bounded by
    the click subset, and both sides already partition by user_id so
    the sort-merge reuses the window's exchange. Funnel levels and the
    final histogram are O(users) aggregates. Ties on ts are broken by
    event_id in the window order, so chain choice is deterministic."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_of = lambda t: F.min(
        F.when(F.col("event_type") == t, F.col("ts"))
    ).over(w_next)
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        next_of("click").alias("next_click"),
        next_of("purchase").alias("next_purchase_here"),
    )
    clicks = seq.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("next_purchase_here").alias("purchase_after_click"),
    )
    views = (
        seq.filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"), "next_click")
        .join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("next_click") == F.col("click_ts")),
            "left",
        )
        .drop("c_user_id")
    )
    deadline = F.col("view_ts") + F.expr(
        f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES"
    )
    stage2 = F.col("next_click").isNotNull() & (
        F.col("next_click") <= deadline
    )
    stage3 = (
        stage2
        & F.col("purchase_after_click").isNotNull()
        & (F.col("purchase_after_click") <= deadline)
    )
    levels = views.select(
        "user_id",
        (
            F.lit(1) + stage2.cast("int") + stage3.cast("int")
        ).alias("level"),
    )
    return (
        levels.groupBy("user_id")
        .agg(F.max("level").alias("max_level"))
        .groupBy("max_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_level")
    )


@register(
    "events_attribution",
    tags=("window", "attribution", "behavior"),
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type, value,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS) OVER hist AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER hist AS last_touch
  FROM events
  WINDOW hist AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT * FROM ordered
  WHERE event_type = 'purchase' AND last_touch IS NOT NULL
),
first_rev AS (
  SELECT first_touch AS channel, COUNT(*) AS n_first,
         {sql_dsum('value')} AS rev_first
  FROM conv GROUP BY first_touch
),
last_rev AS (
  SELECT last_touch AS channel, COUNT(*) AS n_last,
         {sql_dsum('value')} AS rev_last
  FROM conv GROUP BY last_touch
)
SELECT COALESCE(f.channel, l.channel) AS channel,
       CAST(COALESCE(f.n_first, 0) AS BIGINT) AS n_first,
       COALESCE(f.rev_first, 0.0) AS rev_first,
       CAST(COALESCE(l.n_last, 0) AS BIGINT) AS n_last,
       COALESCE(l.rev_last, 0.0) AS rev_last
FROM first_rev f FULL OUTER JOIN last_rev l ON f.channel = l.channel
""",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: credit each purchase's revenue to the
    user's FIRST preceding non-purchase touch (first-touch model) and
    the MOST RECENT one (last-touch model); report conversion counts
    and deterministic revenue sums per channel under both models.

    One shuffle on user_id drives both attribution windows (identical
    frame, shared sort); the per-channel rollups aggregate a tiny
    channel domain and the final FULL OUTER join runs on single-digit
    rows. Purchases with no preceding touch are unattributable and
    excluded (documented, matching standard attribution tooling)."""
    e = load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    hist = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    conv = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            F.first(touch, ignorenulls=True).over(hist).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(hist).alias("last_touch"),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_touch").isNotNull()
        )
    )
    first_rev = conv.groupBy(
        F.col("first_touch").alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_first"), dsum("value").alias("rev_first")
    )
    last_rev = conv.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_last"), dsum("value").alias("rev_last")
    )
    return (
        first_rev.join(last_rev, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce(F.col("n_first"), F.lit(0)).cast("bigint").alias("n_first"),
            F.coalesce(F.col("rev_first"), F.lit(0.0)).alias("rev_first"),
            F.coalesce(F.col("n_last"), F.lit(0)).cast("bigint").alias("n_last"),
            F.coalesce(F.col("rev_last"), F.lit(0.0)).alias("rev_last"),
        )
    )


@register(
    "events_time_to_convert",
    tags=("window", "behavior", "latency"),
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
),
durs AS (
  SELECT user_id,
         CAST(date_diff('second', signup_ts, purchase_ts) AS BIGINT)
           AS secs_to_convert
  FROM firsts
  WHERE signup_ts IS NOT NULL AND purchase_ts IS NOT NULL
        AND purchase_ts >= signup_ts
),
ranked AS (
  SELECT secs_to_convert,
         ROW_NUMBER() OVER (ORDER BY secs_to_convert, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM durs
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN secs_to_convert END) AS p50_secs,
       MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                THEN secs_to_convert END) AS p90_secs,
       MIN(secs_to_convert) AS min_secs,
       MAX(secs_to_convert) AS max_secs
FROM ranked
""",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: seconds from each user's FIRST signup to their
    FIRST subsequent purchase, summarized as exact-rank p50/p90 and
    min/max — the conversion-latency readout every growth dashboard
    pairs with the funnel counts in ``events_funnel``.

    One user-grain conditional-MIN reduce (single shuffle, map-side
    combine) computes both first-touch timestamps; the duration
    distribution is user-count-sized and its exact rank is computed
    DISTRIBUTED (``distributed_row_number`` — range partitions +
    broadcast offsets, no single-partition sort even at 10^9 users),
    and the percentiles are concrete data points picked by rank — no
    interpolation to disagree on. Users who purchase before ever
    signing up (data noise) are excluded, as are non-converters."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("signup_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchase_ts"),
    )
    durs = firsts.filter(
        F.col("signup_ts").isNotNull()
        & F.col("purchase_ts").isNotNull()
        & (F.col("purchase_ts") >= F.col("signup_ts"))
    ).select(
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")
        ).alias("secs_to_convert"),
    )
    from .evalmetrics import distributed_row_number

    ranked = distributed_row_number(
        durs, ["secs_to_convert", "user_id"]
    ).select(
        "secs_to_convert",
        F.col("_rnk").alias("rn"),
        F.col("_nt").alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"),
                F.col("secs_to_convert"),
            )
        ).alias("p50_secs"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.90 * F.col("n")).cast("bigint"),
                F.col("secs_to_convert"),
            )
        ).alias("p90_secs"),
        F.min("secs_to_convert").alias("min_secs"),
        F.max("secs_to_convert").alias("max_secs"),
    )


SEQ_TOPK = 15  # most common behavior trigrams reported


@register(
    "events_sequence_trigrams",
    tags=("window", "behavior", "sequence-mining"),
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type, 1) OVER w AS nxt1,
         LEAD(event_type, 2) OVER w AS nxt2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grams AS (
  SELECT event_type AS e1, nxt1 AS e2, nxt2 AS e3, COUNT(*) AS n
  FROM ordered
  WHERE nxt1 IS NOT NULL AND nxt2 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT e1, e2, e3, CAST(n AS BIGINT) AS n, CAST(rk AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rk
  FROM grams
) WHERE rk <= {SEQ_TOPK}
""",
)
def events_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining (lite): the {SEQ_TOPK} most frequent
    3-step behavior sequences across users — LEAD-windowed trigram
    extraction, one shuffle on user_id, then a 5³-bounded pattern
    reduce. The Markov-transition twin (`events_markov_transitions`)
    models pairs; trigrams expose the longer habits (view→click→
    purchase vs view→view→view) funnels are built from."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    grams = ordered.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wr = Window.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    return (
        grams.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= SEQ_TOPK)
        .select("e1", "e2", "e3", "n", F.col("rk").cast("int").alias("rank"))
    )


@register(
    "events_cohort_ltv",
    tags=("aggregation", "cohort", "ltv"),
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(time_bucket(INTERVAL '1 week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size
  FROM first_seen GROUP BY cohort_week
),
weekly AS (
  SELECT f.cohort_week,
         CAST(date_diff('week', f.cohort_week,
                        time_bucket(INTERVAL '1 week', e.ts)) AS INTEGER)
           AS weeks_since,
         CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
  FROM events e
  JOIN first_seen f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_week, weeks_since, rev,
         SUM(rev) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev
  FROM weekly
)
SELECT c.cohort_week, c.weeks_since,
       CAST(c.rev AS DOUBLE) AS week_revenue,
       CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
       CAST(c.cum_rev AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS ltv_per_user,
       CAST(s.cohort_size AS BIGINT) AS cohort_size
FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative purchase revenue per
    (first-seen-week cohort, weeks-since), normalized to LTV per
    cohort member — the revenue twin of ``events_retention_cohorts``
    and the curve payback models are fit on.

    Revenue accumulates in exact decimal end-to-end (weekly sums AND
    the cumulative window), so the curve is bitwise reproducible; the
    user→cohort map is one row per user and broadcasts onto the
    purchase stream; cohort sizes join on the tiny cohort frame."""
    e = load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_seen = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    weekly = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(week)
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weekly.withColumn("cum_rev", F.sum("rev").over(wcum))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        F.col("rev").cast("double").alias("week_revenue"),
        F.col("cum_rev").cast("double").alias("cum_revenue"),
        (
            F.col("cum_rev").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("ltv_per_user"),
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
    )


MIN_PATH_SUPPORT = 3  # journeys must recur this often to surface


@register(
    "events_journey_paths",
    tags=("behavior", "sessionize", "sequence"),
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, session_seq
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths GROUP BY path
HAVING COUNT(*) >= {MIN_PATH_SUPPORT}
""",
)
def events_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top recurring user journeys: sessionize (same gap/cumsum idiom
    as ``window_sessionize``), serialize each session's in-order
    event-type sequence to a path string, and count how often each
    full path recurs — the product-analytics "what do users actually
    do" query that transition matrices (`events_markov_transitions`)
    can't answer, because it keeps WHOLE paths, not one-step hops.

    ONE exchange on user_id serves the lag window, the running sum and
    the per-session fold; the path aggregate then shuffles one string
    per session (sessions ≪ events), and support filtering bounds the
    result. In-session order is pinned by (ts, event_id) on both
    engines, so path strings — and their counts — match bitwise."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    new_session = (
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us)
    ).cast("int")
    paths = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("session_seq", F.sum(new_session).over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .filter(F.col("n_sessions") >= MIN_PATH_SUPPORT)
    )


BOT_BURST_PER_MIN = 5   # max events in any single minute
BOT_MIN_GAP_S = 2       # fastest human-plausible repeat, seconds
BOT_MIN_EVENTS = 20     # ignore low-activity users


@register(
    "events_bot_detection",
    tags=("behavior", "quality", "heuristics"),
    oracle=f"""
WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS c
  FROM events GROUP BY user_id, date_trunc('minute', ts)
),
burst AS (SELECT user_id, MAX(c) AS max_per_min FROM per_min GROUP BY user_id),
gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events
),
gapstats AS (
  SELECT user_id,
         MIN(gap_us) AS min_gap_us,
         SUM(CASE WHEN gap_us < {BOT_MIN_GAP_S} * 1000000 THEN 1 ELSE 0 END)
           AS n_rapid
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
),
base AS (
  SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types
  FROM events GROUP BY user_id
)
SELECT b.user_id,
       CAST(b.n_events AS BIGINT) AS n_events,
       CAST(b.n_types AS INTEGER) AS n_types,
       CAST(bu.max_per_min AS INTEGER) AS max_per_min,
       CAST(g.min_gap_us AS BIGINT) AS min_gap_us,
       CAST(g.n_rapid AS BIGINT) AS n_rapid,
       (bu.max_per_min > {BOT_BURST_PER_MIN}
        OR g.n_rapid * 2 > b.n_events
        OR b.n_types = 1) AS bot_suspect
FROM base b
JOIN burst bu ON b.user_id = bu.user_id
JOIN gapstats g ON b.user_id = g.user_id
WHERE b.n_events >= {BOT_MIN_EVENTS}
""",
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation heuristics per user — the trust-and-safety twin
    of the corpus quality filters: burstiness (max events in any one
    minute), inhuman repeat speed (min and count of sub-{BOT_MIN_GAP_S}s
    gaps), and behavioral monotony (single event type). Any tripwire
    flags the account for review; thresholds are the knobs a fraud
    team tunes against labeled cases.

    ONE exchange on user_id serves the gap window and the per-user
    reduces (the minute-bucket burst aggregates map-side first), and
    the signals join user-keyed aggregates — O(users) frames, not
    events. All integer timestamps and counts: nothing to round."""
    ev = load(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    burst = per_min.groupBy("user_id").agg(F.max("c").alias("max_per_min"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    gapstats = gaps.groupBy("user_id").agg(
        F.min("gap_us").alias("min_gap_us"),
        F.sum(
            F.when(F.col("gap_us") < BOT_MIN_GAP_S * 1_000_000, 1).otherwise(0)
        ).alias("n_rapid"),
    )
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )
    suspect = (
        (F.col("max_per_min") > BOT_BURST_PER_MIN)
        | (F.col("n_rapid") * 2 > F.col("n_events"))
        | (F.col("n_types") == 1)
    )
    return (
        base.filter(F.col("n_events") >= BOT_MIN_EVENTS)
        .join(burst, "user_id")
        .join(gapstats, "user_id")
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_types").cast("int").alias("n_types"),
            F.col("max_per_min").cast("int").alias("max_per_min"),
            F.col("min_gap_us").cast("bigint").alias("min_gap_us"),
            F.col("n_rapid").cast("bigint").alias("n_rapid"),
            suspect.alias("bot_suspect"),
        )
    )


@register(
    "events_stickiness",
    tags=("behavior", "aggregation", "engagement"),
    oracle="""
WITH dau AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY CAST(ts AS DATE)
),
wau AS (
  SELECT CAST(time_bucket(INTERVAL '1 week', ts) AS DATE) AS week_start,
         COUNT(DISTINCT user_id) AS wau
  FROM events GROUP BY time_bucket(INTERVAL '1 week', ts)
),
mau AS (SELECT COUNT(DISTINCT user_id) AS mau FROM events)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       CAST(m.mau AS BIGINT) AS mau,
       CAST(d.dau AS DOUBLE) / w.wau AS dau_wau,
       CAST(d.dau AS DOUBLE) / m.mau AS dau_mau
FROM dau d
JOIN wau w ON CAST(time_bucket(INTERVAL '1 week',
                               CAST(d.day AS TIMESTAMP)) AS DATE) = w.week_start
CROSS JOIN mau m
""",
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: daily active users against the enclosing
    week's and the full month's actives (DAU/WAU and DAU/MAU — the
    "how habitual is usage" product metric; 1.0 means everyone active
    this month shows up every day).

    Three distinct-count reduces at different grains (day exchange
    dominates; WAU/MAU frames are tiny and broadcast back onto the
    daily series), integer counts to two final divisions. At fleet
    scale the exact distincts swap for the mergeable HLL sketches of
    `agg_hll_sketch_rollup` with identical query shape."""
    ev = load(spark, sf_dir, "events")
    dau = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("wau"))
    mau = ev.agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.withColumn(
            "week_start",
            F.date_trunc("week", F.col("day").cast("timestamp")).cast("date"),
        )
        .join(F.broadcast(wau), "week_start")
        .crossJoin(F.broadcast(mau))
        .select(
            "day",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.col("mau").cast("bigint").alias("mau"),
            (F.col("dau").cast("double") / F.col("wau")).alias("dau_wau"),
            (F.col("dau").cast("double") / F.col("mau")).alias("dau_mau"),
        )
    )


DECAY_HALF_LIFE_D = 7      # engagement half-life, days
DECAY_HORIZON = "2024-01-31"
DECAY_DP = 8


@register(
    "events_decayed_engagement",
    tags=("behavior", "scoring", "decay"),
    oracle=f"""
WITH scored AS (
  SELECT user_id,
         round(CAST(value AS DOUBLE)
               * pow(2.0, -CAST(date_diff('day', ts,
                                TIMESTAMP '{DECAY_HORIZON}') AS DOUBLE)
                          / {DECAY_HALF_LIFE_D}.0), {DECAY_DP}) AS dv
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(dv AS DECIMAL(25,{DECAY_DP}))) AS DOUBLE)
         AS decayed_score
FROM scored GROUP BY user_id
""",
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user
    (half-life {DECAY_HALF_LIFE_D} days): yesterday's activity counts
    ~full, last month's ~2%. The ranking signal behind churn models
    and recency-aware recommendations that a plain lifetime SUM
    (which never forgets) gets wrong — and, unlike a recency cutoff,
    it degrades smoothly.

    INCREMENTALLY maintainable at scale: the score re-ages by a
    constant factor per day (`S_today = S_yesterday · 2^(-1/h) +
    today's events`), so the daily job folds one delta instead of
    rescanning history — the `agg_incremental_maintenance` pattern
    with a decay twist. Per-row decay terms round at {DECAY_DP} dp
    (pow is libm territory) then sum as decimals; one user reduce."""
    ev = load(spark, sf_dir, "events")
    age = F.datediff(
        F.lit(DECAY_HORIZON).cast("timestamp"), F.col("ts")
    ).cast("double")
    dv = F.round(
        F.col("value").cast("double")
        * F.pow(F.lit(2.0), -age / float(DECAY_HALF_LIFE_D)),
        DECAY_DP,
    )
    return (
        ev.select("user_id", dv.alias("dv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("dv").cast(f"decimal(25,{DECAY_DP})"))
            .cast("double")
            .alias("decayed_score"),
        )
    )


# --- point-in-time feature matrix -----------------------------------------


@register(
    "events_feature_matrix",
    tags=("behavior", "features", "window"),
    oracle=f"""
WITH daily AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS n_events,
         {sql_dsum('value')} AS day_value,
         COUNT(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1, 2
)
SELECT user_id, d AS day_index,
       CAST(SUM(n_events) OVER w7 AS BIGINT) AS n_events_7d,
       CAST(SUM(CAST(day_value AS DECIMAL(25,6))) OVER w7 AS DOUBLE)
         AS sum_value_7d,
       CAST(COUNT(*) OVER w7 AS BIGINT) AS n_active_days_7d,
       CAST(d - lag(d) OVER (PARTITION BY user_id ORDER BY d) AS BIGINT)
         AS days_since_prev
FROM daily
WINDOW w7 AS (PARTITION BY user_id ORDER BY d
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def events_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature materialization (the feature-store fill):
    for every (user, active day), trailing-7-day activity features —
    event count, exact-decimal value sum, active-day count, recency gap
    — computed AS OF each day with no future leakage (the RANGE frame
    ends at the current row).

    The fact table reduces to the daily user grain first (one
    map-side-combined exchange); every feature then rides a single
    partition-ordered RANGE window over integer day indexes — adding
    features adds columns, not passes. Decimal day sums keep re-fills
    bitwise reproducible, which is what makes offline/online feature
    parity checkable at all."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("day_value"),
            F.count_distinct(F.col("event_type")).alias("n_types"),
        )
    )
    w7 = (
        Window.partitionBy("user_id").orderBy("d").rangeBetween(-6, 0)
    )
    wl = Window.partitionBy("user_id").orderBy("d")
    return daily.select(
        "user_id",
        F.col("d").alias("day_index"),
        F.sum("n_events").over(w7).cast("bigint").alias("n_events_7d"),
        F.sum(F.col("day_value").cast("decimal(25,6)"))
        .over(w7)
        .cast("double")
        .alias("sum_value_7d"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("n_active_days_7d"),
        (F.col("d") - F.lag("d").over(wl)).cast("bigint").alias(
            "days_since_prev"
        ),
    )


@register(
    "events_next_event_baseline",
    tags=("behavior", "prediction", "evaluation"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
trans AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
),
pred AS (
  SELECT src, dst AS predicted_next, n AS n_correct FROM (
    SELECT src, dst, n,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rn
    FROM trans) t WHERE rn = 1
),
marg AS (SELECT src, SUM(n) AS n_total FROM trans GROUP BY src)
SELECT m.src, p.predicted_next,
       CAST(m.n_total AS BIGINT) AS n_total,
       CAST(p.n_correct AS BIGINT) AS n_correct,
       CAST(p.n_correct AS DOUBLE) / m.n_total AS accuracy
FROM marg m JOIN pred p ON m.src = p.src
""",
)
def events_next_event_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority next-event baseline + its accuracy — the floor every
    sequence model must beat: predict each state's most frequent
    successor (from the same transition counts
    ``events_markov_transitions`` reports) and measure how often
    that single guess is right. Publishing the baseline WITH the
    transition table is what keeps "the LSTM gets 41%" honest when
    the majority edge alone gets 38%.

    Transition counts reduce on one user_id exchange; prediction and
    accuracy are O(states) arithmetic over the tiny transition
    frame."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
    pred = (
        trans.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "src",
            F.col("dst").alias("predicted_next"),
            F.col("n").alias("n_correct"),
        )
    )
    marg = trans.groupBy("src").agg(F.sum("n").alias("n_total"))
    return marg.join(pred, "src").select(
        "src",
        "predicted_next",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        (F.col("n_correct").cast("double") / F.col("n_total")).alias(
            "accuracy"
        ),
    )


@register(
    "events_user_lifecycle",
    tags=("behavior", "lifecycle", "growth"),
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id,
         date_diff('week', DATE '1970-01-05', CAST(ts AS DATE)) AS wk
  FROM events
),
flagged AS (
  SELECT user_id, wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY wk) AS rn
  FROM weekly
),
states AS (
  SELECT user_id, wk,
         CASE WHEN rn = 1 THEN 'new'
              WHEN wk - prev_wk = 1 THEN 'active'
              WHEN wk - prev_wk <= 4 THEN 'returning'
              ELSE 'resurrected' END AS state,
         CAST(COALESCE(wk - prev_wk, 0) AS BIGINT) AS weeks_since_prev
  FROM flagged
)
SELECT CAST(wk AS BIGINT) AS week_index, state,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM states
GROUP BY wk, state
""",
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle states per week — the growth-accounting
    classification (new / active / returning / resurrected) whose
    weekly counts are the numerator and denominator of every retention
    narrative: DAU can be flat while 'new' collapses and 'resurrected'
    props it up, and only this split shows it.

    One distinct to the (user, week) grain, one lag window on the same
    user exchange, a CASE ladder, and a tiny week×state reduce — all
    integer week arithmetic, no dates past the first truncation."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) / 7
        ).alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    flagged = weekly.withColumn("prev_wk", F.lag("wk").over(w)).withColumn(
        "rn", F.row_number().over(w)
    )
    gap = F.col("wk") - F.col("prev_wk")
    states = flagged.select(
        "wk",
        F.when(F.col("rn") == 1, "new")
        .when(gap == 1, "active")
        .when(gap <= 4, "returning")
        .otherwise("resurrected")
        .alias("state"),
    )
    return states.groupBy("wk", "state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select(
        F.col("wk").cast("bigint").alias("week_index"), "state", "n_users"
    )


# --- sweep-line peak concurrency ------------------------------------------


@register(
    "events_concurrency_sweep",
    tags=("events", "sweep-line", "intervals"),
    oracle="""
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS t0,
         epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000 AS t1
  FROM events
),
deltas AS (
  SELECT event_type, t0 AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, t1 AS t, -1 AS d FROM iv
),
swept AS (
  SELECT event_type, t, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM deltas
),
peak AS (
  SELECT event_type, MAX(conc) AS peak_concurrency FROM swept
  GROUP BY event_type
)
SELECT p.event_type,
       CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
       CAST(MIN(s.t) AS BIGINT) AS peak_t_us,
       CAST((SELECT COUNT(*) FROM iv i WHERE i.event_type = p.event_type)
            AS BIGINT) AS n_intervals
FROM peak p JOIN swept s
  ON s.event_type = p.event_type AND s.conc = p.peak_concurrency
GROUP BY p.event_type, p.peak_concurrency
""",
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: treat each event as an interval
    [ts, ts + value minutes] (value = session/stream duration), unpivot
    into +1/-1 boundary deltas, and a running sum over the time-ordered
    deltas IS the live-concurrency curve — max concurrent streams per
    event_type plus the first instant the peak is reached. The classic
    capacity-planning question ("how many simultaneous X at worst?")
    answered without materializing any pairwise overlap join.

    Tie discipline: deltas order by (t, d) so a -1 (interval end)
    sweeps before a +1 at the identical microsecond — touching
    intervals don't count as concurrent — identically in both engines.
    Interval ends use floor(value*60) on the same IEEE product, exact.

    Scale shape: the unpivot is a fixed 2x projection; the running sum
    is one series-keyed ordered window with O(1) state. At planetary
    cardinality the single per-series window becomes the two-level
    form (per-shard sweep + carry-in offsets — the documented
    ``window_running_*`` scale path); the peak extraction joins a
    5-row broadcast aggregate back onto the curve."""
    ev = load(spark, sf_dir, "events")
    t0 = F.unix_micros(F.col("ts"))
    t1 = t0 + (
        F.floor(F.col("value") * 60).cast("bigint") * F.lit(1000000)
    )
    iv = ev.select("event_type", t0.alias("t0"), t1.alias("t1"))
    deltas = iv.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        iv.select("event_type", F.col("t1").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.withColumn("conc", F.sum("d").over(w))
    peak = swept.groupBy("event_type").agg(
        F.max("conc").alias("peak_concurrency")
    )
    n_iv = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals")
    )
    return (
        swept.join(
            F.broadcast(peak),
            ["event_type"],
        )
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("t").cast("bigint").alias("peak_t_us"))
        .join(F.broadcast(n_iv), "event_type")
        .select(
            "event_type",
            F.col("peak_concurrency").cast("bigint").alias("peak_concurrency"),
            "peak_t_us",
            "n_intervals",
        )
    )


# --- regex sequence patterns (MATCH_RECOGNIZE in miniature) ---------------

FUNNEL_PATTERN = "vc+p"   # view, 1+ clicks, purchase — with nothing between
ERROR_BURST = "eee"       # 3 consecutive errors


@register(
    "events_pattern_regex_match",
    tags=("behavior", "sequence", "regexp"),
    oracle=f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, seq,
       CAST(len(seq) AS INTEGER) AS seq_len,
       CAST(len(regexp_extract_all(seq, '{FUNNEL_PATTERN}')) AS INTEGER)
         AS n_funnels,
       nullif(regexp_extract(seq, '{FUNNEL_PATTERN}'), '') AS first_funnel,
       seq LIKE '%{ERROR_BURST}%' AS has_error_burst
FROM seqs
""",
)
def events_pattern_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection, the MATCH_RECOGNIZE shape: each
    user's event history becomes a compact symbol string (one char per
    event, order pinned by (ts, event_id)), and patterns are plain
    regexes over it — '{FUNNEL_PATTERN}' counts strict view->clicks->
    purchase funnels (no intervening events, which the set-based funnel
    queries cannot express), and '{ERROR_BURST}' flags 3 consecutive
    errors. Regex-over-symbol-string turns arbitrary event grammars
    into one codegen'd projection; new patterns cost zero new shuffles.

    One exchange on user_id builds the per-user string (sessions-long
    strings, events-long input); every pattern then evaluates map-side.
    Non-overlapping leftmost match semantics agree between Java regex
    and RE2 for these patterns, so counts and first-match extractions
    are engine-exact (empty-match NULL normalized via nullif)."""
    ev = load(spark, sf_dir, "events")
    seqs = (
        ev.select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("sym"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "sym"))),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        "seq",
        F.length("seq").cast("int").alias("seq_len"),
        F.regexp_count("seq", F.lit(FUNNEL_PATTERN)).cast("int").alias("n_funnels"),
        F.regexp_substr("seq", F.lit(FUNNEL_PATTERN)).alias("first_funnel"),
        F.col("seq").contains(ERROR_BURST).alias("has_error_burst"),
    )


# --- Shapley-value attribution ------------------------------------------------
#
# First/last-touch (events_attribution) credit single touches; the
# Shapley model credits each channel its AVERAGE MARGINAL LIFT over
# all orderings of the user's touch coalition (Shapley 1953, applied
# to conversion attribution a la Zhao et al. 2018). With 4 channels
# the characteristic function v(S) = conversion rate of users whose
# touch set is exactly S has 16 values, and each channel's credit is
# a FIXED 8-term closed form: phi_i = sum_S w(|S|) (v(S+i) - v(S)),
# w = |S|!(n-|S|-1)!/n!. Both engines evaluate the IDENTICAL generated
# expression tree over the same 16 pivoted values, so the doubles
# match bitwise with no rounding step.

SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]  # bit order
SHAPLEY_CONVERSION = "purchase"


def _shapley_sql() -> tuple[str, str]:
    """(v_defs, phi_stack): the v{m} CASE definitions over the pivoted
    u{m}/c{m} columns, and the per-channel phi expressions — one shared
    generator so Spark and DuckDB run the same expression text."""
    from math import factorial

    n = len(SHAPLEY_CHANNELS)
    v_defs = ", ".join(
        f"CASE WHEN u{m} > 0 THEN CAST(c{m} AS DOUBLE) / u{m} "
        f"ELSE CAST(0 AS DOUBLE) END AS v{m}"
        for m in range(1 << n)
    )
    phis = []
    for i in range(n):
        others = [j for j in range(n) if j != i]
        terms = []
        for s in range(1 << (n - 1)):
            mask = 0
            bits = [others[k] for k in range(n - 1) if s >> k & 1]
            for b in bits:
                mask |= 1 << b
            w = factorial(len(bits)) * factorial(n - len(bits) - 1) / factorial(n)
            terms.append(
                f"CAST({w!r} AS DOUBLE) * (v{mask | (1 << i)} - v{mask})"
            )
        phis.append(" + ".join(terms))
    return v_defs, phis


@register(
    "events_attribution_shapley",
    tags=("events", "attribution", "shapley"),
    oracle=None,  # assembled below from the shared generator
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley conversion credit per channel: users reduce to a touch-
    set bitmask + converted flag (one aggregation), the 16 coalition
    conversion rates pivot to a single row, and each channel's credit
    is the closed-form 8-term marginal-lift sum — all downstream of
    ONE shuffle on user_id; the combinatorics run on a 1-row frame.
    Scale: channel-set size n is the only exponential knob (2^n
    coalition stats); marketing stacks cap n <= ~10, and the coalition
    stats frame stays tiny at any row scale."""
    e = load(spark, sf_dir, "events")
    bits = [
        F.max((F.col("event_type") == c).cast("int")) * (1 << i)
        for i, c in enumerate(SHAPLEY_CHANNELS)
    ]
    per_user = e.groupBy("user_id").agg(
        sum(bits[1:], bits[0]).alias("mask"),
        F.max(
            (F.col("event_type") == SHAPLEY_CONVERSION).cast("int")
        ).alias("conv"),
    )
    stats = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("conv").alias("n_conv")
    )
    n = len(SHAPLEY_CHANNELS)
    pivot = stats.agg(
        *[
            F.max(
                F.when(F.col("mask") == m, F.col("n_users"))
            ).alias(f"raw_u{m}")
            for m in range(1 << n)
        ],
        *[
            F.max(F.when(F.col("mask") == m, F.col("n_conv"))).alias(
                f"raw_c{m}"
            )
            for m in range(1 << n)
        ],
    ).select(
        *[
            F.coalesce(f"raw_u{m}", F.lit(0)).alias(f"u{m}")
            for m in range(1 << n)
        ],
        *[
            F.coalesce(f"raw_c{m}", F.lit(0)).alias(f"c{m}")
            for m in range(1 << n)
        ],
    )
    v_defs, phis = _shapley_sql()
    with_v = pivot.selectExpr("*", *_split_top_level(v_defs))
    stack_args = ", ".join(
        f"'{c}', phi{i}" for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    return (
        with_v.selectExpr(
            "*", *[f"{p} AS phi{i}" for i, p in enumerate(phis)]
        )
        .selectExpr(f"stack({len(SHAPLEY_CHANNELS)}, {stack_args}) AS (channel, shapley_credit)")
    )


def _split_top_level(defs: str) -> list[str]:
    """Split the generated 'a AS v0, b AS v1, ...' on TOP-LEVEL commas
    (CASE bodies contain no commas here, but keep it robust)."""
    out, depth, cur = [], 0, []
    for ch in defs:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _shapley_oracle() -> str:
    v_defs, phis = _shapley_sql()
    n = len(SHAPLEY_CHANNELS)
    bit_sum = " + ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) * {1 << i}"
        for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    u_defs = ", ".join(
        f"COALESCE(MAX(CASE WHEN mask = {m} THEN n_users END), 0) AS u{m}"
        for m in range(1 << n)
    )
    c_defs = ", ".join(
        f"COALESCE(MAX(CASE WHEN mask = {m} THEN n_conv END), 0) AS c{m}"
        for m in range(1 << n)
    )
    selects = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, phi{i} AS shapley_credit FROM phi"
        for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    return f"""
WITH per_user AS (
  SELECT user_id, {bit_sum} AS mask,
         MAX(CASE WHEN event_type = '{SHAPLEY_CONVERSION}' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
stats AS (
  SELECT mask, COUNT(*) AS n_users, SUM(conv) AS n_conv
  FROM per_user GROUP BY mask
),
pvt AS (SELECT {u_defs}, {c_defs} FROM stats),
vals AS (SELECT *, {v_defs} FROM pvt),
phi AS (SELECT *, {", ".join(f"{p} AS phi{i}" for i, p in enumerate(phis))} FROM vals)
{selects}
"""


from ..registry import _REGISTRY as _BREG  # noqa: E402

_BREG["events_attribution_shapley"].oracle = _shapley_oracle()
