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

from ..catalog import load
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
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
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
    ev = load(spark, sf_dir, "events")
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
