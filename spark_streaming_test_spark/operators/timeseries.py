"""Time-series regularization: resample to a fixed grid + forward fill.

Metric pipelines (and the feature-engineering side of training-data
work) constantly turn irregular event streams into fixed-interval
series: aggregate to a grid, materialize EVERY grid slot (gaps
included), and forward-fill observations so downstream models see a
dense matrix. The reference's 5-minute micro-batch windows
(``MainApp.java:26,38``) are the streaming cousin; this is the batch
form over the ``events`` fixture.

Three declarative steps, all Catalyst-visible:

1. hourly aggregate per series — one hash shuffle with map-side
   partial aggregation (deterministic decimal mean);
2. grid densification — per-series ``sequence(min, max, 1 hour)``
   exploded, LEFT JOIN observations; the grid frame is tiny
   (series x hours), so the join broadcasts the aggregate, never the
   corpus;
3. forward fill — ``last(value, ignorenulls=True)`` over an
   unbounded-preceding window per series, riding the same series
   partitioning as step 1.

Series key note: the fixture keys by ``event_type`` (6 series). At
100 TB the key would be a high-cardinality series id (host, metric,
user), which partitions cleanly; a 6-key production workload would
need salting — see ``operators/skew.py`` for the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.deterministic import davg, sql_davg
from ..registry import register


@register(
    "ts_resample_ffill",
    tags=("timeseries", "window", "gap-fill"),
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         {sql_davg('value')} AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
joined AS (
  SELECT g.event_type, g.h, hourly.v
  FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h
)
SELECT event_type, h, (v IS NOT NULL) AS observed,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
FROM joined
""",
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of ``events.value`` per event_type with every
    grid hour materialized and gaps forward-filled from the last
    observation. ``observed`` marks real vs filled slots.

    The filled value is a deterministic decimal mean, so the
    forward-fill copies bitwise-identical doubles on both engines."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(davg("value").alias("v"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = grid.join(F.broadcast(hourly), ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "h",
        F.col("v").isNotNull().alias("observed"),
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
    )
