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


ANOM_WIN = 20  # trailing rows in the reference window
ANOM_MIN = 5  # minimum trailing observations before scoring
ANOM_Z = 3.0  # |z| flag threshold
Z_DP = 8


@register(
    "ts_anomaly_zscore",
    tags=("timeseries", "window", "anomaly"),
    oracle=f"""
WITH w AS (
  SELECT user_id, event_id, ts, value,
         COUNT(*) OVER trail AS n,
         {{dsum}} AS s,
         {{dsum2}} AS s2
  FROM events
  WINDOW trail AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts, value,
       CAST(n AS BIGINT) AS n_ref,
       round((value - s / n)
             / sqrt(s2 / n - (s / n) * (s / n)), {Z_DP}) AS z,
       abs((value - s / n)
           / sqrt(s2 / n - (s / n) * (s / n))) > {ANOM_Z} AS is_anomaly
FROM w
WHERE n >= {ANOM_MIN}
  AND s2 / n - (s / n) * (s / n) > 0
""".format(
        dsum="CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER trail AS DOUBLE)",
        dsum2="CAST(SUM(CAST(value * value AS DECIMAL(25,6))) OVER trail"
        " AS DOUBLE)",
    ),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    mean/std of its user's trailing {ANOM_WIN} observations (excluding
    itself); |z| > {ANOM_Z} flags the point. Rows with fewer than
    {ANOM_MIN} references or zero variance are unscoreable and dropped.

    One hash exchange on user_id; both trailing sums ride the same
    window frame, so Spark evaluates a single WindowExec. Sums are
    decimal-exact (value has 2 decimals, value² has 4 — both
    near-integer at scale 6), so mean/std/z are IEEE ops on identical
    doubles cross-engine; z rounds at {Z_DP} dp."""
    e = load(spark, sf_dir, "events")
    trail = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_WIN, -1)
    )
    dec = "decimal(25,6)"
    n = F.count(F.lit(1)).over(trail)
    s = F.sum(F.col("value").cast(dec)).over(trail).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast(dec))
        .over(trail)
        .cast("double")
    )
    mu = s / n
    var = s2 / n - mu * mu
    z = (F.col("value") - mu) / F.sqrt(var)
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            n.alias("n_ref"),
            F.round(z, Z_DP).alias("z"),
            (F.abs(z) > ANOM_Z).alias("is_anomaly"),
            var.alias("_var"),
        )
        .filter((F.col("n_ref") >= ANOM_MIN) & (F.col("_var") > 0))
        .drop("_var")
    )
