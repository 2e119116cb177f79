"""Statistical-modeling aggregates: grouped OLS, A/B readout, winsorize.

The feature-engineering tail of a training pipeline needs small
closed-form statistics computed over huge groups: a per-segment trend
line (is `value` drifting with hour-of-day?), an experiment readout
(two-proportion z-test over hash-split variants), and outlier capping
(winsorization) before normalization. The reference engine stops at
sum/count (``MainApp.java:40-44``); these are the generalized
statistical family over the same shuffle shape.

Determinism: every moment (Sx, Sy, Sxy, Sxx, Syy) routes through the
fixed-point decimal sums in ``functions/deterministic`` — the derived
slope/intercept/r²/z are then IEEE divisions and square roots of
bitwise-identical doubles, so Spark and the DuckDB oracle agree without
any rounding.

Scale: each operator is ONE hash shuffle on the group key with map-side
partial aggregation — the shuffle carries O(groups x moments) partials,
never rows. Winsorization adds a rank window on the same partitioning,
so the sort rides the aggregation exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..functions.deterministic import _DEC, dsum, sql_dsum
from ..registry import register


@register(
    "agg_linreg_by_group",
    tags=("aggregate", "statistics", "regression"),
    oracle=f"""
WITH pts AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
         value AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {sql_dsum('x')} AS sx,
         {sql_dsum('y')} AS sy,
         {sql_dsum('x * y')} AS sxy,
         {sql_dsum('x * x')} AS sxx,
         {sql_dsum('y * y')} AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m
""",
)
def agg_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS of ``value`` on hour-of-day: slope, intercept,
    r² from the closed-form normal equations.

    Spark ships ``regr_slope``/``regr_r2``, but their streaming-mean
    update order varies with partitioning (non-reproducible last-ulp
    results at scale). Computing the five moments as exact decimal sums
    makes the fit reproducible run-to-run AND bitwise-comparable across
    engines — one shuffle either way."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    slope = cov_n / var_x
    return m.select(
        "event_type",
        n.cast("bigint").alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((cov_n * cov_n) / (var_x * (n * syy - sy * sy))).alias("r2"),
    )


@register(
    "ab_test_zscore",
    tags=("aggregate", "statistics", "experiment"),
    oracle="""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS converted
  FROM events
  GROUP BY user_id
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(converted) AS DOUBLE) AS conv
  FROM assigned GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS na,
         MAX(CASE WHEN variant = 'A' THEN conv END) AS ca,
         MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
         MAX(CASE WHEN variant = 'B' THEN conv END) AS cb
  FROM arms
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       ca / na AS rate_a, cb / nb AS rate_b,
       (ca / na - cb / nb)
         / NULLIF(sqrt(((ca + cb) / (na + nb)) * (1.0 - (ca + cb) / (na + nb))
                * (1.0 / na + 1.0 / nb)), 0.0) AS z,
       abs((ca / na - cb / nb)
         / NULLIF(sqrt(((ca + cb) / (na + nb)) * (1.0 - (ca + cb) / (na + nb))
                * (1.0 / na + 1.0 / nb)), 0.0)) > 1.96 AS significant
FROM wide
""",
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users hash-split 50/50 into variants by md5
    prefix (deterministic, replay-safe — the same property as
    ``sample_hash_deterministic``), per-user conversion = any
    high-value ``purchase`` event, then the pooled two-proportion
    z-test (denominator NULLIF-guarded for degenerate pools under
    ANSI mode).

    Scale shape: user-grain reduce (one shuffle on user_id, map-side
    combine), then a 2-row variant aggregate — the z arithmetic runs on
    a single final row. No driver-side math."""
    e = load(spark, sf_dir, "events")
    assigned = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 180),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                <= "7",
                "A",
            )
            .otherwise("B")
            .alias("variant"),
            "converted",
        )
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca, nb, cb = F.col("na"), F.col("ca"), F.col("nb"), F.col("cb")
    pool = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.nullif(
        F.sqrt(
            pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
        ),
        F.lit(0.0),
    )
    return wide.select(
        na.cast("bigint").alias("n_a"),
        ca.cast("bigint").alias("conv_a"),
        nb.cast("bigint").alias("n_b"),
        cb.cast("bigint").alias("conv_b"),
        (ca / na).alias("rate_a"),
        (cb / nb).alias("rate_b"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


WINS_LO = 0.05  # lower winsorization quantile
WINS_HI = 0.95  # upper winsorization quantile


@register(
    "agg_winsorize",
    tags=("aggregate", "statistics", "outliers"),
    oracle=f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rn = CAST(ceil({WINS_LO} * n) AS BIGINT)
                  THEN value END) AS lo,
         MAX(CASE WHEN rn = CAST(ceil({WINS_HI} * n) AS BIGINT)
                  THEN value END) AS hi,
         MAX(n) AS n
  FROM ranked GROUP BY event_type
),
clamped AS (
  SELECT r.event_type, b.lo, b.hi, b.n,
         CASE WHEN r.value < b.lo THEN b.lo
              WHEN r.value > b.hi THEN b.hi
              ELSE r.value END AS wv,
         CASE WHEN r.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN r.value > b.hi THEN 1 ELSE 0 END AS clip_hi
  FROM ranked r JOIN bounds b ON r.event_type = b.event_type
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       MAX(lo) AS lo, MAX(hi) AS hi,
       CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high,
       {sql_dsum('wv')} AS winsorized_sum
FROM clamped GROUP BY event_type
""",
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: cap ``value`` at the exact-rank 5th/95th
    percentile (rank = ceil(q*n) over a deterministic ``value,
    event_id`` order — no interpolation, so both engines pick the same
    concrete data point), report clip counts and the capped sum.

    Scale: the rank window, bound extraction, and final aggregate all
    share one ``event_type`` hash partitioning — a single exchange; the
    per-group bound frame is tiny and broadcasts back onto the rows."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(WINS_LO * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(WINS_HI * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    clamped = ranked.drop("n").join(F.broadcast(bounds.drop("n")), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("wv"),
        F.when(F.col("value") < F.col("lo"), 1).otherwise(0).alias("clip_lo"),
        F.when(F.col("value") > F.col("hi"), 1).otherwise(0).alias("clip_hi"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum("clip_lo").cast("bigint").alias("n_clipped_low"),
        F.sum("clip_hi").cast("bigint").alias("n_clipped_high"),
        dsum("wv").alias("winsorized_sum"),
    )


@register(
    "agg_gini_hhi",
    tags=("aggregate", "statistics", "concentration"),
    oracle="""
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(floor(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))))
              AS DECIMAL(14,0)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
  SELECT segment, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY segment
                                 ORDER BY x, o_custkey) AS DECIMAL(8,0)) AS i
  FROM spend
),
m AS (
  SELECT segment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(x * x) AS DOUBLE) AS sx2,
         CAST(SUM(i * x) AS DOUBLE) AS six
  FROM ranked GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n_customers, sx AS total_spend,
       (2.0 * six) / (n * sx) - (n + 1.0) / n AS gini,
       sx2 / (sx * sx) AS hhi
FROM m
""",
)
def agg_gini_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-concentration diagnostics per market segment: Gini
    coefficient (rank-sum closed form over ascending spend) and
    Herfindahl–Hirschman index (sum of squared shares, computed as
    sum(x^2)/sum(x)^2 so shares never materialize).

    Spend is floored to whole currency units so every moment — sum,
    sum of squares, rank-weighted sum — is exact integer-decimal
    arithmetic; the Gini/HHI ratios are then IEEE expressions over
    bitwise-identical doubles. Rank ties share equal x, so tie order
    cannot change the rank-sum — the tie-break exists purely for a
    total order. Shape: fact-dim equi-join, customer-grain reduce,
    rank window and final reduce on the same segment partitioning."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spend = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.floor(F.sum(F.col("o_totalprice").cast("decimal(12,2)")))
            .cast("decimal(14,0)")
            .alias("x")
        )
    )
    w = Window.partitionBy("segment").orderBy("x", "o_custkey")
    ranked = spend.select(
        "segment",
        "x",
        F.row_number().over(w).cast("decimal(8,0)").alias("i"),
    )
    m = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sx2"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("six"),
    )
    n, sx, sx2, six = F.col("n"), F.col("sx"), F.col("sx2"), F.col("six")
    return m.select(
        "segment",
        n.cast("bigint").alias("n_customers"),
        sx.alias("total_spend"),
        ((F.lit(2.0) * six) / (n * sx) - (n + F.lit(1.0)) / n).alias("gini"),
        (sx2 / (sx * sx)).alias("hhi"),
    )


WILSON_Z = 1.96  # 95% interval
WILSON_THRESH = 150  # "success" = value above this


@register(
    "agg_rate_wilson_ci",
    tags=("aggregate", "statistics", "confidence-interval"),
    oracle=f"""
WITH counts AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN value > {WILSON_THRESH} THEN 1 ELSE 0 END)
              AS DOUBLE) AS s
  FROM events GROUP BY event_type
),
-- NB: DuckDB parses bare 1.96 as DECIMAL(3,2); the z constant must be
-- cast to DOUBLE or z*z folds to an EXACT 3.8416 while Spark uses the
-- binary double product — a guaranteed last-ulp hash mismatch.
terms AS (
  SELECT event_type, n, s,
         CAST({WILSON_Z} AS DOUBLE) AS z,
         s / n AS p
  FROM counts
)
SELECT event_type,
       CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS successes,
       p AS rate,
       ((p + (z * z) / (2.0 * n))
          - z * sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n)))
         / (1.0 + (z * z) / n) AS wilson_lo,
       ((p + (z * z) / (2.0 * n))
          + z * sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n)))
         / (1.0 + (z * z) / n) AS wilson_hi
FROM terms
""",
)
def agg_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group success-rate estimate with a 95% Wilson score interval
    — the interval that stays sane at extreme rates and small n, which
    is what dashboards should quote instead of the textbook normal
    approximation.

    Integer counts in, one closed-form IEEE expression out: no float
    aggregation at all, so the result is bitwise stable under any
    partitioning. One map-side-combined shuffle on the group key."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when(F.col("value") > WILSON_THRESH, 1).otherwise(0)
        )
        .cast("double")
        .alias("s"),
    )
    n, s = F.col("n"), F.col("s")
    z2 = WILSON_Z * WILSON_Z
    p = s / n
    center = p + z2 / (2.0 * n)
    half = WILSON_Z * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    denom = 1.0 + z2 / n
    return counts.select(
        "event_type",
        n.cast("bigint").alias("n"),
        s.cast("bigint").alias("successes"),
        p.alias("rate"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


@register(
    "ab_test_welch_t",
    tags=("aggregate", "statistics", "experiment"),
    oracle=f"""
WITH assigned AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         value
  FROM events WHERE event_type = 'purchase'
),
arms AS (
  SELECT variant,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {sql_dsum('value')} AS s,
         {sql_dsum('value * value')} AS s2
  FROM assigned GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS na,
         MAX(CASE WHEN variant = 'A' THEN s END) AS sa,
         MAX(CASE WHEN variant = 'A' THEN s2 END) AS sa2,
         MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
         MAX(CASE WHEN variant = 'B' THEN s END) AS sb,
         MAX(CASE WHEN variant = 'B' THEN s2 END) AS sb2
  FROM arms
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       sa / na AS mean_a, sb / nb AS mean_b,
       (sa / na - sb / nb)
         / NULLIF(sqrt(
             ((sa2 - sa * sa / na) / (na - 1.0)) / na
             + ((sb2 - sb * sb / nb) / (nb - 1.0)) / nb), 0.0) AS t,
       abs((sa / na - sb / nb)
         / NULLIF(sqrt(
             ((sa2 - sa * sa / na) / (na - 1.0)) / na
             + ((sb2 - sb * sb / nb) / (nb - 1.0)) / nb), 0.0)) > 1.96
         AS significant
FROM wide
""",
)
def ab_test_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase VALUE between the
    same hash-split variants as :func:`ab_test_zscore` — the
    compare-the-means readout to its compare-the-rates one. Sample
    variances come from exact decimal power sums; the t statistic is a
    single IEEE expression on the final 1-row frame (df is large here,
    so the 1.96 normal cutoff is the standard reading)."""
    e = load(spark, sf_dir, "events")
    assigned = e.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "value",
    )
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("value").alias("s"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("variant") == "A", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("s"))).alias("sb"),
        F.max(F.when(F.col("variant") == "B", F.col("s2"))).alias("sb2"),
    )
    na, sa, sa2 = F.col("na"), F.col("sa"), F.col("sa2")
    nb, sb, sb2 = F.col("nb"), F.col("sb"), F.col("sb2")
    se = F.sqrt(
        ((sa2 - sa * sa / na) / (na - 1.0)) / na
        + ((sb2 - sb * sb / nb) / (nb - 1.0)) / nb
    )
    t = (sa / na - sb / nb) / F.nullif(se, F.lit(0.0))
    return wide.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        (sa / na).alias("mean_a"),
        (sb / nb).alias("mean_b"),
        t.alias("t"),
        (F.abs(t) > 1.96).alias("significant"),
    )


MAD_K = 1.4826  # normal-consistency constant for MAD-sigma
MAD_FLAG = 3.5  # |robust z| flag threshold


@register(
    "events_anomaly_mad",
    tags=("aggregate", "statistics", "outliers", "robust"),
    oracle=f"""
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.event_id, r.value,
         abs(r.value - m.median) AS adev, m.median
  FROM ranked r JOIN med m ON r.event_type = m.event_type
),
dev_ranked AS (
  SELECT event_type, event_id, value, median, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
  FROM dev_ranked GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.value, d.median, m.mad,
       (d.value - d.median)
         / NULLIF(CAST({MAD_K} AS DOUBLE) * m.mad, 0.0) AS robust_z,
       abs((d.value - d.median)
         / NULLIF(CAST({MAD_K} AS DOUBLE) * m.mad, 0.0)) > {MAD_FLAG}
         AS is_outlier
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE abs((d.value - d.median)
         / NULLIF(CAST({MAD_K} AS DOUBLE) * m.mad, 0.0)) > {MAD_FLAG}
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: flag rows
    whose |value - median| exceeds {MAD_FLAG} MAD-sigmas (MAD * 1.4826,
    the normal-consistent robust sigma). Unlike the z-score twin
    (``ts_anomaly_zscore``), one extreme value cannot inflate the
    spread it is judged against — the estimator the anomaly literature
    actually recommends for contaminated data.

    Both medians are exact lower-middle rank picks over a total order
    (no interpolation — structural cross-engine equality, same trick as
    ``agg_winsorize``/``window_moving_median``); the constant is
    DOUBLE-cast in the oracle because bare decimals would fold exactly
    where Spark's double literal does not. Two rank windows + two joins
    all share the event_type partitioning — one corpus exchange, and
    the per-group median/MAD frames broadcast."""
    e = load(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"),
                F.col("value"),
            )
        ).alias("median")
    )
    dev = ranked.drop("rn", "n").join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "median",
        F.abs(F.col("value") - F.col("median")).alias("adev"),
    )
    wa = Window.partitionBy("event_type").orderBy("adev", "event_id")
    dev_ranked = dev.select(
        "event_type",
        "adev",
        F.row_number().over(wa).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = dev_ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"),
                F.col("adev"),
            )
        ).alias("mad")
    )
    z = (F.col("value") - F.col("median")) / F.nullif(
        F.lit(MAD_K) * F.col("mad"), F.lit(0.0)
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > MAD_FLAG)
        .select(
            "event_type",
            "event_id",
            "value",
            "median",
            "mad",
            z.alias("robust_z"),
            (F.abs(z) > MAD_FLAG).alias("is_outlier"),
        )
    )


CHI2_CRIT_DOF4 = 9.488  # chi-square 95% critical value at dof=4
CHI2_DP = 8


@register(
    "ab_test_chi_square",
    tags=("aggregate", "statistics", "experiment"),
    oracle=f"""
WITH cells AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         event_type,
         CAST(COUNT(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT c.variant, c.event_type, c.o,
         SUM(c.o) OVER (PARTITION BY c.variant) AS row_tot,
         SUM(c.o) OVER (PARTITION BY c.event_type) AS col_tot,
         SUM(c.o) OVER () AS n
  FROM cells c
),
terms AS (
  SELECT CAST(round(
           (o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
             / (row_tot * col_tot / n), {CHI2_DP + 2})
         AS DECIMAL(25,{CHI2_DP + 2})) AS term,
         n
  FROM margins
)
SELECT round(CAST(SUM(term) AS DOUBLE), {CHI2_DP}) AS chi2,
       CAST(4 AS INTEGER) AS dof,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(term) AS DOUBLE) > {CHI2_CRIT_DOF4} AS significant
FROM terms
""",
)
def ab_test_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the variant x event-type
    contingency table (did the hash split change behavioral mix?) —
    the categorical counterpart to the z/t readouts above.

    Margins come from window sums over the 10-cell table (integer
    counts — exact); each (O-E)^2/E term is an IEEE expression over
    identical doubles, quantized to decimal before the final sum so the
    10-term addition is order-independent. dof = (2-1)(5-1) = 4; the
    flag compares against the 95% critical value. SUM(o) window totals
    are exact integer-valued doubles, so no decimal plumbing is needed
    upstream of the terms."""
    e = load(spark, sf_dir, "events")
    cells = e.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "event_type",
    ).groupBy("variant", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    margins = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("variant")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("event_type")).alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = F.round(
        (F.col("o") - exp) * (F.col("o") - exp) / exp, CHI2_DP + 2
    ).cast(f"decimal(25,{CHI2_DP + 2})")
    terms = margins.select(term.alias("term"), "n")
    return terms.agg(
        F.round(F.sum("term").cast("double"), CHI2_DP).alias("chi2"),
        F.lit(4).cast("int").alias("dof"),
        F.max("n").cast("bigint").alias("n"),
        (F.sum("term").cast("double") > CHI2_CRIT_DOF4).alias("significant"),
    )


KS_ALPHA_C = 1.358  # critical coefficient at alpha = 0.05


@register(
    "ab_test_ks",
    tags=("aggregate", "statistics", "experiment"),
    oracle=f"""
WITH vals AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         value
  FROM events WHERE event_type = 'purchase'
),
per_value AS (
  SELECT value,
         CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM vals GROUP BY value
),
tot AS (
  SELECT CAST(SUM(ca) AS DOUBLE) AS na, CAST(SUM(cb) AS DOUBLE) AS nb
  FROM per_value
),
steps AS (
  SELECT CAST(SUM(ca) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum_a,
         CAST(SUM(cb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum_b
  FROM per_value
)
SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       MAX(abs(s.cum_a / t.na - s.cum_b / t.nb)) AS ks_d,
       CAST({KS_ALPHA_C} AS DOUBLE)
         * sqrt((t.na + t.nb) / (t.na * t.nb)) AS ks_crit,
       MAX(abs(s.cum_a / t.na - s.cum_b / t.nb))
         > CAST({KS_ALPHA_C} AS DOUBLE)
           * sqrt((t.na + t.nb) / (t.na * t.nb)) AS reject_same_dist
FROM steps s CROSS JOIN tot t
GROUP BY t.na, t.nb
""",
)
def ab_test_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test on purchase values between
    the hash-split variants: D = sup |F_A - F_B| over the pooled value
    grid, against the alpha=0.05 critical line — the
    whole-distribution readout that catches shape changes the mean
    tests (z, t) miss entirely.

    The ECDFs are cumulative integer counts over per-value partials
    (the cumulative window runs on the value DOMAIN, not the corpus —
    for continuous data, quantize to a grid first, as
    ``agg_histogram`` does); D is a max over exact count ratios.
    Everything after the user-grain reduce runs on the domain frame."""
    e = load(spark, sf_dir, "events")
    vals = e.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "value",
    )
    per_value = vals.groupBy("value").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = per_value.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    wcum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    steps = per_value.select(
        F.sum("ca").over(wcum).cast("double").alias("cum_a"),
        F.sum("cb").over(wcum).cast("double").alias("cum_b"),
    )
    na, nb = F.col("na"), F.col("nb")
    crit = F.lit(KS_ALPHA_C) * F.sqrt((na + nb) / (na * nb))
    d = F.max(F.abs(F.col("cum_a") / na - F.col("cum_b") / nb))
    return (
        steps.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            d.alias("ks_d"),
            F.first(crit).alias("ks_crit"),
            (d > F.first(crit)).alias("reject_same_dist"),
        )
        .select(
            na.cast("bigint").alias("n_a"),
            nb.cast("bigint").alias("n_b"),
            "ks_d",
            "ks_crit",
            "reject_same_dist",
        )
    )


@register(
    "agg_spearman_corr",
    tags=("aggregate", "statistics", "correlation"),
    oracle="""
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS total_spend
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
ranked AS (
  SELECT c_nationkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal, c_custkey) AS DOUBLE)
           AS rx,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                 ORDER BY total_spend, c_custkey) AS DOUBLE)
           AS ry
  FROM spend
),
m AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(rx * ry AS BIGINT)) AS DOUBLE) AS sxy
  FROM ranked GROUP BY c_nationkey
)
SELECT c_nationkey AS nationkey, CAST(n AS BIGINT) AS n_customers,
       (12.0 * sxy - 3.0 * n * (n + 1.0) * (n + 1.0))
         / NULLIF(n * (n * n - 1.0), 0.0) AS spearman_rho
FROM m WHERE n >= 3
""",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between account balance and realized
    spend per nation — does the static balance field actually track
    customer value? Rank-based, so outliers and nonlinearity (which
    wreck ``agg_corr_manual``'s Pearson) don't distort it.

    With tie-broken integer ranks both marginals are exact
    permutations of 1..n, so the closed form collapses to
    ``rho = (12*sum(rx*ry) - 3n(n+1)^2) / (n(n^2-1))`` — INTEGER
    arithmetic up to one final division (rank products < 2^53 for any
    realistic group). Two rank windows share the nation partitioning;
    one fact-dim join feeds them."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("total_spend")
        )
    )
    wx = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wy = Window.partitionBy("c_nationkey").orderBy(
        "total_spend", "c_custkey"
    )
    ranked = spend.select(
        "c_nationkey",
        F.row_number().over(wx).cast("double").alias("rx"),
        F.row_number().over(wy).cast("double").alias("ry"),
    )
    m = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("rx") * F.col("ry")).cast("bigint"))
        .cast("double")
        .alias("sxy"),
    )
    n, sxy = F.col("n"), F.col("sxy")
    rho = (12.0 * sxy - 3.0 * n * (n + 1.0) * (n + 1.0)) / F.nullif(
        n * (n * n - 1.0), F.lit(0.0)
    )
    return m.filter(n >= 3).select(
        F.col("c_nationkey").alias("nationkey"),
        n.cast("bigint").alias("n_customers"),
        rho.alias("spearman_rho"),
    )


PARETO_DECILES = 10


@register(
    "agg_concentration_curve",
    tags=("aggregate", "statistics", "concentration"),
    oracle=f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS x
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x,
         ROW_NUMBER() OVER (ORDER BY x DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS n
  FROM spend
),
cum AS (
  SELECT rn, n,
         SUM(x) OVER (ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_x,
         SUM(x) OVER () AS tot
  FROM ranked
)
SELECT CAST(decile AS INTEGER) AS top_pct_decile,
       CAST(MAX(rn) AS BIGINT) AS n_customers,
       CAST(MAX(cum_x) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE)
         AS revenue_share
FROM (
  SELECT *, CAST(ceil({PARETO_DECILES}.0 * rn / n) AS BIGINT) AS decile
  FROM cum
)
GROUP BY decile
""",
)
def agg_concentration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/Lorenz) curve: customers sorted by
    spend descending, cumulative revenue share at each top-N% decile —
    the "do 20% of customers drive 80% of revenue?" readout that
    complements the scalar ``agg_gini_hhi`` with the actual curve.

    Exact decimal spend all the way through BOTH cumulative sums; the
    decile share is one integer-ratio division per output row. Both
    the rank and the running revenue sum are computed DISTRIBUTED
    (``distributed_prefix_sum``: range partitions + local running
    sums + broadcast offsets — exact because decimal addition is
    associative), so even 10^9 customers never funnel through a
    single-task sort (the r12 raw-grain global-window migration)."""
    from .evalmetrics import distributed_prefix_sum

    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("x")
    )
    cum = distributed_prefix_sum(
        spend, [F.col("x").desc(), "o_custkey"], "x"
    ).select(
        F.col("_rnk").alias("rn"),
        F.col("_nt").alias("n"),
        F.col("_cum").alias("cum_x"),
        F.col("_tot").alias("tot"),
    )
    decile = F.ceil(
        F.lit(float(PARETO_DECILES)) * F.col("rn") / F.col("n")
    ).cast("bigint")
    return (
        cum.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.max("rn").cast("bigint").alias("n_customers"),
            (
                F.max("cum_x").cast("double")
                / F.max("tot").cast("double")
            ).alias("revenue_share"),
        )
        .select(
            F.col("decile").cast("int").alias("top_pct_decile"),
            "n_customers",
            "revenue_share",
        )
    )


# --- Kaplan–Meier survival (time-to-convert with censoring) ----------------

KM_DP = 8
KM_HORIZON = "2024-01-31"  # observation cutoff: non-converters censor here


@register(
    "events_survival_km",
    tags=("mlstats", "survival", "behavior"),
    oracle=f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
cohort AS (
  SELECT user_id,
         CASE WHEN t_purchase >= t_signup
              THEN date_diff('day', t_signup, t_purchase) END AS t_event,
         date_diff('day', t_signup, TIMESTAMP '{KM_HORIZON}') AS t_censor
  FROM firsts WHERE t_signup IS NOT NULL
),
durations AS (
  SELECT user_id,
         COALESCE(t_event, t_censor) AS dur,
         t_event IS NOT NULL AS converted
  FROM cohort WHERE COALESCE(t_event, t_censor) >= 0
),
risk AS (
  SELECT dur AS t,
         SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS d,
         COUNT(*) AS leaving,
         SUM(COUNT(*)) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING)
           AS n_at_risk
  FROM durations GROUP BY dur
),
terms AS (
  SELECT t, d, n_at_risk,
         CASE WHEN d > 0
              THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk), {KM_DP})
              ELSE 0.0 END AS log_term
  FROM risk
),
surv AS (
  SELECT t, d, n_at_risk,
         CAST(SUM(CAST(log_term AS DECIMAL(25,{KM_DP})))
              OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS cum_log
  FROM terms
)
SELECT CAST(t AS INTEGER) AS day,
       CAST(d AS BIGINT) AS n_converted,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       round(exp(cum_log), {KM_DP}) AS survival
FROM surv WHERE d > 0
""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for signup→purchase conversion WITH
    censoring — the estimator `events_time_to_convert`'s percentiles
    silently get wrong by ignoring users who haven't converted YET:
    non-converters stay in the risk set until the observation horizon,
    so S(t) is unbiased. Output: per conversion day, the events, the
    risk set, and the survival estimate (1 − S = conversion CDF).

    Scale: one user-grain reduce (first signup/purchase), one
    duration-grain reduce (O(horizon days) rows), then windows over
    that tiny frame — risk sets come from a DESCENDING cumulative
    count, the product Π(1 − d/n) moves to log space where each term
    rounds at {KM_DP} dp (ln of a count ratio — generic) and
    accumulates as exact decimals; exp + a final generic round
    restores the curve. Integer durations everywhere else."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    cohort = firsts.filter(F.col("t_signup").isNotNull()).select(
        F.when(
            F.col("t_purchase") >= F.col("t_signup"),
            F.datediff("t_purchase", "t_signup"),
        ).alias("t_event"),
        F.datediff(F.lit(KM_HORIZON).cast("timestamp"), F.col("t_signup")).alias(
            "t_censor"
        ),
    )
    durations = cohort.select(
        F.coalesce("t_event", "t_censor").alias("dur"),
        F.col("t_event").isNotNull().alias("converted"),
    ).filter(F.col("dur") >= 0)
    wdesc = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = (
        durations.groupBy("dur")
        .agg(
            F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("d"),
            F.count(F.lit(1)).alias("leaving"),
        )
        .withColumn("n_at_risk", F.sum("leaving").over(wdesc))
    )
    log_term = F.when(
        F.col("d") > 0,
        F.round(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_at_risk")), KM_DP
        ),
    ).otherwise(0.0)
    wasc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = risk.withColumn("log_term", log_term).withColumn(
        "cum_log",
        F.sum(F.col("log_term").cast(f"decimal(25,{KM_DP})"))
        .over(wasc)
        .cast("double"),
    )
    return surv.filter(F.col("d") > 0).select(
        F.col("dur").cast("int").alias("day"),
        F.col("d").cast("bigint").alias("n_converted"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.round(F.exp("cum_log"), KM_DP).alias("survival"),
    )


# --- sequential probability ratio test (SPRT) ------------------------------
# H0: conversion = 0.20 vs H1: 0.25, alpha = beta = 0.05. All
# transcendental constants are PRE-COMPUTED double literals inlined
# identically into both engines (the Benford-probabilities convention).
SPRT_LLR_CONV = 0.22314355131420976      # ln(0.25 / 0.20)
SPRT_LLR_NOCONV = -0.06453852113757118   # ln(0.75 / 0.80)
SPRT_BOUND = 2.9444389791664403          # ln(0.95 / 0.05)
SPRT_STEP = 10                           # report every 10th observation


@register(
    "ab_test_sprt",
    tags=("mlstats", "experimentation", "sequential"),
    oracle=f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         MIN(ts) AS first_seen,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
ordered AS (
  SELECT variant, converted,
         ROW_NUMBER() OVER (PARTITION BY variant
                            ORDER BY first_seen, user_id) AS i,
         SUM(converted) OVER (PARTITION BY variant
                              ORDER BY first_seen, user_id
                              ROWS UNBOUNDED PRECEDING) AS conv_cum
  FROM users
),
scored AS (
  SELECT variant, i, conv_cum,
         conv_cum * CAST({SPRT_LLR_CONV} AS DOUBLE)
           + (i - conv_cum) * CAST({SPRT_LLR_NOCONV} AS DOUBLE) AS llr
  FROM ordered
)
SELECT variant, CAST(i AS BIGINT) AS n_observed,
       CAST(conv_cum AS BIGINT) AS n_converted, llr,
       CASE WHEN llr >= CAST({SPRT_BOUND} AS DOUBLE) THEN 'accept_H1'
            WHEN llr <= -CAST({SPRT_BOUND} AS DOUBLE) THEN 'accept_H0'
            ELSE 'continue' END AS decision
FROM scored WHERE i % {SPRT_STEP} = 0
""",
)
def ab_test_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over the conversion
    experiment — the always-valid alternative to the fixed-horizon
    z-test (`ab_test_zscore`): the log-likelihood ratio accumulates
    in user-arrival order and the experiment STOPS the moment it
    crosses ±ln((1−β)/α), typically far before the fixed sample size.
    Output is the decision trajectory at every {SPRT_STEP}th
    observation per variant.

    Determinism: because the hypotheses are Bernoulli, the cumulative
    LLR collapses to counts × two PRE-COMPUTED literal constants —
    no per-row transcendental at all, so a window cumsum of integers
    carries the whole test. One exchange on variant serves the
    ordering window and the trajectory."""
    ev = load(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        ).otherwise("B"),
    )
    w = Window.partitionBy("variant").orderBy("first_seen", "user_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered = users.select(
        "variant",
        F.row_number().over(w).alias("i"),
        F.sum("converted").over(run).alias("conv_cum"),
    )
    llr = F.col("conv_cum") * SPRT_LLR_CONV + (
        F.col("i") - F.col("conv_cum")
    ) * SPRT_LLR_NOCONV
    return (
        ordered.withColumn("llr", llr)
        .filter(F.col("i") % SPRT_STEP == 0)
        .select(
            "variant",
            F.col("i").cast("bigint").alias("n_observed"),
            F.col("conv_cum").cast("bigint").alias("n_converted"),
            "llr",
            F.when(F.col("llr") >= SPRT_BOUND, "accept_H1")
            .when(F.col("llr") <= -SPRT_BOUND, "accept_H0")
            .otherwise("continue")
            .alias("decision"),
        )
    )


# --- deterministic Poisson bootstrap --------------------------------------

BOOT_B = 100          # resamples; CI = 3rd / 98th ranked resample mean
BOOT_LO, BOOT_HI = 3, 98
# Poisson(1) CDF at k = 0..5, 8-dp literals (inverse-CDF ladder for the
# per-row resample weight). Identical literals inline in both engines —
# no exp() executes at query time.
_POIS_CDF = [
    "0.36787944", "0.73575888", "0.91969860",
    "0.98101184", "0.99634015", "0.99940582",
]
_W_CASE = (
    "CASE "
    + " ".join(f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF))
    + " ELSE 6 END"
)


@register(
    "agg_bootstrap_ci",
    tags=("mlstats", "statistics", "bootstrap"),
    oracle=f"""
WITH hashed AS (
  SELECT event_type, value,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS h0
  FROM events
),
fan AS (
  SELECT h.event_type, h.value, bs.b,
         ((h.h0 * (2 * bs.b + 1)) % 4294967296) / 4294967296.0 AS u
  FROM hashed h
  CROSS JOIN (SELECT unnest(range(0, {BOOT_B})) AS b) bs
),
weighted AS (
  SELECT event_type, b, value, {_W_CASE} AS w FROM fan
),
per_b AS (
  SELECT event_type, b,
         {sql_dsum('w * value')} / CAST(SUM(w) AS DOUBLE) AS mean_b
  FROM weighted GROUP BY event_type, b
  HAVING SUM(w) > 0
),
ranked AS (
  SELECT event_type, mean_b,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mean_b, b) AS rn
  FROM per_b
),
ci AS (
  SELECT event_type,
         MIN(CASE WHEN rn = {BOOT_LO} THEN mean_b END) AS ci_lo,
         MIN(CASE WHEN rn = {BOOT_HI} THEN mean_b END) AS ci_hi,
         COUNT(*) AS n_boot
  FROM ranked GROUP BY event_type
),
fmean AS (
  SELECT event_type, {sql_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS mean_full
  FROM events GROUP BY event_type
)
SELECT f.event_type, f.mean_full, c.ci_lo, c.ci_hi,
       CAST(c.n_boot AS BIGINT) AS n_boot
FROM fmean f JOIN ci c ON f.event_type = c.event_type
""",
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the per-stream mean via a
    DETERMINISTIC Poisson bootstrap: each row's weight in resample b is
    the Poisson(1) inverse-CDF of a hash-derived uniform — the
    replay-safe form of the resampling trick that works when the data
    cannot be held, indexed, or shuffled per-resample (the standard
    n-out-of-n bootstrap needs global indices; Poisson weights need
    only the row itself).

    The uniform is md5-hashed ONCE per row and scrambled per resample
    by multiplicative hashing (h0·(2b+1) mod 2³²) — odd multipliers
    are bijections of the ring, so each resample sees a full-entropy
    permutation of the row hashes at the cost of one multiply, not one
    md5, per (row, resample). (A Spark-side measurement: per-pair md5
    made this query ~6× slower for identical statistics.)

    Scale: the ×{BOOT_B} fan-out is immediately reduced by a map-side-
    combined aggregate — the shuffle carries O(streams × {BOOT_B} ×
    tasks) decimal partials, never the fanned rows. Resample means are
    exact-decimal sums over identical weights, CI endpoints are
    exact-rank selections among {BOOT_B} means — bitwise reproducible
    across engines, partitionings, and reruns.

    Optimization r13 (guide §2.3/2.5 — shuffle/scan-stage work in the
    cheapest representation): ``spread`` parallelizes the fan-out (a
    single-file test input serialized the whole ×{BOOT_B} explode +
    partial aggregate onto one core — measured: one 4.3 s task, 31
    idle); the fanned rows then carry the UNSCALED LONG of
    ``CAST(value AS DECIMAL(25,6))`` instead of paying a per-row
    double→decimal cast and BigDecimal add — exact integer arithmetic,
    reconstructed to the identical decimal (and double bits) per
    resample. Valid because events.value sits on the 2-dp grid
    (pinned by tests/test_plans.py::test_bootstrap_value_grid_invariant
    directly against the fixture data), so ``CAST(w*value AS DEC)`` ==
    ``w * CAST(value
    AS DEC)`` — w ≤ 6 keeps the product within half an ulp of the
    grid — and |Σ w·vu| < 2^53 at any per-group cardinality this fan
    produces. The inverse-CDF ladder compares the integer hash against
    precomputed ``ceil(c·2^32)`` thresholds — the same predicate as
    ``u < c`` (u = h1/2^32 is exact, division by a power of two)
    without materializing the double."""
    ev = spread(load(spark, sf_dir, "events"))
    hashed = ev.select(
        "event_type",
        (F.col("value").cast(_DEC) * 1000000).cast("long").alias("vu"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h0"),
    )
    fan = hashed.select(
        "event_type",
        "vu",
        "h0",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    ).withColumn(
        "h1", (F.col("h0") * (2 * F.col("b") + 1)) % F.lit(4294967296)
    )
    # ceil(c * 2^32) for each CDF literal's double value: h1 < T[k]
    # <=> h1/2^32 < c (exact — see docstring).
    _T = [1580030164, 3160060328, 3950075410, 4213413770, 4279248360, 4292415313]
    w_expr = F.lit(6)
    for k in range(len(_T) - 1, -1, -1):
        w_expr = F.when(F.col("h1") < _T[k], k).otherwise(w_expr)
    weighted = fan.withColumn("w", w_expr)
    per_b = (
        weighted.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("vu")).alias("swu"),
            F.sum("w").alias("nw"),
        )
        .filter(F.col("nw") > 0)
        .select(
            "event_type",
            "b",
            (
                (F.col("swu").cast("decimal(32,6)") / F.lit(1000000)).cast(
                    "double"
                )
                / F.col("nw").cast("double")
            ).alias("mean_b"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("mean_b", "b")
    ranked = per_b.withColumn("rn", F.row_number().over(wr))
    ci = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == BOOT_LO, F.col("mean_b"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == BOOT_HI, F.col("mean_b"))).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_boot"),
    )
    full = ev.groupBy("event_type").agg(
        (dsum("value") / F.count(F.lit(1)).cast("double")).alias("mean_full")
    )
    return full.join(ci, "event_type").select(
        "event_type", "mean_full", "ci_lo", "ci_hi", "n_boot"
    )


# --- sample-ratio-mismatch guardrail --------------------------------------

SRM_CRIT = 3.841  # chi-square(1 dof) critical value at alpha = 0.05


@register(
    "ab_test_srm_check",
    tags=("mlstats", "experimentation", "guardrail"),
    oracle=f"""
WITH assigned AS (
  SELECT DISTINCT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant
  FROM events
),
counts AS (
  SELECT
    CAST(COUNT(CASE WHEN variant = 'A' THEN 1 END) AS BIGINT) AS n_a,
    CAST(COUNT(CASE WHEN variant = 'B' THEN 1 END) AS BIGINT) AS n_b
  FROM assigned
)
SELECT n_a, n_b,
       CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) AS chi2,
       CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) > {SRM_CRIT}
         AS srm_detected
FROM counts
""",
)
def ab_test_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST check of any A/B
    readout: under a 50/50 hash split the user counts must match up to
    chance; chi²(1) = (n_a − n_b)²/(n_a + n_b) above {SRM_CRIT} means
    the assignment itself is broken (bot filtering, logging loss,
    redirect bias) and every downstream metric is untrustworthy.

    Same md5-bucket assignment as ``ab_test_zscore``; reduces to two
    integer counts (one user-grain distinct + conditional count), the
    statistic is one rational expression — exact cross-engine."""
    assigned = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                <= "7",
                "A",
            )
            .otherwise("B")
            .alias("variant"),
        )
    )
    counts = assigned.agg(
        F.count(F.when(F.col("variant") == "A", 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("variant") == "B", 1)).cast("bigint").alias("n_b"),
    )
    diff = F.col("n_a") - F.col("n_b")
    chi2 = diff.cast("double") * diff / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "n_a", "n_b", chi2.alias("chi2"), (chi2 > SRM_CRIT).alias("srm_detected")
    )


# --- delta-method CI for ratio metrics ------------------------------------


@register(
    "ab_test_ratio_delta_method",
    tags=("mlstats", "experimentation", "ratio"),
    oracle="""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE) AS x,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
mom AS (
  SELECT variant,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(x * y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(y * y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS syy
  FROM assigned GROUP BY variant
),
est AS (
  SELECT variant, n, sx / sy AS ratio,
         (sxx - sx * sx / n) / (n - 1) AS vx,
         (syy - sy * sy / n) / (n - 1) AS vy,
         (sxy - sx * sy / n) / (n - 1) AS cxy,
         sy / n AS ybar
  FROM mom
),
dm AS (
  SELECT variant, CAST(n AS BIGINT) AS n_users, ratio,
         (vx - 2 * ratio * cxy + ratio * ratio * vy)
           / (n * ybar * ybar) AS var_ratio
  FROM est
)
SELECT variant, n_users, ratio, var_ratio,
       ratio - CAST(1.96 AS DOUBLE) * sqrt(var_ratio) AS ci_lo,
       ratio + CAST(1.96 AS DOUBLE) * sqrt(var_ratio) AS ci_hi
FROM dm
""",
)
def ab_test_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue per
    event) under the A/B hash split — the estimator experimentation
    platforms need because ratio metrics violate the i.i.d.-per-row
    assumption (numerator and denominator are correlated within a
    user): Var(X̄/Ȳ) ≈ (s_x² − 2R·s_xy + R²·s_y²)/(n·ȳ²) from
    user-grain moments.

    Determinism: user totals are exact decimal sums; second moments
    quantize the double products ONCE at scale 4 (the safe-scale rule
    — the products are true multiples of 10⁻⁴, so rounding recovers
    them exactly) and accumulate as decimals; everything after is IEEE
    arithmetic on identical doubles, including the literal-cast 1.96.
    Shape: user-grain reduce → O(variants) moment rows → closed form."""
    ev = load(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "x",
        "y",
    )
    dec6, dec4 = "decimal(25,6)", "decimal(30,4)"
    mom = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec6)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec6)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 4).cast(dec4))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast(dec4))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("y") * F.col("y"), 4).cast(dec4))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    ratio = F.col("sx") / F.col("sy")
    est = mom.select(
        "variant",
        n,
        ratio.alias("ratio"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)).alias("vx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)).alias("vy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)).alias("cxy"),
        (F.col("sy") / n).alias("ybar"),
    )
    var_ratio = (
        F.col("vx")
        - 2 * F.col("ratio") * F.col("cxy")
        + F.col("ratio") * F.col("ratio") * F.col("vy")
    ) / (F.col("n") * F.col("ybar") * F.col("ybar"))
    dm = est.select(
        "variant",
        F.col("n").cast("bigint").alias("n_users"),
        "ratio",
        var_ratio.alias("var_ratio"),
    )
    z = F.lit(1.96)
    return dm.select(
        "variant",
        "n_users",
        "ratio",
        "var_ratio",
        (F.col("ratio") - z * F.sqrt("var_ratio")).alias("ci_lo"),
        (F.col("ratio") + z * F.sqrt("var_ratio")).alias("ci_hi"),
    )


# --- CUPED variance reduction ---------------------------------------------

CUPED_SPLIT_TS = "2024-01-08"  # pre-period / experiment-period boundary


@register(
    "ab_test_cuped",
    tags=("mlstats", "experimentation", "variance-reduction"),
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(SUM(CAST(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT_TS}'
                            THEN value ELSE 0 END AS DECIMAL(25,6)))
              AS DOUBLE) AS x,
         CAST(SUM(CAST(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT_TS}'
                            THEN value ELSE 0 END AS DECIMAL(25,6)))
              AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
pooled AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * x, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(x * y, 4) AS DECIMAL(30,4))) AS DOUBLE) AS sxy
  FROM per_user
),
theta AS (
  SELECT n, sx / n AS xbar,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th
  FROM pooled
),
adj AS (
  SELECT u.variant,
         COUNT(*) AS n_users,
         CAST(SUM(CAST(round(u.y - t.th * (u.x - t.xbar), 6)
                       AS DECIMAL(25,6))) AS DOUBLE) AS s_adj,
         CAST(SUM(CAST(u.y AS DECIMAL(25,6))) AS DOUBLE) AS s_raw
  FROM per_user u CROSS JOIN theta t
  GROUP BY u.variant
)
SELECT variant, CAST(n_users AS BIGINT) AS n_users,
       s_raw / n_users AS mean_raw,
       s_adj / n_users AS mean_cuped
FROM adj
""",
)
def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: adjust each user's experiment-period
    metric by their PRE-period covariate, ŷ = y − θ(x − x̄) with
    θ = cov(x,y)/var(x) — the industry-standard trick that shrinks A/B
    confidence intervals ~30-50% for returning users without touching
    the treatment effect (E[adjustment] = 0).

    θ and x̄ come from pooled user-grain moments (one tiny frame,
    broadcast back); adjusted values are generically rounded at 6 dp
    (θ is an irrational ratio — tie-free) then decimal-summed, so the
    adjusted means are bitwise stable. Two aggregate passes over the
    user grain, zero extra fact-table scans."""
    ev = load(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT_TS).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        dsum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias(
            "x"
        ),
        dsum(
            F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)
        ).alias("y"),
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= "7",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "x",
        "y",
    )
    dec6, dec4 = "decimal(25,6)", "decimal(30,4)"
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec6)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec6)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 4).cast(dec4))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast(dec4))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    theta = pooled.select(
        n,
        (F.col("sx") / n).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / n)
            / (F.col("sxx") - F.col("sx") * F.col("sx") / n)
        ).alias("th"),
    )
    adj = (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.round(
                    F.col("y") - F.col("th") * (F.col("x") - F.col("xbar")), 6
                ).cast(dec6)
            )
            .cast("double")
            .alias("s_adj"),
            F.sum(F.col("y").cast(dec6)).cast("double").alias("s_raw"),
        )
    )
    return adj.select(
        "variant",
        F.col("n_users").cast("bigint").alias("n_users"),
        (F.col("s_raw") / F.col("n_users")).alias("mean_raw"),
        (F.col("s_adj") / F.col("n_users")).alias("mean_cuped"),
    )


# --- one-way ANOVA --------------------------------------------------------

ANOVA_DP = 6


@register(
    "agg_anova_oneway",
    tags=("mlstats", "statistics", "anova"),
    oracle=f"""
WITH grp AS (
  SELECT event_type,
         COUNT(*) AS n_g,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s_g,
         CAST(SUM(CAST(round(value * value, 4) AS DECIMAL(30,4)))
              AS DOUBLE) AS ss_g
  FROM events GROUP BY event_type
),
terms AS (
  SELECT n_g, s_g, ss_g,
         CAST(round(s_g * s_g / n_g, {ANOVA_DP})
              AS DECIMAL(30,{ANOVA_DP})) AS mean_sq_term
  FROM grp
),
tot AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(CAST(round(s_g, {ANOVA_DP})
                       AS DECIMAL(30,{ANOVA_DP}))) AS DOUBLE) AS s,
         CAST(SUM(CAST(round(ss_g, {ANOVA_DP})
                       AS DECIMAL(30,{ANOVA_DP}))) AS DOUBLE) AS ss,
         CAST(SUM(mean_sq_term) AS DOUBLE) AS between_raw
  FROM terms
)
SELECT CAST(k AS INTEGER) AS k_groups, n,
       round(between_raw - s * s / n, {ANOVA_DP}) AS ss_between,
       round(ss - between_raw, {ANOVA_DP}) AS ss_within,
       round(((between_raw - s * s / n) / (k - 1))
             / ((ss - between_raw) / (n - k)), {ANOVA_DP}) AS f_stat,
       round((between_raw - s * s / n) / (ss - s * s / n), {ANOVA_DP})
         AS eta_squared
FROM tot
""",
)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event streams: does mean ``value`` differ
    between groups more than within-group noise explains? F =
    (SSB/(k−1))/(SSW/(N−k)) plus η² effect size — the k-group
    generalization of the two-sample t/z tests already in this family,
    and the screen run before per-group models are justified.

    Everything reduces to per-group power sums (exact decimal s_g,
    once-quantized ss_g); the k-row combination rounds each term
    generically before decimal-summing so the tiny final aggregate is
    order-invariant, and the closed forms divide identical doubles."""
    grp = load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("s_g"),
        F.sum(F.round(F.col("value") * F.col("value"), 4).cast("decimal(30,4)"))
        .cast("double")
        .alias("ss_g"),
    )
    dec = f"decimal(30,{ANOVA_DP})"
    terms = grp.select(
        "n_g",
        "s_g",
        "ss_g",
        F.round(F.col("s_g") * F.col("s_g") / F.col("n_g"), ANOVA_DP)
        .cast(dec)
        .alias("mean_sq_term"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(F.round("s_g", ANOVA_DP).cast(dec)).cast("double").alias("s"),
        F.sum(F.round("ss_g", ANOVA_DP).cast(dec)).cast("double").alias("ss"),
        F.sum("mean_sq_term").cast("double").alias("between_raw"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = F.col("between_raw") - F.col("s") * F.col("s") / n
    ssw = F.col("ss") - F.col("between_raw")
    sst = F.col("ss") - F.col("s") * F.col("s") / n
    return tot.select(
        k.cast("int").alias("k_groups"),
        n,
        F.round(ssb, ANOVA_DP).alias("ss_between"),
        F.round(ssw, ANOVA_DP).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), ANOVA_DP).alias("f_stat"),
        F.round(ssb / sst, ANOVA_DP).alias("eta_squared"),
    )


# --- Benjamini–Hochberg FDR correction ------------------------------------

BH_ALPHA = "0.05"


@register(
    "mlstats_fdr_bh",
    tags=("mlstats", "statistics", "multiple-testing"),
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         {sql_dsum('value')} AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.d AS di, b.d AS dj,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
fut AS (SELECT event_type, di AS d, SUM(s) AS a_t FROM pairs GROUP BY 1, 2),
pst AS (SELECT event_type, dj AS d, SUM(s) AS b_t FROM pairs GROUP BY 1, 2),
steps AS (
  SELECT dd.event_type, dd.d,
         COALESCE(f.a_t, 0) - COALESCE(p.b_t, 0) AS step
  FROM daily dd
  LEFT JOIN fut f ON dd.event_type = f.event_type AND dd.d = f.d
  LEFT JOIN pst p ON dd.event_type = p.event_type AND dd.d = p.d
),
cum AS (
  SELECT event_type,
         SUM(step) OVER (PARTITION BY event_type ORDER BY d
                         ROWS UNBOUNDED PRECEDING) AS u_t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM steps
),
pvals AS (
  SELECT event_type,
         round(least(CAST(1.0 AS DOUBLE),
               2 * exp((-6.0 * MAX(abs(u_t)) * MAX(abs(u_t)))
               / (CAST(MAX(n) AS DOUBLE)*MAX(n)*MAX(n)
                  + CAST(MAX(n) AS DOUBLE)*MAX(n)))), 8) AS p
  FROM cum GROUP BY event_type
),
ranked AS (
  SELECT event_type, p,
         ROW_NUMBER() OVER (ORDER BY p, event_type) AS i,
         COUNT(*) OVER () AS m
  FROM pvals
),
cutoff AS (
  SELECT COALESCE(MAX(CASE WHEN p <= CAST({BH_ALPHA} AS DOUBLE) * i / m
                           THEN i END), 0) AS i_star
  FROM ranked
)
SELECT r.event_type, r.p AS p_value,
       CAST(r.i AS INTEGER) AS rank,
       CAST(CAST({BH_ALPHA} AS DOUBLE) * r.i / r.m AS DOUBLE) AS bh_threshold,
       r.i <= c.i_star AS significant_fdr
FROM ranked r CROSS JOIN cutoff c
""",
)
def mlstats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction over a FAMILY of hypothesis
    tests — here the per-stream Pettitt change-point p-values — the
    step every metrics platform needs once it runs dozens of tests per
    release: reject the i smallest p-values up to the largest i with
    p_(i) ≤ α·i/m, controlling the EXPECTED false-discovery fraction
    instead of Bonferroni's family-wise overkill.

    The p-value family reduces each stream to one row (the Pettitt
    machinery); BH itself is a rank window + one cutoff scalar over
    the m-row frame — free at any family size that fits a test
    dashboard. All comparisons are between identical doubles."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
        )
        .agg(dsum("value").alias("y"))
    )
    a = daily.select("event_type", F.col("d").alias("di"), F.col("y").alias("yi"))
    b = daily.select("event_type", F.col("d").alias("dj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("di") < F.col("dj"))
        .select(
            "event_type",
            "di",
            "dj",
            F.when(F.col("yj") > F.col("yi"), 1)
            .when(F.col("yj") < F.col("yi"), -1)
            .otherwise(0)
            .alias("s"),
        )
    )
    fut = pairs.groupBy("event_type", F.col("di").alias("d")).agg(
        F.sum("s").alias("a_t")
    )
    pst = pairs.groupBy("event_type", F.col("dj").alias("d")).agg(
        F.sum("s").alias("b_t")
    )
    steps = (
        daily.select("event_type", "d")
        .join(fut, ["event_type", "d"], "left")
        .join(pst, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            (F.coalesce("a_t", F.lit(0)) - F.coalesce("b_t", F.lit(0))).alias(
                "step"
            ),
        )
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cum = steps.withColumn("u_t", F.sum("step").over(wc)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    kmax = F.max(F.abs("u_t"))
    n_d = F.max("n").cast("double")
    # least(1, ...): the asymptotic approximation 2*exp(-6K^2/...) exceeds
    # 1 for small K — clamp so BH ranks operate on valid p-values
    # (mirrored in the oracle SQL).
    pvals = cum.groupBy("event_type").agg(
        F.round(
            F.least(
                F.lit(1.0),
                2.0
                * F.exp(
                    (-6.0 * kmax * kmax)
                    / (n_d * F.max("n") * F.max("n") + n_d * F.max("n"))
                ),
            ),
            8,
        ).alias("p")
    )
    wr = Window.orderBy("p", "event_type")
    wm = Window.partitionBy()
    ranked = pvals.withColumn("i", F.row_number().over(wr)).withColumn(
        "m", F.count(F.lit(1)).over(wm)
    )
    alpha = F.expr(f"CAST({BH_ALPHA} AS DOUBLE)")
    cutoff = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= alpha * F.col("i") / F.col("m"), F.col("i"))),
            F.lit(0),
        ).alias("i_star")
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        F.col("p").alias("p_value"),
        F.col("i").cast("int").alias("rank"),
        (alpha * F.col("i") / F.col("m")).cast("double").alias("bh_threshold"),
        (F.col("i") <= F.col("i_star")).alias("significant_fdr"),
    )


# --- Mahalanobis outliers (closed-form 2x2 precision matrix) ----------------

MAHA_TOPK = 20
MAHA_DP = 8


@register(
    "ml_mahalanobis_outliers",
    tags=("ml", "outliers", "stats"),
    oracle=f"""
WITH feat AS (
  SELECT event_id, value AS x1,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x2
  FROM events
),
mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {sql_dsum('x1')} AS s1, {sql_dsum('x2')} AS s2,
         {sql_dsum('x1 * x1')} AS s11,
         {sql_dsum('x2 * x2')} AS s22,
         {sql_dsum('x1 * x2')} AS s12
  FROM feat
),
cov AS (
  SELECT n, s1 / n AS mu1, s2 / n AS mu2,
         s11 / n - (s1 / n) * (s1 / n) AS c11,
         s22 / n - (s2 / n) * (s2 / n) AS c22,
         s12 / n - (s1 / n) * (s2 / n) AS c12
  FROM mom
),
scored AS (
  SELECT f.event_id,
         round(((f.x1 - mu1) * (f.x1 - mu1) * c22
                - 2 * (f.x1 - mu1) * (f.x2 - mu2) * c12
                + (f.x2 - mu2) * (f.x2 - mu2) * c11)
               / (c11 * c22 - c12 * c12), {MAHA_DP}) AS d2
  FROM feat f CROSS JOIN cov
)
SELECT event_id, d2 FROM (
  SELECT event_id, d2,
         ROW_NUMBER() OVER (ORDER BY d2 DESC, event_id) AS rn
  FROM scored
) r WHERE rn <= {MAHA_TOPK}
""",
)
def ml_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outliers by Mahalanobis distance over (value,
    hour-of-day) with the 2x2 precision matrix in CLOSED FORM —
    d^2 = [(dx1)^2 c22 - 2 dx1 dx2 c12 + (dx2)^2 c11] / det(C) — so
    no matrix inversion library is needed and the whole score is one
    mirrored IEEE expression. This is the correlation-aware upgrade of
    per-column z-scores: a point can be ordinary in each marginal but
    extreme against the joint ellipse (and vice versa).

    Scale: ONE decimal-exact moment aggregate (map-side combined,
    6 numbers) broadcast onto the scoring scan; top-{MAHA_TOPK} fuses
    to TakeOrderedAndProject. Moments quantize through the fixed-point
    decimal path so the covariance is identical on both engines;
    d^2 rounds at {MAHA_DP} dp before the rank so tie order can't
    diverge. Higher dimensions follow the same shape with the
    precision matrix solved driver-side on the broadcast O(d^2)
    moment frame (bounded sufficient statistic)."""
    feat = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("x1"),
        F.hour("ts").cast("double").alias("x2"),
    )
    mom = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x1").alias("s1"),
        dsum("x2").alias("s2"),
        dsum(F.col("x1") * F.col("x1")).alias("s11"),
        dsum(F.col("x2") * F.col("x2")).alias("s22"),
        dsum(F.col("x1") * F.col("x2")).alias("s12"),
    )
    cov = mom.select(
        (F.col("s1") / F.col("n")).alias("mu1"),
        (F.col("s2") / F.col("n")).alias("mu2"),
        (F.col("s11") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))).alias("c11"),
        (F.col("s22") / F.col("n") - (F.col("s2") / F.col("n")) * (F.col("s2") / F.col("n"))).alias("c22"),
        (F.col("s12") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s2") / F.col("n"))).alias("c12"),
    )
    dx1 = F.col("x1") - F.col("mu1")
    dx2 = F.col("x2") - F.col("mu2")
    d2 = F.round(
        (
            dx1 * dx1 * F.col("c22")
            - F.lit(2) * dx1 * dx2 * F.col("c12")
            + dx2 * dx2 * F.col("c11")
        )
        / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")),
        MAHA_DP,
    )
    scored = feat.crossJoin(F.broadcast(cov)).select(
        "event_id", d2.alias("d2")
    )
    w = Window.orderBy(F.col("d2").desc(), F.col("event_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAHA_TOPK)
        .select("event_id", "d2")
    )
