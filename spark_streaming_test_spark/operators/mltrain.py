"""Distributed model TRAINING on the engine — full-batch gradient
descent for logistic regression, the missing member of the ML family
(`mlstats.py` evaluates models; `llm/features.py` builds features; this
trains one).

Generalizes the reference's aggregate-then-decide loop (sum-by-key →
threshold routing, ``MainApp.java:38-49``) to the statistical version:
each iteration is ONE aggregation over the data (the gradient — a
sufficient statistic), followed by an O(1) driver-side update of a
kilobyte parameter vector. That is exactly the shape that scales:
at 100 TB an iteration is a map-side-combined scan producing
``n_features`` decimal partials per task, the shuffle carries only
partials, and the driver never sees data — only gradients (the same
scalar-collect pattern as the reference's limits lookup).

Determinism, cross-engine: gradients pass through the fixed-point
decimal sum (`functions/deterministic.py`), so partial order can't
perturb them; sigmoid/log inputs are bitwise-identical doubles on both
engines (literal weights, identical feature arithmetic), and every
weight update is the same IEEE expression ``w - lr*(G/n)``. The DuckDB
oracle unrolls the fixed iteration count into MATERIALIZED CTE pairs
(gradient, update) — the same technique as the Lloyd k-means oracle in
``llm/clustering.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register

LR_ITERS = 3
LR_RATE = 0.5
LR_LABEL = "purchase"  # y = 1 for this event type

# Features: intercept, scaled value, scaled hour-of-day.
_SQL_FEAT = f"""
  SELECT CASE WHEN event_type = '{LR_LABEL}' THEN 1.0 ELSE 0.0 END AS y,
         value / 100.0 AS x1,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) / 24.0 AS x2
  FROM events
"""


def _sql_logreg_oracle() -> str:
    """Unrolled gradient-descent twin: g{i} aggregates the gradient and
    loss at the weights of it{i-1}; it{i} applies the update."""
    parts = [f"feat AS MATERIALIZED ({_SQL_FEAT})"]
    parts.append("it0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2)")
    for i in range(1, LR_ITERS + 1):
        parts.append(f"""g{i} AS MATERIALIZED (
  SELECT {sql_dsum('(p - y) * 1.0')} AS G0,
         {sql_dsum('(p - y) * x1')} AS G1,
         {sql_dsum('(p - y) * x2')} AS G2,
         {sql_dsum('-(y * ln(p) + (1.0 - y) * ln(1.0 - p))')} AS L,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM (
    SELECT f.y, f.x1, f.x2,
           1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2))) AS p
    FROM feat f CROSS JOIN it{i - 1} w
  ) s
)""")
        parts.append(f"""it{i} AS (
  SELECT w.w0 - {LR_RATE} * (g.G0 / g.n) AS w0,
         w.w1 - {LR_RATE} * (g.G1 / g.n) AS w1,
         w.w2 - {LR_RATE} * (g.G2 / g.n) AS w2,
         g.L / g.n AS loss
  FROM it{i - 1} w CROSS JOIN g{i} g
)""")
    body = ",\n".join(parts)
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS iter, loss, w0, w1, w2 FROM it{i}"
        for i in range(1, LR_ITERS + 1)
    )
    return f"WITH {body}\n{selects}"


@register(
    "ml_logreg_train_gd",
    tags=("ml", "training", "iterative"),
    oracle=_sql_logreg_oracle(),
)
def ml_logreg_train_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch gradient descent for logistic regression
    (y = [event is '{LR_LABEL}'], features = intercept, value/100,
    hour/24), {LR_ITERS} iterations at rate {LR_RATE}.

    Per iteration: ONE distributed aggregation produces the 3-component
    gradient and the mean log-loss (decimal-exact partial sums; the
    shuffle carries O(features x tasks) partials, never rows); the
    weight update runs driver-side on the kilobyte parameter vector.
    Output: (iter, loss_before_update, post-update weights) per
    iteration — the training curve itself, so convergence is part of
    the verified result."""
    feat = load(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == LR_LABEL, 1.0).otherwise(0.0).alias("y"),
        (F.col("value") / 100.0).alias("x1"),
        (F.hour("ts").cast("double") / 24.0).alias("x2"),
    )
    w = [0.0, 0.0, 0.0]
    out = []
    for it in range(1, LR_ITERS + 1):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        p = 1.0 / (1.0 + F.exp(-z))
        stats = feat.select(
            "y", "x1", "x2", p.alias("p")
        ).agg(
            dsum((F.col("p") - F.col("y")) * 1.0).alias("G0"),
            dsum((F.col("p") - F.col("y")) * F.col("x1")).alias("G1"),
            dsum((F.col("p") - F.col("y")) * F.col("x2")).alias("G2"),
            dsum(
                -(
                    F.col("y") * F.log("p")
                    + (1.0 - F.col("y")) * F.log(1.0 - F.col("p"))
                )
            ).alias("L"),
            F.count(F.lit(1)).cast("double").alias("n"),
        ).collect()[0]
        n = stats["n"]
        loss = stats["L"] / n
        w = [
            w[0] - LR_RATE * (stats["G0"] / n),
            w[1] - LR_RATE * (stats["G1"] / n),
            w[2] - LR_RATE * (stats["G2"] / n),
        ]
        out.append((it, loss, w[0], w[1], w[2]))
    return spark.createDataFrame(
        out, "iter int, loss double, w0 double, w1 double, w2 double"
    )
