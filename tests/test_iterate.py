"""iterate() harness contract (spark_streaming_test_spark/iterate.py).

The three lessons the harness encodes are each pinned: per-round
lineage truncation (plan size independent of round count — the
O(rounds²) broadcast-recompute class), correct fixpoint semantics for
monotone probes, and the refuse-to-emit-unconverged guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_test_spark.iterate import iterate, materialize


def _logical_size(df) -> int:
    return len(df._jdf.queryExecution().logical().toString())


def test_materialize_truncates_and_asserts(spark):
    out = materialize(spark.range(5).selectExpr("id * 3 AS x"))
    head = out._jdf.queryExecution().logical().toString().splitlines()[0]
    assert head.startswith("LogicalRDD")
    assert [r["x"] for r in out.orderBy("x").collect()] == [0, 3, 6, 9, 12]


def test_iterate_plan_size_independent_of_rounds(spark):
    """The O(rounds²) regression class: without per-round truncation,
    round k's plan embeds rounds 0..k-1 and grows without bound. With
    the harness, the final plan is one step over a LogicalRDD — the
    same size after 2 rounds as after 8."""
    base = spark.range(100).select(F.col("id").alias("v"))

    def step(cur, _i):
        return cur.groupBy((F.col("v") % 10).alias("g")).agg(
            F.sum("v").alias("v")
        ).select((F.col("g") + F.col("v")).alias("v"))

    s2 = _logical_size(iterate(base, step, 2))
    s8 = _logical_size(iterate(base, step, 8))
    assert s8 == s2, (s2, s8)
    # and an UNharnessed loop demonstrably grows (guards the test
    # itself against a future Spark that auto-truncates)
    cur = base
    for i in range(2):
        cur = step(cur, i)
    g2 = _logical_size(cur)
    cur = base
    for i in range(8):
        cur = step(cur, i)
    assert _logical_size(cur) > g2


def test_iterate_values_match_plain_loop(spark):
    base = spark.range(10).select(F.col("id").alias("v"))
    step = lambda cur, i: cur.select((F.col("v") * 2 + i).alias("v"))
    harnessed = iterate(base, step, 3, eager=False)
    plain = base
    for i in range(3):
        plain = step(plain, i)
    assert sorted(r["v"] for r in harnessed.collect()) == sorted(
        r["v"] for r in plain.collect()
    )


def test_iterate_probe_stops_at_fixpoint(spark):
    """A strictly monotone probe that stabilizes: the loop must return
    at the first repeat, not run the full budget."""
    base = spark.range(8).select(F.col("id").alias("v"))
    calls = []

    def step(cur, i):
        calls.append(i)
        # halve (integer) until everything is 0 — fixpoint after a few
        return cur.select((F.col("v") / 2).cast("bigint").alias("v"))

    out = iterate(
        base, step, 20, probe=lambda df: df.agg(F.sum("v")).collect()[0][0]
    )
    assert len(calls) < 20, "probe never stopped the loop"
    assert out.agg(F.sum("v")).collect()[0][0] == 0


def test_iterate_require_convergence_raises(spark):
    base = spark.range(4).select(F.col("id").alias("v"))
    step = lambda cur, _i: cur.select((F.col("v") + 1).alias("v"))  # never converges
    with pytest.raises(RuntimeError, match="unconverged"):
        iterate(
            base,
            step,
            3,
            probe=lambda df: df.agg(F.sum("v")).collect()[0][0],
            require_convergence=True,
        )
