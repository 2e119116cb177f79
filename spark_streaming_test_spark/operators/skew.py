"""Skew-mitigation operators: salting for hot keys.

At 100 TB a handful of hot keys (one NIC carrying most traffic, one
event_type dominating the stream — precisely the reference's workload
shape, where a busy NIC dwarfs the others) turns a shuffle into one
straggler task. Two standard mitigations, both expressed declaratively
so results are bit-identical to the unsalted plan:

  * salted two-phase aggregation — spread each key over N salt buckets,
    partially aggregate (key, salt), then re-aggregate by key. The first
    shuffle's widest partition shrinks by ~N×; the second shuffle moves
    only N rows per key. Decimal partial sums keep the re-aggregation
    exact (see functions/deterministic.py).
  * salted (replicated) join — explode the small side N× (one copy per
    salt), key the big side by a deterministic per-row salt, join on
    (key, salt). Each hot key's probe rows spread over N tasks instead
    of one. This is what AQE skew-join does adaptively at runtime
    (enabled in session.py); the explicit form covers the cases AQE
    can't see — e.g. skew appearing after a preceding operator, or
    streaming state partitioning.

Salts are deterministic (xxhash64 of a high-cardinality sibling column,
never rand()) so replays and retries produce identical partitioning —
required for exactly-once sinks and for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register

N_SALTS = 16


def salt_of(col: Column | str, n: int = N_SALTS) -> Column:
    """Deterministic salt in [0, n): hash a high-cardinality column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_sum_by_key(
    df: DataFrame, key: str, value: str, salt_src: str, n: int = N_SALTS
) -> DataFrame:
    """Two-phase skew-safe sum: groupBy(key, salt) partial -> groupBy(key)
    final. Returns (key, total). Exact: decimal partial sums re-added in
    the final phase are associative."""
    partial = (
        df.withColumn("_salt", salt_of(salt_src, n))
        .groupBy(key, "_salt")
        .agg(F.sum(F.col(value).cast("decimal(25,6)")).alias("_partial"))
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").cast("double").alias("total")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n: int = N_SALTS,
) -> DataFrame:
    """Replicated-small-side skew join on ``key``: small side exploded
    n× with every salt value, big side salted deterministically, equi-
    join on (key, salt). Output = plain inner join on key (salt columns
    dropped)."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    salted_big = big.withColumn("_salt", salt_of(salt_src, n))
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


@register(
    "agg_salted_sum",
    tags=("skew", "agg"),
    oracle=f"""
SELECT event_type, {sql_dsum('value')} AS total
FROM events
GROUP BY event_type
""",
)
def agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-event-type totals over the 5-hot-key events table —
    bit-identical to the naive groupBy (the DuckDB oracle is the naive
    form), with the hot keys spread over 16 salt buckets."""
    ev = load(spark, sf_dir, "events")
    return (
        salted_sum_by_key(ev, key="event_type", value="value", salt_src="event_id")
        .select("event_type", "total")
    )


@register(
    "join_salted_skew",
    tags=("skew", "join"),
    oracle=f"""
WITH dim AS (
  SELECT event_type, COUNT(*) AS type_count
  FROM events GROUP BY event_type
)
SELECT e.event_type, d.type_count, {sql_dsum('e.value')} AS total_value
FROM events e
JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type, d.type_count
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on the 5-value event_type key (every key is
    hot: ~n/5 rows each). The dim side replicates 16×; fact rows spread
    by event_id hash. The post-join aggregate is itself salted-safe
    because the join output carries the salt's spread. Result equals the
    plain join+aggregate, verified by oracle."""
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_count"))
    joined = salted_join(
        ev.select("event_type", "event_id", "value"),
        dim,
        key="event_type",
        salt_src="event_id",
    )
    return (
        joined.groupBy("event_type", "type_count")
        .agg(dsum("value").alias("total_value"))
    )
