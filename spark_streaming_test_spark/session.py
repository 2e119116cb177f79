"""SparkSession factory tuned for this engine.

Local mode is the test harness; the conf is written for a real cluster:
AQE handles skew/coalescing at 100 TB, shuffle partitions are sized by
``SPARK_GRAFT_CPUS`` locally (a cluster deployment overrides via
``--conf``), Arrow is on for every Pandas-UDF exchange, and the session
timezone is pinned UTC so event-time semantics are deployment-independent
(and match the DuckDB oracle, which is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "spark_streaming_test_spark") -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    # Before the JVM launches: make google.protobuf importable (vendored
    # shim if the real wheel is absent) so transformWithStateInPandas
    # workers can speak the state-server protocol. No-op afterwards.
    from spark_streaming_test_spark.protoshim import ensure_protobuf

    ensure_protobuf()
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle sizing: ~1 partition per core locally. On a 1000-executor
        # cluster this is overridden upward (target ~128MB per shuffle
        # partition); AQE coalesces down at runtime either way.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # Adaptive execution: runtime coalescing, skew-join splitting, and
        # dynamic join-strategy switching — load-bearing at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        # Arrow for all Python<->JVM batch exchange (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic event-time semantics + DuckDB-oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet timestamps as written (driver data is µs/ns naive).
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.ui.enabled", "false")
    )
    if "SPARK_GRAFT_DRIVER_MEMORY" in os.environ:
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEMORY"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# --- cross-query state reset (bench/sweep harness isolation) -------------------

# Module caches that hold localCheckpointed DataFrames ACROSS query
# invocations (basket items, co-purchase edges, HITS pairs). Harnesses
# that unpersist RDD blocks between queries must clear these first:
# a cached frame whose checkpoint blocks were dropped is unrecoverable
# (lineage truncated), so the next cache hit would throw
# CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
_CROSS_QUERY_FRAME_CACHES: list[dict] = []


def register_frame_cache(cache: dict) -> dict:
    """Register a module-level DataFrame cache for harness resets."""
    _CROSS_QUERY_FRAME_CACHES.append(cache)
    return cache


def reset_query_state(spark: SparkSession) -> None:
    """Full cross-query isolation for benchmarking/sweeping: clear
    every registered frame cache, the SQL cache manager, and ALL
    persisted RDD blocks (catalog.clearCache does not touch RDD-layer
    localCheckpoint persistence — measured: 60+ queries' accumulated
    checkpoints slowed suite-tail iterative queries ~1.7x)."""
    for cache in _CROSS_QUERY_FRAME_CACHES:
        cache.clear()
    spark.catalog.clearCache()
    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jrdds.keySet().toArray()):
        jrdds.get(rid).unpersist()
