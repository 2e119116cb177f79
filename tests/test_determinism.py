"""Reproducibility gate: float aggregates must be BITWISE identical
under any partitioning (the functions/deterministic.py contract — at
100 TB, partition counts change with AQE/cluster size on every run, and
a training pipeline that emits different bytes per run is broken)."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql import functions as F

from spark_streaming_test_spark.catalog import load
from spark_streaming_test_spark.functions.deterministic import dsum


def _bits(x: float) -> str:
    return struct.pack("d", x).hex()


@pytest.mark.parametrize("n_parts", [1, 7, 32])
def test_dsum_bitwise_stable_across_partitionings(spark, sf_dir, n_parts):
    li = load(spark, sf_dir, "lineitem").repartition(n_parts)
    got = {
        r["l_returnflag"]: _bits(r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(dsum("l_extendedprice").alias("s"))
        .collect()
    }
    base = {
        r["l_returnflag"]: _bits(r["s"])
        for r in load(spark, sf_dir, "lineitem")
        .coalesce(1)
        .groupBy("l_returnflag")
        .agg(dsum("l_extendedprice").alias("s"))
        .collect()
    }
    assert got == base


def test_naive_double_sum_is_why_dsum_exists(spark, sf_dir):
    """Documents the failure mode dsum prevents: naive double SUM over
    different partition orders is allowed to differ in the last ulp.
    (Not asserted to differ — just asserted dsum stays equal where the
    naive sum is merely 'close'.)"""
    li = load(spark, sf_dir, "lineitem")
    a = li.repartition(13).agg(F.sum("l_extendedprice")).collect()[0][0]
    b = li.coalesce(1).agg(F.sum("l_extendedprice")).collect()[0][0]
    assert abs(a - b) / abs(b) < 1e-12  # close, but not guaranteed bit-equal
    da = li.repartition(13).agg(dsum("l_extendedprice")).collect()[0][0]
    db = li.coalesce(1).agg(dsum("l_extendedprice")).collect()[0][0]
    assert _bits(da) == _bits(db)


@pytest.mark.parametrize("n_parts", [2, 16])
def test_hash_sampling_invariant_to_partitioning(spark, sf_dir, n_parts):
    from spark_streaming_test_spark.registry import queries

    q = queries()["sample_hash_deterministic"]
    ids_base = {r["doc_id"] for r in q(spark, sf_dir).collect()}
    d = load(spark, sf_dir, "documents").repartition(n_parts)
    d.createOrReplaceTempView("__docs_reparted")
    ids_rep = {
        r["doc_id"]
        for r in d.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= "19"
        ).collect()
    }
    assert ids_base == ids_rep


def test_pagerank_invariant_to_shuffle_partitions(spark, sf_dir):
    """Fixed-point integer PageRank must produce bit-identical ranks
    at any parallelism — the property the int64 formulation buys
    (float PageRank differs in the last ulp across partition counts)."""
    from spark_streaming_test_spark.operators import graph

    def run():
        return sorted(
            (r["node_id"], r["rank"], r["degree"])
            for r in graph.graph_pagerank(spark, sf_dir).collect()
        )

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        r1 = run()
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        r2 = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert r1 == r2


@pytest.mark.parametrize(
    "qname",
    [
        "ts_cusum_shift",
        "ts_ewma_smooth",
        "ts_holt_linear",
        "agg_linreg_by_group",
        "emb_pca_power",
        "mlstats_auc_roc",
        "mlstats_logloss_brier",
        "geo_radius_join",
        "graph_connected_components",
        "mm_avg_hash_dedup",
        "sample_temperature_mixture",
        "stream_late_data_accounting",
        "sim_mmr_diversify",
        "ts_forecast_accuracy",
        "dq_psi_drift",
        "window_time_weighted_avg",
    ],
)
def test_round3_ops_bitwise_stable_across_shuffle_partitions(
    spark, sf_dir, qname
):
    """The round-3 decimal-exact/fixed-point operators must emit the
    SAME BYTES when the shuffle partition count changes — the property
    their docstrings claim. Floats compare by bit pattern, not ==."""
    from spark_streaming_test_spark.registry import all_queries

    fn = all_queries()[qname].fn

    def snapshot(n_parts: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            rows = fn(spark, sf_dir).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        out = []
        for r in rows:
            canon = tuple(
                _bits(v) if isinstance(v, float) else v
                for v in r
            )
            out.append(canon)
        return sorted(out, key=repr)

    assert snapshot(3) == snapshot(32)
