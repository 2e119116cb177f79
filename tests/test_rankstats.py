"""Semantic tests for the rank/agreement-statistics family — invariants
the cross-engine parity hash can't express (both engines could be
identically wrong; these pin the math to ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_test_spark.catalog import load
from spark_streaming_test_spark.operators import graph as graph_ops
from spark_streaming_test_spark.operators import rankstats


def test_kruskal_mean_rank_conservation(spark, sf_dir):
    """The n_j-weighted mean of the group mean-ranks must equal the
    grand mean rank (N+1)/2 EXACTLY (twice-rank integers make the
    weighted sum an exact integer identity), and the tie-corrected H
    is nonnegative and finite."""
    rows = rankstats.agg_kruskal_wallis(spark, sf_dir).collect()
    n_total = rows[0]["n_total"]
    assert sum(r["n_j"] for r in rows) == n_total
    weighted = sum(r["mean_rank"] * r["n_j"] for r in rows)
    assert abs(weighted - n_total * (n_total + 1) / 2.0) < 1e-6 * n_total
    for r in rows:
        assert r["h_stat"] >= 0.0
        assert r["h_adj"] >= r["h_stat"]  # tie correction divides by <= 1


def test_kruskal_matches_scipy_formula(spark, sf_dir):
    """Recompute H from raw data with an independent O(n log n) Python
    implementation (average ranks via sort) and compare."""
    vals = [
        (r["value"], r["event_type"])
        for r in load(spark, sf_dir, "events").select("value", "event_type").collect()
    ]
    svals = sorted(v for v, _ in vals)
    # average rank per value (1-based, ties averaged)
    import collections

    first = {}
    count = collections.Counter(svals)
    pos = 0
    for v in svals:
        if v not in first:
            first[v] = pos
        pos += 1
    avg_rank = {v: first[v] + (count[v] + 1) / 2.0 for v in count}
    groups = collections.defaultdict(list)
    for v, g in vals:
        groups[g].append(avg_rank[v])
    n = len(vals)
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(rs)) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    tie = sum(t**3 - t for t in count.values())
    h_adj = h / (1 - tie / (n**3 - n))
    row = rankstats.agg_kruskal_wallis(spark, sf_dir).collect()[0]
    assert abs(row["h_stat"] - h) < 1e-8 * max(1.0, abs(h))
    assert abs(row["h_adj"] - h_adj) < 1e-8 * max(1.0, abs(h_adj))


def test_kappa_bounds_and_identity(spark, sf_dir):
    """kappa must satisfy its own defining identity on the emitted
    po/pe columns, and perfect agreement would give kappa = 1."""
    row = rankstats.mlstats_cohens_kappa(spark, sf_dir).collect()[0]
    assert 0.0 <= row["po"] <= 1.0
    assert 0.0 < row["pe"] < 1.0
    assert row["kappa"] <= 1.0
    assert abs(row["kappa"] - (row["po"] - row["pe"]) / (1 - row["pe"])) < 1e-12
    assert row["n_agree"] <= row["n_docs"]


def test_mcnemar_cells_partition_corpus(spark, sf_dir):
    """The four agreement cells partition the document set; the
    continuity-corrected statistic is nonnegative."""
    row = rankstats.mlstats_mcnemar(spark, sf_dir).collect()[0]
    n_docs = load(spark, sf_dir, "documents").count()
    assert row["n11"] + row["b"] + row["c"] + row["n00"] == n_docs
    if row["b"] + row["c"] > 0:
        assert row["chi2_cc"] >= 0.0


def test_hits_normalization_and_coverage(spark, sf_dir):
    """Max-normalization makes the best hub and best authority score
    exactly 1.0; every purchasing customer and every selling supplier
    gets a score in (0, 1]."""
    rows = graph_ops.graph_hits(spark, sf_dir).collect()
    hubs = [r for r in rows if r["role"] == "hub"]
    auths = [r for r in rows if r["role"] == "authority"]
    assert hubs and auths
    assert max(r["score"] for r in hubs) == 1.0
    assert max(r["score"] for r in auths) == 1.0
    for r in rows:
        assert 0.0 < r["score"] <= 1.0
        assert r["degree"] >= 1
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = o.join(li, o.o_orderkey == li.l_orderkey)
    assert len(hubs) == pairs.select("o_custkey").distinct().count()
    assert len(auths) == pairs.select("l_suppkey").distinct().count()


def test_ppr_concentrates_on_seed_neighborhood(spark, sf_dir):
    """Personalized ranks must concentrate near the seeds: every seed
    outranks the global-PageRank-normalized typical node, total mass
    is far below the global variant's sum-to-N, and every emitted
    node is within reach of a seed (rank > 0 by construction)."""
    rows = graph_ops.graph_pagerank_personalized(spark, sf_dir).collect()
    assert rows
    seeds = [r for r in rows if r["is_seed"]]
    others = [r for r in rows if not r["is_seed"]]
    assert seeds
    assert all(r["rank"] > 0 for r in rows)
    # seeds hold teleport mass: min seed rank >= the teleport floor
    assert min(r["rank"] for r in seeds) >= 0.15 - 1e-9
    # mass is bounded by the seed count (sum-to-|seeds| convention,
    # minus truncation and 3-hop leakage)
    total = sum(r["rank"] for r in rows)
    assert total <= graph_ops.PPR_SEED_MAX_CUST + 1e-6
    # the seed flag is exactly the id predicate
    for r in rows:
        kind, key = r["node_id"].split(":")
        assert r["is_seed"] == (
            kind == "c" and int(key) < graph_ops.PPR_SEED_MAX_CUST
        )
    # on a bipartite graph the seeds' pushed mass accumulates at their
    # supplier intermediaries: the top-ranked non-seed is a supplier
    if others:
        top = max(others, key=lambda r: r["rank"])
        assert top["node_id"].startswith("s:")
