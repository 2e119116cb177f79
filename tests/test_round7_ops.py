"""Round-7 operator tests: independent-algorithm replays and edge-case
pins for the queries added this round."""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import functions as F


# --- exact betweenness (K = n on the top-degree core) -----------------------


def test_betweenness_exact_equals_python_brandes(spark, sf_dir):
    """graph_betweenness_exact must match a textbook Brandes replay
    (Brandes 2001, Alg. 1) on the same induced core — an independent
    sequential implementation, not a mirrored formula. Tolerance 1e-9
    relative: the Spark side sums via order-canonical folds, Python
    via accumulation order, so bitwise equality is not expected."""
    from spark_streaming_test_spark.operators import graph

    rows = graph.graph_betweenness_exact(spark, sf_dir).collect()
    got = {r["node"]: r["betweenness"] for r in rows}

    # rebuild the same core edge set (test-only collect)
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = items.select("ok", F.col("pk").alias("u"))
    b = items.select("ok", F.col("pk").alias("v"))
    edges = (
        a.join(b, ["ok"]).filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
        .collect()
    )
    adj_all = defaultdict(set)
    for r in edges:
        adj_all[r["u"]].add(r["v"])
        adj_all[r["v"]].add(r["u"])
    core = sorted(adj_all, key=lambda n: (-len(adj_all[n]), n))[
        : graph.BW_EXACT_N
    ]
    core_set = set(core)
    adj = {
        n: sorted(x for x in adj_all[n] if x in core_set) for n in core
    }

    bc = defaultdict(float)
    for s in core:
        # single-source shortest paths + path counts
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        # dependency accumulation
        delta = defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v) == dist[w] - 1:
                    delta[v] += (sigma[v] / sigma[w]) * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]

    assert set(got) == set(core_set & set(bc) | set(got)), "node set"
    for n, v in got.items():
        want = bc.get(n, 0.0)
        assert abs(v - want) <= 1e-9 * max(1.0, abs(want)), (n, v, want)
    # centrality must be non-trivial somewhere on the dense core
    assert max(got.values()) > 0
