#!/usr/bin/env python
"""Scale-out evidence probe (optimization round 14, VERDICT r13 ask #2).

The sf0.1 bench cannot demonstrate parallel scale-out: per-task fixed
cost dominates, so every cohort runs FASTER at 8 cores than 32
(PERF_r13 scaling block, all ratios < 1). This tool measures the same
queries at a grain where compute dominates:

1. ``generate``: build a REPLICAS x sf0.1 dataset under --dir by
   unioning key-offset copies of each table (ids shifted per replica so
   joins/graphs become R disjoint copies of the sf0.1 structure — the
   co-purchase projection cannot densify, per-user series keep their
   length, join fan-outs replicate instead of exploding). This is a
   MEASUREMENT fixture only: no oracle runs against it and no query
   path reads it outside this tool.
2. ``run``: in THIS process (launch once per core count via
   $SPARK_GRAFT_CPUS), noop-time the probe cohort (1 warm-up + 2
   repeats, median) and append one JSON line to --out.

Usage (two fresh processes per the bench's own discipline):

    python tools/scaling_probe.py generate --dir /tmp/sfscale10
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py run --dir /tmp/sfscale10
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py run --dir /tmp/sfscale10

The committed artifact (plans/r14/scaling_probe.json) holds both lines;
speedup_32_over_8 >= ~2 on the compute-heavy queries is the scale-out
evidence the sf0.1 bench cannot produce.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

# Per-table integer key columns to offset per replica (disjoint copies).
OFFSET_KEYS = {
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
}

# Compute-heavy cohort: the heavy-tail bench cohort plus the heaviest
# sweep finds — the queries whose 100 TB posture the round argues for.
PROBE = [
    "emb_pca_power",
    "emb_covariance_matrix",
    "ml_isotonic_calibration",
    "sim_nn_descent",
    "sim_knn_graph_search",
    "graph_spectral_bisection",
    "ts_matrix_profile",
    "dedup_minhash_lsh",
    "text_tfidf_topk",
    "tpch_q1_pricing_summary",
]


def generate(out_dir: str) -> None:
    from pyspark.sql import functions as F

    from spark_streaming_test_spark.catalog import TABLES, load
    from spark_streaming_test_spark.session import get_spark

    spark = get_spark("scaling-probe-gen")
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        base = load(spark, SRC, name)
        keys = OFFSET_KEYS.get(name)
        if not keys:
            # dimension-like tables (region, nation) stay as-is
            base.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
            continue
        spans = {
            k: int(base.agg(F.max(F.col(k))).collect()[0][0]) + 1
            for k in keys
        }
        parts = []
        for r in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * spans[k]))
            parts.append(rep)
        out = parts[0]
        for rep in parts[1:]:
            out = out.unionByName(rep)
        (
            out.repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet"))
        )
        print(f"generated {name} x{REPLICAS}", flush=True)


def run(data_dir: str, out_path: str) -> None:
    from spark_streaming_test_spark import registry
    from spark_streaming_test_spark.session import (
        default_parallelism,
        get_spark,
        reset_query_state,
    )

    spark = get_spark("scaling-probe")
    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in PROBE:
        fn = qs[name]
        try:
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, data_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
            timings[name] = sorted(runs)[0] if len(runs) == 1 else round(
                sum(runs) / len(runs), 3
            )
            reset_query_state(spark)
            print(f"{timings[name]:8.2f}s {name}", flush=True)
        except Exception as e:
            timings[name] = -1.0
            print(f"ERR {name}: {str(e)[:120]}", flush=True)
            try:
                reset_query_state(spark)
            except Exception:
                pass
    rec = {
        "cpus": default_parallelism(),
        "replicas": REPLICAS,
        "data_dir": data_dir,
        "timings": timings,
        "total": round(sum(v for v in timings.values() if v > 0), 3),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["generate", "run"])
    ap.add_argument("--dir", default="/tmp/sfscale10")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14", "scaling_probe.json"))
    args = ap.parse_args()
    if args.mode == "generate":
        generate(args.dir)
    else:
        run(args.dir, args.out)


if __name__ == "__main__":
    main()
