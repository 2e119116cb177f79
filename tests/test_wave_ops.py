"""Semantic tests for the round-4 continuation wave: ridge path, BPE
application, monotone streaks, LSH recall eval — ground-truth properties
the cross-engine hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_test_spark.llm import bpe, dedup
from spark_streaming_test_spark.operators import mltrain, trend


def test_ridge_lambda_zero_equals_ols(spark, sf_dir):
    """The λ=0 point of the ridge path must reproduce the plain OLS
    solution bit-for-bit (identical moments, identical Cramer
    expressions with a11 = sx1x1 + 0·n)."""
    ols = mltrain.ml_linreg_normal_eq(spark, sf_dir).collect()[0]
    path = {
        r["lambda_rel"]: r for r in mltrain.ml_ridge_path(spark, sf_dir).collect()
    }
    assert set(path) == set(mltrain.RIDGE_LAMBDAS)
    r0 = path[0.0]
    for b in ("b0", "b1", "b2"):
        assert abs(r0[b] - ols[b]) < 1e-12, (b, r0[b], ols[b])


def test_ridge_shrinks_coefficients(spark, sf_dir):
    """Increasing λ must shrink the penalized-coefficient L2 norm
    (monotone on the regularization path)."""
    rows = sorted(
        mltrain.ml_ridge_path(spark, sf_dir).collect(),
        key=lambda r: r["lambda_rel"],
    )
    norms = [r["b1"] ** 2 + r["b2"] ** 2 for r in rows]
    assert all(b <= a + 1e-15 for a, b in zip(norms, norms[1:])), norms


def test_bpe_apply_greedy_fold_semantics(spark):
    """The merge fold must implement greedy LEFT-TO-RIGHT
    non-overlapping merging: 'ababa' with merge (a,b) → ab ab a —
    the case plain string-replace gets wrong."""
    df = spark.createDataFrame([("ababa",), ("banana",)], "word string")
    fold = bpe._spark_merge_fold("split(word, '(?!^)(?=.)')", "a", "b")
    out = {
        r["word"]: r["toks"]
        for r in df.select("word", F.expr(fold).alias("toks")).collect()
    }
    assert out["ababa"] == ["ab", "ab", "a"]
    assert out["banana"] == ["b", "a", "n", "a", "n", "a"]


def test_bpe_apply_compression_sane(spark, sf_dir):
    """Token counts can only shrink vs characters, and every source
    reports consistent totals."""
    for r in bpe.text_bpe_apply(spark, sf_dir).collect():
        assert 0 < r["n_tokens"] <= r["n_chars"]
        assert r["n_words"] <= r["n_tokens"]  # a word is >= 1 token
        assert abs(r["tokens_per_word"] - r["n_tokens"] / r["n_words"]) < 1e-12
        assert r["chars_per_token"] >= 1.0


def test_monotone_streaks_recompute(spark, sf_dir):
    """Recompute the longest strictly-increasing run per type from the
    raw daily totals in Python and compare."""
    from spark_streaming_test_spark.catalog import load

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("dv"))
        .collect()
    )
    import collections

    series = collections.defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["d"], r["dv"]))
    expect = {}
    for g, pts in series.items():
        pts.sort()
        best = cur = 0
        ups = 0
        for (_, prev), (_, nxt) in zip(pts, pts[1:]):
            if nxt > prev:
                cur += 1
                ups += 1
                best = max(best, cur)
            else:
                cur = 0
        expect[g] = (len(pts), ups, best)
    got = {
        r["event_type"]: (r["n_days"], r["n_up_days"], r["longest_streak"])
        for r in trend.ts_monotone_streaks(spark, sf_dir).collect()
    }
    assert got == expect


def test_lsh_recall_counts_consistent(spark, sf_dir):
    """hits ≤ min(truth, candidates); ratios match the counts."""
    r = dedup.dedup_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert r["n_hits"] <= r["n_truth"]
    assert r["n_hits"] <= r["n_candidates"]
    if r["n_truth"]:
        assert abs(r["recall"] - r["n_hits"] / r["n_truth"]) < 1e-12
    if r["n_candidates"]:
        assert (
            abs(r["precision_at_threshold"] - r["n_hits"] / r["n_candidates"])
            < 1e-12
        )


def test_cramers_v_bounds_and_recompute(spark, sf_dir):
    """V ∈ [0, 1]; recompute chi² from raw counts in Python."""
    from spark_streaming_test_spark.operators import rankstats

    r = rankstats.agg_cramers_v(spark, sf_dir).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["n_col_cats"] == 7
    from spark_streaming_test_spark.catalog import load
    import collections

    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", F.dayofweek("ts").alias("dow"))
        .collect()
    )
    cells = collections.Counter((x["event_type"], x["dow"]) for x in rows)
    types = sorted({x["event_type"] for x in rows})
    n = len(rows)
    chi2 = 0.0
    for t in types:
        for d in range(1, 8):
            o = cells.get((t, d), 0)
            row_tot = sum(cells.get((t, dd), 0) for dd in range(1, 8))
            col_tot = sum(cells.get((tt, d), 0) for tt in types)
            e = row_tot * col_tot / n
            if e:
                chi2 += (o - e) ** 2 / e
    assert abs(r["chi2"] - chi2) < 1e-6 * max(1.0, chi2)


def test_acf_lag_zero_property_and_numpy(spark, sf_dir):
    """ACF values lie in [-1, 1]; recompute lag-1 ACF for one type with
    numpy and compare to 1e-9."""
    import numpy as np

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import trend

    out = trend.ts_acf_correlogram(spark, sf_dir).collect()
    assert out
    for r in out:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
    g = out[0]["event_type"]
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == g)
        .groupBy(F.to_date("ts").alias("d"))
        .agg((F.sum(F.col("value").cast("decimal(12,2)")) * 100).cast("bigint").alias("c"))
        .orderBy("d")
        .collect()
    )
    x = np.array([r["c"] for r in daily], dtype=np.float64)
    xc = x - x.mean()
    r1 = float((xc[1:] * xc[:-1]).sum() / (xc * xc).sum())
    got = {(r["event_type"], r["lag"]): r["acf"] for r in out}
    assert abs(got[(g, 1)] - r1) < 1e-9


def test_fd_discovery_known_truths(spark, sf_dir):
    """nation.n_nationkey→n_regionkey must hold exactly (strength 1,
    zero violating keys); doc_id→lang is a key so it must too."""
    from spark_streaming_test_spark.operators import profiling

    rows = {r["fd"]: r for r in profiling.dq_fd_discovery(spark, sf_dir).collect()}
    nat = rows["nation.n_nationkey->n_regionkey"]
    assert nat["strength"] == 1.0 and nat["n_violating_keys"] == 0
    doc = rows["documents.doc_id->lang"]
    assert doc["strength"] == 1.0 and doc["n_keys"] == doc["n_rows"]
    for r in rows.values():
        assert 0.0 < r["strength"] <= 1.0


def test_transpose_shape(spark, sf_dir):
    """Transposed stats frame: 3 metric rows, one column per event
    type plus the key column; values match the straight aggregate."""
    from spark_streaming_test_spark.operators import sqlsurface
    from spark_streaming_test_spark.catalog import load

    t = sqlsurface.sql_transpose(spark, sf_dir)
    rows = {r["key"]: r for r in t.collect()}
    assert set(rows) == {"n", "total", "avg_val"}
    n_click = (
        load(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
    )
    assert rows["n"]["click"] == float(n_click)


def test_holt_winters_python_reference(spark, sf_dir):
    """Replay the exact fold in plain Python from the raw hourly cents
    series and compare level/trend/forecasts bitwise."""
    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import trend

    P = trend.HW_PERIOD
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("c")
        )
        .collect()
    )
    import collections

    series = collections.defaultdict(list)
    for r in hourly:
        series[r["event_type"]].append((r["h"], float(r["c"])))
    got = {r["event_type"]: r for r in trend.ts_holt_winters(spark, sf_dir).collect()}
    for g, pts in series.items():
        pts.sort()
        xs = [v for _, v in pts]
        m = min(len(xs), P)
        level = sum(xs[:P]) / float(m)
        state = [level, 0.0] + [x - level for x in xs[:P]]
        for x in xs[P:]:
            lvl, tr, sc = state[0], state[1], state[2]
            lvl2 = (x - sc + lvl + tr) / 2.0
            tr2 = (lvl2 - lvl + tr) / 2.0
            sc2 = (x - lvl2 + sc) / 2.0
            state = [lvl2, tr2] + state[3:] + [sc2]
        r = got[g]
        assert r["n_hours"] == len(xs)
        assert r["level"] == state[0]
        assert r["trend"] == state[1]
        assert r["forecast_1"] == state[0] + state[1] + state[2]
        assert r["forecast_2"] == state[0] + 2.0 * state[1] + state[3]
        assert r["forecast_3"] == state[0] + 3.0 * state[1] + state[4]


def test_simpsons_check_consistency(spark, sf_dir):
    """Segment counts partition the corpus; signs match the sign of
    the reported mean differences."""
    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import causal

    rows = causal.ab_test_simpsons_check(spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "events").count()
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_total
    for r in rows:
        d = r["mean_a"] - r["mean_b"]
        if r["seg_sign"] != 0:
            assert (d > 0) == (r["seg_sign"] > 0)
        opposing = sum(
            1 for x in rows if x["seg_sign"] != x["pooled_sign"]
        )
        assert r["n_segments_opposing"] == opposing
        assert r["full_reversal"] == (opposing == len(rows))


def test_iptw_python_replay(spark, sf_dir):
    """Replay the full IPTW pipeline (user grain → 3 GD iterations →
    clipped scoring → Hájek ATE) in plain Python from the raw events
    and compare the weights and the estimate."""
    import collections
    import math

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import causal

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("cents"),
    ).collect()
    acc = collections.defaultdict(lambda: [0, 0, 0])  # n, clicks, purchase cents
    for r in ev:
        a = acc[r["user_id"]]
        a[0] += 1
        if r["event_type"] == "click":
            a[1] += 1
        if r["event_type"] == "purchase":
            a[2] += r["cents"]
    users = [
        (n / causal.IPTW_XSCALE,
         1.0 if clicks >= causal.IPTW_CLICKS else 0.0,
         cents / 100.0)
        for n, clicks, cents in acc.values()
    ]
    w0 = w1 = 0.0
    nd = float(len(users))
    from decimal import Decimal

    def dsum6(vals):
        return float(sum(Decimal(f"{v:.6f}") for v in vals))

    for _ in range(causal.IPTW_ITERS):
        ps = [1.0 / (1.0 + math.exp(-(w0 + w1 * x))) for x, _, _ in users]
        g0 = dsum6([(p - t) * 1.0 for p, (_, t, _) in zip(ps, users)])
        g1 = dsum6([(p - t) * x for p, (x, t, _) in zip(ps, users)])
        w0 -= causal.IPTW_RATE * (g0 / nd)
        w1 -= causal.IPTW_RATE * (g1 / nd)
    got = causal.ab_test_iptw_ate(spark, sf_dir).collect()[0]
    assert abs(got["w0"] - w0) < 1e-12 and abs(got["w1"] - w1) < 1e-12
    es = [
        min(max(1.0 / (1.0 + math.exp(-(w0 + w1 * x))), causal.IPTW_CLIP_LO),
            causal.IPTW_CLIP_HI)
        for x, _, _ in users
    ]
    mt = dsum6([t * y / e for (_, t, y), e in zip(users, es)]) / dsum6(
        [t / e for (_, t, _), e in zip(users, es)]
    )
    mc = dsum6(
        [(1 - t) * y / (1 - e) for (_, t, y), e in zip(users, es)]
    ) / dsum6([(1 - t) / (1 - e) for (_, t, _), e in zip(users, es)])
    assert abs(got["mean_treated"] - mt) < 1e-9 * max(1.0, abs(mt))
    assert abs(got["mean_control"] - mc) < 1e-9 * max(1.0, abs(mc))
    assert abs(got["ate"] - (mt - mc)) < 1e-9 * max(1.0, abs(mt - mc))


def test_qini_partitions_users_and_final_row(spark, sf_dir):
    """Deciles partition the user set; the final cumulative Qini row
    equals total incremental conversions vs the scaled control."""
    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import causal

    rows = sorted(
        causal.ab_test_qini_uplift(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n_users
    tot_t = sum(r["conv_t"] for r in rows)
    tot_c = sum(r["conv_c"] for r in rows)
    cn_t = sum(r["n_t"] for r in rows)
    cn_c = sum(r["n_c"] for r in rows)
    expect_final = tot_t - tot_c * cn_t / cn_c
    assert abs(rows[-1]["qini"] - expect_final) < 1e-9


def test_pps_per_day_counts_and_big_orders(spark, sf_dir):
    """Each day selects at most the budget; any order worth >= one
    step is always selected (the PPS certainty property)."""
    import collections

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.llm import sampling

    sel = sampling.sample_pps_systematic(spark, sf_dir).collect()
    per_day = collections.Counter(r["day"] for r in sel)
    assert per_day and max(per_day.values()) <= sampling.PPS_PER_DAY
    orders = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("day"),
            (F.col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    day_tot = collections.Counter()
    for r in orders:
        day_tot[r["day"]] += r["cents"]
    selected = {r["o_orderkey"] for r in sel}
    for r in orders:
        step = day_tot[r["day"]] // sampling.PPS_PER_DAY
        if step > 0 and r["cents"] >= step:
            assert r["o_orderkey"] in selected, (r["o_orderkey"], r["cents"], step)


def test_aes_roundtrip_all_rows_hold(spark, sf_dir):
    from spark_streaming_test_spark.functions import hashing

    for r in hashing.fn_aes_roundtrip(spark, sf_dir).collect():
        assert r["roundtrip_ok"] and r["wrong_key_differs"]
        assert r["cipher_len"] % 16 == 0


def test_platt_improves_logloss(spark, sf_dir):
    """Recalibration from the identity init must not worsen training
    log-loss (convex objective, small rate), and the learned inverse
    temperature stays positive (orientation preserved)."""
    from spark_streaming_test_spark.operators import mltrain

    r = mltrain.ml_platt_calibration(spark, sf_dir).collect()[0]
    assert r["logloss_after"] <= r["logloss_before"] + 1e-12
    assert r["platt_a"] > 0


def test_window_clause_single_shared_window(spark, sf_dir):
    """All three functions over the named window must land in ONE
    WindowExec (one sort, one exchange) — the point of the clause."""
    import re

    from spark_streaming_test_spark.operators import sqlsurface
    from spark_streaming_test_spark.plans import checks

    df = sqlsurface.sql_window_clause(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    import collections

    per = collections.Counter(r["o_custkey"] for r in df.collect())
    assert max(per.values()) <= 3


def test_month_edges_clamp(spark, sf_dir):
    """Python-calendar recompute of the clamping convention."""
    import calendar
    import datetime as dt

    from spark_streaming_test_spark.functions import scalar as fns

    def add_months(d, m):
        y = d.year + (d.month - 1 + m) // 12
        mo = (d.month - 1 + m) % 12 + 1
        return dt.date(y, mo, min(d.day, calendar.monthrange(y, mo)[1]))

    for r in fns.fn_month_arithmetic_edges(spark, sf_dir).limit(500).collect():
        assert r["plus_1m"] == add_months(r["d"], 1)
        assert r["plus_13m"] == add_months(r["d"], 13)
        assert r["month_end"].day == calendar.monthrange(r["d"].year, r["d"].month)[1]
        assert r["is_month_end"] == (r["d"] == r["month_end"])


def test_lsh_band_tuning_monotone_tradeoff(spark, sf_dir):
    """More bands (fewer rows per band) can only widen the candidate
    set: n_candidates and recall are monotone in bands; the 8x4
    production layout's numbers must match dedup_lsh_recall_eval."""
    from spark_streaming_test_spark.llm import dedup

    rows = {r["bands"]: r for r in dedup.dedup_lsh_band_tuning(spark, sf_dir).collect()}
    assert set(rows) == {b for b, _ in dedup.LSH_TUNE_CONFIGS}
    assert rows[16]["n_candidates"] >= rows[8]["n_candidates"] >= rows[4]["n_candidates"]
    assert rows[16]["n_hits"] >= rows[8]["n_hits"] >= rows[4]["n_hits"]
    ref = dedup.dedup_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert rows[8]["n_candidates"] == ref["n_candidates"]
    assert rows[8]["n_hits"] == ref["n_hits"]
    assert rows[8]["n_truth"] == ref["n_truth"]


def test_kmeans_elbow_monotone(spark, sf_dir):
    """Nested seed sets ⇒ inertia is nonincreasing in K."""
    from spark_streaming_test_spark.llm import clustering

    rows = sorted(
        clustering.ml_kmeans_elbow(spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == sorted(clustering.ELBOW_KS)
    inertias = [r["inertia"] for r in rows]
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])), inertias
    assert len({r["n_points"] for r in rows}) == 1


def test_als_rank1_objective_decreases(spark, sf_dir):
    """Each ALS half-step is an exact per-key least-squares solve, so
    the squared error must be monotone: SSE(u1, 1) >= SSE(u1, v1) >=
    SSE(u2, v1). Verified in Python from collected ratings/factors."""
    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import basket

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ratings = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .count()
        .collect()
    )
    out = basket.rec_als_rank1(spark, sf_dir).collect()
    v = {r["id"]: r["factor"] for r in out if r["kind"] == "item"}
    u2 = {r["id"]: r["factor"] for r in out if r["kind"] == "user"}
    import collections

    su = collections.defaultdict(lambda: [0.0, 0])
    for r in ratings:
        su[r["c"]][0] += r["count"]
        su[r["c"]][1] += 1
    u1 = {c: s / n for c, (s, n) in su.items()}
    sse_a = sum((r["count"] - u1[r["c"]] * 1.0) ** 2 for r in ratings)
    sse_b = sum((r["count"] - u1[r["c"]] * v[r["p"]]) ** 2 for r in ratings)
    sse_c = sum((r["count"] - u2[r["c"]] * v[r["p"]]) ** 2 for r in ratings)
    assert sse_b <= sse_a + 1e-6
    assert sse_c <= sse_b + 1e-6


def test_vshape_python_replay(spark, sf_dir):
    """Replay run-length V detection from the daily totals."""
    import collections

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import trend

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("dv"))
        .collect()
    )
    series = collections.defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["d"], r["dv"]))
    expect = set()
    for g, pts in series.items():
        pts.sort()
        steps = []
        for (d0, v0), (d1, v1) in zip(pts, pts[1:]):
            if v1 != v0:
                steps.append((d1, 1 if v1 > v0 else -1))
        runs = []
        for d, dr in steps:
            if runs and runs[-1][0] == dr:
                runs[-1][2] += 1
                runs[-1][3] = d
            else:
                runs.append([dr, d, 1, d])  # dir, first, len, last
        for a, b in zip(runs, runs[1:]):
            if a[0] == -1 and b[0] == 1 and a[2] >= trend.VSHAPE_MIN_LEG and b[2] >= trend.VSHAPE_MIN_LEG:
                expect.add((g, a[1], b[3], a[2], b[2]))
    got = {
        (r["event_type"], r["down_start"], r["up_end"], r["down_steps"], r["up_steps"])
        for r in trend.window_vshape_patterns(spark, sf_dir).collect()
    }
    assert got == expect


def test_sql_table_function_restrictions(spark, sf_dir):
    """A parameterized LIMIT in a SQL table function is rejected at
    CREATE time (the foldability rule the docstring pins), and the
    function output matches the inlined query."""
    import pytest as _pytest

    from spark_streaming_test_spark.operators import sqlsurface

    rows = sqlsurface.sql_table_function(spark, sf_dir).collect()
    assert {r["pri"] for r in rows} == {"1-URGENT", "5-LOW"}
    with _pytest.raises(Exception, match="INVALID_LIMIT_LIKE_EXPRESSION"):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION bad_tvf(k INT) "
            "RETURNS TABLE (o BIGINT) "
            "RETURN SELECT id AS o FROM range(10) LIMIT k"
        )


def test_bpe_fold_randomized_cross_check(spark):
    """200 seeded pseudo-random words over a 3-letter alphabet, pushed
    through a 4-merge chain on the JVM, must match a plain-Python
    greedy left-to-right merger word for word — including merges whose
    output feeds later merges and self-overlapping runs."""
    import random

    rng = random.Random(20260814)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    merges = [("a", "b"), ("ab", "a"), ("b", "c"), ("c", "a")]

    def py_apply(word):
        toks = list(word)
        for l, r in merges:
            out = []
            for t in toks:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            toks = out
        return toks

    expr = "split(word, '(?!^)(?=.)')"
    for l, r in merges:
        expr = bpe._spark_merge_fold(expr, l, r)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["toks"]
        for r in df.select("word", F.expr(expr).alias("toks")).collect()
    }
    for w in words:
        assert got[w] == py_apply(w), (w, got[w], py_apply(w))


def test_near_dup_decon_split_discipline(spark, sf_dir):
    """Every reported pair crosses the split (train on the left, eval
    on the right) and clears the Jaccard threshold; pairs found by
    the within-corpus dedup across the split must be found here too."""
    from spark_streaming_test_spark.llm import decontamination as dc
    from spark_streaming_test_spark.llm import dedup

    rows = dc.decon_near_dup_lsh(spark, sf_dir).collect()
    import hashlib

    def is_eval(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] == dc.EVAL_PREFIX

    for r in rows:
        assert not is_eval(r["train_doc"])
        assert is_eval(r["eval_doc"])
        assert r["jaccard"] >= dc.NEARDUP_J
    got = {(r["train_doc"], r["eval_doc"]) for r in rows}
    for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        a, b = r["doc_a"], r["doc_b"]
        if is_eval(a) != is_eval(b):
            t, e = (b, a) if is_eval(a) else (a, b)
            assert (t, e) in got, (t, e)


def test_corpus_select_final_invariants(spark, sf_dir):
    """The manifest respects every gate: budget per source, quality
    floors, no exact duplicates, no higher-id near-dup members."""
    import collections

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.llm import curation, dedup

    rows = curation.corpus_select_final(spark, sf_dir).collect()
    assert rows
    per_src = collections.Counter()
    for r in rows:
        per_src[r["source"]] += r["n_tokens"]
        assert r["n_tokens"] >= curation.SEL_MIN_TOKENS
        assert r["cum_tokens"] <= curation.SEL_BUDGET_TOKENS
    for s, tot in per_src.items():
        assert tot <= curation.SEL_BUDGET_TOKENS
    ids = {r["doc_id"] for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if r["doc_id"] in ids
    }
    assert len(set(texts.values())) == len(texts)  # no exact dups survive
    dropped = {r["doc_b"] for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()}
    assert not (ids & dropped)


def test_did_recompute(spark, sf_dir):
    """Recompute the four cell means and the DiD estimate in Python."""
    import collections
    import hashlib

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import causal

    rows = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.dayofmonth("ts").alias("dom"),
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("c"),
        )
        .collect()
    )
    acc = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        v = "A" if hashlib.md5(str(r["user_id"]).encode()).hexdigest()[0] <= "7" else "B"
        post = r["dom"] > causal.DID_POST_DOM
        a = acc[(v, post)]
        a[0] += r["c"]
        a[1] += 1
    mean = {k: s / (100.0 * n) for k, (s, n) in acc.items()}
    expect = (mean[("B", True)] - mean[("B", False)]) - (
        mean[("A", True)] - mean[("A", False)]
    )
    got = causal.ab_test_diff_in_diff(spark, sf_dir).collect()[0]
    assert got["n_total"] == len(rows)
    assert abs(got["did_estimate"] - expect) < 1e-9


def test_raking_margins_converge(spark, sf_dir):
    """After 3 IPF rounds the column margin is hit exactly (it scales
    last) and the row margin is near-target; total weight mass is
    conserved at n; rake factors are positive."""
    from spark_streaming_test_spark.llm import sampling

    r = sampling.sample_raking_ipf(spark, sf_dir).collect()[0]
    n = r["n_aw"] + r["n_ae"] + r["n_bw"] + r["n_be"]
    w_total = r["w_aw"] + r["w_ae"] + r["w_bw"] + r["w_be"]
    assert abs(w_total - n) < 1e-6 * n
    col_t = sampling.IPF_COL_NUM / sampling.IPF_COL_DEN
    row_t = sampling.IPF_ROW_NUM / sampling.IPF_ROW_DEN
    assert abs(r["col_weekday_share"] - col_t) < 1e-9
    assert abs(r["row_a_share"] - row_t) < 5e-3  # converging, scaled first
    for k in ("rake_aw", "rake_ae", "rake_bw", "rake_be"):
        assert r[k] > 0


def test_power_analysis_formula(spark, sf_dir):
    """n_required must satisfy the textbook identity on the emitted
    mean/var columns, and shrink quadratically with the MDE."""
    from spark_streaming_test_spark.operators import causal

    r = causal.ab_test_power_analysis(spark, sf_dir).collect()[0]
    z = causal.POWER_Z_ALPHA + causal.POWER_Z_BETA
    expect = 2 * z * z * r["var"] / (r["mde_abs"] ** 2)
    assert abs(r["n_required_per_arm"] - expect) < 1e-9 * expect
    assert r["mde_abs"] == r["mean"] * causal.POWER_MDE_PCT / 100.0
    assert r["var"] > 0


def test_metric_tree_identity(spark, sf_dir):
    """The log-decomposition is exact: dln_users + dln_freq + dln_aov
    must reconstruct dln_revenue to float addition error."""
    from spark_streaming_test_spark.operators import causal

    r = causal.events_metric_tree_decomposition(spark, sf_dir).collect()[0]
    assert (
        abs(r["dln_users"] + r["dln_freq"] + r["dln_aov"] - r["dln_revenue"])
        < 1e-12
    )
    assert r["revenue_post"] > 0 and r["revenue_pre"] > 0


def test_learning_curve_nested_subsets(spark, sf_dir):
    """Subset sizes are nested and roughly 25/50/100%; the full-data
    fit must agree with numpy lstsq on the same design."""
    import numpy as np

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators import mltrain

    rows = {r["subset"]: r for r in mltrain.ml_learning_curve(spark, sf_dir).collect()}
    assert rows["25pct"]["n_rows"] < rows["50pct"]["n_rows"] < rows["100pct"]["n_rows"]
    feat = (
        load(spark, sf_dir, "events")
        .select(F.col("value").alias("y"), (F.hour("ts").cast("double") / 24.0).alias("x1"))
        .collect()
    )
    X = np.array([[1.0, r["x1"]] for r in feat])
    y = np.array([r["y"] for r in feat])
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    full = rows["100pct"]
    assert abs(full["intercept"] - ref[0]) < 1e-3 * max(1.0, abs(ref[0]))
    assert abs(full["slope"] - ref[1]) < 1e-3 * max(1.0, abs(ref[1]))
    assert full["mse_train"] > 0


def test_forecast_ensemble_weights_and_blend(spark, sf_dir):
    """Inverse-MAPE weights: the lowest-MAPE method gets the largest
    weight; the blended forecast lies within the convex hull of the
    three component forecasts' implied range (weights sum to 1)."""
    from spark_streaming_test_spark.operators import trend

    for r in trend.ts_forecast_ensemble(spark, sf_dir).collect():
        mapes = {
            "naive": r["mape_naive"],
            "ewma": r["mape_ewma"],
            "snaive": r["mape_snaive"],
        }
        assert all(m > 0 for m in mapes.values())
        inv = {k: 1.0 / v for k, v in mapes.items()}
        tot = sum(inv.values())
        assert abs(r["w_naive"] - inv["naive"] / tot) < 1e-9
        best = min(mapes, key=mapes.get)
        assert inv[best] / tot == max(v / tot for v in inv.values())
        assert r["ensemble_next"] > 0


def test_capacity_forecast_sanity(spark, sf_dir):
    """days_to_capacity is present only for rising, under-capacity
    NIFs and is consistent with (limit - current)/slope."""
    from spark_streaming_test_spark.operators import traffic

    rows = traffic.traffic_capacity_forecast(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 3
        if r["days_to_capacity"] is not None:
            assert r["slope_cents_per_day"] > 0
            assert r["current_peak_cents"] < traffic.CAP_LIMIT_CENTS
            expect = (
                traffic.CAP_LIMIT_CENTS - r["current_peak_cents"]
            ) / r["slope_cents_per_day"]
            assert abs(r["days_to_capacity"] - expect) < 1e-9 * max(1.0, expect)


# --- closing-wave semantic tests -------------------------------------------


def test_cdc_chunks_realign_after_insertion(spark, sf_dir):
    """THE content-defined-chunking property: inserting one word shifts
    every fixed window downstream, but CDC boundaries re-align, so a
    doc and its one-word-insertion revision still share most chunks."""
    import pandas as pd

    from spark_streaming_test_spark.llm import dedup as D

    base = " ".join(f"tok{i % 23}x{(i * 7) % 11}" for i in range(200))
    words = base.split(" ")
    revised = " ".join(words[:97] + ["INSERTED"] + words[97:])
    df = spark.createDataFrame(
        [(0, base), (1, revised)], "doc_id long, text string"
    )

    def fake_load(s, d, name):
        assert name == "documents"
        return df

    D.load_backup = D.load
    D.load = fake_load  # type: ignore[assignment]
    try:
        out = {r["doc_id"]: r for r in D.dedup_cdc_chunks(spark, sf_dir).collect()}
    finally:
        D.load = D.load_backup
        del D.load_backup
    # both docs must share a large fraction of chunks despite the shift
    for did in (0, 1):
        assert out[did]["dup_chunk_ratio"] > 0.5, out[did]


def test_kmv_estimates_within_relative_error(spark, sf_dir):
    """KMV cardinality estimates must land within the theoretical
    ~1/sqrt(K-2) relative error band (x3 slack) of the exact counts,
    and the Jaccard-derived intersection must be sane."""
    from spark_streaming_test_spark.operators import aggregates as A

    r = A.agg_kmv_set_ops(spark, sf_dir).collect()[0]
    import math

    tol = 3.0 / math.sqrt(A.KMV_K - 2)
    for est, exact in (
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ):
        if exact >= A.KMV_K:
            assert abs(est - exact) <= tol * exact, (est, exact, tol)
        else:
            assert est == float(exact)
    assert 0.0 <= r["jaccard_kmv"] <= 1.0
    assert r["est_intersection"] <= r["est_union"] + 1e-9


def test_jl_distortion_concentrates_around_one(spark, sf_dir):
    """JL: mean pairwise distance-ratio must sit near 1 and the bulk of
    pairs inside the +/-50% band at m=16."""
    from spark_streaming_test_spark.llm import embeddings as EM

    r = EM.emb_random_projection_jl(spark, sf_dir).collect()[0]
    assert r["n_pairs"] > 1000
    assert 0.7 < r["mean_ratio"] < 1.3, r["mean_ratio"]
    assert r["frac_within_50pct"] > 0.8, r["frac_within_50pct"]


def test_concurrency_sweep_peak_vs_bruteforce(spark, sf_dir):
    """Sweep-line peak must equal the brute-force interval-stabbing
    maximum recomputed in pandas on a sampled event_type."""
    from spark_streaming_test_spark.operators import behavior as B

    out = {
        r["event_type"]: r for r in B.events_concurrency_sweep(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("ts", "value")
        .toPandas()
    )
    import math

    starts = ev["ts"].astype("int64") // 1000  # ns -> us
    ends = starts + (ev["value"] * 60).apply(math.floor).astype("int64") * 1_000_000
    deltas = sorted(
        [(t, 1) for t in starts] + [(t, -1) for t in ends],
        key=lambda x: (x[0], x[1]),
    )
    peak, cur = 0, 0
    for _, d in deltas:
        cur += d
        peak = max(peak, cur)
    assert out["purchase"]["peak_concurrency"] == peak


def test_random_walks_respect_adjacency(spark, sf_dir):
    """Every visited node must be reachable: visit counts total exactly
    3 x |seeds| (each walk takes all 3 steps — no dead ends in the
    undirected co-purchase graph)."""
    from spark_streaming_test_spark.operators import graph as G

    edges = G._copurchase_edges(spark, sf_dir)
    n_seeds = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    visits = G.graph_random_walks(spark, sf_dir)
    total = visits.agg(F.sum("n_visits")).collect()[0][0]
    assert total == G.WALK_STEPS * n_seeds, (total, n_seeds)


def test_survivorship_golden_name_longest(spark, sf_dir):
    """Golden name must be the longest (lexicographically smallest on
    ties) member name within each multi-member entity."""
    from spark_streaming_test_spark.operators import entity as E

    groups = E.er_entity_groups(spark, sf_dir)
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name"
    )
    m = groups.join(parts, "p_partkey").toPandas()
    golden = {
        r["entity_id"]: r["golden_name"]
        for r in E.er_survivorship_golden(spark, sf_dir).collect()
    }
    for eid, grp in m.groupby("entity_id"):
        names = sorted(grp["p_name"], key=lambda s: (-len(s), s))
        assert golden[int(eid)] == names[0]


def test_alternating_star_handles_long_chain(spark):
    """The pathological case the algorithm exists for: a 2000-node CHAIN
    (diameter 1999). Min-label propagation would need ~2000 rounds; the
    alternating-star loop must produce the correct single component
    well within its CC_STAR_MAX_ROUNDS backstop — plus a second disjoint
    triangle to prove components don't bleed."""
    from spark_streaming_test_spark.operators.graph import (
        alternating_star_components,
    )

    n = 2000
    chain = [(i, i + 1) for i in range(1, n)]          # nodes 1..n
    tri = [(5000, 5001), (5001, 5002), (5000, 5002)]    # disjoint triangle
    edges = spark.createDataFrame(chain + tri, "u long, v long")
    got = {
        r["part_id"]: (r["component"], r["is_root"])
        for r in alternating_star_components(edges).collect()
    }
    assert len(got) == n + 3
    assert all(got[i] == (1, i == 1) for i in range(1, n + 1))
    assert all(got[i] == (5000, i == 5000) for i in (5000, 5001, 5002))


def test_alternating_star_raises_on_unconverged_cap(spark, monkeypatch):
    """Hitting the round backstop UNCONVERGED must raise, not return
    partially-contracted (wrong) labels — ADVICE r5 medium item. A
    16-node chain needs >1 alternating round, so a cap of 1 triggers
    the guard; the same graph under the real cap converges fine (the
    long-chain test above)."""
    from spark_streaming_test_spark.operators import graph as G

    monkeypatch.setattr(G, "CC_STAR_MAX_ROUNDS", 1)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 16)], "u long, v long"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="still moving"):
        G.alternating_star_components(edges).collect()


def test_sentiment_lexicon_known_docs(spark, tmp_path):
    """Known-answer sentiment: score is the exact lexicon sum, repeated
    words count every occurrence, unknown words contribute nothing,
    no-hit docs come back neutral with zeroes."""
    from spark_streaming_test_spark.llm.text_analysis import (
        text_sentiment_lexicon,
    )

    sf = str(tmp_path / "sfx")
    rows = [
        (1, "good good bad"),            # 3 + 3 - 3 = +3
        (2, "terrible broken crash"),    # -4 -3 -4 = -11
        (3, "the quick brown fox"),      # no lexicon hits
        (4, "love xyzzy hate"),          # 3 - 3 = 0 -> neutral
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["score"], r["n_pos"], r["n_neg"], r["label"])
        for r in text_sentiment_lexicon(spark, sf).collect()
    }
    assert got == {
        1: (3, 2, 1, "positive"),
        2: (-11, 0, 3, "negative"),
        3: (0, 0, 0, "neutral"),
        4: (0, 1, 1, "neutral"),
    }


def test_trajectory_similarity_matches_bruteforce(spark, sf_dir):
    """Independent ground truth: recompute every pairwise cell-set
    Jaccard in plain Python from the collected per-user cell sets (the
    capped user range keeps this small) and check the distributed
    shared-cell-join top-20 equals the exhaustive top-20."""
    from pyspark.sql import functions as F

    from spark_streaming_test_spark.catalog import load
    from spark_streaming_test_spark.operators.geo import (
        _TB1, _TB2, _TM1, _TM2, TRAJ_CELL, TRAJ_TOP_K, TRAJ_USER_CAP, WORLD,
        geo_trajectory_similarity,
    )

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < TRAJ_USER_CAP)
        .select("user_id", F.unix_timestamp("ts").alias("sec"))
        .collect()
    )
    cells: dict[int, set] = {}
    for r in ev:
        m = r["sec"] // 60
        c = r["user_id"] % 7
        x = (c * _TB1 + m * _TM1) % WORLD
        y = (c * _TB2 + m * _TM2) % WORLD
        cells.setdefault(r["user_id"], set()).add(
            (x // TRAJ_CELL, y // TRAJ_CELL)
        )
    users = sorted(cells)
    exact = []
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            common = len(cells[a] & cells[b])
            if common:
                j = common / len(cells[a] | cells[b])
                exact.append((-j, a, b, common))
    exact.sort()
    want = [(a, b, c, -nj) for nj, a, b, c in exact[:TRAJ_TOP_K]]
    got = [
        (r["user_a"], r["user_b"], r["n_common"], r["jaccard"])
        for r in geo_trajectory_similarity(spark, sf_dir).collect()
    ]
    assert got == want


def test_incremental_topk_equals_full_recompute(spark, sf_dir):
    """The merge identity end-to-end in Spark (independent of the SQL
    oracle): incremental base+delta merge == brute-force top-k over the
    full corpus for every query."""
    from spark_streaming_test_spark.llm.similarity import (
        sim_bruteforce_topk,
        sim_incremental_topk,
    )

    inc = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sim_incremental_topk(spark, sf_dir).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    assert inc == full
