"""Semantic tests for the model-training family — properties the SQL
oracle can't express (monotone convergence, mass conservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_test_spark.catalog import load
from spark_streaming_test_spark.operators import mltrain


def test_logreg_loss_decreases(spark, sf_dir):
    """Full-batch GD on a convex loss with a sane rate must strictly
    decrease the training loss each iteration."""
    rows = sorted(
        mltrain.ml_logreg_train_gd(spark, sf_dir).collect(),
        key=lambda r: r["iter"],
    )
    assert len(rows) == mltrain.LR_ITERS
    losses = [r["loss"] for r in rows]
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    # iteration 1 starts from w=0: loss is ln 2 up to the 6-dp decimal
    # quantization the deterministic sum applies per term
    import math

    assert abs(losses[0] - math.log(2.0)) < 1e-5


def test_nb_confusion_conserves_test_set(spark, sf_dir):
    """Every held-out document gets exactly one prediction: confusion
    matrix counts must sum to the hash-split test-set size, and row
    sums must equal per-class test counts."""
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("h"),
    )
    test_counts = {
        r["lang"]: r["n"]
        for r in d.filter(F.col("h") <= mltrain.NB_TEST_CEIL)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    conf = mltrain.ml_nb_train_score(spark, sf_dir).collect()
    got = {}
    for r in conf:
        got[r["true_lang"]] = got.get(r["true_lang"], 0) + r["n_docs"]
    assert got == test_counts


def test_decision_stump_split_properties(spark, sf_dir):
    """One best split per feature; split sizes conserve the row count;
    Gini gain is non-negative (a split can never be worse than the
    parent when maximizing over all candidates)."""
    ev_n = load(spark, sf_dir, "events").count()
    rows = mltrain.ml_decision_stump(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {"value", "hour"}
    for r in rows:
        assert r["n_left"] + r["n_right"] == ev_n
        assert r["n_left"] > 0 and r["n_right"] > 0
        assert r["gain"] >= 0.0, r


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer solve must agree with numpy's least squares on the
    same design matrix (up to float tolerance)."""
    import numpy as np

    feat = (
        load(spark, sf_dir, "events")
        .select(
            F.col("value").alias("y"),
            (F.hour("ts").cast("double") / 24.0).alias("x1"),
            F.when(F.col("event_type") == "purchase", 1.0)
            .otherwise(0.0)
            .alias("x2"),
        )
        .collect()
    )
    X = np.array([[1.0, r["x1"], r["x2"]] for r in feat])
    y = np.array([r["y"] for r in feat])
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    got = mltrain.ml_linreg_normal_eq(spark, sf_dir).collect()[0]
    # moments are 6-dp decimal-quantized (deterministic sums), so the
    # solve agrees with full-precision lstsq to relative ~1e-6
    for coef, r in (("b0", ref[0]), ("b1", ref[1]), ("b2", ref[2])):
        assert abs(got[coef] - r) <= 1e-4 * max(1.0, abs(r)), (coef, got[coef], r)
    assert got["n_rows"] == len(feat)


def test_gbrt_round1_matches_python_argmax(spark, sf_dir):
    """Recompute round-1's best stump in plain Python (integer-cent
    residuals, SSE-reduction gain, same tie-break) and compare."""
    import collections

    from pyspark.sql import functions as F

    from spark_streaming_test_spark.operators import mltrain

    rows = (
        load(spark, sf_dir, "events")
        .select(
            F.hour("ts").cast("bigint").alias("f1"),
            F.dayofweek("ts").cast("bigint").alias("f2"),
            (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("y"),
        )
        .collect()
    )
    def tdiv(a, b):
        # both engines' integer division TRUNCATES toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    f0 = tdiv(sum(r["y"] for r in rows), len(rows))
    moments = collections.defaultdict(lambda: [0, 0])  # (feat,x) -> [n, s]
    for r in rows:
        res = r["y"] - f0
        for feat, x in (("hour", r["f1"]), ("dow", r["f2"])):
            m = moments[(feat, x)]
            m[0] += 1
            m[1] += res
    best = None
    for feat in ("dow", "hour"):
        xs = sorted(x for f, x in moments if f == feat)
        nt = sum(moments[(feat, x)][0] for x in xs)
        st = sum(moments[(feat, x)][1] for x in xs)
        nl = sl = 0
        for x in xs:
            nl += moments[(feat, x)][0]
            sl += moments[(feat, x)][1]
            nr, sr = nt - nl, st - sl
            if nr <= 0:
                continue
            gain = sl * sl / nl + sr * sr / nr
            key = (-gain, feat, x)
            if best is None or key < best[0]:
                best = (key, feat, x, nl, nr, tdiv(sl, nl), tdiv(sr, nr))
    got = {r["round"]: r for r in mltrain.ml_gbrt_boost2(spark, sf_dir).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["feature"], r1["threshold"]) == (best[1], best[2])
    assert (r1["n_left"], r1["n_right"]) == (best[3], best[4])
    assert (r1["leaf_left_cents"], r1["leaf_right_cents"]) == (best[5], best[6])
    # boosting makes progress: both rounds found splits with positive
    # explained sum-of-squares
    assert got[1]["gain"] > 0 and got[2]["gain"] > 0


def test_conformal_coverage_near_target(spark, sf_dir):
    """Split-conformal guarantee: realized test coverage should sit
    near (and, in expectation, at least at) the 1-alpha target; the
    rank index matches the ceil((n+1)(1-alpha)) definition recomputed
    in Python."""
    import math

    from spark_streaming_test_spark.operators import mltrain

    r = mltrain.ml_conformal_interval(spark, sf_dir).collect()[0]
    assert r["target"] == 0.9
    assert r["qhat"] > 0
    # generous band: 3 binomial sd at the smallest test split
    sd = math.sqrt(0.9 * 0.1 / max(r["n_test"], 1))
    assert r["coverage"] >= 0.9 - 4 * sd, (r["coverage"], r["n_test"])
    assert r["coverage"] <= 1.0
    assert r["n_train"] + r["n_cal"] + r["n_test"] > 0


def test_permutation_importance_properties(spark, sf_dir):
    """Structural invariants: both features reported off one shared
    baseline; importance is exactly mse_permuted - mse_base; at least
    one feature carries real signal (strictly positive importance —
    a near-zero or negative value for the other is itself the
    diagnostic: that feature is uninformative to this model)."""
    from spark_streaming_test_spark.operators import mltrain

    rows = {
        r["feature"]: r
        for r in mltrain.ml_permutation_importance(spark, sf_dir).collect()
    }
    assert set(rows) == {"x1_hour", "x2_is_purchase"}
    assert len({r["mse_base"] for r in rows.values()}) == 1
    for r in rows.values():
        assert r["mse_base"] > 0 and r["mse_permuted"] > 0
        assert abs(r["importance"] - (r["mse_permuted"] - r["mse_base"])) < 1e-9
    assert max(r["importance"] for r in rows.values()) > 0


def test_isotonic_pav_python_replay(spark, sf_dir):
    """Replay PAV in Python with exact fractions over the same decile
    bins; the block structure and pooled rates must match, and the
    output must be monotone with conserved mass."""
    from fractions import Fraction

    from spark_streaming_test_spark.operators import mltrain

    scored = sorted(
        (
            (r["value"], r["event_id"], 1 if r["event_type"] == "purchase" else 0)
            for r in load(spark, sf_dir, "events")
            .select("value", "event_id", "event_type")
            .collect()
        )
    )
    n = len(scored)
    B = mltrain.ISO_BINS
    # NTILE semantics: first (n % B) tiles get ceil(n/B)
    sizes = [(n // B) + (1 if i < n % B else 0) for i in range(B)]
    bins = []
    k = 0
    for i, sz in enumerate(sizes, start=1):
        ys = [y for _, _, y in scored[k : k + sz]]
        bins.append([i, i, len(ys), sum(ys)])
        k += sz
    # classic PAV: merge while any adjacent violation exists
    out = []
    for b in bins:
        out.append(list(b))
        while len(out) >= 2 and Fraction(out[-2][3], out[-2][2]) > Fraction(
            out[-1][3], out[-1][2]
        ):
            lo2, hi2, n2, p2 = out.pop()
            out[-1][1] = hi2
            out[-1][2] += n2
            out[-1][3] += p2
    got = sorted(
        (r["lo_bin"], r["hi_bin"], r["n"], r["pos"])
        for r in mltrain.ml_isotonic_calibration(spark, sf_dir).collect()
    )
    expect = sorted((lo, hi, nn, pp) for lo, hi, nn, pp in out)
    assert got == expect, (got, expect)
    rows = sorted(
        mltrain.ml_isotonic_calibration(spark, sf_dir).collect(),
        key=lambda r: r["block"],
    )
    ps = [r["calibrated_p"] for r in rows]
    assert all(b >= a for a, b in zip(ps, ps[1:])), ps
    assert sum(r["n"] for r in rows) == n
