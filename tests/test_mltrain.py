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
