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
