"""Rank-based and agreement statistics: Kruskal–Wallis, Cohen's kappa,
McNemar's test.

Rounds out the statistical-testing family (``mlstats.py`` has z/t/chi²/
KS/ANOVA; ``evalmetrics.py`` grades models): Kruskal–Wallis is the
nonparametric k-group ANOVA (the distribution-free sibling of
``agg_anova_oneway``), Cohen's kappa is the chance-corrected
inter-annotator agreement every labeling pipeline reports before
trusting its raters, and McNemar's test is the PAIRED classifier
comparison — the correct test when two models are evaluated on the
same examples (an unpaired z-test overstates significance because the
per-example outcomes are correlated).

Generalizes the reference's aggregate-then-decide shape
(``MainApp.java:38-49``: sum-by-key → threshold verdict) to
statistical verdicts over the same kind of grouped aggregates.

Determinism, cross-engine: every statistic here is INTEGER counting
until one (or two) final double divisions of bitwise-identical
operands — ranks are exact rationals carried as twice-rank integers,
agreement tables are plain counts — so Spark and DuckDB agree bitwise
with no decimal routing needed.

Scale notes: Kruskal–Wallis ranks live on the DISTINCT-VALUE table,
not the row table — event values are bounded-domain money-style
2-decimal numbers, so the global rank cumsum window runs over a
domain-bounded frame (≤ ~56k rows at any corpus size; at 100 TB the
row→(value, group) count aggregation is the only corpus-sized
shuffle and it map-side combines). Kappa/McNemar reduce the corpus to
a ≤ 9-cell contingency table in ONE conditional-aggregate pass.
Int64 headroom: the squared twice-rank-sum term is computed in double
(values ≤ 4e9 at sf0.1 would overflow int64 when squared; the double
square is the same IEEE op on both engines), and the N³ tie-correction
denominator is documented exact-in-double to N ≈ 2e5 — beyond that
both engines still agree (same expression), the statistic just carries
the usual float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# --- Kruskal–Wallis H across event types --------------------------------
#
# Average ranks with ties, kept exact: for a distinct value v with t_v
# occurrences and c_v values strictly below it, each occurrence's
# average rank is c_v + (t_v + 1)/2 — a half-integer, so TWICE the
# rank, 2c_v + t_v + 1, is an integer. Group rank sums are carried as
# twice-sums (TwoR_j); H uses R_j² = TwoR_j²/4, folded into the
# constant: H = 3/(N(N+1)) · Σ TwoR_j²/n_j − 3(N+1).

def _sql_kruskal_oracle() -> str:
    return """
WITH vg AS (
  SELECT value AS v, event_type AS g, COUNT(*) AS n_vg
  FROM events GROUP BY value, event_type
),
vt AS (
  SELECT v, CAST(SUM(n_vg) AS BIGINT) AS t FROM vg GROUP BY v
),
ranked AS (
  SELECT v, t,
         SUM(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t AS c
  FROM vt
),
grp AS (
  SELECT vg.g AS event_type,
         CAST(SUM(vg.n_vg) AS BIGINT) AS n_j,
         CAST(SUM(vg.n_vg * (2 * r.c + r.t + 1)) AS BIGINT) AS two_r
  FROM vg JOIN ranked r ON vg.v = r.v
  GROUP BY vg.g
),
tot AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n,
         list_reduce(
           list(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)
                / CAST(n_j AS DOUBLE) ORDER BY event_type),
           (a, x) -> a + x) AS sum_sq
  FROM grp
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM vt
),
stat AS (
  SELECT n,
         3.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * sum_sq
           - 3.0 * CAST(n + 1 AS DOUBLE) AS h_raw,
         1.0 - CAST(tie_sum AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                - CAST(n AS DOUBLE)) AS tie_c
  FROM tot, ties
)
SELECT g.event_type,
       g.n_j,
       CAST(g.two_r AS DOUBLE) / (2.0 * CAST(g.n_j AS DOUBLE)) AS mean_rank,
       s.n AS n_total,
       s.h_raw AS h_stat,
       s.h_raw / s.tie_c AS h_adj
FROM grp g CROSS JOIN stat s
"""


@register(
    "agg_kruskal_wallis",
    tags=("stats", "rank", "hypothesis-test"),
    oracle=_sql_kruskal_oracle(),
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test: do the k event-type groups draw `value`
    from the same distribution? Nonparametric — uses only ranks, so
    it is immune to the heavy right tail that violates the ANOVA
    normality assumption (`agg_anova_oneway` is the parametric twin;
    reporting both is the standard robustness check).

    Exact average ranks with ties via the twice-rank integer trick;
    tie-corrected H_adj = H / (1 − Σ(t³−t)/(N³−N)). Output: one row
    per group with its size and mean rank, plus the global H and
    tie-corrected H (repeated per row, so the whole verdict is in the
    hashed result).

    Plan: corpus → (value, group) counts (ONE map-side-combined
    shuffle of ≤ |domain|×k partials), a rank cumsum window over the
    DOMAIN-BOUNDED distinct-value table, then a k-row reduce. The
    global unpartitioned window is safe exactly because it never sees
    rows — only distinct 2-decimal values (bounded-domain money
    columns; at 100 TB still ≤ ~56k window rows)."""
    e = load(spark, sf_dir, "events")
    vg = e.groupBy(F.col("value").alias("v"), F.col("event_type").alias("g")).agg(
        F.count(F.lit(1)).alias("n_vg")
    )
    vt = vg.groupBy("v").agg(F.sum("n_vg").cast("bigint").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = vt.select(
        "v", "t", (F.sum("t").over(w) - F.col("t")).alias("c")
    )
    grp = (
        vg.join(ranked, vg.v == ranked.v)
        .groupBy(F.col("g").alias("event_type"))
        .agg(
            F.sum("n_vg").cast("bigint").alias("n_j"),
            F.sum(
                F.col("n_vg") * (2 * F.col("c") + F.col("t") + 1)
            ).cast("bigint").alias("two_r"),
        )
    )
    # The k per-group squared terms sum in a FIXED order (group-name
    # sort, sequential left fold): a naive double SUM is
    # order-dependent and diverged from the oracle in the 11th digit,
    # and the usual decimal(25,6) routing is unsafe here — terms reach
    # ~1e11, where DuckDB's double→decimal conversion (scaled through
    # a double) drops low bits past 2^53. k is the group-type count,
    # so the collect_list is bounded and driver-free.
    tot = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(event_type, "
            "cast(two_r as double) * cast(two_r as double) "
            "/ cast(n_j as double) as term))), s -> s.term), "
            "cast(0.0 as double), (a, x) -> a + x)"
        ).alias("sum_sq"),
    )
    ties = vt.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_sum")
    )
    nd = F.col("n").cast("double")
    stat = tot.crossJoin(F.broadcast(ties)).select(
        "n",
        (
            F.lit(3.0) / (nd * (F.col("n") + 1).cast("double")) * F.col("sum_sq")
            - F.lit(3.0) * (F.col("n") + 1).cast("double")
        ).alias("h_raw"),
        (
            F.lit(1.0)
            - F.col("tie_sum").cast("double") / (nd * nd * nd - nd)
        ).alias("tie_c"),
    )
    return grp.crossJoin(F.broadcast(stat)).select(
        "event_type",
        "n_j",
        (
            F.col("two_r").cast("double") / (F.lit(2.0) * F.col("n_j").cast("double"))
        ).alias("mean_rank"),
        F.col("n").alias("n_total"),
        F.col("h_raw").alias("h_stat"),
        (F.col("h_raw") / F.col("tie_c")).alias("h_adj"),
    )


# --- Cohen's kappa: inter-rater agreement on document quality -----------
#
# Two independent heuristic "raters" bucket every document into
# short/mid/long quality tiers — rater A from raw character count,
# rater B from whitespace token count (the two cheapest quality
# proxies a curation pipeline actually runs). Kappa asks: do they
# agree beyond what their marginal distributions force?

_A_CHAR_LO, _A_CHAR_HI = 300, 800
_B_TOK_LO, _B_TOK_HI = 50, 130

_SQL_RATERS = f"""
  SELECT CASE WHEN n_chars < {_A_CHAR_LO} THEN 'short'
              WHEN n_chars < {_A_CHAR_HI} THEN 'mid'
              ELSE 'long' END AS ra,
         CASE WHEN len(string_split(text, ' ')) < {_B_TOK_LO} THEN 'short'
              WHEN len(string_split(text, ' ')) < {_B_TOK_HI} THEN 'mid'
              ELSE 'long' END AS rb
  FROM documents
"""


@register(
    "mlstats_cohens_kappa",
    tags=("mlstats", "agreement", "labeling"),
    oracle=f"""
WITH raters AS ({_SQL_RATERS}),
cells AS (
  SELECT ra, rb, COUNT(*) AS c FROM raters GROUP BY ra, rb
),
margins AS (
  SELECT SUM(c) AS n,
         SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS agree
  FROM cells
),
chance AS (
  SELECT CAST(SUM(rm.row_c * cm.col_c) AS BIGINT) AS exp_agree
  FROM (SELECT ra AS k, SUM(c) AS row_c FROM cells GROUP BY ra) rm
  JOIN (SELECT rb AS k, SUM(c) AS col_c FROM cells GROUP BY rb) cm
    ON rm.k = cm.k
)
SELECT CAST(m.n AS BIGINT) AS n_docs,
       CAST(m.agree AS BIGINT) AS n_agree,
       CAST(m.agree AS DOUBLE) / CAST(m.n AS DOUBLE) AS po,
       CAST(c.exp_agree AS DOUBLE)
         / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)) AS pe,
       (CAST(m.agree AS DOUBLE) / CAST(m.n AS DOUBLE)
        - CAST(c.exp_agree AS DOUBLE)
          / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)))
       / (1.0 - CAST(c.exp_agree AS DOUBLE)
          / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE))) AS kappa
FROM margins m CROSS JOIN chance c
""",
)
def mlstats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two heuristic document-quality raters
    (character-count terciles vs token-count terciles). κ = (p_o −
    p_e)/(1 − p_e) — chance-corrected agreement, the gate a labeling
    pipeline applies to rater pairs before accepting their labels.

    Plan: ONE corpus pass reduces to a ≤ 9-cell contingency table;
    marginals, expected agreement, and κ are all driver-negligible
    arithmetic on that table. Every input to the three final
    divisions is an int64 count, so both engines divide identical
    operands. (Σ row·col marginal products stays < 2^63 up to
    n_docs ≈ 3e9; beyond that the product term moves to double with
    both engines still agreeing on the shared expression.)"""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ", -1))
    raters = d.select(
        F.when(F.col("n_chars") < _A_CHAR_LO, "short")
        .when(F.col("n_chars") < _A_CHAR_HI, "mid")
        .otherwise("long")
        .alias("ra"),
        F.when(toks < _B_TOK_LO, "short")
        .when(toks < _B_TOK_HI, "mid")
        .otherwise("long")
        .alias("rb"),
    )
    cells = raters.groupBy("ra", "rb").agg(F.count(F.lit(1)).alias("c"))
    margins = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    rm = cells.groupBy(F.col("ra").alias("k")).agg(F.sum("c").alias("row_c"))
    cm = cells.groupBy(F.col("rb").alias("k")).agg(F.sum("c").alias("col_c"))
    chance = (
        rm.join(cm, "k")
        .agg(F.sum(F.col("row_c") * F.col("col_c")).cast("bigint").alias("exp_agree"))
    )
    nd = F.col("n").cast("double")
    pe = F.col("exp_agree").cast("double") / (nd * nd)
    po = F.col("agree").cast("double") / nd
    return margins.crossJoin(F.broadcast(chance)).select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


# --- McNemar's test: paired comparison of two keep/drop classifiers -----

_TRUTH_SQL = "lang = 'en'"
_A_PRED_CHARS = 400  # classifier A: keep iff n_chars >= this
_B_PRED_TOKS = 60    # classifier B: keep iff token count >= this


@register(
    "mlstats_mcnemar",
    tags=("mlstats", "hypothesis-test", "paired"),
    oracle=f"""
WITH paired AS (
  SELECT (CASE WHEN n_chars >= {_A_PRED_CHARS} THEN 1 ELSE 0 END)
           = (CASE WHEN {_TRUTH_SQL} THEN 1 ELSE 0 END) AS a_ok,
         (CASE WHEN len(string_split(text, ' ')) >= {_B_PRED_TOKS}
               THEN 1 ELSE 0 END)
           = (CASE WHEN {_TRUTH_SQL} THEN 1 ELSE 0 END) AS b_ok
  FROM documents
),
cells AS (
  SELECT CAST(SUM(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM paired
)
SELECT n11, b, c, n00,
       CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
         / CAST(NULLIF(b + c, 0) AS DOUBLE) AS chi2_cc
FROM cells
""",
)
def mlstats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test with continuity correction: are classifier A
    (n_chars ≥ {_A_PRED_CHARS}) and classifier B (tokens ≥
    {_B_PRED_TOKS}) equally accurate at predicting lang='en' ON THE
    SAME documents? Only the discordant pairs carry signal —
    χ²_cc = (|b−c|−1)²/(b+c) — which is why the paired test, not an
    unpaired proportion z-test, is correct for same-eval-set model
    comparisons.

    Plan: ONE conditional-aggregate corpus pass → a 4-cell table →
    one integer-operand division. Nothing here grows with scale
    except the map-side-combined scan."""
    d = load(spark, sf_dir, "documents")
    truth = (F.col("lang") == "en").cast("int")
    a_ok = (F.col("n_chars") >= _A_PRED_CHARS).cast("int") == truth
    b_ok = (
        F.size(F.split(F.col("text"), " ", -1)) >= _B_PRED_TOKS
    ).cast("int") == truth
    paired = d.select(a_ok.alias("a_ok"), b_ok.alias("b_ok"))
    cells = paired.agg(
        F.sum((F.col("a_ok") & F.col("b_ok")).cast("int")).cast("bigint").alias("n11"),
        F.sum((F.col("a_ok") & ~F.col("b_ok")).cast("int")).cast("bigint").alias("b"),
        F.sum((~F.col("a_ok") & F.col("b_ok")).cast("int")).cast("bigint").alias("c"),
        F.sum((~F.col("a_ok") & ~F.col("b_ok")).cast("int")).cast("bigint").alias("n00"),
    )
    diff = F.abs(F.col("b") - F.col("c")) - 1
    return cells.select(
        "n11",
        "b",
        "c",
        "n00",
        (
            (diff * diff).cast("double")
            / F.nullif(F.col("b") + F.col("c"), F.lit(0)).cast("double")
        ).alias("chi2_cc"),
    )


# --- Cramér's V: effect size for categorical association ----------------

_CV_DP = 8  # chi-square rounding, matches CHI2_DP in mlstats.py


@register(
    "agg_cramers_v",
    tags=("stats", "association", "categorical"),
    oracle=f"""
WITH dows AS (SELECT unnest(range(1, 8)) AS dow),
types AS (SELECT DISTINCT event_type FROM events),
obs AS (
  SELECT event_type, CAST(EXTRACT(dow FROM ts) AS INTEGER) + 1 AS dow,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, d.dow,
         CAST(COALESCE(o.c, 0) AS DOUBLE) AS o
  FROM types t CROSS JOIN dows d
  LEFT JOIN obs o ON o.event_type = t.event_type AND o.dow = d.dow
),
margins AS (
  SELECT o,
         SUM(o) OVER (PARTITION BY event_type) AS row_tot,
         SUM(o) OVER (PARTITION BY dow) AS col_tot,
         SUM(o) OVER () AS n
  FROM grid
),
terms AS (
  SELECT CAST(round(
           (o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
             / (row_tot * col_tot / n), {_CV_DP + 2})
         AS DECIMAL(25,{_CV_DP + 2})) AS term,
         n
  FROM margins
),
agg AS (
  SELECT round(CAST(SUM(term) AS DOUBLE), {_CV_DP}) AS chi2,
         CAST(MAX(n) AS BIGINT) AS n,
         (SELECT COUNT(*) FROM types) AS r,
         7 AS c
  FROM terms
)
SELECT n, CAST(r AS INTEGER) AS n_row_cats, CAST(c AS INTEGER) AS n_col_cats,
       chi2,
       sqrt(chi2 / (CAST(n AS DOUBLE)
                    * CAST(LEAST(r - 1, c - 1) AS DOUBLE))) AS cramers_v
FROM agg
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0, 1] effect size for the event-type ×
    day-of-week association: V = √(χ²/(n·min(r−1, c−1))). The
    chi-square TEST (ab_test_chi_square) answers "is there any
    association"; V answers "how strong" on a scale comparable across
    table shapes — the number a feature screen actually thresholds.

    The contingency grid is COMPLETED (types × all 7 weekdays, zero
    cells included) so expected counts are right even for empty cells.
    Counts are integer-exact doubles, each (O−E)²/E term quantizes to
    decimal before the order-free sum (the ab_test_chi_square rule),
    and V is one sqrt of identical doubles. One corpus pass; the grid
    is r×7 rows."""
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = e.select("event_type").distinct()
    dows = spark.range(1, 8).select(F.col("id").cast("int").alias("dow"))
    grid = (
        types.crossJoin(F.broadcast(dows))
        .join(F.broadcast(obs), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("o"),
        )
    )
    margins = grid.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = F.round(
        (F.col("o") - exp) * (F.col("o") - exp) / exp, _CV_DP + 2
    ).cast(f"decimal(25,{_CV_DP + 2})")
    r_cnt = types.agg(F.count(F.lit(1)).alias("r"))
    agg = (
        margins.select(term.alias("term"), "n")
        .agg(
            F.round(F.sum("term").cast("double"), _CV_DP).alias("chi2"),
            F.max("n").cast("bigint").alias("n"),
        )
        .crossJoin(F.broadcast(r_cnt))
        .withColumn("c", F.lit(7))
    )
    return agg.select(
        "n",
        F.col("r").cast("int").alias("n_row_cats"),
        F.col("c").cast("int").alias("n_col_cats"),
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
            )
        ).alias("cramers_v"),
    )


# --- rank-biased overlap ----------------------------------------------------

RBO_K = 20
RBO_P = 0.9
# Precompute the geometric weights in Python and inline them as literals
# so both engines consume the IDENTICAL doubles (pow() may differ by an
# ulp between libm and the JVM).
_RBO_W = []
_acc = 1.0
for _d in range(1, RBO_K + 1):
    _RBO_W.append((_d, (1.0 - RBO_P) * _acc))
    _acc = _acc * RBO_P
_SQL_RBO_DEPTHS = ", ".join(f"({d}, {w!r})" for d, w in _RBO_W)


@register(
    "mlstats_rbo_ranking",
    tags=("mlstats", "ranking", "rbo"),
    oracle=f"""
WITH tot AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,2))
           AS rev,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS qty
  FROM lineitem GROUP BY l_partkey
),
ra AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS rank_a
  FROM tot
),
rb AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey) AS rank_b
  FROM tot
),
j AS (
  SELECT ra.l_partkey, ra.rank_a, rb.rank_b
  FROM ra JOIN rb ON ra.l_partkey = rb.l_partkey
  WHERE ra.rank_a <= {RBO_K} OR rb.rank_b <= {RBO_K}
),
depths(d, w) AS (VALUES {_SQL_RBO_DEPTHS}),
ov AS (
  SELECT depths.d, depths.w,
         COUNT(CASE WHEN j.rank_a <= depths.d AND j.rank_b <= depths.d
                    THEN 1 END) AS o
  FROM depths LEFT JOIN j ON TRUE
  GROUP BY depths.d, depths.w
)
SELECT {RBO_K} AS k, CAST({RBO_P} AS DOUBLE) AS p,
       CAST(SUM(CAST(round(w * o / d, 10) AS DECIMAL(20,10))) AS DOUBLE)
         AS rbo,
       CAST(MAX(CASE WHEN d = {RBO_K} THEN o END) AS BIGINT) AS overlap_at_k,
       CAST(MAX(CASE WHEN d = {RBO_K} THEN o END) AS DOUBLE) / {RBO_K}
         AS agreement_at_k
FROM ov
""",
)
def mlstats_rbo_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between two rankings of the
    same items — parts by revenue vs parts by quantity: RBO@{RBO_K} =
    Σ_d (1-p)p^(d-1) · |A_d ∩ B_d|/d, the top-weighted agreement
    measure that (unlike Kendall/Spearman) handles the only-top-k-
    matters case and indefinite rankings. The standard answer to "did
    the ranking change materially?" for search/reco regression gates
    and feature-ablation comparisons.

    Determinism: geometric weights are Python-precomputed literals
    (identical doubles in both engines — pow() is not trusted across
    libms); per-depth terms are rounded at 10 dp and decimal-summed.
    Prefix overlaps are exact integer counts off each item's two
    ranks; ranking ties break on the item key.

    Scale shape: the two rankings are top-{RBO_K} problems — the
    filter keeps only items ranked ≤ k in either list, so the depth
    cross-join touches ≤ 2k rows against a {RBO_K}-row broadcast
    literal frame. The per-item rank windows run on the part-level
    aggregate (map-side combined), and at planetary part counts they
    swap for TakeOrdered top-k extraction — same output, no global
    sort."""
    li = load(spark, sf_dir, "lineitem")
    tot = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(24,2)")
        .alias("rev"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(24,2)")
        .alias("qty"),
    )
    ra = tot.select(
        "l_partkey",
        F.row_number()
        .over(Window.orderBy(F.col("rev").desc(), F.col("l_partkey")))
        .alias("rank_a"),
    )
    rb = tot.select(
        "l_partkey",
        F.row_number()
        .over(Window.orderBy(F.col("qty").desc(), F.col("l_partkey")))
        .alias("rank_b"),
    )
    j = (
        ra.join(rb, "l_partkey")
        .filter((F.col("rank_a") <= RBO_K) | (F.col("rank_b") <= RBO_K))
    )
    depths = spark.createDataFrame(_RBO_W, "d int, w double")
    ov = (
        F.broadcast(depths)
        .join(j, F.lit(True), "left")
        .groupBy("d", "w")
        .agg(
            F.count(
                F.when(
                    (F.col("rank_a") <= F.col("d"))
                    & (F.col("rank_b") <= F.col("d")),
                    1,
                )
            ).alias("o")
        )
    )
    term = F.round(F.col("w") * F.col("o") / F.col("d"), 10)
    at_k = F.when(F.col("d") == RBO_K, F.col("o"))
    return ov.agg(
        F.lit(RBO_K).alias("k"),
        F.lit(RBO_P).alias("p"),
        F.sum(term.cast("decimal(20,10)")).cast("double").alias("rbo"),
        F.max(at_k).cast("bigint").alias("overlap_at_k"),
        (F.max(at_k).cast("double") / RBO_K).alias("agreement_at_k"),
    )
