"""Embedding-vector column operators: L2 normalization and int8
quantization — the storage/serving path of a vector corpus.

At 100 TB the embedding store dominates bytes: quantizing float32 →
int8 cuts it 4× and normalization makes cosine a plain dot product
downstream. Both are pure higher-order-function projections
(``transform``/``aggregate``) inside codegen — no Python, no shuffle;
they pipeline with the scan.

Determinism note: every floating-point reduction here is a sequential
left fold (``F.aggregate``), bitwise identical to DuckDB's
``list_inner_product``; quantization uses ``floor(x*127 + 0.5)`` rather
than ``round`` so tie-breaking can't differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register


def _sumsq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v)


@register(
    "emb_normalize_quantize",
    tags=("llm", "embedding", "quantize"),
    oracle="""
WITH v AS (
  SELECT vec_id, label,
         embedding::DOUBLE[] AS emb,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
  FROM embeddings
)
SELECT vec_id, label,
       len(emb) AS n_dims,
       l2_norm,
       COALESCE(array_to_string(
         list_transform(emb, x -> CAST(floor(x / l2_norm * 127 + 0.5) AS INT)), ','), '')
         AS q8,
       list_inner_product(
         list_transform(emb, x -> x / l2_norm),
         list_transform(emb, x -> x / l2_norm)) AS unit_sumsq
FROM v
""",
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding and quantize to int8 (symmetric,
    scale 127). ``unit_sumsq`` audits the normalization (≈1.0 per row).
    One narrow codegen'd projection: at 100 TB this runs at scan speed
    and writes a 4×-smaller vector column."""
    e = spread(load(spark, sf_dir, "embeddings"))
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    unit = F.transform(F.col("emb"), lambda x: x / F.col("l2_norm"))
    return (
        e.select("vec_id", "label", emb.alias("emb"))
        .withColumn("l2_norm", F.sqrt(_sumsq(F.col("emb"))))
        .select(
            "vec_id",
            "label",
            F.size("emb").alias("n_dims"),
            "l2_norm",
            F.concat_ws(
                ",",
                F.transform(
                    F.col("emb"),
                    lambda x: F.floor(x / F.col("l2_norm") * 127 + 0.5).cast("int"),
                ).cast("array<string>"),
            ).alias("q8"),
            _sumsq(unit).alias("unit_sumsq"),
        )
    )


# --- embedding isotropy diagnostic ----------------------------------------

ISO_DP = 8  # normalized components are generic (division by a norm)


@register(
    "emb_isotropy_score",
    tags=("llm", "embeddings", "diagnostics"),
    oracle=f"""
WITH nrm AS (
  SELECT vec_id,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nn,
         embedding::DOUBLE[] AS x
  FROM embeddings
),
comp AS (
  SELECT vec_id, generate_subscripts(x, 1) AS dim,
         CAST(round(unnest(x) / nn, {ISO_DP}) AS DECIMAL(25,{ISO_DP})) AS u
  FROM nrm
),
mu AS (
  SELECT dim, CAST(SUM(u) AS DOUBLE) / COUNT(*) AS m
  FROM comp GROUP BY dim
),
agg AS (
  SELECT COUNT(*) AS d,
         CAST(SUM(CAST(round(m * m, {ISO_DP}) AS DECIMAL(25,{ISO_DP})))
              AS DOUBLE) AS mu_norm2
  FROM mu
),
nv AS (SELECT COUNT(*) AS n FROM embeddings)
SELECT CAST(nv.n AS BIGINT) AS n_vecs,
       CAST(agg.d AS INTEGER) AS dim,
       round(sqrt(agg.mu_norm2), {ISO_DP}) AS mean_vector_norm,
       round(1.0 - sqrt(agg.mu_norm2), {ISO_DP}) AS isotropy_proxy
FROM agg CROSS JOIN nv
""",
)
def emb_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy diagnostic: the norm of the mean DIRECTION
    vector — anisotropic embedding spaces (all vectors share a common
    direction, the known failure of contextual encoders) have
    ‖mean(x/‖x‖)‖ near 1, killing cosine contrast; healthy spaces sit
    near 0. The go/no-go check before trusting cosine thresholds for
    dedup or retrieval (Ethayarajh 2019's first-order version).

    One posexplode pass: normalized components round generically
    (divisions by an irrational norm — tie-free) and average as exact
    decimals per dimension; the D-row mean vector reduces to one
    norm. Shuffle carries O(tasks × dims) partials only."""
    e = spread(load(spark, sf_dir, "embeddings"))
    x = F.col("embedding").cast("array<double>")
    nrm = e.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                F.zip_with(x, x, lambda a, b: a * b),
                F.lit(0.0),
                lambda s, v: s + v,
            )
        ).alias("nn"),
        x.alias("x"),
    )
    dec = f"decimal(25,{ISO_DP})"
    comp = nrm.select(
        F.posexplode("x").alias("dim0", "v"), F.col("nn")
    ).select(
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("v") / F.col("nn"), ISO_DP).cast(dec).alias("u"),
    )
    mu = comp.groupBy("dim").agg(
        (F.sum("u").cast("double") / F.count(F.lit(1))).alias("m")
    )
    agg = mu.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.round(F.col("m") * F.col("m"), ISO_DP).cast(dec))
        .cast("double")
        .alias("mu_norm2"),
    )
    nv = e.agg(F.count(F.lit(1)).alias("n"))
    return agg.crossJoin(F.broadcast(nv)).select(
        F.col("n").cast("bigint").alias("n_vecs"),
        F.col("d").cast("int").alias("dim"),
        F.round(F.sqrt("mu_norm2"), ISO_DP).alias("mean_vector_norm"),
        F.round(1.0 - F.sqrt("mu_norm2"), ISO_DP).alias("isotropy_proxy"),
    )


# --- Johnson-Lindenstrauss random projection -------------------------------

JL_OUT_DIM = 16   # target dimension m
JL_PAIR_CAP = 60  # distortion audit over C(60,2) = 1770 pairs
JL_DP = 8         # rounding for the distortion ratio


@register(
    "emb_random_projection_jl",
    tags=("llm", "embeddings", "projection", "jl"),
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS x
  FROM embeddings WHERE vec_id < {JL_PAIR_CAP}
),
proj AS (
  SELECT vec_id,
         list_transform(range(1, {JL_OUT_DIM} + 1), j ->
           list_reduce(
             list_transform(range(1, len(x) + 1), i ->
               x[i] * (CASE WHEN ('0x' || substr(
                           md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                           1, 2))::BIGINT % 2 = 0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
             (a, b) -> a + b)
           / sqrt(CAST({JL_OUT_DIM} AS DOUBLE))) AS y
  FROM base
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_reduce(list_transform(range(1, len(a.x) + 1),
                     i -> (a.x[i] - b.x[i]) * (a.x[i] - b.x[i])),
                     (s, v) -> s + v) AS dx2,
         list_reduce(list_transform(range(1, {JL_OUT_DIM} + 1),
                     j -> (a.y[j] - b.y[j]) * (a.y[j] - b.y[j])),
                     (s, v) -> s + v) AS dy2
  FROM (SELECT p.vec_id, p.y, b.x FROM proj p JOIN base b USING (vec_id)) a
  JOIN (SELECT p.vec_id, p.y, b.x FROM proj p JOIN base b USING (vec_id)) b
    ON a.vec_id < b.vec_id
),
ratios AS (
  SELECT round(dy2 / dx2, {JL_DP}) AS ratio
  FROM pairs WHERE dx2 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(ratio) AS min_ratio,
       MAX(ratio) AS max_ratio,
       CAST(SUM(CAST(ratio AS DECIMAL(25,{JL_DP}))) AS DOUBLE) / COUNT(*)
         AS mean_ratio,
       CAST(COUNT(CASE WHEN ratio >= 0.5 AND ratio <= 1.5 THEN 1 END)
            AS DOUBLE) / COUNT(*) AS frac_within_50pct
FROM ratios
""",
)
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (64 -> {JL_OUT_DIM} dims
    via a deterministic ±1 sign matrix) with a pairwise-distortion
    audit: JL says random ±1 projections preserve pairwise squared
    distances within (1±eps) w.h.p., which is why sketching embeddings
    BEFORE LSH/clustering is the standard 100 TB move — 4x fewer
    bytes shuffled for near-identical neighbor structure. The sign
    matrix is md5-derived per (in_dim, out_dim) cell, so every task,
    engine, and rerun projects identically with no materialized matrix
    at all (the matrix-free trick: the hash IS the matrix).

    Scale shape: the projection is a zero-shuffle higher-order-function
    fold inside codegen (per row: m x d multiply-adds); the audit
    self-join is capped at {JL_PAIR_CAP} ids (documented diagnostic
    cap — production audits sample pairs the same way). Determinism:
    every reduction is a sequential left fold mirrored by DuckDB
    list_reduce; ratios are rounded at {JL_DP} dp before the decimal-
    summed mean; quarter thresholds compare identical doubles."""
    base = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < JL_PAIR_CAP)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
    )

    def sign(i: Column, j: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        i.cast("string"), F.lit("_"), j.cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("bigint")
        return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    x = F.col("x")
    y = F.transform(
        F.sequence(F.lit(1), F.lit(JL_OUT_DIM)),
        lambda j: F.aggregate(
            F.sequence(F.lit(1), F.size(x)),
            F.lit(0.0),
            lambda s, i: s + F.element_at(x, i) * sign(i, j),
        )
        / F.sqrt(F.lit(float(JL_OUT_DIM))),
    )
    proj = base.select("vec_id", "x", y.alias("y"))
    a = proj.select(
        F.col("vec_id").alias("va"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = proj.select(
        F.col("vec_id").alias("vb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )

    def d2(u: Column, v: Column, n: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n),
            F.lit(0.0),
            lambda s, i: s
            + (F.element_at(u, i) - F.element_at(v, i))
            * (F.element_at(u, i) - F.element_at(v, i)),
        )

    pairs = a.join(b, F.col("va") < F.col("vb")).select(
        d2(F.col("xa"), F.col("xb"), F.size(F.col("xa"))).alias("dx2"),
        d2(F.col("ya"), F.col("yb"), F.lit(JL_OUT_DIM)).alias("dy2"),
    )
    ratios = pairs.filter(F.col("dx2") > 0).select(
        F.round(F.col("dy2") / F.col("dx2"), JL_DP).alias("ratio")
    )
    within = (F.col("ratio") >= 0.5) & (F.col("ratio") <= 1.5)
    return ratios.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        (
            F.sum(F.col("ratio").cast(f"decimal(25,{JL_DP})")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_ratio"),
        (
            F.count(F.when(within, 1)).cast("double") / F.count(F.lit(1))
        ).alias("frac_within_50pct"),
    )
