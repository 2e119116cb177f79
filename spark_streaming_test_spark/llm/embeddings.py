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
