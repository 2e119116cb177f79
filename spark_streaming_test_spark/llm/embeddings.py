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
