"""TextRank keyword extraction: co-occurrence graph + PageRank.

The unsupervised keyword extractor (Mihalcea & Tarau 2004): tokens
become nodes, adjacency within text becomes edges, and PageRank over
that graph surfaces the terms most central to the corpus's phrasing —
a different (and complementary) signal from TF-IDF's rarity weighting.
For a training-data pipeline this is topic tagging and domain labeling
without a model.

Composition of two machines this engine already trusts: the tokenize→
explode→count shape of ``llm/retrieval.py`` builds the bigram-adjacency
edge list (support-thresholded, like the co-purchase graph), and the
fixed-point int64 PageRank of ``operators/graph.py`` iterates it —
same determinism argument (integer arithmetic has no rounding modes to
disagree on; see ``graph_pagerank``'s docstring for the float
divergence that motivated it).

Scale: the corpus-sized stage is token adjacency extraction (explode +
hash agg with map-side combine). The graph is vocabulary-sized
(Heaps' law), so every iteration joins a broadcast rank frame against
a cached vocabulary-sized edge list and shuffles O(vocab) partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..operators.graph import DAMP_DEN, DAMP_NUM, FP_ONE, _TELEPORT_FP
from ..registry import register

TR_ITERS = 4  # fixed-point iterations (both engines unroll exactly this)
TR_SUPPORT = 3  # adjacency pairs seen fewer times are noise
TR_TOPK = 25  # keywords reported


def _sql_tr_iter(prev: str, out: str) -> str:
    # MATERIALIZED: multi-referenced CTEs inline (and double the tree
    # per iteration) otherwise — see emb_pca_power's measured blowup.
    return f"""
{out} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST({_TELEPORT_FP} + ({DAMP_NUM} * SUM(r.r // d.outdeg))
              // {DAMP_DEN} AS BIGINT) AS r
  FROM tr_edges e
  JOIN {prev} r ON e.src = r.node
  JOIN tr_deg d ON e.src = d.src
  GROUP BY e.dst
)"""


_SQL_TR_ITERS = ",".join(
    _sql_tr_iter(f"tr{i}", f"tr{i + 1}") for i in range(TR_ITERS)
)


@register(
    "text_textrank_keywords",
    tags=("llm", "text", "graph", "keywords"),
    oracle=f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, pos, token FROM (
    SELECT doc_id,
           generate_subscripts(string_split_regex(lower(text), '[^a-z]+'), 1)
             AS pos,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents
  ) WHERE token <> ''
),
adj AS (
  SELECT a.token AS u, b.token AS v
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.token <> b.token
  GROUP BY a.token, b.token
  HAVING COUNT(*) >= {TR_SUPPORT}
),
tr_edges AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM adj
  UNION
  SELECT v AS src, u AS dst FROM adj
),
tr_deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM tr_edges GROUP BY src
),
tr0 AS MATERIALIZED (
  SELECT src AS node, CAST({FP_ONE} AS BIGINT) AS r FROM tr_deg
),
{_SQL_TR_ITERS}
SELECT node AS token,
       CAST(r AS DOUBLE) / {FP_ONE}.0 AS textrank,
       CAST(rk AS INTEGER) AS rank
FROM (
  SELECT node, r,
         ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rk
  FROM tr{TR_ITERS}
) WHERE rk <= {TR_TOPK}
""",
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TR_TOPK} corpus keywords by TextRank: undirected
    bigram-adjacency graph (support >= {TR_SUPPORT}), {TR_ITERS}
    fixed-point PageRank iterations, ranks tie-broken lexically.

    Every iteration joins the cached vocabulary-sized edge list with a
    broadcast rank frame and reduces O(vocab) partials — the
    ``graph_pagerank`` loop pointed at a text graph; lineage truncated
    per iteration. The final top-k is a TakeOrderedAndProject over the
    vocabulary frame."""
    d = spread(load(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    a = tok.alias("a")
    b = tok.alias("b")
    adj = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("a.token") != F.col("b.token")),
        )
        .groupBy(F.col("a.token").alias("u"), F.col("b.token").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= TR_SUPPORT)
        .select("u", "v")
    )
    edges = (
        adj.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(adj.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(FP_ONE).cast("bigint").alias("r")
    )
    for _ in range(TR_ITERS):
        rd = ranks.join(F.broadcast(deg), ranks.node == deg.src).select(
            "node", "r", "outdeg"
        )
        contrib = edges.join(F.broadcast(rd), edges.src == rd.node).select(
            "dst", F.expr("r div outdeg").alias("w")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(_TELEPORT_FP).cast("bigint")
                + F.expr(f"({DAMP_NUM} * sum(w)) div {DAMP_DEN}")
            ).alias("r")
        )
        ranks = ranks.localCheckpoint(eager=False)
    w = Window.orderBy(F.col("r").desc(), "node")
    return (
        ranks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TR_TOPK)
        .select(
            F.col("node").alias("token"),
            (F.col("r").cast("double") / F.lit(float(FP_ONE))).alias(
                "textrank"
            ),
            F.col("rk").cast("int").alias("rank"),
        )
    )
