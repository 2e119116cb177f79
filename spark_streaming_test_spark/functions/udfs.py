"""The Python UDF surface: scalar ``@pandas_udf``, grouped-agg
``@pandas_udf``, and ``applyInPandas`` (UDTF-like grouped map).

UDFs are the SLOW PATH — every query here has a pure-JVM twin elsewhere
in the repo (text_analysis.py does token counting in Catalyst
expressions), and the hot paths use those. This module exists because a
complete engine must still offer the escape hatch, with the right
plumbing: all three APIs move data over Arrow in columnar batches
(``spark.sql.execution.arrow.*`` in session.py), never row-at-a-time
pickling, which is the 10-100× difference the Pandas-UDF design exists
for.

UDF objects are built lazily inside each query (``pandas_udf`` resolves
its return type against the active session, so decorating at module
import would require a session before the registry can even list
queries).

Every UDF below computes integer results, so the DuckDB oracle
comparison is exact — no float-association hazards through Python.
"""

from __future__ import annotations

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load, spread
from ..registry import register

_WORD_RE = r"[a-z]+"


@register(
    "udf_pandas_scalar",
    tags=("udf", "pandas"),
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_WORD_RE}')) AS INT) AS n_words
FROM documents
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-batched) counting word tokens —
    pandas' C-backed str.count over the whole series, no per-row
    Python. The JVM-side twin is text_token_count; this exists to
    exercise the vectorized Python path with identical semantics."""

    @pandas_udf("int")
    def count_words(texts: pd.Series) -> pd.Series:
        # nullable Int32: null text stays null (plain astype raises on
        # the NaN that str.count produces for nulls)
        return texts.str.lower().str.count(_WORD_RE).astype("Int32")

    d = spread(load(spark, sf_dir, "documents"))
    return d.select("doc_id", count_words("text").alias("n_words"))


@register(
    "udf_pandas_grouped_agg",
    tags=("udf", "pandas", "agg"),
    oracle="""
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (one group's column in, one scalar
    out). NOTE the scale caveat: unlike built-in aggregates this has NO
    map-side partial aggregation — every group's full column crosses to
    Python on one executor. Fine for moderate group sizes; for 100 TB
    hot keys use built-ins or a salted two-phase pre-aggregation
    (operators/skew.py) first."""

    @pandas_udf("bigint")
    def sum_chars(n_chars: pd.Series) -> int:
        return int(n_chars.sum())

    d = spread(load(spark, sf_dir, "documents"))
    return d.groupBy("lang").agg(sum_chars("n_chars").alias("total_chars"))


@register(
    "udf_apply_in_pandas",
    tags=("udf", "pandas", "grouped-map"),
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
FROM documents
GROUP BY lang
""",
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas`` grouped map (the UDTF shape): each language's
    rows arrive as ONE pandas DataFrame; the function returns an
    arbitrary-schema frame. The per-group profile here is expressible as
    built-ins (that twin is the oracle) — the API matters for logic that
    genuinely isn't, e.g. per-group model scoring or sequence labeling.
    Same scale caveat as any grouped map: one group = one task's memory."""
    d = spread(load(spark, sf_dir, "documents"))

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n_chars"]
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "min_chars": [int(n.min())],
                "max_chars": [int(n.max())],
                "n_long": [int((n > 500).sum())],
            }
        )

    return d.select("lang", "n_chars").groupBy("lang").applyInPandas(
        profile,
        schema="lang string, n_docs bigint, min_chars bigint, max_chars bigint, n_long bigint",
    )


@register(
    "udf_python_udtf",
    tags=("udf", "udtf"),
    oracle="""
SELECT doc_id,
       CAST(i AS INT) AS piece_idx,
       trim(piece) AS piece,
       length(trim(piece)) AS piece_len
FROM (
  SELECT doc_id,
         unnest(string_split(text, '.')) AS piece,
         generate_subscripts(string_split(text, '.'), 1) AS i
  FROM documents
)
WHERE trim(piece) <> ''
""",
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): one input row -> many output
    rows, here sentence-splitting a document (the UDTF third of the
    UDF/UDAF/UDTF surface; the declarative twin is
    ``explode(split(...))``, which is what the oracle uses). UDTFs run
    row-at-a-time in Python — reserve them for logic ``explode`` can't
    express; this query exists to prove the plumbing end-to-end."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="piece_idx int, piece string, piece_len int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, raw in enumerate(text.split("."), start=1):
                piece = raw.strip()
                if piece:
                    yield i, piece, len(piece)

    spark.udtf.register("sentence_split", SentenceSplit)
    d = spread(load(spark, sf_dir, "documents"))
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.piece_idx, s.piece, s.piece_len
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )


@register(
    "udf_pandas_iter",
    tags=("udf", "pandas", "iterator"),
    oracle="""
SELECT doc_id,
       CAST(round((n_chars - 100.0) / 50.0, 8) AS DOUBLE) AS z_len
FROM documents
""",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — the batch-iterator form whose
    point is ONE-TIME per-task initialization (load a tokenizer /
    ONNX model / regex engine before the first batch, reuse it for
    every Arrow batch that follows). That amortization is the
    difference between "model loads once per task" and "once per
    batch" when scoring 100 TB with an expensive artifact. Here the
    "model" is a trivial (mu, sigma) pair so the arithmetic stays
    oracle-checkable: z = (n_chars − mu)/sigma at 8 dp."""
    @pandas_udf("double")
    def z_len(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init happens HERE, once per task, not per batch
        mu, sigma = 100.0, 50.0
        for s in batches:
            yield ((s - mu) / sigma).round(8)

    d = spread(load(spark, sf_dir, "documents"))
    return d.select("doc_id", z_len("n_chars").alias("z_len"))


@register(
    "udf_map_in_arrow",
    tags=("udf", "arrow"),
    oracle="""
SELECT doc_id,
       CAST(len(text) AS BIGINT) AS n_bytes,
       CAST(len(text) - len(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM documents
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy batch path — the UDF receives raw
    ``pyarrow.RecordBatch`` objects (no pandas materialization at all)
    and answers with Arrow batches, the cheapest possible Python
    detour for columnar compute (here: byte length + whitespace token
    count via Arrow compute kernels). Use when even the pandas
    conversion overhead matters; semantics stay bitwise equal to the
    JVM expressions the oracle runs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def arrow_stats(batches):
        for batch in batches:
            text = batch.column("text")
            n_bytes = pc.binary_length(text)
            spaces = pc.binary_length(
                pc.replace_substring(text, pattern=" ", replacement="")
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(
                        pc.add(pc.subtract(n_bytes, spaces), 1), pa.int64()
                    ),
                ],
                names=["doc_id", "n_bytes", "n_tokens"],
            )

    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    return d.mapInArrow(
        arrow_stats, "doc_id bigint, n_bytes bigint, n_tokens bigint"
    )


@register(
    "udf_apply_in_arrow",
    tags=("udf", "arrow", "grouped"),
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` — the grouped twin of ``mapInArrow``: each group
    arrives as one ``pyarrow.Table`` with ZERO pandas materialization,
    the cheapest grouped-Python path (Spark 4 API). Integer min/max/sum
    through Arrow compute kernels are exact, so the oracle is a plain
    SQL GROUP BY. Scale note: a group must fit one task's memory —
    here groups are per-language document sets; for unbounded groups
    the pre-aggregating ``pandas_udf`` GROUPED_AGG form is the right
    tool instead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: "pa.Table") -> "pa.Table":
        n = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "min_chars": [pc.min(n).as_py()],
                "max_chars": [pc.max(n).as_py()],
                "total_chars": [pc.sum(n).as_py()],
            },
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("min_chars", pa.int64()),
                    ("max_chars", pa.int64()),
                    ("total_chars", pa.int64()),
                ]
            ),
        )

    d = spread(load(spark, sf_dir, "documents")).select("lang", "n_chars")
    return d.groupBy("lang").applyInArrow(
        stats,
        "lang string, n_docs bigint, min_chars bigint, "
        "max_chars bigint, total_chars bigint",
    )


# --- Arrow-optimized scalar Python UDF ------------------------------------


@register(
    "udf_arrow_scalar",
    tags=("udf", "arrow", "spark4"),
    oracle="""
SELECT doc_id,
       CAST(length(text) * 31 % 1000 + len(string_split(text, ' '))
            AS BIGINT) AS sig
FROM documents
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARROW-OPTIMIZED scalar Python UDF (``useArrow=True``,
    Spark 3.5+/4): row-at-a-time Python signature, Arrow-batched
    transfer — the migration path for legacy ``F.udf`` code that
    can't be rewritten as a pandas_udf (10-100x serialization win
    over pickled rows, same per-element semantics). The function is
    a deterministic integer signature, so the oracle recomputes it
    in SQL exactly. (The vectorized pandas_udf and mapInArrow paths
    are the preferred forms — `udf_pandas_scalar`, `udf_map_in_arrow`;
    this pins the drop-in-upgrade path.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType(), useArrow=True)
    def sig(text: str) -> int:
        return len(text) * 31 % 1000 + len(text.split(" "))

    d = spread(load(spark, sf_dir, "documents"))
    return d.select("doc_id", sig("text").alias("sig"))


@register(
    "udf_udtf_polymorphic",
    tags=("udf", "udtf", "polymorphic"),
    oracle="""
SELECT o_orderkey AS key,
       upper(o_orderpriority) AS prio,
       o_totalprice > 150000 AS big
FROM orders
WHERE o_custkey % 211 = 0
""",
)
def udf_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is computed
    at plan time by the static ``analyze`` method from the ARGUMENT
    TYPE — here a struct-flattener whose columns mirror whatever struct
    the caller passes, with no schema hardcoded in the UDTF. This is
    the API for table functions whose shape depends on their input
    (dynamic pivots, config-driven expansions); the basic fixed-schema
    form is ``udf_python_udtf``. Execution is still the Arrow-batched
    UDTF path — one Python boundary, schema resolved before any data
    moves."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FlattenStruct:
        @staticmethod
        def analyze(arg: AnalyzeArgument) -> AnalyzeResult:
            # schema IS the argument's struct type — pure polymorphism
            return AnalyzeResult(schema=arg.dataType)

        def eval(self, s):
            if s is not None:
                yield tuple(s)

    spark.udtf.register("flatten_struct_poly", udtf(FlattenStruct))
    # Filter in a subquery BELOW the lateral (optimization r14, guide
    # §4 "pass only what the function needs"): the WHERE above the
    # lateral fed every orders row through the per-row Python eval
    # (and, on the single-file test scan, on ONE task — measured 1.6 s
    # at sf0.1); the filter touches only o columns, so pushing it under
    # the UDTF is result-identical and cuts the Python rows ~200x.
    # ``spread`` parallelizes what remains.
    spread(load(spark, sf_dir, "orders")).createOrReplaceTempView(
        "orders_poly"
    )
    return spark.sql("""
        SELECT f.* FROM
        (SELECT * FROM orders_poly WHERE o_custkey % 211 = 0) o,
        LATERAL flatten_struct_poly(struct(
            o.o_orderkey AS key,
            upper(o.o_orderpriority) AS prio,
            o.o_totalprice > 150000 AS big
        )) f
    """)


@register(
    "udf_cogroup_apply_in_pandas",
    tags=("udf", "cogroup", "pandas"),
    oracle="""
SELECT c.c_custkey AS custkey,
       c.c_mktsegment AS mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey % 97 = 0
GROUP BY c.c_custkey, c.c_mktsegment
""",
)
def udf_cogroup_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().cogroup(...).applyInPandas`` — the two-sided grouped
    map: both inputs shuffle ONCE on the key and arrive as a pair of
    pandas frames per key, the API for custom per-key merges (as-of
    logic, per-entity reconciliation) that a SQL join can't express.
    Here each customer's orders meet the customer row and reduce to
    (count, exact cent total) — all-integer arithmetic inside Python so
    the result is partition-order-independent and the LEFT-join oracle
    is exact, including customers with zero orders (an empty left
    cogroup side).

    Scale: same exchange shape as a shuffle join on the key; each key's
    pair of frames must fit one task — the standard cogroup contract."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select("c_custkey", "c_mktsegment")
        .repartition(spark.sparkContext.defaultParallelism, "c_custkey")
    )
    # mirror the key predicate on the fact side: without it every
    # order key rides the cogroup shuffle just to meet an empty
    # customer frame and produce nothing
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 97 == 0)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .repartition(spark.sparkContext.defaultParallelism, "o_custkey")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # right = the customer side (cogroup preserves declaration
        # order: caller .cogroup(other) => (caller_pdf, other_pdf))
        if right.empty:
            return pd.DataFrame(
                columns=["custkey", "mktsegment", "n_orders", "total_cents"]
            )
        cents = (
            (left["o_totalprice"] * 100).round().astype("int64").sum()
            if not left.empty
            else 0
        )
        return pd.DataFrame(
            {
                "custkey": [int(right["c_custkey"].iloc[0])],
                "mktsegment": [right["c_mktsegment"].iloc[0]],
                "n_orders": [len(left)],
                "total_cents": [int(cents)],
            }
        )

    return (
        orders.groupby("o_custkey")
        .cogroup(cust.groupby("c_custkey"))
        .applyInPandas(
            merge,
            schema=(
                "custkey bigint, mktsegment string, "
                "n_orders bigint, total_cents bigint"
            ),
        )
    )
