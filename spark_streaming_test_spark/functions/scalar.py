"""Scalar function suite — string / date / math / array / map / JSON.

The reference's only scalar computation is ``byte[].length`` (O3,
MainApp.java:42); per SURVEY.md §2.1 the engine ships the full built-in
scalar families. Everything here is a JVM-side Catalyst expression
inside whole-stage codegen — no Python on the hot path.

Oracle-parity notes: every function below was chosen to have an exact
DuckDB twin (same semantics on the same inputs). Float-valued math goes
through sqrt/abs/floor/ceil (IEEE-exact, identical in any engine)
rather than transcendental libm calls whose last ulp differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load, spread
from ..registry import register


@register(
    "fn_string_suite",
    tags=("scalar", "string"),
    oracle="""
SELECT doc_id,
       length(text) AS n_chars,
       lower(substring(text, 1, 20)) AS head_lower,
       upper(source) AS source_upper,
       concat(lang, ':', source) AS lang_source,
       replace(lang, 'e', 'E') AS lang_repl,
       trim(text) = text AS is_trimmed,
       contains(text, 'spark') AS mentions_spark,
       starts_with(text, 'the') AS starts_the,
       regexp_extract(text, '([a-z]+)', 1) AS first_word
FROM documents
""",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """length/substr/case/concat/replace/trim/contains/prefix/regexp."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.upper("source").alias("source_upper"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("lang_repl"),
        (F.trim(F.col("text")) == F.col("text")).alias("is_trimmed"),
        F.contains(F.col("text"), F.lit("spark")).alias("mentions_spark"),
        F.startswith(F.col("text"), F.lit("the")).alias("starts_the"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
    )


@register(
    "fn_date_suite",
    tags=("scalar", "date"),
    oracle="""
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       date_trunc('hour', ts) AS hour,
       CAST(EXTRACT(year FROM ts) AS INT) AS year,
       CAST(EXTRACT(month FROM ts) AS INT) AS month,
       CAST(EXTRACT(dow FROM ts) AS INT) AS dow_sunday0,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       ts + INTERVAL 7 DAY AS ts_plus_7d
FROM events
""",
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/extract/epoch/interval arithmetic on event time.

    ``dayofweek`` is 1=Sunday in Spark vs 0=Sunday in DuckDB's ``dow`` —
    normalized to Sunday=0 on the Spark side.
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        (F.dayofweek("ts") - 1).alias("dow_sunday0"),
        F.hour("ts").alias("hour_of_day"),
        F.unix_timestamp("ts").alias("epoch_s"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("ts_plus_7d"),
    )


@register(
    "fn_math_suite",
    tags=("scalar", "math"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - l_quantity * 1000) AS abs_diff,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       sqrt(l_quantity) AS qty_sqrt,
       l_extendedprice * l_extendedprice AS price_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS above_30k
FROM lineitem
""",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/power/mod/greatest/least/sign — all IEEE-exact
    operations (bitwise engine-portable, unlike ln/exp)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("above_30k"),
    )


@register(
    "fn_array_suite",
    tags=("scalar", "array"),
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       string_split(text, ' ')[1] AS first_token,
       COALESCE(array_to_string(
         list_sort(list_distinct(string_split(lower(text), ' ')))[1:5], ','), '')
         AS first_5_vocab
FROM documents
""",
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/contains/index/distinct/sort/slice on token arrays.
    The sliced vocab array is serialized to a comma-joined string — the
    driver's pandas canonicalizer cannot hash list cells."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.concat_ws(
            ",",
            F.slice(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), 1, 5),
        ).alias("first_5_vocab"),
    )


@register(
    "fn_array_explode",
    tags=("scalar", "array", "explode"),
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
WHERE length(token) >= 4
GROUP BY token
""",
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST) into a token-frequency aggregation — the
    generator + agg pattern that backs the text-analysis operators."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode_outer(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token").isNotNull() & (F.length("token") >= 4))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_json_suite",
    tags=("scalar", "json"),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       json_extract_string(props, '$.missing') AS missing
FROM events
""",
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object path extraction on the events.props JSON column +
    cast; absent paths yield NULL in both engines."""
    ev = spread(load(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "fn_map_from_json",
    tags=("scalar", "map"),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       1 AS n_keys
FROM events
""",
)
def fn_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into MapType + map_keys/element_at — the map-column
    family (oracle flattens to the scalar equivalent since DuckDB's JSON
    is not a MAP type)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_higher_order",
    tags=("scalar", "array", "lambda"),
    oracle="""
WITH arr AS (
  SELECT event_id,
         [event_id % 7, event_id % 11, event_id % 13] AS a,
         [event_id % 3, event_id % 5, event_id % 2] AS b
  FROM events
)
SELECT event_id,
       COALESCE(array_to_string(list_transform(a, x -> x * 2 + 1), ','), '')
         AS doubled_plus1,
       COALESCE(array_to_string(list_filter(a, x -> x % 2 = 0), ','), '') AS evens,
       CAST(list_sum(a) AS BIGINT) AS total,
       CAST(list_dot_product(a, b) AS DOUBLE) AS dot_ab,
       len(list_filter(a, x -> x > 9)) > 0 AS has_gt9,
       len(list_filter(a, x -> NOT (x < 13))) = 0 AS all_lt13,
       COALESCE(array_to_string(list_sort(a), ','), '') AS sorted_a
FROM arr
""",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas: transform/filter/aggregate/zip_with/
    exists/forall/array_sort — all Catalyst expressions evaluated inside
    whole-stage codegen (no Python), the building blocks for the
    embedding math in llm/similarity.py."""
    ev = spread(load(spark, sf_dir, "events"))
    eid = F.col("event_id")
    a = F.array(eid % 7, eid % 11, eid % 13)
    b = F.array(eid % 3, eid % 5, eid % 2)
    return ev.select(
        "event_id",
        F.concat_ws(
            ",", F.transform(a, lambda x: x * 2 + 1).cast("array<string>")
        ).alias("doubled_plus1"),
        F.concat_ws(
            ",", F.filter(a, lambda x: x % 2 == 0).cast("array<string>")
        ).alias("evens"),
        F.aggregate(a, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double").alias("dot_ab"),
        F.exists(a, lambda x: x > 9).alias("has_gt9"),
        F.forall(a, lambda x: x < 13).alias("all_lt13"),
        F.concat_ws(",", F.array_sort(a).cast("array<string>")).alias("sorted_a"),
    )


@register(
    "fn_struct_ops",
    tags=("scalar", "struct"),
    oracle="""
WITH s AS (
  SELECT event_id,
         struct_pack(uid := user_id, etype := event_type,
                     nested := struct_pack(v := value, day := date_trunc('day', ts)))
           AS info
  FROM events
)
SELECT event_id,
       info.uid AS uid,
       info.etype AS etype,
       info.nested.v AS v,
       CAST(info.nested.day AS TIMESTAMP) AS day
FROM s
""",
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct create + nested field access. The struct is a pure Catalyst
    projection (named_struct), and reading ``info.nested.v`` collapses
    back to the source column — Catalyst prunes the intermediate struct
    entirely, so nesting costs nothing in the scan or shuffle. Output is
    flattened to scalars (the driver's value-hash canonicalizes scalar
    cells, not struct cells)."""
    ev = load(spark, sf_dir, "events")
    info = F.struct(
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("etype"),
        F.struct(
            F.col("value").alias("v"),
            F.date_trunc("day", "ts").alias("day"),
        ).alias("nested"),
    )
    return ev.select("event_id", info.alias("info")).select(
        "event_id",
        F.col("info.uid").alias("uid"),
        F.col("info.etype").alias("etype"),
        F.col("info.nested.v").alias("v"),
        F.col("info.nested.day").alias("day"),
    )


@register(
    "fn_conditional_suite",
    tags=("scalar", "conditional"),
    oracle="""
SELECT event_id,
       coalesce(nullif(event_type, 'error'), 'recovered') AS etype_fixed,
       greatest(value, 50.0) AS floored_50,
       least(value, 50.0) AS capped_50,
       CASE WHEN value IS NULL THEN -1.0 ELSE value END AS value_nn,
       nullif(user_id % 5, 0) AS bucket_or_null
FROM events
""",
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalars: coalesce/nullif/greatest/least/CASE — all
    Catalyst expressions in codegen (null handling never leaves the
    JVM)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "etype_fixed"
        ),
        F.greatest("value", F.lit(50.0)).alias("floored_50"),
        F.least("value", F.lit(50.0)).alias("capped_50"),
        F.when(F.col("value").isNull(), F.lit(-1.0)).otherwise(F.col("value")).alias(
            "value_nn"
        ),
        F.nullif(F.col("user_id") % 5, F.lit(0)).alias("bucket_or_null"),
    )


@register(
    "fn_date_arithmetic",
    tags=("scalar", "date"),
    oracle="""
SELECT event_id,
       CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month_clamped,
       last_day(CAST(ts AS DATE)) AS month_end,
       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_2024,
       CAST(CAST(ts AS DATE) - INTERVAL 7 DAY AS DATE) AS week_earlier
FROM events
""",
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: month addition with end-of-month clamping
    (Jan 31 + 1 month = Feb 29), last_day, day diffs — semantics chosen
    where Spark and DuckDB agree exactly."""
    ev = load(spark, sf_dir, "events")
    d = F.to_date("ts")
    return ev.select(
        "event_id",
        F.add_months(d, 1).alias("next_month_clamped"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("days_since_2024"),
        F.date_sub(d, 7).alias("week_earlier"),
    )


@register(
    "fn_url_suite",
    tags=("scalar", "url", "text"),
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
           || '?ref=' || lang || '&utm_source=feed&page=2' AS url
  FROM documents
)
SELECT doc_id,
       url,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       nullif(regexp_extract(url, '[?&]ref=([^&]*)', 1), '') AS ref_param,
       regexp_extract(url, '^[a-z]+://(?:[^./?#]+\\.)*([^./?#]+\\.[^./?#]+)(?:[/?#]|$)', 1)
         AS registered_domain,
       regexp_replace(
         regexp_replace(url, '[?&]utm_[^&]*', '', 'g'),
         '\\?&', '?', 'g') AS canonical_url
FROM u
""",
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing/normalization — the first pass over any web corpus
    (host extraction for per-domain quality priors, tracking-param
    stripping for canonical-URL dedup). URLs synthesize
    deterministically from the fixtures (the corpus has no real URLs),
    then round-trip through Spark's JVM-side `parse_url` plus regexp
    canonicalization; the oracle re-derives every field with plain
    regexes, so the two engines cross-check each other's parsers.
    All builtins — zero Python in the row path."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?ref="), F.col("lang"),
        F.lit("&utm_source=feed&page=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    canonical = F.regexp_replace(
        F.regexp_replace(F.col("url"), r"[?&]utm_[^&]*", ""),
        r"\?&", "?",
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias(
            "ref_param"
        ),
        F.regexp_extract(
            F.col("url"),
            r"^[a-z]+://(?:[^./?#]+\.)*([^./?#]+\.[^./?#]+)(?:[/?#]|$)",
            1,
        ).alias("registered_domain"),
        canonical.alias("canonical_url"),
    )


@register(
    "fn_null_semantics",
    tags=("scalar", "null"),
    oracle="""
SELECT o_orderkey,
       coalesce(o_orderstatus, 'unknown') AS status_or_default,
       nullif(o_orderstatus, 'O') AS null_if_open,
       (o_orderstatus IS NOT DISTINCT FROM 'O') AS nullsafe_eq_open,
       CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nvl,
       (o_orderstatus IS NULL) AS status_missing
FROM orders
""",
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface in one projection: coalesce, nullif,
    null-safe equality (<=>), NVL-style CASE, IS NULL — the semantics
    every filter/join/agg implicitly depends on, pinned explicitly so an
    engine change in null handling fails loudly. Map-only."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.col("o_orderstatus"), F.lit("unknown")).alias(
            "status_or_default"
        ),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("null_if_open"),
        F.col("o_orderstatus").eqNullSafe(F.lit("O")).alias(
            "nullsafe_eq_open"
        ),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_nvl"),
        F.col("o_orderstatus").isNull().alias("status_missing"),
    )


@register(
    "fn_variant_suite",
    tags=("scalar", "json", "variant", "spark4"),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       'OBJECT<k: BIGINT>' AS top_type,
       CAST(json_extract_string(props, '$.missing') AS INT) AS missing_int
FROM events
""",
)
def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT path: ``parse_json`` into the open semi-
    structured VariantType (binary-encoded, schema-on-read — the
    engine-native answer to shredding-free JSON columns), then typed
    ``variant_get`` extraction and ``try_variant_get`` for absent
    paths. The modern replacement for string-JSON `get_json_object`
    pipelines: parsing happens ONCE per row into the binary form, and
    every downstream extraction is a cheap typed probe instead of a
    re-parse. The oracle flattens to DuckDB JSON extraction — same
    values, which is the point: VARIANT changes the storage/CPU
    profile, not the semantics."""
    ev = spread(load(spark, sf_dir, "events"))
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.schema_of_variant(v).alias("top_type"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
    )


@register(
    "fn_try_arithmetic_suite",
    tags=("scalar", "ansi", "error-handling"),
    oracle="""
SELECT event_id,
       CASE WHEN CAST(floor(value) AS BIGINT) > 807 THEN NULL
            ELSE CAST(floor(value) AS BIGINT) + 9223372036854775000
       END AS overflow_guarded,
       value / NULLIF(CAST(event_id % 3 AS DOUBLE), 0.0) AS safe_div,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_ok,
       TRY_CAST(event_type AS INTEGER) AS bad_cast,
       string_split(event_type, 'a')[1] AS elem1,
       CASE WHEN len(string_split(event_type, 'a')) >= 9
            THEN string_split(event_type, 'a')[9] ELSE NULL END AS elem_oob
FROM events
""",
)
def fn_try_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error hardening: Spark 4 runs ANSI SQL by default, so
    overflow/bad-cast/div-by-zero THROW mid-job — on a 1000-executor
    run that's an hours-in abort from one poison row. The ``try_*``
    family (try_add, try_divide, try_cast) converts each hazard to
    NULL row-locally, which is the production posture for untrusted
    columns: route the NULLs to quarantine (`scan_csv_badrecords`
    pattern) instead of dying.

    Pure codegen projection; the oracle mirrors with NULLIF/TRY_CAST
    (DuckDB's non-throwing semantics made explicit)."""
    ev = spread(load(spark, sf_dir, "events"))
    return ev.select(
        "event_id",
        F.try_add(
            F.col("value").cast("bigint"), F.lit(9223372036854775000)
        ).alias("overflow_guarded"),
        F.try_divide(
            F.col("value"), (F.col("event_id") % 3).cast("double")
        ).alias("safe_div"),
        F.try_to_number(
            F.get_json_object("props", "$.k"), F.lit("999")
        ).cast("int").alias("k_ok"),
        F.expr("try_cast(event_type AS INT)").alias("bad_cast"),
        F.try_element_at(F.split("event_type", "a"), F.lit(1)).alias("elem1"),
        F.try_element_at(F.split("event_type", "a"), F.lit(9)).alias(
            "elem_oob"
        ),
    )


@register(
    "fn_bitwise_suite",
    tags=("functions", "bitwise"),
    oracle="""
WITH masked AS (
  SELECT p_brand, p_partkey % 256 AS k FROM part
)
SELECT p_brand,
       CAST(bit_and(k) AS BIGINT) AS band,
       CAST(bit_or(k) AS BIGINT) AS bor,
       CAST(bit_xor(k) AS BIGINT) AS bxor,
       CAST(SUM(bit_count(k)) AS BIGINT) AS popcount_sum,
       CAST(SUM(k << 2) AS BIGINT) AS shl_sum,
       CAST(SUM(k >> 1) AS BIGINT) AS shr_sum,
       CAST(SUM(xor(k, 170)) AS BIGINT) AS xor_mask_sum
FROM masked
GROUP BY p_brand
""",
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation surface: bitwise AND/OR/XOR aggregates plus
    popcount and shift scalars over a bounded non-negative key domain
    (flag words, bitmap segments, hash buckets). All JVM-side integer
    expressions inside one hash aggregate — exact in any engine, no
    float surface at all. The % 256 mask keeps the domain far from the
    int64 sign bit, where two's-complement semantics could differ."""
    masked = load(spark, sf_dir, "part").select(
        "p_brand", (F.col("p_partkey") % 256).alias("k")
    )
    k = F.col("k")
    return masked.groupBy("p_brand").agg(
        F.bit_and(k).cast("bigint").alias("band"),
        F.bit_or(k).cast("bigint").alias("bor"),
        F.bit_xor(k).cast("bigint").alias("bxor"),
        F.sum(F.bit_count(k)).cast("bigint").alias("popcount_sum"),
        F.sum(F.shiftleft(k, 2)).cast("bigint").alias("shl_sum"),
        F.sum(F.shiftright(k, 1)).cast("bigint").alias("shr_sum"),
        F.sum(k.bitwiseXOR(F.lit(170))).cast("bigint").alias("xor_mask_sum"),
    )


@register(
    "fn_luhn_validate",
    tags=("functions", "validation"),
    oracle="""
WITH ids AS (
  SELECT o_orderkey,
         lpad(CAST((o_orderkey * 7919) % 10000000000 AS VARCHAR), 10, '0')
           AS acct
  FROM orders
),
summed AS (
  SELECT o_orderkey, acct,
         list_sum(list_transform(generate_series(1, length(acct)),
           i -> CASE WHEN (length(acct) - i) % 2 = 1
                     THEN CASE WHEN 2 * CAST(acct[i] AS INTEGER) > 9
                               THEN 2 * CAST(acct[i] AS INTEGER) - 9
                               ELSE 2 * CAST(acct[i] AS INTEGER) END
                     ELSE CAST(acct[i] AS INTEGER) END)) AS luhn_sum
  FROM ids
)
SELECT o_orderkey, acct,
       luhn_sum % 10 = 0 AS valid
FROM summed
""",
)
def fn_luhn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation (``luhn_check``, Spark 4) over synthetic
    10-digit account numbers — the card/account-number sanity gate a
    PII scrubber runs to decide whether a digit run is a REAL payment
    identifier (redact) or noise (keep); pairs with ``text_pii_redact``.
    The oracle hand-rolls the double-every-second-digit checksum, so
    the builtin's semantics are pinned cross-engine. Pure codegen
    projection, no shuffle."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lpad(
            ((F.col("o_orderkey") * 7919) % 10000000000).cast("string"),
            10,
            "0",
        ).alias("acct"),
    )
    return o.select(
        "o_orderkey",
        "acct",
        F.expr("luhn_check(acct)").alias("valid"),
    )


@register(
    "fn_mask_suite",
    tags=("functions", "privacy", "masking"),
    oracle="""
WITH s AS (
  SELECT c_custkey,
         'Cust' || CAST(c_custkey AS VARCHAR) || '-'
           || upper(substr(c_mktsegment, 1, 3)) AS raw
  FROM customer
),
m AS (
  SELECT c_custkey, raw,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '[a-z]', 'x', 'g'),
             '[A-Z]', 'X', 'g'),
           '[0-9]', 'n', 'g') AS masked_default,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '[a-z]', 'x', 'g'),
             '[A-Z]', 'U', 'g'),
           '[0-9]', '#', 'g') AS masked_custom
  FROM s
)
SELECT c_custkey, raw, masked_default, masked_custom,
       length(raw) = length(masked_default) AS shape_preserved
FROM m
""",
)
def fn_mask_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``mask()`` builtin — shape-preserving PII masking (upper→X,
    lower→x, digit→n, custom replacement chars) that keeps length and
    character-class structure for format validation while destroying
    the value; the display-layer partner of ``text_pii_redact``'s
    pattern removal. The oracle rebuilds the semantics from ordered
    regexp passes (lowercase first, so the substituted class letters
    are never re-masked), pinning the builtin's contract."""
    s = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("Cust"),
            F.col("c_custkey").cast("string"),
            F.lit("-"),
            F.upper(F.substring("c_mktsegment", 1, 3)),
        ).alias("raw"),
    )
    return s.select(
        "c_custkey",
        "raw",
        F.mask("raw").alias("masked_default"),
        F.mask("raw", F.lit("U"), F.lit("x"), F.lit("#")).alias(
            "masked_custom"
        ),
        (F.length("raw") == F.length(F.mask("raw"))).alias("shape_preserved"),
    )


# --- calendar month-arithmetic edge semantics ----------------------------


@register(
    "fn_month_arithmetic_edges",
    tags=("functions", "date", "edge-semantics"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1m,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 13 MONTH AS DATE) AS plus_13m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
         AS is_month_end,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
         AS quarter_start
FROM orders
""",
)
def fn_month_arithmetic_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar month arithmetic at the EDGES — the billing/retention
    bug factory: Jan 31 + 1 month must CLAMP to the short month's last
    day (Feb 29 in a leap year, not Mar 2), +13 months must clamp
    through the leap boundary (2024-01-31 → 2025-02-28), and month-end
    membership must use `last_day`, not `day = 31`. Verified
    cross-engine: Spark ``add_months`` and DuckDB ``+ INTERVAL n
    MONTH`` implement the SAME clamping convention (measured on the
    leap cases) — the pinned behavior contract subscription-billing
    jobs rely on. Pure projection; no shuffle."""
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 1).alias("plus_1m"),
        F.add_months(d, 13).alias("plus_13m"),
        F.last_day(d).alias("month_end"),
        (d == F.last_day(d)).alias("is_month_end"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
    )


# --- IBAN mod-97 (ISO 7064) ----------------------------------------------------
#
# fn_luhn_validate's international sibling: IBAN check digits are
# ISO 7064 MOD-97-10 over the rearranged account string with letters
# mapped A=10..Z=35. The number is far too long for int64, so both
# engines compute the modulus as a LEFT FOLD over digit characters —
# acc = (acc*10 + digit) % 97 — which is exactly how streaming
# checksum validation runs at ingest (per-row, no state, fuses into
# the scan). The query GENERATES valid IBANs in-engine (check = 98 -
# mod of the '00'-candidate — data-dependent, so validation is not a
# tautology), validates them (must give mod 97 == 1), and validates a
# corrupted twin (one digit bumped — must fail).

IBAN_COUNTRY = "DE"  # D=13, E=14


def _iban_mod97_sql(expr: str) -> str:
    """MOD-97 left fold over the expanded digit string of ``expr``
    (letters already expanded to two digits by the caller)."""
    return (
        f"list_reduce([CAST(0 AS BIGINT)] ||"
        f" list_transform(string_split({expr}, ''),"
        f" ch -> CAST(ch AS BIGINT)),"
        f" (acc, d) -> (acc * 10 + d) % 97)"
    )


@register(
    "fn_iban_mod97",
    tags=("functions", "checksum", "iban"),
    oracle=f"""
WITH base AS (
  SELECT c_custkey,
         lpad(CAST(c_custkey AS STRING), 18, '0') AS bban
  FROM customer
),
cand AS (
  -- rearranged '00'-candidate: BBAN + country-expanded + '00'
  SELECT c_custkey, bban,
         bban || '131400' AS cand_digits
  FROM base
),
checked AS (
  SELECT c_custkey, bban,
         CAST(98 - {_iban_mod97_sql('cand_digits')} AS BIGINT) AS check_digits
  FROM cand
),
validated AS (
  SELECT c_custkey, bban, check_digits,
         {_iban_mod97_sql(
             "bban || '1314' || lpad(CAST(check_digits AS STRING), 2, '0')"
         )} AS remainder,
         {_iban_mod97_sql(
             "CAST(CAST(bban AS BIGINT) + 1 AS STRING)"
             " || '1314' || lpad(CAST(check_digits AS STRING), 2, '0')"
         )} AS corrupted_remainder
  FROM checked
)
SELECT c_custkey,
       '{IBAN_COUNTRY}' || lpad(CAST(check_digits AS STRING), 2, '0')
         || bban AS iban,
       CAST(check_digits AS BIGINT) AS check_digits,
       (remainder = 1) AS is_valid,
       (corrupted_remainder = 1) AS corrupted_still_valid
FROM validated
""",
)
def fn_iban_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-IBANs ({IBAN_COUNTRY} + 18-digit BBAN from c_custkey):
    derive the ISO 7064 check digits in-engine, validate (mod == 1,
    asserted True for every row by tests), and validate a one-digit
    corruption (asserted False). The fold is pure int64 arithmetic —
    no big-int library, no Python."""

    def mod97(expr: str):
        return F.expr(
            f"aggregate(transform(split({expr}, ''),"
            f" ch -> cast(ch AS BIGINT)),"
            f" cast(0 AS BIGINT), (acc, d) -> (acc * 10 + d) % 97)"
        )

    c = load(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 18, "0").alias("bban"),
    )
    cand = base.withColumn(
        "cand_digits", F.concat(F.col("bban"), F.lit("131400"))
    )
    checked = cand.select(
        "c_custkey",
        "bban",
        (F.lit(98) - mod97("cand_digits")).cast("bigint").alias("check_digits"),
    )
    full = (
        "concat(bban, '1314', lpad(cast(check_digits AS STRING), 2, '0'))"
    )
    corrupted = (
        "concat(cast(cast(bban AS BIGINT) + 1 AS STRING), '1314',"
        " lpad(cast(check_digits AS STRING), 2, '0'))"
    )
    validated = checked.select(
        "c_custkey",
        "bban",
        "check_digits",
        mod97(full).alias("remainder"),
        mod97(corrupted).alias("corrupted_remainder"),
    )
    return validated.select(
        "c_custkey",
        F.concat(
            F.lit(IBAN_COUNTRY),
            F.lpad(F.col("check_digits").cast("string"), 2, "0"),
            F.col("bban"),
        ).alias("iban"),
        F.col("check_digits").cast("bigint"),
        (F.col("remainder") == 1).alias("is_valid"),
        (F.col("corrupted_remainder") == 1).alias("corrupted_still_valid"),
    )
