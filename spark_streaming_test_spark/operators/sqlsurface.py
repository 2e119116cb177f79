"""Spark 4 SQL-surface operators: recursive CTEs, collations, LATERAL.

The reference drives its whole query surface through ``spark.sql`` over a
registered table (MainApp.java:32-43) — these queries extend that same
SQL-first contract to the three biggest additions in the modern Spark SQL
dialect, each with a DuckDB oracle proving cross-engine semantics:

- ``WITH RECURSIVE`` (Spark 4.0+): the declarative answer to hierarchy
  walks. Spark executes it as a bounded iterative union — one micro-plan
  per recursion level — so wall-clock scales with TREE DEPTH (log_B of
  the key domain, single digits at billions of keys), not corpus size,
  and each level is a fully distributed join-free projection here. The
  flattened single-pass form lives in ``hierarchy_subtree_rollup``; this
  is its SQL-standard twin for plan parity with warehouse engines.
- String collations (Spark 4.0+): case-insensitive equality, DISTINCT
  and ``contains`` evaluate JVM-side inside codegen — no ``lower()``
  normalization columns, no Python, no extra projection pass. At 100 TB
  that removes one full-width string materialization from every
  case-insensitive dedup/grouping pipeline.
- ``LATERAL`` correlated subqueries (Spark 3.4+): per-row dependent
  top-k. Catalyst DECORRELATES the lateral subquery (DomainJoin rewrite)
  into a join + per-key WindowGroupLimit — i.e. the same physical plan
  as ``window_topk_per_group`` — so the friendly SQL shape costs nothing
  over the hand-written window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import register

# Matches the implicit 10-ary part tree used by hierarchy_subtree_rollup:
# parent(k) = (k - 1) div 10, root = 0. The recursive step only ever sees
# node > 0, so the integer division operands are non-negative — the one
# regime where Spark's DIV and DuckDB's // agree bitwise.
TREE_ARITY = 10


@register(
    "sql_recursive_cte",
    tags=("sql", "recursive", "hierarchy"),
    oracle=f"""
WITH RECURSIVE walk(part_id, node, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part
  UNION ALL
  SELECT part_id, (node - 1) // {TREE_ARITY}, depth + 1
  FROM walk WHERE node <> 0
)
SELECT part_id,
       CAST(MAX(depth) AS INTEGER) AS depth,
       CAST(COUNT(*) AS BIGINT) AS chain_len,
       CAST(SUM(node) AS BIGINT) AS ancestor_key_sum
FROM walk
GROUP BY part_id
""",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-chain walk as a SQL-standard recursive CTE: every part
    climbs the implicit 10-ary tree to the root, reporting its depth,
    chain length, and the sum of ancestor keys (an order-free integer
    checksum of the path). Iterations = max tree depth; every iteration
    is a shuffle-free projection + filter over the prior level."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        f"""
        WITH RECURSIVE walk(part_id, node, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM part
          UNION ALL
          SELECT part_id, (node - 1) DIV {TREE_ARITY}, depth + 1
          FROM walk WHERE node <> 0
        )
        SELECT part_id,
               CAST(MAX(depth) AS INT) AS depth,
               COUNT(*) AS chain_len,
               SUM(node) AS ancestor_key_sum
        FROM walk
        GROUP BY part_id
        """
    )


@register(
    "fn_collation_suite",
    tags=("functions", "collation", "strings"),
    oracle="""
WITH mixed AS (
  SELECT p_brand,
         CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END
           AS name_mx
  FROM part
)
SELECT p_brand,
       CAST(COUNT(DISTINCT lower(name_mx)) AS BIGINT) AS n_distinct_ci,
       CAST(COUNT(DISTINCT name_mx) AS BIGINT) AS n_distinct_cs,
       CAST(COUNT(CASE WHEN contains(lower(name_mx), 'widget') THEN 1 END)
            AS BIGINT) AS n_widget_ci,
       CAST(COUNT(CASE WHEN lower(name_mx) = lower(name_mx) THEN 1 END)
            AS BIGINT) AS n_eq_ci
FROM mixed
GROUP BY p_brand
""",
)
def fn_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware semantics (Spark 4 ``COLLATE UTF8_LCASE``) over a
    deliberately case-mangled copy of part names: case-insensitive
    DISTINCT, case-insensitive ``contains``, and collated equality —
    all without materializing a normalized column. The DuckDB oracle is
    the classical ``lower()`` normalization, proving the collated plan
    computes identical answers."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH mixed AS (
          SELECT p_brand,
                 CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END
                   AS name_mx
          FROM part
        )
        SELECT p_brand,
               COUNT(DISTINCT COLLATE(name_mx, 'UTF8_LCASE')) AS n_distinct_ci,
               COUNT(DISTINCT name_mx) AS n_distinct_cs,
               COUNT(CASE WHEN contains(COLLATE(name_mx, 'UTF8_LCASE'),
                                        COLLATE('WIDGET', 'UTF8_LCASE'))
                          THEN 1 END) AS n_widget_ci,
               COUNT(CASE WHEN COLLATE(name_mx, 'UTF8_LCASE')
                               = COLLATE(lower(name_mx), 'UTF8_LCASE')
                          THEN 1 END) AS n_eq_ci
        FROM mixed
        GROUP BY p_brand
        """
    )


@register(
    "join_lateral_topk",
    tags=("join", "lateral", "topk"),
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
""",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 customers by balance via a correlated LATERAL
    subquery with ORDER BY + LIMIT. Catalyst decorrelates this into the
    join + rank-filter plan (no per-row re-execution), so it scales as
    one shuffle on the correlation key — identical physics to
    ``window_topk_per_group``, friendlier SQL. Tie-broken on c_custkey
    so the emitted set is total-ordered and engine-independent."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        ) t
        """
    )


@register(
    "sql_pipe_syntax",
    tags=("sql", "pipe"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_quantity < 40
GROUP BY l_returnflag, l_linestatus
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, `|>`): the linear FROM-first dialect
    — each stage names one operation in execution order, the shape
    query UIs and LLM-generated SQL increasingly emit. Catalyst lowers
    it to exactly the classical plan (the oracle runs the classical
    form), so adopting the dialect costs nothing: same pushdown, same
    partial aggregation, same codegen."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity < 40
        |> AGGREGATE COUNT(*) AS n_rows,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                       AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_session_variables",
    tags=("sql", "variables"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_high_value
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
""",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4.0 DECLARE / SET VARIABLE): the
    threshold arrives as a typed session variable instead of a string-
    interpolated literal — the parameterization path that keeps ad-hoc
    SQL injectable-free and re-plannable (the variable folds to a
    literal at planning, so pushdown still reaches the scan). The
    reference's config surface (sysprops, O17) is this pattern's
    JVM-flag ancestor."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE high_value_threshold DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VARIABLE high_value_threshold = 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_high_value
        FROM orders
        WHERE o_totalprice > high_value_threshold
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_named_parameters",
    tags=("sql", "parameters"),
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_acctbal > 1000.0 AND c_nationkey < 10
GROUP BY c_mktsegment
""",
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers (``spark.sql(sql, args=...)``): values
    bind as TYPED literals through the API — no string interpolation,
    no injection surface, and the literal folds at planning so
    pushdown reaches the scan. The programmatic twin of the
    DECLARE/SET session-variable path."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers
        FROM customer
        WHERE c_acctbal > :min_bal AND c_nationkey < :max_nation
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "max_nation": 10},
    )


@register(
    "fn_sql_udf",
    tags=("sql", "udf", "functions"),
    oracle="""
WITH priced AS (
  SELECT l_orderkey,
         l_extendedprice * (1.0 - l_discount) AS disc_price,
         CAST(l_quantity AS INTEGER) AS qty
  FROM lineitem
)
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(disc_price, 4) AS DECIMAL(25,4))) AS DOUBLE)
         AS revenue,
       CAST(SUM(qty) AS BIGINT) AS total_qty
FROM priced
GROUP BY l_orderkey
""",
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (``CREATE FUNCTION ... RETURN expr``): the
    declarative UDF path — the body is a SQL expression Catalyst
    INLINES into the caller's plan, so unlike Python UDFs it costs
    nothing (full codegen, pushdown through it, no serialization
    boundary). The right default for shared business logic like
    discount pricing; the reference's threshold routing would ship as
    exactly this kind of function library.

    The oracle runs the inlined expression directly, proving the
    function boundary is semantically transparent."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1.0 - d)
        """
    )
    return spark.sql(
        """
        SELECT l_orderkey,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(round(disc_price(l_extendedprice, l_discount), 4)
                             AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        """
    )


@register(
    "sql_identifier_clause",
    tags=("sql", "parameters", "metadata"),
    oracle="""
SELECT o_orderpriority AS group_key,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER clause: table and column names arrive as TYPED
    PARAMETERS (``IDENTIFIER(:tab)``) instead of f-string splices —
    the safe way to write the generic per-table jobs (profilers,
    compactors, exporters) this engine's dq_* family represents, with
    the parser enforcing that a parameter can only ever be an
    identifier, never an expression (no SQL injection through a table
    name). Resolution happens at analysis; the plan is identical to
    the hard-coded query, which the oracle proves."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS group_key,
               COUNT(*) AS n
        FROM IDENTIFIER(:tab)
        GROUP BY IDENTIFIER(:col)
        """,
        args={"col": "o_orderpriority", "tab": "orders"},
    )


@register(
    "sql_group_by_all",
    tags=("sql", "modern"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` — the modern-SQL resolution
    sugar (every non-aggregate select item becomes a grouping key)
    that removes the classic copy-the-select-list maintenance hazard.
    Semantically identical to the explicit GROUP BY, so the plan is
    the same single hash aggregate; DuckDB supports the same syntax,
    making the oracle a literal twin."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "sql_execute_immediate",
    tags=("sql", "dynamic"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4 dynamic SQL): a query template
    executed with bound parameters — the safe form of string-built SQL
    (parameters are BOUND, not spliced, so a value can never change the
    statement's shape; the injection-proof dynamic-dashboard idiom).
    The plan is identical to the static statement, so Catalyst
    optimizes it the same way."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, COUNT(*) AS n_orders
           FROM orders WHERE o_orderstatus = ? GROUP BY o_orderpriority'
          USING 'F'
        """
    )


# --- DataFrame.transpose (Spark 4) ----------------------------------------

_TR_TYPES = ("click", "error", "purchase", "signup", "view")


def _sql_transpose_metric(metric: str, expr_tpl: str) -> str:
    cols = ", ".join(expr_tpl.format(t=t) + f" AS {t}" for t in _TR_TYPES)
    return f"SELECT '{metric}' AS key, {cols} FROM events"


@register(
    "sql_transpose",
    tags=("sql-surface", "spark4"),
    oracle="\nUNION ALL\n".join(
        [
            _sql_transpose_metric(
                "n", "CAST(count_if(event_type = '{t}') AS DOUBLE)"
            ),
            _sql_transpose_metric(
                "total",
                "CAST(SUM(CASE WHEN event_type = '{t}' "
                "THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)",
            ),
            _sql_transpose_metric(
                "avg_val",
                "(CAST(SUM(CASE WHEN event_type = '{t}' "
                "THEN CAST(value AS DECIMAL(25,6)) END) AS DOUBLE)"
                " / CAST(count_if(event_type = '{t}') AS DOUBLE))",
            ),
        ]
    ),
)
def sql_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.transpose()` (Spark 4): flip the per-event-type
    metrics frame so metrics become rows and event types become
    columns — the report-layout pivot analysts otherwise hand-roll
    with a stack/pivot pair. Spark requires a uniform value type
    (everything cast to double) and derives column names from the
    index column's values; the oracle spells the transposed layout
    with the known event-type enum.

    The transposed input here is an already-reduced k-row aggregate —
    transpose itself is a driver-cheap reshape of a tiny frame; the
    corpus work is the ONE map-side-combined aggregation producing
    it."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    stats = spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS avg_val
        FROM events GROUP BY event_type
        """
    )
    return stats.transpose()


# --- named WINDOW clause --------------------------------------------------


@register(
    "sql_window_clause",
    tags=("sql-surface", "window"),
    oracle="""
SELECT o_custkey,
       o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE)
         AS running_spend,
       LAG(o_orderkey) OVER w AS prev_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
QUALIFY rn <= 3
""",
)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named ``WINDOW w AS (...)`` clause: three window functions
    share ONE window definition — and, in the physical plan, one sort
    — instead of three inline OVER specs that invite subtle drift
    (and, mistyped, three separate sorts). Output keeps each
    customer's first three orders with running decimal-exact spend.
    DuckDB trims with QUALIFY; Spark (no QUALIFY) nests the same
    predicate — identical semantics. (The rank filter does NOT become
    a WindowGroupLimit here — that rewrite requires the rank function
    to be the window's only member; sharing the spec with sum/lag
    keeps one full WindowExec, which is still the single-sort win the
    clause exists for — plan-asserted.)"""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_custkey,
                 o_orderkey,
                 ROW_NUMBER() OVER w AS rn,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w
                      AS DOUBLE) AS running_spend,
                 LAG(o_orderkey) OVER w AS prev_order
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) t WHERE rn <= 3
        """
    )


# --- SQL table function (CREATE FUNCTION ... RETURNS TABLE) ---------------


@register(
    "sql_table_function",
    tags=("sql-surface", "spark4"),
    oracle="""
SELECT '1-URGENT' AS pri, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderstatus
UNION ALL
SELECT '5-LOW' AS pri, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_orderstatus
""",
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-defined TABLE FUNCTION (Spark 4 ``CREATE FUNCTION ...
    RETURNS TABLE``): a parameterized view invoked like a table —
    the reusable-report primitive (`fn_sql_udf` is the scalar
    sibling). The body is a plain declarative query, so Catalyst
    inlines each invocation and pushes the parameter down as an
    ordinary filter. Two pinned restrictions: a parameter may only be
    referenced from WHERE/HAVING (not the SELECT list — tag constants
    belong at the call site), and never as a LIMIT. The oracle is the
    macro-expanded union."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION priority_profile(pri STRING)
        RETURNS TABLE (o_orderstatus STRING, n_orders BIGINT, revenue DOUBLE)
        RETURN SELECT o_orderstatus,
                      CAST(COUNT(*) AS BIGINT),
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
               FROM orders WHERE o_orderpriority = pri
               GROUP BY o_orderstatus
        """
    )
    return spark.sql(
        "SELECT '1-URGENT' AS pri, * FROM priority_profile('1-URGENT') "
        "UNION ALL SELECT '5-LOW' AS pri, * FROM priority_profile('5-LOW')"
    )


def _with_scripting(spark: SparkSession, script: str) -> DataFrame:
    """Run a SQL script with scripting enabled ONLY for the parse/plan:
    the flag is restored immediately (parsing happens inside
    ``spark.sql``; lazy execution never re-parses), so the session-
    scoped conf doesn't leak into later queries — the same hygiene the
    file connectors apply to ignoreCorruptFiles."""
    saved = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(script)
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", saved)


@register(
    "sql_scripting_control_flow",
    tags=("sql", "spark4", "scripting"),
    oracle="""
WITH it AS (
  SELECT i AS iteration,
         CAST((SELECT COUNT(*) FROM orders
               WHERE o_totalprice > 100000 * i) AS BIGINT) AS n_above
  FROM range(1, 5) t(i)
)
SELECT CAST(iteration AS INTEGER) AS iteration, n_above,
       CASE WHEN n_above > 1000 THEN 'wide' ELSE 'narrow' END AS band
FROM it
""",
)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (SQL/PSM compound statements, Spark 4): DECLARE'd
    variables, a WHILE loop that runs a parameterized aggregate per
    iteration, IF/ELSE routing, and an ARRAY<STRUCT> accumulator
    variable exploded into the final result — procedural orchestration
    expressed IN SQL, where the reference hand-rolled the same loop in
    driver Java (MainApp.java:51-64). Each loop iteration is still a
    full distributed query; scripting only sequences them, so nothing
    here trades away cluster parallelism. The oracle computes the same
    iteration table declaratively."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_scr")
    return _with_scripting(spark, """
    BEGIN
      DECLARE i INT DEFAULT 1;
      DECLARE n BIGINT DEFAULT 0;
      DECLARE band STRING DEFAULT '';
      DECLARE acc ARRAY<STRUCT<iteration: INT, n_above: BIGINT,
                               band: STRING>> DEFAULT array();
      WHILE i <= 4 DO
        SET n = (SELECT COUNT(*) FROM orders_scr
                 WHERE o_totalprice > 100000 * i);
        IF n > 1000 THEN
          SET band = 'wide';
        ELSE
          SET band = 'narrow';
        END IF;
        SET acc = array_append(acc, named_struct(
          'iteration', i, 'n_above', n, 'band', band));
        SET i = i + 1;
      END WHILE;
      SELECT t.iteration, t.n_above, t.band
      FROM (SELECT explode(acc) AS t);
    END
    """)


@register(
    "sql_scripting_error_handler",
    tags=("sql", "spark4", "scripting", "error-handling"),
    oracle="""
SELECT p AS priority,
       CASE WHEN p = '3-MEDIUM' THEN 'error' ELSE 'ok' END AS status,
       CASE WHEN p = '3-MEDIUM' THEN NULL
            ELSE (SELECT CAST(COUNT(*) AS INTEGER) FROM orders o
                  WHERE o.o_orderpriority = p) END AS n_orders
FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) t
ORDER BY p
""",
)
def sql_scripting_error_handler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting ERROR RECOVERY: each loop iteration wraps its
    risky statement in a nested compound with its own
    ``DECLARE EXIT HANDLER FOR SQLEXCEPTION`` — the handler exits only
    the INNER block, records the failure, and the loop continues, so
    one poisoned partition-validation step doesn't abort the sweep
    (here the '3-MEDIUM' iteration strict-casts a non-numeric string
    under ANSI and is caught; every other priority records its order
    count). The procedural twin of the PERMISSIVE/quarantine pattern
    the connectors use for bad rows — per-UNIT-of-work error routing,
    expressed in SQL."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_eh")
    return _with_scripting(spark, """
    BEGIN
      DECLARE prios ARRAY<STRING> DEFAULT array();
      DECLARE i INT DEFAULT 1;
      DECLARE p STRING DEFAULT '';
      DECLARE n INT DEFAULT 0;
      DECLARE acc ARRAY<STRUCT<priority: STRING, status: STRING,
                               n_orders: INT>> DEFAULT array();
      SET prios = (SELECT array_sort(collect_set(o_orderpriority))
                   FROM orders_eh);
      WHILE i <= size(prios) DO
        BEGIN
          DECLARE EXIT HANDLER FOR SQLEXCEPTION
            SET acc = array_append(acc, named_struct(
              'priority', p, 'status', 'error',
              'n_orders', CAST(NULL AS INT)));
          SET p = element_at(prios, i);
          -- strict ANSI cast: the 3-MEDIUM probe value is non-numeric
          SET n = CAST(CASE WHEN p = '3-MEDIUM' THEN p ELSE CAST(
                    (SELECT COUNT(*) FROM orders_eh
                     WHERE o_orderpriority = p) AS STRING) END AS INT);
          SET acc = array_append(acc, named_struct(
            'priority', p, 'status', 'ok', 'n_orders', n));
        END;
        SET i = i + 1;
      END WHILE;
      SELECT t.priority, t.status, t.n_orders
      FROM (SELECT explode(acc) AS t) ORDER BY t.priority;
    END
    """)


@register(
    "sql_scripting_repeat_for",
    tags=("sql", "spark4", "scripting"),
    oracle="""
WITH st AS (
  SELECT o_orderstatus AS st, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderstatus
),
k AS (SELECT CAST(i AS INT) AS k, 1000.0 * power(2, i) AS t
      FROM range(1, 41) r(i)),
cand AS (
  SELECT st.st, st.n, k.k, k.t,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
          WHERE o.o_orderstatus = st.st AND o.o_totalprice < k.t) AS c
  FROM st CROSS JOIN k
),
hit AS (
  SELECT st, n, t, c,
         ROW_NUMBER() OVER (PARTITION BY st ORDER BY k) AS rn
  FROM cand WHERE c * 2 >= n
)
SELECT st AS o_orderstatus, n AS n_orders, t AS threshold, c AS n_below
FROM hit WHERE rn = 1 ORDER BY st
""",
)
def sql_scripting_repeat_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting REPEAT + FOR (SQL/PSM, Spark 4.1): a FOR statement
    iterates a query result (one row variable per order status), and
    for each status a REPEAT loop doubles a price threshold UNTIL it
    covers at least half that status's orders — a post-tested loop, so
    the first doubling always runs (the 1000.0 seed itself is never
    tested). Powers of two times 1000 are exactly representable, so
    the threshold column hash-matches DuckDB, whose oracle finds the
    same fixed point declaratively with a ROW_NUMBER over the doubling
    schedule."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_rf")
    return _with_scripting(spark, """
    BEGIN
      DECLARE t DOUBLE DEFAULT 0;
      DECLARE c BIGINT DEFAULT 0;
      DECLARE acc ARRAY<STRUCT<o_orderstatus: STRING, n_orders: BIGINT,
                               threshold: DOUBLE, n_below: BIGINT>>
        DEFAULT array();
      FOR r AS SELECT o_orderstatus AS st, COUNT(*) AS n
               FROM orders_rf GROUP BY o_orderstatus
               ORDER BY o_orderstatus DO
        SET t = 1000.0;
        REPEAT
          SET t = t * 2;
          SET c = (SELECT COUNT(*) FROM orders_rf
                   WHERE o_orderstatus = r.st AND o_totalprice < t);
        UNTIL c * 2 >= r.n
        END REPEAT;
        SET acc = array_append(acc, named_struct(
          'o_orderstatus', r.st, 'n_orders', r.n,
          'threshold', t, 'n_below', c));
      END FOR;
      SELECT x.o_orderstatus, x.n_orders, x.threshold, x.n_below
      FROM (SELECT explode(acc) AS x) ORDER BY x.o_orderstatus;
    END
    """)


@register(
    "sql_scripting_loop_labels",
    tags=("sql", "spark4", "scripting"),
    oracle="""
WITH yr AS (
  SELECT y, (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE EXTRACT(year FROM o_orderdate) = y) AS n
  FROM (SELECT CAST(1991 + 2 * i AS INT) AS y FROM range(4) t(i))
),
run AS (SELECT y, n, SUM(n) OVER (ORDER BY y) AS running FROM yr)
SELECT y AS yr, n AS n_orders, CAST(running AS BIGINT) AS running
FROM run WHERE running - n <= 3000 ORDER BY y
""",
)
def sql_scripting_loop_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting labeled LOOPs with ITERATE/LEAVE: the outer
    ``years`` loop skips even years via ``ITERATE years`` (a labeled
    continue), an inner ``months`` loop accumulates that year's
    monthly order counts and exits itself with ``LEAVE months``, and
    the sweep stops early with ``LEAVE years`` once the running total
    passes 3000 — the row that crosses the cap is still appended
    (leave is tested AFTER the append), which the oracle mirrors with
    ``running - n <= 3000`` over the odd-year running sum. At sf0.001
    the cap never trips and all four odd years emit; at larger SFs the
    early exit is exercised — both shapes hash-match."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ll")
    return _with_scripting(spark, """
    BEGIN
      DECLARE y INT DEFAULT 1990;
      DECLARE m INT DEFAULT 0;
      DECLARE s BIGINT DEFAULT 0;
      DECLARE total BIGINT DEFAULT 0;
      DECLARE acc ARRAY<STRUCT<yr: INT, n_orders: BIGINT,
                               running: BIGINT>> DEFAULT array();
      years: LOOP
        SET y = y + 1;
        IF y > 1998 THEN LEAVE years; END IF;
        IF y % 2 = 0 THEN ITERATE years; END IF;
        SET s = 0;
        SET m = 0;
        months: LOOP
          SET m = m + 1;
          IF m > 12 THEN LEAVE months; END IF;
          SET s = s + (SELECT COUNT(*) FROM orders_ll
                       WHERE year(o_orderdate) = y
                         AND month(o_orderdate) = m);
        END LOOP months;
        SET total = total + s;
        SET acc = array_append(acc, named_struct(
          'yr', y, 'n_orders', s, 'running', total));
        IF total > 3000 THEN LEAVE years; END IF;
      END LOOP years;
      SELECT t.yr, t.n_orders, t.running
      FROM (SELECT explode(acc) AS t) ORDER BY t.yr;
    END
    """)


@register(
    "sql_scripting_condition_handler",
    tags=("sql", "spark4", "scripting", "error-handling"),
    oracle="""
SELECT probe, outcome FROM (VALUES
  ('cast_bad', 'generic_handler'),
  ('div_zero', 'div0_handler'),
  ('ok', 'ok:' || CAST((SELECT COUNT(*) FROM orders) AS VARCHAR))
) t(probe, outcome) ORDER BY probe
""",
)
def sql_scripting_condition_handler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDITION-SPECIFIC handlers (SQL/PSM handler resolution): the
    inner block declares a handler for the named condition
    ``DIVIDE_BY_ZERO`` only; the outer per-iteration block declares the
    generic ``SQLEXCEPTION`` catch-all. A division by zero is caught by
    the INNER handler (most-specific, innermost scope wins); an ANSI
    cast failure (CAST_INVALID_INPUT) does NOT match the named
    condition, escapes the inner block, and lands in the outer generic
    handler; the clean probe records its value. This is the routing
    table real error recovery needs — retry-able conditions handled
    close to the statement, everything else escalating — and each
    outcome is pinned by the oracle's literal truth table."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ch")
    return _with_scripting(spark, """
    BEGIN
      DECLARE acc ARRAY<STRUCT<probe: STRING, outcome: STRING>>
        DEFAULT array();
      DECLARE probes ARRAY<STRING>
        DEFAULT array('cast_bad', 'div_zero', 'ok');
      DECLARE i INT DEFAULT 1;
      DECLARE p STRING DEFAULT '';
      DECLARE v BIGINT DEFAULT 0;
      WHILE i <= size(probes) DO
        SET p = element_at(probes, i);
        BEGIN
          DECLARE EXIT HANDLER FOR SQLEXCEPTION
            SET acc = array_append(acc, named_struct(
              'probe', p, 'outcome', 'generic_handler'));
          BEGIN
            DECLARE EXIT HANDLER FOR DIVIDE_BY_ZERO
              SET acc = array_append(acc, named_struct(
                'probe', p, 'outcome', 'div0_handler'));
            IF p = 'div_zero' THEN
              SET v = 1 / 0;
            ELSEIF p = 'cast_bad' THEN
              SET v = CAST('nope' AS BIGINT);
            ELSE
              SET v = (SELECT COUNT(*) FROM orders_ch);
            END IF;
            SET acc = array_append(acc, named_struct(
              'probe', p, 'outcome', concat('ok:', CAST(v AS STRING))));
          END;
        END;
        SET i = i + 1;
      END WHILE;
      SELECT t.probe, t.outcome
      FROM (SELECT explode(acc) AS t) ORDER BY t.probe;
    END
    """)
