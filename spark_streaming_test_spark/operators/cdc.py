"""Change-data-capture / slowly-changing-dimension operators — the
incremental-maintenance shapes a lakehouse runs between ingest batches.

``table_diff`` reconciles two snapshots of a keyed table into
added/removed/changed rows (full-outer join on key + content-hash
compare — the engine-level primitive under MERGE INTO). ``scd2_intervals``
turns an event log into type-2 validity intervals (``lead`` over event
time). Both are single-shuffle plans keyed on the entity id.

The snapshots here are two halves of ``orders`` (split by a hash
predicate so both sides are deterministic and overlap), standing in for
"yesterday's load" vs "today's load".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..registry import register

# Snapshot predicates: old = buckets 0..9, new = buckets 3..12 of 16.
# Overlap (3..9) are candidate updates; o_orderstatus differs for ~1/3
# of them via the second hash char, exercising the 'changed' branch.
_BUCKET = "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)"


@register(
    "table_diff",
    tags=("cdc", "join"),
    oracle=f"""
WITH old_snap AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE {_BUCKET} <= '9'
),
new_snap AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1) <= '4'
              THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice
  FROM orders WHERE {_BUCKET} BETWEEN '3' AND 'c'
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_orderstatus <> n.o_orderstatus
              OR o.o_custkey <> n.o_custkey
              OR o.o_totalprice <> n.o_totalprice THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       o.o_orderstatus AS old_status,
       n.o_orderstatus AS new_status
FROM old_snap o
FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
""",
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: full-outer join on the key, then
    classify each key as added / removed / changed / unchanged. One
    sort-merge (or shuffle-hash) join on the key — at 100 TB both
    snapshots should be bucketed on the key so the join is
    shuffle-free; the change predicate compares columns directly (a
    content hash per side collapses it to one comparison when rows are
    wide)."""
    o = spread(load(spark, sf_dir, "orders"))
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    mut = F.substring(F.md5(F.col("o_orderkey").cast("string")), 2, 1)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    old_snap = o.filter(bucket <= "9").select(*cols)
    new_snap = (
        o.filter(bucket.between("3", "c"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(mut <= "4", "U").otherwise(F.col("o_orderstatus")).alias(
                "o_orderstatus"
            ),
            "o_totalprice",
        )
    )
    old_a, new_a = old_snap.alias("o"), new_snap.alias("n")
    changed = (
        (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
        | (F.col("o.o_custkey") != F.col("n.o_custkey"))
        | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
    )
    return (
        old_a.join(new_a, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("o.o_orderkey").isNull(), "added")
            .when(F.col("n.o_orderkey").isNull(), "removed")
            .when(changed, "changed")
            .otherwise("unchanged")
            .alias("change_type"),
            F.col("o.o_orderstatus").alias("old_status"),
            F.col("n.o_orderstatus").alias("new_status"),
        )
    )


@register(
    "scd2_intervals",
    tags=("cdc", "window", "scd2"),
    oracle="""
WITH typed AS (
  SELECT user_id, event_type, ts, event_id
  FROM events
  WHERE event_type IN ('signup', 'purchase', 'error')
)
SELECT user_id,
       event_type AS state,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM typed
""",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each state-change event
    opens a validity interval closed by the user's next change
    (``lead``); the last interval per user is open-ended
    (``is_current``). One hash exchange on user_id, window sort local —
    the standard event-log → dimension-table derivation. Ties broken by
    event_id for deterministic interval order."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "agg_histogram",
    tags=("aggregation", "histogram"),
    oracle="""
WITH binned AS (
  SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin_id
  FROM orders
)
SELECT bin_id,
       CAST(bin_id * 25000.0 AS DOUBLE) AS bin_lo,
       CAST((bin_id + 1) * 25000.0 AS DOUBLE) AS bin_hi,
       COUNT(*) AS n_orders
FROM binned
GROUP BY bin_id
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bin assignment is a
    scan-level projection (floor division — deterministic on both
    engines, unlike engine-specific width_bucket edge rules), then a
    partial-aggregated count per bin. The profile-stage histogram at
    100 TB: one narrow pass + a ~hundred-row shuffle."""
    o = load(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / 25000.0).cast("bigint")
    return (
        o.select(bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bin_id",
            (F.col("bin_id") * 25000.0).alias("bin_lo"),
            ((F.col("bin_id") + 1) * 25000.0).alias("bin_hi"),
            "n_orders",
        )
    )


@register(
    "cdc_merge_apply",
    tags=("cdc", "join", "merge"),
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE {_BUCKET} <= '9'
),
changes AS (
  SELECT o_orderkey, o_custkey,
         'U' AS o_orderstatus, o_totalprice,
         CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1) <= '1'
              THEN 'delete' ELSE 'upsert' END AS op
  FROM orders WHERE {_BUCKET} BETWEEN '3' AND 'c'
)
SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice
FROM base b LEFT JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.o_orderkey IS NULL
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM changes WHERE op = 'upsert'
""",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO applied as a batch plan: rows of the base snapshot
    whose key appears in the changeset are superseded (LEFT ANTI join),
    then surviving upserts append — delete ops simply emit nothing.
    This is the engine-level primitive lakehouse MERGE compiles to;
    ``table_diff`` is its read-side twin.

    One shuffle on the merge key for the anti join (AQE picks
    broadcast when the changeset is small — the common case for
    incremental loads); the union is shuffle-free. At 100 TB the base
    side would additionally prune untouched partitions by the
    changeset's key-range stats before the join."""
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    op_char = F.substring(F.md5(F.col("o_orderkey").cast("string")), 2, 1)
    base = (
        spread(load(spark, sf_dir, "orders"))
        .filter(bucket <= "9")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    changes = (
        spread(load(spark, sf_dir, "orders"))
        .filter(bucket.between("3", "c"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            "o_totalprice",
            F.when(op_char <= "1", "delete").otherwise("upsert").alias("op"),
        )
    )
    survivors = base.join(changes, "o_orderkey", "left_anti")
    upserts = changes.filter(F.col("op") == "upsert").drop("op")
    return survivors.unionByName(upserts)


@register(
    "cdc_changelog_compact",
    tags=("cdc", "window", "compaction"),
    oracle="""
WITH log AS (
  SELECT event_id AS seq, user_id AS key, value,
         CASE WHEN event_type = 'purchase' THEN 'D'
              WHEN event_type = 'view' THEN 'I'
              ELSE 'U' END AS op
  FROM events
),
ranked AS (
  SELECT key, seq, op, value,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
  FROM log
)
SELECT key, seq AS last_seq, value AS last_value
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY key
""",
)
def cdc_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — materialize the latest state per key from
    an insert/update/delete op log (the read-side of every CDC
    pipeline, and what a lakehouse table's log-compaction job does).
    Last-writer-wins by sequence number: one hash exchange on the key,
    WindowGroupLimit keeps one row per key PER TASK before the final
    rank filter, and a tombstone ('D' last) erases the key entirely.
    The op log derives deterministically from events (event_id is the
    total-order sequence).

    At 100 TB this is the canonical compaction plan: shuffle is the
    log itself (unavoidable — last-wins needs key co-location), but
    the group-limit pushdown means each task emits at most one row per
    key before the merge, so the final stage is state-sized."""
    log = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("key"),
        "value",
        F.when(F.col("event_type") == "purchase", "D")
        .when(F.col("event_type") == "view", "I")
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.col("seq").alias("last_seq"),
            F.col("value").alias("last_value"),
        )
        .orderBy("key")
    )


@register(
    "join_scd2_pointintime",
    tags=("cdc", "join", "temporal", "asof"),
    oracle="""
WITH merged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('signup', 'purchase', 'error')
              THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type IN ('signup', 'purchase', 'error')
              THEN event_type END AS state,
         CASE WHEN event_type IN ('view', 'click')
              THEN event_type END AS probe_type,
         value
  FROM events
),
resolved AS (
  SELECT user_id, ts, event_id, kind, probe_type, value,
         last_value(state IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, kind, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active_state
  FROM merged
)
SELECT event_id, user_id, ts, probe_type, value, active_state
FROM resolved WHERE kind = 1
""",
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal dimension) join: each view/click event
    resolves to the SCD2 state version (``scd2_intervals``'s
    signup/purchase/error states) active AT its timestamp — NULL before
    the user's first state, the standard as-of semantics.

    Deliberately NOT a range join: versions and probes union into one
    per-user sorted stream and a ``last_value IGNORE NULLS`` window
    resolves every probe in a single pass — one user_id exchange total,
    against the range join's per-probe interval search. Same-timestamp
    ties resolve state-first (kind 0 < 1), so a probe sees a state
    created at its own instant — matching the closed-open
    ``[valid_from, valid_to)`` interval convention."""
    e = load(spark, sf_dir, "events")
    is_state = F.col("event_type").isin("signup", "purchase", "error")
    is_probe = F.col("event_type").isin("view", "click")
    merged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_state, 0).otherwise(1).alias("kind"),
        F.when(is_state, F.col("event_type")).alias("state"),
        F.when(is_probe, F.col("event_type")).alias("probe_type"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "active_state", F.last("state", ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id", "user_id", "ts", "probe_type", "value", "active_state"
        )
    )


IVM_CUTOFF = "1998-01-01"  # base snapshot boundary (orders span 1995-2001)


@register(
    "agg_incremental_maintenance",
    tags=("cdc", "aggregation", "incremental"),
    oracle="""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
""",
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-customer aggregate is
    computed as BASE-SNAPSHOT + DELTA-BATCH merged by key — never
    rescanning the base — while the DuckDB oracle recomputes the full
    aggregate from scratch. A hash match therefore PROVES the
    incremental path is lossless, which is the property that lets a
    100 TB pipeline maintain aggregates by touching only the new
    partition instead of re-aggregating history on every arrival.

    Exactness is what makes the proof possible: counts are integers
    and spend accumulates in DECIMAL, whose addition is associative —
    ``base + delta`` is bitwise the full sum. (Double accumulators
    would differ in the last ulp and the equivalence would be only
    approximate.) Both branches prune on the cutoff at the scan."""
    o = load(spark, sf_dir, "orders")
    spend = F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast(
        "decimal(22,2)"
    )
    base = (
        o.filter(F.col("o_orderdate") < IVM_CUTOFF)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            spend.alias("s_b"),
        )
    )
    delta = (
        o.filter(F.col("o_orderdate") >= IVM_CUTOFF)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_d"),
            spend.alias("s_d"),
        )
    )
    zero = F.lit(0).cast("decimal(22,2)")
    return (
        base.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("n_b"), F.lit(0))
                + F.coalesce(F.col("n_d"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_orders"),
            (
                F.coalesce(F.col("s_b"), zero)
                + F.coalesce(F.col("s_d"), zero)
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


# --- schema drift between snapshots ---------------------------------------


@register(
    "dq_schema_drift",
    tags=("quality", "cdc", "metadata"),
    oracle="""
SELECT * FROM (VALUES
  ('event_id',   'unchanged',    'bigint', 'bigint'),
  ('event_type', 'removed',      'string', NULL),
  ('value',      'type_changed', 'double', 'float'),
  ('user_id',    'unchanged',    'bigint', 'bigint'),
  ('value_eur',  'added',        NULL,     'double')
) AS t(column_name, status, type_v1, type_v2)
""",
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift between two physical table versions: write snapshot
    v1, write v2 with a dropped column, a narrowed type, and a new
    column, then diff the schemas the PARQUET FOOTERS actually declare
    (not what the writer intended) — the ingest-contract check that
    catches upstream producers changing shape silently. The oracle is
    the literal expected drift, so the row set verifies Spark's whole
    write→footer→read type chain.

    Pure metadata: the data writes are tiny here (and irrelevant —
    only footers are read); at lake scale this runs against catalog
    schemas with the same diff logic."""
    # SF-qualified scratch dirs: two harness processes at different
    # SFs must not overwrite each other's in-flight _temporary files —
    # an unqualified path cost a concurrent sf0.1 sweep this query
    # (r12, chmod-on-missing-file task failure while the sf0.001
    # suite rewrote the same dir). See fixtures.scratch_dir.
    from ..fixtures import scratch_dir

    v1p = scratch_dir(sf_dir, "drift_v1")
    v2p = scratch_dir(sf_dir, "drift_v2")
    ev = load(spark, sf_dir, "events").limit(100)
    ev.select("event_id", "event_type", "value", "user_id").write.mode(
        "overwrite"
    ).parquet(v1p)
    ev.select(
        "event_id",
        F.col("value").cast("float").alias("value"),
        "user_id",
        (F.col("value") * 0.92).alias("value_eur"),
    ).write.mode("overwrite").parquet(v2p)
    s1 = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v1p).schema}
    s2 = {f.name: f.dataType.simpleString() for f in spark.read.parquet(v2p).schema}
    rows = []
    for name in sorted(set(s1) | set(s2)):
        t1, t2 = s1.get(name), s2.get(name)
        status = (
            "added"
            if t1 is None
            else "removed"
            if t2 is None
            else "unchanged"
            if t1 == t2
            else "type_changed"
        )
        rows.append((name, status, t1, t2))
    return spark.createDataFrame(
        rows, "column_name string, status string, type_v1 string, type_v2 string"
    )
