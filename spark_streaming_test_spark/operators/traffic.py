"""The flagship pipeline: the reference's NIC-traffic monitor, batch form.

Reference semantics (rakrachok/spark-streaming-test):
  * packet stream (nif, raw bytes) -> per-NIC byte totals per 5-minute
    micro-batch: ``mapToPair`` + ``reduceByKey`` (MainApp.java:41-42,54-55)
  * config lookup: ``select limit_name, limit_value from traffic_limits
    where limit_name in ('min','max') order by limit_value`` + ``limit(2)``
    + collect; row[1] is the max (MainApp.java:44-49 — the ``min`` read is
    dead code at :48, only ``max`` is enforced)
  * per-row threshold routing: total > max -> "Alert: the amount of data
    suppressed the limit" else "Info: the amount of data is under the
    limit" (MainApp.java:56-63, KafkaProducer.java / MainApp.java:59,61)

Here the packet stream's batch surrogate is the ``events`` table
(user_id <-> NIC, value <-> packet size, ts <-> arrival time; FIXTURES.md
§8), the 5-minute micro-batch becomes an explicit 5-minute tumbling
event-time window, and the whole pipeline is one declarative DataFrame
plan: scan -> project -> window agg (partial+final hash agg, the
``reduceByKey`` equivalent) -> threshold projection. The streaming form of
the same plan lives in ``streaming/pipeline.py``.

Scale notes: the aggregation shuffles once on (window, nif) — inevitable
and key-balanced; the limits lookup is a 2-row dimension resolved either
driver-side (reference parity, a plan-time scalar) or via
``F.broadcast`` (no shuffle). Nothing here grows with data volume except
the one agg shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register

ALERT_MSG = "Alert: the amount of data suppressed the limit"
INFO_MSG = "Info: the amount of data is under the limit"

# traffic_limits fixture (FIXTURES.md §11; schema from MainApp.java:44-49).
LIMITS_ROWS = [("min", 50), ("max", 150)]

_LIMITS_CTE = (
    "limits(limit_name, limit_value) AS (VALUES ('min', 50), ('max', 150))"
)


def traffic_limits(spark: SparkSession) -> DataFrame:
    """Materialize the 2-row config dimension (engine-side fixture)."""
    return spark.createDataFrame(LIMITS_ROWS, "limit_name string, limit_value int")


def lookup_max_limit(spark: SparkSession) -> int:
    """Reference-parity config lookup (MainApp.java:44-49).

    SQL with IN-filter (O5) + sort (O6) + limit-2 (O7, fused by Catalyst
    to TakeOrderedAndProject top-k) + collect (O8); row[1] is the max.
    """
    traffic_limits(spark).createOrReplaceTempView("traffic_limits")
    rows = spark.sql(
        "select limit_name, limit_value from traffic_limits "
        "where limit_name in ('min', 'max') order by limit_value"
    ).limit(2).collect()
    return rows[1]["limit_value"]


def _windowed_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (window_start, nif, total_bytes): O3 projection + O11 sum.

    ``F.window(ts, '5 minutes')`` is the explicit event-time form of the
    reference's implicit 5-minute micro-batch (MainApp.java:26,38).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            F.col("ts"),
            F.col("user_id").cast("string").alias("nif"),
            F.col("value"),
        )
        .groupBy(F.window("ts", "5 minutes"), "nif")
        .agg(dsum("value").alias("total_bytes"))
        .select(
            F.col("window.start").alias("window_start"),
            "nif",
            "total_bytes",
        )
    )


@register(
    "traffic_alerts",
    bench=True,
    tags=("flagship", "agg", "routing"),
    oracle=f"""
WITH {_LIMITS_CTE},
mx AS (
  SELECT limit_value FROM (
    SELECT limit_name, limit_value FROM limits
    WHERE limit_name IN ('min','max') ORDER BY limit_value LIMIT 2
  ) t ORDER BY limit_value DESC LIMIT 1
),
agg AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(user_id AS VARCHAR) AS nif,
         {sql_dsum('value')} AS total_bytes
  FROM events GROUP BY 1, 2
)
SELECT agg.window_start, agg.nif, agg.total_bytes,
       agg.total_bytes > mx.limit_value AS is_alert,
       CASE WHEN agg.total_bytes > mx.limit_value THEN '{ALERT_MSG}'
            ELSE '{INFO_MSG}' END AS message
FROM agg, mx
""",
)
def traffic_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: reference pipeline end-to-end (O3+O5+O6+O7+O8+O11+O12).

    The max limit is resolved once at plan time and closure-captured into
    the threshold projection — exactly the reference's hoisted lookup
    (MainApp.java:44-49 vs the per-batch loop :51-64).
    """
    max_limit = lookup_max_limit(spark)
    totals = _windowed_totals(spark, sf_dir)
    is_alert = F.col("total_bytes") > F.lit(max_limit)
    return totals.select(
        "window_start",
        "nif",
        "total_bytes",
        is_alert.alias("is_alert"),
        F.when(is_alert, ALERT_MSG).otherwise(INFO_MSG).alias("message"),
    )


@register(
    "traffic_alerts_broadcast",
    tags=("flagship", "join", "broadcast"),
    oracle=f"""
WITH {_LIMITS_CTE},
agg AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(user_id AS VARCHAR) AS nif,
         {sql_dsum('value')} AS total_bytes
  FROM events GROUP BY 1, 2
)
SELECT agg.window_start, agg.nif, agg.total_bytes,
       agg.total_bytes > l.limit_value AS is_alert
FROM agg JOIN limits l ON l.limit_name = 'max'
""",
)
def traffic_alerts_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-idiomatic variant: broadcast-join the limits dimension.

    At 100 TB the driver-side collect of the reference (MainApp.java:47)
    is replaced by ``F.broadcast`` of the tiny dimension — the comparison
    ships with every task, no shuffle, and limit changes flow through the
    plan instead of a closure capture.
    """
    totals = _windowed_totals(spark, sf_dir)
    limits = traffic_limits(spark).filter(F.col("limit_name") == "max")
    return (
        totals.join(F.broadcast(limits), F.lit(True), "inner")
        .select(
            "window_start",
            "nif",
            "total_bytes",
            (F.col("total_bytes") > F.col("limit_value")).alias("is_alert"),
        )
    )


BURST_FACTOR = 3          # alert when a window exceeds this x trailing mean
BURST_TRAIL = 12          # trailing 5-minute windows in the baseline (1 hour)
BURST_MIN_HISTORY = 6     # suppress alerts until this much history exists


@register(
    "traffic_burst_alerts",
    tags=("traffic", "window", "anomaly"),
    oracle=f"""
WITH totals AS (
  SELECT CAST(user_id AS VARCHAR) AS nif,
         time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
  FROM events GROUP BY user_id, time_bucket(INTERVAL '5 minutes', ts)
),
trailed AS (
  SELECT nif, window_start, total,
         CAST(SUM(total) OVER w AS DECIMAL(24,2)) AS trail_sum,
         COUNT(*) OVER w AS trail_n
  FROM totals
  WINDOW w AS (PARTITION BY nif ORDER BY window_start
               ROWS BETWEEN {BURST_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT nif, window_start,
       CAST(total AS DOUBLE) AS total,
       CAST(trail_sum AS DOUBLE) / trail_n AS baseline,
       CAST(trail_n AS INTEGER) AS n_history,
       trail_n >= {BURST_MIN_HISTORY}
         AND total * trail_n > {BURST_FACTOR} * trail_sum AS is_burst
FROM trailed WHERE trail_n >= 1
""",
)
def traffic_burst_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive upgrade of the reference's STATIC limit
    (MainApp.java:44-49 reads one global max from a config table):
    alert when a NIC's 5-minute total exceeds {BURST_FACTOR}× its OWN
    trailing-hour mean — per-entity baselines instead of one
    fleet-wide constant, with an alert holdoff until
    {BURST_MIN_HISTORY} windows of history exist (cold NICs can't
    page). This is the static→relative threshold migration every
    monitoring pipeline eventually makes.

    One exchange on nif serves the 5-minute reduce, the trailing
    window, and the verdict projection. The burst test cross-
    multiplies (total·n > factor·sum) in EXACT decimal — no mean is
    ever materialized as a float before the comparison, so the
    boolean cannot waver cross-engine; only display columns cast to
    double."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy(
        F.col("user_id").cast("string").alias("nif"),
        F.window("ts", "5 minutes").alias("w"),
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("total")
    ).select("nif", F.col("w.start").alias("window_start"), "total")
    wt = (
        Window.partitionBy("nif")
        .orderBy("window_start")
        .rowsBetween(-BURST_TRAIL, -1)
    )
    trailed = totals.select(
        "nif",
        "window_start",
        "total",
        F.sum("total").over(wt).cast("decimal(24,2)").alias("trail_sum"),
        F.count(F.lit(1)).over(wt).alias("trail_n"),
    ).filter(F.col("trail_n") >= 1)
    return trailed.select(
        "nif",
        "window_start",
        F.col("total").cast("double").alias("total"),
        (F.col("trail_sum").cast("double") / F.col("trail_n")).alias(
            "baseline"
        ),
        F.col("trail_n").cast("int").alias("n_history"),
        (
            (F.col("trail_n") >= BURST_MIN_HISTORY)
            & (
                F.col("total") * F.col("trail_n")
                > BURST_FACTOR * F.col("trail_sum")
            )
        ).alias("is_burst"),
    )


@register(
    "traffic_alerts_kafka_wire",
    tags=("flagship", "streaming", "serialization"),
    oracle=f"""
WITH {_LIMITS_CTE},
mx AS (
  SELECT limit_value FROM limits WHERE limit_name = 'max'
),
agg AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(user_id AS VARCHAR) AS nif,
         {sql_dsum('value')} AS total_bytes
  FROM events GROUP BY 1, 2
)
SELECT agg.nif, agg.window_start, agg.total_bytes,
       agg.total_bytes > mx.limit_value AS is_alert,
       CASE WHEN agg.total_bytes > mx.limit_value THEN '{ALERT_MSG}'
            ELSE '{INFO_MSG}' END AS message
FROM agg CROSS JOIN mx
""",
)
def traffic_alerts_kafka_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka WIRE FORMAT roundtrip, broker-free: serialize every
    alert exactly as ``write_alerts_kafka`` ships it — binary key =
    the NIC, binary value = the JSON alert record (the reference sends
    stringified alerts to the 'alerts' topic, KafkaProducer.java:29-32)
    — then parse the bytes back through the consumer path
    (``from_json`` under the alert schema) and emit the decoded
    columns. Hash-matching the directly-computed oracle proves the
    producer serialization and consumer schema agree byte-for-byte,
    the half of O14 a missing broker cannot test (delivery semantics
    stay documented at the writer).

    Serialization is one codegen projection each way. Optimization
    r14 (guide §2.5, the v2 recipe): round-robin repartition of the
    narrow alert frame ahead of the encode/parse projections — AQE
    byte-coalescing left the JSON roundtrip on two tasks."""
    alerts = traffic_alerts(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    wire = alerts.select(
        F.col("nif").cast("binary").alias("key"),
        F.to_json(
            F.struct("window_start", "total_bytes", "is_alert", "message")
        )
        .cast("binary")
        .alias("value"),
    )
    parsed = wire.select(
        F.col("key").cast("string").alias("nif"),
        F.from_json(
            F.col("value").cast("string"),
            "window_start timestamp, total_bytes double, is_alert boolean,"
            " message string",
        ).alias("r"),
    )
    return parsed.select(
        "nif",
        F.col("r.window_start").alias("window_start"),
        F.col("r.total_bytes").alias("total_bytes"),
        F.col("r.is_alert").alias("is_alert"),
        F.col("r.message").alias("message"),
    )


# v2 RecordBatch fixed overhead (base_offset..record_count) — must stay
# equal to sources/kafka_wire.py::RECORD_BATCH_OVERHEAD; the oracle SQL
# below inlines the same constant.
_V2_BATCH_OVERHEAD = 61


@register(
    "traffic_alerts_kafka_wire_v2",
    tags=("flagship", "streaming", "serialization"),
    oracle=f"""
WITH {_LIMITS_CTE},
mx AS (
  SELECT limit_value FROM limits WHERE limit_name = 'max'
),
agg AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(user_id AS VARCHAR) AS nif,
         {sql_dsum('value')} AS total_bytes
  FROM events GROUP BY 1, 2
),
alert AS (
  SELECT agg.nif, agg.window_start, agg.total_bytes,
         agg.total_bytes > mx.limit_value AS is_alert,
         CASE WHEN agg.total_bytes > mx.limit_value THEN '{ALERT_MSG}'
              ELSE '{INFO_MSG}' END AS message
  FROM agg CROSS JOIN mx
),
-- closed-form v2 record framing: zigzag-varint(n >= 0) takes 1 byte
-- below 64, 2 below 8192 (record attrs 1 + ts_delta 1 + offset_delta 1
-- + header_count 1 + key/value length prefixes + payloads)
framed AS (
  SELECT *,
         octet_length(ENCODE(nif)) AS klen,
         octet_length(ENCODE(message)) AS vlen
  FROM alert
),
body AS (
  SELECT *,
         4 + (CASE WHEN klen < 64 THEN 1 WHEN klen < 8192 THEN 2 ELSE 3 END)
           + klen
           + (CASE WHEN vlen < 64 THEN 1 WHEN vlen < 8192 THEN 2 ELSE 3 END)
           + vlen AS body_len
  FROM framed
)
SELECT nif, window_start, total_bytes, is_alert, message,
       CAST(61 + (CASE WHEN body_len < 64 THEN 1
                       WHEN body_len < 8192 THEN 2 ELSE 3 END)
               + body_len AS INT) AS wire_len
FROM body
""",
)
def traffic_alerts_kafka_wire_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The magic=2 (KIP-98 RecordBatch) twin of
    ``traffic_alerts_kafka_wire``: every alert is encoded into a real
    v2 RecordBatch — the exact bytes ``KafkaWireProducer(message_format=
    "v2")`` puts on the socket (key = NIC, value = the alert message,
    timestamp = the window start; the live sink's record shape) — then
    decoded back through the same CRC-32C-verifying consumer codec.

    TWO independent checks ride the oracle hash: (1) the roundtripped
    nif/window_start/message must equal the directly-computed alerts
    (encode∘decode = identity on real data), and (2) ``wire_len``, the
    measured byte length of each encoded batch, must equal a CLOSED-FORM
    zigzag-varint framing formula the oracle computes in SQL — so a
    codec that pads, mis-frames a varint, or silently switches format
    hash-mismatches even if it roundtrips.

    The codec is bytes-in/bytes-out and cannot be expressed in built-in
    functions; it runs as an Arrow-batched pandas UDF (the sanctioned
    slow path), one batch per Arrow chunk, no shuffle added to the
    flagship plan."""

    @F.pandas_udf(
        "wire_len int, rt_nif string, rt_message string, rt_ts_ms long"
    )
    def roundtrip_v2(
        nif: pd.Series, message: pd.Series, ts_ms: pd.Series
    ) -> pd.DataFrame:
        from ..sources.kafka_wire import (
            decode_record_batch_entries,
            encode_record_batch,
        )

        lens, nifs, msgs, tss = [], [], [], []
        for n, m, t in zip(nif, message, ts_ms):
            buf = encode_record_batch([(n.encode(), m.encode(), int(t))])
            ((off, key, value, ts),) = decode_record_batch_entries(
                buf, strict=True
            )
            if off != 0:
                raise ValueError(f"producer-side base offset must be 0, got {off}")
            lens.append(len(buf))
            nifs.append(key.decode())
            msgs.append(value.decode())
            tss.append(ts)
        return pd.DataFrame(
            {"wire_len": lens, "rt_nif": nifs, "rt_message": msgs, "rt_ts_ms": tss}
        )

    # Spread the encode stage (optimization r13, guide §2.5/§4): the
    # alert aggregate's AQE-coalesced output ran the ~25 us/row Python
    # roundtrip on TWO tasks (measured 3.9 s of Python-worker time on a
    # 32-core box). The alert frame is narrow, so one round-robin
    # exchange buys full-width parallelism for the compute-dense codec;
    # on a cluster the same repartition spreads the encode across
    # executors before the socket sink.
    alerts = traffic_alerts(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    enc = alerts.withColumn(
        "r",
        roundtrip_v2(
            F.col("nif"),
            F.col("message"),
            (F.unix_timestamp("window_start") * 1000).cast("long"),
        ),
    )
    return enc.select(
        F.col("r.rt_nif").alias("nif"),
        F.timestamp_seconds(F.col("r.rt_ts_ms") / 1000).alias("window_start"),
        "total_bytes",
        "is_alert",
        F.col("r.rt_message").alias("message"),
        F.col("r.wire_len").alias("wire_len"),
    )


@register(
    "traffic_alerts_kafka_wire_zstd",
    tags=("flagship", "streaming", "serialization"),
    oracle=f"""
WITH {_LIMITS_CTE},
mx AS (
  SELECT limit_value FROM limits WHERE limit_name = 'max'
),
agg AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(user_id AS VARCHAR) AS nif,
         {sql_dsum('value')} AS total_bytes
  FROM events GROUP BY 1, 2
),
alert AS (
  SELECT agg.nif, agg.window_start, agg.total_bytes,
         agg.total_bytes > mx.limit_value AS is_alert,
         CASE WHEN agg.total_bytes > mx.limit_value THEN '{ALERT_MSG}'
              ELSE '{INFO_MSG}' END AS message
  FROM agg CROSS JOIN mx
),
framed AS (
  SELECT *,
         octet_length(ENCODE(nif)) AS klen,
         octet_length(ENCODE(message)) AS vlen
  FROM alert
),
-- v2 record framing (same arithmetic as the v2 twin) ...
body AS (
  SELECT *,
         4 + (CASE WHEN klen < 64 THEN 1 WHEN klen < 8192 THEN 2 ELSE 3 END)
           + klen
           + (CASE WHEN vlen < 64 THEN 1 WHEN vlen < 8192 THEN 2 ELSE 3 END)
           + vlen AS body_len
  FROM framed
),
-- ... giving the records-section length R, which the producer wraps in
-- ONE RFC 8878 raw-block zstd frame: magic(4) + frame-header
-- descriptor(1) + frame-content-size(1/2/4 by R) + block header(3) + R
recsec AS (
  SELECT *,
         (CASE WHEN body_len < 64 THEN 1
               WHEN body_len < 8192 THEN 2 ELSE 3 END) + body_len AS r_len
  FROM body
)
SELECT nif, window_start, total_bytes, is_alert, message,
       CAST(61 + 8 + (CASE WHEN r_len < 256 THEN 1
                           WHEN r_len < 65792 THEN 2 ELSE 4 END)
               + r_len AS INT) AS wire_len
FROM recsec
""",
)
def traffic_alerts_kafka_wire_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KIP-110 (zstd, codec 4) twin of ``traffic_alerts_kafka_wire_v2``:
    each alert is encoded into a v2 RecordBatch whose records section is
    wrapped in a zstd frame — the exact bytes ``KafkaWireProducer(
    message_format="v2", compression="zstd")`` ships — then decoded back
    through the consumer path, which runs the full RFC 8878 decoder in
    ``sources/zstd_codec.py`` under the CRC-32C check (the CRC covers the
    COMPRESSED bytes, the spec's layering).

    The oracle hash carries (1) roundtrip identity on real data and
    (2) ``wire_len`` equal to a closed-form formula composing the
    zigzag-varint record framing with the RFC 8878 raw-block frame
    arithmetic (magic + FHD + FCS-by-size + block header) — so the
    batch layout, the varint framing, AND the zstd frame structure are
    all pinned by SQL that shares no code with the codec.

    Same execution shape as the v2 twin: one Arrow-batched pandas UDF,
    no added shuffle."""

    @F.pandas_udf(
        "wire_len int, rt_nif string, rt_message string, rt_ts_ms long"
    )
    def roundtrip_zstd(
        nif: pd.Series, message: pd.Series, ts_ms: pd.Series
    ) -> pd.DataFrame:
        from ..sources.kafka_wire import (
            CODEC_ZSTD,
            decode_record_batch_entries,
            encode_record_batch,
        )

        lens, nifs, msgs, tss = [], [], [], []
        for n, m, t in zip(nif, message, ts_ms):
            buf = encode_record_batch(
                [(n.encode(), m.encode(), int(t))],
                codec=CODEC_ZSTD,
                zstd_raw=True,  # the oracle replays THIS framing's length
            )
            ((off, key, value, ts),) = decode_record_batch_entries(
                buf, strict=True
            )
            if off != 0:
                raise ValueError(f"producer-side base offset must be 0, got {off}")
            lens.append(len(buf))
            nifs.append(key.decode())
            msgs.append(value.decode())
            tss.append(ts)
        return pd.DataFrame(
            {"wire_len": lens, "rt_nif": nifs, "rt_message": msgs, "rt_ts_ms": tss}
        )

    # Same encode-stage spread as traffic_alerts_kafka_wire_v2 (r13).
    alerts = traffic_alerts(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    enc = alerts.withColumn(
        "r",
        roundtrip_zstd(
            F.col("nif"),
            F.col("message"),
            (F.unix_timestamp("window_start") * 1000).cast("long"),
        ),
    )
    return enc.select(
        F.col("r.rt_nif").alias("nif"),
        F.timestamp_seconds(F.col("r.rt_ts_ms") / 1000).alias("window_start"),
        "total_bytes",
        "is_alert",
        F.col("r.rt_message").alias("message"),
        F.col("r.wire_len").alias("wire_len"),
    )


P95_RANK_PCT = 0.95  # burstable-billing percentile


@register(
    "traffic_p95_billing",
    tags=("traffic", "percentile", "billing"),
    oracle="""
WITH totals AS (
  SELECT CAST(user_id AS VARCHAR) AS nif,
         time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
  FROM events GROUP BY user_id, time_bucket(INTERVAL '5 minutes', ts)
),
ranked AS (
  SELECT nif, total,
         ROW_NUMBER() OVER (PARTITION BY nif ORDER BY total, window_start) AS rk,
         COUNT(*) OVER (PARTITION BY nif) AS n
  FROM totals
)
SELECT nif,
       CAST(MAX(n) AS BIGINT) AS n_windows,
       CAST(MIN(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT) THEN total END)
            AS DOUBLE) AS p95_total,
       CAST(MAX(total) AS DOUBLE) AS peak_total
FROM ranked GROUP BY nif
""",
)
def traffic_p95_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95th-percentile (burstable) billing — THE network-ops metric the
    reference's domain bills by: per NIC, rank the 5-minute byte totals
    and charge the value at rank ceil(0.95 * n), discarding the top 5%
    of bursts (the industry burstable-billing rule). Output also
    carries the raw peak so the burst discount is visible.

    Exact rank selection, not an approximate percentile: billing
    disputes need a reproducible number, so the percentile is the
    decimal total at a specific rank (ties broken by window start) —
    identical on any engine/partitioning. One exchange on nif serves
    the 5-minute reduce, the rank window, and the final rollup."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy(
        F.col("user_id").cast("string").alias("nif"),
        F.window("ts", "5 minutes").alias("w"),
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("total")
    ).select("nif", F.col("w.start").alias("window_start"), "total")
    wr = Window.partitionBy("nif").orderBy("total", "window_start")
    wn = Window.partitionBy("nif")
    ranked = totals.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return ranked.groupBy("nif").agg(
        F.max("n").cast("bigint").alias("n_windows"),
        F.min(
            F.when(
                F.col("rk") == F.ceil(P95_RANK_PCT * F.col("n")).cast("bigint"),
                F.col("total"),
            )
        ).cast("double").alias("p95_total"),
        F.max("total").cast("double").alias("peak_total"),
    )


# --- capacity-planning forecast -------------------------------------------

CAP_LIMIT_CENTS = 100_000  # per-5-min capacity ceiling being planned for


@register(
    "traffic_capacity_forecast",
    tags=("traffic", "forecast", "capacity"),
    oracle=f"""
WITH totals AS (
  SELECT CAST(user_id AS VARCHAR) AS nif,
         CAST(ts AS DATE) AS day,
         time_bucket(INTERVAL '5 minutes', ts) AS w,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2, 3
),
peaks AS (
  SELECT nif, day, CAST(MAX(cents) AS BIGINT) AS peak
  FROM totals GROUP BY nif, day
),
idx AS (
  SELECT nif, peak,
         CAST(day - CAST('2020-01-01' AS DATE) AS BIGINT) AS x
  FROM peaks
),
mom AS (
  SELECT nif,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(peak) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * peak) AS DOUBLE) AS sxy
  FROM idx GROUP BY nif
),
lastp AS (
  SELECT nif, peak AS current_peak FROM (
    SELECT nif, peak, ROW_NUMBER() OVER (PARTITION BY nif ORDER BY day DESC) AS rn
    FROM peaks
  ) t WHERE rn = 1
)
SELECT m.nif,
       CAST(m.n AS BIGINT) AS n_days,
       (m.n * m.sxy - m.sx * m.sy) / (m.n * m.sxx - m.sx * m.sx)
         AS slope_cents_per_day,
       CAST(l.current_peak AS BIGINT) AS current_peak_cents,
       CASE WHEN (m.n * m.sxy - m.sx * m.sy) > 0 AND l.current_peak < {CAP_LIMIT_CENTS}
            THEN (CAST({CAP_LIMIT_CENTS} AS DOUBLE) - CAST(l.current_peak AS DOUBLE))
                 / ((m.n * m.sxy - m.sx * m.sy) / (m.n * m.sxx - m.sx * m.sx))
            END AS days_to_capacity
FROM mom m JOIN lastp l ON m.nif = l.nif
WHERE m.n >= 3
""",
)
def traffic_capacity_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPACITY PLANNING for the reference's domain: per NIF, fit the
    trend of DAILY PEAK 5-minute load (OLS on exact integer moments)
    and extrapolate days until the {CAP_LIMIT_CENTS}-cent ceiling —
    the "when do we upgrade this link" readout that turns the
    monitoring pipeline's data into a procurement date. NIFs already
    at/over capacity or trending flat/down report NULL (no crossing).

    Daily peaks are exact integers (lexicographic MAX of decimal
    cents); the slope is the closed-form OLS ratio of integer moments
    (identical literal order both engines); day indices are integer
    date differences from a fixed epoch. Shuffles: the 5-minute
    bucket aggregate (map-side combined), a per-(nif, day) MAX, a
    per-nif reduce — all key-partitioned."""
    e = load(spark, sf_dir, "events")
    totals = e.groupBy(
        F.col("user_id").cast("string").alias("nif"),
        F.to_date("ts").alias("day"),
        F.window("ts", "5 minutes").alias("w"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    peaks = totals.groupBy("nif", "day").agg(
        F.max("cents").cast("bigint").alias("peak")
    )
    idx = peaks.select(
        "nif",
        "peak",
        F.datediff(F.col("day"), F.lit("2020-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    )
    mom = idx.groupBy("nif").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("peak").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("peak")).cast("double").alias("sxy"),
    )
    from pyspark.sql import Window as W

    lastp = (
        peaks.withColumn(
            "rn", F.row_number().over(W.partitionBy("nif").orderBy(F.desc("day")))
        )
        .filter(F.col("rn") == 1)
        .select("nif", F.col("peak").alias("current_peak"))
    )
    c = F.col
    num = c("n") * c("sxy") - c("sx") * c("sy")
    slope = num / (c("n") * c("sxx") - c("sx") * c("sx"))
    return (
        mom.join(lastp, "nif")
        .filter(c("n") >= 3)
        .select(
            "nif",
            c("n").cast("bigint").alias("n_days"),
            slope.alias("slope_cents_per_day"),
            c("current_peak").cast("bigint").alias("current_peak_cents"),
            F.when(
                (num > 0) & (c("current_peak") < CAP_LIMIT_CENTS),
                (
                    F.lit(float(CAP_LIMIT_CENTS))
                    - c("current_peak").cast("double")
                )
                / slope,
            ).alias("days_to_capacity"),
        )
    )


# --- flap detection (alert-storm suppression) ------------------------------

FLAP_LIMIT = 150   # the 'max' traffic limit (LIMITS_ROWS), inlined as int
FLAP_K = 3         # flips per hour at/above which a NIC is "flapping"


@register(
    "traffic_flap_detection",
    tags=("traffic", "streaming", "state", "anomaly"),
    oracle=f"""
WITH totals AS (
  SELECT CAST(user_id AS VARCHAR) AS nif,
         time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
  FROM events GROUP BY 1, 2
),
flags AS (
  SELECT nif, window_start,
         total > {FLAP_LIMIT} AS is_alert,
         lag(total > {FLAP_LIMIT}) OVER (PARTITION BY nif ORDER BY window_start)
           AS prev_alert
  FROM totals
),
flips AS (
  SELECT nif,
         time_bucket(INTERVAL '1 hour', window_start) AS hour_start,
         COUNT(*) AS n_windows,
         COUNT(*) FILTER (WHERE prev_alert IS NOT NULL
                            AND is_alert <> prev_alert) AS n_flips
  FROM flags GROUP BY 1, 2
)
SELECT nif, hour_start,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(n_flips AS BIGINT) AS n_flips,
       n_flips >= {FLAP_K} AS is_flapping
FROM flips
""",
)
def traffic_flap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-storm (flap) detection — the operational layer ABOVE the
    reference's edge-trigger: KafkaProducer.java:34-41 emits on every
    alert-flag flip, so a NIC oscillating around the limit still pages
    on every crossing. This query counts the flips themselves per NIC
    per hour and flags NICs with >= {FLAP_K} flips/hour as flapping —
    the signal an operator uses to mute the edge-trigger (or widen the
    threshold into a hysteresis band) for that interface.

    Determinism: 5-minute totals are exact decimals compared against an
    integer limit, so the alert booleans — and therefore the flip
    counts — are partitioning-independent. Scale shape: ONE exchange on
    nif serves the lag window; the 5-minute reduce is map-side combined
    on (nif, window) first, so the per-nif sequence the lag scans is
    windows-long, not events-long; the hourly rollup then combines
    locally on the already-nif-partitioned stream."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy(
        F.col("user_id").cast("string").alias("nif"),
        F.window("ts", "5 minutes").alias("w"),
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("total")
    ).select("nif", F.col("w.start").alias("window_start"), "total")
    seq = Window.partitionBy("nif").orderBy("window_start")
    flags = totals.select(
        "nif",
        "window_start",
        (F.col("total") > FLAP_LIMIT).alias("is_alert"),
        F.lag(F.col("total") > FLAP_LIMIT).over(seq).alias("prev_alert"),
    )
    flips = flags.groupBy(
        "nif",
        F.window("window_start", "1 hour").alias("h"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.count(
            F.when(
                F.col("prev_alert").isNotNull()
                & (F.col("is_alert") != F.col("prev_alert")),
                1,
            )
        ).cast("bigint").alias("n_flips"),
    )
    return flips.select(
        "nif",
        F.col("h.start").alias("hour_start"),
        "n_windows",
        "n_flips",
        (F.col("n_flips") >= FLAP_K).alias("is_flapping"),
    )


# --- CIDR longest-prefix matching ---------------------------------------------
#
# The traffic pipeline's real-world filter stage: route every flow to
# the most specific matching prefix of a bogon/private-range table
# (RFC 1918 + friends). IPv4 addresses and CIDR prefixes are plain
# integer arithmetic (octets -> uint32, match = equal high bits), so
# the whole operator is exact and engine-portable; longest-prefix wins
# via a per-flow window over the (few) matching prefixes.

CIDR_BLOCKS = [
    "10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "100.64.0.0/10",
    "127.0.0.0/8", "169.254.0.0/16", "198.18.0.0/15", "224.0.0.0/4",
    "0.0.0.0/5",
]
_IP_MIX = 2654435761  # Knuth multiplicative hash: spread user ids over IPv4


@register(
    "traffic_cidr_match",
    tags=("traffic", "joins", "cidr"),
    oracle=f"""
WITH flows AS (
  SELECT event_id, user_id,
         CAST(value AS DECIMAL(12,2)) AS bytes,
         CASE user_id % 4
           WHEN 0 THEN 167772160 + (user_id * {_IP_MIX}) % 16777216
           WHEN 1 THEN 2886729728 + (user_id * {_IP_MIX}) % 1048576
           WHEN 2 THEN 3232235520 + (user_id * {_IP_MIX}) % 65536
           ELSE (user_id * {_IP_MIX}) % 4294967296
         END AS ip
  FROM events
),
blocks AS (
  SELECT cidr,
         CAST(string_split(cidr, '/')[2] AS INTEGER) AS plen,
         CAST(string_split(string_split(cidr, '/')[1], '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(string_split(cidr, '/')[1], '.')[2] AS BIGINT) * 65536
           + CAST(string_split(string_split(cidr, '/')[1], '.')[3] AS BIGINT) * 256
           + CAST(string_split(string_split(cidr, '/')[1], '.')[4] AS BIGINT) AS net
  FROM (SELECT unnest({CIDR_BLOCKS!r}) AS cidr)
),
matched AS (
  SELECT f.event_id, f.user_id, f.bytes, b.cidr, b.plen,
         ROW_NUMBER() OVER (PARTITION BY f.event_id
                            ORDER BY b.plen DESC, b.cidr) AS rnk
  FROM flows f JOIN blocks b
    ON (f.ip >> (32 - b.plen)) = (b.net >> (32 - b.plen))
)
SELECT cidr,
       CAST(COUNT(*) AS BIGINT) AS n_flows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST({sql_dsum('bytes')} AS DOUBLE) AS total_bytes
FROM matched WHERE rnk = 1
GROUP BY cidr
""",
)
def traffic_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR routing of synthetic flows (user ids spread
    over IPv4 by a Knuth multiplicative hash) against a broadcast
    bogon table: octets parse to uint32 with pure arithmetic, a flow
    matches a block iff the high ``plen`` bits agree (shift-compare —
    no string ops on the hot path), overlapping blocks resolve to the
    MOST SPECIFIC prefix per flow (window over the handful of matches),
    and per-block rollups stay exact (decimal byte sums). Scale: the
    prefix table is O(100) rows broadcast everywhere; the non-equi
    shift-join is a broadcast nested loop over that tiny side; at real
    routing-table scale (~1M prefixes) the same query switches to an
    equi-join on (ip >> k) per distinct prefix length — the classic
    LPM decomposition, one broadcast equi-join per length bucket."""
    h = F.col("user_id") * _IP_MIX
    f = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("value").cast("decimal(12,2)").alias("bytes"),
        # a quarter of users each in 10/8, 172.16/12, 192.168/16; the
        # rest anywhere in IPv4 -- so several blocks (and the no-match
        # path) are all exercised at every scale factor
        F.when(F.col("user_id") % 4 == 0, 167772160 + h % 16777216)
        .when(F.col("user_id") % 4 == 1, 2886729728 + h % 1048576)
        .when(F.col("user_id") % 4 == 2, 3232235520 + h % 65536)
        .otherwise(h % F.lit(4294967296))
        .alias("ip"),
    )
    b = spark.createDataFrame(
        [(c,) for c in CIDR_BLOCKS], "cidr string"
    ).select(
        "cidr",
        F.split(F.col("cidr"), "/")[1].cast("int").alias("plen"),
        (
            F.split(F.split(F.col("cidr"), "/")[0], r"\.")[0].cast("bigint") * 16777216
            + F.split(F.split(F.col("cidr"), "/")[0], r"\.")[1].cast("bigint") * 65536
            + F.split(F.split(F.col("cidr"), "/")[0], r"\.")[2].cast("bigint") * 256
            + F.split(F.split(F.col("cidr"), "/")[0], r"\.")[3].cast("bigint")
        ).alias("net"),
    )
    matched = f.join(
        F.broadcast(b),
        F.expr("shiftrightunsigned(ip, 32 - plen)")
        == F.expr("shiftrightunsigned(net, 32 - plen)"),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("plen").desc(), "cidr")
    best = matched.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") == 1
    )
    return best.groupBy("cidr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_flows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum(F.col("bytes")).cast("double").alias("total_bytes"),
    )
