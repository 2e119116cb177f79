"""Property-based check of the O13 edge-trigger semantic
(KafkaProducer.java:34-41): for ANY sequence of per-key window totals,
the engine's lag-window formulation must emit exactly what the
reference's state machine emits — first observation always, then only on
alert-flag flips.

Hypothesis drives randomized sequences through a DataFrame built the
same way streaming/batch_oracle.py::stream_edge_trigger_alerts builds
its flagged frame; the expected emissions come from a direct Python
simulation of the ConcurrentMap state machine."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

LIMIT = 100.0

totals_strategy = st.dictionaries(
    keys=st.sampled_from(["eth0", "eth1", "lo"]),
    values=st.lists(
        st.floats(min_value=0.0, max_value=200.0, allow_nan=False), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=3,
)


def _reference_state_machine(seq: list[float]) -> list[int]:
    """Indices of emissions per the reference semantics."""
    out, prev = [], None
    for i, total in enumerate(seq):
        is_alert = total > LIMIT
        if prev is None or prev != is_alert:
            out.append(i)
        prev = is_alert
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(totals_strategy)
def test_lag_window_equals_reference_state_machine(spark, data):
    t0 = datetime(2024, 1, 1)
    rows = [
        (nif, i, float(total), t0 + timedelta(hours=i))
        for nif, seq in data.items()
        for i, total in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "nif string, seq int, total_bytes double, window_start timestamp"
    )
    w = Window.partitionBy("nif").orderBy("window_start")
    flagged = df.withColumn("is_alert", F.col("total_bytes") > LIMIT).withColumn(
        "prev_alert", F.lag("is_alert").over(w)
    )
    emitted = flagged.filter(
        F.col("prev_alert").isNull() | (F.col("is_alert") != F.col("prev_alert"))
    )
    got = {
        nif: sorted(r["seq"] for r in grp)
        for nif, grp in __import__("itertools").groupby(
            sorted(emitted.collect(), key=lambda r: r["nif"]), key=lambda r: r["nif"]
        )
    }
    expected = {
        nif: _reference_state_machine(seq) for nif, seq in data.items()
    }
    assert got == expected
