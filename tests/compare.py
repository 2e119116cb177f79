"""Order-insensitive exact result comparison between Spark and DuckDB.

Replicates (a strict superset of) the driver's correctness gate: same row
count, same column-name set, and exact value equality after sorting
columns by name and rows by canonicalized value. Floats must match
bitwise — the engine's deterministic-aggregation strategy
(functions/deterministic.py) makes that achievable, and holding the line
locally means the driver's value-hash cannot flake.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def _canon(v):
    if v is None:
        return ("\x00none",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # -0.0 and 0.0 hash/compare equal in python; normalize anyway
        return ("f", v + 0.0)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def canon_table(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    rows = df.collect()
    return list(df.columns), [tuple(r) for r in rows]


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_match(spark_df, con, sql: str, name: str = "query") -> None:
    scols, srows = spark_result(spark_df)
    dcols, drows = duckdb_result(con, sql)
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )
    sc = canon_table(scols, srows)
    db = canon_table(dcols, drows)
    if sc != db:
        diffs = [(a, b) for a, b in zip(sc, db) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
