"""Order-insensitive exact result comparison between Spark and DuckDB.

Replicates (a strict superset of) the driver's correctness gate: same row
count, same column-name set, same RESULT COLUMN TYPES, and exact value
equality after sorting columns by name and rows by canonicalized value.
Floats must match bitwise — the engine's deterministic-aggregation
strategy (functions/deterministic.py) makes that achievable, and holding
the line locally means the driver's value-hash cannot flake.

The type check exists because the driver canonicalizes through pandas,
where result *width* matters: DuckDB widens SUM(BIGINT)/count_if to
HUGEINT, which pandas renders as float64 while Spark's bigint stays
int64 — identical values, different hash (the exact failure mode of
agg_argminmax_condcount/agg_rollup_hierarchical_time in round 1). Both
engines' declared types are mapped to a canonical label and compared
per column, so any width divergence fails locally before the driver
ever sees it.
"""

from __future__ import annotations

import datetime as dt
import re
import struct
from decimal import Decimal

# Canonical type labels keyed by each engine's spelling. Coarse on
# purpose: the driver's hash cares about the pandas dtype a value lands
# in, not the SQL name. All signed ints up to 64 bits collapse to one
# label (round-1 evidence: window_topk_per_group returned Spark int32
# against a DuckDB BIGINT oracle and the driver hash PASSED — python
# ints compare width-blind). HUGEINT stays distinct: pandas renders
# int128 as float64/object, which is exactly the divergence that failed
# agg_argminmax_condcount in round 1.
_SPARK_TYPES = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
    "binary": "binary",
    "void": "null",
}

_DUCKDB_TYPES = {
    "tinyint": "int",
    "smallint": "int",
    "integer": "int",
    "bigint": "int",
    "hugeint": "int128",  # never matches a Spark type — by design
    "utinyint": "uint8",
    "usmallint": "uint16",
    "uinteger": "uint32",
    "ubigint": "uint64",
    "float": "float32",
    "double": "float64",
    "varchar": "string",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
    "timestamp_ns": "timestamp",
    "date": "date",
    "blob": "binary",
    '"null"': "null",
}


def canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal"):
        return re.sub(r"\s+", "", t)
    if t.startswith(("array<", "map<", "struct<")):
        return "complex"
    return _SPARK_TYPES.get(t, t)


def canon_duckdb_type(t: str) -> str:
    t = str(t).strip().lower()
    if t.startswith("decimal"):
        return re.sub(r"\s+", "", t)
    if t.endswith("[]") or t.startswith(("map(", "struct(")):
        return "complex"
    return _DUCKDB_TYPES.get(t, t)


def _canon_float(v: float) -> tuple:
    """Bitwise-strict float canonicalization.

    The driver canonicalizes through pandas, whose value hash is over
    the raw float64 BITS — so -0.0 and +0.0 hash differently there
    (the round-10 ``emb_covariance_matrix`` red: one covariance entry
    rounded to +0.0 in Spark, -0.0 in DuckDB, values "equal" in Python
    but hash-divergent in the driver). The local gate must be at least
    as TIGHT as the driver, so floats canonicalize to their raw
    IEEE-754 bit pattern — including NaN payload bits, which pandas
    also distinguishes (measured: hash_pandas_object of 0x7ff8...0 vs
    0x7ff8...1 differs). Both engines emit the canonical quiet NaN
    from arithmetic, so bit-exact NaN costs nothing and closes the
    last looser-than-driver class. tests/test_gate_parity.py pins the
    strictness direction against a pandas replica.
    """
    return ("f", struct.pack("<d", v))


def _canon(v):
    if v is None:
        return ("\x00none",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        # Representation-exact, not through float: pandas hashes
        # object columns by each element's serialized form, so
        # Decimal('1.5') and Decimal('1.50') hash APART in the driver
        # (measured — numeric hash(Decimal) equality does NOT apply).
        # str(v) has the same equality classes as that serialization.
        # Matched declared scales (enforced by assert_types_match)
        # make both engines render the same digit string for equal
        # values, so this is exactly driver-tight, not over-tight.
        return ("dec", str(v))
    if isinstance(v, float):
        return _canon_float(v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        # Instant-based, matching pandas i8 semantics: a tz-aware
        # value hashes as its UTC instant driver-side, a naive one as
        # its wall time. Stripping tzinfo wall-clock-style would make
        # a +02:00-aware value compare equal to a naive twin the
        # driver hashes apart. (UTC-aware values — the only aware
        # values this environment produces — are unaffected.)
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("t", v.isoformat(sep=" ", timespec="microseconds"))
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


def assert_types_match(spark_df, con, sql: str, name: str = "query") -> None:
    """Per-column declared-type equality (after canonical mapping).

    Also rejects complex (array/map/struct) result columns outright:
    the driver's pandas canonicalizer crashes on unhashable cells
    (round-1 agg_collect_sorted / fn_array_suite), so oracle-backed
    queries must serialize them to strings before returning.
    """
    stypes = {f.name: canon_spark_type(f.dataType.simpleString()) for f in spark_df.schema.fields}
    rel = con.sql(sql)
    dtypes = {c: canon_duckdb_type(t) for c, t in zip(rel.columns, rel.types)}
    bad = []
    for c in sorted(stypes):
        s, d = stypes[c], dtypes.get(c)
        if s == "complex" or d == "complex":
            bad.append(f"{c}: complex result type (spark={s}, duckdb={d}) — serialize to string")
        elif s != d:
            bad.append(f"{c}: spark={s} duckdb={d}")
    assert not bad, f"{name}: result type mismatch — " + "; ".join(bad)


def assert_match(spark_df, con, sql: str, name: str = "query") -> None:
    scols, srows = spark_result(spark_df)
    dcols, drows = duckdb_result(con, sql)
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert_types_match(spark_df, con, sql, name)
    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )
    sc = canon_table(scols, srows)
    db = canon_table(dcols, drows)
    if sc != db:
        diffs = [(a, b) for a, b in zip(sc, db) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
