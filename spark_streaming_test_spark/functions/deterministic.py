"""Cross-engine deterministic float aggregation.

The driver's correctness gate hashes result values from BOTH Spark and a
DuckDB oracle. Naive ``SUM(double)`` is order-dependent (IEEE-754 addition
is not associative; Spark's partial/final aggregation order varies with
partitioning), so two correct engines can disagree in the last ulp and
fail the hash.

Strategy: route every float aggregate through fixed-point decimal —
``CAST(x AS DECIMAL(p, s))`` is deterministic (binary doubles are almost
never exactly on a half-way rounding boundary at these scales), decimal
addition is exact and associative, and the final ``CAST(.. AS DOUBLE)`` of
the same exact decimal yields the same double bits in any engine. Averages
and other ratios are then IEEE divisions of two already-identical doubles.

This also matters at 100 TB independent of the oracle: decimal sums make
re-runs reproducible regardless of partition count or AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for SUM over ~1e9 rows of ~1e6-magnitude values.
#
# SCALE RULE: the cast scale must be >= the true decimal scale of the
# value, so the scaled value is near an integer — never near a .5 tie.
# Source money/rate columns have 2 decimals; products of up to three of
# them have <= 6. At a tie (e.g. a 6-decimal value cast at scale 4)
# Spark rounds the exact binary value HALF_UP while DuckDB rounds the
# 10^s-scaled double half-even — they diverge. At scale 6 every such
# value scales to a near-integer and both engines agree bitwise.
_PREC, _SCALE = 25, 6
_DEC = f"decimal({_PREC},{_SCALE})"


def dsum(col: Column | str) -> Column:
    """Deterministic SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"({sql_dsum(expr)} / CAST(COUNT({expr}) AS DOUBLE))"
