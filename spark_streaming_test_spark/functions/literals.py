"""Fast array literals.

``F.lit(<nested python list>)`` converts element-by-element over py4j:
a 64x64 double matrix costs ~2.6 s of driver time PER CALL (measured —
it dominated dedup_semantic_cluster's construction). Rendering the same
value as a SQL ``array(array(...))`` expression and letting Catalyst's
JVM parser build the literal is ~150x faster and value-identical:
Python ``repr`` emits the shortest round-trip decimal for a double, and
Spark parses the ``D``-suffixed literal back to the identical bits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(values: list[float]) -> Column:
    """array<double> literal via the SQL parser."""
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in values) + ")")


def lit_double_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal via the SQL parser."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in r) + ")"
            for r in rows
        )
        + ")"
    )


def lit_longs(values: list[int]) -> Column:
    """array<bigint> literal via the SQL parser."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")
