"""Run EVERY registered query against its DuckDB oracle — the local twin
of the driver's CORRECTNESS gate. Queries without an oracle get a
rows-run sanity check (the driver's weaker rows-only path)."""

from __future__ import annotations

import pytest

from spark_streaming_test_spark.registry import all_queries

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, sf_dir, oracle_con):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = df.count()
        assert n >= 0
        assert df.columns, f"{name}: empty schema"
        return
    from .compare import assert_match

    assert_match(df, oracle_con, q.oracle, name)
