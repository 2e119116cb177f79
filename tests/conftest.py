"""Shared fixtures: one tuned SparkSession per test run, DuckDB oracle con.

SPARK_GRAFT_TEST_SF_DIR selects the scale factor for parity tests
(default sf0.001 for speed; CI/driver runs sf0.01).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_test_spark.catalog import TABLES
from spark_streaming_test_spark.protoshim import ensure_protobuf
from spark_streaming_test_spark.session import get_spark

# Must happen at import time — before any fixture launches the JVM — so
# the vendored protobuf shim's PYTHONPATH entry reaches Spark's python
# workers (they inherit env from the JVM, which inherits it from us).
ensure_protobuf()

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    """DuckDB connection with the test tables registered as views —
    mirrors the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
