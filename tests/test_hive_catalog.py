"""Hive-catalog smoke test — the last reference-parity nit.

The reference binds its ``traffic_limits`` config table through a real
Hive metastore (``enableHiveSupport``, MainApp.java:32-36) rather than a
temp view. Everywhere else the engine uses temp views over parquet
(semantically identical for the query), but this test proves the same
flagship lookup SQL (MainApp.java:44-49) runs unchanged against an
actual metastore-backed table: ``saveAsTable`` into a Derby-backed Hive
catalog, query it, restart the session, and resolve it again from the
metastore alone.

``spark.sql.catalogImplementation`` is fixed at JVM start, and the
shared test session is in-memory-catalog — so this runs in a
subprocess with its own JVM and a throwaway warehouse/metastore under
``tmp_path``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import sys
    repo, warehouse, metastore = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    def build():
        return (
            SparkSession.builder.master("local[4]")
            .appName("hive-smoke")
            .config("spark.sql.warehouse.dir", warehouse)
            .config("spark.ui.enabled", "false")
            .config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={metastore};create=true",
            )
            .enableHiveSupport()
            .getOrCreate()
        )

    LOOKUP = (
        "select limit_name, limit_value from traffic_limits "
        "where limit_name in ('min', 'max') order by limit_value"
    )

    spark = build()
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
    from spark_streaming_test_spark.operators.traffic import LIMITS_ROWS

    spark.sql("DROP TABLE IF EXISTS traffic_limits")
    spark.createDataFrame(
        LIMITS_ROWS, "limit_name string, limit_value int"
    ).write.mode("overwrite").format("parquet").saveAsTable("traffic_limits")
    assert spark.catalog.tableExists("traffic_limits")
    rows = spark.sql(LOOKUP).limit(2).collect()
    assert [r["limit_name"] for r in rows] == ["min", "max"], rows
    assert rows[1]["limit_value"] == 150, rows
    spark.stop()

    # A fresh session must resolve the table from the metastore alone —
    # nothing re-registered. This is what a temp view cannot do.
    spark = build()
    rows = spark.sql(LOOKUP).limit(2).collect()
    assert rows[1]["limit_value"] == 150, rows
    spark.stop()
    print("HIVE_SMOKE_OK")
    """
)


def test_hive_metastore_flagship_lookup(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _SCRIPT,
            REPO,
            str(tmp_path / "warehouse"),
            str(tmp_path / "metastore_db"),
        ],
        cwd=str(tmp_path),  # derby.log / any stray metastore files land here
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "HIVE_SMOKE_OK" in proc.stdout
