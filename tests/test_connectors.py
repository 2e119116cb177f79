"""Connector robustness: malformed-input handling and schema-conflict
behavior — the failure modes a 100 TB ingest hits daily (a bad file in
a million-file drop must quarantine rows, not kill the job)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_permissive_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE mode parses what it can and routes broken rows to the
    _corrupt_record column; counts must split exactly."""
    p = tmp_path / "in.csv"
    p.write_text(
        "1,alpha,10.5\n"
        "2,beta,not_a_number\n"   # double parse failure
        "3,gamma,30.25\n"
        "4,delta\n"               # missing column
        "5,eps,50.0\n"
    )
    schema = "id int, name string, score double, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()  # corrupt-record column requires materialized parse
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert bad.count() == 2
    assert {r["id"] for r in good.collect()} == {1, 3, 5}
    # the raw broken lines are preserved verbatim for quarantine replay
    assert {r["_corrupt_record"] for r in bad.collect()} == {
        "2,beta,not_a_number",
        "4,delta",
    }
    df.unpersist()


def test_csv_dropmalformed_keeps_only_clean_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,a,1.0\nbroken_row_no_commas\n3,c,3.0\n")
    df = (
        spark.read.schema("id int, name string, score double")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert [r["id"] for r in df.orderBy("id").collect()] == [1, 3]


def test_parquet_merge_schema_conflict_fails_loudly(spark, tmp_path):
    """Additive evolution merges (tested in scan_merge_schema); a TYPE
    conflict on the same column must raise, not silently coerce."""
    a = str(tmp_path / "t" / "part=a")
    b = str(tmp_path / "t" / "part=b")
    spark.createDataFrame([(1, 10)], "id int, v int").write.parquet(a)
    spark.createDataFrame([(2, "x")], "id int, v string").write.parquet(b)
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        (
            spark.read.option("mergeSchema", True)
            .parquet(str(tmp_path / "t"))
            .collect()
        )
    assert "merge" in str(exc.value).lower() or "incompatible" in str(
        exc.value
    ).lower()
