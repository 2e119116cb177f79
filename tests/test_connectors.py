"""Connector robustness: malformed-input handling and schema-conflict
behavior — the failure modes a 100 TB ingest hits daily (a bad file in
a million-file drop must quarantine rows, not kill the job)."""

from __future__ import annotations

import pytest

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


# --- real pcap-file reader (O1 fidelity) -----------------------------------


def _golden_pcap_bytes(big_endian=False, nanos=False):
    """Hand-assembled from the public pcap spec (not via write_pcap), so
    the writer and parser can't share a bug: 2 packets, payloads b'AB'
    and b'XYZ', the second truncated (orig_len 600 > incl_len 3)."""
    import struct

    e = ">" if big_endian else "<"
    magic = 0xA1B23C4D if nanos else 0xA1B2C3D4
    hdr = struct.pack(e + "IHHiIII", magic, 2, 4, 0, 0, 65535, 1)
    frac1 = 500000000 if nanos else 500000  # both mean 0.5 s
    r1 = struct.pack(e + "IIII", 1000, frac1, 2, 2) + b"AB"
    r2 = struct.pack(e + "IIII", 2000, 0, 3, 600) + b"XYZ"
    return hdr + r1 + r2


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("nanos", [False, True])
def test_pcap_parse_golden_bytes(big_endian, nanos):
    from spark_streaming_test_spark.sources.pcap_file import parse_pcap_bytes

    rows = list(
        parse_pcap_bytes("f", _golden_pcap_bytes(big_endian, nanos))
    )
    assert rows == [
        ("f", 0, 1000, 500000, 2, 2, b"AB"),
        ("f", 1, 2000, 0, 3, 600, b"XYZ"),
    ]


def test_pcap_parse_torn_tail_and_bad_magic():
    from spark_streaming_test_spark.sources.pcap_file import parse_pcap_bytes

    buf = _golden_pcap_bytes()
    # cut mid-way through the second record's payload: torn capture
    rows = list(parse_pcap_bytes("f", buf[:-2]))
    assert [r[1] for r in rows] == [0]
    with pytest.raises(ValueError, match="not a pcap"):
        list(parse_pcap_bytes("f", b"\x00" * 64))


def test_pcap_reader_roundtrip_spark(spark, tmp_path):
    """write_pcap -> binaryFile scan -> mapInPandas parse recovers every
    header field and payload byte-for-byte, across two files (one per
    endianness) parsed in parallel tasks."""
    from spark_streaming_test_spark.sources.pcap_file import (
        read_pcap,
        write_pcap,
    )

    pkts = [
        (10 + i, i * 7, 4 + i, 4 + i, bytes([65 + i]) * (4 + i))
        for i in range(5)
    ]
    write_pcap(str(tmp_path / "le.pcap"), pkts)
    write_pcap(str(tmp_path / "be.pcap"), pkts, big_endian=True)
    df = read_pcap(spark, str(tmp_path / "*.pcap"))
    got = sorted(
        (r["path"].rsplit("/", 1)[-1], r["pkt_index"], r["ts_sec"],
         r["ts_usec"], r["incl_len"], r["orig_len"], bytes(r["data"]))
        for r in df.collect()
    )
    want = sorted(
        (name, i, p[0], p[1], p[2], p[3], p[4])
        for name in ("be.pcap", "le.pcap")
        for i, p in enumerate(pkts)
    )
    assert got == want


def test_pcap_dir_batch_source(spark, tmp_path):
    from spark_streaming_test_spark.sources.pcap_file import (
        register_pcap_source,
        write_pcap,
    )

    register_pcap_source(spark)
    d = tmp_path / "caps"
    d.mkdir()
    write_pcap(str(d / "a.pcap"), [(1, 0, 2, 2, b"AA"), (2, 0, 1, 1, b"B")])
    write_pcap(str(d / "b.pcap"), [(3, 0, 3, 3, b"CCC")])
    df = spark.read.format("pcap_dir").option("path", str(d)).load()
    rows = sorted((r["ts_sec"], bytes(r["data"])) for r in df.collect())
    assert rows == [(1, b"AA"), (2, b"B"), (3, b"CCC")]


def test_pcap_dir_stream_exactly_once_across_restart(spark, tmp_path):
    """Rotated-capture tailing: a restarted query resumes from the
    checkpointed file offset — files consumed before the stop are NOT
    re-emitted, files rotated in during the downtime are."""
    from spark_streaming_test_spark.sources.pcap_file import (
        register_pcap_source,
        write_pcap,
    )

    register_pcap_source(spark)
    d = tmp_path / "caps"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_pcap(str(d / "cap-0001.pcap"), [(10, 0, 2, 2, b"AA")])
    write_pcap(str(d / "cap-0002.pcap"), [(20, 0, 3, 3, b"BBB")])

    def run_once():
        q = (
            spark.readStream.format("pcap_dir")
            .option("path", str(d))
            .load()
            .select("ts_sec", "incl_len")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = sorted(r["ts_sec"] for r in spark.read.parquet(out).collect())
    assert first == [10, 20]
    # rotation continues while the query is down
    write_pcap(str(d / "cap-0003.pcap"), [(30, 0, 1, 1, b"C")])
    run_once()
    second = sorted(r["ts_sec"] for r in spark.read.parquet(out).collect())
    assert second == [10, 20, 30], "old files replayed or new file missed"


def test_pcap_stream_windowed_totals_equal_batch(spark, tmp_path):
    """Event-time windowed byte totals over the STREAMING pcap source
    must equal the batch pipeline's aggregation — the streaming twin of
    traffic_pcap_pipeline (same fixture, same 5-minute windows)."""
    from pyspark.sql import functions as F

    from spark_streaming_test_spark.sources.pcap_file import (
        _traffic_fixture_dir,
        register_pcap_source,
        traffic_pcap_pipeline,
    )

    register_pcap_source(spark)
    d = _traffic_fixture_dir()
    # complete-mode memory sink: every window is visible at termination
    # (append mode would hold back windows the watermark never passed
    # on this bounded fixture).
    q = (
        spark.readStream.format("pcap_dir")
        .option("path", d)
        .load()
        .withColumn("ts", F.timestamp_seconds("ts_sec"))
        .groupBy(
            F.window("ts", "5 minutes"),
            F.regexp_extract("path", r"(eth\d+)\.pcap$", 1).alias("nif"),
        )
        .agg(F.sum(F.col("incl_len").cast("bigint")).alias("total_bytes"))
        .select(
            F.unix_timestamp("window.start").alias("window_start_epoch"),
            "nif",
            "total_bytes",
        )
        .writeStream.format("memory")
        .queryName("pcap_windowed")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["nif"], r["window_start_epoch"]): r["total_bytes"]
        for r in spark.sql("SELECT * FROM pcap_windowed").collect()
    }
    want = {
        (r["nif"], r["window_start_epoch"]): r["total_bytes"]
        for r in traffic_pcap_pipeline(spark, "unused").collect()
    }
    assert got == want


def test_pcap_roundtrip_property():
    """Property: any packet list roundtrips byte-exactly through
    write_pcap/parse_pcap_bytes in all four format variants."""
    from hypothesis import given, settings, strategies as st

    from spark_streaming_test_spark.sources.pcap_file import (
        parse_pcap_bytes,
        write_pcap,
    )

    packet = st.tuples(
        st.integers(0, 2**32 - 1),            # ts_sec
        st.integers(0, 999_999),              # ts_usec
        st.binary(min_size=0, max_size=200),  # payload
    )

    @settings(max_examples=40, deadline=None)
    @given(
        pkts=st.lists(packet, max_size=8),
        big_endian=st.booleans(),
        nanos=st.booleans(),
    )
    def check(pkts, big_endian, nanos):
        import tempfile, os

        frac_scale = 1000 if nanos else 1
        rows = [
            (ts, us * frac_scale, len(data), len(data), data)
            for ts, us, data in pkts
        ]
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "x.pcap")
            write_pcap(p, rows, nanos=nanos, big_endian=big_endian)
            got = list(parse_pcap_bytes(p, open(p, "rb").read()))
        assert [(g[2], g[3], g[6]) for g in got] == [
            (ts, us, data) for ts, us, data in pkts
        ]

    check()


def test_pcap_dir_stream_survives_retention_cleanup(spark, tmp_path):
    """Name-anchored offsets: deleting already-consumed capture files
    (retention) between restarts must not shift the offset — the
    restarted query reads ONLY the newly rotated file, never re-reads
    survivors or skips new data (a consumed-prefix COUNT offset fails
    exactly here)."""
    import os

    from spark_streaming_test_spark.sources.pcap_file import (
        register_pcap_source,
        write_pcap,
    )

    register_pcap_source(spark)
    d = tmp_path / "caps"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_pcap(str(d / "cap-0001.pcap"), [(10, 0, 2, 2, b"AA")])
    write_pcap(str(d / "cap-0002.pcap"), [(20, 0, 3, 3, b"BBB")])

    def run_once():
        q = (
            spark.readStream.format("pcap_dir")
            .option("path", str(d))
            .load()
            .select("ts_sec", "incl_len")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(
        r["ts_sec"] for r in spark.read.parquet(out).collect()
    ) == [10, 20]
    # retention deletes the OLDEST consumed file; capture rotates a new one
    os.remove(str(d / "cap-0001.pcap"))
    write_pcap(str(d / "cap-0003.pcap"), [(30, 0, 1, 1, b"C")])
    run_once()
    assert sorted(
        r["ts_sec"] for r in spark.read.parquet(out).collect()
    ) == [10, 20, 30], "retention shifted the stream offset"


def test_pcap_stream_restart_retention_no_rereads(spark, tmp_path):
    """Driver-bounce + aggressive retention: EVERY consumed file is
    deleted — including cap-0002, the file whose NAME is the
    checkpointed offset. The fresh reader instance starts with
    _high='' and must re-seed from the checkpointed end offset via
    partitions() (the lifecycle contract documented on
    PcapDirStreamReader.latestOffset); the offset name compares fine
    even though the file it names no longer exists, so the restarted
    query emits ONLY the newly rotated file."""
    import os

    from spark_streaming_test_spark.sources.pcap_file import (
        register_pcap_source,
        write_pcap,
    )

    register_pcap_source(spark)
    d = tmp_path / "caps"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_pcap(str(d / "cap-0001.pcap"), [(10, 0, 2, 2, b"AA")])
    write_pcap(str(d / "cap-0002.pcap"), [(20, 0, 3, 3, b"BBB")])

    def run_once():
        q = (
            spark.readStream.format("pcap_dir")
            .option("path", str(d))
            .load()
            .select("ts_sec", "incl_len")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(
        r["ts_sec"] for r in spark.read.parquet(out).collect()
    ) == [10, 20]
    # retention wipes ALL consumed files — the offset-anchor included
    os.remove(str(d / "cap-0001.pcap"))
    os.remove(str(d / "cap-0002.pcap"))
    write_pcap(str(d / "cap-0003.pcap"), [(30, 0, 1, 1, b"C")])
    run_once()
    assert sorted(
        r["ts_sec"] for r in spark.read.parquet(out).collect()
    ) == [10, 20, 30], "offset-anchor deletion broke exactly-once"


def test_multi_rowgroup_parquet_scan_splits(spark, tmp_path):
    """The premise behind catalog.spread(): single-row-group test files
    scan as ONE partition, but a production file with many row groups
    splits by spark.sql.files.maxPartitionBytes — scan parallelism
    comes free from the layout. Write one file with small row groups
    and verify the scan yields multiple input partitions."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "big")
    (
        spark.range(200_000)
        .select(
            F.col("id"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)  # tiny row groups
        .parquet(p)
    )
    saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        df = spark.read.parquet(p)
        n_parts = df.rdd.getNumPartitions()
        assert n_parts > 4, f"scan did not split: {n_parts} partition(s)"
        assert df.count() == 200_000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)


def test_pcap_dir_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """Back-pressure: with max_files_per_trigger=2 a 5-file backlog
    must arrive in bounded steps of at most 2 files per offered offset
    (for the Python stream API, availableNow snapshots ONE capped
    offset per run — so the backlog drains across runs: 2, 2, 1),
    delivering every packet exactly once with no skips."""
    from spark_streaming_test_spark.sources.pcap_file import (
        register_pcap_source,
        write_pcap,
    )

    register_pcap_source(spark)
    d = tmp_path / "caps"
    d.mkdir()
    for i in range(5):
        write_pcap(
            str(d / f"cap-{i:04d}.pcap"), [(100 + i, 0, 1, 1, bytes([65 + i]))]
        )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("pcap_dir")
            .option("path", str(d))
            .option("max_files_per_trigger", "2")
            .load()
            .select("ts_sec")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["ts_sec"] for r in spark.read.parquet(out).collect())

    assert run_once() == [100, 101]                  # capped at 2
    assert run_once() == [100, 101, 102, 103]        # next 2, no re-read
    assert run_once() == [100, 101, 102, 103, 104]   # remainder
