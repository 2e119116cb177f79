"""spark_streaming_test_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference app ``rakrachok/spark-streaming-test`` (a Spark Streaming NIC
traffic monitor: custom packet receiver -> per-NIC 5-minute byte sums ->
threshold alerting with edge-triggered Kafka dedup — see
``/root/reference/src/main/java/org/test/pcap4j/``), re-expressed
Spark-first on DataFrame / SQL / Catalyst / Structured Streaming, and
extended with the LLM-data-pipeline operator families (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session     — tuned SparkSession builder (AQE, arrow, UTC, partitions)
    catalog     — test-table loading / view registration
    registry    — central query + DuckDB-oracle registry (driver contract)
    operators/  — relational operator families + the flagship pipeline
    functions/  — scalar/vector/text function suites, determinism helpers
    streaming/  — Structured Streaming parity (windows, stateful dedup)
    llm/        — dedup / similarity / multimodal pipeline operators
    plans/      — physical-plan introspection checks (pushdown, broadcast)
"""

__version__ = "0.1.0"
