"""Streaming CDC source — the reference binlog tail restated on Structured
Streaming.

The reference tails the MySQL binlog and hand-rolls offset persistence into
SQLite (src/main.rs:202-303: RotateEvent tracks file switches, TableMapEvent
commits offsets, RowsEvents become Changes). There is no MySQL here, so the
change feed arrives as files of JSON Change envelopes (the standard stand-in:
a Debezium/Kafka topic dump); Spark's checkpoint WAL replaces the SQLite
`log_pos` table *entirely* — offsets are committed transactionally per
micro-batch (SURVEY §2.1 #2: "no code needed", and indeed none is written).

At-least-once on replay + idempotent UPSERT envelopes downstream = the same
effectively-exactly-once contract the reference relies on.

Production swap-in: `spark.readStream.format("kafka")` + `from_json(value,
CHANGE_SCHEMA)` — identical downstream plan; the file source exists so the
whole pipeline is runnable and testable in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_rs_spark.envelope import CHANGE_SCHEMA


def read_change_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail a directory of JSON change files as an unbounded stream of
    Change envelopes. Rate limiting via maxFilesPerTrigger is the analog of
    the reference's consumer-paced pull (src/main.rs:98-120)."""
    reader = spark.readStream.schema(CHANGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_change_stream_kafka(
    spark: SparkSession, bootstrap_servers: str, topics: str
) -> DataFrame:
    """Kafka/Debezium form of the same source (no broker in this container;
    the value-parse contract is shared with the writer via
    sources/sinks.py:parse_kafka_change_frame and round-trip-tested
    broker-less in tests/test_sources_sinks.py)."""
    from cdc_rs_spark.sources.sinks import parse_kafka_change_frame

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .load()
    )
    return parse_kafka_change_frame(raw)
