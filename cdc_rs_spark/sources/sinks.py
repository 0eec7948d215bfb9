"""Sinks — topic-routed fan-out.

Reference: one Pub/Sub message per change, topic resolved per-row by the user
script, one cached publisher per distinct topic (src/main.rs:174-187,
:131,:182-185); the actual publish call is disabled in the shipped binary
(src/main.rs:187) — a dry-run. Delivery is at-least-once (offset persisted at
TableMapEvent cadence, src/main.rs:238-255), made effectively exactly-once
downstream by the idempotent UPSERT envelope.

Spark restatement: the idiomatic sink is Kafka with a per-row `topic` column
(built-in routing); for Pub/Sub-style APIs, foreachBatch groups by topic and
publishes per topic with a cached client. For tests/oracles we write parquet
partitioned by topic — same fan-out shape, inspectable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_topics_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Topic-partitioned parquet sink: one directory per topic — the test
    stand-in for per-topic publish. Requires a `topic` and `value` column."""
    df.select("topic", "value").write.mode(mode).partitionBy("topic").parquet(path)


def write_kafka(df: DataFrame, bootstrap_servers: str, checkpoint: str) -> None:
    """Kafka sink with native per-row topic routing. Not executable in this
    environment (no broker); the code path documents the production shape."""
    (
        df.selectExpr("topic", "CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def publish_foreach_batch(
    publish: Callable[[str, list[str]], None] | None = None,
):
    """Pub/Sub-style sink as a foreachBatch function: per micro-batch, group
    rows by topic and hand each topic's payload list to `publish`. With
    publish=None this is a dry-run — faithful to the reference shipping with
    the publish call commented out (src/main.rs:187).

    The per-topic client caching the reference does (src/main.rs:182-185) is
    `publish`'s concern; this operator guarantees one call per (batch, topic).
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        grouped = (
            batch_df.groupBy("topic")
            .agg(F.collect_list("value").alias("values"))
            .collect()
        )
        for row in grouped:
            if publish is not None:
                publish(row["topic"], row["values"])

    return fn
