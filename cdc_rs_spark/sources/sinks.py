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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_change_frame(change_df: DataFrame, topic_template: str) -> DataFrame:
    """The exact (topic, key, value) frame the Kafka writer publishes for a
    Change-envelope stream — factored out of the I/O call so the contract is
    testable without a broker (tests/test_sources_sinks.py round-trips it
    through parse_kafka_change_frame).

    key = the primary-key VALUE: Kafka partitions by key, so all changes to
    one row land in one partition and keep binlog order — the per-key
    ordering the reference gets from single-threaded publish
    (src/main.rs:162-188). value = the full Change envelope as JSON."""
    from cdc_rs_spark.envelope import CHANGE_COLUMNS, pkey_value
    from cdc_rs_spark.functions.transforms import topic_column

    return change_df.select(
        topic_column(topic_template).alias("topic"),
        pkey_value(change_df).cast("string").alias("key"),
        F.to_json(F.struct(*CHANGE_COLUMNS)).alias("value"),
    )


def parse_kafka_change_frame(frame: DataFrame) -> DataFrame:
    """Inverse of kafka_change_frame's value encoding: what the Kafka READER
    does to each record (streaming/source.py:42) — parse the JSON value back
    into typed Change-envelope columns."""
    from cdc_rs_spark.envelope import CHANGE_SCHEMA

    return frame.select(
        F.from_json(F.col("value").cast("string"), CHANGE_SCHEMA).alias("c")
    ).select("c.*")


def write_topics_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Topic-partitioned parquet sink: one directory per topic — the test
    stand-in for per-topic publish. Requires a `topic` and `value` column."""
    df.select("topic", "value").write.mode(mode).partitionBy("topic").parquet(path)


def write_kafka(df: DataFrame, bootstrap_servers: str, checkpoint: str) -> None:
    """Kafka sink with native per-row topic routing. Not executable in this
    environment (no broker); the (topic, key, value) frame it publishes is
    built by kafka_change_frame and round-trip-tested broker-less in
    tests/test_sources_sinks.py. Includes `key` when present so Kafka's
    per-key partition ordering preserves binlog order per row."""
    cols = [c for c in ("topic", "key", "value") if c in df.columns]
    (
        df.selectExpr(*[f"CAST({c} AS STRING) AS {c}" for c in cols])
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def publish_foreach_batch(
    publish: Callable[[str, list[str]], None] | None = None,
):
    """Pub/Sub-style sink as a foreachBatch function, publishing from the
    EXECUTORS: rows are hash-repartitioned by topic so each topic's payloads
    are co-located, then every partition groups locally and issues one
    `publish(topic, values)` call per topic it holds — one call per
    (batch, topic) total, the reference's per-topic publisher contract
    (src/main.rs:174-187). With publish=None this is a dry-run — faithful to
    the reference shipping with the publish call commented out
    (src/main.rs:187).

    Scale: the micro-batch never passes through the driver (no collect /
    toPandas on this path), so driver memory stays flat regardless of batch
    size and publishing parallelizes across executors. `publish` is pickled
    to the executors; a real client should be created lazily per worker
    process and cached (module-level or functools.cache) — the executor-side
    analog of the reference's per-topic publisher cache (src/main.rs:182-185).
    A single pathological topic can be further split by salting the
    repartition key if per-call payload lists ever exceed worker memory.
    """

    def publish_partition(rows) -> None:
        buf: dict[str, list[str]] = {}
        for r in rows:
            buf.setdefault(r["topic"], []).append(r["value"])
        if publish is not None:
            for topic, values in buf.items():
                publish(topic, values)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select("topic", "value").repartition("topic").foreachPartition(
            publish_partition
        )

    return fn


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize a training set as deterministic shards in deterministic
    order: shard = md5-bucket of the id (retry-stable, data-independent
    balance), order within a shard = (hash, id) — i.e. the
    corpus_shuffle_deterministic permutation restricted to the shard. Each
    shard is its own directory (shard=N) whose parquet row order IS the
    training order, so a data loader streams shards independently with zero
    global coordination — the 100 TB replacement for a global ORDER BY
    (see plans/pipeline.py corpus_shuffle_deterministic docstring).
    """
    from cdc_rs_spark.plans.pipeline import hash_bucket

    bucket = hash_bucket(F.col(id_col), 1_000_000)
    out = (
        df.withColumn("shard", (bucket % n_shards).cast("int"))
        .withColumn("__order", bucket)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__order", id_col)
        .drop("__order")
    )
    out.write.mode(mode).partitionBy("shard").parquet(path)
    # loader contract: a tiny JSON manifest with per-shard row counts and an
    # order-INSENSITIVE id fingerprint (sorted before digesting —
    # collect_list order after a groupBy shuffle is not deterministic), so a
    # data loader can verify shard integrity and completeness without
    # scanning payloads. Computed distributed; only the n_shards-row summary
    # reaches the driver.
    import json as _json

    stats = (
        spark_read_shards(df.sparkSession, path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    "|", F.sort_array(F.collect_list(F.col(id_col).cast("string")))
                )
            ).alias("id_digest"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "shards": {
            int(r["shard"]): {"n_rows": r["n_rows"], "id_digest": r["id_digest"]}
            for r in stats
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=1, sort_keys=True)


def spark_read_shards(spark, path: str) -> DataFrame:
    """Read a sharded training set preserving the shard partition column."""
    return spark.read.parquet(path)


def exactly_once_parquet_batch(path: str):
    """foreachBatch parquet sink with exactly-once FILE delivery: each
    micro-batch lands in its own `batch_id=N` partition via dynamic
    partition overwrite, so when Structured Streaming replays a batch after
    checkpoint recovery (its guarantee is at-least-once invocation of
    foreachBatch), the replay OVERWRITES batch_id=N instead of appending a
    duplicate — write idempotence keyed on the engine's batch id, the same
    trick the reference gets from its idempotent UPSERT envelope
    (src/main.rs:238-255 offset cadence). Dynamic mode touches only the
    replayed partition; committed batches are never rewritten."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return fn


def compact_parquet(
    spark, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Compact a parquet directory's small files (the residue of many
    streaming micro-batches / over-partitioned writes) into ~target_bytes
    files. The classic post-ingest maintenance op: scans degrade when a
    table is a million 1 MB files (driver listing, task-per-file overhead,
    row-group fragmentation). Reads the dir, coalesces to
    ceil(input_bytes / target_bytes) partitions — coalesce, NOT repartition:
    no shuffle, tasks just concatenate neighboring input splits — writes to
    a sibling tmp dir, then atomically swaps via two renames (the local-fs /
    HDFS idiom; object stores swap a manifest instead). Returns the new
    file count."""
    import math
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + "__compacting"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
