"""SparkSession factory with scale-oriented defaults.

Tested on local[32]; the config choices are the ones that matter on a real
cluster too: AQE on (runtime coalesce + skew-join handling), Arrow enabled for
any Pandas-UDF path, UTC session timezone so temporal stringification is
deterministic across JVMs, and a broadcast threshold large enough that the
TPC-H-ish dimension tables (region/nation/customer/supplier/part) always
broadcast instead of shuffling the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cdc-rs-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long nanos and convert in load() (micros trunc,
        # matching DuckDB's nanos->micros read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # catalog tables (bucketed-join support) live outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/cdc_rs_spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def spread(df, min_partitions: int | None = None):
    """Widen a narrow scan before a CPU-bound per-row pipeline.

    A single small parquet file (one row group) plans as ONE task no matter
    how many cores exist — byte-range splitting cannot cut inside a row
    group — so per-row-expensive operators (minhash signatures, shingling,
    Arrow-batched Python transforms) would run on one core. When the scan's
    partition count is below the cluster's parallelism, a round-robin
    repartition (cheap: the raw rows are small; the derived work is what's
    expensive) unlocks every core. On a real multi-file input the condition
    is false and this is a no-op — no gratuitous shuffle at scale."""
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table. Column pruning + predicate pushdown reach the
    parquet scan because this stays a plain declarative read.

    events.ts is TIMESTAMP(NANOS) in the file — surfaced as long nanos by
    the nanosAsLong flag and converted here to a micros timestamp with
    integer division (a double division would lose ~100ns of precision at
    2024 epoch-nanos magnitudes)."""
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
