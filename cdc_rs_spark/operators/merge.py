"""Backfill-correction merge — "live wins" keyed arbitration.

The reference's `CorrectedBackfill` merges the snapshot stream with the live
binlog stream; when a backfill row and a live change share (db, table) and
their pkey-named field values are equal, the live change replaces the stale
snapshot row (reference src/main.rs:71-121). As SURVEY §2.1#5 notes, the
semantic contract is "per primary key, a live change supersedes any backfill
row for that key" — not the racy pairwise polling.

Spark restatement (batch): union the two change sets, then keep one survivor
per (db, table, pkey-value): any live change beats any backfill row; among
live changes the latest (ts, then op recency) wins. One shuffle on the key —
AQE skew-join/partition-coalescing applies; at 100 TB this is a standard
keyed dedup, linear in data with a single exchange.

The streaming version lives in cdc_rs_spark/streaming/arbitrate.py
(dropDuplicates-style stateful suppression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_rs_spark.envelope import CHANGE_COLUMNS, OP_BACKFILL, pkey_value


def live_priority():
    """Backfill rows lose to any live change (reference src/main.rs:77-87:
    `update_with` replaces the backfill item with the live one)."""
    return F.when(F.col("op") == OP_BACKFILL, F.lit(0)).otherwise(F.lit(1))


def corrected_backfill(backfill_df: DataFrame, changes_df: DataFrame) -> DataFrame:
    """Union + keyed live-wins arbitration. Both inputs are Change-envelope
    DataFrames. Survivor per (db, table, pkey value): highest (live-ness, ts).

    Deterministic tie-break: among equal (priority, ts) the op string is
    compared (Update > Insert > Delete alphabetically is NOT meaningful, so we
    use a stable op ordering) — ties only arise in synthetic fixtures where
    two live ops share a timestamp.
    """
    merged = backfill_df.unionByName(changes_df)
    op_rank = (
        F.when(F.col("op") == "Update", 3)
        .when(F.col("op") == "Insert", 2)
        .when(F.col("op") == "Delete", 1)
        .otherwise(0)
    )
    w = Window.partitionBy(F.col("db"), F.col("table"), pkey_value(merged)).orderBy(
        live_priority().desc(), F.col("ts").desc(), op_rank.desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*CHANGE_COLUMNS)
    )
