"""Latest-row-per-key compaction of a change stream.

Not a reference operator per se, but the canonical consumer-side collapse of
the at-least-once CDC stream the reference emits (its BigQuery UPSERT envelope
relies on the sink doing exactly this; test.rhai:27-33). Implemented as a
window row_number — one shuffle on the key, map-side nothing to combine, AQE
handles skewed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_rs_spark.envelope import CHANGE_COLUMNS, OP_DELETE, pkey_value


def latest_per_key(change_df: DataFrame, drop_deletes: bool = False) -> DataFrame:
    """Survivor per (db, table, pkey value) by highest ts (binlog order).
    With drop_deletes=True the result is the materialized table state:
    deletes tombstone their key.

    ts is epoch SECONDS (binlog resolution), so same-key ties are common on
    real feeds; the secondary op-rank (Update > Insert > Delete > Backfill,
    same ordering as operators/merge.py and the cdc_compact_latest oracle)
    makes the survivor deterministic on tied timestamps."""
    op_rank = (
        F.when(F.col("op") == "Update", 3)
        .when(F.col("op") == "Insert", 2)
        .when(F.col("op") == "Delete", 1)
        .otherwise(0)
    )
    w = Window.partitionBy(
        F.col("db"), F.col("table"), pkey_value(change_df)
    ).orderBy(F.col("ts").desc(), op_rank.desc())
    out = (
        change_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*CHANGE_COLUMNS)
    )
    if drop_deletes:
        out = out.filter(F.col("op") != OP_DELETE)
    return out
