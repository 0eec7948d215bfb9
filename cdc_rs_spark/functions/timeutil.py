"""Timestamp-type-agnostic epoch arithmetic.

The fixture parquet stores naive `timestamp[us]` (isAdjustedToUTC=false),
which Spark 4 reads as TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.
enabled` defaults true), while internally-built envelope columns are plain
TIMESTAMP (LTZ). `unix_micros` rejects NTZ input, so every epoch computation
goes through `epoch_us`, which normalizes via TIMESTAMP_NTZ and measures
against the NTZ epoch with `timestamp_diff` — a wall-clock computation with
no session-timezone dependency for NTZ input (and identical for LTZ input
under the pinned-UTC session, session.py). DuckDB oracles see the same naive
timestamps, so both engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 (wall clock), for TIMESTAMP or
    TIMESTAMP_NTZ input. Pure column expression, whole-stage codegen."""
    if isinstance(col, str):
        col = F.col(col)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, col.cast("timestamp_ntz"))


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since epoch, truncated (floor) per-value — matches
    DuckDB's `date_diff('millisecond', ...)` per-operand truncation."""
    return F.floor(epoch_us(col) / 1000).cast("long")
