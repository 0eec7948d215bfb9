"""Streaming live-wins arbitration — the stateful form of the
backfill-correction merge (reference src/main.rs:71-121; batch form in
operators/merge.py).

Semantic contract (SURVEY §2.1 #5): per (db, table, pkey value), a live
change supersedes any backfill row, regardless of arrival order; among live
changes the latest ts wins. In a stream this is genuinely stateful: a
backfill row must be suppressed even if it arrives *after* the live change
for its key.

Implementation: applyInPandasWithState keyed by (db, table, pkey value).
State = the current winner's (priority, ts, op-rank). Each invocation emits
the keys whose winner CHANGED in this micro-batch (update-mode semantics,
which is what a CDC consumer wants). State partitioning shards by key hash —
linear scale-out; per-key state is O(1) bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from cdc_rs_spark.envelope import OP_BACKFILL, pkey_value

_OP_RANK = {"Update": 3, "Insert": 2, "Delete": 1, "Backfill": 0}

ARBITRATED_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("payload", T.StringType()),  # JSON of the winning image
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("prio", T.IntegerType()),
        T.StructField("ts", T.LongType()),
        T.StructField("oprank", T.IntegerType()),
    ]
)


def _make_arbitrate(ttl_ms: int | None):
    def _arbitrate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL horizon passed with no new rows for this key: evict. A
            # backfill row arriving AFTER eviction restarts arbitration
            # (it will be emitted as a fresh winner) — callers size the TTL
            # beyond the backfill queue's completion horizon, which the
            # reference bounds explicitly (todo->done, src/main.rs:319-338).
            state.remove()
            return
        db, table, kval = key
        if state.exists:
            best = tuple(state.get)  # (prio, ts, oprank)
        else:
            best = None
        winner: dict[str, Any] | None = None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                prio = 0 if row.op == OP_BACKFILL else 1
                cand = (prio, int(row.ts), _OP_RANK.get(row.op, 0))
                if best is None or cand > best:
                    best = cand
                    winner = {
                        "db": db,
                        "table": table,
                        "key": kval,
                        "op": row.op,
                        "ts": int(row.ts),
                        "payload": row.payload,
                    }
        if best is not None:
            state.update(tuple(best))
            if ttl_ms is not None:
                # sliding TTL: every batch that touches the key re-arms it
                state.setTimeoutDuration(ttl_ms)
        if winner is not None:
            yield pd.DataFrame([winner])

    return _arbitrate


def arbitrate_stream(changes: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Apply keyed live-wins arbitration to a streaming Change DataFrame.
    Emits one row per key per micro-batch in which its winner changed.

    ttl_ms bounds state at CDC key cardinality: a key untouched for ttl_ms
    of processing time is evicted (otherwise per-key state lives forever —
    unbounded at 100 TB key counts). Size it past the backfill horizon: an
    evicted key's late backfill row is no longer suppressed (it re-opens
    arbitration and is emitted; tests/test_streaming.py pins both the
    eviction and the documented resurrection)."""
    keyed = changes.withColumn("key", pkey_value(changes)).withColumn(
        "payload", F.to_json(F.coalesce(F.col("after"), F.col("before")))
    )
    return (
        keyed.groupBy("db", "table", "key")
        .applyInPandasWithState(
            _make_arbitrate(ttl_ms),
            outputStructType=ARBITRATED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
