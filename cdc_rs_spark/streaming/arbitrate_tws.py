"""Live-wins arbitration on the transformWithStateInPandas API — the same
semantic contract as streaming/arbitrate.py (reference src/main.rs:71-121:
live change supersedes backfill per key, latest ts wins among live), restated
on Spark 4's next-generation arbitrary-state API.

Why both exist: applyInPandasWithState is the widely-deployed API;
transformWithStateInPandas is its successor (explicit state variables, state
TTL, multiple state types per processor) and is where new stateful operators
should land. Keeping the two implementations semantically identical — both
are exercised by the same arrival-order tests — documents the migration path.

Scale notes match arbitrate.py: state is a single (prio, ts, oprank) tuple
per key, sharded by key hash across the state store; a TTL (configurable
here, unavailable in the old API) bounds state for keys whose backfill has
long since been superseded.

Environment note: transformWithStateInPandas's control channel needs
`google.protobuf` (and the RocksDB state-store provider); this container
ships neither protobuf nor pip access, so the operator is exercised by a
test that skips when the dependency is absent
(tests/test_streaming.py::test_tws_arbitration_matches_legacy_semantics).
The applyInPandasWithState implementation (arbitrate.py) is the one that
runs everywhere and carries the oracle-checked semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

from cdc_rs_spark.envelope import OP_BACKFILL, pkey_value
from cdc_rs_spark.streaming.arbitrate import _OP_RANK, _STATE_SCHEMA

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


class LiveWinsProcessor(StatefulProcessor):
    """Keeps the per-key winner's (prio, ts, oprank); emits the key's new
    winner whenever a micro-batch improves on the stored one.

    ttl_ms (class attribute, set by arbitrate_stream_tws) bounds state at
    CDC key cardinality via the API's NATIVE value-state TTL — the headline
    capability this newer API adds over applyInPandasWithState's manual
    timeout dance (arbitrate.py _make_arbitrate). Semantics mirror that
    form: an evicted key's late backfill re-opens arbitration (emitted, not
    suppressed) — size the TTL beyond the backfill queue's completion
    horizon (reference bounds it: todo->done, src/main.rs:319-338)."""

    ttl_ms: int | None = None

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._best = handle.getValueState(
            "best", _STATE_SCHEMA, ttlDurationMs=self.ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        best = tuple(self._best.get()) if self._best.exists() else None
        winner = None
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                prio = 0 if row.op == OP_BACKFILL else 1
                cand = (prio, int(row.ts), _OP_RANK.get(row.op, 0))
                if best is None or cand > best:
                    best = cand
                    winner = {
                        "key": key[0],
                        "op": row.op,
                        "ts": int(row.ts),
                        "payload": row.payload,
                    }
        if best is not None:
            self._best.update(best)
        if winner is not None:
            yield pd.DataFrame([winner])

    def close(self) -> None:
        pass


def arbitrate_stream_tws(changes: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """transformWithStateInPandas form of arbitrate_stream. Keyed by the
    pkey value only (db/table fold into the key string upstream if multiple
    tables share a stream).

    ttl_ms enables the state store's native per-value TTL (requires
    processingTime time mode); None keeps state forever — acceptable only
    for bounded key domains (tests), never at CDC key cardinality."""
    keyed = changes.withColumn("key", pkey_value(changes)).withColumn(
        "payload", F.to_json(F.coalesce(F.col("after"), F.col("before")))
    )
    proc = LiveWinsProcessor()
    proc.ttl_ms = ttl_ms
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none" if ttl_ms is None else "processingTime",
    )
