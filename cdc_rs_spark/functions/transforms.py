"""Envelope transforms + topic routing — the reference's scripted transform
surface, declarative-first.

The reference compiles a user Rhai script once and calls `transform(db, table,
op, before, after, ts)` per change plus `topic(db, table)` per change
(reference src/main.rs:389-435). The stock script (test.rhai:1-52, the
de-facto spec) implements two envelope styles:

  - Debezium: {payload: {before, after, op: c|u|d, source: {ts_ms, db, table},
    ts_ms}}                                     (test.rhai:1-23, README.md:54-73)
  - BigQuery-CDC: flattened row (before-image iff Delete, else after) +
    _CHANGE_TYPE in {UPSERT, DELETE} + tenant=db (test.rhai:25-36, :2-3, :34)

Op-code mapping (SURVEY §2.3):
  Insert/Backfill -> 'c' / UPSERT; Update -> 'u' / UPSERT; Delete -> 'd' /
  DELETE (payload = before image); anything else passes through unchanged
  (test.rhai:13,33).

All declarative (to_json / when / map_concat — Catalyst-native, codegen'd).
`scripted_transform` is the general escape hatch for arbitrary user callbacks,
Arrow-batched via mapInPandas — the documented slow path.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_rs_spark.envelope import OP_BACKFILL, OP_DELETE, OP_INSERT, OP_UPDATE


def op_code(op: Column) -> Column:
    """Debezium op letter (test.rhai:8-14): Backfill/Insert -> c, Update -> u,
    Delete -> d, else passthrough."""
    return (
        F.when(op.isin(OP_BACKFILL, OP_INSERT), F.lit("c"))
        .when(op == OP_UPDATE, F.lit("u"))
        .when(op == OP_DELETE, F.lit("d"))
        .otherwise(op)
    )


def change_type(op: Column) -> Column:
    """BigQuery _CHANGE_TYPE (test.rhai:27-33): Backfill/Insert/Update ->
    UPSERT, Delete -> DELETE, else passthrough."""
    return (
        F.when(op.isin(OP_BACKFILL, OP_INSERT, OP_UPDATE), F.lit("UPSERT"))
        .when(op == OP_DELETE, F.lit("DELETE"))
        .otherwise(op)
    )


def debezium_payload(df: DataFrame) -> Column:
    """The Debezium envelope struct for a change DataFrame (test.rhai:4-22).
    The reference emits the raw seconds `ts` into fields named ts_ms
    (test.rhai:16,20) — reproduced faithfully."""
    return F.struct(
        F.struct(
            F.col("before"),
            F.col("after"),
            op_code(F.col("op")).alias("op"),
            F.struct(
                F.col("ts").alias("ts_ms"),
                F.col("db"),
                F.col("table"),
            ).alias("source"),
            F.col("ts").alias("ts_ms"),
        ).alias("payload")
    )


def debezium_json(df: DataFrame) -> Column:
    """Serialized Debezium envelope — the reference serializes the returned
    map with format_map_as_json (src/main.rs:421)."""
    return F.to_json(debezium_payload(df))


def bigquery_fields(df: DataFrame, tenant_from_db: bool = True) -> Column:
    """BigQuery-CDC flattened fields as map<string,string>: before-image iff
    Delete else after (test.rhai:26), plus _CHANGE_TYPE and tenant=db
    (test.rhai:27-34)."""
    base = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after"))
    extra = [F.lit("_CHANGE_TYPE"), change_type(F.col("op"))]
    if tenant_from_db:
        extra += [F.lit("tenant"), F.col("db")]
    return F.map_concat(base, F.create_map(*extra))


def bigquery_json(df: DataFrame, tenant_from_db: bool = True) -> Column:
    return F.to_json(bigquery_fields(df, tenant_from_db))


def topic_column(template: str) -> Column:
    """Dynamic topic routing (reference src/main.rs:424-435): the Rhai
    `topic(db, table)` fn is string interpolation over db/table (test.rhai:
    46-48, README.md:81-83). `template` uses ${db} / ${table} placeholders,
    e.g. "projects/my-project-id/topics/all_pims.${table}"."""
    parts: list[Column] = []
    rest = template
    while rest:
        i_db = rest.find("${db}")
        i_tb = rest.find("${table}")
        candidates = [(i, k) for i, k in ((i_db, "db"), (i_tb, "table")) if i >= 0]
        if not candidates:
            parts.append(F.lit(rest))
            break
        i, key = min(candidates)
        if i > 0:
            parts.append(F.lit(rest[:i]))
        parts.append(F.col(key))
        rest = rest[i + len("${" + key + "}") :]
    return F.concat(*parts) if parts else F.lit("")


def with_topic(df: DataFrame, template: str) -> DataFrame:
    """Add the routing `topic` column. The Kafka sink natively routes per-row
    on this column; the parquet test sink partitions by it."""
    return df.withColumn("topic", topic_column(template))


_SCRIPT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def scripted_transform(
    df: DataFrame,
    fn: Callable[[str, str, str, dict | None, dict | None, int], dict],
) -> DataFrame:
    """General user-transform escape hatch mirroring the reference host call
    `transform(db, table, op, before, after, ts) -> map` serialized to JSON
    (src/main.rs:406-421). `fn` is arbitrary Python; executed Arrow-batched
    via mapInPandas (the slow path — prefer the declarative builders above,
    which Catalyst optimizes).

    Returns (db, table, value:string-JSON) rows.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"db": [], "table": [], "value": []}
            for row in pdf.itertuples(index=False):
                result = fn(row.db, row.table, row.op, row.before, row.after, row.ts)
                out["db"].append(row.db)
                out["table"].append(row.table)
                out["value"].append(json.dumps(result, default=str))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=_SCRIPT_OUT_SCHEMA)
