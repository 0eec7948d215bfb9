"""The Change event envelope — the engine's unit of data.

Reference data model: `Change { op, db, table, row: (before, after), ts, pkey }`
(reference src/main.rs:55-63) with op in {Insert, Update, Delete, Backfill}
(src/main.rs:46-53). Backfill snapshot rows flow through the same stream as
live changes, with images (None, Some(row)) and ts=1 (src/main.rs:369-381).

Spark restatement: a fixed StructType whose before/after images are
map<string,string> in schema-agnostic mode (faithful to the reference's
dynamically-typed `rhai::Map` rows, src/main.rs:442-507). Values are encoded
to strings at the envelope boundary per the reference's wire-decode rules
(see functions/encode.py). A struct-typed variant is available for declared
schemas where Catalyst can prune columns.

Everything here is column expressions — no UDFs, no collect; the envelope
construction is whole-stage-codegen'd and scales linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_rs_spark.functions.encode import encode_value

OP_INSERT = "Insert"
OP_UPDATE = "Update"
OP_DELETE = "Delete"
OP_BACKFILL = "Backfill"

ROW_IMAGE_TYPE = T.MapType(T.StringType(), T.StringType())

# Fixed envelope schema (reference src/main.rs:55-63). `ts` is epoch seconds —
# the reference passes raw binlog-header seconds through a field the script
# names ts_ms (test.rhai:16,20); we keep seconds and name it `ts` internally.
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("before", ROW_IMAGE_TYPE, True),
        T.StructField("after", ROW_IMAGE_TYPE, True),
        T.StructField("ts", T.LongType(), False),
        T.StructField("pkey", T.StringType(), False),
    ]
)

CHANGE_COLUMNS = [f.name for f in CHANGE_SCHEMA.fields]

# Backfill rows carry hardcoded ts=1 in the reference (src/main.rs:375, @TODO).
BACKFILL_TS = 1


def row_image(df: DataFrame, columns: list[str] | None = None) -> Column:
    """Encode a relational row as the map<string,string> image the reference
    builds per-row in `row_to_map` (src/main.rs:442-507): column names from
    the source schema, values stringified per the wire-decode rules."""
    if columns is None:
        columns = df.columns
    dtypes = dict(df.dtypes)
    pairs: list[Column] = []
    for c in columns:
        pairs.append(F.lit(c))
        pairs.append(encode_value(F.col(c), dtypes[c]))
    return F.create_map(*pairs)


def snapshot_changes(
    df: DataFrame,
    db: str,
    table: str,
    pkey: str,
    selection: list[str] | None = None,
) -> DataFrame:
    """Wrap a snapshot (batch) DataFrame as a stream of Backfill changes.

    Mirrors the reference backfill source's emission (src/main.rs:369-381):
    op=Backfill, images (null, row), ts=1, pkey = primary-key COLUMN NAME.
    `selection` is the projection pushed into the snapshot read
    (src/main.rs:326,331; default '*') — expressed here as a .select so
    Catalyst prunes the parquet scan to exactly those columns.
    """
    if selection:
        df = df.select(*selection)
    return df.select(
        F.lit(OP_BACKFILL).alias("op"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.lit(None).cast(ROW_IMAGE_TYPE).alias("before"),
        row_image(df).alias("after"),
        F.lit(BACKFILL_TS).cast("long").alias("ts"),
        F.lit(pkey).alias("pkey"),
    )


def live_changes(
    df: DataFrame,
    db: str,
    table: str,
    pkey: str,
    op_col: str = "op",
    ts_col: str = "ts",
) -> DataFrame:
    """Build live CDC changes from a DataFrame carrying an `op` column
    ('Insert'|'Update'|'Delete') and a `ts` column (epoch seconds).

    Image rules per op (reference src/main.rs:286-292):
      Insert -> (null, row); Update -> (row, row); Delete -> (row, null).
    The binlog source leaves pkey '' (src/main.rs:276 @TODO); we take the
    pkey name explicitly because downstream reconciliation needs it.
    """
    data_cols = [c for c in df.columns if c not in (op_col, ts_col)]
    img = row_image(df, data_cols)
    op = F.col(op_col)
    return df.select(
        op.alias("op"),
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.when(op.isin(OP_UPDATE, OP_DELETE), img).alias("before"),
        F.when(op.isin(OP_INSERT, OP_UPDATE), img).alias("after"),
        F.col(ts_col).cast("long").alias("ts"),
        F.lit(pkey).alias("pkey"),
    )


def pkey_value(change_df: DataFrame) -> Column:
    """The primary-key VALUE of a change: looked up by the pkey column name in
    whichever image is present (reference compares `pkey`-named field values,
    src/main.rs:77-82). Delete changes only have a before image."""
    img = F.coalesce(F.col("after"), F.col("before"))
    return img[F.col("pkey")]


def typed_image(img: Column, schema: list[tuple[str, str]]) -> Column:
    """Declared-schema decode of a map image — SURVEY §7 hard part (c): the
    map<string,string> envelope is the fidelity default; when the consumer
    declares a schema, project it to a typed struct so Catalyst can prune
    columns and downstream aggregates run on native types instead of strings.
    Map lookup + cast per field, no JSON round-trip, whole-stage codegen.

    schema: [(column_name, spark_type_ddl)], e.g. [("o_orderkey", "bigint"),
    ("o_totalprice", "decimal(18,2)")]. Absent keys decode to NULL (schema
    drift tolerance: old rows simply lack new columns)."""
    return F.struct(
        *[img[name].cast(ddl).alias(name) for name, ddl in schema]
    )


def typed_changes(changes: DataFrame, schema: list[tuple[str, str]]) -> DataFrame:
    """Change stream with before/after decoded to typed structs per the
    declared schema. Keeps the envelope columns; images become structs —
    the performance path for known-schema pipelines."""
    return changes.select(
        "op", "db", "table",
        F.when(F.col("before").isNotNull(), typed_image(F.col("before"), schema))
        .alias("before"),
        F.when(F.col("after").isNotNull(), typed_image(F.col("after"), schema))
        .alias("after"),
        "ts", "pkey",
    )
