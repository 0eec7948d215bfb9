"""Deterministic synthetic live-change feed derived from the `orders` fixture.

The reference consumes a live binlog stream; this environment has no MySQL, so
correctness queries derive a deterministic live feed from `orders` with a
fixed contract (mirrored verbatim in the DuckDB oracle SQL):

  - o_orderkey % 10 == 3  ->  Update at ts=100: o_totalprice += 1000.0
                              (before = original row, after = updated row)
  - o_orderkey % 10 == 7  ->  Delete at ts=100 (before = original row)
  - o_orderkey % 10 == 1  ->  Insert at ts=200 of a NEW key o_orderkey + 10^7
                              (no backfill counterpart exists for these)

Arithmetic is chosen to be exact in binary doubles (+1000.0, no rounding) so
Spark and DuckDB stringify identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_rs_spark.envelope import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ROW_IMAGE_TYPE,
    row_image,
)
from cdc_rs_spark.session import load

LIVE_TS_UPDATE = 100
LIVE_TS_INSERT = 200
NEW_KEY_OFFSET = 10_000_000


def live_orders_changes(
    spark: SparkSession, sf_dir: str, db: str = "testdb"
) -> DataFrame:
    """Build the synthetic live change stream over `orders` per the module
    contract. Pure column expressions; three branch scans of one cached
    parquet read (Catalyst collapses shared scan via exchange reuse)."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    data_cols = orders.columns

    def change(src: DataFrame, op: str, ts: int, with_before: bool, with_after: bool):
        """src carries the data columns (before image) plus, for updates, the
        updated columns prefixed __new_."""
        before = row_image(src, data_cols) if with_before else F.lit(None).cast(
            ROW_IMAGE_TYPE
        )
        if with_after:
            after_cols = [
                c if f"__new_{c}" not in src.columns else f"__new_{c}"
                for c in data_cols
            ]
            dtypes = dict(src.dtypes)
            from cdc_rs_spark.functions.encode import encode_value

            pairs = []
            for name, c in zip(data_cols, after_cols):
                pairs.append(F.lit(name))
                pairs.append(encode_value(F.col(c), dtypes[c]))
            after = F.create_map(*pairs)
        else:
            after = F.lit(None).cast(ROW_IMAGE_TYPE)
        return src.select(
            F.lit(op).alias("op"),
            F.lit(db).alias("db"),
            F.lit("orders").alias("table"),
            before.alias("before"),
            after.alias("after"),
            F.lit(ts).cast("long").alias("ts"),
            F.lit("o_orderkey").alias("pkey"),
        )

    updates = change(
        orders.filter(k % 10 == 3).withColumn(
            "__new_o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        ),
        OP_UPDATE, LIVE_TS_UPDATE, with_before=True, with_after=True,
    )
    deletes = change(
        orders.filter(k % 10 == 7), OP_DELETE, LIVE_TS_UPDATE,
        with_before=True, with_after=False,
    )
    inserts = change(
        orders.filter(k % 10 == 1).withColumn(
            "o_orderkey", k + F.lit(NEW_KEY_OFFSET)
        ),
        OP_INSERT, LIVE_TS_INSERT, with_before=False, with_after=True,
    )
    return updates.unionByName(deletes).unionByName(inserts)


# The same contract as ANSI SQL fragments for the DuckDB oracle. The oracle
# operates on scalar projections (okey, op, ts, total) rather than the map
# envelope — queries that need hash-comparability project the same scalars.
ORACLE_LIVE_CHANGES = """
    SELECT 'Update' AS op, o_orderkey AS okey, 100::BIGINT AS ts,
           o_totalprice + 1000.0 AS total
    FROM orders WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT 'Delete', o_orderkey, 100::BIGINT, NULL
    FROM orders WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT 'Insert', o_orderkey + 10000000, 200::BIGINT, o_totalprice
    FROM orders WHERE o_orderkey % 10 = 1
"""
