"""Incremental materialized-view maintenance from the CDC change stream —
the capability a CDC engine ultimately feeds: keep an aggregate current by
applying per-change deltas instead of rescanning the base table.

Delta semantics (classic retraction/insertion IVM):
  - a change's BEFORE image (Update/Delete) retracts: (group(before), -1, -value(before))
  - a change's AFTER image (Insert/Update/Backfill) asserts: (group(after), +1, +value(after))
An Update whose group key migrates is handled for free — the retraction lands
in the old group, the assertion in the new one.

Scale design: the delta stream is a pure map-side projection of the change
stream; maintenance is ONE shuffle on the group key regardless of base-table
size — cost is O(changes), not O(table), which is the entire point at 100 TB.
Additive measures (COUNT, SUM, and means as sum/count pairs) maintain
exactly; MIN/MAX need the per-group compaction path (latest_per_key) instead.
Sums use decimal arithmetic so the maintained value is bit-identical to a
full recompute under any partitioning (SCALE.md §3's dsum discipline).

Reference parity: cdc-rs only transports changes (src/main.rs:162-188); the
downstream UPSERT table it feeds (test.rhai:27-33) is what this operator
maintains without the warehouse re-aggregating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def change_deltas(
    changes: DataFrame,
    group_of: "callable",
    value_of: "callable",
) -> DataFrame:
    """Project a Change envelope stream to (grp, dn, dv) delta rows.
    `group_of`/`value_of` map an image column (map<string,string>) to the
    grouping expression / additive measure (already cast to an exact type)."""

    def part(img: Column, sign: int) -> Column:
        return F.struct(
            group_of(img).alias("grp"),
            F.lit(sign).cast("bigint").alias("dn"),
            (value_of(img) * sign).alias("dv"),
        )

    before = changes.filter(F.col("before").isNotNull()).select(
        part(F.col("before"), -1).alias("d")
    )
    after = changes.filter(F.col("after").isNotNull()).select(
        part(F.col("after"), 1).alias("d")
    )
    return before.unionByName(after).select("d.grp", "d.dn", "d.dv")


def incremental_agg(
    changes: DataFrame,
    group_of: "callable",
    value_of: "callable",
) -> DataFrame:
    """Maintained (grp, n_rows, total) aggregate over the change stream.
    Groups whose rows were all deleted net to n_rows=0 and drop out, exactly
    as a recompute over the final table would."""
    deltas = change_deltas(changes, group_of, value_of)
    return (
        deltas.groupBy("grp")
        .agg(F.sum("dn").alias("n_rows"), F.sum("dv").alias("total"))
        .filter(F.col("n_rows") > 0)
    )


def _parse_bytes(s: str) -> int:
    """'10485760b' / '10MB' / '-1' -> bytes (Spark conf size syntax)."""
    s = str(s).strip().lower()
    for suf, mult in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suf):
            return int(float(s[: -len(suf)])) * mult
    return int(float(s))


def dim_fits_broadcast(dim: DataFrame) -> bool:
    """Decide the enrich-join strategy from DATA, not a manual flag: the
    dim's Catalyst size estimate (file-size-based for scans, propagated
    through projections) vs spark.sql.autoBroadcastJoinThreshold — the
    same statistic the planner itself consults. A dim that outgrows the
    threshold between deploys flips the view to the shuffled join without
    a code change; threshold <= 0 (broadcast disabled) always says no."""
    spark = dim.sparkSession
    try:
        thresh = _parse_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        )
    except (TypeError, ValueError):
        thresh = 10 * 1024 * 1024
    if thresh <= 0:
        return False
    try:
        est = int(dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable (e.g. Connect) -> historical default
        return True
    return est <= thresh


def join_deltas(
    changes: DataFrame,
    dim: DataFrame,
    key_of: "callable",
    dim_key: str,
    group_col: str,
    value_of: "callable",
    broadcast_dim: "bool | str" = "auto",
) -> DataFrame:
    """Enriched delta stream for join-view IVM: each change's retract/assert
    row joins the broadcast dimension, yielding (group, dn, dv) deltas in
    the VIEW's group space. This is the per-micro-batch unit of streaming
    maintenance — deltas from any batch partitioning sum to the same view,
    so the stream appends them to a delta log and the view is the running
    per-group sum (see tests/test_streaming.py). No net-positive filter
    here: a batch may legitimately net a group negative or to zero; the
    n_rows > 0 gate belongs at view READ time (incremental_join_agg)."""

    def part(img: Column, sign: int) -> Column:
        return F.struct(
            key_of(img).alias("_k"),
            F.lit(sign).cast("bigint").alias("dn"),
            (value_of(img) * sign).alias("dv"),
        )

    before = changes.filter(F.col("before").isNotNull()).select(
        part(F.col("before"), -1).alias("d")
    )
    after = changes.filter(F.col("after").isNotNull()).select(
        part(F.col("after"), 1).alias("d")
    )
    deltas = before.unionByName(after).select("d._k", "d.dn", "d.dv")
    # "auto" (default) sizes the dim against the broadcast threshold via
    # Catalyst stats (dim_fits_broadcast); False forces the shuffled
    # equi-join (same algebra — pre-bucket the dim to shuffle only the
    # delta side), True forces broadcast — see incremental_join_agg's
    # scale contract
    if broadcast_dim == "auto":
        broadcast_dim = dim_fits_broadcast(dim)
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    enriched = deltas.join(dim_side, deltas["_k"] == dim[dim_key], "inner")
    return enriched.groupBy(group_col).agg(
        F.sum("dn").alias("n_rows"), F.sum("dv").alias("total")
    )


def incremental_join_agg(
    changes: DataFrame,
    dim: DataFrame,
    key_of: "callable",
    dim_key: str,
    group_col: str,
    value_of: "callable",
    broadcast_dim: "bool | str" = "auto",
) -> DataFrame:
    """Maintain an aggregate over fact JOIN dim purely from FACT-side change
    deltas: deltaV = deltaFact JOIN dim, aggregated with retract/assert
    signs — the enriched-materialized-view analog of incremental_agg.

    A broadcast dim keeps maintenance at ONE shuffle on the final group key
    with cost O(changes) regardless of fact-table size. CAVEAT (scale
    contract): "dimension" here means *fits the broadcast threshold*
    (spark.sql.autoBroadcastJoinThreshold; executors and driver must hold a
    full copy). TPC-H customer GROWS with scale factor — at the 100 TB
    regime a customer-sized dim would OOM the broadcast. The default
    broadcast_dim="auto" therefore derives the strategy from the dim's
    Catalyst size estimate vs the threshold (dim_fits_broadcast) — a dim
    that outgrows the threshold flips to the shuffled equi-join on the dim
    key WITHOUT a code change; both paths are pinned to identical results
    in tests/test_pipeline.py. Pass True/False to force a side (e.g. False
    plus a pre-bucketed dim — operators/skew.py bucket_table — so only the
    delta side shuffles). Maintenance cost in the shuffled form is
    O(changes) + one delta-sized shuffle, still never O(fact).

    A dim-side change requires the complementary fact JOIN deltaDim pass
    (same algebra, swapped roles); with CDC feeds on both sides run both
    passes and union the deltas. Groups netting to zero rows drop out, as a
    recompute would."""
    return (
        join_deltas(
            changes, dim, key_of, dim_key, group_col, value_of,
            broadcast_dim=broadcast_dim,
        )
        .filter(F.col("n_rows") > 0)
    )
