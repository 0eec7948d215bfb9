"""As-of (backward) join — a temporal operator the reference lacks entirely
(its only join-like logic is the snapshot/live stream merge,
reference src/main.rs:71-121) and Spark lacks natively; listed in the north
star as a custom-operator target.

Formulation: union both sides tagged by origin, one hash shuffle on the join
key, per-key time sort, then `last(payload, ignorenulls=True)` over an
unbounded-preceding row window. This is the sort-merge as-of:

  - NO join explosion: a naive `left join right ON key AND r.t <= l.t` builds
    |matches| intermediate rows per left row before ranking; the union form
    materializes |left| + |right| rows total.
  - ONE shuffle, by key only — at 100 TB both sides shuffle once on the key
    (same cost as any co-partitioned join), and the per-partition sort is
    what a sort-merge join would do anyway.
  - Hot keys: a key's whole timeline must sit in one partition (the window
    needs total time order per key); a pathologically hot key is bounded by
    per-key data volume, not by the join product.

Tie semantics: a right row at exactly t == left.t IS matched ("at or
before"); among right rows with equal time, the largest tiebreak value wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with the
    same `on` key and right_time <= left_time (null payload when none).

    `payload_cols` are right-side columns to carry over; their names must not
    collide with left columns (rename on the right before calling). The
    right's time column is typically included in payload_cols (renamed) so
    the match time is visible.
    """
    l_tagged = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(*on, F.col(right_time).alias("_t"), *payload_cols)
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal _t -> inclusive
    # "at-or-before"; among equal-time right rows last() takes the largest
    # payload ordering (deterministic given a unique payload column).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), *[F.col(c) for c in payload_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload_cols
        ],
    )
    out = matched.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.drop(c).withColumnRenamed(f"_m_{c}", c)
    return out.drop("_t", "_side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Mirror of asof_join_backward: attach the EARLIEST right row with
    right_time >= left_time (null payload when none) — 'next event after'
    semantics (forward as-of). Same cost shape: one key shuffle, per-key
    sort, no join explosion. At equal times the right row matches
    (inclusive); among equal-time right rows the smallest payload ordering
    wins (deterministic given a unique payload column)."""
    l_tagged = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(*on, F.col(right_time).alias("_t"), *payload_cols)
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_t").desc(),
            F.col("_side"),
            *[F.col(c).desc() for c in payload_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload_cols
        ],
    )
    out = matched.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.drop(c).withColumnRenamed(f"_m_{c}", c)
    return out.drop("_t", "_side")
