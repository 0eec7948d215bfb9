"""Skew and co-location utilities for large joins.

Two techniques the 100 TB plan leans on, made explicit:

- `bucket_table` / bucketed joins: persist both join sides bucketed and
  sorted by the join key — a later equi-join on that key needs NO exchange
  on either side (asserted by test_scale_plans.py against the physical
  plan). At warehouse scale this is the amortize-once answer for tables
  joined repeatedly on the same key; the shuffle happens once at write time.

- `salted_join`: pre-AQE skew mitigation, kept as an explicit operator
  because (a) AQE skew-join only splits *sort-merge* partitions, it cannot
  help a hot build-side key in every engine/version combination, and (b)
  the technique is part of the operator inventory. The big side's hot keys
  are split across `salt` sub-keys; the small side is replicated `salt`
  times; the join key becomes (key, salt). Join RESULT is identical to the
  unsalted join — only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_table(
    df: DataFrame, name: str, key: str, buckets: int = 8, mode: str = "overwrite"
) -> None:
    """Persist df as a catalog table bucketed+sorted by `key`. Joins between
    tables bucketed the same way on the same key skip the shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's keys salted across `salt` sub-keys and
    the small side replicated `salt` times.

    The salt is derived deterministically from the big side's whole row
    (xxhash64 over all columns) so re-runs produce identical partitioning;
    any per-row value works — the salt only has to spread rows of one hot
    key, not be meaningful.

    Only inner/left(_outer)/left_semi/left_anti joins are supported: the
    result is then provably identical to the unsalted join, because every
    big-side row meets the full small side for its key. For right/full outer
    the replicated small side would emit unmatched rows once PER SALT
    REPLICA — a wrong result — so those modes raise instead of corrupting
    silently (flip the sides and use a left join)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows would be duplicated per salt replica. Use inner/left forms."
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_replicated, [key, "_salt"], how)
    return out.drop("_salt")
