"""Z-order (Morton) layout: multi-column data-skipping for 100 TB scans.

A table range-partitioned and sorted by ONE column prunes scans on that
column only; predicates on any other column read everything. Interleaving
the bits of several columns' bounded bucket indices into one Morton key and
laying the table out by THAT key gives every participating column locality:
each output file covers a small hyper-rectangle of the value space, so
min/max footer stats (zone maps) skip files for predicates on ANY of the
interleaved columns — the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, built here from plain column expressions + repartitionByRange.

Everything is deterministic integer math (bucketize = (v-min)*(2^bits-1)
div (max-min), then bit interleave), so the audit query's oracle reproduces
the exact z-values in SQL. The write path is ordinary Spark: range
partition on z (driver sees only the range sampler's statistics), sort
within partitions, parquet footers carry the per-file min/max that scans
prune on.

The reference has no storage layout surface at all; this is EXTENSION
inventory for the training-pipeline north star (BASELINE.json) — the scan
side of the 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(name: str, minv: int, maxv: int, bits: int = 8) -> Column:
    """Map the named integer column in [minv, maxv] to a bucket in
    [0, 2^bits): (v - min) * (2^bits - 1) div (max - min) — monotone,
    endpoints map to 0 and 2^bits - 1, exact bigint math (no float
    rounding), identical in Spark (`div`) and DuckDB (`//`) since the
    numerator is non-negative. SQL-string form because PySpark exposes no
    integer-division Column operator."""
    if maxv <= minv:
        return F.lit(0).cast("bigint")
    top = (1 << bits) - 1
    return F.expr(
        f"((CAST(`{name}` AS BIGINT) - {minv}) * {top}) div {maxv - minv}"
    )


def z_interleave(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton key of two bucket indices in [0, 2^bits): bit i of `a` lands
    at position 2i, bit i of `b` at 2i+1. A sum of 2*bits shift/mask terms
    — whole-stage codegen, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write `df` z-ordered by (col_a, col_b): compute per-column min/max
    (one aggregate-sized job), bucketize + interleave, range-partition on
    the Morton key into `n_files` and sort within partitions. Each output
    file then covers a compact z-range — a small rectangle of the
    (col_a, col_b) space — so parquet footer min/max on BOTH columns prune
    file reads. Cost: one extra min/max pass + the same single shuffle any
    layout-producing write pays."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a).cast("bigint"),
        F.max(col_a).cast("bigint"),
        F.min(col_b).cast("bigint"),
        F.max(col_b).cast("bigint"),
    ).first()
    if lo_a is None or lo_b is None:
        if df.isEmpty():  # empty input: nothing to order
            df.write.mode("overwrite").parquet(path)
            return
        raise ValueError(
            "zorder_write: an interleave column is entirely NULL — the "
            "layout would silently provide no pruning; clean or drop the "
            "column first"
        )
    z = z_interleave(
        bucket_expr(col_a, lo_a, hi_a, bits),
        bucket_expr(col_b, lo_b, hi_b, bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
