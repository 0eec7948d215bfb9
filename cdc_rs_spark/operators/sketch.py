"""Engine-portable Count-Min Sketch — a (depth x width) integer grid
whose hash rows are plain modular polynomials, so BOTH engines reproduce
every cell exactly: where heavy_hitters_cms_lineitem uses Spark's JVM
CountMinSketch (oracle-checkable only through an exact-count anchor),
this form lets the DuckDB oracle rebuild the ENTIRE sketch and pin the
estimates themselves.

The grid is SUM-mergeable state (cell-wise integer addition is the CMS
merge), which makes it the second instance of streaming/additive.py's
log-structured store after the NB classifier counts: per-batch partial
grids append as segments, reads sum them, and the served sketch equals
the batch sketch over the unioned input — exactly, by algebra.

Sizing: depth 4, width 256 -> eps = e/width ~ 1.06% overcount of the
stream length per estimate at ~98% confidence (1 - e^-depth); the grid
is 1024 cells whatever the corpus size — partial-aggregated map-side,
constant bytes to the driver, the property that makes sketch maintenance
at ingest free at 100 TB."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_P = 1_000_000_007  # prime modulus of the hash polynomials
# one (multiplier, offset) pair per hash row — primes, pinned so the
# oracle's literals match
CMS_A = [999_983, 999_979, 999_961, 999_959]
CMS_B = [101, 211, 307, 401]


def cms_hash(key: Column, d: int) -> Column:
    """Row-d cell index: ((key + 1) * A_d + B_d) mod P mod WIDTH — pure
    bigint arithmetic, bit-identical in Spark and DuckDB (keys are
    non-negative, so both engines' % agree)."""
    return (
        (key.cast("bigint") + 1) * CMS_A[d] + CMS_B[d]
    ) % CMS_P % CMS_WIDTH


def cms_increments(df: DataFrame, key_col: str) -> DataFrame:
    """One input pass -> the partial grid (d, w, cnt): each row explodes
    to its CMS_DEPTH cells, then ONE map-side-combinable aggregation.
    Output is <= depth x width rows regardless of input size."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("d"),
                    cms_hash(F.col(key_col), d).alias("w"),
                )
                for d in range(CMS_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .select("cell.d", "cell.w")
        .groupBy("d", "w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(grid: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point estimates for `keys` against a (merged) grid: min over the
    key's depth cells — the CMS guarantee est >= true count, and
    est <= true + (e/width) * N with ~98% confidence. The probe side is
    |keys| x depth rows joined against the <= 1024-row broadcast grid."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        cms_hash(F.col(key_col), d).alias("w"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.d", "cell.w")
    return (
        probes.join(F.broadcast(grid), ["d", "w"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_cnt")
        )
    )
