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


# ---------------------------------------------------------------------------
# Engine-portable HyperLogLog — exact integer registers, MAX-mergeable
# ---------------------------------------------------------------------------
#
# Where hll_sketch_rollup_custkeys uses Spark's JVM Datasketches (oracle-
# checkable only through error-envelope gates), this form mirrors the CMS
# discipline above: the hash is md5-derived (functions/hashing.fingerprint),
# so BOTH engines rebuild every register exactly and the estimate itself is
# value-pinned. Registers merge by MAX — the second monoid instance of
# streaming/additive.py after SUM — so the streaming sketch equals the batch
# sketch over the unioned input, always, by algebra.
#
# Geometry: m = 256 registers (p = 8 index bits), a 32-bit rank field above
# them (rho in [1, 33] — Flajolet's original 2^32 hash domain; the 60-bit
# md5 fingerprint has 8 + 32 = 40 bits consumed). Raw estimator in pure
# int64: est_raw = A div S with A = ALPHA_M2 * 2^33 (~4.0e17, no overflow)
# and S = sum_j 2^(33 - M_j) (<= 256 * 2^33 = 2^41) — the float-free
# rearrangement of alpha * m^2 / sum(2^-M_j). Small-range correction is
# classic linear counting, made integer-exact by pinning round(m * ln(m/V))
# for all 256 possible V values as a shared literal table (the lcg_coeffs
# discipline: one Python source of truth feeds both engines' literals).

HLL_M = 256
HLL_RHO_MAX = 33  # 32-bit rank field: rho = 33 - bit_length(w), w != 0
HLL_ALPHA_M2 = 47077  # round(0.7213 / (1 + 1.079/256) * 256^2)
HLL_A = HLL_ALPHA_M2 * (1 << HLL_RHO_MAX)
HLL_LC_THRESHOLD = 640  # 2.5 * m: below this, raw HLL is bias-dominated


def hll_lc_table() -> list[int]:
    """round(m * ln(m / V)) for V = 1..256 — the linear-counting estimate
    as a pure lookup (V = number of zero registers). Integer-exact in both
    engines because the ln never runs there: this table IS the contract."""
    import math

    return [
        round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
    ]


def hll_increments(df: DataFrame, key_expr: str, group_cols: list[str]) -> DataFrame:
    """One input pass -> the partial register table (group, idx, rho):
    one md5 fingerprint per row, then ONE map-side-combinable MAX
    aggregation. Output is <= |groups| x 256 rows regardless of input
    size — constant segment bytes per batch, like the CMS grid."""
    fp = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), F.expr(key_expr))), 1, 15),
        16,
        10,
    ).cast("bigint")
    d = df.select(*group_cols, fp.alias("_fp")).select(
        *group_cols,
        (F.col("_fp") % HLL_M).alias("idx"),
        F.expr(
            f"CASE WHEN (_fp div {HLL_M}) % 4294967296 = 0 THEN {HLL_RHO_MAX} "
            f"ELSE {HLL_RHO_MAX} - length(bin((_fp div {HLL_M}) % 4294967296)) "
            "END"
        )
        .cast("bigint")
        .alias("rho"),
    )
    return d.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))


def hll_report(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group report from a (merged) register table: n_set registers,
    the integer harmonic scale S, the raw estimate, and the final
    estimate with linear-counting small-range correction — every column
    exact int64, reproduced cell-for-cell by the oracle."""
    lc = hll_lc_table()
    lc_arr = F.array(*[F.lit(x).cast("bigint") for x in lc])
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_set"),
        (
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST({HLL_RHO_MAX} - rho AS INT))"
                )
            )
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << HLL_RHO_MAX)
        )
        .cast("bigint")
        .alias("s_scale"),
    )
    est_raw = F.expr(f"{HLL_A} div s_scale").cast("bigint")
    v_zero = (F.lit(HLL_M) - F.col("n_set")).cast("int")
    out = agg.select(
        *group_cols,
        "n_set",
        "s_scale",
        est_raw.alias("est_raw"),
        F.when(
            (est_raw <= HLL_LC_THRESHOLD) & (v_zero > 0),
            F.element_at(lc_arr, v_zero),
        )
        .otherwise(est_raw)
        .cast("bigint")
        .alias("est_n"),
    )
    return out
