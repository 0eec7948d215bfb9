"""Distributed exact quantiles by multi-probe selection (no full-column sort).

Spark's exact ``percentile`` aggregate buffers EVERY value of the column in
each partial's OpenHashMap and merges them into ONE final reducer — at 100 TB
that is both the slowest plan available and an OOM (the buffer is the column).
The classic fix is the distributed selection algorithm: a mergeable rank
sketch brackets each target quantile with a GUARANTEED rank error, then one
codegen'd scan resolves the exact value inside the bracket.

  pass A (codegen agg): per-group COUNT(col) + percentile_approx brackets at
         q ± 2/accuracy — the Greenwald-Khanna sketch's rank error is at most
         n/accuracy, so the true (n-1)*q rank is inside [v_lo, v_hi] by
         construction, not probabilistically.
  pass B (codegen agg): one "zone histogram" over the same scan — rows whose
         value falls inside any bracket keep their exact value; every
         maximal gap BETWEEN brackets collapses to a single counted row
         (zone id = #bracket boundaries strictly below the value, monotone).
         Result size: O(groups * probs * n/accuracy) candidate values plus
         O(groups * probs) gap rows — driver-bounded, never the column.
  driver: cumulative-walk the per-group histogram to the exact ranks
         floor/ceil((n-1)*q) and interpolate with the same expression
         Spark's Percentile uses: (higher-pos)*v_lo + (pos-lower)*v_hi —
         bit-identical to ``F.expr("percentile(col, q)")``.

Correctness never depends on the sketch: after the walk the ranks are checked
against the bracket's [n_below, n_below + candidates) span, and any miss
falls back to the exact ``percentile`` aggregate for the affected group (the
sketch guarantee makes this unreachable; the guard makes it safe anyway).

Scaling the knob: candidate volume is ~4*probs*n/accuracy rows, so accuracy
should grow with n (1e3 at 1e6 rows, 1e6-1e7 at 1e12) — sketch memory is
O(accuracy) per partial, still trivially executor-sized.

Two implementation notes that each cost ~5 s when done the obvious way:
the per-group bracket table is rendered as a pure-JVM ``VALUES`` relation,
NOT ``spark.createDataFrame`` — a Python-RDD build side forces a Python
worker spin-up inside the broadcast job (measured 5.5 s vs 0.2 s); and the
zone id is a static sum of comparisons, not ``F.filter`` over the array —
higher-order functions are interpreted, outside whole-stage codegen.

Reference parity: the reference engine (cdc-rs, src/main.rs) has no
aggregation surface at all; this operator backs the EXTENSION quantile /
outlier / winsorization queries at the scale contract SURVEY §2 demands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_rs_spark.session import sql_literal

__all__ = ["exact_quantiles", "exact_rank_values"]


def _spark_percentile_interp(pos: float, v_lower: float, v_higher: float) -> float:
    """Replicates org.apache.spark.sql.catalyst.expressions.aggregate.
    Percentile.getPercentile's interpolation exactly."""
    lower = math.floor(pos)
    higher = math.ceil(pos)
    if higher == lower or v_higher == v_lower:
        return v_lower
    return (higher - pos) * v_lower + (pos - lower) * v_higher


def _walk(hist, n_target_ranks):
    """hist: list of (value_or_None, count) sorted in global value order
    (gap rows carry None). Returns {rank: value} for the requested ranks,
    or None for a rank that lands on a gap row (sketch-guarantee miss)."""
    out = {}
    want = sorted(n_target_ranks)
    cum = 0
    i = 0
    for value, cnt in hist:
        lo, hi = cum, cum + cnt
        while i < len(want) and want[i] < hi:
            out[want[i]] = value  # None when the rank fell in a gap
            i += 1
        cum = hi
        if i == len(want):
            break
    return out


# group-key cells render through the shared session.sql_literal — one
# escaping implementation for every VALUES relation in the engine


def _zone_histograms(
    df: DataFrame,
    col: str,
    hint_probs: list[float],
    gcols: list[str],
    accuracy: int,
    margin: float,
):
    """The two distributed passes shared by every selection entry point.

    Returns (meta, hists): meta = {group: (n, brackets)}, hists = {group:
    [(value_or_None, count)] in global value order} — gap rows carry None.
    """
    bracket_probs: list[float] = []
    for q in hint_probs:
        bracket_probs.append(max(0.0, q - margin))
        bracket_probs.append(min(1.0, q + margin))

    x = F.col(col).cast("double")
    base = df.filter(x.isNotNull()).select(*gcols, x.alias("_qv"))

    # pass A: per-group non-null count + bracket values (one codegen agg)
    sketch = (
        base.groupBy(*gcols)
        .agg(
            F.count("_qv").alias("_qn"),
            F.percentile_approx(
                "_qv",
                F.array(*[F.lit(p) for p in bracket_probs]),
                F.lit(int(accuracy)),
            ).alias("_qbr"),
        )
        .collect()
    )
    if not sketch:
        return {}, {}
    meta = {
        tuple(r[c] for c in gcols): (int(r["_qn"]), [float(v) for v in r["_qbr"]])
        for r in sketch
        if r["_qn"] and r["_qbr"] is not None  # empty ungrouped agg -> 1 null row
    }
    if not meta:
        return {}, {}

    # pass B: zone histogram. Boundaries vary per group -> broadcast-join a
    # pure-JVM VALUES bracket relation back onto the scan.
    if gcols:
        vals = ", ".join(
            "("
            + ", ".join(sql_literal(v) for v in k)
            + ", array("
            + ", ".join(f"{v!r}D" for v in brs)
            + "))"
            for k, (_, brs) in meta.items()
        )
        aliases = ", ".join(
            f"col{i + 1} AS {c}" for i, c in enumerate(gcols)
        )
        br_df = df.sparkSession.sql(
            f"SELECT {aliases}, col{len(gcols) + 1} AS _qbr FROM VALUES {vals}"
        )
        # NULL is a legal group key (SQL GROUP BY groups NULLs together):
        # join null-safely and align the VALUES literals' types with the
        # scan's, so null-keyed groups take this exact path instead of
        # falling through to the recompute safety net (ADVICE r3)
        bdt = dict(base.select(*gcols).dtypes)
        br_df = br_df.select(
            *[F.col(c).cast(bdt[c]).alias(c) for c in gcols], "_qbr"
        )
        cond = None
        for c in gcols:
            eq = base[c].eqNullSafe(br_df[c])
            cond = eq if cond is None else (cond & eq)
        joined = base.join(F.broadcast(br_df), cond)
        for c in gcols:
            joined = joined.drop(br_df[c])
        arr = F.col("_qbr")
    else:
        (_, brs0) = meta[()]
        arr = F.array(*[F.lit(v) for v in brs0])
        joined = base

    n_bounds = 2 * len(hint_probs)
    keep = F.lit(False)
    for i in range(len(hint_probs)):
        keep = keep | (
            (F.col("_qv") >= arr[2 * i]) & (F.col("_qv") <= arr[2 * i + 1])
        )
    # static comparison sum, monotone in _qv (codegen; HOF filter is not)
    zone = sum((arr[i] < F.col("_qv")).cast("int") for i in range(n_bounds))
    hist_rows = (
        joined.select(
            *gcols,
            zone.alias("_qz"),
            F.when(keep, F.col("_qv")).alias("_qval"),
        )
        .groupBy(*gcols, "_qz", "_qval")
        .agg(F.count("*").alias("_qc"))
        .collect()
    )

    by_group: dict[tuple, list] = {k: [] for k in meta}
    for r in hist_rows:
        k = tuple(r[c] for c in gcols)
        by_group[k].append((r["_qz"], r["_qval"], int(r["_qc"])))

    hists: dict[tuple, list] = {}
    for k in meta:
        # global value order: zone asc, gap rows (None) before candidates
        # in the same zone (a gap row's values are < the bracket's lo).
        rows = sorted(
            by_group[k],
            key=lambda t: (t[0], t[1] is not None, t[1] if t[1] is not None else 0.0),
        )
        hists[k] = [(v, c) for (_, v, c) in rows]
    return meta, hists


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    *,
    group_cols: tuple[str, ...] = (),
    accuracy: int = 1_000,
) -> dict[tuple, list[float]]:
    """Exact ``percentile(col, probs)`` per group, by distributed selection.

    Returns {group_values_tuple: [quantile per prob]} (key ``()`` when
    ungrouped); empty dict for an empty input. Values are bit-identical to
    Spark's exact ``percentile`` aggregate.
    """
    probs = [float(q) for q in probs]
    gcols = list(group_cols)
    meta, hists = _zone_histograms(
        df, col, probs, gcols, accuracy, margin=2.0 / accuracy
    )

    out: dict[tuple, list[float]] = {}
    fallback_groups: list[tuple] = []
    for k, (n, _) in meta.items():
        ranks = set()
        positions = []
        for q in probs:
            pos = (n - 1) * q
            positions.append(pos)
            ranks.add(math.floor(pos))
            ranks.add(math.ceil(pos))
        rank_val = _walk(hists[k], ranks)
        vals = []
        ok = True
        for pos in positions:
            v_l = rank_val.get(math.floor(pos))
            v_h = rank_val.get(math.ceil(pos))
            if v_l is None or v_h is None:
                ok = False
                break
            vals.append(_spark_percentile_interp(pos, v_l, v_h))
        if ok:
            out[k] = vals
        else:  # safety net: a sketch-margin miss falls back to exact agg
            fallback_groups.append(k)

    if fallback_groups:  # safety net only; not reached by the suite
        x = F.col(col).cast("double")
        agg = (
            df.filter(x.isNotNull())
            .select(*gcols, x.alias("_qv"))
            .groupBy(*gcols)
            .agg(
                F.expr(
                    f"percentile(_qv, array({', '.join(repr(q) for q in probs)}))"
                ).alias("_qex")
            )
        )
        for r in agg.collect():
            k = tuple(r[c] for c in gcols)
            if k in fallback_groups:
                out[k] = [float(v) for v in r["_qex"]]
    return out


def exact_rank_values(
    df: DataFrame,
    col: str,
    hint_probs: list[float],
    ranks_for_n,
    *,
    group_cols: tuple[str, ...] = (),
    accuracy: int = 1_000,
    max_tries: int = 3,
) -> dict[tuple, tuple[int, dict[int, float]]]:
    """Exact column values at data-dependent global ranks, per group.

    ``ranks_for_n(n) -> iterable of 0-based ranks`` is evaluated once the
    group's row count is known; ``hint_probs`` are the approximate fractional
    positions of those ranks (they only steer the brackets — e.g. NTILE(10)
    boundaries hint at 0.0, 0.1, ..., 1.0). Returns {group: (n, {rank:
    value})}. The value at a rank is identical under ANY total order whose
    leading sort key is ``col`` — ties permute rows, not values.

    If a requested rank lands outside every bracket (coarse hint), the two
    passes rerun with a 8x wider margin — correctness never depends on the
    hints; ``max_tries`` misses raise.
    """
    hint_probs = sorted({min(1.0, max(0.0, float(q))) for q in hint_probs})
    gcols = list(group_cols)
    margin = 2.0 / accuracy
    pending: dict[tuple, tuple[int, dict[int, float]]] = {}
    for attempt in range(max_tries):
        meta, hists = _zone_histograms(
            df, col, hint_probs, gcols, accuracy, margin=margin
        )
        misses = False
        for k, (n, _) in meta.items():
            ranks = sorted({int(r) for r in ranks_for_n(n)})
            if any(r < 0 or r >= n for r in ranks):
                raise ValueError(f"rank out of [0, {n}) for group {k}")
            rank_val = _walk(hists[k], ranks)
            if any(rank_val.get(r) is None for r in ranks):
                misses = True
                break
            pending[k] = (n, {r: rank_val[r] for r in ranks})
        if not misses:
            return pending
        margin *= 8.0  # pragma: no cover - hint-quality safety net
        pending = {}
    raise RuntimeError(  # pragma: no cover
        f"exact_rank_values: ranks uncovered after {max_tries} widenings"
    )
