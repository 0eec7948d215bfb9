"""Distributed total-order primitives: two-pass range-bucketed rank/cumsum.

An unpartitioned ``Window.orderBy(...)`` is the one plan shape that cannot
survive scale-up: Spark plans it as ``Exchange SinglePartition`` + WindowExec
with no partition spec, i.e. EVERY row moves to ONE task. These helpers
replace it with the classic two-pass distributed prefix algorithm — the same
decomposition Spark's own global ORDER BY uses (RangePartitioner statistics +
per-partition sort), extended with an exclusive per-bucket offset so exact
global ranks / running sums come out of a *partitioned* window:

  pass 0 (tiny):     approx quantiles of the order key -> B-1 cut points
  pass 1 (parallel): bucket every row by cut point (monotone in the key);
                     per-bucket counts/sums -> B rows to the driver ->
                     exclusive prefix offsets
  pass 2 (parallel): Window.partitionBy(bucket).orderBy(full order) local
                     rank/cumsum + the bucket's offset (a broadcast literal)

Correctness never depends on the sampled cuts — they only balance work.
Bucketing is monotone in the order key and key-ties always share a bucket,
so ``offset + local`` equals the global value for ANY cut choice; the
driver-side traffic is B cut points + B partial aggregates (B ≈ shuffle
partition count), the same statistics volume a global sort ships anyway.

Reference parity note: the reference engine (cdc-rs) never materializes a
global order at all — these entries exist for the training-pipeline
extension surface (packing, curricula, equi-depth bins), where the output
contract is pinned by the registry oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_BUCKET = "_rbkt"


def _cut_points(df: DataFrame, key: str, n_buckets: int) -> list[float]:
    """Approximate (1/B, 2/B, ...) quantiles of the order key, deduplicated.

    Uses the percentile_approx AGGREGATE (whole-stage codegen, one job)
    rather than DataFrame.approxQuantile (an RDD-path action measured ~5x
    slower at bench scale). The sketch is deterministic on the same input,
    but nothing here relies on that: cuts steer load balance only, never
    values."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.percentile_approx(
            F.col(key).cast("double"), F.array(*[F.lit(p) for p in probs])
        ).alias("c")
    ).first()
    cuts = row["c"] or []
    return sorted({float(c) for c in cuts if c is not None})


def _bucket_expr(key, cuts: list[float], descending: bool):
    """Monotone bucket index: #cuts strictly below (asc) / above (desc) the
    key. Strict comparison sends ALL ties of one key value to one bucket,
    which is what makes offset + local rank exact."""
    if not cuts:
        return F.lit(0)
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    if descending:
        return F.size(F.filter(arr, lambda c: c > key))
    return F.size(F.filter(arr, lambda c: c < key))


def _offset_lookup(offsets: dict[int, int]):
    """bucket -> exclusive-prefix offset, as a broadcast map literal."""
    pairs = []
    for b, off in offsets.items():
        pairs.append(F.lit(b))
        pairs.append(F.lit(int(off)).cast("bigint"))
    return F.create_map(*pairs)[F.col(_BUCKET)]


def _bucketed(df: DataFrame, key: str, descending: bool, n_buckets: int):
    cuts = _cut_points(df, key, n_buckets)
    return df.withColumn(_BUCKET, _bucket_expr(F.col(key), cuts, descending))


def global_rank(
    df: DataFrame,
    key: str,
    order_cols: list,
    *,
    descending: bool = False,
    n_buckets: int = 32,
    out_col: str = "_rk",
) -> tuple[DataFrame, int]:
    """Exact 0-based global rank under ``order_cols`` (whose leading column
    must be the numeric ``key``) without a single-partition window.

    Returns (df + bigint ``out_col``, total row count). The input should be
    persisted by the caller (see ``ranked_result``) — passes 1 and 2 both
    scan it."""
    b = _bucketed(df, key, descending, n_buckets)
    counts = {r[_BUCKET]: r["n"] for r in b.groupBy(_BUCKET).agg(F.count("*").alias("n")).collect()}
    total, offsets = 0, {}
    for bkt in sorted(counts):
        offsets[bkt] = total
        total += counts[bkt]
    if not offsets:
        offsets = {0: 0}
    w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    out = b.withColumn(
        out_col,
        (F.row_number().over(w) - 1).cast("bigint") + _offset_lookup(offsets),
    ).drop(_BUCKET)
    return out, total


def global_cumsum(
    df: DataFrame,
    key: str,
    order_cols: list,
    value: str,
    *,
    descending: bool = False,
    n_buckets: int = 32,
    out_col: str = "_cum",
) -> DataFrame:
    """Exact global running SUM(value) under ``order_cols`` (leading column =
    numeric ``key``) without a single-partition window: per-bucket local
    cumsum + the exclusive prefix of per-bucket totals."""
    b = _bucketed(df, key, descending, n_buckets)
    sums = {
        r[_BUCKET]: r["s"]
        for r in b.groupBy(_BUCKET).agg(F.sum(value).alias("s")).collect()
    }
    running, offsets = 0, {}
    for bkt in sorted(sums):
        offsets[bkt] = running
        running += int(sums[bkt] or 0)
    if not offsets:
        offsets = {0: 0}
    w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return b.withColumn(
        out_col, F.sum(value).over(w).cast("bigint") + _offset_lookup(offsets)
    ).drop(_BUCKET)


def global_rank_cumsum(
    df: DataFrame,
    key: str,
    order_cols: list,
    value: str,
    *,
    descending: bool = False,
    n_buckets: int = 32,
    rank_col: str = "_rk",
    cum_col: str = "_cum",
) -> tuple[DataFrame, int, int]:
    """Exact 0-based global rank AND running SUM(value) under ``order_cols``
    in ONE bucketing pass: a single per-bucket (count, sum) aggregate feeds
    both exclusive prefixes, and one partitioned window computes both
    row_number and cumsum. Returns (df + rank_col + cum_col, total rows,
    total sum) — the totals come free from the bucket statistics, so
    prefix-share queries (Pareto curves) need no extra global aggregate."""
    b = _bucketed(df, key, descending, n_buckets)
    stats = {
        r[_BUCKET]: (r["n"], int(r["s"] or 0))
        for r in b.groupBy(_BUCKET)
        .agg(F.count("*").alias("n"), F.sum(value).alias("s"))
        .collect()
    }
    total_n, total_s = 0, 0
    n_offsets, s_offsets = {}, {}
    for bkt in sorted(stats):
        n_offsets[bkt], s_offsets[bkt] = total_n, total_s
        total_n += stats[bkt][0]
        total_s += stats[bkt][1]
    if not n_offsets:
        n_offsets, s_offsets = {0: 0}, {0: 0}
    w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    out = (
        b.withColumn(
            rank_col,
            (F.row_number().over(w) - 1).cast("bigint")
            + _offset_lookup(n_offsets),
        )
        .withColumn(
            cum_col,
            F.sum(value).over(wc).cast("bigint") + _offset_lookup(s_offsets),
        )
        .drop(_BUCKET)
    )
    return out, total_n, total_s


def ranked_result(
    df: DataFrame,
    build: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Run a two-pass ranked/cumsum computation over a persisted input and
    return the (small, aggregate-sized) result with its lineage truncated.

    ``df`` is cached so pass 1 (bucket statistics) and pass 2 (partitioned
    window) share one materialization; ``build`` receives the cached frame
    and must produce the final aggregate. The result is eagerly
    localCheckpoint-ed — it is bins/deciles/batches-sized by construction —
    so the cache can be released before returning instead of leaking across
    a 150-query suite run."""
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return build(cached).localCheckpoint(eager=True)
    finally:
        cached.unpersist(blocking=False)


def ntile_from_rank(rk, n_total: int, k: int):
    """NTILE(k) reconstructed from an exact 0-based global rank: the first
    ``n_total % k`` tiles carry ``n_total // k + 1`` rows, the rest one
    fewer — SQL NTILE's exact distribution, as pure column arithmetic."""
    q, r = divmod(int(n_total), k)
    boundary = (q + 1) * r
    return (
        F.when(rk < boundary, F.floor(rk / (q + 1)))
        .otherwise(r + F.floor((rk - boundary) / max(q, 1)))
        .cast("int")
        + 1
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    order_cols: list,
    *,
    descending: bool = False,
    n_buckets: int = 32,
    out_col: str = "_rk",
    count_col: str | None = None,
) -> DataFrame:
    """Exact 0-based PER-GROUP rank under ``order_cols`` (leading column =
    the numeric ``key``) without a stratum-sized single-task sort — the
    grouped form of :func:`global_rank` (VERDICT r4 task 2).

    ``Window.partitionBy(stratum)`` over a raw corpus is the skewed cousin
    of the single-partition window: a 5-value ``lang`` column with 'en' at
    41 % funnels ~half the corpus through ONE task. Here every stratum is
    additionally split by the range bucket, the per-(group, bucket) counts
    are aggregated (|groups| x B rows — stays distributed, broadcast-joined
    back, never collected), and the window partitions on
    ``(group, bucket)`` so no task sorts more than ~|stratum|/B rows.

    ``count_col``, if given, also emits the exact group size (free from the
    same statistics) — callers derive percent_rank as rk/(n-1).

    Intended for stratified ops whose group cardinality is dimension-like
    (languages, labels, sources): the broadcast side is |groups| x B rows.
    A group column with data-sized cardinality means tiny strata — use the
    plain per-group window there."""
    b = _bucketed(df, key, descending, n_buckets)
    stats = b.groupBy(*group_cols, _BUCKET).agg(F.count("*").alias("_bn"))
    wo = Window.partitionBy(*group_cols).orderBy(_BUCKET)
    wg = Window.partitionBy(*group_cols)
    offs = stats.select(
        *group_cols,
        _BUCKET,
        (F.sum("_bn").over(wo) - F.col("_bn")).alias("_off"),
        F.sum("_bn").over(wg).alias("_gn"),
    )
    # eqNullSafe on the group keys: a NULL stratum is still a stratum
    cond = F.col(f"l.{_BUCKET}") == F.col(f"r.{_BUCKET}")
    for g in group_cols:
        cond = cond & F.col(f"l.{g}").eqNullSafe(F.col(f"r.{g}"))
    joined = b.alias("l").join(F.broadcast(offs.alias("r")), cond).select(
        "l.*", "r._off", "r._gn"
    )
    w = Window.partitionBy(
        *[F.col(f"l.{g}") for g in group_cols], F.col(f"l.{_BUCKET}")
    ).orderBy(*order_cols)
    out = joined.withColumn(
        out_col, (F.row_number().over(w) - 1).cast("bigint") + F.col("_off")
    )
    if count_col:
        out = out.withColumnRenamed("_gn", count_col)
    else:
        out = out.drop("_gn")
    return out.drop(_BUCKET, "_off")
