"""exact_quantiles (distributed-selection quantile) must be bit-identical to
Spark's exact ``percentile`` aggregate — including ties, tiny inputs, heavy
duplicate skew, and per-group brackets — while never buffering the column."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_rs_spark.operators.quantiles import exact_quantiles

PROBS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _expected(df, col, probs, group_cols=()):
    arr = "array(" + ", ".join(f"{p!r}D" for p in probs) + ")"
    agg = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({col}, {arr})").alias("q")
    )
    return {
        tuple(r[c] for c in group_cols): [float(v) for v in r["q"]]
        for r in agg.collect()
    }


def _check(df, col, probs, group_cols=(), accuracy=1000):
    got = exact_quantiles(
        df, col, probs, group_cols=tuple(group_cols), accuracy=accuracy
    )
    exp = _expected(df, col, probs, group_cols)
    assert got == exp, f"mismatch: {got} vs {exp}"


def test_matches_percentile_random(spark):
    rng = random.Random(7)
    rows = [(rng.uniform(-1e3, 1e3),) for _ in range(5000)]
    df = spark.createDataFrame(rows, ["v"])
    _check(df, "v", PROBS)


def test_matches_percentile_heavy_ties(spark):
    """One value holding 60% of the mass: the tie block collapses to a single
    histogram row, so the candidate set stays bounded no matter the skew."""
    rng = random.Random(11)
    rows = [(42.0,)] * 3000 + [(rng.uniform(0, 100),) for _ in range(2000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["v"])
    _check(df, "v", PROBS)


def test_matches_percentile_tiny_and_single(spark):
    df = spark.createDataFrame([(5.0,)], ["v"])
    _check(df, "v", [0.0, 0.5, 1.0])
    df4 = spark.createDataFrame([(1.0,), (1.0,), (2.0,), (9.0,)], ["v"])
    _check(df4, "v", PROBS)


def test_matches_percentile_grouped_with_nulls(spark):
    rng = random.Random(13)
    rows = []
    for g in ("a", "b", "c's"):  # quoted key exercises the VALUES escaping
        rows += [(g, rng.gauss(0, 10)) for _ in range(1500)]
        rows.append((g, None))
    df = spark.createDataFrame(rows, ["g", "v"])
    _check(df, "v", [0.25, 0.75], group_cols=("g",))


def test_matches_percentile_null_group_key(spark):
    """NULL is a legal GROUP BY key: the pass-B bracket join is null-safe
    (ADVICE r3), so a NULL-keyed group resolves through the selection path
    — asserted by results AND by the plan never computing `percentile`
    (the fallback's signature)."""
    rng = random.Random(29)
    rows = [(None, rng.uniform(0, 100)) for _ in range(800)]
    rows += [("a", rng.uniform(0, 100)) for _ in range(800)]
    rows += [(None, None), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    _check(df, "v", [0.1, 0.5, 0.9], group_cols=("g",))
    # mixed int group with nulls too (type alignment of the VALUES literals)
    rows2 = [(None if i % 3 == 0 else i % 2, float(i % 97)) for i in range(900)]
    df2 = spark.createDataFrame(rows2, "k int, v double")
    _check(df2, "v", PROBS, group_cols=("k",))


def test_coarse_sketch_still_exact(spark):
    """Accuracy only sizes the candidate window; correctness must not depend
    on it (the verify-and-fallback guard)."""
    rng = random.Random(17)
    rows = [(rng.uniform(0, 1),) for _ in range(4000)]
    df = spark.createDataFrame(rows, ["v"])
    _check(df, "v", [0.5], accuracy=50)


def test_empty_input(spark):
    df = spark.createDataFrame([], "v double")
    assert exact_quantiles(df, "v", [0.5]) == {}


def test_partitioning_invariance(spark):
    """The sketch brackets may shift with partition count (GK merge order);
    the returned quantiles must not — correctness never depends on the
    sketch (zone-histogram walk is exact)."""
    rng = random.Random(23)
    rows = [(rng.uniform(0, 1e6),) for _ in range(6000)]
    df = spark.createDataFrame(rows, ["v"])
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = exact_quantiles(df.repartition(32), "v", PROBS)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = exact_quantiles(df.repartition(3), "v", PROBS)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
