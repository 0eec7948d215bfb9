"""Randomized property test for the union+window as-of join (SURVEY §5(c)
style): for ANY scatter of left/right events — including time ties between
sides and within the right side — the operator must match the naive
per-left-row scan: latest right at-or-before, largest payload id on ties.

All random cases are batched into ONE DataFrame under a case_id key, so the
whole property check is a single Spark job per direction.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_rs_spark.operators.asof import asof_join_backward, asof_join_forward


def _cases(n_cases: int, seed: int):
    rng = random.Random(seed)
    left, right = [], []
    for c in range(n_cases):
        for k in range(rng.randint(1, 3)):
            for i in range(rng.randint(0, 5)):
                left.append((c, k, rng.randint(0, 20), c * 1000 + len(left)))
            for j in range(rng.randint(0, 5)):
                right.append((c, k, rng.randint(0, 20), c * 1000 + len(right)))
    return left, right


def _expected_backward(left, right):
    out = {}
    for c, k, lt, lid in left:
        best = None
        for rc, rk, rt, rid in right:
            if (rc, rk) == (c, k) and rt <= lt:
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
        out[lid] = best and best[1]
    return out


def _expected_forward(left, right):
    out = {}
    for c, k, lt, lid in left:
        best = None
        for rc, rk, rt, rid in right:
            if (rc, rk) == (c, k) and rt >= lt:
                cand = (-rt, -rid)  # earliest time; SMALLEST id on ties
                if best is None or cand > best:
                    best = cand
        out[lid] = best and -best[1]
    return out


def test_asof_backward_matches_naive_scan(spark):
    left, right = _cases(40, seed=7)
    ldf = spark.createDataFrame(left, "c long, k long, t long, lid long")
    rdf = spark.createDataFrame(
        [(c, k, t, rid) for c, k, t, rid in right],
        "c long, k long, rt long, rid long",
    ).select("c", "k", F.col("rt").alias("t"), "rid").select(
        "c", "k", F.col("t"), F.col("rid")
    )
    got = asof_join_backward(
        ldf,
        rdf.select("c", "k", "t", "rid"),
        on=["c", "k"],
        left_time="t",
        right_time="t",
        payload_cols=["rid"],
    )
    res = {r.lid: r.rid for r in got.collect()}
    assert res == _expected_backward(left, right)


def test_asof_forward_matches_naive_scan(spark):
    """Forward mirror: earliest right at-or-after; per the operator contract
    the SMALLEST payload wins among equal-time right rows (mirror-image of
    the backward join's largest-wins)."""
    left, right = _cases(40, seed=11)
    ldf = spark.createDataFrame(left, "c long, k long, t long, lid long")
    rdf = spark.createDataFrame(right, "c long, k long, t long, rid long")
    got = asof_join_forward(
        ldf,
        rdf,
        on=["c", "k"],
        left_time="t",
        right_time="t",
        payload_cols=["rid"],
    )
    res = {r.lid: r.rid for r in got.collect()}
    assert res == _expected_forward(left, right)


def test_top_paths_derived_rank_equals_row_number(spark):
    """Property (round 7): events_top_paths derives the within-session
    rank from one sorted pass (rn_user - running_max(is_new * rn_user))
    — randomized event streams must agree with the naive second
    row_number window it replaced."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(8):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([1, 60, 1799, 1800, 1801, 7200])
            rows.append((eid, user, t))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_ts = F.lag("ts").over(w)
    is_new = (
        F.when(lag_ts.isNull(), 1)
        .when(F.col("ts") - lag_ts > 1800, 1)
        .otherwise(0)
    )
    sess = (
        df.withColumn("is_new", is_new)
        .withColumn("rn_user", F.row_number().over(w))
        .withColumn("session_no", F.sum("is_new").over(wcum))
        .withColumn(
            "start_rn",
            F.max(F.when(F.col("is_new") == 1, F.col("rn_user"))).over(wcum),
        )
        .withColumn("rank_derived", F.col("rn_user") - F.col("start_rn") + 1)
        .withColumn(
            "rank_naive",
            F.row_number().over(
                Window.partitionBy("user_id", "session_no").orderBy(
                    "ts", "event_id"
                )
            ),
        )
    )
    bad = sess.filter(F.col("rank_derived") != F.col("rank_naive")).count()
    assert bad == 0


def test_events_top_paths_equals_naive_double_window(spark):
    """Round-7 review: the derived-rank property must be checked against
    the PRODUCTION function, not a private copy of its formula — run
    events_top_paths on the real fixture and compare to a naive
    reimplementation that uses the second (user_id, session_no)
    row_number window the optimized form replaced."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_rs_spark.functions.timeutil import epoch_us
    from cdc_rs_spark.plans.events import (
        PATH_GAP_MIN,
        PATH_PREFIX,
        PATH_TOP,
        events_top_paths,
    )
    from cdc_rs_spark.session import load
    from tests.conftest import SF_DIR

    got = [tuple(r) for r in events_top_paths(spark, SF_DIR).collect()]

    e = load(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    is_new = (
        F.when(lag_ts.isNull(), 1)
        .when(
            epoch_us("ts") - epoch_us(lag_ts)
            > PATH_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    )
    head = sess.withColumn("rn", rn).filter(F.col("rn") <= PATH_PREFIX)
    paths = head.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    want = [
        tuple(r)
        for r in paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP)
        .collect()
    ]
    assert got == want and len(got) > 0
