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
