"""Engine-portable CMS (operators/sketch.py) + its additive-store
streaming form: merge exactness, the one-sided estimate guarantee, and
the eps bound."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_rs_spark.operators.sketch import (
    CMS_WIDTH,
    cms_estimate,
    cms_increments,
)
from cdc_rs_spark.streaming.additive import (
    compact_additive_store,
    fold_segment,
    init_additive_store,
    read_merged,
)


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k bigint")


def test_incremental_grid_equals_batch_grid(spark, tmp_path):
    """Cell-wise SUM is the CMS merge: two folds (split across a
    compaction) serve the exact grid of the unioned input."""
    root = str(tmp_path / "cms")
    init_additive_store(spark, root, {"d": "int", "w": "bigint"}, ["cnt"])
    part1 = [1, 2, 2, 3, 1000003]  # 1000003 stresses the modular hash
    part2 = [2, 3, 3, 7, 7, 7]
    fold_segment(cms_increments(_keys(spark, part1), "k"), root, batch_id=0)
    compact_additive_store(spark, root)
    fold_segment(cms_increments(_keys(spark, part2), "k"), root, batch_id=1)
    merged = {
        (r["d"], r["w"]): r["cnt"]
        for r in read_merged(spark, root).collect()
    }
    batch = {
        (r["d"], r["w"]): r["cnt"]
        for r in cms_increments(_keys(spark, part1 + part2), "k").collect()
    }
    assert merged == batch
    # replay of a committed batch: ledger-skipped, grid unchanged
    st = fold_segment(
        cms_increments(_keys(spark, part2), "k"), root, batch_id=1
    )
    assert st["skipped_duplicate"] is True
    assert {
        (r["d"], r["w"]): r["cnt"]
        for r in read_merged(spark, root).collect()
    } == batch


def test_estimates_respect_cms_contract(spark):
    """For EVERY ingested key: exact <= est <= exact + ceil(e/width * N)
    (the deterministic worst case over the pinned hash rows is well
    inside the probabilistic bound at this load factor); a never-seen
    key can only collide upward from 0."""
    vals = [i % 37 for i in range(1110)] + [5] * 50  # skewed stream
    df = _keys(spark, vals)
    grid = cms_increments(df, "k")
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    ests = {
        r["k"]: r["est_cnt"]
        for r in cms_estimate(grid, _keys(spark, sorted(exact)), "k").collect()
    }
    bound = math.ceil(math.e / CMS_WIDTH * len(vals))
    for k, n in exact.items():
        assert n <= ests[k] <= n + bound, (k, n, ests[k], bound)
    unseen = cms_estimate(grid, _keys(spark, [999_999_937]), "k").collect()
    assert unseen[0]["est_cnt"] >= 0
