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


def test_hll_rho_matches_python_reference(spark):
    """Register derivation (idx, rho) agrees with an independent Python
    recomputation of the same md5 fingerprint scheme for 200 keys —
    including the 33 - bit_length(w) rank rule and the w = 0 edge."""
    import hashlib

    from cdc_rs_spark.operators.sketch import (
        HLL_M,
        HLL_RHO_MAX,
        hll_increments,
    )

    keys = [str(i) for i in range(200)]

    def ref(k):
        fp = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        idx = fp % HLL_M
        w = (fp // HLL_M) % (1 << 32)
        rho = HLL_RHO_MAX if w == 0 else HLL_RHO_MAX - w.bit_length()
        return idx, rho

    expect = {}
    for k in keys:
        idx, rho = ref(k)
        expect[idx] = max(expect.get(idx, 0), rho)

    df = spark.createDataFrame([(k,) for k in keys], "k string").withColumn(
        "g", F.lit("g")
    )
    got = {
        r["idx"]: r["rho"]
        for r in hll_increments(df, "k", ["g"]).collect()
    }
    assert got == expect


def test_hll_incremental_registers_equal_batch(spark, tmp_path):
    """Register-wise MAX is the HLL merge: two folds into a merge='max'
    store (split across a compaction, with a replayed batch skipped)
    serve exactly the batch registers of the unioned input."""
    from cdc_rs_spark.operators.sketch import hll_increments

    def docs(vals):
        return spark.createDataFrame(
            [(str(v),) for v in vals], "k string"
        ).withColumn("g", F.lit("g"))

    root = str(tmp_path / "hll")
    init_additive_store(
        spark, root, {"g": "string", "idx": "bigint"}, ["rho"], merge="max"
    )
    part1 = list(range(50))
    part2 = list(range(30, 90))  # overlap: MAX idempotence does the dedup
    fold_segment(hll_increments(docs(part1), "k", ["g"]), root, batch_id=0)
    compact_additive_store(spark, root)
    fold_segment(hll_increments(docs(part2), "k", ["g"]), root, batch_id=1)
    st = fold_segment(
        hll_increments(docs(part2), "k", ["g"]), root, batch_id=1
    )
    assert st["skipped_duplicate"] is True
    merged = {
        (r["g"], r["idx"]): r["rho"]
        for r in read_merged(spark, root).collect()
    }
    batch = {
        (r["g"], r["idx"]): r["rho"]
        for r in hll_increments(docs(part1 + part2), "k", ["g"]).collect()
    }
    assert merged == batch


def test_hll_linear_counting_table_is_the_contract(spark):
    """The pinned lc table really is round(m * ln(m/V)) at the edges, and
    the report's regime switch engages it: a tiny group (n << 2.5m) must
    report est_n = lc[V], not the bias-dominated raw estimate."""
    import math

    from cdc_rs_spark.operators.sketch import (
        HLL_M,
        hll_increments,
        hll_lc_table,
        hll_report,
    )

    lc = hll_lc_table()
    assert lc[0] == round(HLL_M * math.log(HLL_M))  # V = 1
    assert lc[HLL_M - 1] == 0  # V = m: empty sketch estimates 0
    df = spark.createDataFrame(
        [(str(i),) for i in range(8)], "k string"
    ).withColumn("g", F.lit("g"))
    row = hll_report(
        hll_increments(df, "k", ["g"]), ["g"]
    ).collect()[0]
    v_zero = HLL_M - row["n_set"]
    assert row["est_n"] == lc[v_zero - 1]
    assert row["est_n"] != row["est_raw"]
    assert abs(row["est_n"] - 8) <= 2
