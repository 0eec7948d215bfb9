"""Tests for the backfill job queue lifecycle (reference src/main.rs:305-387:
todo -> snapshot -> done) and the topic-routed sinks (src/main.rs:174-187)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_rs_spark.sources.backfill import (
    STATUS_DONE,
    BackfillJob,
    BackfillQueue,
    run_todo_jobs,
    snapshot_table,
)
from cdc_rs_spark.sources.sinks import publish_foreach_batch, write_topics_parquet
from tests.conftest import SF_DIR


def test_backfill_queue_lifecycle(spark, tmp_path):
    q = BackfillQueue(str(tmp_path / "queue.json"))
    q.enqueue(
        [
            BackfillJob(db="testdb", relation="nation", pkey="n_nationkey"),
            BackfillJob(db="testdb", relation="region", pkey="r_regionkey"),
        ]
    )
    assert len(q.todo()) == 2
    out = run_todo_jobs(spark, q, SF_DIR)
    rows = out.collect()
    # every row is a Backfill change with ts=1 (src/main.rs:375) and
    # (before, after) = (null, row) (src/main.rs:376-379)
    assert all(r["op"] == "Backfill" and r["ts"] == 1 and r["before"] is None for r in rows)
    tables = {r["table"] for r in rows}
    assert tables == {"nation", "region"}
    # queue flipped to done; re-poll finds no work
    assert all(j.status == STATUS_DONE for j in q.all())
    assert run_todo_jobs(spark, q, SF_DIR) is None


def test_backfill_selection_pushdown(spark):
    """selection='col,col' becomes a projection: the after-image map carries
    only the selected columns (reference interpolates {selection} into the
    page SELECT, src/main.rs:326,331)."""
    job = BackfillJob(
        db="testdb", relation="nation", pkey="n_nationkey",
        selection="n_nationkey,n_name",
    )
    rows = snapshot_table(spark, SF_DIR, job).collect()
    assert set(rows[0]["after"].keys()) == {"n_nationkey", "n_name"}


def test_topic_parquet_sink_fanout(spark, tmp_path):
    df = spark.createDataFrame(
        [("t.orders", "m1"), ("t.orders", "m2"), ("t.nation", "m3")],
        "topic string, value string",
    )
    out = str(tmp_path / "topics")
    write_topics_parquet(df, out)
    dirs = {d for d in os.listdir(out) if d.startswith("topic=")}
    assert dirs == {"topic=t.orders", "topic=t.nation"}
    back = spark.read.parquet(out)
    assert back.count() == 3


def test_publish_foreach_batch_groups_per_topic(spark, tmp_path):
    """Publish happens EXECUTOR-side (no driver collect), one call per
    (batch, topic). Calls are captured through the shared local filesystem
    because executor workers are separate processes — which is also what the
    pid assertion proves."""
    import json
    import os
    import uuid

    calls_dir = tmp_path / "calls"
    calls_dir.mkdir()
    driver_pid = os.getpid()
    d = str(calls_dir)

    def fake_publish(topic: str, values: list[str]) -> None:
        rec = {"topic": topic, "values": values, "pid": os.getpid()}
        path = os.path.join(d, f"{topic}-{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(rec, f)

    df = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "3")], "topic string, value string"
    )
    publish_foreach_batch(fake_publish)(df, 0)
    recs = [json.loads(p.read_text()) for p in calls_dir.iterdir()]
    by_topic = {r["topic"]: r for r in recs}
    # exactly one publish call per (batch, topic)
    assert len(recs) == 2 and set(by_topic) == {"a", "b"}
    assert sorted(by_topic["a"]["values"]) == ["1", "2"]
    assert by_topic["b"]["values"] == ["3"]
    # ran in executor worker processes, not the driver
    assert all(r["pid"] != driver_pid for r in recs)
    # dry-run form (publish=None) must not raise — the reference ships with
    # publish disabled (src/main.rs:187)
    publish_foreach_batch(None)(df, 1)


def test_upsert_state_replay_idempotent(spark, tmp_path):
    """The delivery-guarantee claim (SCALE.md §8): at-least-once replay +
    idempotent UPSERT materialization = effectively-exactly-once state.
    Applying the same change batch TWICE through latest-per-key compaction
    yields byte-identical materialized state."""
    from cdc_rs_spark.envelope import snapshot_changes
    from cdc_rs_spark.operators.compaction import latest_per_key
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.synthetic import live_orders_changes

    orders = load(spark, SF_DIR, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, SF_DIR)
    once = backfill.unionByName(live)
    replayed = once.unionByName(live)  # the live batch delivered twice

    def materialize(changes):
        state = latest_per_key(changes, drop_deletes=True)
        img = F.coalesce(F.col("after"), F.col("before"))
        return {
            (r.k, r.total)
            for r in state.select(
                img[F.col("pkey")].alias("k"),
                F.col("after")["o_totalprice"].alias("total"),
            ).collect()
        }

    assert materialize(replayed) == materialize(once)


def test_kafka_frame_round_trip_contract(spark):
    """Broker-less Kafka contract: the exact (topic, key, value) frame the
    writer publishes round-trips through the reader's parse back to the
    identical Change envelope, topics route per-row, and key = pkey value
    (Kafka's per-key partition ordering = the reference's per-key publish
    order, src/main.rs:162-188)."""
    import json

    from cdc_rs_spark.envelope import snapshot_changes
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.sinks import (
        kafka_change_frame,
        parse_kafka_change_frame,
    )

    nation = load(spark, SF_DIR, "nation")
    changes = snapshot_changes(nation, "testdb", "nation", "n_nationkey")
    frame = kafka_change_frame(changes, "cdc.${db}.${table}")

    rows = frame.collect()
    assert len(rows) == nation.count()
    assert {r["topic"] for r in rows} == {"cdc.testdb.nation"}
    # key carries the pkey VALUE (partition-ordering contract)
    assert {r["key"] for r in rows} == {
        str(r["n_nationkey"]) for r in nation.collect()
    }
    # value is self-contained JSON of the whole envelope
    payload = json.loads(rows[0]["value"])
    assert payload["op"] == "Backfill" and payload["pkey"] == "n_nationkey"

    # reader parse is the exact inverse: envelope survives byte-faithfully
    back = parse_kafka_change_frame(frame)
    orig = {r["after"]["n_nationkey"]: r.asDict() for r in changes.collect()}
    for r in back.collect():
        o = orig[r["after"]["n_nationkey"]]
        assert r.asDict() == o


def test_write_training_shards_deterministic_order(spark, tmp_path):
    """Sharded training-set writer: every doc lands in its md5-assigned
    shard, and each shard's file row order equals the deterministic hash
    permutation restricted to that shard — re-running writes byte-identical
    shards (no rand(), no global sort)."""
    from cdc_rs_spark.plans.pipeline import hash_bucket
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.sinks import write_training_shards

    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)

    expected = {
        r["doc_id"]: (r["shard"], r["order"])
        for r in docs.select(
            "doc_id",
            (hash_bucket(F.col("doc_id"), 1_000_000) % 4).alias("shard"),
            hash_bucket(F.col("doc_id"), 1_000_000).alias("order"),
        ).collect()
    }
    total = 0
    for shard in range(4):
        # single partition per shard -> file order == row order
        rows = spark.read.parquet(f"{out}/shard={shard}").collect()
        total += len(rows)
        assert all(expected[r["doc_id"]][0] == shard for r in rows)
        orders = [(expected[r["doc_id"]][1], r["doc_id"]) for r in rows]
        assert orders == sorted(orders)
    assert total == docs.count()


def test_exactly_once_parquet_batch_replay_idempotent(spark, tmp_path):
    """Replaying a micro-batch (the at-least-once case after checkpoint
    recovery) overwrites its own batch_id partition: no duplicate rows, and
    already-committed batches are untouched."""
    from cdc_rs_spark.sources.sinks import exactly_once_parquet_batch

    out = str(tmp_path / "eo")
    sink = exactly_once_parquet_batch(out)
    b0 = spark.range(0, 5).withColumn("v", F.col("id") * 10)
    b1 = spark.range(5, 8).withColumn("v", F.col("id") * 10)
    sink(b0, 0)
    sink(b1, 1)
    # crash-recovery replay of batch 0 (same data, possibly repartitioned)
    sink(b0.repartition(3), 0)

    got = spark.read.parquet(out)
    assert got.count() == 8  # 5 + 3, no duplicates from the replay
    assert got.filter(F.col("batch_id") == 0).count() == 5
    assert sorted(r["id"] for r in got.collect()) == list(range(8))


def test_compact_parquet_preserves_rows(spark, tmp_path):
    """Compaction merges a fragmented directory (32 micro-batch-sized files)
    into few files with the identical row multiset."""
    import os as _os

    from cdc_rs_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.md5(F.col("id").cast("string")))
    df.repartition(32).write.parquet(path)
    before_files = sum(
        1 for _, _, fs in _os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before_files == 32

    n_after = compact_parquet(spark, path, target_bytes=1 << 30)
    assert n_after < before_files
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0


def test_training_shard_manifest(spark, tmp_path):
    """The shard manifest records per-shard row counts and an
    order-insensitive id digest that matches an independent recomputation."""
    import hashlib
    import json as _json

    from cdc_rs_spark.plans.pipeline import hash_bucket
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.sinks import write_training_shards

    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    manifest = _json.load(open(f"{out}/_manifest.json"))
    assert manifest["n_shards"] == 4 and manifest["id_col"] == "doc_id"

    shards = {}
    for r in docs.select(
        "doc_id", (hash_bucket(F.col("doc_id"), 1_000_000) % 4).alias("s")
    ).collect():
        shards.setdefault(r["s"], []).append(str(r["doc_id"]))
    for s, ids in shards.items():
        m = manifest["shards"][str(s)]
        assert m["n_rows"] == len(ids)
        want = hashlib.md5("|".join(sorted(ids)).encode()).hexdigest()
        assert m["id_digest"] == want


def test_ranged_backfill_shards_cover_table_and_resume(spark, sf_dir, tmp_path):
    """The finished form of the reference's unused `range` column: a table
    backfill split into half-open pkey-range jobs (plan_ranges) must cover
    the table exactly once, push each shard's bounds into the parquet
    scan, and resume per shard — a job that fails stays 'todo' alone and
    a later drain completes the remainder with no loss or duplication."""
    from pyspark.sql import functions as F

    from cdc_rs_spark.sources.backfill import (
        BackfillQueue,
        plan_ranges,
        run_todo_jobs,
        snapshot_table,
    )

    jobs = plan_ranges(spark, sf_dir, "testdb", "orders", "o_orderkey", 4)
    assert len(jobs) == 4
    # shards partition the key space: contiguous half-open ranges
    bounds = [j.range_bounds() for j in jobs]
    assert all(b is not None for b in bounds)
    assert all(bounds[i][1] == bounds[i + 1][0] for i in range(3))

    # range predicate reaches the scan
    plan = (
        snapshot_table(spark, sf_dir, jobs[0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(o_orderkey" in plan, plan

    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    q = BackfillQueue(str(tmp_path / "queue.json"))
    q.enqueue(jobs[:2])  # first drain sees only half the shards
    first = run_todo_jobs(spark, q, sf_dir)
    n_first = first.count()
    assert all(j.status == "done" for j in q.all())
    q.enqueue(jobs[2:])  # remaining shards arrive (or are retried) later
    second = run_todo_jobs(spark, q, sf_dir)
    n_second = second.count()
    assert n_first + n_second == total
    # no overlap between drains
    k1 = {r["after"]["o_orderkey"] for r in first.collect()}
    k2 = {r["after"]["o_orderkey"] for r in second.collect()}
    assert not (k1 & k2) and len(k1 | k2) == total
    # everything done; a fresh poll is a no-op
    assert run_todo_jobs(spark, q, sf_dir) is None


def test_backfill_drain_commits_per_shard(spark, sf_dir, tmp_path):
    """Round-4 review: a crash mid-drain must keep COMPLETED shards
    committed — publish fails (executor-side) on the second shard's key
    range, the first stays done, the rest stay todo, and a re-drain
    finishes exactly the remainder with no duplication."""
    import glob
    import pytest as _pytest

    from cdc_rs_spark.pipeline import PipelineConfig, run_backfill_queue
    from cdc_rs_spark.sources.backfill import BackfillQueue, plan_ranges

    jobs = plan_ranges(spark, sf_dir, "testdb", "orders", "o_orderkey", 3)
    q = BackfillQueue(str(tmp_path / "q.json"))
    q.enqueue(jobs)
    out_dir = str(tmp_path / "published")
    fail_lo, fail_hi = jobs[1].range_bounds()

    def make_publish(fail: bool):
        def publish(topic: str, values: list[str]) -> None:
            # runs on EXECUTORS: all state via the shared local FS
            import os as _os
            import re as _re
            import uuid as _uuid

            if fail:
                for v in values:
                    m = _re.search(r'"o_orderkey":\s*"?(\d+)', v)
                    if m and fail_lo <= int(m.group(1)) < fail_hi:
                        raise RuntimeError("sink outage")
            _os.makedirs(out_dir, exist_ok=True)
            with open(_os.path.join(out_dir, _uuid.uuid4().hex), "w") as f:
                f.write(str(len(values)))

        return publish

    def cfg(fail: bool) -> PipelineConfig:
        return PipelineConfig(
            source_path=str(tmp_path / "nofeed"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            publish=make_publish(fail),
        )

    with _pytest.raises(Exception, match="sink outage"):
        run_backfill_queue(spark, cfg(True), str(tmp_path / "q.json"), sf_dir)
    statuses = [j.status for j in q.all()]
    assert statuses == ["done", "todo", "todo"], statuses

    n2 = run_backfill_queue(spark, cfg(False), str(tmp_path / "q.json"), sf_dir)
    assert [j.status for j in q.all()] == ["done"] * 3
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    published = sum(
        int(open(f).read()) for f in glob.glob(f"{out_dir}/*")
    )
    # shard 1 published once in drain 1; shards 2+3 in drain 2 — no dupes
    assert published == total and n2 < total


def test_backfill_queue_rejects_duplicate_primary_key(tmp_path):
    """(db, relation, range) is the queue's PRIMARY KEY, like the
    reference's schema — a duplicate enqueue raises instead of silently
    double-publishing."""
    import pytest as _pytest

    from cdc_rs_spark.sources.backfill import BackfillJob, BackfillQueue

    q = BackfillQueue(str(tmp_path / "q.json"))
    q.enqueue([BackfillJob(db="d", relation="t", pkey="k", range="0..10")])
    with _pytest.raises(ValueError, match="duplicate job"):
        q.enqueue([BackfillJob(db="d", relation="t", pkey="k", range="0..10")])
    # a different range is a different key
    q.enqueue([BackfillJob(db="d", relation="t", pkey="k", range="10..20")])
    assert len(q.all()) == 2
