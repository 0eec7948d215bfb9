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


def test_publish_foreach_batch_groups_per_topic(spark):
    calls: dict[str, list[str]] = {}

    def fake_publish(topic: str, values: list[str]) -> None:
        calls.setdefault(topic, []).extend(values)

    df = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "3")], "topic string, value string"
    )
    publish_foreach_batch(fake_publish)(df, 0)
    assert sorted(calls["a"]) == ["1", "2"] and calls["b"] == ["3"]
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
