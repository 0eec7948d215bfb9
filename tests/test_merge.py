"""Property test for the backfill-correction merge (SURVEY §5(c)):

For ANY interleaving of snapshot rows and live changes over the same key
space, the per-key survivor is the live change whenever one exists ("live
wins", reference src/main.rs:71-88), else the backfill row.
"""

from __future__ import annotations

import random

from cdc_rs_spark.operators.compaction import latest_per_key
from cdc_rs_spark.operators.merge import corrected_backfill

CHANGE_DDL = (
    "op string, db string, table string, before map<string,string>, "
    "after map<string,string>, ts long, pkey string"
)


def _bf(key: str, val: str):
    return ("Backfill", "db", "t", None, {"id": key, "v": val}, 1, "id")


def _live(op: str, key: str, val: str, ts: int):
    before = {"id": key, "v": "old"} if op in ("Update", "Delete") else None
    after = {"id": key, "v": val} if op in ("Insert", "Update") else None
    return (op, "db", "t", before, after, ts, "id")


def test_live_wins_basic(spark):
    backfill = spark.createDataFrame([_bf("1", "snap1"), _bf("2", "snap2")], CHANGE_DDL)
    live = spark.createDataFrame([_live("Update", "1", "live1", 100)], CHANGE_DDL)
    out = corrected_backfill(backfill, live).collect()
    by_key = {(r["after"] or r["before"])["id"]: r for r in out}
    assert len(out) == 2
    assert by_key["1"]["op"] == "Update"
    assert by_key["1"]["after"]["v"] == "live1"
    assert by_key["2"]["op"] == "Backfill"


def test_live_wins_even_if_backfill_ts_larger(spark):
    """Priority beats timestamp: a backfill row never supersedes a live one
    (the reference replaces the backfill item regardless of time,
    src/main.rs:77-87)."""
    backfill = spark.createDataFrame(
        [("Backfill", "db", "t", None, {"id": "1", "v": "snap"}, 999999, "id")],
        CHANGE_DDL,
    )
    live = spark.createDataFrame([_live("Delete", "1", "", 5)], CHANGE_DDL)
    out = corrected_backfill(backfill, live).collect()
    assert len(out) == 1
    assert out[0]["op"] == "Delete"


def test_latest_live_wins_among_live(spark):
    backfill = spark.createDataFrame([_bf("1", "snap")], CHANGE_DDL)
    live = spark.createDataFrame(
        [_live("Insert", "1", "v1", 10), _live("Update", "1", "v2", 20)], CHANGE_DDL
    )
    out = corrected_backfill(backfill, live).collect()
    assert len(out) == 1
    assert out[0]["op"] == "Update"
    assert out[0]["after"]["v"] == "v2"


def test_keys_partition_by_table(spark):
    """Same pkey value in different tables must not collide
    (reference matches on (db, table) first, src/main.rs:73-75)."""
    backfill = spark.createDataFrame(
        [
            ("Backfill", "db", "t1", None, {"id": "1", "v": "a"}, 1, "id"),
            ("Backfill", "db", "t2", None, {"id": "1", "v": "b"}, 1, "id"),
        ],
        CHANGE_DDL,
    )
    live = spark.createDataFrame(
        [("Update", "db", "t1", {"id": "1", "v": "a"}, {"id": "1", "v": "x"}, 9, "id")],
        CHANGE_DDL,
    )
    out = corrected_backfill(backfill, live).collect()
    by_table = {r["table"]: r for r in out}
    assert by_table["t1"]["op"] == "Update"
    assert by_table["t2"]["op"] == "Backfill"


def test_property_random_interleavings(spark):
    """Randomized: N keys, each with an optional backfill row and 0-3 live
    changes at distinct timestamps; survivor must be the max-ts live change,
    else the backfill row."""
    rng = random.Random(42)
    backfill_rows, live_rows, expected = [], [], {}
    for k in range(60):
        key = str(k)
        has_bf = rng.random() < 0.8
        n_live = rng.randint(0, 3)
        if has_bf:
            backfill_rows.append(_bf(key, f"snap{key}"))
        tss = rng.sample(range(10, 1000), n_live)
        best = None
        for ts in tss:
            op = rng.choice(["Insert", "Update", "Delete"])
            live_rows.append(_live(op, key, f"v{ts}", ts))
            if best is None or ts > best[0]:
                best = (ts, op)
        if best is not None:
            expected[key] = ("live", best[1], best[0])
        elif has_bf:
            expected[key] = ("bf", "Backfill", 1)
    backfill = spark.createDataFrame(backfill_rows, CHANGE_DDL)
    live = spark.createDataFrame(live_rows, CHANGE_DDL)
    out = corrected_backfill(backfill, live).collect()
    assert len(out) == len(expected)
    for r in out:
        key = (r["after"] or r["before"])["id"]
        kind, op, ts = expected[key]
        assert r["op"] == op, f"key {key}: got {r['op']}, want {op}"
        assert r["ts"] == ts


def test_latest_per_key_tombstones(spark):
    changes = spark.createDataFrame(
        [
            _bf("1", "snap"),
            _live("Update", "1", "u", 50),
            _live("Delete", "1", "", 60),
            _bf("2", "keep"),
        ],
        CHANGE_DDL,
    )
    state = latest_per_key(changes, drop_deletes=True).collect()
    assert len(state) == 1
    assert state[0]["after"]["id"] == "2"


def test_latest_per_key_tied_timestamps_deterministic(spark):
    """Binlog ts is epoch seconds, so same-key ties are common on real
    feeds: with equal ts the survivor follows the op rank
    Update > Insert > Delete > Backfill (same ordering as the merge
    operator and the cdc_compact_latest oracle), independent of input
    order or partitioning."""
    rows = [
        _live("Insert", "1", "ins", 100),
        _live("Update", "1", "upd", 100),   # tied ts -> Update must win
        _bf("2", "snap"),
        _live("Delete", "2", "", 1),        # tied with backfill ts=1 -> Delete outranks
    ]
    for ordering in (rows, rows[::-1]):
        changes = spark.createDataFrame(ordering, CHANGE_DDL)
        state = {
            r["after"]["id"] if r["after"] else r["before"]["id"]: r
            for r in latest_per_key(changes).collect()
        }
        assert state["1"]["op"] == "Update" and state["1"]["after"]["v"] == "upd"
        assert state["2"]["op"] == "Delete"
