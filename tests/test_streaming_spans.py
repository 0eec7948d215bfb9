"""Streaming exact-substring dedup (streaming/spans.py): probe new docs
against the persisted span store, catch cross-batch and intra-batch
duplicated spans, stay idempotent under at-least-once replay."""

from __future__ import annotations

import json
import os

from cdc_rs_spark.streaming.spans import (
    probe_spans_against_store,
    spans_foreach_batch,
)

# a 60-char run shared as a PREFIX puts identical windows at positions
# 1 and 11 of both docs (SPAN_LEN=40, SPAN_STRIDE=10); its length is a
# multiple of the stride so a suffix after it stays grid-aligned too
SHARED = "the quick brown fox jumps over the lazy dog again and again "
assert len(SHARED) == 60
UNIQUE1 = "x" * 20 + "".join(chr(97 + (i * 7) % 26) for i in range(80))
UNIQUE2 = "y" * 20 + "".join(chr(97 + (i * 11) % 26) for i in range(80))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_probe_flags_cross_store_and_intra_batch(spark):
    store = _docs(spark, [(1, SHARED + UNIQUE1)])
    from cdc_rs_spark.operators.dedup import doc_spans

    span_store = doc_spans(store).select("span", "doc_id")
    batch = _docs(
        spark,
        [
            (2, SHARED + UNIQUE2),  # duplicates the stored doc's prefix
            (3, UNIQUE2 + "z" * 40),  # intra-batch pair with 4
            (4, UNIQUE2 + "w" * 40),
            (5, "all fresh " + UNIQUE1[::-1]),  # clean
        ],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in probe_spans_against_store(batch, span_store).collect()
    }
    assert 2 in got and got[2][1] >= 2  # prefix windows at 1 and 11
    # docs 3 and 4 share UNIQUE2's windows with doc 2 and each other
    assert 3 in got and 4 in got
    assert 5 not in got
    # short doc contributes nothing and does not crash
    tiny = _docs(spark, [(9, "short")])
    assert probe_spans_against_store(tiny, span_store).count() == 0


def test_foreach_batch_catches_cross_batch_and_is_idempotent(spark, tmp_path):
    store_path = str(tmp_path / "span_store")
    # seed an empty store with the right schema
    _docs(spark, []).sparkSession.createDataFrame(
        [], "span string, doc_id bigint"
    ).write.parquet(store_path)

    reports: list[tuple[int, dict]] = []

    def on_report(df, batch_id):
        reports.append(
            (batch_id, {r["doc_id"]: r["n_dup_spans"] for r in df.collect()})
        )

    fn = spans_foreach_batch(store_path, on_report)
    fn(_docs(spark, [(1, SHARED + UNIQUE1)]), 0)
    fn(_docs(spark, [(2, SHARED + UNIQUE2)]), 1)
    assert reports[0] == (0, {})  # first batch: nothing to collide with
    assert 2 in reports[1][1] and reports[1][1][2] >= 2

    # at-least-once replay of batch 1: its own stored spans must NOT make
    # doc 2 a duplicate of itself — the report is unchanged
    fn(_docs(spark, [(2, SHARED + UNIQUE2)]), 1)
    assert reports[2][1] == reports[1][1]

    # a third batch duplicating doc 2's unique tail is caught from the store
    fn(_docs(spark, [(7, UNIQUE2 + "fresh tail material here")]), 2)
    assert 7 in reports[3][1]


def test_streaming_end_to_end_file_source(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for fname, rows in [
        ("b1.json", [(1, SHARED + UNIQUE1)]),
        ("b2.json", [(2, SHARED + UNIQUE2)]),
    ]:
        with open(os.path.join(src, fname), "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    store_path = str(tmp_path / "span_store")
    spark.createDataFrame([], "span string, doc_id bigint").write.parquet(
        store_path
    )
    seen: list[tuple[int, dict]] = []
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(
            spans_foreach_batch(
                store_path,
                lambda df, b: seen.append(
                    (b, {r["doc_id"]: r["n_dup_spans"] for r in df.collect()})
                ),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len(seen) == 2
    flagged = {d for _, rep in seen for d in rep}
    # file-source batch order is timestamp-based and may tie — the
    # order-free property is that EXACTLY the second arrival is flagged
    assert len(flagged) == 1 and flagged <= {1, 2}, seen
