"""Incremental (streaming) classifier training — the streaming form of
operators/classify.py's Naive-Bayes quality filter: labeled documents
arrive as a stream, each micro-batch's token counts are folded into a
persisted count store, and the model served at any moment is EXACTLY the
batch model trained on everything folded so far. This is the online
retraining loop a production quality filter runs (label a trickle of
documents, keep the filter fresh) at per-batch cost.

Why this is exact where most online learners are approximate: the NB
family's ENTIRE trained state is the (token, c_a, c_b) sufficient
statistics — additive integers. Folding a batch is appending its partial
counts; training is summing them. No gradient, no ordering sensitivity,
no drift between incremental and batch — the equivalence the registered
query text_nb_incremental_classifier oracle-checks against the SAME SQL
as the batch text_nb_source_classifier.

Store layout (root directory + one JSON sidecar):

  counts-EEEEEE/        log-structured partial-count segments, parquet
                        PARTITIONED BY `ingest` ('{stream}-{batch}' or
                        'f-{n}' for direct folds, 'compact' for the
                        compacted base). A fold appends ONE segment of
                        the batch's pre-aggregated counts; reads sum
                        across segments (SUM is the merge operator, so
                        segment boundaries are invisible to the model).
  _nbc_meta.json        {epoch, last_batch_by_stream, n_folds, seq}

Idempotence (the streaming/ivf.py discipline): a batch at or below its
stream's committed ledger line is skipped outright; a retry of a crashed
fold purges its own ingest=TAG directories before re-appending, so
at-least-once delivery never double-counts. Compaction rewrites the
summed table into ONE 'compact' segment in a NEW epoch directory with an
atomic meta flip (probes racing the rewrite keep reading the old epoch's
files — retained for keep_epochs further compactions).

Per-batch cost: ONE map-side-combinable aggregation over the batch's
tokens plus an O(|batch vocab|) segment write. Nothing reads the store
on the fold path; weight reads aggregate |vocab| x n_segments rows,
bounded by compaction cadence. At 100 TB the labeled stream is tiny by
construction (labels are the expensive resource) — the corpus-sized work
stays in the SCORING pass, which is unchanged from the batch form.

No counterpart in the reference (its stream is CDC rows, not labeled
documents) — the EXTENSION family's streaming form, completing the set
with streaming/dedup.py, streaming/spans.py, streaming/clusters.py and
streaming/ivf.py.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_rs_spark.operators.classify import (
    nb_token_counts,
    nb_weights_from_counts,
)

_META = "_nbc_meta.json"


def _meta_path(root: str) -> str:
    return os.path.join(root, _META)


def _read_meta(root: str) -> dict:
    with open(_meta_path(root)) as f:
        return json.load(f)


def _write_meta(root: str, meta: dict) -> None:
    tmp = _meta_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(root))


def _counts_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"counts-{epoch:06d}")


def init_count_store(spark: SparkSession, root: str) -> dict:
    """Create an empty store: epoch-0 counts directory holding one empty
    segment (so first reads need no existence special-case — the
    round-8 spans-store lesson, baked in at birth here) and the meta
    sidecar."""
    os.makedirs(root, exist_ok=True)
    spark.createDataFrame(
        [], "token string, c_a bigint, c_b bigint, ingest string"
    ).write.mode("overwrite").partitionBy("ingest").parquet(
        _counts_path(root, 0)
    )
    meta = {
        "epoch": 0,
        "last_batch_by_stream": {},
        "n_folds": 0,
        "seq": 0,
    }
    _write_meta(root, meta)
    return meta


def _purge_ingest(counts_path: str, ingest: str) -> None:
    """Delete one ingest segment's partition directory (crashed-attempt
    residue) — directory-level, same as streaming/ivf.py."""
    p = os.path.join(counts_path, f"ingest={ingest}")
    if os.path.isdir(p):
        shutil.rmtree(p)


def fold_counts(
    train_toks: DataFrame,
    root: str,
    batch_id: int | None = None,
    stream_id: str = "s",
) -> dict:
    """Fold one micro-batch of labeled tokens (is_a: bool, token: string;
    pre-tokenized, empty tokens already filtered) into the store: ONE
    partial-count aggregation, ONE segment append. Returns {n_tokens,
    skipped_duplicate}."""
    spark = train_toks.sparkSession
    meta = _read_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    if batch_id is not None and int(batch_id) <= int(
        ledger.get(stream_id, -1)
    ):
        return {"n_tokens": 0, "skipped_duplicate": True}
    epoch = int(meta["epoch"])
    path = _counts_path(root, epoch)
    if batch_id is not None:
        ingest = f"{stream_id}-{batch_id}"
    else:
        ingest = f"f-{int(meta['seq']) + 1}"
    _purge_ingest(path, ingest)  # crashed prior attempt's residue
    from pyspark.sql import Observation

    obs = Observation()
    (
        nb_token_counts(train_toks)
        .observe(obs, F.sum(F.col("c_a") + F.col("c_b")).alias("n"))
        .withColumn("ingest", F.lit(ingest))
        .coalesce(1)  # one segment file: |batch vocab| rows, read-side wins
        .write.mode("append")
        .partitionBy("ingest")
        .parquet(path)
    )
    n = obs.get["n"]
    # ledger commit is the transaction point (strictly after the append:
    # a crash between leaves a purgeable tag, never a lost batch)
    meta = _read_meta(root)
    if batch_id is not None:
        led = dict(meta.get("last_batch_by_stream") or {})
        led[stream_id] = max(int(led.get(stream_id, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
    else:
        meta["seq"] = int(meta["seq"]) + 1
    meta["n_folds"] = int(meta["n_folds"]) + 1
    _write_meta(root, meta)
    return {"n_tokens": int(n) if n is not None else 0,
            "skipped_duplicate": False}


def read_counts(spark: SparkSession, root: str) -> DataFrame:
    """The merged sufficient statistics: SUM across segments. One
    map-side-combinable aggregation over |vocab| x n_segments rows."""
    epoch = int(_read_meta(root)["epoch"])
    return (
        spark.read.parquet(_counts_path(root, epoch))
        .groupBy("token")
        .agg(
            F.sum("c_a").cast("bigint").alias("c_a"),
            F.sum("c_b").cast("bigint").alias("c_b"),
        )
    )


def store_weights(
    spark: SparkSession, root: str
) -> tuple[DataFrame, DataFrame]:
    """The model trained on everything folded so far — identical algebra
    to operators/classify.nb_train_weights on the unioned corpus."""
    return nb_weights_from_counts(read_counts(spark, root))


def compact_count_store(
    spark: SparkSession, root: str, keep_epochs: int = 2
) -> int:
    """Rewrite the summed table into ONE 'compact' segment in a NEW epoch
    directory and flip the meta atomically (streaming/ivf.py's epoch
    scheme: concurrent readers keep their snapshotted epoch's files,
    superseded epochs expire after keep_epochs further compactions).
    Returns the number of distinct tokens in the compacted base."""
    meta = _read_meta(root)
    epoch = int(meta["epoch"])
    new_epoch = epoch + 1
    from pyspark.sql import Observation

    obs = Observation()
    (
        spark.read.parquet(_counts_path(root, epoch))
        .groupBy("token")
        .agg(
            F.sum("c_a").cast("bigint").alias("c_a"),
            F.sum("c_b").cast("bigint").alias("c_b"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .withColumn("ingest", F.lit("compact"))
        .coalesce(1)
        .write.mode("overwrite")  # clears a crashed prior attempt
        .partitionBy("ingest")
        .parquet(_counts_path(root, new_epoch))
    )
    n = int(obs.get["n"])
    meta = _read_meta(root)  # ledger lines may have moved during the job
    meta["epoch"] = new_epoch  # THE publish point (atomic replace)
    _write_meta(root, meta)
    for name in sorted(os.listdir(root)):
        if name.startswith("counts-"):
            e = int(name.split("-")[1])
            if e < new_epoch - keep_epochs:
                shutil.rmtree(os.path.join(root, name))
    return n


def classifier_foreach_batch(
    root: str,
    compact_every: int | None = None,
    stream_id: str = "s",
):
    """foreachBatch adapter: batches of (is_a, token) rows fold into the
    store; compaction every `compact_every` folds. Ledger-gated like
    every streaming store here, so at-least-once replays are no-ops."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        stats = fold_counts(
            batch_df, root, batch_id=batch_id, stream_id=stream_id
        )
        if (
            not stats["skipped_duplicate"]
            and compact_every is not None
            and int(_read_meta(root)["n_folds"]) % compact_every == 0
        ):
            compact_count_store(batch_df.sparkSession, root)

    return fn
