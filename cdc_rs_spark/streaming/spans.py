"""Incremental (streaming) exact-substring dedup against a persisted span
store — the ingestion-time shape of dedup_exact_substring_spans (Lee et
al. 2021 ExactSubstr), same pattern as streaming/dedup.py's persisted LSH
band store: documents arrive as a stream, each micro-batch's windows are
checked against the EXISTING corpus' windows plus the batch's own
cross-document collisions, and the batch's windows are appended so later
batches are caught.

Two store layouts:

  LEGACY (round 7): one bare parquet directory of (span, doc_id) rows,
  append-only, pre-created by the caller. Kept working verbatim.

  EPOCH'D (round 8, VERDICT r7 next #3 — the scheme is streaming/ivf.py's):
  a root directory holding store-NNNNNN epoch subdirectories plus a
  _span_meta.json sidecar {epoch, hashed, last_batch_by_stream}. Appends
  land in the live epoch; compact_span_store() rewrites the live epoch
  DISTINCT into a NEW epoch directory and publishes it with one atomic
  sidecar replace (tmp + os.replace), so a probe mid-scan on the old
  epoch keeps its files; superseded epochs are retained for `keep_epochs`
  further compactions (Iceberg-style snapshot expiry), then GC'd. The
  sidecar also carries a per-stream committed-batch ledger: a replayed
  batch id at or below its stream's ledger line still PROBES and
  re-emits its report (at-least-once delivery downstream) but skips the
  append, so replays don't grow the store; a crash between append and
  ledger commit leaves duplicate rows, which existence semantics ignore
  and the next compaction collapses.

Keys (round 8): `hashed=True` stores (h1, h2, doc_id) instead of the raw
40-char span — h1 = xxhash64(span), h2 = xxhash64(seed2, span), two
INDEPENDENT 64-bit keys, 16 bytes a row instead of ~40 chars. The second
hash IS the verify join: a candidate duplicate must match on BOTH keys,
so a false positive needs a simultaneous 2^-64 x 2^-64 collision —
~1e-39 per pair, negligible at any corpus size (a raw-span recheck would
need the original document text, which the store deliberately does not
carry). Hash VALUES are engine-specific (xxhash64), so the DuckDB oracle
checks the hashed path by REPORT equality with the raw-span SQL — equal
per-doc counts absent collisions, which the dual key guarantees.

Scale: per micro-batch work is |batch| x len/stride skinny rows joined
against the store on the key — never a corpus self-scan. At warehouse
scale the store is bucketed by the key hash so the probe join co-locates.
Idempotence: the probe is EXISTENCE-based (semi-join on another doc's
span), so an at-least-once replay appending duplicate (key, doc_id) rows
cannot change any report.

No counterpart in the reference (its stream is CDC rows, not documents) —
this is the EXTENSION family's streaming form.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_rs_spark.operators.dedup import doc_spans

_SPAN_META = "_span_meta.json"
_H2_SEED = 0x5BD1E995  # any constant != xxhash64's default seed path


def span_keys(
    d: DataFrame, hashed: bool, sampler=doc_spans
) -> tuple[DataFrame, list[str]]:
    """Window the documents and project the store key: the raw span, or
    the dual xxhash64 pair (see module doc). Returns (frame with doc_id +
    key columns, key column names). `sampler` picks the window grid —
    doc_spans (stride) or operators/dedup.doc_anchor_spans (round 9:
    content-defined anchors, shift-invariant); everything downstream of
    the sampler is grid-agnostic because a window is a window."""
    spans = sampler(d)
    if not hashed:
        return spans.select("doc_id", "span"), ["span"]
    return (
        spans.select(
            "doc_id",
            F.xxhash64("span").alias("h1"),
            F.xxhash64(F.lit(_H2_SEED), F.col("span")).alias("h2"),
        ),
        ["h1", "h2"],
    )


def _probe_keyed(
    keyed_batch: DataFrame, span_store: DataFrame, keys: list[str]
) -> DataFrame:
    """Shared probe core over an arbitrary key tuple: per batch document,
    count the windows whose key exists under ANOTHER doc_id — in the
    persisted store or elsewhere in this batch. Returns (doc_id, n_spans,
    n_dup_spans, dup_frac) for affected docs.

    Shape: one aggregate to (key, doc_id) counts; the store probe is a
    per-key (min_doc, max_doc) aggregate joined 1:1 — existence of
    ANOTHER doc is `matched and not (min==max==this doc)`, so a
    boilerplate span stored under a million docs joins as ONE row instead
    of exploding (the skew case a plain store join would hit), and a
    replayed doc can never match its own stored spans."""
    pair = keyed_batch.groupBy(*keys, "doc_id").agg(F.count("*").alias("k"))
    # intra-batch: how many batch docs carry each key
    batch_freq = pair.groupBy(*keys).agg(F.count("*").alias("nd_batch"))
    # restrict the store scan to the BATCH's keys before aggregating:
    # without the semi-filter the min/max aggregate hashes the whole
    # append-only store every micro-batch — O(|store|) per batch,
    # O(stream^2) over its life (round-7 review). No forced broadcast
    # hint: a micro-batch's distinct keys sit far under the
    # auto-broadcast threshold so the planner broadcasts them anyway,
    # while a corpus-sized caller (dedup_span_store_probe hands half the
    # fixture as the "batch") degrades to a shuffled semi-join instead
    # of blowing the 8 GB broadcast limit (second-pass review).
    batch_keys = pair.select(*keys).distinct()
    store_agg = (
        span_store.join(batch_keys, keys)
        .groupBy(*keys)
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
    )
    joined = pair.join(store_agg, keys, "left").join(batch_freq, keys)
    in_store = F.col("d_min").isNotNull() & ~(
        (F.col("d_min") == F.col("doc_id"))
        & (F.col("d_max") == F.col("doc_id"))
    )
    dup = in_store | (F.col("nd_batch") >= 2)
    dup_k = F.sum(F.when(dup, F.col("k")).otherwise(F.lit(0)))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_spans"),
            dup_k.cast("bigint").alias("n_dup_spans"),
            F.round(dup_k.cast("double") / F.sum("k"), 6).alias("dup_frac"),
        )
        .filter(F.col("n_dup_spans") > 0)
    )


def probe_spans_against_store(
    new_docs: DataFrame, span_store: DataFrame, sampler=doc_spans
) -> DataFrame:
    """Raw-span probe (the round-7 surface, unchanged semantics): window
    the new docs and report per-doc duplicated-window counts against a
    (span, doc_id) store. Pure DataFrame logic — usable in batch or
    inside foreachBatch. The store must have been built with the SAME
    `sampler` (grids don't mix — an anchored window never equals a
    stride window unless the text aligns)."""
    keyed, keys = span_keys(new_docs, hashed=False, sampler=sampler)
    return _probe_keyed(keyed, span_store, keys)


def probe_hashed_spans_against_store(
    new_docs: DataFrame, span_store: DataFrame, sampler=doc_spans
) -> DataFrame:
    """Dual-hash probe against an (h1, h2, doc_id) store — same report as
    the raw-span probe absent a simultaneous two-key collision (see
    module doc for the 1e-39 bound)."""
    keyed, keys = span_keys(new_docs, hashed=True, sampler=sampler)
    return _probe_keyed(keyed, span_store, keys)


# ---- epoch'd store (round 8) ------------------------------------------------


def _span_meta_path(root: str) -> str:
    return os.path.join(root, _SPAN_META)


def _read_span_meta(root: str) -> dict:
    with open(_span_meta_path(root)) as f:
        return json.load(f)


def _write_span_meta(root: str, meta: dict) -> None:
    tmp = _span_meta_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _span_meta_path(root))


def _epoch_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"store-{epoch:06d}")


def _store_schema(hashed: bool) -> str:
    return (
        "h1 bigint, h2 bigint, doc_id bigint"
        if hashed
        else "span string, doc_id bigint"
    )


def is_epoch_store(root: str) -> bool:
    return os.path.exists(_span_meta_path(root))


def init_span_store(
    spark: SparkSession, root: str, hashed: bool = False
) -> dict:
    """Create an empty epoch'd span store (idempotent: an existing store
    is returned as-is). The epoch-0 directory is written with the store
    schema so the first batch's read needs no special case."""
    if is_epoch_store(root):
        return _read_span_meta(root)
    os.makedirs(root, exist_ok=True)
    spark.createDataFrame([], _store_schema(hashed)).write.mode(
        "overwrite"
    ).parquet(_epoch_path(root, 0))
    meta = {"epoch": 0, "hashed": bool(hashed), "last_batch_by_stream": {}}
    _write_span_meta(root, meta)
    return meta


def _span_tomb_path(root: str) -> str:
    """Resolve the live tombstone directory (readmit publishes rewritten
    sets under versioned dirs named by the meta's tomb_dir key)."""
    try:
        name = _read_span_meta(root).get("tomb_dir") or "tomb"
    except FileNotFoundError:
        name = "tomb"
    return os.path.join(root, name)


def span_tombstones(spark: SparkSession, root: str) -> DataFrame:
    """The cumulative removed-doc set — one skinny (doc_id) parquet dir.
    Bounded by total deletes."""
    p = _span_tomb_path(root)
    if not os.path.isdir(p):
        return spark.createDataFrame([], "doc_id bigint")
    return spark.read.schema("doc_id bigint").parquet(p)


def remove_docs_from_span_store(
    spark: SparkSession,
    root: str,
    removed: DataFrame,
    batch_id: int | None = None,
    stream_id: str = "d",
) -> dict:
    """CDC-delete fold for the span store (round 10, VERDICT r9 next
    #1): a removed doc's windows must stop witnessing duplication —
    probes are EXISTENCE-based (a span is 'duplicated' if another doc
    holds it), so a forgotten doc's rows lingering in the store would
    keep flagging other docs against content that no longer exists. The
    fold appends the doc ids to the tombstone set (ledger-idempotent);
    live_span_store anti-joins it from the next read, and the next
    compaction drops the rows physically (the erasure point). Removal
    by doc_id needs no span recompute — span rows are (key, doc_id)
    facts, not a graph."""
    meta = _read_span_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    key = f"{stream_id}!rm"
    if batch_id is not None and int(batch_id) <= int(ledger.get(key, -1)):
        return {"n_removed": 0, "skipped_duplicate": True}
    removed = removed.select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    ).distinct()
    n = removed.count()
    removed.write.mode("append").parquet(_span_tomb_path(root))
    meta = _read_span_meta(root)
    if batch_id is not None:
        led = dict(meta.get("last_batch_by_stream") or {})
        led[key] = max(int(led.get(key, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
    _write_span_meta(root, meta)
    return {"n_removed": int(n), "skipped_duplicate": False}


def readmit_docs_to_span_store(
    spark: SparkSession,
    root: str,
    readmitted: DataFrame,
    batch_id: int | None = None,
    stream_id: str = "d",
) -> dict:
    """TOMBSTONE-CLEAR / re-admit fold (round 11, VERDICT r10 next #3):
    remove doc ids from the tombstone set so future span folds may
    re-index them. Restores no rows by itself (compaction erased them —
    re-ingestion is the only way back, with never-seen semantics);
    ledgered under its own '{stream}!ra' line (the convention the
    cluster/IVF readmit folds adopted in round 12 — ADVICE r11, low);
    published atomically via a versioned dir + one meta flip. Clearing a
    never-tombstoned id is a no-op. n_readmitted = tombstones actually
    cleared, counted on the rewrite's single write action."""
    from pyspark.sql import Observation

    meta = _read_span_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    key = f"{stream_id}!ra"
    if batch_id is not None and int(batch_id) <= int(ledger.get(key, -1)):
        return {"n_readmitted": 0, "n_tombstones_left": None,
                "skipped_duplicate": True}
    ids = readmitted.select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    ).distinct()
    seq = int(meta.get("tomb_seq", 0)) + 1
    new_name = f"tomb-{seq:06d}"
    marked = span_tombstones(spark, root).distinct().join(
        F.broadcast(ids.withColumn("__r", F.lit(True))), "doc_id", "left"
    )
    obs = Observation()
    (
        marked.observe(
            obs,
            F.count(F.lit(1)).alias("nb"),
            F.count("__r").alias("nc"),
        )
        .filter(F.col("__r").isNull())
        .select("doc_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(root, new_name))
    )
    n_cleared = int(obs.get["nc"])
    n_left = int(obs.get["nb"]) - n_cleared
    old_tomb = _span_tomb_path(root)
    meta = _read_span_meta(root)
    meta["tomb_dir"] = new_name
    meta["tomb_seq"] = seq
    if batch_id is not None:
        led = dict(meta.get("last_batch_by_stream") or {})
        led[key] = max(int(led.get(key, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
    _write_span_meta(root, meta)
    if os.path.isdir(old_tomb) and os.path.basename(old_tomb) != new_name:
        import shutil

        shutil.rmtree(old_tomb, ignore_errors=True)
    return {
        "n_readmitted": n_cleared,
        "n_tombstones_left": n_left,
        "skipped_duplicate": False,
    }


def live_span_store(spark: SparkSession, root: str) -> DataFrame:
    """The live epoch's rows (consistent point-in-time read: the sidecar
    replace is atomic, and superseded epochs are retained through
    `keep_epochs` further compactions so a scan never loses files).
    Tombstoned docs' rows are anti-joined out (round 10) — scan-free
    before the first removal."""
    meta = _read_span_meta(root)
    rows = spark.read.parquet(_epoch_path(root, int(meta["epoch"])))
    if os.path.isdir(_span_tomb_path(root)):
        rows = rows.join(
            F.broadcast(span_tombstones(spark, root)), "doc_id", "left_anti"
        )
    return rows


def compact_span_store(
    spark: SparkSession, root: str, keep_epochs: int = 2
) -> int:
    """DISTINCT-rewrite the live epoch into a NEW epoch directory and
    publish it with one atomic sidecar flip — bounding the store at its
    distinct (key, doc_id) size no matter how many duplicate rows
    replays and crash-retries appended. Superseded epochs are GC'd once
    they are `keep_epochs` compactions old (a mid-scan reader has whole
    compaction cycles to finish — streaming/ivf.py's retention
    contract). WRITER-EXCLUSIVE like ivf's compact: run it from the
    ingest loop (spans_foreach_batch's compact_every does) or with
    ingest paused. Returns the distinct row count published.

    Crash windows: before the flip, an orphan next-epoch directory
    (overwritten by the retried compact); after it, at worst un-GC'd
    epochs — both heal on the next compact."""
    if not is_epoch_store(root):
        raise ValueError(
            f"{root} is a legacy bare-parquet span store; compaction "
            "requires the epoch'd layout (init_span_store). Migrate by "
            "writing its rows into a fresh epoch'd root."
        )
    meta = _read_span_meta(root)
    epoch = int(meta["epoch"])
    new_epoch = epoch + 1
    from pyspark.sql import Observation

    obs = Observation()
    rows = spark.read.parquet(_epoch_path(root, epoch)).distinct()
    if os.path.isdir(_span_tomb_path(root)):
        # physical erasure of tombstoned docs' rows rides the rewrite
        # (round 10); the tombstone set keeps filtering reads of the
        # retained superseded epochs until they expire
        rows = rows.join(
            F.broadcast(span_tombstones(spark, root)), "doc_id", "left_anti"
        )
    (
        rows.observe(obs, F.count(F.lit(1)).alias("n"))
        # overwrite clears a crashed prior attempt's residue (the dir is
        # unpublished until the sidecar flip below)
        .write.mode("overwrite")
        .parquet(_epoch_path(root, new_epoch))
    )
    n = int(obs.get["n"])
    # re-read at the publish point (belt-and-braces under the
    # writer-exclusive contract: never revert a ledger line committed
    # while the rewrite job ran)
    meta = _read_span_meta(root)
    meta["epoch"] = new_epoch
    _write_span_meta(root, meta)
    import re
    import shutil

    for name in os.listdir(root):
        m = re.fullmatch(r"store-(\d+)", name)
        if m and int(m.group(1)) < new_epoch - keep_epochs:
            shutil.rmtree(os.path.join(root, name))
    return n


def spans_foreach_batch(
    span_store_path: str,
    on_report: Callable[[DataFrame, int], None] | None = None,
    hashed: bool = False,
    compact_every: int | None = None,
    stream_id: str = "s",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch form: per micro-batch of (doc_id, text), probe the
    span store, hand the duplication report to `on_report(df, batch_id)`,
    then append the batch's own DISTINCT key rows so later batches (and
    later duplicates of these docs) are caught.

    Store bootstrap: if `span_store_path` does not exist yet it is
    created as an EPOCH'D store on the first batch (no caller pre-write
    needed — round-8 review; the round-7 form raised AnalysisException
    unless the caller pre-created an empty parquet store). A path that
    already holds a legacy bare-parquet store keeps the legacy behavior
    verbatim: plain appends, `hashed`/`compact_every` must be off.

    Epoch'd extras: `compact_every=N` runs compact_span_store after
    every N appended batches (the DISTINCT-rewrite bounds the store
    under replays); the sidecar ledger skips the APPEND of a replayed
    batch id (at or below its stream's committed line) while still
    emitting its report — existence semantics make the report identical
    either way. `stream_id` namespaces ledger lines exactly like
    streaming/ivf.py: point a FRESH checkpoint at an existing store with
    a NEW stream_id, or its restarted batch 0 would be ledger-skipped.
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1 or None")

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        legacy = os.path.exists(span_store_path) and not is_epoch_store(
            span_store_path
        )
        if legacy:
            if hashed or compact_every is not None:
                raise ValueError(
                    "hashed keys / compaction need the epoch'd store "
                    f"layout, but {span_store_path} is a legacy "
                    "bare-parquet store"
                )
            store = spark.read.parquet(span_store_path)
            report = probe_spans_against_store(batch_df, store)
            if on_report is not None:
                on_report(report, batch_id)
            keyed, keys = span_keys(batch_df, hashed=False)
            keyed.select(*keys, "doc_id").distinct().write.mode(
                "append"
            ).parquet(span_store_path)
            return
        meta = init_span_store(spark, span_store_path, hashed=hashed)
        if bool(meta.get("hashed", False)) != bool(hashed):
            raise ValueError(
                f"store {span_store_path} was created with "
                f"hashed={meta.get('hashed')}, got hashed={hashed}"
            )
        store = live_span_store(spark, span_store_path)
        keyed, keys = span_keys(batch_df, hashed=hashed)
        report = _probe_keyed(keyed, store, keys)
        if on_report is not None:
            on_report(report, batch_id)
        ledger = meta.get("last_batch_by_stream") or {}
        if int(batch_id) <= int(ledger.get(stream_id, -1)):
            return  # replay: report re-emitted above, append skipped
        keyed.select(*keys, "doc_id").distinct().write.mode(
            "append"
        ).parquet(_epoch_path(span_store_path, int(meta["epoch"])))
        meta = _read_span_meta(span_store_path)
        led = dict(meta.get("last_batch_by_stream") or {})
        led[stream_id] = max(int(led.get(stream_id, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
        meta["n_appends"] = int(meta.get("n_appends", 0)) + 1
        _write_span_meta(span_store_path, meta)
        if compact_every is not None and meta["n_appends"] % compact_every == 0:
            compact_span_store(spark, span_store_path)

    return fn
