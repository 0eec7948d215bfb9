"""Incremental dedup-CLUSTER maintenance — the streaming form of
operators/graph.py's connected components (VERDICT r7 next #1): documents
arrive as a stream, each micro-batch's verified LSH pairs are folded into
a persisted (doc_id -> cluster) map with a union-find-style merge, and the
map is epoch-published (streaming/ivf.py's scheme) so probes never see a
half-written state. A real ingesting pipeline previously had to re-run
full batch CC over the whole corpus to refresh cluster membership; this
folds each batch at batch cost.

Store layout (root directory + one JSON sidecar):

  base-NNNNNN/          the materialized map, parquet PARTITIONED BY
                        `bucket` (= pmod(xxhash64(doc_id), N_BUCKETS)):
                        a fold's root-lookup for its touched docs reads
                        ONLY those docs' buckets (static partition
                        pruning — the probe_index discipline). Rewritten
                        only by compaction, which publishes a NEW epoch.
  delta-EEEEEE-TAG/     per-fold appends (doc_id, cluster) for the
                        batch's newly-paired docs. Tied to base epoch
                        EEEEEE; TAG is '{stream}-{batch}' (deterministic
                        => a crashed fold's retry overwrites its own dir)
                        or 'f-{n}' for direct batch-less folds.
  _cluster_meta.json    {base_epoch, deltas (fold order), translations,
                        last_batch_by_stream, n_folds}

LAZY RELABELING is the load-bearing design choice: when a fold merges
clusters, it does NOT rewrite their members. It records root
TRANSLATIONS (old_root -> new_root) in the sidecar; stored rows keep
their stale root, and every read applies the translations' transitive
closure (driver-computed over the small sidecar list, one broadcast
join). This is union-find's path-compression deferred to read time —
compaction is the compression pass: it materializes the fully-resolved
map into a new base epoch and resets the translation log. Correctness of
the closure: a translation target is its component's min, strictly below
the translated root, and a component can never lose members — so a
translated-away root can never reappear as any row's label, and applying
the closure to EVERY row (stale or fresh) is a no-op except on stale
ones. The translation log is bounded by merges since the last
compaction.

THE MERGE IS EXACT: the resolved invariant is that every stored doc
resolves to its component's root (= min doc_id, operators/graph.py's
label) and every resolved root is the min of its own component. A
batch's pairs touch a bounded doc set; joining those docs' CURRENT
resolved roots with the pairs forms a mini-graph whose CC labels are
provably the true labels of the MERGED components (each old component's
min IS its resolved root, and that root is a vertex of the mini-graph,
so the mini-min equals the global min). The mini-graph is batch-sized,
so it is solved by a DRIVER-SIDE union-find in one collect (union-by-min
+ path compression, _union_find — the same fixpoint as
operators/graph.py at O(E α) instead of diameter-many Spark rounds);
a pathological giant batch (> DRIVER_CC_CAP pairs) falls back to the
distributed CC. By induction the resolved map
after any fold sequence equals batch CC over the union of all pairs —
the equivalence the registered query dedup_incremental_clusters
oracle-checks and tests/test_streaming_clusters.py pins per
interleaving.

Folding is IDEMPOTENT by algebra (re-folding already-merged pairs yields
an empty translation set and identical labels) and the sidecar ledger
skips replayed batch ids outright, so at-least-once delivery never
corrupts the map.

Per-batch cost bound (SCALE.md §18): the pair probe is |batch| x bands
rows against the bucketed band store; the root lookup reads only the
touched docs' base buckets plus the (recent, small) deltas; mini-CC runs
over O(|pairs|) edges for component-diameter rounds; the delta write is
O(touched docs) rows; the translation append is O(merged roots).
Nothing scans the full corpus or the full map — compaction is the one
full-map pass and runs on the OPTIMIZE cadence, not per batch.

No counterpart in the reference (its stream is CDC rows, not documents) —
this is the EXTENSION family's streaming form, completing the trio with
streaming/dedup.py (pair detection) and streaming/spans.py (span store).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_rs_spark.operators.graph import connected_components
from cdc_rs_spark.parallel import run_parallel

_META = "_cluster_meta.json"
N_BUCKETS = 64  # base-map partition buckets (pruned by the fold's lookup)


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


def _base_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"base-{epoch:06d}")


def _bucket(col: str = "doc_id") -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(N_BUCKETS)).cast("int")


_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _py_bucket(doc_id: int) -> int:
    """Driver-side twin of _bucket: XXH64 of one 8-byte block (the long's
    two's-complement form), seed 42 — exactly Spark's xxhash64(bigint)
    (XXH64.hashLong specialization), then pmod. Round 12: fold_pairs and
    remove_docs know their touched ids driver-side already, so computing
    the prune buckets here removes one Spark job per fold
    (tests/test_cluster_fold_durability.py pins equality vs the JVM over
    a signed id sweep)."""
    v = doc_id & _M64
    h = (42 + _XXH_P5 + 8) & _M64
    k1 = (v * _XXH_P2) & _M64
    k1 = ((k1 << 31) | (k1 >> 33)) & _M64
    k1 = (k1 * _XXH_P1) & _M64
    h ^= k1
    h = ((((h << 27) | (h >> 37)) & _M64) * _XXH_P1 + _XXH_P4) & _M64
    h ^= h >> 33
    h = (h * _XXH_P2) & _M64
    h ^= h >> 29
    h = (h * _XXH_P3) & _M64
    h ^= h >> 32
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return signed % N_BUCKETS


def _write_base(labels: DataFrame, path: str) -> None:
    (
        labels.select("doc_id", "cluster")
        .withColumn("bucket", _bucket("doc_id"))
        # one file per non-empty bucket: lookups read few, dense files
        # (the lists-store discipline of streaming/ivf.py)
        .repartition(N_BUCKETS, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def init_cluster_store(
    spark: SparkSession,
    root: str,
    labels: DataFrame | None = None,
    threshold: float | None = None,
) -> dict:
    """Bootstrap the store: `labels` is the batch CC output over the
    pre-stream corpus ((doc_id, cluster) with cluster = component min),
    or None for an empty map. Idempotent re-run: overwrites epoch 0 and
    resets the sidecar. `threshold` records the similarity bar the
    store's pairs were verified at; once set (here or by the first
    clusters_foreach_batch fold), remove_docs REFUSES a different value —
    a recompute under a different bar would silently break the
    streamed==batch invariant (ADVICE r10)."""
    os.makedirs(root, exist_ok=True)
    if labels is None:
        labels = spark.createDataFrame([], "doc_id bigint, cluster bigint")
    _write_base(labels, _base_path(root, 0))
    meta = {
        "base_epoch": 0,
        "deltas": [],
        "translations": [],
        "last_batch_by_stream": {},
        "n_folds": 0,
    }
    if threshold is not None:
        meta["threshold"] = float(threshold)
    _write_meta(root, meta)
    return meta


def _check_threshold(root: str, threshold: float) -> None:
    """Pin the store-wide similarity bar: first caller records it, later
    callers must match (ADVICE r10 — remove_docs taking a free-parameter
    threshold could silently recompute affected clusters under a
    different bar)."""
    meta = _read_meta(root)
    got = meta.get("threshold")
    if got is None:
        meta["threshold"] = float(threshold)
        _write_meta(root, meta)
    elif float(got) != float(threshold):
        raise ValueError(
            f"cluster store at {root} was built at threshold={got}; "
            f"refusing to fold/recompute at threshold={threshold}"
        )


def _closure(translations: list) -> dict[int, int]:
    """Driver-side transitive closure of the sidecar translation log.
    Each old root appears at most once as a key (once translated away it
    can never become a root again — module doc), so the closure is a
    simple chase; targets strictly decrease, so chains terminate."""
    t = {int(a): int(b) for a, b in translations}
    out = {}
    for k in t:
        v = t[k]
        while v in t:
            v = t[v]
        out[k] = v
    return out


def _apply_closure(df: DataFrame, closure: dict[int, int]) -> DataFrame:
    """Rewrite stale roots through the closure: one broadcast join over
    the (merges-since-compaction)-sized table; fresh labels miss and pass
    through."""
    if not closure:
        return df
    spark = df.sparkSession
    tr = spark.createDataFrame(
        sorted(closure.items()), "old_cluster bigint, new_cluster bigint"
    )
    return (
        df.join(
            F.broadcast(tr),
            df["cluster"] == tr["old_cluster"],
            "left",
        )
        .select(
            df["doc_id"],
            F.coalesce("new_cluster", df["cluster"]).alias("cluster"),
        )
    )


# max isin-list width pushed into the scans: each literal is a py4j
# round-trip at plan-build time (~0.3 ms), so a wide list costs SECONDS of
# driver time before any job runs (measured: 20k ids ~ 8 s on the
# boilerplate fold) — past this width the join's own filtering wins
_IDS_PUSHDOWN_CAP = 1_000


def _raw_union(
    spark: SparkSession,
    root: str,
    meta: dict,
    buckets: list[int] | None,
    ids: list[int] | None = None,
) -> DataFrame:
    """The PRE-aggregation store view: base (optionally bucket-pruned) +
    deltas, each row tagged with its fold sequence (`_seq`); latest fold
    wins per doc — the latest-wins reduction itself is the caller's
    (distributed in _raw_rows; driver-side in fold_pairs' fast arm,
    round 13, where the touched set is id-pushdown-bounded and a groupBy
    exchange over <= 1000 keys is pure overhead).

    Round 12: callers that already hold the touched doc ids driver-side
    (fold_pairs' driver mode, remove_docs) pass `ids` — the isin
    predicate pushes into every parquet scan (row-group stats +
    dictionary filtering), so downstream work carries only the touched
    docs' rows instead of whole buckets. Per-doc latest-wins is
    row-independent, so pre-filtering is exact."""
    id_filter = (
        F.col("doc_id").isin(ids)
        if ids is not None and len(ids) <= _IDS_PUSHDOWN_CAP
        else None
    )
    # explicit schema: an EMPTY bootstrap base writes only partition
    # metadata (no data files), which schema inference rejects
    base = spark.read.schema("doc_id bigint, cluster bigint, bucket int").parquet(
        _base_path(root, int(meta["base_epoch"]))
    )
    if buckets is not None:
        base = base.filter(F.col("bucket").isin(buckets))
    if id_filter is not None:
        base = base.filter(id_filter)
    frames = [
        base.select(
            "doc_id", "cluster", F.lit(False).alias("dead"),
            F.lit(0).alias("_seq"),
        )
    ]
    # explicit schema for deltas too: pre-round-10 test fixtures (and any
    # delta written before the dead column existed) read as dead=NULL ->
    # coalesced to alive
    dschema = "doc_id bigint, cluster bigint, dead boolean"
    for i, name in enumerate(meta["deltas"]):
        d = spark.read.schema(dschema).parquet(os.path.join(root, name))
        if id_filter is not None:
            d = d.filter(id_filter)
        frames.append(
            d.select(
                "doc_id",
                "cluster",
                F.coalesce("dead", F.lit(False)).alias("dead"),
                F.lit(i + 1).alias("_seq"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _raw_rows(
    spark: SparkSession,
    root: str,
    meta: dict,
    buckets: list[int] | None,
    ids: list[int] | None = None,
) -> DataFrame:
    """base + deltas latest-wins per doc (distributed reduction over
    _raw_union). Round 10: deltas carry a `dead` flag — a removal delta's
    latest-wins row EVICTS the doc (the row and every stale base row
    beneath it vanish from the resolved view); the base never stores
    dead rows (compaction drops them — physical erasure)."""
    out = _raw_union(spark, root, meta, buckets, ids=ids)
    return (
        out.groupBy("doc_id")
        .agg(F.max_by(F.struct("cluster", "dead"), "_seq").alias("_s"))
        .filter(~F.col("_s.dead"))
        .select("doc_id", F.col("_s.cluster").alias("cluster"))
    )


def live_cluster_map(spark: SparkSession, root: str) -> DataFrame:
    """The resolved (doc_id -> cluster) map: base + deltas latest-wins,
    stale roots rewritten through the translation closure. Docs never
    seen in a pair have no entry (matching the batch CC query's output
    shape — singletons are implicit). Snapshot-consistent: one atomic
    sidecar read names every directory; superseded epochs are retained
    through `keep_epochs` further compactions."""
    meta = _read_meta(root)
    return _apply_closure(
        _raw_rows(spark, root, meta, None),
        _closure(meta.get("translations") or []),
    )


DRIVER_CC_CAP = 2_000_000  # pairs per fold handled by driver union-find


def _tomb_path(root: str) -> str:
    """Resolve the live tombstone directory: the sidecar's `tomb_dir` key
    names it (set by purge_band_stores' compaction / readmit_docs'
    rewrite — both publish a NEW directory with one atomic meta replace);
    'tomb' is the pre-compaction default."""
    try:
        name = _read_meta(root).get("tomb_dir") or "tomb"
    except FileNotFoundError:
        name = "tomb"
    return os.path.join(root, name)


def tombstones(spark: SparkSession, root: str) -> DataFrame:
    """The cumulative removed-doc set (round 10, VERDICT r9 next #1) —
    one skinny (doc_id) parquet dir, appended by remove_docs. It is the
    store's RESURRECTION GUARD: the band/shingle stores still carry a
    removed doc's rows until purge_band_stores rewrites them, so every
    pair fold anti-joins candidates against this set — a future batch
    can match a removed doc's bands but can never re-enter it into the
    map. Bounded by total deletes, not corpus size, and DEDUPED at purge
    time (purge_band_stores compacts it to distinct ids). The set is NOT
    truncated after physical purge (ADVICE r10 suggested it): the stores
    stop carrying removed rows, but an at-least-once UPSTREAM can re-send
    a forgotten doc's insert any time later, and only this set blocks
    that re-ingestion — the explicit un-forget path is readmit_docs."""
    p = _tomb_path(root)
    if not os.path.isdir(p):
        return spark.createDataFrame([], "doc_id bigint")
    return spark.read.schema("doc_id bigint").parquet(p)


def _filter_tombstoned(pairs: DataFrame, root: str) -> DataFrame:
    """Drop pairs touching a removed doc. No-op (no scan) before the
    first removal; the tombstone side is BROADCAST (delete-bounded and
    purge-compacted — the IVF twin _drop_tombstoned's discipline,
    ADVICE r10)."""
    if not os.path.isdir(_tomb_path(root)):
        return pairs
    tomb = F.broadcast(tombstones(pairs.sparkSession, root))
    return (
        pairs.join(
            tomb.withColumnRenamed("doc_id", "id_a"), "id_a", "left_anti"
        ).join(
            tomb.withColumnRenamed("doc_id", "id_b"), "id_b", "left_anti"
        )
    )


# ---- band/shingle/group store resolution (round 11) ------------------------
#
# The sig/shingle/group stores are bare append directories; purge_band_stores
# rewrites them minus the tombstoned docs. The round-10 swap (rmtree + rename)
# had a crash window that LOST the store — and remove_docs silently treated a
# missing store as "no pairs", relabeling surviving members to singletons
# (ADVICE r10, medium). Now the rewrite goes to a VERSIONED SIBLING
# (`{path}.v{N}`) and a one-line pointer file (`{path}.current`) flips
# atomically (os.replace); every reader and appender resolves through the
# pointer. A store that has never been purged stays the bare directory
# (pointer absent), so pre-round-11 layouts read unchanged.


def _resolve_store(path: str) -> str:
    ptr = path + ".current"
    if os.path.exists(ptr):
        with open(ptr) as f:
            return path + "." + f.read().strip()
    return path


def _flip_store(path: str, version: int) -> None:
    """Atomically point `path` at its `.v{version}` sibling, then GC every
    superseded sibling (and the bare dir). Crash before the replace leaves
    an orphan sibling the next purge overwrites; crash after it leaves
    stale directories the next flip GCs — never a missing store."""
    ptr = path + ".current"
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v{version:06d}")
    os.replace(tmp, ptr)
    keep = os.path.basename(path) + f".v{version:06d}"
    parent = os.path.dirname(path) or "."
    base = os.path.basename(path)
    for name in os.listdir(parent):
        if name == base or (
            re.fullmatch(re.escape(base) + r"\.v\d+", name) and name != keep
        ):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def _group_path(sig_store_path: str, group_store_path: str | None) -> str:
    """The exact-text group store rides next to the signature store by
    convention (callers that pass sig/sh paths everywhere don't need a
    fourth path threaded through)."""
    return group_store_path or (sig_store_path + "_groups")


_GROUP_SCHEMA = "gkey string, doc_id bigint, delegate boolean"


def _gkey(text_col: str = "text") -> F.Column:
    return F.md5(F.col(text_col).cast("binary"))


def _union_find(edges) -> dict[int, int]:
    """Driver-side union-find with union-by-min and path compression:
    labels = min doc_id of each component — exactly
    operators/graph.connected_components' fixpoint, at O(E α) for one
    in-memory pass. Used for batch-sized mini-graphs (micro-batch pair
    sets); the distributed CC remains the fallback above DRIVER_CC_CAP."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def fold_pairs(
    spark: SparkSession,
    root: str,
    pairs: DataFrame,
    batch_id: int | None = None,
    stream_id: str = "s",
    max_iter: int = 64,
    before_publish: Callable[[], object] | None = None,
) -> dict:
    """Union-find-style fold of one batch's verified duplicate pairs
    (id_a, id_b) into the persisted map. Returns stats {n_pairs,
    n_new_entries, n_merges, skipped_duplicate}.

    Steps (module doc has the correctness argument):
      1. ledger guard: replayed batch ids are skipped outright;
      2. the touched docs' current roots come from a bucket-PRUNED base
         read + the small deltas, then the translation closure;
      3. union-find over pairs + (doc -> root) edges yields the merged
         labels — driver-side (_union_find; the pair set is batch-bounded
         and collected in one action) up to DRIVER_CC_CAP, distributed
         mini-CC (operators/graph.py) above it;
      4. roots whose label moved become new translation entries (lazy
         relabeling — members are never rewritten);
      5. one delta directory of the touched docs' labels is written,
         THEN the sidecar publishes delta + translations + ledger in one
         atomic replace. A crash between 5a and 5b leaves an orphan
         delta dir that the retried fold overwrites (deterministic
         name) — never a half-applied merge."""
    meta = _read_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    if batch_id is not None and int(batch_id) <= int(
        ledger.get(stream_id, -1)
    ):
        return {
            "n_pairs": 0,
            "n_new_entries": 0,
            "n_merges": 0,
            "skipped_duplicate": True,
        }
    epoch = int(meta["base_epoch"])
    tag = (
        f"{stream_id}-{batch_id}"
        if batch_id is not None
        else f"f-{int(meta['n_folds'])}"
    )
    delta_name = f"delta-{epoch:06d}-{tag}"
    pairs = (
        pairs.select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    # resurrection guard: a pair touching a removed doc never folds
    pairs = _filter_tombstoned(pairs, root)
    # ONE action materializes the batch-bounded pair set driver-side for
    # the union-find (a micro-batch's verified pairs are the definition
    # of count-bounded); a pathological giant batch falls back to the
    # distributed mini-CC below, re-running the pair plan once
    pair_rows = pairs.limit(DRIVER_CC_CAP + 1).collect()
    driver_mode = len(pair_rows) <= DRIVER_CC_CAP
    if driver_mode:
        n_pairs = len(pair_rows)
    else:
        pairs = pairs.localCheckpoint(eager=True)
        n_pairs = pairs.count()
    if n_pairs == 0:
        # publish the ledger line even for a pair-less batch, so a replay
        # of it is still recognized
        if batch_id is not None:
            if before_publish is not None:
                before_publish()
            led = dict(ledger)
            led[stream_id] = max(int(led.get(stream_id, -1)), int(batch_id))
            meta["last_batch_by_stream"] = led
            _write_meta(root, meta)
        return {
            "n_pairs": 0,
            "n_new_entries": 0,
            "n_merges": 0,
            "skipped_duplicate": False,
        }
    if driver_mode:
        touched_ids = sorted(
            {
                int(x)
                for r in pair_rows
                for x in (r["id_a"], r["id_b"])
            }
        )
        # static pruning, zero Spark jobs: the touched ids are already
        # driver-side, so their buckets are a pure-Python map (round 12 —
        # _py_bucket is the JVM xxhash64's pinned twin)
        buckets = sorted({_py_bucket(i) for i in touched_ids})
    else:
        touched = pairs.select(
            F.explode(F.array("id_a", "id_b")).alias("doc_id")
        ).distinct()
        # the touched docs' buckets are a <= N_BUCKETS-row collect; the
        # base read below touches only those directories
        buckets = sorted(
            int(r["b"])
            for r in touched.select(_bucket("doc_id").alias("b"))
            .distinct()
            .collect()
        )
    closure = _closure(meta.get("translations") or [])
    if driver_mode and len(touched_ids) <= _IDS_PUSHDOWN_CAP:
        # FAST ARM (round 13, VERDICT r12 next #4): the current-root
        # lookup used to be a second distributed job — pruned scan ->
        # latest-wins groupBy exchange -> closure broadcast join ->
        # touched broadcast join -> collect. With the touched set small
        # enough for isin pushdown, the scan output is id-bounded
        # (<= |ids| x (1 + deltas) skinny rows), so collect the RAW
        # pre-aggregation rows in ONE exchange-free stage and do
        # latest-wins + closure + the left-join coalesce in Python.
        # Same semantics (per-doc latest fold wins, dead evicts, stale
        # roots chase the closure, untracked docs root to themselves);
        # the per-fold plan loses one exchange, two broadcast builds and
        # a createDataFrame round-trip.
        raw_rows = _raw_union(
            spark, root, meta, buckets, ids=touched_ids
        ).collect()
        best: dict[int, tuple] = {}
        for r in raw_rows:
            prev = best.get(r["doc_id"])
            if prev is None or r["_seq"] > prev[0]:
                best[int(r["doc_id"])] = (
                    int(r["_seq"]), int(r["cluster"]), bool(r["dead"]),
                )
        cur_map = {
            doc: closure.get(c, c)
            for doc, (_s, c, dead) in best.items()
            if not dead
        }
        lab = _union_find(
            [(int(r["id_a"]), int(r["id_b"])) for r in pair_rows]
            + [(i, cur_map.get(i, i)) for i in touched_ids]
        )
        new_translations = sorted(
            (c, lab[c])
            for c in {cur_map.get(i, i) for i in touched_ids}
            if lab[c] != c
        )
        delta = spark.createDataFrame(
            sorted(lab.items()), "doc_id bigint, cluster bigint"
        )
    elif driver_mode:
        touched = spark.createDataFrame(
            [(i,) for i in touched_ids], "doc_id bigint"
        )
        current = _apply_closure(
            _raw_rows(spark, root, meta, buckets, ids=touched_ids),
            closure,
        )
        cur = touched.join(current, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster", "doc_id").alias("cluster")
        )
        # union-find over pairs + (doc -> current root) edges: one
        # touched-bounded collect for the lookup, zero iterative jobs
        cur_rows = cur.collect()
        lab = _union_find(
            [(int(r["id_a"]), int(r["id_b"])) for r in pair_rows]
            + [(int(r["doc_id"]), int(r["cluster"])) for r in cur_rows]
        )
        new_translations = sorted(
            (c, lab[c])
            for c in {int(r["cluster"]) for r in cur_rows}
            if lab[c] != c
        )
        delta = spark.createDataFrame(
            sorted(lab.items()), "doc_id bigint, cluster bigint"
        )
    else:
        current = _apply_closure(
            _raw_rows(spark, root, meta, buckets), closure
        )
        cur = touched.join(current, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster", "doc_id").alias("cluster")
        )
        mini_edges = pairs.select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        ).unionByName(
            cur.select(
                F.col("doc_id").alias("a"), F.col("cluster").alias("b")
            )
        )
        labels = connected_components(mini_edges, "a", "b", max_iter=max_iter)
        # roots whose label moved -> translation entries. Count-bounded
        # collect (<= touched roots, themselves <= 2 x |pairs|).
        new_translations = [
            (int(r["v"]), int(r["component"]))
            for r in cur.select(F.col("cluster").alias("v"))
            .distinct()
            .join(labels, "v")
            .filter(F.col("component") != F.col("v"))
            .collect()
        ]
        delta = labels.select(
            F.col("v").alias("doc_id"), F.col("component").alias("cluster")
        )
    from pyspark.sql import Observation

    obs = Observation()
    (
        delta.withColumn("dead", F.lit(False))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")  # retry of a crashed fold overwrites
        .parquet(os.path.join(root, delta_name))
    )
    n_delta = int(obs.get["n"])
    # the commit barrier (round 12): a caller may overlap an independent
    # durable write (the group-store append) with this fold's pair
    # collect; it passes the write's join here so the ledger line below —
    # the batch's commit point — can never land before that write is
    # durable. A failure in the overlapped write raises HERE, pre-commit,
    # exactly as the sequential ordering failed.
    if before_publish is not None:
        before_publish()
    meta = _read_meta(root)  # re-read at publish (ledger lines may move)
    if delta_name not in meta["deltas"]:
        meta["deltas"] = list(meta["deltas"]) + [delta_name]
        # LSM-style size accounting (round 12): the auto-compaction
        # trigger compares rows-appended-since-compact to the base size
        meta["rows_since_compact"] = (
            int(meta.get("rows_since_compact", 0)) + int(n_delta)
        )
    meta["translations"] = list(meta.get("translations") or []) + [
        [a, b] for a, b in new_translations
    ]
    if batch_id is not None:
        led = dict(meta.get("last_batch_by_stream") or {})
        led[stream_id] = max(int(led.get(stream_id, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
    meta["n_folds"] = int(meta["n_folds"]) + 1
    _write_meta(root, meta)
    return {
        "n_pairs": int(n_pairs),
        "n_new_entries": int(n_delta),
        "n_merges": len(new_translations),
        "skipped_duplicate": False,
    }


def remove_docs(
    spark: SparkSession,
    root: str,
    removed: DataFrame,
    sig_store_path: str | None = None,
    shingle_store_path: str | None = None,
    threshold: float = 0.5,
    batch_id: int | None = None,
    stream_id: str = "s",
    max_iter: int = 64,
    group_store_path: str | None = None,
) -> dict:
    """CDC-delete fold (round 10, VERDICT r9 next #1): remove a batch of
    documents from the persisted cluster map, EXACTLY — after this fold,
    live_cluster_map equals batch CC over the verified pairs among the
    SURVIVING documents, the invariant dedup_clusters_retraction
    oracle-checks. The hard case is an ARTICULATION DOC: a removed doc
    may be the only bridge between two halves of its cluster, so its
    remaining members must SPLIT. Deletion therefore cannot be lazy the
    way merges are (a merge only renames roots; a delete changes the
    edge set), and the fold recomputes the affected components eagerly:

      1. ledger gate, then the removed ids append to the tombstone set
         (append-FIRST: a crash before publish leaves replayable state,
         and duplicate tombstone rows are harmless under existence
         semantics);
      2. the removed docs' current roots resolve via the bucket-pruned
         lookup — docs with no entry are pure tombstone appends;
      3. ALL members of the affected clusters are gathered (one
         column-pruned scan of the label map filtered on the affected
         roots — the map is (doc_id, cluster) rows, ~16 B each, so this
         is a scan of labels, never of corpus text; a delete batch is
         request-sized and the cadence is takedown/GDPR cadence, so the
         scan amortizes, and the alternative — a cluster->docs inverted
         index — would double every fold's write path to save it);
      4. pairs among the SURVIVING members are recomputed from the
         band + shingle stores restricted to those ids (append-only
         stores reproduce every fold-time candidate deterministically;
         restricting both sides is lossless because any store pair
         crossing an affected-cluster boundary would already have merged
         the clusters). Round 11: the recompute is EXACT-DUP COLLAPSED —
         with a group store (the clusters_foreach_batch discipline) the
         band join runs over the affected groups' live DELEGATES only,
         plus hub-star edges among each group's live members (identical
         text => Jaccard exactly 1.0, no verify needed), and a group
         whose delegate was removed RE-ELECTS its min live member (the
         dead delegate's band/shingle rows — identical for any member —
         are copied under the new id before the purge erases them).
         Without a group store (legacy full-population stores, e.g. the
         GDPR pipeline's batch-built stores) the same collapse runs
         in-flight on the stored shingle array (identical text =>
         identical array). Either way the candidate self-join is over
         distinct TEXTS, never members — a boilerplate cluster of 1e5
         copies recomputes through one delegate (VERDICT r10 next #1;
         the old "duplicate clusters are small by construction" claim
         was false for exactly that corpus). A sig_store_path that is
         GIVEN but missing on disk now raises instead of silently
         relabeling every surviving member to a singleton (ADVICE r10);
         passing None remains the explicit "this map has no band store"
         contract. The threshold must match the store-recorded bar
         (_check_threshold, ADVICE r10);
      5. mini-CC over those pairs (driver union-find to DRIVER_CC_CAP,
         distributed CC above) yields the post-delete labels: paired
         members relabel to their new component min, unpaired members
         DROP their entry (singletons are implicit), removed docs write
         `dead` rows that latest-wins-evict them from every read;
      6. translation entries funneling into an affected root are pruned:
         every doc that ever resolved through one is a member and just
         got a fresh latest-wins row, so the entries are dead weight —
         and keeping them would mislabel a member whose NEW component
         min coincides with a translated-away old root.

    The band/shingle stores still hold the removed docs' rows until
    purge_band_stores; the tombstone set blocks resurrection in every
    later fold (fold_pairs filters candidate pairs against it)."""
    meta = _read_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    noop = {
        "n_removed": 0,
        "n_affected_clusters": 0,
        "n_relabeled": 0,
        "n_dropped_singletons": 0,
        "skipped_duplicate": True,
    }
    if batch_id is not None and int(batch_id) <= int(
        ledger.get(stream_id, -1)
    ):
        return noop
    _check_threshold(root, threshold)
    epoch = int(meta["base_epoch"])
    tag = (
        f"{stream_id}-{batch_id}"
        if batch_id is not None
        else f"f-{int(meta['n_folds'])}"
    )
    delta_name = f"delta-{epoch:06d}-{tag}"
    # a delete batch is REQUEST-BOUNDED by contract (takedown/GDPR
    # cadence), so one collect materializes it driver-side: every later
    # use is a local relation (broadcast-trivial), the row count and the
    # prune buckets are free, and the old checkpoint+count+bucket-collect
    # trio of driver actions collapses to this single one (round 12)
    removed_ids = sorted(
        int(r["doc_id"])
        for r in removed.select(
            F.col("doc_id").cast("bigint").alias("doc_id")
        )
        .distinct()
        .collect()
    )
    removed = spark.createDataFrame(
        [(i,) for i in removed_ids], "doc_id bigint"
    )
    n_removed = len(removed_ids)
    # 1. tombstones append-first (idempotent: duplicates are harmless)
    removed.write.mode("append").parquet(_tomb_path(root))
    # 2. the removed docs' current roots (bucket-pruned + closure)
    buckets = sorted({_py_bucket(i) for i in removed_ids})
    closure = _closure(meta.get("translations") or [])
    if len(removed_ids) <= _IDS_PUSHDOWN_CAP:
        # FAST ARM (round 13, the fold_pairs driver-mode pattern): the
        # id-pushdown-bounded raw rows collect in one exchange-free
        # stage; latest-wins + dead-eviction + closure run in Python —
        # the distributed form paid a groupBy exchange plus two
        # broadcast joins per delete fold for <= |request| keys.
        best: dict[int, tuple] = {}
        for r in _raw_union(
            spark, root, meta, buckets, ids=removed_ids
        ).collect():
            prev = best.get(r["doc_id"])
            if prev is None or r["_seq"] > prev[0]:
                best[int(r["doc_id"])] = (
                    int(r["_seq"]), int(r["cluster"]), bool(r["dead"]),
                )
        affected = sorted(
            {
                closure.get(c, c)
                for _doc, (_s, c, dead) in best.items()
                if not dead
            }
        )
    else:
        resolved_removed = removed.join(
            _apply_closure(
                _raw_rows(spark, root, meta, buckets, ids=removed_ids),
                closure,
            ),
            "doc_id",
        )
        # affected roots: <= one per removed doc — request-bounded collect
        affected = sorted(
            int(r["cluster"])
            for r in resolved_removed.select("cluster").distinct().collect()
        )

    def publish(delta: DataFrame, translations) -> tuple[int, int]:
        """Write the delta once; the row count AND the live/dead split
        ride the same action as Observation metrics (round 12 — the old
        form ran `relabeled.count()` + `dropped.count()` as two extra
        actions, executing the delta subtree three times per delete
        fold). Returns (n_rows, n_alive)."""
        from pyspark.sql import Observation

        obs = Observation()
        (
            delta.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("dead"), F.lit(0)).otherwise(F.lit(1))
                ).alias("n_alive"),
            )
            .write.mode("overwrite")  # crashed-retry overwrites
            .parquet(os.path.join(root, delta_name))
        )
        m = _read_meta(root)
        if delta_name not in m["deltas"]:
            m["deltas"] = list(m["deltas"]) + [delta_name]
            m["rows_since_compact"] = (
                int(m.get("rows_since_compact", 0)) + int(obs.get["n"])
            )
        m["translations"] = translations
        if batch_id is not None:
            led = dict(m.get("last_batch_by_stream") or {})
            led[stream_id] = max(
                int(led.get(stream_id, -1)), int(batch_id)
            )
            m["last_batch_by_stream"] = led
        m["n_folds"] = int(m["n_folds"]) + 1
        _write_meta(root, m)
        return int(obs.get["n"]), int(obs.get["n_alive"] or 0)

    dead_removed = removed.select(
        "doc_id", F.lit(0).cast("bigint").alias("cluster"),
        F.lit(True).alias("dead"),
    )
    if not affected:
        # no removed doc had an entry: tombstones + dead rows only
        publish(dead_removed, list(meta.get("translations") or []))
        return {
            **noop,
            "n_removed": int(n_removed),
            "skipped_duplicate": False,
        }
    # 3. all members of the affected clusters (resolved view, full scan
    # of the label map — see docstring for the cost argument)
    aff_df = F.broadcast(
        spark.createDataFrame([(a,) for a in affected], "cluster bigint")
    )
    members = _apply_closure(
        _raw_rows(spark, root, meta, None), closure
    ).join(aff_df, "cluster")
    live_members = members.join(
        tombstones(spark, root), "doc_id", "left_anti"
    ).select("doc_id").localCheckpoint(eager=True)
    # 4. recompute the surviving members' pairs from the band stores,
    # exact-dup collapsed (docstring) — delegates self-join, hub-star
    # edges reconnect identical-text members
    def _rep_band_pairs(sig_all, sh_all, reps):
        from cdc_rs_spark.operators.dedup import jaccard_verify

        sig = sig_all.join(reps, "doc_id")
        cand = (
            sig.select(F.col("doc_id").alias("id_a"), "band", "bkey")
            .join(
                sig.select(F.col("doc_id").alias("id_b"), "band", "bkey"),
                ["band", "bkey"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sh = sh_all.join(reps, "doc_id")
        return jaccard_verify(cand, sh, threshold).select("id_a", "id_b")

    if sig_store_path is not None:
        sig_cur = _resolve_store(sig_store_path)
        sh_cur = _resolve_store(shingle_store_path)
        if not os.path.isdir(sig_cur) or not os.path.isdir(sh_cur):
            raise RuntimeError(
                f"cluster store {root} has {len(affected)} affected "
                f"clusters but the band/shingle store under "
                f"{sig_store_path} is missing — refusing the silent "
                "empty-pairs fallback (it would relabel every surviving "
                "member to a singleton); restore the store or pass "
                "sig_store_path=None to assert it never existed"
            )
        sig_all = spark.read.parquet(sig_cur)
        sh_all = spark.read.parquet(sh_cur)
        gcur = _resolve_store(_group_path(sig_store_path, group_store_path))
        if os.path.isdir(gcur):
            gs = spark.read.schema(_GROUP_SCHEMA).parquet(gcur)
            # join BEFORE distinct (round 13b): the old distinct().join()
            # shuffled the whole corpus-sized group store per delete fold;
            # the live-members join (affected-cluster-bounded, broadcast)
            # prunes first and the dedup exchange runs over affected rows
            # only. Identical result: distinct commutes with an inner
            # equi-join against a duplicate-free key set.
            memb_live = (
                gs.select("gkey", "doc_id")
                .join(live_members, "doc_id")
                .distinct()
            )
            hubs = memb_live.groupBy("gkey").agg(
                F.min("doc_id").alias("hub")
            )
            star = (
                memb_live.join(hubs, "gkey")
                .filter(F.col("doc_id") != F.col("hub"))
                .select(
                    F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b")
                )
            )
            live_dels = (
                gs.filter("delegate")
                .select("gkey", "doc_id")
                .join(live_members, "doc_id")
                .distinct()
            )
            # re-elect: affected groups with live members but no live
            # banded delegate get their hub promoted; the dead delegate's
            # rows (identical content for any member) are copied under
            # the new id BEFORE the purge erases them. Request-bounded
            # collects (<= affected groups / their past delegates).
            need = hubs.join(
                live_dels.select("gkey").distinct(), "gkey", "left_anti"
            )
            need_rows = need.collect()
            if need_rows:
                remap = (
                    gs.filter("delegate")
                    .select("gkey", F.col("doc_id").alias("old_id"))
                    # join-then-distinct (round 13b, same argument as
                    # memb_live: the need set is unique per gkey)
                    .join(
                        F.broadcast(
                            spark.createDataFrame(
                                [(r["gkey"], r["hub"]) for r in need_rows],
                                "gkey string, hub bigint",
                            )
                        ),
                        "gkey",
                    )
                    .distinct()
                    .filter(F.col("old_id") != F.col("hub"))
                    .select("old_id", "hub", "gkey")
                )
                (
                    sig_all.join(
                        remap.select("old_id", "hub"),
                        sig_all["doc_id"] == F.col("old_id"),
                    )
                    .select(
                        F.col("hub").alias("doc_id"), "band", "bkey"
                    )
                    .distinct()
                    .write.mode("append")
                    .parquet(sig_cur)
                )
                (
                    sh_all.join(
                        remap.select("old_id", "hub"),
                        sh_all["doc_id"] == F.col("old_id"),
                    )
                    .select(F.col("hub").alias("doc_id"), "sh")
                    .distinct()
                    .write.mode("append")
                    .parquet(sh_cur)
                )
                spark.createDataFrame(
                    [(r["gkey"], r["hub"], True) for r in need_rows],
                    _GROUP_SCHEMA,
                ).write.mode("append").parquet(gcur)
                sig_all = spark.read.parquet(sig_cur)
                sh_all = spark.read.parquet(sh_cur)
            reps = (
                live_dels.select("doc_id")
                .unionByName(
                    spark.createDataFrame(
                        [(r["hub"],) for r in need_rows], "doc_id bigint"
                    )
                )
                .distinct()
            )
            # MIXED COVERAGE (ADVICE r11, medium): live members with NO
            # membership row predate the group store (ingested before
            # clusters_foreach_batch grew the delegate discipline, then
            # the store was created by a later fold). Excluding them
            # from reps/star silently relabels them to singletons — the
            # exact failure the missing-store RuntimeError guards. Give
            # just those rows the legacy in-flight collapse (identical
            # stored shingle array => identical text) and band their
            # hubs alongside the delegates; a legacy hub whose text
            # matches a grouped delegate's still pairs in the band
            # self-join (identical arrays => identical bands).
            legacy = live_members.join(
                memb_live.select("doc_id").distinct(), "doc_id", "left_anti"
            )
            sh_leg = sh_all.join(legacy, "doc_id").select(
                "doc_id",
                F.md5(F.to_json(F.col("sh")).cast("binary")).alias("skey"),
            )
            lhubs = sh_leg.groupBy("skey").agg(F.min("doc_id").alias("hub"))
            lstar = (
                sh_leg.join(lhubs, "skey")
                .filter(F.col("doc_id") != F.col("hub"))
                .select(
                    F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b")
                )
            )
            reps = reps.unionByName(
                lhubs.select(F.col("hub").alias("doc_id"))
            ).distinct()
            pairs = (
                _rep_band_pairs(sig_all, sh_all, reps)
                .unionByName(star)
                .unionByName(lstar)
            )
        else:
            # legacy full-population stores: collapse in-flight on the
            # stored shingle array (identical text => identical array)
            sh_live = sh_all.join(live_members, "doc_id").select(
                "doc_id",
                # to_json: unambiguous array encoding (a bare concat
                # could collide across shingle boundaries)
                F.md5(F.to_json(F.col("sh")).cast("binary")).alias("skey"),
            )
            hubs = sh_live.groupBy("skey").agg(F.min("doc_id").alias("hub"))
            star = (
                sh_live.join(hubs, "skey")
                .filter(F.col("doc_id") != F.col("hub"))
                .select(
                    F.col("hub").alias("id_a"), F.col("doc_id").alias("id_b")
                )
            )
            reps = hubs.select(F.col("hub").alias("doc_id"))
            pairs = _rep_band_pairs(sig_all, sh_all, reps).unionByName(star)
    else:
        pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    # 5. mini-CC over the recomputed pairs (fold_pairs' dual mode)
    pair_rows = pairs.limit(DRIVER_CC_CAP + 1).collect()
    if len(pair_rows) <= DRIVER_CC_CAP:
        lab = _union_find(
            [(int(r["id_a"]), int(r["id_b"])) for r in pair_rows]
        )
        paired = spark.createDataFrame(
            sorted(lab.items()), "doc_id bigint, cluster bigint"
        )
    else:
        mini = pairs.select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        )
        paired = connected_components(mini, "a", "b", max_iter=max_iter).select(
            F.col("v").alias("doc_id"), F.col("component").alias("cluster")
        )
    relabeled = live_members.join(paired, "doc_id").select(
        "doc_id", "cluster", F.lit(False).alias("dead")
    )
    dropped = live_members.join(paired, "doc_id", "left_anti").select(
        "doc_id", F.lit(0).cast("bigint").alias("cluster"),
        F.lit(True).alias("dead"),
    )
    delta = dead_removed.unionByName(relabeled).unionByName(dropped)
    # 6. prune translations that funnel into an affected root
    aff_set = set(affected)
    kept_translations = [
        [a, b]
        for a, b in (meta.get("translations") or [])
        if closure.get(int(a), int(b)) not in aff_set
    ]
    # one action: the write's Observation carries the live/dead split, so
    # n_relabeled (= live rows) and n_dropped (= dead rows minus the
    # removed docs' own dead rows) no longer re-execute the delta subtree
    n_rows, n_alive = publish(delta, kept_translations)
    return {
        "n_removed": int(n_removed),
        "n_affected_clusters": len(affected),
        "n_relabeled": int(n_alive),
        "n_dropped_singletons": int(n_rows - n_alive - n_removed),
        "skipped_duplicate": False,
    }


def purge_band_stores(
    spark: SparkSession,
    root: str,
    sig_store_path: str,
    shingle_store_path: str,
    group_store_path: str | None = None,
) -> dict:
    """Physically erase tombstoned docs' rows from the band, shingle and
    exact-group stores (the GDPR completion step — until this runs, a
    removed doc's minhash bands persist on disk even though the tombstone
    set blocks them from ever re-entering the map). Round 11 (ADVICE r10,
    medium): the swap is ATOMIC — each store is rewritten minus the
    tombstoned docs into a versioned sibling (`{path}.v{N}`) and a
    one-line pointer file flips with os.replace; readers/appenders
    resolve through _resolve_store, so no crash window can lose a store
    (the old rmtree+rename window let remove_docs silently relabel
    survivors to singletons). Superseded directories are GC'd on the next
    flip. WRITER-EXCLUSIVE like compaction (run between folds).

    The tombstone set itself is COMPACTED here (distinct ids, one dense
    file, published via the sidecar's tomb_dir with an atomic meta
    replace) but NOT truncated: the stores stop carrying removed rows,
    yet only this set blocks an at-least-once upstream from re-ingesting
    a forgotten doc later — un-forgetting is readmit_docs' explicit,
    ledgered job. Returns surviving row counts."""
    from pyspark.sql import Observation

    tomb = tombstones(spark, root)
    stores = [
        (sig_store_path, "sig_rows"),
        (shingle_store_path, "shingle_rows"),
        (_group_path(sig_store_path, group_store_path), "group_rows"),
    ]

    def rewrite(path: str) -> int:
        """One store's rewrite: surviving-row count rides the write as an
        Observation (round 12 — the old form re-read the written parquet
        for a second action per store), and the three stores' rewrites
        are independent directories run concurrently (§2.6)."""
        cur = _resolve_store(path)
        if not os.path.exists(cur):
            return 0
        m = re.fullmatch(re.escape(path) + r"\.v(\d+)", cur)
        nxt = (int(m.group(1)) + 1) if m else 1
        kept = spark.read.parquet(cur).join(tomb, "doc_id", "left_anti")
        sib = f"{path}.v{nxt:06d}"
        obs = Observation()
        kept.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(sib)
        _flip_store(path, nxt)
        return int(obs.get["n"])

    def compact_tomb() -> None:
        # compact the tombstone set: distinct ids, new dir, atomic meta
        # flip. Runs AFTER the rewrites (not overlapped): its final
        # rmtree of the superseded tomb dir must not race the rewrite
        # legs' anti-joins, which read that dir.
        old_tomb = _tomb_path(root)
        if not os.path.isdir(old_tomb):
            return
        meta = _read_meta(root)
        n = int(meta.get("tomb_seq", 0)) + 1
        new_name = f"tomb-{n:06d}"
        tomb.distinct().coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, new_name)
        )
        meta = _read_meta(root)
        meta["tomb_dir"] = new_name
        meta["tomb_seq"] = n
        _write_meta(root, meta)
        if os.path.basename(old_tomb) != new_name:
            shutil.rmtree(old_tomb, ignore_errors=True)

    counts = run_parallel(
        lambda: rewrite(stores[0][0]),
        lambda: rewrite(stores[1][0]),
        lambda: rewrite(stores[2][0]),
    )
    compact_tomb()
    return {name: counts[i] for i, (_, name) in enumerate(stores)}


def readmit_docs(
    spark: SparkSession,
    root: str,
    readmitted: DataFrame,
    batch_id: int | None = None,
    stream_id: str = "s",
) -> dict:
    """TOMBSTONE-CLEAR / re-admit fold (round 11, VERDICT r10 next #3 —
    the DMCA-counter-notice path): remove ids from the tombstone set so
    FUTURE folds may re-ingest them. Deliberately does NOT resurrect old
    rows — the purge already erased them (or will); re-ingestion is the
    only way back, so a re-admitted doc re-enters with exactly the
    ingest-time semantics of a never-seen doc. Ledgered like every fold
    (a replayed clear is a no-op) and published atomically: the surviving
    tombstone set is written to a NEW directory and the sidecar's
    tomb_dir flips in one meta replace. Re-admitting an id that was
    never tombstoned is a harmless no-op (set semantics).

    Ledger convention (ADVICE r11, low — unified across the cluster/IVF/
    span readmit folds): the clear ledgers under its OWN
    '{stream_id}!ra' line, never the main fold line — a readmit batch id
    must not advance the ingest stream's replay gate (sharing the line
    let a readmit at batch N silently skip ingest batches <= N on the
    same stream). n_readmitted reports tombstones ACTUALLY CLEARED
    (before/after delta), not requested ids — and both counts ride the
    rewrite's single write action (Observation), replacing the old
    three-action fold."""
    from pyspark.sql import Observation

    meta = _read_meta(root)
    ledger = meta.get("last_batch_by_stream") or {}
    key = f"{stream_id}!ra"
    if batch_id is not None and int(batch_id) <= int(ledger.get(key, -1)):
        return {"n_readmitted": 0, "n_tombstones_left": None,
                "skipped_duplicate": True}
    ids = readmitted.select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    ).distinct()
    marked = tombstones(spark, root).distinct().join(
        F.broadcast(ids.withColumn("__r", F.lit(True))), "doc_id", "left"
    )
    n = int(meta.get("tomb_seq", 0)) + 1
    new_name = f"tomb-{n:06d}"
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
    old_tomb = _tomb_path(root)
    meta = _read_meta(root)
    meta["tomb_dir"] = new_name
    meta["tomb_seq"] = n
    if batch_id is not None:
        led = dict(meta.get("last_batch_by_stream") or {})
        led[key] = max(int(led.get(key, -1)), int(batch_id))
        meta["last_batch_by_stream"] = led
    meta["n_folds"] = int(meta["n_folds"]) + 1
    _write_meta(root, meta)
    if os.path.isdir(old_tomb) and os.path.basename(old_tomb) != new_name:
        shutil.rmtree(old_tomb, ignore_errors=True)
    return {
        "n_readmitted": n_cleared,
        "n_tombstones_left": n_left,
        "skipped_duplicate": False,
    }


def compact_cluster_store(
    spark: SparkSession, root: str, keep_epochs: int = 2
) -> int:
    """The path-compression pass: materialize the fully-resolved map
    (base + deltas + translation closure) into a NEW base epoch and
    publish it with one atomic sidecar flip; deltas and translations
    reset. Superseded epochs and the deltas they consumed are GC'd once
    `keep_epochs` compactions old (a mid-scan reader has whole
    compaction cycles to finish — streaming/ivf.py's retention
    contract). WRITER-EXCLUSIVE vs folds (run it from the ingest loop,
    clusters_foreach_batch's compact_every does); always safe under
    concurrent readers. Returns the resolved row count.

    Crash windows: before the flip, an orphan next-epoch directory
    (overwritten by the retried compact); after it, at worst un-GC'd
    directories — both heal on the next compact."""
    meta = _read_meta(root)
    epoch = int(meta["base_epoch"])
    new_epoch = epoch + 1
    resolved = _apply_closure(
        _raw_rows(spark, root, meta, None),
        _closure(meta.get("translations") or []),
    )
    from pyspark.sql import Observation

    obs = Observation()
    _write_base(
        resolved.observe(obs, F.count(F.lit(1)).alias("n")),
        _base_path(root, new_epoch),
    )
    n = int(obs.get["n"])
    meta = _read_meta(root)
    meta["base_epoch"] = new_epoch
    meta["deltas"] = []
    meta["translations"] = []
    meta["rows_since_compact"] = 0
    meta["base_rows"] = n  # the auto-compaction trigger's denominator
    _write_meta(root, meta)
    # deferred GC by epoch prefix: bases AND their deltas — including
    # orphans a crashed batch-less fold never published — go together
    # once the epoch is keep_epochs compactions old
    for name in os.listdir(root):
        m = re.fullmatch(r"(?:base|delta)-(\d+)(?:-.*)?", name)
        if m and int(m.group(1)) < new_epoch - keep_epochs:
            shutil.rmtree(os.path.join(root, name))
    return n


# ---- fold-integrated auto-compaction (round 12, VERDICT r11 next #1) ------
#
# The r11 latency recording showed the cluster fold's p99 tail (16.3 s vs
# 4.3 s p50 at 500-row batches) is the UN-COMPACTED DELTA STACK: every fold
# reads base + all deltas since the last compaction, and compaction was a
# manual, writer-exclusive call — the latency contract depended on the
# operator remembering to compact. The trigger below runs INSIDE the fold
# (writer exclusivity is already guaranteed there) on LSM-style size
# accounting: fold_pairs/remove_docs accumulate `rows_since_compact` in the
# sidecar and compaction records `base_rows`, so firing when the delta rows
# reach AUTO_COMPACT_FRAC of the base bounds every fold's read amplification
# at ~(1 + frac) x base while total compaction work stays O(N log N) over
# the store's life (each rewrite is charged against geometric growth). The
# depth cap bounds file-listing cost and plan width even when folds append
# few rows, and the translation cap bounds the driver-side closure.

AUTO_COMPACT_DEPTH_CAP = 64  # hard delta-stack depth bound
AUTO_COMPACT_FRAC = 0.5  # compact when delta rows >= frac * base rows
AUTO_COMPACT_FLOOR = 5_000  # ...but never below this many delta rows
AUTO_COMPACT_TRANSLATION_CAP = 512  # bound the driver-side closure log


def maybe_compact_cluster_store(
    spark: SparkSession,
    root: str,
    compact_every: int | None = None,
    auto_compact: bool = True,
) -> bool:
    """Run compaction if either the legacy fold-count cadence
    (`compact_every`) or the size-based auto trigger says it is due.
    Callers must hold writer exclusivity (clusters_foreach_batch calls
    this right after its fold commit). Returns True when it compacted."""
    meta = _read_meta(root)
    due = (
        compact_every is not None
        and int(meta["n_folds"]) % int(compact_every) == 0
    )
    if not due and auto_compact:
        depth = len(meta.get("deltas") or [])
        rows = int(meta.get("rows_since_compact", 0))
        base = int(meta.get("base_rows", 0))
        due = (
            depth >= AUTO_COMPACT_DEPTH_CAP
            or rows >= max(AUTO_COMPACT_FLOOR, int(AUTO_COMPACT_FRAC * base))
            or len(meta.get("translations") or [])
            >= AUTO_COMPACT_TRANSLATION_CAP
        )
    if due:
        compact_cluster_store(spark, root)
    return due


# ---- size-tiered band-store compaction (round 13) --------------------------
#
# The sig/shingle/group stores append ONE file per micro-batch (the r11
# tiny-files fix) and are rewritten only by purge_band_stores — so a
# long-running stream accumulates one parquet footer per batch per store,
# and every fold's reads (the pin-delegates group scan, the band probe,
# the verify/prefix shingle reads) pay a linearly growing listing + footer
# cost. At bench scale that cost IS the steady-state fold latency (row
# counts are tiny); at 100 TB it is both listing and open cost on every
# executor.
#
# The fix is LSM-style SIZE TIERING over the purge machinery's existing
# versioned-sibling + pointer-flip swap: when a store holds at least
# `min_files` data files smaller than `small_bytes`, merge exactly those
# small files into ONE consolidated file inside the next `.vN` sibling and
# HARDLINK every already-large file forward (zero bytes copied, same
# inode). A consolidated file that crosses `small_bytes` graduates to the
# hardlink set forever, so compaction work is bounded by ~small_bytes +
# min_files * batch_bytes per firing — constant amortized write cost per
# batch — while each store's live file count stays O(min_files +
# total_bytes / small_bytes). Row multisets are preserved exactly: readers
# cannot observe compaction except through listing cost, and a crash
# anywhere before the pointer flip leaves an orphan sibling the next
# attempt overwrites (the retried version number re-derives from the
# still-unflipped pointer). WRITER-EXCLUSIVE like the cluster-map
# compaction: clusters_foreach_batch runs it after the fold commit.
#
# Local defaults match the bench/stream-bench batch shape; production
# values are env-parameterised (a cluster ingesting GB-sized batches
# wants a larger small-file bar, e.g. its DFS block size).

BAND_COMPACT_MIN_FILES = int(
    os.environ.get("SPARK_GRAFT_BAND_COMPACT_FILES", "16")
)
BAND_COMPACT_SMALL_BYTES = int(
    float(os.environ.get("SPARK_GRAFT_BAND_COMPACT_SMALL_MB", "64"))
    * (1 << 20)
)
# merges whose input bytes fit under this bar run DRIVER-SIDE via pyarrow
# (~ms for KB-MB inputs) instead of scheduling a Spark job: the first cut
# used a job for every merge and its fixed overhead (~0.3-0.5 s wall per
# firing on local[32]) ate the read-side win at bench scale. The cap
# bounds driver memory exactly like the fold's pair collect bounds it —
# past the cap (possible only at cluster scale) the Spark-job arm takes
# over, where job overhead is noise against the data volume.
BAND_COMPACT_DRIVER_BYTES = int(
    float(os.environ.get("SPARK_GRAFT_BAND_COMPACT_DRIVER_MB", "256"))
    * (1 << 20)
)


def _compact_band_store(
    spark: SparkSession,
    path: str,
    small_bytes: int | None = None,
    min_files: int | None = None,
) -> bool:
    """Merge a band/shingle/group store's small append files into one
    consolidated file (hardlinking large files forward) behind an atomic
    pointer flip. Writer-exclusive; returns True when it compacted."""
    if small_bytes is None:
        small_bytes = BAND_COMPACT_SMALL_BYTES
    if min_files is None:
        min_files = BAND_COMPACT_MIN_FILES
    cur = _resolve_store(path)
    if not os.path.isdir(cur):
        return False
    data = [
        e
        for e in os.scandir(cur)
        if e.is_file() and e.name.endswith(".parquet")
    ]
    small = [e for e in data if e.stat().st_size < small_bytes]
    if len(small) < min_files:
        return False
    small_names = {e.name for e in small}
    m = re.fullmatch(re.escape(path) + r"\.v(\d+)", cur)
    nxt = (int(m.group(1)) + 1) if m else 1
    sib = f"{path}.v{nxt:06d}"
    if os.path.exists(sib):
        # orphan of a crashed prior attempt (same target version because
        # the pointer never flipped): stale bytes, rebuild from scratch
        shutil.rmtree(sib)
    small_total = sum(e.stat().st_size for e in small)
    if small_total <= BAND_COMPACT_DRIVER_BYTES:
        import pyarrow.parquet as pq

        os.makedirs(sib)
        tbl = pq.ParquetDataset([e.path for e in small]).read()
        pq.write_table(
            tbl,
            os.path.join(sib, f"part-00000-compact{nxt:06d}.parquet"),
            compression="snappy",
        )
    else:
        (
            spark.read.parquet(*[e.path for e in small])
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(sib)
        )
    for e in data:
        if e.name not in small_names:
            # same parent directory => same filesystem, link never copies
            os.link(e.path, os.path.join(sib, e.name))
    _flip_store(path, nxt)
    return True


def batch_pairs(batch_df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Intra-batch verified near-dup pairs — identical band + round-6
    exact-Jaccard semantics as the batch pipeline, INCLUDING the round-11
    hot-bucket guard (exact-text collapse + capped band join + lossless
    expansion — operators/dedup.minhash_dedup_pairs), without the session
    memo (micro-batches are never re-queried)."""
    from cdc_rs_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        batch_df, "doc_id", "text", threshold, memo=False
    ).select("id_a", "id_b", "jaccard")


def clusters_foreach_batch(
    signature_store_path: str,
    shingle_store_path: str,
    cluster_store_root: str,
    threshold: float = 0.5,
    stream_id: str = "s",
    compact_every: int | None = None,
    on_stats: Callable[[dict, int], None] | None = None,
    group_store_path: str | None = None,
    bucket_cap: int = 256,
    auto_compact: bool = True,
    fold_parallelism: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """The full ingesting-pipeline step (VERDICT r7 next #1), round-11
    form with the HOT-BUCKET GUARD (VERDICT r10 next #1 — the round-10
    stream bench OOM'd on a template corpus and the fix went into the
    generator; this is the engine fix). Per micro-batch of (doc_id,
    text):

      1. EXACT-TEXT COLLAPSE: the batch groups by md5(text); each group
         contributes hub-star edges (member -> batch rep, Jaccard exactly
         1.0 — identical text) instead of k^2/2 pairs;
      2. GROUP PROBE: batch reps look their gkey up in the exact-group
         store. A group with a live DELEGATE (the one member whose bands
         are in the signature store) yields a single (rep, delegate) edge
         — no band probe, no verify (identical text). Only reps of NEW
         groups sign, append bands/shingles, and band-probe — so the
         signature store holds ONE row-set per DISTINCT TEXT ever
         ingested, and a boilerplate template that arrives 1e5 times
         costs 1e5 skinny group rows + star edges, not 1e5 band
         signatures and a quadratic bucket;
      3. the band probe against the (delegate-only) store is POPULATION-
         CAPPED: store rows in matched (band, bkey) buckets rank by
         doc_id and only the first `bucket_cap` join; docs spilling past
         the cap route through the prefix-filtered exact join over the
         shingle store (lossless for jaccard >= threshold, the
         operators/dedup.prefix_filtered_candidates blocker), so residual
         distinct-text skew degrades to the deterministic blocker instead
         of a quadratic explode. Any pair whose every shared bucket
         overflows has both members in the routed set — nothing is
         dropped. Below the cap (all tested scales; sf0.1's max
         distinct-text bucket is 4) the pair set is EXACTLY the
         unguarded one — the collapse is an identity
         (dedup_incremental_clusters' oracle pins it);
      4. fold_pairs merges star + delegate + verified pairs into the
         epoch-published, ledger-idempotent map; compaction runs
         fold-integrated (round 12): auto_compact=True (default) fires
         the LSM-style size trigger (maybe_compact_cluster_store) so the
         delta stack — the r11 p99 tail — stays bounded with zero caller
         discipline, and compact_every still forces the fixed cadence.

    Store appends stay BEFORE the fold commit (append-first — the crash
    anywhere leaves a replayable state; round-8 lesson). A crashed
    retry whose group rows landed re-probes its own self-delegate groups
    (the del == rep case) so the interrupted batch's pairs still fold.
    After any prefix of batches, live_cluster_map == batch CC over all
    near-dup pairs among every doc ingested so far — the invariant the
    registered query dedup_incremental_clusters oracle-checks. Reads and
    appends resolve through the purge pointer (_resolve_store)."""
    from cdc_rs_spark.operators.dedup import (
        band_explode,
        jaccard_verify,
        minhash_docs,
        prefix_filtered_candidates,
        word_tokens,
    )

    gpath_base = _group_path(signature_store_path, group_store_path)

    def _phase(spark: SparkSession, label: str) -> None:
        # job-group labels: free at runtime, and they make the per-batch
        # REST timeline attributable phase by phase (the r11/r12 fold
        # profiling method — tools/profile_fold.py groups on these)
        spark.sparkContext.setJobDescription(f"cluster_fold:{label}")

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ledger gate FIRST: a batch at or below its stream's committed
        # line already ran to completion (fold commit is the LAST step),
        # so its bands/shingles/groups are in the stores — skip it all.
        ledger = (
            _read_meta(cluster_store_root).get("last_batch_by_stream") or {}
        )
        if int(batch_id) <= int(ledger.get(stream_id, -1)):
            if on_stats is not None:
                on_stats(
                    {
                        "n_pairs": 0,
                        "n_new_entries": 0,
                        "n_merges": 0,
                        "skipped_duplicate": True,
                    },
                    batch_id,
                )
            return
        _check_threshold(cluster_store_root, threshold)
        sig_cur = _resolve_store(signature_store_path)
        sh_cur = _resolve_store(shingle_store_path)
        gcur = _resolve_store(gpath_base)
        # collapse: only signable docs (>= 3 tokens) ever pair — the
        # group rows mirror that so remove_docs' star edges match LSH
        # semantics exactly
        # collapse with ZERO text shuffles (round 12): the window form
        # pushed the full text column through an exchange every batch;
        # instead aggregate the SKINNY (gkey, min doc_id) relation —
        # map-side partial agg, ~40 B/row — and broadcast it back onto
        # the narrow batch scan. A micro-batch's distinct-text set is
        # broadcast-bounded by the same contract that lets fold_pairs
        # collect the pair set driver-side.
        # bound the batch's partition count WITHOUT a shuffle (round 12):
        # an oversharded micro-batch (more partitions than cores) makes
        # every downstream stage pay task launches that are overhead, not
        # work — and the persisted keyed/signed frames inherit it for the
        # whole fold (~10 stages). The cap defaults to the cluster's
        # parallelism so signing never loses cores; coalesce only ever
        # narrows, so a well-partitioned batch passes through untouched.
        cap = fold_parallelism or spark.sparkContext.defaultParallelism
        np_in = batch_df.rdd.getNumPartitions()
        pre = batch_df.coalesce(cap) if np_in > cap else batch_df
        keyed0 = pre.filter(
            F.size(word_tokens(F.col("text"))) >= 3
        ).select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "text",
            _gkey("text").alias("gkey"),
        )
        keyed = keyed0.join(
            F.broadcast(
                keyed0.groupBy("gkey").agg(F.min("doc_id").alias("rep_id"))
            ),
            "gkey",
        ).persist()
        groups = keyed.filter(F.col("doc_id") == F.col("rep_id")).select(
            "gkey", "rep_id", "text"
        )
        try:
            star = keyed.filter(F.col("doc_id") != F.col("rep_id")).select(
                F.col("rep_id").alias("id_a"),
                F.col("doc_id").alias("id_b"),
            )
            gkeys_b = F.broadcast(groups.select("gkey"))
            # live delegates restricted to the BATCH's gkeys up front
            # (broadcast semi-shape) — the store is corpus-sized, the
            # batch is not; tombstone anti-join stays broadcast too
            fresh_store = not os.path.isdir(gcur)
            if not fresh_store:
                gstore = spark.read.schema(_GROUP_SCHEMA).parquet(gcur)
                # no .distinct() here (round 12, optimization pass): the
                # only duplicate (gkey, del_id) sources are crash-retry
                # appends; the pin aggregate below counts DISTINCT
                # delegates itself, and duplicate `known` edges collapse
                # in fold_pairs' distinct — dropping the exchange saves a
                # full shuffle in every batch's pin-delegates phase
                live_del = (
                    gstore.filter("delegate")
                    .join(gkeys_b, "gkey")
                    .select("gkey", F.col("doc_id").alias("del_id"))
                    .join(
                        F.broadcast(
                            tombstones(spark, cluster_store_root)
                        ).withColumnRenamed("doc_id", "del_id"),
                        "del_id",
                        "left_anti",
                    )
                )
            else:
                live_del = spark.createDataFrame(
                    [], "gkey string, del_id bigint"
                )
            # PIN the pre-append probe state: parquet reads re-list
            # files per action, so without this the batch's own group
            # append would flip its groups to "known" before the band
            # append/probe ran (the self-invalidating-read trap). Only
            # the SKINNY per-gkey delegate aggregate is checkpointed —
            # the first cut checkpointed the joined (gkey, rep, TEXT)
            # rows and regrouped on a text-bearing key, tripling the
            # fold's wall time (stream-bench cluster_fold 4.8 -> 15 s).
            _phase(spark, "pin-delegates")
            if fresh_store:
                # no store, nothing to pin: an empty LOCAL relation has
                # the same semantics as checkpointing the empty aggregate
                # and skips that Spark job (round 12)
                ldset = spark.createDataFrame(
                    [], "gkey string, __dels array<bigint>"
                )
            else:
                ldset = (
                    live_del.groupBy("gkey")
                    # the DISTINCT delegate-id SET, not a count: live_del
                    # no longer dedups, and a crash-retry duplicate of
                    # the SAME delegate must not flip has_ext. Round 13
                    # (VERDICT r12 next #3): countDistinct planned TWO
                    # exchanges (Spark's single-distinct rewrite still
                    # shuffles on (gkey, del_id) before the gkey
                    # shuffle); collect_set dedups INSIDE one hash
                    # aggregate with map-side partials, so the pin phase
                    # genuinely plans one exchange
                    # (plans/r13/pin_delegates_*.txt). Round 13b: the
                    # checkpoint carries the SET itself instead of just
                    # (size, min) — the known-group edges below derive
                    # from it, so the fold's pair plan no longer re-scans
                    # the corpus-sized group store a second time per
                    # batch. Sets are per-gkey live-delegate ids — 1
                    # outside crash-retry windows, never corpus-shaped.
                    .agg(F.collect_set("del_id").alias("__dels"))
                    .localCheckpoint(eager=True)
                )
            ldagg = ldset.select(
                "gkey",
                F.size("__dels").cast("bigint").alias("__nd"),
                F.array_min("__dels").alias("__mind"),
            )
            g2 = groups.join(F.broadcast(ldagg), "gkey", "left")
            # known-group edges come from the CHECKPOINTED pre-append
            # delegate sets (round 13b) — identical rows to the old lazy
            # live_del re-read: that read happened after the group append
            # but the appended rows are new groups' self-delegates
            # (del_id == rep_id), which this filter drops anyway; and the
            # set form pre-collapses crash-retry duplicate rows that
            # fold_pairs' distinct absorbed. One corpus-sized scan per
            # batch instead of two.
            known = (
                ldset.select(
                    "gkey", F.explode("__dels").alias("del_id")
                )
                .join(
                    F.broadcast(groups.select("gkey", "rep_id")), "gkey"
                )
                .filter(F.col("del_id") != F.col("rep_id"))
                .select(
                    F.col("rep_id").alias("id_a"),
                    F.col("del_id").alias("id_b"),
                )
            )
            has_any = F.col("__nd").isNotNull()
            # >= 2 distinct live delegates: at least one differs from rep
            has_ext = F.col("__nd").isNotNull() & (
                (F.col("__nd") > 1) | (F.col("__mind") != F.col("rep_id"))
            )
            # probe set: groups with no EXTERNAL live delegate. Includes
            # the self-delegate case (a crashed attempt appended this
            # rep's rows but the fold never committed — re-probe so its
            # pairs still fold). Bands/groups append only for truly NEW
            # groups (no live delegate at all) — a retry never
            # duplicates them.
            probe_reps = g2.filter(~has_ext).select(
                F.col("rep_id").alias("doc_id"), "text"
            )
            new_reps = g2.filter(~has_any).select(
                "gkey", F.col("rep_id").alias("doc_id"), "text"
            )
            signed = minhash_docs(probe_reps, "doc_id", "text").persist()
            try:
                new_ids = new_reps.select("gkey", "doc_id")
                new_signed = signed.join(new_ids.select("doc_id"), "doc_id")
                # append-first (round-8 lesson), GROUP ROWS LAST (ADVICE
                # r11, high): new_reps gates band appends on the group
                # store having no live delegate, so the group append is
                # the COMMIT POINT of the per-text store rows — if it
                # landed, the bands/shingles it gates must already be
                # durable. The old order (groups first) had a crash
                # window where a retry saw the delegate row, skipped the
                # band append, and the text's bands were lost forever
                # (every future pair involving it silently missed).
                # Retry duplicates of sig/sh rows are absorbed: band
                # candidates are .distinct()ed, jaccard_verify duplicates
                # collapse in fold_pairs' distinct, and the prefix
                # blocker's doubled token counts only lengthen prefixes
                # (a candidate superset — lossless).
                # append-sig FIRST and alone: its job materializes the
                # persisted `signed` (the expensive MinHash pass) exactly
                # once; running the sh append concurrently here would race
                # both jobs into signing the same partitions twice.
                _phase(spark, "append-sig")
                band_explode(new_signed.select("doc_id", "sig")).coalesce(
                    1
                ).write.mode("append").parquet(sig_cur)

                # capped band probe: buckets holding more than
                # bucket_cap store rows leave the band join entirely and
                # route through the prefix blocker (the batch guard's
                # semantics). The matched store slice is persisted and
                # sized with ONE aggregate action — the size probe both
                # bounds the join AND gates the fallback arm, so the
                # common no-skew batch never schedules the fallback's
                # stages (the first cut built them unconditionally and
                # empty-stage overhead tripled the fold wall time).
                # NOTE: a parquet read snapshots its file listing at
                # DataFrame-creation time, so each store's read must be
                # created only after that store's append has committed —
                # sig here (its append just finished), sh below, after
                # the parallel block joins.
                sig_store = spark.read.parquet(sig_cur)
                probe_bands = band_explode(signed.select("doc_id", "sig"))

                def _append_sh() -> None:
                    _phase(spark, "append-sh")
                    new_signed.select("doc_id", "sh").coalesce(
                        1
                    ).write.mode("append").parquet(sh_cur)

                def _probe_size() -> tuple:
                    # LEFT SEMI against the broadcast probe keys (round
                    # 12): semi-join semantics make build-side duplicates
                    # harmless, so the per-batch .distinct() exchange over
                    # |batch| x bands key rows is gone — the broadcast
                    # carries dup keys (still batch-bounded) and each
                    # store row matches once. Returns (mx, sizes): the
                    # over-cap arm re-filters `sizes` for the overflow
                    # bucket list (ADVICE r12 high — `sizes` was local to
                    # this closure while the fallback referenced it from
                    # fn scope, a NameError on every skewed batch).
                    _phase(spark, "probe-size")
                    sizes = matched.groupBy("band", "bkey").agg(
                        F.count(F.lit(1)).alias("__n")
                    )
                    mx_row = sizes.agg(F.max("__n").alias("mx")).collect()[0]
                    return int(mx_row["mx"] or 0), sizes

                matched = sig_store.join(
                    F.broadcast(probe_bands.select("band", "bkey")),
                    ["band", "bkey"],
                    "left_semi",
                ).persist()
                # the sh append and the probe-size aggregate touch
                # disjoint stores (sh write vs sig read) — overlap them
                # (§2.6); the probe reads the sig store AFTER its append,
                # and jaccard_verify/prefix reads of the sh store happen
                # only in the fold collect, after the join() below.
                _, (mx, sizes) = run_parallel(_append_sh, _probe_size)
                # created HERE, after the sh append: the listing snapshot
                # must include the batch's own shingle rows, or the
                # verify/prefix reads silently drop this batch's pairs
                sh_store = spark.read.parquet(sh_cur)
                # group rows append AFTER sig+sh are durable (ADVICE r11
                # high — the group append is the commit point gating the
                # band rows; see the ordering comment above). It OVERLAPS
                # the fold's candidate/verify collect (§2.6): nothing in
                # the pair plan reads the group store (live_del's read
                # snapshot predates the append), and fold_pairs'
                # before_publish barrier joins this write before the
                # ledger commit, so the crash ordering is unchanged — the
                # ledger can never claim a batch whose group rows are not
                # durable.
                def _append_groups() -> None:
                    _phase(spark, "append-groups")
                    (
                        # group rows for EVERY batch doc (remove_docs'
                        # star edges need membership), delegate flag for
                        # new reps
                        keyed.select("gkey", "doc_id")
                        .join(
                            F.broadcast(
                                new_ids.withColumnRenamed(
                                    "doc_id", "del_id"
                                )
                            ),
                            "gkey",
                            "left",
                        )
                        .select(
                            "gkey",
                            "doc_id",
                            F.coalesce(
                                F.col("doc_id") == F.col("del_id"),
                                F.lit(False),
                            ).alias("delegate"),
                        )
                        # one file per batch per store: appends are
                        # batch-bounded, and un-coalesced writes left up
                        # to 32 tiny files each, inflating every later
                        # read's listing (measured in the r11 latency
                        # percentiles)
                        .coalesce(1)
                        .write.mode("append")
                        .parquet(gcur)
                    )

                from concurrent.futures import ThreadPoolExecutor

                gpool = ThreadPoolExecutor(max_workers=1)
                gfut = gpool.submit(_append_groups)
                # the try starts IMMEDIATELY after the submit (ADVICE r12):
                # an exception anywhere between submit and the fold (e.g.
                # the over_b collect) must still join the append thread —
                # the old placement orphaned it and swallowed its errors
                try:
                    if mx <= 1:
                        # every matched bucket holds exactly ONE store
                        # row — each probe doc's own just-appended bands
                        # (probe docs always append before the probe, so
                        # a cross pair implies a bucket of >= 2). The
                        # band join can produce nothing: skip the whole
                        # candidate/verify subplan — the common
                        # no-near-dup batch loses ~8 stages per fold
                        # (round 12).
                        pairs = star.unionByName(known)
                    else:
                        over_b = (
                            [
                                (r["band"], r["bkey"])
                                for r in sizes.filter(
                                    F.col("__n") > bucket_cap
                                ).collect()
                            ]
                            if mx > bucket_cap
                            else []
                        )
                        small = matched
                        if over_b:
                            ob = F.broadcast(
                                spark.createDataFrame(
                                    over_b, "band int, bkey string"
                                )
                            )
                            small = matched.join(
                                ob, ["band", "bkey"], "left_anti"
                            )
                        # no .distinct() (round 12): a pair sharing k
                        # bands yields <= MINHASH_BANDS duplicate
                        # candidate rows; verifying each is a cheap
                        # array_intersect while the distinct was a full
                        # extra exchange — fold_pairs' distinct dedupes
                        cand = (
                            probe_bands.withColumnRenamed("doc_id", "id_a")
                            .join(
                                small.withColumnRenamed("doc_id", "id_b"),
                                ["band", "bkey"],
                            )
                            .filter(F.col("id_a") != F.col("id_b"))
                            .select("id_a", "id_b")
                        )
                        if over_b:
                            # overflow docs: every store row and every
                            # probe doc touching an oversized bucket —
                            # both sides of any pair living only in
                            # oversized buckets are here
                            ob = F.broadcast(
                                spark.createDataFrame(
                                    over_b, "band int, bkey string"
                                )
                            )
                            over_docs = (
                                matched.join(ob, ["band", "bkey"])
                                .select("doc_id")
                                .unionByName(
                                    probe_bands.join(ob, ["band", "bkey"])
                                    .select("doc_id")
                                )
                                .distinct()
                            )
                            over_cand = prefix_filtered_candidates(
                                sh_store.join(over_docs, "doc_id"),
                                threshold,
                            )
                            cand = cand.unionByName(over_cand).distinct()
                        pairs = (
                            jaccard_verify(cand, sh_store, threshold)
                            .select("id_a", "id_b")
                            .unionByName(star)
                            .unionByName(known)
                        )
                    _phase(spark, "fold")
                    stats = fold_pairs(
                        spark,
                        cluster_store_root,
                        pairs,
                        batch_id=batch_id,
                        stream_id=stream_id,
                        # the ledger commit waits for the group append;
                        # a failed append raises pre-commit
                        before_publish=gfut.result,
                    )
                finally:
                    # surface append errors even when fold_pairs exits
                    # before reaching its publish (e.g. empty batch
                    # raising upstream); idempotent after the barrier
                    try:
                        gfut.result()
                    finally:
                        gpool.shutdown()
                if not stats["skipped_duplicate"]:
                    # fold-integrated compaction (round 12): the p99
                    # latency contract no longer depends on the caller
                    # remembering to compact — see maybe_compact_*'s
                    # module-level design note. Round 13 adds the band/
                    # shingle/group stores' size tiering in the same
                    # writer-exclusive window; all four targets are
                    # disjoint directories, so the legs overlap (§2.6).
                    _phase(spark, "compact")

                    def _band_leg(path: str) -> bool:
                        # job descriptions are thread-local: label the
                        # pool thread too so the REST timeline stays
                        # attributable (profile_fold groups on these)
                        _phase(spark, "compact")
                        return _compact_band_store(spark, path)

                    run_parallel(
                        lambda: maybe_compact_cluster_store(
                            spark,
                            cluster_store_root,
                            compact_every=compact_every,
                            auto_compact=auto_compact,
                        ),
                        *(
                            (
                                lambda: _band_leg(signature_store_path),
                                lambda: _band_leg(shingle_store_path),
                                lambda: _band_leg(gpath_base),
                            )
                            if auto_compact
                            else ()
                        ),
                    )
                if on_stats is not None:
                    on_stats(stats, batch_id)
            finally:
                signed.unpersist(blocking=False)
                try:
                    matched.unpersist(blocking=False)
                except UnboundLocalError:
                    pass
        finally:
            keyed.unpersist(blocking=False)
            spark.sparkContext.setJobDescription(None)

    return fn
