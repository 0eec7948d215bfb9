"""Deduplication operators (EXTENSION per SURVEY §2.2 / the north star):
exact, MinHash+LSH, SimHash, n-gram Jaccard — the large-scale training-data
pipeline staples.

Scale design:
  - exact: hash-groupBy on the dedup key — one shuffle, map-side combine.
  - MinHash LSH: per-doc signature (narrow map), explode to (band, key)
    pairs, self-join on band key — candidate generation never compares
    all-pairs; the O(n^2) verify only touches same-bucket candidates.
  - SimHash: 32-bit fingerprint, banded into 4x8-bit chunks; a pair within
    hamming<=3 is guaranteed to share a chunk (pigeonhole), so the band join
    is a lossless blocker for that threshold.
All expressions are built-in column ops (md5/conv/transform/aggregate) — no
Python UDFs anywhere; whole-stage codegen applies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_rs_spark.functions.hashing import P31, fingerprint, lcg_coeffs

MINHASH_K = 32
MINHASH_BANDS = 8  # 8 bands x 4 rows
MINHASH_COEFFS = lcg_coeffs(MINHASH_K)


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the min(order_col) row per exact key — ONE shuffle: window
    row_number over the key, filter rank 1 (the groupBy-min + self-join form
    costs a second exchange). `order_col` must be unique within a key (e.g.
    a doc id) so the survivor is deterministic. For string keys at 100 TB,
    partition on md5(key) instead of the raw key to bound shuffle width."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams. Requires size(tokens) >= n (callers filter;
    sequence() would go descending otherwise)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def shingle_fps(sh: Column) -> Column:
    """Fingerprint each shingle into [0, P31)."""
    return F.transform(sh, lambda s: fingerprint(s) % P31)


def minhash_signature(fps: Column) -> Column:
    """K-wide MinHash signature as an array column: sig_i = min over shingle
    fingerprints of (a_i * x + b_i) mod P31."""
    def perm(a: int, b: int):
        return lambda x: (a * x + b) % P31

    sigs = [
        F.array_min(F.transform(fps, perm(a, b))) for a, b in MINHASH_COEFFS
    ]
    return F.array(*sigs)


def minhash_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """doc -> (id, shingles, sig). Narrow per-row computation, no shuffle.

    The fingerprint array is materialized as its own projection step before
    the K array_min expressions reference it — inlining it instead would
    re-run every md5 K times (measured 8x slowdown at sf0.1)."""
    tokens = word_tokens(F.col(text_col))
    out = df.filter(F.size(tokens) >= 3).select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens).alias("sh"),
    )
    out = out.select("doc_id", "sh", shingle_fps(F.col("sh")).alias("fps"))
    return out.select(
        "doc_id", "sh", minhash_signature(F.col("fps")).alias("sig")
    )


def band_explode(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) -> (doc_id, band, bkey) rows: the signature split into
    MINHASH_BANDS band keys (4 joined sig values each). This exploded
    relation IS the LSH index: equality on (band, bkey) is the candidate
    test, whether self-joined (batch dedup) or joined from a stream
    (incremental dedup against a persisted store)."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at(F.col("sig"), b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("bkey"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return docs.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Explode signatures into (band, band_key) and self-join: candidates are
    pairs agreeing on at least one band. The join key is (band, 4 joined sig
    values) — collision probability follows the standard banding S-curve."""
    exploded = band_explode(docs)
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, docs: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only. docs: (doc_id, sh)."""
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    return joined.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---- hot-bucket guard (round 11, VERDICT r10 next #1) ---------------------
#
# The LSH self-join on (band, bkey) produces k^2/2 candidate rows for a
# bucket of k docs. Web corpora GUARANTEE degenerate buckets — boilerplate
# templates with 1e5+ byte-identical copies — so the candidate stage goes
# quadratic long before jaccard_verify can prune anything (the round-10
# stream bench OOM'd on exactly this skew). Two-layer guard:
#
#   1. EXACT-TEXT COLLAPSE (lossless): identical text => identical shingle
#      set => identical MinHash signature, so collapsing each distinct text
#      to ONE representative before banding, running the band join + verify
#      over representatives only, and expanding verified rep pairs back to
#      member pairs (plus within-group pairs at Jaccard exactly 1.0)
#      reproduces the all-docs LSH pair set EXACTLY. A 1e5-copy template
#      contributes ONE row per band to every bucket. The oracle-checked
#      queries stay bit-identical because the expansion is an identity.
#   2. BUCKET CAP (residual skew): any (band, bkey) bucket still holding
#      more than `bucket_cap` DISTINCT texts is excluded from the band
#      self-join; its docs instead route through the prefix-filtered exact
#      join (the AllPairs/PPJoin blocker, lossless for jaccard >= t), whose
#      candidate count tracks true near-dup density, never bucket-size
#      squared. Any pair whose every shared bucket is oversized has BOTH
#      members in the routed set, so no candidate is dropped — the routed
#      path finds a SUPERSET of the band candidates for those docs (prefix
#      filtering is deterministic where banding is probabilistic), which
#      only matters above the cap; at the tested scales no bucket comes
#      near it (sf0.1 max distinct-text bucket population is 4).

DEDUP_BUCKET_CAP = 256


def exact_text_groups(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Collapse identical texts. Returns (membership, reps): membership is
    (doc_id, rep_id) with rep_id = min doc_id among the group's members;
    reps is (doc_id, <text_col>) — one row per distinct text. Group key is
    md5(text) (128-bit; accidental collision is beyond reach, and the agg
    shuffles one text per group per mapper via min_by partial aggregation
    instead of shuffling the full text column)."""
    keyed = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("__text"),
        F.md5(F.col(text_col).cast("binary")).alias("__gkey"),
    )
    groups = keyed.groupBy("__gkey").agg(
        F.min("doc_id").alias("rep_id"),
        F.min_by("__text", "doc_id").alias("__text"),
    )
    membership = (
        keyed.select("doc_id", "__gkey")
        .join(groups.select("__gkey", "rep_id"), "__gkey")
        .select("doc_id", "rep_id")
    )
    reps = groups.select(
        F.col("rep_id").alias(id_col), F.col("__text").alias(text_col)
    )
    return membership, reps


def guarded_band_candidates(
    signed: DataFrame, bucket_cap: int = DEDUP_BUCKET_CAP
) -> tuple[DataFrame, DataFrame]:
    """Band-join candidates with the population cap: returns (cand,
    oversized) where cand is (id_a, id_b) from buckets holding <=
    bucket_cap docs, and oversized is the (doc_id) set of docs touching
    any over-cap bucket (routed to the prefix-filtered exact join by the
    caller). The window count and the self-join shuffle on the same
    (band, bkey) key, so the exchange is reused."""
    from pyspark.sql import Window

    ex = band_explode(signed.select("doc_id", "sig"))
    w = Window.partitionBy("band", "bkey")
    exn = ex.withColumn("__n", F.count(F.lit(1)).over(w))
    small = exn.filter(F.col("__n") <= bucket_cap).select(
        "doc_id", "band", "bkey"
    )
    left = small.alias("l")
    right = small.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    oversized = exn.filter(F.col("__n") > bucket_cap).select("doc_id").distinct()
    return cand, oversized


def prefix_filtered_candidates(
    docs_sh: DataFrame, threshold: float
) -> DataFrame:
    """LOSSLESS candidate pairs for Jaccard >= threshold via rarest-first
    prefix filtering (AllPairs/PPJoin — the same blocker as the registered
    dedup_jaccard_prefix_join, parameterized on threshold): if J(A,B) >= t
    the pair shares a token within both (n - ceil(t*n) + 1)-length prefixes
    under any single global token order; rarest-first makes prefix
    collisions track true near-dup density. docs_sh: (doc_id, sh). The
    1e-9 slack inside ceil() guards the float boundary (a too-SHORT prefix
    could miss a pair; one token of extra prefix is only extra work)."""
    ex = docs_sh.select("doc_id", F.explode("sh").alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("fr"))
    arr = (
        ex.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(fr, tok))),"
                " x -> x.tok)"
            ).alias("toks"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    plen = (
        F.col("n")
        - F.ceil(F.lit(float(threshold)) * F.col("n") - F.lit(1e-9))
        + 1
    ).cast("int")
    pre = arr.select(
        "doc_id", F.explode(F.slice(F.col("toks"), F.lit(1), plen)).alias("tok")
    )
    a = pre.select(F.col("doc_id").alias("id_a"), "tok")
    b = pre.select(F.col("doc_id").alias("id_b"), "tok")
    return (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def expand_group_pairs(
    rep_pairs: DataFrame, membership: DataFrame, signed: DataFrame
) -> DataFrame:
    """Expand representative-level verified pairs (id_a, id_b, jaccard)
    back to the member-level pair set — the exact inverse of
    exact_text_groups' collapse: every cross-group member pair inherits
    its rep pair's jaccard (identical shingle sets), and every
    within-group pair is Jaccard exactly 1.0. Within-group expansion only
    covers groups whose rep was signed (>= 3 tokens) — matching the LSH
    semantics where unsigned docs never pair — and only touches groups
    with >1 member (the window filter), so the all-singleton common case
    adds two skinny joins and an empty union arm."""
    from pyspark.sql import Window

    ma = membership.select(
        F.col("rep_id").alias("id_a"), F.col("doc_id").alias("__da")
    )
    mb = membership.select(
        F.col("rep_id").alias("id_b"), F.col("doc_id").alias("__db")
    )
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__da", "__db").alias("id_a"),
            F.greatest("__da", "__db").alias("id_b"),
            "jaccard",
        )
    )
    multi = (
        membership.join(
            signed.select(F.col("doc_id").alias("rep_id")), "rep_id"
        )
        .withColumn(
            "__gn", F.count(F.lit(1)).over(Window.partitionBy("rep_id"))
        )
        .filter(F.col("__gn") > 1)
        .select("rep_id", "doc_id")
    )
    w1 = multi.select("rep_id", F.col("doc_id").alias("id_a"))
    w2 = multi.select("rep_id", F.col("doc_id").alias("id_b"))
    within = (
        w1.join(w2, "rep_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(F.lit(1.0), 6).alias("jaccard"))
    )
    return cross.unionByName(within)


_COLLAPSED_CACHE: list = []  # (appId, src_df, key, membership, signed, stats)


def _collapse_stats(membership: DataFrame, signed: DataFrame) -> dict:
    """One action over the two persisted relations: the max (band, bkey)
    population and whether any exact-dup group has >1 member. Both guard
    arms key off these — when max_bucket <= cap the prefix fallback is
    provably inert, and when every group is a singleton the expansion is
    provably the identity, so the common isotropic-corpus plan schedules
    NEITHER arm's stages (empty-input stages still cost scheduler time —
    the round-11 stream-bench lesson, applied to the batch operator)."""
    b = band_explode(signed.select("doc_id", "sig")).groupBy(
        "band", "bkey"
    ).count().agg(F.coalesce(F.max("count"), F.lit(0)).alias("mb"))
    m = membership.agg(
        (F.count(F.lit(1)) > F.count_distinct("rep_id")).alias("multi")
    )
    row = b.crossJoin(m).collect()[0]
    return {"max_bucket": int(row["mb"]), "has_multi": bool(row["multi"])}


def collapsed_docs_cached(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, dict]:
    """Session-memoized persisted (membership, signed-reps) pair — the
    materialized signatures/shingles table a production dedup deployment
    builds ONCE and serves to every consumer, now in collapsed form (one
    signature per DISTINCT text plus the doc->rep membership map). Five
    registry queries run the identical pipeline over the identical
    corpus; without the memo each re-collapses and re-signs it. Hits
    require ``sameSemantics`` (exact plan comparison, no hash-collision
    risk) AND the same input-file set (ADVICE r3: plan equality alone
    would serve stale persisted signatures if the files under an
    identical-looking path were rewritten within one session — same guard
    as plans/similarity.py's _IVF_MODEL_CACHE); entries from dead
    SparkSessions are dropped and the cache is bounded BEFORE insertion,
    with evicted frames unpersisted."""
    app = df.sparkSession.sparkContext.applicationId
    global _COLLAPSED_CACHE
    key = (id_col, text_col, tuple(sorted(df.inputFiles())))
    live = [e for e in _COLLAPSED_CACHE if e[0] == app]
    for a, src, k, membership, signed, stats in live:
        if k == key and src.sameSemantics(df):
            return membership, signed, stats
    while len(live) >= 4:  # evict before insert: never more than 4 persisted
        old = live.pop(0)
        old[3].unpersist(blocking=False)
        old[4].unpersist(blocking=False)
    membership, reps = exact_text_groups(df, id_col, text_col)
    membership = membership.persist()
    signed = minhash_docs(reps, id_col, text_col).persist()
    stats = _collapse_stats(membership, signed)
    live.append((app, df, key, membership, signed, stats))
    _COLLAPSED_CACHE = live
    return live[-1][3], live[-1][4], live[-1][5]


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    bucket_cap: int = DEDUP_BUCKET_CAP,
    memo: bool = True,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with the hot-bucket guard:
    exact-text collapse -> shingle -> sign (reps only) -> capped band join
    (over-cap buckets route to the prefix-filtered exact join) ->
    exact-Jaccard verify -> lossless expansion back to member pairs.

    Output semantics are IDENTICAL to the unguarded pipeline whenever no
    distinct-text bucket exceeds bucket_cap (the collapse+expansion is an
    exact identity; the registered oracles pin this) — and above the cap
    the routed docs get the deterministic prefix-filter blocker, a
    superset of what banding would have found for them. The collapsed
    signatures come from the session-level memo (the materialized
    signatures table at cluster scale). AQE's empty-relation propagation
    collapses the fallback arm at runtime when no bucket is over cap."""
    membership, signed, stats = _collapsed(df, id_col, text_col, memo)
    rep_pairs = _verified_rep_pairs(
        membership, signed, threshold, bucket_cap, stats
    )
    if stats is not None and not stats["has_multi"]:
        # every group is a singleton: the expansion is the identity —
        # skip its joins entirely (the common isotropic-corpus plan)
        return rep_pairs
    return expand_group_pairs(rep_pairs, membership, signed)


def _collapsed(df, id_col, text_col, memo):
    if memo:
        return collapsed_docs_cached(df, id_col, text_col)
    # micro-batches are never re-queried (streaming batch_pairs): no
    # memo, and no stats action either — both guard arms stay built
    # (lazy; a per-batch flags action would cost more than it saves)
    membership, reps = exact_text_groups(df, id_col, text_col)
    return membership, minhash_docs(reps, id_col, text_col), None


def _verified_rep_pairs(
    membership: DataFrame,
    signed: DataFrame,
    threshold: float,
    bucket_cap: int,
    stats: dict | None,
) -> DataFrame:
    """The shared representative-level stage: capped band candidates,
    prefix-filtered fallback for over-cap buckets, exact-Jaccard verify.
    With memoized stats proving no bucket exceeds the cap, the plan is
    the PLAIN band self-join — no window count, no fallback stages."""
    if stats is not None and stats["max_bucket"] <= bucket_cap:
        cand = lsh_candidate_pairs(signed.select("doc_id", "sig"))
        return jaccard_verify(cand, signed.select("doc_id", "sh"), threshold)
    cand, oversized = guarded_band_candidates(signed, bucket_cap)
    ver = jaccard_verify(cand, signed.select("doc_id", "sh"), threshold)
    over_sh = signed.join(oversized, "doc_id").select("doc_id", "sh")
    fcand = prefix_filtered_candidates(over_sh, threshold)
    fver = jaccard_verify(fcand, signed.select("doc_id", "sh"), threshold)
    return ver.unionByName(fver).distinct()


def minhash_dedup_edges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    bucket_cap: int = DEDUP_BUCKET_CAP,
    memo: bool = True,
) -> DataFrame:
    """CONNECTIVITY-equivalent near-dup edge set (id_a, id_b): verified
    REPRESENTATIVE pairs plus hub-star edges within exact-dup groups —
    never the expanded member pair set. CC(edges) == CC(expanded pairs):
    within a group the star connects exactly the signed members (identical
    text, Jaccard exactly 1.0), and across groups members are connected
    iff their reps verified. Use this for every connected-components
    consumer: a 1e5-copy boilerplate template contributes 1e5-1 star edges
    here versus ~5e9 expanded pairs (the round-11 skew probe measured the
    CC query's shuffle going quadratic on exactly that difference).
    Pair-level semantics (the per-pair jaccard report) still need
    minhash_dedup_pairs."""
    membership, signed, stats = _collapsed(df, id_col, text_col, memo)
    rep_pairs = _verified_rep_pairs(
        membership, signed, threshold, bucket_cap, stats
    ).select("id_a", "id_b")
    if stats is not None and not stats["has_multi"]:
        return rep_pairs  # no groups: the star arm is provably empty
    star = (
        membership.join(
            signed.select(F.col("doc_id").alias("rep_id")), "rep_id"
        )
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return rep_pairs.unionByName(star)


SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 x 8-bit chunks; lossless blocker for hamming <= 3


def simhash_from_fps(fps: Column) -> Column:
    """32-bit SimHash from a *materialized* fingerprint-array column: bit j
    is set iff the sum of (+1/-1) votes from each token's bit j is positive.
    Callers must project the fps array as a real column first — passing the
    raw transform expression would inline (and re-run) every md5 32 times."""

    def voter(mask_val: int):
        m = F.lit(mask_val).cast("long")
        return lambda acc, h: acc + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)

    result = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(fps, F.lit(0), voter(1 << j))
        result = result + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return result


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Banded SimHash near-dup join: block on any equal 8-bit chunk, verify
    hamming via bit_count(xor). Guaranteed complete for hamming <= 3."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(word_tokens(F.col(text_col)), lambda t: fingerprint(t)).alias(
            "fps"
        ),
    ).select("doc_id", simhash_from_fps(F.col("fps")).alias("sh"))
    chunk_width = SIMHASH_BITS // SIMHASH_BANDS
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("sh"), b * chunk_width)
                .bitwiseAND(F.lit((1 << chunk_width) - 1))
                .alias("chunk"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    exploded = docs.select("doc_id", "sh", F.explode(chunks).alias("c")).select(
        "doc_id", "sh", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk")
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def exploded_ngrams(d, id_col: str, text_col: str, n: int, alias: str = "gram"):
    """(id, n-gram) rows via an exploded INDEX SEQUENCE, not an exploded
    lambda-built array.

    `explode(transform(...))`-style plans re-evaluate the generator's child
    expression once per EMITTED row, and higher-order lambdas
    (transform/aggregate/array_distinct) run interpreted — no whole-stage
    codegen — so exploding a k-gram array costs O(k^2) interpreted work per
    document (measured ~5 s for a 260k-gram corpus that should take
    milliseconds). Here the generator input is a cheap `sequence()`, the
    token array materializes once per input row as a Generate-preserved
    attribute, and each output row does n codegen-native element_at calls."""
    w = F.split(F.col(text_col), " ")
    base = d.filter(F.size(w) >= n).select(
        F.col(id_col),
        w.alias("_w"),
    ).select(
        id_col,
        "_w",
        F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_i"),
    )
    gram = F.concat_ws(
        " ", *[F.element_at(F.col("_w"), F.col("_i") + j) for j in range(n)]
    )
    return base.select(id_col, gram.alias(alias))


def semantic_cluster_assign(emb: DataFrame, k: int) -> DataFrame:
    """Seed-anchored cluster assignment for SemDeDup-style semantic dedup
    (plans/dedup.py dedup_semantic_clustered): broadcast the K lowest-id
    vectors as anchors, score every vector against each (fold-form
    cosine — see the in-body comment for why not the unrolled form), and
    argmax via max(struct(cos, -seed_id, embedding)) — the K scored rows
    per vector sit in the scan partition, so partial aggregation
    collapses them map-side and the shuffle carries exactly N rows. The
    production path swaps the anchor frame for trained IVF centroids
    (operators/similarity.py) — identical algebra. Returns (vec_id,
    cluster_id, embedding, nrm); the norm is computed HERE so the
    downstream pair cosine costs one dot instead of a dot plus two norm
    folds."""
    from cdc_rs_spark.operators.similarity import cosine_sql, norm_sql

    seeds = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed")
        )
    )
    # FOLD-form cosine/norm here (dim=None), deliberately: the assignment
    # scores only N x K rows, so interpreted higher-order-function
    # evaluation is cheap, while the unrolled 65-term trees made Catalyst
    # planning + codegen dominate the whole query's wall (measured ~3 s of
    # the 8.5 s planning cost at sf0.1). Bit-identical either way — the
    # unrolled form reproduces the fold's IEEE operation order exactly
    # (operators/similarity.py dot_sql) — so the oracle still matches.
    scored = emb.crossJoin(F.broadcast(seeds)).withColumn(
        "cos", F.expr(cosine_sql("embedding", "seed", None))
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(
                F.col("cos").alias("cos"),
                (-F.col("seed_id")).alias("nseed"),
                F.col("embedding").alias("emb"),
            )
        ).alias("m")
    )
    return best.select(
        "vec_id",
        (-F.col("m.nseed")).alias("cluster_id"),
        F.col("m.emb").alias("embedding"),
    ).withColumn("nrm", F.expr(norm_sql("embedding", None)))


SPAN_LEN = 40  # exact-substring window length (chars)
SPAN_STRIDE = 10  # window stride


def doc_spans(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode each document into its exact-substring windows: SPAN_LEN
    chars every SPAN_STRIDE (Lee et al. 2021 ExactSubstr sampling; docs
    shorter than one window contribute nothing). Linear explode —
    len/stride rows per doc — built JVM-side (sequence + substring, no
    Python). Shared by the batch report (plans/dedup.py
    dedup_exact_substring_spans) and the streaming probe
    (streaming/spans.py)."""
    return d.filter(F.length(text_col) >= SPAN_LEN).select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - {SPAN_LEN - 1}, "
                f"{SPAN_STRIDE}), i -> substring({text_col}, i, {SPAN_LEN}))"
            )
        ).alias("span"),
    )


# ---- content-defined anchoring (round 9, VERDICT r8 next #1) -------------
#
# Stride sampling (doc_spans above) only equates duplicate copies whose
# offsets into the shared region agree modulo SPAN_STRIDE (SCALE.md §21);
# an offset-shifted copy escapes. Content-defined anchors close that blind
# spot the way CDC chunking does (Muthitacharoen et al. 2001, LBFS): an
# anchor is a position whose local content — the CDA_K-char gram starting
# there — rolling-hashes to 0 mod CDA_W. Anchor positions are a function of
# CONTENT, not offset, so two copies of a shared region place anchors at the
# same content-relative positions and emit byte-identical SPAN_LEN windows
# no matter how the copies are shifted. Residual miss probability is
# (1 - 1/CDA_W)^(R - SPAN_LEN + 1) for a shared region of R chars — e.g.
# <2e-5 at R = 150 — versus the stride path's DETERMINISTIC miss for 9 of
# every 10 shift classes.

CDA_K = 8  # rolling-hash gram length (chars)
CDA_B = 131  # polynomial base (max |term| = 255*131^7 ~ 1.5e17: no i64 overflow)
CDA_W = 11  # anchor density: expect one anchor per CDA_W positions
_CDA_WEIGHTS = [CDA_B ** (CDA_K - 1 - j) for j in range(CDA_K)]


def cda_codes_sql(text_col: str) -> str:
    """Per-character code array (codepoint mod 256, BIGINT) — the input to
    the polynomial gram hash. Built once per row, shared by every anchor
    probe on that row."""
    return (
        f"transform(sequence(1, length({text_col})), "
        f"i -> bigint(ascii(substring({text_col}, i, 1)) % 256))"
    )


def cda_anchor_spans_sql(text_col: str, codes_col: str = "cs") -> str:
    """Array of SPAN_LEN-char windows starting at content-defined anchors:
    position i (1-based, i <= len - SPAN_LEN + 1) is an anchor iff the
    polynomial hash of the CDA_K-gram at i is 0 mod CDA_W. Pure expression —
    one pass, O(len * CDA_K) integer ops per row, whole-stage codegen."""
    gram = " + ".join(
        f"element_at({codes_col}, i+{j})*{w}L" for j, w in enumerate(_CDA_WEIGHTS)
    )
    return (
        f"filter(transform(sequence(1, length({text_col}) - {SPAN_LEN - 1}), "
        f"i -> CASE WHEN ({gram}) % {CDA_W} = 0 "
        f"THEN substring({text_col}, i, {SPAN_LEN}) END), x -> x is not null)"
    )


def doc_anchor_spans(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode each document into its content-defined-anchor windows — the
    shift-invariant sibling of doc_spans. Same downstream shape (one
    (span, doc) aggregate, frequency derived from the pre-aggregate); only
    the sampling grid differs. Docs shorter than one window contribute
    nothing, exactly like the stride path."""
    return (
        d.filter(F.length(text_col) >= SPAN_LEN)
        .withColumn("cs", F.expr(cda_codes_sql(text_col)))
        .select(
            id_col,
            F.explode(F.expr(cda_anchor_spans_sql(text_col))).alias("span"),
        )
    )
