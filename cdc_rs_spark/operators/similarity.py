"""Similarity search over embedding columns (EXTENSION per the north star).

Two paths:
  - brute-force cosine top-k: the correctness baseline. O(Q*N) dot products,
    executed as a broadcast of the (small) query set against the candidate
    table — scales with N across executors, never shuffles the big side.
  - hyperplane-LSH ANN: 16 signed random projections -> 16-bit signature;
    candidates are restricted to signatures within hamming <= r of the
    query's (multi-probe). At cluster scale the signature is the bucketing
    key (exact-match join); hamming-probe widens recall.

All vector math is fold-based column expressions over array<float> with
explicit double casts; the fold order (left-to-right) is deterministic and
matches the generated DuckDB oracle bit-for-bit (verified: identical doubles).
No UDFs — stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_rs_spark.functions.hashing import lcg_coeffs

EMB_DIM = 64
LSH_PLANES = 16

# Deterministic hyperplanes: weights in [-1, 1] with 3 decimal digits,
# derived from the shared LCG; embedded as literals in both engines.
_coeff_stream = lcg_coeffs(LSH_PLANES * EMB_DIM, seed=7)
LSH_WEIGHTS: list[list[float]] = [
    [((_coeff_stream[i * EMB_DIM + j][0] % 2001) - 1000) / 1000.0 for j in range(EMB_DIM)]
    for i in range(LSH_PLANES)
]


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product with double accumulation (matches the oracle's
    list_reduce over list_transform)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lsh_signature(emb: Column) -> Column:
    """16-bit signature: bit i set iff dot(emb, plane_i) >= 0."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(LSH_WEIGHTS):
        plane_col = F.array(*[F.lit(w) for w in plane])
        proj = dot(emb, plane_col)
        sig = sig + F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, q_emb); candidates:
    (vec_id, embedding). The query side is broadcast (small by construction);
    ranking is a per-query-partition window."""
    joined = candidates.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = cosine(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cosine"))
    )


SIG_BANDS = 4  # 16-bit signature banded into 4 x 4-bit chunks


def sig_chunks(df: DataFrame, id_col: str, sig_col: str) -> DataFrame:
    """Explode a 16-bit signature into (band, chunk) rows — lossless blocking
    for hamming <= SIG_BANDS-1 by pigeonhole (same trick as SimHash banding:
    3 differing bits can spoil at most 3 of the 4 chunks)."""
    width = LSH_PLANES // SIG_BANDS
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(sig_col), b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for b in range(SIG_BANDS)
        ]
    )
    return df.select(id_col, sig_col, F.explode(bands).alias("bc")).select(
        id_col, sig_col, F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.3,
    max_hamming: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH signatures -> banded
    equi-self-join (scalable candidate generation: shuffle on (band, chunk),
    never N^2) -> hamming gate -> exact-cosine verification >= threshold.

    Blocking is lossless for max_hamming <= SIG_BANDS-1. The embedding
    arrays are re-joined by id AFTER pair distinct-ing, so the wide vector
    column never rides through the exploded band rows."""
    sigs = df.select(id_col, lsh_signature(F.col(emb_col)).alias("sig"))
    chunks = sig_chunks(sigs, id_col, "sig")
    left = chunks.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk"
    )
    right = chunks.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk"
    )
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= max_hamming)
        .select("id_a", "id_b")
        .distinct()
    )
    ea = df.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a"))
    eb = df.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
    )


def _assign_to_centroids(candidates: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding) x broadcast centroids -> nearest-centroid
    assignment (cosine, cent_id tiebreak). The centroid set is packed into
    ONE array-of-structs row and broadcast, and the argmax runs per-vector
    inside `array_max(transform(...))` — a pure map-side pass with ZERO
    shuffle over the corpus (the window-over-crossJoin form shuffles
    N x n_centroids rows; at 100 TB that shuffle IS the cost)."""
    # per-centroid norms are computed ONCE on the 16-row side and carried in
    # the broadcast struct; the per-vector norm is computed ONCE per row
    # outside the lambda — so the interpreted lambda body does one dot and
    # one division per centroid instead of three array folds.
    # cos = dot / (norm(vec) * norm(cent)) keeps cosine()'s factor order, so
    # assignments stay bit-identical to the oracle's.
    packed = F.broadcast(
        cents.select("cent_id", "c_emb", norm(F.col("c_emb")).alias("cn"))
        .agg(F.collect_list(F.struct("cent_id", "c_emb", "cn")).alias("cs"))
    )
    # max of struct(cos, -cent_id) = highest cosine, lowest cent_id tiebreak
    best = F.array_max(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                (
                    dot(F.col("embedding"), s["c_emb"])
                    / (F.col("_vn") * s["cn"])
                ).alias("c"),
                (-s["cent_id"]).alias("nid"),
            ),
        )
    )
    return (
        candidates.withColumn("_vn", norm(F.col("embedding")))
        .crossJoin(packed)
        .select("vec_id", "embedding", (-best["nid"]).alias("cent_id"))
    )


def refine_centroids(
    candidates: DataFrame, cents: DataFrame, dim: int | None = None
) -> DataFrame:
    """One Lloyd (k-means) iteration: assign every vector to its nearest
    centroid, then replace each centroid with its cluster's element-wise
    mean. The mean accumulates exactly — inputs scale to integers by 2^44
    and sum in DECIMAL(38,0) before one double division — so the refined
    centroids are bit-identical regardless of partitioning/accumulation
    order — and reproducible by the DuckDB oracle (plans/similarity.py
    mirrors this arithmetic). Seeds that own no vectors
    drop out (standard k-means empty-cluster behavior).

    Cost shape at 100 TB: one map-side broadcast assign pass + ONE shuffle
    of k x (dim+1) partial aggregates per map task (map-side combine) — the
    standard distributed k-means step; run it a fixed small number of
    times. `dim` avoids a one-row inference job when the caller knows it."""
    assigned = _assign_to_centroids(candidates, cents)
    if dim is None:
        dim = candidates.select(F.size("embedding").alias("d")).first()["d"]
    # per-dim sums as flat agg columns (NOT posexplode+groupBy): partial
    # aggregation combines map-side, so the one shuffle moves k x dim
    # partials per task instead of N x dim exploded rows — and the argmax
    # grouping key is evaluated once per row, not once per exploded dim
    # scale-by-2^44 before the decimal cast: float32 inputs are coarse
    # dyadics that can TIE at a fractional decimal digit (Spark HALF_UP vs
    # DuckDB HALF_EVEN round apart); x * 2^44 is an exact-integer double for
    # any float32 |x| >= 2^-21, and an integer DECIMAL(38,0) cast never ties
    scale = F.lit(float(1 << 44))
    sums = assigned.groupBy("cent_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                (F.element_at("embedding", i + 1).cast("double") * scale)
                .cast("decimal(38,0)")
            ).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    return sums.select(
        "cent_id",
        F.array(
            *[
                (F.col(f"s{i}").cast("double") / scale / F.col("n"))
                for i in range(dim)
            ]
        ).alias("c_emb"),
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
    kmeans_iters: int = 1,
    dim: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into n_centroids lists
    by nearest centroid; a query probes only its nprobe closest lists.

    'Training' is deterministic AND real: callers pass hash-sampled `seeds`
    (an unbiased deterministic sample — see similarity_ivf_topk; default
    fallback is the first n_centroids vectors), then
    `kmeans_iters` exact-arithmetic Lloyd iterations refine them
    (refine_centroids), so the lists reflect actual cluster structure rather
    than the seeds alone. At cluster scale the list assignment is the
    partitioning key: probe joins shuffle nprobe/nlists of the corpus
    instead of all of it."""
    if seeds is not None:
        cents = seeds
    else:
        cents = candidates.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
        )
    if kmeans_iters:
        if dim is None:
            dim = candidates.select(F.size("embedding").alias("d")).first()["d"]
        for _ in range(kmeans_iters):
            cents = refine_centroids(candidates, cents, dim=dim)
        # the refined-centroid subplan is consumed by TWO broadcasts below
        # (list assignment + query probes); materialize the tiny k x dim
        # table once instead of re-running k-means per consumer
        cents = cents.localCheckpoint(eager=True)
    assigned = _assign_to_centroids(candidates, cents)
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("p_cos").desc(), F.col("cent_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "q_emb", "cent_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("p_cos")
        )
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "q_emb", "cent_id")
    )
    joined = assigned.join(F.broadcast(probes), "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        joined.select(
            "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def lsh_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 5, max_hamming: int = 2
) -> DataFrame:
    """ANN: restrict candidates to LSH signatures within hamming <=
    max_hamming of the query signature, then exact cosine top-k among them.
    At scale the signature equality (hamming=0) is a plain bucket join; the
    hamming probe is the multi-probe recall knob."""
    qs = queries.withColumn("q_sig", lsh_signature(F.col("q_emb")))
    cs = candidates.withColumn("c_sig", lsh_signature(F.col("embedding")))
    joined = cs.join(
        F.broadcast(qs),
        (F.col("vec_id") != F.col("query_id"))
        & (
            F.bit_count(F.col("q_sig").bitwiseXOR(F.col("c_sig")))
            <= max_hamming
        ),
    )
    cos = cosine(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def int8_quantize(emb: Column) -> Column:
    """Symmetric int8 scalar quantization: scale = max|x| mapped to 127,
    q_i = floor(x_i/scale*127 + 0.5) (explicit half-up — engine-portable,
    unlike round()'s differing tie rules). The memory story at 100 TB:
    a 64-dim float32 vector (256 B) becomes 64 int8s, 4x smaller shuffle
    and cache footprint, and all downstream dot products become EXACT
    integer arithmetic (order-independent, no FP fold-order concerns)."""
    scale = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    return F.transform(
        emb,
        lambda x: F.floor(x.cast("double") / safe * 127.0 + 0.5).cast("long"),
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over int8-quantized vectors: integer dot/norms (exact), one
    final double division."""
    idot = F.aggregate(
        F.zip_with(qa, qb, lambda a, b: a * b), F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(qa, lambda a: a * a), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(qb, lambda b: b * b), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    return idot.cast("double") / (na * nb)
