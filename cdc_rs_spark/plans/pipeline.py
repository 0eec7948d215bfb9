"""Training-data pipeline + warehouse-shape queries (SURVEY §2.2 EXTENSION
depth): deterministic sampling, group-aware train/test splits, token
explode, pivot/unpivot reshaping, token-budget packing, PII scrubbing, and an
SCD2 (slowly-changing-dimension type-2) history build from the CDC change
log.

Every query is fully oracle-checked. Determinism discipline: any "random"
choice (sampling, splits) is a salted md5-bucket of the row key — identical
in Spark (`conv(substr(md5(x),1,8),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(x),1,8) AS UBIGINT)`) — so results are exactly
reproducible, partitioning-independent, and hash-comparable. At 100 TB the
same expressions run map-side with zero shuffle (a hash of the key needs no
coordination), which is precisely why hash-bucket sampling beats
reservoir/`rand()` sampling for large-scale corpus work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_rs_spark.envelope import snapshot_changes
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import jvm_literal_df, load, spread
from cdc_rs_spark.sources.synthetic import ORACLE_LIVE_CHANGES, live_orders_changes


def hash_bucket(col, buckets: int = 100):
    """Deterministic [0, buckets) bucket from a column value: first 8 hex
    chars of md5 of the string form. Map-side only — the scale-path
    replacement for rand() sampling (reproducible, join-stable, no state)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % buckets
    )


def _oracle_bucket(expr: str, buckets: int = 100) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8))"
        f" AS UBIGINT) % {buckets}"
    )


@register(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE {_oracle_bucket('doc_id')} < 10
    GROUP BY lang
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus sample via md5 bucket of doc_id, summarized
    per language. Unlike df.sample(), re-runs and retries select the SAME
    rows, and the predicate is a pure map-side filter (no sort, no state,
    pushes below any downstream join)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(hash_bucket(F.col("doc_id")) < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


@register(
    "train_test_split_group_aware",
    oracle=f"""
    WITH assigned AS (
        SELECT o.*,
               CASE WHEN {_oracle_bucket('o_custkey')} < 80 THEN 'train'
                    WHEN {_oracle_bucket('o_custkey')} < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM orders o
    )
    SELECT split, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM assigned GROUP BY split
    """,
)
def train_test_split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 80/10/10 train/valid/test split: the bucket is computed on
    the GROUP key (o_custkey), so every order of a customer lands in the same
    split — the leakage-free split a training pipeline needs. Map-side
    assignment; one shuffle for the summary agg."""
    orders = load(spark, sf_dir, "orders")
    b = hash_bucket(F.col("o_custkey"))
    assigned = orders.withColumn(
        "split",
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("valid")).otherwise(
            F.lit("test")
        ),
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "explode_tokens_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM tokens WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def explode_tokens_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF/lateral-view surface: explode whitespace tokens of the corpus and
    count the top-20 terms (deterministic tiebreak). The 1→N expansion stays
    JVM-side (split + explode generate, no Python); at 100 TB the token count
    is a classic map-side-combine agg — partial counts per partition, one
    shuffle of distinct tokens only."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority pivoted on status.
    Explicit pivot values — Catalyst compiles this to ONE pass of conditional
    aggregation (no per-value scans, no distinct-values collect job)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )


@register(
    "unpivot_priority_metrics",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM stats
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM stats
    """,
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long): per-priority stats melted to
    (priority, metric, value) rows via DataFrame.unpivot — the built-in
    Expand node, one pass, no self-union of the aggregate."""
    orders = load(spark, sf_dir, "orders")
    stats = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_price"),
    )
    return stats.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "pack_documents_token_budget",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM sized
    )
    SELECT CAST(floor((cum - 1) / 4096) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY bin
    """,
)
def pack_documents_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents (ordered by doc_id)
    to ~4096-token bins by cumulative token count, then summarize bins.
    The corpus-wide running sum is the two-pass range-bucketed prefix
    (operators/ranged.py): bucket by sampled doc_id quantiles, per-bucket
    token totals -> exclusive offsets, then a PARTITIONED window adds each
    bucket's offset to its local cumsum — exact global cumsum, no
    Exchange SinglePartition anywhere in the plan (asserted in
    tests/test_scale_plans.py)."""
    from cdc_rs_spark.operators.ranged import global_cumsum, ranked_result

    docs = load(spark, sf_dir, "documents")
    # whitespace token count = spaces + 1, cheap and engine-agnostic
    sized = docs.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + F.lit(1)
        ).alias("n_tokens"),
    )

    def build(cached):
        packed = global_cumsum(
            cached, "doc_id", [F.asc("doc_id")], "n_tokens", out_col="cum"
        )
        return (
            packed.withColumn("bin", F.floor((F.col("cum") - 1) / 4096))
            .groupBy("bin")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("bin_tokens"),
            )
        )

    return ranked_result(sized, build)


@register(
    "pii_scrub_documents",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 7 = 0
                    THEN 'contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com via https://example.com/u/'
                         || CAST(doc_id AS VARCHAR) || ' ' || text
                    ELSE text END AS text
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id, lang, text,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
                   'https?://[^ ]+', '<URL>', 'g') AS clean
        FROM seeded
    )
    SELECT lang,
           COUNT(*) FILTER (WHERE clean <> text) AS n_scrubbed,
           CAST(SUM(length(text) - length(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed GROUP BY lang
    """,
)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: redact emails and URLs with built-in
    regexp_replace (JVM codegen — no Python in the hot path), report
    scrub counts per language. A deterministic seeding step plants one
    email+URL in every 7th doc so the scrub provably fires; regexes are
    chosen to behave identically in Java regex and RE2."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit("contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via https://example.com/u/"),
                F.col("doc_id").cast("string"),
                F.lit(" "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.col("text"), r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"
        ),
        r"https?://[^ ]+",
        "<URL>",
    )
    scrubbed = seeded.withColumn("clean", clean)
    return scrubbed.groupBy("lang").agg(
        F.count(F.when(F.col("clean") != F.col("text"), 1)).alias("n_scrubbed"),
        F.sum(F.length("text") - F.length("clean")).alias("chars_removed"),
    )


@register(
    "scd2_order_price_history",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total FROM backfill
        UNION ALL SELECT op, okey, ts, total FROM live
    ),
    versioned AS (
        SELECT *, lead(ts) OVER (PARTITION BY okey ORDER BY ts) AS valid_to
        FROM all_changes
    )
    SELECT okey, total, ts AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM versioned WHERE op <> 'Delete'
    """,
)
def scd2_order_price_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing dimension) built straight from the CDC
    change log: every non-delete change becomes a version row with
    [valid_from, valid_to) derived via lead() over the per-key timeline;
    deletes terminate the prior version without emitting one. This is the
    warehouse-side materialization the reference's UPSERT stream feeds
    (test.rhai:27-33) — one shuffle on the key, identical at any scale."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    img = F.coalesce(F.col("after"), F.col("before"))
    changes = backfill.unionByName(live).select(
        "op",
        img[F.col("pkey")].cast("bigint").alias("okey"),
        "ts",
        F.col("after")["o_totalprice"].cast("double").alias("total"),
    )
    w = Window.partitionBy("okey").orderBy("ts")
    versioned = changes.withColumn("valid_to", F.lead("ts").over(w))
    return versioned.filter(F.col("op") != "Delete").select(
        "okey",
        "total",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "sample_stratified_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {_oracle_bucket('doc_id', 1000000)}, doc_id
               ) AS rn
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM ranked WHERE rn <= 50 GROUP BY lang
    """,
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced sampling: cap every language at 50 documents, chosen by
    a deterministic hash order (not file order, which is load-dependent; not
    rand(), which is retry-unstable). The per-stratum rank comes from
    operators/ranged.grouped_rank (VERDICT r4 task 2): a raw
    Window.partitionBy(lang) funnels the 41 %-of-corpus 'en' stratum through
    ONE task; the grouped two-pass form splits every stratum across the
    hash-key range buckets, so no task ever sorts more than ~|stratum|/B
    rows at any corpus size. Selection contract is unchanged (same hash
    order, same cap)."""
    from cdc_rs_spark.operators.ranged import grouped_rank, ranked_result

    docs = load(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id"
    ).withColumn("_hk", hash_bucket(F.col("doc_id"), 1_000_000))

    def build(d: DataFrame) -> DataFrame:
        ranked = grouped_rank(
            d, ["lang"], "_hk", [F.col("_hk"), F.col("doc_id")], out_col="_rk"
        )
        return (
            ranked.filter(F.col("_rk") < 50)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_kept"),
                F.sum("n_chars").alias("chars_kept"),
            )
        )

    return ranked_result(docs, build)


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col,
           COUNT(*) AS n, COUNT(o_custkey) AS n_nonnull,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column null/distinct/min/max stats in ONE scan —
    the agg computes all columns' stats together and unpivots, instead of
    one scan per column (the naive UNION the oracle spells out). Catalyst
    plans the distinct counts as a single Expand + two-level agg."""
    orders = load(spark, sf_dir, "orders")
    stats = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_custkey"),
        F.countDistinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("min_custkey"),
        F.max("o_custkey").cast("string").alias("max_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
    )
    row = F.struct
    return stats.select(
        F.explode(
            F.array(
                row(
                    F.lit("o_custkey").alias("col"), F.col("n").alias("n"),
                    F.col("nn_custkey").alias("n_nonnull"),
                    F.col("nd_custkey").alias("n_distinct"),
                    F.col("min_custkey").alias("min_v"),
                    F.col("max_custkey").alias("max_v"),
                ),
                row(
                    F.lit("o_orderstatus").alias("col"), F.col("n").alias("n"),
                    F.col("nn_status").alias("n_nonnull"),
                    F.col("nd_status").alias("n_distinct"),
                    F.col("min_status").alias("min_v"),
                    F.col("max_status").alias("max_v"),
                ),
                row(
                    F.lit("o_orderpriority").alias("col"), F.col("n").alias("n"),
                    F.col("nn_prio").alias("n_nonnull"),
                    F.col("nd_prio").alias("n_distinct"),
                    F.col("min_prio").alias("min_v"),
                    F.col("max_prio").alias("max_v"),
                ),
            )
        ).alias("s")
    ).select("s.col", "s.n", "s.n_nonnull", "s.n_distinct", "s.min_v", "s.max_v")


@register(
    "scd2_as_of_snapshot",
    oracle=f"""
    WITH live AS ({ORACLE_LIVE_CHANGES}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total FROM backfill
        UNION ALL SELECT op, okey, ts, total FROM live
    ),
    versioned AS (
        SELECT *, lead(ts) OVER (PARTITION BY okey ORDER BY ts) AS valid_to
        FROM all_changes
    )
    SELECT okey, total
    FROM versioned
    WHERE op <> 'Delete' AND ts <= 150 AND (valid_to IS NULL OR valid_to > 150)
    """,
)
def scd2_as_of_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history: reconstruct the table AS OF ts=150
    — after the live updates/deletes (ts=100) but before the inserts
    (ts=200). A pure filter on the version intervals: updated keys show the
    corrected price, deleted keys are absent, future inserts invisible.
    At scale the history partitions by valid_from date, so an as-of filter
    prunes to the partitions overlapping the target time."""
    t = 150
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    img = F.coalesce(F.col("after"), F.col("before"))
    changes = backfill.unionByName(live).select(
        "op",
        img[F.col("pkey")].cast("bigint").alias("okey"),
        "ts",
        F.col("after")["o_totalprice"].cast("double").alias("total"),
    )
    w = Window.partitionBy("okey").orderBy("ts")
    versioned = changes.withColumn("valid_to", F.lead("ts").over(w))
    return versioned.filter(
        (F.col("op") != "Delete")
        & (F.col("ts") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("okey", "total")


# target mix: a config table of per-source keep-rates (percent of docs kept)
MIX_WEIGHTS = [("src%d" % i, 100 if i < 5 else (40 if i < 10 else 10)) for i in range(20)]


@register(
    "data_mix_by_source",
    oracle=f"""
    WITH weights(source, keep_pct) AS (
        VALUES {", ".join(f"('{s}', {w})" for s, w in MIX_WEIGHTS)}
    )
    SELECT d.source, w.keep_pct, COUNT(*) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
    FROM documents d
    JOIN weights w ON d.source = w.source
    WHERE {_oracle_bucket('d.doc_id')} < w.keep_pct
    GROUP BY d.source, w.keep_pct
    """,
)
def data_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: resample each source at a configured rate (the training-
    mix recipe — upweight curated sources, downsample bulk crawl). The
    weights are a config TABLE broadcast onto the corpus, and the keep
    decision is the deterministic hash bucket — so the mix is reproducible,
    and re-mixing with new weights re-selects a superset/subset rather than
    an unrelated sample (bucket < rate nests across rates)."""
    docs = load(spark, sf_dir, "documents")
    from cdc_rs_spark.session import jvm_literal_df

    weights = jvm_literal_df(spark, MIX_WEIGHTS, "source string, keep_pct int")
    return (
        docs.join(F.broadcast(weights), "source")
        .filter(hash_bucket(F.col("doc_id")) < F.col("keep_pct"))
        .groupBy("source", "keep_pct")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


@register(
    "corpus_shuffle_deterministic",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   ORDER BY {_oracle_bucket('doc_id', 1000000)}, doc_id
               ) AS shuffle_rank
        FROM documents
    )
    SELECT doc_id, source, shuffle_rank
    FROM ranked WHERE shuffle_rank <= 100
    """,
)
def corpus_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order shuffle: a reproducible global permutation of the
    corpus by md5 bucket (not rand() — retry-stable, and re-shuffles with a
    different epoch are just a different salt in the hashed expression).
    First 100 positions shown for the oracle. At 100 TB nobody materializes
    a global row_number: range-partition BY the hash bucket and
    sortWithinPartitions — writer file/row order then IS this permutation
    with zero global coordination; this entry pins the order contract.
    The pinned top-100 itself is `orderBy(bucket, id).limit(100)` — Spark
    plans TakeOrderedAndProject (per-partition top-k, merge k·P rows on the
    driver, NO global sort); only the 100 surviving rows see a window to
    number them."""
    docs = load(spark, sf_dir, "documents")
    top = (
        docs.select(
            "doc_id", "source", hash_bucket(F.col("doc_id"), 1_000_000).alias("_b")
        )
        .orderBy("_b", "doc_id")
        .limit(100)
    )
    w = Window.orderBy("_b", "doc_id")  # 100 rows by construction
    return (
        top.withColumn("shuffle_rank", F.row_number().over(w))
        .select("doc_id", "source", "shuffle_rank")
    )


@register(
    "dq_expectations_orders",
    oracle="""
    SELECT 'totalprice_positive' AS rule,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_violations,
           COUNT(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'custkey_not_null', COUNT(*) FILTER (WHERE o_custkey IS NULL),
           COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
           COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_has_order', COUNT(*) FILTER (WHERE o.o_orderkey IS NULL),
           COUNT(*)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations gate (the dbt-test / Deequ shape a pipeline
    runs before training consumption): each rule yields
    (rule, n_violations, n_checked) — column constraints are conditional
    aggregates over ONE scan; the referential-integrity rule is a left
    anti-ish join counted without materializing violating rows. At 100 TB
    every rule stays map-side except the FK join, which broadcasts the
    smaller key set."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def rule(name, violated):
        return orders.agg(
            F.lit(name).alias("rule"),
            F.count(F.when(violated, 1)).alias("n_violations"),
            F.count("*").alias("n_checked"),
        )

    col_rules = rule("totalprice_positive", F.col("o_totalprice") <= 0).unionByName(
        rule("custkey_not_null", F.col("o_custkey").isNull())
    ).unionByName(
        rule("status_in_domain", ~F.col("o_orderstatus").isin("O", "F", "P"))
    )
    fk = (
        li.join(
            orders.select(F.col("o_orderkey")),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.lit("lineitem_has_order").alias("rule"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_violations"),
            F.count("*").alias("n_checked"),
        )
    )
    return col_rules.unionByName(fk)


@register(
    "sample_weighted_priority",
    oracle=f"""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST({_oracle_bucket('doc_id', 1000000)} AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS priority
    FROM documents WHERE n_chars > 0
    ORDER BY priority, doc_id LIMIT 200
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sampling (priority sampling): each
    doc draws a deterministic pseudo-uniform u = md5-bucket(doc_id)/1e6 and
    keeps key u/weight; the k SMALLEST keys are the sample, with inclusion
    probability proportional to weight (here n_chars — longer docs more
    likely). Unlike rand()-based weighted sampling this is retry-stable and
    join-stable, and unlike ln(u)^(1/w) variants it uses only one IEEE
    division, which is correctly-rounded and therefore bit-identical across
    engines. Key computation is map-side; selection is orderBy+limit =
    TakeOrdered (per-partition top-k heaps, no global sort shuffle)."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    priority = hash_bucket(F.col("doc_id"), 1_000_000).cast("double") / F.col(
        "n_chars"
    ).cast("double")
    return (
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            priority.alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(200)
    )


@register(
    "scd2_temporal_fact_join",
    oracle=f"""
    WITH live AS ({{live}}),
    backfill AS (
        SELECT 'Backfill' AS op, o_orderkey AS okey, 1::BIGINT AS ts,
               o_totalprice AS total
        FROM orders
    ),
    all_changes AS (
        SELECT op, okey, ts, total FROM backfill
        UNION ALL SELECT op, okey, ts, total FROM live
    ),
    hist AS (
        SELECT okey, total, ts AS valid_from,
               lead(ts) OVER (PARTITION BY okey ORDER BY ts) AS valid_to, op
        FROM all_changes
        QUALIFY op <> 'Delete'
    ),
    facts AS (
        SELECT l_orderkey AS okey, l_quantity,
               CASE WHEN l_linenumber % 2 = 0 THEN 50 ELSE 150 END AS fact_ts
        FROM lineitem WHERE l_orderkey % 10 = 3
    )
    SELECT h.okey, h.valid_from, CAST(h.total AS DOUBLE) AS version_total,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM facts f JOIN hist h
      ON f.okey = h.okey
     AND f.fact_ts >= h.valid_from
     AND (h.valid_to IS NULL OR f.fact_ts < h.valid_to)
    GROUP BY h.okey, h.valid_from, h.total
    """.replace("{live}", ORACLE_LIVE_CHANGES),
)
def scd2_temporal_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse temporal join: facts joined to the SCD2 dimension
    version that was valid AT EACH FACT'S OWN event time (not a fixed AS-OF
    instant — every fact row time-travels independently). Facts probe at two
    synthetic times straddling the live update (ts 50 < 100 < 150), so an
    order's lineitems split across its price versions. The join is
    equi-keyed on the order key with the validity interval as a residual
    range predicate — Catalyst plans the hash/sort-merge join ON THE KEY and
    evaluates the interval post-match, so the shuffle is the same single
    key-shuffle as any fact-dim join (never an interval cross product); at
    100 TB the history side additionally prunes by partitioning on
    valid_from date."""
    orders = load(spark, sf_dir, "orders")
    backfill = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    live = live_orders_changes(spark, sf_dir)
    img = F.coalesce(F.col("after"), F.col("before"))
    changes = backfill.unionByName(live).select(
        "op",
        img[F.col("pkey")].cast("bigint").alias("okey"),
        "ts",
        F.col("after")["o_totalprice"].cast("double").alias("total"),
    )
    w = Window.partitionBy("okey").orderBy("ts")
    hist = (
        changes.withColumn("valid_to", F.lead("ts").over(w))
        .filter(F.col("op") != "Delete")
        .select("okey", "total", F.col("ts").alias("valid_from"), "valid_to")
    )
    li = load(spark, sf_dir, "lineitem")
    facts = li.filter(F.col("l_orderkey") % 10 == 3).select(
        F.col("l_orderkey").alias("f_okey"),
        F.col("l_quantity"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(50))
        .otherwise(F.lit(150))
        .alias("fact_ts"),
    )
    joined = facts.join(
        hist,
        (F.col("f_okey") == F.col("okey"))
        & (F.col("fact_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fact_ts") < F.col("valid_to"))),
    )
    return joined.groupBy("okey", "valid_from", "total").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    ).select(
        "okey",
        "valid_from",
        F.col("total").cast("double").alias("version_total"),
        "n_items",
        "sum_qty",
    )


@register(
    "sample_contrastive_negatives",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
    cand AS (
        SELECT a.doc_id, u.j,
               CAST({_oracle_bucket("CAST(a.doc_id AS VARCHAR) || '#' || CAST(u.j AS VARCHAR)", 1000000)}
                    % n.cnt AS BIGINT) AS neg_id
        FROM documents a CROSS JOIN n, unnest([1, 2, 3, 4]) AS u(j)
    )
    SELECT c.doc_id, c.j, c.neg_id, d.lang AS neg_lang
    FROM cand c JOIN documents d ON d.doc_id = c.neg_id
    WHERE c.neg_id <> c.doc_id
    """,
)
def sample_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each anchor
    doc draws 4 pseudo-random negatives via md5-bucket of (doc_id, j) modulo
    the corpus size — retry-stable (stragglers/speculation re-draw the SAME
    negatives), uniform over the corpus, and joinable: the draw is a pure
    map-side expression, then ONE equi-join fetches the negatives' payload.
    The corpus count arrives as a 1-row cross-broadcast (never a driver
    collect). Self-collisions (neg == anchor) are filtered, not re-rolled —
    at corpus scale the loss is ~k/N and bias-free."""
    docs = load(spark, sf_dir, "documents")
    cnt = docs.agg(F.count("*").alias("cnt"))
    j = F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("j")
    cand = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(cnt))
        .select("doc_id", j, F.col("cnt"))
        .withColumn(
            "neg_id",
            (
                hash_bucket(
                    F.concat_ws("#", F.col("doc_id"), F.col("j")), 1_000_000
                )
                % F.col("cnt")
            ).cast("bigint"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
        .select("doc_id", "j", "neg_id")
    )
    neg = docs.select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    return cand.join(neg, "neg_id").select("doc_id", "j", "neg_id", "neg_lang")


_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{edge}' AS edge, COUNT(*) AS child_rows,
           COUNT(*) - COUNT(p.k) AS orphans
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pkey} AS k FROM {parent}) p
           ON c.{ckey} = p.k
    """
        for edge, child, ckey, parent, pkey in _FK_EDGES
    ),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every foreign-key edge of the star
    schema, count child rows whose key has no match in the parent (orphans).
    Each edge is a left join against the parent's distinct keys + one
    conditional count — at 100 TB that is a shuffle join on the key per edge
    (broadcast when the parent is a dimension), with the distinct collapsing
    map-side; all seven audits share one DAG, so common scans (lineitem twice,
    nation twice) are reused. The governance gate a training pipeline runs
    before trusting a snapshot — analog of the reference's schema checks on
    ingested change rows."""
    out = None
    for edge, child, ckey, parent, pkey in _FK_EDGES:
        c = load(spark, sf_dir, child).select(F.col(ckey).alias("ck"))
        p = (
            load(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
        )
        summary = (
            c.join(p, c.ck == p.k, "left")
            .agg(
                F.lit(edge).alias("edge"),
                F.count("*").alias("child_rows"),
                (F.count("*") - F.count("k")).alias("orphans"),
            )
        )
        out = summary if out is None else out.unionByName(summary)
    return out


@register(
    "feature_ntile_binning_lineitem",
    oracle="""
    WITH binned AS (
        SELECT l_extendedprice,
               NTILE(10) OVER (ORDER BY l_extendedprice,
                               l_orderkey, l_linenumber) AS bin
        FROM lineitem
    )
    SELECT bin, COUNT(*) AS n,
           MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
           (SELECT COUNT(*) FROM lineitem) / (10 * CAST(COUNT(*) AS DOUBLE))
               AS inv_freq_weight
    FROM binned GROUP BY bin
    """,
)
def feature_ntile_binning_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning: NTILE(10) deciles of l_extendedprice
    (deterministic total order via key tiebreaks) with per-bin bounds and
    the inverse-frequency weight N/(k*n_bin) used to rebalance skewed
    features/classes at training time.

    No rank is ever materialized: NTILE's exact row distribution is a pure
    function of n_total (first n%10 bins get one extra row), and each bin's
    lo/hi is the PRICE at a known global rank — which is identical under any
    tie-breaking order because price is the leading sort key. Those 20 rank
    values resolve via distributed selection (operators/quantiles.py
    exact_rank_values: sketch brackets at b/10 hints + one zone-histogram
    pass), so the whole query is two codegen'd scans and a 10-row literal
    result — strictly less work than the previous two-pass range-bucketed
    global rank, and no data-sized window at ANY scale. The approx-threshold
    regime for when exact equi-depth is NOT contractual stays pinned by
    outlier_iqr_approx_lineitem."""
    from cdc_rs_spark.operators.quantiles import exact_rank_values

    li = load(spark, sf_dir, "lineitem")
    k = 10

    def boundaries(n: int) -> list[tuple[int, int, int]]:
        """(bin, start_rank, size) per NTILE(k) bin."""
        q, r = divmod(n, k)
        out, start = [], 0
        for b in range(1, k + 1):
            size = q + 1 if b <= r else q
            out.append((b, start, size))
            start += size
        return out

    def ranks_for_n(n: int):
        ranks = []
        for _, start, size in boundaries(n):
            if size:
                ranks += [start, start + size - 1]
        return ranks

    resolved = exact_rank_values(
        li,
        "l_extendedprice",
        [b / k for b in range(k + 1)],
        ranks_for_n,
        accuracy=8000,  # 11 brackets: tighter margins shrink the candidate
        # collect ~8x for a sketch cost that grows far slower (measured)
    )
    schema = (
        "bin int, n bigint, lo double, hi double, inv_freq_weight double"
    )
    if not resolved:  # empty table: no bins (matches NTILE-over-nothing)
        return spark.createDataFrame([], schema)
    (n_total, rank_val) = resolved[()]

    rows = []
    for b, start, size in boundaries(n_total):
        if size == 0:  # n_total < k: NTILE emits no row for empty bins
            continue
        lo, hi = rank_val[start], rank_val[start + size - 1]
        inv = n_total / (k * size)
        rows.append(f"({b}, {size}L, {lo!r}D, {hi!r}D, {inv!r}D)")
    return spark.sql(
        "SELECT col1 AS bin, col2 AS n, col3 AS lo, col4 AS hi, "
        "col5 AS inv_freq_weight FROM VALUES " + ", ".join(rows)
    )


@register(
    "zone_map_manifest_lineitem",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS part_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_okey,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_okey,
           CAST(MIN(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS min_qty,
           CAST(MAX(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS max_qty,
           CAST(MIN(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(l_extendedprice AS DOUBLE)) AS DOUBLE) AS max_price,
           MAX(CAST(l_quantity AS DOUBLE)) <= 45.0 AS skip_qty_gt_45
    FROM lineitem GROUP BY 1
    """,
)
def zone_map_manifest_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping manifest: per ship-month partition, the
    min/max statistics a lakehouse keeps per file (Delta/Iceberg column
    stats, parquet row-group stats) plus a concrete skip decision — whether
    a `l_quantity > 45` scan can prune the whole partition from its max
    stat. This is the metadata side of the engine's own pushdown story
    (SCALE.md §3): at 100 TB the manifest is what turns a full scan into a
    partition-pruned one, and computing it is a single map-side-combinable
    min/max agg shuffling |months| rows."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    return li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("part_month")
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("l_orderkey").cast("bigint").alias("min_okey"),
        F.max("l_orderkey").cast("bigint").alias("max_okey"),
        F.min(qty).alias("min_qty"),
        F.max(qty).alias("max_qty"),
        F.min(price).alias("min_price"),
        F.max(price).alias("max_price"),
        (F.max(qty) <= 45.0).alias("skip_qty_gt_45"),
    )


from cdc_rs_spark.functions.text import LANG_STOPWORDS as _LSW

_EN_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in _LSW["en"]) + "]"


@register(
    "curriculum_batches",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    scored AS (
        SELECT doc_id,
               ROUND(0.4 * (len(list_filter(w, t -> list_contains(
                         {_EN_STOPLIST_SQL}, t)))::DOUBLE
                     / len(w))
                     + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6) AS quality
        FROM t
    ),
    ranked AS (
        SELECT doc_id, quality,
               row_number() OVER (ORDER BY quality DESC, doc_id) - 1 AS rk
        FROM scored
    )
    SELECT CAST(rk // 50 AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(quality) AS min_quality,
           MAX(quality) AS max_quality,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM ranked GROUP BY 1
    """,
)
def curriculum_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: rank the corpus by quality (cleanest first,
    doc_id tiebreak for total determinism) and cut it into fixed-size
    training batches of 50; report each batch's quality envelope. The
    global rank is the two-pass range-bucketed rank (operators/ranged.py):
    sampled quality quantiles -> per-bucket counts -> exclusive offsets ->
    PARTITIONED window rank + offset — exactly how Spark's own global sort
    decomposes, with no Exchange SinglePartition in the plan (asserted in
    tests/test_scale_plans.py); batch stats are map-side combinable."""
    from cdc_rs_spark.functions.text import quality_score
    from cdc_rs_spark.operators.ranged import global_rank, ranked_result

    d = spread(load(spark, sf_dir, "documents"))
    scored = d.select("doc_id", quality_score(F.col("text")).alias("quality"))

    def build(cached):
        ranked, _ = global_rank(
            cached,
            "quality",
            [F.desc("quality"), F.asc("doc_id")],
            descending=True,
            out_col="rk",
        )
        return (
            ranked.groupBy(
                F.floor(F.col("rk") / 50).cast("bigint").alias("batch_id")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.min("quality").alias("min_quality"),
                F.max("quality").alias("max_quality"),
                F.min("doc_id").cast("bigint").alias("first_doc"),
            )
        )

    return ranked_result(scored, build)


@register(
    "feature_hashing_buckets",
    oracle="""
    WITH toks AS (
        SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    hashed AS (
        SELECT token,
               CAST(('0x' || substring(md5(token), 1, 8)) AS UBIGINT) % 64
                   AS bucket
        FROM toks WHERE token <> ''
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           MIN(token) AS example_token
    FROM hashed GROUP BY bucket
    """,
)
def feature_hashing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer's collision profile: every distinct
    corpus token is hashed (engine-portable md5 bucket) into a fixed
    64-dimension feature space; per bucket, how many distinct tokens
    collide. This is the audit a feature-hashed training pipeline runs to
    size its hash dimension. Tokenize+distinct is the only data-sized
    stage (map-side combinable distinct on the token key); the bucket
    rollup is 64 rows."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint") % 64
    )
    return (
        toks.select("token", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.min("token").alias("example_token"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_tokens", "example_token")
    )


@register(
    "data_mix_temperature_sampling",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ),
    mn AS (SELECT MIN(n) AS n_min FROM counts),
    rates AS (
        SELECT source, n,
               CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n) * 1000000) AS BIGINT)
                   AS keep_ppm
        FROM counts, mn
    )
    SELECT d.source, r.n AS n_total, r.keep_ppm,
           CAST(COUNT(*) FILTER (
               WHERE {_oracle_bucket('d.doc_id', 1000000)} < r.keep_ppm
           ) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r USING (source)
    GROUP BY 1, 2, 3
    """,
)
def data_mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multilingual-corpus recipe:
    sample source s at rate ∝ n_s^(alpha-1), alpha=0.5, normalized so the
    SMALLEST source keeps 100%) — unlike data_mix_by_source's fixed config
    table, the rates here are DERIVED from the corpus itself. The keep
    decision stays the deterministic md5 bucket against an integer
    parts-per-million threshold (floor(sqrt(n_min/n)*1e6) — one
    correctly-rounded sqrt + multiply + floor, engine-identical), so the
    mix is retry-stable and nests across re-mixes. Scale shape: per-source
    counts are ONE map-side-combinable agg (|sources| rows, broadcast
    back); the keep filter is a map-side expression; the final rollup
    shuffles |sources| groups."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n")) * 1_000_000
        ).cast("bigint").alias("keep_ppm"),
    )
    joined = docs.join(F.broadcast(rates), "source")
    return (
        joined.groupBy(
            "source", F.col("n").alias("n_total"), "keep_ppm"
        )
        .agg(
            F.count(
                F.when(
                    hash_bucket(F.col("doc_id"), 1_000_000) < F.col("keep_ppm"),
                    1,
                )
            ).cast("bigint").alias("n_kept")
        )
    )


@register(
    "k_anonymity_audit_customer",
    oracle="""
    WITH q AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
                   AS bal_bucket,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN grp_n < 5 THEN 'k<5'
                WHEN grp_n < 20 THEN '5<=k<20'
                ELSE 'k>=20' END AS risk_band,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(grp_n) AS DOUBLE)
                 / (SELECT COUNT(*) FROM customer), 6) AS row_share
    FROM q GROUP BY 1
    """,
)
def k_anonymity_audit_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for training-data release: k-anonymity over the
    quasi-identifier tuple (nation, market segment, coarse balance bucket)
    — how many equivalence groups fall below k=5 / k=20, and what share of
    rows they carry. Rows in small groups are re-identifiable and a PII
    scrub (pii_scrub_documents) doesn't help if the combination itself is
    identifying; this is the report a release gate consumes. Shape: one
    map-side-combinable agg on the quasi-identifier key, then a
    |groups|-sized band rollup; the total is a 1-row broadcast."""
    cust = load(spark, sf_dir, "customer")
    grp = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") / 1000)
        .cast("bigint")
        .alias("bal_bucket"),
    ).agg(F.count("*").cast("bigint").alias("grp_n"))
    total = cust.agg(F.count("*").alias("n_total"))
    band = (
        F.when(F.col("grp_n") < 5, F.lit("k<5"))
        .when(F.col("grp_n") < 20, F.lit("5<=k<20"))
        .otherwise(F.lit("k>=20"))
    )
    return (
        grp.select(band.alias("risk_band"), "grp_n")
        .groupBy("risk_band")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("grp_n").cast("bigint").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "risk_band",
            "n_groups",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_total"), 6
            ).alias("row_share"),
        )
    )


@register(
    "gdpr_forget_manifest",
    oracle=f"""
    WITH forgotten AS (
        SELECT c_custkey AS k FROM customer
        WHERE {_oracle_bucket('c_custkey')} < 2
    ),
    f_orders AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT k FROM forgotten)
    ),
    m AS (
        SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_subjects
        FROM customer WHERE c_custkey IN (SELECT k FROM forgotten)
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        FROM f_orders
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM lineitem l JOIN f_orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'events', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT)
        FROM events WHERE user_id IN (SELECT k FROM forgotten)
    )
    SELECT * FROM m
    """,
)
def gdpr_forget_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge manifest: given a deterministic set of
    data subjects (2% hash bucket of customers — standing in for the
    erasure-request list), report every table's blast radius INCLUDING the
    indirect cascade: lineitem rows reach the subject only through their
    orders (no custkey column), exactly the join a real erasure job must
    follow before issuing deletes. The governance companion of
    pii_scrub_documents (content redaction) and k_anonymity_audit_customer
    (re-identification risk): scrub cleans text, this enumerates rows to
    DELETE — and downstream, the CDC path already handles the deletes
    themselves (tombstones through compaction and retraction algebra).

    Scale shape: the subject list is request-sized — broadcast semi-joins
    against every fact scan (no shuffle of fact rows); the cascade is one
    broadcast-sized hop (the subjects' orders). Counts are
    map-side-combinable."""
    c = load(spark, sf_dir, "customer")
    forgotten = c.filter(hash_bucket(F.col("c_custkey")) < 2).select(
        F.col("c_custkey").alias("k")
    )
    orders = load(spark, sf_dir, "orders")
    f_orders = orders.join(
        F.broadcast(forgotten), orders["o_custkey"] == F.col("k")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")

    def row(name: str, df: DataFrame, subject_col: str) -> DataFrame:
        return df.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(subject_col).cast("bigint").alias("n_subjects"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "n_subjects")

    cust_hit = c.join(F.broadcast(forgotten), c["c_custkey"] == F.col("k"))
    li_hit = li.join(
        F.broadcast(f_orders), li["l_orderkey"] == f_orders["o_orderkey"]
    )
    ev_hit = events.join(
        F.broadcast(forgotten), events["user_id"] == F.col("k")
    )
    return (
        row("customer", cust_hit, "c_custkey")
        .unionByName(row("orders", f_orders, "o_custkey"))
        .unionByName(row("lineitem", li_hit, "o_custkey"))
        .unionByName(row("events", ev_hit, "user_id"))
    )


def _gdpr_e2e_oracle() -> str:
    """First-principles SQL mirror of the cross-store purge audit: every
    store's post-purge metrics derive directly from the corpus minus the
    subject cohort, and every subject_residue is the literal 0 the
    stores must measure."""
    from cdc_rs_spark.operators.dedup import MINHASH_BANDS, SPAN_LEN
    from cdc_rs_spark.plans.dedup import (
        _DOCS_SHINGLES_SQL,
        _SPAN_WIN_SQL,
        _minhash_bands_sql,
        _minhash_sig_sql,
    )

    subj = f"{_oracle_bucket('doc_id')} < 2"
    vsubj = f"{_oracle_bucket('vec_id')} < 2"
    return f"""
    WITH RECURSIVE {_DOCS_SHINGLES_SQL},
    {_minhash_sig_sql()},
    {_minhash_bands_sql()},
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand JOIN sh a ON cand.id_a = a.doc_id
                  JOIN sh b ON cand.id_b = b.doc_id
        WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
              / (len(a.s) + len(b.s)
                 - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    ),
    subjd AS (SELECT doc_id FROM documents WHERE {subj}),
    survd AS (SELECT doc_id, text, source FROM documents WHERE NOT ({subj})),
    paired AS (
        SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM pairs
            UNION ALL SELECT id_b FROM pairs
        )
    ),
    spairs AS (
        SELECT id_a, id_b FROM pairs
        WHERE id_a NOT IN (SELECT doc_id FROM subjd)
          AND id_b NOT IN (SELECT doc_id FROM subjd)
    ),
    sedges AS (
        SELECT id_a AS a, id_b AS b FROM spairs
        UNION ALL SELECT id_b, id_a FROM spairs
    ),
    sreach AS (
        SELECT a, b FROM sedges
        UNION
        SELECT r.a, e.b FROM sreach r JOIN sedges e ON r.b = e.a
    ),
    scomp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM sreach GROUP BY a
    ),
    toks AS (
        SELECT d.doc_id, t.token
        FROM (SELECT doc_id,
                     unnest(string_split(lower(text), ' ')) AS token
              FROM documents) t
        JOIN documents d ON t.doc_id = d.doc_id
        WHERE t.token <> ''
    ),
    spans AS (
        SELECT doc_id, {_SPAN_WIN_SQL} AS span
        FROM documents WHERE length(text) >= {SPAN_LEN}
    ),
    dspans AS (SELECT DISTINCT doc_id, span FROM spans),
    m AS (
        SELECT 'cluster_map' AS store,
               (SELECT COUNT(*) FROM paired
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT
                   AS n_subject_before,
               (SELECT COUNT(*) FROM scomp)::BIGINT AS n_rows_after,
               0::BIGINT AS subject_residue,
               COALESCE((SELECT SUM(component) FROM scomp), 0)::BIGINT
                   AS checksum_after
        UNION ALL
        SELECT 'band_store',
               {MINHASH_BANDS} * (SELECT COUNT(*) FROM sh
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               {MINHASH_BANDS} * (SELECT COUNT(*) FROM sh
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT COUNT(*) FROM sh
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'nb_counts',
               (SELECT COUNT(DISTINCT token) FROM toks
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               (SELECT COUNT(DISTINCT token) FROM toks
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT COUNT(*) FROM toks
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'span_store',
               (SELECT COUNT(*) FROM dspans
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               (SELECT COUNT(*) FROM dspans
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT COUNT(DISTINCT doc_id) FROM dspans
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'ann_index',
               (SELECT COUNT(*) FROM embeddings WHERE {vsubj})::BIGINT,
               (SELECT COUNT(*) FROM embeddings WHERE NOT ({vsubj}))::BIGINT,
               0::BIGINT,
               (SELECT SUM(vec_id) FROM embeddings
                WHERE NOT ({vsubj}))::BIGINT
        UNION ALL
        SELECT 'training_shards',
               (SELECT COUNT(*) FROM subjd)::BIGINT,
               (SELECT COUNT(*) FROM survd)::BIGINT,
               0::BIGINT,
               (SELECT SUM(doc_id) FROM survd)::BIGINT
    )
    SELECT * FROM m
    """


@register("gdpr_forget_end_to_end", oracle=_gdpr_e2e_oracle())
def gdpr_forget_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN, EXECUTED AND PROVEN (round 10, VERDICT r9
    next #2): gdpr_forget_manifest enumerates the blast radius; this
    query actually PURGES a subject cohort (the 2% doc_id/vec_id hash
    bucket — the erasure-request list) from every store a training
    pipeline accumulates, then audits ABSENCE per store:

      cluster_map      remove_docs: tombstone + affected-component
                       recompute, then compaction's physical drop
      band_store       purge_band_stores rewrite (minhash bands/shingles
                       are derived personal data — they must go too)
      nb_counts        retract_counts from before-images + vocab
                       zero-drop (a forgotten doc leaves NO trace in the
                       trained weights)
      span_store       remove_docs_from_span_store + compaction erasure
      ann_index        remove_vectors (tombstone + reservoir purge) +
                       compact_index physical rewrite
      training_shards  sharded sink rewritten minus the subjects

    Each audit row carries (n_subject_before, n_rows_after,
    subject_residue, checksum_after): the before-count proves the
    subject WAS present (the purge is not vacuous), the residue — the
    count of subject-keyed rows the engine can still find in the live
    store — must be 0, and the after-checksum pins the surviving state
    to first principles. The oracle recomputes every number directly
    from the corpus minus the cohort, so a purge that silently missed a
    store, half-deleted, or over-deleted fails the hash.

    Scale shape: each purge is the store's own documented delete path
    (request-bounded folds, rewrite-at-compaction); the audit adds one
    count/sum aggregate per store. At 100 TB the same composition runs
    against persisted stores on the takedown cadence — nothing here is
    fixture-shaped."""
    import os
    import shutil
    import tempfile

    from cdc_rs_spark.operators.dedup import (
        band_explode,
        minhash_dedup_edges,
        minhash_docs,
    )
    from cdc_rs_spark.plans.similarity import EMB_DIM, N_CENTROIDS, TRAIN_CAP
    from cdc_rs_spark.streaming.classifier import (
        fold_counts,
        init_count_store,
        read_counts,
        retract_counts,
    )
    from cdc_rs_spark.streaming.clusters import (
        fold_pairs,
        init_cluster_store,
        live_cluster_map,
        purge_band_stores,
        remove_docs,
    )
    from cdc_rs_spark.streaming.ivf import (
        compact_index,
        current_lists_path,
        init_index,
        remove_vectors,
    )
    from cdc_rs_spark.streaming.spans import (
        _epoch_path,
        compact_span_store,
        init_span_store,
        live_span_store,
        remove_docs_from_span_store,
        span_keys,
    )
    from cdc_rs_spark.benchphase import build_phase

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", "source"
    )
    emb = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    subj = d.filter(hash_bucket(F.col("doc_id")) < 2).select("doc_id")
    vsubj = emb.filter(hash_bucket(F.col("vec_id")) < 2).select("vec_id")
    root = tempfile.mkdtemp(prefix="gdpr_e2e_")
    sig_path = os.path.join(root, "sig")
    sh_path = os.path.join(root, "sh")
    clusters_root = os.path.join(root, "clusters")
    nb_root = os.path.join(root, "nb")
    span_root = os.path.join(root, "spans")
    index_dir = os.path.join(root, "ivf")
    shard_dir = os.path.join(root, "shards")

    from cdc_rs_spark.parallel import run_parallel

    toks = lambda df: (  # noqa: E731
        df.select(
            (F.length("source") <= 4).alias("is_a"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        ).filter(F.col("token") != "")
    )
    purged_shards = os.path.join(root, "shards_purged")

    try:
        with build_phase():
            # ---- build every store over the FULL corpus, then its
            # before-count, as SIX independent per-store chains run
            # concurrently (guide §2.6): the six store families live in
            # disjoint directories and every chain reads only the
            # immutable corpus scan, so the sequential form's idle-tail
            # latency (six jobs waiting on the driver one after another)
            # collapses to the longest chain. Ordering within a chain is
            # unchanged, so each store's before-count still reads its
            # fully-built pre-purge state.
            def chain_bands() -> int:
                signed = minhash_docs(d, "doc_id", "text").persist()
                try:
                    band_explode(
                        signed.select("doc_id", "sig")
                    ).write.parquet(sig_path)
                    signed.select("doc_id", "sh").write.parquet(sh_path)
                finally:
                    signed.unpersist(blocking=False)
                return (
                    spark.read.parquet(sig_path).join(subj, "doc_id").count()
                )

            def chain_clusters() -> int:
                # CC-equivalent edge form (round 11): the cluster-map
                # fold needs connectivity, not member pairs —
                # boilerplate cliques stay linear
                # (operators/dedup.minhash_dedup_edges docstring)
                pairs0 = minhash_dedup_edges(
                    d.select("doc_id", "text"), "doc_id", "text", 0.5
                )
                init_cluster_store(spark, clusters_root, threshold=0.5)
                fold_pairs(spark, clusters_root, pairs0, batch_id=0)
                return (
                    live_cluster_map(spark, clusters_root)
                    .join(subj, "doc_id")
                    .count()
                )

            def chain_nb() -> int:
                init_count_store(spark, nb_root)
                fold_counts(toks(d), nb_root, batch_id=0)
                # token-keyed store: subject presence = the cohort's vocab
                return (
                    toks(d.join(subj, "doc_id"))
                    .select("token")
                    .distinct()
                    .count()
                )

            def chain_span() -> int:
                init_span_store(spark, span_root, hashed=False)
                span_rows, _ = span_keys(d, hashed=False)
                span_rows.distinct().write.mode("append").parquet(
                    _epoch_path(span_root, 0)
                )
                return (
                    live_span_store(spark, span_root)
                    .join(subj, "doc_id")
                    .count()
                )

            def chain_ivf() -> int:
                init_index(
                    spark, emb, index_dir,
                    n_centroids=N_CENTROIDS, train_cap=TRAIN_CAP,
                    kmeans_iters=1, dim=EMB_DIM,
                )
                return (
                    spark.read.parquet(current_lists_path(index_dir))
                    .join(vsubj, "vec_id")
                    .count()
                )

            def chain_shards() -> int:
                d.withColumn(
                    "shard", hash_bucket(F.col("doc_id"), 8)
                ).select("doc_id", "text", "shard").write.partitionBy(
                    "shard"
                ).parquet(shard_dir)
                return (
                    spark.read.schema(
                        "doc_id long, text string, shard bigint"
                    )
                    .parquet(shard_dir)
                    .join(subj, "doc_id")
                    .count()
                )

            bvals = run_parallel(
                chain_bands, chain_clusters, chain_nb,
                chain_span, chain_ivf, chain_shards,
            )
            before_vals = dict(
                zip(
                    [
                        "band_store", "cluster_map", "nb_counts",
                        "span_store", "ann_index", "training_shards",
                    ],
                    bvals,
                )
            )

            # ---- THE FORGET: purge every store — again one chain per
            # store family (cluster purge needs the band stores, both
            # built above; the barrier between build and purge keeps the
            # pre-purge before-counts exact) ----
            def purge_clusters() -> None:
                remove_docs(
                    spark, clusters_root, subj,
                    sig_store_path=sig_path, shingle_store_path=sh_path,
                    threshold=0.5, batch_id=1,
                )
                purge_band_stores(spark, clusters_root, sig_path, sh_path)

            def purge_nb() -> None:
                retract_counts(
                    toks(d.join(subj, "doc_id")), nb_root,
                    batch_id=0, stream_id="d",
                )

            def purge_span() -> None:
                remove_docs_from_span_store(
                    spark, span_root, subj, batch_id=0
                )
                compact_span_store(spark, span_root, keep_epochs=0)

            def purge_ivf() -> None:
                remove_vectors(spark, index_dir, vsubj, batch_id=0)
                compact_index(spark, index_dir, dim=EMB_DIM, keep_epochs=0)

            def purge_shards() -> None:
                (
                    spark.read.schema(
                        "doc_id long, text string, shard bigint"
                    )
                    .parquet(shard_dir)
                    .join(subj, "doc_id", "left_anti")
                    .write.partitionBy("shard")
                    .parquet(purged_shards)
                )

            run_parallel(
                purge_clusters, purge_nb, purge_span,
                purge_ivf, purge_shards,
            )
        # ---- the audit: absence, measured from the purged stores ----
        surv_vocab = toks(d.join(subj, "doc_id", "left_anti")).select(
            "token"
        ).distinct()
        cmap = live_cluster_map(spark, clusters_root)
        nb = read_counts(spark, nb_root)
        span_live = live_span_store(spark, span_root)
        lists_live = spark.read.parquet(current_lists_path(index_dir))
        shards_back = spark.read.schema(
            "doc_id long, text string, shard bigint"
        ).parquet(purged_shards)

        from cdc_rs_spark.streaming.clusters import _resolve_store

        # post-purge reads resolve through the atomic swap pointer
        band_live = spark.read.parquet(_resolve_store(sig_path))

        # ONE pass per store (round 13, VERDICT r12 next #5): the old
        # report scanned every store twice within the collect — a
        # count+checksum aggregate crossJoined with a separate residue
        # aggregate over the same rows. Now the residue key set is
        # left-joined on as a marker and all three audit columns ride a
        # single aggregate: 12 store scans -> 6. The marker join keys
        # (subj / vsubj / surviving vocab) are unique per key, so row
        # multiplicity — and therefore every count/sum — is unchanged;
        # residue = rows whose marker matched (inner-join count) or
        # missed (anti-join count), exactly the old residue_df counts.
        def row(store, scan_df, checksum_expr, residue_cond):
            return scan_df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows_after"),
                F.coalesce(checksum_expr, F.lit(0))
                .cast("bigint")
                .alias("checksum_after"),
                F.count(F.when(residue_cond, F.lit(1)))
                .cast("bigint")
                .alias("subject_residue"),
            ).select(
                F.lit(store).alias("store"),
                F.lit(int(before_vals[store]))
                .cast("bigint")
                .alias("n_subject_before"),
                "n_rows_after",
                "subject_residue",
                "checksum_after",
            )

        subj_m = subj.withColumn("__m", F.lit(True))
        vsubj_m = vsubj.withColumn("__m", F.lit(True))
        vocab_m = surv_vocab.withColumn("__m", F.lit(True))
        hit = F.col("__m").isNotNull()
        report = (
            row("cluster_map", cmap.join(subj_m, "doc_id", "left"),
                F.sum("cluster"), hit)
            .unionByName(
                row("band_store", band_live.join(subj_m, "doc_id", "left"),
                    F.countDistinct("doc_id"), hit)
            )
            .unionByName(
                # residue was a left_anti against the surviving vocab:
                # count the marker MISSES
                row("nb_counts", nb.join(vocab_m, "token", "left"),
                    F.sum(F.col("c_a") + F.col("c_b")), ~hit)
            )
            .unionByName(
                row("span_store", span_live.join(subj_m, "doc_id", "left"),
                    F.countDistinct("doc_id"), hit)
            )
            .unionByName(
                row("ann_index", lists_live.join(vsubj_m, "vec_id", "left"),
                    F.sum("vec_id"), hit)
            )
            .unionByName(
                row("training_shards",
                    shards_back.join(subj_m, "doc_id", "left"),
                    F.sum("doc_id"), hit)
            )
        )
        rows = report.collect()  # 6 rows; frees the scratch stores
        schema = report.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _gdpr_e2e_v2_oracle() -> str:
    """First-principles SQL mirror of the round-12 lifecycle audit
    (VERDICT r11 next #5): forget a 2% cohort across EIGHT stores —
    including the exact-group membership store the delegate discipline
    added and a register-exact HLL store — then READMIT half the cohort
    and re-ingest it. Per store the oracle recomputes every number from
    the corpus minus that store's EFFECTIVE removed set: the cluster/
    band/group stores see only the non-readmitted half (`effrm` — the
    un-forget contract restores never-seen semantics for the rest), the
    other stores see the full cohort (their lifecycle had no readmit).
    Delegate identities are ingest-order-dependent, so every band/group
    metric is DISTINCT-TEXT- or DISTINCT-DOC-level — quantities the
    delegate invariant pins exactly (one banded delegate per live
    distinct text)."""
    from cdc_rs_spark.operators.dedup import MINHASH_BANDS, SPAN_LEN
    from cdc_rs_spark.operators.sketch import HLL_M, HLL_RHO_MAX
    from cdc_rs_spark.plans.dedup import (
        _DOCS_SHINGLES_SQL,
        _SPAN_WIN_SQL,
        _minhash_bands_sql,
        _minhash_sig_sql,
    )

    subj = f"{_oracle_bucket('doc_id')} < 2"  # the erasure request
    eff = f"{_oracle_bucket('doc_id')} = 1"  # minus the readmitted half
    return f"""
    WITH RECURSIVE {_DOCS_SHINGLES_SQL},
    {_minhash_sig_sql()},
    {_minhash_bands_sql()},
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand JOIN sh a ON cand.id_a = a.doc_id
                  JOIN sh b ON cand.id_b = b.doc_id
        WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
              / (len(a.s) + len(b.s)
                 - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    ),
    subjd AS (SELECT doc_id FROM documents WHERE {subj}),
    effrm AS (SELECT doc_id FROM documents WHERE {eff}),
    paired AS (
        SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM pairs
            UNION ALL SELECT id_b FROM pairs
        )
    ),
    spairs AS (
        SELECT id_a, id_b FROM pairs
        WHERE id_a NOT IN (SELECT doc_id FROM effrm)
          AND id_b NOT IN (SELECT doc_id FROM effrm)
    ),
    sedges AS (
        SELECT id_a AS a, id_b AS b FROM spairs
        UNION ALL SELECT id_b, id_a FROM spairs
    ),
    sreach AS (
        SELECT a, b FROM sedges
        UNION
        SELECT r.a, e.b FROM sreach r JOIN sedges e ON r.b = e.a
    ),
    scomp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM sreach GROUP BY a
    ),
    sigd AS (
        SELECT doc_id, text FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    subtext AS (
        SELECT text FROM sigd GROUP BY text
        HAVING COUNT(CASE WHEN doc_id NOT IN (SELECT doc_id FROM subjd)
                          THEN 1 END) = 0
    ),
    livetext AS (
        SELECT DISTINCT text FROM sigd
        WHERE doc_id NOT IN (SELECT doc_id FROM effrm)
    ),
    livemem AS (
        SELECT DISTINCT doc_id FROM sigd
        WHERE doc_id NOT IN (SELECT doc_id FROM effrm)
    ),
    toks AS (
        SELECT d.doc_id, t.token
        FROM (SELECT doc_id,
                     unnest(string_split(lower(text), ' ')) AS token
              FROM documents) t
        JOIN documents d ON t.doc_id = d.doc_id
        WHERE t.token <> ''
    ),
    spans AS (
        SELECT doc_id, {_SPAN_WIN_SQL} AS span
        FROM documents WHERE length(text) >= {SPAN_LEN}
    ),
    dspans AS (SELECT DISTINCT doc_id, span FROM spans),
    hh AS (
        SELECT lang,
               CAST(('0x' || substr(md5('hll:' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) AS fp
        FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM subjd)
    ),
    hr AS (
        SELECT lang, fp % {HLL_M} AS idx,
               CASE WHEN (fp // {HLL_M}) % 4294967296 = 0 THEN {HLL_RHO_MAX}
                    ELSE {HLL_RHO_MAX}
                         - length(bin((fp // {HLL_M}) % 4294967296)) END AS rho
        FROM hh
    ),
    hregs AS (
        SELECT lang, idx, CAST(MAX(rho) AS BIGINT) AS rho
        FROM hr GROUP BY lang, idx
    ),
    m AS (
        SELECT 'cluster_map' AS store,
               (SELECT COUNT(*) FROM paired
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT
                   AS n_subject_before,
               (SELECT COUNT(*) FROM scomp)::BIGINT AS n_rows_after,
               0::BIGINT AS subject_residue,
               COALESCE((SELECT SUM(component) FROM scomp), 0)::BIGINT
                   AS checksum_after
        UNION ALL
        SELECT 'band_store',
               (SELECT COUNT(*) FROM subtext)::BIGINT,
               {MINHASH_BANDS} * (SELECT COUNT(*) FROM livetext)::BIGINT,
               0::BIGINT,
               (SELECT COUNT(*) FROM livetext)::BIGINT
        UNION ALL
        SELECT 'group_store',
               (SELECT COUNT(*) FROM sigd
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               (SELECT COUNT(*) FROM livemem)::BIGINT,
               0::BIGINT,
               COALESCE((SELECT SUM(doc_id) FROM livemem), 0)::BIGINT
        UNION ALL
        SELECT 'nb_counts',
               (SELECT COUNT(DISTINCT token) FROM toks
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               (SELECT COUNT(DISTINCT token) FROM toks
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT COUNT(*) FROM toks
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'span_store',
               (SELECT COUNT(*) FROM dspans
                WHERE doc_id IN (SELECT doc_id FROM subjd))::BIGINT,
               (SELECT COUNT(*) FROM dspans
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT COUNT(DISTINCT doc_id) FROM dspans
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'ann_index',
               (SELECT COUNT(*) FROM embeddings
                WHERE {_oracle_bucket("vec_id")} < 2)::BIGINT,
               (SELECT COUNT(*) FROM embeddings
                WHERE NOT ({_oracle_bucket("vec_id")} < 2))::BIGINT,
               0::BIGINT,
               (SELECT SUM(vec_id) FROM embeddings
                WHERE NOT ({_oracle_bucket("vec_id")} < 2))::BIGINT
        UNION ALL
        SELECT 'training_shards',
               (SELECT COUNT(*) FROM subjd)::BIGINT,
               (SELECT COUNT(*) FROM documents
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT,
               0::BIGINT,
               (SELECT SUM(doc_id) FROM documents
                WHERE doc_id NOT IN (SELECT doc_id FROM subjd))::BIGINT
        UNION ALL
        SELECT 'hll_distinct',
               (SELECT COUNT(*) FROM subjd)::BIGINT,
               (SELECT COUNT(*) FROM hregs)::BIGINT,
               0::BIGINT,
               COALESCE((SELECT SUM(idx * 41 + rho) FROM hregs), 0)::BIGINT
    )
    SELECT * FROM m
    """


@register("gdpr_forget_end_to_end_v2", oracle=_gdpr_e2e_v2_oracle())
def gdpr_forget_end_to_end_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE ROUND-12 LIFECYCLE AUDIT (VERDICT r11 next #5): forget →
    purge → READMIT → re-ingest → audit, across EIGHT stores — and the
    cluster/band/group stores are built through clusters_foreach_batch,
    so the delegate discipline (exact-group membership store, one banded
    delegate per distinct text) is the audited path, not a batch
    stand-in. New over v1:

      group_store    the exact-group membership relation (doc_id-keyed
                     personal data the r11 verdict flagged as unaudited):
                     purge_band_stores rewrites it; the audit measures
                     the residue.
      hll_distinct   a register-exact MAX-monoid store (per-lang distinct
                     docs): forgotten by EPOCH REBUILD from survivors;
                     subject_residue counts registers that DIFFER from a
                     fresh surviving-corpus recompute — 0 is the
                     bit-identical proof.
      readmit        after the purge, half the cohort (hash bucket 0) is
                     readmitted (ledgered tombstone-clear under the
                     '{{stream}}!ra' line) and re-ingested as an ordinary
                     micro-batch; the cluster/band/group audits must then
                     equal a corpus that never lost the readmitted half,
                     while nb/span/ann/shard/hll audits still reflect the
                     full forget (independent store lifecycles).

    Delegate identities depend on ingest order, so band/group metrics are
    distinct-text/doc-level quantities the delegate invariant pins:
    post-purge the band store holds exactly MINHASH_BANDS rows per
    distinct live text (re-election on delegate removal, re-sign on
    re-ingest of a vanished text — streaming/clusters.py).

    Scale shape: every purge/readmit is the store's documented
    request-bounded fold; the build is the ordinary ingest path; the
    audit adds one aggregate per store."""
    import os
    import shutil
    import tempfile

    from cdc_rs_spark.benchphase import build_phase
    from cdc_rs_spark.operators.sketch import hll_increments
    from cdc_rs_spark.plans.similarity import EMB_DIM, N_CENTROIDS, TRAIN_CAP
    from cdc_rs_spark.streaming.additive import (
        fold_segment,
        init_additive_store,
        read_merged,
        rebuild_additive_store,
    )
    from cdc_rs_spark.streaming.classifier import (
        fold_counts,
        init_count_store,
        read_counts,
        retract_counts,
    )
    from cdc_rs_spark.streaming.clusters import (
        _GROUP_SCHEMA,
        _resolve_store,
        clusters_foreach_batch,
        init_cluster_store,
        live_cluster_map,
        purge_band_stores,
        readmit_docs,
        remove_docs,
    )
    from cdc_rs_spark.streaming.ivf import (
        compact_index,
        current_lists_path,
        init_index,
        remove_vectors,
    )
    from cdc_rs_spark.streaming.spans import (
        _epoch_path,
        compact_span_store,
        init_span_store,
        live_span_store,
        remove_docs_from_span_store,
        span_keys,
    )

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", "lang", "source"
    )
    emb = spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    subj = d.filter(hash_bucket(F.col("doc_id")) < 2).select("doc_id")
    readm = d.filter(hash_bucket(F.col("doc_id")) < 1).select("doc_id")
    effrm = d.filter(hash_bucket(F.col("doc_id")) == 1).select("doc_id")
    vsubj = emb.filter(hash_bucket(F.col("vec_id")) < 2).select("vec_id")
    root = tempfile.mkdtemp(prefix="gdpr_e2e_v2_")
    sig_path = os.path.join(root, "sig")
    sh_path = os.path.join(root, "sh")
    clusters_root = os.path.join(root, "clusters")
    nb_root = os.path.join(root, "nb")
    span_root = os.path.join(root, "spans")
    index_dir = os.path.join(root, "ivf")
    shard_dir = os.path.join(root, "shards")
    hll_root = os.path.join(root, "hll")

    toks = lambda df: (  # noqa: E731
        df.select(
            (F.length("source") <= 4).alias("is_a"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        ).filter(F.col("token") != "")
    )

    from cdc_rs_spark.parallel import run_parallel

    purged_shards = os.path.join(root, "shards_purged")
    try:
        with build_phase():
            # ---- build: the REAL ingest paths, as independent per-store
            # chains run concurrently (guide §2.6 — the six store
            # families live in disjoint directories and read only the
            # immutable corpus scan; the cluster chain's two sequential
            # folds dominate, and every other store's build/before-count
            # back-fills its idle tail). Within each chain, ordering is
            # byte-identical to the sequential form. ----
            fn = clusters_foreach_batch(
                sig_path, sh_path, clusters_root, threshold=0.5
            )

            def chain_clusters() -> dict:
                spark.createDataFrame(
                    [], "doc_id bigint, band int, bkey string"
                ).write.parquet(sig_path)
                spark.createDataFrame(
                    [], "doc_id bigint, sh array<string>"
                ).write.parquet(sh_path)
                init_cluster_store(spark, clusters_root, threshold=0.5)
                fn(
                    d.filter(F.col("doc_id") % 2 == 0).select(
                        "doc_id", "text"
                    ),
                    0,
                )
                fn(
                    d.filter(F.col("doc_id") % 2 == 1).select(
                        "doc_id", "text"
                    ),
                    1,
                )
                gs = spark.read.schema(_GROUP_SCHEMA).parquet(
                    _resolve_store(sig_path + "_groups")
                )
                # ONE pass over the group store for all three counts
                # (round 13b): the old form ran three separate
                # distinct+aggregate jobs over the same corpus-sized
                # membership relation. Each doc_id belongs to exactly one
                # gkey (gkey = md5(text), one text per doc), so distinct
                # subject docs = sum of per-gkey subject-member counts,
                # and the surviving-group predicate is per-gkey too —
                # one distinct + one groupBy computes everything.
                subj_m = F.broadcast(subj.withColumn("__m", F.lit(True)))
                per_g = (
                    gs.select("gkey", "doc_id")
                    .distinct()
                    .join(subj_m, "doc_id", "left")
                    .groupBy("gkey")
                    .agg(
                        F.count(F.col("__m")).alias("__ns"),
                        F.count(
                            F.when(F.col("__m").isNull(), F.lit(1))
                        ).alias("__nn"),
                    )
                )

                def _gagg():
                    r = per_g.agg(
                        F.count(F.lit(1)).alias("n_groups"),
                        F.sum(
                            (F.col("__nn") > 0).cast("bigint")
                        ).alias("n_surv"),
                        F.sum("__ns").alias("n_gdocs"),
                    ).collect()[0]
                    return (
                        int(r["n_groups"]),
                        int(r["n_surv"] or 0),
                        int(r["n_gdocs"] or 0),
                    )

                (n_groups, n_groups_surviving, n_gdocs), n_cmap = (
                    run_parallel(
                        _gagg,
                        lambda: (
                            live_cluster_map(spark, clusters_root)
                            .join(subj, "doc_id")
                            .count()
                        ),
                    )
                )
                return {
                    "cluster_map": n_cmap,
                    # texts whose EVERY member is a subject — the groups
                    # that must vanish from the band store
                    # (delegate-independent)
                    "band_store": n_groups - n_groups_surviving,
                    "group_store": n_gdocs,
                }

            def chain_nb() -> int:
                init_count_store(spark, nb_root)
                fold_counts(toks(d), nb_root, batch_id=0)
                return (
                    toks(d.join(subj, "doc_id"))
                    .select("token")
                    .distinct()
                    .count()
                )

            def chain_span() -> int:
                init_span_store(spark, span_root, hashed=False)
                span_rows, _ = span_keys(d, hashed=False)
                span_rows.distinct().write.mode("append").parquet(
                    _epoch_path(span_root, 0)
                )
                return (
                    live_span_store(spark, span_root)
                    .join(subj, "doc_id")
                    .count()
                )

            def chain_ivf() -> int:
                init_index(
                    spark, emb, index_dir,
                    n_centroids=N_CENTROIDS, train_cap=TRAIN_CAP,
                    kmeans_iters=1, dim=EMB_DIM,
                )
                return (
                    spark.read.parquet(current_lists_path(index_dir))
                    .join(vsubj, "vec_id")
                    .count()
                )

            def chain_shards() -> int:
                d.withColumn(
                    "shard", hash_bucket(F.col("doc_id"), 8)
                ).select("doc_id", "text", "shard").write.partitionBy(
                    "shard"
                ).parquet(shard_dir)
                return subj.count()

            def chain_hll() -> None:
                init_additive_store(
                    spark, hll_root,
                    {"lang": "string", "idx": "bigint"}, ["rho"],
                    merge="max",
                )
                fold_segment(
                    hll_increments(d, "CAST(doc_id AS STRING)", ["lang"]),
                    hll_root, batch_id=0,
                )

            cl_vals, nb_val, span_val, ivf_val, n_subj, _ = run_parallel(
                chain_clusters, chain_nb, chain_span,
                chain_ivf, chain_shards, chain_hll,
            )
            before_vals = {
                **cl_vals,
                "nb_counts": nb_val,
                "span_store": span_val,
                "ann_index": ivf_val,
                "training_shards": n_subj,
                "hll_distinct": n_subj,
            }

            # ---- THE FORGET (and, on the cluster chain, THE READMIT:
            # counter-notice for half the cohort) — per-store chains
            # again; the cluster store's remove → purge → readmit →
            # re-ingest leg is strictly ordered within its chain ----
            def purge_clusters() -> None:
                remove_docs(
                    spark, clusters_root, subj,
                    sig_store_path=sig_path, shingle_store_path=sh_path,
                    threshold=0.5, batch_id=2,
                )
                purge_band_stores(spark, clusters_root, sig_path, sh_path)
                readmit_docs(spark, clusters_root, readm, batch_id=3)
                fn(d.join(readm, "doc_id").select("doc_id", "text"), 3)

            def purge_nb() -> None:
                retract_counts(
                    toks(d.join(subj, "doc_id")), nb_root,
                    batch_id=0, stream_id="d",
                )

            def purge_span() -> None:
                remove_docs_from_span_store(
                    spark, span_root, subj, batch_id=0
                )
                compact_span_store(spark, span_root, keep_epochs=0)

            def purge_ivf() -> None:
                remove_vectors(spark, index_dir, vsubj, batch_id=0)
                compact_index(spark, index_dir, dim=EMB_DIM, keep_epochs=0)

            def purge_shards() -> None:
                (
                    spark.read.schema(
                        "doc_id long, text string, shard bigint"
                    )
                    .parquet(shard_dir)
                    .join(subj, "doc_id", "left_anti")
                    .write.partitionBy("shard")
                    .parquet(purged_shards)
                )

            def purge_hll() -> None:
                rebuild_additive_store(
                    spark, hll_root,
                    hll_increments(
                        d.join(subj, "doc_id", "left_anti"),
                        "CAST(doc_id AS STRING)", ["lang"],
                    ),
                    batch_id=1,
                )

            run_parallel(
                purge_clusters, purge_nb, purge_span,
                purge_ivf, purge_shards, purge_hll,
            )
        # ---- the audit: absence, measured from the live stores ----
        cmap = live_cluster_map(spark, clusters_root)
        nb = read_counts(spark, nb_root)
        span_live = live_span_store(spark, span_root)
        lists_live = spark.read.parquet(current_lists_path(index_dir))
        shards_back = spark.read.schema(
            "doc_id long, text string, shard bigint"
        ).parquet(purged_shards)
        band_live = spark.read.parquet(_resolve_store(sig_path))
        gs_live = (
            spark.read.schema(_GROUP_SCHEMA)
            .parquet(_resolve_store(sig_path + "_groups"))
            .select("gkey", "doc_id")
            .distinct()
        )
        surv_vocab = toks(d.join(subj, "doc_id", "left_anti")).select(
            "token"
        ).distinct()
        hll_store = read_merged(spark, hll_root).select("lang", "idx", "rho")
        hll_fresh = hll_increments(
            d.join(subj, "doc_id", "left_anti"),
            "CAST(doc_id AS STRING)", ["lang"],
        ).select(
            "lang", "idx", F.col("rho").alias("rho_fresh")
        )
        # register-exact residue: any register differing from a fresh
        # surviving-corpus recompute (missing, extra, or shifted) — the
        # diff condition rides the single full_outer pass in the report

        # ONE pass per store (round 13, VERDICT r12 next #5) — the
        # marker-join + aggregate-with-filter form; see
        # gdpr_forget_end_to_end's row() for the equivalence argument.
        # Two stores need more than the marker:
        #   group_store   the old after_df was gs_docs (distinct docs)
        #                 while the residue counted gs_live membership
        #                 rows — one pass over gs_live computes both
        #                 (countDistinct/sum_distinct for the doc-level
        #                 columns, the marker count for the residue)
        #   hll_distinct  the residue is a register diff vs the fresh
        #                 recompute — the full_outer diff join IS the
        #                 single pass, with the store side marked so
        #                 n_rows/checksum count only store rows
        def row(store, scan_df, checksum_expr, residue_cond, n_rows_expr=None):
            return scan_df.agg(
                (n_rows_expr if n_rows_expr is not None else F.count(F.lit(1)))
                .cast("bigint")
                .alias("n_rows_after"),
                F.coalesce(checksum_expr, F.lit(0))
                .cast("bigint")
                .alias("checksum_after"),
                F.count(F.when(residue_cond, F.lit(1)))
                .cast("bigint")
                .alias("subject_residue"),
            ).select(
                F.lit(store).alias("store"),
                F.lit(int(before_vals[store]))
                .cast("bigint")
                .alias("n_subject_before"),
                "n_rows_after",
                "subject_residue",
                "checksum_after",
            )

        subj_m = subj.withColumn("__m", F.lit(True))
        vsubj_m = vsubj.withColumn("__m", F.lit(True))
        effrm_m = effrm.withColumn("__m", F.lit(True))
        vocab_m = surv_vocab.withColumn("__m", F.lit(True))
        hit = F.col("__m").isNotNull()
        hll_joined = hll_store.withColumn("__s", F.lit(True)).join(
            hll_fresh, ["lang", "idx"], "full_outer"
        )
        in_store = F.col("__s").isNotNull()
        report = (
            row("cluster_map", cmap.join(effrm_m, "doc_id", "left"),
                F.sum("cluster"), hit)
            .unionByName(
                row("band_store", band_live.join(effrm_m, "doc_id", "left"),
                    F.countDistinct("doc_id"), hit)
            )
            .unionByName(
                row("group_store", gs_live.join(effrm_m, "doc_id", "left"),
                    F.sum_distinct(F.col("doc_id")), hit,
                    n_rows_expr=F.countDistinct("doc_id"))
            )
            .unionByName(
                row("nb_counts", nb.join(vocab_m, "token", "left"),
                    F.sum(F.col("c_a") + F.col("c_b")), ~hit)
            )
            .unionByName(
                row("span_store", span_live.join(subj_m, "doc_id", "left"),
                    F.countDistinct("doc_id"), hit)
            )
            .unionByName(
                row("ann_index", lists_live.join(vsubj_m, "vec_id", "left"),
                    F.sum("vec_id"), hit)
            )
            .unionByName(
                row("training_shards",
                    shards_back.join(subj_m, "doc_id", "left"),
                    F.sum("doc_id"), hit)
            )
            .unionByName(
                row("hll_distinct", hll_joined,
                    F.sum(
                        F.when(
                            in_store, F.col("idx") * 41 + F.col("rho")
                        )
                    ),
                    F.coalesce(F.col("rho"), F.lit(-1))
                    != F.coalesce(F.col("rho_fresh"), F.lit(-1)),
                    n_rows_expr=F.count(F.when(in_store, F.lit(1))))
            )
        )
        rows = report.collect()  # 8 rows; frees the scratch stores
        schema = report.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _z_sql(a: str, b: str, bits: int = 8) -> str:
    """Morton-interleave SQL for the DuckDB oracle — the same sum of
    shift/mask terms operators/zorder.py builds as Columns."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_layout_audit_lineitem",
    oracle=f"""
    WITH base AS (
        SELECT CAST(l_quantity AS BIGINT) AS qv,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS pv
        FROM lineitem
    ),
    mm AS (
        SELECT MIN(qv) AS lo_q, MAX(qv) AS hi_q,
               MIN(pv) AS lo_p, MAX(pv) AS hi_p
        FROM base
    ),
    b AS (
        SELECT ((qv - lo_q) * 255) // GREATEST(hi_q - lo_q, 1) AS qb,
               ((pv - lo_p) * 255) // GREATEST(hi_p - lo_p, 1) AS pb
        FROM base, mm
    ),
    zf AS (
        SELECT qb, pb,
               ({_z_sql("qb", "pb")} >> 10) AS f_z,
               (qb >> 2) AS f_lin
        FROM b
    ),
    files AS (
        SELECT 'zorder' AS layout, f_z AS f, MIN(qb) AS minq, MAX(qb) AS maxq,
               MIN(pb) AS minp, MAX(pb) AS maxp
        FROM zf GROUP BY f_z
        UNION ALL
        SELECT 'linear', f_lin, MIN(qb), MAX(qb), MIN(pb), MAX(pb)
        FROM zf GROUP BY f_lin
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           ROUND(SUM(maxq - minq + 1) / (COUNT(*) * 256.0), 6) AS avg_span_q,
           ROUND(SUM(maxp - minp + 1) / (COUNT(*) * 256.0), 6) AS avg_span_p,
           ROUND(SUM(CASE WHEN minq > 63 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS skip_q_frac,
           ROUND(SUM(CASE WHEN minp > 63 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS skip_p_frac
    FROM files GROUP BY layout
    """,
)
def zorder_layout_audit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs single-column layout, quantified (operators/zorder.py):
    bucketize (l_quantity, price-cents) to 8 bits each, Morton-interleave,
    cut 64 z-files (z >> 10) vs 64 quantity-sorted files (qb >> 2), and
    report each layout's per-file value-span and the fraction of files a
    zone map can SKIP for a first-quartile predicate on either column.
    The z-order layout shows balanced small spans on BOTH columns (skip
    works for either predicate); the linear layout is perfect on its sort
    column and useless (span ~ 1.0, skip ~ 0) on the other — the
    data-skipping argument for multi-dimensional layout at 100 TB, as one
    oracle-checked number.

    Scale shape: one min/max aggregate (4 scalars to the driver), then
    map-side bucket+interleave bit math (whole-stage codegen, no UDF), one
    map-side-combinable groupBy over 128 file cells, final 2-row agg. The
    write path itself (zorder_write) is repartitionByRange(z) — the same
    single shuffle any layout write pays."""
    from cdc_rs_spark.operators.zorder import bucket_expr, z_interleave

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("qv"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("pv"),
    )
    lo_q, hi_q, lo_p, hi_p = li.agg(
        F.min("qv"), F.max("qv"), F.min("pv"), F.max("pv")
    ).first()
    qb = bucket_expr("qv", lo_q, hi_q)
    pb = bucket_expr("pv", lo_p, hi_p)
    zf = li.select(
        qb.alias("qb"),
        pb.alias("pb"),
        F.shiftright(z_interleave(qb, pb), 10).alias("f_z"),
        F.shiftright(qb, 2).alias("f_lin"),
    )

    def files(layout: str, key: str) -> DataFrame:
        return zf.groupBy(F.col(key).alias("f")).agg(
            F.min("qb").alias("minq"),
            F.max("qb").alias("maxq"),
            F.min("pb").alias("minp"),
            F.max("pb").alias("maxp"),
        ).select(F.lit(layout).alias("layout"), "f", "minq", "maxq", "minp", "maxp")

    allf = files("zorder", "f_z").unionByName(files("linear", "f_lin"))
    n = F.count("*")
    return allf.groupBy("layout").agg(
        n.cast("bigint").alias("n_files"),
        F.round(
            F.sum(F.col("maxq") - F.col("minq") + 1) / (n * 256.0), 6
        ).alias("avg_span_q"),
        F.round(
            F.sum(F.col("maxp") - F.col("minp") + 1) / (n * 256.0), 6
        ).alias("avg_span_p"),
        F.round(
            F.sum(F.when(F.col("minq") > 63, 1).otherwise(0))
            / n.cast("double"),
            6,
        ).alias("skip_q_frac"),
        F.round(
            F.sum(F.when(F.col("minp") > 63, 1).otherwise(0))
            / n.cast("double"),
            6,
        ).alias("skip_p_frac"),
    )


# ---- streaming curation funnel (round 9, VERDICT r8 next #5) --------------


def _funnel_oracle() -> str:
    """One SQL mirror of the whole funnel: envelope gate, the three
    map-side text gates (verbatim from text_cleaning_funnel), MinHash CC
    dedup with min-id survivors (the recursive closure from _cc_oracle,
    applied to the GATED corpus), NB filter trained on the gated corpus,
    and the md5 shard assignment. Batches partition the corpus and every
    stage is either batch-local (the map-side gates — additive counts) or
    computed from the END state (dedup map, NB weights), so whole-corpus
    SQL equals the streamed composition — that equality IS the claim."""
    from cdc_rs_spark.plans.dedup import (
        _DOCS_SHINGLES_SQL,
        _minhash_bands_sql,
        _minhash_sig_sql,
    )
    from cdc_rs_spark.plans.text import _PRED_LANG_SQL, _hits_sql

    sh_ctes = _DOCS_SHINGLES_SQL.replace("FROM documents", "FROM gated")
    quality = (
        f"ROUND(0.4 * ({_hits_sql('en')}::DOUBLE / len(w)) "
        "+ 0.3 * least(len(w)::DOUBLE / 100.0, 1.0) "
        "+ 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6)"
    )
    return f"""
    WITH RECURSIVE feed AS (
        SELECT doc_id, text, source,
               CASE WHEN doc_id % 19 = 0 THEN 'd' ELSE 'c' END AS op
        FROM documents
    ),
    ins AS (SELECT doc_id, text, source FROM feed WHERE op = 'c'),
    tt AS (SELECT doc_id, text, source, string_split(text, ' ') AS w
           FROM ins),
    sc AS (
        SELECT doc_id, text, source, w,
               {_hits_sql("en")} AS s_en, {_hits_sql("es")} AS s_es,
               {_hits_sql("fr")} AS s_fr, {_hits_sql("de")} AS s_de,
               {quality} AS quality
        FROM tt
    ),
    g1 AS (SELECT * FROM sc WHERE {_PRED_LANG_SQL} = 'en'),
    g2 AS (SELECT * FROM g1 WHERE quality >= 0.32),
    gated AS (SELECT doc_id, text, source FROM g2 WHERE len(w) >= 20),
    {sh_ctes},
    {_minhash_sig_sql()},
    {_minhash_bands_sql()},
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand JOIN sh a ON cand.id_a = a.doc_id
                  JOIN sh b ON cand.id_b = b.doc_id
        WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
              / (len(a.s) + len(b.s)
                 - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM reach GROUP BY a
    ),
    survivors AS (
        SELECT g.doc_id, g.text, g.source
        FROM gated g LEFT JOIN comp c ON g.doc_id = c.doc_id
        WHERE c.component IS NULL OR c.component = g.doc_id
    ),
    labeled AS (
        SELECT doc_id, len(source) <= 4 AS is_a, lower(text) AS lt
        FROM gated
    ),
    train_toks AS (
        SELECT is_a, unnest(string_split(lt, ' ')) AS token FROM labeled
    ),
    cnt AS (
        SELECT token,
               CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS c_a,
               CAST(COUNT(*) FILTER (WHERE NOT is_a) AS BIGINT) AS c_b
        FROM train_toks WHERE token <> '' GROUP BY token
    ),
    tot AS (
        SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
               CAST(SUM(c_b) AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM cnt
    ),
    weights AS (
        SELECT token,
               ((c_a + 1) * (n_b + v) * 1000) // ((c_b + 1) * (n_a + v))
                   AS w_milli
        FROM cnt CROSS JOIN tot
    ),
    neutral AS (
        SELECT ((n_b + v) * 1000) // (n_a + v) AS w0 FROM tot
    ),
    surv_toks AS (
        SELECT l.doc_id, unnest(string_split(l.lt, ' ')) AS token
        FROM labeled l JOIN survivors s ON l.doc_id = s.doc_id
    ),
    nb_scored AS (
        SELECT t.doc_id,
               CAST(SUM(COALESCE(w.w_milli, n.w0)) AS BIGINT) AS s_milli,
               CAST(COUNT(*) AS BIGINT) * MAX(n.w0) AS base_milli
        FROM surv_toks t
        LEFT JOIN weights w ON t.token = w.token
        CROSS JOIN neutral n
        WHERE t.token <> ''
        GROUP BY t.doc_id
    ),
    nb_pass AS (SELECT doc_id FROM nb_scored WHERE s_milli > base_milli),
    shards AS (SELECT {_oracle_bucket("doc_id", 8)} AS shard FROM nb_pass)
    SELECT 'feed' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM feed
    UNION ALL SELECT 'inserts', CAST(COUNT(*) AS BIGINT) FROM ins
    UNION ALL SELECT 'lang_en', CAST(COUNT(*) AS BIGINT) FROM g1
    UNION ALL SELECT 'quality_ge_032', CAST(COUNT(*) AS BIGINT) FROM g2
    UNION ALL SELECT 'len_ge_20', CAST(COUNT(*) AS BIGINT) FROM gated
    UNION ALL SELECT 'dedup_survivors', CAST(COUNT(*) AS BIGINT)
              FROM survivors
    UNION ALL SELECT 'nb_pass', CAST(COUNT(*) AS BIGINT) FROM nb_pass
    UNION ALL SELECT 'shard_' || CAST(shard AS VARCHAR),
              CAST(COUNT(*) AS BIGINT)
              FROM shards GROUP BY shard
    """


def gate_stages(rows: DataFrame):
    """The three map-side text gates (language-ID, quality, length) over
    (doc_id, text, source) rows — no envelope filter. Returns (g1, g2,
    gated). Deterministic in the text alone, which is what makes the
    DELETE path exact: re-gating a delete's before-image reproduces the
    insert-time gate outcome bit-for-bit, so retractions touch exactly
    the state the insert folded (round 10)."""
    from cdc_rs_spark.functions.text import predicted_lang, quality_score, tokens

    toks = tokens(F.col("text"))
    sc = rows.select(
        "doc_id",
        "text",
        "source",
        predicted_lang(toks).alias("pred"),
        quality_score(F.col("text")).alias("quality"),
        F.size(toks).alias("n_toks"),
    )
    g1 = sc.filter(F.col("pred") == "en")
    g2 = g1.filter(F.col("quality") >= 0.32)
    gated = g2.filter(F.col("n_toks") >= 20).select("doc_id", "text", "source")
    return g1, g2, gated


def funnel_gates(batch: DataFrame):
    """The funnel's map-side stages over one (doc_id, text, source, op)
    micro-batch: envelope insert gate, language-ID, quality, length.
    Returns (ins, g1, g2, gated) — each a filter of the previous, all
    pure column expressions (the text_cleaning_funnel gates verbatim)."""
    ins = batch.filter(F.col("op") == "c")
    g1, g2, gated = gate_stages(ins)
    return ins, g1, g2, gated


def funnel_foreach_batch(
    counts_root: str,
    nb_root: str,
    clusters_root: str,
    sig_path: str,
    sh_path: str,
    handle_deletes: bool = False,
):
    """The streaming curation step as ONE foreachBatch callable: gates ->
    per-batch stage-count segment into the additive store -> cluster-dedup
    fold (band/shingle stores self-bootstrap on the first batch — the
    clusters_foreach_batch append-first discipline) -> NB count fold.
    Every fold is ledger-gated on batch_id, so a replayed micro-batch
    (at-least-once foreachBatch) leaves all three stores byte-identical —
    pinned by test_streaming.py::test_curation_funnel_replay_idempotent
    through a REAL readStream/foreachBatch run.

    handle_deletes=True (round 10, VERDICT r9 next #1) additionally
    propagates op='d' rows — which carry the BEFORE-IMAGE, the
    reference's Delete shape (src/main.rs:286-292) — into every store:
    the delete's image re-runs the same deterministic gates, and for the
    docs that had passed them, token counts retract from the NB store
    (group inverse), membership leaves the cluster map through
    remove_docs (tombstone + affected-component recompute), and the
    stage counts fold SIGNED so the merged state tracks the LIVE corpus.
    Delete-side folds commit under stream 'd' (inserts under 's') so a
    mixed batch makes exactly one ledgered fold per store per stream and
    replays stay no-ops on both paths. The default (False) preserves the
    round-9 insert-only semantics byte-for-byte —
    curation_funnel_incremental's pinned oracle depends on it."""
    from cdc_rs_spark.streaming.additive import fold_segment
    from cdc_rs_spark.streaming.classifier import fold_counts, retract_counts
    from cdc_rs_spark.streaming.clusters import (
        clusters_foreach_batch,
        remove_docs,
    )

    cluster_fn = clusters_foreach_batch(
        sig_path, sh_path, clusters_root, threshold=0.5
    )

    def nb_toks(df: DataFrame) -> DataFrame:
        return df.select(
            (F.length("source") <= 4).alias("is_a"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        ).filter(F.col("token") != "")

    def stage(name, df, sign=1):
        return df.agg(
            F.lit(name).alias("stage"),
            (F.lit(sign) * F.count("*")).cast("bigint").alias("n"),
        )

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from cdc_rs_spark.parallel import run_parallel

        ins, g1, g2, gated = funnel_gates(batch_df)
        gated = gated.persist()
        try:
            if not handle_deletes:
                seg = (
                    stage("feed", batch_df)
                    .unionByName(stage("inserts", ins))
                    .unionByName(stage("lang_en", g1))
                    .unionByName(stage("quality_ge_032", g2))
                    .unionByName(stage("len_ge_20", gated))
                )
                # the three stores are disjoint directories and every
                # fold is ledgered per store — overlap them (guide §2.6;
                # the cluster fold dominates, the additive/NB folds
                # back-fill its idle tail). Materialize the persisted
                # gate output first so the concurrent consumers share one
                # computation instead of racing the cache.
                gated.count()
                run_parallel(
                    lambda: fold_segment(
                        seg, counts_root, batch_id=batch_id
                    ),
                    lambda: cluster_fn(gated, batch_id),
                    lambda: fold_counts(
                        nb_toks(gated), nb_root, batch_id=batch_id
                    ),
                )
                return
            dels = batch_df.filter(F.col("op") == "d").select(
                "doc_id", "text", "source"
            )
            dg1, dg2, dgated = gate_stages(dels)
            dgated = dgated.persist()
            try:
                # materialize both persisted gate outputs ONCE before the
                # parallel fan-out: three concurrent first-consumers would
                # otherwise race the cache and each recompute the full
                # gate stack (measured: +13% task time). Two tiny
                # count jobs make every chain a cache hit.
                run_parallel(
                    lambda: gated.count(), lambda: dgated.count()
                )
                # ONE signed segment per batch: +insert-side counts,
                # -delete-side counts; SUM nets to the live corpus
                seg = (
                    stage("inserts", ins)
                    .unionByName(stage("deletes", dels))
                    .unionByName(stage("live", ins))
                    .unionByName(stage("live", dels, sign=-1))
                    .unionByName(stage("lang_en", g1))
                    .unionByName(stage("lang_en", dg1, sign=-1))
                    .unionByName(stage("quality_ge_032", g2))
                    .unionByName(stage("quality_ge_032", dg2, sign=-1))
                    .unionByName(stage("len_ge_20", gated))
                    .unionByName(stage("len_ge_20", dgated, sign=-1))
                )
                # inserts fold under stream 's', deletes under 'd' —
                # one ledger line each per store. The three STORE chains
                # are disjoint directories, so they overlap (§2.6);
                # within the cluster and NB chains the insert fold still
                # strictly precedes the delete fold of the same store.
                run_parallel(
                    lambda: fold_segment(
                        seg, counts_root, batch_id=batch_id
                    ),
                    lambda: (
                        cluster_fn(gated, batch_id),
                        remove_docs(
                            batch_df.sparkSession,
                            clusters_root,
                            dgated.select("doc_id"),
                            sig_store_path=sig_path,
                            shingle_store_path=sh_path,
                            threshold=0.5,
                            batch_id=batch_id,
                            stream_id="d",
                        ),
                    ),
                    lambda: (
                        fold_counts(
                            nb_toks(gated), nb_root, batch_id=batch_id
                        ),
                        retract_counts(
                            nb_toks(dgated), nb_root,
                            batch_id=batch_id, stream_id="d",
                        ),
                    ),
                )
            finally:
                dgated.unpersist(blocking=False)
        finally:
            gated.unpersist(blocking=False)

    return fn


@register("curation_funnel_incremental", oracle=_funnel_oracle())
def curation_funnel_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE STREAMING CURATION PIPELINE END-TO-END (round 9, VERDICT r8
    next #5) — the production shape a training-data team actually runs,
    composed from the engine's now-complete streaming stores: change feed
    -> envelope op gate -> language-ID / quality / length gates ->
    INCREMENTAL cluster dedup (streaming/clusters.py) -> learned NB
    filter trained from the streaming count store
    (streaming/classifier.py) -> md5-sharded training sink (written,
    then read BACK so the report pins the sink round-trip), with the
    map-side gates' per-batch survival counts folded as segments into a
    generic additive store (streaming/additive.py) and served from its
    merged state.

    The corpus arrives as TWO micro-batches (doc_id parity). Stage
    semantics split exactly the way a real funnel's must: the envelope +
    text gates are batch-local map-side filters, so their counts
    accumulate ADDITIVELY across batches (the additive store's algebra);
    dedup survival and the NB boundary are END-STATE decisions (a batch-1
    doc can duplicate a batch-0 doc; the filter scores with the final
    model), so they read the stores after the last fold. The DuckDB
    oracle computes the identical funnel as whole-corpus SQL — additive
    stages equal whole-corpus counts because the batches partition the
    feed, and the end-state stages equal batch semantics by the stores'
    documented invariants (live_cluster_map == batch CC;
    store-trained NB == batch NB by count additivity). Survivor policy:
    min-doc_id per MinHash cluster (>= 0.5 Jaccard), unpaired docs
    survive. Replay idempotence of every fold is pinned by a directed
    pytest (test_streaming.py::test_curation_funnel_replay_idempotent)
    plus each store's own suite.

    Scale shape: everything per-batch is |batch|-bounded (the gates are
    map-side; the cluster fold probes bucket-pruned band stores; the NB
    fold appends one |touched tokens| segment; the stage segment is 5
    rows), and the end-state reads are the stores' documented serving
    paths. The shard write is one partitioned append per funnel run —
    at 100 TB the same sink runs per batch with the shard column as the
    partition key, and nothing here would change shape."""
    import os
    import shutil
    import tempfile

    from cdc_rs_spark.operators.classify import nb_score
    from cdc_rs_spark.streaming.additive import (
        init_additive_store,
        read_merged,
    )
    from cdc_rs_spark.streaming.classifier import (
        init_count_store,
        store_weights,
    )
    from cdc_rs_spark.streaming.clusters import (
        init_cluster_store,
        live_cluster_map,
    )

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", "source"
    )
    feed = d.withColumn(
        "op", F.when(F.col("doc_id") % 19 == 0, "d").otherwise(F.lit("c"))
    )
    root = tempfile.mkdtemp(prefix="curation_funnel_")
    counts_root = os.path.join(root, "stage_counts")
    nb_root = os.path.join(root, "nb")
    clusters_root = os.path.join(root, "clusters")
    sig_path = os.path.join(root, "sig")
    sh_path = os.path.join(root, "sh")
    from cdc_rs_spark.benchphase import build_phase

    survivors = passed = None
    try:
        with build_phase():
            init_additive_store(spark, counts_root, {"stage": "string"}, ["n"])
            init_count_store(spark, nb_root)
            init_cluster_store(spark, clusters_root)
            fn = funnel_foreach_batch(
                counts_root, nb_root, clusters_root, sig_path, sh_path
            )
            for bid in (0, 1):
                fn(feed.filter(F.col("doc_id") % 2 == bid), bid)
        # ---- end state: dedup survivors, NB boundary, shard sink ----
        _, _, _, gated_all = funnel_gates(feed)
        cmap = live_cluster_map(spark, clusters_root)
        # persisted (round 12): the shard write AND the report collect
        # both consume survivors/passed — without the persist each action
        # re-ran the gate stack + cluster-map join (+ NB scoring for
        # passed) from scratch
        survivors = (
            gated_all.join(cmap, "doc_id", "left")
            .filter(
                F.col("cluster").isNull()
                | (F.col("cluster") == F.col("doc_id"))
            )
            .drop("cluster")
        ).persist()
        weights, neutral = store_weights(spark, nb_root)
        scored = nb_score(
            survivors.select(
                "doc_id",
                (F.length("source") <= 4).alias("is_a"),
                F.explode(F.split(F.lower("text"), " ")).alias("token"),
            ).filter(F.col("token") != ""),
            weights,
            neutral,
        )
        passed = scored.filter(
            F.col("s_milli") > F.col("base_milli")
        ).select("doc_id").persist()
        shard_dir = os.path.join(root, "shards")
        # the dedup_survivors / nb_pass counts RIDE the shard write as
        # Observations (round 13, VERDICT r12 next #5): the old report
        # re-consumed both persisted frames in two extra aggregate
        # subtrees within the collect — two cache passes (full passes at
        # 100 TB) for two numbers the write already computes. Observe
        # fires on both join sides, broadcast included (verified).
        from pyspark.sql import Observation

        obs_s, obs_p = Observation(), Observation()
        survivors.observe(obs_s, F.count(F.lit(1)).alias("n")).join(
            passed.observe(obs_p, F.count(F.lit(1)).alias("n")), "doc_id"
        ).withColumn(
            "shard", hash_bucket(F.col("doc_id"), 8)
        ).select("doc_id", "text", "shard").write.partitionBy(
            "shard"
        ).parquet(shard_dir)
        n_surv, n_pass = int(obs_s.get["n"]), int(obs_p.get["n"])
        # report: merged additive stages + end-state stages + the sink
        # read BACK from the written shards (round-trip pinned by value)
        report = (
            read_merged(spark, counts_root)
            .select("stage", F.col("n").cast("bigint").alias("n_docs"))
            .unionByName(
                jvm_literal_df(
                    spark,
                    [("dedup_survivors", n_surv), ("nb_pass", n_pass)],
                    "stage string, n_docs bigint",
                )
            )
            .unionByName(
                # explicit schema: a run where the NB gate passes nothing
                # writes an EMPTY dataset, and schema inference would fail
                spark.read.schema("doc_id long, text string, shard bigint")
                .parquet(shard_dir)
                .groupBy("shard")
                .agg(F.count("*").cast("bigint").alias("n_docs"))
                .select(
                    F.concat(F.lit("shard_"), F.col("shard").cast("string"))
                    .alias("stage"),
                    "n_docs",
                )
            )
        )
        rows = report.collect()  # ~15 rows; frees the scratch stores
        schema = report.schema
    finally:
        # unpersist on EVERY exit path (ADVICE r12): a failed shard write
        # or report collect used to leak both cached frames for the rest
        # of the session
        for _df in (survivors, passed):
            if _df is not None:
                _df.unpersist(blocking=False)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _funnel_retraction_oracle() -> str:
    """The retraction funnel's SQL mirror: the whole funnel (gates ->
    MinHash CC dedup -> NB filter -> md5 shards) computed directly over
    the SURVIVING corpus (documents minus the deleted cohort), plus
    cumulative insert/delete counters. Equality with the streamed
    fold-then-retract composition is the claim: signed stage counts net
    to live-corpus counts (group SUM), NB counts cancel to
    batch-on-survivors (group inverse + vocab zero-drop), and the
    cluster map's delete fold recomputes affected components exactly
    (streaming/clusters.remove_docs)."""
    from cdc_rs_spark.plans.dedup import (
        _DOCS_SHINGLES_SQL,
        _minhash_bands_sql,
        _minhash_sig_sql,
    )
    from cdc_rs_spark.plans.text import _PRED_LANG_SQL, _hits_sql

    sh_ctes = _DOCS_SHINGLES_SQL.replace("FROM documents", "FROM gated")
    quality = (
        f"ROUND(0.4 * ({_hits_sql('en')}::DOUBLE / len(w)) "
        "+ 0.3 * least(len(w)::DOUBLE / 100.0, 1.0) "
        "+ 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6)"
    )
    return f"""
    WITH RECURSIVE feed AS (
        SELECT doc_id, text, source, doc_id % 13 = 0 AS deleted
        FROM documents
    ),
    ins AS (SELECT doc_id, text, source FROM feed WHERE NOT deleted),
    tt AS (SELECT doc_id, text, source, string_split(text, ' ') AS w
           FROM ins),
    sc AS (
        SELECT doc_id, text, source, w,
               {_hits_sql("en")} AS s_en, {_hits_sql("es")} AS s_es,
               {_hits_sql("fr")} AS s_fr, {_hits_sql("de")} AS s_de,
               {quality} AS quality
        FROM tt
    ),
    g1 AS (SELECT * FROM sc WHERE {_PRED_LANG_SQL} = 'en'),
    g2 AS (SELECT * FROM g1 WHERE quality >= 0.32),
    gated AS (SELECT doc_id, text, source FROM g2 WHERE len(w) >= 20),
    {sh_ctes},
    {_minhash_sig_sql()},
    {_minhash_bands_sql()},
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand JOIN sh a ON cand.id_a = a.doc_id
                  JOIN sh b ON cand.id_b = b.doc_id
        WHERE len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
              / (len(a.s) + len(b.s)
                 - len(list_filter(a.s, x -> list_contains(b.s, x)))) >= 0.5
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
        FROM reach GROUP BY a
    ),
    survivors AS (
        SELECT g.doc_id, g.text, g.source
        FROM gated g LEFT JOIN comp c ON g.doc_id = c.doc_id
        WHERE c.component IS NULL OR c.component = g.doc_id
    ),
    labeled AS (
        SELECT doc_id, len(source) <= 4 AS is_a, lower(text) AS lt
        FROM gated
    ),
    train_toks AS (
        SELECT is_a, unnest(string_split(lt, ' ')) AS token FROM labeled
    ),
    cnt AS (
        SELECT token,
               CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS c_a,
               CAST(COUNT(*) FILTER (WHERE NOT is_a) AS BIGINT) AS c_b
        FROM train_toks WHERE token <> '' GROUP BY token
    ),
    tot AS (
        SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
               CAST(SUM(c_b) AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM cnt
    ),
    weights AS (
        SELECT token,
               ((c_a + 1) * (n_b + v) * 1000) // ((c_b + 1) * (n_a + v))
                   AS w_milli
        FROM cnt CROSS JOIN tot
    ),
    neutral AS (
        SELECT ((n_b + v) * 1000) // (n_a + v) AS w0 FROM tot
    ),
    surv_toks AS (
        SELECT l.doc_id, unnest(string_split(l.lt, ' ')) AS token
        FROM labeled l JOIN survivors s ON l.doc_id = s.doc_id
    ),
    nb_scored AS (
        SELECT t.doc_id,
               CAST(SUM(COALESCE(w.w_milli, n.w0)) AS BIGINT) AS s_milli,
               CAST(COUNT(*) AS BIGINT) * MAX(n.w0) AS base_milli
        FROM surv_toks t
        LEFT JOIN weights w ON t.token = w.token
        CROSS JOIN neutral n
        WHERE t.token <> ''
        GROUP BY t.doc_id
    ),
    nb_pass AS (SELECT doc_id FROM nb_scored WHERE s_milli > base_milli),
    shards AS (SELECT {_oracle_bucket("doc_id", 8)} AS shard FROM nb_pass)
    SELECT 'inserts' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM feed
    UNION ALL SELECT 'deletes', CAST(COUNT(*) AS BIGINT)
              FROM feed WHERE deleted
    UNION ALL SELECT 'live', CAST(COUNT(*) AS BIGINT) FROM ins
    UNION ALL SELECT 'lang_en', CAST(COUNT(*) AS BIGINT) FROM g1
    UNION ALL SELECT 'quality_ge_032', CAST(COUNT(*) AS BIGINT) FROM g2
    UNION ALL SELECT 'len_ge_20', CAST(COUNT(*) AS BIGINT) FROM gated
    UNION ALL SELECT 'dedup_survivors', CAST(COUNT(*) AS BIGINT)
              FROM survivors
    UNION ALL SELECT 'nb_pass', CAST(COUNT(*) AS BIGINT) FROM nb_pass
    UNION ALL SELECT 'shard_' || CAST(shard AS VARCHAR),
              CAST(COUNT(*) AS BIGINT)
              FROM shards GROUP BY shard
    """


@register("curation_funnel_retraction", oracle=_funnel_retraction_oracle())
def curation_funnel_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE STREAMING CURATION PIPELINE WITH CDC DELETES (round 10,
    VERDICT r9 next #1 'done' criterion): the whole corpus streams in as
    two insert micro-batches, then a DELETE batch (op='d' with
    before-images, the reference's Delete op, src/main.rs:286-292,
    test.rhai:26,32) retracts the doc_id % 13 cohort from EVERY
    incremental store the round-9 funnel folds into — signed stage
    counts net the additive store to the live corpus, retract_counts
    cancels the deleted docs' NB sufficient statistics (group inverse +
    vocab zero-drop), and remove_docs tombstones + recomputes the
    affected dedup clusters (articulation splits included). The end
    state (dedup survivors -> store-trained NB boundary -> md5 shard
    sink, written AND read back) must equal the round-9 funnel run
    directly on the surviving corpus — which is precisely what the
    DuckDB oracle computes as whole-corpus SQL over `documents WHERE
    doc_id % 13 <> 0`. Delete-path replay idempotence is pinned by
    tests/test_streaming.py::test_funnel_retraction_replay_idempotent.

    Scale shape: identical to curation_funnel_incremental on the insert
    path; the delete fold adds request-bounded work (tombstone append,
    bucket-pruned root lookup, one label-map scan, affected-cluster pair
    recompute) — nothing rescans corpus text. GDPR completion
    (physical band-store erasure) is gdpr_forget_end_to_end's job."""
    import os
    import shutil
    import tempfile

    from cdc_rs_spark.operators.classify import nb_score
    from cdc_rs_spark.streaming.additive import (
        init_additive_store,
        read_merged,
    )
    from cdc_rs_spark.streaming.classifier import (
        init_count_store,
        store_weights,
    )
    from cdc_rs_spark.streaming.clusters import (
        init_cluster_store,
        live_cluster_map,
    )

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", "source"
    )
    root = tempfile.mkdtemp(prefix="curation_retract_")
    counts_root = os.path.join(root, "stage_counts")
    nb_root = os.path.join(root, "nb")
    clusters_root = os.path.join(root, "clusters")
    sig_path = os.path.join(root, "sig")
    sh_path = os.path.join(root, "sh")
    from cdc_rs_spark.benchphase import build_phase

    survivors = passed = None
    try:
        with build_phase():
            init_additive_store(spark, counts_root, {"stage": "string"}, ["n"])
            init_count_store(spark, nb_root)
            init_cluster_store(spark, clusters_root)
            fn = funnel_foreach_batch(
                counts_root, nb_root, clusters_root, sig_path, sh_path,
                handle_deletes=True,
            )
            ic = F.lit("c").alias("op")
            fn(d.filter(F.col("doc_id") % 2 == 0).withColumn("op", ic), 0)
            fn(d.filter(F.col("doc_id") % 2 == 1).withColumn("op", ic), 1)
            # the CDC delete batch: before-images of the forgotten cohort
            fn(
                d.filter(F.col("doc_id") % 13 == 0).withColumn(
                    "op", F.lit("d")
                ),
                2,
            )
        # ---- end state over the LIVE corpus ----
        live = d.filter(F.col("doc_id") % 13 != 0)
        _, _, gated_all = gate_stages(live)
        cmap = live_cluster_map(spark, clusters_root)
        # persisted (round 12): shard write + report collect both consume
        # survivors/passed — see curation_funnel_incremental
        survivors = (
            gated_all.join(cmap, "doc_id", "left")
            .filter(
                F.col("cluster").isNull()
                | (F.col("cluster") == F.col("doc_id"))
            )
            .drop("cluster")
        ).persist()
        weights, neutral = store_weights(spark, nb_root)
        scored = nb_score(
            survivors.select(
                "doc_id",
                (F.length("source") <= 4).alias("is_a"),
                F.explode(F.split(F.lower("text"), " ")).alias("token"),
            ).filter(F.col("token") != ""),
            weights,
            neutral,
        )
        passed = scored.filter(
            F.col("s_milli") > F.col("base_milli")
        ).select("doc_id").persist()
        shard_dir = os.path.join(root, "shards")
        # counts ride the shard write as Observations — see
        # curation_funnel_incremental (round 13, VERDICT r12 next #5)
        from pyspark.sql import Observation

        obs_s, obs_p = Observation(), Observation()
        survivors.observe(obs_s, F.count(F.lit(1)).alias("n")).join(
            passed.observe(obs_p, F.count(F.lit(1)).alias("n")), "doc_id"
        ).withColumn(
            "shard", hash_bucket(F.col("doc_id"), 8)
        ).select("doc_id", "text", "shard").write.partitionBy(
            "shard"
        ).parquet(shard_dir)
        n_surv, n_pass = int(obs_s.get["n"]), int(obs_p.get["n"])
        report = (
            read_merged(spark, counts_root)
            .select("stage", F.col("n").cast("bigint").alias("n_docs"))
            .unionByName(
                jvm_literal_df(
                    spark,
                    [("dedup_survivors", n_surv), ("nb_pass", n_pass)],
                    "stage string, n_docs bigint",
                )
            )
            .unionByName(
                spark.read.schema("doc_id long, text string, shard bigint")
                .parquet(shard_dir)
                .groupBy("shard")
                .agg(F.count("*").cast("bigint").alias("n_docs"))
                .select(
                    F.concat(F.lit("shard_"), F.col("shard").cast("string"))
                    .alias("stage"),
                    "n_docs",
                )
            )
        )
        rows = report.collect()  # ~16 rows; frees the scratch stores
        schema = report.schema
    finally:
        # unpersist on EVERY exit path (ADVICE r12) — see
        # curation_funnel_incremental
        for _df in (survivors, passed):
            if _df is not None:
                _df.unpersist(blocking=False)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def _coreness_sample_oracle() -> str:
    """Nests the full unrolled coreness decomposition (plans/relational2)
    as a subquery, then mirrors the deterministic priority draw."""
    from cdc_rs_spark.plans.relational2 import _coreness_oracle

    return f"""
    WITH cor AS (SELECT * FROM ({_coreness_oracle()})),
    keyed AS (
        SELECT part, coreness,
               ROUND(({_oracle_bucket("part", 1_000_000)})::DOUBLE
                     / coreness, 6) AS priority
        FROM cor
    )
    SELECT part, coreness, priority FROM (
        SELECT part, coreness, priority,
               row_number() OVER (ORDER BY priority, part) AS rk
        FROM keyed
    ) WHERE rk <= 100
    """


@register("sample_coreness_weighted", oracle=_coreness_sample_oracle())
def sample_coreness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORENESS-WEIGHTED SAMPLING (round 9) — the curation signal the
    full coreness decomposition exists to feed: draw a deterministic
    weighted sample of parts where a vertex's keep-probability scales
    with its core number (structurally central items from the
    co-purchase graph are over-represented, tendrils under-represented —
    the graph-derived analog of quality-weighted document sampling).
    The draw is priority sampling with the engine's standing determinism
    discipline (sample_weighted_priority): key = md5-bucket(part) /
    coreness, keep the 100 smallest keys — reproducible, join-stable,
    no rand() state, and the oracle replays the whole chain including
    the unrolled coreness fixpoint.

    Scale shape: coreness is the iterative peel (part_coreness's
    docstring carries the 100 TB argument); the draw adds one map-side
    key + a TakeOrdered top-k (per-partition heaps — no global sort)."""
    from cdc_rs_spark.plans.relational2 import part_coreness

    cor = part_coreness(spark, sf_dir)
    keyed = cor.select(
        "part",
        "coreness",
        F.round(
            hash_bucket(F.col("part"), 1_000_000).cast("double")
            / F.col("coreness"),
            6,
        ).alias("priority"),
    )
    return keyed.orderBy("priority", "part").limit(100)


@register(
    "l_diversity_audit_customer",
    oracle="""
    WITH q AS (
        SELECT c_nationkey,
               CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT)
                   AS bal_bucket,
               CAST(COUNT(*) AS BIGINT) AS grp_n,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
        FROM customer GROUP BY 1, 2
    )
    SELECT CASE WHEN l_div = 1 THEN 'l=1'
                WHEN l_div = 2 THEN 'l=2'
                ELSE 'l>=3' END AS diversity_band,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(grp_n) AS DOUBLE)
                 / (SELECT COUNT(*) FROM customer), 6) AS row_share
    FROM q GROUP BY 1
    """,
)
def l_diversity_audit_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion of
    k_anonymity_audit_customer: a quasi-identifier group can be large
    (k-anonymous) yet HOMOGENEOUS in the sensitive attribute, in which
    case membership alone discloses it. Per (nation, coarse balance
    bucket) group, l = distinct sensitive values (market segment); the
    report bands groups by l and the row share each band carries — l=1
    rows leak their segment to anyone who can place them in the group.
    Shape: one map-side-combinable count-distinct agg on the QI key (a
    25 x ~12-bucket grid), then a |groups|-sized band rollup."""
    cust = load(spark, sf_dir, "customer")
    grp = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal").cast("double") / 1000)
        .cast("bigint")
        .alias("bal_bucket"),
    ).agg(
        F.count("*").cast("bigint").alias("grp_n"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("l_div"),
    )
    total = cust.agg(F.count("*").alias("n_total"))
    band = (
        F.when(F.col("l_div") == 1, F.lit("l=1"))
        .when(F.col("l_div") == 2, F.lit("l=2"))
        .otherwise(F.lit("l>=3"))
    )
    return (
        grp.select(band.alias("diversity_band"), "grp_n")
        .groupBy("diversity_band")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("grp_n").cast("bigint").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "diversity_band",
            "n_groups",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_total"), 6
            ).alias("row_share"),
        )
    )


IO_FORMATS = ("parquet", "csv", "json")


@register(
    "io_format_roundtrip_checksum",
    oracle="""
    WITH src AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
                        % 1000000007) AS BIGINT) AS checksum_sum,
               CAST(SUM(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_sum
        FROM documents
    )
    SELECT f.format, s.n_rows, s.checksum_sum, s.id_sum
    FROM (VALUES ('parquet'), ('csv'), ('json')) f(format), src s
    """,
)
def io_format_roundtrip_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format source/sink fidelity: write the documents table out as
    parquet, CSV, and JSON, read each back with an EXPLICIT schema, and
    report per format the row count, a content checksum (sum of 60-bit md5
    fingerprints mod 1e9+7 — order-independent, int64-safe), and the id
    sum. The oracle computes the same three numbers from the SOURCE table
    only — it never sees the round-tripped files — so equality per format
    IS the losslessness proof: any quoting, escaping, encoding, header, or
    type-inference defect in a writer/reader pair shows up as a checksum
    mismatch on that format's row.

    Scale notes: all three writers/readers are distributed executor-side
    IO (one task per partition, no driver materialization); CSV/JSON are
    the interchange formats every ingest edge speaks, and the explicit
    read schema is the production discipline (inference is a full extra
    scan AND a correctness hazard: a numeric-looking string column
    silently changes type). The fixture text is comma- and quote-free
    ASCII; quoting-sensitive content is exactly what the checksum would
    catch if a writer regressed."""
    import shutil
    import tempfile

    from cdc_rs_spark.functions.hashing import fingerprint

    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="io_roundtrip_")
    frames = []
    try:
        for fmt in IO_FORMATS:
            path = f"{root}/{fmt}"
            w = d.write.mode("overwrite")
            if fmt == "csv":
                # explicit null/empty markers + RFC quote-escaping +
                # multiLine read: without these, Spark reads an empty
                # string field back as NULL and an embedded newline
                # splits the row — silent checksum drift on a future
                # fixture (ADVICE r9). Markers chosen to never occur in
                # the documents fixture.
                _csv_opts = {
                    "header": "true",
                    "quote": '"',
                    "escape": '"',
                    "nullValue": "\x01NUL\x01",
                    "emptyValue": "\x01EMP\x01",
                }
                w.options(**_csv_opts).csv(path)
                back = (
                    spark.read.options(**_csv_opts)
                    .option("multiLine", "true")
                    .schema("doc_id long, text string")
                    .csv(path)
                )
            elif fmt == "json":
                w.json(path)
                back = spark.read.schema("doc_id long, text string").json(path)
            else:
                w.parquet(path)
                back = spark.read.parquet(path)
            agg = back.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(fingerprint(F.col("text")) % 1_000_000_007)
                .cast("bigint")
                .alias("checksum_sum"),
                F.sum(F.col("doc_id").cast("bigint"))
                .cast("bigint")
                .alias("id_sum"),
            ).select(F.lit(fmt).alias("format"), "*")
            frames.append(agg)
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2)
        rows = out.collect()  # 3 rows; frees the scratch files
        schema = out.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
