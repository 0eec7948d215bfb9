"""Text-analysis query inventory (EXTENSION): token stats, quality score,
language-ID, rolling-hash fingerprint — all oracle-checked verbatim SQL
transcriptions of the column expressions in functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_rs_spark.functions.hashing import P31, fp_sql
from cdc_rs_spark.functions.text import (
    LANG_STOPWORDS,
    lang_scores,
    predicted_lang,
    quality_score,
    rolling_fingerprint,
    token_count,
    tokens,
)
from cdc_rs_spark.registry import register
from cdc_rs_spark.session import load, spread


def _stoplist_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


def _hits_sql(lang: str) -> str:
    return f"len(list_filter(w, t -> list_contains({_stoplist_sql(lang)}, t)))::BIGINT"


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           length(text)::BIGINT AS text_len,
           ROUND((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
                 / len(string_split(text, ' ')), 6) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + average token length."""
    d = spread(load(spark, sf_dir, "documents"))
    n = token_count(F.col("text"))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.length("text").cast("bigint").alias("text_len"),
        F.round(
            (F.length("text") - (n - 1)).cast("double") / n.cast("double"), 6
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           ROUND(0.4 * ({_hits_sql("en")}::DOUBLE / len(w))
                 + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                 + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6) AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic: stopword density, length prior,
    vocabulary diversity."""
    d = spread(load(spark, sf_dir, "documents"))
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@register(
    "text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    scored AS (
        SELECT doc_id,
               {_hits_sql("en")} AS s_en, {_hits_sql("es")} AS s_es,
               {_hits_sql("fr")} AS s_fr, {_hits_sql("de")} AS s_de
        FROM t
    )
    SELECT doc_id, s_en, s_es, s_fr, s_de,
           CASE WHEN s_en = greatest(s_en, s_es, s_fr, s_de) AND
                     greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) AND
                     greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) AND
                     greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'fr'
                WHEN s_de = greatest(s_en, s_es, s_fr, s_de) AND
                     greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'de'
                ELSE 'und' END AS pred_lang
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-breaking."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    scores = lang_scores(toks)
    return d.select(
        "doc_id",
        *[scores[lg].alias(f"s_{lg}") for lg in LANG_STOPWORDS],
        predicted_lang(toks).alias("pred_lang"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(string_split(text, ' '),
                                  t -> {fp_sql("t")} % {P31})),
               (acc, x) -> (acc * 31 + x) % {P31}) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint."""
    d = spread(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", rolling_fingerprint(tokens(F.col("text"))).alias("fp")
    )


@register(
    "text_quality_filter_median",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               ROUND(0.4 * ({_hits_sql("en")}::DOUBLE / len(w))
                     + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6)
                   AS quality
        FROM t
    ),
    ranked AS (
        SELECT *, percent_rank() OVER (
            PARTITION BY lang ORDER BY quality, doc_id) AS pr
        FROM scored
    )
    SELECT lang, COUNT(*) AS n_kept, MIN(quality) AS min_quality,
           CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DECIMAL(38,6))
               AS total_quality
    FROM ranked WHERE pr >= 0.5
    GROUP BY lang
    """,
)
def text_quality_filter_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation: keep the top half of each language's documents by
    quality score (percent_rank >= 0.5, deterministic doc_id tiebreak) and
    summarize what survived. The rank comes from operators/ranged.
    grouped_rank (VERDICT r4 task 2): a raw Window.partitionBy(lang) sorts
    the dominant 'en' stratum (41 % of the corpus) in ONE task; the grouped
    two-pass form splits each stratum across quality-range buckets and
    reconstructs percent_rank exactly as rk/(n-1) from the per-(lang,
    bucket) statistics — (quality, doc_id) is a total order, so rank() ==
    row_number() and the reconstruction is bit-identical to SQL
    percent_rank."""
    from cdc_rs_spark.operators.ranged import grouped_rank, ranked_result

    d = spread(load(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )

    def build(s: DataFrame) -> DataFrame:
        ranked = grouped_rank(
            s,
            ["lang"],
            "quality",
            [F.col("quality"), F.col("doc_id")],
            out_col="_rk",
            count_col="_gn",
        )
        pr = F.when(
            F.col("_gn") > 1, F.col("_rk") / (F.col("_gn") - F.lit(1))
        ).otherwise(F.lit(0.0))
        return (
            ranked.filter(pr >= 0.5)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_kept"),
                F.min("quality").alias("min_quality"),
                F.sum(F.col("quality").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .alias("total_quality"),
            )
        )

    return ranked_result(scored, build)


@register(
    "text_bpe_token_estimate",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_words,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))::BIGINT
               AS n_pieces,
           ROUND(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))::DOUBLE
                 / len(string_split(text, ' ')), 6) AS pieces_per_word
    FROM documents
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (the mandate's second token-counting mode):
    a subword-style regex — letter runs, single digits, single punctuation —
    approximates a BPE pre-tokenizer's piece count without a vocab. The
    pattern avoids lookaround so Java regex (Spark) and RE2-style (DuckDB)
    agree byte-for-byte. Pure map-side column expression; pieces_per_word is
    the budget-planning ratio a training pipeline tracks per source."""
    d = spread(load(spark, sf_dir, "documents"))
    pieces = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0)
    ).cast("bigint")
    words = token_count(F.col("text"))
    return d.select(
        "doc_id",
        words.alias("n_words"),
        pieces.alias("n_pieces"),
        F.round(pieces.cast("double") / words.cast("double"), 6).alias(
            "pieces_per_word"
        ),
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS gram
        FROM t
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           ROUND(MAX(n)::DOUBLE / SUM(n)::DOUBLE, 6) AS top_bigram_share,
           ROUND(1.0 - COUNT(*)::DOUBLE / SUM(n)::DOUBLE, 6) AS dup_bigram_frac
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate signals (Gopher-style quality filters): the
    share of the most frequent word bigram and the duplicate-bigram fraction
    per document. Non-distinct bigrams are built JVM-side (sequence +
    element_at — no Python), then explode + two grouped aggregations; the
    explode shuffles skinny (doc_id, gram) rows with map-side combine, the
    scalable shape for per-doc n-gram statistics at corpus scale."""
    d = spread(load(spark, sf_dir, "documents"))
    w = tokens(F.col("text"))
    docs = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    gram = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
            ),
        )
    )
    counts = docs.select("doc_id", gram.alias("gram")).groupBy("doc_id", "gram").agg(
        F.count("*").alias("n")
    )
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(F.max("n").cast("double") / F.sum("n").cast("double"), 6).alias(
            "top_bigram_share"
        ),
        F.round(
            F.lit(1.0) - F.count("*").cast("double") / F.sum("n").cast("double"), 6
        ).alias("dup_bigram_frac"),
    )


@register(
    "text_quality_deciles",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    q AS (
        SELECT doc_id,
               ROUND(0.4 * ({_hits_sql("en")}::DOUBLE / len(w))
                     + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6) AS quality
        FROM t
    ),
    d AS (
        SELECT doc_id, quality,
               ntile(10) OVER (ORDER BY quality, doc_id) AS decile
        FROM q
    )
    SELECT decile, COUNT(*) AS n_docs,
           MIN(quality) AS min_quality, MAX(quality) AS max_quality
    FROM d GROUP BY decile
    """,
)
def text_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/quality binning: ntile(10) over the composite quality
    score — the bucketing a data-mix recipe consumes ("train on top 3
    deciles first"). Exact NTILE(10) with no corpus-sized window and no
    extra passes: the output (decile, count, min, max) never needs doc
    identity, so it is computed from the VALUE HISTOGRAM — quality rounds
    to 6 decimals in [0, 1] by construction, so the histogram is at most
    10^6 + 1 rows NO MATTER THE CORPUS SIZE. One map-side-combinable
    shuffle builds it; the cumulative count runs over that bounded
    relation (aggregate-sized, the pareto/ewma class); each value row then
    knows its 1-based rank span [cum-c+1, cum] and explodes to the deciles
    it intersects, with NTILE's exact first-(n%10)-deciles-get-one-extra
    arithmetic deciding boundaries and per-decile counts. Identical output
    to the oracle's NTILE incl. tie splitting (a boundary value appears in
    both deciles' min/max; decile sizes are fixed by n alone)."""
    d = spread(load(spark, sf_dir, "documents"))
    q = d.select(quality_score(F.col("text")).alias("quality"))
    hist = q.groupBy("quality").agg(F.count("*").alias("c"))
    # benign `No Partition Defined` warnings here: both windows run over
    # the VALUE HISTOGRAM (quality rounds to a bounded set of buckets),
    # never the document-sized relation
    w_cum = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, 0)
    # total as an unbounded frame over the SAME window partitioning: both
    # frames evaluate in one WindowExec pass — no second aggregation job,
    # no broadcast build
    w_all = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    q0 = F.expr("n div 10")
    r0 = F.col("n") % 10
    b = (q0 + 1) * r0

    def idiv(a, b_):
        # exact integer floor-division as columns: a - a%b is divisible, so
        # the double division is exactly integral (safe below 2^53 ranks)
        return ((a - (a % b_)) / b_).cast("long")

    def dec(rank):
        return (
            F.when(rank <= b, idiv(rank - 1, q0 + 1))
            .otherwise(r0 + idiv(rank - b - 1, F.greatest(q0, F.lit(1))))
            .cast("int")
            + 1
        )

    lo = F.col("cum") - F.col("c") + 1
    hi = F.col("cum")
    exploded = h.select(
        "quality",
        "n",
        F.explode(F.sequence(dec(lo), dec(hi))).alias("decile"),
    )
    return (
        exploded.groupBy("decile")
        .agg(
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
            F.first("n").alias("n"),
        )
        .select(
            "decile",
            F.when(F.col("decile") <= F.col("n") % 10, F.expr("n div 10") + 1)
            .otherwise(F.expr("n div 10"))
            .cast("bigint")
            .alias("n_docs"),
            "min_quality",
            "max_quality",
        )
    )


@register(
    "text_chunk_overlap",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(1, len(toks)+1, 24)) AS start
          FROM t)
    SELECT doc_id,
           CAST((start-1)//24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(LEAST(32, len(toks)-start+1) AS BIGINT) AS n_tokens,
           md5(array_to_string(toks[start:start+31], ' ')) AS chunk_md5
    FROM s
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the context-window splitter a
    training pipeline runs before tokenization (window=32 tokens, stride=24,
    i.e. 8-token overlap so no boundary context is lost). One generator pass:
    chunk starts come from `sequence(1, n, stride)` and each chunk is a
    `slice` of the token array, exploded to (doc_id, chunk_idx) grain. The
    chunk content is emitted as md5 (driver-hashable; real pipelines write
    the text). Purely map-side — zero shuffles at any scale; chunk rows land
    in the same partition as their document."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    chunks = F.transform(
        F.sequence(F.lit(1), n, F.lit(24)),
        lambda s, i: F.struct(
            i.cast("bigint").alias("chunk_idx"),
            s.cast("bigint").alias("start_tok"),
            F.least(F.lit(32), n - s + 1).cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.slice(toks, s, F.lit(32)))).alias("chunk_md5"),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.start_tok", "c.n_tokens", "c.chunk_md5"
    )


@register(
    "text_boilerplate_ngrams",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS gram
          FROM t, unnest(range(1, len(toks)-3)) AS u(i)
          WHERE len(toks) >= 5),
    c AS (SELECT gram, COUNT(*) AS doc_freq FROM g GROUP BY gram)
    SELECT gram, CAST(doc_freq AS BIGINT) AS doc_freq FROM c
    QUALIFY row_number() OVER (ORDER BY doc_freq DESC, gram) <= 20
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection: the 5-grams shared by the most
    documents (headers/footers/licenses repeat verbatim across a crawl; the
    top of this list is the removal candidate set). Per-doc DISTINCT grams
    (array_distinct before explode, so a doc voting twice counts once) ->
    one partial-agg count shuffle -> global top-20 via orderBy+limit, which
    Spark executes as TakeOrdered (per-partition heaps + driver merge of 20
    rows), NOT a single-partition sort — the shape that survives a 100 TB
    gram table."""
    from cdc_rs_spark.operators.dedup import exploded_ngrams

    d = spread(load(spark, sf_dir, "documents"))
    # index-sequence explode + per-doc distinct instead of
    # explode(array_distinct(transform(...))): the lambda-built array is
    # re-evaluated interpreted per emitted gram (see exploded_ngrams)
    grams = (
        exploded_ngrams(d, "doc_id", "text", 5)
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
    )
    return grams.orderBy(F.col("doc_freq").desc(), F.col("gram")).limit(20)


@register(
    "text_top_tokens_per_lang",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token)
    SELECT lang, token, CAST(n AS BIGINT) AS n FROM c
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) <= 5
    """,
)
def text_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head (heavy hitters): token counts grouped by
    (lang, token) — partial aggregation combines map-side, so the shuffle
    carries one partial per distinct token per task, not one row per token
    occurrence — then top-5 per language by a window over the (small)
    aggregated counts. The per-group window partitions by lang over already-
    reduced data; at 100 TB the candidate set per language is vocabulary-
    sized, not corpus-sized."""
    d = spread(load(spark, sf_dir, "documents"))
    counts = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "token", "n")
    )


@register(
    "text_length_histogram",
    oracle="""
    SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bin,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents WHERE n_chars > 0
    GROUP BY 1
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 document-length histogram (the size-distribution profile a
    pipeline checks before choosing chunk/packing budgets). The bin is
    floor(log2(n)) computed as length(bin(n)) - 1 — pure integer/string
    arithmetic, bit-identical across engines, unlike float log2 whose
    rounding at exact powers of two differs by ULPs between libm and the
    JVM. Single map-side bin + one partial-agg shuffle of #bins rows."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    log2_bin = (F.length(F.bin(F.col("n_chars"))) - 1).cast("bigint")
    return d.groupBy(log2_bin.alias("log2_bin")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


_PRED_LANG_SQL = """
    CASE WHEN s_en = greatest(s_en, s_es, s_fr, s_de) AND
              greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'en'
         WHEN s_es = greatest(s_en, s_es, s_fr, s_de) AND
              greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'es'
         WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) AND
              greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'fr'
         WHEN s_de = greatest(s_en, s_es, s_fr, s_de) AND
              greatest(s_en, s_es, s_fr, s_de) > 0 THEN 'de'
         ELSE 'und' END
"""


@register(
    "text_cleaning_funnel",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
               FROM documents),
    scored AS (
        SELECT doc_id, text, w,
               {_hits_sql("en")} AS s_en, {_hits_sql("es")} AS s_es,
               {_hits_sql("fr")} AS s_fr, {_hits_sql("de")} AS s_de,
               ROUND(0.4 * ({_hits_sql("en")}::DOUBLE / len(w))
                     + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6)
                   AS quality
        FROM t
    ),
    s1 AS (SELECT * FROM scored WHERE {_PRED_LANG_SQL} = 'en'),
    s2 AS (SELECT * FROM s1 WHERE quality >= 0.32),
    s3 AS (SELECT * FROM s2 WHERE len(w) >= 20)
    SELECT 'input' AS stage, COUNT(*) AS n_docs FROM scored
    UNION ALL SELECT 'lang_en', COUNT(*) FROM s1
    UNION ALL SELECT 'quality_ge_032', COUNT(*) FROM s2
    UNION ALL SELECT 'len_ge_20', COUNT(*) FROM s3
    UNION ALL SELECT 'exact_dedup', COUNT(DISTINCT text) FROM s3
    """,
)
def text_cleaning_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style corpus-cleaning pipeline as one survival funnel:
    language-ID gate -> composite-quality gate (>= 0.32, the corpus median) -> minimum-length gate ->
    exact dedup, reporting survivors per stage (what a data team reads
    before training: where the corpus is being lost). Every gate is the
    SAME map-side column expression used by its standalone query
    (text_langid / text_quality_score), so the funnel is the integration
    proof that the stages compose; the only non-map stage is the final
    dedup's distinct (one hash shuffle — at 100 TB on md5(text), 16-byte
    keys). Conditional counts share one logical scan per stage."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    scored = d.select(
        "text",
        predicted_lang(toks).alias("pred"),
        quality_score(F.col("text")).alias("quality"),
        F.size(toks).alias("n_toks"),
    )
    s1 = scored.filter(F.col("pred") == "en")
    s2 = s1.filter(F.col("quality") >= 0.32)
    s3 = s2.filter(F.col("n_toks") >= 20)

    def stage(name, df):
        return df.agg(F.lit(name).alias("stage"), F.count("*").alias("n_docs"))

    return (
        stage("input", scored)
        .unionByName(stage("lang_en", s1))
        .unionByName(stage("quality_ge_032", s2))
        .unionByName(stage("len_ge_20", s3))
        .unionByName(
            s3.agg(
                F.lit("exact_dedup").alias("stage"),
                F.count_distinct(F.col("text")).alias("n_docs"),
            )
        )
    )


@register(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.token,
               t.tf * (CAST(n.n_docs AS DOUBLE) / d.df) AS score
        FROM tf t JOIN df d USING (token) CROSS JOIN n
    ),
    top1 AS (
        SELECT doc_id, token, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token ASC) AS rn
        FROM scored
    )
    SELECT token AS keyword, COUNT(*) AS n_docs_top, MAX(score) AS max_score
    FROM top1 WHERE rn = 1 GROUP BY token
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: score every (doc, term) by
    tf x (N / df) and keep each document's top-scoring term, then report
    how many documents each keyword wins. The inverse-document-frequency
    ratio N/df replaces the usual log-idf so the score is a single
    correctly-rounded IEEE division (ln is not correctly rounded and
    diverges across engines). Shape at 100 TB: tokenize+explode is
    map-side; tf and df are map-side-combine aggs shuffling only distinct
    (doc,term) / term keys; the scalar N broadcasts; the per-doc top-1 is
    a partial top-k window over doc_id (already the tf grouping key, so
    AQE reuses the exchange)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("token").alias("keyword"))
        .agg(
            F.count("*").alias("n_docs_top"),
            F.max("score").alias("max_score"),
        )
    )


@register(
    "text_char_gini_score",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split_regex(replace(text, ' ', ''), ''))
               AS ch
        FROM documents
    ),
    freq AS (
        SELECT doc_id, ch, COUNT(*) AS c
        FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS distinct_chars,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq
        FROM freq GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_nospace, distinct_chars,
           1.0 - sum_sq / (CAST(n AS DOUBLE) * n) AS gini_diversity
    FROM tot
    """,
)
def text_char_gini_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution diversity (Gini impurity 1 - sum(p_i^2)) per
    document — the log-free gibberish/repetition detector: natural text
    lands near the language's typical value, while 'aaaa...' or base64
    blobs sit at the extremes. Gini replaces Shannon entropy deliberately:
    it needs only integer counts and ONE double division (ln is not
    correctly rounded and diverges across engines). Per-doc char counts
    shuffle on (doc_id, ch) with map-side combine; everything else is
    integer-exact."""
    docs = load(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.split(F.replace(F.col("text"), F.lit(" "), F.lit("")), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = freq.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").alias("distinct_chars"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
    )
    return tot.select(
        "doc_id",
        F.col("n").alias("n_chars_nospace"),
        "distinct_chars",
        (
            F.lit(1.0)
            - F.col("sum_sq") / (F.col("n").cast("double") * F.col("n"))
        ).alias("gini_diversity"),
    )


@register(
    "token_drift_stats",
    oracle="""
    WITH toks AS (
        SELECT len(source) <= 4 AS grp_a,
               unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    cnt AS (
        SELECT token,
               CAST(COUNT(*) FILTER (WHERE grp_a) AS BIGINT) AS c_a,
               CAST(COUNT(*) FILTER (WHERE NOT grp_a) AS BIGINT) AS c_b
        FROM toks WHERE token <> '' GROUP BY token
    ),
    tot AS (
        SELECT CAST(SUM(c_a) AS BIGINT) AS n_a, CAST(SUM(c_b) AS BIGINT) AS n_b
        FROM cnt
    ),
    scored AS (
        SELECT token, c_a, c_b,
               (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               * (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               / (CAST(c_a AS DOUBLE) / n_a + CAST(c_b AS DOUBLE) / n_b)
                   AS chi2
        FROM cnt CROSS JOIN tot
    ),
    ranked AS (
        SELECT token, c_a, c_b, ROUND(chi2, 8) AS chi2_contrib,
               row_number() OVER (ORDER BY chi2 DESC, token) AS rnk
        FROM scored
    )
    SELECT token, c_a, c_b, chi2_contrib, rnk FROM ranked WHERE rnk <= 20
    """,
)
def token_drift_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift detection between two source cohorts (src0-9 vs
    src10-19): per-token chi-square divergence contribution
    (p_a - p_b)^2 / (p_a + p_b) over unigram distributions, top 20 drivers.
    The chi-square form deliberately replaces KL's ln() — pure IEEE
    divisions are bit-identical across engines where ln is not (same
    discipline as text_tfidf_keywords). Shape at 100 TB: tokenize is
    map-side, per-token counts are a map-side-combinable agg on the token
    key, the two scalar totals broadcast, and the top-20 is a tiny global
    sort over |vocab| aggregated rows."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        (F.length("source") <= 4).alias("grp_a"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    cnt = toks.groupBy("token").agg(
        F.count(F.when(F.col("grp_a"), 1)).cast("bigint").alias("c_a"),
        F.count(F.when(~F.col("grp_a"), 1)).cast("bigint").alias("c_b"),
    )
    tot = cnt.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    scored = cnt.crossJoin(F.broadcast(tot)).select(
        "token", "c_a", "c_b",
        ((p_a - p_b) * (p_a - p_b) / (p_a + p_b)).alias("chi2"),
    )
    # top-20 via orderBy().limit(): TakeOrderedAndProject (fully parallel
    # per-partition heap top-k) instead of an unpartitioned row_number over
    # the whole vocabulary — at 100 TB the vocabulary is not small; only
    # the 20 surviving rows see a window to number them.
    order = [F.desc("chi2"), F.asc("token")]
    top = scored.orderBy(*order).limit(20)
    # benign `No Partition Defined` warning: the frame is 20 rows (above)
    return (
        top.withColumn("rnk", F.row_number().over(Window.orderBy(*order)))
        .select("token", "c_a", "c_b", F.round("chi2", 8).alias("chi2_contrib"), "rnk")
    )


@register(
    "text_rare_bigram_score",
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    bigrams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
                   i -> w[i] || ' ' || w[i+1])) AS bg
        FROM docs WHERE len(w) >= 2
    ),
    freq AS (SELECT bg, COUNT(*) AS c FROM bigrams GROUP BY bg),
    scored AS (
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) FILTER (WHERE f.c <= 2) AS BIGINT) AS n_rare
        FROM bigrams b JOIN freq f USING (bg)
        GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, n_rare,
           ROUND(CAST(n_rare AS DOUBLE) / n_bigrams, 6) AS rare_ratio
    FROM scored
    """,
)
def text_rare_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-flavored fluency heuristic without a trained model:
    count each document's word bigrams that are globally rare (corpus
    frequency <= 2). A high rare-bigram ratio flags garbled or
    machine-mangled text the unigram quality score misses. Integer counts +
    one rounded division — no floating accumulation, so exactly portable.
    Shape at 100 TB: bigrams explode map-side; the corpus frequency table is
    a map-side-combinable count on the bigram key; scoring re-joins on the
    same key (AQE reuses the exchange); per-doc rollup shuffles doc_id."""
    from cdc_rs_spark.operators.dedup import exploded_ngrams

    d = spread(load(spark, sf_dir, "documents")).withColumn(
        "_lt", F.lower("text")
    )
    # index-sequence explode (operators/dedup.exploded_ngrams): avoids the
    # per-emitted-row interpreted re-evaluation of a lambda-built array
    bigrams = exploded_ngrams(d, "doc_id", "_lt", 2, alias="bg")
    freq = bigrams.groupBy("bg").agg(F.count("*").alias("c"))
    return (
        bigrams.join(freq, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.count(F.when(F.col("c") <= 2, 1)).cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id", "n_bigrams", "n_rare",
            F.round(F.col("n_rare").cast("double") / F.col("n_bigrams"), 6).alias("rare_ratio"),
        )
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
    scored AS (
        SELECT lang,
               {_hits_sql("en")} AS s_en, {_hits_sql("es")} AS s_es,
               {_hits_sql("fr")} AS s_fr, {_hits_sql("de")} AS s_de
        FROM t
    )
    SELECT lang AS declared, {_PRED_LANG_SQL} AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored GROUP BY declared, predicted
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit: confusion matrix of the n-gram classifier
    against the corpus's DECLARED lang column. The classifier-evaluation
    primitive a pipeline runs before trusting langid-based filtering — off-
    diagonal mass tells you which filters silently drop which languages.
    Map-side scoring, one |langs|^2-row shuffle."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    return (
        d.select(F.col("lang").alias("declared"), predicted_lang(toks).alias("predicted"))
        .groupBy("declared", "predicted")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "text_quality_quartiles_by_lang",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               ROUND(0.4 * ({_hits_sql("en")}::DOUBLE / len(w))
                     + 0.3 * least(len(w)::DOUBLE / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(w))::DOUBLE / len(w)), 6)
                   AS quality
        FROM t
    ),
    ranked AS (
        SELECT lang, quality,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY quality, doc_id) - 1 AS rk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scored
    )
    SELECT lang, MAX(n)::BIGINT AS n_docs,
           MAX(CASE WHEN rk = floor((n - 1) * 0.25) THEN quality END) AS q25,
           MAX(CASE WHEN rk = floor((n - 1) * 0.5) THEN quality END) AS median,
           MAX(CASE WHEN rk = floor((n - 1) * 0.75) THEN quality END) AS q75
    FROM ranked GROUP BY lang
    """,
)
def text_quality_quartiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT quality quartiles (round 5) — the distribution
    summary a curation dashboard tracks per stratum, computed as
    percentile_disc-style rank selection over operators/ranged.grouped_rank
    (lower-value-at-floor((n-1)q) discipline). Like the median filter, the
    rank never funnels a 41%-of-corpus stratum through one task: ranks come
    from (lang, range-bucket) windows, and the quartile PICK is a
    conditional aggregate — no additional shuffle. The oracle mirrors the
    exact same rank positions, so the hash is exact (no approx-percentile
    tolerance needed)."""
    from cdc_rs_spark.operators.ranged import grouped_rank, ranked_result

    d = spread(load(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )

    def build(s: DataFrame) -> DataFrame:
        ranked = grouped_rank(
            s,
            ["lang"],
            "quality",
            [F.col("quality"), F.col("doc_id")],
            out_col="_rk",
            count_col="_gn",
        )
        pick = lambda q: F.max(  # noqa: E731 — value at the exact rank
            F.when(
                F.col("_rk") == F.floor((F.col("_gn") - 1) * F.lit(q)),
                F.col("quality"),
            )
        )
        return ranked.groupBy("lang").agg(
            F.max("_gn").cast("bigint").alias("n_docs"),
            pick(0.25).alias("q25"),
            pick(0.5).alias("median"),
            pick(0.75).alias("q75"),
        )

    return ranked_result(scored, build)


# shared by text_nb_source_classifier and its streaming form
# text_nb_incremental_classifier: the incremental store's SUM-merged
# counts train the bit-identical model, so ONE oracle pins both (the
# incremental == batch equivalence IS the claim)
_NB_ORACLE = """
    WITH labeled AS (
        SELECT doc_id, len(source) <= 4 AS is_a,
               doc_id % 2 = 0 AS is_train, lower(text) AS lt
        FROM documents
    ),
    train_toks AS (
        SELECT is_a, unnest(string_split(lt, ' ')) AS token
        FROM labeled WHERE is_train
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
    test_toks AS (
        SELECT doc_id, is_a, unnest(string_split(lt, ' ')) AS token
        FROM labeled WHERE NOT is_train
    ),
    scored AS (
        SELECT t.doc_id, t.is_a,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(COALESCE(w.w_milli, n.w0)) AS BIGINT) AS s_milli,
               CAST(COUNT(*) AS BIGINT) * MAX(n.w0) AS base_milli
        FROM test_toks t
        LEFT JOIN weights w ON t.token = w.token
        CROSS JOIN neutral n
        WHERE t.token <> ''
        GROUP BY t.doc_id, t.is_a
    )
    SELECT CAST(s_milli > base_milli AS INT) AS pred_a,
           CAST(is_a AS INT) AS actual_a,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s_milli - base_milli) AS BIGINT) AS margin_milli
    FROM scored
    GROUP BY 1, 2
    """


@register("text_nb_source_classifier", oracle=_NB_ORACLE)
def text_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned document classifier, trained and scored in-engine — the
    fastText/CCNet-style quality-filter pattern every large-scale
    training-data pipeline runs (train a cheap linear text classifier on
    a labeled cohort, score the whole corpus, keep what passes). Model,
    arithmetic discipline (exact-rational quantized odds instead of ln —
    see the module doc) and the 100 TB plan shape live in
    operators/classify.py; this query wires it to the fixture: label =
    source cohort (src0-9 vs src10-19, the split token_drift_stats
    measures drift across), train on even doc_ids, score the held-out
    odd half, and emit the 2x2 confusion matrix plus each cell's total
    decision margin — the oracle pins the LEARNED BOUNDARY itself
    (every per-token weight feeds the integer margins), not just
    aggregate accuracy.

    Fixture honesty: the synthetic corpus draws every document's tokens
    from one shared vocabulary, so the two cohorts are statistically
    exchangeable and held-out accuracy sits at chance BY CONSTRUCTION —
    the oracle still pins training+scoring exactly (any weight
    perturbation moves the margins). That the classifier genuinely
    learns when signal exists is asserted by the planted-separable-corpus
    unit test (tests/test_text_ops.py::test_nb_classifier_recovers_
    planted_signal); a production quality filter swaps in
    curated/not-curated labels on real text and keeps the identical
    plan."""
    from cdc_rs_spark.operators.classify import (
        nb_confusion,
        nb_score,
        nb_train_weights,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    train_toks = (
        labeled.filter("is_train")
        .select("is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    weights, neutral = nb_train_weights(train_toks)
    test_toks = (
        labeled.filter(~F.col("is_train"))
        .select("doc_id", "is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return nb_confusion(nb_score(test_toks, weights, neutral))


@register("text_nb_incremental_classifier", oracle=_NB_ORACLE)
def text_nb_incremental_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING classifier training (streaming/classifier.py) — the
    online-retraining form of text_nb_source_classifier, exercised
    through the REAL persisted count store: the labeled training half
    arrives as TWO micro-batches, each folded as one partial-count
    segment (ledger-gated, purge-on-retry); a compaction rewrites the
    segments into one base between them (proving segment boundaries are
    invisible); the held-out half is then scored with weights read from
    the store. Because the NB family's entire trained state is additive
    integer counts, the served model is BIT-IDENTICAL to batch training
    on the unioned corpus — this query shares the batch query's oracle
    verbatim, so the driver checks both sides of the incremental ==
    batch claim (the dedup_incremental_clusters discipline). Replay
    idempotence and epoch retention are pinned in
    tests/test_streaming_classifier.py."""
    import tempfile

    from cdc_rs_spark.operators.classify import nb_confusion, nb_score
    from cdc_rs_spark.streaming.classifier import (
        compact_count_store,
        fold_counts,
        init_count_store,
        store_weights,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    toks = lambda df, cols: (  # noqa: E731
        df.select(*cols, F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    from cdc_rs_spark.benchphase import build_phase

    root = tempfile.mkdtemp(prefix="nbc_incremental_")
    try:
        with build_phase():
            init_count_store(spark, root)
            # two micro-batches split the training half on doc_id % 4
            fold_counts(
                toks(labeled.filter("is_train AND doc_id % 4 = 0"), ["is_a"]),
                root, batch_id=0,
            )
            compact_count_store(spark, root)  # mid-stream OPTIMIZE
            fold_counts(
                toks(labeled.filter("is_train AND doc_id % 4 = 2"), ["is_a"]),
                root, batch_id=1,
            )
        weights, neutral = store_weights(spark, root)
        scored = nb_score(
            toks(labeled.filter(~F.col("is_train")), ["doc_id", "is_a"]),
            weights, neutral,
        )
        result = nb_confusion(scored)
        rows = result.collect()  # 4 rows; frees the scratch store
        schema = result.schema
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# the retraction form: training counts folded, then a CDC delete batch
# retracts the %8==0 cohort — the oracle trains DIRECTLY on the
# surviving corpus, so streamed fold+retract == batch-on-survivors is
# the checked claim (group-inverse exactness, VERDICT r9 next #1)
_NB_RETRACT_ORACLE = _NB_ORACLE.replace(
    "doc_id % 2 = 0 AS is_train,",
    "doc_id % 2 = 0 AS is_train, doc_id % 8 = 0 AS retracted,",
).replace(
    "FROM labeled WHERE is_train",
    "FROM labeled WHERE is_train AND NOT retracted",
)


@register("text_nb_retraction_classifier", oracle=_NB_RETRACT_ORACLE)
def text_nb_retraction_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-DELETE-AWARE streaming classifier training (round 10, VERDICT
    r9 next #1): the labeled training half folds into the persisted
    count store as two micro-batches, then a DELETE batch arrives — the
    doc_id % 8 = 0 cohort is forgotten — and retract_counts folds the
    negated partial rebuilt from the deletes' BEFORE-IMAGES (the
    reference's Delete op carries exactly that image, src/main.rs:286-292).
    Because integer SUM is a group, the cancellation is bit-exact: the
    served model equals batch training on the SURVIVING corpus, which is
    what the oracle trains on directly. A mid-retraction compaction
    (epoch rewrite) proves the cancelled rows stay cancelled through the
    DISTINCT rewrite, and read_counts' zero-vocab drop keeps V itself
    honest (a fully-retracted token leaves the vocabulary, not just the
    counts). Scoring the held-out half then pins every surviving weight
    through the confusion margins.

    Scale shape: identical to text_nb_incremental_classifier — the
    retraction batch is delete-sized (GDPR requests, takedowns), its
    fold is one map-side count aggregation + one segment append, and
    nothing rescans the corpus."""
    import tempfile

    from cdc_rs_spark.operators.classify import nb_confusion, nb_score
    from cdc_rs_spark.streaming.classifier import (
        compact_count_store,
        fold_counts,
        init_count_store,
        retract_counts,
        store_weights,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    toks = lambda df, cols: (  # noqa: E731
        df.select(*cols, F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    from cdc_rs_spark.benchphase import build_phase

    root = tempfile.mkdtemp(prefix="nbc_retract_")
    try:
        with build_phase():
            init_count_store(spark, root)
            fold_counts(
                toks(labeled.filter("is_train AND doc_id % 4 = 0"), ["is_a"]),
                root, batch_id=0,
            )
            fold_counts(
                toks(labeled.filter("is_train AND doc_id % 4 = 2"), ["is_a"]),
                root, batch_id=1,
            )
            # the CDC delete batch: before-images of the forgotten cohort
            retract_counts(
                toks(labeled.filter("is_train AND doc_id % 8 = 0"), ["is_a"]),
                root, batch_id=2,
            )
            # compaction AFTER the retraction: cancelled state must stay
            # cancelled through the epoch rewrite
            compact_count_store(spark, root)
        weights, neutral = store_weights(spark, root)
        scored = nb_score(
            toks(labeled.filter(~F.col("is_train")), ["doc_id", "is_a"]),
            weights, neutral,
        )
        result = nb_confusion(scored)
        rows = result.collect()  # 4 rows; frees the scratch store
        schema = result.schema
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


LM_Q = 1_000_000  # bigram-likelihood quantum (micro-units)


_BIGRAM_LM_ORACLE = f"""
    WITH labeled AS (
        SELECT doc_id, doc_id % 2 = 0 AS is_train,
               string_split(lower(text), ' ') AS w
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(w)),
                   i -> {{'w1': w[i], 'w2': w[i + 1]}})) AS b
        FROM labeled WHERE len(w) >= 2
    ),
    bg AS (
        SELECT doc_id, is_train, b.w1 AS w1, b.w2 AS w2 FROM bigrams
        WHERE b.w1 <> '' AND b.w2 <> ''
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg WHERE is_train GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM bg WHERE is_train GROUP BY w1
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
            SELECT unnest(w) AS tok FROM labeled WHERE is_train
        ) WHERE tok <> ''
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM((COALESCE(c12.c12, 0) + 1) * {LM_Q}
                        // (COALESCE(c1.c1, 0) + vocab.v)) AS BIGINT)
                   AS s_micro
        FROM bg t
        LEFT JOIN c12 ON t.w1 = c12.w1 AND t.w2 = c12.w2
        LEFT JOIN c1 ON t.w1 = c1.w1
        CROSS JOIN vocab
        WHERE NOT t.is_train
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_bigrams, s_micro // n_bigrams AS score_micro
    FROM scored
    """


@register("text_bigram_lm_score", oracle=_BIGRAM_LM_ORACLE)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM LANGUAGE-MODEL QUALITY SCORE — the CCNet/KenLM filter slot
    (round 9): train an add-one-smoothed bigram model on the even-doc_id
    half, score every held-out doc by its mean smoothed bigram
    likelihood, in-distribution text scores high and gibberish low. The
    engine's ln-free discipline applies (operators/classify.py module
    doc): each bigram contributes the EXACT integer
    floor(1e6 * (c(w1w2)+1) / (c(w1)+V)) instead of a log-prob — sums of
    integers are partition-order-independent and engine-identical, so
    the learned scores themselves are oracle-pinned. The arithmetic mean
    of smoothed likelihoods (not the geometric mean true perplexity
    uses) is the one deliberate divergence: it keeps every value exact,
    and as a pass/fail quality gate only the ORDERING matters — both
    rank gibberish below fluent text; the mean emphasizes a document's
    high-probability bigrams slightly more.

    Scale shape: training is two map-side-combinable aggregates over the
    labeled cohort's bigrams (c(w1,w2) and c(w1) — the same token-key
    shuffle as NB training); V is one distinct count; scoring is two
    left joins on the bigram/context keys plus one per-doc integer
    aggregate. At 100 TB the count tables follow nb_score's size-gated
    strategy (broadcast under the threshold, shuffle join on the token
    key above) and the labeled cohort is bounded by construction."""
    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.split(F.lower("text"), " ").alias("w"),
    )
    bg = (
        labeled.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "is_train",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(element_at(w, i) AS w1, "
                    "element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "is_train", "b.w1", "b.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    train = bg.filter("is_train")
    c12 = train.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    c1 = train.groupBy("w1").agg(F.count("*").cast("bigint").alias("c1"))
    vocab = (
        labeled.filter("is_train")
        .select(F.explode("w").alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    scored = (
        bg.filter(~F.col("is_train"))
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.expr(
                    f"((coalesce(c12, 0) + 1) * {LM_Q}) "
                    "div (coalesce(c1, 0) + v)"
                )
            )
            .cast("bigint")
            .alias("s_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.expr("s_micro div n_bigrams").alias("score_micro"),
    )


@register("text_bigram_lm_incremental", oracle=_BIGRAM_LM_ORACLE)
def text_bigram_lm_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING bigram-LM training (round 9) — the online form of
    text_bigram_lm_score through TWO generic additive stores
    (streaming/additive.py): per micro-batch, one (w1, w2, c12) partial
    and one (tok, c) unigram partial fold as ledger-gated segments; the
    served model reads the SUM-merged stores — c(w1) derives from the
    merged bigram counts by one group-by (never a third store), V is the
    unigram store's key count. Because the model's entire trained state
    is additive integer counts, the served scores are BIT-IDENTICAL to
    batch training on the unioned corpus — this query shares the batch
    oracle verbatim, so the driver checks both sides of the incremental
    == batch claim (the NB/classifier discipline). A compaction between
    the folds proves segment boundaries are invisible.

    Scale shape: each fold is one map-side-combinable aggregate over the
    batch's bigrams/tokens appended as one |touched keys| segment;
    serving reads <= |keys| x n_segments rows (bounded by compaction
    cadence); scoring is the batch query's two joins + per-doc integer
    aggregate."""
    import shutil
    import tempfile

    from cdc_rs_spark.benchphase import build_phase
    from cdc_rs_spark.streaming.additive import (
        compact_additive_store,
        fold_segment,
        init_additive_store,
        read_merged,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.split(F.lower("text"), " ").alias("w"),
    )
    bg = (
        labeled.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "is_train",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(element_at(w, i) AS w1, "
                    "element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "is_train", "b.w1", "b.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    toks = (
        labeled.select("doc_id", "is_train", F.explode("w").alias("tok"))
        .filter(F.col("tok") != "")
    )
    root = tempfile.mkdtemp(prefix="bigram_lm_incremental_")
    bg_root, ug_root = f"{root}/bg", f"{root}/ug"
    try:
        with build_phase():
            init_additive_store(
                spark, bg_root, {"w1": "string", "w2": "string"}, ["c12"]
            )
            init_additive_store(spark, ug_root, {"tok": "string"}, ["c"])
            for bid, pred in ((0, "doc_id % 4 = 0"), (1, "doc_id % 4 = 2")):
                half = bg.filter("is_train").filter(pred)
                fold_segment(
                    half.groupBy("w1", "w2").agg(
                        F.count("*").cast("bigint").alias("c12")
                    ),
                    bg_root, batch_id=bid,
                )
                fold_segment(
                    toks.filter("is_train").filter(pred)
                    .groupBy("tok")
                    .agg(F.count("*").cast("bigint").alias("c")),
                    ug_root, batch_id=bid,
                )
                if bid == 0:  # mid-stream OPTIMIZE on both stores
                    compact_additive_store(spark, bg_root)
                    compact_additive_store(spark, ug_root)
        c12 = read_merged(spark, bg_root)
        c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
        vocab = read_merged(spark, ug_root).agg(
            F.count("*").cast("bigint").alias("v")
        )
        scored = (
            bg.filter(~F.col("is_train"))
            .join(c12, ["w1", "w2"], "left")
            .join(c1, "w1", "left")
            .crossJoin(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_bigrams"),
                F.sum(
                    F.expr(
                        f"((coalesce(c12, 0) + 1) * {LM_Q}) "
                        "div (coalesce(c1, 0) + v)"
                    )
                )
                .cast("bigint")
                .alias("s_micro"),
            )
        )
        result = scored.select(
            "doc_id",
            "n_bigrams",
            F.expr("s_micro div n_bigrams").alias("score_micro"),
        )
        rows = result.collect()  # per-held-out-doc rows; frees the stores
        schema = result.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Tokenizer training: distributed BPE merge learning
# ---------------------------------------------------------------------------

BPE_MERGES = 12


def _bpe_ctes(n_merges: int = BPE_MERGES) -> list[str]:
    """The shared CTE chain of the BPE oracle family: per merge round, one
    pair-count CTE, one argmax CTE, one merge-application CTE (all
    MATERIALIZED — DuckDB inlines plain CTEs and the per-round triple
    references explode exponentially otherwise, the k-core lesson). The
    merge application folds the symbol list left-to-right with list_reduce
    over a chr(31)-joined accumulator: the last symbol of the accumulator
    is `l` iff acc = l or acc ends with chr(31)||l (symbols are [a-z]+
    concatenations, never containing the separator), and appending `r`
    WITHOUT a separator is exactly the merge. list_reduce seeds with the
    first element, so single-symbol words pass through the CASE len(s)=1
    guard untouched. The final CTE w{n_merges} holds every distinct word's
    FULLY ENCODED symbol list — training and encoding share it."""
    ctes = [
        """wf AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
            FROM documents) GROUP BY word
    )""",
        """w0 AS MATERIALIZED (
        SELECT word, cnt,
               list_transform(range(1, len(word) + 1),
                              i -> substr(word, i, 1)) AS s
        FROM wf
    )""",
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(
            f"""pairs{r} AS MATERIALIZED (
            SELECT t.p['l'] AS l, t.p['r'] AS r, SUM(cnt) AS n
            FROM w{p}, unnest(list_transform(range(1, len(s)),
                              i -> {{'l': s[i], 'r': s[i + 1]}})) AS t(p)
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""best{r} AS MATERIALIZED (
            SELECT l, r, CAST(n AS BIGINT) AS n FROM pairs{r}
            ORDER BY n DESC, l, r LIMIT 1
        )"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
            SELECT word, cnt,
                   CASE WHEN len(s) = 1 THEN s
                        ELSE string_split(
                            list_reduce(s, (acc, x) -> CASE
                                WHEN (acc = b.l
                                      OR ends_with(acc, chr(31) || b.l))
                                     AND x = b.r
                                THEN acc || x
                                ELSE acc || chr(31) || x END),
                            chr(31))
                   END AS s
            FROM w{p}, best{r} b
        )"""
        )
    return ctes


def _bpe_oracle(n_merges: int = BPE_MERGES) -> str:
    ctes = _bpe_ctes(n_merges)
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, n AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM ("
        + union
        + ") ORDER BY merge_rank"
    )


@register("text_bpe_train_merges", oracle=_bpe_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
    first BPE_MERGES merge rules from the corpus — the missing half of the
    text_bpe_token_estimate story (that query only counts pre-tokenizer
    pieces; this one learns the vocabulary).

    The real-trainer shape: BPE never iterates over the corpus — it trains
    on the WORD-FREQUENCY table. The corpus is read exactly once (explode +
    count, map-side combinable); every merge round then runs over the
    distinct-word table, which is corpus-size-independent (the fixture has
    31 distinct words; 100 TB of web text has ~10^7-10^8 — trivially
    distributed, and the round cost is O(vocab), not O(corpus)).

    Per round: adjacent symbol pairs come from a JVM-side transform over
    the symbol arrays weighted by word count (explode + one shuffle with
    partial aggregation), the argmax is a 1-row bounded collect (count
    DESC, pair ASC — the driver-side collect is the same k=1 bounded
    discipline as pagerank's top-k), and the merge applies as a pure
    column fold: aggregate(s, [], CASE last==l AND x==r THEN replace-last
    ELSE append) — greedy left-to-right, non-overlapping, exactly
    Sennrich's scan because a freshly merged symbol can never equal its
    own left half. The word table is localCheckpoint-ed per round so round
    r's plan doesn't re-run rounds 1..r-1 (the nested-fold lineage
    otherwise grows O(r) analysis cost).

    Engine-exactness: counts are integers, ties break on the pair's
    lexicographic order (pure-ASCII lowercase — identical collation in
    both engines), and the fold semantics are mirrored in the oracle via
    list_reduce over a separator-joined accumulator (see _bpe_oracle).
    Spark trap pinned in tests: sequence(1, size-1) DESCENDS for
    single-symbol words (sequence(1,0) = [1,0]) — the size(s) >= 2 filter
    on the pair stage is load-bearing.

    Reference parity: the reference engine has no tokenizer training; this
    is north-star EXTENSION surface (training-data pipeline mandate)."""
    d = spread(load(spark, sf_dir, "documents"))
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[A-Za-z]+', 0)")
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count("*").cast("bigint").alias("cnt"))
    merges, _ = _bpe_train(spark, wf)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def _bpe_train(spark: SparkSession, wf: DataFrame):
    """Run the BPE_MERGES-round training loop over a (word, cnt) frequency
    table. Returns (merges, w_final): the learned merge rules and the word
    table with each word's FINAL symbolization under them — the encoder's
    lookup table (text_bpe_encode_fertility consumes it; retraining to
    encode mirrors the oracle, whose w{N} CTE is the same byproduct)."""
    w = wf.select(
        "word",
        "cnt",
        F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))").alias(
            "s"
        ),
    ).localCheckpoint(eager=True)
    merges = []
    for r in range(1, BPE_MERGES + 1):
        pairs = (
            w.filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, CAST(i AS INT)) AS l, "
                        "element_at(s, CAST(i + 1 AS INT)) AS r))"
                    )
                ).alias("p"),
            )
            .select("cnt", "p.l", "p.r")
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # bounded: exactly one row (the argmax)
        )
        if not best:  # pairs exhausted before BPE_MERGES — emit what exists
            break
        a, b, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append((r, a, b, a + b, n))
        aq, bq = a.replace("'", "''"), b.replace("'", "''")
        w = w.select(
            "word",
            "cnt",
            F.expr(
                f"aggregate(s, CAST(array() AS array<string>), (acc, x) -> "
                f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{aq}' "
                f"AND x = '{bq}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array('{aq}{bq}')) "
                f"ELSE concat(acc, array(x)) END)"
            ).alias("s"),
        ).localCheckpoint(eager=True)
    return merges, w


@register(
    "text_bpe_encode_fertility",
    oracle=(
        "WITH "
        + ",\n".join(_bpe_ctes())
        + f""",
    wtok AS MATERIALIZED (
        SELECT word, len(s)::BIGINT AS n_tok, length(word)::BIGINT AS n_chr
        FROM w{BPE_MERGES}
    ),
    dw AS (
        SELECT source,
               lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chr) AS BIGINT) AS n_chars,
           CAST(SUM(n_tok) AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
               AS tokens_per_word_micro,
           CAST(SUM(n_chr) AS BIGINT) * 1000000 // CAST(SUM(n_tok) AS BIGINT)
               AS chars_per_token_micro
    FROM dw JOIN wtok USING (word)
    GROUP BY source
    ORDER BY source
    """
    ),
)
def text_bpe_encode_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of text_bpe_train_merges:
    encode the corpus with the learned merges and audit per-source
    fertility (tokens/word) and compression (chars/token), the numbers a
    training pipeline sizes its token budget and per-source mixing with.

    The scale shape mirrors the trainer's: encoding is NEVER per-document
    work. The corpus contributes one explode + (source, word) shuffle; the
    merge fold runs over the DISTINCT-word table (corpus-size-independent),
    and each word's final token count joins back to the per-source word
    stream as a plain shuffle join on `word` (at web scale ~1e7-1e8 distinct
    words — too big to broadcast blindly, exactly the size-gated join the
    NB scorer uses). Ratios are integer micro-units (div), so the result is
    partitioning-independent and engine-exact.

    Oracle: the SAME training chain as _bpe_oracle — its final w{N} CTE IS
    the encoder table — extended by one join + group-by. A drift anywhere in
    the 12 learned merges, the fold semantics, or the join shows up as a
    hash mismatch, not a tolerance."""
    d = spread(load(spark, sf_dir, "documents"))
    by_src = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[A-Za-z]+', 0)")
        ).alias("word"),
    )
    wf = by_src.groupBy("word").agg(F.count("*").cast("bigint").alias("cnt"))
    _, w_final = _bpe_train(spark, wf)
    wtok = w_final.select(
        "word",
        F.size("s").cast("bigint").alias("n_tok"),
        F.length("word").cast("bigint").alias("n_chr"),
    )
    return (
        by_src.join(wtok, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_chr").cast("bigint").alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            "n_chars",
            F.expr("n_tokens * 1000000 div n_words").alias(
                "tokens_per_word_micro"
            ),
            F.expr("n_chars * 1000000 div n_tokens").alias(
                "chars_per_token_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer training II: unigram-LM (SentencePiece-style) Viterbi hard-EM
# ---------------------------------------------------------------------------

UNI_MAXP = 4  # max piece length (chars)
UNI_SEED_TOP = 24  # multi-char seed pieces kept from the substring count
UNI_KEEP = 12  # multi-char pieces surviving the EM prune
UNI_BIG = 1 << 44  # composite-cost quantum: pieces * 2^44 - sum(weight)
UNI_MAX_WL = 12  # word-length cap (fixture max is 8); the oracle unroll depth


def _uni_dp_expr(m: str = "m") -> str:
    """Spark SQL: the Viterbi DP array over one word under the broadcast
    piece-weight map `m` — dp[i] = min over j of dp[j] + (2^44 - w(piece
    j+1..i)), vocabulary misses excluded (single chars are always in the
    vocabulary, so the DP is total). The composite integer cost orders
    segmentations by (piece count, -total piece weight): 2^44 dwarfs any
    weight sum, so fewer pieces always wins and the weight sum breaks
    ties — the exact-integer surrogate for the unigram log-likelihood
    (see the train query docstring for why not float logs). ONE pure
    column fold, zero shuffle."""
    return (
        f"aggregate(sequence(1, length(word)), array(CAST(0 AS BIGINT)), "
        f"(acc, i) -> concat(acc, array(array_min(filter(transform("
        f"sequence(greatest(CAST(0 AS BIGINT), i - {UNI_MAXP}), i - 1), "
        f"j -> CASE WHEN try_element_at({m}, substring(word, CAST(j + 1 AS INT), "
        f"CAST(i - j AS INT))) IS NULL THEN CAST(NULL AS BIGINT) "
        f"ELSE element_at(acc, CAST(j + 1 AS INT)) + {UNI_BIG}L - "
        f"try_element_at({m}, substring(word, CAST(j + 1 AS INT), CAST(i - j AS INT))) END), "
        f"x -> x IS NOT NULL)))))"
    )


def _uni_trace_expr(m: str = "m", dp: str = "dp") -> str:
    """Spark SQL: backtrace the chosen segmentation from the DP column —
    from the right, the chosen predecessor is the SMALLEST j achieving
    dp[pos] (first element of the ascending-j candidate scan; the oracle
    trace mirrors with ORDER BY pos, rk=1). Returns the piece array
    (right-to-left; usage counting is order-blind)."""

    def chosen(field: str) -> str:
        return (
            f"element_at(filter(transform(sequence(greatest(CAST(0 AS BIGINT), "
            f"acc.pos - {UNI_MAXP}), acc.pos - 1), "
            f"j -> named_struct('j', j, 'p', substring(word, CAST(j + 1 AS INT), "
            f"CAST(acc.pos - j AS INT)))), "
            f"s -> try_element_at({m}, s.p) IS NOT NULL AND "
            f"element_at({dp}, CAST(s.j + 1 AS INT)) + {UNI_BIG}L - "
            f"try_element_at({m}, s.p) = element_at({dp}, CAST(acc.pos + 1 AS INT))), "
            f"1).{field}"
        )

    return (
        f"aggregate(sequence(1, length(word)), "
        f"named_struct('pos', CAST(length(word) AS BIGINT), "
        f"'ps', CAST(array() AS array<string>)), "
        f"(acc, _i) -> CASE WHEN acc.pos <= 0 THEN acc ELSE "
        f"named_struct('pos', {chosen('j')}, "
        f"'ps', concat(acc.ps, array({chosen('p')}))) END).ps"
    )


def _uni_weight_map(vocab: DataFrame):
    """(piece, w) -> one-row broadcastable map column. The vocabulary is
    control-plane-sized (chars + UNI_SEED_TOP or UNI_KEEP pieces), so the
    map rides the task closure like the PQ codebook does."""
    return F.broadcast(
        vocab.agg(
            F.map_from_arrays(
                F.collect_list("piece"), F.collect_list("w")
            ).alias("m")
        )
    )


def _uni_seed_vocab(wf: DataFrame):
    """Seed vocabulary: every single character (coverage guarantee —
    the DP is total because chars never prune) plus the UNI_SEED_TOP
    most frequent substrings of length 2..UNI_MAXP, weighted by word
    count x occurrence position. Returns (chars, seeds) DataFrames of
    (piece, w)."""
    chars = (
        wf.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)), "
                    "i -> substring(word, CAST(i AS INT), 1))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("w"))
    )
    subs = None
    for L in range(2, UNI_MAXP + 1):
        s = wf.filter(F.length("word") >= L).select(
            "cnt",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word) - {L - 1}), "
                    f"i -> substring(word, CAST(i AS INT), {L}))"
                )
            ).alias("piece"),
        )
        subs = s if subs is None else subs.unionByName(s)
    seeds = (
        subs.groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("w"))
        .orderBy(F.desc("w"), F.asc("piece"))
        .limit(UNI_SEED_TOP)
    )
    return chars, seeds


def _unigram_train(spark: SparkSession, wf: DataFrame):
    """One Viterbi hard-EM round over the (word, cnt) frequency table:
    seed vocab -> Viterbi-segment every word (DP fold) -> recount piece
    usage from the chosen segmentations (E/M) -> prune to all chars +
    the UNI_KEEP top multi-char pieces. Returns (final_vocab(piece, w=
    usage), wf_capped) — the trained model and the capped word table."""
    wf = wf.filter(F.length("word") <= UNI_MAX_WL).localCheckpoint(
        eager=True
    )
    chars, seeds = _uni_seed_vocab(wf)
    vocab0 = chars.unionByName(seeds)
    seg = (
        wf.crossJoin(_uni_weight_map(vocab0))
        .withColumn("dp", F.expr(_uni_dp_expr()))
        .select("cnt", F.explode(F.expr(_uni_trace_expr())).alias("piece"))
    )
    usage = seg.groupBy("piece").agg(
        F.sum("cnt").cast("bigint").alias("u")
    )
    kept_multi = (
        usage.filter(F.length("piece") >= 2)
        .orderBy(F.desc("u"), F.asc("piece"))
        .limit(UNI_KEEP)
    )
    final = (
        chars.select("piece")
        .join(usage, "piece", "left")
        .select("piece", F.coalesce("u", F.lit(0)).cast("bigint").alias("w"))
        .unionByName(kept_multi.select("piece", F.col("u").alias("w")))
    )
    return final, wf


def _uni_oracle_ctes(prefix: str, vocab_cte: str, wf_cte: str = "wfl"):
    """Unrolled relational Viterbi DP over the word table against the
    `vocab_cte`(piece, w) vocabulary — UNI_MAX_WL rounds of
    position-CTEs (the BPE/coreness unrolling discipline; DuckDB 1.0's
    list_reduce miscompiles multi-step struct folds, so the oracle
    avoids lambdas entirely). Emits {prefix}dall{N} holding (word, cnt,
    pos, cost) for every reachable prefix length."""
    ctes = [
        f"""{prefix}dp0 AS MATERIALIZED (
        SELECT word, cnt, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS cost
        FROM {wf_cte}
    )""",
        f"{prefix}dall0 AS MATERIALIZED (SELECT * FROM {prefix}dp0)",
    ]
    for i in range(1, UNI_MAX_WL + 1):
        p = i - 1
        ctes.append(
            f"""{prefix}dp{i} AS MATERIALIZED (
            SELECT d.word, d.cnt, CAST({i} AS BIGINT) AS pos,
                   MIN(d.cost + {UNI_BIG} - v.w) AS cost
            FROM {prefix}dall{p} d JOIN {vocab_cte} v
              ON v.piece = substr(d.word, (d.pos + 1)::INT, ({i} - d.pos)::INT)
            WHERE d.pos >= {i} - {UNI_MAXP} AND d.pos < {i}
              AND length(d.word) >= {i}
            GROUP BY d.word, d.cnt
        )"""
        )
        ctes.append(
            f"""{prefix}dall{i} AS MATERIALIZED (
            SELECT * FROM {prefix}dall{p}
            UNION ALL SELECT * FROM {prefix}dp{i}
        )"""
        )
    return ctes


def _uni_oracle_trace_ctes(prefix: str, vocab_cte: str, dall: str):
    """Unrolled backtrace over the {dall} DP table: per step, the chosen
    predecessor is the SMALLEST j whose cost + piece weight lands on the
    position's DP value (rk = 1 over ORDER BY d.pos — the Spark fold's
    ascending-j first-match). {prefix}use unions every step's emitted
    piece."""
    ctes = [
        f"""{prefix}t0 AS MATERIALIZED (
        SELECT word, cnt, CAST(length(word) AS BIGINT) AS pos,
               CAST(NULL AS VARCHAR) AS piece
        FROM wfl
    )"""
    ]
    for k in range(1, UNI_MAX_WL + 1):
        p = k - 1
        ctes.append(
            f"""{prefix}t{k} AS MATERIALIZED (
            SELECT word, cnt, pos, piece FROM (
                SELECT t.word, t.cnt, d.pos AS pos, v.piece,
                       row_number() OVER (
                           PARTITION BY t.word ORDER BY d.pos
                       ) AS rk
                FROM {prefix}t{p} t
                JOIN {dall} d ON d.word = t.word
                 AND d.pos >= t.pos - {UNI_MAXP} AND d.pos < t.pos
                JOIN {dall} de ON de.word = t.word AND de.pos = t.pos
                JOIN {vocab_cte} v
                  ON v.piece = substr(t.word, (d.pos + 1)::INT,
                                      (t.pos - d.pos)::INT)
                WHERE t.pos > 0
                  AND d.cost + {UNI_BIG} - v.w = de.cost
            ) WHERE rk = 1
        )"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT cnt, piece FROM {prefix}t{k}"
        for k in range(1, UNI_MAX_WL + 1)
    )
    ctes.append(
        f"""{prefix}use AS MATERIALIZED (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u
        FROM ({union}) WHERE piece IS NOT NULL GROUP BY piece
    )"""
    )
    return ctes


def _uni_train_ctes():
    """The full train chain: capped word table, seed vocab, DP, trace,
    usage, pruned final vocab `ufinal`(piece, w)."""
    sub_union = "\nUNION ALL ".join(
        f"""SELECT substr(word, i::INT, {L}) AS piece, cnt
            FROM wfl, unnest(range(1, length(word) - {L} + 2)) AS _t{L}(i)
            WHERE length(word) >= {L}"""
        for L in range(2, UNI_MAXP + 1)
    )
    ctes = [
        f"""wfl AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
            FROM documents) GROUP BY word
        HAVING length(word) <= {UNI_MAX_WL}
    )""",
        """uchars AS MATERIALIZED (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS w FROM (
            SELECT unnest(list_transform(range(1, length(word) + 1),
                          i -> substr(word, i::INT, 1))) AS piece, cnt
            FROM wfl) GROUP BY piece
    )""",
        f"""useed AS MATERIALIZED (
        SELECT piece, w FROM (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS w
            FROM ({sub_union}) GROUP BY piece
        ) ORDER BY w DESC, piece LIMIT {UNI_SEED_TOP}
    )""",
        """uvocab0 AS MATERIALIZED (
        SELECT piece, w FROM uchars UNION ALL SELECT piece, w FROM useed
    )""",
    ]
    ctes += _uni_oracle_ctes("s", "uvocab0")
    ctes += _uni_oracle_trace_ctes("s", "uvocab0", f"sdall{UNI_MAX_WL}")
    ctes.append(
        f"""ufinal AS MATERIALIZED (
        SELECT c.piece, CAST(COALESCE(u.u, 0) AS BIGINT) AS w
        FROM uchars c LEFT JOIN suse u USING (piece)
        UNION ALL
        SELECT piece, u AS w FROM (
            SELECT piece, u FROM suse WHERE length(piece) >= 2
            ORDER BY u DESC, piece LIMIT {UNI_KEEP}
        )
    )"""
    )
    return ctes


_UNI_TRAIN_ORACLE = (
    "WITH "
    + ",\n".join(_uni_train_ctes())
    + """
    SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len,
           w AS usage_count,
           w * 1000000 // t.total AS score_micro
    FROM ufinal, (SELECT CAST(SUM(w) AS BIGINT) AS total FROM ufinal) t
    """
)


@register("text_unigram_lm_train", oracle=_UNI_TRAIN_ORACLE)
def text_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIGRAM-LM TOKENIZER TRAINING (round 10, VERDICT r9 next #5 —
    Kudo 2018, the SentencePiece unigram model; the other half of the
    standard tokenizer pairing next to text_bpe_train_merges): seed a
    substring vocabulary, Viterbi-segment every word under it, recount
    piece usage from the chosen segmentations, and PRUNE to the
    surviving vocabulary — one hard-EM round (segment = E step with the
    max instead of the expectation, recount+prune = M step), emitting
    each surviving piece with its usage count and micro-unit relative
    frequency (the unigram probabilities the model serves).

    The deliberate exactness divergence, in the bigram LM's tradition:
    Kudo's soft EM sums float log-likelihoods over all segmentations,
    which no two engines reproduce bit-identically. The Viterbi
    objective here is the EXACT composite integer (n_pieces * 2^44 -
    sum of piece weights) — fewer pieces first, then highest total
    piece frequency, path ties broken by the smallest split point — so
    segmentation, usage counts, and the pruned vocabulary are
    bit-identical everywhere, and the ORDERING structure a tokenizer
    needs (frequent long pieces win) is preserved. Training runs over
    the DISTINCT-WORD table like the BPE trainer — corpus-size-
    independent; the corpus is read once for the word count.

    The whole pipeline is Spark-native: the DP and its backtrace are
    single column-expression folds (zero shuffle, zero UDF); the seed
    and prune argmaxes are TakeOrdered top-k. Words are capped at
    UNI_MAX_WL chars (fixture max is 8) because the DuckDB oracle
    unrolls the DP relationally to that depth — DuckDB 1.0's
    list_reduce miscompiles multi-step struct folds, so the oracle
    mirrors the fold as UNI_MAX_WL rounds of position-CTE joins (the
    BPE/coreness unrolling discipline) instead."""
    d = spread(load(spark, sf_dir, "documents"))
    words = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[A-Za-z]+', 0)")
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count("*").cast("bigint").alias("cnt"))
    final, _ = _unigram_train(spark, wf)
    total = final.agg(F.sum("w").cast("bigint").alias("total"))
    return final.crossJoin(F.broadcast(total)).select(
        "piece",
        F.length("piece").cast("bigint").alias("piece_len"),
        F.col("w").alias("usage_count"),
        F.expr("w * 1000000 div total").alias("score_micro"),
    )


_UNI_FERTILITY_ORACLE = (
    "WITH "
    + ",\n".join(
        _uni_train_ctes()
        + _uni_oracle_ctes("e", "ufinal")
        + [
            f"""wtoku AS MATERIALIZED (
        SELECT d.word, (d.cost + {UNI_BIG} - 1) // {UNI_BIG} AS n_tok
        FROM edall{UNI_MAX_WL} d
        WHERE d.pos = length(d.word)
    )""",
        ]
        + _bpe_ctes()
        + [
            f"""wtokb AS MATERIALIZED (
        SELECT word, len(s)::BIGINT AS n_tok FROM w{BPE_MERGES}
    )""",
            f"""dwf AS (
        SELECT source,
               lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
        FROM documents
    )""",
            f"""dws AS (
        SELECT source, word FROM dwf WHERE length(word) <= {UNI_MAX_WL}
    )""",
        ]
    )
    + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(u.n_tok) AS BIGINT) AS n_tokens_unigram,
           CAST(SUM(u.n_tok) AS BIGINT) * 1000000
               // CAST(COUNT(*) AS BIGINT) AS tokens_per_word_unigram_micro,
           CAST(SUM(b.n_tok) AS BIGINT) AS n_tokens_bpe,
           CAST(SUM(b.n_tok) AS BIGINT) * 1000000
               // CAST(COUNT(*) AS BIGINT) AS tokens_per_word_bpe_micro
    FROM dws JOIN wtoku u USING (word) JOIN wtokb b USING (word)
    GROUP BY source
    """
)


@register("text_unigram_encode_fertility", oracle=_UNI_FERTILITY_ORACLE)
def text_unigram_encode_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer application + THE BPE-vs-UNIGRAM COMPARISON (round 10,
    VERDICT r9 next #5's 'done' row): encode the corpus with the
    EM-trained unigram vocabulary and audit per-source fertility
    (tokens/word) side-by-side with the BPE tokenizer's fertility on
    the same words — the table a pipeline uses to pick its tokenizer
    (unigram's optimal segmentation yields <= greedy-merge BPE's piece
    count wherever both share the effective vocabulary).

    The encode needs NO backtrace: the composite cost construction
    means the piece count falls out of the DP value arithmetically —
    n_pieces = ceil(dp / 2^44), exactly, because the weight-sum term is
    always < 2^44. Encoding is the word-table DP fold + one join from
    the per-source word stream to the per-word token counts (the BPE
    fertility query's shape; size-gated at web-scale vocabularies).
    Words beyond UNI_MAX_WL chars are excluded from BOTH tokenizers'
    streams (the documented oracle-unroll cap, none in the fixture)."""
    d = spread(load(spark, sf_dir, "documents"))
    by_src_all = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[A-Za-z]+', 0)")
        ).alias("word"),
    )
    by_src = by_src_all.filter(F.length("word") <= UNI_MAX_WL)
    wf = by_src.groupBy("word").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    final, wfc = _unigram_train(spark, wf)
    wtoku = (
        wfc.crossJoin(_uni_weight_map(final))
        .withColumn("dp", F.expr(_uni_dp_expr()))
        .select(
            "word",
            F.expr(
                f"(element_at(dp, CAST(length(word) + 1 AS INT)) "
                f"+ {UNI_BIG}L - 1) div {UNI_BIG}L"
            ).alias("n_tok_u"),
        )
    )
    # BPE trains on the UNCAPPED word table (its oracle chain has no
    # length cap); the capped join stream below is what both tokenizers'
    # fertility is measured over
    wf_bpe = by_src_all.groupBy("word").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    _, w_final = _bpe_train(spark, wf_bpe)
    wtokb = w_final.select(
        "word", F.size("s").cast("bigint").alias("n_tok_b")
    )
    return (
        by_src.join(wtoku, "word")
        .join(wtokb, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_tok_u").cast("bigint").alias("n_tokens_unigram"),
            F.sum("n_tok_b").cast("bigint").alias("n_tokens_bpe"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens_unigram",
            F.expr("n_tokens_unigram * 1000000 div n_words").alias(
                "tokens_per_word_unigram_micro"
            ),
            "n_tokens_bpe",
            F.expr("n_tokens_bpe * 1000000 div n_words").alias(
                "tokens_per_word_bpe_micro"
            ),
        )
    )


ZIPF_RANKS = (1, 2, 4, 8, 16)


@register(
    "text_zipf_rank_ratio_audit",
    oracle=f"""
    WITH wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
            FROM documents) GROUP BY word
    ),
    ranked AS (
        SELECT word, freq,
               row_number() OVER (ORDER BY freq DESC, word) AS rnk
        FROM wf
    ),
    top AS (SELECT * FROM ranked WHERE rnk <= {max(ZIPF_RANKS)}),
    f1 AS (SELECT freq AS f1 FROM top WHERE rnk = 1)
    SELECT CAST(t.rnk AS BIGINT) AS rank, t.word AS token, t.freq,
           o.f1 * 1000000 // t.freq AS f1_over_fr_micro,
           CAST(t.rnk AS BIGINT) * 1000000 AS zipf_ideal_micro
    FROM top t, f1 o
    WHERE t.rnk IN ({", ".join(str(r) for r in ZIPF_RANKS)})
    """,
)
def text_zipf_rank_ratio_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law conformance audit over the corpus token distribution: under
    Zipf, f_1/f_r ~ r, so the log-free integer ratio f1*1e6 div f_r sits
    near r*1e6 at each probed rank — natural text tracks it, while
    machine-generated or template spam shows a flat head (ratios ~1e6) and
    boilerplate floods show a cliff. The probe ranks are compared against
    the emitted ideal column, a distribution-shape gate for corpus intake
    beside token_drift_stats (which compares two cohorts; this one needs
    no reference cohort).

    Scale shape: one explode + map-side-combinable word count (the same
    single corpus pass every text query starts with), then
    TakeOrderedAndProject for the top-{max(ZIPF_RANKS)} — the rank window
    runs over those {max(ZIPF_RANKS)} collected rows, never the full
    vocabulary. Ties break on the token string (pure-ASCII lowercase,
    identical collation both engines)."""
    d = spread(load(spark, sf_dir, "documents"))
    wf = (
        d.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[A-Za-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    top = wf.orderBy(F.desc("freq"), "word").limit(max(ZIPF_RANKS))
    # benign `No Partition Defined`: the frame is the 16-row limit() above
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("freq"), "word"))
    )
    f1 = ranked.filter(F.col("rnk") == 1).select(F.col("freq").alias("f1"))
    return (
        ranked.filter(F.col("rnk").isin(*ZIPF_RANKS))
        .crossJoin(F.broadcast(f1))
        .select(
            F.col("rnk").cast("bigint").alias("rank"),
            F.col("word").alias("token"),
            "freq",
            F.expr("f1 * 1000000 div freq").alias("f1_over_fr_micro"),
            (F.col("rnk").cast("bigint") * 1000000).alias("zipf_ideal_micro"),
        )
    )


# The NB training + scoring chain up to the per-doc `scored` CTE — shared by
# the confusion query above and the eval-metric queries below (one model,
# three oracle-pinned reports).
_NB_CHAIN = _NB_ORACLE[: _NB_ORACLE.rindex("SELECT CAST(s_milli")]


@register(
    "text_nb_auc_eval",
    oracle=_NB_CHAIN
    + """SELECT t.n_pos, t.n_neg,
           (s.sum_pos_r2 - t.n_pos * (t.n_pos + 1)) * 1000000
               // (2 * t.n_pos * t.n_neg) AS auc_micro
    FROM (
        SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
               CAST(SUM(cnt - np) AS BIGINT) AS n_neg
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS np
            FROM scored GROUP BY s_milli - base_milli
        )
    ) t, (
        SELECT CAST(SUM(np * (2 * prev + cnt + 1)) AS BIGINT) AS sum_pos_r2
        FROM (
            SELECT cnt, np,
                   CAST(COALESCE(SUM(cnt) OVER (ORDER BY m
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS prev
            FROM (
                SELECT s_milli - base_milli AS m,
                       CAST(COUNT(*) AS BIGINT) AS cnt,
                       CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS np
                FROM scored GROUP BY m
            )
        )
    ) s
    """,
)
def text_nb_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT AUC of the learned NB quality filter on the held-out half —
    the Mann-Whitney rank-sum form with full tie correction (average
    ranks), computed entirely over the MARGIN DISTRIBUTION table rather
    than per-doc ranks: group docs by integer decision margin, take the
    tie group's doubled average rank 2*prev + cnt + 1 from an exclusive
    running count, and AUC = (sum_pos_R2 - n_pos(n_pos+1)) /
    (2 n_pos n_neg) in integer micro-units. No doubles anywhere until
    never — the statistic is exact.

    Scale shape: the expensive parts (training agg, scoring join) are the
    classifier's own documented plan; the AUC adds one |distinct margins|
    -sized aggregate and windows OVER THAT DISTRIBUTION TABLE (not the
    eval set — ties collapse first), so the running-count window is
    margin-cardinality-sized. Fixture honesty (same as the classifier):
    cohorts are exchangeable by construction, so AUC sits near 0.5 — the
    planted-signal unit test is where discrimination is proven; here the
    exact statistic itself is the oracle-pinned claim."""
    from cdc_rs_spark.operators.classify import nb_score, nb_train_weights

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    train_toks = (
        labeled.filter("is_train")
        .select("is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    weights, neutral = nb_train_weights(train_toks)
    test_toks = (
        labeled.filter(~F.col("is_train"))
        .select("doc_id", "is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    scored = nb_score(test_toks, weights, neutral)
    gm = scored.groupBy(
        (F.col("s_milli") - F.col("base_milli")).alias("m")
    ).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.count(F.when(F.col("is_a"), 1)).cast("bigint").alias("np"),
    )
    # running count over the margin-DISTRIBUTION table (|distinct margins|
    # rows) — benign unpartitioned frame by construction
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    cum = gm.select(
        "cnt",
        "np",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("prev"),
    )
    tot = gm.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).cast("bigint").alias("n_neg"),
    )
    s = cum.agg(
        F.sum(F.col("np") * (2 * F.col("prev") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("sum_pos_r2")
    )
    return tot.crossJoin(F.broadcast(s)).select(
        "n_pos",
        "n_neg",
        F.expr(
            "(sum_pos_r2 - n_pos * (n_pos + 1)) * 1000000 "
            "div (2 * n_pos * n_neg)"
        ).alias("auc_micro"),
    )


@register(
    "text_nb_decile_lift",
    oracle=_NB_CHAIN
    + """, per AS (
        SELECT doc_id, is_a, s_milli - base_milli AS m FROM scored
    ),
    deciled AS (
        SELECT is_a, m,
               NTILE(10) OVER (ORDER BY m DESC, doc_id) AS decile
        FROM per
    ),
    agg AS (
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS n_pos,
               CAST(MIN(m) AS BIGINT) AS min_margin_milli
        FROM deciled GROUP BY decile
    ),
    tp AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos FROM agg)
    SELECT a.decile, a.n_docs, a.n_pos,
           a.n_pos * 1000000 // a.n_docs AS pos_rate_micro,
           CAST(SUM(a.n_pos) OVER (ORDER BY a.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               * 1000000 // t.total_pos AS cum_gain_micro,
           a.min_margin_milli
    FROM agg a, tp t
    """,
)
def text_nb_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table for the NB quality filter — the
    model-eval artifact a curation team reads before picking a score
    cutoff: rank held-out docs by decision margin, split into 10 exact
    NTILE deciles, and report per decile the positive rate and cumulative
    gain (share of all positives captured down to that decile). A useful
    filter front-loads positives into the top deciles; a chance-level one
    (this fixture, by construction — see the classifier docstring) shows
    a flat ~10%-per-decile gains curve, and the oracle pins the exact
    table either way.

    The decile assignment does NOT use a single-partition NTILE over the
    eval set: ranks come from the distributed two-pass global_rank
    (operators/ranged.py) and NTILE's exact distribution is reconstructed
    arithmetically (ntile_from_rank — the customer_rfm_segments
    discipline). Ties break on doc_id so both engines cut identically;
    every metric is integer micro-units."""
    from cdc_rs_spark.operators.classify import nb_score, nb_train_weights
    from cdc_rs_spark.operators.ranged import (
        global_rank,
        ntile_from_rank,
        ranked_result,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    train_toks = (
        labeled.filter("is_train")
        .select("is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    weights, neutral = nb_train_weights(train_toks)
    test_toks = (
        labeled.filter(~F.col("is_train"))
        .select("doc_id", "is_a", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    scored = nb_score(test_toks, weights, neutral)
    per = scored.select(
        "doc_id", "is_a", (F.col("s_milli") - F.col("base_milli")).alias("m")
    )

    def build(cached):
        ranked, n = global_rank(
            cached, "m", [F.col("m").desc(), F.col("doc_id")], descending=True
        )
        deciled = ranked.withColumn(
            "decile", ntile_from_rank(F.col("_rk"), n, 10).cast("bigint")
        )
        agg = deciled.groupBy("decile").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("is_a"), 1)).cast("bigint").alias("n_pos"),
            F.min("m").cast("bigint").alias("min_margin_milli"),
        )
        tp = agg.agg(F.sum("n_pos").cast("bigint").alias("total_pos"))
        w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        return (
            agg.crossJoin(F.broadcast(tp))
            .select(
                "decile",
                "n_docs",
                "n_pos",
                F.expr("n_pos * 1000000 div n_docs").alias("pos_rate_micro"),
                # 10-row frame: the decile table itself
                F.sum("n_pos").over(w).cast("bigint").alias("_cum_pos"),
                "min_margin_milli",
                "total_pos",
            )
            # exact integer floor division, matching the oracle's `//`
            # (ADVICE r9: the double-division form drifts at ~1e10 pos)
            .select(
                "decile",
                "n_docs",
                "n_pos",
                "pos_rate_micro",
                F.expr("_cum_pos * 1000000 div total_pos").alias(
                    "cum_gain_micro"
                ),
                "min_margin_milli",
            )
        )

    return ranked_result(per, build)


RAKE_STOPS = LANG_STOPWORDS["en"] + ["a"]
RAKE_MAX_LEN = 4  # standard RAKE candidate-phrase cap
RAKE_TOP = 10
_RAKE_SPLIT = " (" + "|".join(RAKE_STOPS) + ") "


@register(
    "text_rake_keyphrases",
    oracle=f"""
    WITH sp AS (
        SELECT doc_id, ' ' || replace(lower(text), ' ', '  ') || ' ' AS s
        FROM documents
    ),
    frag AS (
        SELECT regexp_replace(trim(f), ' +', ' ', 'g') AS phrase
        FROM sp, unnest(string_split_regex(s, '{_RAKE_SPLIT}')) t(f)
        WHERE trim(f) <> ''
    ),
    ph AS (
        SELECT phrase, string_split(phrase, ' ') AS toks
        FROM frag
    ),
    capped AS (SELECT * FROM ph WHERE len(toks) <= {RAKE_MAX_LEN}),
    words AS (
        SELECT t.tok, len(toks) AS plen
        FROM capped, unnest(toks) t(tok)
    ),
    ws AS (
        SELECT tok,
               CAST(SUM(plen) AS BIGINT) * 1000000
                   // CAST(COUNT(*) AS BIGINT) AS score_micro
        FROM words GROUP BY tok
    ),
    pd AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM capped GROUP BY phrase
    ),
    scored AS (
        SELECT p.phrase, p.n_occurrences,
               CAST(len(string_split(p.phrase, ' ')) AS BIGINT)
                   AS n_tokens,
               CAST(SUM(w.score_micro) AS BIGINT) AS score_micro
        FROM pd p,
             unnest(string_split(p.phrase, ' ')) t(tok)
        JOIN ws w ON t.tok = w.tok
        GROUP BY p.phrase, p.n_occurrences
    )
    SELECT phrase, n_tokens, n_occurrences, score_micro
    FROM scored ORDER BY score_micro DESC, phrase LIMIT {RAKE_TOP}
    """,
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the co-occurrence
    complement of text_tfidf_keywords: candidate phrases are maximal
    stopword-delimited word runs (capped at {RAKE_MAX_LEN} tokens, the
    standard RAKE practice), each word scores degree/frequency over the
    candidate set (degree = summed length of phrases containing it —
    words that live in long phrases score up), and a phrase scores the
    sum of its member word scores. Top-{RAKE_TOP} phrases corpus-wide.

    The delimiter split is made overlap-proof BEFORE the regex: doubling
    inner spaces gives every token its own flanking spaces, so adjacent
    stopwords ('of the') each match ' stop ' without sharing a space —
    the same split then behaves identically in Java regex and RE2. All
    scores are integer micro-units (deg*1e6 div freq, summed — no
    doubles); ties break on the phrase string.

    Scale shape: one corpus pass to fragments (scan-side split + explode),
    two map-side-combinable aggregates (word stats over phrase
    occurrences, distinct-phrase counts), one shuffle join of phrase
    tokens to the word-score table (vocabulary-keyed — the same
    size-gated join decision as BPE encoding), and a TakeOrdered
    top-{RAKE_TOP}."""
    d = spread(load(spark, sf_dir, "documents"))
    sp = d.select(
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.lower("text"), " ", "  "),
            F.lit(" "),
        ).alias("s")
    )
    frag = (
        sp.select(F.explode(F.split("s", _RAKE_SPLIT)).alias("f"))
        .select(
            F.regexp_replace(F.trim("f"), " +", " ").alias("phrase")
        )
        .filter(F.col("phrase") != "")
    )
    ph = frag.select("phrase", F.split("phrase", " ").alias("toks")).filter(
        F.size("toks") <= RAKE_MAX_LEN
    )
    words = ph.select(
        F.explode("toks").alias("tok"), F.size("toks").alias("plen")
    )
    ws = words.groupBy("tok").agg(
        F.expr(
            "CAST(sum(plen) AS BIGINT) * 1000000 div CAST(count(*) AS BIGINT)"
        ).alias("score_micro")
    )
    pd = ph.groupBy("phrase").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    scored = (
        pd.select(
            "phrase",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("tok"),
        )
        .join(ws, "tok")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.sum("score_micro").cast("bigint").alias("score_micro"),
        )
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).cast("bigint").alias("n_tokens"),
            "n_occurrences",
            "score_micro",
        )
    )
    return scored.orderBy(F.desc("score_micro"), "phrase").limit(RAKE_TOP)
