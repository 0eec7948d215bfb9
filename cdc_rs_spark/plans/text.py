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
    summarize what survived. The rank is computed per-lang — each partition
    sorts independently, no global ordering; at 100 TB a lang partition that
    skews huge switches to the approx-quantile threshold instead (one pass,
    no full sort) with identical filter semantics."""
    d = spread(load(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    ranked = scored.withColumn("pr", F.percent_rank().over(w))
    return (
        ranked.filter(F.col("pr") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("quality").alias("min_quality"),
            F.sum(F.col("quality").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("total_quality"),
        )
    )
