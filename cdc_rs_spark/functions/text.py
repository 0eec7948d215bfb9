"""Text-analysis column functions (EXTENSION): token stats, quality scoring,
language-ID heuristic, rolling-hash fingerprinting. All built-in expressions
— per-row narrow computation, no shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdc_rs_spark.functions.hashing import P31, fingerprint

# Fixed stopword votes per language for the n-gram/stopword language-ID
# heuristic. Order matters: ties resolve by this priority.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "im", "ein", "zu"],
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def stopword_hits(toks: Column, words: list[str]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t))).cast(
        "bigint"
    )


def distinct_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: stopword density + length prior
    + vocabulary diversity. Deliberately simple arithmetic so the oracle is a
    verbatim SQL transcription."""
    toks = tokens(text)
    stop_ratio = stopword_hits(toks, LANG_STOPWORDS["en"]).cast(
        "double"
    ) / F.size(toks).cast("double")
    length_prior = F.least(F.size(toks).cast("double") / 100.0, F.lit(1.0))
    diversity = distinct_ratio(toks)
    return F.round(0.4 * stop_ratio + 0.3 * length_prior + 0.3 * diversity, 6)


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def predicted_lang(toks: Column) -> Column:
    """argmax over language stopword hits, ties broken by LANG_STOPWORDS
    order, 'und' when no stopwords hit at all."""
    scores = lang_scores(toks)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when((scores[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return expr


def rolling_fingerprint(toks: Column) -> Column:
    """Order-sensitive document fingerprint: left fold
    acc = (acc*31 + fp(token) % P31) % P31 — cross-engine verified."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + fingerprint(t) % P31) % P31,
    )
