"""Text-analysis operators for large-scale training-data pipelines
(SURVEY §2.13): tokenization, quality scoring, language-ID heuristic,
document fingerprinting.

All pure Catalyst expressions (no Python UDFs) — the whole module stays
inside WholeStageCodegen and scales linearly with input: no shuffles
except the final aggregations, every function is a per-row map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword list — deterministic, engine-agnostic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Marker vocabularies for the n-gram/keyword language-ID heuristic.
# (The reference pipeline carries `language_code` per request,
# protos/stream_process.proto:86; here we *infer* one, which is what a
# training-data pipeline needs.)
LANG_MARKERS = {
    "en": ("the", "a", "is"),
    "es": ("data", "table", "row"),
    "de": ("batch", "stream", "window"),
    "fr": ("query", "join", "merge"),
}


def tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(text: Column | str = "text") -> Column:
    return F.size(tokens_col(text)).cast("bigint")


def stopword_count(text: Column | str = "text") -> Column:
    toks = tokens_col(text)
    return F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    ).cast("bigint")


def quality_score(text: Column | str = "text") -> Column:
    """Deterministic quality score in [0,1]: rewards moderate length,
    penalizes stopword excess and very short tokens (the length/punct/
    stopword-ratio heuristic family)."""
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    stop_ratio = stopword_count(text).cast("double") / F.greatest(n, F.lit(1.0))
    avg_len = (
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
        .cast("double") / F.greatest(n, F.lit(1.0))
    )
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    tok_score = F.least(avg_len / F.lit(5.0), F.lit(1.0))
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                0.5 * len_score + 0.3 * tok_score + 0.2 * (1.0 - stop_ratio),
            ),
        ),
        6,
    )


def lang_score(text: Column | str, lang: str) -> Column:
    toks = tokens_col(text)
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))


def predicted_lang(text: Column | str = "text") -> Column:
    """Arg-max over marker-vocabulary hit counts. Deterministic
    tie-break via rank encoding: score*4 + rank, earlier languages in
    LANG_MARKERS carry higher rank and win ties."""
    langs = list(LANG_MARKERS)
    n = len(langs)
    encoded = [
        lang_score(text, lang) * n + (n - 1 - i) for i, lang in enumerate(langs)
    ]
    best = F.greatest(*encoded) % n
    out = F.lit("unknown")
    for i, lang in enumerate(langs):
        out = F.when(best == (n - 1 - i), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column | str = "text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set — the canonical-form content hash used for
    fuzzy-exact dedup (case/order/duplication-insensitive)."""
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return F.md5(F.array_join(toks, " "))


def with_text_features(df: DataFrame, text: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(text))
        .withColumn("n_stopwords", stopword_count(text))
        .withColumn("quality", quality_score(text))
        .withColumn("pred_lang", predicted_lang(text))
        .withColumn("fingerprint", fingerprint(text))
    )
