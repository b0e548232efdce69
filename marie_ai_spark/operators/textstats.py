"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, fingerprinting, language profiling.

All pure JVM-side column expressions (whole-stage codegen, no Python) — at
100 TB these run at scan speed with full predicate pushdown. Semantics
mirror the reference's text handling where one exists (stringify/strip:
marie/ocr/util.py:92-95; content checksum: marie/utils/image_utils.py:136-149)
and standard web-scale quality heuristics otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stable_fingerprint, token_count, tokens

STOPWORDS = ("the", "a")


def with_token_count(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features, rounded
    to fixed decimals so engine and oracle hash identically."""
    toks = tokens("text")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, total_tok_chars.cast("double") / n_tok).otherwise(0.0),
            4,
        ).alias("mean_token_len"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", stable_fingerprint("text").alias("fingerprint")
    )


def language_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus rollup (count + mean doc length)."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        )
    )
