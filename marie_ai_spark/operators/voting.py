"""Ensemble extraction voting — the Spark expression of the reference's
multi-engine OCR voting.

The reference's `best` mode runs several OCR engines over the same page,
groups candidates per word id, and picks by confidence (argmax) or by
majority with a confidence tie-break
(marie/ocr/voting_ocr_engine.py:125-255; policies marie/pipe/voting.py:8-60).

Here the "engines" are extraction variants (different rule sets /
heuristic thresholds) run over the same turns; the vote is per
(conv_id, turn_idx):

  union of per-variant outputs  (J4 co-group)
  -> groupBy key + argmax window (A3 confidence-vote / A4 majority)

Shuffle profile: one exchange on the vote key; the key space is the full
turn id space so no skew (unlike conv_id-level grouping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ref_ops import DEFAULT_RULES
from .extract import extract_transcripts


def ensemble_extract(
    transcripts: DataFrame, variants: dict[str, list] | None = None
) -> DataFrame:
    """Run extraction once per variant rule set; union with a `variant`
    discriminator column (the multi-engine union of J4)."""
    variants = variants or {"default": DEFAULT_RULES, "no_rules": []}
    out = None
    for name, rules in variants.items():
        ext = extract_transcripts(transcripts, rules).withColumn(
            "variant", F.lit(name)
        )
        out = ext if out is None else out.unionByName(ext)
    return out


def vote_best_extraction(ensemble: DataFrame) -> DataFrame:
    """Per turn, keep the variant whose output scores highest.

    Score = (n_lines, clean length) descending — the deterministic stand-in
    for OCR confidence; ties broken by variant name ascending so the result
    is total-ordered (A4's tie-break discipline).
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("n_lines"),
        F.desc(F.length("clean_text")),
        F.asc("variant"),
    )
    return (
        ensemble.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def vote_words(engines: dict[str, DataFrame]) -> DataFrame:
    """Word-level confidence vote across OCR-style engines — the reference's
    `best` mode: candidates grouped per (page, word id) across engines,
    winner by highest confidence, ties by engine name then text
    (marie/ocr/voting_ocr_engine.py:125-185).

    Each input frame carries (conv_id, turn_idx, page, word_id, word, conf);
    the union + one window is the J4 co-group -> A3 argmax shape.
    """
    tagged = None
    for name, df in engines.items():
        t = df.withColumn("engine", F.lit(name))
        tagged = t if tagged is None else tagged.unionByName(t)
    w = Window.partitionBy("conv_id", "turn_idx", "page", "word_id").orderBy(
        F.desc("conf"), F.asc("engine"), F.asc("word")
    )
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
