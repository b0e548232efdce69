"""Extraction-confidence evaluation: the deterministic analog of the
reference's FaithfulnessEvaluator (marie/evaluation/faithfulness.py:11-50),
which scores whether a response is supported by its contexts — passing is
false when the response carries the inference-failure marker, score is
1.0/0.0 (:48-62).

Relational re-expression over (source turn text, extracted clean_text):
  passing       the reference's marker check (clean_text free of
                'Inference failed')
  score         1.0 / 0.0 per the reference
  support_frac  the graded confidence the reference's doc-string promises
                ("supported by the contexts or hallucinated"): fraction of
                the extraction's DISTINCT tokens present in the source
                turn — a ratio of exact integers, so round(.,6) hashes
                identically on every engine.

All whole-stage-codegen array expressions (split/array_distinct/
array_intersect), one broadcast-free equi-join on the (conv_id, turn_idx)
key both sides already share — at 100 TB this is scan-speed work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FAIL_MARKER = "Inference failed"


def _distinct_tokens(col):
    return F.array_distinct(
        F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != "")
    )


def faithfulness_scores(
    transcripts: DataFrame, extracted: DataFrame
) -> DataFrame:
    """(conv_id, turn_idx, passing, score, n_resp_tokens, support_frac):
    per-turn faithfulness of the extracted clean_text against its source
    turn text (the context)."""
    src = transcripts.select(
        "conv_id", "turn_idx", _distinct_tokens("text").alias("ctx_toks")
    )
    resp = extracted.select(
        "conv_id",
        "turn_idx",
        F.col("clean_text"),
        _distinct_tokens("clean_text").alias("resp_toks"),
    )
    n_resp = F.size("resp_toks")
    n_hit = F.size(F.array_intersect("resp_toks", "ctx_toks"))
    passing = ~F.col("clean_text").contains(_FAIL_MARKER)
    return resp.join(src, ["conv_id", "turn_idx"]).select(
        "conv_id",
        "turn_idx",
        passing.alias("passing"),
        F.when(passing, 1.0).otherwise(0.0).alias("score"),
        n_resp.cast("bigint").alias("n_resp_tokens"),
        F.round(
            F.when(n_resp > 0, n_hit.cast("double") / n_resp).otherwise(0.0), 6
        ).alias("support_frac"),
    )
