"""Multi-line pattern matcher (the MultiLinePatternMatcher analog,
marie/extract/annotators/multi_line_matcher.py): sliding line windows
scored against reference blocks, then greedy overlap suppression.

Spark shape:
  - windows are built with lead() over one (conv_id, turn_idx) line window
    — a single exchange, no self-join (reference builds them per page in
    Python, :415-425);
  - the score is the reference's deterministic lexical channel
    (_overlap_score :44-50): 0.6 * alnum-token Jaccard + 0.4 * char-3gram
    Jaccard, all JVM set algebra (regexp_extract_all / array_intersect /
    array_union). The model channels are replaced by deterministic
    heuristics per the SURVEY §8 north star; the embedding channel lives in
    operators/hybrid.py;
  - suppression (suppress_overlapping_blocks :20-29) is inherently a
    sequential greedy scan, but only over the handful of above-threshold
    candidates of ONE turn — applyInPandas on (conv_id, turn_idx) groups is
    bounded and skew-free.

The pure-Python twin is ref_ops/multiline.py; pytest pins equality and the
DuckDB oracle re-scores candidates in SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ref_ops.multiline import (
    DEFAULT_REFERENCE_BLOCKS,
    DEFAULT_THRESHOLD,
    DEFAULT_WINDOWS,
    alnum_tokens,
    char_ngrams,
    suppress_overlapping_blocks,
)


def multiline_candidates(
    transcripts: DataFrame,
    reference_blocks: dict[str, str] | None = None,
    window_sizes: tuple[int, ...] = DEFAULT_WINDOWS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Above-threshold (window, reference-block) matches:
    (conv_id, turn_idx, label, start_line, end_line, window_size, score)."""
    blocks = (
        reference_blocks if reference_blocks is not None else DEFAULT_REFERENCE_BLOCKS
    )
    spark = transcripts.sparkSession
    ref_rows = [
        (label, sorted(alnum_tokens(ref)), sorted(char_ngrams(ref)))
        for label, ref in sorted(blocks.items())
    ]
    ref_df = spark.createDataFrame(
        ref_rows,
        "label string, ref_toks array<string>, ref_grams array<string>",
    )

    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
    )
    sizes = sorted({w for w in window_sizes if w >= 1})
    wmax = max(sizes)
    wspec = Window.partitionBy("conv_id", "turn_idx").orderBy("line_no")
    leads = lines.select(
        "conv_id",
        "turn_idx",
        "line_no",
        "line",
        *[F.lead("line", k).over(wspec).alias(f"_l{k}") for k in range(1, wmax)],
    )
    win_structs = F.array(
        *[
            F.when(
                F.lit(True) if w == 1 else F.col(f"_l{w - 1}").isNotNull(),
                F.struct(
                    F.lit(w).alias("w"),
                    F.concat_ws(
                        "\n", F.col("line"), *[F.col(f"_l{k}") for k in range(1, w)]
                    ).alias("wtxt"),
                ),
            )
            for w in sizes
        ]
    )
    wins = (
        leads.select(
            "conv_id", "turn_idx", "line_no", F.explode(win_structs).alias("win")
        )
        .filter(F.col("win").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.col("line_no").alias("start_line"),
            (F.col("line_no") + F.col("win.w") - 1).cast("int").alias("end_line"),
            F.col("win.w").alias("window_size"),
            F.col("win.wtxt").alias("wtxt"),
        )
    )
    # two-step projections: lowered / ws-normalized text materialized BEFORE
    # the gram transform (projection collapse would re-run the regexp per
    # substring — the shingle trap, see functions.shingles_of_tokens)
    normed = wins.select(
        "*",
        F.lower("wtxt").alias("lowered"),
    ).select(
        "*",
        F.regexp_replace("lowered", r"\s+", " ").alias("norm"),
    )
    toks = F.array_distinct(
        F.regexp_extract_all("lowered", F.lit("[a-z0-9]+"), 0)
    )
    # char trigrams via the vectorized Arrow helper (functions.char_kgrams):
    # the JVM HOF substring walk is O(len^2) per window text
    from ..functions import char_kgrams

    grams = F.array_distinct(char_kgrams("norm", 3))
    featured = normed.select(
        "conv_id",
        "turn_idx",
        "start_line",
        "end_line",
        "window_size",
        toks.alias("toks"),
        grams.alias("grams"),
    )
    scored = featured.crossJoin(F.broadcast(ref_df))
    jt = F.size(F.array_intersect("toks", "ref_toks")) / F.greatest(
        F.lit(1), F.size(F.array_union("toks", "ref_toks"))
    )
    jc = F.when(
        (F.size("grams") > 0) & (F.size("ref_grams") > 0),
        F.size(F.array_intersect("grams", "ref_grams"))
        / F.greatest(F.lit(1), F.size(F.array_union("grams", "ref_grams"))),
    ).otherwise(F.lit(0.0))
    score = F.lit(0.6) * jt + F.lit(0.4) * jc
    return scored.select(
        "conv_id",
        "turn_idx",
        "label",
        F.col("start_line").cast("int").alias("start_line"),
        "end_line",
        F.col("window_size").cast("int").alias("window_size"),
        score.alias("score"),
    ).filter(F.col("score") >= threshold)


_BLOCK_SCHEMA = (
    "conv_id string, turn_idx int, label string, start_line int, "
    "end_line int, window_size int, score double"
)


def multiline_blocks(
    transcripts: DataFrame,
    reference_blocks: dict[str, str] | None = None,
    window_sizes: tuple[int, ...] = DEFAULT_WINDOWS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Candidates -> greedy non-overlapping blocks per turn (the full
    matcher output). Groups are single turns (a handful of candidates), so
    the pandas stage is bounded regardless of corpus size."""
    cands = multiline_candidates(
        transcripts, reference_blocks, window_sizes, threshold
    )

    def _suppress(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.to_dict("records")
        kept = suppress_overlapping_blocks(rows)
        return pd.DataFrame(kept, columns=pdf.columns) if kept else pdf.iloc[0:0]

    return cands.groupBy("conv_id", "turn_idx").applyInPandas(
        _suppress, _BLOCK_SCHEMA
    )
