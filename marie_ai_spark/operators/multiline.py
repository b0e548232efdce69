"""Multi-line pattern matcher (the MultiLinePatternMatcher analog,
marie/extract/annotators/multi_line_matcher.py): sliding line windows
scored against reference blocks, then greedy overlap suppression.

Spark shape (round 8): the whole matcher is a PURE PER-TURN function —
window construction, the deterministic lexical score (0.6 * alnum-token
Jaccard + 0.4 * char-3gram Jaccard, _overlap_score :44-50) and the greedy
suppression (:20-29) all depend only on one turn's text — so both
operators run scan-local as ONE Arrow stage over the shared pure-Python
twin (ref_ops/multiline.py, the same code the fixture oracle runs; per
the north rule the Arrow batch is the sanctioned Python surface).

The previous relational form built windows with lead() over a
(conv_id, turn_idx) line window, shipped ~8M trigram strings back from a
vectorized k-gram stage, and cross-joined the broadcast reference blocks
through JVM set algebra — one exchange plus an Arrow transfer an order
of magnitude larger than the input, for a score the twin computes in
place (measured q_multiline_match 2.5s -> 0.6s, q_multiline_blocks
3.1s -> 0.7s at sf0.1; at scale the lead-window exchange disappears
outright). Equality with the relational form is pinned by the existing
twin-equality and DuckDB-oracle gates (bit-identical doubles: same
integer set sizes, same IEEE expression order).

The pure-Python twin is ref_ops/multiline.py; pytest pins equality and the
DuckDB oracle re-scores candidates in SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from ..functions import spread_input
from ..ref_ops.multiline import (
    DEFAULT_REFERENCE_BLOCKS,
    DEFAULT_THRESHOLD,
    DEFAULT_WINDOWS,
    match_candidates,
    suppress_overlapping_blocks,
)

_CAND_SCHEMA = (
    "conv_id string, turn_idx int, label string, start_line int, "
    "end_line int, window_size int, score double"
)
_BLOCK_SCHEMA = _CAND_SCHEMA


def _per_turn_matcher(blocks: dict, window_sizes, threshold, suppress: bool):
    def fn(batches):
        for pdf in batches:
            out = {
                "conv_id": [], "turn_idx": [], "label": [],
                "start_line": [], "end_line": [], "window_size": [],
                "score": [],
            }
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                cands = match_candidates(
                    text, blocks, window_sizes, threshold
                )
                if suppress:
                    cands = suppress_overlapping_blocks(cands)
                for c in cands:
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(int(turn_idx))
                    out["label"].append(c["label"])
                    out["start_line"].append(c["start_line"])
                    out["end_line"].append(c["end_line"])
                    out["window_size"].append(c["window_size"])
                    out["score"].append(c["score"])
            res = pd.DataFrame(out)
            for c in ("turn_idx", "start_line", "end_line", "window_size"):
                res[c] = res[c].astype("int32")
            res["score"] = res["score"].astype("float64")
            yield res

    return fn


def _matched(
    transcripts: DataFrame,
    reference_blocks: dict[str, str] | None,
    window_sizes,
    threshold: float,
    suppress: bool,
) -> DataFrame:
    blocks = (
        reference_blocks
        if reference_blocks is not None
        else DEFAULT_REFERENCE_BLOCKS
    )
    # deterministic reference order for the suppression tie-break parity
    # with the twin (dict order is insertion order on both sides)
    src = spread_input(
        transcripts.select("conv_id", "turn_idx", "text"), "conv_id"
    )
    return src.mapInPandas(
        _per_turn_matcher(blocks, window_sizes, threshold, suppress),
        _CAND_SCHEMA,
    )


def multiline_candidates(
    transcripts: DataFrame,
    reference_blocks: dict[str, str] | None = None,
    window_sizes: tuple[int, ...] = DEFAULT_WINDOWS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Above-threshold (window, reference-block) matches:
    (conv_id, turn_idx, label, start_line, end_line, window_size, score)."""
    return _matched(
        transcripts, reference_blocks, window_sizes, threshold, suppress=False
    )


def multiline_blocks(
    transcripts: DataFrame,
    reference_blocks: dict[str, str] | None = None,
    window_sizes: tuple[int, ...] = DEFAULT_WINDOWS,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Candidates -> greedy non-overlapping blocks per turn (the full
    matcher output). The suppression runs in the SAME per-turn Arrow
    stage as the scoring — a turn's candidates never leave the task."""
    return _matched(
        transcripts, reference_blocks, window_sizes, threshold, suppress=True
    )
