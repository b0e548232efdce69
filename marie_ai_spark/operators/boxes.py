"""T3/T4 box merges as per-page Spark operators.

The reference algorithms (marie/utils/overlap.py:288-384) are greedy and
order-dependent, so they run through the shared ref_ops twin inside
applyInPandas over (conv_id, turn_idx, page) groups — bounded word counts
per page, high-cardinality grouping key, no skew. Input order within a
page is pinned to word_id so the distributed result is deterministic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from ..ref_ops.boxes import merge_boxes, merge_boxes_by_iou

_BLOCK_SCHEMA = (
    "conv_id string, turn_idx int, page int, block_idx int, "
    "x1 int, y1 int, x2 int, y2 int"
)


def _per_page(words: DataFrame, fn, inflate_x: int = 0) -> DataFrame:
    """`inflate_x` widens each box before merging (the standard dilation
    step that lets gap-separated words on a line chain into blocks — word
    boxes never physically overlap, so merging without dilation is a
    no-op on clean OCR output)."""

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("word_id")
        boxes = [
            [int(x), int(y), int(x + w + inflate_x), int(y + h)]
            for x, y, w, h in zip(pdf.x, pdf.y, pdf.wd, pdf.ht)
        ]
        blocks = fn(boxes)
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                "conv_id": head.conv_id,
                "turn_idx": head.turn_idx,
                "page": head.page,
                "block_idx": range(len(blocks)),
                "x1": [int(b[0]) for b in blocks],
                "y1": [int(b[1]) for b in blocks],
                "x2": [int(b[2]) for b in blocks],
                "y2": [int(b[3]) for b in blocks],
            }
        )

    return words.groupBy("conv_id", "turn_idx", "page").applyInPandas(
        apply, _BLOCK_SCHEMA
    )


def merge_word_boxes_iou(
    words: DataFrame, iou_threshold: float = 0.05, inflate_x: int = 0
) -> DataFrame:
    """T4 merge-by-IoU over parse_words output (overlap.py:288-319)."""
    return _per_page(
        words, lambda b: merge_boxes_by_iou(b, iou_threshold), inflate_x
    )


def merge_word_boxes_horizontal(
    words: DataFrame, center_y_overlap: float = 0.5, inflate_x: int = 0
) -> DataFrame:
    """T3 horizontal merge over parse_words output (overlap.py:321-384)."""
    return _per_page(
        words, lambda b: merge_boxes(b, center_y_overlap), inflate_x
    )
