"""T3/T4 box merges as per-page Spark operators.

The reference algorithms (marie/utils/overlap.py:288-384) are greedy and
order-dependent, so they run through the shared ref_ops twin inside ONE
Arrow map stage that walks contiguous (conv_id, turn_idx, page) groups —
bounded word counts per page, high-cardinality partitioning key, no
skew. Input order within a page is pinned to word_id so the distributed
result is deterministic.
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
    no-op on clean OCR output).

    Execution (guide §4): repartition on the page key + sort-within-
    partitions + ONE mapInPandas that walks the contiguous page groups
    inside each Arrow batch. groupBy().applyInPandas invokes the Python
    function — and builds a pandas frame — once per GROUP; page groups
    are tiny (tens of words), so per-group overhead dwarfed the merge
    math (measured ~2s of a 3.2s query at sf0.1 across ~500 pages). The
    shuffle is the same page-key exchange either way; a group that
    straddles two Arrow batches is carried over, so results are
    identical for any batch size."""
    cols = ["conv_id", "turn_idx", "page", "word_id", "x", "y", "wd", "ht"]
    w = (
        words.select(*cols)
        .repartition("conv_id", "turn_idx", "page")
        .sortWithinPartitions("conv_id", "turn_idx", "page", "word_id")
    )

    def flush(pdf: pd.DataFrame) -> pd.DataFrame:
        out: dict = {k: [] for k in (
            "conv_id", "turn_idx", "page", "block_idx",
            "x1", "y1", "x2", "y2",
        )}
        for (c, t, p), g in pdf.groupby(
            ["conv_id", "turn_idx", "page"], sort=False
        ):
            boxes = [
                [int(x), int(y), int(x + wd + inflate_x), int(y + ht)]
                for x, y, wd, ht in zip(g.x, g.y, g.wd, g.ht)
            ]
            blocks = fn(boxes)
            n = len(blocks)
            out["conv_id"].extend([c] * n)
            out["turn_idx"].extend([int(t)] * n)
            out["page"].extend([int(p)] * n)
            out["block_idx"].extend(range(n))
            out["x1"].extend(int(b[0]) for b in blocks)
            out["y1"].extend(int(b[1]) for b in blocks)
            out["x2"].extend(int(b[2]) for b in blocks)
            out["y2"].extend(int(b[3]) for b in blocks)
        res = pd.DataFrame(out)
        for c in ("turn_idx", "page", "block_idx", "x1", "y1", "x2", "y2"):
            res[c] = res[c].astype("int32")
        return res

    def apply_batches(batches):
        pend = None
        for pdf in batches:
            if pend is not None and len(pend):
                pdf = pd.concat([pend, pdf], ignore_index=True)
            if not len(pdf):
                pend = None
                continue
            # hold back the trailing group — it may continue in the next
            # batch of this partition (groups are contiguous after the
            # within-partition sort)
            lc = pdf["conv_id"].iat[-1]
            lt = pdf["turn_idx"].iat[-1]
            lp = pdf["page"].iat[-1]
            tail = 0
            for i in range(len(pdf) - 1, -1, -1):
                if (
                    pdf["conv_id"].iat[i] == lc
                    and pdf["turn_idx"].iat[i] == lt
                    and pdf["page"].iat[i] == lp
                ):
                    tail += 1
                else:
                    break
            body = pdf.iloc[: len(pdf) - tail]
            pend = pdf.iloc[len(pdf) - tail:]
            if len(body):
                yield flush(body)
        if pend is not None and len(pend):
            yield flush(pend)

    return w.mapInPandas(apply_batches, _BLOCK_SCHEMA)


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
