"""Box-merge semantics (T3/T4): pure-Python re-expressions of the
reference's geometry merges (marie/utils/overlap.py), shared by the Spark
per-page operators and the fixture oracles.

Both algorithms are inherently SEQUENTIAL (greedy, order-dependent), so the
Spark operators run them per (conv, turn, page) group — bounded word counts
— rather than forcing a relational contortion:

  merge_boxes_by_iou   greedy absorb-into-first-overlapping-merged-box,
                       expanding the absorber (overlap.py:288-319)
  merge_boxes          iterative rounds (max 3): each unvisited box claims
                       every box with horizontal x-overlap whose center-y
                       lies within +/- center_y_overlap * h of its own
                       center; groups union into blocks; stop at fixpoint
                       (overlap.py:321-384, find_overlap_horizontal
                       :156-233, merge_bboxes_as_block :236-254)
"""

from __future__ import annotations


def compute_iou(box1, box2) -> float:
    """IoU of two XYXY boxes (overlap.py:257-285)."""
    x1, y1, x2, y2 = box1
    x3, y3, x4, y4 = box2
    x_overlap = max(0, min(x2, x4) - max(x1, x3))
    y_overlap = max(0, min(y2, y4) - max(y1, y3))
    intersection = x_overlap * y_overlap
    area1 = (x2 - x1) * (y2 - y1)
    area2 = (x4 - x3) * (y4 - y3)
    union = area1 + area2 - intersection
    return intersection / union if union != 0 else 0


def merge_boxes_by_iou(bboxes, iou_threshold: float = 0.05):
    """Greedy IoU merge over XYXY boxes in input order (overlap.py:288-319;
    note the reference pins the threshold to 0.05 internally)."""
    merged = []
    for box in bboxes:
        box = list(box)
        absorbed = False
        for mb in merged:
            if compute_iou(box, mb) > iou_threshold:
                mb[0] = min(box[0], mb[0])
                mb[1] = min(box[1], mb[1])
                mb[2] = max(box[2], mb[2])
                mb[3] = max(box[3], mb[3])
                absorbed = True
                break
        if not absorbed:
            merged.append(box)
    return merged


def _find_overlap_horizontal(box, bboxes, center_y_overlap=0.5):
    """Indexes of boxes (XYWH) with x-interval overlap against `box` whose
    center-y sits in the +/- band; identical boxes are skipped
    (overlap.py:156-233)."""
    x, y, w, h = box
    center_start = (y + h // 2) - (h * center_y_overlap)
    center_end = (y + h // 2) + (h * center_y_overlap)
    indexes = []
    for i, bb in enumerate(bboxes):
        _x, _y, _w, _h = bb
        if box[0] == bb[0] and box[1] == bb[1] and box[2] == bb[2] and box[3] == bb[3]:
            continue
        if x < _x + _w and _x < x + w:
            if _y + _h // 2 < center_start or _y + _h // 2 > center_end:
                continue
            indexes.append(i)
    return indexes


def _merge_bboxes_as_block(bboxes):
    """Union of XYWH boxes as one XYWH block (overlap.py:236-254)."""
    min_x = min(b[0] for b in bboxes)
    min_y = min(b[1] for b in bboxes)
    max_h = max(b[1] + b[3] for b in bboxes) - min_y
    max_w = max(b[0] + b[2] for b in bboxes) - min_x
    return [round(k, 6) for k in (min_x, min_y, max_w, max_h)]


def merge_boxes(bboxes_xyxy, center_y_overlap: float = 0.5):
    """Horizontal merge of XYXY boxes (overlap.py:321-384): up to 3 rounds
    of claim-and-union until the box count stops shrinking."""
    bboxes = [
        [b[0], b[1], b[2] - b[0], b[3] - b[1]] for b in bboxes_xyxy
    ]
    last_size = len(bboxes)
    rounds = 3
    while rounds > 0:
        visited = [False] * len(bboxes)
        groups = {}
        for idx in range(len(bboxes)):
            if visited[idx]:
                continue
            visited[idx] = True
            box = bboxes[idx]
            overlap_idx = _find_overlap_horizontal(
                box, bboxes, center_y_overlap
            )
            groups[idx] = [idx]
            for oi in overlap_idx:
                visited[oi] = True
                groups[idx].append(oi)
        if len(groups) == len(bboxes):
            break
        bboxes = [
            _merge_bboxes_as_block([bboxes[i] for i in idxs])
            for idxs in groups.values()
        ]
        if last_size == len(bboxes):
            break
        rounds -= 1
        last_size = len(bboxes)
    return [[b[0], b[1], b[0] + b[2], b[1] + b[3]] for b in bboxes]
