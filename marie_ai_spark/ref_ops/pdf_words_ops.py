"""PDF/layout parsing: word boxes -> lines -> reading-order text.

Re-implements, deterministically and Spark-shareably, the reference's
geometry pipeline:

  - vertical-overlap (IoU) kernel      marie/utils/overlap.py:98-153
  - line merge cascade over thresholds [0.8 .. 0.35] with fixpoint stop
                                       marie/boxes/line_processor.py:49-178
  - word->line assignment by max vertical overlap (argmax IoU)
                                       marie/boxes/line_processor.py:15-46
  - line assembly: text = " ".join(words in reading order), bbox union,
    confidence = round(avg, 4), 1-based line numbers
                                       marie/document/ocr_processor.py:210-247
  - reading order = lexsort by (line, x)
                                       marie/boxes/dit/ulim_dit_box_processor.py:800-815
  - reassembly: lines sorted by line id joined with \\n, pages joined with \\f,
    blank-run collapse               marie/renderer/text_renderer.py:158,
                                       marie/ocr/util.py:47-103

Determinism discipline (SURVEY.md §7.3 risk #2): every sort uses the total
order (y, x, w, h, id) so ties cannot reorder across runs or partitions.
"""

from __future__ import annotations

import json

from .textutil import collapse_blank

# cascade thresholds, mirror of line_processor.py:128-141
IOU_CASCADE = (0.8, 0.7, 0.6, 0.5, 0.4, 0.37, 0.35)


def vertical_iou(a, b) -> float:
    """Overlap of the y-intervals of boxes a, b ([x,y,w,h]) relative to the
    smaller interval — the reference's vertical overlap ratio."""
    ay0, ay1 = a[1], a[1] + a[3]
    by0, by1 = b[1], b[1] + b[3]
    inter = min(ay1, by1) - max(ay0, by0)
    if inter <= 0:
        return 0.0
    return inter / max(1e-9, min(ay1 - ay0, by1 - by0))


def merge_bbox(a, b):
    """bbox union in XYWH — merge_bboxes_as_block (marie/utils/overlap.py:236-254)."""
    x0 = min(a[0], b[0])
    y0 = min(a[1], b[1])
    x1 = max(a[0] + a[2], b[0] + b[2])
    y1 = max(a[1] + a[3], b[1] + b[3])
    return [x0, y0, x1 - x0, y1 - y0]


def merge_lines(words: list[dict]) -> list[dict]:
    """Cluster word boxes into lines.

    Greedy y-sorted interval clustering run as a threshold cascade with a
    fixpoint stop, reproducing the `line_merge` semantics
    (marie/boxes/line_processor.py:103-178) without OpenCV.

    Input words: {id, text, box:[x,y,w,h], conf}. Returns lines sorted by y:
    {line:int 1-based, bbox, words:[word...x-sorted], text, confidence, wordids}.
    """
    if not words:
        return []
    # each word starts as its own cluster; total order for determinism
    clusters = [
        {"bbox": list(w["box"]), "words": [w]}
        for w in sorted(words, key=lambda w: (w["box"][1], w["box"][0],
                                              w["box"][2], w["box"][3], w["id"]))
    ]
    for thr in IOU_CASCADE:
        # the reference stops after two consecutive no-change passes
        # (:128-141); our pass is a deterministic function of the cluster
        # list, so a second verification pass over unchanged clusters is
        # provably identical — exit on the first no-change pass instead
        # (same fixpoint, ~2.5x fewer scans)
        changed = True
        max_viou = 0.0
        while changed:
            changed = False
            max_viou = 0.0
            clusters.sort(key=lambda c: (c["bbox"][1], c["bbox"][0]))
            out = []
            for c in clusters:
                if out:
                    v = vertical_iou(out[-1]["bbox"], c["bbox"])
                    if v >= thr:
                        out[-1]["bbox"] = merge_bbox(out[-1]["bbox"], c["bbox"])
                        out[-1]["words"].extend(c["words"])
                        changed = True
                        continue
                    if v > max_viou:
                        max_viou = v
                out.append(c)
            clusters = out
        # no remaining (lower) threshold can merge if every neighbor
        # overlap is below the cascade floor — output-equivalent early exit
        if max_viou < IOU_CASCADE[-1]:
            break

    # contained-cluster removal is a no-op here (clusters are disjoint in y
    # after the cascade); keep the y-sort and assign 1-based line ids
    clusters.sort(key=lambda c: (c["bbox"][1], c["bbox"][0]))
    lines = []
    for li, c in enumerate(clusters, start=1):  # 1-based, ocr_processor.py:242
        ws = sorted(c["words"], key=lambda w: (w["box"][0], w["box"][1], w["id"]))
        text = " ".join(w["text"] for w in ws)
        conf = round(sum(w.get("conf", 0.0) for w in ws) / len(ws), 4)
        lines.append(
            {
                "line": li,
                "bbox": c["bbox"],
                "words": ws,
                "text": text,
                "confidence": conf,
                "wordids": [w["id"] for w in ws],
            }
        )
    return lines


def page_to_text(lines: list[dict]) -> str:
    """meta_to_text semantics: sort by line id, strip, join with \\n
    (marie/ocr/util.py:47-103)."""
    return "\n".join(
        ln["text"].strip() for ln in sorted(lines, key=lambda l: l["line"])
    )


def _valid_word(w) -> bool:
    """Drop malformed word records — the analog of the reference's region
    bounds validation (marie/ocr/ocr_engine.py:278-294: invalid regions
    produce empty results instead of errors)."""
    if not isinstance(w, dict) or "id" not in w:
        return False
    box = w.get("box")
    return (
        isinstance(box, (list, tuple))
        and len(box) == 4
        and all(isinstance(v, (int, float)) for v in box)
        and isinstance(w.get("text", ""), str)
    )


def parse_pdf_payload(text: str) -> list[dict]:
    """Parse the serialized word-box payload: {"pages":[{page,width,height,words}]}.
    Malformed pages/words are dropped, never raised."""
    try:
        obj = json.loads(text)
    except (ValueError, TypeError):
        return []
    pages = obj.get("pages", []) if isinstance(obj, dict) else []
    out = []
    for p in pages if isinstance(pages, list) else []:
        if not isinstance(p, dict):
            continue
        words = p.get("words", [])
        p = dict(p)
        p["words"] = [
            {**w, "text": w.get("text", ""), "conf": w.get("conf", 0.0)}
            for w in (words if isinstance(words, list) else [])
            if _valid_word(w)
        ]
        out.append(p)
    return out


def extract_pdf_words(text: str, mode: str = "compact"):
    """Full path: parse -> per-page line merge -> reassembly.

    mode='compact': meta_to_text semantics — stripped lines, \\n join, \\f
    between pages, blank-run collapse (marie/ocr/util.py:47-103).
    mode='grid': the TextRenderer fixed-grid sink — words placed at
    char-cell columns, baseline-delta blank lines, no collapse
    (marie/renderer/text_renderer.py:28-143; see grid_renderer.py).
    """
    pages = parse_pdf_payload(text)
    if not pages:
        return "", [], 0
    page_texts = []
    n_lines = 0
    for p in sorted(pages, key=lambda p: p.get("page", 0)):
        lines = merge_lines(p.get("words", []))
        n_lines += len(lines)
        if mode == "grid":
            from .grid_renderer import render_grid_page

            page_texts.append(render_grid_page(lines, p.get("width", 2550)))
        else:
            page_texts.append(page_to_text(lines))
    joined = "\f".join(page_texts)
    clean = joined if mode == "grid" else collapse_blank(joined)
    spans = [(0, len(text), "line", "keep")] if clean else []
    return clean, spans, n_lines
