"""T3/T4 box merges: handcrafted semantics plus the Spark per-page path."""

from marie_ai_spark.ref_ops.boxes import (
    compute_iou,
    merge_boxes,
    merge_boxes_by_iou,
)


def test_iou_greedy_absorb_and_expand():
    # box2 overlaps box1 (absorbed, expanding it); box3 overlaps only the
    # EXPANDED box1 -> also absorbed (the reference's mutate-in-place greedy)
    boxes = [[0, 0, 10, 10], [8, 0, 18, 10], [16, 0, 26, 10], [100, 100, 110, 110]]
    out = merge_boxes_by_iou(boxes, iou_threshold=0.05)
    assert out == [[0, 0, 26, 10], [100, 100, 110, 110]]


def test_iou_below_threshold_not_merged():
    boxes = [[0, 0, 10, 10], [9, 9, 19, 19]]  # tiny corner overlap
    assert compute_iou(*boxes) < 0.05
    assert merge_boxes_by_iou(boxes) == boxes


def test_horizontal_merge_same_line_only():
    # a and b overlap in x and share a center-y band -> one block;
    # c overlaps a in x but sits on another line -> kept separate
    a, b, c = [0, 0, 12, 10], [10, 1, 22, 11], [0, 40, 12, 50]
    out = merge_boxes([a, b, c])
    assert [0, 0, 22, 11] in out and c in out and len(out) == 2


def test_horizontal_merge_fixpoint_rounds():
    # chain of three: a-b merge in round 1 creates a block overlapping c,
    # which merges in round 2 (the reference's max-3-rounds loop)
    a, b, c = [0, 0, 12, 10], [10, 0, 22, 10], [21, 0, 33, 10]
    out = merge_boxes([a, b, c])
    assert out == [[0, 0, 33, 10]]


def test_spark_matches_twin(spark):
    import json

    from marie_ai_spark.operators.boxes import (
        merge_word_boxes_horizontal,
        merge_word_boxes_iou,
    )
    from marie_ai_spark.operators.layout import parse_words
    from marie_ai_spark.sources.transcripts import gen_pandas

    corpus = gen_pandas(60, seed=42)
    sdf = spark.createDataFrame(corpus)
    words = parse_words(sdf)
    got_h = {}
    for r in merge_word_boxes_horizontal(words, inflate_x=24).collect():
        got_h.setdefault((r.conv_id, r.turn_idx, r.page), []).append(
            (r.block_idx, r.x1, r.y1, r.x2, r.y2)
        )
    want_h = {}
    for row in corpus.itertuples():
        t = (row.text or "").lstrip()
        if not (t.startswith("{") and '"pages"' in t[:256]):
            continue
        doc = json.loads(row.text)
        for pg in doc["pages"]:
            ws = sorted(pg["words"], key=lambda w: w["id"])
            boxes = [
                [w["box"][0], w["box"][1], w["box"][0] + w["box"][2] + 24,
                 w["box"][1] + w["box"][3]]
                for w in ws
            ]
            want_h[(row.conv_id, row.turn_idx, pg["page"])] = [
                (i, b[0], b[1], b[2], b[3])
                for i, b in enumerate(merge_boxes(boxes))
            ]
    for k in got_h:
        got_h[k].sort()
    assert got_h == want_h and len(want_h) > 5
