"""PicoDet decode-tail kernel tests (kernels/layout.py) — NMS vs a
brute-force reference, containment-dedup label priority, caps, and the
query generator's closed form."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from paddleocr_spark.functions.layout import head_candidates
from paddleocr_spark.kernels.layout import (
    box_containment,
    box_iou,
    hard_nms,
    layout_postprocess,
)


def brute_nms(scored, thresh):
    """Reference semantics restated independently: repeatedly take the
    highest-scored remaining box (LAST index on ties — argsort-ascending
    walked from the end), discard all
    remaining with IoU > thresh against it."""
    rest = list(range(len(scored)))
    kept = []
    while rest:
        best = min(rest, key=lambda i: (-scored[i][1], -i))
        kept.append(scored[best])
        rest = [
            i
            for i in rest
            if i != best and box_iou(scored[i][0], scored[best][0]) <= thresh
        ]
    return kept


boxes = st.tuples(
    st.integers(0, 50), st.integers(0, 50), st.integers(1, 50), st.integers(1, 50)
).map(lambda t: (float(t[0]), float(t[1]), float(t[0] + t[2]), float(t[1] + t[3])))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(boxes, st.floats(0.01, 1.0)), max_size=12))
def test_hard_nms_matches_brute_force(scored):
    assert hard_nms(scored, 0.5) == brute_nms(scored, 0.5)


def test_nms_caps():
    rng = random.Random(7)
    scored = [
        ((x, 0.0, x + 10.0, 10.0), rng.random())
        for x in [i * 20.0 for i in range(30)]
    ]  # all disjoint: only the caps can drop any
    assert len(hard_nms(scored, 0.5, top_k=5)) == 5
    kept = hard_nms(scored, 0.5, candidate_size=8)
    assert len(kept) == 8
    floor = sorted(s for _, s in scored)[-8]
    assert all(s >= floor for _, s in kept)


def test_containment_small_box_inside_large():
    big = (0.0, 0.0, 100.0, 100.0)
    small = (40.0, 40.0, 50.0, 50.0)
    assert box_containment(big, small) == 1.0
    assert box_iou(big, small) < 0.02


def test_table_priority_beats_score():
    # text (0.9) fully inside table (0.5): table must win the group.
    out = layout_postprocess(
        [
            (0, 0.9, (10.0, 10.0, 50.0, 50.0)),
            (3, 0.5, (0.0, 0.0, 100.0, 100.0)),
        ]
    )
    assert [(lbl, s) for lbl, s, _ in out] == [("table", 0.5)]


def test_no_table_highest_score_wins():
    out = layout_postprocess(
        [
            (0, 0.6, (10.0, 10.0, 50.0, 50.0)),
            (4, 0.95, (12.0, 12.0, 48.0, 48.0)),
        ]
    )
    assert [(lbl, s) for lbl, s, _ in out] == [("figure", 0.95)]


def test_score_threshold_drops():
    out = layout_postprocess([(0, 0.39, (0.0, 0.0, 10.0, 10.0))])
    assert out == []


def test_generator_closed_form_exhaustive():
    def expected(doc_id):
        w = (doc_id % 5) * 0.01
        c = doc_id % 4
        if c == 0:
            return {(doc_id, "text", round(0.8 + w, 6), 10, 10, 110, 50)}
        if c == 1:
            return {
                (doc_id, "title", round(0.7, 6), 300, 20, 400, 40),
                (doc_id, "table", round(0.5 + w, 6), 20, 20, 220, 160),
            }
        if c == 2:
            return {
                (doc_id, "text", round(0.7 + w, 6), 10, 200, 110, 240),
                (doc_id, "figure", round(0.95, 6), 305, 205, 395, 235),
            }
        if doc_id % 8 == 3:
            return {(doc_id, "text", round(0.8, 6), 50, 50, 150, 90)}
        return {(doc_id, "text", round(0.7 + w, 6), 50, 54, 150, 94)}

    for d in range(200):
        got = {
            (d, lbl, round(s, 6), int(b[0]), int(b[1]), int(b[2]), int(b[3]))
            for lbl, s, b in layout_postprocess(head_candidates(d))
        }
        assert got == expected(d), d
