"""Layout-detection postprocess: the reference's PicoDet decode tail
re-expressed from scratch (ppocr/postprocess/picodet_postprocess.py:
hard_nms:19-48, iou_of:51-66, calculate_containment:81-96, the __call__
per-class threshold+NMS loop at 219-233 and the cross-label containment
dedup with table priority at 272-296; driven by
ppstructure/layout/predict_layout.py).

The net itself is a model stand-in (same policy as kernels/det.py /
kernels/rec.py — SURVEY §7.1 item 3): candidate class-scored boxes come
from a deterministic generator; everything downstream of the raw head
output — score threshold, per-class greedy NMS with candidate cap and
keep_top_k, and the containment-overlap label-conflict resolution — is
the real operator and is what a swapped-in ONNX head would feed.

Boxes are (x0, y0, x1, y1) floats, corner form, like the reference's
post-warp output. All scalar-float math (no numpy): candidate counts per
page are tens, and tiny-array numpy overhead dominates at that size
(measured on the det kernels — see kernels/geometry.py).
"""

from __future__ import annotations

# Class order = layout dict order (reference loads it from
# layout_dict_path; publaynet order is text/title/list/table/figure).
LAYOUT_LABELS = ("text", "title", "list", "table", "figure")

SCORE_THRESHOLD = 0.4
NMS_THRESHOLD = 0.5
CANDIDATE_SIZE = 200
KEEP_TOP_K = 100
CONTAINMENT_THRESHOLD = 0.5


def box_area(b) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def box_iou(a, b, eps: float = 1e-5) -> float:
    """Corner-form IoU (picodet_postprocess.iou_of semantics, including
    the eps in the denominator)."""
    ix = min(a[2], b[2]) - max(a[0], b[0])
    iy = min(a[3], b[3]) - max(a[1], b[1])
    if ix <= 0.0 or iy <= 0.0:
        return 0.0
    inter = ix * iy
    return inter / (box_area(a) + box_area(b) - inter + eps)


def box_containment(a, b) -> float:
    """Intersection over the SMALLER area (calculate_containment):
    a box fully inside another scores 1.0 regardless of size ratio."""
    ix = min(a[2], b[2]) - max(a[0], b[0])
    iy = min(a[3], b[3]) - max(a[1], b[1])
    if ix <= 0.0 or iy <= 0.0:
        return 0.0
    small = min(box_area(a), box_area(b))
    return (ix * iy) / small if small > 0 else 0.0


def hard_nms(
    scored_boxes,
    iou_threshold: float = NMS_THRESHOLD,
    top_k: int = -1,
    candidate_size: int = CANDIDATE_SIZE,
):
    """Greedy descending-score NMS over [(box, score), ...]; keeps a box
    iff its IoU with every previously kept box is <= iou_threshold.
    Mirrors hard_nms: only the `candidate_size` highest-scored boxes are
    considered at all, and at most `top_k` (if > 0) are kept. Ties pick
    the LATER candidate first (stable ascending argsort consumed from
    the end, as the reference does)."""
    order = sorted(
        range(len(scored_boxes)), key=lambda i: scored_boxes[i][1]
    )[-candidate_size:][::-1]
    kept = []
    for i in order:
        box = scored_boxes[i][0]
        if all(
            box_iou(box, scored_boxes[j][0]) <= iou_threshold for j in kept
        ):
            kept.append(i)
            if 0 < top_k == len(kept):
                break
    return [scored_boxes[i] for i in kept]


def layout_postprocess(
    candidates,
    labels=LAYOUT_LABELS,
    score_threshold: float = SCORE_THRESHOLD,
    nms_threshold: float = NMS_THRESHOLD,
    keep_top_k: int = KEEP_TOP_K,
):
    """Full decode tail over raw head candidates
    [(class_index, score, (x0, y0, x1, y1)), ...]:

    1. per class (ascending index): drop score <= threshold, greedy NMS
       (picodet_postprocess.__call__:219-233) — result order is class
       asc, then NMS pick order (score desc) within class, exactly the
       order the containment pass then iterates;
    2. containment-overlap label-conflict resolution
       (picodet_postprocess.__call__:272-296): for each surviving box in
       order, the set of boxes whose mutual containment exceeds 0.5
       keeps only a 'table'-labeled member if any (highest score among
       tables), else the highest-scored member. Faithful quirk kept: a
       box already marked duplicate still participates in (and can win)
       a later box's overlap group.

    Returns [(label, score, (x0, y0, x1, y1)), ...] of survivors, in
    post-NMS order.
    """
    results = []
    for ci in range(len(labels)):
        cls = [(b, s) for c, s, b in candidates if c == ci and s > score_threshold]
        for box, score in hard_nms(cls, nms_threshold, top_k=keep_top_k):
            results.append((labels[ci], score, box))

    dup = set()
    for i, (_, _, bi) in enumerate(results):
        if i in dup:
            continue
        group = [
            j
            for j, (_, _, bj) in enumerate(results)
            if box_containment(bj, bi) > CONTAINMENT_THRESHOLD
        ]
        if len(group) <= 1:
            continue
        tables = [j for j in group if results[j][0] == "table"]
        pool = tables if tables else group
        keep = max(pool, key=lambda j: (results[j][1], -j))
        dup.update(j for j in group if j != keep)
    return [r for i, r in enumerate(results) if i not in dup]
