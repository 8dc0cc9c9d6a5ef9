"""DB-style detection postprocess, pure numpy.

Behavioral spec from the reference's DBPostProcess
(ppocr/postprocess/db_postprocess.py:29-256): threshold the probability
map at `thresh`, extract connected regions (the reference uses
cv2.findContours; we use run-based connected-component labeling — same
regions for solid blobs), min-area rect per region, drop rects whose
shorter side < min_size, score = mean probability inside the region bbox
(box_score_fast, :189-204), drop score < box_thresh, unclip the rect by
delta = area * unclip_ratio / perimeter (the reference uses pyclipper;
for the rectangle quads produced by quad mode the uniform-offset result
is exactly the rect inflated by delta along its own axes), re-order, and
scale back to source-image coordinates. Candidates are capped at
max_candidates=1000 (:126).
"""

from __future__ import annotations

import numpy as np

from .geometry import clip_box, min_area_rect, order_points_clockwise


def connected_components(bitmap: np.ndarray) -> list[np.ndarray]:
    """Label a bool map via row-run union-find.

    Returns a list of per-component point arrays [K,2] (x, y) holding run
    endpoints — sufficient and exact for convex-hull/min-area-rect of
    solid components. Components are ordered by (min_y, min_x) for
    determinism.
    """
    h, w = bitmap.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # all runs in one pass: pad a False column on each side, flatten,
    # diff — row = index // (w+2); avoids per-row numpy call overhead
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = bitmap
    flat = padded.ravel()
    d = np.flatnonzero(flat[1:] != flat[:-1])
    ys = (d[0::2] // (w + 2)).tolist()
    xs0 = (d[0::2] % (w + 2)).tolist()
    xs1 = (d[1::2] % (w + 2)).tolist()
    runs: list[tuple[int, int, int]] = list(zip(ys, xs0, xs1))
    parent = list(range(len(runs)))
    prev_row: list[int] = []  # run ids in previous row
    prev_y = -2
    cur_row: list[int] = []
    for rid, (y, x0, x1) in enumerate(runs):
        if y != prev_y:
            prev_row = cur_row if y == prev_y + 1 else []
            cur_row = []
            prev_y = y
        cur_row.append(rid)
        for pid in prev_row:
            px0, px1 = runs[pid][1], runs[pid][2]
            if px0 < x1 and x0 < px1:  # 4-connectivity overlap
                union(pid, rid)
    groups: dict[int, list[int]] = {}
    for rid in range(len(runs)):
        groups.setdefault(find(rid), []).append(rid)
    comps = []
    for rids in groups.values():
        pts = []
        for rid in rids:
            y, x0, x1 = runs[rid]
            pts.append((x0, y))
            pts.append((x1 - 1, y))
        comps.append(np.array(pts, dtype=np.float64))
    comps.sort(key=lambda p: (p[:, 1].min(), p[:, 0].min()))
    return comps


def box_score_fast(prob: np.ndarray, box: np.ndarray) -> float:
    """Mean probability inside the box's axis-aligned bbox (the reference's
    fast path, db_postprocess.py:189-204)."""
    h, w = prob.shape
    xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
    region = prob[ymin : ymax + 1, xmin : xmax + 1]
    return float(region.mean()) if region.size else 0.0


def unclip_rect(box: np.ndarray, unclip_ratio: float) -> np.ndarray:
    """Uniform offset of a rectangle by delta = area*ratio/perimeter along
    its own axes (pyclipper-equivalent for convex rects)."""
    b = np.asarray(box, dtype=np.float64)
    e1 = b[1] - b[0]
    e2 = b[3] - b[0]
    w = np.linalg.norm(e1)
    h = np.linalg.norm(e2)
    if w < 1e-9 or h < 1e-9:
        return b
    area = w * h
    perimeter = 2 * (w + h)
    delta = area * unclip_ratio / perimeter
    u = e1 / w
    v = e2 / h
    off = u * delta + v * delta
    return np.array(
        [b[0] - off, b[1] + u * delta - v * delta, b[2] + off, b[3] - u * delta + v * delta]
    )


def db_postprocess(
    prob: np.ndarray,
    src_h: int,
    src_w: int,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    max_candidates: int = 1000,
    unclip_ratio: float = 1.5,
    min_size: int = 3,
) -> tuple[np.ndarray, list[float]]:
    """prob [h,w] in [0,1] at det scale -> (boxes [N,4,2] float32 in source
    coords, scores). Defaults mirror tools/infer/utility.py:66-70."""
    map_h, map_w = prob.shape
    bitmap = prob > thresh
    comps = connected_components(bitmap)[:max_candidates]
    boxes, scores = [], []
    for pts in comps:
        rect, sside = min_area_rect(pts)
        if sside < min_size:
            continue
        score = box_score_fast(prob, rect)
        if score < box_thresh:
            continue
        rect = unclip_rect(order_points_clockwise(rect), unclip_ratio)
        rect, sside = min_area_rect(rect)
        if sside < min_size + 2:
            continue
        rect = order_points_clockwise(rect)
        rect[:, 0] = np.clip(np.round(rect[:, 0] / map_w * src_w), 0, src_w)
        rect[:, 1] = np.clip(np.round(rect[:, 1] / map_h * src_h), 0, src_h)
        boxes.append(rect)
        scores.append(score)
    if not boxes:
        return np.zeros((0, 4, 2), dtype=np.float32), []
    return np.array(boxes, dtype=np.float32), scores


__all__ = [
    "connected_components",
    "box_score_fast",
    "unclip_rect",
    "db_postprocess",
]
