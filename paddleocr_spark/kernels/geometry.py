"""Box geometry kernels: hull, min-area rect, ordering, filtering.

Replicates the semantics of the reference's detection-box plumbing:
- order_points_clockwise: tools/infer/predict_det.py:182-191
- clip + degenerate-box filter: tools/infer/predict_det.py:201-221
- sorted_boxes reading order (the tie-break-sensitive bubble pass):
  tools/infer/predict_system.py:160-182
All re-implemented from the documented behavior on pure numpy.
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points [N,2] float -> hull [M,2] CCW.

    The turn test runs on Python floats (same float64 ops as np.cross on
    2-vectors, ~40x less call overhead — this is the det-postprocess hot
    loop)."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    # consecutive-duplicate drop after lexsort replaces np.unique(axis=0)
    # (same dedup, no structured-view sort — this is the det hot loop)
    keep = np.empty(len(pts), dtype=bool)
    keep[0] = True
    np.any(pts[1:] != pts[:-1], axis=1, out=keep[1:])
    pts = pts[keep]
    if len(pts) <= 2:
        return pts
    coords = [(float(x), float(y)) for x, y in pts]

    def half(seq):
        out: list[tuple[float, float]] = []
        for px, py in seq:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                if (bx - ax) * (py - ay) - (by - ay) * (px - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(coords)
    upper = half(coords[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Rotating calipers min-area rectangle.

    Returns (corners [4,2] float64 unordered, shorter_side_length).
    """
    pts4 = np.asarray(points, dtype=np.float64)
    if len(pts4) == 4:
        # exact-rectangle fast path (the unclip output is always one):
        # opposite corners share midpoints and adjacent edges are
        # perpendicular -> the rect IS its own min-area rect
        d1 = pts4[0] + pts4[2] - pts4[1] - pts4[3]
        e1 = pts4[1] - pts4[0]
        e2 = pts4[3] - pts4[0]
        scale = max(np.hypot(*e1) * np.hypot(*e2), 1.0)
        if (
            abs(d1[0]) < 1e-7
            and abs(d1[1]) < 1e-7
            and abs(e1[0] * e2[0] + e1[1] * e2[1]) < 1e-7 * scale
        ):
            return pts4.copy(), float(min(np.hypot(*e1), np.hypot(*e2)))
    hull = convex_hull(points)
    if len(hull) == 1:
        c = hull[0]
        box = np.array([c, c, c, c])
        return box, 0.0
    if len(hull) == 2:
        a, b = hull
        box = np.array([a, b, b, a])
        return box, 0.0
    # All edge directions at once: projections are two [M,E] matmuls;
    # the reference-faithful first-strict-improvement scan stays scalar.
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    norms = np.sqrt((edges ** 2).sum(axis=1))
    keep = norms >= 1e-12
    us = edges[keep] / norms[keep, None]  # [E,2]
    vs = np.stack([-us[:, 1], us[:, 0]], axis=1)
    proj_u = hull @ us.T  # [M,E]
    proj_v = hull @ vs.T
    u_min, u_max = proj_u.min(axis=0), proj_u.max(axis=0)
    v_min, v_max = proj_v.min(axis=0), proj_v.max(axis=0)
    dus = u_max - u_min
    dvs = v_max - v_min
    areas = dus * dvs
    best_area = np.inf
    best_i = -1
    for i, area in enumerate(areas.tolist()):
        if area < best_area - 1e-12:
            best_area = area
            best_i = i
    u, v = us[best_i], vs[best_i]
    u0, v0, du, dv = u_min[best_i], v_min[best_i], dus[best_i], dvs[best_i]
    corners = np.array(
        [
            u * u0 + v * v0,
            u * (u0 + du) + v * v0,
            u * (u0 + du) + v * (v0 + dv),
            u * u0 + v * (v0 + dv),
        ]
    )
    return corners, float(min(du, dv))


def order_points_clockwise(box: np.ndarray) -> np.ndarray:
    """Canonical TL,TR,BR,BL via coordinate sum/diff argmin/argmax
    (reference tools/infer/predict_det.py:182-191 semantics)."""
    b = np.asarray(box, dtype=np.float64)
    s = b.sum(axis=1)
    d = np.diff(b, axis=1).ravel()  # y - x
    tl = b[np.argmin(s)]
    br = b[np.argmax(s)]
    tr = b[np.argmin(d)]
    bl = b[np.argmax(d)]
    return np.array([tl, tr, br, bl])


def clip_box(box: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.asarray(box, dtype=np.float64).copy()
    out[:, 0] = np.clip(out[:, 0], 0, w - 1)
    out[:, 1] = np.clip(out[:, 1], 0, h - 1)
    return out


def filter_det_boxes(boxes: np.ndarray, h: int, w: int):
    """Order clockwise, clip to image, drop boxes with a side <= 3px
    (reference filter_tag_det_res, tools/infer/predict_det.py:207-221).
    Returns (kept_boxes, kept_mask) — callers carrying parallel arrays
    (scores) must filter them with the same mask, never truncate."""
    kept = []
    mask = np.zeros(len(boxes), dtype=bool)
    for i, box in enumerate(boxes):
        b = clip_box(order_points_clockwise(box), h, w)
        rect_w = int(np.linalg.norm(b[0] - b[1]))
        rect_h = int(np.linalg.norm(b[0] - b[3]))
        if rect_w <= 3 or rect_h <= 3:
            continue
        kept.append(b)
        mask[i] = True
    if not kept:
        return np.zeros((0, 4, 2), dtype=np.float32), mask
    return np.array(kept, dtype=np.float32), mask


def sorted_boxes(dt_boxes: np.ndarray) -> list[np.ndarray]:
    """Reading order: sort by (y of TL, x of TL), then bubble-swap adjacent
    boxes whose y differs by <10px but whose x order is inverted — the
    exact line-clustering pass of the reference
    (tools/infer/predict_system.py:160-182). Byte-parity-critical."""
    num = len(dt_boxes)
    boxes = sorted(dt_boxes, key=lambda b: (b[0][1], b[0][0]))
    boxes = list(boxes)
    for i in range(num - 1):
        for j in range(i, -1, -1):
            if (
                abs(boxes[j + 1][0][1] - boxes[j][0][1]) < 10
                and boxes[j + 1][0][0] < boxes[j][0][0]
            ):
                boxes[j], boxes[j + 1] = boxes[j + 1], boxes[j]
            else:
                break
    return boxes
