"""Large-image tiling: slice -> detect per tile -> offset -> merge
fragments to fixpoint.

Behavioral spec from the reference (tools/infer/utility.py:932-1027
slice_generator + merge_fragmented, used by predict_system.py:86-107 for
poster-sized pages): generate overlapping horizontal/vertical tiles
(capped slice count), run detection per tile, translate boxes into page
coordinates, then iteratively merge box fragments that the tile cuts
produced — boxes whose rects overlap or sit within a small gap of each
other on the same text line — until no merge fires.

Axis-aligned rect merging is exact for this engine's upright-rect boxes;
the reference's x/y threshold semantics are kept (merge when vertical
ranges intersect and horizontal gap < merge_x_thres).
"""

from __future__ import annotations

import numpy as np


def slice_generator(
    h: int, w: int, tile: int = 1000, overlap: int = 200, max_slices: int = 500
):
    """Yield (y0, x0, y1, x1) tile windows covering [0,h)x[0,w) with
    `overlap` px of shared border; stride = tile - overlap."""
    stride = max(tile - overlap, 1)
    ys = list(range(0, max(h - overlap, 1), stride))
    xs = list(range(0, max(w - overlap, 1), stride))
    count = 0
    for y0 in ys:
        for x0 in xs:
            if count >= max_slices:
                return
            yield y0, x0, min(y0 + tile, h), min(x0 + tile, w)
            count += 1


def _rect(box: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(box[:, 0].min()),
        float(box[:, 1].min()),
        float(box[:, 0].max()),
        float(box[:, 1].max()),
    )


def merge_fragmented(
    boxes: list[np.ndarray], x_gap: float = 20.0, y_overlap: float = 0.5
) -> list[np.ndarray]:
    """Fixpoint merge of quad fragments: two boxes fuse when their
    vertical ranges overlap by >= y_overlap of the smaller height and the
    horizontal gap (or overlap) between them is < x_gap. Returns upright
    rect quads (TL,TR,BR,BL)."""
    rects = [_rect(b) for b in boxes]
    changed = True
    while changed:
        changed = False
        out: list[tuple[float, float, float, float]] = []
        used = [False] * len(rects)
        for i in range(len(rects)):
            if used[i]:
                continue
            x0, y0, x1, y1 = rects[i]
            for j in range(i + 1, len(rects)):
                if used[j]:
                    continue
                a0, b0, a1, b1 = rects[j]
                ov = min(y1, b1) - max(y0, b0)
                min_h = min(y1 - y0, b1 - b0)
                if min_h <= 0 or ov < y_overlap * min_h:
                    continue
                gap = max(x0, a0) - min(x1, a1)
                if gap >= x_gap:
                    continue
                x0, y0 = min(x0, a0), min(y0, b0)
                x1, y1 = max(x1, a1), max(y1, b1)
                used[j] = True
                changed = True
            out.append((x0, y0, x1, y1))
        rects = out
    return [
        np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float32
        )
        for x0, y0, x1, y1 in rects
    ]


def slice_detect(
    img: np.ndarray,
    det_model=None,
    tile: int = 1000,
    overlap: int = 200,
) -> np.ndarray:
    """Detect text lines on a page too large for one det pass: tile,
    detect per tile, offset, merge fragments. Returns [N,4,2] float32."""
    from .det import detect_lines
    from .geometry import sorted_boxes

    h, w = img.shape[:2]
    frags: list[np.ndarray] = []
    for y0, x0, y1, x1 in slice_generator(h, w, tile, overlap):
        boxes, _ = detect_lines(img[y0:y1, x0:x1], det_model)
        for b in boxes:
            off = b.astype(np.float64)
            off[:, 0] += x0
            off[:, 1] += y0
            frags.append(off)
    merged = merge_fragmented(frags)
    ordered = sorted_boxes(np.array(merged, dtype=np.float32)) if merged else []
    return np.array(ordered, dtype=np.float32).reshape(-1, 4, 2)


# ---------------------------------------------------------------------------
# poster-mode recursive window walk (tools/infer/predict_det.py:307-408)


MIN_BOUND_DISTANCE = 50


def detect_poster(
    img: np.ndarray,
    det_model=None,
    limit_side_len: int = 960,
    predict=None,
) -> np.ndarray:
    """The reference's use_slice path for extreme-aspect pages
    (tools/infer/predict_det.py:307-408): a tall image (h/w > 2 and
    h > limit) is walked top-down in windows of height w*3//4; a wide
    image (w/h > 3 and w > 3*limit) left-right in windows of width
    h*3//4. After each window, if the last detected box ends within
    MIN_BOUND_DISTANCE of the bound the reference checks, the walk
    rolls back to the second-to-last box's far edge and drops the last
    box so the next window re-detects it whole.

    Faithful quirks kept (cited lines): the bound check compares the
    CROSS dimension (img width for the tall case, predict_det.py:330-332)
    against the LAST-VERTEX coordinate (x[-1][1], the BL corner), while
    the sort and the roll-back line use the BR corner ([:, 2, 1]) — so
    on posters wider than window+50 the roll-back never fires, exactly
    as upstream. `predict` injects a window detector for tests; default
    is the real det stage.

    Returns [N,4,2] float32 in detection order (no cross-window merge —
    upstream appends raw).
    """
    from .det import detect_lines

    if predict is None:
        def predict(sub):
            boxes, _ = detect_lines(sub, det_model)
            return np.array(boxes, dtype=np.float32).reshape(-1, 4, 2)

    h, w = img.shape[:2]
    out = np.zeros((0, 4, 2), dtype=np.float32)

    def walk(length, cross, window, sub_of, off_axis, line_vertex):
        # line_vertex: which corner the roll-back line/filter read —
        # BR (2) in the tall case, TR (1) in the wide case, exactly as
        # upstream (predict_det.py:336/345 vs 385/395); the sort always
        # reads BR.
        nonlocal out
        start = 0
        end = 0
        while end <= length:
            end = start + window
            sub = sub_of(start, end)
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                break
            boxes = predict(sub)
            offset = start
            if len(boxes) == 0 or cross - max(
                float(b[-1][off_axis]) for b in boxes
            ) > MIN_BOUND_DISTANCE:
                start = end
            else:
                boxes = boxes[np.argsort(boxes[:, 2, off_axis])]
                line = (
                    0
                    if len(boxes) <= 1
                    else int(np.max(boxes[:-1, line_vertex, off_axis]))
                )
                if line > 0:
                    start += line
                    boxes = boxes[boxes[:, line_vertex, off_axis] <= line]
                else:
                    start = end
            if len(boxes):
                shifted = boxes.copy()
                shifted[:, :, off_axis] += offset
                out = np.append(out, shifted, axis=0) if out.shape[0] else shifted
        return out

    if h / w > 2 and h > limit_side_len:
        return walk(h, w, w * 3 // 4, lambda s, e: img[s:e, :], 1, 2)
    if w / h > 3 and w > limit_side_len * 3:
        return walk(w, h, h * 3 // 4, lambda s, e: img[:, s:e], 0, 1)
    return predict(img)
