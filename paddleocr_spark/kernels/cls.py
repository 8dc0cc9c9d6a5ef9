"""Orientation handling: per-crop 0/180 classification and page-level
rotation search.

Per-crop semantics from the reference text classifier
(tools/infer/predict_cls.py:67-137 + cls_postprocess.py): label space
["0","180"], rotate the crop 180 degrees only when the "180" score
exceeds cls_thresh=0.9. Our deterministic model scores an orientation by
the mean template correlation of its recognized glyphs — the orientation
that reads better wins (a real ONNX classifier drops in behind
`classify`).

Page-level semantics from the fork's rotation sweep
(fastapi_app.py:304-455): try prioritized angles, score each by how much
readable horizontal text it yields, early-exit on a confident hit,
prefer 0 on ties.
"""

from __future__ import annotations

import numpy as np

from .ctc import ctc_decode
from .font import REC_CHARSET
from .imageops import rot90k, rotate180
from .rec import RecModel, rec_resize

CLS_THRESH = 0.9


def _read_score(crop: np.ndarray, model: RecModel) -> float:
    """Mean CTC confidence of the crop under the rec model (0 if no text)."""
    ratio = crop.shape[1] / float(crop.shape[0])
    probs = model.forward([rec_resize(crop, max(ratio, 1.0))])[0]
    _, conf = ctc_decode(probs, REC_CHARSET)
    return conf


def classify(crop: np.ndarray, model: RecModel | None = None) -> tuple[str, float, np.ndarray]:
    """Returns (label, score, possibly-rotated crop)."""
    model = model or RecModel()
    s0 = _read_score(crop, model)
    flipped = rotate180(crop)
    s180 = _read_score(flipped, model)
    total = s0 + s180
    if total <= 1e-9:
        return "0", 0.5, crop
    score180 = s180 / total
    if score180 > 0.5:
        label, score = "180", score180
    else:
        label, score = "0", 1.0 - score180
    # Reference rotates only when the 180 score clears cls_thresh
    # (predict_cls.py:133-136); otherwise the crop passes through as-is.
    if label == "180" and score > CLS_THRESH:
        return label, score, flipped
    return label, score, crop


def orient_page(
    img: np.ndarray,
    detect_fn,
    crop_fn,
    rec_model: RecModel | None = None,
    priority: tuple[int, ...] | None = None,
    probe_boxes: int = 3,
    # Measured on the sf0.01 corpus: correct-orientation probes score
    # >= 0.973, wrong-orientation (180-symmetric glyph) reads <= 0.857.
    # 0.93 splits the gap — early exit never fires on a wrong angle.
    early_exit: float = 0.93,
) -> tuple[np.ndarray, int]:
    """Prioritized rotation sweep scored by recognition confidence of up
    to `probe_boxes` detected lines (the fork scores candidate angles by
    OCR quality and early-exits on a confident hit,
    fastapi_app.py:365-408); ties keep the earliest priority angle."""
    rec_model = rec_model or RecModel()
    if priority is None:
        # Coarse geometric vote picks the axis first (the fork's
        # prioritized candidate list, fastapi_app.py:316-323): a
        # 90/270-rotated page then skips the two useless upright probes.
        from .rotation import estimate_rotation

        axis, _ = estimate_rotation(img)
        priority = (0, 180, 90, 270) if axis == 0 else (90, 270, 0, 180)
    best_angle, best_score = priority[0], -1.0
    for angle in priority:
        rotated = rot90k(img, angle // 90) if angle else img
        boxes, _ = detect_fn(rotated)
        if len(boxes) == 0:
            continue
        confs = []
        for box in boxes[:probe_boxes]:
            crop = crop_fn(rotated, box)
            confs.append(_read_score(crop, rec_model))
        score = float(np.mean(confs)) if confs else 0.0
        if score >= early_exit:
            return rotated, angle
        if score > best_score + 1e-9:
            best_angle, best_score = angle, score
    rotated = rot90k(img, best_angle // 90) if best_angle else img
    return rotated, best_angle
