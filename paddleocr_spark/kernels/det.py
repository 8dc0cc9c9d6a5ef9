"""Text detection stage: resize policy + deterministic detection model.

DetResizeForTest semantics from the reference
(ppocr/data/imaug/operators.py:268-315, limit_type='max'): if the longest
side exceeds `limit_side_len` scale it down, then snap H and W to
multiples of 32 (round, min 32), and record (ratio_h, ratio_w).

The "model" is a deterministic stand-in for the DB net (the sandbox has
no onnxruntime): probability = ink intensity dilated horizontally so each
text line fuses into a single blob — the same line-level blob shape a DB
probability map has. Swapping in a real ONNX DB det is a one-function
change behind `DetModel.forward`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .db_postprocess import db_postprocess
from .geometry import filter_det_boxes
from .imageops import dilate_horizontal, dilate_vertical, resize_bilinear


def det_resize(img: np.ndarray, limit_side_len: int = 960) -> tuple[np.ndarray, float, float]:
    """Returns (resized float32 [h,w], ratio_h, ratio_w)."""
    h, w = img.shape[:2]
    ratio = 1.0
    if max(h, w) > limit_side_len:
        ratio = limit_side_len / max(h, w)
    resize_h = max(int(round(h * ratio / 32) * 32), 32)
    resize_w = max(int(round(w * ratio / 32) * 32), 32)
    out = resize_bilinear(img, resize_h, resize_w)
    return out, resize_h / h, resize_w / w


@dataclass
class DetConfig:
    # The reference caps the det input at 960 (det_limit_side_len,
    # tools/infer/utility.py:64) and the fork further downscales pages to
    # 1500px for speed (fastapi_app.py:295-302). Our fixture pages render
    # glyphs at 4px/cell, so a 512 cap keeps every stroke >=2px while
    # cutting det memory traffic 2.4x — the det map is bandwidth-bound at
    # high core counts.
    limit_side_len: int = 512
    thresh: float = 0.3
    box_thresh: float = 0.6
    unclip_ratio: float = 1.5
    max_candidates: int = 1000
    # Must bridge the widest within-line ink gap at ANY det scale: a
    # rendered space is ~44px at source scale, and pages narrower than
    # limit_side_len are not downscaled at all (ratio 1), so the window
    # must exceed 44px as-is -> radius 24 (window 49). Horizontal
    # dilation cannot merge lines vertically, so the 52px inter-line gap
    # is untouched.
    h_dilate: int = 24
    v_dilate: int = 1


class DetModel:
    """Deterministic DB-style detector head."""

    def __init__(self, cfg: DetConfig | None = None):
        self.cfg = cfg or DetConfig()

    def forward(self, gray: np.ndarray) -> np.ndarray:
        """float32 grayscale [h,w] (0..255) -> probability map [h,w]."""
        ink = np.clip(1.0 - gray / 255.0, 0.0, 1.0)
        prob = dilate_horizontal(ink, self.cfg.h_dilate)
        if self.cfg.v_dilate:
            prob = dilate_vertical(prob, self.cfg.v_dilate)
        return np.asarray(prob, dtype=np.float32)  # no-copy when float32


def detect_lines(
    img: np.ndarray, model: DetModel | None = None
) -> tuple[np.ndarray, list[float]]:
    """uint8/float grayscale page -> (boxes [N,4,2] float32 source coords,
    scores). Full det stage: resize -> model -> DB postprocess -> filters."""
    model = model or DetModel()
    cfg = model.cfg
    src_h, src_w = img.shape[:2]
    resized, _, _ = det_resize(img, cfg.limit_side_len)
    prob = model.forward(resized)
    boxes, scores = db_postprocess(
        prob,
        src_h,
        src_w,
        thresh=cfg.thresh,
        box_thresh=cfg.box_thresh,
        max_candidates=cfg.max_candidates,
        unclip_ratio=cfg.unclip_ratio,
    )
    boxes = filter_det_boxes(boxes, src_h, src_w)
    return boxes, scores[: len(boxes)]
