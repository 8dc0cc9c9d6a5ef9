"""The composed per-page OCR kernel: detect -> order -> crop -> recognize
-> score-filter -> extracted text.

This is the numpy core that the Spark mapInPandas stage calls per page —
the analogue of the reference's TextSystem.__call__
(tools/infer/predict_system.py:76-157): det boxes, sorted_boxes reading
order (:124), perspective crop per box (:126-132), optional 0/180 cls,
batched rec, then drop results with score < drop_score (:149-154,
default 0.5). extracted_text joins kept line texts with '\n' in reading
order (the TSV sink's transcription order, :244-267).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .cls import classify
from .det import DetConfig, DetModel, detect_lines
from .geometry import sorted_boxes
from .imageops import warp_perspective
from .rec import RecConfig, RecModel, recognize_crops

DROP_SCORE = 0.5


def get_rotate_crop_image(img: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """Perspective-warp a TL,TR,BR,BL quad to an upright crop; rotate 90
    if the crop is tall (h/w >= 1.5) — reference
    tools/infer/utility.py:865-906 semantics."""
    q = np.asarray(quad, dtype=np.float64)
    crop_w = int(max(np.linalg.norm(q[0] - q[1]), np.linalg.norm(q[2] - q[3])))
    crop_h = int(max(np.linalg.norm(q[0] - q[3]), np.linalg.norm(q[1] - q[2])))
    # Axis-aligned integer quads (the common case: DB emits rounded
    # upright rects for horizontal text) reduce the homography to an
    # identity sample grid — a slice copy, skipping the warp math.
    x0, y0 = q[0]
    if (
        q[0][1] == q[1][1]
        and q[2][1] == q[3][1]
        and q[0][0] == q[3][0]
        and q[1][0] == q[2][0]
        and float(x0).is_integer()
        and float(y0).is_integer()
        and q[1][0] - x0 == crop_w
        and q[3][1] - y0 == crop_h
    ):
        xi, yi = int(x0), int(y0)
        crop = img[yi : yi + crop_h, xi : xi + crop_w].astype(np.float32)
    else:
        crop = warp_perspective(img, q, crop_w, crop_h)
    if crop.shape[1] > 0 and crop.shape[0] / max(crop.shape[1], 1) >= 1.5:
        crop = np.rot90(crop, 3).copy()
    return crop


@dataclass
class OcrConfig:
    det: DetConfig = field(default_factory=DetConfig)
    rec: RecConfig = field(default_factory=RecConfig)
    drop_score: float = DROP_SCORE
    use_angle_cls: bool = False


@dataclass
class OcrEngine:
    """Holds the (stub) model instances; one per executor process, cached
    by plans/pipeline.py the way the reference caches predictors."""

    cfg: OcrConfig = field(default_factory=OcrConfig)

    def __post_init__(self):
        self.det_model = DetModel(self.cfg.det)
        self.rec_model = RecModel(self.cfg.rec)

    def ocr_page(self, gray: np.ndarray) -> list[dict]:
        """uint8 grayscale page -> reading-ordered, score-filtered spans:
        [{box: [[x,y]x4], text: str, score: float}]."""
        boxes, _ = detect_lines(gray, self.det_model)
        boxes = sorted_boxes(boxes)
        crops = [get_rotate_crop_image(gray, b) for b in boxes]
        if self.cfg.use_angle_cls:
            crops = [classify(c, self.rec_model)[2] for c in crops]
        rec_res = recognize_crops(crops, self.rec_model)
        spans = []
        for box, (text, score) in zip(boxes, rec_res):
            if score < self.cfg.drop_score:
                continue
            spans.append(
                {
                    "box": np.asarray(box, dtype=np.float32).tolist(),
                    "text": text,
                    "score": float(score),
                }
            )
        return spans

    def extract_text(self, gray: np.ndarray) -> str:
        return "\n".join(s["text"] for s in self.ocr_page(gray))
