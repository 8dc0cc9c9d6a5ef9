"""Character/word box geometry: map recognition cell columns back to
page coordinates.

Behavioral spec from the reference's word-box path
(ppocr/postprocess/rec_postprocess.py:72-142 get_word_info classifies
decoded chars into runs and maps them to column positions;
ppstructure/utility.py:243-300 cal_ocr_word_box interpolates column
positions across the detected box width to produce per-word quads).

This engine's charset is alphanumeric-only (no spaces), so every glyph
is its own "word" run; the geometry interpolation — rec-crop column
range -> proportional position across the det box — is the part that
carries over exactly.
"""

from __future__ import annotations

import math

import numpy as np

from .rec import REC_H, RecModel, rec_resize


def cal_word_boxes(
    crop: np.ndarray, box: np.ndarray, model: RecModel | None = None
) -> list[np.ndarray]:
    """Per-glyph quads in page coordinates for one detected line.

    crop: the rectified line crop (page pixels); box: its [4,2] quad
    (TL,TR,BR,BL upright rect). Cell columns found on the rec-resized
    crop are scaled back through the resize ratio and offset into the
    box — the reference's column-width interpolation."""
    model = model or RecModel()
    crop_h, crop_w = crop.shape[:2]
    if crop_h == 0 or crop_w == 0:
        return []
    ratio = crop_w / float(crop_h)
    resized = rec_resize(crop, max(ratio, 1.0))
    # content width before right-padding (mirror of rec_resize)
    target_w = resized.shape[1]
    content_w = min(int(math.ceil(REC_H * ratio)), target_w)
    cells = [
        (c0, c1)
        for c0, c1 in model.segment(resized)
        if c1 - c0 >= model.cfg.min_cell_w and c0 < content_w
    ]
    b = np.asarray(box, dtype=np.float64)
    x0, y0 = b[0]
    box_w = b[1][0] - b[0][0]
    box_h = b[3][1] - b[0][1]
    scale = box_w / content_w if content_w else 0.0
    out = []
    for c0, c1 in cells:
        wx0 = x0 + c0 * scale
        wx1 = x0 + min(c1, content_w) * scale
        out.append(
            np.array(
                [
                    [wx0, y0],
                    [wx1, y0],
                    [wx1, y0 + box_h],
                    [wx0, y0 + box_h],
                ],
                dtype=np.float32,
            )
        )
    return out
