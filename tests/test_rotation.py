"""Coarse rotation detectors + prioritized sweep integration
(SURVEY.md §2.9 rotation detectors, §2.4 rotation-vote combine)."""

import numpy as np

from paddleocr_spark.kernels.cls import orient_page
from paddleocr_spark.kernels.det import detect_lines
from paddleocr_spark.kernels.font import render_page
from paddleocr_spark.kernels.imageops import rot90k
from paddleocr_spark.kernels.ocr import OcrEngine, get_rotate_crop_image
from paddleocr_spark.kernels.rotation import (
    contour_detector,
    estimate_rotation,
    gradient_detector,
    projection_detector,
)

TEXT = "THEQUICKBROWNFOXJUMPSOVER"
LINES = [TEXT[i : i + 12] for i in range(0, len(TEXT), 12)]


def test_detectors_find_axis_at_all_four_rotations():
    img = render_page(LINES)
    for k in range(4):
        rotated = rot90k(img, k)
        want_axis = 90 if k % 2 else 0
        axis, score = estimate_rotation(rotated)
        assert axis == want_axis, f"k={k}"
        assert score > 0.4
        for det in (projection_detector, gradient_detector, contour_detector):
            a, conf = det(rotated)
            assert a == want_axis and conf > 0.5


def test_blank_page_votes_axis0_with_zero_confidence():
    blank = np.full((100, 100), 255, np.uint8)
    axis, score = estimate_rotation(blank)
    assert axis == 0 and score == 0.0


def test_orient_page_recovers_all_four_rotations():
    eng = OcrEngine()
    img = render_page(LINES)
    for k in range(4):
        rotated = rot90k(img, k)
        upright, angle = orient_page(
            rotated,
            lambda im: detect_lines(im, eng.det_model),
            get_rotate_crop_image,
            eng.rec_model,
        )
        assert angle == (360 - 90 * k) % 360 or (k == 0 and angle == 0)
        assert eng.extract_text(upright) == "\n".join(LINES)


def test_reverse_rtl_segments_matches_reference_semantics():
    from paddleocr_spark.kernels.ctc import reverse_rtl_segments

    # pure LTR: unchanged
    assert reverse_rtl_segments("ABC 123") == "ABC 123"
    # pure Arabic: fully reversed
    assert reverse_rtl_segments("ابت") == "تبا"
    # mixed: LTR runs intact, run order flipped, Arabic chars reversed
    assert (
        reverse_rtl_segments("abابcd")
        == "cdباab"
    )
    assert reverse_rtl_segments("") == ""
