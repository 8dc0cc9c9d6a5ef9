"""Tiled detection (slice + fragment merge) and word-box geometry
(SURVEY.md §2.9 slice_generator/merge_fragmented, §2.8 cal_ocr_word_box)."""

import numpy as np

from paddleocr_spark.kernels.font import render_page
from paddleocr_spark.kernels.geometry import sorted_boxes
from paddleocr_spark.kernels.det import DetModel, detect_lines
from paddleocr_spark.kernels.ocr import OcrEngine, get_rotate_crop_image
from paddleocr_spark.kernels.rec import recognize_crops
from paddleocr_spark.kernels.slice import (
    merge_fragmented,
    slice_detect,
    slice_generator,
)
from paddleocr_spark.kernels.wordbox import cal_word_boxes


def test_slice_generator_covers_with_overlap():
    tiles = list(slice_generator(2500, 1800, tile=1000, overlap=200))
    assert all(y1 <= 2500 and x1 <= 1800 for y0, x0, y1, x1 in tiles)
    ys = sorted({t[0] for t in tiles})
    assert ys[1] - ys[0] == 800  # stride = tile - overlap
    # full coverage of the bottom-right corner
    assert any(y1 == 2500 and x1 == 1800 for _, _, y1, x1 in tiles)


def test_merge_fragmented_fuses_split_line():
    left = np.array([[10, 10], [100, 10], [100, 40], [10, 40]], np.float32)
    right = np.array([[105, 12], [200, 12], [200, 38], [105, 38]], np.float32)
    faraway = np.array([[10, 100], [200, 100], [200, 130], [10, 130]], np.float32)
    merged = merge_fragmented([left, right, faraway])
    assert len(merged) == 2
    fused = merged[0]
    assert fused[0][0] == 10 and fused[1][0] == 200


def test_slice_detect_matches_full_detection_text():
    """A page detected via small tiles must read the same text as the
    single-pass path (the reference's invariant for slice mode)."""
    text = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOG12345THEQUICKBROWNFOX9876"
    lines = [text[i : i + 20] for i in range(0, len(text), 20)]
    img = render_page(lines)
    eng = OcrEngine()

    boxes = slice_detect(img, eng.det_model, tile=300, overlap=100)
    assert len(boxes) == len(lines)
    crops = [get_rotate_crop_image(img, b) for b in boxes]
    got = "".join(t for t, s in recognize_crops(crops, eng.rec_model))
    assert got == text


def test_word_boxes_align_with_glyph_grid():
    """Per-glyph boxes must be monotonically ordered, lie inside the det
    box, and count exactly the rendered glyphs."""
    text = "HELLO12345"
    img = render_page([text])
    eng = OcrEngine()
    boxes = sorted_boxes(detect_lines(img, eng.det_model)[0])
    assert len(boxes) == 1
    box = boxes[0]
    crop = get_rotate_crop_image(img, box)
    wboxes = cal_word_boxes(crop, box, eng.rec_model)
    assert len(wboxes) == len(text)
    xs = [wb[0][0] for wb in wboxes]
    assert xs == sorted(xs)
    assert all(wb[0][0] >= box[0][0] - 1e-6 and wb[1][0] <= box[1][0] + 1e-6
               for wb in wboxes)
