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


def test_detect_poster_tall_page_text_parity():
    """Poster mode (predict_det.py:307-408 recursive window walk) must
    read the same text as single-pass detection on a tall page; window
    boundaries land between line bands by construction, and the
    roll-back guard leaves clean windows untouched."""
    from paddleocr_spark.kernels.slice import detect_poster

    # 19-char lines: w=644, window=483; every boundary (483, 966, 1449)
    # lands mod 80 at 3/6/9 — outside the 24..52 ink bands, so no line
    # is ever cut by a window edge.
    lines = [f"LINE{k:02d}ABCDEFGHIJKLM" for k in range(20)]
    img = render_page(lines)
    h, w = img.shape
    assert h / w > 2 and h > 960  # poster-mode trigger

    eng = OcrEngine()
    boxes = detect_poster(img, eng.det_model, limit_side_len=960)
    assert len(boxes) == len(lines)
    # top-down window walk keeps document order
    crops = [get_rotate_crop_image(img, b) for b in boxes]
    got = [t for t, s in recognize_crops(crops, eng.rec_model)]
    assert got == lines


def test_detect_poster_wide_page_text_parity():
    """Wide strip: 5 window-aligned cells, each holding one short line
    whose ink sits fully inside the cell — the left-right walk must find
    all five in order."""
    import numpy as np

    from paddleocr_spark.kernels.slice import detect_poster

    h, cell = 160, 120  # window = h*3//4 = 120
    texts = ["A0", "B1", "C2", "D3", "E4"]
    img = np.full((h, 5 * cell), 255, dtype=np.uint8)
    for i, t in enumerate(texts):
        page = render_page([t])
        ph, pw = page.shape
        img[40 : 40 + ph, i * cell + 10 : i * cell + 10 + pw] = page
    assert img.shape[1] / h > 3 and img.shape[1] > 3 * h
    eng = OcrEngine()
    boxes = detect_poster(img, eng.det_model, limit_side_len=h)
    assert len(boxes) == len(texts)
    crops = [get_rotate_crop_image(img, b) for b in boxes]
    got = [t for t, s in recognize_crops(crops, eng.rec_model)]
    assert got == texts


def test_detect_poster_rollback_branch():
    """Exercise the roll-back: a fake window predictor puts the last
    box within MIN_BOUND_DISTANCE of the cross bound, so the walk must
    drop it, advance to the second-to-last box's far edge, and
    re-detect it in the next window."""
    import numpy as np

    from paddleocr_spark.kernels.slice import detect_poster

    img = np.full((800, 160), 255, dtype=np.uint8)  # window h=120, w-50=110
    calls = []

    def fake_predict(sub):
        calls.append(sub.shape)
        if len(calls) == 1:
            # two boxes; the last one's BL y = 115 > 110 triggers rollback
            return np.array(
                [
                    [[5, 10], [150, 10], [150, 30], [5, 30]],
                    [[5, 100], [150, 100], [150, 115], [5, 115]],
                ],
                dtype=np.float32,
            )
        return np.zeros((0, 4, 2), dtype=np.float32)

    boxes = detect_poster(img, limit_side_len=700, predict=fake_predict)
    # only the first box survives window 1; its BR y (30) becomes the
    # next window start
    assert len(boxes) == 1
    assert boxes[0][2][1] == 30.0
    assert len(calls) >= 2
