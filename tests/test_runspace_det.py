"""Run-space detection must be EXACTLY the map-space computation: the
fast path's claim is bit-identity, not approximation, so verify it on
adversarial random bitmaps (not just rendered text).

Reference semantics under test: dilation = sliding max over 0/1
(db_postprocess.py map path / ppocr DBPostProcess dilation), connected
components of the thresholded map, and the bbox-mean box score.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from paddleocr_spark.kernels.db_postprocess import (
    bitmap_runs,
    db_postprocess,
    db_postprocess_runs,
    dilate_runs,
    runs_components,
)
from paddleocr_spark.kernels.imageops import dilate_horizontal, dilate_vertical


def _runs_to_map(rows, starts, ends, h, w):
    out = np.zeros((h, w), dtype=bool)
    for r, s, e in zip(rows, starts, ends):
        out[r, s:e] = True
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=3),
    st.floats(min_value=0.02, max_value=0.6),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_dilate_runs_equals_map_dilation(h, w, h_rad, v_rad, density, seed):
    rng = np.random.default_rng(seed)
    bit = rng.random((h, w)) < density
    expected = dilate_vertical(
        dilate_horizontal(bit.astype(np.uint8), h_rad), v_rad
    ).astype(bool)
    rows, starts, ends = dilate_runs(*bitmap_runs(bit), h_rad, v_rad, h, w)
    assert np.array_equal(_runs_to_map(rows, starts, ends, h, w), expected)


def _bruteforce_components(bit):
    """Textbook BFS flood fill (4-connectivity) -> per-component extents,
    ordered by (min_y, min_x) — an independent oracle for the union-find
    path."""
    h, w = bit.shape
    seen = np.zeros_like(bit, dtype=bool)
    comps = []
    for y in range(h):
        for x in range(w):
            if not bit[y, x] or seen[y, x]:
                continue
            stack = [(y, x)]
            seen[y, x] = True
            xs, ys = [], []
            while stack:
                cy, cx = stack.pop()
                xs.append(cx)
                ys.append(cy)
                for ny, nx in ((cy-1, cx), (cy+1, cx), (cy, cx-1), (cy, cx+1)):
                    if 0 <= ny < h and 0 <= nx < w and bit[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            comps.append((min(ys), min(xs), max(ys), max(xs)))
    comps.sort()
    return comps


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=40),
    st.floats(min_value=0.02, max_value=0.5),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_runs_components_matches_bruteforce_flood_fill(h, w, density, seed):
    rng = np.random.default_rng(seed)
    bit = rng.random((h, w)) < density
    expected = _bruteforce_components(bit)
    got = [
        (int(c[:, 1].min()), int(c[:, 0].min()), int(c[:, 1].max()), int(c[:, 0].max()))
        for c in runs_components(*bitmap_runs(bit))
    ]
    assert sorted(got) == expected


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=8, max_value=48),
    st.integers(min_value=8, max_value=80),
    st.integers(min_value=0, max_value=6),
    st.floats(min_value=0.05, max_value=0.5),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_db_postprocess_runs_equals_map_path(h, w, h_rad, density, seed):
    rng = np.random.default_rng(seed)
    bit = rng.random((h, w)) < density
    dil = dilate_vertical(dilate_horizontal(bit.astype(np.uint8), h_rad), 1)
    boxes_map, scores_map = db_postprocess(
        dil.astype(np.float32), h, w, thresh=0.5, box_thresh=0.2
    )
    rows, starts, ends = dilate_runs(*bitmap_runs(bit), h_rad, 1, h, w)
    boxes_run, scores_run = db_postprocess_runs(
        rows, starts, ends, h, w, h, w, box_thresh=0.2
    )
    assert np.array_equal(boxes_map, boxes_run)
    assert np.allclose(scores_map, scores_run)
