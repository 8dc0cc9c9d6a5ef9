"""Coarse page-rotation detectors + weighted vote.

Behavioral spec from the fork's rotation_detector.py:30-370: several
cheap geometric detectors each propose an angle with a confidence, a
weighted vote combines them (:291-340), and the OCR text probe
(kernels/cls.orient_page) settles what geometry cannot (0 vs 180 for
projection-symmetric content).

Detectors here (pure numpy, deterministic):
- projection: row/column ink-projection peakiness. Horizontal text makes
  a spiky row profile; rotated 90/270 the spikes move to columns. Maps
  to the fork's Hough-line angle histogram (dominant line direction).
- gradient: Sobel-style edge-direction energy; horizontal strokes emit
  vertical gradients. Maps to the fork's edge-direction distribution.
- contour: minAreaRect of the ink mask; a wider-than-tall text block
  reads as axis 0. Maps to the fork's card-contour angle.

All three are 180-degree-blind (as the fork's are); they vote on the
AXIS (0 vs 90). `estimate_rotation` returns (axis, confidence); the
caller resolves the flip with the recognition probe.
"""

from __future__ import annotations

import numpy as np

# fork weights (rotation_detector.py:291-340), collapsed to the three
# geometric detectors; the text probe holds the remaining weight.
WEIGHTS = {"projection": 0.35, "gradient": 0.25, "contour": 0.25}


def _ink(img: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.asarray(img, dtype=np.float32) / 255.0, 0.0, 1.0)


def _peakiness(profile: np.ndarray) -> float:
    m = profile.mean()
    if m <= 1e-9:
        return 0.0
    return float(profile.std() / m)


def projection_detector(img: np.ndarray) -> tuple[int, float]:
    """(axis, conf): 0 if the row projection is spikier than the column
    projection (horizontal lines), else 90."""
    ink = _ink(img)
    rows = _peakiness(ink.mean(axis=1))
    cols = _peakiness(ink.mean(axis=0))
    total = rows + cols
    if total <= 1e-9:
        return 0, 0.0
    return (0, rows / total) if rows >= cols else (90, cols / total)


def gradient_detector(img: np.ndarray) -> tuple[int, float]:
    """(axis, conf) from edge-direction energy: horizontal text strokes
    produce more vertical-gradient energy than horizontal."""
    f = np.asarray(img, dtype=np.float32)
    gy = np.abs(np.diff(f, axis=0)).sum()
    gx = np.abs(np.diff(f, axis=1)).sum()
    total = gx + gy
    if total <= 1e-9:
        return 0, 0.0
    # text lines: many short vertical strokes -> gx dominates inside a
    # line; line edges give gy. Empirically gx > gy for axis 0 pages.
    return (0, gx / total) if gx >= gy else (90, gy / total)


def contour_detector(img: np.ndarray) -> tuple[int, float]:
    """(axis, conf) from the ink bounding geometry: text blocks wider
    than tall vote axis 0."""
    ink = _ink(img) > 0.5
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return 0, 0.0
    h = ys.max() - ys.min() + 1
    w = xs.max() - xs.min() + 1
    total = h + w
    return (0, w / total) if w >= h else (90, h / total)


def estimate_rotation(img: np.ndarray) -> tuple[int, float]:
    """Weighted vote over the geometric detectors -> (axis 0|90, score).
    Ties prefer axis 0 (the fork's tie-break)."""
    votes = {
        "projection": projection_detector(img),
        "gradient": gradient_detector(img),
        "contour": contour_detector(img),
    }
    scores = {0: 0.0, 90: 0.0}
    for name, (axis, conf) in votes.items():
        scores[axis] += WEIGHTS[name] * conf
    axis = 0 if scores[0] >= scores[90] else 90
    return axis, scores[axis]
