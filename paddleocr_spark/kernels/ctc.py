"""CTC greedy decode (reference CTCLabelDecode semantics,
ppocr/postprocess/rec_postprocess.py:144-234): per-timestep argmax,
collapse adjacent repeats, drop blank (index 0), map through the charset,
confidence = mean of the kept frames' max probabilities."""

from __future__ import annotations

import numpy as np


def ctc_decode(probs: np.ndarray, charset: str) -> tuple[str, float]:
    """probs [T, C] with class 0 = blank, classes 1..K = charset chars."""
    if probs.size == 0:
        return "", 0.0
    idx = probs.argmax(axis=1)
    conf = probs.max(axis=1)
    keep = np.ones(len(idx), dtype=bool)
    keep[1:] = idx[1:] != idx[:-1]  # collapse repeats
    keep &= idx != 0  # drop blanks
    if not keep.any():
        return "", 0.0
    chars = [charset[i - 1] for i in idx[keep]]
    return "".join(chars), float(conf[keep].mean())
