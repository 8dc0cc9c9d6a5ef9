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


def reverse_rtl_segments(text: str) -> str:
    """Arabic RTL repair of a decoded string (reference BaseRecLabelDecode
    .pred_reverse, ppocr/postprocess/rec_postprocess.py:53-67): contiguous
    runs of RTL codepoints (Arabic blocks U+0600-06FF, U+0750-077F,
    U+08A0-08FF, U+FB50-FDFF, U+FE70-FEFF) are reversed in place while
    LTR runs keep their order, then the run sequence itself is reversed —
    the reference's c_current segment accumulation. (The reference
    classes by the LTR regex [a-zA-Z0-9 :*./%+-]; here the RTL side is
    classed by Arabic codepoint blocks, which agrees on all
    alphanumeric + Arabic content.)"""
    def is_rtl(ch: str) -> bool:
        o = ord(ch)
        return (
            0x0600 <= o <= 0x06FF
            or 0x0750 <= o <= 0x077F
            or 0x08A0 <= o <= 0x08FF
            or 0xFB50 <= o <= 0xFDFF
            or 0xFE70 <= o <= 0xFEFF
        )

    segments: list[str] = []
    current = ""
    current_rtl = None
    for ch in text:
        r = is_rtl(ch)
        if current_rtl is None or r == current_rtl:
            current += ch
        else:
            segments.append(current[::-1] if current_rtl else current)
            current = ch
        current_rtl = r
    if current:
        segments.append(current[::-1] if current_rtl else current)
    return "".join(reversed(segments))
