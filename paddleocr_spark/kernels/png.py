"""Minimal deterministic grayscale PNG codec (stdlib zlib only).

Plays the role of the reference's cv2.imencode/imdecode boundary
(reference ppocr/data/imaug/operators.py:30-68 DecodeImage): the `pages`
table stores page payloads as real encoded bytes in a BINARY column, and
the decode stage inside the UDF turns bytes back into ndarrays. 8-bit
grayscale, color type 0, filter 0 — enough for the fixture corpus and
fully self-contained.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray_png(img: np.ndarray) -> bytes:
    """uint8 [H, W] -> PNG bytes (color type 0, bit depth 8, filter 0)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray_png expects uint8 [H, W]")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, level=6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_gray_png(data: bytes) -> np.ndarray:
    """PNG bytes (as produced by encode_gray_png) -> uint8 [H, W]."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w + 1
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    ftypes = arr[:, 0]
    scans = arr[:, 1:]
    if not ftypes.any():  # all filter 0 — what encode_gray_png emits
        return scans.copy()
    bad = ~np.isin(ftypes, (0, 2))
    if bad.any():
        raise ValueError(f"unsupported filter {int(ftypes[bad][0])}")
    # Up-filter rows accumulate mod 256 from the last filter-0 row:
    # uint8 add.accumulate wraps exactly, run per segment
    out = scans.copy()
    starts = np.flatnonzero(ftypes == 0)
    if starts.size == 0 or starts[0] != 0:
        starts = np.concatenate(([0], starts))
    bounds = np.append(starts, h)
    for a, b in zip(bounds[:-1], bounds[1:]):
        np.add.accumulate(out[a:b], axis=0, dtype=np.uint8, out=out[a:b])
    return out
