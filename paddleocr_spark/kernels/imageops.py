"""Vectorized numpy image primitives (cv2 replacements).

Covers what the reference gets from cv2: bilinear resize
(ppocr/data/imaug/operators.py:207-338 DetResizeForTest uses cv2.resize),
perspective warp of a quad to an upright rect
(tools/infer/utility.py:865-906 get_rotate_crop_image), morphological
dilation (ppocr/postprocess/db_postprocess.py dilation kernel), and
adaptive average pooling used by the recognition stub. All deterministic,
all batch-of-one numpy — no per-pixel Python loops.
"""

from __future__ import annotations

import functools

import numpy as np


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with pixel-center alignment (cv2-style mapping)."""
    h, w = img.shape[:2]
    out_h, out_w = max(1, int(out_h)), max(1, int(out_w))
    if (out_h, out_w) == (h, w):
        return img.astype(np.float32, copy=True)
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    # asarray: no-copy when already float32 (slice-cropped rec inputs)
    f = np.asarray(img, dtype=np.float32)
    # separable: blend one axis, then interpolate the other — half the
    # gathers/multiplies of the per-corner form. Order by intermediate
    # size: shrink the axis with the bigger reduction first.
    if out_h * w <= h * out_w:
        mid = f[y0] * (1 - wy) + f[y1] * wy
        return mid[:, x0] * (1 - wx) + mid[:, x1] * wx
    mid = f[:, x0] * (1 - wx) + f[:, x1] * wx
    return mid[y0] * (1 - wy) + mid[y1] * wy


@functools.lru_cache(maxsize=4096)
def _pool_bins(n: int, out_n: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached bin edges: recognition pools thousands of same-shaped glyph
    cells per page, so the linspace/round work is amortized to zero."""
    b = np.linspace(0, n, out_n + 1).round().astype(np.int64)
    hi = np.minimum(np.maximum(b[1:], b[:-1] + 1), n)
    lo = np.where(hi > 0, np.minimum(b[:-1], hi - 1), 0)
    return lo, hi


def adaptive_avg_pool(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Mean-pool to an exact (out_h, out_w) grid with near-equal bins.

    Fast path (the common shrink case — bins contiguous, covering,
    non-overlapping): two axis reductions via np.add.reduceat, one pass
    over the image, no (h+1, w+1) integral-image allocation (~20x
    cheaper for page -> 8x8). Integer-valued inputs (uint8 pages) sum
    exactly in float64 either way, so the two paths are bit-identical
    there; the integral-image path remains for degenerate bins
    (upsampling n < out_n, where bins overlap)."""
    h, w = img.shape
    r0, r1 = _pool_bins(h, out_h)
    c0, c1 = _pool_bins(w, out_w)
    area = (r1 - r0)[:, None] * (c1 - c0)[None, :]

    def _contig(lo, hi, n):
        return lo[0] == 0 and hi[-1] == n and np.array_equal(lo[1:], hi[:-1])

    if _contig(r0, r1, h) and _contig(c0, c1, w):
        f = np.asarray(img, dtype=np.float64)
        s = np.add.reduceat(np.add.reduceat(f, r0, axis=0), c0, axis=1)
        return (s / area).astype(np.float32)

    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = img.cumsum(0).cumsum(1)
    r0c, r1c = r0[:, None], r1[:, None]
    s = csum[r1c, c1] - csum[r0c, c1] - csum[r1c, c0] + csum[r0c, c0]
    return (s / np.maximum(area, 1)).astype(np.float32)


def pool_cells(
    band: np.ndarray, cells: list[tuple[int, int]], out_h: int, out_w: int
) -> np.ndarray:
    """adaptive_avg_pool of band[:, c0:c1] for every (c0, c1) cell, batched.

    All cells share the band height, so the row binning is computed once;
    a single column cumsum then resolves every cell's column bins as pure
    gathers. Returns [K, out_h, out_w] — identical values (up to fp
    summation order) to K independent adaptive_avg_pool calls, at ~1/K
    the overhead. This is the recognition hot loop: ~12 glyph cells per
    crop, thousands of crops per partition.
    """
    h, w = band.shape
    k = len(cells)
    if k == 0:
        return np.zeros((0, out_h, out_w), dtype=np.float32)
    r0, r1 = _pool_bins(h, out_h)
    cs = band.cumsum(0, dtype=np.float64)
    rows = cs[r1 - 1] - np.where(r0[:, None] > 0, cs[np.maximum(r0 - 1, 0)], 0.0)
    csum = np.zeros((out_h, w + 1), dtype=np.float64)
    np.cumsum(rows, axis=1, out=csum[:, 1:])
    lo = np.empty((k, out_w), dtype=np.int64)
    hi = np.empty((k, out_w), dtype=np.int64)
    for i, (c0, c1) in enumerate(cells):
        cl, ch = _pool_bins(c1 - c0, out_w)
        lo[i] = cl + c0
        hi[i] = ch + c0
    s = csum[:, hi] - csum[:, lo]  # [out_h, K, out_w]
    area = (r1 - r0)[None, :, None] * (hi - lo)[:, None, :]
    return (s.transpose(1, 0, 2) / np.maximum(area, 1)).astype(np.float32)


def _sliding_max(pad: np.ndarray, window: int, axis: int) -> np.ndarray:
    """Exact sliding max via span doubling: ceil(log2(window)) contiguous
    np.maximum passes instead of a width-`window` strided reduction."""
    res = pad
    span = 1
    while span < window:
        step = min(span, window - span)
        if axis == 1:
            res = np.maximum(res[:, : res.shape[1] - step], res[:, step:])
        else:
            res = np.maximum(res[: res.shape[0] - step], res[step:])
        span += step
    return res


def dilate_horizontal(img: np.ndarray, radius: int) -> np.ndarray:
    """Sliding-window max along x with window 2*radius+1 (edge padded)."""
    if radius <= 0:
        return img
    pad = np.pad(img, ((0, 0), (radius, radius)), mode="edge")
    return _sliding_max(pad, 2 * radius + 1, axis=1)


def dilate_vertical(img: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return img
    pad = np.pad(img, ((radius, radius), (0, 0)), mode="edge")
    return _sliding_max(pad, 2 * radius + 1, axis=0)


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points to 4 dst points (solve 8x8)."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = float(src[i][0]), float(src[i][1])
        u, v = float(dst[i][0]), float(dst[i][1])
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    coef = np.linalg.solve(a, b)
    return np.append(coef, 1.0).reshape(3, 3)


def warp_perspective(
    img: np.ndarray, quad: np.ndarray, out_w: int, out_h: int
) -> np.ndarray:
    """Warp quad (TL,TR,BR,BL order) to an upright out_h x out_w crop.

    Inverse mapping + bilinear sampling, border replicate — the semantics of
    the reference's get_rotate_crop_image (tools/infer/utility.py:881-896)
    minus the cubic kernel (bilinear is deterministic and sufficient for
    the stub-model parity chain).
    """
    out_w, out_h = max(1, int(out_w)), max(1, int(out_h))
    dst = np.array([[0, 0], [out_w, 0], [out_w, out_h], [0, out_h]], np.float64)
    m = perspective_matrix(dst, np.asarray(quad, np.float64))  # dst -> src
    xs, ys = np.meshgrid(
        np.arange(out_w, dtype=np.float64) + 0.5,
        np.arange(out_h, dtype=np.float64) + 0.5,
    )
    denom = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    sx = (m[0, 0] * xs + m[0, 1] * ys + m[0, 2]) / denom - 0.5
    sy = (m[1, 0] * xs + m[1, 1] * ys + m[1, 2]) / denom - 0.5
    h, w = img.shape[:2]
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (sx - x0).astype(np.float32)
    wy = (sy - y0).astype(np.float32)
    f = img.astype(np.float32)
    out = (
        f[y0, x0] * (1 - wx) * (1 - wy)
        + f[y0, x1] * wx * (1 - wy)
        + f[y1, x0] * (1 - wx) * wy
        + f[y1, x1] * wx * wy
    )
    return out


def rotate180(img: np.ndarray) -> np.ndarray:
    return img[::-1, ::-1].copy()


def rot90k(img: np.ndarray, k: int) -> np.ndarray:
    return np.rot90(img, k).copy()


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): mean-pool to 8 rows x 9 cols,
    bit (r, c) = 1 iff cell (r, c) is brighter than cell (r, c+1),
    packed row-major MSB-first. The standard perceptual near-dup
    fingerprint for image corpora (LAION-style dedup): tolerant of
    re-encoding, resampling, and small local edits (a small patch only
    perturbs the one or two pooled cells it lands in), while exact on
    identical pixels. Returned as a SIGNED 64-bit value (two's
    complement) so the hash lands in a Spark `long` column unchanged.

    Locality bound (what makes it a NEAR-dup hash, pinned in
    tests/test_kernels.py): one changed pixel lands in exactly one
    pooled cell (the shrink-path bins are contiguous and disjoint), and
    a cell participates in at most 2 of the 72 row-adjacent comparisons
    — so k changed pixels flip at most 2k bits. Identical pixels give
    identical hashes (pooling is deterministic), so exact duplicates
    always collide: banding the hash for a bucket join has guaranteed
    recall for exact dups and for hamming <= bands-1 near-dups.

    Pooling reuses `adaptive_avg_pool` (reduceat fast path; sums exact
    in float64, means rounded once to float32 — deterministic)."""
    grid = adaptive_avg_pool(np.asarray(img, dtype=np.float64), 8, 9)
    bits = (grid[:, :-1] > grid[:, 1:]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v
