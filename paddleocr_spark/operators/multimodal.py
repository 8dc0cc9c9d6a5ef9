"""Multimodal binary-column operators for training-data pipelines.

Images / audio / video are opaque `binary` columns with typed metadata
extracted or derived by Arrow-batched UDFs (`mapInPandas`) — never
decoded driver-side, never per-row Python. This mirrors how the
reference treats documents as opaque bytes until the decode stage
(ppocr/data/imaug/operators.py:30-68 DecodeImage, bytes -> image inside
the pipeline), generalized to the other modalities a 100 TB corpus
carries.

Real here (the container has numpy + our PNG codec):
- `image_meta`: parse PNG IHDR width/height/bit-depth straight from the
  payload header — no full decode, so the scan stays cheap.
- `image_resize_feature`: decode + adaptive-pool to an 8x8 intensity
  grid (a perceptual-hash-style feature), via the kernel library.
- `frame_sample`: explode a multi-frame container (kernels/multipage) to
  one row per k-th frame — the video-frame-sampling plan shape
  (posexplode + modulo filter BEFORE the heavy per-frame work).

Uncompressed audio/video decode is REAL in operators/media.py (RIFF
WAVE PCM + YUV4MPEG2 need no codec library); `_decode_media` below
stays as the documented swap point for compressed codecs (mp3/h264 ->
soundfile/PyAV), with a deterministic fake for plumbing tests.
`media_feature_stub` is that plumbing's test harness and is no longer a
queries() entry.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def png_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, bit_depth) from the PNG IHDR without decoding.
    PNG layout: 8-byte signature, IHDR length+type, then W/H/depth."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    depth = data[24]
    return int(w), int(h), int(depth)


def _decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode stub for audio/video: real codecs are not available in this
    container. With fake=True returns a deterministic signal derived from
    the payload length so the downstream plumbing is testable; otherwise
    raises (clearly marked stub — swap in soundfile/PyAV here)."""
    if not fake:
        raise NotImplementedError(
            f"no {kind} codec in this environment; pass fake=True for the "
            "deterministic test signal"
        )
    n = len(payload)
    rng = (np.arange(64, dtype=np.float64) * ((n % 997) + 1)) % 255.0
    return rng


# -- queries -----------------------------------------------------------------


def _pages(spark: SparkSession, sf_dir: str, multipage: bool = False) -> DataFrame:
    from paddleocr_spark.sources.pages import pages_from_documents

    return pages_from_documents(spark, sf_dir, multipage=multipage)


def image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG header metadata per page payload (no full decode)."""
    pages = _pages(spark, sf_dir).select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [png_meta(bytes(b)) for b in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "bit_depth": [m[2] for m in metas],
                }
            )

    return pages.mapInPandas(
        run, schema="url string, width long, height long, bit_depth long"
    )


# Oracle: the renderer's geometry is deterministic (kernels/font.py
# render_page: glyph 5x7 at scale 4, spacing 12, margin 24, line_gap 52;
# lines wrap at 24 chars) so W/H are pure SQL arithmetic over the
# normalized text length.
_L = "length(upper(substring(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'), 1, 120)))"
IMAGE_META_SQL = f"""
SELECT concat('https://', source, '.example.test/doc/', CAST(doc_id AS string)) AS url,
       CASE WHEN {_L} = 0 THEN 80
            ELSE least({_L}, 24) * 32 - 12 + 48 END AS width,
       CASE WHEN {_L} = 0 THEN 76
            ELSE 80 * CAST(ceil({_L} / 24.0) AS bigint) - 4 END AS height,
       8 AS bit_depth
FROM documents
"""


def image_grid_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + 8x8 adaptive-pool intensity grid per image (the
    perceptual-hash-style feature that feeds embedding dedup). Raw
    array<double> surface — NOT a queries() entry (the driver's
    canonicalizer cannot hash list cells); the gate-safe scalar twin is
    `image_resize_feature` below, and the pool kernel itself is
    pytest-verified against a naive reference."""
    pages = _pages(spark, sf_dir).select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from paddleocr_spark.kernels.imageops import adaptive_avg_pool
        from paddleocr_spark.kernels.png import decode_gray_png

        for pdf in batches:
            urls, feats = [], []
            for url, b in zip(pdf["url"], pdf["html"]):
                img = decode_gray_png(bytes(b))
                grid = adaptive_avg_pool(img.astype(np.float64), 8, 8)
                urls.append(url)
                feats.append([float(x) for x in grid.ravel()])
            yield pd.DataFrame({"url": urls, "grid": feats})

    return pages.mapInPandas(run, schema="url string, grid array<double>")


def image_resize_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-decode feature scan with a STRICT oracle: per image the
    decoded dimensions and the exact global mean intensity. The mean
    depends on every pixel, so a hash-green row proves the whole
    render -> PNG encode -> decode chain bit-exactly; the renderer's ink
    budget is pure glyph arithmetic (16 px per font cell), which makes
    the expected mean plain SQL over `documents` (see
    IMAGE_RESIZE_FEATURE_SQL). The mean is an exact IEEE division of
    integers on both engines — no rounding needed."""
    pages = _pages(spark, sf_dir).select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from paddleocr_spark.kernels.imageops import adaptive_avg_pool
        from paddleocr_spark.kernels.png import decode_gray_png

        for pdf in batches:
            urls, ws, hs, means = [], [], [], []
            for url, b in zip(pdf["url"], pdf["html"]):
                img = decode_gray_png(bytes(b))
                # the pooled grid is computed on the same path (exercised
                # per batch, consumed by image_grid_features / dedup)
                adaptive_avg_pool(img.astype(np.float64), 8, 8)
                h, w = img.shape
                urls.append(url)
                ws.append(int(w))
                hs.append(int(h))
                means.append(float(img.mean()))
            yield pd.DataFrame(
                {"url": urls, "width": ws, "height": hs, "ink_mean": means}
            )

    return pages.mapInPandas(
        run, schema="url string, width long, height long, ink_mean double"
    )


def _image_resize_feature_sql() -> str:
    """Expected decode stats from documents alone: W/H follow the
    renderer arithmetic (same as IMAGE_META_SQL) and the ink pixel count
    is sum over chars of glyph-popcount * scale^2 (glyphs never overlap:
    advance 32px > glyph 20px; page mean = 255*(area-ink)/area since ink
    renders as 0 on a 255 background)."""
    from paddleocr_spark.kernels.font import GLYPHS

    terms = []
    for ch in sorted(set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")):
        pop = int(GLYPHS[ch].sum())
        terms.append(f"{pop} * (length(nt) - length(replace(nt, '{ch}', '')))")
    ink_cells = " + ".join(terms)
    return f"""
WITH n AS (
  SELECT concat('https://', source, '.example.test/doc/', CAST(doc_id AS string)) AS url,
         upper(substring(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'), 1, 120)) AS nt
  FROM documents
), dims AS (
  SELECT url, nt,
         CASE WHEN length(nt) = 0 THEN 80
              ELSE least(length(nt), 24) * 32 + 36 END AS width,
         CASE WHEN length(nt) = 0 THEN 76
              ELSE 80 * CAST(ceil(length(nt) / 24.0) AS bigint) - 4 END AS height,
         16 * ({ink_cells}) AS ink_px
  FROM n
)
SELECT url, width, height,
       CAST(255 * (width * height - ink_px) AS double) / (width * height) AS ink_mean
FROM dims
"""


IMAGE_RESIZE_FEATURE_SQL = _image_resize_feature_sql()


def frame_sample(spark: SparkSession, sf_dir: str, every: int = 2) -> DataFrame:
    """Multi-frame payloads -> one row per sampled frame (idx % every == 0)
    with per-frame dims. The modulo filter runs on the lightweight header
    walk BEFORE any pixel decode — the shape that matters for video at
    scale."""
    pages = _pages(spark, sf_dir, multipage=True).select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from paddleocr_spark.kernels.multipage import MAGIC
        from paddleocr_spark.kernels.pdf import pdf_page_dims

        rows = []
        for pdf in batches:
            for url, data in zip(pdf["url"], pdf["html"]):
                data = bytes(data)
                if data[:5] == b"%PDF-":
                    # real PDF corpus: dims come from the object
                    # DICTIONARIES (pdf_page_dims) — no image stream is
                    # sliced or decompressed for skipped OR kept frames
                    for idx, (w, h) in enumerate(pdf_page_dims(data)):
                        if idx % every == 0:
                            rows.append((url, idx, w, h))
                    continue
                assert data[:4] == MAGIC
                (count,) = struct.unpack(">I", data[4:8])
                pos = 8
                for idx in range(count):
                    (n,) = struct.unpack(">I", data[pos : pos + 4])
                    png = data[pos + 4 : pos + 4 + n]
                    pos += 4 + n
                    if idx % every:
                        continue
                    w, h, _ = png_meta(png)
                    rows.append((url, idx, w, h))
        yield pd.DataFrame(
            rows, columns=["url", "frame_idx", "width", "height"]
        )

    return pages.mapInPandas(
        run, schema="url string, frame_idx long, width long, height long"
    )


def _frame_sample_sql() -> str:
    # Multipage chunks of 120 chars over norm(text) @ 300; frames 0 and 2
    # survive every=2. Frame dims follow the same renderer arithmetic
    # per-chunk (chunk k length = clamp(L - 120k, 0, 120)).
    parts = []
    for k in (0, 2):
        ln = f"least(greatest({_L300} - {120 * k}, 0), 120)"
        parts.append(
            "SELECT concat('https://', source, '.example.test/doc/',"
            " CAST(doc_id AS string)) AS url,"
            f" CAST({k} AS bigint) AS frame_idx,"
            f" CASE WHEN {ln} = 0 THEN 80 ELSE least({ln}, 24) * 32 + 36 END AS width,"
            f" CASE WHEN {ln} = 0 THEN 76 ELSE 80 * CAST(ceil({ln} / 24.0) AS bigint) - 4 END AS height"
            " FROM documents"
            + (f" WHERE {_L300} > {120 * k}" if k else "")
        )
    return " UNION ALL ".join(parts)


_L300 = "length(upper(substring(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'), 1, 300)))"
FRAME_SAMPLE_SQL = _frame_sample_sql()


def media_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video feature extraction with the deterministic fake decoder:
    schema/batching/partitioning real, codec stubbed (rows-only check)."""
    pages = _pages(spark, sf_dir).select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [_decode_media(bytes(b), "audio", fake=True) for b in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "rms": [float(np.sqrt((s ** 2).mean())) for s in sigs],
                    "n_samples": [len(s) for s in sigs],
                }
            )

    return pages.mapInPandas(
        run, schema="url string, rms double, n_samples long"
    )


def multimodal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """image_meta + image_resize_feature + frame_sample as ONE
    union-tagged (op, k, v) gate row (board consolidation — the three
    standalone builders above stay the public API). The resize branch's
    ink_mean is a double, so the suite ships the exact integer numerator
    round(ink_mean * width * height) = 255*(area - ink_px): the division
    is a single correctly-rounded IEEE op on both engines, and numerator
    < 2^27 makes the round-trip through the double exact."""
    im = image_meta(spark, sf_dir).select(
        F.lit("image_meta").alias("op"),
        F.col("url").alias("k"),
        F.concat_ws("|", "width", "height", "bit_depth").alias("v"),
    )
    rz = image_resize_feature(spark, sf_dir).select(
        F.lit("resize_feature").alias("op"),
        F.col("url").alias("k"),
        F.concat_ws(
            "|",
            "width",
            "height",
            F.round(F.col("ink_mean") * F.col("width") * F.col("height"))
            .cast("long"),
        ).alias("v"),
    )
    fs = frame_sample(spark, sf_dir).select(
        F.lit("frame_sample").alias("op"),
        F.concat_ws("|", "url", "frame_idx").alias("k"),
        F.concat_ws("|", "width", "height").alias("v"),
    )
    return im.unionByName(rz).unionByName(fs)


MULTIMODAL_SUITE_SQL = f"""
SELECT 'image_meta' AS op, url AS k,
       width || '|' || height || '|' || bit_depth AS v
FROM ({IMAGE_META_SQL.strip()}) im
UNION ALL
SELECT 'resize_feature' AS op, url AS k,
       width || '|' || height || '|' ||
       CAST(round(ink_mean * width * height) AS BIGINT) AS v
FROM ({IMAGE_RESIZE_FEATURE_SQL.strip()}) rz
UNION ALL
SELECT 'frame_sample' AS op, url || '|' || frame_idx AS k,
       width || '|' || height AS v
FROM ({FRAME_SAMPLE_SQL.strip()}) fs
"""
