"""Real audio/video decode operators over opaque binary columns.

Round 1 carried a declared codec stub (`multimodal._decode_media`) for
audio/video because no codec LIBRARY ships in this container — but two
production container formats need none: RIFF/WAVE PCM (audio) and
YUV4MPEG2 / .y4m (raw video) are pure struct/ASCII layouts. This module
implements genuine byte-level decoders for both with stdlib only, so the
multimodal family's decode stage is real end-to-end for uncompressed
media; `_decode_media` remains the documented swap point for compressed
codecs (mp3/h264 -> soundfile/PyAV).

Pipeline shape (the part that matters at 100 TB): payloads stay opaque
bytes through the scan; decode happens inside one Arrow-batched
mapInPandas; features are integer-exact accumulations (sum of squares /
sum of luma as int64) so the strict DuckDB oracle reproduces them
closed-form from the deterministic fixture synthesis.

Fixture synthesis (same policy as sources/pages.py: derive everything
from doc_id):
- audio: 16-bit mono PCM, rate 8000, n = 64 + doc_id%64 samples,
  sample[i] = (doc_id*31 + i*17) % 2048 - 1024.
- video: W=8, H=4, n_frames = 2 + doc_id%4, C420-less mono plane
  (luma only in our synthesis uses YUV4MPEG2 'Cmono'),
  luma[f][p] = (doc_id*13 + f*7 + p) % 256.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# RIFF/WAVE PCM

_RATE = 8000


def wav_encode_pcm16(samples: list[int], rate: int = _RATE) -> bytes:
    """Minimal canonical RIFF/WAVE: 'fmt ' (PCM, mono, 16-bit) + 'data'."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) from RIFF/WAVE PCM16 mono bytes. A real
    chunk walk: tolerates extra chunks (LIST/fact), validates magic,
    format tag, depth."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    samples: list[int] | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, depth = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or channels != 1 or depth != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = [
                struct.unpack("<h", body[i : i + 2])[0]
                for i in range(0, len(body) - len(body) % 2, 2)
            ]
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synth_wav(doc_id: int) -> bytes:
    n = 64 + doc_id % 64
    return wav_encode_pcm16(
        [(doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)]
    )


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m)

_VW, _VH = 8, 4


def y4m_encode(frames: list[bytes], w: int, h: int) -> bytes:
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
    out = [head]
    for f in frames:
        assert len(f) == w * h
        out.append(b"FRAME\n" + f)
    return b"".join(out)


def y4m_decode(payload: bytes):
    """(width, height, frames) from YUV4MPEG2 mono bytes — real stream
    header + per-frame marker parsing."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "strict").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {p[0]: p[1:] for p in head[1:] if p}
    w, h = int(params["W"]), int(params["H"])
    if params.get("C", "420") != "mono":
        raise ValueError("only Cmono supported")
    frames = []
    pos = nl + 1
    size = w * h
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        frame = payload[fnl + 1 : fnl + 1 + size]
        if len(frame) != size:
            # partial upload in a landing zone cuts mid-frame; a short
            # plane must fail the row, not yield a silently wrong sum
            raise ValueError(
                f"truncated frame: {len(frame)} of {size} bytes"
            )
        frames.append(frame)
        pos = fnl + 1 + size
    return w, h, frames


def synth_y4m(doc_id: int) -> bytes:
    n_frames = 2 + doc_id % 4
    frames = [
        bytes((doc_id * 13 + f * 7 + p) % 256 for p in range(_VW * _VH))
        for f in range(n_frames)
    ]
    return y4m_encode(frames, _VW, _VH)


# ---------------------------------------------------------------------------
# queries


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize WAV payloads (binary column), then REAL-decode them and
    emit integer-exact features: n_samples, sample_rate, sum of squared
    samples (int64), and rms = sqrt(sum_sq/n) — the division and sqrt
    are single IEEE ops, identical on both engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate, samples = wav_decode(synth_wav(d))
                n = len(samples)
                ssq = sum(s * s for s in samples)
                rows.append((d, n, rate, ssq, math.sqrt(ssq / n)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "sum_sq", "rms"],
            )

    return docs.mapInPandas(
        run,
        schema=("doc_id long, n_samples long, sample_rate long, "
                "sum_sq long, rms double"),
    )


AUDIO_FEATURES_SQL = """
WITH s AS (
  SELECT d.doc_id,
         64 + d.doc_id % 64 AS n,
         (d.doc_id * 31 + g.i * 17) % 2048 - 1024 AS x
  FROM documents d, generate_series(0, 127) g(i)
  WHERE g.i < 64 + d.doc_id % 64
)
SELECT doc_id,
       CAST(n AS bigint) AS n_samples,
       CAST(8000 AS bigint) AS sample_rate,
       CAST(sum(x * x) AS bigint) AS sum_sq,
       sqrt(CAST(sum(x * x) AS bigint) / CAST(n AS double)) AS rms
FROM s GROUP BY doc_id, n
"""


def video_keyframes(spark: SparkSession, sf_dir: str, every: int = 2) -> DataFrame:
    """Synthesize Y4M payloads, REAL-decode the stream, sample every
    k-th frame, emit per-sampled-frame integer luma sums. Frame markers
    are walked before any pixel math — at scale, skipped frames cost a
    seek, not a decode."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, frames = y4m_decode(synth_y4m(d))
                for idx in range(0, len(frames), every):
                    rows.append((d, idx, w, h, sum(frames[idx])))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height", "luma_sum"],
            )

    return docs.mapInPandas(
        run,
        schema=("doc_id long, frame_idx long, width long, height long, "
                "luma_sum long"),
    )


VIDEO_KEYFRAMES_SQL = """
WITH f AS (
  SELECT d.doc_id, g.f AS frame_idx
  FROM documents d, generate_series(0, 5) g(f)
  WHERE g.f < 2 + d.doc_id % 4 AND g.f % 2 = 0
)
SELECT f.doc_id,
       CAST(f.frame_idx AS bigint) AS frame_idx,
       CAST(8 AS bigint) AS width,
       CAST(4 AS bigint) AS height,
       CAST(sum((f.doc_id * 13 + f.frame_idx * 7 + g.p) % 256) AS bigint) AS luma_sum
FROM f, generate_series(0, 31) g(p)
GROUP BY f.doc_id, f.frame_idx
"""
