"""Real WAV/Y4M decoders (operators/media.py): byte-level roundtrips,
RIFF chunk-walk robustness, malformed rejection."""

import struct

import pytest

from paddleocr_spark.operators.media import (
    synth_wav,
    synth_y4m,
    wav_decode,
    wav_encode_pcm16,
    y4m_decode,
    y4m_encode,
)


def test_wav_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 123, -456]
    rate, got = wav_decode(wav_encode_pcm16(samples, rate=44100))
    assert rate == 44100 and got == samples


def test_wav_chunk_walk_skips_extra_chunks():
    payload = wav_encode_pcm16([10, -20, 30])
    # splice a LIST chunk (odd length -> exercises word-alignment)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, got = wav_decode(spliced)
    assert got == [10, -20, 30]


def test_wav_rejects_non_riff_and_stereo():
    with pytest.raises(ValueError):
        wav_decode(b"OggS" + b"\x00" * 40)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # stereo
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_y4m_roundtrip():
    frames = [bytes(range(32)), bytes(reversed(range(32)))]
    w, h, got = y4m_decode(y4m_encode(frames, 8, 4))
    assert (w, h) == (8, 4) and got == frames


def test_y4m_rejects_bad_magic_and_chroma():
    with pytest.raises(ValueError):
        y4m_decode(b"NOTY4M W8 H4\nFRAME\n" + bytes(32))
    with pytest.raises(ValueError):
        y4m_decode(b"YUV4MPEG2 W8 H4 C420\nFRAME\n" + bytes(48))


def test_synth_payloads_decode():
    for d in (0, 1, 63, 64, 127, 1000):
        rate, samples = wav_decode(synth_wav(d))
        assert rate == 8000 and len(samples) == 64 + d % 64
        w, h, frames = y4m_decode(synth_y4m(d))
        assert (w, h) == (8, 4) and len(frames) == 2 + d % 4
        assert all(len(f) == 32 for f in frames)


def test_y4m_rejects_truncated_frame():
    good = y4m_encode([bytes(32)], 8, 4)
    with pytest.raises(ValueError):
        y4m_decode(good[:-5])
