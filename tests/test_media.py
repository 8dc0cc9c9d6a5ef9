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


class TestGifCodec:
    """GIF87a/89a + LZW pins (operators/media.py): variable-width codes
    (GIF late change), CLEAR/cap reset, cScSc, interlace, extensions."""

    def test_lzw_roundtrip_forces_width_bumps(self):
        import random

        from paddleocr_spark.operators.media import _lzw_decode, _lzw_encode

        rng = random.Random(1)
        for n, alpha, mcs in [(10, 4, 2), (300, 8, 3), (6000, 16, 4)]:
            data = bytes(rng.randrange(alpha) for _ in range(n))
            assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data

    def test_lzw_roundtrip_through_4096_cap_reset(self):
        import random

        rng = random.Random(2)
        from paddleocr_spark.operators.media import _lzw_decode, _lzw_encode

        data = bytes(rng.randrange(64) for _ in range(40_000))
        assert _lzw_decode(_lzw_encode(data, 6), 6) == data

    def test_lzw_cscsc_repetitive_input(self):
        from paddleocr_spark.operators.media import _lzw_decode, _lzw_encode

        data = b"\x01\x01\x01\x01\x01\x01" + b"\x02\x03" * 2000
        assert _lzw_decode(_lzw_encode(data, 3), 3) == data

    def test_gif_container_roundtrip_with_interlace_and_extensions(self):
        from paddleocr_spark.operators.media import (
            _GIF_COLORS,
            gif_decode,
            synth_gif,
        )

        for d in range(40):
            w, h = 10 + d % 7, 6 + d % 5
            gw, gh, palette, frames = gif_decode(synth_gif(d))
            assert (gw, gh) == (w, h)
            assert len(palette) == _GIF_COLORS
            assert len(frames) == 1 + d % 3
            for f, fr in enumerate(frames):
                # odd frames were STORED interlaced; decode must return
                # raster order regardless
                assert fr == bytes(
                    (d * 7 + f * 5 + p) % _GIF_COLORS for p in range(w * h)
                ), (d, f)

    def test_gif_fails_loudly_on_chopped_container(self):
        import pytest

        from paddleocr_spark.operators.media import gif_decode, synth_gif

        payload = synth_gif(3)
        with pytest.raises((ValueError, IndexError)):
            gif_decode(payload[:40] + b"\x00\x3b")

    def test_gif_rejects_short_pixel_data(self):
        import struct

        import pytest

        from paddleocr_spark.operators.media import _lzw_encode, gif_decode

        w, h = 4, 3
        stream = _lzw_encode(bytes([0, 1, 2, 3] * 2), 2)  # 8 of 12 px
        gif = (
            b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x81, 0, 0])
            + bytes(12)  # 4-entry global color table
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + bytes([2, len(stream)]) + stream + b"\x00\x3b"
        )
        with pytest.raises(ValueError, match="truncated image data"):
            gif_decode(gif)

    def test_gif_rejects_non_gif(self):
        import pytest

        from paddleocr_spark.operators.media import gif_decode

        with pytest.raises(ValueError):
            gif_decode(b"\x89PNG\r\n\x1a\nnot a gif")
