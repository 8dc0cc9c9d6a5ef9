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


class TestJpegCodec:
    """Baseline JPEG pins (kernels/jpeg.py): marker walk, canonical
    Huffman from DHT, DC prediction, EOB/ZRL, dequant + IDCT."""

    def test_coefficient_roundtrip_random_blocks(self):
        import random

        from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

        rng = random.Random(3)
        quant = [16] + [8 + (k * 3) % 17 for k in range(1, 64)]
        for trial in range(15):
            nx, ny = rng.randrange(1, 5), rng.randrange(1, 5)
            blocks = []
            for b in range(nx * ny):
                blk = [rng.randrange(-64, 64)] + [0] * 63
                for j in rng.sample(range(1, 64), rng.randrange(0, 12)):
                    blk[j] = rng.randrange(-255, 256) or 7
                blocks.append(blk)
            w, h, q, dec, _ = jpeg_decode(
                jpeg_encode_blocks(blocks, nx, ny, quant)
            )
            assert (w, h, q) == (nx * 8, ny * 8, quant)
            assert dec == blocks, trial

    def test_dc_only_blocks_decode_flat(self):
        from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

        quant = [16] + [10] * 63
        for dc in (-32, -1, 0, 1, 31):
            blocks = [[dc] + [0] * 63]
            _, _, _, _, px = jpeg_decode(jpeg_encode_blocks(blocks, 1, 1, quant))
            assert (px == 2 * dc + 128).all(), dc

    def test_zrl_long_zero_runs(self):
        from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

        quant = [16] + [10] * 63
        # a lone coefficient at zigzag index 40: forces ZRL emission
        blk = [5] + [0] * 63
        blk[40] = -9
        _, _, _, dec, _ = jpeg_decode(jpeg_encode_blocks([blk], 1, 1, quant))
        assert dec == [blk]

    def test_rejects_unsupported_frames(self):
        import pytest

        from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

        quant = [16] + [10] * 63
        payload = bytearray(jpeg_encode_blocks([[0] * 64], 1, 1, quant))
        i = payload.index(b"\xff\xc0")
        payload[i + 1] = 0xC3  # lossless sequential: out of scope
        with pytest.raises(ValueError, match="SOF0/SOF2"):
            jpeg_decode(bytes(payload))
        # a baseline stream RELABELED progressive is malformed: its one
        # full-band scan is not a valid Annex G DC scan
        payload[i + 1] = 0xC2
        with pytest.raises(ValueError, match="Se=0"):
            jpeg_decode(bytes(payload))
        with pytest.raises(ValueError, match="SOI"):
            jpeg_decode(b"GIF89a")

    def test_byte_stuffing_survives_ff_in_entropy_data(self):
        import random

        from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

        # dense random AC data reliably produces 0xFF bytes in the
        # entropy stream; the stuffing/unstuffing pair must be lossless
        rng = random.Random(4)
        quant = [16] + [10] * 63
        blocks = [
            [rng.randrange(-200, 200) for _ in range(64)] for _ in range(16)
        ]
        payload = jpeg_encode_blocks(blocks, 4, 4, quant)
        assert b"\xff\x00" in payload  # stuffing actually occurred
        _, _, _, dec, _ = jpeg_decode(payload)
        assert dec == blocks

    def test_suite_fixture_synthesis_matches_formulas(self):
        from paddleocr_spark.kernels.jpeg import jpeg_decode
        from paddleocr_spark.operators.media import synth_jpeg, synth_jpeg_blocks

        for d in range(25):
            blocks, nx, ny = synth_jpeg_blocks(d)
            w, h, _, dec, px = jpeg_decode(synth_jpeg(d))
            assert (w, h) == (nx * 8, ny * 8)
            assert dec == blocks
            # closed-form oracle formulas for the suite metrics
            m1 = sum(sum(abs(c) for c in blk) for blk in blocks)
            assert m1 == sum(
                abs((d * 5 + b * 7) % 64 - 32) for b in range(nx * ny)
            ) + sum(
                abs((d + b * 3 + j * 11) % 15 - 7)
                for b in range(nx * ny) if b % 2 == 1
                for j in range(1, 6)
            )


class TestPdfCodec:
    """PDF container pins (kernels/pdf.py): object-graph walk from the
    trailer, stream extraction, Flate/DCT filters, page-tree order."""

    def test_roundtrip_embedded_jpegs(self):
        from paddleocr_spark.kernels.jpeg import jpeg_decode
        from paddleocr_spark.kernels.pdf import pdf_decode_pages, pdf_encode_pages
        from paddleocr_spark.operators.media import synth_jpeg

        for d in range(12):
            jpegs = [synth_jpeg(d + k) for k in range(1 + d % 3)]
            pages = pdf_decode_pages(pdf_encode_pages(jpegs))
            assert [p[3] for p in pages] == jpegs, d
            for w, h, filt, jpeg, content in pages:
                assert filt == "DCTDecode"
                jw, jh, _, _, _ = jpeg_decode(jpeg)
                assert (w, h) == (jw, jh)
                # Flate content stream decompressed to the draw operator
                assert content == b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)

    def test_lossless_gray_pages_roundtrip(self):
        import numpy as np

        from paddleocr_spark.kernels.multipage import decode_payload
        from paddleocr_spark.kernels.pdf import (
            pdf_decode_pages,
            pdf_encode_gray_pages,
        )

        rng = np.random.RandomState(5)
        imgs = [
            rng.randint(0, 256, (h, w)).astype(np.uint8)
            for w, h in ((20, 12), (8, 8), (33, 7))
        ]
        payload = pdf_encode_gray_pages(imgs)
        pages = pdf_decode_pages(payload)
        assert [p[2] for p in pages] == ["FlateDecode"] * 3
        for (w, h, _f, data, _c), img in zip(pages, imgs):
            assert (h, w) == img.shape
            assert data == img.tobytes()  # byte-exact, no loss
        # and the pipeline's payload dispatcher takes the PDF directly
        decoded = decode_payload(payload)
        assert all((a == b).all() for a, b in zip(decoded, imgs))
        assert len(decode_payload(payload, page_limit=2)) == 2

    def test_xref_table_offsets_are_real(self):
        import re

        from paddleocr_spark.kernels.pdf import pdf_encode_pages
        from paddleocr_spark.operators.media import synth_jpeg

        payload = pdf_encode_pages([synth_jpeg(1)])
        m = re.search(rb"startxref\n(\d+)\n%%EOF", payload)
        xref_pos = int(m.group(1))
        assert payload[xref_pos : xref_pos + 4] == b"xref"
        # every recorded offset points at "N 0 obj"
        body = payload[xref_pos:].split(b"trailer")[0]
        entries = re.findall(rb"(\d{10}) 00000 n", body)
        for i, off in enumerate(entries, start=1):
            at = int(off)
            assert re.match(rb"%d 0 obj" % i, payload[at:]), i

    def test_rejects_non_pdf_and_encrypted(self):
        import pytest

        from paddleocr_spark.kernels.pdf import pdf_decode_pages, pdf_encode_pages
        from paddleocr_spark.operators.media import synth_jpeg

        with pytest.raises(ValueError, match="not a PDF"):
            pdf_decode_pages(b"GIF89a whatever")
        payload = pdf_encode_pages([synth_jpeg(2)])
        tampered = payload.replace(
            b"/Root", b"/Encrypt 9 0 R /Root", 1
        )
        with pytest.raises(ValueError, match="encrypted"):
            pdf_decode_pages(tampered)

    def test_decoder_does_not_assume_writer_layout(self):
        """Renumber objects by prepending a dummy object: the graph walk
        from the trailer must still find everything."""
        from paddleocr_spark.kernels.pdf import pdf_decode_pages, pdf_encode_pages
        from paddleocr_spark.operators.media import synth_jpeg

        payload = pdf_encode_pages([synth_jpeg(3)])
        head, rest = payload.split(b"1 0 obj", 1)
        # insert an unreferenced object with a number far past the others
        spliced = head + b"99 0 obj\n<< /Ignore true >>\nendobj\n1 0 obj" + rest
        pages = pdf_decode_pages(spliced)
        assert len(pages) == 1


def test_jpeg_nonzero_huffman_table_ids():
    """SOS Td/Ta selector is byte 2 of the scan header (Ns Cs TdTa...):
    a conformant baseline JPEG whose DHT tables carry id 1 must decode
    identically to the id-0 encoding (regression: the parser read the
    Ss byte as the selector and only table id 0 ever worked)."""
    from paddleocr_spark.kernels.jpeg import jpeg_decode, jpeg_encode_blocks

    blocks = [[5] + [0] * 63, [-3] + [0] * 63]
    quant = [16] + [10] * 63
    payload = bytearray(jpeg_encode_blocks(blocks, 2, 1, quant))
    # rewrite every DHT table id 0 -> 1 and point the SOS selector at it
    i = 0
    while True:
        i = payload.find(b"\xff\xc4", i)
        if i < 0:
            break
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        p = i + 4
        while p < i + 2 + seglen:
            cls = payload[p] >> 4
            payload[p] = (cls << 4) | 1
            p += 17 + sum(payload[p + 1 : p + 17])
        i += 2 + seglen
    sos = payload.find(b"\xff\xda")
    payload[sos + 6] = 0x11  # TdTa byte: table 1 for DC and AC
    _, _, _, dec, _ = jpeg_decode(bytes(payload))
    assert [b[0] for b in dec] == [5, -3]


def test_pdf_page_limit_bounds_decode():
    """page_limit must stop the page-tree walk BEFORE decoding pages
    past the cap: a PDF whose later page is corrupt still decodes the
    capped prefix (regression: the cap only truncated the result after
    every page had been decompressed)."""
    import numpy as np

    from paddleocr_spark.kernels.multipage import decode_payload
    from paddleocr_spark.kernels.pdf import pdf_encode_gray_pages

    imgs = [np.full((8, 8), i, dtype=np.uint8) for i in range(3)]
    payload = bytearray(pdf_encode_gray_pages(imgs))
    # corrupt the LAST page's image stream bytes in place (zlib stream
    # for the 0xFF*64 page starts after the last /Filter /FlateDecode)
    import zlib

    last = zlib.compress(imgs[2].tobytes())
    off = bytes(payload).rindex(last)
    payload[off : off + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(Exception):
        decode_payload(bytes(payload))
    pages = decode_payload(bytes(payload), page_limit=2)
    assert len(pages) == 2
    assert pages[0][0][0] == 0 and pages[1][0][0] == 1


# -- MIME sniffing --------------------------------------------------------------

def test_sniff_mime_all_kinds_and_fallbacks():
    """Every real synthesized payload family sniffs to its true type
    with the exact magic length; unmatched payloads fall to text/plain
    or application/octet-stream per the WHATWG binary-byte rule; HTML
    tag detection requires the space/'>' terminator."""
    from paddleocr_spark.operators.media import (
        _MIME_KINDS,
        _synth_kind,
        sniff_mime,
    )

    for kind, mime, maglen in _MIME_KINDS:
        payload = _synth_kind(kind, 7, "Some Words Here", "alpha")
        assert sniff_mime(payload) == (mime, maglen), kind
    assert sniff_mime(b"just plain words\n") == ("text/plain", 0)
    assert sniff_mime(b"\x00\x01binary") == ("application/octet-stream", 0)
    # 0x7F DEL is NOT a WHATWG binary byte — text with a stray DEL
    # stays on the text path
    assert sniff_mime(b"text with \x7f del") == ("text/plain", 0)
    # leading whitespace skipped, case-insensitive, terminator required
    assert sniff_mime(b"  \t<HTML ><body>x") == ("text/html", 0)
    assert sniff_mime(b"<htmlx>") == ("text/plain", 0)
    assert sniff_mime(b"<!-- comment -->") == ("text/html", 0)
    # RIFF without WAVE is not audio
    assert sniff_mime(b"RIFF1234AVI LIST") == ("text/plain", 0)


def test_sniff_mime_fuzz_never_crashes_and_magic_wins():
    """Property: sniff_mime total on arbitrary bytes (returns one of
    the known labels, never raises), and a known magic prefix always
    wins regardless of the trailing garbage."""
    import random

    from paddleocr_spark.operators.media import sniff_mime

    rng = random.Random(99)
    labels = {
        "image/gif", "image/png", "image/jpeg", "application/pdf",
        "application/gzip", "audio/wav", "video/x-yuv4mpeg",
        "text/html", "text/plain", "application/octet-stream",
    }
    magics = [
        (b"GIF89a", "image/gif"),
        (b"\x89PNG\r\n\x1a\n", "image/png"),
        (b"\xff\xd8\xff", "image/jpeg"),
        (b"%PDF-", "application/pdf"),
        (b"\x1f\x8b", "application/gzip"),
        (b"YUV4MPEG2", "video/x-yuv4mpeg"),
    ]
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        mime, maglen = sniff_mime(blob)
        assert mime in labels and maglen >= 0
        magic, want = magics[rng.randrange(len(magics))]
        mime2, _ = sniff_mime(magic + blob)
        assert mime2 == want
    # empty payload is text/plain (no binary bytes, no magic)
    assert sniff_mime(b"") == ("text/plain", 0)


def test_vad_segments_islands():
    from paddleocr_spark.operators.media import vad_segments

    # runs: [600,700,512,513] kept; [9999] too short; trailing run kept
    # via the sentinel; negatives count by magnitude
    xs = [0, 600, -700, 512, 513, 0, 9999, 0, 0, -600, -601, 602, 603]
    got = vad_segments(xs, threshold=512, min_run=4)
    assert got == [
        (1, 5, 700, 600 + 700 + 512 + 513),
        (9, 13, 603, 600 + 601 + 602 + 603),
    ]
    # exact-boundary threshold: 511 below, 512 at
    assert vad_segments([511] * 8) == []
    assert vad_segments([512] * 4) == [(0, 4, 512, 2048)]
    # min_run boundary: 3-sample run dropped
    assert vad_segments([512, 512, 512]) == []
    assert vad_segments([]) == []


class TestPdfTextLayer:
    """Born-digital content-stream extraction (kernels/pdf.py
    pdf_encode_text_pages / extract_content_text / pdf_text_pages)."""

    def test_fixture_roundtrip_all_forms(self):
        from paddleocr_spark.kernels.pdf import pdf_text_pages
        from paddleocr_spark.operators.media import synth_text_pdf

        # doc_ids 0..7 cycle every (form, page-count) combination
        for d in range(8):
            payload, want = synth_text_pdf(d)
            assert pdf_text_pages(payload) == want

    def test_scan_pages_route_to_none(self):
        from paddleocr_spark.kernels.pdf import pdf_text_pages
        from paddleocr_spark.operators.media import synth_pdf

        assert pdf_text_pages(synth_pdf(7)) == [None, None]

    def test_literal_escapes_and_continuation(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        s = rb"BT (a\(b\)c\\d\ne\164f\51) Tj (cont\
inued) Tj ET"
        # \164 is octal for 't', \51 for ')'; \( \) \\ \n named escapes
        assert extract_content_text(s) == "a(b)c\\d\netf)continued"

    def test_octal_boundary_and_overflow(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        # \0053 = \005 then '3' (3-digit max); \53 = '+' (2-digit stops
        # at non-octal); \400 wraps to 0x00 per the &0xFF truncation
        assert extract_content_text(
            rb"BT (\0053\53x\400y) Tj ET"
        ) == "\x053+x\x00y"

    def test_raw_eol_inside_literal_normalizes(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        assert extract_content_text(
            b"BT (a\rb\r\nc\nd) Tj ET"
        ) == "a\nb\nc\nd"

    def test_hex_whitespace_and_odd_digit_pad(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        # "AB" = 0x41 0x42; trailing odd digit 5 pads to 0x50 = 'P'
        assert extract_content_text(b"BT <41\n 4 2 5> Tj ET") == "ABP"

    def test_tj_kern_space_threshold(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        # -90 is glyph kerning (no char); -200 is the space-as-kern
        # idiom (exactly -180 also a space, boundary inclusive)
        assert extract_content_text(
            b"BT [(AB) -90 (CD) -200 (EF) -180 (G) -179.5 (H)] TJ ET"
        ) == "ABCD EF GH"

    def test_line_advance_operators(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        # Td with ty!=0 breaks the line; Td with ty=0 does not; T* and
        # ' always advance; " shows with word/char spacing operands
        assert extract_content_text(
            b"BT 72 720 Td (a) Tj 5 0 Td (b) Tj 0 -14 Td (c) Tj "
            b"T* (d) Tj (e) ' 1 2 (f) \" ET"
        ) == "ab\nc\nd\ne\nf"

    def test_unknown_ops_and_graphics_ignored(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        assert extract_content_text(
            b"q 1 0 0 1 10 10 cm /G0 gs % comment (not a string)\n"
            b"BT /F1 12 Tf (x) Tj ET Q"
        ) == "x"

    def test_no_text_returns_none(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        assert extract_content_text(b"q 100 0 0 50 0 0 cm /Im0 Do Q") is None

    def test_unterminated_string_raises(self):
        from paddleocr_spark.kernels.pdf import extract_content_text

        with pytest.raises(ValueError):
            extract_content_text(b"BT (never closed Tj ET")


def test_packbits_edge_cases():
    from paddleocr_spark.operators.media import (
        _packbits_decode,
        _packbits_encode,
    )

    cases = [
        b"",
        b"\x00",
        b"a" * 3,            # minimal run
        b"a" * 128,          # max repeat packet
        b"a" * 129,          # run split across packets
        b"abc" * 50,         # pure literals split at 128
        b"ab" + b"c" * 200 + b"de",  # literal-run-literal
    ]
    for c in cases:
        assert _packbits_decode(_packbits_encode(c)) == c, c[:16]
    # decoder handles the 128 noop byte
    assert _packbits_decode(b"\x80\x00a") == b"a"


def test_tiff_variants_and_sniff():
    from paddleocr_spark.operators.media import (
        sniff_mime,
        synth_tiff,
        tiff_decode,
        tiff_encode,
    )

    px = bytes((i * 7) % 256 for i in range(11 * 9))
    for be in (False, True):
        for pb in (False, True):
            payload = tiff_encode(px, 11, 9, big_endian=be, packbits=pb)
            assert tiff_decode(payload) == (11, 9, px), (be, pb)
            assert sniff_mime(payload) == ("image/tiff", 4)
    # multi-strip boundary: height not a multiple of rows-per-strip
    px2 = bytes(range(5 * 5))
    assert tiff_decode(
        tiff_encode(px2, 5, 5, big_endian=False, packbits=True)
    ) == (5, 5, px2)
    # fixture coverage: both endians and both compressions occur
    seen = set()
    for d in range(6):
        payload, *_ = synth_tiff(d)
        seen.add((payload[:2], payload[2:4]))
    assert {b"II", b"MM"} == {s[0] for s in seen}


def test_tiff_rejects_non_tiff_and_truncated():
    import pytest as _pytest

    from paddleocr_spark.operators.media import synth_tiff, tiff_decode

    with _pytest.raises(ValueError, match="byte-order"):
        tiff_decode(b"XX\x00*rest")
    payload, w, h, px = synth_tiff(3)
    with _pytest.raises(Exception):
        tiff_decode(payload[: len(payload) // 2])


def test_exif_roundtrip_both_endians():
    from paddleocr_spark.operators.media import exif_build, exif_parse

    for big in (False, True):
        app1 = exif_build(
            6, "2026:01:02 03:04:05", ((12, 1), (34, 1), (5678, 100)), big
        )
        jpeg = b"\xff\xd8\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
        # terminate the marker stream so the walk stops cleanly
        jpeg += b"\xff\xda"
        m = exif_parse(jpeg)
        assert m["orientation"] == 6
        assert m["datetime"] == "2026:01:02 03:04:05"
        assert m["gps"] == [(12, 1), (34, 1), (5678, 100)]
        assert m["big_endian"] is big


def test_exif_strip_gps_is_surgical():
    from paddleocr_spark.operators.media import (
        EXIF_GPS_DELTA,
        exif_parse,
        exif_strip_gps,
        synth_exif_jpeg,
        _jpeg_metrics,
    )

    for d in (0, 3, 9):  # GPS-bearing payloads
        p = synth_exif_jpeg(d)
        s = exif_strip_gps(p)
        assert len(p) - len(s) == EXIF_GPS_DELTA
        after = exif_parse(s)
        assert after["gps"] is None
        assert after["orientation"] == 1 + d % 8
        assert _jpeg_metrics(s) == _jpeg_metrics(p)
        # idempotence: a second strip is byte-identical
        assert exif_strip_gps(s) == s


def test_exif_strip_passthrough_without_gps():
    from paddleocr_spark.operators.media import (
        exif_strip_gps,
        synth_exif_jpeg,
        synth_jpeg,
    )

    p = synth_exif_jpeg(1)  # 1 % 3 != 0: no GPS
    assert exif_strip_gps(p) == p
    # no Exif at all: plain JPEG passes through untouched
    plain = synth_jpeg(4)
    assert exif_strip_gps(plain) == plain


def test_exif_parse_none_on_plain_jpeg():
    from paddleocr_spark.operators.media import exif_parse, synth_jpeg

    assert exif_parse(synth_jpeg(7)) is None


def test_shot_fixture_separation_bounds():
    """Within-scene SAD stays under the threshold, cross-scene SAD
    clears it, for a spread of doc ids — the separation argument the
    runner's cut-count assert relies on."""
    from paddleocr_spark.operators.media import (
        SHOT_THRESHOLD,
        synth_shots,
        y4m_decode,
    )

    for d in range(0, 40, 7):
        _w, _h, frames = y4m_decode(synth_shots(d))
        k = 2 + d % 3
        for f in range(len(frames) - 1):
            sad = sum(
                abs(a - b) for a, b in zip(frames[f], frames[f + 1])
            )
            is_cut = (f + 1) % k == 0
            if is_cut:
                assert sad >= SHOT_THRESHOLD, (d, f, sad)
            else:
                assert sad < SHOT_THRESHOLD, (d, f, sad)


def test_shot_boundary_counts():
    from paddleocr_spark.operators.media import synth_shots, y4m_decode

    _w, _h, frames = y4m_decode(synth_shots(5))
    # d=5: k=2+5%3=4, n=6+5%4=7 frames -> cuts at f=4 (boundary 3->4)
    assert len(frames) == 7


class TestProgressiveJpeg:
    """SOF2 decode: spectral selection + successive approximation
    (T.81 Annex G), single-component scope."""

    def test_progressive_roundtrip_equals_baseline(self):
        import numpy as np

        from paddleocr_spark.kernels.jpeg import (
            jpeg_decode,
            jpeg_encode_blocks,
            jpeg_encode_blocks_progressive,
        )

        rng = np.random.default_rng(3)
        quant = [16] + [10] * 63
        for trial in range(25):
            nx, ny = int(rng.integers(1, 5)), int(rng.integers(1, 4))
            blocks = []
            for _ in range(nx * ny):
                blk = [int(rng.integers(-60, 60))] + [0] * 63
                for _ in range(int(rng.integers(0, 12))):
                    blk[int(rng.integers(1, 64))] = int(rng.integers(-9, 10))
                blocks.append(blk)
            if trial % 5 == 0:
                blocks[0] = [0] * 64  # all-zero band -> EOB run
            if trial % 7 == 0:
                b = [0] * 64
                b[63] = 1  # newly-significant AT the band end
                blocks[len(blocks) // 2] = b
            base = jpeg_decode(jpeg_encode_blocks(blocks, nx, ny, quant))
            prog = jpeg_decode(
                jpeg_encode_blocks_progressive(blocks, nx, ny, quant)
            )
            assert prog[3] == blocks == base[3]
            assert np.array_equal(prog[4], base[4])

    def test_fixture_is_really_sof2_with_four_scans(self):
        from paddleocr_spark.operators.media import synth_jpeg_prog

        payload = synth_jpeg_prog(7)
        assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
        assert payload.count(b"\xff\xda") == 4

    def test_fixture_features_match_baseline_fixture(self):
        from paddleocr_spark.operators.media import (
            _jpeg_metrics,
            synth_jpeg,
            synth_jpeg_prog,
        )

        for d in range(12):
            assert _jpeg_metrics(synth_jpeg_prog(d)) == _jpeg_metrics(
                synth_jpeg(d)
            )


class TestImaAdpcm:
    """IMA ADPCM (WAV tag 0x11): step/index table semantics, block
    layout, exact headers, error bounds, container round-trip."""

    def test_roundtrip_random_walk_error_bounded_by_step(self):
        import random

        from paddleocr_spark.operators.media import adpcm_decode, adpcm_encode

        rng = random.Random(5)
        for _ in range(6):
            n = rng.randrange(50, 700)
            s, samples = 0, []
            for _ in range(n):
                s = max(-32768, min(32767, s + rng.randrange(-300, 301)))
                samples.append(s)
            rate, got = adpcm_decode(adpcm_encode(samples))
            assert rate == 8000 and len(got) == n
            assert max(abs(a - b) for a, b in zip(samples, got)) < 1500

    def test_block_start_samples_exact(self):
        from paddleocr_spark.operators.media import adpcm_decode, adpcm_encode

        samples = [((i * 91) % 5000) - 2500 for i in range(400)]
        _, got = adpcm_decode(adpcm_encode(samples, block_samples=129))
        for b0 in range(0, 400, 129):
            assert got[b0] == samples[b0]

    def test_fact_chunk_trims_final_block_padding(self):
        from paddleocr_spark.operators.media import adpcm_decode, adpcm_encode

        for n in (1, 2, 128, 129, 130, 257):
            samples = [(i * 13) % 800 - 400 for i in range(n)]
            _, got = adpcm_decode(adpcm_encode(samples, block_samples=129))
            assert len(got) == n, n

    def test_step_index_clamps_at_extremes(self):
        from paddleocr_spark.operators.media import (
            _ima_step,
            adpcm_decode,
            adpcm_encode,
        )

        # max-magnitude nibbles must pin the index at 88, minimum at 0
        pred, idx = 0, 0
        for _ in range(40):
            pred, idx = _ima_step(pred, idx, 7)
        assert idx == 88
        for _ in range(100):
            pred, idx = _ima_step(pred, idx, 0)
        assert idx == 0
        # full-scale square wave survives (saturating arithmetic)
        samples = ([32767] * 40 + [-32768] * 40) * 3
        _, got = adpcm_decode(adpcm_encode(samples))
        assert len(got) == len(samples)
        assert all(-32768 <= v <= 32767 for v in got)

    def test_rejects_even_block_and_foreign_payloads(self):
        import pytest

        from paddleocr_spark.operators.media import (
            adpcm_decode,
            adpcm_encode,
            wav_decode,
        )

        with pytest.raises(ValueError, match="odd"):
            adpcm_encode([0, 1, 2], block_samples=4)
        with pytest.raises(ValueError):
            adpcm_decode(b"OggS" + b"\x00" * 64)
        # the PCM16 decoder must refuse an ADPCM payload, not mis-decode
        payload = adpcm_encode([0, 100, 200])
        with pytest.raises(ValueError, match="PCM16"):
            wav_decode(payload)

    def test_fixture_tolerance_pinned(self):
        from paddleocr_spark.operators.media import (
            ADPCM_TOL,
            adpcm_decode,
            adpcm_encode,
            synth_adpcm_samples,
        )

        worst = 0
        for d in range(0, 500, 7):
            samples = synth_adpcm_samples(d)
            _, got = adpcm_decode(adpcm_encode(samples, block_samples=129))
            worst = max(
                worst, max(abs(a - b) for a, b in zip(samples, got))
            )
        assert worst <= ADPCM_TOL, worst


class TestMpeg1LayerI:
    """MPEG-1 Audio Layer I bitstream codec (ISO/IEC 11172-3 framing +
    2.4.3.3 subband dequantization); PCM synthesis stays out of scope
    (no closed-form Annex 3-B window) — see operators/media.py."""

    def test_header_fields_bit_exact(self):
        from paddleocr_spark.operators.media import (
            layer1_encode,
            synth_layer1_frames,
        )

        frames, alloc, _ = synth_layer1_frames(5)
        p = layer1_encode(frames, alloc, rate=32000)
        # sync FFF + ID 1 + layer '11' + protection 1 -> 0xFFFF;
        # free-format bitrate 0000 + fs '10'(32k) + pad 0 + priv 0;
        # mode '11' + ext 00 + copyright 0 + original 1 + emphasis 00
        assert p[0] == 0xFF and p[1] == 0xFF
        assert p[2] == 0x08 and p[3] == 0xC4

    def test_roundtrip_within_quantizer_step(self):
        from paddleocr_spark.operators.media import (
            MP3_GRANULE,
            MP3_SUBBANDS,
            _mp3_sf_index,
            _mp3_sf_value,
            layer1_decode,
            layer1_encode,
            synth_layer1_frames,
        )

        for d in (0, 1, 2, 7, 31, 997):
            frames, alloc, nf = synth_layer1_frames(d)
            rate, dec = layer1_decode(layer1_encode(frames, alloc))
            assert rate == 44100 and len(dec) == nf
            for f, (da, dsf, sub) in enumerate(dec):
                assert da == alloc
                k = 0
                for sb in range(MP3_SUBBANDS):
                    nb = alloc[sb]
                    if not nb:
                        assert sub[sb] == [0.0] * MP3_GRANULE
                        continue
                    sf = _mp3_sf_value(
                        _mp3_sf_index(max(abs(s) for s in frames[f][sb]))
                    )
                    tol = sf * (2**nb / (2**nb - 1)) * 2.0 ** (-nb) * 1.001
                    assert dsf[k] == _mp3_sf_index(
                        max(abs(s) for s in frames[f][sb])
                    )
                    k += 1
                    for t in range(MP3_GRANULE):
                        assert abs(sub[sb][t] - frames[f][sb][t]) <= tol

    def test_closed_form_slot_arithmetic(self):
        from paddleocr_spark.operators.media import (
            layer1_encode,
            mp3_frame_bytes,
            synth_layer1_frames,
        )

        for d in range(24):
            frames, alloc, nf = synth_layer1_frames(d)
            assert len(layer1_encode(frames, alloc)) == nf * mp3_frame_bytes(d)
            assert mp3_frame_bytes(d) % 4 == 0  # whole 32-bit slots

    def test_quantizer_never_emits_all_ones(self):
        """The all-ones code is reserved (2^nb - 1 steps): s'=+1 input
        must clamp to the top VALID code, and decode below 1.0."""
        from paddleocr_spark.operators.media import (
            layer1_decode,
            layer1_encode,
        )

        frame = [[0.999999] * 12 if sb == 0 else [0.0] * 12
                 for sb in range(32)]
        alloc = [2] + [0] * 31
        _, dec = layer1_decode(layer1_encode([frame], alloc))
        assert all(abs(s) < 1.0 for s in dec[0][2][0])

    def test_lost_sync_and_bad_structure_raise(self):
        import pytest as _pytest

        from paddleocr_spark.operators.media import (
            layer1_decode,
            layer1_encode,
            synth_layer1_frames,
        )

        frames, alloc, _ = synth_layer1_frames(3)
        p = bytearray(layer1_encode(frames, alloc))
        p[0] = 0x00  # break the syncword
        with _pytest.raises(ValueError):
            layer1_decode(bytes(p))
        with _pytest.raises(ValueError):
            layer1_decode(b"")
        # forbidden allocation code 15 (alloc 16 would encode as 0b1111)
        with _pytest.raises(ValueError):
            layer1_encode(frames, [16] + alloc[1:])

    def test_multiframe_streams_concatenate(self):
        """Frames from different docs concatenated at slot boundaries
        decode as one stream (the free-format walk re-syncs per frame)."""
        from paddleocr_spark.operators.media import (
            layer1_decode,
            layer1_encode,
            synth_layer1_frames,
        )

        fa, alloc_a, na = synth_layer1_frames(6)  # same rate bucket:
        fb, alloc_b, nb = synth_layer1_frames(9)  # 6%3 == 9%3 == 0
        blob = layer1_encode(fa, alloc_a) + layer1_encode(fb, alloc_b)
        rate, dec = layer1_decode(blob)
        assert len(dec) == na + nb
        assert dec[0][0] == alloc_a and dec[-1][0] == alloc_b


class TestH264Structural:
    """H.264 Annex-B structural layer: NAL walk, emulation prevention,
    Exp-Golomb SPS (cropped dimensions), slice-header prefix. Pixel
    decode stays the documented swap point."""

    def test_ep_roundtrip_and_no_embedded_start_codes(self):
        import random

        from paddleocr_spark.operators.media import _ep_insert, _ep_remove

        rnd = random.Random(11)
        for _ in range(300):
            raw = bytes(
                rnd.choice([0, 0, 0, 1, 2, 3, 255])
                for _ in range(rnd.randint(0, 50))
            )
            guarded = _ep_insert(raw)
            assert _ep_remove(guarded) == raw
            assert b"\x00\x00\x01" not in guarded
            assert b"\x00\x00\x00" not in guarded

    def test_sps_dims_honor_cropping(self):
        from paddleocr_spark.operators.media import h264_parse_sps, h264_sps

        for w, h in [(48, 32), (50, 34), (62, 46), (192, 108), (1280, 720)]:
            sps = h264_parse_sps(h264_sps(w, h))
            assert (sps["width"], sps["height"]) == (w, h)
            assert sps["profile"] == 66

    def test_three_byte_start_codes_also_walk(self):
        from paddleocr_spark.operators.media import (
            h264_nal,
            h264_nals,
            h264_sps,
        )

        four = h264_nal(7, h264_sps(48, 32))
        three = b"\x00\x00\x01" + four[4:]  # same NAL, short start code
        nals = h264_nals(three + four)
        assert [t for t, _, _ in nals] == [7, 7]
        assert nals[0][2] == nals[1][2]

    def test_fixture_stream_full_walk(self):
        from paddleocr_spark.operators.media import (
            h264_nals,
            h264_parse_sps,
            h264_slice_header,
            synth_h264_stream,
        )

        for d in (0, 1, 3, 7, 70, 997):
            stream, w, h, nf = synth_h264_stream(d)
            assert b"\x00\x00\x03" in stream  # EP really fired
            nals = h264_nals(stream)
            sps = h264_parse_sps(nals[0][2])
            assert (sps["width"], sps["height"]) == (w, h)
            slices = [x for x in nals if x[0] in (1, 5)]
            assert len(slices) == nf and slices[0][0] == 5
            for f, (_t, _r, rbsp) in enumerate(slices):
                sh = h264_slice_header(rbsp, sps["log2_max_frame_num"])
                assert sh["frame_num"] == f
                assert sh["slice_type"] == (2 if f == 0 else 0)

    def test_corrupt_streams_raise(self):
        import pytest as _pytest

        from paddleocr_spark.operators.media import (
            h264_nals,
            h264_parse_sps,
            synth_h264_stream,
        )

        stream, *_ = synth_h264_stream(5)
        with _pytest.raises(ValueError):
            h264_nals(b"\xff" + stream)  # no leading start code
        bad = bytearray(stream)
        bad[4] |= 0x80  # forbidden_zero_bit
        with _pytest.raises(ValueError):
            h264_nals(bytes(bad))
        with _pytest.raises(ValueError):
            h264_parse_sps(b"\x64\x00\x1e\x80")  # high profile
