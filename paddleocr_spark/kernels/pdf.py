"""Minimal real PDF container codec (ISO 32000 subset), stdlib only.

The reference rasterizes PDFs through PyMuPDF (`check_and_read`,
ppocr/utils/utility.py:119-152: fitz.open -> per-page pixmap); no PDF
library ships in this container, so the container format is parsed
directly: header, indirect objects, dictionaries/arrays/names/refs,
stream extraction via /Length, the document graph
(trailer /Root -> /Catalog -> /Pages -> /Kids -> /Page), per-page
/Contents (FlateDecode via zlib) and image /XObject resources
(DCTDecode streams hand off to kernels/jpeg.py — a scanned-page PDF is
a JPEG in a PDF wrapper, which is exactly what this pair of decoders
re-creates).

Scope: classic cross-reference-table PDFs (the fixture writer's
output), one image XObject per page, DCTDecode/FlateDecode filters.
Object streams / xref streams / encryption raise loudly. The decoder
walks the object graph from the trailer — it does not assume the
writer's object numbering or layout.
"""

from __future__ import annotations

import re
import zlib


def _jpeg_dims(jpeg: bytes) -> tuple[int, int]:
    """(width, height) from the SOF0 frame header."""
    i = jpeg.find(b"\xff\xc0")
    if i < 0:
        raise ValueError("no SOF0 in JPEG payload")
    h, w = int.from_bytes(jpeg[i + 5 : i + 7], "big"), int.from_bytes(
        jpeg[i + 7 : i + 9], "big"
    )
    return w, h


def pdf_encode_pages(jpegs: list[bytes]) -> bytes:
    """Scanned-page PDF: one DCTDecode (JPEG) image XObject per page."""
    return _encode_pdf(
        [(b"DCTDecode", *_jpeg_dims(j), j) for j in jpegs]
    )


def pdf_encode_gray_pages(images) -> bytes:
    """LOSSLESS multi-page PDF: each 8-bit grayscale image (numpy HxW
    uint8) becomes a FlateDecode image XObject — the PDF-native
    equivalent of a PNG page, byte-exact through decode, which is what
    the extraction pipeline's byte-identity contract requires (JPEG
    would be lossy)."""
    items = []
    for img in images:
        h, w = img.shape
        items.append((b"FlateDecode", w, h, zlib.compress(img.tobytes())))
    return _encode_pdf(items)


def _finish_pdf(objects: list[bytes], catalog_id: int) -> bytes:
    """Serialize 1-indexed object bodies into a classic PDF 1.4 file
    with a real xref table so conformant readers can random-access
    objects (shared by the image-page and text-page writers)."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_id, xref_pos)
    )
    return bytes(out)


def _encode_pdf(images: list[tuple[bytes, int, int, bytes]]) -> bytes:
    """Write a classic PDF 1.4: catalog -> pages -> one page per image
    (filter, w, h, stream_data), each with a Flate-compressed content
    stream drawing its image XObject at natural size."""
    objects: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    page_ids: list[int] = []
    # this writer emits exactly 3 objects per page (image, content,
    # page), so the Pages node's number is known up front — no
    # placeholder patching over binary stream bytes
    pages_id = 3 * len(images) + 1
    for filt, w, h, data in images:
        img_id = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8"
            b" /Filter /%s /Length %d >>\nstream\n%s\nendstream"
            % (w, h, filt, len(data), data)
        )
        content_raw = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        content = zlib.compress(content_raw)
        cont_id = add(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
        page_id = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>"
            % (pages_id, w, h, img_id, cont_id)
        )
        page_ids.append(page_id)
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    assert add(
        b"<< /Type /Pages /Kids %s /Count %d >>" % (kids, len(page_ids))
    ) == pages_id
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    return _finish_pdf(objects, catalog_id)


_TOKEN = re.compile(
    rb"/[^\s/<>\[\]()]+|<<|>>|\[|\]|\d+\s+\d+\s+R\b|[-+]?\d*\.?\d+|\(|\)"
)
_REF = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_OBJ_HDR = re.compile(rb"(\d+)\s+\d+\s+obj\b")


def _parse_value(data: bytes, pos: int):
    """(value, next_pos) for the PDF object value at `pos`: dict, array,
    name, number, or indirect reference."""
    while pos < len(data) and data[pos : pos + 1].isspace():
        pos += 1
    if data[pos : pos + 2] == b"<<":
        d: dict[bytes, object] = {}
        pos += 2
        while True:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 2] == b">>":
                return d, pos + 2
            m = _TOKEN.match(data, pos)
            if not m or not m.group().startswith(b"/"):
                raise ValueError(f"bad dict key at {pos}")
            key = m.group()[1:]
            val, pos = _parse_value(data, m.end())
            d[key] = val
        raise AssertionError
    if data[pos : pos + 1] == b"[":
        arr: list[object] = []
        pos += 1
        while True:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"]":
                return arr, pos + 1
            val, pos = _parse_value(data, pos)
            arr.append(val)
        raise AssertionError
    # anchored match at pos — slicing data[pos:] would copy the whole
    # remaining buffer once per parsed value
    m = _REF.match(data, pos)
    if m:
        return ("ref", int(m.group(1))), m.end()
    m = _TOKEN.match(data, pos)
    if not m:
        raise ValueError(f"unparseable value at {pos}")
    tok = m.group()
    if tok.startswith(b"/"):
        return ("name", tok[1:]), m.end()
    return float(tok) if b"." in tok else int(tok), m.end()


class _Pdf:
    def __init__(self, data: bytes):
        self.data = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF payload")
        # The xref table is authoritative (a byte scan can be fooled by
        # binary stream content that happens to contain "\nN 0 obj");
        # fall back to scanning every "N G obj" only when the table is
        # damaged or absent, like real readers do.
        self.offsets: dict[int, int] = {}
        try:
            self.offsets = self._xref_offsets(data)
        except Exception:
            self.offsets = {}
        if not self.offsets:
            for m in re.finditer(rb"(?m)^(\d+)\s+\d+\s+obj\b", data):
                self.offsets[int(m.group(1))] = m.end()
        t = data.rindex(b"trailer")
        self.trailer, _ = _parse_value(data, data.index(b"<<", t))
        if b"Encrypt" in self.trailer:
            raise ValueError("encrypted PDFs not supported")

    @staticmethod
    def _xref_offsets(data: bytes) -> dict[int, int]:
        sx = data.rindex(b"startxref")
        xref_pos = int(data[sx + 9 :].split()[0])
        if data[xref_pos : xref_pos + 4] != b"xref":
            raise ValueError("startxref does not point at an xref table")
        offsets: dict[int, int] = {}
        pos = data.index(b"\n", xref_pos) + 1
        while not data[pos : pos + 7] == b"trailer":
            header = data[pos : data.index(b"\n", pos)].split()
            start, count = int(header[0]), int(header[1])
            pos = data.index(b"\n", pos) + 1
            for num in range(start, start + count):
                entry = data[pos : pos + 20]
                pos += 20
                if entry[17:18] != b"n":
                    continue
                off = int(entry[:10])
                m = _OBJ_HDR.match(data, off)
                if not m or int(m.group(1)) != num:
                    raise ValueError(f"xref offset for obj {num} is wrong")
                offsets[num] = m.end()
            while data[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
        return offsets

    def obj(self, num: int, want_stream: bool = True):
        """(value, stream_bytes_or_None) for object `num`. With
        want_stream=False only the object dictionary is parsed — the
        stream bytes are never sliced or decompressed (the cheap
        metadata-walk path)."""
        pos = self.offsets[num]
        val, pos = _parse_value(self.data, pos)
        if not want_stream:
            return val, None
        while pos < len(self.data) and self.data[pos : pos + 1].isspace():
            pos += 1
        if self.data[pos : pos + 6] != b"stream":
            return val, None
        pos += 6
        if self.data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif self.data[pos : pos + 1] == b"\n":
            pos += 1
        length = self.resolve(val[b"Length"])
        raw = self.data[pos : pos + int(length)]
        filt = val.get(b"Filter")
        if filt == ("name", b"FlateDecode"):
            raw = zlib.decompress(raw)
        elif filt not in (None, ("name", b"DCTDecode")):
            raise ValueError(f"unsupported stream filter {filt!r}")
        return val, raw

    def resolve(self, v):
        while isinstance(v, tuple) and v[0] == "ref":
            v = self.obj(v[1])[0]
        return v


def pdf_decode_pages(payload: bytes, page_limit: int = 0):
    """[(width, height, filter_name, image_data, content_stream), ...]
    in page-tree order. filter_name is 'DCTDecode' (image_data = the
    embedded JPEG, ready for kernels/jpeg.py) or 'FlateDecode'
    (image_data = raw 8-bit gray rows, already decompressed). Walks
    trailer /Root -> /Pages -> /Kids; nested Pages nodes supported.
    page_limit stops the walk BEFORE decoding page page_limit+1 — the
    cap must bound decompression cost (and skip errors in pages past
    the cap), not just truncate the result."""
    pdf = _Pdf(payload)
    root = pdf.resolve(pdf.trailer[b"Root"])
    pages: list[tuple[int, int, str, bytes, bytes]] = []

    def walk(node_ref) -> None:
        if page_limit and len(pages) >= page_limit:
            return
        node = pdf.resolve(node_ref)
        kind = node.get(b"Type")
        if kind == ("name", b"Pages"):
            for kid in node[b"Kids"]:
                if page_limit and len(pages) >= page_limit:
                    return
                walk(kid)
            return
        if kind != ("name", b"Page"):
            raise ValueError(f"unexpected page-tree node {kind!r}")
        xobjects = pdf.resolve(node[b"Resources"])[b"XObject"]
        if len(xobjects) != 1:
            raise ValueError("expected exactly one image XObject per page")
        (img_ref,) = xobjects.values()
        info, data = pdf.obj(img_ref[1])
        filt = info.get(b"Filter")
        if filt not in (("name", b"DCTDecode"), ("name", b"FlateDecode")):
            raise ValueError(f"unsupported image filter {filt!r}")
        _, content = pdf.obj(node[b"Contents"][1])
        w = int(pdf.resolve(info[b"Width"]))
        h = int(pdf.resolve(info[b"Height"]))
        if filt[1] == b"FlateDecode" and len(data) != w * h:
            raise ValueError(
                f"gray image data {len(data)} != {w}x{h} pixels"
            )
        pages.append((w, h, filt[1].decode(), data, content))

    walk(root[b"Pages"])
    return pages


def pdf_page_dims(payload: bytes) -> list[tuple[int, int]]:
    """[(width, height), ...] per page from the object DICTIONARIES
    only — no image stream is sliced or decompressed. This is the
    header-walk-before-decode shape frame sampling needs at scale:
    skipping a page costs a dict parse, not a decode."""
    pdf = _Pdf(payload)
    root = pdf.resolve(pdf.trailer[b"Root"])
    dims: list[tuple[int, int]] = []

    def walk(node_ref) -> None:
        node = pdf.resolve(node_ref)
        if node.get(b"Type") == ("name", b"Pages"):
            for kid in node[b"Kids"]:
                walk(kid)
            return
        xobjects = pdf.resolve(node[b"Resources"])[b"XObject"]
        (img_ref,) = xobjects.values()
        info, _ = pdf.obj(img_ref[1], want_stream=False)
        dims.append(
            (int(pdf.resolve(info[b"Width"])),
             int(pdf.resolve(info[b"Height"])))
        )

    walk(root[b"Pages"])
    return dims


# -- born-digital text layer ---------------------------------------------------
#
# A real web corpus is not all scans: most PDFs carry their text in the
# content stream (BT..ET text objects with Tj/TJ show operators), and a
# production extraction pipeline routes those AROUND the OCR stage —
# the reference only ever rasterizes (check_and_read,
# ppocr/utils/utility.py:119-152, fitz page.get_pixmap), which is the
# right call for scans but wasteful and lossy for born-digital
# documents. The writer below emits genuine ISO 32000 text content
# streams and the extractor is a real (subset) content-stream
# interpreter, so the text-vs-scan routing decision is made the way
# pdfminer/MuPDF make it: by looking for text-show operators in the
# decompressed stream, never by filename or metadata.


def _escape_literal(s: bytes, cont_at: int = -1) -> bytes:
    """PDF literal-string body with ()\\ escaped; cont_at >= 0 inserts
    a backslash-newline line continuation (contributes no characters)
    after that many input bytes."""
    out = bytearray()
    for i, b in enumerate(s):
        if i == cont_at:
            out += b"\\\n"
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out.append(0x5C)
        out.append(b)
    return bytes(out)


def _escape_octal(s: bytes) -> bytes:
    """Literal-string body using \\ooo octal escapes for every
    delimiter byte and every 4th byte (exercises the \\ddd path)."""
    out = bytearray()
    for i, b in enumerate(s):
        if b in (0x28, 0x29, 0x5C) or i % 4 == 3:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def pdf_encode_text_pages(
    pages: list[list[str]], forms: list[list[int]]
) -> bytes:
    """Born-digital PDF: each page is a list of text lines rendered as
    a real BT..ET text object. forms[k][l] picks the encoding of line l
    on page k, cycling the operator surface a content-stream
    interpreter must cover:

      0 - literal string + Tj, ()\\ escapes, a backslash-newline
          continuation mid-string, line advance via `0 -14 Td`
      1 - TJ array split mid-line with a small kern (no space), and the
          line's first space (if any) encoded as a -200 kern instead of
          a space character (the space-as-kern idiom of real PDF
          generators); line advance via `T*`
      2 - hex string <..> with embedded whitespace + Tj, advance Td
      3 - octal-escaped literal shown with the `'` (next-line + show)
          operator, leading from the `TL` set in the page prologue
    """
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_id = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page_ids: list[int] = []
    # 2 objects per page (content, page) after the shared font object
    pages_node_id = 1 + 2 * len(pages) + 1
    for k, lines in enumerate(pages):
        ops = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for l, line in enumerate(lines):
            raw = line.encode("latin-1")
            form = forms[k][l]
            if form == 0:
                if l:
                    ops.append(b"0 -14 Td")
                ops.append(b"(" + _escape_literal(raw, cont_at=20) + b") Tj")
            elif form == 1:
                if l:
                    ops.append(b"T*")
                mid = len(raw) // 2
                p1, p2 = raw[:mid], raw[mid:]
                parts = [b"(" + _escape_literal(p1) + b")", b"-90"]
                sp = p2.find(b" ")
                if sp >= 0:
                    parts += [
                        b"(" + _escape_literal(p2[:sp]) + b")",
                        b"-200",
                        b"(" + _escape_literal(p2[sp + 1 :]) + b")",
                    ]
                else:
                    parts.append(b"(" + _escape_literal(p2) + b")")
                ops.append(b"[" + b" ".join(parts) + b"] TJ")
            elif form == 2:
                if l:
                    ops.append(b"0 -14 Td")
                hx = raw.hex().upper().encode()
                mid = len(hx) // 2
                ops.append(b"<" + hx[:mid] + b"\n" + hx[mid:] + b"> Tj")
            else:
                ops.append(b"(" + _escape_octal(raw) + b") '")
        ops.append(b"ET")
        content = zlib.compress(b"\n".join(ops))
        cont_id = add(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
        page_id = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 %d 0 R >> >>"
            b" /Contents %d 0 R >>"
            % (pages_node_id, font_id, cont_id)
        )
        page_ids.append(page_id)
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    assert add(
        b"<< /Type /Pages /Kids %s /Count %d >>" % (kids, len(page_ids))
    ) == pages_node_id
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node_id)
    return _finish_pdf(objects, catalog_id)


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
# a kern this large (thousandths of text space, negative = rightward
# gap) is a word space in the space-as-kern idiom; smaller adjustments
# are glyph kerning and contribute no character
_KERN_SPACE = -180


def _content_tokens(data: bytes):
    """Tokenize a PDF content stream: yields ('str', bytes),
    ('num', float), ('name', bytes), ('op', bytes), ('[',) , (']',).
    Literal strings implement the full ISO 32000 7.3.4.2 escape set
    (named escapes, 1-3 digit octal, backslash-EOL continuation, raw
    EOL normalization to \\n); hex strings skip whitespace and pad an
    odd final digit with 0. Inline dicts << >> and comments are
    skipped; unknown constructs raise."""
    i, n = 0, len(data)
    esc = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\x08",
           0x66: b"\x0c", 0x28: b"(", 0x29: b")", 0x5C: b"\\"}
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        if c == 0x28:  # ( literal string
            i += 1
            depth = 1
            out = bytearray()
            while i < n:
                b = data[i]
                if b == 0x5C:  # backslash
                    nxt = data[i + 1] if i + 1 < n else 0
                    if nxt in esc:
                        out += esc[nxt]
                        i += 2
                    elif 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                        j = i + 1
                        oct_digits = b""
                        while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                            oct_digits += data[j : j + 1]
                            j += 1
                        out.append(int(oct_digits, 8) & 0xFF)
                        i = j
                    elif nxt in (0x0A, 0x0D):  # line continuation
                        i += 2
                        if nxt == 0x0D and i < n and data[i] == 0x0A:
                            i += 1
                    else:  # lone backslash: dropped
                        out.append(nxt)
                        i += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                if b in (0x0A, 0x0D):  # raw EOL -> \n
                    out += b"\n"
                    if b == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                        i += 1
                    i += 1
                    continue
                out.append(b)
                i += 1
            else:
                raise ValueError("unterminated literal string")
            yield ("str", bytes(out))
            continue
        if c == 0x3C:  # < hex string or << dict
            if data[i + 1 : i + 2] == b"<":
                i += 2
                yield ("op", b"<<")
                continue
            i += 1
            hx = bytearray()
            while i < n and data[i] != 0x3E:
                if data[i] not in _WS:
                    hx.append(data[i])
                i += 1
            if i >= n:
                raise ValueError("unterminated hex string")
            i += 1
            if len(hx) % 2:
                hx.append(0x30)  # odd final digit: pad with 0
            yield ("str", bytes.fromhex(hx.decode("ascii")))
            continue
        if c == 0x3E and data[i + 1 : i + 2] == b">":
            i += 2
            yield ("op", b">>")
            continue
        if c == 0x5B:
            i += 1
            yield ("[",)
            continue
        if c == 0x5D:
            i += 1
            yield ("]",)
            continue
        if c == 0x2F:  # /name
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
            continue
        # number or operator keyword
        j = i
        while j < n and data[j] not in _WS and data[j] not in _DELIM:
            j += 1
        tok = data[i:j]
        i = j
        if not tok:
            raise ValueError(f"unparseable content byte at {i}")
        if re.fullmatch(rb"[-+]?(\d+\.?\d*|\.\d+)", tok):
            yield ("num", float(tok))
        else:
            yield ("op", tok)


def extract_content_text(content: bytes) -> str | None:
    """Text of one page's content stream, or None when the stream shows
    no text (the router signal: None -> this page goes to the OCR
    path). Interprets the text-positioning subset the way a reader
    assembles reading order: Td/TD/Tm/T*/'/\" line advances flush the
    current line; Tj/TJ/'/\" append; TJ kerns <= -180/1000 em become a
    word space, smaller adjustments are glyph kerning and vanish.
    Unknown operators are ignored (their operands discarded), so
    graphics mixed into the page do not derail extraction."""
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    saw_text = False

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def show(raw: bytes) -> None:
        nonlocal saw_text
        saw_text = True
        cur.append(raw.decode("latin-1"))

    arrays: list[list] = []
    for tok in _content_tokens(content):
        kind = tok[0]
        if kind == "[":
            arrays.append([])
            continue
        if kind == "]":
            if not arrays:
                raise ValueError("unbalanced ] in content stream")
            stack.append(arrays.pop())
            continue
        if kind in ("str", "num", "name"):
            (arrays[-1] if arrays else stack).append(tok[1])
            continue
        op = tok[1]
        if op == b"Td" or op == b"TD":
            if len(stack) >= 2 and stack[-1] != 0:
                newline()
        elif op == b"Tm":
            newline()
        elif op == b"T*":
            newline()
        elif op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif op == b"'":
            newline()
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif op == b'"':
            newline()
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, float) and el <= _KERN_SPACE:
                        cur.append(" ")
        elif op == b"ET":
            newline()
        stack.clear()
    newline()
    if not saw_text:
        return None
    return "\n".join(lines)


def pdf_text_pages(payload: bytes) -> list[str | None]:
    """Per page (page-tree order): the born-digital text extracted from
    its content stream, or None for pages with no text-show operators
    (scanned pages — route to pdf_decode_pages + OCR instead). This is
    the triage a production extraction pipeline runs on every PDF
    BEFORE deciding whether to spend OCR on it."""
    pdf = _Pdf(payload)
    root = pdf.resolve(pdf.trailer[b"Root"])
    out: list[str | None] = []

    def walk(node_ref) -> None:
        node = pdf.resolve(node_ref)
        kind = node.get(b"Type")
        if kind == ("name", b"Pages"):
            for kid in node[b"Kids"]:
                walk(kid)
            return
        if kind != ("name", b"Page"):
            raise ValueError(f"unexpected page-tree node {kind!r}")
        _, content = pdf.obj(node[b"Contents"][1])
        out.append(extract_content_text(content))

    walk(root[b"Pages"])
    return out
