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
    """Write a classic PDF 1.4: catalog -> pages -> one page per JPEG,
    each with a Flate-compressed content stream drawing its DCTDecode
    image XObject at natural size. Offsets are recorded in a real xref
    table so conformant readers can random-access objects."""
    objects: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    page_ids: list[int] = []
    kids_slots: list[tuple[int, bytes, bytes]] = []
    pages_id_placeholder = b"%PAGES%"
    for jpeg in jpegs:
        w, h = _jpeg_dims(jpeg)
        img_id = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8"
            b" /Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
            % (w, h, len(jpeg), jpeg)
        )
        content_raw = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        content = zlib.compress(content_raw)
        cont_id = add(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
        page_id = add(
            b"<< /Type /Page /Parent %s /MediaBox [0 0 %d %d]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>"
            % (pages_id_placeholder, w, h, img_id, cont_id)
        )
        page_ids.append(page_id)
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    pages_id = add(
        b"<< /Type /Pages /Kids %s /Count %d >>" % (kids, len(page_ids))
    )
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    objects = [
        body.replace(pages_id_placeholder, b"%d" % pages_id)
        for body in objects
    ]
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


_TOKEN = re.compile(
    rb"/[^\s/<>\[\]()]+|<<|>>|\[|\]|\d+\s+\d+\s+R\b|[-+]?\d*\.?\d+|\(|\)"
)


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
    m = re.match(rb"(\d+)\s+(\d+)\s+R\b", data[pos:])
    if m:
        return ("ref", int(m.group(1))), pos + m.end()
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
        # index every "N G obj" — robust to xref damage, like real readers
        self.offsets: dict[int, int] = {}
        for m in re.finditer(rb"(?m)^(\d+)\s+\d+\s+obj\b", data):
            self.offsets[int(m.group(1))] = m.end()
        t = data.rindex(b"trailer")
        self.trailer, _ = _parse_value(data, data.index(b"<<", t))
        if b"Encrypt" in self.trailer:
            raise ValueError("encrypted PDFs not supported")

    def obj(self, num: int):
        """(value, stream_bytes_or_None) for object `num`."""
        pos = self.offsets[num]
        val, pos = _parse_value(self.data, pos)
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


def pdf_decode_pages(payload: bytes):
    """[(width, height, jpeg_bytes, content_stream), ...] in page-tree
    order — the scanned-page payloads ready for kernels/jpeg.py. Walks
    trailer /Root -> /Pages -> /Kids; nested Pages nodes supported."""
    pdf = _Pdf(payload)
    root = pdf.resolve(pdf.trailer[b"Root"])
    pages: list[tuple[int, int, bytes, bytes]] = []

    def walk(node_ref) -> None:
        node = pdf.resolve(node_ref)
        kind = node.get(b"Type")
        if kind == ("name", b"Pages"):
            for kid in node[b"Kids"]:
                walk(kid)
            return
        if kind != ("name", b"Page"):
            raise ValueError(f"unexpected page-tree node {kind!r}")
        xobjects = pdf.resolve(node[b"Resources"])[b"XObject"]
        if len(xobjects) != 1:
            raise ValueError("expected exactly one image XObject per page")
        (img_ref,) = xobjects.values()
        num = img_ref[1]
        info, jpeg = pdf.obj(num)
        if info.get(b"Filter") != ("name", b"DCTDecode"):
            raise ValueError("expected a DCTDecode image stream")
        _, content = pdf.obj(node[b"Contents"][1])
        pages.append(
            (int(pdf.resolve(info[b"Width"])),
             int(pdf.resolve(info[b"Height"])),
             jpeg, content)
        )

    walk(root[b"Pages"])
    return pages
