"""Multi-page payload container (the PDF analogue).

The reference explodes PDFs into one image per page
(ppocr/utils/utility.py:119-152 check_and_read renders each PyMuPDF page;
tools/infer/predict_system.py:221-224 caps pages). The sandbox has no PDF
renderer, so multi-page fixtures use this trivial deterministic container:
b'MPNG' + u32 page count + per-page (u32 length + PNG bytes). decode
explodes to (img_idx, image) — the 1->N source semantics are what matter
for the Spark plan (posexplode before the heavy OCR stage)."""

from __future__ import annotations

import struct

import numpy as np

from .png import decode_gray_png, encode_gray_png

MAGIC = b"MPNG"


def encode_multipage(pages: list[np.ndarray]) -> bytes:
    parts = [MAGIC, struct.pack(">I", len(pages))]
    for img in pages:
        png = encode_gray_png(img)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def decode_payload(data: bytes, page_limit: int = 0) -> list[np.ndarray]:
    """PNG bytes -> [image]; real PDF bytes -> one image per page via
    the kernels/pdf.py object-graph walk (FlateDecode gray pages decode
    losslessly, DCTDecode pages through the baseline JPEG kernel);
    legacy MPNG container kept. page_limit caps pages like the
    reference's page_num flag (predict_system.py:221-224)."""
    if data[:5] == b"%PDF-":
        from .jpeg import jpeg_decode
        from .pdf import pdf_decode_pages

        out = []
        # the cap is passed INTO the walk so pages past it are never
        # located or decompressed (the old post-hoc break still paid
        # the full decode of every page)
        for w, h, filt, img_data, _content in pdf_decode_pages(
            data, page_limit
        ):
            if filt == "FlateDecode":
                out.append(
                    np.frombuffer(img_data, dtype=np.uint8).reshape(h, w)
                )
            else:
                out.append(jpeg_decode(img_data)[4])
        return out
    if data[:4] == MAGIC:
        (count,) = struct.unpack(">I", data[4:8])
        out = []
        pos = 8
        for _ in range(count):
            (n,) = struct.unpack(">I", data[pos : pos + 4])
            out.append(decode_gray_png(data[pos + 4 : pos + 4 + n]))
            pos += 4 + n
            if page_limit and len(out) >= page_limit:
                break
        return out
    return [decode_gray_png(data)]
