"""Delta-varint (LEB128) postings compression — the storage format
real inverted indexes ship (Lucene's VInt postings, Kafka varints,
protobuf wire type 0). At 10^12 documents a stopword's posting list is
~10^11 entries; raw int64 postings are 800 GB per hot term, delta-
varint brings the common small-gap case to ~1 byte/posting. The codec
is exact and self-checking: gaps are strictly positive (doc_ids
strictly increasing) so decode is unambiguous and round-trip equality
is asserted wherever the codec runs.

Pure python/stdlib, no Spark: the Spark surface lives in
functions/text.py (postings_vb suite branch) which encodes real
posting lists per term and re-decodes them in-runner (the
media_codec_suite discipline), while the DuckDB twin pins the byte
SIZE closed-form: len(varint(g)) = 1 + [g>=2^7] + [g>=2^14] +
[g>=2^21] + [g>=2^28]  (ids < 2^35 by contract).
"""

from __future__ import annotations


def varint_encode(value: int) -> bytes:
    """LEB128: little-endian base-128, msb = continuation."""
    if value < 0:
        raise ValueError("varint is unsigned")
    out = bytearray()
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def varint_decode(data: bytes, pos: int = 0) -> tuple[int, int]:
    """(value, next_pos); raises on truncation or >5-byte values
    (the <2^35 postings contract)."""
    value = 0
    shift = 0
    for k in range(5):
        if pos + k >= len(data):
            raise ValueError("truncated varint")
        b = data[pos + k]
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            if k > 0 and b == 0:
                # a 0x00 final byte after a continuation is a
                # non-minimal encoding varint_encode never emits;
                # reject so decode is the exact inverse of encode
                raise ValueError("non-canonical varint (redundant byte)")
            return value, pos + k + 1
        shift += 7
    raise ValueError("varint exceeds 5 bytes (>= 2^35)")


def encode_postings(doc_ids: list[int]) -> bytes:
    """Strictly-increasing doc_ids -> first id + positive gaps, each
    LEB128-encoded. Raises on unsorted/duplicate input — a silent
    re-sort would mask an upstream ordering bug."""
    out = bytearray()
    prev = None
    for d in doc_ids:
        if prev is None:
            gap = d
        else:
            gap = d - prev
            if gap <= 0:
                raise ValueError(
                    f"postings not strictly increasing at {d}"
                )
        out += varint_encode(gap)
        prev = d
    return bytes(out)


def decode_postings(blob: bytes) -> list[int]:
    """Inverse of encode_postings; consumes the whole blob."""
    out: list[int] = []
    pos = 0
    prev = 0
    first = True
    while pos < len(blob):
        gap, pos = varint_decode(blob, pos)
        if first:
            prev = gap
            first = False
        else:
            if gap == 0:
                raise ValueError("zero gap in postings stream")
            prev += gap
        out.append(prev)
    return out


def varint_len(value: int) -> int:
    """Closed-form encoded length — the oracle's size formula."""
    if value < 0:
        raise ValueError("varint is unsigned")
    n = 1
    while value >= 0x80:
        n += 1
        value >>= 7
    return n
