"""WARC/1.0 container codec (ISO 28500 subset), stdlib only.

Common Crawl delivers the web — the corpus the north_star's Iceberg
`pages` table is modeled on — as `.warc.gz` files: concatenated WARC
records, each optionally its own gzip member, response records wrapping
a full HTTP/1.1 response (status line + headers + body). The reference
engine never reads WARC (its scope starts at image files,
ppocr/utils/utility.py get_image_file_list); this source exists because
a Common-Crawl-style extraction pipeline starts one step earlier: the
crawl archive is the raw input a 100 TB ingest actually scans.

Parsing is a strict header walk: record boundaries come ONLY from
Content-Length (never from scanning payload bytes, which may contain
anything), so a record whose body embeds "WARC/1.0" parses correctly.
Gzip inputs are split on gzip member boundaries via zlib's unused_data
— the exact structure Common Crawl uses so a range request can
decompress a single record.

At cluster scale each .warc.gz rides one input split (they are ~1 GiB
each in Common Crawl); the 1->N record explosion happens inside an
Arrow-batched map right after the scan, mirroring the multipage PDF
path (kernels/multipage.py).
"""

from __future__ import annotations

import gzip
import zlib

CRLF = b"\r\n"


def _warc_record(headers: list[tuple[bytes, bytes]], block: bytes) -> bytes:
    head = b"WARC/1.0" + CRLF
    for k, v in headers:
        head += k + b": " + v + CRLF
    head += b"Content-Length: %d" % len(block) + CRLF
    return head + CRLF + block + CRLF + CRLF


def warc_encode_responses(
    records: list[tuple[str, str, str, bytes]],
    warcinfo: bytes = b"software: paddleocr-spark-graft",
    gzip_members: bool = False,
) -> bytes:
    """records: [(url, iso8601_ts, content_type, body)]. Emits a
    warcinfo record followed by one response record per entry, each
    wrapping an HTTP/1.1 200 response. gzip_members=True writes each
    record as its own gzip member (the Common-Crawl .warc.gz layout)."""
    out = []
    info = _warc_record(
        [
            (b"WARC-Type", b"warcinfo"),
            (b"WARC-Record-ID", b"<urn:uuid:warcinfo-0>"),
            (b"WARC-Date", b"2026-01-01T00:00:00Z"),
            (b"Content-Type", b"application/warc-fields"),
        ],
        warcinfo + CRLF,
    )
    out.append(info)
    for i, (url, ts, ctype, body) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: " + ctype.encode() + CRLF
            + b"Content-Length: %d" % len(body) + CRLF
            + CRLF
            + body
        )
        out.append(
            _warc_record(
                [
                    (b"WARC-Type", b"response"),
                    (b"WARC-Record-ID", b"<urn:uuid:response-%d>" % i),
                    (b"WARC-Date", ts.encode()),
                    (b"WARC-Target-URI", url.encode()),
                    (
                        b"Content-Type",
                        b"application/http; msgtype=response",
                    ),
                ],
                http,
            )
        )
    if gzip_members:
        return b"".join(
            gzip.compress(rec, compresslevel=1, mtime=0) for rec in out
        )
    return b"".join(out)


def _gunzip_members(blob: bytes):
    """Yield decompressed gzip members one at a time (the .warc.gz
    layout: one member per record, so peak memory is one record — never
    the whole decompressed archive). Operates on a memoryview: slicing
    bytes would copy the remaining archive once PER MEMBER (O(members x
    size) memcpy on a ~1 GiB crawl archive)."""
    mv = memoryview(blob)
    pos = 0
    while pos < len(mv):
        d = zlib.decompressobj(wbits=31)
        member = d.decompress(mv[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in warc payload")
        consumed = len(mv) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed
        yield member


def warc_date(iso: str):
    """WARC-Date (ISO 8601, Z suffix) -> tz-aware datetime, sub-second
    precision preserved (WARC 1.1 allows fractional seconds). The single
    parse used by every consumer of the codec's date format."""
    import datetime

    return datetime.datetime.fromisoformat(iso.replace("Z", "+00:00"))


def warc_date_epoch(iso: str) -> int:
    """WARC-Date -> whole unix seconds (the integer-exact gate surface;
    use warc_date when sub-second ordering matters)."""
    return int(warc_date(iso).timestamp())


class _Incomplete(Exception):
    """More bytes are needed to finish the current record (distinct
    from ValueError = the bytes present are CORRUPT)."""


def _parse_one(blob: bytes, pos: int):
    """(record, next_pos) for the record starting at/after pos, or
    raises _Incomplete when the buffer ends mid-record."""
    n = len(blob)
    while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
        pos += 1
    if pos >= n:
        raise _Incomplete
    if n - pos < 5:
        raise _Incomplete
    if blob[pos : pos + 5] != b"WARC/":
        raise ValueError(f"expected WARC version line at {pos}")
    head_end = blob.find(CRLF + CRLF, pos)
    if head_end < 0:
        raise _Incomplete
    head_lines = blob[pos:head_end].split(CRLF)
    # ISO 28500 field names are case-insensitive: key lowercased
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode().lower()] = v.strip().decode()
    length = int(headers["content-length"])
    block_start = head_end + 4
    if block_start + length > n:
        raise _Incomplete
    block = blob[block_start : block_start + length]
    rec = {
        "type": headers.get("warc-type", ""),
        "url": headers.get("warc-target-uri"),
        "date": headers.get("warc-date"),
        "headers": headers,
        "http_status": None,
        "content_type": None,
        "truncated": "warc-truncated" in headers,
        "payload": block,
    }
    if headers.get("content-type", "").startswith("application/http"):
        http_end = block.index(CRLF + CRLF)
        http_lines = block[:http_end].split(CRLF)
        rec["http_status"] = int(http_lines[0].split()[1])
        for line in http_lines[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-type":
                rec["content_type"] = v.strip().decode()
        body = block[http_end + 4 :]
        clen = next(
            (
                int(line.partition(b":")[2])
                for line in http_lines[1:]
                if line.strip().lower().startswith(b"content-length")
            ),
            None,
        )
        # Real Common Crawl truncates payloads (~1 MiB cap) while
        # keeping the ORIGIN Content-Length header — a SHORTER body is
        # data, not corruption. A LONGER body than declared means the
        # WARC framing over-covers (garbage after the HTTP body): raise.
        if clen is not None:
            if clen > len(body):
                rec["truncated"] = True
            elif clen < len(body):
                raise ValueError(
                    f"warc block extends {len(body) - clen} bytes past "
                    "the declared http content-length"
                )
        rec["payload"] = body
    return rec, block_start + length


def warc_iter_records(blob: bytes):
    """Stream records from a WARC byte stream (plain or gzip-membered).
    For .warc.gz the peak memory is one member + any cross-member
    record tail (one record in the Common-Crawl layout), never the
    decompressed archive; records are yielded — and corruption raised —
    AS SOON as their bytes are available (no end-of-stream buffering)."""
    if blob[:2] == b"\x1f\x8b":
        pending = b""
        for member in _gunzip_members(blob):
            pending = pending + member if pending else bytes(member)
            pos = 0
            while True:
                try:
                    rec, pos = _parse_one(pending, pos)
                except _Incomplete:
                    break
                yield rec
            pending = pending[pos:] if pos else pending
        if pending.strip(b"\r\n"):
            raise ValueError("truncated WARC record at end of stream")
        return
    pos = 0
    while True:
        try:
            rec, pos = _parse_one(blob, pos)
        except _Incomplete:
            break
        yield rec
    if blob[pos:].strip(b"\r\n"):
        raise ValueError("truncated WARC record at end of stream")


def warc_decode(blob: bytes) -> list[dict]:
    """Parse a WARC/1.0 byte stream (plain or gzip-membered) into
    [{type, url, date, headers, http_status, content_type, truncated,
    payload}]. Non-HTTP records (warcinfo etc.) carry their block as
    `payload` with http_status None. Header names are matched
    case-insensitively (ISO 28500 §5) and exposed lowercased."""
    return list(warc_iter_records(blob))


def warc_encode_conversions(
    records: list[tuple[str, str, str]],
    warcinfo: bytes = b"software: paddleocr-spark-graft\r\nformat: WARC File Format 1.0\r\nconformsTo: WET",
    gzip_members: bool = True,
) -> bytes:
    """WET writer: records = [(url, iso8601_ts, extracted_text)] ->
    a .warc(.gz) of `conversion` records (the Common-Crawl WET layout:
    text/plain payload per page, one gzip member per record). The
    sink-side twin of the response parser above: an extraction pipeline
    that READS crawl archives ships its output in the same container."""
    out = [
        _warc_record(
            [
                (b"WARC-Type", b"warcinfo"),
                (b"WARC-Record-ID", b"<urn:uuid:warcinfo-wet-0>"),
                (b"WARC-Date", b"2026-01-01T00:00:00Z"),
                (b"Content-Type", b"application/warc-fields"),
            ],
            warcinfo + CRLF,
        )
    ]
    for i, (url, ts, text) in enumerate(records):
        out.append(
            _warc_record(
                [
                    (b"WARC-Type", b"conversion"),
                    (b"WARC-Record-ID", b"<urn:uuid:conversion-%d>" % i),
                    (b"WARC-Refers-To", b"<urn:uuid:response-%d>" % i),
                    (b"WARC-Date", ts.encode()),
                    (b"WARC-Target-URI", url.encode()),
                    (b"Content-Type", b"text/plain"),
                ],
                text.encode("utf-8"),
            )
        )
    if gzip_members:
        return b"".join(
            gzip.compress(rec, compresslevel=1, mtime=0) for rec in out
        )
    return b"".join(out)


def _payload_digest(payload: bytes) -> str:
    """Common Crawl's WARC-Payload-Digest form: sha1, base32."""
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()
    ).decode()


def cdx_index(blob: bytes) -> list[dict]:
    """CDX-style index of a record-per-member .warc.gz: one entry per
    response/conversion record with the COMPRESSED byte range
    [offset, offset+length) of its gzip member, so a store supporting
    range reads (S3/HDFS) serves one record without touching the rest
    of the archive — exactly how the Common-Crawl CDX index addresses
    `crawl-data/.../*.warc.gz`. Requires the record-aligned layout
    (raises if a record spans members)."""
    if blob[:2] != b"\x1f\x8b":
        raise ValueError("cdx_index requires a gzip-membered archive")
    mv = memoryview(blob)
    out = []
    pos = 0
    while pos < len(mv):
        d = zlib.decompressobj(wbits=31)
        member = d.decompress(mv[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in warc payload")
        length = len(mv) - pos - len(d.unused_data)
        try:
            rec, end = _parse_one(member, 0)
        except _Incomplete:
            raise ValueError(
                f"member at offset {pos} does not hold a whole record"
            ) from None
        if member[end:].strip(b"\r\n"):
            raise ValueError(
                f"member at offset {pos} holds more than one record"
            )
        # metadata joins the indexable set: WAT archives are range-
        # addressed exactly like WARC/WET (warcinfo stays unindexed)
        if rec["type"] in ("response", "conversion", "metadata"):
            out.append(
                {
                    "url": rec["url"],
                    "date": rec["date"],
                    "offset": pos,
                    "length": length,
                    "digest": _payload_digest(rec["payload"]),
                    "type": rec["type"],
                }
            )
        pos += length
    return out


def fetch_record(blob: bytes, offset: int, length: int) -> dict:
    """Range fetch: decode exactly one record from its CDX entry. The
    sandbox slices a bytes object; production issues a ranged GET with
    the same [offset, offset+length) and runs the identical decode."""
    member = gzip.decompress(bytes(blob[offset : offset + length]))
    rec, _ = _parse_one(member, 0)
    return rec
