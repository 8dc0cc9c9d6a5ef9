"""WARC/1.0 codec (sources/warc.py): record walk via Content-Length,
gzip member splitting, HTTP envelope parse, hostile-payload safety."""

import gzip

import pytest
from conftest import SF_SMALL

from paddleocr_spark.sources.warc import (
    warc_decode,
    warc_encode_responses,
)


def _mk(records, **kw):
    return warc_encode_responses(records, **kw)


def test_roundtrip_plain():
    blob = _mk(
        [
            ("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"HELLO"),
            ("https://a.test/2", "2026-01-02T03:04:06Z", "text/html", b"<p>x</p>"),
        ]
    )
    recs = warc_decode(blob)
    assert [r["type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["url"] == "https://a.test/1"
    assert recs[1]["http_status"] == 200
    assert recs[1]["payload"] == b"HELLO"
    assert recs[2]["content_type"] == "text/html"
    assert recs[2]["payload"] == b"<p>x</p>"


def test_roundtrip_gzip_members():
    blob = _mk(
        [("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"BODY")],
        gzip_members=True,
    )
    # really is a multi-member gzip: each record decompresses alone
    assert blob[:2] == b"\x1f\x8b"
    assert blob.count(b"\x1f\x8b\x08") >= 2
    recs = warc_decode(blob)
    assert recs[1]["payload"] == b"BODY"


def test_payload_containing_warc_magic_is_not_a_boundary():
    """Record boundaries come from Content-Length only: a body embedding
    'WARC/1.0' + fake headers must stay one record."""
    evil = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n"
    blob = _mk([("https://a.test/e", "2026-01-02T03:04:05Z", "text/plain", evil)])
    recs = warc_decode(blob)
    assert len(recs) == 2
    assert recs[1]["payload"] == evil


def test_truncated_record_raises():
    blob = _mk([("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"XYZ")])
    with pytest.raises(ValueError):
        warc_decode(blob[:-10])


def test_http_truncated_payload_is_flagged_not_fatal():
    """Common Crawl caps payloads while keeping the ORIGIN HTTP
    Content-Length: a shorter-than-declared body must decode with
    truncated=True, never raise (record boundaries come from the WARC
    Content-Length alone)."""
    blob = bytearray(
        _mk([("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"ABCDEF")])
    )
    # inflate the HTTP Content-Length digit (not the WARC one)
    i = blob.rindex(b"Content-Length: 6")
    blob[i + len(b"Content-Length: ")] = ord("9")
    recs = warc_decode(bytes(blob))
    assert recs[1]["truncated"] is True
    assert recs[1]["payload"] == b"ABCDEF"
    assert recs[0]["truncated"] is False


def test_header_names_are_case_insensitive():
    """ISO 28500 §5: field names are case-insensitive. Rewrite the
    response record's header casing and expect identical parsing."""
    blob = _mk([("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"BODY")])
    blob = (
        blob.replace(b"WARC-Type: response", b"warc-type: response")
        .replace(b"WARC-Target-URI", b"WARC-TARGET-URI")
        .replace(b"Content-Length", b"CONTENT-LENGTH")
    )
    recs = warc_decode(blob)
    assert recs[1]["type"] == "response"
    assert recs[1]["url"] == "https://a.test/1"
    assert recs[1]["payload"] == b"BODY"


def test_truncated_gzip_member_raises():
    blob = _mk(
        [("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"BODY")],
        gzip_members=True,
    )
    with pytest.raises(ValueError):
        warc_decode(blob[:-5])


def test_synth_warc_matches_oracle_formulas():
    """The suite oracle's closed forms: width = len(norm), m1 = epoch of
    doc_ts, m2 = ascii sum of norm; robots record only for odd ids."""
    from paddleocr_spark.operators.media import _ROBOTS, synth_warc

    for doc_id, text in [(4, "ab! c" * 40), (7, "Zz9")]:
        recs = warc_decode(synth_warc(doc_id, text, "hostx"))
        responses = [r for r in recs if r["type"] == "response"]
        norm = "".join(ch for ch in text if ch.isalnum()).upper()[:120]
        assert responses[0]["payload"] == norm.encode()
        assert len(responses) == 1 + doc_id % 2
        if doc_id % 2 == 1:
            assert responses[1]["payload"] == _ROBOTS
            assert responses[1]["url"].endswith("/robots.txt")
        exp_epoch = 1767225600 + (doc_id * 37) % 2592000
        import datetime

        got = int(
            datetime.datetime.fromisoformat(
                responses[0]["date"].replace("Z", "+00:00")
            ).timestamp()
        )
        assert got == exp_epoch


def test_pages_from_warc_end_to_end(spark, tmp_path):
    """Two .warc.gz archives of PNG page scans -> pages_from_warc ->
    extract_pages: the full Common-Crawl-shaped ingest. Extracted text
    must match the rendered content byte-identically."""
    from paddleocr_spark.kernels.font import render_page
    from paddleocr_spark.kernels.png import encode_gray_png
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_warc, wrap_lines

    texts = {
        f"https://w{a}.test/p{i}": f"DOC{a}{i}HELLO{i}WORLD"
        for a in range(2)
        for i in range(3)
    }
    for a in range(2):
        recs = [
            (
                url,
                f"2026-01-02T03:04:0{i}Z",
                "image/png",
                bytes(
                    encode_gray_png(render_page(wrap_lines(texts[url])))
                ),
            )
            for i, url in enumerate(u for u in texts if f"//w{a}." in u)
        ]
        (tmp_path / f"a{a}.warc.gz").write_bytes(
            warc_encode_responses(recs, gzip_members=True)
        )

    pages = pages_from_warc(spark, str(tmp_path))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {
        r["url"]: r["extracted_text"].replace("\n", "")
        for r in extract_pages(pages, num_partitions=4).collect()
    }
    assert got == texts


def test_overlong_block_past_http_body_raises():
    """WARC Content-Length over-covering the HTTP body (garbage after
    the declared body) is mis-framing — must raise, not silently append
    garbage to the payload."""
    blob = bytearray(
        _mk([("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"ABCDEF")])
    )
    # shrink the HTTP Content-Length so the block over-covers
    i = blob.rindex(b"Content-Length: 6")
    blob[i + len(b"Content-Length: ")] = ord("2")
    with pytest.raises(ValueError):
        warc_decode(bytes(blob))


def test_mid_archive_corruption_surfaces_before_tail_records():
    """A corrupt record must raise when REACHED, and records before it
    must have streamed out already (no end-of-stream buffering)."""
    from paddleocr_spark.sources.warc import warc_iter_records

    blob = bytearray(
        _mk(
            [
                ("https://a.test/1", "2026-01-02T03:04:05Z", "text/plain", b"AA"),
                ("https://a.test/2", "2026-01-02T03:04:06Z", "text/plain", b"BB"),
            ]
        )
    )
    # corrupt record 2's version line (plain path)
    i = blob.rindex(b"WARC/1.0")
    blob[i] = ord("X")
    it = warc_iter_records(bytes(blob))
    assert next(it)["type"] == "warcinfo"
    assert next(it)["payload"] == b"AA"
    with pytest.raises(ValueError):
        next(it)


def test_subsecond_warc_date_preserved():
    from paddleocr_spark.sources.warc import warc_date

    d = warc_date("2026-01-02T03:04:05.750Z")
    assert d.microsecond == 750000


def _results_frame(spark, n=12):
    from paddleocr_spark.sources.pages import pages_from_documents

    return (
        pages_from_documents(spark, SF_SMALL, limit=n)
        .selectExpr("url", "warc_ts", "text AS extracted_text")
    )


def test_wet_export_roundtrip(spark):
    """WET archives round-trip: every conversion record's payload is the
    byte-exact extracted text, keyed by url, with the capture date
    preserved."""
    from paddleocr_spark.sources.pages import wet_archives
    from paddleocr_spark.sources.warc import warc_decode

    results = _results_frame(spark).cache()
    want = {r["url"]: r["extracted_text"] for r in results.collect()}
    archives = wet_archives(results, records_per_archive=5).collect()
    assert sum(a["n_records"] for a in archives) == len(want)
    got = {}
    for a in archives:
        recs = warc_decode(bytes(a["wet"]))
        assert recs[0]["type"] == "warcinfo"
        for rec in recs[1:]:
            assert rec["type"] == "conversion"
            assert rec["content_type"] is None  # text/plain, not http
            got[rec["url"]] = bytes(rec["payload"]).decode("utf-8")
            assert rec["date"].endswith("Z")
    assert got == want
    results.unpersist()


def test_cdx_index_range_fetch(spark):
    """Every CDX row addresses exactly one record: a ranged slice +
    one-member gunzip reproduces the url, payload bytes, and digest."""
    import base64
    import hashlib

    from paddleocr_spark.sources.pages import cdx_rows, wet_archives
    from paddleocr_spark.sources.warc import fetch_record

    results = _results_frame(spark).cache()
    want = {r["url"]: r["extracted_text"] for r in results.collect()}
    archives = {
        a["name"]: bytes(a["wet"])
        for a in wet_archives(results, records_per_archive=4).collect()
    }
    idx = cdx_rows(
        spark.createDataFrame(
            [(n, b) for n, b in archives.items()], "name string, wet binary"
        )
    ).collect()
    assert len(idx) == len(want)  # warcinfo records are not indexed
    for e in idx:
        rec = fetch_record(archives[e["archive"]], e["offset"], e["length"])
        assert rec["url"] == e["url"]
        payload = bytes(rec["payload"])
        assert payload.decode("utf-8") == want[e["url"]]
        assert e["digest"] == "sha1:" + base64.b32encode(
            hashlib.sha1(payload).digest()
        ).decode()
    results.unpersist()


def test_cdx_index_rejects_misaligned_archives():
    import gzip

    import pytest

    from paddleocr_spark.sources.warc import (
        cdx_index,
        warc_encode_responses,
    )

    plain = warc_encode_responses(
        [("https://a/x", "2026-01-01T00:00:00Z", "text/html", b"hi")],
        gzip_members=False,
    )
    with pytest.raises(ValueError, match="gzip-membered"):
        cdx_index(plain)
    # two records inside ONE member: range addressing is impossible
    with pytest.raises(ValueError, match="more than one record"):
        cdx_index(gzip.compress(plain, mtime=0))
