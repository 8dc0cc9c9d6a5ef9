"""RSS/Atom feed discovery (operators/feeds.py).

The strict gate (text_stats_suite row 'feed') proves Spark == DuckDB on
the closed-form arithmetic; these tests prove the parser is RIGHT on
inputs the oracle never generates: hand-written real-world-shaped
feeds, entity round-trips, the RSS void-link quirk, and malformed
input.
"""

from paddleocr_spark.operators.feeds import (
    atom_encode,
    parse_feed,
    rss_encode,
    synth_host_feed,
)


def test_rss_roundtrip_with_entities():
    entries = [
        ("https://h/p?a=1&b=2", "Q&A <live>", "https://h/p?a=1&b=2",
         "02 Jan 2026 00:00:00 GMT"),
    ]
    kind, got = parse_feed(rss_encode("h.example.test", entries))
    assert kind == "rss"
    assert got == entries


def test_atom_roundtrip_href_attribute():
    entries = [
        ("tag:h,2026:1", "hello", "https://h/a?x=1&y=2",
         "2026-01-02T00:00:00Z"),
        ("tag:h,2026:2", "world", "https://h/b", "2026-01-03T00:00:00Z"),
    ]
    kind, got = parse_feed(atom_encode("h.example.test", entries))
    assert kind == "atom"
    assert got == entries


def test_rss_void_link_reads_following_text():
    """The pinned tag-soup quirk: an HTML parser treats <link> as void,
    so the url parses as a text sibling — the extractor must still
    recover it from a hand-written feed with whitespace-free items."""
    xml = (
        '<rss version="2.0"><channel>'
        "<item><guid>g1</guid><title>t</title>"
        "<link>https://x/1</link>"
        "<pubDate>01 Jan 2026 00:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    kind, got = parse_feed(xml)
    assert kind == "rss"
    assert got == [("g1", "t", "https://x/1", "01 Jan 2026 00:00:00 GMT")]


def test_unknown_and_idless_entries_dropped():
    kind, got = parse_feed("<html><body><p>not a feed</p></body></html>")
    assert kind == "unknown" and got == []
    # an entry without an id contributes nothing
    xml = "<feed><entry><title>no id</title></entry></feed>"
    kind, got = parse_feed(xml)
    assert kind == "atom" and got == []


def test_synth_kind_split_and_counts():
    """Even last-char ordinal -> RSS, odd -> Atom; entry count is
    1 + c % 4 — the arithmetic the SQL oracle mirrors."""
    for s in ("src0", "src1", "src9", "srcA"):
        c = ord(s[-1])
        kind, xml = synth_host_feed(s)
        want = "rss" if c % 2 == 0 else "atom"
        assert kind == want
        k2, entries = parse_feed(xml)
        assert k2 == want
        assert len(entries) == 1 + c % 4
        # links always resolve regardless of the id convention
        for i, (eid, title, link, date) in enumerate(entries):
            assert link == f"https://{s.lower()}.example.test/post/{i}"
            assert title == f"News & updates {i}"
