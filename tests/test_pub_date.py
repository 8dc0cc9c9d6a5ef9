"""htmldate-style publication-date cascade: precedence, validation
fall-through, and the four fixture layouts."""

from paddleocr_spark.operators.html_extract import (
    extract_pub_date,
    synthesize_html,
)


def test_meta_beats_jsonld_beats_time():
    html = (
        "<html><head>"
        '<meta property="article:published_time" content="2026-03-17T08:30:00Z">'
        '<script type="application/ld+json">'
        '{"@type":"Article","datePublished":"2026-01-01"}</script>'
        '</head><body><time datetime="2025-12-25">x</time></body></html>'
    )
    assert extract_pub_date(html) == ("2026-03-17", "meta")
    # drop the meta -> jsonld wins
    html2 = html.replace(
        '<meta property="article:published_time" '
        'content="2026-03-17T08:30:00Z">',
        "",
    )
    assert extract_pub_date(html2) == ("2026-01-01", "jsonld")
    # drop jsonld too -> time wins
    html3 = html2.replace(
        '<script type="application/ld+json">'
        '{"@type":"Article","datePublished":"2026-01-01"}</script>',
        "",
    )
    assert extract_pub_date(html3) == ("2025-12-25", "time")


def test_invalid_candidates_fall_through():
    # meta present but not a date -> cascade must descend, not stop
    html = (
        "<html><head>"
        '<meta property="article:published_time" content="yesterday">'
        "</head><body>"
        '<time datetime="2026-02-02T10:00:00">x</time></body></html>'
    )
    assert extract_pub_date(html) == ("2026-02-02", "time")
    # malformed JSON-LD skipped silently
    html2 = (
        "<html><head>"
        '<script type="application/ld+json">{"datePublished":,}</script>'
        '</head><body><time datetime="2026-05-05">x</time></body></html>'
    )
    assert extract_pub_date(html2) == ("2026-05-05", "time")


def test_absent_everything_is_dash():
    assert extract_pub_date("<html><body><p>hi</p></body></html>") == (
        "-",
        "none",
    )
    # time without datetime attr does not count
    assert extract_pub_date(
        "<html><body><time>March</time></body></html>"
    ) == ("-", "none")


def test_fixture_layouts_match_closed_form():
    for seed in range(8, 16):
        date, src = extract_pub_date(synthesize_html("body text", seed))
        m = seed % 9 + 1
        if seed % 4 == 0:
            assert (date, src) == (f"2026-0{m}-{10 + seed % 19}", "meta")
        elif seed % 4 == 1:
            assert (date, src) == (f"2026-0{m}-0{seed % 7 + 1}", "time")
        elif seed % 4 == 2:
            assert (date, src) == (f"2026-0{m}-01", "jsonld")
        else:
            assert (date, src) == ("-", "none")
