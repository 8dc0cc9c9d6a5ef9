"""Main-content extraction: byte-identical round trip + boilerplate
resistance (FIXTURES.md §1 case 8)."""

from paddleocr_spark.operators.html_extract import extract_main_text, synthesize_html


def test_roundtrip_byte_identical():
    texts = [
        "plain words only " * 10,
        "entities & <angles> and 'quotes' plus more words to beat boilerplate mass",
        "x" * 400,
        "short",
    ]
    for i, t in enumerate(texts):
        assert extract_main_text(synthesize_html(t, i)) == t


def test_plain_div_content():
    h = (
        '<html><body><nav class="nav"><a href="/">home</a><a href="/b">b</a></nav>'
        '<div id="content"><p>the real article body with enough words to win '
        "the scoring contest comfortably today</p></div>"
        '<footer><a href="/x">x</a></footer></body></html>'
    )
    assert "real article body" in extract_main_text(h)
    assert "home" not in extract_main_text(h)


def test_link_density_penalty():
    h = (
        "<html><body>"
        '<div class="x"><a href="1">link text one</a><a href="2">link text two</a>'
        "<a href='3'>link text three</a></div>"
        "<div><p>genuine paragraph content that has no links at all and therefore "
        "scores higher despite similar length</p></div>"
        "</body></html>"
    )
    out = extract_main_text(h)
    assert "genuine paragraph" in out
    assert "link text one" not in out


def test_script_style_ignored():
    h = (
        "<html><head><script>var x = 'scripted garbage';</script>"
        "<style>.a{color:red}</style></head><body>"
        "<article><p>visible content words here enough for scoring rules</p>"
        "</article></body></html>"
    )
    out = extract_main_text(h)
    assert "scripted" not in out
    assert "visible content" in out


def test_empty_and_garbage():
    assert extract_main_text("") == ""
    assert extract_main_text("<p></p>") == ""
    # malformed HTML must not raise
    extract_main_text("<div><p>unclosed <b>stuff</div>")
