"""Sitemap protocol codec + per-host seed discovery."""

from paddleocr_spark.operators.sitemap import (
    parse_sitemap,
    sitemap_encode,
    sitemap_index_encode,
    sitemap_seeds,
    synth_host_sitemaps,
)


def test_parse_roundtrip_and_edge_cases():
    """Encode -> parse round-trips urlset and index; lastmod optional;
    entities decode; junk input reports unknown/empty."""
    entries = [
        ("https://h.test/a", "2026-02-03"),
        # RAW query-string & — the encoder must escape it (protocol
        # requirement) and the parse must round-trip it back raw
        ("https://h.test/b?x=1&y=2", ""),
    ]
    xml = sitemap_encode(entries)
    assert "&amp;" in xml and "?x=1&y" not in xml  # well-formed on the wire
    kind, got = parse_sitemap(xml)
    assert kind == "urlset"
    assert got == entries
    kind, got = parse_sitemap(
        sitemap_index_encode(["https://h.test/s1.xml", "https://h.test/s2.xml"])
    )
    assert kind == "index"
    assert [u for u, _ in got] == [
        "https://h.test/s1.xml", "https://h.test/s2.xml",
    ]
    assert parse_sitemap("<html><body>not a sitemap</body></html>") == (
        "unknown", [],
    )
    # whitespace inside loc is stripped (protocol allows formatting)
    kind, got = parse_sitemap(
        "<urlset><url><loc>\n  https://h.test/ws \n</loc></url></urlset>"
    )
    assert got == [("https://h.test/ws", "")]


def test_seed_discovery_matches_closed_form(spark):
    """The Spark walk over the sf0.001 host census discovers exactly
    the closed-form seed set (child counts from ord(source[-1]))."""
    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.host, r.child, r.idx): (r.loc, r.lastmod)
        for r in sitemap_seeds(spark, sf_dir).collect()
    }
    sources = {
        r.source
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    want = {}
    for s in sources:
        host = s.lower() + ".example.test"
        c = ord(s[-1])
        for k in range(2):
            for i in range(1 + (c + k) % 3):
                want[(host, k, i)] = (
                    f"https://{host}/page/{k}-{i}",
                    f"2026-01-{1 + (c + k + i) % 28:02d}",
                )
    assert got == want
    # the synth tree itself is internally consistent (index points at
    # exactly the children the walk read)
    tree = synth_host_sitemaps("src3")
    kind, children = parse_sitemap(tree["/sitemap.xml"])
    assert kind == "index" and len(children) == 2
