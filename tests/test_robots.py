"""RFC 9309 robots.txt semantics pins (operators/robots.py)."""

from paddleocr_spark.operators.robots import (
    AGENT,
    parse_robots,
    robots_rfc_rows,
    robots_verdict,
    synth_robots,
)


def test_group_selection_exact_token_and_fallback():
    txt = (
        "User-agent: GoogleBot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /s\n\n"
        "User-agent: PaddleBot\nUser-agent: OtherBot\nDisallow: /p\n"
    )
    # case-insensitive exact token beats the * group
    assert parse_robots(txt, "paddlebot")[0] == [(False, "/p")]
    # shared rule block binds to every agent named above it
    assert parse_robots(txt, "otherbot")[0] == [(False, "/p")]
    # unknown token falls back to *
    assert parse_robots(txt, "unknown")[0] == [(False, "/s")]
    # no * group and no token -> no rules -> everything allowed
    assert parse_robots("User-agent: x\nDisallow: /\n", "y") == ([], 0.0)


def test_precedence_longest_match_allow_wins_ties():
    rules = [(False, "/p"), (True, "/page"), (False, "/page/private")]
    assert robots_verdict(rules, "/p/x") == (False, 2)
    assert robots_verdict(rules, "/page/x") == (True, 5)
    assert robots_verdict(rules, "/page/private/x") == (False, 13)
    assert robots_verdict(rules, "/other") == (True, 0)
    # exact tie -> Allow wins regardless of rule order
    assert robots_verdict([(False, "/a"), (True, "/a")], "/a")[0] is True
    assert robots_verdict([(True, "/a"), (False, "/a")], "/a")[0] is True


def test_wildcard_dollar_comments_empty_disallow():
    txt = (
        "User-agent: *\n"
        "Disallow: /*.pdf$  # block pdfs\n"
        "Allow: /pub*lic\n"
        "Disallow:\n"          # empty = allow all = NO rule
        "Sitemap: https://h/s.xml\n"
        "Bogus-directive: x\n"
    )
    rules, delay = parse_robots(txt, "anybot")
    assert rules == [(False, "/*.pdf$"), (True, "/pub*lic")]
    assert robots_verdict(rules, "/a/b.pdf") == (False, 7)
    assert robots_verdict(rules, "/a/b.pdfx")[0] is True  # $ anchors
    assert robots_verdict(rules, "/pubxxlic")[0] is True
    assert robots_verdict(rules, "/elsewhere") == (True, 0)


def test_crawl_delay_binds_to_selected_group():
    txt = (
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n\n"
        "User-agent: paddlebot\nDisallow: /y\n"
    )
    assert parse_robots(txt, "paddlebot") == ([(False, "/y")], 0.0)
    assert parse_robots(txt, "other") == ([(False, "/x")], 2.5)


def test_fixture_rows_match_closed_form(spark):
    """The Spark parse->broadcast-join->verdict path equals the oracle
    arithmetic on the real sf0.001 corpus."""
    sf_dir = "/root/testdata/sf0.001"
    got = {int(r.k): r.v for r in robots_rfc_rows(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    for row in docs:
        d, s = row.doc_id, row.source
        rules, delay = parse_robots(synth_robots(s), AGENT)
        allowed, wlen = robots_verdict(rules, f"/doc/{d}")
        assert got[d] == f"{int(allowed)}|{int(round(delay * 10))}|{wlen}", d
    # both parities and both verdicts occur
    assert {v.split("|")[0] for v in got.values()} == {"0", "1"}


def test_star_runs_do_not_backtrack():
    """Consecutive '*' collapse before compilation: a hostile pattern
    with 20 stars against a 200-char non-matching path must return
    instantly (the naive '.*.*...' translation hangs)."""
    import time

    rules = [(False, "/" + "*" * 20 + "x$")]
    t0 = time.monotonic()
    allowed, wlen = robots_verdict(rules, "/" + "y" * 200)
    assert time.monotonic() - t0 < 1.0
    assert allowed is True and wlen == 0
    # the collapsed pattern still matches what it should
    assert robots_verdict(rules, "/aaax")[0] is False
    # compiled form gives identical verdicts
    from paddleocr_spark.operators.robots import compile_rules

    compiled = compile_rules(rules)
    assert robots_verdict(compiled, "/aaax") == robots_verdict(rules, "/aaax")
