"""Aho-Corasick scanner: brute-force parity (incl. overlapping and
bordered patterns the oracle arithmetic cannot count), fail-link
semantics, the border-free precondition of the fixture phrase set,
and oracle parity."""

import re

import duckdb
import pytest

from paddleocr_spark.functions.ahocorasick import (
    AC_SCAN_SQL,
    PHRASES,
    ac_scan,
    ac_scan_rows,
    build_automaton,
)

SF = "/root/testdata/sf0.001"


def _brute(text, patterns):
    hits = []
    for idx, p in enumerate(patterns):
        for m in re.finditer(f"(?={re.escape(p)})", text):
            hits.append((idx, m.start() + len(p)))
    return sorted(hits, key=lambda h: (h[1], h[0]))


def test_matches_brute_force_on_random_strings():
    import random

    rng = random.Random(7)
    pats = ("ab", "bc", "aab", "aa", "cab", "abcab")
    auto = build_automaton(pats)
    for _ in range(200):
        s = "".join(rng.choice("abc") for _ in range(rng.randrange(0, 40)))
        got = sorted(ac_scan(s, auto, pats), key=lambda h: (h[1], h[0]))
        assert got == _brute(s, pats), s


def test_self_overlapping_bordered_pattern_counts_all():
    # 'aa' in 'aaaa' -> 3 overlapping occurrences (replace-count would
    # say 2 — exactly why the fixture set must be border-free)
    auto = build_automaton(("aa",))
    assert len(ac_scan("aaaa", auto, ("aa",))) == 3


def test_fail_links_cross_pattern():
    auto = build_automaton(("ab", "bc"))
    hits = ac_scan("abc", auto, ("ab", "bc"))
    assert sorted(hits) == [(0, 2), (1, 3)]


def test_fixture_phrases_are_border_free_and_lowercase():
    for p in PHRASES:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], (p, k)
        assert p == p.lower()


def test_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(AC_SCAN_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in ac_scan_rows(spark, SF).collect()}
    assert mine == oracle
    # the %5 injection exercises none / single / chained / repeated
    totals = {v.split("|")[0] for v in mine.values()}
    assert {"0", "2", "3"} <= totals
