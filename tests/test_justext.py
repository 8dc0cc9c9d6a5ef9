"""jusText paragraph classification: decision-list branches, the four
revision passes, segmenter behavior, and DuckDB-oracle parity on the
real corpus fixture."""

import duckdb

from paddleocr_spark.operators.html_extract import synthesize_html
from paddleocr_spark.operators.justext import (
    JUSTEXT_SQL,
    classify_cf,
    justext_classify,
    revise,
    segment_paragraphs,
)

STOP10 = ("the", "a", "data", "row", "key", "join", "table", "scan",
          "sort", "merge")


def _words(n_stop: int, n_other: int) -> str:
    # 'the' is a stopword; 'alpha' is not
    return " ".join(["the"] * n_stop + ["alpha"] * n_other)


def test_cf_link_density_dominates():
    # 20 chars text, 5 link chars: 25 > 20 -> bad even if stopwords high
    assert classify_cf("the the the the achx", 5) == "bad"
    # exactly at the boundary (link*5 == len) is NOT > -> falls through
    # to the density rules (len 119, 23 link chars, all-stopword text)
    t = " ".join(["the"] * 30)
    assert len(t) == 119
    assert classify_cf(t, 23) == "neargood"  # 23*5 = 115 <= 119
    assert classify_cf(t, 24) == "bad"  # 24*5 = 120 > 119


def test_cf_copyright_is_bad():
    assert classify_cf("\xa9 2026 example corp", 0) == "bad"
    assert classify_cf("&copy; 2026 example", 0) == "bad"


def test_cf_short_branch_splits_on_links():
    assert classify_cf("tiny text", 0) == "short"
    assert classify_cf("tiny text", 1) == "bad"


def test_cf_density_thresholds_exact_integer():
    # 8 stop / 25 words: 8*25 == 25*8 -> >= fires -> high branch
    t = _words(8, 17)
    assert len(t) >= 70
    cls = classify_cf(t, 0)
    assert cls == ("good" if len(t) > 200 else "neargood")
    # 3 stop / 10 words: 3*10 == 10*3 -> low branch (neargood)
    t = _words(3, 7) + " " + "pad" * 10  # keep >= 70 chars
    t = _words(3, 7) + " padpadpadpadpadpadpadpadpadpad"
    # rebuild cleanly: 3 stop + 8 other = 11 words -> below low
    t = " ".join(["the"] * 3 + ["alphabetic"] * 7)
    assert len(t) >= 70
    assert classify_cf(t, 0) == "neargood"
    # one word fewer stop -> bad
    t = " ".join(["the"] * 2 + ["alphabetic"] * 8)
    assert classify_cf(t, 0) == "bad"


def test_cf_length_high_boundary():
    # density >= 0.32, exactly 200 chars -> neargood; 201 -> good
    base = ["the"] * 40 + ["abcd"] * 9  # 49 words
    t = " ".join(base)  # 40*4 + 9*5 - 1 = 204
    t204 = t
    assert len(t204) == 204
    assert classify_cf(t204, 0) == "good"
    t200 = t204[:200].rstrip()
    # recompute honestly on the truncated string
    cls = classify_cf(t200, 0)
    assert cls in ("neargood", "good")
    assert (cls == "good") == (len(t200) > 200)


def _p(cf, text="x" * 80, heading=False):
    return {"cf": cf, "text": text, "heading": heading}


def test_revise_short_between_goods_is_good():
    paras = [_p("good"), _p("short", "tiny"), _p("good")]
    assert revise(paras) == ["good", "good", "good"]


def test_revise_short_between_bads_is_bad():
    paras = [_p("bad"), _p("short", "tiny"), _p("bad")]
    assert revise(paras) == ["bad", "bad", "bad"]


def test_revise_short_mixed_unscreened_is_bad():
    paras = [_p("good"), _p("short", "tiny"), _p("bad")]
    assert revise(paras)[1] == "bad"


def test_revise_short_mixed_screened_by_neargood_is_good():
    # bad side (right) screened by a neargood -> short becomes good
    paras = [_p("good"), _p("short", "tiny"), _p("neargood"), _p("bad")]
    out = revise(paras)
    assert out[1] == "good"
    # the neargood itself has a good neighbour -> good
    assert out[2] == "good"


def test_revise_pass_b_updates_apply_after_the_pass():
    # two adjacent shorts between good and bad: BOTH resolve against
    # the original neighbours (good...bad -> both bad), not against
    # each other's new class
    paras = [_p("good"), _p("short", "s1"), _p("short", "s2"), _p("bad")]
    assert revise(paras)[1:3] == ["bad", "bad"]


def test_revise_neargood_pair_between_bads_sinks_in_place():
    paras = [_p("bad"), _p("neargood"), _p("neargood"), _p("bad")]
    assert revise(paras)[1:3] == ["bad", "bad"]


def test_revise_heading_promotion_within_distance():
    head = _p("short", "My Title", heading=True)
    filler = _p("bad", "x" * 150)  # distance 150 <= 200
    good = _p("good")
    assert revise([head, filler, good])[0] == "good"
    far = _p("bad", "x" * 500)  # distance 500 > 200 blocks the scan
    assert revise([_p("short", "My Title", heading=True), far, good])[0] == "bad"


def test_revise_heading_rescue_requires_cf_not_bad():
    # context-free bad heading is never rescued (pass d guard)
    head = {"cf": "bad", "text": "Linky Title", "heading": True}
    good = _p("good")
    assert revise([head, good])[0] == "bad"


def test_segmenter_inline_tags_keep_spacing_and_links():
    html = ("<html><body><p><b>foo</b> <i>bar</i> "
            '<a href="/x">link text</a></p></body></html>')
    paras = segment_paragraphs(html)
    assert len(paras) == 1
    assert paras[0]["text"] == "foo bar link text"
    assert paras[0]["link_chars"] == len("link text")
    # dom_path is recorded at the FIRST text node (module docstring),
    # so the inline <b> wrapper appears in it
    assert paras[0]["path"] == "html>body>p>b"


def test_segmenter_skips_head_and_flushes_blocks():
    html = ("<html><head><title>t</title></head><body>"
            "<h2>Head</h2><p>one</p><p>two</p></body></html>")
    paras = segment_paragraphs(html)
    assert [p["text"] for p in paras] == ["Head", "one", "two"]
    assert paras[0]["heading"] and not paras[1]["heading"]


def test_empty_text_yields_no_content_paragraph():
    html = synthesize_html("   ", 0)
    texts = [p["text"] for p in segment_paragraphs(html)]
    assert "first comment lorem" in texts
    # layout 0 emits 21 paragraphs with content, 20 without
    assert len(texts) == 20


def test_extract_text_is_good_paragraph_concat():
    from paddleocr_spark.operators.justext import justext_extract_text

    # layout 0 with a long stopword-rich text: content + the two
    # rescued headings come out, newline-joined, in document order
    text = " ".join(["the"] * 40 + ["alphabetic"] * 20)
    assert len(text) > 200
    out = justext_extract_text(synthesize_html(text, 0))
    assert out == "Example Site\nRelated\n" + text
    # neargood content (short doc) extracts nothing
    short = " ".join(["the"] * 20)  # 79 chars, density 1.0, len <= 200
    assert justext_extract_text(synthesize_html(short, 0)) == ""


def test_extract_eval_oracle_matches_python_sf0001():
    import hashlib
    from collections import Counter

    from paddleocr_spark.operators.justext import (
        EXTRACT_EVAL_SQL,
        justext_extract_text,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(EXTRACT_EVAL_SQL).fetchall()}
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    mine, f1sum = {}, 0
    for d, t in rows:
        ext = justext_extract_text(synthesize_html(t, int(d)))
        gt, et = t.split(), ext.split()
        cg, ce = Counter(gt), Counter(et)
        ii = sum(min(c, cg[w]) for w, c in ce.items())
        ng, ne = len(gt), len(et)
        f1 = 2000000 * ii // max(ng + ne, 1)
        f1sum += f1
        mine[str(d)] = "|".join(
            map(str, (ng, ne, ii,
                      1000000 * ii // max(ne, 1),
                      1000000 * ii // max(ng, 1), f1))
        ) + "|" + (hashlib.md5(ext.encode()).hexdigest() if ext else "-")
    mine["corpus"] = f"{len(rows)}|{f1sum // len(rows)}"
    assert mine == oracle
    # both perfect and imperfect extractions occur corpus-wide
    f1s = {int(v.split("|")[5]) for k, v in mine.items() if k != "corpus"}
    assert 0 in f1s and any(0 < f < 1000000 for f in f1s)


def test_extract_eval_fragment_collision_is_counted_once():
    # gold 'data a': a mid-word cut of 'data' yields fragment 'a' in
    # the second half; the multiset min must not double-count it when
    # the first (dropped) half owned the genuine 'a'... construct via
    # direct Counter logic mirroring both engines
    from collections import Counter

    gold = "data a".split()          # counts: data:1, a:1
    ext = ["a", "a"]                 # fragment 'a' + genuine 'a'
    cg, ce = Counter(gold), Counter(ext)
    ii = sum(min(c, cg[w]) for w, c in ce.items())
    assert ii == 1  # only one 'a' exists in gold


def test_justext_matches_duckdb_oracle_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(JUSTEXT_SQL).fetchall()}
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    mine = {}
    for d, t in rows:
        for i, (p, cf, fin, ln, h) in enumerate(
            justext_classify(synthesize_html(t, int(d)))
        ):
            mine[f"{d}:{i}"] = f"{cf}|{fin}|{ln}|{h}|{p}"
    assert mine == oracle
    # every context-free class occurs somewhere in the corpus
    cfs = {v.split("|")[0] for v in mine.values()}
    assert cfs == {"good", "neargood", "short", "bad"}
