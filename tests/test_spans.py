"""Span-level main-content extraction: winner parity with
extract_main_text, offsets, DOM paths, and degenerate pages."""

import hashlib

import pandas as pd

from paddleocr_spark.operators.html_extract import (
    extract_main_text,
    synthesize_html,
)
from paddleocr_spark.operators.spans import extract_spans, html_spans


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "lang"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_spans_concatenate_to_extracted_text_all_layouts():
    text = "Alpha beta gamma delta epsilon zeta eta theta."
    for seed in range(8):  # every layout twice
        html = synthesize_html(text, seed)
        spans = extract_spans(html)
        joined = ""
        pos = 0
        for path, a, b, t in spans:
            assert a == pos and b == pos + len(t)
            pos = b
            joined += t
        assert joined == extract_main_text(html) == text, seed


def test_spans_layout2_splits_at_half():
    text = "abcdefghij"  # even length -> clean halves
    html = synthesize_html(text, 2)
    spans = extract_spans(html)
    assert len(spans) == 2
    assert spans[0][:3] == ("html>body>main>p", 0, 5)
    assert spans[1][:3] == ("html>body>main>p", 5, 10)
    assert spans[0][3] == "abcde" and spans[1][3] == "fghij"


def test_spans_dom_paths_per_layout():
    text = "Some body text for the page."
    expect = {
        0: "html>body>div>article>p",
        1: "html>body>div>div>p",
        2: "html>body>main>p",
        3: "html>body>section>p",
    }
    for layout, path in expect.items():
        spans = extract_spans(synthesize_html(text, layout))
        assert {s[0] for s in spans} == {path}, layout


def test_spans_winner_without_p_falls_back_to_winner():
    html = (
        "<html><body><article>Direct text without a paragraph element "
        "long enough to score as content here.</article></body></html>"
    )
    spans = extract_spans(html)
    assert len(spans) == 1
    assert spans[0][0] == "html>body>article"
    assert spans[0][3] == extract_main_text(html)


def test_spans_empty_page_yields_none():
    assert extract_spans("<html><body><p>   </p></body></html>") == []


def test_html_spans_dataframe_md5s(spark, tmp_path):
    rows = [(i, f"doc body text number {i} with words.", "h", "en")
            for i in range(8)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r["doc_id"], r["span_idx"]): r
           for r in html_spans(spark, sf).collect()}
    for doc_id, text, _, _ in rows:
        spans = extract_spans(synthesize_html(text, doc_id))
        for i, (path, a, b, t) in enumerate(spans):
            r = got[(doc_id, i)]
            assert (r["dom_path"], r["char_start"], r["char_end"]) == (
                path, a, b,
            )
            assert r["span_md5"] == hashlib.md5(t.encode()).hexdigest()
    assert len(got) == sum(
        2 if d % 4 == 2 else 1 for d, *_ in rows
    )
