"""Gopher repetition-removal verdict: pure-python parity on crafted
corpora plus per-bit threshold cases (including the top-2-gram bit the
sf corpus rarely trips)."""

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from paddleocr_spark.functions import repetition


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _py_page(doc_id: int, text: str) -> str:
    parts = [f"Doc {doc_id} opening line of unique prose.\n"]
    if doc_id % 3 == 0:
        parts.append("Subscribe to our newsletter for updates!\n" * 3)
    parts.append(text[:120] + "\n")
    if doc_id % 4 == 1:
        parts.append("buy cheap widgets online now " * 5 + "\n")
    if doc_id % 5 == 2:
        parts.append(
            "The identical closing paragraph repeats verbatim here.\n" * 2
        )
    parts.append(f"Footer line {doc_id} ends the page.")
    return "".join(parts)


def _py_repetition(doc_id: int, text: str) -> tuple:
    page = _py_page(doc_id, text)
    lines = [l for l in page.split("\n") if l != ""]
    toks = re.sub(r"\s+", " ", page).strip().split(" ")

    lc = Counter(lines)
    line_occ = sum(lc.values())
    line_dup = sum(c - 1 for c in lc.values())
    # char masses count NON-WHITESPACE chars (the shared chlen), for
    # lines and n-grams alike
    line_ch = sum(c * len(l.replace(" ", "")) for l, c in lc.items())
    line_dup_ch = sum(
        (c - 1) * len(l.replace(" ", "")) for l, c in lc.items()
    )

    def grams(n):
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    denom = sum(len(t) for t in toks)

    def chlen(g):
        return len(g.replace(" ", ""))

    def top_mass(n):
        gc = grams(n)
        masses = [c * chlen(g) for g, c in gc.items() if c >= 2]
        return max(masses) if masses else 0

    d5 = sum((c - 1) * chlen(g) for g, c in grams(5).items() if c >= 2)

    def micro(num, den):
        return (num * 1_000_000) // max(den, 1)

    m = (
        micro(line_dup, line_occ),
        micro(line_dup_ch, line_ch),
        micro(top_mass(2), denom),
        micro(top_mass(3), denom),
        micro(top_mass(4), denom),
        micro(d5, denom),
    )
    th = repetition.REP_THRESH
    bits = (
        (m[0] > th["dup_line"])
        + (m[1] > th["dup_line_ch"]) * 2
        + (m[2] > th["top2"]) * 4
        + (m[3] > th["top3"]) * 8
        + (m[4] > th["top4"]) * 16
        + (m[5] > th["dup5"]) * 32
    )
    return (doc_id, *m, bits, int(bits == 0))


def test_parity_with_python_reference(spark, tmp_path):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven eight nine ten eleven"),
        (2, "clean prose with entirely distinct words everywhere today"),
        (3, "x " * 40),            # degenerate repeated unigram page
        (5, "alpha beta alpha beta alpha beta alpha beta alpha beta"),
        (7, "the quick brown fox jumps over the lazy dog again"),
        (12, "word soup line for the three way modulus branch hit"),
        (17, "plain body with no injected branch at all for contrast"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: tuple(r)
        for r in repetition.gopher_repetition(spark, sf).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_repetition(doc_id, text), doc_id


def test_top2_bit_trips(spark, tmp_path):
    # a page dominated by one repeated bigram: bit 4 must set. doc_id
    # chosen so NO injection branch fires (not %3==0, %4==1, %5==2).
    sf = _write_docs(spark, tmp_path, [(11, "spam ham " * 30)])
    row = repetition.gopher_repetition(spark, sf).collect()[0]
    assert row["micro_top2"] > repetition.REP_THRESH["top2"]
    assert row["fail_bits"] & 4
    assert row["keep"] == 0


def test_clean_doc_keeps(spark, tmp_path):
    # no injection branch, all-distinct words -> every micro small,
    # keep = 1 (the dup-line signals are exactly 0: all lines unique).
    sf = _write_docs(
        spark,
        tmp_path,
        [(11, "alpha bravo charlie delta echo foxtrot golf hotel india")],
    )
    row = repetition.gopher_repetition(spark, sf).collect()[0]
    assert row["micro_dup_line"] == 0
    assert row["micro_dup_line_ch"] == 0
    assert row["fail_bits"] == 0 and row["keep"] == 1


def test_dup_line_bits_from_injection(spark, tmp_path):
    # %3==0 fires the 3x repeated newsletter line on a tiny body ->
    # dup-line fraction 2/5 > 0.30 and the char fraction > 0.20.
    sf = _write_docs(spark, tmp_path, [(3, "tiny body")])
    row = repetition.gopher_repetition(spark, sf).collect()[0]
    assert row["fail_bits"] & 1 and row["fail_bits"] & 2


def test_suite_rows_shape(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(0, "a b c"), (1, "d e f")])
    rows = repetition.gopher_repetition_rows(spark, sf).collect()
    assert {r["op"] for r in rows} == {"gopher_repetition"}
    assert all(len(r["v"].split("|")) == 8 for r in rows)
