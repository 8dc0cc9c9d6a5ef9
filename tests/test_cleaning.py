"""C4 line rules, dehyphenation, badword filter, sentence split, and
the deterministic global shuffle: python-reference parity on crafted
corpora plus the rule edge cases each operator exists for."""

import hashlib
import re

import pandas as pd
from pyspark.sql import functions as F

from paddleocr_spark.functions import cleaning, text as text_ops


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


# -- C4 line rules -------------------------------------------------------------

def _py_c4_page(doc_id: int) -> str:
    parts = ["Home | About | Contact"]
    parts.append(
        f"This deterministic article number {doc_id} covers corpus "
        "topics in detail today."
    )
    if doc_id % 4 == 1:
        parts.append(
            "You must enable javascript support to view the comments."
        )
    if doc_id % 4 == 2:
        parts.append(
            "We updated our privacy policy terms for all registered users."
        )
    parts.append("Too short line.")
    parts.append(
        f"The second body sentence of document {doc_id} also ends "
        "with punctuation!"
    )
    if doc_id % 5 == 0:
        parts.append(
            "A third complete sentence appears here to satisfy the rule."
        )
    if doc_id % 7 == 0:
        parts.append("Lorem ipsum dolor sit amet filler text rows.")
    if doc_id % 11 == 0:
        parts.append("function f() { return 1; }")
    parts.append("Copyright 2026 footer")
    return "\n".join(parts)


def _py_keep_line(line: str) -> bool:
    low = line.lower()
    if not re.search(r'[.!?"]$', line.strip()):
        return False
    if len(re.split(r"\s+", line.strip())) < 5:
        return False
    if "javascript" in low:
        return False
    return not any(p in low for p in cleaning._POLICY_PHRASES)


def _py_c4(doc_id: int):
    page = _py_c4_page(doc_id)
    lines = page.split("\n")
    kept = [x for x in lines if _py_keep_line(x)]
    cleaned = "\n".join(kept)
    n_sent = len(re.sub(r"[^.!?]", "", cleaned))
    keep = (
        "lorem ipsum" not in page.lower()
        and "{" not in page
        and n_sent >= 3
    )
    return (
        len(kept),
        len(lines) - len(kept),
        n_sent,
        int(keep),
        hashlib.md5(cleaned.encode()).hexdigest(),
    )


def test_c4_lines_matches_python_reference(spark, tmp_path):
    """Every %4/%5/%7/%11 branch combination in 0..76 agrees with the
    pure-python rule twin, column for column."""
    sf_dir = _write_docs(
        spark, tmp_path, [(i, f"soup words d{i}") for i in range(77)]
    )
    got = {
        r["doc_id"]: (
            r["n_kept"], r["n_dropped"], r["n_sentences"],
            r["page_keep"], r["cleaned_md5"],
        )
        for r in cleaning.c4_lines(spark, sf_dir).collect()
    }
    for i in range(77):
        assert got[i] == _py_c4(i), f"doc {i}"


def test_c4_page_drop_reasons(spark, tmp_path):
    """lorem ipsum and '{' drop the page even when enough sentences
    survive; two kept sentences alone are not enough."""
    sf_dir = _write_docs(spark, tmp_path, [(i, "w") for i in range(78)])
    keep = {
        r["doc_id"]: r["page_keep"]
        for r in cleaning.c4_lines(spark, sf_dir).collect()
    }
    assert keep[35] == 0          # %5==0 and %7==0: lorem kills it
    assert keep[55] == 0          # %5==0 and %11==0: brace kills it
    assert keep[1] == 0           # only 2 sentences kept
    assert keep[10] == 1          # %5==0, no lorem, no brace
    assert keep[20] == 1


# -- dehyphenation --------------------------------------------------------------

def test_dehyphenate_inverts_injection(spark, tmp_path):
    """%3==0 joins both wrap breaks (closed form), %3==1 keeps the
    uppercase continuation split, %3==2 is untouched."""
    rows = [(0, "alpha beta"), (1, "gamma delta"), (2, "epsilon zeta")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_joins"], r["repaired_md5"])
        for r in cleaning.dehyphenate(spark, sf_dir).collect()
    }
    exp0 = (
        "An intro about international work and a state-of-the-art "
        "baseline follows. alpha beta"
    )
    exp1 = "The mid-\nAtlantic ridge stays hyphen-split. gamma delta"
    assert got[0] == (2, hashlib.md5(exp0.encode()).hexdigest())
    assert got[1] == (0, hashlib.md5(exp1.encode()).hexdigest())
    assert got[2] == (0, hashlib.md5(b"epsilon zeta").hexdigest())


def test_dehyphenate_col_rules(spark):
    """Lexical hyphens and uppercase continuations survive; only
    letter + '-' + newline + lowercase joins."""
    cases = [
        ("inter-\nnational", "international"),
        ("state-of-the-art", "state-of-the-art"),
        ("mid-\nAtlantic", "mid-\nAtlantic"),
        ("x 5-\n3 y", "x 5-\n3 y"),          # digit before: not a wrap
        ("re-\nuse and co-\nop", "reuse and coop"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(cases)), "t": [c[0] for c in cases]})
    )
    got = (
        df.select("i", cleaning.dehyphenate_col(F.col("t")).alias("r"))
        .orderBy("i")
        .collect()
    )
    for row, (_, want) in zip(got, cases):
        assert row["r"] == want


# -- badwords -------------------------------------------------------------------

def test_badwords_token_boundaries(spark, tmp_path):
    """Edge punctuation is stripped before the compare; superstrings
    ('casinos') never match; the flooded layout counts all 9 hits."""
    rows = [(0, "clean words"), (1, "more words"), (2, "body text"),
            (3, "casinos echoing unrelated words")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_bad"], r["keep"])
        for r in cleaning.badwords(spark, sf_dir).collect()
    }
    assert got[0] == (0, 1)
    assert got[1] == (1, 0)       # one appended 'casino'
    assert got[2] == (9, 0)       # flood incl. 'Jackpot!' '(jackpot)' 'casino.'
    assert got[3] == (0, 1)       # 'casinos' is not 'casino'


# -- sentence split -------------------------------------------------------------

def _py_sentences(t: str):
    for ab in cleaning._ABBREVS:
        t = t.replace(ab, ab[:-1] + "\x01")
    t = re.sub(r"([.!?]) +([A-Z])", "\\1\x02\\2", t)
    return [s.replace("\x01", ".").strip() for s in t.split("\x02")]


def test_sentence_split_abbrev_guard(spark):
    """Abbreviation dots never split; real boundaries (. ! ?) before a
    capital do; the sentinels always restore."""
    t = (
        "Dr. Smith saw Mr. Jones at No. 4 lab. They left early! "
        "Was it e.g. a test? Prof. Lee said yes. the end"
    )
    df = spark.createDataFrame(pd.DataFrame({"t": [t]}))
    got = df.select(
        cleaning.split_sentences_col(F.col("t")).alias("s")
    ).collect()[0]["s"]
    assert got == _py_sentences(t)
    assert got[0] == "Dr. Smith saw Mr. Jones at No. 4 lab."
    assert got[1] == "They left early!"
    assert got[2] == "Was it e.g. a test?"
    assert got[3] == "Prof. Lee said yes. the end"  # lowercase: no split


def test_sentence_split_corpus_counts(spark, tmp_path):
    """The injected preamble yields exactly 4 sentences per doc (the
    lowercase word soup glues onto the last one)."""
    sf_dir = _write_docs(
        spark, tmp_path, [(i, f"soup tail d{i}") for i in range(6)]
    )
    rows = cleaning.sentence_split(spark, sf_dir).collect()
    assert all(r["n_sentences"] == 4 for r in rows)


# -- global shuffle -------------------------------------------------------------

def test_global_shuffle_matches_single_sort(spark, tmp_path):
    """Two-phase sharded ranking equals the single global ROW_NUMBER
    over md5(seed:doc_id), and positions are a permutation of 1..N."""
    ids = [3, 17, 1024, 99999, 0, 7, 123456, 42]
    sf_dir = _write_docs(spark, tmp_path, [(i, "w") for i in ids])
    got = {
        r["doc_id"]: r["pos"]
        for r in text_ops.global_shuffle(spark, sf_dir).collect()
    }
    order = sorted(
        ids,
        key=lambda i: (
            hashlib.md5(f"{text_ops.SHUFFLE_SEED}:{i}".encode()).hexdigest(),
            i,
        ),
    )
    want = {i: pos + 1 for pos, i in enumerate(order)}
    assert got == want
    assert sorted(got.values()) == list(range(1, len(ids) + 1))
