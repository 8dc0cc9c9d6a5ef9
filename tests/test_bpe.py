"""Distributed BPE trainer/encoder vs the textbook single-machine
reference (functions/bpe.py bpe_reference)."""

import hashlib

import pandas as pd
import pytest

from paddleocr_spark.functions import bpe


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _py_counts(rows):
    counts: dict[str, int] = {}
    for _, t, _ in rows:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    return counts


def test_trainer_matches_reference_sennrich_corpus(spark, tmp_path):
    """The classic low/lower/newest/widest corpus: the distributed
    trainer learns byte-identical merges, in order, to the textbook
    algorithm."""
    rows = [
        (0, "low low low low low", "a"),
        (1, "lower lower widest widest widest", "a"),
        (2, "newest newest newest newest newest newest", "b"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    want = bpe.bpe_reference(_py_counts(rows), 10)
    got = bpe.train_bpe(spark, sf_dir, n_merges=10)
    assert got == want
    # the famous first merges: 'es' (newest+widest), then 'est', 'est</w>'
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", bpe.END)


def test_trainer_matches_reference_random_corpus(spark, tmp_path):
    """Randomized word-soup corpus, enough merges to hit the
    singleton-pair early stop; merge lists must be identical."""
    import random

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "ab", "abc", "abcd", "xyzzy", "aaa", "aab"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))), "h")
        for i in range(40)
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    want = bpe.bpe_reference(_py_counts(rows), 64)
    got = bpe.train_bpe(spark, sf_dir, n_merges=64)
    assert got == want
    # the early stop actually fired (vocab is tiny): fewer than 64 rules
    assert len(got) < 64


def test_greedy_overlap_and_tiebreak():
    """`aaa` under pair (a,a) folds to [aa, a] (non-overlapping,
    left-to-right) in BOTH the reference and encode_word; tied pair
    counts break lexicographically."""
    assert bpe.encode_word("aaa", [("a", "a")]) == ["aa", "a", bpe.END]
    assert bpe.encode_word("aaaa", [("a", "a")]) == ["aa", "aa", bpe.END]
    # cascade across iterations, not within one
    assert bpe.encode_word("aaaa", [("a", "a"), ("aa", "aa")]) == [
        "aaaa", bpe.END,
    ]
    # tie-break: {ab: 2, ba: 2} makes ALL four pairs count 2 —
    # (a,</w>), (a,b), (b,</w>), (b,a); the lexicographically smallest
    # is (a,</w>) because '<' sorts before 'b' in ASCII
    merges = bpe.bpe_reference({"ab": 2, "ba": 2}, 1)
    assert merges == [("a", bpe.END)]


def test_spark_tiebreak_matches_reference(spark, tmp_path):
    """A corpus where the top pair count is tied: the distributed
    argmax (count DESC, a ASC, b ASC) picks the same rule."""
    rows = [(0, "ab ab ba ba", "h")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = bpe.train_bpe(spark, sf_dir, n_merges=3)
    assert got == bpe.bpe_reference(_py_counts(rows), 3)
    # the four-way tie resolves to (a, </w>) — ASCII '<' < 'b' — and
    # the JVM string ordering agrees with Python's
    assert got[0] == ("a", bpe.END)


def test_encode_bpe_matches_pure_python(spark, tmp_path):
    """encode_bpe (Arrow-batched, memoized) equals the per-word
    pure-Python encode on every doc: token count and the md5 of the
    joined token stream."""
    rows = [
        (0, "low lower lowest", "a"),
        (1, "newest widest low low", "a"),
        (2, "", "b"),
        (3, "unseen wordforms here", "b"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    merges = bpe.train_bpe(spark, sf_dir, n_merges=8)
    got = {r.doc_id: r for r in bpe.encode_bpe(spark, sf_dir, merges).collect()}
    for doc_id, t, _ in rows:
        toks = []
        for w in t.split():
            toks.extend(bpe.encode_word(w, merges))
        r = got[doc_id]
        assert r.n_words == len(t.split())
        assert r.n_bpe_tokens == len(toks)
        assert r.tokens_md5 == hashlib.md5(
            " ".join(toks).encode()
        ).hexdigest()
    # narrow plan: encoding is a zero-shuffle map
    plan = (
        bpe.encode_bpe(spark, sf_dir, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_trainer_on_fixture_corpus(spark):
    """8 merges learned from the real sf0.001 documents table match the
    reference trainer run on the same collected texts (the collect
    happens in the TEST only — the trainer itself never sees more than
    the vocab frame)."""
    sf_dir = "/root/testdata/sf0.001"
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = bpe.bpe_reference(counts, 8)
    got = bpe.train_bpe(spark, sf_dir, n_merges=8)
    assert got == want


def test_run_tokenize_job_artifacts(spark, tmp_path):
    """The --tokenize job body writes the merge table (rank-ordered)
    and per-doc encodings; re-reading both reproduces exactly what the
    in-process trainer/encoder return."""
    rows = [
        (0, "low low low lower lower", "a"),
        (1, "newest newest newest widest widest", "b"),
    ]
    sf_dir = _write_docs(spark, tmp_path / "docs", rows)
    out = bpe.run_tokenize_job(
        spark, sf_dir, str(tmp_path / "tok"), n_merges=6
    )
    assert out["n_docs"] == 2
    m = (
        spark.read.parquet(f"{tmp_path}/tok/merges.parquet")
        .orderBy("rank")
        .collect()
    )
    assert [(r["first"], r["second"]) for r in m] == bpe.bpe_reference(
        _py_counts(rows), 6
    )
    enc = spark.read.parquet(f"{tmp_path}/tok/encodings.parquet")
    got = {r.doc_id: r.n_bpe_tokens for r in enc.collect()}
    for doc_id, t, _ in rows:
        want = sum(
            len(bpe.encode_word(w, [(r["first"], r["second"]) for r in m]))
            for w in t.split()
        )
        assert got[doc_id] == want


def test_fertility_report_exact(spark, tmp_path):
    """Per-lang fertility equals hand-computed sums; langless corpora
    report under 'und'. Also written by the tokenize job artifact."""
    import pandas as pd

    pdf = pd.DataFrame(
        [
            (0, "low lower", "a", "en"),
            (1, "newest", "a", "en"),
            (2, "widest widest", "a", "ms"),
        ],
        columns=["doc_id", "text", "source", "lang"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    merges = bpe.train_bpe(spark, str(tmp_path), n_merges=4)
    enc = bpe.encode_bpe(spark, str(tmp_path), merges)
    got = {
        r.lang: (r.n_words, r.n_bpe_tokens, r.fertility_micro)
        for r in bpe.fertility_report(enc).collect()
    }
    want = {}
    for _, t, _s, lang in pdf.itertuples(index=False):
        toks = sum(len(bpe.encode_word(w, merges)) for w in t.split())
        nw, nt, _ = want.get(lang, (0, 0, 0))
        want[lang] = (nw + len(t.split()), nt + toks, 0)
    for lang, (nw, nt, _) in want.items():
        assert got[lang] == (nw, nt, round(nt * 1000000 / nw)), lang

    # langless corpus -> 'und'
    rows = [(0, "low low", "a")]
    sf_dir = _write_docs(spark, tmp_path / "nolang", rows)
    enc2 = bpe.encode_bpe(spark, sf_dir, merges)
    assert [r.lang for r in bpe.fertility_report(enc2).collect()] == ["und"]


def test_unicode_whitespace_word_boundary_parity(spark, tmp_path):
    """NBSP/U+3000 are NOT word boundaries (Java \\s+ is ASCII-only):
    trainer, encoder, and reference all agree on the same vocabulary
    for multilingual text — the regression that motivated split_words."""
    rows = [
        (0, "foo bar baz foo bar", "a"),   # NBSP inside a 'word'
        (1, "ideo　graph plain", "a"),            # ideographic space
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    counts: dict[str, int] = {}
    for _, t, _s in rows:
        for w in bpe.split_words(t):
            counts[w] = counts.get(w, 0) + 1
    # the NBSP-joined token IS one word
    assert counts["foo bar"] == 2 and counts["ideo　graph"] == 1
    merges = bpe.train_bpe(spark, sf_dir, n_merges=6)
    assert merges == bpe.bpe_reference(counts, 6)
    got = {r.doc_id: r.n_words for r in
           bpe.encode_bpe(spark, sf_dir, merges).collect()}
    assert got == {0: 3, 1: 2}  # encoder sees the trainer's boundaries
