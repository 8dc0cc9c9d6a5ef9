"""Unigram-LM tokenizer trainer (functions/unigram.py): exact-rational
Viterbi semantics, partition invariance, pure-python EM reference
parity, and corpus-level behavior."""

import pytest

from paddleocr_spark.functions.unigram import (
    MAX_PIECE_LEN,
    encode_unigram,
    seed_pieces,
    train_unigram,
    viterbi_segment,
)

SF = "/root/testdata/sf0.001"


def test_viterbi_prefers_higher_probability():
    # 'ab' as one piece (count 8) beats 'a'+'b' (4*4/total^2)
    counts = {"a": 4, "b": 4, "ab": 8}
    total = 16
    assert viterbi_segment("ab", counts, total) == ("ab",)
    # make the single piece rare enough and the split wins:
    # p(ab)=1/101 < p(a)*p(b) = (50/101)*(50/101)
    counts = {"a": 50, "b": 50, "ab": 1}
    assert viterbi_segment("ab", counts, 101) == ("a", "b")


def test_viterbi_tie_breaks_fewer_pieces_then_lex():
    # equal probability: p(ab)=4/16 vs p(a)p(b)=(8/16)*(8/16)=4/16
    # -> fewer pieces wins
    counts = {"a": 8, "b": 8, "ab": 4}
    assert viterbi_segment("ab", counts, 20) == ("ab",)
    # same piece-count, same product: 'ab'+'c' vs 'a'+'bc' with equal
    # counts -> lexicographically smaller sequence ('a','bc') wins
    counts = {"a": 5, "ab": 5, "c": 5, "bc": 5}
    assert viterbi_segment("abc", counts, 20) == ("a", "bc")


def test_viterbi_unsegmentable_falls_back_to_chars():
    assert viterbi_segment("xy", {"a": 1}, 1) == ("x", "y")


def test_trainer_learns_repeated_pieces(spark):
    # words <= MAX_PIECE_LEN are learned WHOLE (hard-EM concentrates
    # mass on the maximal piece and prunes its substrings to the char
    # floor); a longer word decomposes into learned pieces
    vocab = spark.createDataFrame(
        [("ababab", 10), ("abc", 5), ("bcbc", 5), ("abababab", 7)],
        ["word", "cnt"],
    )
    pieces = dict(
        train_unigram(spark, SF, vocab=vocab, vocab_target=8, em_rounds=2)
    )
    for whole in ("ababab", "abc", "bcbc"):
        assert whole in pieces
    # the 8-char word can't be one piece; its split parts carry count
    assert any(len(p) > 1 and "ab" in p for p in pieces if p != "ababab")
    # chars survive pruning (coverage floor)
    for ch in "abc":
        assert ch in pieces


def test_trainer_is_partition_invariant(spark):
    from paddleocr_spark.functions.bpe import word_counts

    base = word_counts(spark, SF)
    t1 = train_unigram(spark, SF, vocab=base.repartition(1))
    t7 = train_unigram(spark, SF, vocab=base.repartition(7))
    assert t1 == t7


def _reference_unigram(words, vocab_target, em_rounds):
    """Independent single-machine EM: same spec, loop-and-dict
    implementation."""
    # seed
    freq = {}
    for w, c in words:
        for ln in range(1, min(len(w), MAX_PIECE_LEN) + 1):
            for st in range(0, len(w) - ln + 1):
                p = w[st:st + ln]
                freq[p] = freq.get(p, 0) + c
    multi = sorted(
        (
            (p, c)
            for p, c in freq.items()
            if len(p) > 1 and c >= 2
        ),
        key=lambda pc: (-pc[1], pc[0]),
    )[:512]
    table = dict(multi) | {p: c for p, c in freq.items() if len(p) == 1}
    chars = {p for p in table if len(p) == 1}
    for _ in range(em_rounds):
        counts = dict(table)
        total = sum(counts.values())
        agg = {}
        for w, c in words:
            for piece in viterbi_segment(w, counts, total):
                agg[piece] = agg.get(piece, 0) + c
        table = agg
        for ch in chars:
            table.setdefault(ch, 1)
        multi = sorted(
            ((p, c) for p, c in table.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep = max(vocab_target - len(chars), 0)
        table = dict(multi[:keep]) | {
            p: c for p, c in table.items() if len(p) == 1
        }
    return sorted(table.items(), key=lambda pc: (-pc[1], pc[0]))


def test_trainer_matches_pure_python_reference_on_corpus(spark):
    import duckdb

    con = duckdb.connect()
    words = con.execute(
        "SELECT word, CAST(count(*) AS int) FROM (SELECT unnest("
        "string_split(trim(text), ' ')) AS word FROM "
        f"'{SF}/documents.parquet') WHERE word <> '' GROUP BY word"
    ).fetchall()
    want = _reference_unigram([(w, c) for w, c in words], 64, 2)
    got = train_unigram(spark, SF)
    assert got == want


def test_corpus_training_learns_whole_words(spark):
    pieces = dict(train_unigram(spark, SF))
    # every vocab word short enough to BE a piece is learned whole
    import duckdb

    con = duckdb.connect()
    words = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(trim(text), ' ')) "
            f"FROM '{SF}/documents.parquet'"
        ).fetchall()
        if r[0]
    ]
    short = [w for w in words if 1 < len(w) <= MAX_PIECE_LEN]
    assert short and all(w in pieces for w in short)
    enc = encode_unigram(spark, SF, sorted(pieces.items()))
    tot = enc.groupBy().sum("n_words", "n_pieces").collect()[0]
    fertility = tot["sum(n_pieces)"] / tot["sum(n_words)"]
    assert 1.0 <= fertility < 1.2  # only 'customer' (8 chars) splits


def test_seed_includes_char_floor(spark):
    vocab = spark.createDataFrame([("zq", 1)], ["word", "cnt"])
    seeds = {r["piece"] for r in seed_pieces(spark, SF, vocab).collect()}
    # 'zq' occurs once (< SEED_MIN_COUNT) so only the chars survive
    assert "z" in seeds and "q" in seeds and "zq" not in seeds
