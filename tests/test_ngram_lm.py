"""Bigram LM with stupid backoff: Spark result vs a direct Python
reference on a tiny corpus written to parquet (exact micro-nat
integers)."""

import math

from paddleocr_spark.functions.ngram_lm import lm_perplexity


def _brute(texts):
    c2, c1 = {}, {}
    docs = []
    for t in texts:
        toks = t.strip().split(" ")
        pairs = list(zip(toks, toks[1:]))
        docs.append(pairs)
        for p in pairs:
            c2[p] = c2.get(p, 0) + 1
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
    T, V = sum(c1.values()), len(c1)
    bo = round(math.log(0.4) * 1e6)
    out = []
    for i, pairs in enumerate(docs):
        nll = 0
        for p in pairs:
            if c2.get(p, 0) >= 2:  # MIN_COUNT pruning
                lp = round(math.log(c2[p] * 1.0 / c1[p[0]]) * 1e6)
            else:
                lp = bo + round(math.log((c1.get(p[1], 0) + 1.0) / (T + V)) * 1e6)
            nll -= lp
        n = len(pairs)
        out.append((i, n, nll, nll // max(n, 1)))
    return out


def test_lm_ppl_matches_bruteforce(spark, tmp_path):
    texts = [
        "the cat sat on the mat",
        "the cat sat",          # all-seen bigrams
        "dog ran on the mat",   # singleton bigrams -> pruned -> backoff
        "zebra",                # single token -> 0|0
        "the the the the",      # repeated bigram, cnt > 1
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.nll_micro, r.avg_micro)
        for r in lm_perplexity(spark, sf_dir).collect()
    )
    assert got == _brute(texts)
    # seen-bigram docs must score strictly better per bigram than the
    # backoff-heavy doc
    by_id = {g[0]: g for g in got}
    assert by_id[1][3] < by_id[2][3]
    assert by_id[3][1] == 0 and by_id[3][2] == 0
