"""Char-trigram Naive Bayes language ID (functions/langid.py).

The strict gate (text_stats_suite row 'langid') proves Spark == DuckDB;
these tests prove the classifier is RIGHT: the whole pipeline matches a
pure-Python multinomial NB over the same trigram stream, and on a
corpus whose languages genuinely differ in character distribution it
recovers every label (the fixture's `lang` column is assigned
independently of its synthetic English-ish text, so accuracy there
merely reflects the class prior — the python-parity test still pins
every score bit).
"""

import math
from collections import Counter, defaultdict

from paddleocr_spark.functions.langid import langid_predict

SF = "/root/testdata/sf0.001"


def _py_langid(rows):
    """Textbook multinomial NB from the same trigram stream: rows =
    [(doc_id, lang, text)] -> {doc_id: (pred, correct, best_micro)}."""
    prof = defaultdict(Counter)
    for _, lang, t in rows:
        for i in range(len(t) - 2):
            prof[lang][t[i : i + 3]] += 1
    tl = {L: sum(c.values()) for L, c in prof.items()}
    vocab = set()
    for c in prof.values():
        vocab |= set(c)
    v = len(vocab)
    lp = {
        L: {
            tri: round(math.log((c + 1.0) / (tl[L] + v)) * 1e6)
            for tri, c in cc.items()
        }
        for L, cc in prof.items()
    }
    lp0 = {L: round(math.log(1.0 / (tl[L] + v)) * 1e6) for L in prof}
    out = {}
    for doc_id, lang, t in rows:
        cnt = Counter(t[i : i + 3] for i in range(len(t) - 2))
        sc = {
            L: sum(c * lp[L].get(tri, lp0[L]) for tri, c in cnt.items())
            for L in prof
        }
        best = max(sc.values())
        pred = min(L for L in sc if sc[L] == best)
        out[doc_id] = (pred, 1 if pred == lang else 0, best)
    return out


def test_langid_matches_python_reference(spark):
    import pandas as pd

    got = {
        r["doc_id"]: (r["pred"], r["correct"], r["best_micro"])
        for r in langid_predict(spark, SF).collect()
    }
    df = pd.read_parquet(f"{SF}/documents.parquet")
    py = _py_langid(
        [(r["doc_id"], r["lang"], r["text"]) for _, r in df.iterrows()]
    )
    assert got == py


def test_langid_recovers_separable_languages(spark, tmp_path):
    """On a corpus whose languages use disjoint character inventories
    the classifier must recover every label — the signal-present
    behavior the fixture cannot exercise."""
    import pandas as pd

    words = {
        "aa": ["alpha beta gamma", "beta alpha delta", "gamma delta alpha"],
        "bb": ["zulu yank xray", "xray zulu wolf", "wolf yank zulu"],
        "cc": ["один два три", "три один четыре", "два четыре один"],
    }
    rows = []
    i = 0
    for lang, texts in words.items():
        for t in texts:
            rows.append(
                {
                    "doc_id": i,
                    "text": t + " " + t,
                    "lang": lang,
                    "source": "src0",
                }
            )
            i += 1
    d = tmp_path / "documents.parquet"
    pd.DataFrame(rows).to_parquet(d)
    got = {
        r["doc_id"]: (r["pred"], r["correct"])
        for r in langid_predict(spark, str(tmp_path)).collect()
    }
    assert len(got) == len(rows)
    for r in rows:
        assert got[r["doc_id"]] == (r["lang"], 1), r["doc_id"]


def test_langid_model_is_broadcast(spark):
    """Scale pin: the profile and floor tables join back broadcast —
    the only corpus-wide exchanges are the doc-trigram combine and the
    doc-keyed argmax."""
    plan = (
        langid_predict(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
