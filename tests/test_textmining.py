"""Readability, script profile, host reputation, URL-param mining, and
pagination stitching: python-reference parity on crafted corpora plus
the semantic edge each operator exists for."""

import hashlib
import math
import re

import pandas as pd
from pyspark.sql import functions as F

from paddleocr_spark.functions import pagination as pg
from paddleocr_spark.functions import textmetrics as tm
from paddleocr_spark.functions import urlstats as us


def _write_docs(spark, tmp_path, rows, cols=("doc_id", "text")):
    pdf = pd.DataFrame(rows, columns=list(cols))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


# -- readability ---------------------------------------------------------------

def _py_readability(text):
    toks = re.split(r"\s+", text.strip())
    w = max(len(toks), 1)
    s = max(len(re.findall(r"[.!?]+", text)), 1)
    sy = len(re.findall(r"[aeiouy]+", text.lower()))
    cx = sum(
        1 for t in toks if len(re.findall(r"[aeiouy]+", t.lower())) >= 3
    )
    ease = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
    fk = 0.39 * (w / s) + 11.8 * (sy / w) - 15.59
    fog = 0.4 * ((w / s) + 100.0 * (cx / w))
    return (
        w, s, sy, cx,
        math.floor(ease * 1e6), math.floor(fk * 1e6),
        math.floor(fog * 1e6),
    )


def test_readability_matches_python_reference(spark, tmp_path):
    rows = [
        (0, "The cat sat. It ran! Did it?"),
        (1, "Extraordinary considerations notwithstanding. Yes."),
        (2, "word"),  # no sentence punctuation -> s clamps to 1
        (3, "a e i o u and continuously reorganizing bureaucracies."),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"],
            r["n_complex"], r["ease_micro"], r["fk_grade_micro"],
            r["fog_micro"],
        )
        for r in tm.readability(spark, sf).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_readability(text), (doc_id, text)


def test_readability_negative_grade_floors_toward_minus_inf(spark, tmp_path):
    # one word, one "sentence", zero syllable groups -> fk = 0.39 - 15.59
    sf = _write_docs(spark, tmp_path, [(0, "xxx.")])
    row = tm.readability(spark, sf).collect()[0]
    assert row["fk_grade_micro"] == math.floor((0.39 + 0.0 - 15.59) * 1e6)
    assert row["fk_grade_micro"] < 0


# -- script profile ------------------------------------------------------------

def test_script_profile_dominant_per_injection(spark, tmp_path):
    rows = [(i, "plain ascii text") for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in tm.script_profile(spark, sf).collect()}
    expect = {
        0: "cyrillic", 1: "greek", 2: "cjk", 3: "arabic", 4: "hangul",
    }
    for doc_id, dom in expect.items():
        r = got[doc_id]
        assert r["dominant"] == dom
        assert r[f"n_{dom}"] > 0
        # exactly one non-Latin script present
        others = [
            n for n in ("cyrillic", "greek", "cjk", "arabic", "hangul")
            if n != dom
        ]
        assert all(r[f"n_{o}"] == 0 for o in others)
        assert r["n_latin"] == len("plain ascii text".replace(" ", ""))


# -- host reputation -----------------------------------------------------------

def test_host_reputation_shrinks_small_hosts_toward_mean(spark, tmp_path):
    # host a: 10 docs of length 100; host b: 1 doc of length 1000
    rows = [(i, "x" * 100, "a") for i in range(10)]
    rows.append((10, "x" * 1000, "b"))
    sf = _write_docs(spark, tmp_path, rows, cols=("doc_id", "text", "source"))
    got = {r["host"]: r for r in us.host_reputation(spark, sf).collect()}
    gn, gsum = 11, 10 * 100 + 1000
    for host, n, s in (("a.example.test", 10, 1000),
                       ("b.example.test", 1, 1000)):
        expect = (1000 * (s * gn + us._K * gsum)) // (gn * (n + us._K))
        assert got[host]["score_milli"] == expect
    # the single-doc length-1000 host is pulled far below its raw mean
    raw_b = 1000 * 1000  # raw mean in milli-units
    assert got["b.example.test"]["score_milli"] < raw_b / 2
    # and stays above the 10-doc host (its evidence still counts)
    assert (
        got["b.example.test"]["score_milli"]
        > got["a.example.test"]["score_milli"]
    )


# -- url params ----------------------------------------------------------------

def test_url_params_classifies_tracking_vs_content(spark, tmp_path):
    rows = [(i, "t") for i in range(60)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["param"]: r for r in us.url_params(spark, sf).collect()}
    assert set(got) == {"page", "sid", "ref"}
    # page drives the content hash -> some base group sees >1 content
    assert got["page"]["is_tracking"] == 0
    assert got["page"]["max_group_contents"] > 1
    assert got["page"]["n_vals"] == 4
    # session id and ref never change content within a base group
    assert got["sid"]["is_tracking"] == 1
    assert got["sid"]["max_group_contents"] == 1
    assert got["sid"]["n_vals"] == 3
    assert got["ref"]["is_tracking"] == 1
    assert got["ref"]["n_vals"] == 1
    # ref only exists on even doc_ids
    assert got["ref"]["n_urls"] == 30


# -- pagination ----------------------------------------------------------------

def _expected_articles(n_docs):
    """Python reference: head url -> (n_pages, stitched)."""
    out = {}
    for doc_id in range(n_docs):
        art, part = divmod(doc_id, 4)
        L = art % 4 + 1
        txt = f"Article {art} section {part + 1}."
        if part == 0:
            stitched = "\n".join(
                f"Article {art} section {i + 1}." for i in range(L)
            )
            out[f"https://art.test/a/{art}?page=1"] = (L, stitched)
        elif part >= L:
            out[f"https://art.test/a/{art}?page={part + 1}"] = (1, txt)
    return out


def test_pagination_stitches_chains_in_order(spark, tmp_path):
    n = 40  # arts 0..9 -> chain lengths 1,2,3,4 each appear twice+
    sf = _write_docs(spark, tmp_path, [(i, "t") for i in range(n)])
    got = {
        r["head_url"]: (r["n_pages"], r["stitched_md5"])
        for r in pg.stitch_pagination(spark, sf).collect()
    }
    expect = {
        k: (L, hashlib.md5(s.encode()).hexdigest())
        for k, (L, s) in _expected_articles(n).items()
    }
    assert got == expect
    # every chain length 1..4 appears
    assert {v[0] for v in got.values()} == {1, 2, 3, 4}


def test_pagination_extra_doubling_rounds_idempotent(spark, tmp_path):
    # _ROUNDS covers 2^_ROUNDS pages; running with more rounds must not
    # change the result (resolved heads contribute distance 0)
    sf = _write_docs(spark, tmp_path, [(i, "t") for i in range(16)])
    base = {
        tuple(r) for r in pg.stitch_pagination(spark, sf).collect()
    }
    orig = pg._ROUNDS
    try:
        pg._ROUNDS = orig + 2
        more = {
            tuple(r) for r in pg.stitch_pagination(spark, sf).collect()
        }
    finally:
        pg._ROUNDS = orig
    assert base == more


def test_winnow_shared_run_guarantee(spark, tmp_path):
    """Winnowing's match guarantee: two docs sharing a run of
    >= WIN_W + WIN_GRAM - 1 words share >= 1 fingerprint; a doc with no
    shared run shares none; short docs (< WIN_GRAM words) emit zero
    grams and zero fingerprints."""
    from paddleocr_spark.functions.textmetrics import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = 4+3-1
    texts = [
        "one two three " + shared + " four five",
        shared + " completely different tail words here",
        "unrelated content with no overlap at all whatsoever today",
        "tiny doc",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")

    # recompute the fingerprint SETS with the same kernel expressions
    # (the query only ships a set digest)
    from pyspark.sql import functions as F

    from paddleocr_spark.functions.textmetrics import (
        _GRAM_HASHES_SPARK, WIN_W,
    )
    fps_expr = (
        f"array_distinct(transform(filter(transform("
        f"sequence(1, greatest(size(hs) - {WIN_W - 1}, 1)),"
        f" j -> slice(hs, j, {WIN_W})), a -> size(a) = {WIN_W}),"
        f" a -> array_min(a)))"
    )
    rows = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .withColumn("hs", F.expr(_GRAM_HASHES_SPARK))
        .selectExpr("doc_id", f"{fps_expr} AS fps")
        .collect()
    )
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[0] & fps[1], "shared 6-word run must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert fps[3] == set()

    out = {r.doc_id: (r.n_grams, r.n_fps) for r in winnow_fingerprints(spark, sf).collect()}
    assert out[3] == (0, 0)
    assert out[0][0] == len(texts[0].split()) - 2


def test_winnow_pairs_guarantee_and_cap(spark, tmp_path):
    """A shared >= 6-word run MUST surface as a candidate pair; a
    fingerprint shared by more than WINNOW_DF_CAP docs is dropped."""
    import pandas as pd

    from paddleocr_spark.functions.textmetrics import (
        WINNOW_DF_CAP,
        winnow_pairs_rows,
    )

    run = "alpha beta gamma delta epsilon zeta"  # 6 words
    boiler = "common footer words repeat here always okay"  # 7 words
    rows = [
        (0, f"unique0 starts {run} ends here zero", "s", "en"),
        (1, f"other1 text {run} trailing words one", "s", "en"),
        (2, "totally different content with no overlap at all", "s", "en"),
    ]
    # WINNOW_DF_CAP+2 docs all sharing ONLY the boilerplate run: its
    # fingerprints exceed the cap and produce no pairs
    for i in range(3, 3 + WINNOW_DF_CAP + 2):
        rows.append((i, f"doc{i} padding {boiler} tail{i} words", "s", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "lang"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["k"]: int(r["v"])
        for r in winnow_pairs_rows(
            spark, str(tmp_path), min_shared=1
        ).collect()
    }
    assert "0:1" in got  # the guarantee: shared 6-word run -> pair
    for k in got:
        a, b = map(int, k.split(":"))
        assert a < 3 and b < 3, f"boilerplate family leaked pair {k}"


def test_corpus_quantiles_match_quantile_disc(spark):
    """Exact selection equals DuckDB's own quantile_disc on both
    metrics, and the oracle twin byte-matches."""
    import duckdb as _duckdb

    from paddleocr_spark.functions.textmetrics import (
        QUANTILES_SQL,
        corpus_quantiles,
    )
    from tests.conftest import SF_SMALL as _SF

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{_SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(QUANTILES_SQL).fetchall()}
    mine = {
        r["k"]: r["v"]
        for r in corpus_quantiles(spark, _SF).collect()
    }
    assert mine == oracle
    disc = con.execute(
        "SELECT quantile_disc(length(text), [0.5, 0.9, 0.99]) "
        "FROM documents"
    ).fetchone()[0]
    got = [int(mine[f"chars_p{q}"].split("|")[0]) for q in (50, 90, 99)]
    assert got == list(disc)
