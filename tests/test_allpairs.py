"""AllPairs prefix-filtered similarity join: completeness vs brute
force, boilerplate-token prefix exclusion, and oracle parity."""

import itertools

import duckdb
import pandas as pd
import pytest

from paddleocr_spark.functions.allpairs import (
    ALLPAIRS_SQL,
    T_DEN,
    T_NUM,
    allpairs_join,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts):
    pdf = pd.DataFrame(
        [(i, t, "s", "en") for i, t in enumerate(texts)],
        columns=["doc_id", "text", "source", "lang"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _shingles(text):
    ws = text.split()
    return {
        " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
    }


def _brute(texts):
    out = {}
    sets = [_shingles(t) for t in texts]
    for a, b in itertools.combinations(range(len(texts)), 2):
        i = len(sets[a] & sets[b])
        na, nb = len(sets[a]), len(sets[b])
        if i * (T_DEN + T_NUM) >= (na + nb) * T_NUM:
            out[(a, b)] = (i, na, nb)
    return out


def test_completeness_with_hot_boilerplate(spark, tmp_path):
    """Every doc shares a boilerplate sentence (a hot shingle family
    that would explode a naive shared-token join); prefix filtering
    must STILL find exactly the qualifying pairs — the hot tokens sort
    last and never enter a prefix."""
    boiler = "all rights reserved contact the site administrator"
    texts = []
    for i in range(12):
        body = " ".join(f"w{i % 3}x{j}" for j in range(10))
        texts.append(f"{body} {boiler}")
    # docs with i%3 equal share their whole body -> high Jaccard
    sf = _write_docs(spark, tmp_path, texts)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["na"], r["nb"])
        for r in allpairs_join(spark, sf).collect()
    }
    assert got == _brute(texts)
    assert got  # the fixture genuinely produces qualifying pairs


def test_completeness_matches_brute_force_on_corpus(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    texts = [t for _, t in rows]
    ids = [d for d, _ in rows]
    want = {
        (ids[a], ids[b]): v for (a, b), v in _brute(texts).items()
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["na"], r["nb"])
        for r in allpairs_join(spark, SF).collect()
    }
    assert got == want


def test_rows_match_duckdb_oracle(spark):
    from paddleocr_spark.functions.allpairs import allpairs_rows

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(ALLPAIRS_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in allpairs_rows(spark, SF).collect()}
    assert mine == oracle


def test_threshold_boundary_exact():
    # J exactly t must be kept: i/(na+nb-i) = 1/2 <=> 3i = na+nb
    i, na, nb = 4, 6, 6
    assert i * (T_DEN + T_NUM) >= (na + nb) * T_NUM
    assert (i - 1) * (T_DEN + T_NUM) < (na + nb) * T_NUM
