"""IDN homograph detection (functions/homograph.py)."""

import duckdb

from tests.conftest import SF_SMALL


def test_matches_duckdb_oracle(spark):
    from paddleocr_spark.functions.homograph import (
        HOMOGRAPH_SQL,
        homograph_rows,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(HOMOGRAPH_SQL).fetchall()}
    mine = {
        r["k"]: r["v"] for r in homograph_rows(spark, SF_SMALL).collect()
    }
    assert mine == oracle
    # the fixture plants exactly the doc_id%5 spoofs, and every one is
    # caught as an attack (its skeleton is a registered host)
    attacks = {k for k, v in mine.items() if v.split("|")[3] == "1"}
    assert attacks == {k for k in mine if int(k) % 5 == 0}


def test_detection_semantics(spark, tmp_path):
    """A spoof of a host with no confusable chars stays clean; a
    mixed-script host whose skeleton is NOT registered is mixed but
    not an attack."""
    import pandas as pd

    path = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            # doc 0: %5==0 spoof slot but host has no s/c -> clean
            # doc 5: %5==0 spoof of 'casa' -> attack
            # docs 1-4: legit fillers so the census holds both hosts
            "doc_id": [0, 1, 2, 3, 4, 5],
            "source": ["beta", "beta", "casa", "casa", "beta", "casa"],
            "text": ["x"] * 6,
            "lang": ["en"] * 6,
        }
    ).to_parquet(path)
    from paddleocr_spark.functions.homograph import homograph_rows

    rows = {
        r["k"]: r["v"].split("|")
        for r in homograph_rows(spark, str(tmp_path)).collect()
    }
    cand0, skel0, mixed0, attack0 = rows["0"]
    assert (cand0, mixed0, attack0) == ("beta", "0", "0")
    cand5, skel5, mixed5, attack5 = rows["5"]
    assert cand5 != "casa" and skel5 == "casa"
    assert (mixed5, attack5) == ("1", "1")


def test_soft404_detector_components():
    """Error shells fire on title; genuine articles never fire; a
    short error-phrase body without an error title still fires (the
    body signal is real, not dead code)."""
    from paddleocr_spark.functions.soft404 import (
        SOFT404_MIN_CHARS,
        is_soft404,
        synth_soft404_page,
    )

    v, t, _l = is_soft404(synth_soft404_page(1))
    assert (v, t) == (1, 1)
    v, t, L = is_soft404(synth_soft404_page(2))
    assert (v, t) == (0, 0) and L >= SOFT404_MIN_CHARS
    body_only = (
        "<html><head><title>Home</title></head>"
        "<body><article><p>item not found</p></article></body></html>"
    )
    v, t, L = is_soft404(body_only)
    assert (v, t) == (1, 0) and L < SOFT404_MIN_CHARS
    long_mention = (
        "<html><head><title>News</title></head><body><article><p>"
        + "the archive discusses error rates at length " * 10
        + "</p></article></body></html>"
    )
    v, _t, L = is_soft404(long_mention)
    assert v == 0 and L >= SOFT404_MIN_CHARS


def test_soft404_matches_duckdb_oracle(spark):
    from paddleocr_spark.functions.soft404 import (
        SOFT404_SQL,
        soft404_rows,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(SOFT404_SQL).fetchall()}
    mine = {
        r["k"]: r["v"] for r in soft404_rows(spark, SF_SMALL).collect()
    }
    assert mine == oracle


def test_crawl_budget_hamilton(spark, tmp_path):
    """Largest-remainder apportionment: crafted weights where naive
    floor under-spends by 2; the two largest remainders (tie to the
    smaller host) get the bumps; the budget is spent exactly."""
    import pandas as pd

    path = str(tmp_path / "documents.parquet")
    # weights via text lengths: hosts a,b,c with volumes 5, 5, 2
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "source": ["a", "b", "c"],
            "text": ["x" * 5, "y" * 5, "z" * 2],
            "lang": ["en"] * 3,
        }
    ).to_parquet(path)
    from paddleocr_spark.functions.crawlbudget import crawl_budget_rows

    rows = {
        r["k"]: tuple(map(int, r["v"].split("|")))
        for r in crawl_budget_rows(
            spark, str(tmp_path), budget=10
        ).collect()
    }
    # quotas: a,b = 10*5/12 = 4 rem 2; c = 10*2/12 = 1 rem 8
    # leftover = 10 - 9 = 1 -> c (largest remainder) gets the bump
    assert rows["a"] == (5, 4, 2, 4)
    assert rows["b"] == (5, 4, 2, 4)
    assert rows["c"] == (2, 1, 8, 2)
    assert sum(v[3] for v in rows.values()) == 10


def test_crawl_budget_matches_duckdb_oracle(spark):
    from paddleocr_spark.functions.crawlbudget import (
        CRAWL_BUDGET,
        CRAWL_BUDGET_SQL,
        crawl_budget_rows,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(CRAWL_BUDGET_SQL).fetchall()}
    mine = {
        r["k"]: r["v"]
        for r in crawl_budget_rows(spark, SF_SMALL).collect()
    }
    assert mine == oracle
    assert (
        sum(int(v.split("|")[3]) for v in mine.values()) == CRAWL_BUDGET
    )


def test_parse_meta_refresh_forms():
    from paddleocr_spark.functions.homograph import parse_meta_refresh

    assert parse_meta_refresh("0; url=/x") == (0, "/x")
    assert parse_meta_refresh("5;URL='/q'") == (5, "/q")
    assert parse_meta_refresh(" 2 ; Url = rel ") == (2, "rel")
    assert parse_meta_refresh("7") == (7, None)
    assert parse_meta_refresh('3,url="/c"') == (3, "/c")
    assert parse_meta_refresh("4; something=else") == (4, None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="delay"):
        parse_meta_refresh("url=/x")


def test_meta_refresh_matches_duckdb_oracle(spark):
    from paddleocr_spark.functions.homograph import (
        META_REFRESH_SQL,
        meta_refresh_rows,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(META_REFRESH_SQL).fetchall()}
    mine = {
        r["k"]: r["v"]
        for r in meta_refresh_rows(spark, SF_SMALL).collect()
    }
    assert mine == oracle
