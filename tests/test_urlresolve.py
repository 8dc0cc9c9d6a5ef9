"""RFC 3986 reference resolution: edge-case matrix against Python's
urljoin, plan purity (no Python, no shuffle), and oracle parity."""

from urllib.parse import urljoin

import duckdb
import pytest

from pyspark.sql import functions as F

from paddleocr_spark.functions.urlresolve import (
    URL_RESOLVE_SQL,
    resolve_url,
    url_resolve_rows,
)

SF = "/root/testdata/sf0.001"

CASES = [
    ("https://h.test/a/b/page", "https://x.test/p/q"),
    ("https://h.test/a/b/page", "//cdn.test/lib.js"),
    ("https://h.test/a/b/page", "/rooted/x"),
    ("https://h.test/a/b/page", "img.png"),
    ("https://h.test/a/b/page", "sub/dir/f"),
    ("https://h.test/a/b/page", "../up"),
    ("https://h.test/a/b/page", "../../../../over"),
    ("https://h.test/a/b/page", "./here"),
    ("https://h.test/a/b/page", "?q=1"),
    ("https://h.test/a/b/page?old=2", "?q=1"),
    ("https://h.test/a/b/page", "#frag"),
    ("https://h.test/a/b/page", ""),
    ("https://h.test/a/b/page", "a/./b/../c/"),
    ("https://h.test/a/b/page", "x/.."),
    ("https://h.test/a/b/", "d"),
    ("https://h.test/", "d/e/../f"),
    ("https://h.test/a/b/page", "rel?k=v#f"),
]


def test_matrix_matches_urljoin(spark):
    df = spark.createDataFrame(CASES, ["base", "ref"]).select(
        "base", "ref",
        resolve_url(F.col("base"), F.col("ref")).alias("got"),
    )
    for r in df.collect():
        # crawl normalization strips the ref fragment FIRST; mirror
        # that for the stdlib reference
        ref = r["ref"].split("#")[0]
        want = urljoin(r["base"], ref) if (ref or True) else r["base"]
        want = urljoin(r["base"], ref)
        assert r["got"] == want, (r["base"], r["ref"], r["got"], want)


def test_absolute_ref_is_dot_normalized_strictly(spark):
    # strict RFC 3986 normalizes T.path even when the ref carries its
    # own scheme; stdlib urljoin deliberately skips this — we pin the
    # STRICT behavior (a crawl frontier wants one canonical target)
    df = spark.createDataFrame(
        [("https://h.test/a/page", "https://x.test/p/../q")],
        ["base", "ref"],
    ).select(resolve_url(F.col("base"), F.col("ref")).alias("got"))
    assert df.collect()[0]["got"] == "https://x.test/q"


def test_over_pop_clamps_at_root(spark):
    df = spark.createDataFrame(
        [("https://h.test/a/page", "../../../x")], ["base", "ref"]
    ).select(resolve_url(F.col("base"), F.col("ref")).alias("got"))
    assert df.collect()[0]["got"] == "https://h.test/x"


def test_plan_has_no_python_and_no_exchange(spark):
    plan = url_resolve_rows(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "BatchEvalPython" not in plan


def test_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(URL_RESOLVE_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in url_resolve_rows(spark, SF).collect()}
    assert mine == oracle
