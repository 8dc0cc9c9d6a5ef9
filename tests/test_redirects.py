"""Redirect-chain resolution: browser-cap semantics on crafted graphs
+ fixture closed-form parity."""

import pandas as pd

from paddleocr_spark.functions import redirects as rd


def _df(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_resolver_chain_cycle_and_cap_semantics(spark):
    """Plain chain resolves with exact hop count; a url with no edges
    is its own final (0 hops); a cycle reports too_many after MAX_HOPS;
    a chain of length EXACTLY max_hops is 'ok' (the last hop lands on a
    terminal — the final probe distinguishes it from a cycle)."""
    edges = [(f"c/{i}", f"c/{i + 1}") for i in range(8)]  # c/0..c/8
    edges += [("loop/0", "loop/1"), ("loop/1", "loop/0")]
    starts = [("c/0",), ("c/5",), ("isolated",), ("loop/0",)]
    out = {
        r.url: (r.final, r.hops, r.status)
        for r in rd.resolve_redirects(
            _df(spark, starts, ["url"]),
            _df(spark, edges, ["src", "dst"]),
            max_hops=8,
        ).collect()
    }
    assert out["c/0"] == ("c/8", 8, "ok")  # lands on terminal AT the cap
    assert out["c/5"] == ("c/8", 3, "ok")
    assert out["isolated"] == ("isolated", 0, "ok")
    final, hops, status = out["loop/0"]
    assert (hops, status) == (8, "too_many")
    assert final == "loop/0"  # 8 steps around a 2-cycle

    # one hop PAST the cap is too_many
    out2 = {
        r.url: r.status
        for r in rd.resolve_redirects(
            _df(spark, edges, ["src", "dst"]).selectExpr(
                "src as url"
            ).limit(0).unionByName(_df(spark, [("c/0",)], ["url"])),
            _df(spark, edges, ["src", "dst"]),
            max_hops=7,
        ).collect()
    }
    assert out2["c/0"] == "too_many"


def test_fixture_graph_matches_closed_form(spark):
    """The sf0.001 fixture resolution equals the closed-form oracle
    arithmetic (chains of length doc_id%4; cycles when doc_id%11==0)."""
    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.k: r.v for r in rd.redirect_rows(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    ).collect()
    for row in docs:
        d = row.doc_id
        h = d % 4
        url = f"https://r.example.test/{d}/0"
        if d % 11 == 0 and h > 0:
            want = (
                f"https://r.example.test/{d}/{rd.MAX_HOPS % (h + 1)}"
                f"|{rd.MAX_HOPS}|too_many"
            )
        else:
            want = f"https://r.example.test/{d}/{h}|{h}|ok"
        assert got[url] == want, d
