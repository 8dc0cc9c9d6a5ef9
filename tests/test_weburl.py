"""URL canonicalization (functions/weburl.py): RFC 3986 normalization
subset over the crawl-dup fixture, plus generic cases beyond it."""

import pytest

from paddleocr_spark.functions.weburl import (
    canonical_url,
    messy_url_expr,
    reversed_host,
    url_host,
)


def _canon(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    return [
        (r["c"], r["h"], r["rh"])
        for r in df.select(
            canonical_url(F.col("raw")).alias("c"),
            url_host(F.col("raw")).alias("h"),
            reversed_host(F.col("raw")).alias("rh"),
        ).collect()
    ]


def test_crawl_dup_variants_collapse(spark):
    """All four fixture spellings of the same page produce ONE canonical
    key (modulo the real page=2 param kept for the %4==3 variant)."""
    rows = _canon(
        spark,
        [
            "https://newsx.example.test/doc/8",
            "HTTPS://NEWSX.Example.TEST:443/doc/8#frag",
            "https://newsx.example.test/doc/8?utm_source=feed",
            "HTTP://NEWSX.example.test:80/doc/8?page=2&utm_campaign=x#top",
        ],
    )
    assert rows[0][0] == rows[1][0] == rows[2][0] == "https://newsx.example.test/doc/8"
    assert rows[3][0] == "http://newsx.example.test/doc/8?page=2"
    assert {r[1] for r in rows} == {"newsx.example.test"}
    assert {r[2] for r in rows} == {"test.example.newsx"}


def test_generic_rules_beyond_fixture(spark):
    rows = _canon(
        spark,
        [
            # non-default port is KEPT
            "https://h.test:8443/a",
            # mixed params: order preserved, only utm_* dropped
            "http://h.test/a?b=1&utm_x=9&c=2",
            # deep subdomain reversal
            "https://www.news.example.test/p",
            # empty path
            "https://h.test",
        ],
    )
    assert rows[0][0] == "https://h.test:8443/a"
    assert rows[1][0] == "http://h.test/a?b=1&c=2"
    assert rows[2][2] == "test.example.news.www"
    assert rows[3][0] == "https://h.test"


def test_messy_url_expr_matches_closed_form(spark):
    """The fixture expression and the oracle's closed forms agree for
    every residue class."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "srcy") for i in range(8)], "doc_id long, source string"
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", canonical_url(messy_url_expr()).alias("c")
        ).collect()
    }
    for i in range(8):
        exp = f"https://srcy.example.test/doc/{i}"
        if i % 4 == 3:
            exp = f"http://srcy.example.test/doc/{i}?page=2"
        assert got[i] == exp, (i, got[i])


def test_robots_prefix_semantics(spark, tmp_path):
    """Prefix match, not equality: /doc/1, /doc/123 blocked by '/doc/1';
    /doc/23 allowed; even-length-source hosts have no rule at all."""
    from paddleocr_spark.functions.weburl import robots_filter_rows

    spark.createDataFrame(
        [(1, "odd"), (123, "odd"), (23, "odd"), (1, "even"), (14, "odd")],
        "doc_id long, source string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["k"], i): r["v"]
        for i, r in enumerate(
            robots_filter_rows(spark, str(tmp_path))
            .orderBy("k")
            .collect()
        )
    }
    vals = {k[0]: v for k, v in got.items()}
    assert vals["123"] == "0" and vals["14"] == "0"
    assert vals["23"] == "1"
    # doc_id 1 appears for both hosts: odd host blocks, even host allows
    one_vals = sorted(v for (k, _), v in got.items() if k == "1")
    assert one_vals == ["0", "1"]


def test_userinfo_case_preserved(spark):
    """RFC 3986: only scheme and host are case-insensitive — userinfo
    keeps its case, non-default ports survive."""
    rows = _canon(
        spark,
        [
            "https://UserA@H.TEST/x",
            "HTTP://Bob@h.test:8080/y",
        ],
    )
    assert rows[0][0] == "https://UserA@h.test/x"
    assert rows[1][0] == "http://Bob@h.test:8080/y"


def test_crawl_schedule_matches_single_window(spark, tmp_path):
    """The sharded two-phase slot assignment equals the textbook
    single-window row_number over (shard, url) per host, and slots are
    dense 0..n_host-1 (collision-free politeness schedule). Hosts are
    skewed on purpose (one host owns most urls)."""
    import pandas as pd
    from pyspark.sql.window import Window
    from pyspark.sql import functions as F

    from paddleocr_spark.functions.weburl import crawl_schedule

    rows = [(i, f"w{i} text", "mega" if i % 5 else f"tiny{i}")
            for i in range(60)]
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).pipe(
        lambda pdf: spark.createDataFrame(pdf)
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    out = crawl_schedule(spark, str(tmp_path))
    got = {r.url: (r.host, r.slot) for r in out.collect()}

    # brute-force single window on the same shard expression
    base = spark.read.parquet(f"{tmp_path}/documents.parquet").selectExpr(
        "'https://' || lower(source) || '.example.test/doc/' || doc_id"
        " AS url",
        "lower(source) || '.example.test' AS host",
    ).selectExpr(
        "url", "host",
        "instr('0123456789abcdef', substr(md5(url), 1, 1)) - 1 AS shard",
    )
    w = Window.partitionBy("host").orderBy("shard", "url")
    want = {
        r.url: (r.host, r.slot)
        for r in base.withColumn(
            "slot", F.row_number().over(w) - 1
        ).collect()
    }
    assert got == want
    # density per host
    by_host: dict = {}
    for _u, (h, s) in got.items():
        by_host.setdefault(h, []).append(s)
    for h, slots in by_host.items():
        assert sorted(slots) == list(range(len(slots))), h


def test_capture_diff_matches_bruteforce(spark):
    """Per-page change counting equals the naive Python walk over the
    same capture ordering (epoch, doc_id), including single-capture
    pages (rate 0, no division) on a truncated corpus."""
    sf_dir = "/root/testdata/sf0.001"
    from paddleocr_spark.functions.weburl import capture_diff_rows

    got = {r.k: r.v for r in capture_diff_rows(spark, sf_dir).collect()}
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    pages: dict = {}
    for d in docs:
        pages.setdefault(d // 4, []).append(d)
    def version(d):
        pk = d // 4
        if pk % 3 == 0:
            return d - d % 2
        if pk % 3 == 1:
            return d % 2
        return 0

    for pk, ds in pages.items():
        caps = sorted(ds, key=lambda d: (1767225600 + (d * 37) % 2592000, d))
        vers = [version(d) for d in caps]
        changes = sum(1 for a, b in zip(vers, vers[1:]) if a != b)
        n = len(caps)
        rate = round(changes * 1000000 / (n - 1)) if n > 1 else 0
        assert got[str(pk)] == f"{n}|{changes}|{rate}", pk
    # stable, churning, and half-changed pages ALL occur in the fixture
    changes_seen = {v.split("|")[1] for v in got.values()}
    assert {"0", "1", "3"} <= changes_seen
