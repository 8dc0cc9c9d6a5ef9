"""Domain-disjoint split: assignment determinism, domain cohesion,
audit-row semantics, and Spark/DuckDB parity."""

import duckdb
import pytest

from paddleocr_spark.functions.splits import (
    N_BUCKETS,
    SPLIT_SQL,
    VAL_BUCKETS,
    split_assignments,
    split_bucket_snippet,
    split_rows,
)

SF = "/root/testdata/sf0.001"


def test_bucket_snippet_matches_python_md5():
    import hashlib

    con = duckdb.connect()
    for dom in ("site7.com", "user3.github.io", "www.ck", "a.shop1.ck"):
        got = con.execute(
            f"SELECT {split_bucket_snippet(fchr39(dom))}"
        ).fetchone()[0]
        want = int(hashlib.md5(dom.encode()).hexdigest()[:2], 16) % N_BUCKETS
        assert got == want, dom


def fchr39(s: str) -> str:
    return "'" + s + "'"


def test_all_docs_of_one_domain_share_a_split(spark):
    a = split_assignments(spark, SF)
    bad = (
        a.groupBy("registrable")
        .agg({"split": "approx_count_distinct"})
        .filter("`approx_count_distinct(split)` > 1")
        .count()
    )
    assert bad == 0


def test_split_rows_audit_semantics(spark):
    rows = {
        r["k"]: r["v"]
        for r in split_rows(spark, SF).collect()
        if r["k"] in ("sizes", "domain_overlap", "leakage")
    }
    n_train, n_val, d_train, d_val = map(int, rows["sizes"].split("|"))
    assert n_train + n_val == 500  # sf0.001 corpus size
    assert rows["domain_overlap"] == "0"
    n_cross, n_pairs = map(int, rows["leakage"].split("|"))
    assert 0 <= n_cross <= n_pairs
    # val fraction is a domain-level 1/20 hash draw: bounded, not exact
    assert n_val <= n_train


def test_split_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(SPLIT_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in split_rows(spark, SF).collect()}
    assert mine == oracle


def test_val_buckets_sanity():
    assert 0 < VAL_BUCKETS < N_BUCKETS
