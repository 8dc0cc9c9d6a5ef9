"""Corpus drift monitor: exact TV arithmetic, the designed fixture
spectrum, and oracle parity."""

import duckdb
import pytest

from paddleocr_spark.functions.drift import DRIFT_SQL, drift_rows

SF = "/root/testdata/sf0.001"


def test_tv_spectrum_and_exactness(spark):
    rows = {r["k"]: r["v"] for r in drift_rows(spark, SF).collect()}
    # hosts are parity-disjoint by construction -> maximal drift
    assert rows["tv:host"].split("|")[2] == "1000000"
    # languages are parity-independent -> small but nonzero drift
    lang_tv = int(rows["tv:lang"].split("|")[2])
    assert 0 < lang_tv < 200000
    # windows are balanced halves
    n_ref, n_cur, _ = rows["tv:lang"].split("|")
    assert n_ref == n_cur == "250"
    # detail rows reconcile with the summary totals
    detail = [
        tuple(map(int, v.split("|")))
        for k, v in rows.items()
        if k.startswith("lang:")
    ]
    assert sum(a for a, _ in detail) == 250
    assert sum(b for _, b in detail) == 250
    # brute-force TV from the detail rows matches the summary
    num = sum(abs(a * 250 - b * 250) for a, b in detail)
    assert lang_tv == num * 1000000 // (2 * 250 * 250)


def test_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(DRIFT_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in drift_rows(spark, SF).collect()}
    assert mine == oracle
