"""Product quantization: codebook determinism, ADC consistency, the
recall ladder position, and oracle parity."""

import duckdb
import pytest

from paddleocr_spark.functions.pq import (
    PQ_DSUB,
    PQ_M,
    PQ_SQL,
    pq_encode,
    pq_rows,
    train_codebooks,
)

SF = "/root/testdata/sf0.001"


def test_codebooks_shape_and_partition_invariance(spark):
    books = train_codebooks(spark, SF)
    assert len(books) == PQ_M
    for book in books:
        assert book  # every subspace trained at least one centroid
        for _, m in book:
            assert len(m) == PQ_DSUB
    again = train_codebooks(spark, SF)
    assert [sorted(b) for b in books] == [sorted(b) for b in again]


def test_adc_equals_table_lookup_sum(spark):
    """Each vector's ADC must equal the sum of the query-codebook dot
    products selected by its own codes (the PQ contract)."""
    books = train_codebooks(spark, SF)
    from paddleocr_spark.functions.pq import _q
    from paddleocr_spark.functions.similarity import QUERY_VEC_ID

    q = {
        r["vec_id"]: list(r["qq"]) for r in _q(spark, SF).collect()
    }
    query = q[QUERY_VEC_ID]
    tables = []
    for s in range(PQ_M):
        lo = s * PQ_DSUB
        qs = query[lo : lo + PQ_DSUB]
        tables.append(
            {cid: sum(a * b for a, b in zip(qs, m)) for cid, m in books[s]}
        )
    enc = pq_encode(spark, SF, books=books).collect()
    for r in enc[:50]:
        want = sum(tables[s][r["codes"][s]] for s in range(PQ_M))
        assert r["adc"] == want, r["vec_id"]


def test_recall_sits_in_the_index_ladder(spark):
    rows = {r["k"]: r["v"] for r in pq_rows(spark, SF).collect()}
    hits, k, micro = map(int, rows["recall"].split("|"))
    assert k == 10 and 0 < hits <= 10
    assert micro == hits * 100000


def test_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(PQ_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in pq_rows(spark, SF).collect()}
    assert mine == oracle
