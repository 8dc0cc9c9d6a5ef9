"""Paragraph-aware RAG chunking: packing/splitting semantics, order,
and DuckDB-oracle parity."""

import duckdb
import pytest

from paddleocr_spark.functions.ragchunk import (
    CHUNK_TOKENS,
    RAG_CHUNK_SQL,
    chunk_spans,
    rag_chunk_rows,
)

SF = "/root/testdata/sf0.001"


def _w(n, tag="w"):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_small_spans_pack_up_to_budget():
    chunks = chunk_spans([_w(10, "a"), _w(10, "b"), _w(10, "c")], budget=24)
    # a+b pack (20), c overflows the pack -> new chunk
    assert [(c[0], c[1]) for c in chunks] == [(2, 20), (1, 10)]
    assert chunks[0][3] == _w(10, "a") + "\n" + _w(10, "b")


def test_exact_budget_fits():
    chunks = chunk_spans([_w(12, "a"), _w(12, "b")], budget=24)
    assert [(c[0], c[1]) for c in chunks] == [(2, 24)]


def test_oversized_span_window_splits_alone():
    chunks = chunk_spans([_w(5, "a"), _w(50, "b"), _w(5, "c")], budget=24)
    shapes = [(c[0], c[1], c[2]) for c in chunks]
    # a flushes alone, b splits 24/24/2 flagged oversize, c packs after
    assert shapes == [
        (1, 5, 0), (1, 24, 1), (1, 24, 1), (1, 2, 1), (1, 5, 0),
    ]


def test_oversize_exact_multiple_has_no_empty_tail():
    chunks = chunk_spans([_w(48)], budget=24)
    assert [(c[1], c[2]) for c in chunks] == [(24, 1), (24, 1)]


def test_empty_spans_yield_nothing():
    assert chunk_spans([]) == []
    assert chunk_spans([""]) == []


def test_rows_match_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(RAG_CHUNK_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in rag_chunk_rows(spark, SF).collect()}
    assert mine == oracle
    # the corpus exercises pack, split and oversize paths
    kinds = {v.split("|")[2] for v in mine.values()}
    assert kinds == {"0", "1"}
    multi = [k for k in mine if k.endswith(":1")]
    assert multi  # some docs produce more than one chunk
