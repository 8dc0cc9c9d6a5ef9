"""Incremental near-dup ingestion (functions/dedup.py band index):
equivalence with the full-corpus LSH pairs, partition pruning on the
committed index, and idempotent re-ingest."""

import pytest

from pyspark.sql import functions as F

from paddleocr_spark.functions.dedup import (
    banded_keys,
    doc_signatures,
    incremental_neardup_pairs,
    minhash_lsh_pairs,
    write_band_index,
)
from paddleocr_spark.sources.scan import scan_parquet

SF = "/root/testdata/sf0.001"
CUT = 400  # committed: doc_id < CUT; new batch: doc_id >= CUT


def _split(spark):
    docs = scan_parquet(spark, f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    return (
        docs.where(F.col("doc_id") < CUT),
        docs.where(F.col("doc_id") >= CUT),
    )


def test_incremental_equals_full_corpus_pairs(spark, tmp_path):
    committed, batch = _split(spark)
    idx = str(tmp_path / "index")
    write_band_index(spark, committed, idx)
    inc = incremental_neardup_pairs(spark, batch, idx).collect()

    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, SF).collect()
    }
    want_cross = {
        (a, b) for a, b in full if (a >= CUT) != (b >= CUT)
    }
    want_within = {(a, b) for a, b in full if a >= CUT and b >= CUT}

    got_cross = {
        (min(r["doc_id"], r["dup_of"]), max(r["doc_id"], r["dup_of"]))
        for r in inc
        if r["src"] == "committed"
    }
    got_within = {
        (r["doc_id"], r["dup_of"]) for r in inc if r["src"] == "batch"
    }
    # full pairs are doc_a < doc_b; cross pairs normalize the same way
    assert got_cross == {(min(a, b), max(a, b)) for a, b in want_cross}
    assert got_within == want_within
    # committed-vs-committed pairs are NEVER produced
    assert all(
        r["doc_id"] >= CUT for r in inc
    )


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    committed, batch = _split(spark)
    idx = str(tmp_path / "index")
    write_band_index(spark, committed, idx)
    all_files = set(spark.read.parquet(idx).inputFiles())
    nb = banded_keys(doc_signatures(batch.limit(3)))
    pfxs = [r["pfx"] for r in nb.select("pfx").distinct().collect()]
    pruned = spark.read.parquet(idx).where(F.col("pfx").isin(pfxs))
    # inputFiles() reports the pre-filter relation; the files a task
    # actually opens are observable via input_file_name()
    read_files = {
        r[0]
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert read_files and read_files < all_files
    # and the plan carries the partition filter (static pruning)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pfx" in plan


def test_reingest_is_idempotent(spark, tmp_path):
    committed, batch = _split(spark)
    idx = str(tmp_path / "index")
    write_band_index(spark, committed, idx)
    a = sorted(
        map(tuple, incremental_neardup_pairs(spark, batch, idx).collect())
    )
    b = sorted(
        map(tuple, incremental_neardup_pairs(spark, batch, idx).collect())
    )
    assert a == b and len(a) > 0
