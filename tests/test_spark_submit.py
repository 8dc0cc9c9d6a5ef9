"""spark-submit --py-files deployment e2e (north_star deployment clause).

The job is launched through a REAL `spark-submit --master local[2]
--py-files paddleocr_spark.zip job_entry.py ...` from a neutral cwd with
PYTHONPATH stripped — the package resolves from the shipped zip on the
driver AND in the python workers (the broadcast-weights install runs
there), exactly how a cluster deployment ships the code. The deployed
artifact's output is then held to the SAME closed-form byte-identity
oracle as the in-process flagship query (ocr_extract_text), plus the
per-partition lineage audit contract (FIXTURES.md §6).

Reference counterpart: tools/infer/predict_system.py:310-326 respawns
itself --total_process_num times per node; here deployment is one
spark-submit and Spark task scheduling does the sharding.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.submit_pyfiles import submit_extract

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_spark_submit_pyfiles_byte_identity(tmp_path):
    out = submit_extract(2, SF_DIR, str(tmp_path))
    assert out["docs"] == 500
    assert out["sec"] > 0

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(
        "CREATE VIEW got AS SELECT url, "
        "regexp_replace(extracted_text, '\n', '', 'g') AS joined "
        f"FROM read_parquet('{out['results']}/*/*.parquet')"
    )
    norm = entry._NORM_SQL.format(n=120)
    mismatches = con.sql(
        f"""
        WITH want AS (
            SELECT {entry._URL_EXPR_SQL} AS url, {norm} AS joined
            FROM documents
        )
        SELECT count(*) FROM got
        FULL JOIN want USING (url)
        WHERE got.joined IS DISTINCT FROM want.joined
           OR got.url IS NULL OR want.url IS NULL
        """
    ).fetchone()[0]
    assert mismatches == 0  # byte-identical extracted text per url

    # lineage audit: one run, every page accounted for, no errors
    run_ids, pages, ok, errs, parts = con.sql(
        "SELECT count(DISTINCT run_id), sum(page_count), sum(ok_count), "
        "sum(err_count), count(DISTINCT partition_id) "
        f"FROM read_parquet('{out['audit']}/*.parquet')"
    ).fetchone()
    assert run_ids == 1
    assert pages == 500 and ok == 500 and errs == 0
    assert parts > 1  # genuinely sharded, not one fat partition
