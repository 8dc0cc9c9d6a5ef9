"""WAT metadata archives (operators/wat.py): canonical JSON, WARC
metadata-record round-trip, archive sink, and oracle parity."""

import gzip
import json

import duckdb
import pytest

from tests.conftest import SF_SMALL


def test_build_wat_json_is_canonical_and_valid():
    from paddleocr_spark.operators.wat import build_wat_json

    js = build_wat_json(
        "https://h.example.test/doc/3", "doc 3", ["/s1", "/about"]
    )
    obj = json.loads(js)
    env = obj["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"].endswith("/doc/3")
    links = env["Payload-Metadata"]["HTML-Metadata"]["Links"]
    assert [e["url"] for e in links] == ["/s1", "/about"]
    # byte-determinism: same inputs -> same string
    assert js == build_wat_json(
        "https://h.example.test/doc/3", "doc 3", ["/s1", "/about"]
    )


def test_unsafe_field_raises_instead_of_corrupting():
    from paddleocr_spark.operators.wat import build_wat_json

    with pytest.raises(ValueError, match="escaping"):
        build_wat_json("https://h/x", 'quote"title', [])


def test_wat_record_is_a_real_warc_metadata_member():
    from paddleocr_spark.operators.wat import build_wat_json, wat_record
    from paddleocr_spark.sources.warc import warc_iter_records

    js = build_wat_json("https://h.example.test/doc/9", "doc 9", ["/a"])
    member = wat_record(
        "https://h.example.test/doc/9", "2026-01-01T00:00:00Z", js, 9
    )
    raw = gzip.decompress(member)
    assert raw.startswith(b"WARC/1.0\r\n")
    (rec,) = list(warc_iter_records(member))
    assert rec["type"] == "metadata"
    assert rec["payload"].decode() == js


def test_wat_archives_round_trip_and_cdx(spark):
    from paddleocr_spark.operators.wat import wat_archives
    from paddleocr_spark.sources.pages import html_pages_from_documents
    from paddleocr_spark.sources.warc import cdx_index, warc_iter_records

    pages = html_pages_from_documents(spark, SF_SMALL).limit(40)
    arts = wat_archives(pages, records_per_archive=16).collect()
    seen = 0
    for a in arts:
        blob = bytes(a["wat"])
        recs = list(warc_iter_records(blob))
        assert len(recs) == a["n_records"]
        # every member individually range-addressable
        idx = cdx_index(blob)
        assert len(idx) == len(recs)
        for ent, rec in zip(idx, recs):
            sub = blob[ent["offset"] : ent["offset"] + ent["length"]]
            (only,) = list(warc_iter_records(sub))
            assert only["url"] == rec["url"]
        seen += len(recs)
    assert seen == 40


def test_wat_rows_match_duckdb_oracle(spark):
    from paddleocr_spark.operators.wat import WAT_SQL, wat_rows

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    oracle = {r[1]: r[2] for r in con.execute(WAT_SQL).fetchall()}
    mine = {r["k"]: r["v"] for r in wat_rows(spark, SF_SMALL).collect()}
    assert mine == oracle


def test_warc_ingest_to_wat_export(spark, tmp_path):
    """Full crawl-shaped loop: HTML responses in .warc.gz ->
    pages_from_warc -> wat_archives — the WAT sidecar a crawl
    post-processor publishes next to the raw archives."""
    from paddleocr_spark.operators.html_extract import synthesize_html
    from paddleocr_spark.operators.wat import wat_archives
    from paddleocr_spark.sources.pages import pages_from_warc
    from paddleocr_spark.sources.warc import (
        warc_encode_responses,
        warc_iter_records,
    )

    recs = [
        (
            f"https://w.test/doc/{i}",
            f"2026-01-02T03:04:0{i}Z",
            "text/html",
            synthesize_html(f"hello doc {i}", i).encode("utf-8"),
        )
        for i in range(4)
    ]
    (tmp_path / "a.warc.gz").write_bytes(
        warc_encode_responses(recs, gzip_members=True)
    )
    pages = pages_from_warc(spark, str(tmp_path))
    arts = wat_archives(pages).collect()
    seen = {}
    for a in arts:
        for rec in warc_iter_records(bytes(a["wat"])):
            seen[rec["url"]] = json.loads(rec["payload"].decode())
    assert set(seen) == {u for u, *_ in recs}
    env = seen["https://w.test/doc/2"]["Envelope"]
    assert env["Payload-Metadata"]["HTML-Metadata"]["Head"]["Title"] == "doc 2"


def test_archive_names_unique_across_arrow_batches(spark):
    """A partition larger than arrow.maxRecordsPerBatch spans several
    Arrow batches inside one mapInPandas call; the chunk counter must
    carry across them or archive names collide (and would overwrite
    each other in an object-store sink)."""
    from paddleocr_spark.operators.wat import wat_archives
    from paddleocr_spark.sources.pages import (
        html_pages_from_documents,
        wet_archives,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        pages = html_pages_from_documents(spark, SF_SMALL).limit(40).coalesce(1)
        arts = wat_archives(pages, records_per_archive=16).collect()
        names = [a["name"] for a in arts]
        assert len(names) == len(set(names)), names
        # 40 rows / batches of 8 / archives of <=16 -> every batch is
        # its own chunk here; counter must keep climbing
        assert len(names) >= 3

        res = pages.selectExpr("url", "cast(html as string) as extracted_text")
        wets = wet_archives(res, records_per_archive=16).collect()
        wnames = [a["name"] for a in wets]
        assert len(wnames) == len(set(wnames)), wnames
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
