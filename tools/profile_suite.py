#!/usr/bin/env python
"""Per-branch wall-clock profile of text_stats_suite (and optionally the
other union suites): times each *_rows branch as its own noop-sink write
in one warm session so the serialized per-branch cost — which is what the
union pays at gate/bench time — is visible. Usage:

    PYTHONPATH=/root/repo python tools/profile_suite.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_suite")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(8).selectExpr("md5(string(id)) m").write.format("noop").mode(
        "overwrite"
    ).save()

    from paddleocr_spark.functions import text
    from paddleocr_spark.operators.html_extract import html_links
    from paddleocr_spark.sources.pages import html_pages_from_documents

    t0 = time.time()
    _pages = html_pages_from_documents(spark, SF_DIR).localCheckpoint()
    t_pages = time.time() - t0
    t0 = time.time()
    _links = html_links(spark, SF_DIR, pages=_pages).localCheckpoint()
    t_links = time.time() - t0
    print(f"{t_pages:7.2f}  [shared html pages walk]")
    print(f"{t_links:7.2f}  [shared links walk]")

    branches = [
        ("token_counts", lambda: text.token_counts(spark, SF_DIR)),
        ("quality/fingerprints/repetition",
         lambda: text.doc_fingerprints(spark, SF_DIR)),
        ("repetition", lambda: text.repetition_stats(spark, SF_DIR)),
        ("url_canon", lambda: text.url_canon_rows(spark, SF_DIR)),
        ("host_rollup", lambda: text.host_rollup_rows(spark, SF_DIR)),
        ("latest_capture", lambda: text.latest_capture_rows(spark, SF_DIR)),
        ("robots_filter", lambda: text.robots_filter_rows(spark, SF_DIR)),
        ("host_pagerank", lambda: text.host_pagerank_rows(spark, SF_DIR)),
        ("boilerplate", lambda: text.boilerplate_gram_rows(spark, SF_DIR)),
        ("doc_links", lambda: text.doc_links_rows(spark, SF_DIR, links=_links)),
        ("anchor_text",
         lambda: text.anchor_text_rows(spark, SF_DIR, links=_links)),
        ("substring_dedup", lambda: text.substring_dedup_rows(spark, SF_DIR)),
        ("decontaminate", lambda: text.decontaminate_rows(spark, SF_DIR)),
        ("pii_redact", lambda: text.pii_redact_rows(spark, SF_DIR)),
        ("host_sample", lambda: text.host_sample_rows(spark, SF_DIR)),
        ("gopher_filter", lambda: text.gopher_filter_rows(spark, SF_DIR)),
        ("quality_classifier",
         lambda: text.quality_classifier_rows(spark, SF_DIR)),
        ("seq_pack", lambda: text.seq_pack_rows(spark, SF_DIR)),
        ("lm_bucket", lambda: text.lm_bucket_rows(spark, SF_DIR)),
        ("crawl_frontier",
         lambda: text.crawl_frontier_rows(spark, SF_DIR, links=_links)),
        ("paragraph_dedup", lambda: text.paragraph_dedup_rows(spark, SF_DIR)),
        ("url_filter", lambda: text.url_filter_rows(spark, SF_DIR)),
        ("html_meta",
         lambda: text.html_metadata_rows(spark, SF_DIR, pages=_pages)),
        ("bm25", lambda: text.bm25_rows(spark, SF_DIR)),
        ("tfidf_keywords", lambda: text.tfidf_keywords_rows(spark, SF_DIR)),
        ("nfc", lambda: text.nfc_rows(spark, SF_DIR)),
        ("mix_report", lambda: text.mix_report_rows(spark, SF_DIR)),
        ("mix_resample", lambda: text.mix_resample_rows(spark, SF_DIR)),
        ("charset_decode",
         lambda: text.charset_decode_rows(spark, SF_DIR, pages=_pages)),
        ("html_tables",
         lambda: text.html_tables_rows(spark, SF_DIR, pages=_pages)),
        ("chunk_split", lambda: text.chunk_split_rows(spark, SF_DIR)),
        ("redirects", lambda: text.redirect_rows(spark, SF_DIR)),
        ("crawl_schedule", lambda: text.crawl_schedule_rows(spark, SF_DIR)),
        ("sitemap", lambda: text.sitemap_rows(spark, SF_DIR)),
        ("inverted_index", lambda: text.inverted_index_rows(spark, SF_DIR)),
        ("capture_diff", lambda: text.capture_diff_rows(spark, SF_DIR)),
        ("robots_rfc", lambda: text.robots_rfc_rows(spark, SF_DIR)),
        ("olap_rollup", lambda: text.olap_rollup_rows(spark, SF_DIR)),
    ]
    total = t_pages + t_links
    rows = []
    for name, fn in branches:
        t0 = time.time()
        try:
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"  ERR   {name}: {str(exc)[:120]}")
            continue
        rows.append((dt, name))
        total += dt
    for dt, name in sorted(rows, reverse=True):
        print(f"{dt:7.2f}  {name}")
    print(f"{total:7.2f}  TOTAL (sum of serialized branches)")

    t0 = time.time()
    text.text_stats_suite(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{time.time() - t0:7.2f}  text_stats_suite (one union job)")
    spark.stop()


if __name__ == "__main__":
    main()
