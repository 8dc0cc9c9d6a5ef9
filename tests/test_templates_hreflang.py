"""DOM template census + hreflang translation clusters: semantic edges
(layout-template equivalence, sloppy-annotation closure, dangling
targets) on crafted corpora."""

import pandas as pd

from paddleocr_spark.functions import hreflang as hf
from paddleocr_spark.operators import templates as tp


def _write_docs(spark, tmp_path, rows, cols=("doc_id", "text")):
    pdf = pd.DataFrame(rows, columns=list(cols))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


# -- dom templates -------------------------------------------------------------

def test_dom_templates_match_layout_classes(spark, tmp_path):
    # 16 docs on one host -> 4 docs per layout; every layout must have
    # a DISTINCT skeleton (4 templates, even split)
    rows = [(i, f"text {i}", "hosta", "en") for i in range(16)]
    sf = _write_docs(
        spark, tmp_path, rows, cols=("doc_id", "text", "source", "lang")
    )
    got = tp.dom_template_census(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["host"] == "hosta.example.test"
    assert r["n_docs"] == 16
    assert r["n_templates"] == 4
    assert r["counts_desc"] == "4-4-4-4"
    assert r["top_share_micro"] == 250000


def test_dom_template_skeleton_ignores_text_and_attrs(spark, tmp_path):
    # same layout, wildly different text -> ONE template
    rows = [
        (0, "short", "h", "en"),
        (4, "a much longer body " * 40, "h", "en"),
        (8, "unicode txt", "h", "en"),
    ]  # doc_ids = 0 mod 4 -> all layout 0
    sf = _write_docs(
        spark, tmp_path, rows, cols=("doc_id", "text", "source", "lang")
    )
    r = tp.dom_template_census(spark, sf).collect()[0]
    assert r["n_templates"] == 1
    assert r["counts_desc"] == "3"


# -- hreflang ------------------------------------------------------------------

def test_hreflang_sloppy_star_closes_over_two_hops(spark, tmp_path):
    # full group: en lists de+fr, de/fr list only en -> the fr page's
    # own tags never mention de, yet the cluster must include it
    sf = _write_docs(spark, tmp_path, [(i, "t") for i in range(3)])
    got = {r["cluster"]: r for r in hf.hreflang_clusters(spark, sf).collect()}
    assert set(got) == {"https://www.example.test/de/a/0"}
    r = got["https://www.example.test/de/a/0"]
    assert r["n_pages"] == 3
    assert r["langs"] == "de-en-fr"


def test_hreflang_dangling_target_and_truncated_groups(spark, tmp_path):
    # 5 docs: group 0 full (en,de,fr), group 1 = en,de only -> en's
    # advertised fr alternate is dangling and must not create a node
    sf = _write_docs(spark, tmp_path, [(i, "t") for i in range(5)])
    got = {r["cluster"]: (r["n_pages"], r["langs"])
           for r in hf.hreflang_clusters(spark, sf).collect()}
    assert got == {
        "https://www.example.test/de/a/0": (3, "de-en-fr"),
        "https://www.example.test/de/a/1": (2, "de-en"),
    }


def test_hreflang_lone_page_is_its_own_cluster(spark, tmp_path):
    # a single en page whose alternates are all dangling
    sf = _write_docs(spark, tmp_path, [(0, "t")])
    got = hf.hreflang_clusters(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["cluster"] == "https://www.example.test/en/a/0"
    assert got[0]["n_pages"] == 1
    assert got[0]["langs"] == "en"
