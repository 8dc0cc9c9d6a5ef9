"""Name extraction, Malay word splitting, recovery analogues, job CLI
parser (SURVEY.md §2.4/§2.5/§2.8 + §3.6 lifecycle)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from paddleocr_spark.functions import names, recovery
from paddleocr_spark.job import build_parser


class TestExtractName:
    def test_positional_scan_with_stopword_skip(self):
        t = "KAD PENGENALAN MYKAD\n880101-14-5523\nWARGANEGARA\nAHMAD ALI\nJALAN X"
        assert names.extract_name(t) == "AHMAD ALI"

    def test_bin_respacing_and_artifact_strip(self):
        t = "900202-10-1234\nAHMAD B IN OSMAN#1"
        assert names.extract_name(t) == "AHMAD BIN OSMAN"
        t2 = "900202-10-1234\nSITI B INTI AMINAH"
        assert names.extract_name(t2) == "SITI BINTI AMINAH"

    def test_alpha_ratio_gate(self):
        # a line with >30% digits never becomes a name
        t = "900202-10-1234\nA1B2C3D4E5\nRAHMAN"
        assert names.extract_name(t) == "RAHMAN"

    def test_no_candidate(self):
        assert names.extract_name("MYKAD\nJALAN SATU") == ""


class TestSplitMalayWords:
    def test_longest_first_protects_compounds(self):
        # MAHKOTA must not split into MAH + KOTA; SETAPAK not SE + TAPAK
        assert names.split_malay_words("MAHKOTAKOTA") == "MAHKOTA KOTA"
        assert names.split_malay_words("SETAPAKTAPAK") == "SETAPAK TAPAK"

    def test_unknown_span_passthrough(self):
        assert names.split_malay_words("TAMANXYZJALAN") == "TAMAN XYZ JALAN"

    def test_plain_concatenation(self):
        assert names.split_malay_words("JALANKENANGABARU") == "JALAN KENANGA BARU"


def test_paragraph_merge_breaks_on_large_gaps(spark):
    row = (
        recovery.paragraph_merge(spark, SF_SMALL)
        .filter(F.col("doc_id") == 4)  # doc_id%5+3 = 7 lines -> 3 paragraphs
        .collect()[0]
    )
    paras = row.markdown.split("\n\n")
    assert len(paras) == 3
    assert all(p for p in paras)


def test_markdown_escape_specials(spark):
    row = recovery.markdown_escape(spark, SF_SMALL).limit(1).collect()[0]
    assert "\\*bold\\*" in row.escaped
    assert "\\`code\\`" in row.escaped
    assert "\\$5" in row.escaped
    assert "\n\n\n" not in row.escaped  # 4 newlines collapsed to 2


def test_extraction_accuracy_is_perfect(spark):
    row = recovery.extraction_accuracy(spark, SF_SMALL).collect()[0]
    assert row.n_docs == 500
    assert row.exact_matches == row.n_docs
    assert row.total_edit_distance == 0


def test_job_parser_contract():
    p = build_parser()
    args = p.parse_args(
        ["--sf-dir", "/x", "--results", "/r", "--audit", "/a", "--orient"]
    )
    assert args.orient and args.sf_dir == "/x"
    with pytest.raises(SystemExit):
        p.parse_args(["--pages", "/p", "--sf-dir", "/x", "--results", "/r", "--audit", "/a"])
