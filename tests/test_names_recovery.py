"""Name extraction, Malay word splitting, recovery analogues, job CLI
parser (SURVEY.md §2.4/§2.5/§2.8 + §3.6 lifecycle)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from paddleocr_spark.functions import names, recovery
from paddleocr_spark.job import build_parser


class TestExtractName:
    def test_after_ic_scan_collects_two_lines(self):
        t = "880101-14-5523\nKHALID\nBIN SALIM\nJALAN X"
        assert names.extract_name(t) == "KHALID BIN SALIM"

    def test_before_ic_upside_down_strategy(self):
        t = "KHALID\nBIN SALIM\n880101-14-5523\nKAD PENGENALAN MYKAD"
        assert names.extract_name(t) == "KHALID BIN SALIM"

    def test_better_name_after_overrides_single_before(self):
        # a lone token before the IC is dropped when a BIN/BINTI pattern
        # exists within 2 lines after the IC (fastapi_app.py:673-687)
        t = "HAKIM\n880101-14-5523\nTAUFIK\nBIN HARUN\nLELAKI"
        assert names.extract_name(t) == "TAUFIK BIN HARUN"

    def test_header_as_name_quirk(self):
        # faithful reference quirk: the header line directly above the IC
        # is taken as a multi-word name when no BIN/BINTI rescues it
        t = "KAD PENGENALAN MYKAD\n880101-14-5523\nWARGANEGARA\nAHMAD ALI\nJALAN X"
        assert names.extract_name(t) == "KAD PENGENALAN MYKAD"

    def test_bin_respacing_and_marker_repair(self):
        t = "900202-10-1234\nAHMADBIN USMAN"
        assert names.extract_name(t) == "AHMAD BIN USMAN"
        t2 = "900202-10-1234\nSITI BIN TI KARIM"
        assert names.extract_name(t2) == "SITI BINTI KARIM"

    def test_artifact_strip(self):
        t = "900202-10-1234\nKHALID NASI\nBINTI SALIM"
        assert names.extract_name(t) == "KHALID BINTI SALIM"

    def test_alpha_ratio_gate_and_noise_veto(self):
        # a line with >30% digits never becomes a name; and the 'RA'
        # noise token vetoes ANY line containing it (faithful quirk:
        # even RAHMAN is skipped by the legacy scan)
        t = "900202-10-1234\nA1B2C3D4E5\nSAMAD"
        assert names.extract_name(t) == "SAMAD"
        t2 = "900202-10-1234\nRAHMAN\nSAMAD"
        assert names.extract_name(t2) == "SAMAD"

    def test_no_candidate(self):
        assert names.extract_name("MYKAD\nJALAN SATU") == ""


class TestSplitMalayWords:
    def test_protected_words_never_split(self):
        # MAHKOTA must not split into MAH + KOTA even though KOTA is a
        # dictionary word; a trailing KOTA still splits off
        assert names.split_malay_words("TAMANMAHKOTA") == "TAMAN MAHKOTA"
        assert names.split_malay_words("MAHKOTAKOTA") == "MAHKOTA KOTA"
        assert names.split_malay_words("SETAPAKJAYA") == "SETAPAK JAYA"

    def test_unknown_span_passthrough(self):
        assert names.split_malay_words("TAMANXYZJALAN") == "TAMAN XYZ JALAN"

    def test_plain_concatenation(self):
        assert names.split_malay_words("JALANWANGSABARU") == "JALAN WANGSA BARU"

    def test_priority_is_dictionary_rank_not_position(self):
        """The reference markers longer names first ANYWHERE in the
        string; a greedy left-to-right scan would match NIK at position
        1 and emit 'A NIK AMAL' — the marker algorithm must not."""
        assert names.split_malay_words("ANIKAMAL") == "ANI KAMAL"

    def test_names_pass_outranks_words_pass(self):
        # PUTRAJAYA contains the name RAJA; the names pass runs first,
        # so the word never survives intact — faithful reference quirk
        assert names.split_malay_words("PUTRAJAYA") == "PUT RAJA YA"

    def test_split_forms_match_oracle_exhaustively(self):
        """Every pick triple the oracle can generate (doc_id mod the
        dictionary size) must split into exactly the SPLIT_FORMS join
        the SQL emits — no cross-boundary dictionary matches."""
        n = len(names.MALAY_WORDS)
        for d in range(n):
            ws = [
                names.MALAY_WORDS[(d * m + o) % n]
                for m, o in names._WORD_PICKS
            ]
            got = names.split_malay_words("".join(ws))
            assert got == " ".join(names.SPLIT_FORMS[w] for w in ws), (d, ws)

    def test_single_word_forms(self):
        for w in names.MALAY_WORDS:
            assert names.split_malay_words(w) == names.SPLIT_FORMS[w]


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
    # maintenance mode is a source-slot alternative: no pages/sf-dir,
    # no audit required
    m = p.parse_args(["--maintain", "--results", "/tbl", "--expire-keep", "2"])
    assert m.maintain and m.expire_keep == 2
    with pytest.raises(SystemExit):
        p.parse_args(["--maintain", "--sf-dir", "/x", "--results", "/tbl"])
    # tokenizer training mode: rides --sf-dir, no audit required
    t = p.parse_args(["--sf-dir", "/x", "--results", "/tok", "--tokenize", "32"])
    assert t.tokenize == 32 and t.audit is None


class TestMarkdownRecoveryWalk:
    """Pins of the convert_info_markdown composition quirks
    (ppstructure/recovery/recovery_to_markdown.py:100-187)."""

    def test_merge_text_leading_blank_and_full_row(self):
        from paddleocr_spark.functions.recovery import _merge_text_region

        # full first row (470 >= 480-20): successor appended with NO
        # separator; the block still LEADS with \n\n (reference quirk)
        assert _merge_text_region([("AB", 470, 20), ("CD", 300, 20)], 480) == "\n\nABCD"
        # short first row: successor starts its own paragraph
        assert (
            _merge_text_region([("AB", 300, 20), ("CD", 300, 20)], 480)
            == "\n\nAB\n\nCD"
        )

    def test_replace_special_char(self):
        from paddleocr_spark.functions.recovery import _replace_special_char

        assert _replace_special_char("a*b`c~d$e") == "a\\*b\\`c\\~d\\$e"

    def test_figure_bbox_renders_as_python_list_str(self, spark):
        from paddleocr_spark.functions.recovery import doc_markdown_recovery

        rows = {
            r["doc_id"]: r["markdown"]
            for r in doc_markdown_recovery(spark, "/root/testdata/sf0.001").collect()
        }
        # doc with >=4 regions has a figure at i=3 (x0=510, y0=100+doc%37)
        doc = next(d for d in rows if d % 5 >= 1)
        md = rows[doc]
        assert f'<img src="doc{doc}/[510, {100 + doc % 37}, 990, {180 + doc % 37}]_0.jpg">' in md
        # header regions (i%5==4) contribute no block
        assert "header" not in md
        # the \n{3,} collapse ran: no run of 3+ newlines survives
        assert "\n\n\n" not in md


def test_rtl_reverse_matches_reference_per_char_segmentation():
    """The kernel reverses RTL runs in place then reverses the run
    sequence; the reference (pred_reverse) makes every non-LTR char its
    own segment and reverses the whole list. Equivalent — pinned by a
    faithful re-implementation of the reference loop."""
    import re

    from paddleocr_spark.kernels.ctc import reverse_rtl_segments

    def reference(pred):
        pred_re, c_current = [], ""
        for c in pred:
            if not bool(re.search("[a-zA-Z0-9 :*./%+-]", c)):
                if c_current != "":
                    pred_re.append(c_current)
                pred_re.append(c)
                c_current = ""
            else:
                c_current += c
        if c_current != "":
            pred_re.append(c_current)
        return "".join(pred_re[::-1])

    cases = [
        "",
        "ABC123",
        "ABCسلام12",
        "سلامABC",
        "A سلام B نور C",
        "سلامنور",
    ]
    for t in cases:
        assert reverse_rtl_segments(t) == reference(t), t
