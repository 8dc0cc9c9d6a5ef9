"""Golden-transcript replays for the IC extractors: the fork's own test
cards (reference test_taman_seroja.py / test_ic_20260129.py,
malaysia_ic_extractor_ultimate.py __main__) re-run as table rows, plus
pinned faithful quirks."""

from paddleocr_spark.functions.ic_ultimate import (
    extract_fields_dispatch,
    ultimate_extract,
)
from paddleocr_spark.functions.names import extract_name_legacy


TAMAN_SEROJA = [
    "SELANGOR",
    "43900 SEPANG",
    "NO 53 JALAN SEROJA35",
    "BIN NOR TARMIZE",
    "NORMUHAMADILYAS",
    "890708-08-6143",
    "BANDARBARU SALAK TINGGI",
    "TAMAN SEROJA",
    "",
    "ISLAM",
    "WARGANEGARA",
    "LELAKI",
    "086143",
]


class TestLegacyGoldens:
    def test_taman_seroja_upside_down_name(self):
        """The fork's rotated-card case: the person's single-word name
        sits directly above the IC, the father's BIN line above that —
        the before-IC strategy must assemble them in person-first order
        and split_malay_words must expand NORMUHAMADILYAS."""
        got = extract_name_legacy(TAMAN_SEROJA, "890708-08-6143")
        assert got == "NOR MUHAMAD ILYAS BIN NOR TARMIZE"

    def test_area_line_never_becomes_name(self):
        # TAMAN SEROJA (area) must not be extracted even though it sits
        # right after the IC region
        lines = ["890708-08-6143", "TAMAN", "KHALID", "BIN SALIM"]
        assert extract_name_legacy(lines, "890708-08-6143") == "KHALID BIN SALIM"


class TestAddressGoldens:
    def test_taman_seroja_full_serving_fields(self):
        """Full legacy serving sequence (regex chain -> name -> address)
        on the fork's rotated-card transcript: unit/street line first,
        areas in collection order, postcode, state."""
        from paddleocr_spark.functions.address import extract_serving_fields

        r = extract_serving_fields(TAMAN_SEROJA)
        assert r["ic_number"] == "890708-08-6143"
        assert r["name"] == "NOR MUHAMAD ILYAS BIN NOR TARMIZE"
        assert r["address"] == (
            "NO 53 JALAN SEROJA 35, BANDAR BARU SALAK TINGGI, "
            "TAMAN SEROJA, 43900 SEPANG, SELANGOR"
        )

    def test_street_area_presplit(self):
        from paddleocr_spark.functions.address import extract_address

        got = extract_address(["JLN 4/27 E SEKSYEN 10", "52100 KEPONG"])
        assert got == "JLN 4/27 E, SEKSYEN 10, 52100 KEPONG"

    def test_back_of_card_stops_then_postcode_restarts(self):
        from paddleocr_spark.functions.address import extract_address

        got = extract_address(
            ["LOT 9 TAMAN MELUR", "PENDAFTARAN", "SPECIMEN ROW",
             "40450 SHAH ALAM"]
        )
        assert got == "LOT 9 TAMAN MELUR, 40450 SHAH ALAM"

    def test_federal_territory_formatting_and_dedup(self):
        from paddleocr_spark.functions.address import extract_address

        got = extract_address(
            ["A-5-7 MAWAR", "A-5-7 MAWAR", "W.PERSEKUTUAN(KL)",
             "53300 KUALA LUMPUR"]
        )
        assert got == "A-5-7 MAWAR, W. PERSEKUTUAN (KL), 53300 KUALA LUMPUR"

    def test_short_digit_fragment_joins_from_index_four(self):
        from paddleocr_spark.functions.address import collect_address_lines

        # a short pure-digit line is only collected from index 4 on
        lines = ["123", "KAD PENGENALAN", "X1", "Y2", "456", "LOT 3"]
        got = collect_address_lines(lines)
        assert "456" in got and "123" not in got


class TestUltimateGoldens:
    def test_ultimate_reference_example(self):
        """malaysia_ic_extractor_ultimate.py __main__ card, replayed with
        the code's ACTUAL semantics (its own banner admits 'Partial
        match (test data incomplete)'): 'SERI BINTANG' contains BIN, so
        the unit line anchors the name walk; SELANGOR stops the backward
        scan; the IC/low-alpha lines land in the address; YENU6 is
        map-corrected to MUHAMMAD there."""
        lines = [
            "SELANGOR",
            "M1-G-1 SERI BINTANG APT",
            "BIN ABD RAHMAN",
            "960325-10-5977",
            "YENU6",
            "NG BESTARI",
            "AHALAM",
            "0",
            "J",
            "MyKad",
            "ISLAM",
            "WARGANEGARA",
            "LELAKI",
        ]
        r = ultimate_extract(lines)
        assert r["ic_number"] == "960325-10-5977"
        assert r["gender"] == "Male"  # last digit 7
        assert r["religion"] == "ISLAM"
        assert r["name"] == "M1-G-1 SERI BINTANG APT BIN ABD RAHMAN"
        assert r["address"] == "960325-10-5977, MUHAMMAD, 0"

    def test_seribintang_contains_bin_quirk(self):
        """'SERIBINTANG' contains the substring BIN, so the reference
        anchors the whole name walk on it — faithful quirk."""
        lines = ["123456-12-3455", "AHMAD", "SERIBINTANG",
                 "40000 SHAH ALAM", "HINDU", "PERAK"]
        r = ultimate_extract(lines)
        assert r["name"] == "AHMAD SERIBINTANG"
        assert r["address"] == "40000 SHAH ALAM"

    def test_no_ic_card_collects_no_backward_name_parts(self):
        """When no IC number was found, the reference's backward scan
        breaks on its FIRST line ('' in line is always True), so header
        lines above BIN never become name parts — bare `ic_number in
        line` membership, no truthiness guard (faithful quirk)."""
        lines = ["KAD PENGENALAN", "AHMAD FARID", "BIN OSMAN",
                 "NO 12 JALAN SATU"]
        r = ultimate_extract(lines)
        assert r["name"] == "BIN OSMAN NO 12 JALAN SATU"

    def test_chinese_lines_filtered(self):
        lines = ["123456-12-3455", "KHALID", "身分証明書", "USMAN",
                 "NO 3 JALAN MAWAR", "ISLAM"]
        r = ultimate_extract(lines)
        assert r["name"] == "KHALID USMAN"

    def test_line_correction_map(self):
        lines = ["123456-12-3455", "MUHAMMAH", "40000 SHAH ALAM", "ISLAM"]
        r = ultimate_extract(lines)
        assert r["name"] == "MUHAMMAD"

    def test_no_bin_state_append_can_duplicate(self):
        """In the no-BIN case the second pass appends the first
        state-bearing line even when pass one already collected it —
        the reference's duplicate-state quirk, pinned."""
        lines = ["123456-12-3455", "KHALID", "NO 1 JALAN X",
                 "53000 KUALA LUMPUR", "ISLAM", "LELAKI"]
        r = ultimate_extract(lines)
        assert r["address"] == "NO 1 JALAN X, 53000 KUALA LUMPUR, 53000 KUALA LUMPUR"


class TestDispatch:
    def test_dispatch_prefers_ultimate(self):
        r = extract_fields_dispatch(
            ["123456-12-3455", "KHALID", "BIN SALIM", "40000 SHAH ALAM", "ISLAM"]
        )
        assert r["name"] == "KHALID BIN SALIM"
        assert r["gender"] == "Male"
        assert r["religion"] == "ISLAM"

    def test_dispatch_falls_back_to_legacy(self, monkeypatch):
        import paddleocr_spark.functions.ic_ultimate as iu

        def boom(lines):
            raise RuntimeError("model crashed")

        monkeypatch.setattr(iu, "ultimate_extract", boom)
        r = iu.extract_fields_dispatch(
            ["880101-14-5523", "KHALID", "BIN SALIM", "JALAN X", "LELAKI"]
        )
        assert r["name"] == "KHALID BIN SALIM"
        assert r["gender"] == "Male"
