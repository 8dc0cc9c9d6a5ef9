"""Mojibake repair (functions/mojibake.py) — kernel-level tests; the
strict gate (text_stats_suite row 'mojibake') proves Spark == DuckDB.
"""

from paddleocr_spark.functions.mojibake import (
    CLEAN_PREFIX,
    GARBLED_PREFIX,
    fix_encoding,
)


def test_single_level_repair():
    garbled = "cafÃ© au lait"
    assert fix_encoding(garbled) == ("café au lait", 1)


def test_double_encoding_repairs_in_two_rounds():
    # accented letters only: the em-dash's double-garbled bytes hit
    # cp1252's undefined 0x9D, so '—' survives exactly ONE level
    t = "naïve café"
    double = (
        t.encode("utf-8").decode("cp1252")
        .encode("utf-8").decode("cp1252")
    )
    assert fix_encoding(double) == (t, 2)


def test_clean_text_untouched():
    for t in ("plain ascii", "café — über", "", "emoji \U0001f600"):
        fixed, rounds = fix_encoding(t)
        assert (fixed, rounds) == (t, 0), t


def test_prefix_roundtrip_is_exact():
    """The fixture invariant the closed-form oracle relies on."""
    assert GARBLED_PREFIX.encode("cp1252").decode("utf-8") == CLEAN_PREFIX
    assert fix_encoding(GARBLED_PREFIX + "body text") == (
        CLEAN_PREFIX + "body text",
        1,
    )


def test_non_cp1252_text_is_noop():
    t = "中文 text with CJK"
    assert fix_encoding(t) == (t, 0)
