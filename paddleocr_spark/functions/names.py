"""Name extraction + Malay word splitting — the fork's two largest text
heuristics (SURVEY.md §2.8), as Arrow-batched UDF kernels with
ground-truth DuckDB oracles.

Name extraction (canonical simplification of fastapi_app.py:603-778,
the positional strategy the serving path uses):
- locate the IC-number line (`\\d{6}-\\d{2}-\\d{4}`),
- the name is the first line after it that is >= 70% alphabetic,
  not a stop-list keyword line (place/area/building words, gender or
  religion keywords), with OCR artifacts stripped and broken
  'B IN'/'B INTI' marker spacing repaired.

split_malay_words (fastapi_app.py:220-281): greedy longest-first
dictionary splitting of concatenated uppercase runs, with protected
words that must never be split (the reference protects MAHKOTA/SETAPAK
because shorter dictionary entries are substrings of them).

Both run on transcripts synthesized deterministically from `documents`
(doc_id arithmetic), so the DuckDB oracle recomputes the expected
output as ground truth rather than replaying the heuristic — a
mismatch means the extraction logic broke, not the fixture.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IC_LINE_RE = re.compile(r"\d{6}-\d{2}-\d{4}")

# Stop-list: lines containing these never become names
# (fastapi_app.py place/keyword stop lists, simplified).
NAME_STOPWORDS = {
    "MYKAD", "KAD", "PENGENALAN", "LELAKI", "PEREMPUAN", "ISLAM",
    "KRISTIAN", "BUDDHA", "HINDU", "SIKH", "JALAN", "LORONG", "TAMAN",
    "KAMPUNG", "WARGANEGARA",
}

_ARTIFACT_RE = re.compile(r"[^A-Z ]")


def _alpha_ratio(line: str) -> float:
    if not line:
        return 0.0
    alpha = sum(c.isalpha() or c == " " for c in line)
    return alpha / len(line)


def extract_name(transcript: str) -> str:
    """First >=70%-alpha non-stopword line after the IC line, artifact-
    stripped, BIN/BINTI respaced. Empty string when nothing qualifies."""
    lines = transcript.split("\n")
    ic_idx = -1
    for i, line in enumerate(lines):
        if IC_LINE_RE.search(line):
            ic_idx = i
            break
    for line in lines[ic_idx + 1 :]:
        if _alpha_ratio(line) < 0.7:
            continue
        tokens = set(line.upper().split())
        if tokens & NAME_STOPWORDS:
            continue
        name = _ARTIFACT_RE.sub("", line.upper())
        # repair marker spacing misreads: 'B INTI' first (substring order
        # matters, like the ordered correction chain)
        name = name.replace("B INTI ", "BINTI ").replace("B IN ", "BIN ")
        return " ".join(name.split())
    return ""


# -- synthetic corpus + query -------------------------------------------------

# translate() drops digits identically in Spark and DuckDB, keeping the
# synthesized names purely alphabetic (the artifact strip removes digits,
# so ground truth must never contain any).
_GIVEN = "concat('AHMAD', translate(upper(source), '0123456789', ''))"
_FAMILY = "concat('PUTRA', translate(upper(lang), '0123456789', ''))"


def _name_line_sql() -> str:
    """Rendered name line per doc: BIN with a broken 'B IN' misread for
    doc_id%3=0, BINTI for %3=1, plain two-word name for %3=2."""
    return (
        f"CASE doc_id % 3"
        f" WHEN 0 THEN concat({_GIVEN}, ' B IN ', {_FAMILY})"
        f" WHEN 1 THEN concat({_GIVEN}, ' BINTI ', {_FAMILY})"
        f" ELSE concat({_GIVEN}, ' ', {_FAMILY}) END"
    )


def _expected_name_sql() -> str:
    return (
        f"CASE doc_id % 3"
        f" WHEN 0 THEN concat({_GIVEN}, ' BIN ', {_FAMILY})"
        f" WHEN 1 THEN concat({_GIVEN}, ' BINTI ', {_FAMILY})"
        f" ELSE concat({_GIVEN}, ' ', {_FAMILY}) END"
    )


def _transcript_sql() -> str:
    ic = (
        "concat(lpad(CAST(doc_id % 900000 + 100000 AS string), 6, '0'), '-',"
        " lpad(CAST(doc_id % 100 AS string), 2, '0'), '-',"
        " lpad(CAST((doc_id * 31) % 10000 AS string), 4, '0'))"
    )
    return (
        "concat_ws(chr(10), 'KAD PENGENALAN MYKAD', "
        f"{ic}, "
        "'WARGANEGARA', "        # stopword line the scan must skip
        f"{_name_line_sql()}, "
        "concat('JALAN ', upper(source)), "
        "'LELAKI')"
    )


def ic_name_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(_transcript_sql()).alias("raw_ocr_text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "name": [extract_name(t) for t in pdf["raw_ocr_text"]],
                }
            )

    return docs.mapInPandas(run, schema="doc_id long, name string")


IC_NAME_EXTRACT_SQL = (
    f"SELECT doc_id, {_expected_name_sql()} AS name FROM documents"
)


# -- split_malay_words --------------------------------------------------------

# Full dictionaries (fastapi_app.py:220-281): split priority is NOT
# positional — the names pass runs first, sorted longest-first, then the
# words pass in LIST order. Both orders are semantics (e.g. HAFIZZAH
# must marker before its substring HAFIZ; CYBERJAYA before JAYA).
MALAY_WORDS = [
    "KAMPUNG", "TAMAN", "JALAN", "LORONG", "PERUMAHAN", "BANDAR",
    "KOTA", "BUKIT", "PETALING", "SHAH", "DAMANSARA", "SETIAWANGSA",
    "PUTRAJAYA", "CYBERJAYA", "AMPANG", "CHERAS", "SENTOSA", "KEPONG",
    "MELAYU", "SUBANG", "SEKSYEN", "FELDA", "DESA", "ALAM", "IDAMAN",
    "LEMBAH", "PERMAI", "INDAH", "NEGERI", "SEMBILAN", "BINTI", "BIN",
    "PADANG", "PALOH", "KUALA", "BATU", "PAHAT", "LOJING", "SALAK",
    "TINGGI", "BARU", "WANGSA", "MAJU", "JAYA", "ALOR", "SETAR",
]

MALAY_NAMES = [
    "MUHAMMAD", "ABDUL", "ABDULLAH", "AHMAD", "MOHD", "MOHAMED",
    "MOHAMMAD", "MUHAMAD", "FIRDAUS", "FARID", "FARIS", "FAIZ",
    "FAIZAL", "FAZL", "HAFIZ", "HAFIZZAH", "HAFIZUL", "HAJAR", "HAKIM",
    "HALIM", "HAMID", "HAMZAH", "HANIF", "HARIS", "HARITH", "HARUN",
    "HASAN", "HASSAN", "HIDAYAT", "HUSAIN", "HUSSAIN", "IBRAHIM",
    "IDRIS", "ILYAS", "IMRAN", "ISMAIL", "IZZAT", "JAFAR", "JAMIL",
    "KAMAL", "KARIM", "KHALID", "KHAMIS", "KHAIRUL", "AIMAN", "MAHDI",
    "MAHIR", "MAHMUD", "MAJID", "MALIK", "MANSOR", "MARZUQI", "MASHUD",
    "MASRI", "MUSTAFA", "NAIM", "NASIR", "NASRUL", "NAZMI", "NOOR",
    "NOR", "NUR", "NURUL", "RAHIM", "RAHMAN", "RAIS", "RAJA", "RAMLI",
    "RASHID", "RAZAK", "RAZALI", "RIDWAN", "ROSLAN", "ROSLEE", "ROSLI",
    "ROZMAN", "SAAD", "SABRI", "SAIFUL", "SALAHUDDIN", "SALIM",
    "SALLEH", "SAMAD", "SAMSUDDIN", "SANUSI", "SHAFIQ", "SHAHRUL",
    "SHAHRIL", "SHAMSUL", "SHARIF", "SHUKRI", "SIDDIQ", "SULAIMAN",
    "SYAFIQ", "SYAHIR", "SYAMSUL", "SYED", "TAHIR", "TAJUDDIN",
    "TALIB", "TAMRIN", "TARMIZI", "TAUFIK", "THAIB", "UMAR", "USMAN",
    "WAHID", "WAKI", "YAHYA", "YUSOF", "YUSOFF", "YUSUF", "ZAHARI",
    "ZAINAL", "ZAINUDDIN", "ZAKARIA", "ZAKI", "ZAMRI", "ZULKIFLI",
    "ZULKEFLI", "HAMIDEE", "NIK", "AMIN", "MAT", "ZIN",
]

# Words that must never be split even though dictionary entries are
# substrings of them (KOTA in MAHKOTA, TAPAK-adjacent SETAPAK).
PROTECTED_WORDS = [("MAHKOTA", "ZZZ001ZZZ"), ("SETAPAK", "ZZZ002ZZZ")]


def split_malay_words(s: str) -> str:
    """Reference marker-counter splitter (fastapi_app.py:220-281):
    protect -> names pass (longest-first, substring replace anywhere) ->
    words pass (list order) -> expand markers with surrounding spaces ->
    restore protected -> collapse whitespace.

    Priority is by dictionary rank, NOT left-to-right position: in
    'ANIKAMAL' the 5-letter name KAMAL markers first even though NIK
    starts earlier, giving 'ANI KAMAL' (a greedy positional scan would
    wrongly yield 'A NIK AMAL' — pinned in tests)."""
    for word, placeholder in PROTECTED_WORDS:
        s = s.replace(word, placeholder)
    counter = 1000
    expansions: list[tuple[str, str]] = []
    for name in sorted(MALAY_NAMES, key=len, reverse=True):
        if name in s:
            marker = f"__NAME_{counter}__"
            expansions.append((marker, name))
            s = s.replace(name, marker)
            counter += 1
    for word in MALAY_WORDS:
        if word in s:
            marker = f"__WORD_{counter}__"
            expansions.append((marker, word))
            s = s.replace(word, marker)
            counter += 1
    for marker, original in expansions:
        s = s.replace(marker, f" {original} ")
    for word, placeholder in PROTECTED_WORDS:
        s = s.replace(placeholder, word)
    return re.sub(r"\s+", " ", s).strip()


# Expected split form of each dictionary word under the algorithm — the
# names pass outranks the words pass, so PUTRAJAYA (containing the name
# RAJA) legitimately splits; everything else is stable. Used by the
# oracle, validated exhaustively in tests.
SPLIT_FORMS = {w: ("PUT RAJA YA" if w == "PUTRAJAYA" else w) for w in MALAY_WORDS}

_WORD_PICKS = ((7, 0), (11, 3), (13, 5))


def _word_terms_spark() -> list[str]:
    """element_at is 1-based in Spark (bracket indexing is 0-based, so it
    is avoided — DuckDB's brackets are 1-based and would silently skew)."""
    n = len(MALAY_WORDS)
    arr = "array(" + ", ".join(f"'{w}'" for w in MALAY_WORDS) + ")"
    return [
        f"element_at({arr}, CAST((doc_id * {m} + {o}) % {n} AS int) + 1)"
        for m, o in _WORD_PICKS
    ]


def _word_terms_duck() -> list[str]:
    n = len(MALAY_WORDS)
    lst = "[" + ", ".join(f"'{w}'" for w in MALAY_WORDS) + "]"
    return [
        f"{lst}[CAST((doc_id * {m} + {o}) % {n} AS int) + 1]"
        for m, o in _WORD_PICKS
    ]


def malay_word_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    concat_expr = "concat(" + ", ".join(_word_terms_spark()) + ")"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(concat_expr).alias("joined")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "joined": pdf["joined"],
                    "split": [split_malay_words(s) for s in pdf["joined"]],
                }
            )

    return docs.mapInPandas(run, schema="doc_id long, joined string, split string")


def _expected_split_sql() -> str:
    """Ground truth: the three chosen words joined with spaces, each in
    its SPLIT_FORMS shape. Valid for every reachable (doc_id mod 46)
    pick triple — no cross-boundary dictionary match exists among them,
    which tests/test_names_recovery.py verifies exhaustively."""
    parts = _word_terms_duck()
    n = len(MALAY_WORDS)
    forms = "[" + ", ".join(f"'{SPLIT_FORMS[w]}'" for w in MALAY_WORDS) + "]"
    spaced_parts = [
        f"{forms}[CAST((doc_id * {m} + {o}) % {n} AS int) + 1]"
        for m, o in _WORD_PICKS
    ]
    joined = "concat(" + ", ".join(parts) + ")"
    spaced = "concat_ws(' ', " + ", ".join(spaced_parts) + ")"
    return (
        f"SELECT doc_id, {joined} AS joined, {spaced} AS split FROM documents"
    )


MALAY_WORD_SPLIT_SQL = _expected_split_sql()
