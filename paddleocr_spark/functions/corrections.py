"""The fork's complete ordered OCR-misread correction chains (SURVEY.md
§2.8 / §2.3 "correct_ocr_errors map").

Two chains exist in the reference and BOTH are carried here, because the
serving path composes them (regex chain over every OCR line at
extraction entry, then the shorter replacement chain again per
name/address line):

- `RE_CORRECTIONS` — the full ordered regex substitution list
  (fastapi_app.py:494-573, ~78 rules). ORDER IS SEMANTICS: e.g.
  'LLORONG'->'LORONG' runs before the generic 'ORONG'->'LORONG', whose
  output 'LLORONG' is then re-fixed by the later duplicate rule — the
  chain's accumulated bug-fix history is the spec, including its
  documented quirks (a clean 'JALAN ' is turned into 'JJALAN ' by the
  'ALAN\\s' rule; the replacement chain heals it downstream exactly as
  the reference does).
- `REPLACEMENT_CORRECTIONS` — the plain substring chain
  (fastapi_app.py:200-218, correct_ocr_errors()).

Execution model: the chains are pure per-line string rewrites, so the
Spark side runs them JVM-side as a whole-stage-codegen'd regexp_replace
chain (`corrections_col`), per line via a higher-order transform
(`corrections_col_lines`) to preserve the reference's line granularity
(\\s must not match across line breaks). Python twins
(`apply_line_corrections` / `apply_replacement_corrections`) serve the
Arrow-batched UDF paths. At 10^12 rows this is a narrow map — no
shuffle, no Python in the hot path.

The oracle for `ocr_corrections_chain` is a table of hand-derived golden
outputs (CASES / DICT_CASES below): ground truth data, not a replay of
the implementation, so a chain-order bug flips the gate red.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from paddleocr_spark.sources.scan import scan_parquet

# Full ordered regex chain (fastapi_app.py:494-573). Patterns use the
# common regex subset valid in both Python re and Java (Spark)
# regexp_replace; replacements are stored Python-style (\1) and
# converted to Java-style ($1) for the JVM chain.
RE_CORRECTIONS: list[tuple[str, str]] = [
    (r"L{2,}OT", "LOT"),
    (r"L{2,}ORONG", "LORONG"),
    (r"LLORONG", "LORONG"),
    (r"LLOT", "LOT"),
    (r"JJALAN", "JALAN"),
    (r"ORONG", "LORONG"),
    (r"OT(\d+)", r"LOT \1"),
    (r"(\d+)([A-Z])-", r"\1 \2-"),
    (r"SEKOLAH2", "SEKOLAH 2"),
    (r"SEKOLAH(\d)", r"SEKOLAH \1"),
    (r"FUADOT", "FUAD LOT"),
    (r"FUAD OT", "FUAD LOT"),
    (r"MOHAMED SAD", "MOHAMED SAID"),
    (r"BIN TI", "BINTI"),
    (r"YUSRIBIA", "YUSRI BIN"),
    (r"SHAHALAM", "SHAH ALAM"),
    (r"JALANUSJ", "JALAN USJ"),
    (r"(\d+)([A-Z]+JAYA)", r"\1 \2"),
    (r"MUHAMMADSYAKIR", "MUHAMMAD SYAKIR"),
    (r"(\d{5})([A-Z])", r"\1 \2"),
    (r"AMIRAZIO", "AMIR AZIQ"),
    (r"AMIRAZIQ", "AMIR AZIQ"),
    (r"1oo", "100"),
    (r"SUNGAITUA", "SUNGAI TUA"),
    (r"PUTERAJAYA", "PUTERA JAYA"),
    (r"JALANPJU", "JALAN PJU"),
    (r"DAMANSARADAMAI", "DAMANSARA DAMAI"),
    (r"PETALINGJAYA", "PETALING JAYA"),
    (r"MUHAMMADIZUDDIN", "MUHAMMAD IZUDDIN"),
    (r"BINHASNAN", "BIN HASNAN"),
    (r"JLNMUTIARA", "JLN MUTIARA"),
    (r"JALANDESA", "JALAN DESA"),
    (r"COUNTRYHOMES", "COUNTRY HOMES"),
    (r"BINSUFIAN", "BIN SUFIAN"),
    (r"BINISMIN", "BIN ISMIN"),
    (r"KAMPUNGPERIOK", "KAMPUNG PERIOK"),
    (r"CHABANGEMPAT", "CHABANG EMPAT"),
    (r"JALANSEKOLAH", "JALAN SEKOLAH"),
    (r"63100", "53100"),
    (r"ALAN(\d)", r"JALAN \1"),
    (r"ALAN\s", "JALAN "),
    (r"\bALAN\b", "JALAN"),
    (r"TAMANSETIAWANGSA", "TAMAN SETIAWANGSA"),
    (r"RANTAUPANJANG", "RANTAU PANJANG"),
    (r"JALANSEMARAK", "JALAN SEMARAK"),
    (r"TAMANSEMARAK", "TAMAN SEMARAK"),
    (r"SUNGAIPETANI", "SUNGAI PETANI"),
    (r"NURHAFIZZAH", "NUR HAFIZZAH"),
    (r"PPRSUNGAITIRAMBLOKA", "PPR SUNGAI TIRAM BLOK A"),
    (r"PPRSUNGAITIRAMBLOK([A-Z])", r"PPR SUNGAI TIRAM BLOK \1"),
    (r"SUNGAITIRAM", "SUNGAI TIRAM"),
    (r"RAHIMMIBIN", "RAHIMMI BIN"),
    (r"JALANSUNGAI", "JALAN SUNGAI"),
    (r"ULUTIRAM", "ULU TIRAM"),
    (r"BINABDULBARI", "BIN ABDUL BARI"),
    (r"JALANKUANTAN", "JALAN KUANTAN"),
    (r"\bNO(\d)", r"NO \1"),
    (r"KUALAPILAH", "KUALA PILAH"),
    (r"KAMPUNGSUNGAI", "KAMPUNG SUNGAI"),
    (r"S845O", "88450"),
    (r"ALIMPANDITA", "ALIM PANDITA"),
    (r"KOTAKINABALU", "KOTA KINABALU"),
    (r"LLORONG", "LORONG"),  # duplicate by design: re-fixes rule 6's output
    (r"HAEIZ", "HAFIZ"),
    (r"MUHAMMADHAFIZ", "MUHAMMAD HAFIZ"),
    (r"PADANGPALOH", "PADANG PALOH"),
    (r"KUALATERENGGANU", "KUALA TERENGGANU"),
    (r"TERENGGANUKERAA+N", "TERENGGANU"),
    (r"BINTIHAMIDEE", "BINTI HAMIDEE"),
    (r"TAMANALOR", "TAMAN ALOR"),
    (r"MAJU B(?!\s*[A-Z])", "MAJU 6"),
    (r"BATUPAHAT", "BATU PAHAT"),
    (r"ZULKIFL(?!I)", "ZULKIFLI"),
    (r"SRILOJING", "SRI LOJING"),
    (r"3 B-2-2SRI", "3B-2-2 SRI"),
    (r"63300 KUALA LUMPUR", "53300 KUALA LUMPUR"),
    (r"(\d+)J+JALAN", r"\1 JALAN"),
    (r"\bJ\s+JALAN", "JALAN"),
]

# Plain substring chain (fastapi_app.py:200-218): dict order preserved.
REPLACEMENT_CORRECTIONS: list[tuple[str, str]] = [
    ("MOHAMED SAD", "MOHAMED SAID"),
    ("BIN TI", "BINTI"),
    ("LLORONG", "LORONG"),
    ("LLOT", "LOT"),
    ("JJALAN", "JALAN"),
    ("PELANGAI", "PELANGI"),
    ("INDAE", "INDAH"),
    ("KHAIRULIKHWAN", "KHAIRUL IKHWAN"),
]

_COMPILED = [(re.compile(p), r) for p, r in RE_CORRECTIONS]


def apply_line_corrections(line: str) -> str:
    """Python twin of the JVM chain, for Arrow-batched UDF paths. Applies
    to ONE line (the reference iterates lines)."""
    for pat, rep in _COMPILED:
        line = pat.sub(rep, line)
    return line


def apply_replacement_corrections(text: str) -> str:
    for wrong, right in REPLACEMENT_CORRECTIONS:
        text = text.replace(wrong, right)
    return text


def _java_repl(py_repl: str) -> str:
    return re.sub(r"\\(\d)", r"$\1", py_repl)


def corrections_col(col: Column) -> Column:
    """JVM-side chain for a single-line string column."""
    out = col
    for pat, rep in RE_CORRECTIONS:
        out = F.regexp_replace(out, pat, _java_repl(rep))
    return out


def corrections_col_lines(col: Column) -> Column:
    """JVM-side chain applied PER LINE of a multi-line column (the
    reference's granularity: \\s in a rule must never join lines)."""
    return F.array_join(
        F.transform(F.split(col, "\n"), lambda x: corrections_col(x)), "\n"
    )


def replacement_corrections_col(col: Column) -> Column:
    out = col
    for wrong, right in REPLACEMENT_CORRECTIONS:
        # entries contain no regex metacharacters -> regexp_replace is an
        # exact substring replace here (kept JVM-side / codegen)
        out = F.regexp_replace(out, wrong, right)
    return out


# ---------------------------------------------------------------------------
# Golden cases: one per rule, full-chain outputs derived by hand from the
# ordered semantics (incl. cross-rule interactions). These literals are
# the oracle — pytest pins apply_line_corrections to them, the driver
# gate pins the JVM chain to them via DuckDB.

CASES: list[tuple[str, str]] = [
    ("LLLOT 5", "LOT 5"),
    ("LLORONG TIMUR", "LORONG TIMUR"),
    ("LLORONG BARU", "LORONG BARU"),
    ("LLOT 12", "LOT 12"),
    # the 'ALAN\s' rule re-corrupts any clean 'JALAN ': faithful quirk
    ("JJALAN AMPANG", "JJALAN AMPANG"),
    ("ORONG KIRI", "LORONG KIRI"),
    ("OT123", "LOT 123"),
    ("12A-3", "12 A-3"),
    ("SEKOLAH2", "SEKOLAH 2"),
    ("SEKOLAH5", "SEKOLAH 5"),
    ("FUADOT", "FUAD LOT"),
    ("FUAD OT", "FUAD LOT"),
    ("MOHAMED SAD", "MOHAMED SAID"),
    ("ROSNAH BIN TI ALI", "ROSNAH BINTI ALI"),
    ("YUSRIBIA HAMID", "YUSRI BIN HAMID"),
    ("SHAHALAM", "SHAH ALAM"),
    ("JALANUSJ", "JJALAN USJ"),
    ("12SUBANGJAYA", "12 SUBANGJAYA"),
    ("MUHAMMADSYAKIR", "MUHAMMAD SYAKIR"),
    ("43000KAJANG", "43000 KAJANG"),
    ("AMIRAZIO", "AMIR AZIQ"),
    ("AMIRAZIQ", "AMIR AZIQ"),
    ("NO 1oo", "NO 100"),
    ("SUNGAITUA", "SUNGAI TUA"),
    ("PUTERAJAYA", "PUTERA JAYA"),
    ("JALANPJU", "JJALAN PJU"),
    ("DAMANSARADAMAI", "DAMANSARA DAMAI"),
    ("PETALINGJAYA", "PETALING JAYA"),
    ("MUHAMMADIZUDDIN", "MUHAMMAD IZUDDIN"),
    ("BINHASNAN", "BIN HASNAN"),
    ("JLNMUTIARA", "JLN MUTIARA"),
    ("JALANDESA", "JJALAN DESA"),
    ("COUNTRYHOMES", "COUNTRY HOMES"),
    ("BINSUFIAN", "BIN SUFIAN"),
    ("BINISMIN", "BIN ISMIN"),
    ("KAMPUNGPERIOK", "KAMPUNG PERIOK"),
    ("CHABANGEMPAT", "CHABANG EMPAT"),
    ("JALANSEKOLAH", "JJALAN SEKOLAH"),
    ("63100 SETAPAK", "53100 SETAPAK"),
    ("ALAN5 KIRI", "JJALAN 5 KIRI"),
    ("ALAN TUN", "JALAN TUN"),
    ("ALAN", "JALAN"),
    ("TAMANSETIAWANGSA", "TAMAN SETIAWANGSA"),
    ("RANTAUPANJANG", "RANTAU PANJANG"),
    # post-'ALAN\s' rules emit clean JALAN (order visible in the goldens)
    ("JALANSEMARAK", "JALAN SEMARAK"),
    ("TAMANSEMARAK", "TAMAN SEMARAK"),
    ("SUNGAIPETANI", "SUNGAI PETANI"),
    ("NURHAFIZZAH", "NUR HAFIZZAH"),
    ("PPRSUNGAITIRAMBLOKA", "PPR SUNGAI TIRAM BLOK A"),
    ("PPRSUNGAITIRAMBLOKB", "PPR SUNGAI TIRAM BLOK B"),
    ("SUNGAITIRAM", "SUNGAI TIRAM"),
    ("RAHIMMIBIN OSMAN", "RAHIMMI BIN OSMAN"),
    ("JALANSUNGAI", "JALAN SUNGAI"),
    ("ULUTIRAM", "ULU TIRAM"),
    ("BINABDULBARI", "BIN ABDUL BARI"),
    ("JALANKUANTAN", "JALAN KUANTAN"),
    ("NO7 TINGKAT", "NO 7 TINGKAT"),
    ("KUALAPILAH", "KUALA PILAH"),
    ("KAMPUNGSUNGAI", "KAMPUNG SUNGAI"),
    ("S845O", "88450"),
    ("ALIMPANDITA", "ALIM PANDITA"),
    ("KOTAKINABALU", "KOTA KINABALU"),
    ("LLORONGMAKMUR", "LORONGMAKMUR"),
    ("MOHAMMAD HAEIZ", "MOHAMMAD HAFIZ"),
    ("MUHAMMADHAFIZ", "MUHAMMAD HAFIZ"),
    ("PADANGPALOH", "PADANG PALOH"),
    ("KUALATERENGGANU", "KUALA TERENGGANU"),
    ("TERENGGANUKERAAAN", "TERENGGANU"),
    ("BINTIHAMIDEE", "BINTI HAMIDEE"),
    ("TAMANALOR", "TAMAN ALOR"),
    ("TAMAN MAJU B", "TAMAN MAJU 6"),
    ("BATUPAHAT", "BATU PAHAT"),
    ("AHMAD ZULKIFL", "AHMAD ZULKIFLI"),
    ("SRILOJING", "SRI LOJING"),
    ("3 B-2-2SRI", "3B-2-2 SRI"),
    ("63300 KUALA LUMPUR", "53300 KUALA LUMPUR"),
    ("NO 15JJJALAN 13", "NO 15 JALAN 13"),
    ("NO 15 J JALAN", "NO 15 JALAN"),
]

DICT_CASES: list[tuple[str, str]] = [
    ("MOHAMED SAD", "MOHAMED SAID"),
    ("SITI BIN TI OMAR", "SITI BINTI OMAR"),
    ("LLORONG 5", "LORONG 5"),
    ("LLOT 9", "LOT 9"),
    ("JJALAN MAWAR", "JALAN MAWAR"),
    ("TAMAN PELANGAI", "TAMAN PELANGI"),
    ("DESA INDAE", "DESA INDAH"),
    ("KHAIRULIKHWAN", "KHAIRUL IKHWAN"),
]


def _arr(vals: list[str], spark_side: bool) -> str:
    quoted = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
    return f"array({quoted})" if spark_side else f"[{quoted}]"


def ocr_corrections_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: every rule of both chains fires across the corpus
    (case i = doc_id % len(CASES)); the Spark side runs the REAL JVM
    chains on the injected misreads, the oracle holds the goldens."""
    n, m = len(CASES), len(DICT_CASES)
    inj = _arr([c[0] for c in CASES], True)
    dinj = _arr([c[0] for c in DICT_CASES], True)
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(
            f"element_at({inj}, CAST(doc_id % {n} AS int) + 1)"
        ).alias("line"),
        F.expr(
            f"element_at({dinj}, CAST(doc_id % {m} AS int) + 1)"
        ).alias("dict_line"),
    )
    return docs.select(
        "doc_id",
        "line",
        corrections_col(F.col("line")).alias("corrected"),
        "dict_line",
        replacement_corrections_col(F.col("dict_line")).alias("dict_corrected"),
    )


def _chain_sql() -> str:
    n, m = len(CASES), len(DICT_CASES)
    return f"""
SELECT doc_id,
       {_arr([c[0] for c in CASES], False)}[CAST(doc_id % {n} AS int) + 1] AS line,
       {_arr([c[1] for c in CASES], False)}[CAST(doc_id % {n} AS int) + 1] AS corrected,
       {_arr([c[0] for c in DICT_CASES], False)}[CAST(doc_id % {m} AS int) + 1] AS dict_line,
       {_arr([c[1] for c in DICT_CASES], False)}[CAST(doc_id % {m} AS int) + 1] AS dict_corrected
FROM documents
"""


OCR_CORRECTIONS_CHAIN_SQL = _chain_sql()
