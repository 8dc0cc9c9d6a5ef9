"""Line- and token-level corpus cleaning operators.

Four canonical web-curation transforms the reference's extraction
stack feeds into (the reference extracts text — SURVEY §2.8; a
training-data pipeline must then CLEAN that text before tokenization):

- `c4_lines`: the C4 (Raffel et al. 2020) line-level cleaning rules —
  keep only lines that end in terminal punctuation, have >= 5 words,
  and mention neither "javascript" nor a cookie/policy phrase; drop
  whole pages containing "lorem ipsum" or "{" or yielding fewer than
  3 sentences after line filtering.
- `dehyphenate`: undo hard line-wrap hyphenation ("inter-\\nnational"
  -> "international") without touching lexical hyphens
  ("state-of-the-art") or uppercase continuations ("mid-\\nAtlantic")
  — the standard PDF/column-text reflow repair that runs right after
  OCR/PDF extraction, i.e. directly downstream of this repo's
  `plans/pipeline.py` output.
- `badwords`: the C4/Dolma blocklist document filter — word-boundary
  token matching against a lowercase blocklist (embedded spam/adult
  stand-in set; the production list is a one-line swap), hit count +
  micro-fraction + keep verdict. Substring matching is deliberately
  NOT used ("class" must not hit "ass"-type lists), hence the
  edge-punctuation strip + exact token compare.
- `sentence_split`: rule-based sentence segmentation with an
  abbreviation guard (Dr./Prof./e.g./... never split) — the unit
  every bitext miner, per-sentence dedup, and C4's "at least 3
  sentences" rule consume. Lookaround-free (pii.py discipline): the
  abbreviation dots are sentinel-protected with literal replaces,
  boundaries are marked by a consuming `([.!?]) +([A-Z])` rewrite,
  then the text splits on the marker and the sentinels restore.

Scale shape: every operator here is a pure narrow map — JVM split /
filter / transform / regexp inside whole-stage codegen, zero shuffles,
zero Python — so at 10^12 docs each rides the scan partitioning
untouched. The corpus text is single-line word soup, so each fixture
injects its trigger material via ONE portable SQL expression (CASE /
`%` / `||` / chr only — parses identically in Spark SQL and DuckDB)
evaluated by BOTH engines; every `doc_id % k` branch is exercised
corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


# ---------------------------------------------------------------- C4 lines

# Synthetic page: nav line (no terminal punct), a body sentence, the
# %4-keyed javascript / policy boilerplate lines, a too-short line, a
# second body sentence, a %5-keyed third sentence (the page-keep pivot:
# without it the kept text has only 2 sentences), %7-keyed lorem ipsum
# and %11-keyed curly-brace lines (page-level drops), and a footer.
C4_PAGE_EXPR = (
    "'Home | About | Contact' || chr(10) || "
    "'This deterministic article number ' || CAST(doc_id AS string)"
    " || ' covers corpus topics in detail today.' || chr(10) || "
    "CASE WHEN doc_id % 4 = 1 THEN"
    " 'You must enable javascript support to view the comments.'"
    " || chr(10) ELSE '' END || "
    "CASE WHEN doc_id % 4 = 2 THEN"
    " 'We updated our privacy policy terms for all registered users.'"
    " || chr(10) ELSE '' END || "
    "'Too short line.' || chr(10) || "
    "'The second body sentence of document ' || CAST(doc_id AS string)"
    " || ' also ends with punctuation!' || chr(10) || "
    "CASE WHEN doc_id % 5 = 0 THEN"
    " 'A third complete sentence appears here to satisfy the rule.'"
    " || chr(10) ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN"
    " 'Lorem ipsum dolor sit amet filler text rows.' || chr(10) ELSE '' END || "
    "CASE WHEN doc_id % 11 = 0 THEN"
    " 'function f() { return 1; }' || chr(10) ELSE '' END || "
    "'Copyright 2026 footer'"
)

_POLICY_PHRASES = (
    "privacy policy",
    "terms of use",
    "cookie policy",
    "uses cookies",
)
_MIN_LINE_WORDS = 5
_MIN_SENTENCES = 3


def _keep_line(x: Column) -> Column:
    """C4 line predicate (terminal punct + length + boilerplate words),
    usable inside a higher-order filter() — stays in codegen."""
    low = F.lower(x)
    keep = F.trim(x).rlike('[.!?"]$')
    keep = keep & (F.size(F.split(F.trim(x), r"\s+")) >= _MIN_LINE_WORDS)
    keep = keep & ~low.contains("javascript")
    for phrase in _POLICY_PHRASES:
        keep = keep & ~low.contains(phrase)
    return keep


def c4_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_kept, n_dropped, n_sentences, page_keep, cleaned_md5)
    under the C4 cleaning rules over the injected multi-line pages."""
    page = F.expr(C4_PAGE_EXPR)
    lines = F.split(page, "\n")
    kept = F.filter(lines, _keep_line)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.length(F.regexp_replace(cleaned, "[^.!?]", "")).cast("long")
    page_keep = (
        ~F.lower(page).contains("lorem ipsum")
        & ~page.contains("{")
        & (n_sent >= _MIN_SENTENCES)
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_dropped"),
        n_sent.alias("n_sentences"),
        page_keep.cast("int").alias("page_keep"),
        F.md5(cleaned).alias("cleaned_md5"),
    )


def _sql_keep_line(var: str) -> str:
    conds = [
        f"regexp_matches(trim({var}), '[.!?\"]$')",
        f"len(regexp_split_to_array(trim({var}), '\\s+')) >= {_MIN_LINE_WORDS}",
        f"NOT contains(lower({var}), 'javascript')",
    ]
    conds += [
        f"NOT contains(lower({var}), '{p}')" for p in _POLICY_PHRASES
    ]
    return " AND ".join(conds)


C4_LINES_SQL = f"""
WITH p AS (SELECT doc_id, {C4_PAGE_EXPR} AS page FROM documents),
l AS (
  SELECT doc_id, page,
         string_split(page, chr(10)) AS lines,
         list_filter(string_split(page, chr(10)),
                     x -> {_sql_keep_line('x')}) AS kept
  FROM p),
c AS (
  SELECT doc_id, page, lines, kept,
         array_to_string(kept, chr(10)) AS cleaned,
         CAST(length(regexp_replace(array_to_string(kept, chr(10)),
                                    '[^.!?]', '', 'g')) AS bigint) AS n_sent
  FROM l)
SELECT doc_id,
       CAST(len(kept) AS bigint) AS n_kept,
       CAST(len(lines) - len(kept) AS bigint) AS n_dropped,
       n_sent AS n_sentences,
       CAST(NOT contains(lower(page), 'lorem ipsum')
            AND NOT contains(page, '{{')
            AND n_sent >= {_MIN_SENTENCES} AS int) AS page_keep,
       md5(cleaned) AS cleaned_md5
FROM c
ORDER BY doc_id
"""


def c4_lines_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='c4_lines', k=doc_id, v=kept|dropped|sent|keep|md5) row."""
    return c4_lines(spark, sf_dir).select(
        F.lit("c4_lines").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws(
            "|", "n_kept", "n_dropped", "n_sentences", "page_keep",
            "cleaned_md5",
        ).alias("v"),
    )


# ------------------------------------------------------------ dehyphenate

# %3==0: two wrap-hyphen breaks with lowercase continuations (joined)
# plus a lexical hyphen chain that must survive; %3==1: an uppercase
# continuation (NOT joined — proper-noun hyphens like mid-Atlantic stay);
# %3==2: untouched corpus text.
DEHYPH_INJECT_EXPR = (
    "CASE doc_id % 3 "
    "WHEN 0 THEN 'An intro about inter-' || chr(10)"
    " || 'national work and a state-of-the-art base-' || chr(10)"
    " || 'line follows. ' || text "
    "WHEN 1 THEN 'The mid-' || chr(10)"
    " || 'Atlantic ridge stays hyphen-split. ' || text "
    "ELSE text END"
)

_DEHYPH_RE = "([A-Za-z])-\n([a-z])"


def dehyphenate_col(col: Column) -> Column:
    """Wrapped-text column -> reflowed column (join letter + '-' +
    newline + lowercase letter; everything else untouched)."""
    return F.regexp_replace(col, _DEHYPH_RE, "$1$2")


def dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_joins, repaired_md5) over the injected wrapped text."""
    wrapped = F.expr(DEHYPH_INJECT_EXPR)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all(wrapped, F.lit(_DEHYPH_RE), F.lit(0)))
        .cast("long")
        .alias("n_joins"),
        F.md5(dehyphenate_col(wrapped)).alias("repaired_md5"),
    )


# Closed-form oracle (mojibake discipline): the repair provably inverts
# the injection, so the expected repaired string is constructed
# directly — no regex runs on the DuckDB side.
DEHYPHENATE_SQL = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 2 ELSE 0 END AS bigint) AS n_joins,
       md5(CASE doc_id % 3
           WHEN 0 THEN 'An intro about international work and a'
                       || ' state-of-the-art baseline follows. ' || text
           WHEN 1 THEN 'The mid-' || chr(10)
                       || 'Atlantic ridge stays hyphen-split. ' || text
           ELSE text END) AS repaired_md5
FROM documents
ORDER BY doc_id
"""


def dehyphenate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='dehyphenate', k=doc_id, v=n_joins|md5) suite row."""
    return dehyphenate(spark, sf_dir).select(
        F.lit("dehyphenate").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "n_joins", "repaired_md5").alias("v"),
    )


# --------------------------------------------------------------- badwords

# Embedded spam/adult stand-in blocklist (lowercase); the production
# list (e.g. the LDNOOBW set C4 uses) is a drop-in replacement here.
BADWORDS = ("casino", "viagra", "jackpot", "betting", "porn", "escort")

# %4==1: one appended hit; %4==2: flooded (9 hits incl. edge
# punctuation that the token strip must remove); else clean.
BADWORDS_INJECT_EXPR = (
    "CASE doc_id % 4 "
    "WHEN 1 THEN text || ' visit our casino bonus page now' "
    "WHEN 2 THEN 'Jackpot! betting, casino viagra offers ' || text"
    " || ' escort porn (jackpot) betting casino.' "
    "ELSE text END"
)


def badwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_bad, micro_bad_frac, keep) via exact
    lowercase token matching after edge-punctuation strip."""
    t = F.expr(BADWORDS_INJECT_EXPR)
    toks = F.transform(
        F.split(F.lower(t), r"\s+"),
        lambda y: F.regexp_replace(y, "^[^a-z0-9]+|[^a-z0-9]+$", ""),
    )
    bad = F.filter(toks, lambda y: y.isin(*BADWORDS))
    n_tok = F.size(toks).cast("long")
    n_bad = F.size(bad).cast("long")
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_bad.alias("n_bad"),
        F.round(n_bad * 1000000 / F.greatest(n_tok, F.lit(1)))
        .cast("long")
        .alias("micro_bad_frac"),
        (n_bad == 0).cast("int").alias("keep"),
    )


BADWORDS_SQL = f"""
WITH t AS (SELECT doc_id, {BADWORDS_INJECT_EXPR} AS t FROM documents),
k AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(lower(t), '\\s+'),
            y -> regexp_replace(y, '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g'))
           AS toks
  FROM t)
SELECT doc_id,
       CAST(len(toks) AS bigint) AS n_tokens,
       CAST(len(list_filter(toks,
            y -> list_contains({list(BADWORDS)!r}, y))) AS bigint) AS n_bad,
       CAST(round(len(list_filter(toks,
            y -> list_contains({list(BADWORDS)!r}, y))) * 1000000
            / greatest(len(toks), 1)) AS bigint) AS micro_bad_frac,
       CAST(len(list_filter(toks,
            y -> list_contains({list(BADWORDS)!r}, y))) = 0 AS int) AS keep
FROM k
ORDER BY doc_id
"""


def badwords_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='badwords', k=doc_id, v=tok|bad|frac|keep) suite row."""
    return badwords(spark, sf_dir).select(
        F.lit("badwords").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws(
            "|", "n_tokens", "n_bad", "micro_bad_frac", "keep"
        ).alias("v"),
    )


# ---------------------------------------------------------- sentence split

# Mid-sentence abbreviations whose dot must never split. Deliberately
# excludes sentence-final forms like 'etc.' (a splitter protecting
# those would glue real sentence ends — the standard trade-off).
_ABBREVS = (
    "Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "No.", "Fig.", "e.g.", "i.e.",
)
_DOT = "\x01"    # protected-abbreviation dot sentinel
_MARK = "\x02"   # sentence-boundary marker
_SENT_RE = "([.!?]) +([A-Z])"

# Abbreviation-heavy preamble: 'street. The' / 'long! Did' /
# 'matter? See' split; 'Dr.' 'Prof.' 'No.' 'e.g.' never do. The word
# soup that follows starts lowercase, so the final sentence absorbs it.
SENT_INJECT_EXPR = (
    "'Dr. Adams met Prof. Lee at No. ' || CAST(doc_id % 90 + 10 AS string)"
    " || ' street. The meeting ran long! Did it matter?"
    " See e.g. the notes. ' || text"
)


def split_sentences_col(col: Column) -> Column:
    """text column -> array<string> of trimmed sentences."""
    protected = col
    for ab in _ABBREVS:
        protected = F.replace(
            protected, F.lit(ab), F.lit(ab[:-1] + _DOT)
        )
    marked = F.regexp_replace(protected, _SENT_RE, "$1" + _MARK + "$2")
    return F.transform(
        F.split(marked, _MARK),
        lambda s: F.trim(F.replace(s, F.lit(_DOT), F.lit("."))),
    )


def sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sentences, sentences_md5) — md5 over the 0x1f-joined
    sentence list, so order and content both pin."""
    sents = split_sentences_col(F.expr(SENT_INJECT_EXPR))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.md5(F.array_join(sents, "\x1f")).alias("sentences_md5"),
    )


def _sql_protect(var: str) -> str:
    out = var
    for ab in _ABBREVS:
        out = f"replace({out}, '{ab}', '{ab[:-1]}' || chr(1))"
    return out


SENTENCE_SPLIT_SQL = f"""
WITH t AS (SELECT doc_id, {SENT_INJECT_EXPR} AS t FROM documents),
m AS (
  SELECT doc_id,
         regexp_replace({_sql_protect('t')},
                        '{_SENT_RE}', '\\1' || chr(2) || '\\2', 'g') AS marked
  FROM t),
s AS (
  SELECT doc_id,
         list_transform(string_split(marked, chr(2)),
                        x -> trim(replace(x, chr(1), '.'))) AS sents
  FROM m)
SELECT doc_id,
       CAST(len(sents) AS bigint) AS n_sentences,
       md5(array_to_string(sents, chr(31))) AS sentences_md5
FROM s
ORDER BY doc_id
"""


def sentence_split_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='sentence_split', k=doc_id, v=n|md5) suite row."""
    return sentence_split(spark, sf_dir).select(
        F.lit("sentence_split").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "n_sentences", "sentences_md5").alias("v"),
    )
