"""PII detection + redaction over the documents corpus.

The standard pre-training scrub (emails / phone numbers / IPv4
addresses -> typed placeholder tokens, per C4 / Dolma / BigScience
practice). The reference repo EXTRACTS personal fields (IC numbers,
names — SURVEY §2.8); a training-data pipeline must also be able to
run the inverse operation, so this is the redaction counterpart of
`functions/fields.py`.

The corpus text is PII-free word soup, so the fixture injects
deterministic PII via ``PII_INJECT_EXPR`` — ONE portable SQL expression
(only CASE / `%` / `||` / CAST, identical parse in Spark SQL and
DuckDB) evaluated by BOTH engines, so the Spark job and the oracle
start from byte-identical inputs without materializing a second table.

Pattern discipline: the three regexes use no lookaround and no
backreferences, so they behave identically under Java regex (Spark
executors) and RE2 (the DuckDB twin). Counting happens BEFORE
redaction; replacement order is email -> phone -> IP (an email may
embed digit runs; nothing embeds an email).

Spark shape: narrow per-row expressions only — regexp_extract_all +
chained regexp_replace inside whole-stage codegen; zero shuffles, zero
Python. At 10^12 docs this is a pure map stage that rides whatever
partitioning the scan provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from paddleocr_spark.sources.scan import scan_parquet

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{9,13}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# doc_id % 5: 0 email appended, 1 phone, 2 IP, 3 email+IP prepended,
# 4 untouched. Parses identically in Spark SQL and DuckDB.
PII_INJECT_EXPR = (
    "CASE doc_id % 5 "
    "WHEN 0 THEN text || ' contact user' || CAST(doc_id AS string)"
    " || '@mail.example.com for details' "
    "WHEN 1 THEN text || ' call +60123'"
    " || CAST(4000000 + doc_id % 1000000 AS string) || ' now' "
    "WHEN 2 THEN text || ' origin 10.' || CAST(doc_id % 256 AS string)"
    " || '.0.' || CAST(1 + doc_id % 254 AS string) || ' logged' "
    "WHEN 3 THEN 'mail a.b-c' || CAST(doc_id AS string)"
    " || '@sub.example.org or ping 192.168.1.'"
    " || CAST(1 + doc_id % 254 AS string) || ' ' || text "
    "ELSE text END"
)


def redact_pii(col):
    """text column -> redacted text (email -> phone -> IP order)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IP_RE, "<IP>")


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, redacted) over the
    PII-injected corpus."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pii = docs.select("doc_id", F.expr(PII_INJECT_EXPR).alias("t"))

    def _n(pattern: str):
        return F.size(
            F.regexp_extract_all("t", F.lit(pattern), F.lit(0))
        ).cast("long")

    return pii.select(
        "doc_id",
        _n(EMAIL_RE).alias("n_emails"),
        _n(PHONE_RE).alias("n_phones"),
        _n(IP_RE).alias("n_ips"),
        redact_pii(F.col("t")).alias("redacted"),
    )


# DuckDB twin. Built by concatenation (NOT an f-string: the regexes
# carry {m,n} quantifier braces). DuckDB string literals keep
# backslashes verbatim, and regexp_replace needs the explicit 'g' flag.
PII_REDACT_SQL = (
    "WITH pii AS (SELECT doc_id, "
    + PII_INJECT_EXPR
    + " AS t FROM documents)\n"
    "SELECT doc_id,\n"
    "  CAST(len(regexp_extract_all(t, '" + EMAIL_RE + "', 0)) AS bigint) AS n_emails,\n"
    "  CAST(len(regexp_extract_all(t, '" + PHONE_RE + "', 0)) AS bigint) AS n_phones,\n"
    "  CAST(len(regexp_extract_all(t, '" + IP_RE + "', 0)) AS bigint) AS n_ips,\n"
    "  regexp_replace(regexp_replace(regexp_replace(t,\n"
    "    '" + EMAIL_RE + "', '<EMAIL>', 'g'),\n"
    "    '" + PHONE_RE + "', '<PHONE>', 'g'),\n"
    "    '" + IP_RE + "', '<IP>', 'g') AS redacted\n"
    "FROM pii\n"
    "ORDER BY doc_id\n"
)


def pii_redact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='pii_redact', k=doc_id, v=counts|redacted) suite row."""
    return pii_redact(spark, sf_dir).select(
        F.lit("pii_redact").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws(
            "|", "n_emails", "n_phones", "n_ips", "redacted"
        ).alias("v"),
    )
