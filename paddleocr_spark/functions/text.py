"""Text-analysis operators over the `documents` table — the pieces a
training-data pipeline needs (token counting, quality scoring, language
signal, fingerprinting). All JVM-side built-ins (no Python UDFs): these
run inside whole-stage codegen and push column pruning into the scan.

Every builder keeps a strict SQL twin (oracle) using only functions with
identical semantics in Spark and DuckDB: regexp_replace (the DuckDB twin
passes 'g'), md5, length, upper/lower, split on a regex, round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- token counting ----------------------------------------------------------

def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (alnum runs + punct marks)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        (
            F.length(F.regexp_replace("text", r"[A-Za-z0-9]+", "x"))
        ).alias("bpe_proxy_tokens"),
        F.length("text").alias("char_len"),
    )


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       length(regexp_replace(text, '[A-Za-z0-9]+', 'x', 'g')) AS bpe_proxy_tokens,
       length(text) AS char_len
FROM documents
"""


# -- quality scoring ---------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality signals
    (C4/Gopher-style rules, simplified)."""
    df = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    )
    punct = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
    return df.select(
        "doc_id",
        F.round(punct / F.greatest(F.length("text"), F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(F.size(toks), F.lit(1)), 6).alias("stop_ratio"),
        (F.length("text") >= 200).cast("int").alias("len_ok"),
    )


QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> list_contains({list(_STOPWORDS)!r}, t)))
             / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)
           AS stop_ratio,
       CAST(length(text) >= 200 AS int) AS len_ok
FROM documents
""".replace("'", "'")


# -- language signal ---------------------------------------------------------

def lang_marker_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/marker-based language signal aggregated per declared lang:
    how often each corpus language's docs contain common-English markers
    ('the', 'and') vs CJK codepoints (the has_chinese test of the
    reference fork, fastapi_app.py:283-288 -> rlike range class)."""
    df = _docs(spark, sf_dir)
    return (
        df.select(
            "lang",
            F.col("text").rlike(r"\bthe\b").cast("int").alias("has_en_marker"),
            F.col("text").rlike("[一-鿿]").cast("int").alias("has_cjk"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_en_marker").alias("en_marker_docs"),
            F.sum("has_cjk").alias("cjk_docs"),
        )
    )


LANG_MARKER_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '\\bthe\\b') THEN 1 ELSE 0 END) AS bigint) AS en_marker_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1 ELSE 0 END) AS bigint) AS cjk_docs
FROM documents GROUP BY lang ORDER BY lang
"""


# -- fingerprinting ----------------------------------------------------------

def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercase alnum-collapsed
    text) — the exact-dedup key at scale."""
    norm = F.lower(F.regexp_replace("text", r"[^A-Za-z0-9]+", " "))
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.trim(norm)).alias("fingerprint")
    )


DOC_FINGERPRINTS_SQL = """
SELECT doc_id,
       md5(trim(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))) AS fingerprint
FROM documents
"""
