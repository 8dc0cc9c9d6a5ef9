"""Count-based n-gram language model + per-document perplexity
(the KenLM role in CCNet, arXiv:1911.00359: score every document
against an LM and use the negative log-likelihood as a quality
signal). `lm_bucket` (functions/text.py) carries CCNet's UNIGRAM
head/middle/tail bucketing; this module carries the actual n-gram LM:
a bigram model with stupid backoff (Brants et al. 2007, "Large
Language Models in Machine Translation" — the backoff used at web
scale precisely because it needs no discount tuning and its counts
are trivially distributable):

    lp(w2 | w1) = ln(c2(w1,w2) / c1(w1))            if c2 > 0
                = ln(0.4) + ln((c1(w2)+1) / (T+V))  otherwise

fit on the corpus itself (the trained-KenLM swap point: a production
run ships the count tables from a reference corpus instead; the
scoring plan is unchanged), with KenLM-style count pruning (bigrams
below MIN_COUNT are dropped from the model) — both the step that makes
web-scale tables fit and the reason the backoff path is live even on a
self-fit corpus. Order is a protocol constant — 2 at fixture scale, a
5-gram swaps in as a longer zip_with chain.

Cross-engine float discipline (langid/dsir precedent): every log-prob
is micro-rounded to bigint ONCE from the same literal over exact
integer counts on both engines; per-document scores are then pure
integer sums — order-free, so unordered aggregation agrees
bit-for-bit.

Plan shape at 10^12 docs:
 1. bigram explode -> groupBy(doc_id, w1, w2) map-side combine (THE
    corpus-sized shuffle);
 2. the model is a bounded re-aggregation of (1): bigram table =
    distinct observed bigrams, unigram table = vocabulary — both
    executor-memory-sized at any corpus scale (web bigram vocabularies
    plateau in the billions; a production fit additionally count-prunes
    like KenLM), joined back BROADCAST;
 3. per-doc sums share the doc_id key — no second corpus-wide
    exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

# corpus text is single-space separated (the dsir.py precedent)
_BIGRAMS_SPARK = (
    "zip_with(slice(split(trim(text), ' '), 1, "
    "greatest(size(split(trim(text), ' ')) - 1, 0)), "
    "slice(split(trim(text), ' '), 2, "
    "greatest(size(split(trim(text), ' ')) - 1, 0)), "
    "(a, b) -> struct(a AS w1, b AS w2))"
)

# micro-rounded log-prob literals — IDENTICAL on both engines
_LP_SEEN = "CAST(round(ln(c2 * 1.0 / c1w1) * 1000000) AS bigint)"
_LP_BACKOFF = (
    "CAST(round(ln(0.4) * 1000000) AS bigint) "
    "+ CAST(round(ln((c1w2 + 1.0) / (t + v)) * 1000000) AS bigint)"
)


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, cnt): per-document bigram profile — one narrow
    explode then ONE map-side-combined groupBy."""
    bg = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", F.explode(F.expr(_BIGRAMS_SPARK)).alias("b")
    )
    return bg.select("doc_id", "b.w1", "b.w2").groupBy(
        "doc_id", "w1", "w2"
    ).agg(F.count(F.lit(1)).alias("cnt"))


MIN_COUNT = 2  # KenLM-style count pruning threshold for kept bigrams


def lm_fit(doc_bg: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bigrams, unigrams) count tables from a (doc_id, w1, w2, cnt)
    frame. unigrams = (w, c1): occurrences AS BIGRAM HEAD over the FULL
    margin (the conditional's denominator — last tokens of documents
    never head a bigram, so seen probabilities stay <= 1 and sum to 1
    per head BEFORE pruning). bigrams keeps only c2 >= MIN_COUNT
    (KenLM-style count pruning — the step that makes web-scale bigram
    tables fit, and the reason the backoff path is LIVE on a self-fit
    corpus: singleton bigrams score through it)."""
    all_bg = doc_bg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    unigrams = all_bg.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c2").alias("c1")
    )
    return all_bg.filter(F.col("c2") >= MIN_COUNT), unigrams


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, nll_micro, avg_micro): per-document negative
    log-likelihood under the corpus-fit bigram model, in integer
    micro-nats, plus its per-bigram mean (integer div). Every document
    appears; empty/one-token docs score 0|0."""
    doc_bg = _doc_bigrams(spark, sf_dir)
    bigrams, unigrams = lm_fit(doc_bg)
    totals = unigrams.agg(
        F.sum("c1").alias("t"), F.count(F.lit(1)).alias("v")
    )
    scored = (
        doc_bg.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(
            F.broadcast(unigrams.selectExpr("w AS w1", "c1 AS c1w1")),
            "w1",
            "left",
        )
        .join(
            F.broadcast(unigrams.selectExpr("w AS w2", "c1 AS c1w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn("c1w2", F.coalesce("c1w2", F.lit(0)))
        .select(
            "doc_id",
            "cnt",
            F.when(
                F.col("c2").isNotNull(), F.expr(_LP_SEEN)
            ).otherwise(F.expr(_LP_BACKOFF)).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("cnt") * F.col("lp"))).cast("long").alias(
                "nll_micro"
            ),
        )
    )
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    return (
        docs.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias(
                "nll_micro"
            ),
        )
        .withColumn(
            "avg_micro",
            F.expr("nll_micro div greatest(n_bigrams, 1)"),
        )
    )


def lm_ppl_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='lm_ppl', k=doc_id, v=n_bigrams|nll_micro|avg_micro)."""
    return lm_perplexity(spark, sf_dir).select(
        F.lit("lm_ppl").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "n_bigrams", "nll_micro", "avg_micro").alias("v"),
    )


_BIGRAMS_SQL = (
    "list_zip(t[1:greatest(len(t) - 1, 0)], "
    "t[2:len(t)])"
)

LM_PPL_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
pairs AS (
  SELECT doc_id, UNNEST({_BIGRAMS_SQL}) AS p FROM toks),
doc_bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2, count(*) AS cnt
  FROM pairs WHERE p[2] IS NOT NULL GROUP BY 1, 2, 3),
all_bg AS (SELECT w1, w2, sum(cnt) AS c2 FROM doc_bg GROUP BY 1, 2),
unigrams AS (SELECT w1 AS w, sum(c2) AS c1 FROM all_bg GROUP BY 1),
bigrams AS (SELECT * FROM all_bg WHERE c2 >= 2),
tot AS (SELECT sum(c1) AS t, count(*) AS v FROM unigrams),
scored AS (
  SELECT d.doc_id,
         CAST(sum(d.cnt) AS bigint) AS n_bigrams,
         CAST(-sum(d.cnt * CASE WHEN d.c2 IS NOT NULL THEN {_LP_SEEN}
              ELSE {_LP_BACKOFF} END) AS bigint) AS nll_micro
  FROM (SELECT doc_bg.*, b2.c2, coalesce(u2.c1, 0) AS c1w2,
               u1.c1 AS c1w1
        FROM doc_bg
        LEFT JOIN bigrams b2 USING (w1, w2)
        LEFT JOIN unigrams u1 ON u1.w = doc_bg.w1
        LEFT JOIN unigrams u2 ON u2.w = doc_bg.w2) d
  CROSS JOIN tot
  GROUP BY d.doc_id)
SELECT doc.doc_id AS doc_id,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       coalesce(s.nll_micro, 0) AS nll_micro,
       coalesce(s.nll_micro, 0) // greatest(coalesce(s.n_bigrams, 0), 1)
         AS avg_micro
FROM documents doc LEFT JOIN scored s USING (doc_id)
ORDER BY doc_id
"""
