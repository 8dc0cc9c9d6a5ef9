"""AllPairs exact similarity join (Bayardo, Ma & Srikant, WWW 2007) —
the PROVABLY COMPLETE alternative to the DF-capped shared-shingle join
(`dedup.ngram_jaccard_pairs`) and to MinHash-LSH candidates: every
pair with Jaccard >= t is found, no cap, no probabilistic misses.

Prefix filtering: order the universe of tokens RARE-FIRST (ascending
document frequency, ties by token string) and sort every document's
token set in that order. A document of n tokens indexes only its
PREFIX of n - ceil(t*n) + 1 tokens. Guarantee: if J(a,b) >= t then
|a ∩ b| >= ceil(t*max(|a|,|b|)), so a and b cannot place all their
shared tokens past both prefixes — at least one shared token lies in
both prefixes, and the prefix-token equi-join surfaces the pair. The
FREQUENT (boilerplate) tokens sort last and never enter a prefix, so
the hot-key explosion the DF cap guards against simply cannot happen —
pruning and skew-safety from the same ordering.

Candidates pass the size filter (t*|a| <= |b| <= |a|/t, exact
rationals) and are then VERIFIED with an exact integer Jaccard over
the full sets: i*(T_DEN+T_NUM) >= (|a|+|b|)*T_NUM — no float reaches
the verdict.

Sets are DISTINCT word-3-gram shingles (true set semantics; the
DF-capped variant counts bags — both are kept, this one is the exact
gate). Threshold ships as the exact rational T_NUM/T_DEN = 1/2.

Scale shape: token ranks are a vocabulary-sized frame (one df groupBy
+ one window over the VOCAB, never the corpus); per-doc sorting is a
collect_list/sort_array over one document's tokens (doc-length
bounded); the index holds only prefixes (a (1-t) fraction of all
tokens); the verify join touches candidates only. At 10^12 docs the
rank table is a broadcast/bucketed dimension — same swap as the PSL
rules.

Oracle: computes ALL qualifying pairs DIRECTLY (full shared-shingle
intersection + exact threshold — no prefix logic at all), so the
cross-engine match IS the completeness proof of the pruned plan, at
corpus scale, on every gate run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paddleocr_spark.functions.dedup import _SHINGLE_CTE, _docs, _shingled

T_NUM, T_DEN = 1, 2  # Jaccard threshold as an exact rational (1/2)


def allpairs_join(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(doc_a, doc_b, inter, na, nb, jacc_micro) for every pair with
    set-Jaccard >= T_NUM/T_DEN (module docstring)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    sh = _shingled(docs).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("df", "shingle")),
        )
        .select("shingle", "rank")
    )
    # per-doc rare-first ordering; prefix = n - ceil(t*n) + 1 tokens
    ordered = (
        sh.join(ranks, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("rank", "shingle"))
            ).alias("toks")
        )
        .join(sizes, "doc_id")
    )
    prefix_len = (
        F.col("n")
        - ((F.col("n") * T_NUM + (T_DEN - 1)) / T_DEN).cast("long")
        + 1
    )
    prefix = ordered.select(
        "doc_id",
        "n",
        F.explode(
            F.slice(F.col("toks.shingle"), F.lit(1), prefix_len)
        ).alias("shingle"),
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: t*na <= nb and t*nb <= na (exact rationals)
            & (F.col("b.n") * T_DEN >= F.col("a.n") * T_NUM)
            & (F.col("a.n") * T_DEN >= F.col("b.n") * T_NUM),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(
            F.col("inter") * (T_DEN + T_NUM)
            >= (F.col("na") + F.col("nb")) * T_NUM
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "na",
            "nb",
            F.expr(
                "inter * 1000000 div (na + nb - inter)"
            ).alias("jacc_micro"),
        )
    )


def allpairs_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='allpairs', k=doc_a:doc_b, v=inter|na|nb|jacc_micro)."""
    return allpairs_join(spark, sf_dir).select(
        F.lit("allpairs").alias("op"),
        F.concat_ws(
            ":",
            F.col("doc_a").cast("string"),
            F.col("doc_b").cast("string"),
        ).alias("k"),
        F.concat_ws("|", "inter", "na", "nb", "jacc_micro").alias("v"),
    )


# Oracle: NO prefix logic — all qualifying pairs computed directly
# from the full distinct-shingle sets. Matching the pruned Spark plan
# against this IS the completeness proof of prefix filtering.
ALLPAIRS_SQL = f"""
WITH {_SHINGLE_CTE.strip().removeprefix("WITH ")},
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
iv AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM ds a JOIN ds b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
q AS (
  SELECT iv.doc_a, iv.doc_b, iv.inter,
         sa.n AS na, sb.n AS nb
  FROM iv
  JOIN sz sa ON iv.doc_a = sa.doc_id
  JOIN sz sb ON iv.doc_b = sb.doc_id
  WHERE iv.inter * {T_DEN + T_NUM} >= (sa.n + sb.n) * {T_NUM})
SELECT 'allpairs' AS op,
       CAST(doc_a AS varchar) || ':' || CAST(doc_b AS varchar) AS k,
       CAST(inter AS varchar) || '|' || CAST(na AS varchar) || '|' ||
       CAST(nb AS varchar) || '|' ||
       CAST(inter * 1000000 // (na + nb - inter) AS varchar) AS v
FROM q
ORDER BY k
"""
