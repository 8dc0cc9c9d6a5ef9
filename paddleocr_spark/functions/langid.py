"""Character-n-gram language identification (TextCat / fastText-langid
shape) over the `documents` table.

Web-pipeline role: the `lang` column of a Common-Crawl-style table is
itself the OUTPUT of a classifier (CLD2/fastText in CCNet, Dolma,
FineWeb); every downstream mix/filter decision keys on it. This module
carries that classifier as a first-class distributed operator: a
character-trigram multinomial Naive Bayes fit on the corpus's own
labels (the deterministic stand-in for fastText's pretrained lid.176 —
a trained model swaps in as a different profile table) and applied back
to every document.

    pred(d) = argmax_L sum_tri cnt_d(tri) * ln p(tri | L)

with add-one smoothing over the corpus trigram vocabulary; unseen
(lang, tri) pairs fall back to the lang's smoothed floor ln(1/(total_L
+ V)).

Cross-engine float discipline (the dsir.py/bm25 precedent): per-profile
log-probs are micro-rounded to bigint ONCE from the same literal
expression over exact integer counts on both engines; per-document
scores are then pure integer dot products — order-free, so the
unordered aggregations agree bit-for-bit. The argmax is the exact
two-step (max score, then min lang among ties) on both engines.

Plan shape at 10^12 docs:
 1. trigram explode -> groupBy(doc_id, lang, tri) with map-side combine
    (the per-doc profile — THE corpus-sized shuffle);
 2. the model (lang x tri log-prob table) is a vocabulary-bounded
    re-aggregation of (1), joined back BROADCAST;
 3. the n_langs expansion is a crossJoin against a BROADCAST n_langs-row
    frame (bounded multiplier), and the argmax groupBys all share the
    doc_id key — no second corpus-wide exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

# trigram list of `text` — ONE portable snippet per engine pair, the
# length-filter form (branch-free; Spark's sequence(1, 0) would count
# DOWN, so the floor is 1 and short substrings are filtered out)
_TRIS_SPARK = (
    "filter(transform(sequence(1, greatest(length(text) - 2, 1)), "
    "i -> substr(text, i, 3)), t -> length(t) = 3)"
)
_TRIS_SQL = (
    "list_filter(list_transform(generate_series(1, "
    "greatest(length(text) - 2, 1)), i -> substr(text, i, 3)), "
    "t -> length(t) = 3)"
)

# smoothed log-probs, micro-rounded — identical literals both engines
_LP_MICRO = "CAST(round(ln((c + 1.0) / (tl + v)) * 1000000) AS bigint)"
_LP0_MICRO = "CAST(round(ln(1.0 / (tl + v)) * 1000000) AS bigint)"


def _doc_tris(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, actual, tri, cnt): per-document trigram profile.

    The scan is spread before the explode — the fixture parquet is one
    split, and without the repartition the whole corpus-sized trigram
    explode (the single most expensive narrow op here) runs in ONE
    task before the groupBy's shuffle ever parallelizes it; the spread
    moves only (doc_id, lang, text) rows. The result is
    localCheckpoint'ed because BOTH the model subtree (profile/floors)
    and the scoring join consume it — without the checkpoint the
    explode+combine executes once per consumer (measured 4 subtree
    copies through the final argmax join)."""
    tris = (
        scan_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("lang").alias("actual"), "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id", "actual", F.explode(F.expr(_TRIS_SPARK)).alias("tri")
        )
    )
    return tris.groupBy("doc_id", "actual", "tri").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()


def langid_model(doc_tri: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(profile, floors) from a (doc_id, actual, tri, cnt) frame:
    profile = (lang, tri, lp_micro) — vocabulary-bounded; floors =
    (lang, lp0_micro) — one row per language."""
    prof = doc_tri.groupBy(
        F.col("actual").alias("lang"), "tri"
    ).agg(F.sum("cnt").alias("c"))
    tl = prof.groupBy("lang").agg(F.sum("c").alias("tl"))
    v = prof.agg(F.countDistinct("tri").alias("v"))
    profile = (
        prof.join(F.broadcast(tl), "lang")
        .crossJoin(F.broadcast(v))
        .select("lang", "tri", F.expr(_LP_MICRO).alias("lp_micro"))
    )
    floors = tl.crossJoin(F.broadcast(v)).select(
        "lang", F.expr(_LP0_MICRO).alias("lp0_micro")
    )
    return profile, floors


def langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pred, correct, best_micro): Naive Bayes language
    prediction per document, its agreement with the labeled `lang`, and
    the winning integer score."""
    doc_tri = _doc_tris(spark, sf_dir)
    profile, floors = langid_model(doc_tri)
    scores = (
        doc_tri.crossJoin(F.broadcast(floors))
        .join(F.broadcast(profile), ["lang", "tri"], "left")
        .groupBy("doc_id", "actual", "lang")
        .agg(
            F.sum(
                F.col("cnt")
                * F.coalesce(F.col("lp_micro"), F.col("lp0_micro"))
            ).cast("long").alias("score")
        )
    )
    best = scores.groupBy("doc_id").agg(F.max("score").alias("best_micro"))
    return (
        scores.join(best, "doc_id")
        .where(F.col("score") == F.col("best_micro"))
        .groupBy("doc_id", "actual", "best_micro")
        .agg(F.min("lang").alias("pred"))
        .select(
            "doc_id",
            "pred",
            (F.col("pred") == F.col("actual")).cast("int").alias("correct"),
            "best_micro",
        )
    )


def langid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='langid', k=doc_id, v=pred|correct|best_micro) suite row."""
    return langid_predict(spark, sf_dir).select(
        F.lit("langid").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "pred", "correct", "best_micro").alias("v"),
    )


LANGID_SQL = f"""
WITH tris AS (
  SELECT doc_id, lang AS actual, UNNEST({_TRIS_SQL}) AS tri
  FROM documents),
doc_tri AS (
  SELECT doc_id, actual, tri, count(*) AS cnt FROM tris GROUP BY 1, 2, 3),
prof AS (
  SELECT actual AS lang, tri, sum(cnt) AS c FROM doc_tri GROUP BY 1, 2),
tlt AS (SELECT lang, sum(c) AS tl FROM prof GROUP BY lang),
vt AS (SELECT count(DISTINCT tri) AS v FROM prof),
profile AS (
  SELECT lang, tri, {_LP_MICRO} AS lp_micro
  FROM prof JOIN tlt USING (lang) CROSS JOIN vt),
floors AS (
  SELECT lang, {_LP0_MICRO} AS lp0_micro FROM tlt CROSS JOIN vt),
scores AS (
  SELECT dt.doc_id, dt.actual, fl.lang,
         CAST(sum(dt.cnt * coalesce(p.lp_micro, fl.lp0_micro)) AS bigint)
           AS score
  FROM doc_tri dt CROSS JOIN floors fl
  LEFT JOIN profile p ON p.lang = fl.lang AND p.tri = dt.tri
  GROUP BY 1, 2, 3),
best AS (SELECT doc_id, max(score) AS best_micro FROM scores GROUP BY doc_id)
SELECT s.doc_id AS doc_id, min(s.lang) AS pred,
       CAST(min(s.lang) = s.actual AS int) AS correct,
       b.best_micro
FROM scores s
JOIN best b ON s.doc_id = b.doc_id AND s.score = b.best_micro
GROUP BY s.doc_id, s.actual, b.best_micro
ORDER BY 1
"""
