"""Composed corpus-curation funnel over `documents` — the end-to-end
keep/drop pipeline a CCNet/Gopher/RefinedWeb-style training-data build
runs, with FIRST-FAILING-STAGE attribution per document. The individual
stages exist as standalone board ops (gopher_filter, quality_classifier,
dedup_exact, simhash_fingerprints); this op is their production
composition: each stage only adjudicates documents that survived every
earlier stage, so the per-stage drop counts are the real funnel a
pipeline report shows, not independent verdicts.

Stage order (cheapest narrow filters first, shuffling dedup last — the
funnel shape that matters at 10^12 docs: every zero-shuffle filter
shrinks the corpus BEFORE any shuffle happens):

1. lang      — declared language NULL or outside KEEP_LANGS
2. gopher    — Gopher rule bitmask != 0 (text.gopher_signal_cols —
               the SAME Column expressions as the standalone op)
3. quality   — hashed linear classifier score <= 0
               (text.QUALITY_SUM_SPARK_EXPR / QUALITY_SUM_SQL_EXPR)
4. exact_dup — md5-normalized content also held by a smaller-id
               survivor (dedup.content_fingerprint normalization)
5. near_dup  — same SimHash as a smaller-id exact-dedup survivor
               (dedup.simhash_bit_aggs fingerprint, keep-lowest-id)

Scale shape — ONE subtree, no self-union, the corpus is scanned and the
per-row signals (incl. the per-token md5 classifier) evaluated exactly
once:
- stages 1-3 fold into one whole-stage-codegen projection producing
  `row_stage`; documents it drops do NOT get tokenized — they ride the
  rest of the plan as a single sentinel row each (explode of a 1-null
  array), so the token shuffle carries them at ~zero weight.
- SimHash is explode->groupBy(doc_id) (1 shuffle of survivor token
  rows) — the proven shape from dedup.simhash_fingerprints, via the
  shared simhash_bit_aggs/simhash_concat_bits builders.
- exact dedup is a window over fp: fp cardinality ~n, so window
  partitions are duplicate-group-sized (tiny) — no hot task. The min
  is guarded by `row_stage IS NULL`, so dropped docs sharing a
  fingerprint never shadow a surviving duplicate.
- near dedup deliberately does NOT window over the SimHash value: the
  16-bit fixture key space (2^16; production 64-bit) would put up to
  n/2^16 rows in ONE window task at corpus scale. Instead the per-sh
  minimum survivor is a groupBy(sh) of aggregated state (map-side
  combine, only K<=2^16 rows shuffle) broadcast-joined back — no
  full-row shuffle on the skewed key at all. Dropped docs all share
  the all-zero sentinel fingerprint; they are never exact_ok, so they
  cannot shadow a genuine all-zero-SimHash survivor group.
- NULL text coalesces to '' (fails `gopher` on word count); NULL lang
  fails `lang` — a real crawl table has both.

Reference behavior composed: Gopher rules (Rae et al. 2021 §A1.1),
CCNet's classifier gate (Wenzek et al. 2020), RefinedWeb's filter-then-
dedup ordering (Penedo et al. 2023), exact-then-fuzzy dedup with
keep-lowest-id (Lee et al. 2022).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from paddleocr_spark.sources.scan import scan_parquet

from paddleocr_spark.functions import text as _text
from paddleocr_spark.functions.dedup import (
    CONTENT_FP_SQL,
    SIMHASH_FINGERPRINTS_SQL,
    content_fingerprint,
    simhash_bit_aggs,
    simhash_concat_bits,
)

KEEP_LANGS = ("en",)


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stage, keep): stage = first failing funnel stage
    ('lang' | 'gopher' | 'quality' | 'exact_dup' | 'near_dup') or
    'kept'; keep = 1 iff the document reaches the training set."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    return corpus_verdicts(docs).orderBy("doc_id")


def corpus_verdicts(
    docs: DataFrame,
    quality_sum_expr: str | None = None,
    quality_tau: int = 0,
) -> DataFrame:
    """The funnel core over any (doc_id, text, lang) frame — the
    composable form `plans/curate.py` chains into the end-to-end
    curation job (extra columns are ignored; the verdict frame is slim
    on purpose so a production run can persist it as the lineage table
    and join text back by doc_id exactly once)."""
    docs = docs.withColumn("text", F.coalesce("text", F.lit("")))
    sig = _text.gopher_signal_cols()
    row_stage = (
        F.when(
            F.col("lang").isNull() | ~F.col("lang").isin(*KEEP_LANGS), "lang"
        )
        .when(sig["fail_bits"] != 0, "gopher")
        .when(
            F.expr(quality_sum_expr or _text.QUALITY_SUM_SPARK_EXPR)
            <= quality_tau,
            "quality",
        )
    )
    base = docs.select(
        "doc_id",
        "text",
        row_stage.alias("row_stage"),
        content_fingerprint(F.col("text")).alias("fp"),
    )
    # dropped docs become ONE sentinel token row (null md5 -> all-zero
    # SimHash); survivors explode into their real token rows.
    toks = base.select(
        "doc_id",
        "row_stage",
        "fp",
        F.explode(
            F.when(
                F.col("row_stage").isNull(),
                F.split(F.trim(F.col("text")), r"\s+"),
            ).otherwise(F.array(F.lit(None).cast("string")))
        ).alias("tok"),
    ).select("doc_id", "row_stage", "fp", F.md5("tok").alias("h"))
    agg = toks.groupBy("doc_id").agg(
        F.first("row_stage").alias("row_stage"),
        F.first("fp").alias("fp"),
        *simhash_bit_aggs(),
    )
    shdf = agg.select(
        "doc_id", "row_stage", "fp", simhash_concat_bits().alias("sh")
    )

    # stage 4: smallest-id survivor per content fingerprint (window is
    # safe here — fp groups are duplicate-cluster-sized).
    s1 = shdf.withColumn(
        "exact_ok",
        F.col("row_stage").isNull()
        & (
            F.col("doc_id")
            == F.min(
                F.when(F.col("row_stage").isNull(), F.col("doc_id"))
            ).over(Window.partitionBy("fp"))
        ),
    )
    # The returned plan references s1 twice (broadcast build side +
    # probe side) and per-column pruning defeats ReuseExchange, so the
    # token shuffle + fp window would run twice — localCheckpoint per
    # the repo discipline (at production scale s1 is the natural
    # lineage table to persist anyway: per-doc verdict inputs).
    s1 = s1.localCheckpoint()
    # stage 5: smallest exact-surviving id per SimHash — aggregated
    # state only (<= 2^SIMHASH_BITS rows), broadcast back.
    sh_mins = s1.groupBy("sh").agg(
        F.min(F.when(F.col("exact_ok"), F.col("doc_id"))).alias("sh_min")
    )
    return (
        s1.join(F.broadcast(sh_mins), "sh")
        .select(
            "doc_id",
            F.coalesce(
                "row_stage",
                F.when(~F.col("exact_ok"), "exact_dup")
                .when(F.col("doc_id") != F.col("sh_min"), "near_dup")
                .otherwise("kept"),
            ).alias("stage"),
        )
        .select(
            "doc_id",
            "stage",
            (F.col("stage") == "kept").cast("int").alias("keep"),
        )
    )


CORPUS_PIPELINE_SQL = f"""
WITH sig AS (
  SELECT doc_id, lang, coalesce(text, '') AS text
  FROM documents),
sig2 AS (
  SELECT doc_id, lang, text,
{_text.GOPHER_SIG_SQL_COLS.rstrip()},
         {_text.QUALITY_SUM_SQL_EXPR} AS sum_w,
         {CONTENT_FP_SQL} AS fp
  FROM sig),
s0 AS (
  SELECT doc_id, fp,
         CASE WHEN lang IS NULL
                OR lang NOT IN ({", ".join(repr(x) for x in KEEP_LANGS)})
                THEN 'lang'
              WHEN ({_text.GOPHER_BITS_SQL_EXPR.rstrip()}
              ) <> 0 THEN 'gopher'
              WHEN sum_w <= 0 THEN 'quality' END AS row_stage
  FROM sig2),
simh AS ({SIMHASH_FINGERPRINTS_SQL}),
w1 AS (
  SELECT s0.doc_id, s0.row_stage, simh.simhash,
         min(CASE WHEN s0.row_stage IS NULL THEN s0.doc_id END)
           OVER (PARTITION BY s0.fp) AS fp_min
  FROM s0 LEFT JOIN simh USING (doc_id)),
w2 AS (
  SELECT *, (row_stage IS NULL AND doc_id = fp_min) AS exact_ok FROM w1),
w3 AS (
  SELECT *, min(CASE WHEN exact_ok THEN doc_id END)
              OVER (PARTITION BY simhash) AS sh_min
  FROM w2)
SELECT doc_id,
       CASE WHEN row_stage IS NOT NULL THEN row_stage
            WHEN NOT exact_ok THEN 'exact_dup'
            WHEN doc_id <> sh_min THEN 'near_dup'
            ELSE 'kept' END AS stage,
       CASE WHEN row_stage IS NULL AND exact_ok AND doc_id = sh_min
            THEN 1 ELSE 0 END AS keep
FROM w3
ORDER BY doc_id
"""
