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

1. lang      — declared language outside KEEP_LANGS
2. gopher    — Gopher rule bitmask != 0 (text.gopher_signal_cols —
               the SAME Column expressions as the standalone op)
3. quality   — hashed linear classifier score <= 0
               (text.QUALITY_SUM_SPARK_EXPR / QUALITY_SUM_SQL_EXPR)
4. exact_dup — md5-normalized content also held by a smaller-id
               survivor (dedup.content_fingerprint normalization)
5. near_dup  — same SimHash as a smaller-id exact-dedup survivor
               (dedup.SIMHASH_BITS-bit fingerprint, keep-lowest-id)

Scale shape:
- stages 1-3 are one whole-stage-codegen projection (zero shuffles);
  failed docs short-circuit out before any wide operator sees them.
- SimHash is computed explode->groupBy(doc_id) (1 shuffle of token
  rows) — the proven shape from dedup.simhash_fingerprints; the
  document-level fingerprint rides through the agg via first().
- exact dedup is a window over fp: fp cardinality ~n, so window
  partitions are duplicate-group-sized (tiny) — no hot task.
- near dedup deliberately does NOT window over the SimHash value: the
  16-bit fixture key space (2^16; production 64-bit) would put up to
  n/2^16 rows in ONE window task at corpus scale. Instead the per-sh
  minimum survivor is a groupBy(sh) of aggregated state (map-side
  combine, only K<=2^16 rows shuffle) broadcast-joined back — no
  full-row shuffle on the skewed key at all.

Reference behavior composed: Gopher rules (Rae et al. 2021 §A1.1),
CCNet's classifier gate (Wenzek et al. 2020), RefinedWeb's filter-then-
dedup ordering (Penedo et al. 2023), exact-then-fuzzy dedup with
keep-lowest-id (Lee et al. 2022).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from paddleocr_spark.functions import text as _text
from paddleocr_spark.functions.dedup import (
    _HEX_HIGH,
    SIMHASH_BITS,
    SIMHASH_FINGERPRINTS_SQL,
    content_fingerprint,
)

KEEP_LANGS = ("en",)


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stage, keep): stage = first failing funnel stage
    ('lang' | 'gopher' | 'quality' | 'exact_dup' | 'near_dup') or
    'kept'; keep = 1 iff the document reaches the training set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = _text.gopher_signal_cols()
    row_stage = (
        F.when(~F.col("lang").isin(*KEEP_LANGS), "lang")
        .when(sig["fail_bits"] != 0, "gopher")
        .when(F.expr(_text.QUALITY_SUM_SPARK_EXPR) <= 0, "quality")
    )
    base = docs.select(
        "doc_id",
        "text",
        row_stage.alias("row_stage"),
        content_fingerprint(F.col("text")).alias("fp"),
    )
    failed = base.filter(F.col("row_stage").isNotNull()).select(
        "doc_id", F.col("row_stage").alias("stage")
    )
    surv = base.filter(F.col("row_stage").isNull())

    # SimHash over survivors only (explode -> one groupBy; the content
    # fingerprint rides along via first() — constant within the group).
    toks = surv.select(
        "doc_id",
        "fp",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).select("doc_id", "fp", F.md5("tok").alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.substring("h", b + 1, 1).isin(*_HEX_HIGH), 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(F.first("fp").alias("fp"), *bit_aggs)
    bits = [
        F.when(F.col(f"s{b}") > 0, "1").otherwise("0")
        for b in range(SIMHASH_BITS)
    ]
    shdf = agg.select("doc_id", "fp", F.concat(*bits).alias("sh"))

    # stage 4: smallest-id survivor per content fingerprint (window is
    # safe here — fp groups are duplicate-cluster-sized).
    s1 = shdf.withColumn(
        "exact_ok",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    # stage 5: smallest exact-surviving id per SimHash — aggregated
    # state only (<= 2^SIMHASH_BITS rows), broadcast back.
    sh_mins = s1.groupBy("sh").agg(
        F.min(F.when(F.col("exact_ok"), F.col("doc_id"))).alias("sh_min")
    )
    staged = s1.join(F.broadcast(sh_mins), "sh").select(
        "doc_id",
        F.when(~F.col("exact_ok"), "exact_dup")
        .when(F.col("doc_id") != F.col("sh_min"), "near_dup")
        .otherwise("kept")
        .alias("stage"),
    )
    return (
        failed.unionByName(staged)
        .select(
            "doc_id",
            "stage",
            (F.col("stage") == "kept").cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


CORPUS_PIPELINE_SQL = f"""
WITH sig AS (
  SELECT doc_id, lang, text,
{_text.GOPHER_SIG_SQL_COLS.rstrip()},
         {_text.QUALITY_SUM_SQL_EXPR} AS sum_w,
         md5(trim(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))) AS fp
  FROM documents),
s0 AS (
  SELECT doc_id, fp,
         CASE WHEN lang NOT IN ({", ".join(repr(x) for x in KEEP_LANGS)}) THEN 'lang'
              WHEN ({_text.GOPHER_BITS_SQL_EXPR.rstrip()}
              ) <> 0 THEN 'gopher'
              WHEN sum_w <= 0 THEN 'quality' END AS row_stage
  FROM sig),
simh AS ({SIMHASH_FINGERPRINTS_SQL}),
w1 AS (
  SELECT s0.doc_id, s0.row_stage, simh.simhash,
         min(CASE WHEN s0.row_stage IS NULL THEN s0.doc_id END)
           OVER (PARTITION BY s0.fp) AS fp_min
  FROM s0 JOIN simh USING (doc_id)),
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
