"""Classifier-evaluation gate rows: exact-integer ROC AUC and the
confusion matrix of the hashed quality classifier against the Gopher
keep/drop verdict (functions/text.py provides both signals; this
module composes them — late-imported by the suite like every other
branch module)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paddleocr_spark.functions.text import (
    GOPHER_BITS_SQL_EXPR,
    GOPHER_SIG_SQL_COLS,
    QUALITY_SUM_SPARK_EXPR,
    QUALITY_SUM_SQL_EXPR,
    _docs,
    gopher_signal_cols,
)

def clf_eval_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='clf_eval') — evaluation of the hashed quality classifier
    against the Gopher keep/drop verdict as the label source (the
    standard bootstrap: rule-based labels grade the learned scorer,
    RefinedWeb/Dolma style). Two rows:

    - k='auc': exact-integer ROC AUC via the Mann-Whitney pair count.
      Never ranks the corpus: ONE groupBy(sum_w) collapses documents
      to the distinct-score frame (bounded by score cardinality),
      an ordered prefix sum over THAT frame counts concordant pairs —
      num = sum_s pos(s) * (2*cum_neg_below(s) + neg(s)), and
      AUC = num / (2*P*N) ships as floor-micro units. Ties handled
      exactly (the +neg(s) term is the tie half-credit, x2 scale).
    - k='confusion': tp|fp|tn|fn of label (= sign of pooled score)
      against keep.

    Both signals derive from `text`, so the whole evaluation is ONE
    corpus scan + one bounded groupBy + one window over the
    distinct-score frame (never the corpus — the lm_bucket discipline).
    """
    sig = gopher_signal_cols()
    base = _docs(spark, sf_dir).select(
        (sig["fail_bits"] == 0).cast("long").alias("keep"),
        F.expr(QUALITY_SUM_SPARK_EXPR).alias("sum_w"),
    )
    return mann_whitney_rows(base, "clf_eval")


def mann_whitney_rows(base: DataFrame, op: str) -> DataFrame:
    """The exact-integer AUC + confusion machinery over a (keep, sum_w)
    frame, shared by clf_eval (fixed hashed weights) and clf_train (the
    learned weights) so the two gates can't drift. Emits the
    (op, 'auc', p|n|num|micro) and (op, 'confusion', tp|fp|tn|fn) rows
    documented on `clf_eval_rows`."""
    per_s = base.groupBy("sum_w").agg(
        F.sum("keep").alias("pos"),
        F.sum(F.lit(1) - F.col("keep")).alias("neg"),
    )
    w = (
        Window.orderBy("sum_w")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    num = per_s.withColumn(
        "cum_neg", F.coalesce(F.sum("neg").over(w), F.lit(0))
    ).agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_neg") + F.col("neg"))
        ).alias("num"),
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
    )
    auc_row = num.select(
        F.lit(op).alias("op"),
        F.lit("auc").alias("k"),
        F.concat_ws(
            "|",
            "p",
            "n",
            "num",
            F.expr("num * 1000000 div greatest(2 * p * n, 1)"),
        ).alias("v"),
    )
    conf_row = base.agg(
        F.sum(((F.col("sum_w") > 0) & (F.col("keep") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("sum_w") > 0) & (F.col("keep") == 0)).cast("long")).alias("fp"),
        F.sum(((F.col("sum_w") <= 0) & (F.col("keep") == 0)).cast("long")).alias("tn"),
        F.sum(((F.col("sum_w") <= 0) & (F.col("keep") == 1)).cast("long")).alias("fn"),
    ).select(
        F.lit(op).alias("op"),
        F.lit("confusion").alias("k"),
        F.concat_ws("|", "tp", "fp", "tn", "fn").alias("v"),
    )
    return auc_row.unionByName(conf_row)


# Mann-Whitney tail shared with the clf_train twin (same no-drift
# argument as `mann_whitney_rows`): the caller supplies the CTE chain
# up to a frame {base}(keep, sum_w) and formats op/base in.
MW_TAIL_SQL = """
s AS (
  SELECT sum_w, sum(keep) AS pos, sum(1 - keep) AS neg
  FROM {base} GROUP BY sum_w),
c AS (
  SELECT *, coalesce(sum(neg) OVER (ORDER BY sum_w
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_neg
  FROM s),
agg AS (
  SELECT sum(pos * (2 * cum_neg + neg)) AS num,
         sum(pos) AS p, sum(neg) AS n
  FROM c)
SELECT '{op}' AS op, 'auc' AS k,
       CAST(p AS varchar) || '|' || CAST(n AS varchar) || '|' ||
       CAST(num AS varchar) || '|' ||
       CAST(num * 1000000 // greatest(2 * p * n, 1) AS varchar) AS v
FROM agg
UNION ALL
SELECT '{op}', 'confusion',
       CAST(sum(CASE WHEN sum_w > 0 AND keep = 1 THEN 1 ELSE 0 END) AS varchar)
       || '|' ||
       CAST(sum(CASE WHEN sum_w > 0 AND keep = 0 THEN 1 ELSE 0 END) AS varchar)
       || '|' ||
       CAST(sum(CASE WHEN sum_w <= 0 AND keep = 0 THEN 1 ELSE 0 END) AS varchar)
       || '|' ||
       CAST(sum(CASE WHEN sum_w <= 0 AND keep = 1 THEN 1 ELSE 0 END) AS varchar)
FROM {base}
"""

CLF_EVAL_SQL = f"""
WITH b AS (
  SELECT CAST(({GOPHER_BITS_SQL_EXPR.rstrip()}) = 0 AS bigint) AS keep,
         {QUALITY_SUM_SQL_EXPR} AS sum_w
  FROM (SELECT doc_id, text,
{GOPHER_SIG_SQL_COLS.rstrip()}
        FROM documents)),
""" + MW_TAIL_SQL.format(op="clf_eval", base="b")
