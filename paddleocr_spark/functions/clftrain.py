"""Distributed quality-classifier TRAINING (op='clf_train'): the
learned-weight path that `clf_eval` documents as its swap point.

The reference ecosystem's quality filter is a fastText-style linear
model (Joulin et al. 2016) trained on rule-derived labels — CCNet
trains against Wikipedia, RefinedWeb/Dolma bootstrap from heuristic
keep/drop verdicts. `functions/text.py` ships the INFERENCE half
(hashed token weights -> sum pooling -> sign); this module ships the
TRAINING half as a Spark-first full-batch perceptron over hashed
bucket features, with the Gopher verdict as the label source (the
same bootstrap clf_eval grades):

- **Features**: token -> md5 bucket in [0, CLF_DIM) (the hashing
  trick; the same md5-arithmetic snippet family as
  `_HASH_WEIGHT_BODY`), per-doc feature vector = bucket counts plus
  an implicit bias feature. Buckets are computed JVM-side by one
  `transform(split(text))` — zero Python, zero shuffle.
- **Label**: y = +1 if Gopher fail_bits == 0 else -1
  (`gopher_signal_cols` — the SAME Column expressions as the
  standalone gopher_filter op, so labels can't drift).
- **Training loop** (CLF_EPOCHS full-batch perceptron epochs, the
  classic Rosenblatt update batched): margin_i = y_i * (w . x_i + b);
  every doc with margin <= 0 contributes y_i * x_i to the weight
  gradient and y_i to the bias gradient. Updates are INTEGER SUMS, so
  the result is bit-identical across partitionings and engines — the
  float-SGD reproducibility hole (update order) never arises because
  full-batch + integers makes every epoch order-free.
- **Averaged-perceptron scorer** (Freund & Schapire 1999): full-batch
  steps are huge (every misclassified doc at once), so the raw
  per-epoch iterate OSCILLATES — measured on this corpus the
  after-epoch AUC swings 0.95 / 0.87 / 0.06 / 0.95 ... as the
  direction overshoots each round. The deployed model is therefore
  the SUM of the after-epoch weight snapshots (integer, and for
  ranking/sign purposes identical to the average up to the positive
  1/E scale), which is stable at 0.95-0.96 AUC on this corpus
  regardless of where the epoch cap lands.
- **Scale shape** (the kmeans/pca driver contract): per epoch, ONE
  narrow corpus scan scores docs against the weight vector rendered
  as an array literal (zero shuffle — the kmeans centroid-literal
  discipline), then ONE explode + groupBy(bucket) gradient
  aggregation whose key space is CLF_DIM+2 (map-side partial agg:
  the shuffle carries <= CLF_DIM+2 longs per partition, never the
  corpus). Driver state is CLF_DIM+1 ints per epoch. Epoch 1 is
  closed-form (w0 = 0 -> every margin is 0 -> every doc updates), so
  its scoring scan is skipped entirely.
- **Gate surface**: the AVERAGED weight vector (one row per bucket),
  bias, the per-epoch misclassification trace, the TRAINED model's
  exact-integer ROC AUC + confusion via the shared
  `mann_whitney_rows` machinery — the lift over clf_eval's untrained
  ~0.4 micro-AUC is the observable the operator exists for — and the
  calibrated decision threshold (`calibrate_rows`).

The DuckDB twin replays the identical epochs as statically-unrolled
CTE chains (the pagination pointer-doubling convention) and reuses
`MW_TAIL_SQL`, so every integer — weights, bias, trace, AUC — must
match bit-for-bit.

Reference behavior being re-expressed: the fork's serving stack ships
pre-trained weights and only ever scores
(malaysia_ic_serving/fastapi_app.py model-load-then-predict); the
training loop itself is the standard public fastText/perceptron
recipe, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# NO module-level imports from text/clfeval: text.py imports THIS
# module late (for the suite SQL), so a module-level dependency back on
# text would leave whichever module is imported first partially
# initialized (the classic two-way late-import cycle). Everything from
# text/clfeval is imported lazily inside the functions, and
# CLF_TRAIN_SQL is served through PEP 562 __getattr__ — by the time
# anyone reads it, text's early symbols exist.

CLF_DIM = 64      # hashed feature buckets (weights live on the driver)
CLF_EPOCHS = 3    # full-batch perceptron epochs, statically unrolled

# token -> bucket: first two md5 hex digits, folded mod CLF_DIM — one
# shared snippet string evaluated by BOTH engines (the
# _HASH_WEIGHT_BODY discipline; `t` is the lambda/CTE token variable).
BUCKET_BODY = (
    "((instr('0123456789abcdef', substr(md5(t),1,1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5(t),2,1)) - 1) % "
    + str(CLF_DIM)
)


def _base_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, bs): label and per-token bucket list, computed once
    and localCheckpoint'ed — every epoch and the final AUC scan reuse
    it (at 10^12 docs the swap is persist-to-storage or recompute per
    epoch; either keeps the per-epoch work one narrow scan)."""
    from paddleocr_spark.functions.text import _docs, gopher_signal_cols

    sig = gopher_signal_cols()
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.when(sig["fail_bits"] == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("y"),
            F.expr(
                f"transform(split(trim(text), ' '), t -> {BUCKET_BODY})"
            ).alias("bs"),
        )
        .localCheckpoint()
    )


def _score_expr(weights: list[int], bias: int):
    """w . x + b as one JVM aggregate fold over the bucket list — the
    weight vector rides the plan as an array literal (kmeans
    centroid-literal discipline), so scoring is zero-shuffle."""
    arr = "array(" + ",".join(f"{w}L" for w in weights) + ")"
    return F.expr(
        f"aggregate(bs, {bias}L,"
        f" (acc, x) -> acc + element_at({arr}, x + 1))"
    )


# gradient pairs: each token contributes (bucket, y); two sentinel
# pairs fold the bias gradient (-1 -> y) and the misclassified-doc
# count (-2 -> 1) into the SAME CLF_DIM+2-key aggregation, so one job
# per epoch carries weights, bias, and the convergence trace.
_GRAD_PAIRS = (
    "concat(transform(bs, x -> named_struct('b', x, 'v', y)),"
    " array(named_struct('b', -1, 'v', y),"
    "       named_struct('b', -2, 'v', CAST(1 AS bigint))))"
)


def train_perceptron(
    spark: SparkSession, sf_dir: str
) -> tuple[list[int], int, list[tuple[int, int]], DataFrame]:
    """Run CLF_EPOCHS full-batch epochs; returns the AVERAGED scorer
    (sum of after-epoch weight snapshots, Freund-Schapire), its bias,
    [(n_mis, sum_y) per epoch], and the base frame."""
    base = _base_frame(spark, sf_dir)
    weights = [0] * CLF_DIM
    bias = 0
    avg_w = [0] * CLF_DIM
    avg_b = 0
    trace: list[tuple[int, int]] = []
    for epoch in range(1, CLF_EPOCHS + 1):
        if epoch == 1:
            # w0 = 0 -> margin y*0 <= 0 for every doc: all update
            mis = base
        else:
            score = _score_expr(weights, bias)
            mis = base.where(F.col("y") * score <= 0)
        grad = (
            mis.select(F.explode(F.expr(_GRAD_PAIRS)).alias("p"))
            .groupBy(F.col("p.b").alias("b"))
            .agg(F.sum("p.v").alias("g"))
            .collect()
        )
        gm = {int(r["b"]): int(r["g"]) for r in grad}
        for b in range(CLF_DIM):
            weights[b] += gm.get(b, 0)
            avg_w[b] += weights[b]
        bias += gm.get(-1, 0)
        avg_b += bias
        trace.append((gm.get(-2, 0), gm.get(-1, 0)))
    return avg_w, avg_b, trace, base


def trained_quality_expr(weights: list[int], bias: int) -> str:
    """The trained scorer over a raw `text` column as ONE SQL snippet —
    the drop-in for curation.corpus_pipeline's quality stage (the
    DCLM/FineWeb-Edu train-then-filter composition): same bucket
    hashing, same literal-fold scoring, NULL-safe."""
    arr = "array(" + ",".join(f"{w}L" for w in weights) + ")"
    return (
        "aggregate(transform(split(trim(coalesce(text, '')), ' '),"
        f" t -> {BUCKET_BODY}), {bias}L,"
        f" (acc, x) -> acc + element_at({arr}, x + 1))"
    )


def calibrate_rows(scored: DataFrame) -> DataFrame:
    """Decision-threshold calibration over the (keep, sum_w) frame:
    pick tau maximizing the INTEGER Youden objective
    tp(tau)*N - fp(tau)*P  (equivalent to tpr - fpr, scale P*N), where
    the rule predicts keep iff sum_w > tau and candidates are the
    observed distinct scores. Ties break to the SMALLEST tau (keeps
    more). Same bounded-frame discipline as the AUC: one
    groupBy(sum_w), prefix sums over the distinct-score frame, never a
    corpus ranking. Emits (op='clf_train', k='tau',
    v=tau|obj|tp|fp|tn|fn)."""
    from pyspark.sql import Window

    per_s = scored.groupBy("sum_w").agg(
        F.sum("keep").alias("pos"),
        F.sum(F.lit(1) - F.col("keep")).alias("neg"),
    )
    above = (
        Window.orderBy(F.desc("sum_w"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = per_s.select(
        F.col("sum_w").alias("tau"),
        F.coalesce(F.sum("pos").over(above), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("neg").over(above), F.lit(0)).alias("fp"),
        F.sum("pos").over(whole).alias("p"),
        F.sum("neg").over(whole).alias("n"),
    ).withColumn("obj", F.col("tp") * F.col("n") - F.col("fp") * F.col("p"))
    best = cand.orderBy(F.desc("obj"), F.asc("tau")).limit(1)
    return best.select(
        F.lit("clf_train").alias("op"),
        F.lit("tau").alias("k"),
        F.concat_ws(
            "|",
            "tau",
            "obj",
            "tp",
            "fp",
            (F.col("n") - F.col("fp")).alias("tn"),
            (F.col("p") - F.col("tp")).alias("fn"),
        ).alias("v"),
    )


def clf_train_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='clf_train') suite rows: averaged weights w00..wNN + bias +
    per-epoch trace + the trained model's exact AUC/confusion + the
    calibrated decision threshold."""
    from paddleocr_spark.functions import text as _text  # noqa: F401  (import order)
    from paddleocr_spark.functions.clfeval import mann_whitney_rows

    weights, bias, trace, base = train_perceptron(spark, sf_dir)
    meta = [("clf_train", f"w{b:02d}", str(weights[b])) for b in range(CLF_DIM)]
    meta.append(("clf_train", "bias", str(bias)))
    meta.extend(
        ("clf_train", f"epoch{i}", f"{n}|{s}")
        for i, (n, s) in enumerate(trace, 1)
    )
    frame = spark.createDataFrame(meta, "op string, k string, v string")
    scored = base.select(
        (F.col("y") == 1).cast("long").alias("keep"),
        _score_expr(weights, bias).alias("sum_w"),
    ).localCheckpoint()  # referenced by BOTH the AUC and the calibration
    return frame.unionByName(
        mann_whitney_rows(scored, "clf_train")
    ).unionByName(calibrate_rows(scored))


def _epoch_sql(e: int) -> str:
    """One unrolled epoch (e >= 2): score against w{e-1}/bias{e-1},
    misclassified set, bucket gradient, updated w{e}/bias{e}/trace."""
    p = e - 1
    return f"""s{e} AS (
  SELECT f.doc_id, min(f.y) AS y,
         sum(f.c * w{p}.w) + (SELECT v FROM bias{p}) AS s
  FROM f JOIN w{p} USING (b) GROUP BY f.doc_id),
mis{e} AS (SELECT doc_id FROM s{e} WHERE y * s <= 0),
g{e} AS (
  SELECT f.b, sum(f.y * f.c) AS g
  FROM f JOIN mis{e} USING (doc_id) GROUP BY f.b),
w{e} AS (
  SELECT w{p}.b, w{p}.w + coalesce(g{e}.g, 0) AS w
  FROM w{p} LEFT JOIN g{e} USING (b)),
bias{e} AS (
  SELECT (SELECT v FROM bias{p})
         + (SELECT coalesce(sum(y), 0) FROM s{e} WHERE y * s <= 0) AS v),
e{e} AS (
  SELECT count(*) AS nmis, coalesce(sum(y), 0) AS sumy
  FROM s{e} WHERE y * s <= 0),
"""


def _train_sql() -> str:
    # text first: clfeval cannot be an import ENTRY point (text's own
    # late clfeval import would then see a partial module)
    from paddleocr_spark.functions.text import (
        GOPHER_BITS_SQL_EXPR,
        GOPHER_SIG_SQL_COLS,
    )
    from paddleocr_spark.functions.clfeval import MW_TAIL_SQL

    epochs = "".join(_epoch_sql(e) for e in range(2, CLF_EPOCHS + 1))
    epoch_rows = "\n".join(
        f"UNION ALL\nSELECT 'clf_train', 'epoch{e}',"
        f" CAST(nmis AS varchar) || '|' || CAST(sumy AS varchar) FROM e{e}"
        for e in range(1, CLF_EPOCHS + 1)
    )
    # averaged scorer: sum of the after-epoch snapshots
    w_sum = " + ".join(f"w{e}.w" for e in range(1, CLF_EPOCHS + 1))
    w_joins = "".join(
        f" JOIN w{e} USING (b)" for e in range(2, CLF_EPOCHS + 1)
    )
    b_sum = " + ".join(
        f"(SELECT v FROM bias{e})" for e in range(1, CLF_EPOCHS + 1)
    )
    avg = f"""wavg AS (
  SELECT w1.b, {w_sum} AS w
  FROM w1{w_joins}),
biasavg AS (SELECT {b_sum} AS v),
"""
    return (
        f"""WITH lab AS (
  SELECT doc_id, text,
         CASE WHEN ({GOPHER_BITS_SQL_EXPR.rstrip()}) = 0
              THEN 1 ELSE -1 END AS y
  FROM (SELECT doc_id, text,
{GOPHER_SIG_SQL_COLS.rstrip()}
        FROM documents)),
tok AS (
  SELECT doc_id, y, {BUCKET_BODY} AS b
  FROM (SELECT doc_id, y,
               unnest(string_split(trim(text), ' ')) AS t
        FROM lab)),
f AS (SELECT doc_id, y, b, count(*) AS c FROM tok GROUP BY 1, 2, 3),
dims AS (SELECT unnest(generate_series(0, {CLF_DIM - 1})) AS b),
-- epoch 1 closed form: w0 = 0 -> every margin is 0 -> all docs update
w1 AS (
  SELECT d.b, coalesce(g.g, 0) AS w
  FROM dims d LEFT JOIN
       (SELECT b, sum(y * c) AS g FROM f GROUP BY b) g USING (b)),
bias1 AS (SELECT coalesce(sum(y), 0) AS v FROM lab),
e1 AS (SELECT count(*) AS nmis, coalesce(sum(y), 0) AS sumy FROM lab),
{epochs}{avg}sfin AS (
  SELECT f.doc_id, min(f.y) AS y,
         sum(f.c * wavg.w) + (SELECT v FROM biasavg) AS s
  FROM f JOIN wavg USING (b) GROUP BY f.doc_id),
bb AS (SELECT CAST(y = 1 AS bigint) AS keep, s AS sum_w FROM sfin),
"""
        + MW_TAIL_SQL.format(op="clf_train", base="bb")
        + f"""
UNION ALL
SELECT 'clf_train', 'w' || lpad(CAST(b AS varchar), 2, '0'),
       CAST(w AS varchar)
FROM wavg
UNION ALL
SELECT 'clf_train', 'bias', CAST(v AS varchar) FROM biasavg
{epoch_rows}
UNION ALL
SELECT 'clf_train', 'tau',
       CAST(tau AS varchar) || '|' || CAST(obj AS varchar) || '|' ||
       CAST(tp AS varchar) || '|' || CAST(fp AS varchar) || '|' ||
       CAST(n - fp AS varchar) || '|' || CAST(p - tp AS varchar)
FROM (
  SELECT tau, tp, fp, p, n, tp * n - fp * p AS obj
  FROM (
    SELECT sum_w AS tau,
           coalesce(sum(pos) OVER (ORDER BY sum_w DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tp,
           coalesce(sum(neg) OVER (ORDER BY sum_w DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fp,
           sum(pos) OVER () AS p, sum(neg) OVER () AS n
    FROM (SELECT sum_w, sum(keep) AS pos, sum(1 - keep) AS neg
          FROM bb GROUP BY sum_w))
  ORDER BY obj DESC, tau ASC LIMIT 1)
"""
    )


_SQL_CACHE: dict[str, str] = {}


def __getattr__(name: str) -> str:
    """PEP 562 lazy CLF_TRAIN_SQL: built on first read so importing
    this module never touches text/clfeval at module-exec time."""
    if name == "CLF_TRAIN_SQL":
        if name not in _SQL_CACHE:
            _SQL_CACHE[name] = _train_sql()
        return _SQL_CACHE[name]
    raise AttributeError(name)
