"""Distributed averaged-perceptron training (functions/clftrain.py):
pure-python reference parity, partition invariance, and the
trained-beats-untrained AUC lift the operator exists for."""

import collections
import hashlib

import pytest

from tests.conftest import SF_SMALL

DIM = 64
EPOCHS = 3

GOPHER_STOP = None  # resolved lazily from the module under test


def _bucket(tok: str) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % DIM


def _reference(docs):
    """Full-batch averaged perceptron in pure python over
    [(y, Counter(bucket))] rows; mirrors clftrain.train_perceptron."""
    w = [0] * DIM
    b = 0
    avg_w = [0] * DIM
    avg_b = 0
    trace = []
    for epoch in range(EPOCHS):
        gw = [0] * DIM
        gb = 0
        nmis = 0
        for y, c in docs:
            s = sum(cnt * w[k] for k, cnt in c.items()) + b
            if y * s <= 0:
                nmis += 1
                gb += y
                for k, cnt in c.items():
                    gw[k] += y * cnt
        w = [a + g for a, g in zip(w, gw)]
        b += gb
        avg_w = [a + x for a, x in zip(avg_w, w)]
        avg_b += b
        trace.append((nmis, gb))
    return avg_w, avg_b, trace


def _label_docs(spark, sf_dir):
    """(y, bucket-Counter) per doc with the module's own label rule —
    read via the Spark frame so the reference uses identical labels."""
    from paddleocr_spark.functions.clftrain import _base_frame

    out = []
    for r in _base_frame(spark, sf_dir).collect():
        out.append((r["y"], collections.Counter(r["bs"])))
    return out


@pytest.fixture(scope="module")
def trained(spark):
    from paddleocr_spark.functions.clftrain import train_perceptron

    return train_perceptron(spark, SF_SMALL)


def test_matches_pure_python_reference(spark, trained):
    w, b, trace, _base = trained
    ref_w, ref_b, ref_trace = _reference(_label_docs(spark, SF_SMALL))
    assert w == ref_w
    assert b == ref_b
    assert trace == ref_trace


def test_bucket_snippet_matches_hashlib(spark):
    from paddleocr_spark.functions.clftrain import BUCKET_BODY

    toks = ["the", "zebra", "", "Straße", "123", "a b"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = [
        r["b"]
        for r in df.selectExpr(f"{BUCKET_BODY} AS b").collect()
    ]
    assert got == [_bucket(t) for t in toks]


def test_partition_invariance(spark, trained):
    """Full-batch integer sums: the learned model must be bit-identical
    however the corpus is split."""
    from pyspark.sql import functions as F

    from paddleocr_spark.functions.clftrain import (
        CLF_DIM,
        CLF_EPOCHS,
        _GRAD_PAIRS,
        _base_frame,
        _score_expr,
    )

    w, b, trace, _ = trained
    for parts in (1, 7):
        base = _base_frame(spark, SF_SMALL).repartition(parts)
        weights = [0] * CLF_DIM
        bias = 0
        aw = [0] * CLF_DIM
        ab = 0
        for epoch in range(1, CLF_EPOCHS + 1):
            mis = (
                base
                if epoch == 1
                else base.where(
                    F.col("y") * _score_expr(weights, bias) <= 0
                )
            )
            gm = {
                int(r["b"]): int(r["g"])
                for r in mis.select(
                    F.explode(F.expr(_GRAD_PAIRS)).alias("p")
                )
                .groupBy(F.col("p.b").alias("b"))
                .agg(F.sum("p.v").alias("g"))
                .collect()
            }
            for k in range(CLF_DIM):
                weights[k] += gm.get(k, 0)
                aw[k] += weights[k]
            bias += gm.get(-1, 0)
            ab += bias
        assert aw == w
        assert ab == b


def test_trained_auc_beats_untrained(spark):
    """The lift gate: the averaged scorer's exact micro-AUC must beat
    the untrained hashed stand-in's (clf_eval documents ~0.39-0.42;
    trained lands ~0.96 on this corpus)."""
    from paddleocr_spark.functions.clfeval import clf_eval_rows
    from paddleocr_spark.functions.clftrain import clf_train_rows

    def micro_auc(rows):
        (v,) = [r["v"] for r in rows if r["k"] == "auc"]
        return int(v.split("|")[3])

    untrained = micro_auc(clf_eval_rows(spark, SF_SMALL).collect())
    trained = micro_auc(clf_train_rows(spark, SF_SMALL).collect())
    assert trained > untrained + 200000  # >0.2 absolute AUC lift
    assert trained > 900000


def test_epoch1_updates_every_doc(spark, trained):
    _w, _b, trace, base = trained
    assert trace[0][0] == base.count()


def test_calibration_matches_brute_force(spark):
    """Exhaustive threshold sweep in python == the windowed argmax."""
    from paddleocr_spark.functions.clftrain import (
        _score_expr,
        calibrate_rows,
        train_perceptron,
    )
    from pyspark.sql import functions as F

    w, b, _t, base = train_perceptron(spark, SF_SMALL)
    scored = base.select(
        (F.col("y") == 1).cast("long").alias("keep"),
        _score_expr(w, b).alias("sum_w"),
    )
    rows = [(r["keep"], r["sum_w"]) for r in scored.collect()]
    P = sum(k for k, _ in rows)
    N = len(rows) - P
    best = None
    for tau in sorted({s for _, s in rows}):
        tp = sum(1 for k, s in rows if k == 1 and s > tau)
        fp = sum(1 for k, s in rows if k == 0 and s > tau)
        obj = tp * N - fp * P
        cand = (-obj, tau, tp, fp)
        if best is None or cand < best:
            best = cand
    (v,) = [r["v"] for r in calibrate_rows(scored).collect()]
    tau, obj, tp, fp, tn, fn = map(int, v.split("|"))
    assert (tau, tp, fp) == (best[1], best[2], best[3])
    assert obj == -best[0]
    assert tn == N - fp and fn == P - tp


def test_trained_funnel_composition(spark):
    """DCLM-style train-then-filter: the funnel accepts the trained
    scorer + calibrated threshold, and its quality verdicts equal the
    threshold rule applied directly."""
    from paddleocr_spark.functions.clftrain import (
        _score_expr,
        calibrate_rows,
        train_perceptron,
        trained_quality_expr,
    )
    from paddleocr_spark.functions.curation import corpus_verdicts
    from paddleocr_spark.sources.scan import scan_parquet
    from pyspark.sql import functions as F

    w, b, _t, base = train_perceptron(spark, SF_SMALL)
    scored = base.select(
        "doc_id",
        (F.col("y") == 1).cast("long").alias("keep"),
        _score_expr(w, b).alias("sum_w"),
    )
    (v,) = [
        r["v"]
        for r in calibrate_rows(
            scored.select("keep", "sum_w")
        ).collect()
    ]
    tau = int(v.split("|")[0])
    docs = scan_parquet(spark, f"{SF_SMALL}/documents.parquet")
    verdicts = corpus_verdicts(
        docs,
        quality_sum_expr=trained_quality_expr(w, b),
        quality_tau=tau,
    )
    got = {
        r["doc_id"]: r["stage"]
        for r in verdicts.collect()
        if r["stage"] == "quality"
    }
    score_map = {r["doc_id"]: r["sum_w"] for r in scored.collect()}
    # every quality-dropped doc scored <= tau; every doc that scored
    # <= tau either failed earlier (lang/gopher) or failed quality
    stages = {r["doc_id"]: r["stage"] for r in verdicts.collect()}
    for doc_id, stage in stages.items():
        if stage == "quality":
            assert score_map[doc_id] <= tau
        elif stage not in ("lang", "gopher"):
            assert score_map[doc_id] > tau, (doc_id, stage)
