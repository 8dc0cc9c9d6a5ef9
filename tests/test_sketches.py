"""Sketch operators: HyperLogLog distinct + Count-Min heavy hitters.

The strict gate (text_stats_suite rows 'hll_distinct' /
'cm_heavy_hitters') proves Spark == DuckDB on the fixture; these tests
prove the sketches are RIGHT: register derivation matches a pure-Python
HLL built from the same md5 stream, the estimate lands inside the
published error envelope on a corpus far above the small-range regime,
and the Count-Min bound direction (never an underestimate) holds for
every probe.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.functions.sketches import (
    CM_TERMS,
    HLL_M,
    HLL_W,
    cm_bucket_snippet,
    cm_heavy_hitters,
    hll_distinct,
    hll_idx_snippet,
    hll_rho_snippet,
)

SF = "/root/testdata/sf0.001"


def _py_hll(keys):
    """Textbook HLL from the same md5-derived bit stream the SQL
    snippets read: idx = first 8 bits, rho = leading-zero rank of the
    next 40."""
    regs = [0] * HLL_M
    for k in keys:
        h = hashlib.md5(k.encode()).hexdigest()
        idx = int(h[:2], 16)
        v = int(h[2:12], 16)
        rho = HLL_W + 1 if v == 0 else HLL_W + 1 - v.bit_length()
        regs[idx] = max(regs[idx], rho)
    return regs


def _py_estimate(regs):
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    s = sum(2.0 ** -r for r in regs)
    est = alpha * HLL_M * HLL_M / s
    v = regs.count(0)
    if est <= 2.5 * HLL_M and v > 0:
        est = HLL_M * math.log(HLL_M / v)
    return est


def test_hll_registers_match_python_reference(spark):
    out = {r["host"]: r for r in hll_distinct(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    rows = docs.collect()
    by_host = {}
    for r in rows:
        host = f"{r['source']}.example.test"
        key = f"{r['source']}/p{r['doc_id'] - r['doc_id'] % 100}"
        by_host.setdefault(host, []).append(key)
    assert set(out) == set(by_host)
    for host, keys in by_host.items():
        regs = _py_hll(keys)
        v_zero = regs.count(0)
        s_scaled = sum(1 << (HLL_W + 1 - r) for r in regs)
        got = out[host]
        assert got["v_zero"] == v_zero
        assert got["s_scaled"] == s_scaled
        assert got["est_micro"] == round(_py_estimate(regs) * 1e6)
        assert got["exact_distinct"] == len(set(keys))
        # the fixture collapses 5 stride-20 captures per page
        assert got["exact_distinct"] == 5


def test_hll_error_envelope_beyond_small_range(spark):
    """On 20k distinct synthetic keys (exercising the raw-estimate
    branch, not linear counting) the estimate must land within 4 stddev
    of the 1.04/sqrt(m) envelope — deterministic, not a flaky sample:
    the keys and hash are fixed."""
    n = 20000
    df = spark.range(n).select(
        F.lit("h").alias("host"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )
    regs = (
        df.select(
            "host",
            F.expr(hll_idx_snippet("key")).alias("idx"),
            F.expr(hll_rho_snippet("key")).alias("rho"),
        )
        .groupBy("host", "idx")
        .agg(F.max("rho").alias("r"))
        .collect()
    )
    full = [0] * HLL_M
    for r in regs:
        full[r["idx"]] = r["r"]
    est = _py_estimate(full)
    rel_err = abs(est - n) / n
    assert rel_err < 4 * 1.04 / math.sqrt(HLL_M), (est, rel_err)


def test_cm_never_underestimates(spark):
    rows = {r["term"]: r for r in cm_heavy_hitters(spark, SF).collect()}
    assert set(rows) == set(CM_TERMS)
    for t, r in rows.items():
        assert r["cm_est"] >= r["true_count"], t
    assert rows["zzzabsent"]["true_count"] == 0


def test_cm_exact_when_bucket_unshared(spark):
    """A probe whose two buckets are collision-free across the fixture
    vocabulary must read exactly its true count (the CM bound is tight
    without collisions). The sf0.001 corpus vocabulary is small enough
    to check collision-freeness directly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = [
        r["word"]
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
        .distinct()
        .collect()
    ]

    def bucket(word, depth):
        h = hashlib.md5(f"{depth}:{word}".encode()).hexdigest()
        return int(h[:4], 16) % 64

    rows = {r["term"]: r for r in cm_heavy_hitters(spark, SF).collect()}
    checked = 0
    for t in CM_TERMS:
        if t not in vocab:
            continue
        clean = any(
            all(bucket(w, d) != bucket(t, d) for w in vocab if w != t)
            for d in (0, 1)
        )
        if clean:
            assert rows[t]["cm_est"] == rows[t]["true_count"], t
            checked += 1
    assert checked >= 1  # fixture has at least one collision-free probe


def test_cm_bucket_snippet_matches_python(spark):
    words = ["the", "spark", "zebra", "0", ""]
    got = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w",
        F.expr(cm_bucket_snippet("w", 0)).alias("b0"),
        F.expr(cm_bucket_snippet("w", 1)).alias("b1"),
    ).collect()
    for r in got:
        for d, col in ((0, "b0"), (1, "b1")):
            h = hashlib.md5(f"{d}:{r['w']}".encode()).hexdigest()
            assert r[col] == int(h[:4], 16) % 64


def test_hll_plan_is_two_hash_aggregates(spark):
    """Scale pin: the sketch is groupBy->groupBy with map-side combine —
    no window, no join, no sort in the plan."""
    plan = hll_distinct(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    for bad in ("Window", "SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in plan, bad
