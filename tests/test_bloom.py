"""Distributed Bloom filter (`functions/bloom.py`): the pre-exchange
anti-join pruner. Core contracts: NO false negatives (members always
flag maybe), bounded word table, and pruned-anti-join == plain
anti-join byte-for-byte — plus the frontier wiring and plan shape."""

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.functions.bloom import (
    bloom_pruned_anti_join,
    bloom_words,
    with_bloom_flag,
)

NUM_BITS = 1 << 10  # small on purpose: measurable false-positive rate


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(200).select(
        F.concat(F.lit("key-"), F.col("id")).alias("u")
    )


def test_members_always_flag_maybe(spark, keys):
    """A Bloom filter has no false negatives — every inserted key must
    probe as maybe-present, at any fill level."""
    bloom = bloom_words(keys, "u", NUM_BITS)
    flagged = with_bloom_flag(keys, "u", bloom, NUM_BITS)
    assert flagged.filter(~F.col("bloom_maybe")).count() == 0


def test_false_positive_rate_in_expected_band(spark, keys):
    """n=200 keys in m=1024 bits with k=2: fp ~= (1-e^(-2n/m))^2 ~= 0.10.
    Assert the measured rate is clearly sub-majority (the filter is
    doing real work) without pinning the hash function."""
    bloom = bloom_words(keys, "u", NUM_BITS)
    others = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("u")
    )
    fp = (
        with_bloom_flag(others, "u", bloom, NUM_BITS)
        .filter("bloom_maybe")
        .count()
    )
    assert fp / 2000 < 0.35


def test_word_table_bounded_and_broadcast_sized(spark, keys):
    bloom = bloom_words(keys, "u", NUM_BITS)
    assert bloom.count() <= NUM_BITS // 64
    # every word carries at least one set bit (all-zero words are
    # represented by absence, read back through the probe's LEFT join)
    assert bloom.filter(F.col("word") == 0).count() == 0


def test_bad_num_bits_rejected(spark, keys):
    for bad in (0, 63, 100):
        with pytest.raises(ValueError):
            bloom_words(keys, "u", bad)


def test_pruned_anti_join_identical_to_plain(spark):
    left = spark.range(500).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") * 7).alias("payload"),
    )
    right = spark.range(0, 500, 3).select(
        F.concat(F.lit("k"), F.col("id")).alias("seen")
    )
    plain = {
        (r.key, r.payload)
        for r in left.join(
            right, left.key == right.seen, "left_anti"
        ).collect()
    }
    pruned = {
        (r.key, r.payload)
        for r in bloom_pruned_anti_join(
            left, "key", right, "seen", NUM_BITS
        ).collect()
    }
    assert pruned == plain
    assert len(plain) == 500 - len(range(0, 500, 3))


def test_frontier_bloom_identical_and_plan_pruned(spark):
    """frontier_targets with the Bloom pre-filter returns exactly the
    plain anti-join's rows, probes via broadcast joins, and shares the
    aggregation shuffle between the two union branches instead of
    recomputing it."""
    from paddleocr_spark.operators.html_extract import frontier_targets

    links = spark.createDataFrame(
        [
            ("a.test", "/doc/1"),  # crawled -> removed
            ("a.test", "/new"),
            ("b.test", "/new"),
            ("a.test", "/new"),
        ],
        "host string, href string",
    )
    crawled = spark.createDataFrame([("https://a.test/doc/1",)], "u string")

    def rows(df):
        return {(r.target, r.n_refs, r.n_hosts) for r in df.collect()}

    plain = frontier_targets(links, crawled)
    bloomed = frontier_targets(links, crawled, bloom_bits=NUM_BITS)
    assert rows(bloomed) == rows(plain) == {
        ("https://a.test/new", 2, 1),
        ("https://b.test/new", 1, 1),
    }
    bloomed.collect()
    plan = bloomed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the definite-new branch and the checked branch must read the SAME
    # aggregation shuffle (split-union without recomputation)
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan


def test_probe_column_name_needing_quoting(spark, keys):
    """The probe's mask expression interpolates the column name into a
    SQL string — a name with a dash (illegal bare identifier) must be
    backtick-quoted, and parity with the plain anti-join must hold."""
    left = spark.range(300).select(
        F.concat(F.lit("key-"), F.col("id")).alias("the-key")
    )
    got = bloom_pruned_anti_join(left, "the-key", keys, "u", NUM_BITS)
    want = left.join(keys, F.col("the-key") == F.col("u"), "left_anti")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in want.collect()
    )
