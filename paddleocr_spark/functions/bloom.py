"""Distributed Bloom filter as a tiny (word_idx, word) DataFrame —
the pre-exchange miss-dropper the frontier/incremental-dedup docstrings
promise for 10^12-scale anti-joins (Bloom 1970; the same shape Spark's
own runtime row-level filtering uses, built here from public DataFrame
primitives so the plan is inspectable).

Build: k=2 xxhash64 probes per key -> bit positions in a power-of-two
bit array -> ONE map-side-combined groupBy(word_idx) bit_or. The result
has at most num_bits/64 rows (2048 longs for the default 2^17 bits) —
broadcast-sized by construction, independent of key count. At 10^12
crawled urls the partial aggregation caps every map task's output at
num_bits/64 rows, so the build shuffle is near-free; sizing num_bits
for a target false-positive rate is the deployment knob (fp ~=
(1 - e^(-k*n/m))^k).

Probe: k broadcast LEFT joins on the word index plus a bit test — ZERO
shuffle on the fact side, no UDF, whole-stage-codegen throughout. A
Bloom filter has NO false negatives, so `bloom_maybe = false` rows are
definitely absent from the key set and may bypass an exact anti-join
entirely; `true` rows still go through it. Downstream results are
therefore byte-identical with the filter on or off — the existing
strict oracles keep verifying the pruned plan (false positives only
shrink the prune, never change the answer).

Reference tie-in: the reference repo has no distributed analogue (its
sharding is --use_mp round-robin, tools/infer/utility.py); this is part
of the web-scale layer the north_star adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_bits(num_bits: int) -> None:
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two >= 64: {num_bits}")


def _bit_pos(col: str, seed: int, num_bits: int):
    """Probe `seed`'s bit position for `col` (0..num_bits-1).

    pmod, not %, so the sign of xxhash64 never produces a negative
    position; the seed literal makes the k probes independent hashes.
    """
    return F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(num_bits))


def bloom_words(keys: DataFrame, col: str, num_bits: int, k: int = 2) -> DataFrame:
    """Bloom filter over keys[col] as a DataFrame of
    (word_idx: long, word: long) — only words with at least one set bit
    are materialized (absent word_idx == all-zero word, which the probe
    side reads back through its LEFT join's null)."""
    _check_bits(num_bits)
    pos = F.explode(
        F.array(*[_bit_pos(col, i, num_bits) for i in range(k)])
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def with_bloom_flag(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    k: int = 2,
    flag: str = "bloom_maybe",
) -> DataFrame:
    """df + boolean `flag`: False => df[col] is DEFINITELY not in the
    key set the bloom was built over; True => maybe present. k
    broadcast LEFT joins + bit tests, zero fact-side shuffle."""
    _check_bits(num_bits)
    out = df
    hits = []
    for i in range(k):
        pos = _bit_pos(col, i, num_bits)
        side = bloom.select(
            F.col("word_idx").alias(f"_bloom_wi{i}"),
            F.col("word").alias(f"_bloom_w{i}"),
        )
        out = out.join(
            F.broadcast(side),
            F.shiftright(pos, 6) == F.col(f"_bloom_wi{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), "
            f"cast(pmod(xxhash64(`{col}`, {i}), {num_bits}) % 64 as int))"
        )
        hits.append(
            F.col(f"_bloom_w{i}").isNotNull()
            & (F.col(f"_bloom_w{i}").bitwiseAND(mask) != F.lit(0))
        )
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    drop = [c for i in range(k) for c in (f"_bloom_wi{i}", f"_bloom_w{i}")]
    return out.withColumn(flag, cond).drop(*drop)


def bloom_pruned_anti_join(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    num_bits: int = 1 << 17,
    k: int = 2,
) -> DataFrame:
    """left ANTI JOIN right, with a Bloom filter of right's keys probed
    on the left BEFORE the join: definite-miss rows bypass the exchange
    entirely and only `bloom_maybe` rows pay the exact anti-join.

    Identical results to the plain anti-join (no false negatives). The
    two branches share `left`'s shuffle through ReusedExchange, so the
    split-union does not recompute an upstream aggregation.
    """
    bloom = bloom_words(right.select(right_key), right_key, num_bits, k)
    flagged = with_bloom_flag(left, left_key, bloom, num_bits, k)
    definite_new = flagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    checked = (
        flagged.filter(F.col("bloom_maybe"))
        .drop("bloom_maybe")
        .join(right, F.col(left_key) == right[right_key], "left_anti")
    )
    return definite_new.unionByName(checked)
