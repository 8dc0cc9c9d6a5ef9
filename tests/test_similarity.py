"""ANN ladder (functions/similarity.py): multi-probe LSH semantics and
the recall gate floors the driver board records each round."""

import numpy as np
import pytest

from tests.conftest import SF_SMALL, SF_MID


def test_probe_buckets_are_query_plus_hamming1(spark):
    from paddleocr_spark.functions.similarity import SIGN_BITS, _probe_buckets
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit("10110010").alias("qb"))
    probes = df.select(_probe_buckets(F.col("qb")).alias("p")).collect()[0]["p"]
    assert probes[0] == "10110010"
    assert len(probes) == SIGN_BITS + 1
    assert len(set(probes)) == SIGN_BITS + 1
    for flip in probes[1:]:
        assert len(flip) == SIGN_BITS
        assert sum(a != b for a, b in zip(flip, "10110010")) == 1


def test_lsh_multiprobe_recall_floor(spark):
    """The round-3 verdict flagged lsh recall@10 = 0.0 (single bucket);
    multi-probe must keep it strictly positive at the driver's sf — a
    retrieval index with measured recall 0 is dead weight."""
    from paddleocr_spark.functions.similarity import ann_recall_rows

    rows = {r["k"]: r["v"] for r in ann_recall_rows(spark, SF_MID).collect()}
    lsh_hits = int(rows["lsh"].split("|")[0])
    assert lsh_hits >= 1, rows
    # the rest of the ladder must not regress either
    assert int(rows["ivf"].split("|")[0]) >= 4
    assert int(rows["sq8"].split("|")[0]) >= 8


def test_lsh_results_come_from_probed_buckets_only(spark):
    """The pruning contract: every returned vector's bucket is within
    Hamming distance 1 of the query's bucket."""
    from paddleocr_spark.functions.similarity import (
        QUERY_VEC_ID,
        _bucket,
        _emb,
        lsh_bucket_topk,
    )
    from pyspark.sql import functions as F

    emb = _emb(spark, SF_SMALL).withColumn("bucket", _bucket(F.col("embedding")))
    buckets = {r["vec_id"]: r["bucket"] for r in emb.collect()}
    qb = buckets[QUERY_VEC_ID]
    for r in lsh_bucket_topk(spark, SF_SMALL).collect():
        dist = sum(a != b for a, b in zip(buckets[r["vec_id"]], qb))
        assert dist <= 1, (r["vec_id"], dist)
