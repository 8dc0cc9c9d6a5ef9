"""Scale-safety pin for ngram_jaccard_pairs: a boilerplate shingle
shared by more than DF_CAP documents must be excluded from the
candidate self-join (its d^2 pair blow-up is the 100 TB killer), while
genuine near-duplicate pairs still surface through rare shingles."""

import pandas as pd

from paddleocr_spark.functions import dedup


def _write_docs(spark, tmp_path, texts):
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_hot_shingle_excluded_from_candidate_join(spark, tmp_path):
    n_hot = dedup.DF_CAP + 6
    texts = [f"aaa bbb ccc w{i}a w{i}b" for i in range(n_hot)]
    texts += ["xxx yyy zzz qqq", "xxx yyy zzz qqq"]
    sf_dir = _write_docs(spark, tmp_path, texts)

    # the boilerplate shingle is over the cap -> dropped from candidates
    sh = dedup._shingled(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    from pyspark.sql import functions as F

    df_counts = {
        r["shingle"]: r["df"]
        for r in sh.groupBy("shingle").agg(F.count("*").alias("df")).collect()
    }
    assert df_counts["aaa bbb ccc"] == n_hot > dedup.DF_CAP

    rows = dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    # only the true near-dup pair survives; no pair is generated through
    # the hot shingle alone
    assert len(rows) == 1
    row = rows[0]
    assert (row.doc_a, row.doc_b) == (n_hot, n_hot + 1)
    assert row.jaccard == 1.0
    # and every shingle feeding the join has bounded key cardinality
    max_kept_df = max(
        (df for s, df in df_counts.items() if df <= dedup.DF_CAP),
        default=0,
    )
    assert max_kept_df <= dedup.DF_CAP


def test_dedup_clusters_match_union_find(spark):
    """Connected components over the LSH pairs must agree with a plain
    union-find on the same edges."""
    from paddleocr_spark.functions.dedup import dedup_clusters, minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    pairs = [(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(spark, sf).collect()]
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in parent}
    got = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(spark, sf).collect()}
    assert got == expected


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in parent}


def _star(spark, pairs, max_rounds=50):
    from paddleocr_spark.functions.dedup import connected_components_star

    edges = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]).astype("int64")
    )
    return {
        r["doc_id"]: r["cluster_rep"]
        for r in connected_components_star(edges, max_rounds=max_rounds).collect()
    }


def test_star_contraction_beats_propagation_on_chains(spark):
    """The adversarial case for label propagation: a path graph. Plain
    min-label propagation needs diameter rounds (here 149 > the 60-round
    cap; verified by simulating it), while large-star/small-star rewires
    the graph and converges in O(log^2 n) rounds."""
    n = 150
    chain = [(i, i + 1) for i in range(n - 1)]

    # plain propagation (no pointer jump) simulated exactly: label_v <-
    # min(label_v, min over neighbours) per round; rounds == diameter
    labels = list(range(n))
    rounds = 0
    while True:
        new = [
            min(
                labels[i],
                labels[i - 1] if i > 0 else labels[i],
                labels[i + 1] if i < n - 1 else labels[i],
            )
            for i in range(n)
        ]
        rounds += 1
        if new == labels:
            break
        labels = new
    assert rounds > 60  # the dedup_clusters cap — propagation alone loses

    got = _star(spark, chain, max_rounds=20)  # well under log2(150)^2
    assert got == {i: 0 for i in range(n)}


def test_star_contraction_matches_union_find_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        nodes = rng.sample(range(10_000), 60)
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _star(spark, pairs) == _union_find(pairs)


def test_dedup_clusters_escalates_to_star_contraction(spark):
    """Exhausting the propagation round cap must hand off to star
    contraction and return the same components, not raise / split."""
    from paddleocr_spark.functions.dedup import dedup_clusters

    sf = "/root/testdata/sf0.001"
    default = {
        r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(spark, sf).collect()
    }
    # max_rounds=0 -> the for-loop body never runs -> escalation path
    escalated = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup_clusters(spark, sf, max_rounds=0).collect()
    }
    assert escalated == default
