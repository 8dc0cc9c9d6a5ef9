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


# ---------------------------------------------------------------------------
# exact_substring_dedup: semantics pinned against a brute-force Python
# reference on crafted corpora (overlap merge, adjacent spans, full
# coverage, first-occurrence keep, short docs).
# ---------------------------------------------------------------------------


def _brute_substring_dedup(texts, w):
    """Reference implementation: dict of gram -> occurrence list, keep
    the smallest (doc_id, pos), mark the rest, merge contiguous
    coverage, rebuild."""
    toks = [t.split(" ") for t in texts]
    occs = {}
    for d, tk in enumerate(toks):
        for i in range(len(tk) - w + 1):
            occs.setdefault(" ".join(tk[i : i + w]), []).append((d, i))
    marked = {d: [] for d in range(len(texts))}
    for gram, lst in occs.items():
        if len(lst) < 2:
            continue
        keep = min(lst)
        for d, i in lst:
            if (d, i) != keep:
                marked[d].append((i, i + w - 1))
    out = []
    for d, tk in enumerate(toks):
        spans = []
        for s, e in sorted(marked[d]):
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + 1))
        cleaned = " ".join(t for i, t in enumerate(tk) if i not in covered)
        out.append(
            (d, len(spans), sum(e - s + 1 for s, e in spans), cleaned)
        )
    return out


def test_exact_substring_dedup_vs_brute_force(spark, tmp_path):
    w = dedup.SPAN_W
    base = [f"w{i}" for i in range(w)]
    run = " ".join(base)  # an exactly-w duplicated span
    long_run = " ".join(f"u{i}" for i in range(w + 5))  # overlapping grams
    texts = [
        # doc 0: first occurrence of `run` -> kept everywhere
        run + " tail0 tail1 tail2",
        # doc 1: duplicate of the span mid-document -> one w-token span cut
        "pre0 pre1 " + run + " post0 post1",
        # doc 2: long duplicated region -> overlapping grams merge into
        # ONE island (first occurrence, kept)
        long_run + " endx",
        # doc 3: the same long region, duplicated -> one merged island
        "zz0 " + long_run,
        # doc 4: entirely a duplicate of doc 0's span -> cleaned == ''
        run,
        # doc 5: shorter than the window -> untouched, no occurrences
        "s0 s1 s2",
        # doc 6: TWO disjoint duplicated spans -> two islands
        run + " mid0 mid1 mid2 " + run,
    ]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = [
        (r.doc_id, r.n_spans, r.n_dup_tokens, r.cleaned_text)
        for r in dedup.exact_substring_dedup(spark, sf_dir).collect()
    ]
    exp = _brute_substring_dedup(texts, w)
    assert got == exp
    # spot-pin the semantics the corpus was built to exercise
    by_id = {g[0]: g for g in got}
    assert by_id[0][1] == 0  # first occurrence keeps its text
    assert by_id[0][3] == texts[0]
    assert by_id[1] == (1, 1, w, "pre0 pre1 post0 post1")
    assert by_id[2][1] == 0  # long region's first occurrence kept
    assert by_id[3][1] == 1  # overlapping grams merged to one island
    assert by_id[3][2] == w + 5
    assert by_id[3][3] == "zz0"
    assert by_id[4] == (4, 1, w, "")  # fully-duplicate doc empties
    assert by_id[5] == (5, 0, 0, texts[5])  # sub-window doc untouched
    # doc 6: second copy of `run` inside the SAME doc is also a dup of
    # the corpus-first occurrence (doc 0) -- and its own first copy is a
    # dup too; contiguity decides island count
    assert by_id[6][1] >= 1 and by_id[6][2] >= w


def test_exact_substring_dedup_intra_doc_repeat(spark, tmp_path):
    """A gram repeated only WITHIN one doc still dedups: the first
    in-doc occurrence is the corpus-first and survives; later ones
    cut."""
    w = dedup.SPAN_W
    run = " ".join(f"q{i}" for i in range(w))
    texts = [run + " gap0 gap1 " + run]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = [
        (r.doc_id, r.n_spans, r.n_dup_tokens, r.cleaned_text)
        for r in dedup.exact_substring_dedup(spark, sf_dir).collect()
    ]
    assert got == _brute_substring_dedup(texts, w)
    assert got[0] == (0, 1, w, run + " gap0 gap1")


def test_decontaminate_flags_gram_overlap(spark, tmp_path):
    """Training docs sharing a w-gram with the held-out slice are
    flagged; hit counts are per-occurrence; eval docs never appear in
    the output; the eval-gram join side is broadcast."""
    w = dedup.SPAN_W
    run = " ".join(f"e{i}" for i in range(w))
    texts = ["x"] * (2 * dedup.DECON_MOD + 1)
    texts[0] = run + " evtail"                       # eval doc
    texts[dedup.DECON_MOD] = "only unique words here nothing shared at all"  # eval doc
    texts[1] = "pre " + run                           # contaminated (1 hit)
    texts[2] = run + " mid " + run                    # contaminated (2 hits)
    for i in range(3, len(texts)):
        if i % dedup.DECON_MOD == 0:
            continue
        texts[i] = " ".join(f"c{i}w{j}" for j in range(w + 2))  # clean
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {
        r.doc_id: (r.n_shared_grams, r.contaminated)
        for r in dedup.decontaminate(spark, sf_dir).collect()
    }
    assert 0 not in got and dedup.DECON_MOD not in got  # eval excluded
    assert got[1] == (1, 1)
    assert got[2] == (2, 1)
    assert all(got[i] == (0, 0) for i in got if i > 2)
    plan = dedup.decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval grams broadcast, train side never shuffles


def test_exact_substring_dedup_long_doc_key_no_collision(spark, tmp_path):
    """Regression: the packed occurrence key must order (doc_id, pos)
    correctly for documents past 1024 tokens (the old doc_id*1024+pos
    packing collided across neighbour docs — a span at doc 0 pos 1100
    aliased doc 1 pos 76). The first occurrence lives DEEP inside a
    1500-token doc; the copy in the next doc must be the one removed."""
    w = dedup.SPAN_W
    run = " ".join(f"dup{i}" for i in range(w))
    filler = " ".join(f"f{j}" for j in range(1400))
    texts = [filler + " " + run, run + " tail0 tail1"]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = [
        (r.doc_id, r.n_spans, r.n_dup_tokens, r.cleaned_text)
        for r in dedup.exact_substring_dedup(spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    ]
    assert got == _brute_substring_dedup(texts, w)
    # doc 0 holds the first occurrence (pos 1400 > old 1024 budget) and
    # keeps it; doc 1's copy is removed
    assert got[0][1] == 0 and got[1][1] == 1
    assert got[1][3] == "tail0 tail1"


def test_keep_best_argmax_and_tiebreak(spark):
    """keep_best: argmax quality per cluster, equal-quality ties to the
    smallest doc_id, singleton clusters pass through."""
    from paddleocr_spark.functions.dedup import keep_best

    members = spark.createDataFrame(
        [
            # cluster 1: clear quality winner (doc 12, q=90)
            (1, 10, 50), (1, 12, 90), (1, 11, 70),
            # cluster 2: q tie at 40 -> keep min doc_id 20
            (2, 21, 40), (2, 20, 40), (2, 22, 10),
            # cluster 3: singleton
            (3, 30, 5),
        ],
        "cluster_rep long, doc_id long, q long",
    )
    got = {
        r.cluster_rep: (r.n_docs, r.keep_doc_id, r.best_q)
        for r in keep_best(members).collect()
    }
    assert got == {1: (3, 12, 90), 2: (3, 20, 40), 3: (1, 30, 5)}


class TestContentDefinedChunking:
    """CDC (FastCDC/LBFS family): boundary determinism, shift
    invariance, dedup groups."""

    def test_chunks_cover_payload_exactly(self, spark):
        from paddleocr_spark.functions.dedup import (
            CDC_LEN_BASE,
            CDC_LEN_SPREAD,
            _cdc_chunks_frame,
        )
        from tests.conftest import SF_SMALL

        rows = _cdc_chunks_frame(spark, SF_SMALL).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, chunks in list(by_doc.items())[:50]:
            chunks.sort(key=lambda r: r["idx"])
            n = CDC_LEN_BASE + doc_id % CDC_LEN_SPREAD
            pos = 0
            for c in chunks:
                assert c["s"] == pos
                assert c["len"] > 0
                pos += c["len"]
            assert pos == n, doc_id

    def test_shifted_payloads_share_interior_chunks(self, spark):
        """The CDC selling point: every fixture payload is a byte-shift
        of the same 251-cycle, so interior chunk content recurs across
        docs — offset-based blocking would find none of these."""
        from paddleocr_spark.functions.dedup import cdc_dup_rows
        from tests.conftest import SF_SMALL

        shared = [
            r for r in cdc_dup_rows(spark, SF_SMALL).collect()
            if int(r["v"].split("|")[1]) > 1
        ]
        assert len(shared) > 100, len(shared)

    def test_boundaries_are_content_defined(self):
        """Pure-python reference of the rolling hash agrees with the
        closed-form boundary rule the Spark expressions implement."""
        from paddleocr_spark.functions.dedup import (
            CDC_BASE,
            CDC_BYTE_MOD,
            CDC_MASK_MOD,
            CDC_WINDOW,
        )

        doc = 37
        n = 400 + doc % 200
        b = [(doc * 7 + i * 13) % CDC_BYTE_MOD for i in range(n)]
        cuts = [
            p
            for p in range(CDC_WINDOW - 1, n)
            if sum(
                b[p - j] * CDC_BASE**j for j in range(CDC_WINDOW)
            ) % CDC_MASK_MOD == 0
        ]
        assert cuts, "fixture must produce at least one boundary"
        # boundary decision depends only on the window content: the
        # same 8 bytes elsewhere (any doc, any offset) cut identically
        w0 = b[cuts[0] - CDC_WINDOW + 1 : cuts[0] + 1]
        h = sum(w0[-1 - j] * CDC_BASE**j for j in range(CDC_WINDOW))
        assert h % CDC_MASK_MOD == 0
