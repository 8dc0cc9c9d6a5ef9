"""corpus_pipeline (functions/curation.py) funnel-semantics pins.

The gate corpus has no exact duplicates, so the exact_dup stage and the
composed "dedup only among survivors" rule are pinned here on a crafted
corpus, with the DuckDB oracle run on the SAME parquet — a full
engine-parity check on adversarial rows, not just expected-value
asserts.
"""

import hashlib
import random

import duckdb
import pytest

from paddleocr_spark.functions.curation import CORPUS_PIPELINE_SQL
from paddleocr_spark.functions.text import GOPHER_STOP


def _sum_w(text: str) -> int:
    """Python twin of the hashed-classifier pooled score."""
    s = 0
    for t in text.strip().split(" "):
        h = hashlib.md5(t.encode()).hexdigest()
        s += (
            int(h[0], 16) * 4096
            + int(h[1], 16) * 256
            + int(h[2], 16) * 16
            + int(h[3], 16)
            - 32768
        )
    return s


def _gopher_ok_text(rng: random.Random, target_sign: int) -> str:
    """~60 words, mean len in [3,10], >=2 stopwords, >=20% distinct,
    with the classifier score sign steered to target_sign by retrying
    different word pools (each word is 4-6 chars, so all Gopher rules
    hold by construction)."""
    for _ in range(500):
        words = [
            "".join(rng.choice("bcdfghjklmnpqrstvwxyz") for _ in range(rng.randint(4, 6)))
            for _ in range(56)
        ]
        text = " ".join(words + list(GOPHER_STOP[:4]))
        if (_sum_w(text) > 0) == (target_sign > 0):
            return text
    raise AssertionError("could not steer classifier sign")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    rng = random.Random(7)
    kept = _gopher_ok_text(rng, +1)
    low_q = _gopher_ok_text(rng, -1)
    kept2 = _gopher_ok_text(rng, +1)
    # same token multiset as kept2 => same SimHash; different order =>
    # different content fingerprint => near_dup (not exact_dup)
    shuffled = kept2.split(" ")
    while True:
        rng.shuffle(shuffled)
        if " ".join(shuffled) != kept2:
            break
    near = " ".join(shuffled)
    gopher_fail = "tiny doc " + " ".join(GOPHER_STOP[:4])
    rows = [
        # (doc_id, text, lang) -> expected stage
        (0, kept, "en", "kept"),
        (1, kept, "fr", "lang"),          # funnel: lang beats exact_dup
        (2, gopher_fail, "en", "gopher"),
        (3, low_q, "en", "quality"),
        (4, kept, "en", "exact_dup"),     # byte-dup of surviving doc 0
        (5, kept2, "en", "kept"),
        (6, near, "en", "near_dup"),      # same simhash as 5, new fp
        # dup of a DROPPED doc: doc 3 fails quality, so its copy under
        # a kept lang/quality... is itself low quality too -> 'quality',
        # NOT exact_dup (first failing stage wins).
        (7, low_q, "en", "quality"),
        # dup of gopher_fail but in a dropped lang -> 'lang'
        (8, gopher_fail, "zh", "lang"),
        # real-crawl nulls: NULL text coalesces to '' (fails word
        # count), NULL lang fails the lang gate
        (9, None, "en", "gopher"),
        (10, gopher_fail, None, "lang"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, "srcT", len(t or "")) for i, t, lang, _ in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("curation")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d), {i: st for i, _, _, st in rows}


def test_funnel_stages_and_engine_parity(spark, corpus):
    from paddleocr_spark.functions.curation import corpus_pipeline

    sf_dir, want = corpus
    got = {
        r["doc_id"]: (r["stage"], r["keep"])
        for r in corpus_pipeline(spark, sf_dir).collect()
    }
    assert {i: s for i, (s, _) in got.items()} == want
    for i, (s, k) in got.items():
        assert k == int(s == "kept")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    oracle = {
        int(r[0]): (r[1], int(r[2]))
        for r in con.execute(CORPUS_PIPELINE_SQL).fetchall()
    }
    assert oracle == got


def test_plan_shape_single_subtree(spark, corpus):
    """No self-union (the corpus-signal projection must not evaluate
    twice), near-dup min comes back via a broadcast join, and the
    post-checkpoint plan carries at most 3 exchanges (sh_mins agg +
    broadcast + final sort)."""
    import re

    from paddleocr_spark.functions.curation import corpus_pipeline

    sf_dir, _ = corpus
    plan = (
        corpus_pipeline(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" not in plan
    assert "BroadcastHashJoin" in plan
    n_exchange = len(re.findall(r"\bExchange (hash|range)", plan))
    assert n_exchange <= 3, plan


def test_all_six_stages_exercised(spark, corpus):
    _, want = corpus
    assert set(want.values()) == {
        "lang",
        "gopher",
        "quality",
        "exact_dup",
        "near_dup",
        "kept",
    }
