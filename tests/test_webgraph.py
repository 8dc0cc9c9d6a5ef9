"""Host-graph PageRank (functions/webgraph.py): pure-python reference
parity, rounding-boundary safety margin, oracle-fixture agreement."""

import duckdb
import pytest

from tests.conftest import SF_MID, SF_SMALL

DAMPING = 0.85
ITERS = 3


def _reference_pagerank(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    hosts = sorted({s for _, s in rows})
    n = len(hosts)
    rank_of = {s: i + 1 for i, s in enumerate(hosts)}
    edges = {}
    for doc_id, s in rows:
        u = rank_of[s]
        v = (u * 7 + doc_id) % n + 1
        edges[(u, v)] = edges.get((u, v), 0) + 1
    out = {}
    for (u, _), w in edges.items():
        out[u] = out.get(u, 0) + w
    assert set(out) == set(range(1, n + 1)), "dangling host"
    r = {u: 1.0 / n for u in range(1, n + 1)}
    for _ in range(ITERS):
        mass = {u: 0.0 for u in range(1, n + 1)}
        for (u, v), w in edges.items():
            mass[v] += r[u] * (w / out[u])
        r = {
            u: (1 - DAMPING) / n + DAMPING * mass[u]
            for u in range(1, n + 1)
        }
    return {hosts[u - 1]: r[u] for u in r}


def test_spark_matches_reference_exactly_in_micro_units(spark):
    from paddleocr_spark.functions.webgraph import host_pagerank

    ref = _reference_pagerank(SF_SMALL)
    got = {
        r["source"]: r["rank"]
        for r in host_pagerank(spark, SF_SMALL).collect()
    }
    assert set(got) == set(ref)
    for s in ref:
        assert round(got[s] * 1e8) == round(ref[s] * 1e8), (
            s, got[s], ref[s]
        )


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_micro_rounding_margin(sf_dir):
    """At scale 1e8 every fixture rank is an exact integer (the rank
    denominators divide 1e8), so the rounding-boundary distance is the
    maximum 0.5 — ~6 orders of magnitude above engine summation drift.
    1e6 was unsafe (0.1177875 * 1e6 lands exactly on .5)."""
    for s, r in _reference_pagerank(sf_dir).items():
        frac = abs((r * 1e8) % 1.0 - 0.5)
        assert frac > 0.4, (s, r, frac)


def test_ranks_sum_to_one(spark):
    from paddleocr_spark.functions.webgraph import host_pagerank

    total = sum(
        r["rank"] for r in host_pagerank(spark, SF_SMALL).collect()
    )
    assert abs(total - 1.0) < 1e-9
