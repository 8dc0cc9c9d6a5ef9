"""Shared fixture-synthesis contract pieces used by the IC-extractor
query family (fields / names / address / ic_ultimate).

These strings are LOAD-BEARING ORACLE CONTRACTS: the same expression is
rendered into both the Spark fixture and the DuckDB gold SQL, so every
module must use literally this copy — a drifted duplicate desyncs a
fixture from its oracle in a different module with no error at the edit
site (the round-2 review found three identical copies of each).
"""

from __future__ import annotations

# Deterministic IC number from doc_id: 6-2-4 digit groups, zero-padded.
IC_EXPR = (
    "concat(lpad(CAST(doc_id % 900000 + 100000 AS string), 6, '0'), '-',"
    " lpad(CAST(doc_id % 100 AS string), 2, '0'), '-',"
    " lpad(CAST((doc_id * 31) % 10000 AS string), 4, '0'))"
)


def pool_pick(pool: list[str], mult: int, off: int, spark_side: bool) -> str:
    """SQL expression choosing pool[(doc_id*mult + off) % len] — emitted
    for Spark (array/element_at) or DuckDB (list literal, 1-based
    index); both sides must pick the same word for every doc_id."""
    n = len(pool)
    items = ", ".join(f"'{w}'" for w in pool)
    arr = f"array({items})" if spark_side else f"[{items}]"
    idx = f"CAST((doc_id * {mult} + {off}) % {n} AS int) + 1"
    return f"element_at({arr}, {idx})" if spark_side else f"{arr}[{idx}]"
