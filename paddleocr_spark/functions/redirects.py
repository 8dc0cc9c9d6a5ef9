"""HTTP redirect-chain resolution over a url->url edge table.

A crawl pipeline's canonical-target step: fetches return 3xx hops, and
every downstream key (dedup, frontier, PageRank, latest-capture) wants
the FINAL url, resolved with the browser rules — follow at most
MAX_HOPS redirects, then give up (ERR_TOO_MANY_REDIRECTS), which also
subsumes cycle detection (a loop can never terminate, so it hits the
cap). No reference counterpart (the reference never touches url graphs);
public-protocol ground like robots_allow.

Scale shape: the resolver is a BOUNDED loop — MAX_HOPS rounds (the
protocol caps redirects, so rounds are a constant, not data-dependent),
each round ONE equi-join of the state frame against the edge table on
the current-node key. The edge table is repartitioned ONCE on src and
every round's join reuses that clustering; the state frame is
localCheckpointed per round (the dedup_clusters lineage discipline —
MAX_HOPS nested joins would otherwise compound the plan). Rows finish
early (done flag) but stay in the frame: a finished row is a null-side
left-join hit, never a recompute.

The fixture graph is closed-form in doc_id (chain length doc_id%4,
cycle back-edge when doc_id%11==0), so the strict oracle needs no
recursive SQL — final node, hop count, and verdict are CASE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from paddleocr_spark.sources.scan import scan_parquet

MAX_HOPS = 8  # browser-grade redirect cap (Chrome 20, curl 50, RFC "should detect")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/documents.parquet")


def _u(d, i):
    """Fixture url for node i of doc d's redirect chain."""
    return F.concat(
        F.lit("https://r.example.test/"),
        d.cast("string"),
        F.lit("/"),
        i.cast("string"),
    )


def redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) fixture edges: doc d carries the chain
    /d/0 -> /d/1 -> ... -> /d/h with h = d%4; docs with d%11==0 and
    h>0 close the loop (/d/h -> /d/0) — a genuine redirect cycle."""
    df = _docs(spark, sf_dir).select(
        "doc_id", (F.col("doc_id") % 4).alias("h")
    )
    d, i = F.col("doc_id"), F.col("i")
    chain = (
        df.where(F.col("h") > 0)  # sequence(0,-1) would DESCEND
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("h") - 1)).alias("i"),
        )
        .select(_u(d, i).alias("src"), _u(d, i + 1).alias("dst"))
    )
    back = (
        df.where((F.col("doc_id") % 11 == 0) & (F.col("h") > 0))
        .select(_u(d, F.col("h")).alias("src"), _u(d, F.lit(0)).alias("dst"))
    )
    return chain.unionByName(back)


def resolve_redirects(
    starts: DataFrame, edges: DataFrame, max_hops: int = MAX_HOPS
) -> DataFrame:
    """starts(url) x edges(src, dst) -> (url, final, hops, status):
    follow edges from each url until a node with no outgoing edge
    (status 'ok') or `max_hops` redirects (status 'too_many' — caps
    both long chains and cycles, exactly the browser behavior)."""
    # A src may carry several Location targets in a real edge table
    # (the same url fetched in different captures): left-joining raw
    # edges would FAN OUT every state row per duplicate and compound
    # round over round (up to branching^max_hops duplicate results).
    # The redirect function must be single-valued — pick the
    # deterministic min(dst) per src (a timestamped table would pick
    # latest-capture upstream instead). The groupBy also IS the one
    # explicit clustering on the join key; all rounds inherit it.
    e = edges.groupBy("src").agg(F.min("dst").alias("dst")).localCheckpoint()
    state = starts.select(
        F.col("url"),
        F.col("url").alias("cur"),
        F.lit(0).alias("hops"),
        F.lit(False).alias("done"),
    )
    for r in range(max_hops):
        # fresh ExprIds for the edge columns each round — the state
        # frame carries the previous round's edge lineage, and joining
        # the raw `e` again would be an ambiguous self-join
        er = e.select(
            F.col("src").alias(f"_src{r}"), F.col("dst").alias(f"_dst{r}")
        )
        nxt = state.join(er, state["cur"] == er[f"_src{r}"], "left")
        stay = state["done"] | er[f"_dst{r}"].isNull()
        state = nxt.select(
            state["url"],
            F.when(stay, state["cur"])
            .otherwise(er[f"_dst{r}"])
            .alias("cur"),
            F.when(stay, state["hops"])
            .otherwise(state["hops"] + 1)
            .alias("hops"),
            stay.alias("done"),
        )
        # checkpoint every 4th round, not every round: the plan only
        # chains linearly (no self-reference blowup like dedup_clusters)
        # so the checkpoint is amortization, not a correctness need —
        # and each eager materialization costs a full job
        if (r + 1) % 4 == 0 and r + 1 < max_hops:
            state = state.localCheckpoint()
    # one final probe: a row that used its last hop to LAND on a
    # terminal is 'ok' (hops == cap but nothing left to follow)
    ef = e.select(F.col("src").alias("_srcF"), F.col("dst").alias("_dstF"))
    final = state.join(ef, state["cur"] == ef["_srcF"], "left").select(
        state["url"],
        state["cur"].alias("final"),
        state["hops"],
        F.when(state["done"] | ef["_dstF"].isNull(), F.lit("ok"))
        .otherwise(F.lit("too_many"))
        .alias("status"),
    )
    return final


def redirect_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='redirects', k=start url, v=final|hops|status) suite row."""
    starts = _docs(spark, sf_dir).select(
        _u(F.col("doc_id"), F.lit(0)).alias("url")
    )
    out = resolve_redirects(starts, redirect_edges(spark, sf_dir))
    return out.select(
        F.lit("redirects").alias("op"),
        F.col("url").alias("k"),
        F.concat_ws("|", "final", "hops", "status").alias("v"),
    )


# Closed-form twin: chains terminate at node h with h hops; cycles of
# length h+1 walk MAX_HOPS steps and stop at node MAX_HOPS % (h+1).
REDIRECTS_SQL = f"""
SELECT 'https://r.example.test/' || doc_id || '/0' AS url,
       CASE WHEN doc_id % 11 = 0 AND doc_id % 4 > 0
            THEN 'https://r.example.test/' || doc_id || '/'
                 || ({MAX_HOPS} % (doc_id % 4 + 1))
            ELSE 'https://r.example.test/' || doc_id || '/'
                 || (doc_id % 4) END AS final,
       CAST(CASE WHEN doc_id % 11 = 0 AND doc_id % 4 > 0
                 THEN {MAX_HOPS} ELSE doc_id % 4 END AS int) AS hops,
       CASE WHEN doc_id % 11 = 0 AND doc_id % 4 > 0
            THEN 'too_many' ELSE 'ok' END AS status
FROM documents
ORDER BY url
"""
