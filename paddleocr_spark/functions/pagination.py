"""Multi-page article stitching (rel=next pagination chains).

Web articles are frequently split across `?page=N` URLs linked by
`<link rel="next" href="...">`; a training corpus wants ONE logical
document per article, stitched in reading order, not N fragments that
dedup then has to reconcile. This operator discovers the chains from
the pages' own markup and stitches them — the multi-page analogue of
the reference's page/doc assembly (`ppstructure/predict_system.py`
page loop assembles per-PDF pages the same way; here the "next page"
pointer lives in HTML instead of a PDF page index).

Algorithm (all DataFrame, no driver iteration):
1. extract each page's next-URL from its HTML head fragment
   (`regexp_extract` on the rel="next" link);
2. invert to prev-edges and initialize each page's state to
   (ancestor = its prev page or itself, distance = 1 or 0);
3. POINTER DOUBLING, statically unrolled: each round joins the state
   to itself on (my ancestor == your page) and composes
   (ancestor := your ancestor, distance += your distance). After r
   rounds every page ≤ 2^r hops from its chain head has resolved —
   _ROUNDS = 3 covers chains up to 8 pages, and real pagination
   depth is protocol-bounded like redirect hops (SCALE.md), so the
   unroll depth is a constant, not a data-dependent loop. Extra
   rounds are idempotent (a resolved head contributes distance 0).
4. group by head: sort pages by resolved distance, join with
   newline, emit (head_url, n_pages, md5(stitched)).

Scale shape: the unrolled doubling is `_ROUNDS` self-equi-joins on the
url key — same shuffle shape every round, AQE-friendly, no lineage
blowup (static plan depth). The final stitch is one groupBy with a
bounded array per key (chain length), sorted JVM-side via sort_array.

Fixture: article id = doc_id div 4, chain length L = (art % 4) + 1;
parts 0..L-1 form the chain (part p links next to part p+1 for
p < L-1), parts >= L are standalone single-page articles — so every
chain length 1..4, mid-chain pages, tails, and singletons all appear.
The DuckDB twin is closed-form (CASE over L builds the expected
stitched text per head); it never walks the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

_ROUNDS = 3  # resolves chains up to 2^3 = 8 pages; fixture max is 4

_NEXT_RE = 'rel="next" href="([^"]+)"'


def _url(art, pageno):
    return F.concat(
        F.lit("https://art.test/a/"),
        art.cast("string"),
        F.lit("?page="),
        pageno.cast("string"),
    )


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the paginated fixture pages: (url, html, text)."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    art = F.expr("doc_id div 4")
    part = F.col("doc_id") % 4
    chain_len = (art % 4) + 1
    pageno = part + 1
    has_next = part < (chain_len - 1)
    text = F.concat(
        F.lit("Article "),
        art.cast("string"),
        F.lit(" section "),
        pageno.cast("string"),
        F.lit("."),
    )
    html = F.concat(
        F.lit('<meta charset="utf-8">'),
        F.when(
            has_next,
            F.concat(
                F.lit('<link rel="next" href="'),
                _url(art, pageno + 1),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        _url(art, pageno).alias("url"),
        html.alias("html"),
        text.alias("text"),
    )


def stitch_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(head_url, n_pages, stitched_md5) — one row per logical
    article, discovered from the pages' rel="next" markup."""
    pages = _pages(spark, sf_dir)
    nxt = F.regexp_extract("html", _NEXT_RE, 1)
    p = pages.select("url", "text", nxt.alias("next_url"))
    # prev-edge: the page u that declares rel=next -> v gives prev(v)=u
    prev = (
        p.filter(F.col("next_url") != "")
        .select(
            F.col("next_url").alias("u"), F.col("url").alias("prev_url")
        )
    )
    state = (
        p.select("url", "text")
        .join(prev, p["url"] == prev["u"], "left")
        .select(
            "url",
            "text",
            F.coalesce("prev_url", "url").alias("anc"),
            F.when(F.col("prev_url").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("d"),
        )
    )
    for _ in range(_ROUNDS):
        hop = state.select(
            F.col("url").alias("ju"),
            F.col("anc").alias("janc"),
            F.col("d").alias("jd"),
        )
        state = (
            state.join(hop, state["anc"] == hop["ju"], "inner")
            .select(
                "url",
                "text",
                F.col("janc").alias("anc"),
                (F.col("d") + F.col("jd")).alias("d"),
            )
        )
    return (
        state.groupBy("anc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("d", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("stitched"),
        )
        .select(
            F.col("anc").alias("head_url"),
            "n_pages",
            F.md5("stitched").alias("stitched_md5"),
        )
    )


def pagination_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='pagination', k=head_url, v=n_pages|stitched_md5)."""
    return stitch_pagination(spark, sf_dir).select(
        F.lit("pagination").alias("op"),
        F.col("head_url").alias("k"),
        F.concat_ws("|", "n_pages", "stitched_md5").alias("v"),
    )


def _txt(i: str) -> str:
    """Closed-form page text expression for the oracle (i = a SQL
    string expression for the 1-based page number)."""
    return (
        "'Article ' || CAST(art AS string) || ' section ' || "
        + i
        + " || '.'"
    )


PAGINATION_SQL = f"""
WITH d AS (
  SELECT doc_id, doc_id // 4 AS art, doc_id % 4 AS part,
         (doc_id // 4) % 4 + 1 AS L
  FROM documents),
heads AS (
  -- chain heads: part 0 stitches sections 1..L
  SELECT art, 1 AS pageno, CAST(L AS bigint) AS n_pages,
         CASE L
           WHEN 1 THEN {_txt("'1'")}
           WHEN 2 THEN {_txt("'1'")} || chr(10) || {_txt("'2'")}
           WHEN 3 THEN {_txt("'1'")} || chr(10) || {_txt("'2'")}
                       || chr(10) || {_txt("'3'")}
           ELSE {_txt("'1'")} || chr(10) || {_txt("'2'")}
                || chr(10) || {_txt("'3'")} || chr(10) || {_txt("'4'")}
         END AS stitched
  FROM d WHERE part = 0
  UNION ALL
  -- parts beyond the chain length: standalone single-page articles
  SELECT art, part + 1, 1, {_txt("CAST(part + 1 AS string)")}
  FROM d WHERE part >= L)
SELECT 'https://art.test/a/' || CAST(art AS string)
         || '?page=' || CAST(pageno AS string) AS head_url,
       n_pages, md5(stitched) AS stitched_md5
FROM heads
ORDER BY head_url
"""
