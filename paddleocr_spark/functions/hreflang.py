"""hreflang translation-cluster discovery.

Multilingual sites annotate language variants of one logical article
with `<link rel="alternate" hreflang="xx" href="...">`; a curation
pipeline clusters those variants so (a) bitext mining
(`functions/curation.py bitext`) gets candidate pairs for free and
(b) per-language corpus mixes count each ARTICLE once, not once per
translation. Real-world annotation is sloppy — pages frequently list
only some alternates — so the clusters must be closed over the link
graph, not read off a single page's tags.

Fixture: article a = doc_id div 3, language = (en, de, fr)[doc_id % 3].
Annotation is deliberately sloppy in the common real pattern: the en
page lists de+fr, but de and fr each list ONLY en — so the graph is a
2-hop star and per-page tag reading gets fr's cluster WRONG (fr sees
only en; the cluster minimum is the de URL). Tail groups are truncated
(missing fr, or de+fr), so dangling hreflang targets (en advertising a
fr page that was never crawled) are exercised corpus-wide.

Spark shape: extract alternates with one JVM regexp_extract_all over
the page head (no Python), symmetrize to edges, then TWO statically
unrolled min-label propagation rounds — hreflang graphs have
protocol-tiny diameter (every page lists at least the x-default/en
hub, so the graph is a star of diameter 2; contrast dedup_clusters,
whose unbounded-diameter input needs the dynamic pointer-jump loop).
Each round is one equi-join + groupBy(min) on the url key; dangling
targets drop out of the inner join exactly like uncrawled pages.

Oracle: closed-form per-article arithmetic (min present language is
'de' < 'en' < 'fr', lexicographic on both the lang code and the URL
since the URL prefix is shared) — the DuckDB twin never walks edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

_ROUNDS = 2  # star diameter: leaf -> hub -> cluster minimum

_HREF_RE = r'hreflang="[a-z]+" href="([^"]+)"'


def _fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, lang_code, html) hreflang fixture pages."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    art = F.expr("doc_id div 3")
    lg = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )

    def url_of(lang_col, art_col):
        return F.concat(
            F.lit("https://www.example.test/"),
            lang_col,
            F.lit("/a/"),
            art_col.cast("string"),
        )

    def alt(lang_lit):
        return F.concat(
            F.lit('<link rel="alternate" hreflang="'),
            F.lit(lang_lit),
            F.lit('" href="'),
            url_of(F.lit(lang_lit), art),
            F.lit('">'),
        )

    # sloppy annotation: en lists de+fr; de and fr list only en
    html = F.concat(
        F.lit('<meta charset="utf-8">'),
        F.when(lg == "en", F.concat(alt("de"), alt("fr"))).otherwise(
            alt("en")
        ),
    )
    return docs.select(
        url_of(lg, art).alias("url"),
        lg.alias("lang_code"),
        html.alias("html"),
    )


def hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster, n_pages, langs) — one row per translation cluster;
    cluster = the minimum member URL, langs = sorted '-'-joined
    language codes of the members."""
    pages = _fixture(spark, sf_dir)
    alts = F.expr(
        f"regexp_extract_all(html, '{_HREF_RE}', 1)"
    )
    p = pages.select("url", "lang_code", alts.alias("alts"))
    edges = (
        p.select("url", F.explode("alts").alias("other"))
        .filter(F.col("other") != F.col("url"))
    )
    # symmetrize: hreflang intent is bidirectional even when only one
    # side carries the tag
    sym = edges.union(
        edges.select(F.col("other").alias("url"), F.col("url").alias("other"))
    ).distinct()
    labels = p.select("url", "lang_code", F.col("url").alias("label"))
    for _ in range(_ROUNDS):
        nbr = (
            sym.join(
                labels.select(
                    F.col("url").alias("nu"), F.col("label").alias("nl")
                ),
                sym["other"] == F.col("nu"),
                "inner",  # dangling targets (uncrawled pages) drop out
            )
            .groupBy("url")
            .agg(F.min("nl").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, "url", "left")
            .select(
                "url",
                "lang_code",
                F.least(
                    "label", F.coalesce("nbr_min", "label")
                ).alias("label"),
            )
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.array_join(
                F.array_sort(F.collect_list("lang_code")), "-"
            ).alias("langs"),
        )
        .select(F.col("label").alias("cluster"), "n_pages", "langs")
    )


def hreflang_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='hreflang', k=cluster url, v=n_pages|langs)."""
    return hreflang_clusters(spark, sf_dir).select(
        F.lit("hreflang").alias("op"),
        F.col("cluster").alias("k"),
        F.concat_ws("|", "n_pages", "langs").alias("v"),
    )


HREFLANG_SQL = """
WITH d AS (
  SELECT doc_id, doc_id // 3 AS art,
         CASE CAST(doc_id % 3 AS int)
           WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lg
  FROM documents)
SELECT 'https://www.example.test/' || min(lg) || '/a/'
         || CAST(art AS string) AS cluster,
       CAST(count(*) AS bigint) AS n_pages,
       string_agg(lg, '-' ORDER BY lg) AS langs
FROM d
GROUP BY art
ORDER BY cluster
"""
