"""Host-reputation scoring and URL query-parameter significance mining.

Two corpus-level URL analytics a Common-Crawl-scale curation stack
runs between extraction and dedup:

- `host_reputation`: per-host quality score with Bayesian shrinkage
  toward the corpus mean (score = (sum_q + K*global_mean) / (n + K),
  K = 20) — the domain-prior signal RefinedWeb/CCNet-style pipelines
  use to keep low-volume hosts from dominating on a handful of lucky
  pages. The per-doc quality surrogate here is text length; the
  production scorer swaps in the quality-classifier output
  (functions/curation.py) on the same shape. The shrunk score is
  computed in EXACT integer arithmetic — score_milli =
  (1000 * (sum_q*G_n + K*G_sum)) DIV (G_n*(n+K)) — so no float ever
  reaches the oracle compare. (bigint is ample at bench scale; a
  10^12-doc run promotes the numerator to decimal(38,0), a type
  change, not an algorithm change.)
- `url_params`: learns which query-parameter KEYS are tracking
  parameters (removable before canonical dedup) versus
  content-bearing. Classic rule: key k is tracking iff for every
  group of URLs identical after REMOVING k, all members share one
  content hash (max distinct contents per group == 1). The Spark side
  genuinely parses the URL (parse_url QUERY, pair split/filter/
  rebuild); the fixture's params (page = content-bearing, sid/ref =
  tracking; ref present only on even doc_ids) are closed-form in
  doc_id, so the DuckDB twin rebuilds the exploded (key, base,
  content) frame arithmetically and never needs a URL parser.

Scale shape: `host_reputation` is one map-side-combined groupBy plus a
broadcast 1-row global frame. `url_params` explodes to ~#params rows
per doc (bounded small) and runs two partial-agg groupBys keyed on
(param) and (param, base-url); per-key cardinality is the number of
distinct DOMAIN parameter names — thousands, never corpus-sized — so
the final aggregate is tiny and the heavy frames stay map-side
combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

_K = 20  # shrinkage pseudo-count


# ------------------------------------------------------------ host reputation


def host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, n_docs, sum_q, score_milli) — shrunk per-host quality
    via exact integer arithmetic (module docstring)."""
    from paddleocr_spark.functions.weburl import messy_url_expr, url_host

    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    d = docs.select(
        url_host(messy_url_expr()).alias("host"),
        F.length("text").cast("long").alias("q"),
    )
    per_host = d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q").alias("sum_q"),
    )
    glob = d.agg(
        F.count(F.lit(1)).cast("long").alias("gn"),
        F.sum("q").alias("gsum"),
    )
    return (
        per_host.crossJoin(F.broadcast(glob))
        .select(
            "host",
            "n_docs",
            "sum_q",
            F.expr(
                f"(1000 * (sum_q * gn + {_K} * gsum))"
                f" div (gn * (n_docs + {_K}))"
            ).alias("score_milli"),
        )
    )


def host_reputation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='host_reputation', k=host, v=n|sum_q|score_milli)."""
    return host_reputation(spark, sf_dir).select(
        F.lit("host_reputation").alias("op"),
        F.col("host").alias("k"),
        F.concat_ws("|", "n_docs", "sum_q", "score_milli").alias("v"),
    )


HOST_REPUTATION_SQL = f"""
WITH d AS (
  SELECT lower(source) || '.example.test' AS host,
         CAST(length(text) AS bigint) AS q
  FROM documents),
h AS (
  SELECT host, CAST(count(*) AS bigint) AS n_docs,
         CAST(sum(q) AS bigint) AS sum_q
  FROM d GROUP BY host),
g AS (
  SELECT CAST(count(*) AS bigint) AS gn, CAST(sum(q) AS bigint) AS gsum
  FROM d)
SELECT host, n_docs, sum_q,
       (1000 * (sum_q * gn + {_K} * gsum)) // (gn * (n_docs + {_K}))
         AS score_milli
FROM h, g
ORDER BY host
"""


# ----------------------------------------------------------- url param mining

# Fixture URL: path id doc_id%5, params page=doc_id%4 (content-bearing:
# the content hash depends on it), sid='s'||doc_id%3 (session id:
# tracking), ref='feed' on even doc_ids only (tracking, and exercises
# presence-optional keys). Content = md5('c-' || path || '-' || page).
PARAM_URL_EXPR = (
    "'https://news.example.test/p/' || CAST(doc_id % 5 AS string)"
    " || '?page=' || CAST(doc_id % 4 AS string)"
    " || '&sid=s' || CAST(doc_id % 3 AS string)"
    " || CASE WHEN doc_id % 2 = 0 THEN '&ref=feed' ELSE '' END"
)
PARAM_CONTENT_EXPR = (
    "md5('c-' || CAST(doc_id % 5 AS string) || '-'"
    " || CAST(doc_id % 4 AS string))"
)


def url_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(param, n_urls, n_vals, max_group_contents, is_tracking) — one
    row per query-parameter key; the Spark side parses the URLs for
    real (parse_url + pair split/filter/rebuild)."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    url = F.expr(PARAM_URL_EXPR)
    content = F.expr(PARAM_CONTENT_EXPR)
    pairs = F.split(F.parse_url(url, F.lit("QUERY")), "&")
    base0 = F.split(url, r"\?").getItem(0)
    e = (
        docs.select(
            url.alias("url"),
            content.alias("content"),
            base0.alias("base0"),
            pairs.alias("pairs"),
            F.explode(pairs).alias("pair"),
        )
        .select(
            F.split("pair", "=").getItem(0).alias("param"),
            F.split("pair", "=").getItem(1).alias("val"),
            # the URL with THIS key removed, other pairs kept in order
            F.concat(
                F.col("base0"),
                F.lit("?"),
                F.array_join(
                    F.filter(
                        "pairs",
                        lambda p: F.split(p, "=").getItem(0)
                        != F.split(F.col("pair"), "=").getItem(0),
                    ),
                    "&",
                ),
            ).alias("base"),
            "content",
        )
    )
    per_key = e.groupBy("param").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("val").cast("long").alias("n_vals"),
    )
    per_base = (
        e.groupBy("param", "base")
        .agg(F.countDistinct("content").cast("long").alias("nd"))
        .groupBy("param")
        .agg(F.max("nd").alias("max_group_contents"))
    )
    return (
        per_key.join(per_base, "param")
        .select(
            "param",
            "n_urls",
            "n_vals",
            "max_group_contents",
            (F.col("max_group_contents") == 1).cast("int").alias(
                "is_tracking"
            ),
        )
    )


def url_params_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='url_params', k=param, v=n_urls|n_vals|max|is_tracking)."""
    return url_params(spark, sf_dir).select(
        F.lit("url_params").alias("op"),
        F.col("param").alias("k"),
        F.concat_ws(
            "|", "n_urls", "n_vals", "max_group_contents", "is_tracking"
        ).alias("v"),
    )


# The DuckDB twin rebuilds the exploded (param, base, val, content)
# frame closed-form (pair order in `base` matches the Spark rebuild:
# page, sid, ref as constructed) and runs the same two aggregations.
URL_PARAMS_SQL = """
WITH d AS (
  SELECT doc_id,
         'https://news.example.test/p/' || CAST(doc_id % 5 AS string)
           AS path,
         CAST(doc_id % 4 AS string) AS page,
         's' || CAST(doc_id % 3 AS string) AS sid,
         doc_id % 2 = 0 AS has_ref,
         md5('c-' || CAST(doc_id % 5 AS string) || '-'
             || CAST(doc_id % 4 AS string)) AS content
  FROM documents),
e AS (
  SELECT 'page' AS param, page AS val,
         path || '?' || 'sid=' || sid
           || CASE WHEN has_ref THEN '&ref=feed' ELSE '' END AS base,
         content
  FROM d
  UNION ALL
  SELECT 'sid', sid,
         path || '?' || 'page=' || page
           || CASE WHEN has_ref THEN '&ref=feed' ELSE '' END,
         content
  FROM d
  UNION ALL
  SELECT 'ref', 'feed',
         path || '?' || 'page=' || page || '&sid=' || sid,
         content
  FROM d WHERE has_ref),
per_key AS (
  SELECT param, CAST(count(*) AS bigint) AS n_urls,
         CAST(count(DISTINCT val) AS bigint) AS n_vals
  FROM e GROUP BY param),
per_base AS (
  SELECT param, CAST(max(nd) AS bigint) AS max_group_contents
  FROM (SELECT param, base, count(DISTINCT content) AS nd
        FROM e GROUP BY param, base)
  GROUP BY param)
SELECT k.param, k.n_urls, k.n_vals, b.max_group_contents,
       CAST(b.max_group_contents = 1 AS int) AS is_tracking
FROM per_key k JOIN per_base b USING (param)
ORDER BY param
"""
