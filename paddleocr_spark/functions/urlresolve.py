"""RFC 3986 relative-reference resolution — the URL algebra every
link-graph stage needs (frontier targets, redirect chains, sitemap
locs and srcset candidates all arrive as relative references against
a page's base URL).

Implements reference resolution (RFC 3986 §5.2.2) with the
remove_dot_segments algorithm (§5.2.4) ENTIRELY as JVM Catalyst
expressions — regexp component split, higher-order `aggregate` fold
for the segment stack, zero Python, zero shuffles. The fold is the
textbook stack machine: '' and '.' segments vanish, '..' pops (clamped
at root), everything else pushes; a trailing '', '.' or '..' keeps the
directory slash. Fragments are STRIPPED before resolution (crawl
normalization — the frontier treats #-variants as one resource), so a
fragment-only reference resolves to the base itself, like the empty
reference.

Case order (§5.2.2):
  ref has a scheme            -> ref as-is (path dot-normalized)
  ref starts '//'             -> base scheme + ref
  ref starts '/'              -> base scheme+authority + normalized ref
  ref starts '?'              -> base minus query + ref
  ref == ''                   -> base
  else                        -> merge(base directory, ref), normalize

Oracle: refs are synthesized per doc by ONE portable SQL expression
cycling 12 reference forms (absolute, protocol-relative, rooted,
bare/dir relative, single/over-popping '..', './', query-only,
fragment-only, empty, trailing-slash, dot-heavy); the expected
resolution for each form is CLOSED-FORM doc_id arithmetic — the
oracle never replays the algorithm, it states each case's answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _remove_dot_segments(path):
    """RFC 3986 §5.2.4 over an absolute path Column, as one aggregate
    fold. Only '.' and '..' are special — EMPTY segments (double
    slashes, '/a//b') are ordinary segments and survive, exactly as
    the textual algorithm keeps them (found by the hypothesis sweep
    against urljoin: the collapse-empties shortcut breaks '//').
    The fold runs over the INTERIOR segments (leading '' is the
    absolute-path marker, the final segment doubles as the
    trailing-slash signal and is applied separately)."""
    segs = F.split(path, "/")
    interior = F.slice(
        segs, F.lit(2), F.greatest(F.size(segs) - 2, F.lit(0))
    )
    pop = lambda acc: F.slice(  # noqa: E731
        acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))
    )
    stack = F.aggregate(
        interior,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..", pop(acc))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    last = F.element_at(segs, -1)
    stack = (
        F.when(last == "..", pop(stack))
        .when(last.isin("", "."), stack)
        .otherwise(F.concat(stack, F.array(last)))
    )
    trailing = F.when(
        last.isin("", ".", ".."), F.lit("/")
    ).otherwise(F.lit(""))
    return (
        F.when(path == "", F.lit(""))
        .when(F.size(stack) == 0, F.lit("/"))
        .otherwise(
            F.concat(F.lit("/"), F.array_join(stack, "/"), trailing)
        )
    )


def resolve_url(base, ref):
    """resolve(base, ref) per the module docstring; both Columns.
    base must be an absolute http(s) URL with authority."""
    ref = F.regexp_replace(ref, "#.*$", "")  # strip fragment (crawl norm)
    b_scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    b_auth = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    b_path = F.regexp_extract(
        base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    root = F.concat(b_scheme, F.lit("://"), b_auth)
    b_no_query = F.regexp_replace(base, r"[?#].*$", "")

    r_path = F.regexp_replace(ref, r"[?#].*$", "")
    r_query = F.regexp_extract(ref, r"(\?[^#]*)", 1)
    # base directory: path up to and including the last '/'
    b_dir = F.regexp_replace(b_path, "[^/]*$", "")

    has_scheme = ref.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    return (
        F.when(ref == "", b_no_query)
        .when(
            has_scheme,
            F.concat(
                F.regexp_extract(ref, r"^([^:]*://[^/?#]*)", 1),
                _remove_dot_segments(
                    F.regexp_extract(ref, r"^[^:]*://[^/?#]*([^?#]*)", 1)
                ),
                r_query,
            ),
        )
        .when(
            ref.startswith("//"),
            F.concat(
                b_scheme,
                F.lit("://"),
                F.regexp_extract(ref, r"^//([^/?#]*)", 1),
                _remove_dot_segments(
                    F.regexp_extract(ref, r"^//[^/?#]*([^?#]*)", 1)
                ),
                r_query,
            ),
        )
        .when(
            ref.startswith("/"),
            F.concat(root, _remove_dot_segments(r_path), r_query),
        )
        .when(ref.startswith("?"), F.concat(b_no_query, ref))
        .otherwise(
            F.concat(
                root,
                _remove_dot_segments(F.concat(b_dir, r_path)),
                r_query,
            )
        )
    )


# ONE portable snippet per engine builds (base, ref): base is a
# two-directory page URL, ref cycles the 12 forms by doc_id % 12.
BASE_EXPR = (
    "'https://' || source || '.example.test/a' || "
    "CAST(doc_id % 3 AS string) || '/b' || CAST(doc_id % 5 AS string) "
    "|| '/page' || CAST(doc_id AS string)"
)
REF_EXPR = """
CASE CAST(doc_id % 12 AS int)
  WHEN 0 THEN 'https://other.example.test/x/y' || CAST(doc_id % 4 AS string)
  WHEN 1 THEN '//cdn' || CAST(doc_id % 4 AS string) || '.example.test/lib.js'
  WHEN 2 THEN '/r/s' || CAST(doc_id % 7 AS string)
  WHEN 3 THEN 'img' || CAST(doc_id % 9 AS string) || '.png'
  WHEN 4 THEN 'sub/dir' || CAST(doc_id % 5 AS string) || '/f'
  WHEN 5 THEN '../up' || CAST(doc_id % 6 AS string)
  WHEN 6 THEN '../../../twice'
  WHEN 7 THEN './here' || CAST(doc_id % 8 AS string)
  WHEN 8 THEN '?q=' || CAST(doc_id % 10 AS string)
  WHEN 9 THEN '#frag' || CAST(doc_id % 5 AS string)
  WHEN 10 THEN ''
  ELSE 'a/./b/../c' || CAST(doc_id % 3 AS string) || '/'
END
"""


def url_resolve_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='url_resolve', k=doc_id, v=ref|resolved) — the general
    resolver over the 12-form fixture."""
    from paddleocr_spark.sources.scan import scan_parquet

    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(BASE_EXPR).alias("base"),
        F.expr(REF_EXPR).alias("ref"),
    )
    return docs.select(
        F.lit("url_resolve").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws(
            "|", "ref", resolve_url(F.col("base"), F.col("ref"))
        ).alias("v"),
    )


# Closed-form twin: each form's answer stated directly (no algorithm
# replay). Case 6 pins the over-pop clamp ('..' past root), case 11
# the dot-heavy normalization WITH trailing slash, case 9+10 the
# fragment-strip == empty-ref equivalence.
URL_RESOLVE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         'https://' || source || '.example.test' AS root,
         '/a' || CAST(doc_id % 3 AS string) || '/b' ||
             CAST(doc_id % 5 AS string) AS dir,
         {BASE_EXPR} AS base,
         {REF_EXPR.strip()} AS ref
  FROM documents)
SELECT 'url_resolve' AS op, CAST(doc_id AS string) AS k,
  ref || '|' ||
  CASE CAST(doc_id % 12 AS int)
    WHEN 0 THEN 'https://other.example.test/x/y' ||
                CAST(doc_id % 4 AS string)
    WHEN 1 THEN 'https://cdn' || CAST(doc_id % 4 AS string) ||
                '.example.test/lib.js'
    WHEN 2 THEN root || '/r/s' || CAST(doc_id % 7 AS string)
    WHEN 3 THEN root || dir || '/img' || CAST(doc_id % 9 AS string)
                || '.png'
    WHEN 4 THEN root || dir || '/sub/dir' ||
                CAST(doc_id % 5 AS string) || '/f'
    WHEN 5 THEN root || '/a' || CAST(doc_id % 3 AS string) || '/up'
                || CAST(doc_id % 6 AS string)
    WHEN 6 THEN root || '/twice'
    WHEN 7 THEN root || dir || '/here' || CAST(doc_id % 8 AS string)
    WHEN 8 THEN base || '?q=' || CAST(doc_id % 10 AS string)
    WHEN 9 THEN base
    WHEN 10 THEN base
    ELSE root || dir || '/a/c' || CAST(doc_id % 3 AS string) || '/'
  END AS v
FROM d
ORDER BY doc_id
"""
