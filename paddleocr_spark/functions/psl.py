"""Public-suffix-list registrable-domain extraction (eTLD+1).

Host strings are the WRONG grouping key for politeness, dedup budgets,
and domain-level quality stats: `a.blog.example.co.uk` and
`b.shop.example.co.uk` are one site, while `alice.github.io` and
`bob.github.io` are two unrelated ones. The standard answer is the
Public Suffix List algorithm (publicsuffix.org — what browsers use for
cookie scoping and what CCNet/Dolma use for domain grouping):

 1. among rules whose labels match a suffix of the host (a `*` label
    matches exactly one label), an EXCEPTION rule (`!www.ck`) wins and
    its public suffix is the rule minus its leftmost label;
 2. otherwise the matching rule with the MOST labels wins;
 3. no match falls back to the default rule `*` (public suffix = the
    rightmost label);
 4. registrable domain = public suffix plus one more label ('' when
    the host IS a public suffix).

The embedded rule set is a deterministic SUBSET covering every rule
class (plain multi-label, wildcard, exception) — the full ~9k-line PSL
swaps in as a bigger broadcast table at the marked constant, nothing
else changes.

Plan shape at 10^12 docs: candidate suffixes are generated per host in
ONE JVM array expression (<= 2*K strings), exploded, and matched
against the BROADCAST rule table; the only corpus-wide exchange is the
per-doc groupBy that folds candidate matches back. A standing pipeline
runs this once per distinct host (a census-sized frame), then joins
the registrable domain back broadcast.

Reference parity: the reference has no URL layer (its inputs are image
paths); this is part of the web-pipeline extension mandated by the
task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

# (rule, n_labels, is_exception) — rule strings in PSL literal form
# ('*' labels kept, '!' stripped into the flag). FULL-PSL swap point.
PSL_RULES: list[tuple[str, int, bool]] = [
    ("com", 1, False),
    ("org", 1, False),
    ("net", 1, False),
    ("test", 1, False),
    ("de", 1, False),
    ("jp", 1, False),
    ("ne.jp", 2, False),
    ("uk", 1, False),
    ("co.uk", 2, False),
    ("org.uk", 2, False),
    ("au", 1, False),
    ("com.au", 2, False),
    ("io", 1, False),
    ("github.io", 2, False),
    ("*.ck", 2, False),
    ("!www.ck", 2, True),
]

_PSL_MAX_LABELS = 4  # longest rule in the table (candidate bound)

_LABS = "split(host, '\\\\.')"

# candidate rule keys per host: for each suffix length k, the exact
# suffix string and (k >= 2) its wildcard form with the leftmost label
# starred — one JVM array pass, <= 2*K strings per host
_CANDS = f"""
flatten(transform(sequence(1, least(size({_LABS}), {_PSL_MAX_LABELS})), k ->
  if(k = 1,
     array(concat_ws('.', slice({_LABS}, size({_LABS}) - k + 1, k))),
     array(concat_ws('.', slice({_LABS}, size({_LABS}) - k + 1, k)),
           concat('*.',
                  concat_ws('.', slice({_LABS}, size({_LABS}) - k + 2,
                                       k - 1)))))))
"""


def _rules_df(spark: SparkSession) -> DataFrame:
    rows = [
        (r.lstrip("!"), n, exc) for r, n, exc in PSL_RULES
    ]
    return spark.createDataFrame(
        rows, "rule string, rule_labels int, is_exc boolean"
    )


def registrable_domains(
    spark: SparkSession, hosts: DataFrame
) -> DataFrame:
    """hosts(doc_id, host) -> (doc_id, host, public_suffix,
    registrable): the PSL algorithm over the broadcast rule table."""
    cands = hosts.select(
        "doc_id", "host", F.explode(F.expr(_CANDS)).alias("cand")
    )
    matched = cands.join(
        F.broadcast(_rules_df(spark)),
        cands["cand"] == F.col("rule"),
        "left",
    )
    agg = matched.groupBy("doc_id", "host").agg(
        F.max(F.when(F.col("is_exc"), F.col("rule_labels"))).alias("exc_n"),
        F.max(
            F.when(~F.col("is_exc"), F.col("rule_labels"))
        ).alias("norm_n"),
    )
    psl_n = F.coalesce(
        F.col("exc_n") - 1, F.col("norm_n"), F.lit(1)
    )
    n = F.expr(f"size({_LABS})")
    p = "coalesce(exc_n - 1, norm_n, 1)"
    suffix = (
        f"concat_ws('.', slice({_LABS}, size({_LABS}) - ({p}) + 1, {p}))"
    )
    reg = (
        f"concat_ws('.', slice({_LABS}, size({_LABS}) - ({p}), ({p}) + 1))"
    )
    return agg.select(
        "doc_id",
        "host",
        F.expr(suffix).alias("public_suffix"),
        F.when(n >= psl_n + 1, F.expr(reg))
        .otherwise(F.lit(""))
        .alias("registrable"),
    )


def _fixture_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic host per doc covering every rule class: plain TLD,
    multi-label suffix, platform suffix (github.io), wildcard (*.ck),
    exception (!www.ck), and an unlisted TLD (default rule)."""
    m = F.col("doc_id") % 6
    s = (F.col("doc_id") % 50).cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("www.site"), s, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("blog.site"), s, F.lit(".co.uk")))
        .when(m == 2, F.concat(F.lit("user"), s, F.lit(".github.io")))
        .when(m == 3, F.concat(F.lit("a.shop"), s, F.lit(".ck")))
        .when(m == 4, F.lit("www.ck"))
        .otherwise(F.concat(F.lit("x.host"), s, F.lit(".unlisted")))
    )
    return scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", host.alias("host")
    )


def psl_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host, public_suffix, registrable) over the fixture
    hosts — the REAL algorithm; the oracle re-derives the expected
    values closed-form per parity branch."""
    return registrable_domains(spark, _fixture_hosts(spark, sf_dir))


def psl_rows(
    spark: SparkSession, sf_dir: str, domains: DataFrame | None = None
) -> DataFrame:
    """(op='psl', k=doc_id, v=host|public_suffix|registrable).
    `domains` lets the suite hand in one shared checkpointed
    psl_domains frame (the split branch consumes the same join)."""
    if domains is None:
        domains = psl_domains(spark, sf_dir)
    return domains.select(
        F.lit("psl").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "host", "public_suffix", "registrable").alias("v"),
    )


# Closed-form twin: the expected outcome of each rule class, per parity
# branch — exception beats wildcard on www.ck, wildcard consumes one
# label on *.ck, github.io is a 2-label suffix, unlisted falls to the
# default rule.
PSL_SQL = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'www.site' || (doc_id % 50) || '.com'
         WHEN 1 THEN 'blog.site' || (doc_id % 50) || '.co.uk'
         WHEN 2 THEN 'user' || (doc_id % 50) || '.github.io'
         WHEN 3 THEN 'a.shop' || (doc_id % 50) || '.ck'
         WHEN 4 THEN 'www.ck'
         ELSE 'x.host' || (doc_id % 50) || '.unlisted'
       END AS host,
       CASE doc_id % 6
         WHEN 0 THEN 'com'
         WHEN 1 THEN 'co.uk'
         WHEN 2 THEN 'github.io'
         WHEN 3 THEN 'shop' || (doc_id % 50) || '.ck'
         WHEN 4 THEN 'ck'
         ELSE 'unlisted'
       END AS public_suffix,
       CASE doc_id % 6
         WHEN 0 THEN 'site' || (doc_id % 50) || '.com'
         WHEN 1 THEN 'site' || (doc_id % 50) || '.co.uk'
         WHEN 2 THEN 'user' || (doc_id % 50) || '.github.io'
         WHEN 3 THEN 'a.shop' || (doc_id % 50) || '.ck'
         WHEN 4 THEN 'www.ck'
         ELSE 'host' || (doc_id % 50) || '.unlisted'
       END AS registrable
FROM documents
ORDER BY doc_id
"""
