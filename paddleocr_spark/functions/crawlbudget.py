"""Crawl-budget apportionment — splitting a fixed recrawl budget B
across hosts PROPORTIONALLY to their page counts, exactly. Naive
rounding either over- or under-spends the budget; crawler schedulers
use the Hamilton / largest-remainder method (the House-seats
algorithm): base_h = floor(B * n_h / N), then the leftover
B - sum(base) goes one each to the hosts with the largest remainders
(ties to the lexicographically smaller host, so the answer is
total-ordered). The politeness twin of `crawl_schedule`: that op
orders WITHIN a host's fetch slots; this one decides HOW MANY slots
each host gets.

All exact integers (B * n_h <= 10^15 at 10^12 docs with B = 10^3 —
bigint-safe); one host-bounded census groupBy + windows over the
census frame only. Sum-preservation (sum(alloc) == B exactly) is the
operator's defining invariant and is pinned in pytest and visible to
the gate through the per-host rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

CRAWL_BUDGET = 1000


def crawl_budget_rows(
    spark: SparkSession, sf_dir: str, budget: int = CRAWL_BUDGET
) -> DataFrame:
    """(op='crawl_budget', k=host, v=n|base|rem|alloc)."""
    # weight = per-host CHAR VOLUME, not page count: the fixture's
    # pages are uniform per host (every remainder would be 0 and the
    # largest-remainder path would never run); byte volume is also the
    # truer recrawl-cost proxy
    census = (
        scan_parquet(spark, f"{sf_dir}/documents.parquet")
        .groupBy(F.col("source").alias("host"))
        .agg(F.sum(F.length("text")).cast("long").alias("n"))
    )
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrank = Window.orderBy(F.desc("rem"), F.asc("host"))
    out = (
        census.withColumn("total", F.sum("n").over(whole))
        .select(
            "host",
            "n",
            F.expr(f"({budget}L * n) div total").alias("base"),
            F.expr(f"({budget}L * n) % total").alias("rem"),
            "total",
        )
        .withColumn(
            "leftover",
            F.lit(budget) - F.sum("base").over(whole),
        )
        .withColumn("rk", F.row_number().over(wrank))
        .select(
            "host",
            "n",
            "base",
            "rem",
            (
                F.col("base")
                + (F.col("rk") <= F.col("leftover")).cast("long")
            ).alias("alloc"),
        )
    )
    return out.select(
        F.lit("crawl_budget").alias("op"),
        F.col("host").alias("k"),
        F.concat_ws("|", "n", "base", "rem", "alloc").alias("v"),
    )


CRAWL_BUDGET_SQL = f"""
WITH census AS (
  SELECT source AS host, CAST(sum(length(text)) AS bigint) AS n
  FROM documents GROUP BY 1),
q AS (
  SELECT host, n,
         ({CRAWL_BUDGET} * n) // sum(n) OVER () AS base,
         ({CRAWL_BUDGET} * n) % sum(n) OVER () AS rem
  FROM census),
r AS (
  SELECT *, {CRAWL_BUDGET} - sum(base) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, host ASC) AS rk
  FROM q)
SELECT 'crawl_budget' AS op, host AS k,
       CAST(n AS varchar) || '|' || CAST(base AS varchar) || '|' ||
       CAST(rem AS varchar) || '|' ||
       CAST(base + CAST(rk <= leftover AS int) AS varchar) AS v
FROM r
ORDER BY k
"""
