"""Domain-disjoint train/validation split with a leakage audit — the
standard training-data hygiene step (FineWeb / RedPajama / C4 all hold
out by URL domain, not by document, so near-identical pages from one
site can never straddle the boundary).

Semantics:
 1. Grouping key = the PSL registrable domain (functions/psl.py — the
    same key the politeness and dedup budgets use). Hash the DOMAIN,
    not the doc: every document of one domain lands in the same split
    by construction.
 2. bucket = first md5 byte of the registrable domain mod N_BUCKETS
    (=20), split = 'val' for bucket < VAL_BUCKETS (=1) -> a ~5% target
    holdout. The bucket snippet is ONE portable SQL expression
    evaluated verbatim by Spark SQL and DuckDB (dsir_bucket_snippet
    discipline).
 3. Audit rows, computed RELATIONALLY (not asserted):
    - k='sizes': doc and domain counts per side — the realized split
      ratio (domain-level hashing makes it noisy around 5%; that's the
      point, and the row makes it observable);
    - k='domain_overlap': number of registrable domains with docs in
      BOTH splits — 0 by construction, and the row PROVES it per run;
    - k='leakage': LSH near-dup candidate pairs (functions/dedup.py)
      that cross the split boundary, over the total pair count — the
      contamination pressure from near-identical content on DIFFERENT
      domains (mirrors/scrapes), which domain hashing cannot prevent
      and a careful eval-set builder must decontaminate against
      (the decontaminate op is the per-benchmark version of this).

100 TB shape: the assignment is a pure function of the url's domain —
a narrow broadcast-PSL join + one md5 per doc, no shuffle; sizes /
overlap are one bounded groupBy over #domains; the leakage audit joins
the (doc_a, doc_b) candidate frame to the assignment twice on doc_id —
both sides co-partitioned equi-joins, bounded by the LSH candidate
count, never all-pairs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.functions.dedup import (
    MINHASH_LSH_PAIRS_SQL,
    minhash_lsh_pairs,
)
from paddleocr_spark.functions.psl import PSL_SQL, psl_domains

N_BUCKETS = 20
VAL_BUCKETS = 1


def split_bucket_snippet(col: str) -> str:
    """Domain-hash bucket in 0..N_BUCKETS-1 from the first md5 byte —
    one portable snippet for both engines."""
    return (
        f"((instr('0123456789abcdef', substr(md5({col}), 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substr(md5({col}), 2, 1)) - 1)"
        f" % {N_BUCKETS}"
    )


def split_assignments(
    spark: SparkSession, sf_dir: str, domains: DataFrame | None = None
) -> DataFrame:
    """(doc_id, registrable, bucket, split) — the domain-disjoint
    assignment. `domains` shares the suite's checkpointed psl_domains
    frame with the psl branch (one PSL join, two consumers)."""
    bucket = F.expr(split_bucket_snippet("registrable"))
    if domains is None:
        domains = psl_domains(spark, sf_dir)
    return domains.select(
        "doc_id",
        "registrable",
        bucket.cast("long").alias("bucket"),
        F.when(bucket < VAL_BUCKETS, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def split_rows(
    spark: SparkSession, sf_dir: str, pairs=None, domains=None
) -> DataFrame:
    """(op='split', ...) suite rows: per-doc assignment + the three
    audit rows (module docstring)."""
    a = split_assignments(spark, sf_dir, domains=domains).localCheckpoint()
    if pairs is None:
        pairs = minhash_lsh_pairs(spark, sf_dir)

    doc_rows = a.select(
        F.lit("split").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws("|", "registrable", "bucket", "split").alias("v"),
    )
    sizes = a.agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
        F.countDistinct(
            F.when(F.col("split") == "train", F.col("registrable"))
        ).alias("d_train"),
        F.countDistinct(
            F.when(F.col("split") == "val", F.col("registrable"))
        ).alias("d_val"),
    ).select(
        F.lit("split").alias("op"),
        F.lit("sizes").alias("k"),
        F.concat_ws("|", "n_train", "n_val", "d_train", "d_val").alias("v"),
    )
    overlap = (
        a.groupBy("registrable")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum((F.col("ns") > 1).cast("long")).alias("n_overlap")
        )
        .select(
            F.lit("split").alias("op"),
            F.lit("domain_overlap").alias("k"),
            F.col("n_overlap").cast("string").alias("v"),
        )
    )
    a1 = a.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    a2 = a.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    leakage = (
        pairs.join(a1, "doc_a")
        .join(a2, "doc_b")
        .agg(
            F.sum(
                (F.col("split_a") != F.col("split_b")).cast("long")
            ).alias("n_cross"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .select(
            F.lit("split").alias("op"),
            F.lit("leakage").alias("k"),
            F.concat_ws("|", "n_cross", "n_pairs").alias("v"),
        )
    )
    return (
        doc_rows.unionByName(sizes)
        .unionByName(overlap)
        .unionByName(leakage)
    )


def _noorder(sql: str) -> str:
    return re.sub(r"\s+ORDER BY [\w, ]+\s*$", "", sql.strip())


# Oracle: registrable domains from the PSL closed form, the SAME
# portable bucket snippet, and the shared LSH-pair constant for the
# leakage audit — every number re-derived relationally.
SPLIT_SQL = f"""
WITH reg AS (
  SELECT doc_id, registrable FROM ({_noorder(PSL_SQL)})),
a AS (
  SELECT doc_id, registrable,
         CAST({split_bucket_snippet('registrable')} AS bigint) AS bucket,
         CASE WHEN {split_bucket_snippet('registrable')} < {VAL_BUCKETS}
              THEN 'val' ELSE 'train' END AS split
  FROM reg),
prs AS ({MINHASH_LSH_PAIRS_SQL})
SELECT 'split' AS op, CAST(doc_id AS varchar) AS k,
       registrable || '|' || CAST(bucket AS varchar) || '|' || split AS v
FROM a
UNION ALL
SELECT 'split', 'sizes',
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS varchar)
       || '|' ||
       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS varchar)
       || '|' ||
       CAST(count(DISTINCT CASE WHEN split = 'train' THEN registrable
                  END) AS varchar)
       || '|' ||
       CAST(count(DISTINCT CASE WHEN split = 'val' THEN registrable
                  END) AS varchar)
FROM a
UNION ALL
SELECT 'split', 'domain_overlap', CAST(count(*) AS varchar)
FROM (SELECT registrable FROM a
      GROUP BY registrable HAVING count(DISTINCT split) > 1)
UNION ALL
SELECT 'split', 'leakage',
       CAST(coalesce(sum(CASE WHEN a1.split <> a2.split THEN 1
                         ELSE 0 END), 0) AS varchar)
       || '|' || CAST(count(*) AS varchar)
FROM prs p
JOIN a a1 ON p.doc_a = a1.doc_id
JOIN a a2 ON p.doc_b = a2.doc_id
"""
