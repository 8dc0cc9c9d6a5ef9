"""Embedding similarity search over `embeddings(vec_id, embedding
array<float>, label)`.

- brute-force cosine top-k: the exactness baseline. JVM-side arithmetic
  via zip_with/aggregate (no Python UDF); the query vector is broadcast
  (a scalar subquery / literal), so the scan is a single narrow pass —
  at 10^12 rows this is one map stage + a top-k (TakeOrdered), no shuffle
  of the full table.
- LSH-bucketed variant: sign-bit bucket on the first SIGN_BITS dims;
  candidates only from the query's bucket. The scale path: the bucket is
  a partition-prunable key (store bucketed-by in the table layout), so
  the scan touches 1/2^SIGN_BITS of the data.
- embedding-cosine near-dup pairs for the dedup family: bucket equi join
  then exact cosine — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from paddleocr_spark.sources.scan import scan_parquet

QUERY_VEC_ID = 0
TOP_K = 10
SIGN_BITS = 8
ROUND = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/embeddings.parquet")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-similar vectors to QUERY_VEC_ID by cosine (excluding
    itself), deterministic tie-break on vec_id."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    joined = emb.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(q))
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    return (
        joined.select("vec_id", F.round(cos, ROUND).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding))
                * sqrt(list_dot_product(qv, qv))), {ROUND}) AS cosine
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


def _bucket(col: Column) -> Column:
    bits = [
        F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0")
        for i in range(SIGN_BITS)
    ]
    return F.concat(*bits)


def lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: search only the query's sign-bit bucket, then exact cosine
    top-K within it."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    )
    joined = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("qbucket"))
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    return (
        joined.select("vec_id", F.round(cos, ROUND).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _bucket_sql(col: str) -> str:
    return " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(SIGN_BITS)
    )


LSH_BUCKET_TOPK_SQL = f"""
WITH b AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings),
q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding))
                * sqrt(list_dot_product(qv, qv))), {ROUND}) AS cosine
FROM b, q
WHERE vec_id != {QUERY_VEC_ID} AND bucket = qbucket
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""

NEAR_DUP_COS = 0.9


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same sign-bucket equi join,
    exact cosine >= NEAR_DUP_COS."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("embedding")))
    l = emb.alias("l")
    r = emb.alias("r")
    cos = _dot(F.col("l.embedding"), F.col("r.embedding")) / (
        _norm(F.col("l.embedding")) * _norm(F.col("r.embedding"))
    )
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.round(cos, ROUND).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH b AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings)
SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
       round(list_dot_product(l.embedding, r.embedding)
             / (sqrt(list_dot_product(l.embedding, l.embedding))
                * sqrt(list_dot_product(r.embedding, r.embedding))), {ROUND}) AS cosine
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round(list_dot_product(l.embedding, r.embedding)
            / (sqrt(list_dot_product(l.embedding, l.embedding))
               * sqrt(list_dot_product(r.embedding, r.embedding))), {ROUND}) >= {NEAR_DUP_COS}
"""


# -- IVF (inverted-file) ANN --------------------------------------------------

CENT_MOD = 37   # deterministic coarse centroids: vec_id % CENT_MOD == 1
NPROBE = 2      # query probes this many nearest cells
ASSIGN_ROUND = 6


def _cells(spark: SparkSession, sf_dir: str):
    """(centroids, assigned): centroid list + per-vector nearest-centroid
    cell. At 10^12 rows the assignment is precomputed once into the table
    layout (partition/bucket by cell) so the probe filter partition-prunes;
    here it is derived inline from the same deterministic rule."""
    from pyspark.sql.window import Window

    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") % CENT_MOD == 1).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    pairs = emb.crossJoin(F.broadcast(cents))
    cos = F.round(
        _dot(F.col("embedding"), F.col("cv"))
        / (_norm(F.col("embedding")) * _norm(F.col("cv"))),
        ASSIGN_ROUND,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cent_id")
    )
    assigned = (
        pairs.select("vec_id", "embedding", "cent_id", cos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "ccos")
    )
    return cents, assigned


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid cell per vector; the query searches only
    its NPROBE nearest cells with exact cosine. Complements the sign-bit
    LSH bucket: cells adapt to the data distribution, and recall tunes
    with NPROBE instead of bucket width."""
    emb = _emb(spark, sf_dir)
    cents, assigned = _cells(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    qcos = F.round(
        _dot(F.col("cv"), F.col("q")) / (_norm(F.col("cv")) * _norm(F.col("q"))),
        ASSIGN_ROUND,
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", qcos.alias("qc"))
        .orderBy(F.desc("qc"), F.asc("cent_id"))
        .limit(NPROBE)
        .select("cent_id")
    )
    cand = (
        assigned.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probe), "cent_id")
        .crossJoin(F.broadcast(q))
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    return (
        cand.select("vec_id", F.round(cos, ROUND).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


IVF_TOPK_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
  WHERE vec_id % {CENT_MOD} = 1
),
assigned AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.embedding, c.cv)
                   / (sqrt(list_dot_product(e.embedding, e.embedding))
                      * sqrt(list_dot_product(c.cv, c.cv))), {ASSIGN_ROUND}) DESC,
               c.cent_id ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cent_id FROM cents, q
  ORDER BY round(list_dot_product(cv, qv)
        / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))),
        {ASSIGN_ROUND}) DESC, cent_id ASC
  LIMIT {NPROBE}
)
SELECT a.vec_id,
       round(list_dot_product(a.embedding, qv)
             / (sqrt(list_dot_product(a.embedding, a.embedding))
                * sqrt(list_dot_product(qv, qv))), {ROUND}) AS cosine
FROM assigned a JOIN probe USING (cent_id), q
WHERE a.vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""
