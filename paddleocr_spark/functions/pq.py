"""Product Quantization (Jegou et al., PAMI 2011) — the missing member
of the ANN index family (brute / LSH-bucket / IVF / SQ8 / now PQ): the
64-dim space splits into PQ_M = 8 subspaces of 8 dims, each learns its
own small codebook with the exact-lattice Lloyd's of
`functions/kmeans.py`, and every vector compresses to 8 centroid ids.
Search is ADC (asymmetric distance computation): the query precomputes
one dot-product table per subspace against that subspace's codebook,
and a vector's score is a TABLE-LOOKUP SUM — no float vector math at
scan time, the memory-bandwidth regime PQ exists for.

Exact-integer discipline (kmeans lattice): q = floor(x*2^10),
per-subspace centroids at scale 2^20 via floor-division updates
(init = systematic sample vec_id % PQ_INIT_MOD == PQ_INIT_RES, ONE
Lloyd update — the codebook contract a production run retrains), code
assignment argmin on the integer score dot(M,M) - 2*2^10*dot(q,M)
with smallest-centroid tie-break; ADC entries dot(q_query, M) are
exact longs (|entry| <= 8*2^10*2^20 = 2^33). Training collects only
K*8 ints per subspace (kmeans driver contract); encoding and ADC are
map-side literal-array folds — zero shuffles.

Rows: op='pq', k=vec_id, v = code_0..7 | adc (every vector's code
words + its ADC score against the fixed query QUERY_VEC_ID), plus
k='recall' — ADC top-K hits against the exact cosine top-K (the
ann_recall gate pattern: index quality as a red-row-on-regression
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.functions.similarity import (
    SQ8_QUANT as QUANT,  # the shared 2^10 lattice (== kmeans.QUANT)
    COSINE_TOPK_SQL,
    QUERY_VEC_ID,
    TOP_K,
    cosine_topk,
)
from paddleocr_spark.sources.scan import scan_parquet

PQ_M = 8      # subspaces
PQ_DSUB = 8   # dims per subspace
PQ_INIT_MOD = 67
PQ_INIT_RES = 5


def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS double) "
            f"* {QUANT}) AS bigint))"
        ).alias("qq"),
    )


def train_codebooks(
    spark: SparkSession, sf_dir: str
) -> list[list[tuple[int, list[int]]]]:
    """One codebook per subspace: [(cent_id, m[PQ_DSUB])] at scale
    QUANT^2 — systematic-sample init + one exact Lloyd update, all
    subspaces assigned from ONE pass over the quantized frame."""
    q = _q(spark, sf_dir).localCheckpoint()
    seeds = q.filter(
        F.col("vec_id") % PQ_INIT_MOD == PQ_INIT_RES
    ).collect()
    if not seeds:
        raise ValueError("PQ systematic sample produced no seeds")
    books: list[list[tuple[int, list[int]]]] = []
    for s in range(PQ_M):
        lo = s * PQ_DSUB
        cents = [
            (
                int(r["vec_id"]),
                [int(v) * QUANT for v in r["qq"][lo : lo + PQ_DSUB]],
            )
            for r in seeds
        ]
        sub = q.select(
            "vec_id",
            F.expr(f"slice(qq, {lo + 1}, {PQ_DSUB})").alias("sq"),
        )
        assigned = sub.withColumn("cell", _argmin_code(cents, "sq"))
        upd = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.expr(f"sum(sq[{i}]) AS s{i}")
                for i in range(PQ_DSUB)
            ],
        ).collect()
        # python // floors toward -inf exactly like SQL FLOOR over the
        # (exact-in-double) s*QUANT/n — signed sums included
        books.append(
            [
                (
                    int(r["cell"]),
                    [
                        (int(r[f"s{i}"]) * QUANT) // int(r["n"])
                        for i in range(PQ_DSUB)
                    ],
                )
                for r in upd
            ]
        )
    return books


def _argmin_code(cents: list[tuple[int, list[int]]], col: str):
    """Literal-array argmin (kmeans _assign economy: one parsed SQL
    string)."""
    cent_sql = "array(" + ",".join(
        "named_struct('mm', {mm}L, 'm', array({m}), 'c', {c}L)".format(
            mm=sum(v * v for v in m),
            m=",".join(f"{int(v)}L" for v in m),
            c=int(cid),
        )
        for cid, m in cents
    ) + ")"
    return F.array_min(
        F.expr(
            f"transform({cent_sql}, ct -> struct("
            f"ct.mm - {2 * QUANT} * aggregate(zip_with({col}, ct.m, "
            "(x, y) -> x * y), 0L, (acc, v) -> acc + v) AS s, "
            "ct.c AS c))"
        )
    )["c"]


def pq_encode(
    spark: SparkSession, sf_dir: str, books=None
) -> DataFrame:
    """(vec_id, codes array<long>, adc long): per-vector code words
    and the ADC score against QUERY_VEC_ID."""
    if books is None:
        books = train_codebooks(spark, sf_dir)
    q = _q(spark, sf_dir)
    query = q.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["qq"]
    out = q
    adc_tables = []
    for s in range(PQ_M):
        lo = s * PQ_DSUB
        out = out.withColumn(
            f"c{s}",
            _argmin_code(
                books[s], f"slice(qq, {lo + 1}, {PQ_DSUB})"
            ),
        )
        qsub = [int(v) for v in query[lo : lo + PQ_DSUB]]
        adc_tables.append(
            {
                cid: sum(a * b for a, b in zip(qsub, m))
                for cid, m in books[s]
            }
        )
    # ADC = sum of table lookups, rendered as chained CASE literals
    adc_expr = " + ".join(
        "CASE c{s} {body} END".format(
            s=s,
            body=" ".join(
                f"WHEN {cid}L THEN {val}L"
                for cid, val in sorted(adc_tables[s].items())
            ),
        )
        for s in range(PQ_M)
    )
    return out.select(
        "vec_id",
        F.array(*[F.col(f"c{s}") for s in range(PQ_M)]).alias("codes"),
        F.expr(adc_expr).alias("adc"),
    )


def pq_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite rows (module docstring)."""
    enc = pq_encode(spark, sf_dir).localCheckpoint()
    per_vec = enc.select(
        F.lit("pq").alias("op"),
        F.col("vec_id").cast("string").alias("k"),
        F.concat_ws(
            "|", F.array_join("codes", ":"), F.col("adc")
        ).alias("v"),
    )
    pq_top = (
        enc.where(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id")
    )
    exact = cosine_topk(spark, sf_dir).select("vec_id")
    recall = pq_top.join(exact, "vec_id").agg(
        F.count(F.lit(1)).alias("hits")
    ).select(
        F.lit("pq").alias("op"),
        F.lit("recall").alias("k"),
        F.concat_ws(
            "|",
            "hits",
            F.lit(TOP_K),
            F.expr(f"hits * 1000000 div {TOP_K}"),
        ).alias("v"),
    )
    return per_vec.unionByName(recall)


def _sub_ctes(s: int) -> str:
    lo = s * PQ_DSUB
    return f"""
qs{s} AS (
  SELECT vec_id, qq[{lo + 1}:{lo + PQ_DSUB}] AS sq FROM q),
c0s{s} AS (
  SELECT vec_id AS cent_id,
         list_transform(sq, v -> v * {QUANT}) AS m
  FROM qs{s} WHERE vec_id % {PQ_INIT_MOD} = {PQ_INIT_RES}),
a1s{s} AS (
  SELECT vec_id, sq, cent_id AS cell FROM (
    SELECT t.vec_id, t.sq, c.cent_id,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_dot_product(c.m, c.m) AS BIGINT)
                      - {2 * QUANT} *
                        CAST(list_dot_product(t.sq, c.m) AS BIGINT) ASC,
                      c.cent_id ASC) AS rn
    FROM qs{s} t CROSS JOIN c0s{s} c) WHERE rn = 1),
u1s{s} AS (
  SELECT cell, g.i AS gi,
         CAST(FLOOR(CAST(SUM(sq[g.i]) AS DOUBLE) * {QUANT}
              / COUNT(*)) AS BIGINT) AS m
  FROM a1s{s}, UNNEST(generate_series(1, {PQ_DSUB})) AS g(i)
  GROUP BY cell, g.i),
c1s{s} AS (
  SELECT cell AS cent_id, list(m ORDER BY gi) AS m
  FROM u1s{s} GROUP BY cell),
code{s} AS (
  SELECT vec_id, sq, cent_id AS cell FROM (
    SELECT t.vec_id, t.sq, c.cent_id,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_dot_product(c.m, c.m) AS BIGINT)
                      - {2 * QUANT} *
                        CAST(list_dot_product(t.sq, c.m) AS BIGINT) ASC,
                      c.cent_id ASC) AS rn
    FROM qs{s} t CROSS JOIN c1s{s} c) WHERE rn = 1),
adc{s} AS (
  SELECT k.vec_id, k.cell,
         CAST(list_dot_product(qv.sq, c.m) AS BIGINT) AS d
  FROM code{s} k
  JOIN c1s{s} c ON k.cell = c.cent_id
  CROSS JOIN (SELECT sq FROM qs{s}
              WHERE vec_id = {QUERY_VEC_ID}) qv)
"""


def _pq_sql() -> str:
    ctes = ",".join(_sub_ctes(s) for s in range(PQ_M))
    code_joins = " ".join(
        f"JOIN adc{s} ON adc{s}.vec_id = adc0.vec_id"
        for s in range(1, PQ_M)
    )
    code_concat = " || ':' || ".join(
        f"CAST(adc{s}.cell AS varchar)" for s in range(PQ_M)
    )
    adc_sum = " + ".join(f"adc{s}.d" for s in range(PQ_M))
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))
           AS qq
  FROM embeddings),
{ctes},
pv AS (
  SELECT adc0.vec_id AS vec_id, {code_concat} AS codes,
         {adc_sum} AS adc
  FROM adc0 {code_joins})
SELECT 'pq' AS op, CAST(vec_id AS varchar) AS k,
       codes || '|' || CAST(adc AS varchar) AS v
FROM pv
UNION ALL
SELECT 'pq', 'recall',
       CAST(count(*) AS varchar) || '|' || CAST({TOP_K} AS varchar)
       || '|' || CAST(count(*) * 1000000 // {TOP_K} AS varchar)
FROM (SELECT vec_id FROM pv WHERE vec_id != {QUERY_VEC_ID}
      ORDER BY adc DESC, vec_id ASC LIMIT {TOP_K}) p
JOIN ({COSINE_TOPK_SQL}) t USING (vec_id)
"""


PQ_SQL = _pq_sql()
