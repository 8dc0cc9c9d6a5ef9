"""Distributed PCA (dominant principal component) over the embeddings
table — the preprocessing step real ANN stacks run before IVF/PQ
(rotate/whiten so quantizers see decorrelated axes), and the classic
"distributed Gram matrix + driver-side eigensolve" decomposition: the
CORPUS-scale work is one aggregation producing the DIM x DIM second-
moment frame; the eigen step happens on that tiny frame.

Exact-integer discipline (the kmeans lattice, functions/kmeans.py):
 * inputs quantized once as q = floor(x * 2^10) (power-of-two scaling
   of a float32 is exact in IEEE double — no rounding anywhere);
 * the centered scaled covariance is the INTEGER matrix
       C = n * sum_i(q_i q_i^T) - (sum_i q_i)(sum_i q_i)^T
   (mean-centering without any division);
 * TWO exact power steps from e_0:  v1 = C[:,0], v2 = C v1 — computed
   driver-side in Python bigints over the collected (DIM x DIM) frame
   (the kmeans centroid-collect contract: driver traffic is DIM^2
   ints, never vectors);
 * sign canonicalization: flip v2 so its first nonzero entry is
   positive (eigenvectors are sign-ambiguous; the gate needs one);
 * per-vector projections p_i = q_i . v2 are computed DISTRIBUTED as
   a zip_with/aggregate fold in DECIMAL(38,0) — exact: with n <= 10^5
   gate corpora, |C| <= n^2 * 64 * 2^20 < 2^45, |v2| <= 64 * 2^45+45
   < 2^96, |p| < 2^112 < 10^38. (At 10^12 vectors the magnitudes need
   per-step rescaling — the documented production swap; two exact
   steps is the gate-scale contract.)

Two power steps give the gate a DETERMINISTIC, cross-engine-exact
Krylov direction (e_0, C e_0, C^2 e_0 — a fixed member of the Krylov
basis), not a converged eigenvector; k='rayleigh0' carries the
component-ratio v2[0]/v1[0] as an exact rational for the magnitude.
Convergence is a numerics concern the float production variant owns;
the GATE pins the distributed Gram/projection machinery exactly.

Oracle: the same lattice, Gram sums, two steps and projections in
DuckDB HUGEINT — arbitrary-precision values cross the compare as
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

PCA_QUANT = 1024  # 2^10, the kmeans lattice
PCA_DIM = 64


def _q_col():
    return F.expr(
        f"transform(embedding, x -> CAST(floor(x * {PCA_QUANT}) AS bigint))"
    )


def _gram(spark: SparkSession, sf_dir: str):
    """(n, S[dim], G[dim][dim]) exact integer sums, one distributed
    aggregation."""
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        _q_col().alias("q")
    )
    pair_expr = f"""
      flatten(transform(sequence(0, {PCA_DIM - 1}), a ->
        transform(sequence(0, a), b ->
          struct(a AS a, b AS b,
                 element_at(q, a + 1) * element_at(q, b + 1) AS p))))
    """
    g = (
        emb.select(F.explode(F.expr(pair_expr)).alias("e"))
        .groupBy("e.a", "e.b")
        .agg(F.sum("e.p").alias("s"))
        .collect()
    )
    sums = (
        emb.select(F.explode(F.expr(
            f"transform(sequence(0, {PCA_DIM - 1}), "
            "d -> struct(d AS d, element_at(q, d + 1) AS v))"
        )).alias("e"))
        .groupBy("e.d")
        .agg(F.sum("e.v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = int(sums[0]["c"])
    S = [0] * PCA_DIM
    for r in sums:
        S[int(r["d"])] = int(r["s"])
    G = [[0] * PCA_DIM for _ in range(PCA_DIM)]
    for r in g:
        a, b, s = int(r["a"]), int(r["b"]), int(r["s"])
        G[a][b] = s
        G[b][a] = s
    return n, S, G


def pca_power(spark: SparkSession, sf_dir: str):
    """(v1, v2) the two exact power steps (module docstring), with v2
    sign-canonicalized. Pure driver arithmetic over the collected
    Gram frame."""
    n, S, G = _gram(spark, sf_dir)
    C = [
        [n * G[a][b] - S[a] * S[b] for b in range(PCA_DIM)]
        for a in range(PCA_DIM)
    ]
    v1 = [C[a][0] for a in range(PCA_DIM)]
    v2 = [
        sum(C[a][b] * v1[b] for b in range(PCA_DIM))
        for a in range(PCA_DIM)
    ]
    first = next((x for x in v2 if x != 0), 0)
    if first < 0:
        v2 = [-x for x in v2]
        v1k = v1  # v1 reported unflipped; rayleigh uses raw pair
    return v1, v2


def pca_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='pca', ...): k='dim:<d>' the canonical v2 components,
    k='rayleigh0' the exact component ratio, k='vec:<id>' per-vector
    projections (distributed decimal fold)."""
    v1, v2 = pca_power(spark, sf_dir)
    lits = ", ".join(
        f"CAST({x} AS DECIMAL(38,0))" for x in v2
    )
    proj = (
        scan_parquet(spark, f"{sf_dir}/embeddings.parquet")
        .select("vec_id", _q_col().alias("q"))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(zip_with(q, array({lits}), "
                "(x, y) -> CAST(x AS DECIMAL(38,0)) * y), "
                "CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t)"
            ).cast("string").alias("p"),
        )
    )
    rows = proj.select(
        F.lit("pca").alias("op"),
        F.concat(F.lit("vec:"), F.col("vec_id").cast("string")).alias("k"),
        F.col("p").alias("v"),
    )
    spark_sess = spark
    dims = spark_sess.createDataFrame(
        [("pca", f"dim:{d:02d}", str(v2[d])) for d in range(PCA_DIM)]
        + [("pca", "rayleigh0", f"{v2[0]}|{v1[0]}")],
        "op string, k string, v string",
    )
    return rows.unionByName(dims)


PCA_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(x * {PCA_QUANT}) AS bigint)) AS q
  FROM embeddings),
nn AS (SELECT CAST(count(*) AS hugeint) AS n FROM q),
sums AS (
  SELECT d, CAST(sum(q[d + 1]) AS hugeint) AS s
  FROM q, generate_series(0, {PCA_DIM - 1}) g(d)
  GROUP BY d),
gram AS (
  SELECT a.d AS a, b.d AS b,
         CAST(sum(q.q[a.d + 1] * q.q[b.d + 1]) AS hugeint) AS g
  FROM q,
       generate_series(0, {PCA_DIM - 1}) a(d),
       generate_series(0, {PCA_DIM - 1}) b(d)
  GROUP BY a.d, b.d),
cov AS (
  SELECT g.a, g.b, nn.n * g.g - sa.s * sb.s AS c
  FROM gram g
  JOIN sums sa ON g.a = sa.d
  JOIN sums sb ON g.b = sb.d, nn),
v1 AS (SELECT a AS d, c AS v FROM cov WHERE b = 0),
v2r AS (
  SELECT cov.a AS d, sum(cov.c * v1.v) AS v
  FROM cov JOIN v1 ON cov.b = v1.d
  GROUP BY cov.a),
sgn AS (
  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
  FROM v2r WHERE v <> 0 ORDER BY d LIMIT 1),
v2 AS (SELECT d, v * coalesce((SELECT s FROM sgn), 1) AS v FROM v2r)
SELECT 'pca' AS op, 'vec:' || CAST(q.vec_id AS varchar) AS k,
       CAST(sum(CAST(q.q[v2.d + 1] AS hugeint) * v2.v) AS varchar) AS v
FROM q, v2
GROUP BY q.vec_id
UNION ALL
SELECT 'pca', 'dim:' || CASE WHEN d < 10 THEN '0' ELSE '' END
       || CAST(d AS varchar), CAST(v AS varchar)
FROM v2
UNION ALL
SELECT 'pca', 'rayleigh0',
       CAST((SELECT v FROM v2 WHERE d = 0) AS varchar) || '|' ||
       CAST((SELECT v FROM v1 WHERE d = 0) AS varchar)
"""
