"""Corpus drift monitoring — distribution shift between two capture
windows of the same corpus (the per-snapshot data-quality gate a
standing crawl pipeline alerts on: a crawler config change, a big
site's template swap, or an upstream encoding bug shows up as a lang /
length / host mix shift long before anyone reads documents).

Semantics: the corpus splits into a REFERENCE and a CURRENT window by
capture time (`doc_ts` second parity — the fixture's timestamps span
only hours, so half-month windows would be degenerate; a production
run compares crawl snapshots, same shape). The parity rule makes the
fixture's drift spectrum OBSERVABLE end-to-end: hosts are assigned by
doc_id mod 20, so the two windows hit DISJOINT hosts (tv:host = the
maximum 1.0 — the every-alarm-fires case), languages are
parity-independent (tv:lang small — the healthy-corpus baseline), and
length bins sit in between. For each dimension — language, length
bucket (100-char bins capped at 10), host — the monitor computes both
windows' histograms and their total-variation distance in EXACT
micro-units:

    TV = 1/2 * sum_i | p_i - q_i |
    tv_micro = (sum_i | c_ref_i * n_cur - c_cur_i * n_ref |) * 1e6
               // (2 * n_ref * n_cur)

Integer counts cross-multiplied before any division, one floor at the
end — no float ever reaches the compare (host_reputation discipline).

Rows: one summary row per dimension (k='tv:<dim>',
v=n_ref|n_cur|tv_micro) plus per-bucket detail rows for the lang
dimension (k='lang:<lang>', v=c_ref|c_cur) — the drill-down an alert
links to.

Scale shape: ONE corpus scan -> per-dimension map-side-combined
groupBy over (bucket) with conditional sums — histogram frames are
bucket-cardinality-sized (langs x hosts x 11 bins), never
corpus-sized; the TV fold is an agg over those tiny frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

# doc_ts(doc_id) = base + doc_id*37 seconds; even capture second =
# reference window (module docstring)
_TS_MOD = 2_592_000
_LEN_BIN = 100
_LEN_CAP = 10


def _windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source",
        F.least(
            (F.length("text") / _LEN_BIN).cast("long"), F.lit(_LEN_CAP)
        ).alias("lenb"),
        ((F.col("doc_id") * 37 % _TS_MOD) % 2 == 0)
        .cast("long")
        .alias("is_ref"),
    )


def drift_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='drift', ...) suite rows (module docstring)."""
    from pyspark.sql import Window

    base = _windowed(spark, sf_dir).localCheckpoint()

    def dim(colname: str, col) -> DataFrame:
        hist = base.groupBy(col.alias("bucket")).agg(
            F.sum("is_ref").alias("c_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("c_cur"),
        )
        w = Window.partitionBy()
        scaled = hist.select(
            "bucket", "c_ref", "c_cur",
            F.sum("c_ref").over(w).alias("n_ref"),
            F.sum("c_cur").over(w).alias("n_cur"),
        )
        return scaled.agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.sum(
                F.abs(
                    F.col("c_ref") * F.col("n_cur")
                    - F.col("c_cur") * F.col("n_ref")
                )
            ).alias("num"),
        ).select(
            F.lit("drift").alias("op"),
            F.lit(f"tv:{colname}").alias("k"),
            F.concat_ws(
                "|",
                "n_ref",
                "n_cur",
                F.expr("num * 1000000 div greatest(2 * n_ref * n_cur, 1)"),
            ).alias("v"),
        )

    summary = (
        dim("lang", F.col("lang"))
        .unionByName(dim("lenb", F.col("lenb").cast("string")))
        .unionByName(dim("host", F.col("source")))
    )
    lang_detail = base.groupBy("lang").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("c_cur"),
    ).select(
        F.lit("drift").alias("op"),
        F.concat(F.lit("lang:"), F.col("lang")).alias("k"),
        F.concat_ws("|", "c_ref", "c_cur").alias("v"),
    )
    return summary.unionByName(lang_detail)


# Oracle: window totals are corpus-wide constants shared by every
# dimension, so each TV row is one grouped histogram + the cross-
# multiplied absolute fold against those totals.
_WIN = f"CASE WHEN (doc_id * 37 % {_TS_MOD}) % 2 = 0 THEN 1 ELSE 0 END"


def _hist(bucket_expr: str) -> str:
    return (
        f"SELECT {bucket_expr} AS bucket, "
        f"sum({_WIN}) AS c_ref, sum(1 - ({_WIN})) AS c_cur "
        "FROM documents GROUP BY 1"
    )


def _tv_sql(bucket_expr: str, name: str) -> str:
    return f"""
SELECT 'drift' AS op, 'tv:{name}' AS k,
       CAST(n.n_ref AS varchar) || '|' || CAST(n.n_cur AS varchar)
       || '|' ||
       CAST(sum(abs(h.c_ref * n.n_cur - h.c_cur * n.n_ref)) * 1000000
            // greatest(2 * n.n_ref * n.n_cur, 1) AS varchar) AS v
FROM ({_hist(bucket_expr)}) h,
     (SELECT sum({_WIN}) AS n_ref, sum(1 - ({_WIN})) AS n_cur
      FROM documents) n
GROUP BY n.n_ref, n.n_cur
"""


DRIFT_SQL = (
    _tv_sql("lang", "lang")
    + "UNION ALL"
    + _tv_sql(
        f"CAST(least(length(text) // {_LEN_BIN}, {_LEN_CAP}) AS varchar)",
        "lenb",
    )
    + "UNION ALL"
    + _tv_sql("source", "host")
    + f"""
UNION ALL
SELECT 'drift', 'lang:' || lang,
       CAST(sum({_WIN}) AS varchar) || '|' ||
       CAST(sum(1 - ({_WIN})) AS varchar)
FROM documents GROUP BY lang
"""
)
