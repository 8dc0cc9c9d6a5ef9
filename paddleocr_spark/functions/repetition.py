"""Gopher repetition-removal verdict (Rae et al. 2021, Table A1).

The existing `text.repetition_stats` ships the two RAW signals (top
word / top bigram mass); this operator is the composed FILTER half of
MassiveText's repetition rules — the duplicate-line and duplicated
n-gram family — folded to a reason bitmask + keep flag like
`text.gopher_filter` does for the word rules:

- duplicate LINE fraction (occurrences beyond the first / total lines)
  and duplicate line CHARACTER fraction,
- top duplicated 2/3/4-gram character fraction (the char mass of the
  duplicated n-gram covering the most characters; 0 when no n-gram
  repeats — a deterministic variant of Gopher's "most frequent
  n-gram", which is tie-ambiguous),
- duplicated 5-gram character fraction (chars in occurrences beyond
  the first; overlapping occurrences each count — documented
  deviation from position-marking implementations, identical on both
  engines).

Thresholds are the Gopher paper's: dup-line 0.30, dup-line-char 0.20,
top-2-gram 0.20, top-3-gram 0.18, top-4-gram 0.16, dup-5-gram 0.15.
All fractions are exact integer micro-units via long `div` — no float
reaches the verdict on either engine. Character masses count
NON-WHITESPACE characters, for lines and n-grams alike (one shared
chlen definition — the fraction is over ink, not padding).

The corpus text is single-line word soup, so the fixture injects
repeated lines / phrases via ONE portable SQL expression (CASE / `%`
/ `||` / repeat / chr only — parses identically under Spark SQL and
DuckDB) evaluated by BOTH engines; doc_id%3/%4/%5 branches exercise
every rule corpus-wide in both directions.

Scale shape: ONE explode pass (the six unit families are flattened
into a single tagged struct array per doc — no six-scan union), then
two partial-agg'd groupBys keyed by (doc_id, kind[, gram]); keys are
bounded by per-document token counts, so no global hot key exists at
any stage and the operator rides the scan partitioning at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.sources.scan import scan_parquet

# Gopher Table A1 thresholds, in micro-units.
REP_THRESH = {
    "dup_line": 300_000,
    "dup_line_ch": 200_000,
    "top2": 200_000,
    "top3": 180_000,
    "top4": 160_000,
    "dup5": 150_000,
}

# Portable fixture: multi-line page with %3-keyed repeated boilerplate
# lines (dup-line rules), a %4-keyed 5x-repeated sales phrase (top
# n-gram + dup-5-gram rules), a %5-keyed verbatim duplicate paragraph,
# and a 120-char slice of the real corpus text as the body so the
# fractions sit on both sides of every threshold across the corpus.
REP_PAGE_EXPR = (
    "'Doc ' || CAST(doc_id AS string) || ' opening line of unique prose.'"
    " || chr(10) || "
    "CASE WHEN doc_id % 3 = 0 THEN"
    " repeat('Subscribe to our newsletter for updates!' || chr(10), 3)"
    " ELSE '' END || "
    "substr(text, 1, 120) || chr(10) || "
    "CASE WHEN doc_id % 4 = 1 THEN"
    " repeat('buy cheap widgets online now ', 5) || chr(10) ELSE '' END || "
    "CASE WHEN doc_id % 5 = 2 THEN"
    " 'The identical closing paragraph repeats verbatim here.' || chr(10) ||"
    " 'The identical closing paragraph repeats verbatim here.' || chr(10)"
    " ELSE '' END || "
    "'Footer line ' || CAST(doc_id AS string) || ' ends the page.'"
)

_NGRAM_KINDS = (1, 2, 3, 4, 5)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _units_expr() -> str:
    """One flattened tagged-struct array per doc: line units plus the
    1..5-gram units — a SINGLE explode feeds every rule family."""
    parts = [
        "transform(lines, x -> named_struct('kind', 'line', 'g', x))"
    ]
    for n in _NGRAM_KINDS:
        parts.append(
            f"transform(CASE WHEN size(t) >= {n}"
            f" THEN sequence(1, size(t) - {n} + 1) ELSE array() END,"
            f" i -> named_struct('kind', '{n}',"
            f" 'g', array_join(slice(t, i, {n}), ' ')))"
        )
    return "flatten(array(" + ", ".join(parts) + "))"


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, micro_dup_line, micro_dup_line_ch, micro_top2,
    micro_top3, micro_top4, micro_dup5, fail_bits, keep) per document
    under the Gopher repetition rules over the injected pages."""
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(REP_PAGE_EXPR).alias("page"))
        .select(
            "doc_id",
            F.expr(
                "filter(split(page, '\\n'), l -> l <> '')"
            ).alias("lines"),
            F.split(
                F.trim(F.regexp_replace("page", r"\s+", " ")), " "
            ).alias("t"),
        )
    )
    units = base.select(
        "doc_id", F.explode(F.expr(_units_expr())).alias("u")
    ).select("doc_id", F.col("u.kind").alias("kind"), F.col("u.g").alias("g"))
    counts = (
        units.groupBy("doc_id", "kind", "g")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "chlen", F.length(F.translate("g", " ", "")).cast("long")
        )
    )
    per = counts.groupBy("doc_id", "kind").agg(
        F.sum("c").alias("tot_occ"),
        F.sum(F.col("c") - 1).alias("dup_occ"),
        F.sum(F.col("c") * F.col("chlen")).alias("tot_ch"),
        F.sum((F.col("c") - 1) * F.col("chlen")).alias("dup_ch"),
        F.coalesce(
            F.max(F.when(F.col("c") >= 2, F.col("c") * F.col("chlen"))),
            F.lit(0).cast("long"),
        ).alias("top_mass"),
    )

    def _k(kind: str, col: str):
        return F.coalesce(
            F.max(F.when(F.col("kind") == kind, F.col(col))),
            F.lit(0).cast("long"),
        )

    agg = per.groupBy("doc_id").agg(
        _k("line", "tot_occ").alias("line_occ"),
        _k("line", "dup_occ").alias("line_dup"),
        _k("line", "tot_ch").alias("line_ch"),
        _k("line", "dup_ch").alias("line_dup_ch"),
        _k("1", "tot_ch").alias("denom"),
        _k("2", "top_mass").alias("m2"),
        _k("3", "top_mass").alias("m3"),
        _k("4", "top_mass").alias("m4"),
        _k("5", "dup_ch").alias("d5"),
    )
    micro = agg.select(
        "doc_id",
        F.expr(
            "(line_dup * 1000000L) div greatest(line_occ, 1)"
        ).alias("micro_dup_line"),
        F.expr(
            "(line_dup_ch * 1000000L) div greatest(line_ch, 1)"
        ).alias("micro_dup_line_ch"),
        F.expr("(m2 * 1000000L) div greatest(denom, 1)").alias("micro_top2"),
        F.expr("(m3 * 1000000L) div greatest(denom, 1)").alias("micro_top3"),
        F.expr("(m4 * 1000000L) div greatest(denom, 1)").alias("micro_top4"),
        F.expr("(d5 * 1000000L) div greatest(denom, 1)").alias("micro_dup5"),
    )
    bits = (
        (F.col("micro_dup_line") > REP_THRESH["dup_line"]).cast("long")
        + (F.col("micro_dup_line_ch") > REP_THRESH["dup_line_ch"]).cast(
            "long"
        )
        * 2
        + (F.col("micro_top2") > REP_THRESH["top2"]).cast("long") * 4
        + (F.col("micro_top3") > REP_THRESH["top3"]).cast("long") * 8
        + (F.col("micro_top4") > REP_THRESH["top4"]).cast("long") * 16
        + (F.col("micro_dup5") > REP_THRESH["dup5"]).cast("long") * 32
    )
    return micro.withColumn("fail_bits", bits).withColumn(
        "keep", (F.col("fail_bits") == 0).cast("int")
    )


GOPHER_REPETITION_SQL = f"""
WITH d AS (
  SELECT doc_id, {REP_PAGE_EXPR} AS page FROM documents),
b AS (
  SELECT doc_id,
         list_filter(string_split(page, chr(10)), l -> l <> '') AS lines,
         regexp_split_to_array(
           trim(regexp_replace(page, '\\s+', ' ', 'g')), ' ') AS t
  FROM d),
units AS (
  SELECT doc_id, 'line' AS kind, UNNEST(lines) AS g FROM b
  UNION ALL SELECT doc_id, '1', UNNEST(t) FROM b
""" + "".join(
    f"""  UNION ALL
  SELECT doc_id, '{n}',
         UNNEST(list_transform(generate_series(1, len(t) - {n} + 1),
                               i -> array_to_string(t[i:i+{n - 1}], ' ')))
  FROM b
"""
    for n in (2, 3, 4, 5)
) + f"""),
counts AS (
  SELECT doc_id, kind, g, count(*) AS c,
         length(replace(g, ' ', '')) AS chlen
  FROM units GROUP BY doc_id, kind, g),
per AS (
  SELECT doc_id, kind,
         sum(c) AS tot_occ, sum(c - 1) AS dup_occ,
         sum(c * chlen) AS tot_ch, sum((c - 1) * chlen) AS dup_ch,
         coalesce(max(CASE WHEN c >= 2 THEN c * chlen END), 0) AS top_mass
  FROM counts GROUP BY doc_id, kind),
agg AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN kind = 'line' THEN tot_occ END), 0) AS line_occ,
         coalesce(max(CASE WHEN kind = 'line' THEN dup_occ END), 0) AS line_dup,
         coalesce(max(CASE WHEN kind = 'line' THEN tot_ch END), 0) AS line_ch,
         coalesce(max(CASE WHEN kind = 'line' THEN dup_ch END), 0)
           AS line_dup_ch,
         coalesce(max(CASE WHEN kind = '1' THEN tot_ch END), 0) AS denom,
         coalesce(max(CASE WHEN kind = '2' THEN top_mass END), 0) AS m2,
         coalesce(max(CASE WHEN kind = '3' THEN top_mass END), 0) AS m3,
         coalesce(max(CASE WHEN kind = '4' THEN top_mass END), 0) AS m4,
         coalesce(max(CASE WHEN kind = '5' THEN dup_ch END), 0) AS d5
  FROM per GROUP BY doc_id),
micro AS (
  SELECT doc_id,
         (line_dup * 1000000) // greatest(line_occ, 1) AS micro_dup_line,
         (line_dup_ch * 1000000) // greatest(line_ch, 1)
           AS micro_dup_line_ch,
         (m2 * 1000000) // greatest(denom, 1) AS micro_top2,
         (m3 * 1000000) // greatest(denom, 1) AS micro_top3,
         (m4 * 1000000) // greatest(denom, 1) AS micro_top4,
         (d5 * 1000000) // greatest(denom, 1) AS micro_dup5
  FROM agg),
v AS (
  SELECT *,
         CAST(micro_dup_line > {REP_THRESH["dup_line"]} AS int)
         + CAST(micro_dup_line_ch > {REP_THRESH["dup_line_ch"]} AS int) * 2
         + CAST(micro_top2 > {REP_THRESH["top2"]} AS int) * 4
         + CAST(micro_top3 > {REP_THRESH["top3"]} AS int) * 8
         + CAST(micro_top4 > {REP_THRESH["top4"]} AS int) * 16
         + CAST(micro_dup5 > {REP_THRESH["dup5"]} AS int) * 32 AS fail_bits
  FROM micro)
SELECT doc_id,
       CAST(micro_dup_line AS bigint) AS micro_dup_line,
       CAST(micro_dup_line_ch AS bigint) AS micro_dup_line_ch,
       CAST(micro_top2 AS bigint) AS micro_top2,
       CAST(micro_top3 AS bigint) AS micro_top3,
       CAST(micro_top4 AS bigint) AS micro_top4,
       CAST(micro_dup5 AS bigint) AS micro_dup5,
       CAST(fail_bits AS bigint) AS fail_bits,
       CAST(fail_bits = 0 AS int) AS keep
FROM v
ORDER BY doc_id
"""


def gopher_repetition_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op='gopher_repetition', k=doc_id, v=micros|bits|keep) suite row."""
    return gopher_repetition(spark, sf_dir).select(
        F.lit("gopher_repetition").alias("op"),
        F.col("doc_id").cast("string").alias("k"),
        F.concat_ws(
            "|",
            "micro_dup_line",
            "micro_dup_line_ch",
            "micro_top2",
            "micro_top3",
            "micro_top4",
            "micro_dup5",
            "fail_bits",
            "keep",
        ).alias("v"),
    )
