"""End-to-end corpus curation job: the production composition of the
funnel (functions/curation.corpus_verdicts), sequence packing
(functions/text.pack_assignments) and the partitioned shard export
(plans/pipeline.export_training_shards) into ONE CLI-invocable run —
the "raw crawl table in, training shards out" job a FineWeb/CCNet-style
build actually executes (filter -> dedup -> pack -> shard), with the
per-stage funnel report written alongside the shards.

Output layout under `out_dir`:

    shards/lang=<l>/part-*.parquet   <= shards_per_partition files per
                                        lang dir, doc_id-sorted within
                                        each file (PartitionFilters
                                        prune whole languages)
    funnel_report.parquet            (stage, n_docs) — the drop funnel
                                        incl. 'kept'

Scale shape (the part that matters at 10^12 docs):
- verdicts are computed once and localCheckpointed — the slim
  (doc_id, stage, keep) frame is BOTH the report input and the
  survivor filter, and at production scale it is the lineage table a
  curation run persists anyway.
- text is joined back to survivors by ONE doc_id equi-join (the
  verdict subtree never shuffles document text — only the token
  hashes its SimHash needs); the joined survivor frame is
  checkpointed once (the curated-corpus stage boundary every
  production pipeline persists between dedup and tokenize) and then
  flows through exactly one more Exchange: the (lang, shard)
  repartition inside export_training_shards. No window, no sort, no
  collect touches the text column.
- pack bins ride the survivor join output (two-phase prefix sum —
  bounded window partitions + a broadcast offsets table), so the bin
  assignment adds no corpus-scale shuffle of its own.

Reference behavior composed: RefinedWeb's filter-then-dedup ordering
(Penedo et al. 2023) with Lee et al. 2022 keep-lowest-id dedup, packed
GPT-style (Brown et al. 2020 appendix B) and exported in the
directory-partitioned fixed-shard layout loaders expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.functions.curation import corpus_verdicts
from paddleocr_spark.functions.text import pack_assignments
from paddleocr_spark.plans.pipeline import export_training_shards
from paddleocr_spark.sources.scan import scan_parquet


def curate_job(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    shards_per_partition: int = 4,
    train_quality: bool = False,
) -> dict:
    """Run the full curation funnel over `{sf_dir}/documents.parquet`
    and write training shards + the funnel report under `out_dir`.
    Returns {"stages": {stage: n_docs}, "kept": n, "total": n}.

    train_quality=True runs the DCLM-style train-then-filter
    composition: the averaged perceptron is trained on THIS corpus
    against the Gopher bootstrap labels (functions/clftrain.py), the
    decision threshold is calibrated (exact Youden argmax), and the
    funnel's quality stage scores with the TRAINED weights instead of
    the untrained hashed stand-in. Adds CLF_EPOCHS+1 bounded driver
    round-trips (weights + one calibration row) before the funnel —
    the kmeans centroid-collect contract, nothing corpus-sized."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    quality_expr, quality_tau = None, 0
    if train_quality:
        from pyspark.sql import functions as _F

        from paddleocr_spark.functions.clftrain import (
            _score_expr,
            calibrate_rows,
            train_perceptron,
            trained_quality_expr,
        )

        w, b, _trace, base = train_perceptron(spark, sf_dir)
        scored = base.select(
            (_F.col("y") == 1).cast("long").alias("keep"),
            _score_expr(w, b).alias("sum_w"),
        )
        (v,) = [r["v"] for r in calibrate_rows(scored).collect()]
        quality_expr = trained_quality_expr(w, b)
        quality_tau = int(v.split("|")[0])
    # checkpoint: the verdict subtree (token explode -> SimHash groupBy
    # -> fp window) is referenced by the report AND the survivor join;
    # without truncation it would run twice (repo discipline — the
    # caller-owned-plan rule from dedup_clusters/redirects).
    verdicts = corpus_verdicts(
        docs, quality_sum_expr=quality_expr, quality_tau=quality_tau
    ).localCheckpoint()

    report = verdicts.groupBy("stage").agg(F.count("*").alias("n_docs"))
    report.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/funnel_report.parquet"
    )

    # The survivor frame is referenced twice (pack-side token count +
    # final output) and column pruning would defeat ReuseExchange on
    # the doc_id join underneath, recomputing it — checkpoint once. At
    # production scale this materialization IS the curated-corpus stage
    # boundary every pipeline persists between dedup and tokenize.
    survivors = docs.join(
        verdicts.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    ).localCheckpoint()
    packed = pack_assignments(survivors.select("doc_id", "text"))
    out = survivors.join(packed, "doc_id").select(
        "doc_id", "lang", "source", "text", "n_tokens", "bin", "bin_offset"
    )
    export_training_shards(
        out,
        f"{out_dir}/shards",
        shards_per_partition=shards_per_partition,
        partition_col="lang",
        order_col="doc_id",
    )

    stages = {r["stage"]: r["n_docs"] for r in report.collect()}
    return {
        "stages": stages,
        "kept": stages.get("kept", 0),
        "total": sum(stages.values()),
    }
