"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.10); its "resume" is
re-running over the input directory. Here the same extraction plan runs
as an incremental job: a file-source stream of pages parquet ->
`mapInPandas` OCR stage -> parquet sink, with exactly-once progress
tracked by the checkpoint (file-source log + sink commit log). That is
the Spark-native form of the north_rule's "resumable from checkpoint":
restarting after a crash re-processes only unfinished files, and
`Trigger.AvailableNow` drains the backlog then stops (batch-like runs on
a streaming ledger).

The audit variant uses foreachBatch so each micro-batch writes results
AND per-partition audit rows (plans/pipeline.audit_rows) in the same
epoch — the lineage/metrics contract of the batch job, kept in
streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from paddleocr_spark.plans.pipeline import audit_rows, extract_pages
from paddleocr_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a directory of pages parquet files.
    maxFilesPerTrigger bounds micro-batch size so one giant backlog
    can't blow executor memory at 10^12-doc scale."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        # landing dirs accumulate _SUCCESS markers / partial uploads;
        # without the glob a single non-parquet file kills the query
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_dir)
    )


def stream_extract(
    spark: SparkSession,
    source_dir: str,
    results_path: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    page_limit: int = 0,
    orient: bool = False,
    weights: bytes | None = None,
) -> StreamingQuery:
    """pages stream -> OCR -> parquet sink; AvailableNow drains & stops."""
    pages = read_pages_stream(spark, source_dir)
    results = extract_pages(
        pages, num_partitions=num_partitions, page_limit=page_limit,
        orient=orient, weights=weights,
    )
    return (
        results.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_extract_with_audit(
    spark: SparkSession,
    source_dir: str,
    results_path: str,
    audit_path: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    page_limit: int = 0,
    orient: bool = False,
    weights: bytes | None = None,
) -> StreamingQuery:
    """foreachBatch variant: results + audit rows per micro-batch epoch
    (batch_id recorded as the run_id for lineage)."""
    pages = read_pages_stream(spark, source_dir)
    results = extract_pages(
        pages, num_partitions=num_partitions, page_limit=page_limit,
        orient=orient, weights=weights,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(results_path)
            audit_rows(batch_df, run_id=f"epoch-{batch_id}").write.mode(
                "append"
            ).parquet(audit_path)
        finally:
            batch_df.unpersist()

    return (
        results.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_stateful_dedup(
    spark: SparkSession,
    source_dir: str,
    results_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Custom STATEFUL streaming operator (applyInPandasWithState): an
    incremental exact-dedup ledger. Pages stream in grouped by a content
    fingerprint key; per-key GroupState carries (min_url, n_docs) across
    micro-batches, and every batch that touches a key emits the key's
    UPDATED running state.

    The emission history depends on how the file source slices
    micro-batches, but both state fields are monotone merges (min,
    count), so the per-key LAST state — equivalently min(first_url),
    max(n_docs) over all emissions — is invariant to the batch split.
    `stateful_dedup_view` below collapses the ledger to that final view,
    which is exactly the batch GROUP BY the DuckDB oracle runs: a
    STRICT correctness gate over a genuinely stateful streaming plan
    (state store + checkpoint + AvailableNow restart semantics).
    """
    import pandas as pd

    pages = read_pages_stream(spark, source_dir).selectExpr(
        "upper(substring(regexp_replace(text, '[^a-zA-Z0-9]', ''), 1, 8)) AS key",
        "url",
    )

    def update(key, pdfs, state):
        if state.exists:
            min_url, count = state.get
        else:
            min_url, count = None, 0
        for pdf in pdfs:
            for u in pdf["url"]:
                count += 1
                if min_url is None or u < min_url:
                    min_url = u
        state.update((min_url, count))
        yield pd.DataFrame(
            {"key": [key[0]], "first_url": [min_url], "n_docs": [count]}
        )

    ledger = pages.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key string, first_url string, n_docs long",
        stateStructType="min_url string, count long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return (
        ledger.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_host_counts(
    spark: SparkSession,
    source_dir: str,
    results_path: str,
    checkpoint_dir: str,
    window_secs: int = 600,
    delay_secs: int = 1800,
) -> StreamingQuery:
    """Event-time tumbling-window aggregation with a WATERMARK — the
    late-data-tolerant streaming shape the batch engine has no analogue
    for: per (host, 10-min window) capture counts over `warc_ts`,
    where captures arriving up to `delay_secs` late still land in their
    event-time window, and state for closed windows is dropped (bounded
    state at any stream length — the scale property; without the
    watermark, window state grows forever).

    Append mode emits a window exactly once, when the watermark passes
    its end. Under AvailableNow the no-data final micro-batch
    (spark.sql.streaming.noDataMicroBatches, default on) advances the
    watermark to max(event_time) - delay, so the emitted set is exactly
    {windows with end <= max(warc_ts) - delay} REGARDLESS of how the
    file source sliced micro-batches — the invariant the strict pytest
    oracle checks against the batch GROUP BY."""
    from pyspark.sql import functions as F

    pages = read_pages_stream(spark, source_dir).select(
        F.expr("lower(element_at(split(element_at(split(url, '://'), 2), '/'), 1))").alias("host"),
        "warc_ts",
    )
    agg = (
        pages.withWatermark("warc_ts", f"{delay_secs} seconds")
        .groupBy(
            F.window("warc_ts", f"{window_secs} seconds").alias("w"),
            "host",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_caps"))
        .select(
            "host",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_caps",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stateful_dedup_view(spark: SparkSession, results_path: str) -> DataFrame:
    """Collapse the emission ledger to the batch-split-invariant final
    state per key (see stream_stateful_dedup)."""
    from pyspark.sql import functions as F

    led = spark.read.parquet(results_path)
    return led.groupBy("key").agg(
        F.min("first_url").alias("first_url"),
        F.max("n_docs").cast("long").alias("n_docs"),
    )


def snapshot_batch_sink(table_root: str):
    """foreachBatch body with EXACTLY-ONCE semantics over the
    snapshot table (plans/snapshots.py). Plain foreachBatch is
    at-least-once: a crash after the parquet append but before the
    checkpoint commit re-delivers the batch and appends it twice. Here
    every commit records its batch_id in the manifest summary, and a
    re-delivered batch whose id is already committed SKIPS — the
    transactional-sink pattern (Delta's txnAppId/txnVersion), built on
    the same atomic manifest publish the batch job uses. Results and
    the epoch's audit rows land in ONE commit, so replay can never
    split them."""
    from paddleocr_spark.plans import snapshots as snap

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        done = snap.watermark(table_root, key="batch_id")
        if done is not None and batch_id <= done:
            return  # replayed epoch: already committed, drop it
        res_branch = snap._write_branch(batch_df, table_root, "results")
        if not res_branch[0]:
            return  # empty epoch: no files, no snapshot
        import json as _json

        from pyspark.sql.types import StructType as _St

        committed = batch_df.sparkSession.read.schema(
            _St.fromJson(_json.loads(res_branch[1]))
        ).parquet(*[f["path"] for f in res_branch[0]])
        audit_branch = snap._write_branch(
            audit_rows(committed, run_id=f"epoch-{batch_id}"),
            table_root,
            "audit",
        )
        snap.commit(
            table_root,
            {"results": res_branch, "audit": audit_branch},
            summary={
                "batch_id": batch_id,
                "run_id": f"epoch-{batch_id}",
                "added_rows": sum(f["rows"] for f in res_branch[0]),
            },
        )

    return sink


def stream_extract_snapshot(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    page_limit: int = 0,
    orient: bool = False,
    weights: bytes | None = None,
) -> StreamingQuery:
    """stream_extract_with_audit, but the sink is the snapshot table:
    each micro-batch is one atomic results+audit commit, idempotent
    under foreachBatch replay (see snapshot_batch_sink)."""
    pages = read_pages_stream(spark, source_dir)
    results = extract_pages(
        pages, num_partitions=num_partitions, page_limit=page_limit,
        orient=orient, weights=weights,
    )
    return (
        results.writeStream.foreachBatch(snapshot_batch_sink(table_root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
