"""The end-to-end extraction pipeline as a Spark plan.

Shape (SURVEY.md §3.6): pages scan -> resume anti-join -> salted
repartition on url-hash -> mapInPandas OCR stage (decode + det + order +
crop + rec + CTC + drop_score, all inside one Arrow-batched UDF so crops
never cross the Arrow boundary) -> per-row results + per-partition audit
rows.

Scale notes (the parts that matter at 10^12 docs / 1000 executors):
- The only shuffle is the salted repartition; everything downstream is
  narrow. Salting key = pmod(xxhash64(url), P) so host-heavy url prefixes
  spread evenly (BASELINE.json north_rule).
- Multi-page payloads explode to pages *inside* the UDF before the heavy
  kernels, so one fat PDF can't serialize a task (the per-page loop is
  the unit of work, and pages of one doc stay in one task only because
  they share a payload row — acceptable because page count is capped).
- Engine (model) instances are process-level singletons per python
  worker — the reference caches predictors the same way
  (tools/infer/utility.py create_predictor called once per process).
  With real ONNX weights this is where the broadcast bytes get
  materialized into a session.
- Results carry per-row stage timings; `audit_rows` aggregates them per
  partition for the lineage/audit table (north_star). Resume is an
  anti-join of committed urls (Iceberg MERGE/snapshot in production;
  parquet directory in the sandbox).
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RESULTS_SCHEMA = (
    "url string, img_idx int, "
    "spans array<struct<box: array<array<float>>, text: string, score: float>>, "
    "extracted_text string, n_spans int, "
    "decode_ms double, det_ms double, rec_ms double"
)

AUDIT_SCHEMA = (
    "run_id string, partition_id int, url_count long, page_count long, "
    "ok_count long, err_count long, decode_ms double, det_ms double, "
    "rec_ms double, wall_ms double, ts timestamp"
)

_ENGINE = None  # per-python-worker singleton


def _get_engine():
    global _ENGINE
    if _ENGINE is None:
        from paddleocr_spark.kernels.ocr import OcrEngine

        _ENGINE = OcrEngine()
    return _ENGINE


def _ocr_batches(
    batches: Iterator[pd.DataFrame],
    page_limit: int,
    orient: bool = False,
    weights_bc=None,
) -> Iterator[pd.DataFrame]:
    """Install broadcast model weights for the duration of this task,
    then run the OCR loop. Install-and-restore (not install-forever):
    python workers are reused across queries, and a task must not leak
    its weights into later tasks that bypass extract_pages. This is the
    ship-weights-once deployment pattern (north_star 'broadcast model
    weights'); with ONNX models the session would load the broadcast
    bytes here."""
    if weights_bc is None:
        yield from _ocr_batches_run(batches, page_limit, orient)
        return
    blob = weights_bc.value
    from paddleocr_spark.kernels.onnx_models import (
        is_onnx_bundle,
        onnx_engine_models,
        split_onnx_bundle,
    )

    if is_onnx_bundle(blob):
        # ONNX bundle: materialize per-process cached sessions from the
        # broadcast bytes (onnx_rt.session_for — the create_predictor
        # analogue) and swap them into the worker's engine singleton for
        # the duration of this task; restore after, since workers are
        # reused across queries.
        from paddleocr_spark.kernels.onnx_rt import session_for

        engine = _get_engine()
        parts = split_onnx_bundle(blob)
        det_b, rec_b = parts[0], parts[1]
        prev_models = (
            engine.det_model,
            engine.rec_model,
            getattr(engine, "cls_model", None),
        )
        engine.det_model, engine.rec_model = onnx_engine_models(
            det_b, rec_b, engine.cfg.det, engine.cfg.rec
        )
        if len(parts) > 2:  # three-model bundle: det + rec + cls
            from paddleocr_spark.kernels.onnx_models import OnnxClsModel

            engine.cls_model = OnnxClsModel(session_for(parts[2]))
        try:
            yield from _ocr_batches_run(batches, page_limit, orient)
        finally:
            engine.det_model, engine.rec_model, engine.cls_model = prev_models
        return
    from paddleocr_spark.kernels import font as _font

    prev = _font.TEMPLATES
    _font.load_weights(blob)
    try:
        yield from _ocr_batches_run(batches, page_limit, orient)
    finally:
        _font.TEMPLATES = prev


_BINARY_MAGIC = (
    b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"%PDF", b"RIFF",
    b"II*\x00", b"MM\x00*", b"MPNG",
)


def _sniff_html(payload: bytes) -> bool:
    """Cheap per-payload content sniff: binary magic wins, else an HTML
    marker in the first 8 KiB (long XML prologs / comment banners before
    <html> are legitimate; see job.py's --wat fail-fast sniff)."""
    if payload.startswith(_BINARY_MAGIC):
        return False
    head = payload[:8192].lstrip().lower()
    return (
        head.startswith(b"<!doctype") or head.startswith(b"<html")
        or b"<html" in head or b"<head" in head or b"<body" in head
    )


def _ocr_batches_run(
    batches: Iterator[pd.DataFrame], page_limit: int, orient: bool = False
) -> Iterator[pd.DataFrame]:
    from paddleocr_spark.kernels.cls import orient_page
    from paddleocr_spark.kernels.det import detect_lines
    from paddleocr_spark.kernels.geometry import sorted_boxes
    from paddleocr_spark.kernels.multipage import decode_payload
    from paddleocr_spark.kernels.ocr import get_rotate_crop_image
    from paddleocr_spark.kernels.pdf import pdf_text_pages
    from paddleocr_spark.kernels.rec import recognize_crops

    from paddleocr_spark.operators.html_extract import extract_main_text

    engine = _get_engine()
    for pdf in batches:
        rows: list[dict] = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            t0 = time.perf_counter()
            payload = bytes(payload)
            if _sniff_html(payload):
                # html-bearing page: DOM text-density main-content strip
                # (north_star's boilerplate branch) instead of the OCR
                # chain — one unified job handles Common-Crawl HTML and
                # scanned PNG/PDF payloads side by side.
                try:
                    main = extract_main_text(
                        payload.decode("utf-8", errors="replace")
                    )
                except Exception:
                    main = ""
                rows.append(
                    dict(
                        url=url, img_idx=0, spans=[],
                        extracted_text=main, n_spans=0,
                        decode_ms=(time.perf_counter() - t0) * 1000.0,
                        det_ms=0.0, rec_ms=0.0,
                    )
                )
                continue
            if payload[:5] == b"%PDF-":
                # born-digital triage (the reference's text-vs-scan
                # router, kernels/pdf.pdf_text_pages): a PDF whose every
                # page carries text-show operators extracts WITHOUT
                # OCR — the cheapest correct path for the huge
                # born-digital share of a web corpus. Any page without
                # a text layer (or a malformed PDF) falls through to
                # the scan path below; mixed documents pay OCR rather
                # than silently dropping their scanned pages.
                try:
                    texts = pdf_text_pages(payload)
                except Exception:
                    texts = None
                if texts and all(t is not None for t in texts):
                    if page_limit:
                        texts = texts[:page_limit]
                    t1 = time.perf_counter()
                    for idx, text in enumerate(texts):
                        rows.append(
                            dict(
                                url=url, img_idx=idx, spans=[],
                                extracted_text=text, n_spans=0,
                                decode_ms=(t1 - t0) * 1000.0
                                / max(len(texts), 1),
                                det_ms=0.0, rec_ms=0.0,
                            )
                        )
                    continue
            try:
                pages = decode_payload(payload, page_limit)
            except Exception:
                rows.append(
                    dict(
                        url=url, img_idx=-1, spans=[], extracted_text="",
                        n_spans=0, decode_ms=0.0, det_ms=0.0, rec_ms=0.0,
                    )
                )
                continue
            t1 = time.perf_counter()
            for idx, img in enumerate(pages):
                d0 = time.perf_counter()
                if orient:
                    # fork's prioritized rotation sweep (fastapi_app.py
                    # :304-455): try angles, score by rec confidence,
                    # early-exit — multiplies det cost, so opt-in only.
                    img, _angle = orient_page(
                        img,
                        lambda im: detect_lines(im, engine.det_model),
                        get_rotate_crop_image,
                        engine.rec_model,
                        cls_model=getattr(engine, "cls_model", None),
                    )
                boxes, _ = detect_lines(img, engine.det_model)
                boxes = sorted_boxes(boxes)
                crops = [get_rotate_crop_image(img, b) for b in boxes]
                d1 = time.perf_counter()
                rec_res = recognize_crops(crops, engine.rec_model)
                d2 = time.perf_counter()
                spans = [
                    {
                        "box": [[float(x), float(y)] for x, y in b],
                        "text": t,
                        "score": float(s),
                    }
                    for b, (t, s) in zip(boxes, rec_res)
                    if s >= engine.cfg.drop_score
                ]
                rows.append(
                    dict(
                        url=url,
                        img_idx=idx,
                        spans=spans,
                        extracted_text="\n".join(s["text"] for s in spans),
                        n_spans=len(spans),
                        decode_ms=(t1 - t0) * 1000.0 / max(len(pages), 1),
                        det_ms=(d1 - d0) * 1000.0,
                        rec_ms=(d2 - d1) * 1000.0,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "img_idx", "spans", "extracted_text", "n_spans",
                "decode_ms", "det_ms", "rec_ms",
            ],
        )


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Spread host-skewed urls: repartition on the url's 64-bit salt.

    Partitioning on xxhash64(url) (NOT on pmod(hash, P) — re-hashing a
    small int into P buckets leaves ~1/e of them empty) gives a uniform
    spread that is independent of url host structure, so a host that
    dominates the corpus cannot pin one executor (north_rule)."""
    return df.repartition(num_partitions, F.xxhash64(F.col("url")))


def extract_pages(
    pages: DataFrame,
    num_partitions: int | None = None,
    page_limit: int = 0,
    orient: bool = False,
    weights: bytes | None = None,
    backend: str = "stub",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> results DataFrame.

    The recognition weights ship as a Spark broadcast: serialized once
    on the driver (kernels/font.export_weights, a caller-supplied blob,
    or — backend='onnx' — a genuine ONNX model bundle exported by
    kernels/onnx_models.build_onnx_bundle), installed per executor
    before inference — so a driver-side weight change genuinely
    propagates (tests/test_pipeline_spark.py pins this with perturbed
    weights on BOTH backends)."""
    from paddleocr_spark.kernels.font import export_weights

    df = pages.select("url", "html")  # column prune before the shuffle
    if num_partitions:
        df = salted_repartition(df, num_partitions)
    if weights is None:
        if backend == "onnx":
            from paddleocr_spark.kernels.onnx_models import build_onnx_bundle

            weights = build_onnx_bundle()
        else:
            weights = export_weights()
    bc = pages.sparkSession.sparkContext.broadcast(weights)
    return df.mapInPandas(
        lambda it: _ocr_batches(it, page_limit, orient, bc),
        schema=RESULTS_SCHEMA,
    )


def audit_rows(results: DataFrame, run_id: str | None = None) -> DataFrame:
    """Per-partition lineage/metrics rows (FIXTURES.md §6)."""
    rid = run_id or uuid.uuid4().hex
    return (
        results.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.countDistinct("url").alias("url_count"),
            F.count(F.lit(1)).alias("page_count"),
            F.sum(F.when(F.col("img_idx") >= 0, 1).otherwise(0)).alias("ok_count"),
            F.sum(F.when(F.col("img_idx") < 0, 1).otherwise(0)).alias("err_count"),
            F.sum("decode_ms").alias("decode_ms"),
            F.sum("det_ms").alias("det_ms"),
            F.sum("rec_ms").alias("rec_ms"),
            (F.sum("decode_ms") + F.sum("det_ms") + F.sum("rec_ms")).alias("wall_ms"),
        )
        .withColumn("run_id", F.lit(rid))
        .withColumn("ts", F.current_timestamp())
        .select(
            "run_id", "partition_id", "url_count", "page_count", "ok_count",
            "err_count", "decode_ms", "det_ms", "rec_ms", "wall_ms", "ts",
        )
    )


def tsv_lines(results: DataFrame) -> DataFrame:
    """The reference's system_results.txt line format
    (tools/infer/predict_system.py:244-267,304-307):
    `<name>\\t<json [{"transcription": ..., "points": [[x,y]x4]}]>` —
    built entirely JVM-side with to_json over the spans column. Write
    with df.write.text() for a drop-in replacement of the TSV sink."""
    payload = F.to_json(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["text"].alias("transcription"), s["box"].alias("points")
            ),
        )
    )
    return results.select(
        F.concat_ws("\t", F.col("url"), payload).alias("value")
    )


def resume_filter(pages: DataFrame, results_path: str) -> DataFrame:
    """Idempotent resume: anti-join urls already committed to the results
    sink (Iceberg snapshot anti-join / MERGE INTO in production)."""
    spark = pages.sparkSession
    if not os.path.exists(results_path):
        return pages
    # recursiveFileLookup reads every committed file regardless of sink
    # layout generation (flat part-files, partitionBy dirs, or run_id=
    # subdir appends) — plain partition discovery would raise
    # 'Conflicting directory structures' on a mixed-layout sink and
    # crash the resume contract instead of committing nothing.
    done = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(results_path)
        .select("url")
        .distinct()
    )
    return pages.join(done, "url", "left_anti")


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    results_path: str,
    audit_path: str,
    num_partitions: int | None = None,
    run_id: str | None = None,
    resume: bool = True,
    **extract_kwargs,
) -> None:
    """Full job: resume -> extract -> append results + audit.
    `extract_kwargs` pass through to `extract_pages` (page_limit,
    orient, weights)."""
    rid = run_id or uuid.uuid4().hex
    todo = resume_filter(pages, results_path) if resume else pages
    results = extract_pages(todo, num_partitions, **extract_kwargs).withColumn(
        "run_id", F.lit(rid)
    )
    # Append into an EXPLICIT run_id= subdirectory (not partitionBy):
    # same physical layout, but no partition discovery is involved at
    # write time, and the audit read-back below addresses exactly this
    # run's files by path — pruned by construction even if the sink root
    # carries older layout generations (a pre-partitioning flat sink
    # would make partition discovery raise 'Conflicting directory
    # structures'). run_id stays IN the data files, so recursive reads
    # of old and new generations both work.
    run_dir = os.path.join(results_path, f"run_id={rid}")
    results.write.mode("append").parquet(run_dir)
    # Audit THIS run's increment only — auditing the whole committed
    # sink was a full-table scan per resume cycle at 10^12 docs AND
    # double-counted prior runs' pages under the new run_id.
    # (Aggregating the lazy `results` frame instead would re-execute
    # the entire OCR stage just for the audit.)
    committed_run = spark.read.parquet(run_dir)
    audit_rows(committed_run.drop("run_id"), rid).write.mode("append").parquet(
        audit_path
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 128
) -> None:
    """Persist a table bucketed (and sorted) by `key` so repeated joins
    and aggregations on that key read co-located, pre-sorted buckets —
    no Exchange in the join plan (pinned by tests/test_plan_shape.py).
    At 100 TB this converts the per-query shuffle of a hot join key
    (e.g. url-hash <-> extraction results) into a one-time layout cost,
    the Spark-native analogue of the reference's per-directory sharding
    (tools/infer/utility.py --use_mp round-robin)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    shards_per_partition: int = 4,
    partition_col: str = "lang",
    order_col: str = "url",
) -> None:
    """Final training-data export layout: directory-partitioned by a
    low-cardinality column (lang/crawl-date — readers prune whole
    directories, Spark's PartitionFilters), a FIXED shard count inside
    each partition (downstream loaders want stable, same-sized file
    lists, not one file per reduce task), and rows sorted by `order_col`
    WITHIN each shard (SURT-ordered urls put one host's pages adjacent —
    the locality web-archive layouts use, without any global sort).
    File-count contract: AT MOST shards_per_partition files per
    directory (hash collisions may merge two shards into one file;
    the explicit task count stops AQE from merging them all).

    Plan shape: one repartition Exchange on (partition_col,
    hash(order_col) % shards) then sortWithinPartitions — no global
    ordering anywhere, so the write scales linearly with executors. At
    100 TB, tune shards_per_partition so a shard lands near the 1 GiB
    object-store sweet spot."""
    # one cheap metadata-scale job: partition values are low-cardinality
    # by contract (lang / crawl-date), so this count is tiny
    n_parts = df.select(partition_col).distinct().count()
    n_tasks = max(n_parts * shards_per_partition, 1)
    shard = F.pmod(F.xxhash64(F.col(order_col)), F.lit(shards_per_partition))
    tmp = "__ets_shard"  # collision-proof vs caller columns
    (
        df.withColumn(tmp, shard)
        # EXPLICIT task count: without it AQE coalesces the exchange and
        # merges every shard of a partition into one file. Hash
        # collisions of (partition, shard) combos can still merge two
        # shards into one larger file — the guarantee is AT MOST
        # shards_per_partition files per directory, never skew across
        # directories.
        .repartition(n_tasks, F.col(partition_col), F.col(tmp))
        # sort by (partition, order) — the shard column only bounds the
        # file count; the file itself must be order_col-sorted
        .sortWithinPartitions(partition_col, order_col)
        .drop(tmp)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(out_dir)
    )
