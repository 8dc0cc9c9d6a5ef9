"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators: dedup / similarity / text analysis);
oracle_sql() holds the DuckDB twin for each. Column names and types are
aligned on both sides (integers -> BIGINT, floats -> DOUBLE, explicit
aliases) because the driver hash-compares values after sorting columns
by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"

_URL_EXPR_SQL = (
    "concat('https://', source, '.example.test/doc/', CAST(doc_id AS varchar))"
)
_NORM_SQL = "upper(substring(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'), 1, {n}))"


def _ocr_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: render documents -> pages(url, warc_ts, html, text, lang)
    -> salted repartition -> mapInPandas OCR (det+order+crop+rec+CTC) ->
    per-url extracted text. joined_text strips the line breaks so the
    oracle is plain SQL over `documents` (see sources/pages.py contract)."""
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    ncpu = spark.sparkContext.defaultParallelism
    res = extract_pages(pages, num_partitions=ncpu)
    return res.select(
        "url",
        F.regexp_replace("extracted_text", "\n", "").alias("joined_text"),
        F.col("n_spans").cast("long").alias("n_lines"),
    )


_OCR_EXTRACT_SQL = f"""
SELECT {_URL_EXPR_SQL} AS url,
       {_NORM_SQL.format(n=120)} AS joined_text,
       CAST(ceil(length({_NORM_SQL.format(n=120)}) / 24.0) AS bigint) AS n_lines
FROM documents
"""


def _ocr_multipage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF-analogue: multi-page payloads explode to one row per page with
    img_idx, each page OCR'd independently."""
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir, multipage=True)
    ncpu = spark.sparkContext.defaultParallelism
    res = extract_pages(pages, num_partitions=ncpu)
    return res.select(
        "url",
        F.col("img_idx").cast("long").alias("img_idx"),
        F.regexp_replace("extracted_text", "\n", "").alias("page_text"),
    )


def _ocr_multipage_sql() -> str:
    parts = []
    for k in range(3):
        start = k * 120 + 1
        parts.append(
            f"SELECT {_URL_EXPR_SQL} AS url, CAST({k} AS bigint) AS img_idx,\n"
            f"       substring({_NORM_SQL.format(n=300)}, {start}, 120) AS page_text\n"
            f"FROM documents\n"
            f"WHERE length({_NORM_SQL.format(n=300)}) {'>' if k else '>='} {k * 120}"
        )
    return " UNION ALL ".join(parts)


def _ocr_extract_onnx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship path with REAL ONNX inference: the driver exports
    genuine .onnx model bytes (kernels/onnx_models — protobuf wire
    format a stock onnxruntime loads unchanged), broadcasts them, and
    every executor runs det + rec through per-process cached numpy
    ONNX sessions (kernels/onnx_rt). Same byte-exact oracle as
    ocr_extract_text: the exported weights are proven float32-exact
    equivalents of the deterministic stand-ins."""
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    ncpu = spark.sparkContext.defaultParallelism
    res = extract_pages(pages, num_partitions=ncpu, backend="onnx")
    return res.select(
        "url",
        F.regexp_replace("extracted_text", "\n", "").alias("joined_text"),
        F.col("n_spans").cast("long").alias("n_lines"),
    )


def _ocr_extract_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upside-down scans through the fork's rotation sweep
    (kernels/cls.orient_page): pages rendered at 180°, the pipeline must
    recover the SAME text as the upright corpus — on BOTH backends,
    union-tagged into one board row (the 50-row board cap discipline):
    'probe' scores angles by rec read-confidence; 'onnx' runs the whole
    model chain from the broadcast bundle — deep DB det graph, rec
    template head, AND the cls 0/180 text-direction net
    (kernels/onnx_models.build_cls_onnx) scoring the probes through the
    per-process session cache. Either backend mis-rotating ANY page
    fails the row."""
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    # rotate180 corpora bypass the bench's pages cache, and BOTH backend
    # legs consume this frame — checkpoint so the corpus renders once,
    # not once per leg
    pages = pages_from_documents(
        spark, sf_dir, rotate180=True
    ).localCheckpoint()
    ncpu = spark.sparkContext.defaultParallelism
    out = None
    for backend in ("probe", "onnx"):
        res = extract_pages(
            pages, num_partitions=ncpu, orient=True,
            backend="onnx" if backend == "onnx" else "stub",
        ).select(
            "url",
            F.lit(backend).alias("backend"),
            F.regexp_replace("extracted_text", "\n", "").alias("joined_text"),
        )
        out = res if out is None else out.unionByName(res)
    return out


# plain upright-text oracle (streaming_incremental_extract)
_OCR_UPRIGHT_SQL = f"""
SELECT {_URL_EXPR_SQL} AS url,
       {_NORM_SQL.format(n=120)} AS joined_text
FROM documents
"""

# both orientation backends against the same upright text
_OCR_ORIENTED_SQL = f"""
SELECT {_URL_EXPR_SQL} AS url, b.backend,
       {_NORM_SQL.format(n=120)} AS joined_text
FROM documents, (SELECT 'probe' AS backend UNION ALL SELECT 'onnx') b
"""


def _html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule dispatch in ONE extract_pages job over a MIXED
    Common-Crawl corpus: docs with doc_id%8 < 4 arrive as synthetic HTML
    pages (all four boilerplate layouts — seed%4 covers every residue),
    doc_id%8 in (4,5) as rendered PNG scans, and doc_id%8 in (6,7) as
    born-digital PDFs (real BT..ET text objects across all four
    content-stream encodings). The pipeline's per-payload triage must
    route HTML through the Readability-style DOM text-density strip
    (byte-exact main text, n_spans 0), scans through the OCR chain
    (normalized golden), and text-layer PDFs through the content-stream
    interpreter WITHOUT OCR (byte-exact page text, one row per page) —
    a misroute anywhere produces '' and reds the row."""
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import (
        html_pages_from_documents,
        pages_from_documents,
        text_pdf_pages_from_documents,
    )

    did = F.element_at(F.split("url", "/"), -1).cast("long")
    mixed = (
        html_pages_from_documents(spark, sf_dir).where(did % 8 < 4)
        .unionByName(
            pages_from_documents(spark, sf_dir).where((did % 8).isin(4, 5))
        )
        .unionByName(
            text_pdf_pages_from_documents(spark, sf_dir).where(did % 8 >= 6)
        )
    )
    res = extract_pages(
        mixed, num_partitions=spark.sparkContext.defaultParallelism
    )
    kind = (
        F.when(did % 8 < 4, F.lit("html"))
        .when((did % 8).isin(4, 5), F.lit("ocr"))
        .otherwise(F.lit("pdf"))
    )
    return res.select(
        "url",
        kind.alias("kind"),
        F.col("img_idx").cast("long").alias("img_idx"),
        F.when(kind == "ocr", F.regexp_replace("extracted_text", "\n", ""))
        .otherwise(F.col("extracted_text"))
        .alias("main_text"),
        F.col("n_spans").cast("long").alias("n_lines"),
    )


def _html_main_sql() -> str:
    from paddleocr_spark.operators.media import _PDF_TEXT_CODES

    return f"""
SELECT {_URL_EXPR_SQL} AS url, 'html' AS kind, CAST(0 AS bigint) AS img_idx,
       text AS main_text, CAST(0 AS bigint) AS n_lines
FROM documents WHERE doc_id % 8 < 4
UNION ALL
SELECT {_URL_EXPR_SQL} AS url, 'ocr' AS kind, CAST(0 AS bigint) AS img_idx,
       {_NORM_SQL.format(n=120)} AS main_text,
       CAST(ceil(length({_NORM_SQL.format(n=120)}) / 24.0) AS bigint)
         AS n_lines
FROM documents WHERE doc_id % 8 IN (4, 5)
UNION ALL
SELECT {_URL_EXPR_SQL} AS url, 'pdf' AS kind, CAST(g.k AS bigint) AS img_idx,
       (SELECT string_agg(CASE WHEN p.p % 41 = 40 THEN chr(10)
                   ELSE chr(list_extract({_PDF_TEXT_CODES},
                        ((d.doc_id * 7 + g.k * 13 +
                          ((p.p // 41) * 40 + (p.p % 41)) * 3) % 32) + 1))
                   END, '' ORDER BY p.p)
        FROM generate_series(0, 121) p(p)) AS main_text,
       CAST(0 AS bigint) AS n_lines
FROM documents d, generate_series(0, 1) g(k)
WHERE d.doc_id % 8 >= 6 AND g.k < 1 + d.doc_id % 2
"""


_HTML_MAIN_SQL = _html_main_sql()


def _stream_scratch(spark, prefix: str, sf_dir: str, splits: int) -> str:
    """Keyed, reusable scratch area for the streaming queries (landing /
    sink / checkpoint), keyed by corpus identity like the bench pages
    cache — NOT a fresh uuid per run, which accumulated a full rendered
    corpus copy in /tmp on every gate invocation. Stale keys are pruned;
    re-running with the same key resumes from the checkpoint (no new
    files -> zero-batch drain, sink unchanged) — exactly the restart
    semantics the queries exist to demonstrate."""
    import glob
    import os
    import shutil

    from paddleocr_spark.sources.pages import pages_from_documents

    docs = os.path.join(sf_dir, "documents.parquet")
    label = os.path.basename(sf_dir.rstrip("/"))
    key = f"{label}_{int(os.path.getmtime(docs))}"
    base = f"/tmp/{prefix}_{key}"
    landing = f"{base}/in"
    if not os.path.exists(f"{landing}/_SUCCESS"):
        # Prune only SUPERSEDED keys of the SAME corpus label, and only
        # when about to create a new scratch root (bench.py pages-cache
        # discipline). Pruning other labels' keys would let a first run
        # on sf0.01 delete an sf0.1 run's landing/checkpoint mid-stream;
        # a same-label older-mtime key is provably stale (its source
        # corpus no longer exists in that form).
        for stale in glob.glob(f"/tmp/{prefix}_{label}_*"):
            if stale != base:
                shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(base, ignore_errors=True)
        pages_from_documents(spark, sf_dir).repartition(splits).write.mode(
            "overwrite"
        ).parquet(landing)
    return base


def _streaming_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME extraction plan as a checkpointed Structured Streaming
    job (streaming/pipeline.py): pages land as parquet files, a
    file-source stream drains them with Trigger.AvailableNow into a
    parquet sink, and the returned frame reads that sink. Strict oracle:
    byte-identical to the batch path, so the batch SQL twin applies —
    this pins the streaming ledger (checkpoint + commit log) to the
    exact batch semantics instead of a weaker rows-only check."""
    from paddleocr_spark.streaming.pipeline import stream_extract

    base = _stream_scratch(spark, "spark_graft_stream", sf_dir, splits=8)
    q = stream_extract(
        spark, f"{base}/in", f"{base}/out", f"{base}/ckpt", num_partitions=None
    )
    q.awaitTermination()
    res = spark.read.parquet(f"{base}/out")
    return res.select(
        "url", F.regexp_replace("extracted_text", "\n", "").alias("joined_text")
    )


def _streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): the
    incremental dedup ledger of streaming/pipeline.stream_stateful_dedup.
    The landing zone is split into 24 files (maxFilesPerTrigger=8 -> 3
    micro-batches), so 8-char-prefix keys genuinely span batches and the
    per-key GroupState merges across them; the collapsed final view is
    batch-split-invariant and matches the batch GROUP BY oracle."""
    from paddleocr_spark.streaming.pipeline import (
        stateful_dedup_view,
        stream_stateful_dedup,
    )

    base = _stream_scratch(spark, "spark_graft_state", sf_dir, splits=24)
    q = stream_stateful_dedup(spark, f"{base}/in", f"{base}/out", f"{base}/ckpt")
    q.awaitTermination()
    return stateful_dedup_view(spark, f"{base}/out")


_STREAMING_STATEFUL_DEDUP_SQL = f"""
SELECT {_NORM_SQL.format(n=8)} AS key,
       min({_URL_EXPR_SQL}) AS first_url,
       CAST(count(*) AS bigint) AS n_docs
FROM documents
GROUP BY {_NORM_SQL.format(n=8)}
"""


def _slicing_query(name: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from paddleocr_spark.functions import slicing

        return getattr(slicing, name)(spark, sf_dir)

    return run


def _slicing_sql(name: str) -> str:
    from paddleocr_spark.functions import slicing

    return getattr(slicing, name)


def _corrections_chain_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.corrections import ocr_corrections_chain

    return ocr_corrections_chain(spark, sf_dir)


def _ic_ultimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.ic_ultimate import ic_ultimate_extract

    return ic_ultimate_extract(spark, sf_dir)


def _ic_ultimate_sql() -> str:
    from paddleocr_spark.functions.ic_ultimate import IC_ULTIMATE_EXTRACT_SQL

    return IC_ULTIMATE_EXTRACT_SQL


def _det_hmean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.metrics import det_iou_hmean

    return det_iou_hmean(spark, sf_dir)


def _table_teds_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.metrics import table_teds

    return table_teds(spark, sf_dir)


def _metrics_sql(name: str) -> str:
    from paddleocr_spark.functions import metrics

    return getattr(metrics, name)


def _word_boxes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.wordboxes import word_boxes

    return word_boxes(spark, sf_dir)


def _word_boxes_sql() -> str:
    from paddleocr_spark.functions.wordboxes import WORD_BOXES_SQL

    return WORD_BOXES_SQL


def _ic_serving_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.ic_ultimate import ic_serving_from_pages

    return ic_serving_from_pages(spark, sf_dir)


def _layout_detect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.layout import layout_detect

    return layout_detect(spark, sf_dir)


def _layout_detect_sql() -> str:
    from paddleocr_spark.functions.layout import LAYOUT_DETECT_SQL

    return LAYOUT_DETECT_SQL


def _ic_address_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paddleocr_spark.functions.address import ic_address_extract

    return ic_address_extract(spark, sf_dir)


def _ic_address_sql() -> str:
    from paddleocr_spark.functions.address import IC_ADDRESS_EXTRACT_SQL

    return IC_ADDRESS_EXTRACT_SQL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ocr_extract(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from paddleocr_spark.functions import (
        dedup,
        curation,
        fields,
        kmeans,
        relational,
        similarity,
        text,
    )
    from paddleocr_spark.functions import names, recovery, structure
    from paddleocr_spark.operators import media, multimodal

    return {
        # fork field-extraction layer (SURVEY.md §2.8, §2.3 broadcast join)
        "ocr_corrections_chain": _corrections_chain_query,
        "ic_field_extract": fields.ic_field_extract,
        "ic_fields_from_pages": fields.ic_fields_from_pages,
        "ic_name_extract": names.ic_name_extract,
        "ic_ultimate_extract": _ic_ultimate_query,
        "ic_serving_from_pages": _ic_serving_query,
        "ic_address_extract": _ic_address_query,
        "malay_word_split": names.malay_word_split,
        # recovery / metric analogues (SURVEY.md §2.4, §2.5, §2.8)
        "paragraph_merge": recovery.paragraph_merge,
        "markdown_escape": recovery.markdown_escape,
        "doc_markdown_recovery": recovery.doc_markdown_recovery,
        "rtl_reverse": recovery.rtl_reverse,
        "rotation_vote": recovery.rotation_vote,
        "extraction_accuracy": recovery.extraction_accuracy,
        "base64_roundtrip": recovery.base64_roundtrip,
        # PP-Structure analogues (SURVEY.md §2.5): layout reading order,
        # table cell walk -> HTML, fork address assembly
        "layout_detect": _layout_detect_query,
        "sorted_layout_boxes": structure.sorted_layout_boxes,
        "table_html_assembly": structure.table_html_assembly,
        "table_structure_from_pages": structure.table_structure_from_pages,
        "address_assembly": structure.address_assembly,
        "word_boxes": _word_boxes_query,
        "det_iou_hmean": _det_hmean_query,
        "table_teds": _table_teds_query,
        # extraction pipeline (SURVEY.md §2.1, §2.9, §2.11)
        "ocr_extract_text": _ocr_extract,
        "ocr_extract_onnx": _ocr_extract_onnx,
        "ocr_extract_multipage": _ocr_multipage,
        "ocr_extract_oriented": _ocr_extract_oriented,
        "ocr_extract_sliced": _slicing_query("ocr_extract_sliced"),
        "ocr_extract_poster": _slicing_query("ocr_extract_poster"),
        "streaming_incremental_extract": _streaming_extract,
        "streaming_stateful_dedup": _streaming_stateful_dedup,
        "html_main_content": _html_main_content,
        # text analytics for training-data pipelines (union-tagged suite:
        # the driver board records at most 50 rows — r2 dropped the tail
        # 6 silently — so the four cheap per-doc analytics share one row;
        # standalone builders remain the API surface)
        "text_stats_suite": text.text_stats_suite,
        # multimodal binary-column operators (image meta / frame sampling /
        # real WAV + Y4M decode — see operators/multimodal.py, media.py;
        # the three image branches share one union-tagged board row)
        "multimodal_suite": multimodal.multimodal_suite,
        "audio_features": media.audio_features,
        "media_codec_suite": media.media_codec_suite,
        "video_keyframes": media.video_keyframes,
        # dedup family
        "dedup_exact": dedup.exact_duplicates,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        # similarity search
        "ann_cosine_topk": similarity.cosine_topk,
        "ann_lsh_bucket_topk": similarity.lsh_bucket_topk,
        "ann_ivf_topk": similarity.ivf_topk,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
        # distributed Lloyd's k-means (exact integer lattice) + SemDeDup
        # semantic dedup, one union-tagged board row
        "embedding_ops_suite": kmeans.embedding_ops_suite,
        # composed end-to-end curation funnel (lang -> gopher ->
        # quality -> exact dedup -> simhash near-dup, first-failing-
        # stage attribution — functions/curation.py)
        "corpus_pipeline": curation.corpus_pipeline,
        # relational analogues of reference operators (SURVEY.md
        # §2.2-2.6), as one union-tagged suite for the same 50-row
        # board-cap reason
        "relational_ops_suite": relational.relational_ops_suite,
    }


def oracle_sql() -> dict[str, str]:
    from paddleocr_spark.functions import (
        dedup,
        curation,
        fields,
        kmeans,
        relational,
        similarity,
        text,
    )
    from paddleocr_spark.functions import names, recovery, structure
    from paddleocr_spark.operators import media, multimodal

    from paddleocr_spark.functions import corrections

    return {
        "ocr_corrections_chain": corrections.OCR_CORRECTIONS_CHAIN_SQL,
        "ic_field_extract": fields.IC_FIELD_EXTRACT_SQL,
        "ic_fields_from_pages": fields.IC_FIELD_EXTRACT_SQL,
        "ic_name_extract": names.IC_NAME_EXTRACT_SQL,
        "ic_ultimate_extract": _ic_ultimate_sql(),
        "ic_serving_from_pages": _ic_ultimate_sql(),
        "ic_address_extract": _ic_address_sql(),
        "malay_word_split": names.MALAY_WORD_SPLIT_SQL,
        "paragraph_merge": recovery.PARAGRAPH_MERGE_SQL,
        "markdown_escape": recovery.MARKDOWN_ESCAPE_SQL,
        "doc_markdown_recovery": recovery.DOC_MARKDOWN_RECOVERY_SQL,
        "rtl_reverse": recovery.RTL_REVERSE_SQL,
        "rotation_vote": recovery.ROTATION_VOTE_SQL,
        "extraction_accuracy": recovery.EXTRACTION_ACCURACY_SQL,
        "base64_roundtrip": recovery.BASE64_ROUNDTRIP_SQL,
        "layout_detect": _layout_detect_sql(),
        "sorted_layout_boxes": structure.SORTED_LAYOUT_SQL,
        "table_html_assembly": structure.TABLE_HTML_SQL,
        "table_structure_from_pages": structure.TABLE_STRUCTURE_SQL,
        "address_assembly": structure.ADDRESS_ASSEMBLY_SQL,
        "word_boxes": _word_boxes_sql(),
        "det_iou_hmean": _metrics_sql("DET_IOU_HMEAN_SQL"),
        "table_teds": _metrics_sql("TABLE_TEDS_SQL"),
        "ocr_extract_text": _OCR_EXTRACT_SQL,
        "ocr_extract_onnx": _OCR_EXTRACT_SQL,
        "ocr_extract_multipage": _ocr_multipage_sql(),
        "ocr_extract_oriented": _OCR_ORIENTED_SQL,
        "ocr_extract_sliced": _slicing_sql("OCR_SLICED_SQL"),
        "ocr_extract_poster": _slicing_sql("OCR_POSTER_SQL"),
        "streaming_incremental_extract": _OCR_UPRIGHT_SQL,
        "streaming_stateful_dedup": _STREAMING_STATEFUL_DEDUP_SQL,
        "html_main_content": _HTML_MAIN_SQL,
        "text_stats_suite": text.TEXT_STATS_SUITE_SQL,
        "multimodal_suite": multimodal.MULTIMODAL_SUITE_SQL,
        "audio_features": media.AUDIO_FEATURES_SQL,
        "media_codec_suite": media.MEDIA_CODEC_SUITE_SQL,
        "video_keyframes": media.VIDEO_KEYFRAMES_SQL,
        "dedup_exact": dedup.EXACT_DUPLICATES_SQL,
        "minhash_signatures": dedup.MINHASH_SIGNATURES_SQL,
        "minhash_lsh_pairs": dedup.MINHASH_LSH_PAIRS_SQL,
        "dedup_clusters": dedup.DEDUP_CLUSTERS_SQL,
        "simhash_fingerprints": dedup.SIMHASH_FINGERPRINTS_SQL,
        "ngram_jaccard_pairs": dedup.NGRAM_JACCARD_PAIRS_SQL,
        "ann_cosine_topk": similarity.COSINE_TOPK_SQL,
        "ann_lsh_bucket_topk": similarity.LSH_BUCKET_TOPK_SQL,
        "ann_ivf_topk": similarity.IVF_TOPK_SQL,
        "embedding_near_dup_pairs": similarity.EMBEDDING_NEAR_DUP_SQL,
        "embedding_ops_suite": kmeans.EMBEDDING_OPS_SUITE_SQL,
        "corpus_pipeline": curation.CORPUS_PIPELINE_SQL,
        "relational_ops_suite": relational.RELATIONAL_OPS_SUITE_SQL,
    }
