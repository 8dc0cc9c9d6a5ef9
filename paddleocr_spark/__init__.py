"""paddleocr_spark — a PySpark-native document-to-structured-text extraction
engine built from scratch with the capabilities of the reference PaddleOCR
fork (see SURVEY.md).

Layout:
    kernels/    pure numpy/stdlib compute kernels (no Spark imports) —
                bitmap font page rendering, PNG codec, DB-style detection
                postprocess, geometric reading order, template recognition,
                CTC decode, perspective crop.
    functions/  Spark DataFrame builders for text analytics, dedup
                (exact/minhash/simhash/jaccard) and embedding similarity.
    operators/  HTML main-content extraction and rule-based field
                extraction (Malaysia-IC parity layer).
    sources/    deterministic synthesis of the `pages` corpus
                (url, warc_ts, html, text, lang) from the testdata tables.
    plans/      the end-to-end Spark extraction pipeline (mapInPandas
                stages, skew salting, audit/lineage, idempotent resume).
    streaming/  foreachBatch wrapper for incremental runs.

Everything model-like is a deterministic numpy "stub model" (the sandbox has
no onnxruntime/cv2); the Spark-side plumbing — Arrow batching, partitioning,
schemas, session caching — is the real engine and is what scales to a
cluster. Real ONNX weights are a drop-in behind the same interfaces.
"""

__version__ = "0.1.0"
