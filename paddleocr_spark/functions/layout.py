"""Layout-region detection query (SURVEY §2.9 layout net row): the
PicoDet decode tail (kernels/layout.py) run per document over
deterministic raw-head candidates, Spark-side as one mapInPandas over
the documents scan — a narrow map, no shuffle; at 100 TB this stage is
embarrassingly parallel and the candidate generator is where an ONNX
head would batch-infer instead (ppstructure/layout/predict_layout.py).

The candidate sets are designed so every decode-tail branch fires and
the survivor set is CLOSED-FORM in doc_id, giving the strict DuckDB
oracle below; the score wiggle w = (doc_id % 5) * 0.01 moves output
values without ever flipping a survival decision (margins >= 0.06
everywhere):

- doc_id%4 == 0: same-class NMS drop (IoU 0.82 text pair) + a
  sub-threshold figure -> 1 survivor.
- doc_id%4 == 1: text inside table (containment 1.0) -> table wins the
  conflict group despite the LOWER score; disjoint title survives
  -> 2 survivors.
- doc_id%4 == 2: figure inside a text box, no table in group -> highest
  score (the figure) wins; the far-away text survives -> 2 survivors.
- doc_id%4 == 3: NMS pick-order flip: which of two overlapping text
  boxes wins depends on doc_id%8, flipping the surviving geometry
  -> 1 survivor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from paddleocr_spark.sources.scan import scan_parquet

# class indices into kernels.layout.LAYOUT_LABELS
_TEXT, _TITLE, _TABLE, _FIGURE = 0, 1, 3, 4


def head_candidates(doc_id: int):
    """Deterministic raw-head stand-in: [(class_idx, score, box), ...]."""
    w = (doc_id % 5) * 0.01
    case = doc_id % 4
    if case == 0:
        return [
            (_TEXT, 0.8 + w, (10.0, 10.0, 110.0, 50.0)),
            (_TEXT, 0.6, (10.0, 14.0, 110.0, 54.0)),
            (_FIGURE, 0.35, (200.0, 10.0, 260.0, 50.0)),
        ]
    if case == 1:
        return [
            (_TEXT, 0.9, (30.0, 30.0, 150.0, 60.0)),
            (_TITLE, 0.7, (300.0, 20.0, 400.0, 40.0)),
            (_TABLE, 0.5 + w, (20.0, 20.0, 220.0, 160.0)),
        ]
    if case == 2:
        return [
            (_TEXT, 0.7 + w, (10.0, 200.0, 110.0, 240.0)),
            (_TEXT, 0.6, (300.0, 200.0, 400.0, 240.0)),
            (_FIGURE, 0.95, (305.0, 205.0, 395.0, 235.0)),
        ]
    flag = doc_id % 8 == 3
    return [
        (_TEXT, 0.8 if flag else 0.6, (50.0, 50.0, 150.0, 90.0)),
        (_TEXT, 0.7 + (0.0 if flag else w), (50.0, 54.0, 150.0, 94.0)),
    ]


def layout_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from paddleocr_spark.kernels.layout import layout_postprocess

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                for label, score, (x0, y0, x1, y1) in layout_postprocess(
                    head_candidates(d)
                ):
                    rows.append(
                        (d, label, round(score, 6), int(x0), int(y0),
                         int(x1), int(y1))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "label", "score", "x0", "y0", "x1", "y1"],
            )

    return docs.mapInPandas(
        run,
        schema=("doc_id long, label string, score double, "
                "x0 long, y0 long, x1 long, y1 long"),
    )


LAYOUT_DETECT_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 4 AS c, (doc_id % 5) * 0.01 AS w
  FROM documents
)
SELECT doc_id, 'text' AS label, CAST(round(0.8 + w, 6) AS double) AS score,
       10 AS x0, 10 AS y0, 110 AS x1, 50 AS y1
FROM d WHERE c = 0
UNION ALL
SELECT doc_id, 'title', CAST(round(0.7, 6) AS double), 300, 20, 400, 40 FROM d WHERE c = 1
UNION ALL
SELECT doc_id, 'table', CAST(round(0.5 + w, 6) AS double), 20, 20, 220, 160 FROM d WHERE c = 1
UNION ALL
SELECT doc_id, 'text', CAST(round(0.7 + w, 6) AS double), 10, 200, 110, 240 FROM d WHERE c = 2
UNION ALL
SELECT doc_id, 'figure', CAST(round(0.95, 6) AS double), 305, 205, 395, 235 FROM d WHERE c = 2
UNION ALL
SELECT doc_id,
       'text',
       CAST(CASE WHEN doc_id % 8 = 3 THEN round(0.8, 6) ELSE round(0.7 + w, 6) END AS double),
       50,
       CASE WHEN doc_id % 8 = 3 THEN 50 ELSE 54 END,
       150,
       CASE WHEN doc_id % 8 = 3 THEN 90 ELSE 94 END
FROM d WHERE c = 3
"""
