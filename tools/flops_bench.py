"""Realistic-FLOP det throughput bound (off-board bench row).

The board's byte-exact graphs are analytically constructed and therefore
cheap; this tool runs the SAME execution path (onnx bytes -> per-process
session -> prob map -> DBPostProcess) with `build_det_onnx_mobile` — a
DB graph at genuine mobile-det channel widths (~2 GMACs at 640x640,
the PP-OCRv5_mobile_det envelope, configs/det/PP-OCRv5/
PP-OCRv5_mobile_det.yml) and seeded random weights — so the recorded
docs/s bounds what the engine would deliver at production neural cost
on this runtime (numpy im2col conv; a real deployment swaps in stock
onnxruntime via the same .onnx bytes).

Usage: python tools/flops_bench.py [side=320] [docs=32] [procs=32]
Emits ONE JSON line:
  {"graph": "db_det_mobile", "gmacs_at_640": g, "side": s,
   "gmacs_per_doc": g', "docs": n, "procs": p,
   "sec_solo_per_doc": x, "docs_per_sec_pool": y,
   "gflops_per_sec_pool": z}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_MODEL: bytes | None = None
_SIDE = 320


def _render_doc(i: int, side: int):
    """A real rendered page (not noise): the det stage's actual input
    distribution — text lines on background — resized to side x side."""
    import numpy as np

    from paddleocr_spark.kernels.font import render_page

    img = render_page(
        [f"FLOPSBENCH DOC {i} LINE {j} QUICKBROWNFOX" for j in range(6)]
    )
    h, w = img.shape
    out = np.full((side, side), 255, dtype=np.uint8)
    out[: min(h, side), : min(w, side)] = img[:side, :side]
    return out


def _one_doc(i: int) -> int:
    """Full det stage on one page: session (per-process cached) ->
    prob map -> DBPostProcess boxes. Returns the box count (so the
    postprocess tail is really executed, not dead code)."""
    from paddleocr_spark.kernels.db_postprocess import db_postprocess
    from paddleocr_spark.kernels.onnx_rt import session_for

    sess = session_for(_MODEL)
    img = _render_doc(i, _SIDE).astype("float32")
    prob = sess.run({"x": img[None, None]})["prob"][0, 0]
    boxes = db_postprocess(
        prob, prob.shape[0], prob.shape[1], thresh=0.3, box_thresh=0.5
    )
    return len(boxes)


def _init(model: bytes, side: int) -> None:
    global _MODEL, _SIDE
    _MODEL = model
    _SIDE = side


def main() -> None:
    import multiprocessing as mp

    from paddleocr_spark.kernels.onnx_models import build_det_onnx_mobile

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    procs = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    model, gmacs640 = build_det_onnx_mobile()
    gmacs = gmacs640 * (side / 640.0) ** 2
    _init(model, side)
    _one_doc(0)  # warm (session build + numpy imports)
    t0 = time.time()
    _one_doc(1)
    solo = time.time() - t0
    with mp.Pool(procs, initializer=_init, initargs=(model, side)) as pool:
        pool.map(_one_doc, range(procs))  # warm every worker
        t0 = time.time()
        pool.map(_one_doc, range(docs))
        sec = time.time() - t0
    tput = docs / sec if sec > 0 else 0.0
    print(json.dumps({
        "graph": "db_det_mobile",
        "gmacs_at_640": round(gmacs640, 3),
        "side": side,
        "gmacs_per_doc": round(gmacs, 3),
        "docs": docs,
        "procs": procs,
        "sec_solo_per_doc": round(solo, 3),
        "docs_per_sec_pool": round(tput, 2),
        "gflops_per_sec_pool": round(2 * gmacs * tput, 1),
    }))


if __name__ == "__main__":
    main()
