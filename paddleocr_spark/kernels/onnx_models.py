"""ONNX det/rec models + the broadcastable model bundle.

This closes the "ONNX weights are a drop-in" loop end-to-end: the driver
EXPORTS genuine `.onnx` bytes (kernels/onnx_proto.py wire format — a
stock onnxruntime can load the same files), broadcasts them, and each
executor materializes per-process cached sessions (kernels/onnx_rt.py)
that the flagship extraction path runs for every page — the deployment
shape of the reference's onnxruntime branch (tools/infer/utility.py
:177-238 builds InferenceSession once per process; predict_det.py /
predict_rec.py then feed it batches).

The exported weights are analytically derived rather than SGD-trained —
deliberately: the correctness gate demands byte-identical extracted
text, so the models are constructed to be EXACTLY equivalent (with
proven float32 margins) to the deterministic stand-ins they replace:

- det.onnx  : Conv1x1(w=-40, b=40*178.5) -> Sigmoid -> MaxPool(1 x 63)
  -> MaxPool(3 x 1). Pixel values are integers, so |logit| >= 20 at
  every pixel: sigmoid is exactly 1.0f on ink (1/(1+2e-9) rounds to 1
  in float32) and ~2e-9 on background. Thresholding the pooled map at
  0.3 therefore reproduces DetModel.forward's binarize(178.5)+dilate
  bit-exactly, and box_score means differ from the binary map by < 2e-9
  — six orders of magnitude under every decision margin (box_thresh
  gap >= 0.038).
- rec.onnx  : center -> L2-normalize -> MatMul against the glyph
  template matrix (the classifier of RecModel._forward_one as a graph:
  ReduceMean/Sub/ReduceL2/Max/Div/MatMul). Identical float32 math on
  identical inputs; argmax margins are the template-correlation gaps
  (>= 0.05 across the charset), so decoded text is byte-identical.

Nearest-L2 template matching IS this linear head: with unit-norm
templates, argmin ||u - t||^2 = argmax t.u, so shipping the matrix as a
Gemm/MatMul weight is the standard export of a nearest-template
classifier.
"""

from __future__ import annotations

import numpy as np

from . import font as _font
from .det import DetConfig
from .onnx_proto import (
    DT_FLOAT,
    _varint,
    _read_varint,
    encode_model,
    encode_node,
    encode_tensor,
    encode_value_info,
)
from .onnx_rt import OnnxSession, session_for
from .rec import RecConfig, RecModel

BUNDLE_MAGIC = b"POCRSPK-ONNX1\x00"


def build_det_onnx(cfg: DetConfig | None = None) -> bytes:
    """DB-style det head as an ONNX graph over NCHW grayscale [0,255]."""
    cfg = cfg or DetConfig()
    scale = 40.0
    w = np.array([[[[-scale]]]], dtype=np.float32)  # [cout,cin,1,1]
    b = np.array([scale * 178.5], dtype=np.float32)
    kh = 2 * cfg.v_dilate + 1
    kw = 2 * cfg.h_dilate + 1
    nodes = [
        encode_node("Conv", ["x", "det_w", "det_b"], ["z"], name="ink_logit",
                    kernel_shape=[1, 1], pads=[0, 0, 0, 0], strides=[1, 1]),
        encode_node("Sigmoid", ["z"], ["p"], name="ink_prob"),
        encode_node("MaxPool", ["p"], ["ph"], name="h_dilate",
                    kernel_shape=[1, kw],
                    pads=[0, cfg.h_dilate, 0, cfg.h_dilate],
                    strides=[1, 1]),
        encode_node("MaxPool", ["ph"], ["prob"], name="v_dilate",
                    kernel_shape=[kh, 1],
                    pads=[cfg.v_dilate, 0, cfg.v_dilate, 0],
                    strides=[1, 1]),
    ]
    return encode_model(
        nodes,
        inputs=[encode_value_info("x", DT_FLOAT, [1, 1, "h", "w"])],
        outputs=[encode_value_info("prob", DT_FLOAT, [1, 1, "h", "w"])],
        initializers=[encode_tensor("det_w", w), encode_tensor("det_b", b)],
        graph_name="db_det",
    )


def build_rec_onnx(templates: np.ndarray | None = None) -> bytes:
    """Template-correlation classifier head as an ONNX graph:
    cells [k,35] -> (scores [k,C], norms [k,1])."""
    t = np.asarray(
        templates if templates is not None else _font.TEMPLATES,
        dtype=np.float32,
    )
    w = np.ascontiguousarray(t.T)  # [35, C]
    eps = np.array([[1e-9]], dtype=np.float32)
    nodes = [
        encode_node("ReduceMean", ["cells"], ["mu"], name="center_mean",
                    axes=[1], keepdims=1),
        encode_node("Sub", ["cells", "mu"], ["c"], name="center"),
        encode_node("ReduceL2", ["c"], ["norms"], name="norm",
                    axes=[1], keepdims=1),
        encode_node("Max", ["norms", "eps"], ["ne"], name="norm_eps"),
        encode_node("Div", ["c", "ne"], ["u"], name="unit"),
        encode_node("MatMul", ["u", "rec_w"], ["scores"], name="correlate"),
    ]
    return encode_model(
        nodes,
        inputs=[encode_value_info("cells", DT_FLOAT, ["k", t.shape[1]])],
        outputs=[
            encode_value_info("scores", DT_FLOAT, ["k", t.shape[0]]),
            encode_value_info("norms", DT_FLOAT, ["k", 1]),
        ],
        initializers=[encode_tensor("rec_w", w), encode_tensor("eps", eps)],
        graph_name="rec_head",
    )


def build_onnx_bundle(
    templates: np.ndarray | None = None, det_cfg: DetConfig | None = None
) -> bytes:
    """Driver-side export: both models in one broadcastable blob."""
    det = build_det_onnx(det_cfg)
    rec = build_rec_onnx(templates)
    return BUNDLE_MAGIC + _varint(len(det)) + det + _varint(len(rec)) + rec


def split_onnx_bundle(blob: bytes) -> tuple[bytes, bytes]:
    body = blob[len(BUNDLE_MAGIC):]
    n, pos = _read_varint(body, 0)
    det = body[pos : pos + n]
    pos += n
    n, pos2 = _read_varint(body, pos)
    rec = body[pos2 : pos2 + n]
    return det, rec


def is_onnx_bundle(blob: bytes) -> bool:
    return blob.startswith(BUNDLE_MAGIC)


class OnnxDetModel:
    """Det head driven by an ONNX session. `uses_forward` routes
    detect_lines through the prob-map db_postprocess path (the run-space
    shortcut only exists for the closed-form binary stand-in)."""

    uses_forward = True

    def __init__(self, session: OnnxSession, cfg: DetConfig | None = None):
        self.cfg = cfg or DetConfig()
        self.session = session

    def forward(self, gray: np.ndarray) -> np.ndarray:
        x = np.asarray(gray, dtype=np.float32)[None, None]
        return self.session.run({"x": x})["prob"][0, 0]


class OnnxRecModel(RecModel):
    """RecModel with the classifier head swapped for the ONNX session;
    segmentation/pooling/CTC-frame assembly (the pre/post ops that stay
    outside the net in the reference too) are inherited unchanged."""

    def __init__(self, session: OnnxSession, cfg: RecConfig | None = None):
        super().__init__(cfg)
        self.session = session

    def class_scores(self, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        out = self.session.run({"cells": np.ascontiguousarray(v, dtype=np.float32)})
        return out["scores"], out["norms"].ravel()


def onnx_engine_models(det_bytes: bytes, rec_bytes: bytes,
                       det_cfg=None, rec_cfg=None):
    """Executor-side: cached sessions -> engine-compatible model pair."""
    return (
        OnnxDetModel(session_for(det_bytes), det_cfg),
        OnnxRecModel(session_for(rec_bytes), rec_cfg),
    )
