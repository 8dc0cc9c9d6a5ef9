"""Pure-numpy ONNX graph executor with a per-process session cache.

This is the executor-side half of the ship-weights-once deployment
pattern: the driver broadcasts genuine `.onnx` bytes (built by
kernels/onnx_models.py, parseable by stock onnxruntime), and each python
worker materializes them ONCE into an `OnnxSession` cached by content
digest — mirroring how the reference builds and caches one predictor per
process (tools/infer/utility.py:177-238 create_predictor; PaddleOCR's
onnxruntime branch constructs `onnxruntime.InferenceSession(model_path)`
there and reuses it for every page).

Design notes:
- Single-threaded by construction (the analogue of the reference's
  pinned `intra_op_num_threads`): every kernel below is plain numpy
  slicing/elementwise work with no BLAS fan-out except tiny matmuls, so
  32 Spark task threads never oversubscribe the host.
- MaxPool uses a van Herk / Gil-Werman separable running max: O(1)
  comparisons per pixel regardless of window size, so the det model's
  1x63 text-line fusion window costs the same as a 1x3 — the same
  reason the map-free det path uses run-length dilation.
- Sessions are immutable after construction; `run` is reentrant.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .onnx_proto import Model, Node, decode_model


def _stable_sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def _maxfilt1d(a: np.ndarray, w: int) -> np.ndarray:
    """Running max over a window of `w` along the LAST axis, 'valid'
    output length n-w+1 (caller pads). van Herk: per-chunk forward and
    backward cumulative maxima, then one elementwise max."""
    if w == 1:
        return a
    n = a.shape[-1]
    nout = n - w + 1
    pad = (-n) % w
    if pad:
        fill = np.full(a.shape[:-1] + (pad,), -np.inf, dtype=a.dtype)
        a = np.concatenate([a, fill], axis=-1)
    m = a.shape[-1] // w
    ch = a.reshape(a.shape[:-1] + (m, w))
    fwd = np.maximum.accumulate(ch, axis=-1).reshape(a.shape[:-1] + (m * w,))
    bwd = np.maximum.accumulate(ch[..., ::-1], axis=-1)[..., ::-1].reshape(
        a.shape[:-1] + (m * w,)
    )
    return np.maximum(bwd[..., :nout], fwd[..., w - 1 : w - 1 + nout])


def _pool2d(x: np.ndarray, kh: int, kw: int, pads: list[int],
            strides: tuple[int, int]) -> np.ndarray:
    """MaxPool over NCHW input. Max is separable, so a (kh,kw) window is
    a (kh,1) pass then a (1,kw) pass, each via the van Herk filter."""
    pt, pl, pb, pr = pads
    n, c, h, w = x.shape
    y = x
    if pt or pb:
        fill = np.full((n, c, 1, w), -np.inf, dtype=x.dtype)
        y = np.concatenate([np.repeat(fill, pt, 2), y, np.repeat(fill, pb, 2)], 2)
    if kh > 1:
        y = _maxfilt1d(np.swapaxes(y, 2, 3), kh)
        y = np.swapaxes(y, 2, 3)
    if pl or pr:
        fill = np.full(y.shape[:3] + (1,), -np.inf, dtype=x.dtype)
        y = np.concatenate([np.repeat(fill, pl, 3), y, np.repeat(fill, pr, 3)], 3)
    if kw > 1:
        y = _maxfilt1d(y, kw)
    sh, sw = strides
    if sh > 1 or sw > 1:
        y = y[:, :, ::sh, ::sw]
    return np.ascontiguousarray(y)


def _conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray | None,
            pads: list[int], strides: tuple[int, int],
            dilations: tuple[int, int] = (1, 1),
            groups: int = 1) -> np.ndarray:
    """NCHW convolution with stride/dilation/group support.

    Small kernels (<= 5x5) accumulate the kh*kw shifted slices — exact
    and allocation-light. Large kernels (the cls model's full-height
    glyph matched filters) go through an im2col view + one matmul:
    identical float accumulation order per output channel row, one BLAS
    call instead of hundreds of einsum launches."""
    if groups > 1:
        cin = x.shape[1]
        cout = w.shape[0]
        gin, gout = cin // groups, cout // groups
        parts = [
            _conv2d(
                x[:, g * gin : (g + 1) * gin],
                w[g * gout : (g + 1) * gout],
                b[g * gout : (g + 1) * gout] if b is not None else None,
                pads, strides, dilations, 1,
            )
            for g in range(groups)
        ]
        return np.concatenate(parts, axis=1)
    n, cin, h, wd = x.shape
    cout, _cin, kh, kw = w.shape
    dh, dw = dilations
    ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1  # effective extent
    pt, pl, pb, pr = pads
    if pt or pl or pb or pr:
        xp = np.zeros((n, cin, h + pt + pb, wd + pl + pr), dtype=x.dtype)
        xp[:, :, pt : pt + h, pl : pl + wd] = x
        x = xp
        h, wd = h + pt + pb, wd + pl + pr
    sh, sw = strides
    oh = (h - ekh) // sh + 1
    ow = (wd - ekw) // sw + 1
    if kh * kw > 25:
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(x, (ekh, ekw), axis=(2, 3))
        win = win[:, :, ::sh, ::sw, ::dh, ::dw]  # [n,cin,oh,ow,kh,kw]
        cols = np.ascontiguousarray(
            win.transpose(0, 2, 3, 1, 4, 5)
        ).reshape(n * oh * ow, cin * kh * kw)
        out = (cols @ w.reshape(cout, -1).T.astype(np.float32)).reshape(
            n, oh, ow, cout
        ).transpose(0, 3, 1, 2)
        out = np.ascontiguousarray(out, dtype=np.float32)
    else:
        out = np.zeros((n, cout, oh, ow), dtype=np.float32)
        for i in range(kh):
            for j in range(kw):
                ii, jj = i * dh, j * dw
                patch = x[:, :, ii : ii + (oh - 1) * sh + 1 : sh,
                          jj : jj + (ow - 1) * sw + 1 : sw]
                # [n,cin,oh,ow] x [cout,cin] -> [n,cout,oh,ow]
                out += np.einsum(
                    "nchw,oc->nohw", patch, w[:, :, i, j], dtype=np.float32
                )
    if b is not None:
        out += b.reshape(1, cout, 1, 1)
    return out


def _conv_transpose2d(x: np.ndarray, w: np.ndarray, b: np.ndarray | None,
                      pads: list[int],
                      strides: tuple[int, int]) -> np.ndarray:
    """NCHW ConvTranspose (group=1, dilation=1). ONNX weight layout is
    [cin, cout, kh, kw]; output dims (h-1)*sh + kh - pt - pb. Scatter by
    kernel tap: each (ki, kj) contributes one strided slice-add — exact
    accumulation, no im2col buffer."""
    n, cin, h, wd = x.shape
    _cin, cout, kh, kw = w.shape
    sh, sw = strides
    pt, pl, pb, pr = pads
    fh, fw = (h - 1) * sh + kh, (wd - 1) * sw + kw
    full = np.zeros((n, cout, fh, fw), dtype=np.float32)
    for ki in range(kh):
        for kj in range(kw):
            # [n,cin,h,w] x [cin,cout] -> [n,cout,h,w]
            contrib = np.einsum(
                "nchw,co->nohw", x, w[:, :, ki, kj], dtype=np.float32
            )
            full[:, :, ki : ki + (h - 1) * sh + 1 : sh,
                 kj : kj + (wd - 1) * sw + 1 : sw] += contrib
    out = full[:, :, pt : fh - pb, pl : fw - pr]
    if b is not None:
        out = out + b.reshape(1, cout, 1, 1)
    return np.ascontiguousarray(out)


def _axes_of(node: Node, vals: dict, default=None):
    a = node.attrs.get("axes", default)
    if len(node.inputs) > 1 and node.inputs[1]:  # opset-18 style axes input
        a = vals[node.inputs[1]].tolist()
    return a


class OnnxSession:
    """Parsed, executable ONNX model. `run(feeds)` -> dict of outputs."""

    def __init__(self, model_bytes: bytes):
        self.model: Model = decode_model(model_bytes)
        g = self.model.graph
        known = set(g.initializers) | {i for i in g.inputs}
        for node in g.nodes:
            for i in node.inputs:
                if i and i not in known:
                    raise ValueError(
                        f"graph not topologically ordered at {node.op_type}:{i}"
                    )
            known.update(node.outputs)
        missing = [o for o in g.outputs if o not in known]
        if missing:
            raise ValueError(f"undefined graph outputs {missing}")

    @property
    def input_names(self) -> list[str]:
        return list(self.model.graph.inputs)

    @property
    def output_names(self) -> list[str]:
        return list(self.model.graph.outputs)

    def run(self, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = self.model.graph
        vals: dict[str, np.ndarray] = dict(g.initializers)
        vals.update(feeds)
        for node in g.nodes:
            self._exec(node, vals)
        return {o: vals[o] for o in g.outputs}

    def _exec(self, node: Node, vals: dict[str, np.ndarray]) -> None:
        op = node.op_type
        x = [vals[i] if i else None for i in node.inputs]
        a = node.attrs
        if op == "Conv":
            pads = list(a.get("pads", [0, 0, 0, 0]))
            strides = a.get("strides", [1, 1])
            out = _conv2d(x[0], x[1], x[2] if len(x) > 2 else None,
                          pads, tuple(strides),
                          tuple(a.get("dilations", [1, 1])),
                          int(a.get("group", 1)))
        elif op == "ConvTranspose":
            pads = list(a.get("pads", [0, 0, 0, 0]))
            strides = a.get("strides", [1, 1])
            if a.get("group", 1) != 1 or list(a.get("dilations", [1, 1])) != [1, 1]:
                raise NotImplementedError("ConvTranspose group/dilation")
            if a.get("output_padding") or a.get("output_shape"):
                raise NotImplementedError("ConvTranspose output_padding")
            out = _conv_transpose2d(x[0], x[1], x[2] if len(x) > 2 else None,
                                    pads, tuple(strides))
        elif op == "MaxPool":
            kh, kw = a["kernel_shape"]
            pads = list(a.get("pads", [0, 0, 0, 0]))
            strides = a.get("strides", [1, 1])
            out = _pool2d(x[0], kh, kw, pads, tuple(strides))
        elif op == "Sigmoid":
            out = _stable_sigmoid(x[0].astype(np.float32, copy=False))
        elif op == "Relu":
            out = np.maximum(x[0], 0)
        elif op == "Add":
            out = x[0] + x[1]
        elif op == "Sub":
            out = x[0] - x[1]
        elif op == "Mul":
            out = x[0] * x[1]
        elif op == "Div":
            out = x[0] / x[1]
        elif op == "Max":
            out = x[0]
            for other in x[1:]:
                out = np.maximum(out, other)
        elif op == "MatMul":
            out = x[0] @ x[1]
        elif op == "Gemm":
            av = x[0].T if a.get("transA") else x[0]
            bv = x[1].T if a.get("transB") else x[1]
            out = a.get("alpha", 1.0) * (av @ bv)
            if len(x) > 2 and x[2] is not None:
                out = out + a.get("beta", 1.0) * x[2]
        elif op == "ReduceMean":
            axes = _axes_of(node, vals)
            out = np.mean(
                x[0],
                axis=tuple(axes) if axes is not None else None,
                keepdims=bool(a.get("keepdims", 1)),
                dtype=x[0].dtype,
            )
        elif op == "ReduceSum":
            axes = _axes_of(node, vals)
            out = np.sum(
                x[0],
                axis=tuple(axes) if axes is not None else None,
                keepdims=bool(a.get("keepdims", 1)),
                dtype=x[0].dtype,
            )
        elif op == "ReduceMax":
            axes = _axes_of(node, vals)
            out = np.max(
                x[0],
                axis=tuple(axes) if axes is not None else None,
                keepdims=bool(a.get("keepdims", 1)),
            )
        elif op == "ReduceL2":
            axes = _axes_of(node, vals)
            out = np.sqrt(
                np.sum(
                    np.square(x[0]),
                    axis=tuple(axes) if axes is not None else None,
                    keepdims=bool(a.get("keepdims", 1)),
                    dtype=x[0].dtype,
                )
            )
        elif op == "Sqrt":
            out = np.sqrt(x[0])
        elif op == "Clip":
            lo = x[1] if len(x) > 1 and x[1] is not None else a.get("min")
            hi = x[2] if len(x) > 2 and x[2] is not None else a.get("max")
            out = np.clip(x[0], lo, hi)
        elif op == "Reshape":
            dims = [int(d) for d in x[1]]
            # ONNX semantics: 0 copies the input dim, -1 infers
            dims = [
                x[0].shape[i] if d == 0 else d for i, d in enumerate(dims)
            ]
            out = x[0].reshape(dims)
        elif op == "Transpose":
            out = np.transpose(x[0], a.get("perm"))
        elif op == "Flatten":
            ax = a.get("axis", 1)
            out = x[0].reshape(int(np.prod(x[0].shape[:ax] or (1,))), -1)
        elif op == "Concat":
            out = np.concatenate(x, axis=a["axis"])
        elif op == "Identity":
            out = x[0]
        elif op == "Cast":
            to = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
                  11: np.float64}[a["to"]]
            out = x[0].astype(to)
        elif op == "Constant":
            out = a["value"]
        elif op == "ArgMax":
            out = np.argmax(x[0], axis=a.get("axis", 0)).astype(np.int64)
            if a.get("keepdims", 1):
                out = np.expand_dims(out, a.get("axis", 0))
        elif op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(x[0] - x[0].max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        else:
            raise NotImplementedError(f"op {op}")
        node_outs = node.outputs
        vals[node_outs[0]] = out


_SESSION_CACHE: dict[str, OnnxSession] = {}


def session_for(model_bytes: bytes) -> OnnxSession:
    """Content-addressed per-process session cache — the executor-side
    analogue of the reference's one-predictor-per-process rule. Parsing
    a model is cheap here, but with a real runtime this is where a
    session build (graph opt, weight layout) would be paid exactly once
    per worker per model version."""
    key = hashlib.sha1(model_bytes).hexdigest()
    sess = _SESSION_CACHE.get(key)
    if sess is None:
        sess = OnnxSession(model_bytes)
        _SESSION_CACHE[key] = sess
    return sess
