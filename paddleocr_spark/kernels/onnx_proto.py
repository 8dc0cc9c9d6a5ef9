"""Minimal ONNX protobuf wire-format codec, pure python.

The sandbox has neither `onnx` nor `protobuf`, but the ONNX file format
is public: protobuf wire encoding (varint tags, length-delimited
messages) over the message schema published in onnx/onnx.proto. This
module implements exactly the subset needed to EXPORT a model (graph +
initializers + value infos) and to PARSE one back for execution by
kernels/onnx_rt.py — so the bytes we broadcast to executors are genuine
`.onnx` files that a stock onnxruntime can load unchanged (the swap the
reference performs in tools/infer/utility.py:177-238 when it builds an
onnxruntime.InferenceSession from a file path).

Field numbers below are copied from the public onnx.proto schema:
  ModelProto:   ir_version=1, producer_name=2, graph=7, opset_import=8
  GraphProto:   node=1, name=2, initializer=5, input=11, output=12
  NodeProto:    input=1, output=2, name=3, op_type=4, attribute=5
  AttributeProto: name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20
  TensorProto:  dims=1, data_type=2, float_data=4, int64_data=7,
                name=8, raw_data=9
  ValueInfoProto: name=1, type=2
  TypeProto:    tensor_type=1; Tensor: elem_type=1, shape=2
  TensorShapeProto: dim=1; Dimension: dim_value=1, dim_param=2
  OperatorSetIdProto: domain=1, version=2

Wire types: 0 = varint, 2 = length-delimited (all we need: every int
field here is non-negative, every float tensor ships via raw_data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# AttributeProto.AttributeType values (public enum)
ATTR_FLOAT, ATTR_INT, ATTR_STRING, ATTR_TENSOR = 1, 2, 3, 4
ATTR_FLOATS, ATTR_INTS = 6, 7

# TensorProto.DataType values (public enum)
DT_FLOAT, DT_UINT8, DT_INT32, DT_INT64, DT_BOOL, DT_DOUBLE = 1, 2, 6, 7, 9, 11

_NP_TO_DT = {
    np.dtype(np.float32): DT_FLOAT,
    np.dtype(np.float64): DT_DOUBLE,
    np.dtype(np.int64): DT_INT64,
    np.dtype(np.int32): DT_INT32,
    np.dtype(np.uint8): DT_UINT8,
    np.dtype(np.bool_): DT_BOOL,
}
_DT_TO_NP = {v: k for k, v in _NP_TO_DT.items()}


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:  # int64 negatives encode as 10-byte two's complement
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _tag(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def _f_varint(field_no: int, v: int) -> bytes:
    return _tag(field_no, 0) + _varint(v)


def _f_bytes(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, 2) + _varint(len(payload)) + payload


def _f_str(field_no: int, s: str) -> bytes:
    return _f_bytes(field_no, s.encode("utf-8"))


def _fields(buf: bytes) -> list[tuple[int, int, object]]:
    """Parse a message into [(field_no, wire_type, value)] where value is
    an int (wire type 0) or bytes (wire type 2)."""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_no, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            if v >= 1 << 63:  # negative int64
                v -= 1 << 64
            out.append((field_no, wt, v))
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            out.append((field_no, wt, buf[pos : pos + ln]))
            pos += ln
        elif wt == 5:  # 32-bit (AttributeProto.f)
            out.append((field_no, wt, buf[pos : pos + 4]))
            pos += 4
        elif wt == 1:  # 64-bit
            out.append((field_no, wt, buf[pos : pos + 8]))
            pos += 8
        else:  # pragma: no cover - we never emit groups
            raise ValueError(f"unsupported wire type {wt}")
    return out


# ---------------------------------------------------------------------------
# encode: numpy-facing builders
# ---------------------------------------------------------------------------

def encode_tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto with raw_data (little-endian, C order)."""
    arr = np.ascontiguousarray(arr)
    dt = _NP_TO_DT[arr.dtype]
    out = bytearray()
    for d in arr.shape:
        out += _f_varint(1, int(d))
    out += _f_varint(2, dt)
    out += _f_str(8, name)
    out += _f_bytes(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
    return bytes(out)


def _encode_attr(name: str, val) -> bytes:
    out = bytearray(_f_str(1, name))
    if isinstance(val, float):
        out += _tag(2, 5) + np.float32(val).tobytes()
        out += _f_varint(20, ATTR_FLOAT)
    elif isinstance(val, (bool, int, np.integer)):
        out += _f_varint(3, int(val))
        out += _f_varint(20, ATTR_INT)
    elif isinstance(val, str):
        out += _f_bytes(4, val.encode("utf-8"))
        out += _f_varint(20, ATTR_STRING)
    elif isinstance(val, np.ndarray):
        out += _f_bytes(5, encode_tensor(name + "_value", val))
        out += _f_varint(20, ATTR_TENSOR)
    elif isinstance(val, (list, tuple)) and val and isinstance(val[0], float):
        for v in val:
            out += _tag(7, 5) + np.float32(v).tobytes()
        out += _f_varint(20, ATTR_FLOATS)
    elif isinstance(val, (list, tuple)):
        for v in val:
            out += _f_varint(8, int(v))
        out += _f_varint(20, ATTR_INTS)
    else:  # pragma: no cover
        raise TypeError(f"unsupported attribute {name}={val!r}")
    return bytes(out)


def encode_node(
    op_type: str,
    inputs: list[str],
    outputs: list[str],
    name: str = "",
    **attrs,
) -> bytes:
    out = bytearray()
    for i in inputs:
        out += _f_str(1, i)
    for o in outputs:
        out += _f_str(2, o)
    if name:
        out += _f_str(3, name)
    out += _f_str(4, op_type)
    for k, v in attrs.items():
        out += _f_bytes(5, _encode_attr(k, v))
    return bytes(out)


def encode_value_info(name: str, elem_type: int, shape: list) -> bytes:
    """shape entries: int (dim_value) or str (dim_param, symbolic)."""
    dims = bytearray()
    for d in shape:
        if isinstance(d, str):
            dims += _f_bytes(1, _f_str(2, d))
        else:
            dims += _f_bytes(1, _f_varint(1, int(d)))
    tensor_type = _f_varint(1, elem_type) + _f_bytes(2, bytes(dims))
    return _f_str(1, name) + _f_bytes(2, _f_bytes(1, tensor_type))


def encode_model(
    nodes: list[bytes],
    inputs: list[bytes],
    outputs: list[bytes],
    initializers: list[bytes],
    graph_name: str = "graph",
    opset: int = 13,
    producer: str = "paddleocr_spark",
) -> bytes:
    g = bytearray()
    for n in nodes:
        g += _f_bytes(1, n)
    g += _f_str(2, graph_name)
    for t in initializers:
        g += _f_bytes(5, t)
    for vi in inputs:
        g += _f_bytes(11, vi)
    for vi in outputs:
        g += _f_bytes(12, vi)
    m = bytearray()
    m += _f_varint(1, 8)  # ir_version 8
    m += _f_str(2, producer)
    m += _f_bytes(7, bytes(g))
    m += _f_bytes(8, _f_varint(2, opset))  # opset_import {domain="", version}
    return bytes(m)


# ---------------------------------------------------------------------------
# decode: parsed model objects
# ---------------------------------------------------------------------------

@dataclass
class Node:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    name: str = ""
    attrs: dict = field(default_factory=dict)


@dataclass
class Graph:
    nodes: list[Node]
    initializers: dict[str, np.ndarray]
    inputs: list[str]
    outputs: list[str]
    name: str = ""


@dataclass
class Model:
    graph: Graph
    ir_version: int = 0
    opset: int = 0
    producer: str = ""


def decode_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = DT_FLOAT
    name = ""
    raw = b""
    float_data: list[float] = []
    int64_data: list[int] = []
    for field_no, wt, v in _fields(buf):
        if field_no == 1:
            dims.append(int(v))
        elif field_no == 2:
            dtype = int(v)
        elif field_no == 8:
            name = v.decode("utf-8")
        elif field_no == 9:
            raw = bytes(v)
        elif field_no == 4:  # packed float_data
            float_data.extend(np.frombuffer(v, dtype="<f4").tolist())
        elif field_no == 7:  # packed int64_data (also accepted unpacked)
            if wt == 0:
                int64_data.append(int(v))
            else:
                pos = 0
                while pos < len(v):
                    x, pos = _read_varint(v, pos)
                    int64_data.append(x - (1 << 64) if x >= 1 << 63 else x)
    np_dt = _DT_TO_NP[dtype]
    if raw:
        arr = np.frombuffer(raw, dtype=np_dt.newbyteorder("<")).astype(np_dt)
    elif float_data:
        arr = np.asarray(float_data, dtype=np_dt)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=np_dt)
    else:
        arr = np.zeros(0, dtype=np_dt)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def _decode_attr(buf: bytes):
    name = ""
    atype = 0
    fval = 0.0
    ival = 0
    sval = b""
    tval = None
    floats: list[float] = []
    ints: list[int] = []
    for field_no, _wt, v in _fields(buf):
        if field_no == 1:
            name = v.decode("utf-8")
        elif field_no == 2:
            fval = float(np.frombuffer(v, dtype="<f4")[0])
        elif field_no == 3:
            ival = int(v)
        elif field_no == 4:
            sval = bytes(v)
        elif field_no == 5:
            tval = decode_tensor(v)[1]
        elif field_no == 7:
            floats.append(float(np.frombuffer(v, dtype="<f4")[0]))
        elif field_no == 8:
            ints.append(int(v))
        elif field_no == 20:
            atype = int(v)
    val = {
        ATTR_FLOAT: fval,
        ATTR_INT: ival,
        ATTR_STRING: sval.decode("utf-8", "replace"),
        ATTR_TENSOR: tval,
        ATTR_FLOATS: floats,
        ATTR_INTS: ints,
    }.get(atype)
    if val is None:  # tolerate writers that omit the type tag
        val = ints or floats or tval or sval.decode("utf-8", "replace") or ival
    return name, val


def _decode_node(buf: bytes) -> Node:
    node = Node("", [], [])
    for field_no, _wt, v in _fields(buf):
        if field_no == 1:
            node.inputs.append(v.decode("utf-8"))
        elif field_no == 2:
            node.outputs.append(v.decode("utf-8"))
        elif field_no == 3:
            node.name = v.decode("utf-8")
        elif field_no == 4:
            node.op_type = v.decode("utf-8")
        elif field_no == 5:
            k, val = _decode_attr(v)
            node.attrs[k] = val
    return node


def _value_info_name(buf: bytes) -> str:
    for field_no, _wt, v in _fields(buf):
        if field_no == 1:
            return v.decode("utf-8")
    return ""


def _decode_graph(buf: bytes) -> Graph:
    g = Graph([], {}, [], [])
    for field_no, _wt, v in _fields(buf):
        if field_no == 1:
            g.nodes.append(_decode_node(v))
        elif field_no == 2:
            g.name = v.decode("utf-8")
        elif field_no == 5:
            name, arr = decode_tensor(v)
            g.initializers[name] = arr
        elif field_no == 11:
            g.inputs.append(_value_info_name(v))
        elif field_no == 12:
            g.outputs.append(_value_info_name(v))
    return g


def decode_model(buf: bytes) -> Model:
    m = Model(Graph([], {}, [], []))
    for field_no, _wt, v in _fields(buf):
        if field_no == 1:
            m.ir_version = int(v)
        elif field_no == 2:
            m.producer = v.decode("utf-8")
        elif field_no == 7:
            m.graph = _decode_graph(v)
        elif field_no == 8:
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    m.opset = int(v2)
    return m
