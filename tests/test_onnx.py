"""ONNX export/runtime stack: wire-format roundtrip, op kernels vs
brute-force numpy, byte-exact det/rec parity with the deterministic
stand-ins, session caching, and the Spark broadcast deployment path
(extract_pages backend='onnx')."""

import numpy as np
import pytest

from paddleocr_spark.kernels import font
from paddleocr_spark.kernels.det import DetConfig, DetModel, detect_lines
from paddleocr_spark.kernels.onnx_models import (
    OnnxDetModel,
    OnnxRecModel,
    build_det_onnx,
    build_onnx_bundle,
    build_rec_onnx,
    is_onnx_bundle,
    onnx_engine_models,
    split_onnx_bundle,
)
from paddleocr_spark.kernels.onnx_proto import (
    DT_FLOAT,
    decode_model,
    encode_model,
    encode_node,
    encode_tensor,
    encode_value_info,
)
from paddleocr_spark.kernels.onnx_rt import (
    OnnxSession,
    _conv2d,
    _maxfilt1d,
    _pool2d,
    session_for,
)
from paddleocr_spark.kernels.rec import RecModel

from conftest import SF_SMALL

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# wire format
# ---------------------------------------------------------------------------

def test_proto_roundtrip_model():
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = np.arange(4, dtype=np.float32)
    nodes = [
        encode_node("Conv", ["x", "w", "b"], ["y"], name="c1",
                    kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1]),
        encode_node("Relu", ["y"], ["out"], name="act"),
    ]
    blob = encode_model(
        nodes,
        inputs=[encode_value_info("x", DT_FLOAT, [1, 3, "h", "w"])],
        outputs=[encode_value_info("out", DT_FLOAT, [1, 4, "h", "w"])],
        initializers=[encode_tensor("w", w), encode_tensor("b", b)],
    )
    m = decode_model(blob)
    assert m.ir_version == 8 and m.opset == 13
    assert m.graph.inputs == ["x"] and m.graph.outputs == ["out"]
    assert [n.op_type for n in m.graph.nodes] == ["Conv", "Relu"]
    assert m.graph.nodes[0].attrs["kernel_shape"] == [3, 3]
    assert m.graph.nodes[0].attrs["pads"] == [1, 1, 1, 1]
    np.testing.assert_array_equal(m.graph.initializers["w"], w)
    np.testing.assert_array_equal(m.graph.initializers["b"], b)
    assert m.graph.initializers["w"].dtype == np.float32


def test_proto_roundtrip_int64_and_negative():
    arr = np.array([-5, 0, 3, -(2**40)], dtype=np.int64)
    name, back = __import__(
        "paddleocr_spark.kernels.onnx_proto", fromlist=["decode_tensor"]
    ).decode_tensor(encode_tensor("t", arr))
    assert name == "t"
    np.testing.assert_array_equal(back, arr)


def test_session_rejects_unordered_graph():
    nodes = [encode_node("Relu", ["missing"], ["y"])]
    blob = encode_model(
        nodes,
        inputs=[encode_value_info("x", DT_FLOAT, [1])],
        outputs=[encode_value_info("y", DT_FLOAT, [1])],
        initializers=[],
    )
    with pytest.raises(ValueError):
        OnnxSession(blob)


# ---------------------------------------------------------------------------
# op kernels vs brute force
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w", [1, 2, 3, 7, 63, 100])
def test_maxfilt1d_matches_bruteforce(w):
    a = rng.normal(size=(3, 117)).astype(np.float32)
    got = _maxfilt1d(a, w)
    n_out = a.shape[-1] - w + 1
    want = np.stack([a[:, i : i + w].max(axis=1) for i in range(n_out)], axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kh,kw,pads", [(1, 63, [0, 31, 0, 31]),
                                        (3, 1, [1, 0, 1, 0]),
                                        (3, 3, [1, 1, 1, 1]),
                                        (2, 5, [0, 2, 1, 2])])
def test_pool2d_matches_bruteforce(kh, kw, pads):
    x = rng.normal(size=(1, 2, 19, 23)).astype(np.float32)
    got = _pool2d(x, kh, kw, pads, (1, 1))
    pt, pl, pb, pr = pads
    xp = np.full((1, 2, 19 + pt + pb, 23 + pl + pr), -np.inf, dtype=np.float32)
    xp[:, :, pt : pt + 19, pl : pl + 23] = x
    oh, ow = xp.shape[2] - kh + 1, xp.shape[3] - kw + 1
    want = np.empty((1, 2, oh, ow), dtype=np.float32)
    for i in range(oh):
        for j in range(ow):
            want[:, :, i, j] = xp[:, :, i : i + kh, j : j + kw].max(axis=(2, 3))
    np.testing.assert_array_equal(got, want)


def test_conv2d_matches_bruteforce():
    x = rng.normal(size=(2, 3, 9, 11)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    got = _conv2d(x, w, b, [1, 1, 1, 1], (1, 1))
    xp = np.zeros((2, 3, 11, 13), dtype=np.float32)
    xp[:, :, 1:10, 1:12] = x
    want = np.empty((2, 4, 9, 11), dtype=np.float32)
    for n in range(2):
        for o in range(4):
            for i in range(9):
                for j in range(11):
                    want[n, o, i, j] = (
                        xp[n, :, i : i + 3, j : j + 3] * w[o]
                    ).sum() + b[o]
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# model parity with the deterministic stand-ins
# ---------------------------------------------------------------------------

PAGES = [
    "HELLO WORLD 123 ABC",
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789",
    "A-B-C DASHES - AND MORE-",
    "----",
    "X",
    "",
]


@pytest.mark.parametrize("text", PAGES)
def test_det_prob_map_bit_equals_stub(text):
    page = font.render_page(text)
    stub_map = DetModel().forward(page)
    sess = session_for(build_det_onnx())
    prob = sess.run({"x": page.astype(np.float32)[None, None]})["prob"][0, 0]
    np.testing.assert_array_equal((prob > DetConfig().thresh).astype(np.uint8),
                                  stub_map)


@pytest.mark.parametrize("text", PAGES)
def test_detect_lines_identical_boxes(text):
    page = font.render_page(text)
    b1, s1 = detect_lines(page, DetModel())
    det, _ = onnx_engine_models(build_det_onnx(), build_rec_onnx())
    b2, s2 = detect_lines(page, det)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_rec_class_scores_parity():
    v = rng.normal(size=(17, 35)).astype(np.float32)
    s_ref, n_ref = RecModel().class_scores(v.copy())
    rec = OnnxRecModel(session_for(build_rec_onnx()))
    s_onnx, n_onnx = rec.class_scores(v.copy())
    np.testing.assert_allclose(s_ref, s_onnx, atol=1e-6)
    np.testing.assert_allclose(n_ref, n_onnx, atol=1e-6)
    np.testing.assert_array_equal(s_ref.argmax(axis=1), s_onnx.argmax(axis=1))


@pytest.mark.parametrize("text", PAGES)
def test_engine_extract_text_byte_identical(text):
    from paddleocr_spark.kernels.ocr import OcrEngine

    stub = OcrEngine()
    onnx = OcrEngine()
    onnx.det_model, onnx.rec_model = onnx_engine_models(
        build_det_onnx(), build_rec_onnx(), onnx.cfg.det, onnx.cfg.rec
    )
    page = font.render_page(text)
    assert onnx.extract_text(page) == stub.extract_text(page)


def test_bundle_roundtrip_and_session_cache():
    bundle = build_onnx_bundle()
    assert is_onnx_bundle(bundle)
    det_b, rec_b = split_onnx_bundle(bundle)
    assert decode_model(det_b).graph.name == "db_det"
    assert decode_model(rec_b).graph.name == "rec_head"
    # content-addressed cache: same bytes -> same session object
    assert session_for(det_b) is session_for(det_b)
    assert session_for(det_b) is not session_for(rec_b)
    # a weight change is a different model version -> different session
    t = font.TEMPLATES.copy()
    t[0] = -t[0]
    assert session_for(build_rec_onnx(t)) is not session_for(rec_b)


# ---------------------------------------------------------------------------
# Spark deployment path
# ---------------------------------------------------------------------------

def test_extract_pages_onnx_backend_byte_identical(spark):
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, SF_SMALL, limit=10)
    base = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages, num_partitions=4).collect()
    }
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages, num_partitions=4, backend="onnx").collect()
    }
    assert got == base
    assert any(base.values())


def test_onnx_broadcast_weights_propagate(spark):
    """Driver-side template swap inside the exported ONNX bytes must
    reach every worker through the broadcast — the same propagation pin
    as the npz path, now over a genuine model file."""
    from paddleocr_spark.kernels.font import CHARSET
    from paddleocr_spark.plans.pipeline import extract_pages
    from paddleocr_spark.sources.pages import pages_from_documents

    t = font.TEMPLATES.copy()
    ia, ib = CHARSET.index("A"), CHARSET.index("B")
    t[[ia, ib]] = t[[ib, ia]]
    swapped = build_onnx_bundle(templates=t)

    pages = pages_from_documents(spark, SF_SMALL, limit=6)
    base = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages, num_partitions=4).collect()
    }
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages, num_partitions=4, weights=swapped).collect()
    }
    tr = str.maketrans("AB", "BA")
    assert got == {u: txt.translate(tr) for u, txt in base.items()}
    assert any("A" in txt or "B" in txt for txt in base.values())
