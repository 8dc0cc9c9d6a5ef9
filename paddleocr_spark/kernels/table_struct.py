"""Table-structure recognition stand-in (SURVEY §2.9 table structure
net row): the reference's SLANet/TableMaster head + TableLabelDecode
(ppstructure/table/predict_structure.py:71-186,
ppocr/postprocess/table_postprocess.py) emit a structure-token sequence
('<tr>', '<td></td>', ...) plus one bbox per cell from a table image;
ppstructure/table/matcher.py then splices recognized text into the
token walk (carried here by functions/structure.assemble_table_html and
the nn_assignment matcher query).

This module is the image->structure stage done deterministically: a
bordered grid renderer (the fixture side) and a ruling-line recovery
kernel (the operator side) that takes ONLY pixels and returns the token
sequence + per-cell interior bboxes. A swapped-in ONNX table head would
replace `recover_structure` wholesale; everything downstream consumes
the same (tokens, bboxes) contract the reference's decode produces.

Grid geometry contract (all int pixels): ruling thickness T; vertical
rulings at x = c*(CELL_W+T) for c=0..n_cols, horizontal at
y = r*(CELL_H+T) for r=0..n_rows; cell (r, c) interior =
[c*(CELL_W+T)+T, r*(CELL_H+T)+T, (c+1)*(CELL_W+T), (r+1)*(CELL_H+T)).
"""

from __future__ import annotations

import numpy as np

CELL_W = 60
CELL_H = 28
T = 2  # ruling thickness
_INK = 0
_BG = 255


def render_table_grid(n_rows: int, n_cols: int) -> np.ndarray:
    """Bordered n_rows x n_cols grid, uint8 (0=ink, 255=bg), with a
    small ink marker centered in every cell so interiors are non-empty
    (rulings stay the only FULL dark runs either axis)."""
    w = n_cols * (CELL_W + T) + T
    h = n_rows * (CELL_H + T) + T
    img = np.full((h, w), _BG, dtype=np.uint8)
    for r in range(n_rows + 1):
        y = r * (CELL_H + T)
        img[y : y + T, :] = _INK
    for c in range(n_cols + 1):
        x = c * (CELL_W + T)
        img[:, x : x + T] = _INK
    for r in range(n_rows):
        for c in range(n_cols):
            cy = r * (CELL_H + T) + T + CELL_H // 2
            cx = c * (CELL_W + T) + T + CELL_W // 2
            img[cy - 2 : cy + 2, cx - 2 : cx + 2] = _INK
    return img


def _full_runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of consecutive True — the ruling bands."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def _bands_to_structure(hbands, vbands):
    """Ruling bands -> (tokens, cell interior bboxes): the
    TableLabelDecode-shaped emission shared by the numpy and ONNX
    recovery paths."""
    n_rows = max(len(hbands) - 1, 0)
    n_cols = max(len(vbands) - 1, 0)
    tokens = ["<table>"]
    boxes = []
    for r in range(n_rows):
        tokens.append("<tr>")
        y0, y1 = hbands[r][1], hbands[r + 1][0]
        for c in range(n_cols):
            tokens.append("<td></td>")
            x0, x1 = vbands[c][1], vbands[c + 1][0]
            boxes.append((x0, y0, x1, y1))
        tokens.append("</tr>")
    tokens.append("</table>")
    return tokens, boxes


def recover_structure(img: np.ndarray):
    """Pixels -> (tokens, cell_bboxes). Ruling lines are the rows/cols
    that are dark ACROSS THE WHOLE image (cell content never spans the
    full extent); consecutive ruling bands delimit the grid. Returns the
    merge_no_span_structure token stream the reference's decode emits
    ('<td></td>' as one token) and one (x0, y0, x1, y1) interior box per
    cell in row-major order."""
    dark = img < 128
    hbands = _full_runs(dark.all(axis=1))
    vbands = _full_runs(dark.all(axis=0))
    return _bands_to_structure(hbands, vbands)


def build_table_onnx() -> bytes:
    """The table-structure net's ruling-indicator head as an ONNX graph
    (reference shape: SLANet head feeding TableLabelDecode,
    ppstructure/table/predict_structure.py:49-135): x [1,1,h,w] pixels
    -> per-row and per-column ruling indicators in (0,1).

    A row is a ruling iff EVERY pixel is dark (< 128): ReduceMax over
    the row gives its brightest pixel, and sigmoid(40*(127.5 - max))
    saturates to 1-2e-9 / 2e-9 on the two sides of the integer pixel
    grid — thresholding at 0.5 downstream reproduces the numpy
    dark.all() decision exactly. The band-run walk + token emission
    (the decode tail) stays outside the net, like CTC decode does for
    rec."""
    from .onnx_proto import (
        DT_FLOAT,
        encode_model,
        encode_node,
        encode_tensor,
        encode_value_info,
    )

    half = np.array([127.5], dtype=np.float32)
    beta = np.array([40.0], dtype=np.float32)
    nodes = [
        encode_node("ReduceMax", ["x"], ["row_max"], name="row_brightest",
                    axes=[3], keepdims=0),
        encode_node("Sub", ["half", "row_max"], ["row_m"], name="row_margin"),
        encode_node("Mul", ["row_m", "beta"], ["row_z"], name="row_temp"),
        encode_node("Sigmoid", ["row_z"], ["h_dark"], name="row_indicator"),
        encode_node("ReduceMax", ["x"], ["col_max"], name="col_brightest",
                    axes=[2], keepdims=0),
        encode_node("Sub", ["half", "col_max"], ["col_m"], name="col_margin"),
        encode_node("Mul", ["col_m", "beta"], ["col_z"], name="col_temp"),
        encode_node("Sigmoid", ["col_z"], ["v_dark"], name="col_indicator"),
    ]
    return encode_model(
        nodes,
        inputs=[encode_value_info("x", DT_FLOAT, [1, 1, "h", "w"])],
        outputs=[
            encode_value_info("h_dark", DT_FLOAT, [1, 1, "h"]),
            encode_value_info("v_dark", DT_FLOAT, [1, 1, "w"]),
        ],
        initializers=[encode_tensor("half", half), encode_tensor("beta", beta)],
        graph_name="table_rulings",
    )


def recover_structure_onnx(img: np.ndarray, session) -> tuple:
    """recover_structure with the ruling-indicator stage run through the
    ONNX session instead of numpy — same (tokens, boxes) bit-for-bit
    (pinned in tests)."""
    x = np.asarray(img, dtype=np.float32)[None, None]
    out = session.run({"x": x})
    hbands = _full_runs(out["h_dark"].ravel() > 0.5)
    vbands = _full_runs(out["v_dark"].ravel() > 0.5)
    return _bands_to_structure(hbands, vbands)
