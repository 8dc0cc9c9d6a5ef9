"""Table-structure recovery kernel (kernels/table_struct.py): the
render -> recover roundtrip must reproduce the exact token stream and
cell interiors for every grid shape the query uses, and recovery must
come from pixels (perturbing a ruling changes the answer)."""

import numpy as np

from paddleocr_spark.kernels.table_struct import (
    CELL_H,
    CELL_W,
    T,
    recover_structure,
    render_table_grid,
)


def test_roundtrip_all_query_shapes():
    for n_rows in range(1, 4):
        for n_cols in range(2, 6):
            tokens, boxes = recover_structure(render_table_grid(n_rows, n_cols))
            exp_tokens = ["<table>"]
            for _ in range(n_rows):
                exp_tokens += ["<tr>"] + ["<td></td>"] * n_cols + ["</tr>"]
            exp_tokens.append("</table>")
            assert tokens == exp_tokens
            assert boxes == [
                (
                    c * (CELL_W + T) + T,
                    r * (CELL_H + T) + T,
                    (c + 1) * (CELL_W + T),
                    (r + 1) * (CELL_H + T),
                )
                for r in range(n_rows)
                for c in range(n_cols)
            ]


def test_recovery_reads_pixels_not_metadata():
    img = render_table_grid(2, 3).copy()
    # erase the middle horizontal ruling between the verticals -> the
    # two rows merge into one (vertical rulings stay intact)
    y = CELL_H + T
    for c in range(3):
        x0 = c * (CELL_W + T) + T
        img[y : y + T, x0 : x0 + CELL_W] = 255
    tokens, boxes = recover_structure(img)
    assert tokens.count("<tr>") == 1
    assert len(boxes) == 3


def test_empty_image_recovers_nothing():
    tokens, boxes = recover_structure(np.full((40, 40), 255, dtype=np.uint8))
    assert tokens == ["<table>", "</table>"] and boxes == []
