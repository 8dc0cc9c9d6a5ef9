"""Metric analogues (SURVEY.md §2.4): detection IoU hmean evaluator and
TEDS tree-edit-distance similarity — kernel-level pins (the corpus-level
oracles run in the driver gate)."""

import random

import numpy as np

from paddleocr_spark.functions.metrics import (
    _Node,
    _count_nodes,
    det_eval_sample,
    parse_table_html,
    rect_iou,
    teds_similarity,
    tree_edit_distance,
)


def _quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


class TestDetEval:
    def test_perfect_match(self):
        g = [_quad(0, 0, 10, 10), _quad(20, 0, 30, 10)]
        assert det_eval_sample(g, list(g)) == (2, 2, 2)

    def test_one_to_one_matching_never_reuses_a_pred(self):
        g = [_quad(0, 0, 10, 10), _quad(1, 0, 11, 10)]
        p = [_quad(0, 0, 10, 10)]
        matched, ng, npred = det_eval_sample(g, p)
        assert (matched, ng, npred) == (1, 2, 1)

    def test_low_iou_rejected(self):
        g = [_quad(0, 0, 10, 10)]
        p = [_quad(8, 8, 18, 18)]  # IoU ~ 0.02
        assert det_eval_sample(g, p)[0] == 0
        assert rect_iou(g[0], p[0]) < 0.5

    def test_hmean_arithmetic(self):
        # 2 matched of 3 gt / 4 pred -> p=0.5 r=2/3 hmean=4/7
        m, ng, npred = 2, 3, 4
        hmean = 2 * m / (ng + npred)
        assert abs(hmean - 4 / 7) < 1e-12


def _rand_tree(rng, depth=0):
    n = _Node(rng.choice("abc"))
    if depth < 3:
        for _ in range(rng.randrange(0, 3)):
            n.children.append(_rand_tree(rng, depth + 1))
    return n


def _brute_forest_distance(a, b):
    """Independent recursive forest-edit-distance reference."""

    def fsize(f):
        return sum(1 + fsize(n.children) for n in f)

    memo = {}

    def fed(f1, f2):
        key = (tuple(id(x) for x in f1), tuple(id(y) for y in f2))
        if key in memo:
            return memo[key]
        if not f1 and not f2:
            r = 0
        elif not f1:
            r = fsize(f2)
        elif not f2:
            r = fsize(f1)
        else:
            a1, rest1 = f1[-1], f1[:-1]
            b1, rest2 = f2[-1], f2[:-1]
            r = min(
                fed(rest1 + tuple(a1.children), f2) + 1,
                fed(f1, rest2 + tuple(b1.children)) + 1,
                fed(rest1, rest2)
                + fed(tuple(a1.children), tuple(b1.children))
                + (0 if a1.label == b1.label else 1),
            )
        memo[key] = r
        return r

    return fed((a,), (b,))


class TestTeds:
    def test_zhang_shasha_matches_brute_force(self):
        rng = random.Random(5)
        for _ in range(40):
            a, b = _rand_tree(rng), _rand_tree(rng)
            assert tree_edit_distance(a, b) == _brute_forest_distance(a, b)

    def test_parse_counts_nodes(self):
        html = "<table><tr><td>AB</td><td>CD</td><td>EF</td></tr></table>"
        assert _count_nodes(parse_table_html(html)) == 5

    def test_cell_drop_similarity(self):
        html = "<table><tr><td>AB</td><td>CD</td><td>EF</td></tr></table>"
        gt = "<table><tr><td>AB</td><td>CD</td></tr></table>"
        assert teds_similarity(html, gt) == 0.8

    def test_relabel_costs_one(self):
        html = "<table><tr><td>AB</td></tr></table>"
        gt = "<table><tr><td>XY</td></tr></table>"
        # 3 nodes each, one td relabel -> 1 - 1/3
        assert abs(teds_similarity(html, gt) - (1 - 1 / 3)) < 1e-12

    def test_identical_is_one(self):
        html = "<table><tr><td>AB</td></tr></table>"
        assert teds_similarity(html, html) == 1.0
