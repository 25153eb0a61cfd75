"""Douglas–Peucker simplification (operators/simplify.py): the
stack-based integer kernel must equal a direct recursive reference,
endpoints always survive, and the exact-integer tie/degenerate rules
hold."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.simplify import (dp_keep_mask,
                                                     simplify_polylines)


def dp_ref(pts, eps):
    """Textbook recursive DP with the module's stated rules: strict
    `cross² > eps²·|AB|²`, ties to smallest index, |AB|²=0 degrades to
    squared point distance."""
    n = len(pts)
    keep = {0, n - 1}

    def rec(a, b):
        if b - a < 2:
            return
        ax, ay = pts[a]
        bx, by = pts[b]
        dx, dy = bx - ax, by - ay
        ab2 = dx * dx + dy * dy
        best_d, best_i = -1, None
        for i in range(a + 1, b):
            px, py = pts[i][0] - ax, pts[i][1] - ay
            d = (px * px + py * py) if ab2 == 0 else \
                (dx * py - dy * px) ** 2
            if d > best_d:
                best_d, best_i = d, i
        thr = eps * eps if ab2 == 0 else eps * eps * ab2
        if best_d > thr:
            keep.add(best_i)
            rec(a, best_i)
            rec(best_i, b)

    rec(0, n - 1)
    return np.array([i in keep for i in range(n)])


def _rand_lines():
    rng = np.random.default_rng(77)
    for n in (3, 5, 8, 20, 40, 73):
        for eps in (0, 1, 2, 5, 13):
            xs = np.cumsum(rng.integers(1, 9, n)).astype(np.int64)
            ys = rng.integers(-30, 30, n).astype(np.int64)
            yield xs, ys, eps


def test_matches_recursive_reference():
    for xs, ys, eps in _rand_lines():
        got = dp_keep_mask(xs, ys, eps)
        want = dp_ref(list(zip(xs.tolist(), ys.tolist())), eps)
        assert np.array_equal(got, want), (xs, ys, eps)
        assert got[0] and got[-1]


def test_rules():
    # eps=0 keeps every vertex off the chord, drops exactly-collinear
    xs = np.array([0, 1, 2, 3, 4], np.int64)
    ys = np.array([0, 1, 2, 1, 0], np.int64)
    assert dp_keep_mask(xs, ys, 0).tolist() == [True, False, True, False, True]
    straight = dp_keep_mask(np.arange(6, dtype=np.int64),
                            np.arange(6, dtype=np.int64), 0)
    assert straight.tolist() == [True] + [False] * 4 + [True]
    # strict comparison: deviation exactly AT tolerance is dropped
    # (cross² = 4·ab2 when the midpoint sits 2 units off a horizontal
    # chord of any length: cross = 2·dx, ab2 = dx²)
    xs = np.array([0, 5, 10], np.int64)
    ys = np.array([0, 2, 0], np.int64)
    assert dp_keep_mask(xs, ys, 2).tolist() == [True, False, True]
    assert dp_keep_mask(xs, ys, 1).tolist() == [True, True, True]
    # closed chord (A == B): squared point distance vs eps²
    xs = np.array([0, 3, 0], np.int64)
    ys = np.array([0, 0, 0], np.int64)
    assert dp_keep_mask(xs, ys, 2).tolist() == [True, True, True]
    assert dp_keep_mask(xs, ys, 3).tolist() == [True, False, True]
    # tiny lines pass through
    assert dp_keep_mask(np.array([7]), np.array([9]), 5).tolist() == [True]
    assert dp_keep_mask(np.array([], np.int64),
                        np.array([], np.int64), 5).size == 0
    # huge coordinates don't overflow (object-int path)
    big = np.array([0, 2**31, 2**32], np.int64)
    wob = np.array([0, 1, 0], np.int64)
    assert dp_keep_mask(big, wob, 0).tolist() == [True, True, True]


def test_spark_operator(spark):
    rows, want = [], {}
    for lid, (xs, ys, eps) in enumerate(_rand_lines()):
        rows.append((lid, [{"x": int(x), "y": int(y)}
                           for x, y in zip(xs, ys)], eps))
        keep = dp_keep_mask(xs, ys, eps)
        want[lid] = [(int(x), int(y))
                     for x, y, k in zip(xs, ys, keep) if k]
    df = spark.createDataFrame(
        rows, "line_id long, pts array<struct<x: long, y: long>>, tol long")
    got = {r.line_id: [(p["x"], p["y"]) for p in r.pts]
           for r in simplify_polylines(df, tolerance=0).collect()}
    assert got == want
    # fixed-tolerance form (no tol column)
    df2 = df.drop("tol")
    got2 = {r.line_id: [(p["x"], p["y"]) for p in r.pts]
            for r in simplify_polylines(df2, tolerance=3).collect()}
    for lid, (xs, ys, _) in enumerate(_rand_lines()):
        keep = dp_keep_mask(xs, ys, 3)
        assert got2[lid] == [(int(x), int(y))
                             for x, y, k in zip(xs, ys, keep) if k]
