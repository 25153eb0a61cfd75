"""Polygon rasterization (operators/rasterize.py): the distributed
burn must equal a Fraction-exact per-pixel even-odd brute force —
pixel-center rule, painter's order, off-canvas clipping."""

from fractions import Fraction

import numpy as np
import pytest

from rastertiler_rs_spark.operators.rasterize import burn_polygons
from rastertiler_rs_spark.png import decode_band


def inside(pts, px, py):
    """Even-odd crossing count with exact rational arithmetic."""
    cnt = 0
    n = len(pts)
    for e in range(n):
        x1, y1 = pts[e]
        x2, y2 = pts[(e + 1) % n]
        if y1 == y2:
            continue
        if y2 < y1:
            x1, y1, x2, y2 = x2, y2, x1, y1
        if not (y1 <= py < y2):
            continue
        xc = Fraction(x1) + Fraction((py - y1) * (x2 - x1), y2 - y1)
        if Fraction(px) < xc:
            cnt += 1
    return cnt % 2 == 1


def brute(polys, w, h):
    canvas = np.zeros((h, w), np.uint8)
    for _, pts, val in sorted(polys):
        for r in range(h):
            for c in range(w):
                if inside(pts, Fraction(2 * c + 1, 2),
                          Fraction(2 * r + 1, 2)):
                    canvas[r, c] = val
    return canvas


def run(spark, polys, w, h, ts):
    rows = [(pid, [{"x": x, "y": y} for x, y in pts], val)
            for pid, pts, val in polys]
    df = spark.createDataFrame(
        rows, "poly_id long, pts array<struct<x: long, y: long>>, "
              "value long")
    out = burn_polygons(df, w, h, ts).collect()
    canvas = np.zeros((h, w), np.uint8)
    for r in out:
        canvas[r.ty * ts:(r.ty + 1) * ts, r.tx * ts:(r.tx + 1) * ts] = \
            decode_band(bytes(r.png), "png;u8")
    return canvas, out


def test_shapes_match_bruteforce(spark):
    polys = [
        (1, [(2, 2), (20, 5), (9, 18)], 50),          # triangle
        (2, [(5, 10), (30, 10), (30, 28), (5, 28)], 90),   # box overlaps 1
        (3, [(14, 1), (26, 13), (14, 25), (2, 13)], 130),  # diamond on top
        (4, [(24, 20), (38, 20), (24, 34), (38, 34)], 170),  # bowtie (self-x)
    ]
    got, _ = run(spark, polys, 48, 48, 16)
    assert np.array_equal(got, brute(polys, 48, 48))


def test_cross_tile_and_clipping(spark):
    # concave polygon spanning 4 tiles + one reaching off-canvas
    polys = [
        (1, [(4, 4), (28, 4), (28, 28), (20, 28), (20, 12),
             (12, 12), (12, 28), (4, 28)], 200),      # U across tiles
        (2, [(-10, -10), (40, -10), (40, 8), (-10, 8)], 60),  # clipped
    ]
    got, out = run(spark, polys, 32, 32, 16)
    assert np.array_equal(got, brute(polys, 32, 32))
    # untouched tiles emit nothing
    keys = {(r.tx, r.ty) for r in out}
    assert keys <= {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_degenerate_and_offcanvas(spark):
    polys = [
        (1, [(5, 5), (5, 9), (5, 12)], 99),           # zero-width
        (2, [(100, 100), (120, 100), (110, 120)], 99),  # fully off canvas
    ]
    got, out = run(spark, polys, 32, 32, 16)
    assert not got.any() and out == []


def test_painter_order(spark):
    sq = lambda x0, y0, s: [(x0, y0), (x0 + s, y0),
                            (x0 + s, y0 + s), (x0, y0 + s)]
    polys = [(2, sq(0, 0, 10), 80), (1, sq(4, 4, 10), 40)]
    got, _ = run(spark, polys, 16, 16, 16)
    assert got[5, 5] == 80          # higher poly_id painted last
    assert got[12, 12] == 40
