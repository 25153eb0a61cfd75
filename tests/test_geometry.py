"""Geometry aggregates (operators/geometry.py): the JVM shoelace
folds must equal the integer formula, and the monotone-chain strict
hull must equal the O(n³) all-points-strictly-left edge
characterization on general-position sets."""

import numpy as np

from rastertiler_rs_spark.operators.geometry import (convex_hull_stats,
                                                     hull_mask,
                                                     polygon_metrics)


def shoelace_ref(pts):
    n = len(pts)
    a2 = cx = cy = 0
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        cr = x0 * y1 - x1 * y0
        a2 += cr
        cx += (x0 + x1) * cr
        cy += (y0 + y1) * cr
    return a2, cx, cy


def hull_ref(pts):
    """Strict hull membership by the ccw hull-edge characterization:
    vertex a is on the hull iff some ordered edge a→b leaves every
    other point STRICTLY left. Exact for general-position sets."""
    n = len(pts)
    keep = set()
    for ai in range(n):
        ax, ay = pts[ai]
        for bi in range(n):
            if bi == ai:
                continue
            bx, by = pts[bi]
            if all((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0
                   for ci, (cx, cy) in enumerate(pts)
                   if ci not in (ai, bi)):
                keep.add(ai)
                break
    return keep


def _hull_sets():
    # the gate fixture's constants: no duplicates, no 3 collinear
    out = []
    for gid in range(12):
        n = 10 + (gid * 5) % 14
        pts = [(((i * i * 10 + gid * 26 + i * 33) % 101) - 50,
                ((i * i * i * 58 + i * 18 + gid * 27) % 97) - 48)
               for i in range(n)]
        out.append((gid, pts))
    return out


def test_fixture_general_position():
    from itertools import combinations
    for _, pts in _hull_sets():
        assert len(set(pts)) == len(pts)
        for (x1, y1), (x2, y2), (x3, y3) in combinations(pts, 3):
            assert (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) != 0


def test_hull_mask_matches_edge_characterization():
    rng = np.random.default_rng(91)
    cases = [pts for _, pts in _hull_sets()]
    while len(cases) < 24:
        n = int(rng.integers(3, 40))
        pts = [tuple(map(int, rng.integers(-1000, 1000, 2)))
               for _ in range(n)]
        from itertools import combinations
        if len(set(pts)) != n:
            continue
        if any((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) == 0
               for (x1, y1), (x2, y2), (x3, y3) in combinations(pts, 3)):
            continue
        cases.append(pts)
    for pts in cases:
        xs = np.array([p[0] for p in pts], np.int64)
        ys = np.array([p[1] for p in pts], np.int64)
        got = {i for i, k in enumerate(hull_mask(xs, ys)) if k}
        assert got == hull_ref(pts), pts
    # tiny sets pass through whole
    assert hull_mask(np.array([3]), np.array([4])).tolist() == [True]
    assert hull_mask(np.array([3, 9]), np.array([4, 1])).all()


def test_polygon_metrics_jvm(spark):
    polys = [
        (0, [(0, 0), (4, 0), (4, 3), (0, 3)]),        # ccw rect: 2A=24
        (1, [(0, 0), (0, 3), (4, 3), (4, 0)]),        # cw rect: 2A=-24
        (2, [(1, 1), (7, 2), (5, 9)]),                # triangle
        (3, [(0, 0), (6, 0), (6, 6), (3, 3), (0, 6)]),  # concave
        (4, [(0, 0), (4, 4), (4, 0), (0, 4)]),        # self-crossing
        (5, [(2, 5)]),                                # degenerate → 0
    ]
    rows = [(pid, [{"x": x, "y": y} for x, y in pts]) for pid, pts in polys]
    df = spark.createDataFrame(
        rows, "poly_id long, pts array<struct<x: long, y: long>>")
    got = {r.poly_id: (r.n_vtx, r.area2, r.cx6a, r.cy6a)
           for r in polygon_metrics(df).collect()}
    for pid, pts in polys:
        if len(pts) >= 3:
            a2, cx, cy = shoelace_ref(pts)
        else:
            a2 = cx = cy = 0
        assert got[pid] == (len(pts), a2, cx, cy), (pid, got[pid])
    assert got[0][1] == 24 and got[1][1] == -24
    # centroid of the ccw rect: (2, 1.5) -> 6A·C = (72·2, 72·1.5)
    assert (got[0][2], got[0][3]) == (144, 108)


def test_convex_hull_stats_spark(spark):
    rows = [(gid, x, y) for gid, pts in _hull_sets() for x, y in pts]
    df = spark.createDataFrame(rows, "gid long, x long, y long")
    got = {r.gid: (r.n_vtx, r.sum_hx, r.sum_hy)
           for r in convex_hull_stats(df).collect()}
    for gid, pts in _hull_sets():
        keep = hull_ref(pts)
        want = (len(keep),
                sum(pts[i][0] for i in keep),
                sum(pts[i][1] for i in keep))
        assert got[gid] == want, gid
