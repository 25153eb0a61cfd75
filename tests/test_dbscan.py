"""Distributed DBSCAN vs a direct BFS brute force (core rule,
component naming, min-rule border attach, noise), on random integer
point sets including multi-partition runs."""

from collections import defaultdict

from hypothesis import given, settings, strategies as st

import pytest

from rastertiler_rs_spark.operators.dbscan import dbscan


def _brute(points, eps, min_pts):
    """points: {pid: (x, y)} -> {pid: (cluster, is_core)}"""
    nb = defaultdict(set)
    ids = sorted(points)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            ax, ay = points[a]
            bx, by = points[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= eps * eps:
                nb[a].add(b)
    core = {a for a in ids if len(nb[a]) + 1 >= min_pts}
    lbl = {}
    for a in sorted(core):
        if a in lbl:
            continue
        comp, stack = [], [a]
        seen = {a}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in nb[v]:
                if w in core and w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            lbl[v] = m
    out = {}
    for a in ids:
        if a in core:
            out[a] = (lbl[a], 1)
        else:
            cand = [lbl[b] for b in nb[a] if b in core]
            out[a] = (min(cand), 0) if cand else (-1, 0)
    return out


def _run(spark, points, eps, min_pts, parts=5):
    df = spark.createDataFrame(
        [(pid, x, y) for pid, (x, y) in points.items()],
        "pid long, x long, y long").repartition(parts)
    return {r["pid"]: (r["cluster"], r["is_core"])
            for r in dbscan(df, eps, min_pts).collect()}


def test_worked_blobs(spark):
    # two tight blobs + one border point + isolated noise
    points = {1: (0, 0), 2: (1, 0), 3: (0, 1), 4: (1, 1),   # blob A
              5: (3, 0),                                     # border of A
              10: (50, 50), 11: (51, 50), 12: (50, 51), 13: (51, 51),
              99: (500, 500)}                                # noise
    got = _run(spark, points, eps=2, min_pts=4)
    assert got[1] == (1, 1) and got[4] == (1, 1)
    assert got[5] == (1, 0)          # border: within 2 of (1,0)
    assert got[10] == (10, 1) and got[13] == (10, 1)
    assert got[99] == (-1, 0)


@settings(max_examples=25, deadline=None)
@given(st.dictionaries(st.integers(min_value=-50, max_value=400),
                       st.tuples(st.integers(min_value=-20, max_value=60),
                                 st.integers(min_value=-20, max_value=60)),
                       min_size=1, max_size=25),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=6))
def test_matches_brute_force(spark, points, eps, min_pts):
    assert _run(spark, points, eps, min_pts) == _brute(points, eps, min_pts)


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 0)], "pid long, x long, y long")
    with pytest.raises(ValueError):
        dbscan(df, 0, 1)
