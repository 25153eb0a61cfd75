"""Connected components / dedup_assign: parity with a driver-side
union-find oracle on random graphs, diameter convergence, singleton
handling, and the non-convergence guard."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.components import (
    connected_components, dedup_assign)


def _union_find(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for v in range(n_vertices):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(11)
    n = 200
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2))
             if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "v long")
    got = {r["v"]: r["lbl"]
           for r in connected_components(df, vertices=verts).collect()}
    assert got == _union_find(n, edges)


def test_chain_diameter_convergence(spark):
    """A 40-vertex path has diameter 39: label propagation must still
    reach the fixed point (min id flows down the whole chain)."""
    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df).collect()
    assert {r["lbl"] for r in got} == {0}
    assert len(got) == 40


def test_max_rounds_guard(spark):
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(df, max_rounds=2)


def test_dedup_assign_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["component_id"], r["is_canonical"])
           for r in dedup_assign(docs, pairs).collect()}
    assert out[1] == (1, True) and out[4] == (1, False) and out[7] == (1, False)
    assert out[2] == (2, True) and out[9] == (2, False)
    for v in (0, 3, 5, 6, 8):
        assert out[v] == (v, True)
    # dedup keeps exactly one survivor per cluster
    assert sum(1 for _, c in out.items() if c[1]) == 7
