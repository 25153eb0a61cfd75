"""J5 point-in-polygon: the cell-prefiltered scale plan must produce
exactly the broadcast-loop plan's pairs — including at a polygon count
(1e3) where the loop plan is the wrong plan and the prefilter is the
one that would run at 100 TB."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.pip import pip_join, ray_cast


def _polys(n: int) -> list[tuple]:
    """n disjoint-ish boxes + triangles tiling a 320x320 extent."""
    out = []
    for k in range(n):
        x0 = (k % 32) * 10.0 + (k % 3) * 0.25
        y0 = (k // 32) * 10.0 + (k % 5) * 0.2
        w, h = 6.0 + (k % 4), 5.0 + (k % 3)
        if k % 4 == 0:  # non-rectangular: triangle
            out.append((k, [(x0, y0), (x0 + w, y0), (x0 + w / 2, y0 + h)]))
        else:
            out.append((k, [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]))
    return out


def _points(spark, n: int):
    from pyspark.sql import functions as F

    return (spark.range(n)
            .select(F.col("id").alias("pid"),
                    ((F.col("id") * 37) % 3200 / 10.0 + F.lit(0.05)).alias("px"),
                    ((F.col("id") * 53) % 3200 / 10.0 + F.lit(0.15)).alias("py")))


@pytest.mark.parametrize("cell_size", [4.0, 10.0, 33.0])
def test_prefilter_matches_broadcast_loop(spark, cell_size):
    polys = _polys(1000)
    pts = _points(spark, 4000)
    loop = {(r["pid"], r["poly_id"])
            for r in pip_join(pts, polys).collect()}
    pre = [(r["pid"], r["poly_id"])
           for r in pip_join(pts, polys, cell_size=cell_size).collect()]
    assert len(pre) == len(set(pre))  # one cell per point ⇒ no dup pairs
    assert set(pre) == loop
    assert len(loop) > 500  # the comparison is non-vacuous


def test_prefilter_plan_is_candidate_equijoin(spark):
    """The scale plan must be a broadcast cell equi-join feeding the ray
    cast — no cartesian, no shuffle of the points side."""
    df = pip_join(_points(spark, 100), _polys(64), cell_size=10.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning" not in plan  # points never shuffle


def test_ray_cast_boundary_semantics():
    """Even-odd rule with the strict `<` crossing test: interior in,
    exterior out; vertices/edges follow the half-open convention, so
    shared edges between adjacent polygons never double-count."""
    xs = np.array([0.0, 10.0, 10.0, 0.0])
    ys = np.array([0.0, 0.0, 10.0, 10.0])
    px = np.array([5.0, -1.0, 10.5, 5.0])
    py = np.array([5.0, 5.0, 5.0, 15.0])
    assert ray_cast(px, py, xs, ys).tolist() == [True, False, False, False]
