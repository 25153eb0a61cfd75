"""Interval-join tests (operators/interval_join.py): inclusive-bounds
semantics, cell-boundary straddles, left join with NULL fill, the
explode guard, the no-nested-loop plan contract, and a randomized
brute-force twin."""

import datetime as dt

import numpy as np
import pytest

from rastertiler_rs_spark.operators.interval_join import interval_join


def T(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(s))


@pytest.fixture
def frames(spark):
    P = spark.createDataFrame(
        [(1, T(0)), (2, T(5)), (3, T(10)), (4, T(3599)), (5, T(7200))],
        "pid long, ts timestamp")
    V = spark.createDataFrame(
        [(10, T(0), T(10)), (11, T(5), T(3600)), (12, T(7201), T(9000))],
        "iid long, start timestamp, end timestamp")
    return P, V


def test_inclusive_bounds_and_boundary_cells(frames):
    P, V = frames
    got = sorted((r["pid"], r["iid"]) for r in interval_join(
        P, V, cell_width_us=1_000_000_000).collect())
    # pid1 in [0,10]; pid2 in both [0,10] and [5,3600] (inclusive
    # start); pid3 in [0,10] (inclusive end) and [5,3600];
    # pid4 in [5,3600]; pid5 matches nothing (7200 < 7201)
    assert got == [(1, 10), (2, 10), (2, 11), (3, 10), (3, 11), (4, 11)]


def test_left_join_null_fill(frames):
    P, V = frames
    rows = interval_join(P, V, how="left",
                         cell_width_us=1_000_000_000).collect()
    unmatched = [r for r in rows if r["iid"] is None]
    assert [r["pid"] for r in unmatched] == [5]
    assert len(rows) == 7


def test_explode_guard(frames):
    P, V = frames
    with pytest.raises(ValueError, match="max_cells_per_interval"):
        interval_join(P, V, cell_width_us=1_000_000,
                      max_cells_per_interval=10)


def test_column_collision_rejected(spark, frames):
    P, _ = frames
    V = spark.createDataFrame([(1, T(0), T(1))],
                              "pid long, start timestamp, end timestamp")
    with pytest.raises(ValueError, match="alias"):
        interval_join(P, V)


def test_plan_is_equi_join(frames):
    P, V = frames
    plan = interval_join(P, V)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # an EQUI join on the cell


def test_randomized_vs_bruteforce(spark):
    rng = np.random.default_rng(23)
    pts = rng.integers(0, 100000, 200)
    s0 = rng.integers(0, 100000, 80)
    ln = rng.integers(0, 5000, 80)
    P = spark.createDataFrame(
        [(i, T(int(pts[i]))) for i in range(200)], "pid long, ts timestamp")
    V = spark.createDataFrame(
        [(i, T(int(s0[i])), T(int(s0[i] + ln[i]))) for i in range(80)],
        "iid long, start timestamp, end timestamp")
    got = sorted((r["pid"], r["iid"]) for r in interval_join(
        P, V, cell_width_us=977_000_000).collect())
    want = sorted((i, j) for i in range(200) for j in range(80)
                  if s0[j] <= pts[i] <= s0[j] + ln[j])
    assert got == want
