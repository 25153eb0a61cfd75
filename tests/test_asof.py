"""As-of join tests (operators/asof.py): backward/forward semantics,
inclusive-equality, tie-break rule, tolerance null-out, unmatched
rows, a randomized brute-force twin, and the plan contract (one
window pass, ZERO join nodes)."""

import datetime as dt

import numpy as np
import pytest

from rastertiler_rs_spark.operators.asof import asof_join


def T(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=float(s))


@pytest.fixture
def frames(spark):
    L = spark.createDataFrame(
        [(1, T(10), "a"), (1, T(5), "b"), (2, T(7), "c"), (3, T(1), "d")],
        "k long, ts timestamp, tag string")
    R = spark.createDataFrame(
        [(1, T(3), 100.0), (1, T(10), 200.0), (2, T(8), 300.0)],
        "k long, ts timestamp, val double")
    return L, R


def test_backward_inclusive_and_unmatched(frames):
    L, R = frames
    got = {r["tag"]: r["val_matched"]
           for r in asof_join(L, R, on="k").collect()}
    assert got == {"a": 200.0, "b": 100.0, "c": None, "d": None}


def test_forward_inclusive(frames):
    L, R = frames
    got = {r["tag"]: r["val_matched"]
           for r in asof_join(L, R, on="k", direction="forward").collect()}
    assert got == {"a": 200.0, "b": 200.0, "c": 300.0, "d": None}


def test_tolerance_nullout(frames):
    L, R = frames
    got = {r["tag"]: r["val_matched"]
           for r in asof_join(L, R, on="k",
                              tolerance_us=1_000_000).collect()}
    # b's match is 2 s away -> nulled; a is exact (gap 0)
    assert got == {"a": 200.0, "b": None, "c": None, "d": None}


def test_tiebreak_rule(spark):
    """Equal (key, ts) right rows: LAST in tiebreak order wins
    backward, FIRST wins forward."""
    L = spark.createDataFrame([(1, T(5), "x")],
                              "k long, ts timestamp, tag string")
    R = spark.createDataFrame(
        [(1, T(5), 7, 700.0), (1, T(5), 9, 900.0), (1, T(5), 8, 800.0)],
        "k long, ts timestamp, seq long, val double")
    back = asof_join(L, R, on="k", tiebreak="seq").collect()[0]
    assert back["val_matched"] == 900.0
    fwd = asof_join(L, R, on="k", tiebreak="seq",
                    direction="forward").collect()[0]
    assert fwd["val_matched"] == 700.0


def test_plan_has_no_join_node(frames):
    L, R = frames
    plan = asof_join(L, R, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan
    # exactly one exchange moves data (the key shuffle); AQE may add a
    # read node but no second hash/range partitioning of the union
    assert plan.count("hashpartitioning(_k") <= 1


def test_randomized_vs_bruteforce(spark):
    rng = np.random.default_rng(17)
    lts = rng.integers(0, 1000, 120)
    rts = rng.integers(0, 1000, 150)
    lk = rng.integers(0, 6, 120)
    rk = rng.integers(0, 6, 150)
    rv = rng.integers(1, 10**6, 150)
    L = spark.createDataFrame(
        [(int(lk[i]), T(int(lts[i])), i) for i in range(120)],
        "k long, ts timestamp, lid long")
    R = spark.createDataFrame(
        [(int(rk[i]), T(int(rts[i])), int(rv[i]), i) for i in range(150)],
        "k long, ts timestamp, val long, rid long")
    got = {r["lid"]: r["val_matched"]
           for r in asof_join(L, R, on="k", tiebreak="rid").collect()}
    for i in range(120):
        cand = [(rts[j], j, int(rv[j])) for j in range(150)
                if rk[j] == lk[i] and rts[j] <= lts[i]]
        want = max(cand)[2] if cand else None
        assert got[i] == want, i


def test_validation_errors(frames):
    L, R = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(L, R, on="k", direction="sideways")
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(L, R, on="k", right_cols=["nope"])


def test_null_ts_and_null_key_match_nothing(spark):
    L = spark.createDataFrame(
        [(1, None, "nts"), (None, T(5), "nk"), (1, T(5), "ok")],
        "k long, ts timestamp, tag string")
    R = spark.createDataFrame(
        [(1, T(1), 1.0), (None, T(1), 9.0), (1, None, 8.0)],
        "k long, ts timestamp, val double")
    for direction in ("backward", "forward"):
        got = {r["tag"]: r["val_matched"]
               for r in asof_join(L, R, on="k",
                                  direction=direction).collect()}
        assert got["nts"] is None and got["nk"] is None, direction
    # ...and a NULL-ts RIGHT row is never a match (it sorts NULLS
    # FIRST; without the payload guard it would backfill every left
    # row that has no real predecessor)
    assert {r["tag"]: r["val_matched"] for r in
            asof_join(L, R, on="k").collect()}["ok"] == 1.0
