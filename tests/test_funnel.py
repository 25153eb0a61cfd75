"""window_funnel vs an exhaustive-subsequence brute force.

The operator (operators/funnel.py) computes, per user, the max k such
that events e1..ek exist with types steps[0..k-1], STRICTLY increasing
timestamps (by value — ties cannot chain), and t_k - t_1 <= window.
The brute force enumerates every subsequence, so it checks the DP's
latest-start exchange argument, the prefix-window-safety claim, and
the strictly-earlier RANGE frame all at once.  Also pins the two extra
oracle columns: sum_levels (per-event DP levels summed) and
last_full_start_us (latest t_1 among completed full chains).
"""

import itertools
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import given, settings, strategies as st

from rastertiler_rs_spark.operators.funnel import window_funnel

STEPS = ["a", "b", "c"]
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _brute_row_level(evts, end_idx, steps, window_us):
    """Max k: a subsequence typed steps[0..k-1], strictly increasing by
    ts VALUE, ending exactly at evts[end_idx], span <= window."""
    us_e, ty_e = evts[end_idx]
    best = 0
    n = len(evts)
    for k in range(1, len(steps) + 1):
        if ty_e != steps[k - 1]:
            continue
        for combo in itertools.combinations(range(n), k - 1):
            chain = [evts[i] for i in combo] + [(us_e, ty_e)]
            if any(chain[j][1] != steps[j] for j in range(k)):
                continue
            if any(chain[j][0] >= chain[j + 1][0] for j in range(k - 1)):
                continue
            if chain[-1][0] - chain[0][0] > window_us:
                continue
            best = max(best, k)
            break
    return best


def _brute_user(evts, steps, window_us):
    # combinations() respect LIST order; chains are defined by ts-VALUE
    # order, so sort first (ties stay adjacent and are rejected by the
    # strict-increase check)
    evts = sorted(evts)
    row_lvls = [_brute_row_level(evts, i, steps, window_us)
                for i in range(len(evts))]
    level = max(row_lvls, default=0)
    n_entry = sum(1 for _, t in evts if t == steps[0])
    sum_levels = sum(row_lvls)
    last_start = None
    k = len(steps)
    for i, (us_e, ty_e) in enumerate(evts):
        if ty_e != steps[-1]:
            continue
        for combo in itertools.combinations(range(len(evts)), k - 1):
            chain = [evts[j] for j in combo] + [(us_e, ty_e)]
            if any(chain[j][1] != steps[j] for j in range(k)):
                continue
            if any(chain[j][0] >= chain[j + 1][0] for j in range(k - 1)):
                continue
            if chain[-1][0] - chain[0][0] > window_us:
                continue
            if last_start is None or chain[0][0] > last_start:
                last_start = chain[0][0]
    return level, n_entry, sum_levels, last_start


def _run(spark, rows, steps, window_us):
    df = spark.createDataFrame(
        [(u, t, EPOCH + timedelta(microseconds=us))
         for (u, us, t) in rows],
        "user_id long, event_type string, ts timestamp")
    out = window_funnel(df, steps, window_us)
    return {r["user"]: (r["level"], r["n_entry"], r["sum_levels"],
                        r["last_full_start_us"]) for r in out.collect()}


def test_worked_example(spark):
    # user 1: a@0, b@10, c@15 within window 20 -> level 3, start 0
    # user 2: a@0, b@30 (window 20: 30-0>20) -> level 1
    # user 3: tie a@5, b@5 cannot chain -> level max(1, 0) = 1
    # user 4: only 'x' events -> level 0
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 15, "c"),
            (2, 0, "a"), (2, 30, "b"),
            (3, 5, "a"), (3, 5, "b"),
            (4, 7, "x")]
    got = _run(spark, rows, STEPS, 20)
    base1 = EPOCH.timestamp()  # createDataFrame ts -> unix micros offset
    assert got[1][0] == 3
    # user 2: 'a' row-lvl 1; 'b'@30 fails 0 >= 30-20 -> row-lvl 0
    assert got[2] == (1, 1, 1, None)
    assert got[3][0] == 1
    assert got[4] == (0, 0, 0, None)
    # user 1 full-chain start = us of its 'a' event
    assert got[1][3] == int(base1 * 1_000_000) + 0


def test_brute_worked_example_agrees(spark):
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 15, "c"),
            (2, 0, "a"), (2, 30, "b"),
            (3, 5, "a"), (3, 5, "b"),
            (4, 7, "x")]
    got = _run(spark, rows, STEPS, 20)
    base_us = int(EPOCH.timestamp() * 1_000_000)
    by_user = {}
    for u, us, t in rows:
        by_user.setdefault(u, []).append((us, t))
    for u, evts in by_user.items():
        lvl, n_entry, sl, ls = _brute_user(evts, STEPS, 20)
        exp_ls = None if ls is None else base_us + ls
        assert got[u] == (lvl, n_entry, sl, exp_ls), u


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=2),      # user
              st.integers(min_value=0, max_value=40),     # us offset
              st.sampled_from(["a", "b", "c", "x"])),     # type
    min_size=1, max_size=9))
def test_matches_brute_force(spark, rows):
    window_us = 12
    got = _run(spark, rows, STEPS, window_us)
    base_us = int(EPOCH.timestamp() * 1_000_000)
    by_user = {}
    for u, us, t in rows:
        by_user.setdefault(u, []).append((us, t))
    for u, evts in by_user.items():
        lvl, n_entry, sl, ls = _brute_user(evts, STEPS, window_us)
        exp_ls = None if ls is None else base_us + ls
        assert got[u] == (lvl, n_entry, sl, exp_ls), (u, sorted(evts))


def test_empty_steps_raises(spark):
    df = spark.createDataFrame([(1, "a", EPOCH)],
                               "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        window_funnel(df, [], 10)
