"""Gap sessionization: hand-built event streams pin the session
boundary rule (gap strictly greater than gap_minutes starts a new
session; ties and sub-second components floored to epoch seconds)."""

import datetime as dt

from rastertiler_rs_spark.operators.sessionize import (session_rollup,
                                                       sessionize)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, seconds_offset, value)"""
    data = [(eid, BASE + dt.timedelta(seconds=s), uid, "click", v, "{}")
            for eid, uid, s, v in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_session_boundaries_and_rollup(spark):
    gap = 30  # minutes
    ev = _events(spark, [
        # user 1: 3 events inside one session (gaps 10 min, exactly 30 min)
        (0, 1, 0, 1.00), (1, 1, 600, 2.00), (2, 1, 600 + 1800, 0.50),
        # then a 30-min-plus-1-sec gap → new session
        (3, 1, 600 + 1800 + 1801, 4.00),
        # user 2: single event
        (4, 2, 50, 9.99),
    ])
    s = {r["event_id"]: r["session_seq"] for r in sessionize(ev, gap).collect()}
    # exactly-30-min gap stays in session 1; 30:01 starts session 2
    assert s == {0: 1, 1: 1, 2: 1, 3: 2, 4: 1}

    roll = {(r["user_id"], r["session_seq"]): r.asDict()
            for r in session_rollup(ev, gap).collect()}
    r11 = roll[(1, 1)]
    assert r11["n_events"] == 3
    assert r11["duration_s"] == 600 + 1800
    assert r11["value_cents"] == 100 + 200 + 50
    assert roll[(1, 2)]["n_events"] == 1
    assert roll[(2, 1)]["value_cents"] == 999


def test_session_subsecond_floor(spark):
    """Events 30:00.9 apart but 1800 s apart after flooring stay in one
    session — the floored-epoch rule both engines share."""
    ev = spark.createDataFrame(
        [(0, BASE + dt.timedelta(microseconds=900_000), 5, "v", 1.0, "{}"),
         (1, BASE + dt.timedelta(seconds=1800, microseconds=100_000), 5, "v", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    s = {r["event_id"]: r["session_seq"] for r in sessionize(ev, 30).collect()}
    assert s == {0: 1, 1: 1}
