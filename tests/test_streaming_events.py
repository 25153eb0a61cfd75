"""Event-stream analytics: watermark/window late-data contract and the
applyInPandasWithState streaming dedup, across restarts (the checkpoint
carries both the watermark and the seen-key state)."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rastertiler_rs_spark.streaming.events import (stream_dedup_first_seen,
                                                   stream_window_counts)

BASE = dt.datetime(2024, 1, 1)


def _events_file(path, rows):
    """rows: (event_id, minutes_offset, event_type, value)"""
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": [BASE + dt.timedelta(minutes=r[1]) for r in rows],
        "user_id": [7] * len(rows),
        "event_type": [r[2] for r in rows],
        "value": [float(r[3]) for r in rows],
        "props": ["{}"] * len(rows),
    })
    table = pa.Table.from_pandas(pdf).set_column(
        1, "ts", pa.Table.from_pandas(pdf)["ts"].cast(pa.timestamp("us")))
    pq.write_table(table, str(path))


def test_window_counts_watermark_drops_late(spark, tmp_path):
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()

    # drop 1: hour-0 events + one at 03:30 that will push the watermark
    _events_file(inp / "a.parquet", [
        (0, 10, "click", 1.25), (1, 20, "click", 2.00), (2, 40, "click", 0.50),
        (3, 30, "view", 3.00), (4, 210, "view", 1.00)])
    q = stream_window_counts(spark, str(inp), str(out),
                             window="1 hour", watermark="2 hours")
    q.awaitTermination(120)
    # availableNow ends with a no-data batch that advances the
    # watermark to 03:30-2h = 01:30 → the hour-0 windows finalize
    rows0 = {(r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
             for r in spark.read.parquet(str(out / "counts")).collect()}
    assert rows0 == {
        (BASE, "click"): (3, 125 + 200 + 50),
        (BASE, "view"): (1, 300),
    }

    # drop 2 (restart): a LATE click for hour 0 (below the persisted
    # watermark 01:30 → dropped) + a fresh event at 10:00 that pushes
    # the watermark to 08:00, finalizing the 03:00 window
    _events_file(inp / "b.parquet", [(5, 30, "click", 9.99),
                                     (6, 600, "view", 1.00)])
    q = stream_window_counts(spark, str(inp), str(out),
                             window="1 hour", watermark="2 hours")
    q.awaitTermination(120)

    rows = {(r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in spark.read.parquet(str(out / "counts")).collect()}
    # hour-0 click count UNCHANGED (the late row was dropped, and the
    # already-finalized window is never re-emitted — append contract)
    assert rows == {
        (BASE, "click"): (3, 125 + 200 + 50),
        (BASE, "view"): (1, 300),
        (BASE + dt.timedelta(hours=3), "view"): (1, 100),
    }


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()

    docs1 = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["aaa", "bbb", "aaa"], pa.string())})
    pq.write_table(docs1, str(inp / "d1.parquet"))
    q = stream_dedup_first_seen(spark, str(inp), str(out))
    q.awaitTermination(120)

    # restart with overlap: bbb is a duplicate, ccc is new
    docs2 = pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                      "text": pa.array(["bbb", "ccc"], pa.string())})
    pq.write_table(docs2, str(inp / "d2.parquet"))
    q = stream_dedup_first_seen(spark, str(inp), str(out))
    q.awaitTermination(120)

    got = {(r["doc_id"], r["text"])
           for r in spark.read.parquet(str(out / "unique")).collect()}
    # first occurrence only: intra-batch dup (doc 3) and cross-batch
    # dup (doc 4) both suppressed; lowest doc_id wins within a batch
    assert got == {(1, "aaa"), (2, "bbb"), (5, "ccc")}


def test_stream_dedup_state_ttl_evicts_and_reemits(spark, tmp_path):
    """With a state TTL, a key unseen for the TTL is evicted from the
    state store (bounded-horizon dedup for unbounded streams) and a
    LATER duplicate re-emits. TTL far below the restart latency, so
    expiry is guaranteed by the time the next run processes data."""
    import time

    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # state store size
    try:
        docs1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                          "text": pa.array(["aaa", "bbb"], pa.string())})
        pq.write_table(docs1, str(inp / "d1.parquet"))
        q = stream_dedup_first_seen(spark, str(inp), str(out), state_ttl_ms=500)
        q.awaitTermination(120)

        time.sleep(1.5)  # both keys pass the TTL

        docs2 = pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                          "text": pa.array(["aaa", "ccc"], pa.string())})
        pq.write_table(docs2, str(inp / "d2.parquet"))
        q = stream_dedup_first_seen(spark, str(inp), str(out), state_ttl_ms=500)
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    got = {(r["doc_id"], r["text"])
           for r in spark.read.parquet(str(out / "unique")).collect()}
    # aaa expired -> re-emitted; bbb expired but never re-arrived (one
    # emission); ccc new
    assert got == {(1, "aaa"), (2, "bbb"), (4, "aaa"), (5, "ccc")}


def test_stream_dedup_state_ttl_suppresses_within_horizon(spark, tmp_path):
    """With a TTL far above the test's wall time, the ProcessingTime-
    timeout mode must behave exactly like NoTimeout: cross-batch and
    intra-batch duplicates suppressed, first (lowest doc_id) wins."""
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()

    # two separate runs: batch order is then deterministic (writing
    # both files upfront raced the file source's same-mtime ordering —
    # the dup's doc_id depended on which batch ran first), and the
    # restart also exercises checkpointed TTL state
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        docs1 = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                          "text": pa.array(["aaa", "bbb", "aaa"], pa.string())})
        pq.write_table(docs1, str(inp / "d1.parquet"))
        q = stream_dedup_first_seen(spark, str(inp), str(out),
                                    state_ttl_ms=600_000)
        q.awaitTermination(120)
        docs2 = pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                          "text": pa.array(["bbb", "ccc"], pa.string())})
        pq.write_table(docs2, str(inp / "d2.parquet"))
        q = stream_dedup_first_seen(spark, str(inp), str(out),
                                    state_ttl_ms=600_000)
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    got = {(r["doc_id"], r["text"])
           for r in spark.read.parquet(str(out / "unique")).collect()}
    assert got == {(1, "aaa"), (2, "bbb"), (5, "ccc")}


def _funnel_events_file(path, rows, base=BASE):
    """rows: (event_id, seconds_offset, user, event_type)"""
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": [base + dt.timedelta(seconds=r[1]) for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    })
    table = pa.Table.from_pandas(pdf).set_column(
        1, "ts", pa.Table.from_pandas(pdf)["ts"].cast(pa.timestamp("us")))
    pq.write_table(table, str(path))


def test_stream_funnel_matches_batch_across_batches(spark, tmp_path):
    """Chains SPANNING micro-batches must complete from carried state:
    user 1's a→b→c arrives one step per file; user 2's chain violates
    the window; user 3 has a tie that must not chain; user 4 restarts
    its chain in batch 3 (latest-start rule). Final max-per-user ==
    batch window_funnel over the concatenated events."""
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.operators.funnel import window_funnel
    from rastertiler_rs_spark.streaming.events import stream_funnel

    steps, w_us = ["a", "b", "c"], 60 * 1_000_000
    files = [
        [(0, 0, 1, "a"), (1, 5, 2, "a"), (2, 7, 3, "a"), (3, 7, 3, "b"),
         (4, 1, 4, "a")],
        [(5, 20, 1, "b"), (6, 100, 2, "b"), (7, 30, 4, "a")],
        [(8, 40, 1, "c"), (9, 50, 4, "b"), (10, 80, 4, "c")],
    ]
    inp, out = tmp_path / "in", tmp_path / "out"
    inp.mkdir()
    all_rows = []
    for k, rows in enumerate(files):
        _funnel_events_file(inp / f"{k:03d}.parquet", rows)
        all_rows += rows
    q = stream_funnel(spark, str(inp), str(out), steps, w_us)
    q.awaitTermination(180)
    got_df = spark.read.parquet(str(out / "levels"))
    got = {r["user"]: (r["level"], r["n_entry"], r["sum_levels"])
           for r in got_df.groupBy("user").agg(
               F.max("level").alias("level"),
               F.max("n_entry").alias("n_entry"),
               F.max("sum_levels").alias("sum_levels")).collect()}
    batch_in = spark.createDataFrame(
        [(u, ty, BASE + dt.timedelta(seconds=s))
         for _, s, u, ty in all_rows],
        "user_id long, event_type string, ts timestamp")
    want = {r["user"]: (r["level"], r["n_entry"], r["sum_levels"])
            for r in window_funnel(batch_in, steps, w_us).collect()}
    assert got == want
    # sanity on the scenario itself: user 1's chain completed ACROSS
    # batches; user 2's b exceeded the window (95 s > 60 s); user 3's
    # tie did not chain; user 4 completed only because the DP keeps the
    # LATEST start (a@30, not a@1 — 80−1 would blow the window)
    assert (want[1][0], want[2][0], want[3][0], want[4][0]) == (3, 1, 1, 3)


def test_stream_sessionize_cross_batch(spark, tmp_path):
    """Sessions spanning micro-batches close from carried state; the
    final session per user is withheld; a crafted timeline matches
    the hand-computed sessions exactly."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from rastertiler_rs_spark.streaming.events import stream_sessionize

    gap = 1_000_000  # 1s
    base = 1_700_000_000_000_000
    # user 1: [0, 0.5s] | gap | [3s, 3.2s, 3.9s] | gap | [10s]  (batch
    # cut between 0.5s and 3s, and inside the second session at 3.2s)
    # user 2: single long session crossing both files -> never emits
    ev1 = [(1, 1, base + 0), (2, 1, base + 500_000),
           (3, 1, base + 3_000_000), (4, 2, base + 0),
           (5, 2, base + 900_000)]
    ev2 = [(6, 1, base + 3_200_000), (7, 1, base + 3_900_000),
           (8, 1, base + 10_000_000), (9, 2, base + 1_700_000)]
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    for k, evs in enumerate((ev1, ev2)):
        pdf = pd.DataFrame({
            "event_id": [e[0] for e in evs],
            "ts": [pd.Timestamp(e[2], unit="us") for e in evs],
            "user_id": [e[1] for e in evs],
            "event_type": ["view"] * len(evs),
            "value": [1.0] * len(evs),
        })
        sdf = spark.createDataFrame(pdf).select(
            "event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id", "event_type", "value")
        tmp = str(tmp_path / f"w{k}")
        sdf.coalesce(1).write.parquet(tmp)
        import glob
        os.replace(glob.glob(f"{tmp}/part-*.parquet")[0],
                   f"{inp}/{k:03d}.parquet")
    q = stream_sessionize(spark, inp, out, gap, max_files_per_trigger=1)
    assert q.awaitTermination(120)
    got = {(r["user"], r["seq"]): (r["start_us"], r["end_us"],
                                   r["n_events"])
           for r in spark.read.parquet(f"{out}/sessions").collect()}
    # user 1 closed sessions: seq 0 = [0, 0.5s] n=2;
    # seq 1 = [3s, 3.9s] n=3 (SPANS the file boundary); the [10s]
    # session stays open. user 2: one session, never closes.
    assert got == {
        (1, 0): (base + 0, base + 500_000, 2),
        (1, 1): (base + 3_000_000, base + 3_900_000, 3),
    }
