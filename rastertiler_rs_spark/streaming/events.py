"""Event-stream analytics: watermarked windowed aggregation and a
stateful streaming dedup.

The reference is a batch CLI with no event/stream surface; these are
the engine's Spark-native extensions over the events/documents table
shapes (TESTDATA.md), exercising the two Structured Streaming
primitives the ingest pipeline (ingest.py) doesn't need:

- ``stream_window_counts``: event-time tumbling windows with a
  watermark — late events older than the watermark are dropped and
  windows finalize (append mode) exactly once, the standard late-data
  contract. At scale this is the shape of a continuously-maintained
  rollup: state is bounded by (windows in watermark horizon x keys),
  not by stream length.
- ``stream_dedup_first_seen``: applyInPandasWithState custom stateful
  operator — keeps the first-seen row per content key across
  micro-batches (the streaming realization of the exact-dedup operator
  in operators/text.py). State is one boolean per key, partitioned by
  the key hash — the same bounded-state shape a 100 TB dedup keeps in a
  state store. Production would add a state TTL (GroupStateTimeout) to
  bound the horizon; the sandbox keeps NoTimeout so tests are exact.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, LongType, StringType, StructField,
                               StructType)

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

DOCS_SCHEMA = "doc_id long, text string"


def stream_window_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
):
    """Tumbling event-time window counts per event_type with a
    watermark. Append mode: a (window, event_type) row is emitted
    exactly once, when the watermark passes the window end; events
    arriving later than ``watermark`` behind the max seen ts are
    dropped. Output parquet at out_dir/counts; restart-safe via the
    Spark checkpoint (state carries unfinalized windows)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             # integer cents: deterministic across engines/re-runs
             F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "event_type", "n_events", "value_cents")
    )
    return (
        agg.writeStream.outputMode("append").format("parquet")
        .option("path", os.path.join(out_dir, "counts"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


_DEDUP_OUT = StructType([
    StructField("content_key", StringType()),
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])
_DEDUP_STATE = StructType([StructField("seen", BooleanType())])


def _first_row(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    first = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.nsmallest(1, "doc_id")
        if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
            first = cand
    return first


def _drain(pdfs: Iterator[pd.DataFrame]) -> None:
    """Exhaust the group's Arrow input stream. Returning from the state
    function with unread batches breaks the worker's Arrow pipe (the
    JVM sees an unexpected EOF, kills the python worker, and retries
    the task — tests still passed but every stateful batch paid a
    crash+retry). Suppression paths must drain before returning."""
    for _ in pdfs:
        pass


def _dedup_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit the group's first-ever row (lowest doc_id within the first
    batch that sees the key — deterministic), then remember the key."""
    if state.exists:
        _drain(pdfs)
        return
    first = _first_row(pdfs)
    if first is not None:
        state.update((True,))
        yield first[["content_key", "doc_id", "text"]]


_DEDUP_TTL_STATE = StructType([StructField("seen", BooleanType()),
                               StructField("deadline_ms", LongType())])


def _dedup_fn_ttl(ttl_ms: int):
    """TTL variant: sliding expiry. A key unseen for ``ttl_ms`` is
    dropped from the state store, so the NEXT sighting re-emits — the
    bounded-horizon dedup contract for unbounded streams: state size is
    bounded by keys active within the TTL window, not by stream
    history. Every sighting resets the clock.

    Two mechanisms cooperate, both driven per batch:
    - the DEADLINE stored in state decides re-emission: a duplicate
      arriving after its key's deadline (batch processing time) is
      treated as first-seen again — correct even if the idle-key
      eviction below hasn't run yet;
    - EventTimeTimeout (ingest-time watermark) evicts keys idle past
      their deadline, which is what actually bounds the store. NOT
      ProcessingTimeTimeout: that mode keeps an availableNow query
      triggering empty batches against wall-clock timers, so the run
      never terminates — measured, not theorized. With the event-time
      form the final no-data batch advances the watermark once, fires
      due evictions, and the query stops."""

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            _drain(pdfs)
            state.remove()
            return
        now = state.getCurrentProcessingTimeMs()
        deadline = now + ttl_ms
        # timeout timestamps must sit strictly above the watermark
        evict_at = max(deadline, state.getCurrentWatermarkMs() + 1)
        if state.exists and now <= state.get[1]:
            _drain(pdfs)
            state.update((True, deadline))  # sliding: reset on sighting
            state.setTimeoutTimestamp(evict_at)
            return
        first = _first_row(pdfs)  # new key, or expired one re-arriving
        if first is not None:
            state.update((True, deadline))
            state.setTimeoutTimestamp(evict_at)
            yield first[["content_key", "doc_id", "text"]]

    return fn


def stream_dedup_first_seen(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    state_ttl_ms: int | None = None,
):
    """Streaming exact dedup: documents arrive as parquet files; only
    the first occurrence of each content_key (md5 of text) ever seen by
    the stream is emitted. applyInPandasWithState keeps one boolean per
    key; duplicates in later batches (or later in the same batch) are
    suppressed. Output parquet at out_dir/unique; checkpoint makes the
    seen-set restart-safe.

    ``state_ttl_ms`` bounds the state horizon for unbounded streams:
    keys unseen for the TTL are evicted (event-time timeout over an
    ingest-time watermark) and a later duplicate re-emits. Without it,
    state grows with the distinct key count forever — exact, but only
    viable when that set is bounded (NoTimeout keeps the sandbox gate
    exact)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    keyed = stream.withColumn("content_key", F.md5(F.col("text")))
    if state_ttl_ms is None:
        deduped = keyed.groupBy("content_key").applyInPandasWithState(
            _dedup_fn, _DEDUP_OUT, _DEDUP_STATE, "append",
            GroupStateTimeout.NoTimeout)
    else:
        # ingest-time watermark: rows carry no event time, so the
        # arrival clock drives eviction (and lets availableNow stop)
        keyed = keyed.withColumn("ts", F.current_timestamp()) \
                     .withWatermark("ts", "0 seconds")
        deduped = keyed.groupBy("content_key").applyInPandasWithState(
            _dedup_fn_ttl(int(state_ttl_ms)), _DEDUP_OUT, _DEDUP_TTL_STATE,
            "append", GroupStateTimeout.EventTimeTimeout)
    return (
        deduped.writeStream.outputMode("append").format("parquet")
        .option("path", os.path.join(out_dir, "unique"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# STREAMING WINDOW FUNNEL — the incremental form of operators/funnel.py.
# The batch DP's entire per-user memory is K latest-chain-start values
# (m_j = max f_j over processed events) plus three monotone counters —
# constant-size state per user, the property that makes the funnel
# streamable at all. Each micro-batch folds its (ts-sorted) events into
# that state; emitted (level, n_entry, sum_levels) are monotone
# nondecreasing, so the stream's final answer per user is the max over
# emissions and equals the batch window_funnel exactly when batches
# arrive in event-time order per user (the file-source contract used
# by the gate; out-of-order ARRIVAL within a batch is handled by the
# sort, ties by VALUE never chain — same rule as batch).
# ---------------------------------------------------------------------------

_FUNNEL_OUT = StructType([
    StructField("user", LongType()),
    StructField("level", LongType()),
    StructField("n_entry", LongType()),
    StructField("sum_levels", LongType()),
])


def _funnel_state_schema(k: int) -> StructType:
    return StructType(
        [StructField(f"m{j}", LongType()) for j in range(1, k + 1)]
        + [StructField("best", LongType()),
           StructField("n_entry", LongType()),
           StructField("sum_levels", LongType())])


def _funnel_fn_factory(steps: list, window_us: int):
    k = len(steps)

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            m = [st[j] for j in range(k)]
            best, n_entry, suml = st[k], st[k + 1], st[k + 2]
        else:
            m = [None] * k
            best, n_entry, suml = 0, 0, 0
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        rows = pd.concat(parts).sort_values(["us", "event_id"])
        us = rows["us"].to_numpy()
        types = rows["event_type"].to_numpy()
        i, n = 0, len(rows)
        while i < n:
            # one group of equal timestamps: every event in it sees the
            # state from BEFORE the group (strictly-earlier-by-value)
            j = i
            staged: dict = {}
            while j < n and us[j] == us[i]:
                t, ty = int(us[j]), types[j]
                lvls = []
                if ty == steps[0]:
                    n_entry += 1
                    lvls.append(1)
                    staged[1] = max(staged.get(1, t), t)
                for lev in range(2, k + 1):
                    if (ty == steps[lev - 1] and m[lev - 2] is not None
                            and m[lev - 2] >= t - window_us):
                        lvls.append(lev)
                        f = m[lev - 2]
                        staged[lev] = max(staged.get(lev, f), f)
                row_lvl = max(lvls, default=0)
                suml += row_lvl
                best = max(best, row_lvl)
                j += 1
            for lev, v in staged.items():
                m[lev - 1] = v if m[lev - 1] is None else max(m[lev - 1], v)
            i = j
        state.update(tuple(m) + (best, n_entry, suml))
        yield pd.DataFrame({"user": [int(key[0])], "level": [best],
                            "n_entry": [n_entry], "sum_levels": [suml]})

    return fn


def stream_funnel(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    steps: list,
    window_us: int,
    max_files_per_trigger: int = 1,
):
    """Streaming windowFunnel: events arrive as parquet files; per user
    the completed-funnel state (K latest chain starts) is carried in
    the state store and each batch emits the user's current monotone
    (level, n_entry, sum_levels). Reader contract: max per user ==
    batch window_funnel when files arrive in event-time order."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    keyed = stream.select(
        F.col("user_id").alias("user"), "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    out = keyed.groupBy("user").applyInPandasWithState(
        _funnel_fn_factory(list(steps), int(window_us)),
        _FUNNEL_OUT, _funnel_state_schema(len(steps)), "append",
        GroupStateTimeout.NoTimeout)
    return (
        out.writeStream.outputMode("append").format("parquet")
        .option("path", os.path.join(out_dir, "levels"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# STREAMING SESSIONIZATION — stateful session windows with a gap rule.
# Per-user state is (open-session start, last event, count, next seq):
# constant size. A session CLOSES — and is emitted exactly once — when
# a LATER event arrives more than `gap_us` after the session's last
# event; the user's final session therefore never emits (the stream
# cannot prove it closed), which is precisely the batch twin's
# "drop each user's last session" restriction. Sessions genuinely span
# micro-batches via the carried state. Reader contract like the
# funnel: files arrive in event-time order per user (same-ts
# permutations cannot move a session boundary — diffs of equal stamps
# are zero). NoTimeout keeps the bounded gate exact; production would
# add EventTimeTimeout eviction like stream_dedup's TTL form.
# ---------------------------------------------------------------------------

_SESS_OUT = StructType([
    StructField("user", LongType()),
    StructField("seq", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
])

_SESS_STATE = StructType([
    StructField("start", LongType()),
    StructField("last", LongType()),
    StructField("cnt", LongType()),
    StructField("seq", LongType()),
])


def _sess_fn_factory(gap_us: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        ts = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["us"])
        if not ts:
            return
        ts.sort()
        if state.exists:
            start, last, cnt, seq = (int(v) for v in state.get)
        else:
            start = last = -1
            cnt, seq = 0, 0
        out = {"user": [], "seq": [], "start_us": [], "end_us": [],
               "n_events": []}
        for t in ts:
            if start < 0:
                start, last, cnt = t, t, 1
            elif t - last > gap_us:
                out["user"].append(user)
                out["seq"].append(seq)
                out["start_us"].append(start)
                out["end_us"].append(last)
                out["n_events"].append(cnt)
                seq += 1
                start, last, cnt = t, t, 1
            else:
                last = t
                cnt += 1
        state.update((start, last, cnt, seq))
        if out["user"]:
            yield pd.DataFrame(out)

    return fn


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    gap_us: int,
    max_files_per_trigger: int = 1,
):
    """Streaming gap-rule sessionization (see module comment above):
    emits each CLOSED session once as (user, seq, start_us, end_us,
    n_events); output parquet at out_dir/sessions, restart-safe via
    the checkpoint."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    keyed = stream.select(
        F.col("user_id").alias("user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    out = keyed.groupBy("user").applyInPandasWithState(
        _sess_fn_factory(int(gap_us)), _SESS_OUT, _SESS_STATE, "append",
        GroupStateTimeout.NoTimeout)
    return (
        out.writeStream.outputMode("append").format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
