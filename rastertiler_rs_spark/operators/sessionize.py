"""Gap-based sessionization over the events table.

Classic event analytics the reference (a batch tile renderer) has no
analog for — an engine extension in the §2.10 window/sort family: an
event belongs to the same session as its predecessor iff the gap to the
previous event of the same user is <= ``gap_minutes``.

100 TB shape: ONE shuffle, on user_id — the lag/cumsum window and the
per-session aggregate share the same partitioning, so Catalyst plans a
single Exchange and both windows run in-partition. Per-user state is a
sort within the partition (Tungsten spillable); a pathological single
hot user degrades to one task's sort, the standard sessionization
caveat (mitigate upstream by splitting bot users, not here).

Cross-engine determinism: timestamps are floored to epoch seconds on
BOTH engines before the gap compare (the repo float rule —
tests/check_oracle verify against a DuckDB twin using the same
FLOOR(epoch) expression); ordering ties break on event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session_seq (1-based per user) to every event:
    (event_id, user_id, ts, value, es, session_seq)."""
    es = F.floor(F.unix_timestamp("ts")).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tagged = events.withColumn("es", es).withColumn(
        "prev_es", F.lag("es").over(w))
    new_s = F.when(
        F.col("prev_es").isNull()
        | (F.col("es") - F.col("prev_es") > gap_minutes * 60), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (tagged.withColumn("session_seq",
                              F.sum(new_s).over(cum).cast("long"))
            .drop("prev_es"))


def session_rollup(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregate: (user_id, session_seq, n_events, start_es,
    end_es, duration_s, value_cents) — all integers (value floored to
    cents), oracle-verifiable."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq").agg(
            F.count("*").alias("n_events"),
            F.min("es").alias("start_es"),
            F.max("es").alias("end_es"),
            (F.max("es") - F.min("es")).alias("duration_s"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        ))


def cohort_retention(events: DataFrame, period_s: int = 86400,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """COHORT RETENTION — the product-analytics triangle: users are
    grouped into cohorts by the period (floor(epoch/period_s)) of
    their FIRST event; output (cohort, k, n_users) counts the cohort's
    distinct users active exactly k periods later.

    ONE shuffle on user builds (first period, set of active periods)
    per user in the same aggregate — collect_set is bounded by the
    number of periods a user can touch, not by events — then the
    explode is already (user, period)-distinct so the (cohort, k)
    rollup is a plain count, pre-combined map-side. No self-join of
    events against first-events, no countDistinct shuffle."""
    p = F.floor(F.unix_timestamp(F.col(ts_col)) / period_s).cast("long")
    per_user = (events.select(F.col(user_col).alias("user"), p.alias("p"))
                .groupBy("user")
                .agg(F.min("p").alias("cohort"),
                     F.collect_set("p").alias("ps")))
    active = per_user.select(
        "user", "cohort", F.explode("ps").alias("p"))
    return (active.groupBy(
                "cohort", (F.col("p") - F.col("cohort")).alias("k"))
            .agg(F.count("*").alias("n_users")))
