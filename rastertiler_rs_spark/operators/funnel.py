"""WINDOW FUNNEL — max completed ordered-step level per user within a
sliding time window (the ClickHouse `windowFunnel` / product-analytics
conversion primitive): level(u) = max k such that events e₁,…,e_k
exist with types steps[0..k-1], STRICTLY increasing timestamps, and
t_k − t₁ ≤ window.

Spark-first, no python stage and no self-joins: a DP over one
user-time sort. Let f_j(e) = the LATEST chain start t₁ among length-j
chains ending at e (the latest start is optimal — any chain a smaller
start satisfies, a larger one satisfies too). Then

    f_1(e)            = t_e                      if type(e) = steps[0]
    f_j(e of step j)  = m_{j-1}(before e)        if m_{j-1} ≥ t_e − W

where m_j(before e) = max f_j over STRICTLY EARLIER events — a
running-max window. The window frame is RANGE (unboundedPreceding,
-1) over epoch-micros, so "strictly earlier" is by VALUE: ties in ts
cannot chain with each other and the result is deterministic under
any row order. All k levels share ONE window spec ⇒ Catalyst plans a
single exchange + a single sort for the whole funnel; per-user state
is a running max, spillable, skew-tolerant like any sort-based
window. The intermediate window checks are prefix-safe: if the full
chain fits the window, every prefix does (t_{e'} < t_e), so no valid
chain is discarded early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def window_funnel(events: DataFrame, steps: list[str], window_us: int,
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """→ (user, level, n_entry, sum_levels, last_full_start_us): per
    user the max completed funnel level (0 = has events but no
    steps[0]), the count of entry-step events, the SUM of per-event DP
    levels (pins the entire DP table, not just the per-user max), and
    the latest chain start t₁ among FULL-length completed chains
    (NULL when level < len(steps)) — f_j(e) is provably the max t₁
    over valid j-chains ending at e, so max f_K is the latest valid
    full-chain start. One shuffle, k window passes on the shared
    sort."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = events.select(F.col(user_col).alias("user"),
                       F.col(type_col).alias("etype"),
                       us.alias("us"))
    w = (Window.partitionBy("user").orderBy("us")
         .rangeBetween(Window.unboundedPreceding, -1))
    df = df.withColumn(
        "f1", F.when(F.col("etype") == steps[0], F.col("us")))
    for j in range(2, len(steps) + 1):
        prev = F.max(f"f{j - 1}").over(w)
        df = df.withColumn(
            f"f{j}",
            F.when((F.col("etype") == steps[j - 1])
                   & (prev >= F.col("us") - F.lit(int(window_us))),
                   prev))
    lvl = F.lit(0)
    for j in range(1, len(steps) + 1):
        lvl = F.when(F.col(f"f{j}").isNotNull(), F.lit(j)).otherwise(lvl)
    return (df.withColumn("row_lvl", lvl)
            .groupBy("user")
            .agg(F.max("row_lvl").cast("long").alias("level"),
                 F.sum((F.col("etype") == steps[0]).cast("long"))
                 .alias("n_entry"),
                 F.sum("row_lvl").cast("long").alias("sum_levels"),
                 F.max(F.col(f"f{len(steps)}")).cast("long")
                 .alias("last_full_start_us")))
