"""As-of (nearest-event) join — the canonical "operator Spark lacks"
from the build brief, expressed Spark-first as a sorted-merge in ONE
window pass instead of an inequality join.

The naive formulation (left JOIN right ON key AND r.ts <= l.ts, then
argmax per left row) is a range join: Catalyst plans it as a broadcast
nested loop or a cartesian fragment — quadratic per key, unusable at
100 TB. The shape here is the classic scalable one:

  tag both inputs → union → ONE shuffle on the key →
  window(key ORDER BY ts, side) carrying the most recent right
  payload forward (F.last ignorenulls over a struct) → keep left rows

One exchange, one sort, zero join nodes, no per-key Python; skewed
keys behave like any other window (sort-based, spillable). Ordering
puts the right row BEFORE the left row at equal timestamps, so the
match rule is ts_right <= ts_left inclusive (backward) / >= (forward),
and among equal (key, ts) right rows the LAST in ``tiebreak`` order
wins (backward) / the FIRST (forward) — stated so an oracle can
restate it.

The reference engine has no temporal surface; this extends the
engine's events toolkit (sessionize, windowed aggregation) with the
missing enrich-by-latest-state primitive."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None,
              tiebreak: str | None = None,
              suffix: str = "_matched") -> DataFrame:
    """For each left row: the single right row sharing ``on`` with the
    greatest ``right_ts`` <= ``left_ts`` (backward) or the least
    ``right_ts`` >= ``left_ts`` (forward); unmatched left rows keep
    NULL matched columns. ``tolerance_us`` (microseconds) null-outs
    matches farther than the gap. ``right_cols`` defaults to every
    right column except the key; each arrives as ``<col><suffix>``
    (the matched ``right_ts`` is always included). All matched columns
    come from the SAME right row — they ride one struct."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on]
    if right_ts not in right_cols:
        right_cols = [right_ts] + list(right_cols)
    bad = [c for c in right_cols if c not in right.columns]
    if bad:
        raise ValueError(f"right_cols not in right: {bad}")

    lpay = F.struct(*[F.col(c) for c in left.columns])
    rpay = F.struct(*[F.col(c) for c in right_cols])
    lp_t = left.select(lpay.alias("x")).schema["x"].dataType
    rp_t = right.select(rpay.alias("x")).schema["x"].dataType
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    tb_t = right.select(tb.alias("x")).schema["x"].dataType

    l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"), lpay.alias("_lp"),
        F.lit(None).cast(rp_t).alias("_rp"),
        F.lit(None).cast(tb_t).alias("_tb"))
    # a right row with NULL key/ts can never be a match — null its
    # payload so the ignorenulls window skips it entirely
    r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"), F.lit(None).cast(lp_t).alias("_lp"),
        F.when(F.col(on).isNotNull() & F.col(right_ts).isNotNull(),
               rpay).alias("_rp"),
        tb.alias("_tb"))
    uni = l.unionByName(r)

    if direction == "backward":
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                      F.col("_tb").asc_nulls_last())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = F.last("_rp", ignorenulls=True).over(w)
    else:
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_ts").asc(), F.col("_side").desc(),
                      F.col("_tb").asc_nulls_first())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        matched = F.first("_rp", ignorenulls=True).over(w)

    # SQL semantics: a NULL key or NULL timestamp matches nothing
    # (without this, a null-ts left row sorts NULLS FIRST and the
    # forward frame would hand it the partition's earliest right row)
    matched = F.when(
        F.col("_k").isNotNull() & F.col("_ts").isNotNull(), matched)
    out = uni.withColumn("_m", matched).where(F.col("_side") == 1)
    if tolerance_us is not None:
        # cast handles TIMESTAMP_NTZ inputs (a pure reinterpretation
        # under the engine's pinned UTC session timezone)
        gap = F.abs(F.unix_micros(F.col("_ts").cast("timestamp"))
                    - F.unix_micros(F.col("_m")[right_ts].cast("timestamp")))
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(int(tolerance_us)), F.col("_m")))
    sel = [F.col("_lp")[c].alias(c) for c in left.columns] + [
        F.col("_m")[c].alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*sel)
