"""Interval (range) join — the second "operator Spark lacks" named in
the build brief, expressed with the engine's cell-index trick in 1D
(operators/spatial_join.py is the 2D form: cell equi-join + residual
predicate, /root/reference has no temporal surface at all).

A raw range predicate (p.ts BETWEEN i.start AND i.end) gives Catalyst
no equality to hash on: it plans a broadcast nested loop — every
point against every interval, quadratic, dead at 100 TB. Bucketizing
time into fixed cells turns it into an EQUI-join:

  intervals explode to their covering cells (sequence(), JVM-side) →
  points map to exactly ONE cell each → shuffle hash/sort-merge join
  on the cell → residual BETWEEN filter.

Because a point lives in exactly one cell, each qualifying
(point, interval) pair meets exactly once — NO dedup exchange (the
same reference-point argument as the zonal pair rule). Skew = a hot
cell; the cell width is the knob, and a guard fails fast when one
interval would explode past ``max_cells_per_interval`` (split such
intervals upstream or widen the cell)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", start: str = "start",
                  end: str = "end", cell_width_us: int = 3_600_000_000,
                  max_cells_per_interval: int = 1024,
                  how: str = "inner") -> DataFrame:
    """All (point, interval) pairs with start <= point_ts <= end
    (inclusive both ends). Output = every point column + every
    interval column (caller aliases collisions first). ``how`` is
    'inner' or 'left' (unmatched points kept with NULL interval
    columns — implemented as the inner join unioned with an anti
    join, both reusing the same cell exchange)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"alias colliding columns first: {sorted(overlap)}")
    if cell_width_us <= 0:
        raise ValueError("cell_width_us must be positive")

    def micros(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    cw = F.lit(int(cell_width_us))
    p = points.withColumn("_cell", F.floor(micros(point_ts) / cw))
    c0 = F.floor(micros(start) / cw)
    c1 = F.floor(micros(end) / cw)
    iv = intervals.where(F.col(start) <= F.col(end))
    guard = iv.select(F.max(c1 - c0).alias("m")).first()
    if guard["m"] is not None and guard["m"] + 1 > max_cells_per_interval:
        raise ValueError(
            f"an interval covers {guard['m'] + 1} cells "
            f"(> max_cells_per_interval={max_cells_per_interval}); widen "
            f"cell_width_us or split long intervals upstream")
    iv = iv.withColumn("_cell", F.explode(F.sequence(c0, c1)))
    joined = (p.join(iv, on="_cell")
              .where((F.col(point_ts) >= F.col(start))
                     & (F.col(point_ts) <= F.col(end)))
              .drop("_cell"))
    if how == "inner":
        return joined
    # left: matched point rows ∪ (points anti-join matched) with NULL
    # interval columns. Point rows must be distinct for the anti key —
    # fail fast rather than silently dropping duplicates.
    pk = list(points.columns)
    if points.dropDuplicates(pk).count() != points.count():
        raise ValueError("how='left' requires distinct point rows "
                         "(add a unique id column)")
    unmatched = points.join(
        joined.select(*pk).dropDuplicates(pk), on=pk, how="left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType))
    return joined.unionByName(unmatched)
