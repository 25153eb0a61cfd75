"""kNN via cell-ring expansion (north-star J6; SURVEY.md §2.4).

Distributed plan: points are bucketed on a grid; each query probes an
expanding Chebyshev box of cells (the quadkey k-ring generalization)
until it holds >= k candidates, then a FINAL exact pass widens the box
to ceil(kth_distance / cell_size) so no closer point in an unexplored
cell can exist — the result is exactly the true kNN (verified against
the brute-force SQL oracle). Driver only steers ring radii; all data
movement is cell equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _candidates(queries: DataFrame, cells: DataFrame, r_col) -> DataFrame:
    """Join queries to all points within Chebyshev radius r (cells)."""
    q = (
        queries.withColumn("_r", r_col.cast("long"))
        .withColumn("probe_x", F.explode(F.sequence(F.col("qcx") - F.col("_r"), F.col("qcx") + F.col("_r"))))
        .withColumn("probe_y", F.explode(F.sequence(F.col("qcy") - F.col("_r"), F.col("qcy") + F.col("_r"))))
    )
    return q.join(cells, (q.probe_x == cells.cell_x) & (q.probe_y == cells.cell_y), "inner")


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    cell_size: float,
    point_id: str = "pid",
    query_id: str = "qid",
    max_rounds: int = 8,
    max_final_r: int = 64,
) -> DataFrame:
    """points(pid, px, py) x queries(qid, qx, qy) → (qid, pid, d2, rank),
    rank 1..k by squared distance (ties broken by pid — deterministic).

    ``max_final_r`` bounds the phase-2 ring: the exact pass explodes a
    (2r+1)^2 probe box per query, so on adversarially sparse data (kth
    distance >> cell_size) an unbounded r is a quadratic blow-up. If any
    query needs a ring wider than the cap the join raises with guidance
    (use a larger cell_size) instead of silently exploding — exactness
    is never traded for completion.

    Phase 1 starts from a density-derived radius instead of r=1: one
    cheap scalar aggregate sizes the probe box so it is expected to
    hold ~2k points, so typical data converges in a single round
    instead of log2(r_needed) doubling rounds — each round costs
    several driver-steered jobs (count, rank, anti-join, checkpoint),
    which dominated knn wall time. Density is points-per-OCCUPIED-cell
    (count / countDistinct(cell)), not count / bounding-box area: on
    clustered data most of the extent is empty, global density is
    underestimated, and an extent-derived radius overshoots — pulling
    entire clusters as candidates for every clustered query. The start
    radius is additionally clamped to <= 8 regardless of max_final_r
    (overshoot costs (2r+1)^2 rows per query through the rank window;
    undershoot costs one doubling round). Exactness is unaffected:
    phase 1 only needs >= k candidates per query.

    Phase 2 probes only the ANNULUS beyond each query's phase-1 box
    (cells at Chebyshev distance in (r_probe, final_r]) and unions the
    phase-1 top-k: a phase-1 box point outside its box top-k has
    (d2, pid) greater than the box kth, and the final kth over a
    candidate superset can only be <= the box kth, so no excluded
    point can re-enter — re-probing the full (2r+1)^2 box (the old
    plan) recounted every phase-1 cell. Queries whose final_r fits
    inside the already-probed box skip phase 2 entirely (their box
    top-k is provably the exact answer).
    """
    cs = float(cell_size)
    cells = points.withColumn("cell_x", F.floor(F.col("px") / cs)).withColumn(
        "cell_y", F.floor(F.col("py") / cs))
    q = queries.withColumn("qcx", F.floor(F.col("qx") / cs)).withColumn(
        "qcy", F.floor(F.col("qy") / cs))

    # explicit multiplication (not pow) so the value is bit-identical to
    # SQL oracles computing (px-qx)*(px-qx)+...
    d2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
    w = Window.partitionBy(query_id).orderBy("d2", point_id)

    # phase 1: expand r (doubling) until every query sees >= k candidates.
    # pending/found are localCheckpoint'ed each round: the loop otherwise
    # accumulates an anti-join + union lineage per round, and every later
    # action would replay all earlier rounds' joins.
    stats = cells.agg(
        F.count("*").alias("n"),
        F.count_distinct("cell_x", "cell_y").alias("n_cells"),
    ).collect()[0]
    r = 1
    if stats["n"] and stats["n_cells"] and stats["n"] > k:
        import math

        # points per occupied cell; a probe box that lands on data (the
        # only interesting case) sees >= this per covered occupied cell
        per_cell = stats["n"] / stats["n_cells"]
        side = math.sqrt(2.0 * k / per_cell)
        r = max(1, math.ceil((side - 1.0) / 2.0))
        r = min(r, 8, max_final_r)

    pending = q
    found = None      # (query cols..., kth_dist, r_probe) per done query
    topk = None       # (query_id, point_id, d2, rank) phase-1 box top-k
    for _ in range(max_rounds):
        cand = _candidates(pending, cells, F.lit(r))
        counts = cand.groupBy(query_id).agg(F.count("*").alias("n"))
        done_ids = counts.filter(F.col("n") >= k).select(query_id)
        ranked = (
            cand.join(done_ids, query_id)
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, "d2", "rank")
        )
        topk = ranked if topk is None else topk.unionByName(ranked)
        topk = topk.localCheckpoint(eager=False)
        kth = (
            topk.filter(F.col("rank") == k)
            .select(query_id, F.sqrt("d2").alias("kth_dist"))
        )
        done_q = pending.join(kth, query_id).withColumn("r_probe", F.lit(r))
        found = done_q if found is None else found.unionByName(done_q)
        found = found.localCheckpoint(eager=False)
        pending = pending.join(done_ids, query_id, "left_anti").localCheckpoint()
        if pending.isEmpty():
            break
        r *= 2
    else:
        raise ValueError(f"kNN did not converge in {max_rounds} rounds (k too large?)")

    # phase 2: annulus-only exact pass (see docstring proof)
    final = found.withColumn(
        "final_r", (F.ceil(F.col("kth_dist") / F.lit(cs)) + 1).cast("long"))
    widest = final.agg(F.max("final_r").alias("r")).collect()[0]["r"]
    if widest is not None and widest > max_final_r:
        raise ValueError(
            f"kNN phase-2 ring {widest} exceeds max_final_r={max_final_r}: "
            f"data too sparse for cell_size={cs} — increase cell_size "
            f"(or raise max_final_r knowingly; probe cost grows as r^2)")
    final = final.localCheckpoint(eager=False)

    settled_ids = final.filter(F.col("final_r") <= F.col("r_probe")).select(query_id)
    settled = topk.join(settled_ids, query_id, "left_semi")

    widen = final.filter(F.col("final_r") > F.col("r_probe"))
    annulus = (
        widen.withColumn("probe_x", F.explode(
            F.sequence(F.col("qcx") - F.col("final_r"), F.col("qcx") + F.col("final_r"))))
        .withColumn("probe_y", F.explode(
            F.sequence(F.col("qcy") - F.col("final_r"), F.col("qcy") + F.col("final_r"))))
        .filter(F.greatest(F.abs(F.col("probe_x") - F.col("qcx")),
                           F.abs(F.col("probe_y") - F.col("qcy"))) > F.col("r_probe"))
    )
    ann_cand = (
        annulus.join(cells, (annulus.probe_x == cells.cell_x)
                     & (annulus.probe_y == cells.cell_y), "inner")
        .withColumn("d2", d2)
        .select(query_id, point_id, "d2")
    )
    box_cand = topk.join(widen.select(query_id), query_id, "left_semi").select(
        query_id, point_id, "d2")
    widened = (
        ann_cand.unionByName(box_cand)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "d2", "rank")
    )
    return settled.unionByName(widened)
