"""WATERSHED DELINEATION — D8 basin labeling over a tiled DEM, the
hydrology flagship built from the engine's existing pieces: the halo
exchange supplies each tile its neighbor strips (successors cross
tile borders), the D8 argmax (halo.d8_direction — exact-integer
cross-multiplied slopes) turns pixels into a FUNCTIONAL GRAPH (one
out-edge per pixel, pits are self-loops), and POINTER DOUBLING
resolves every pixel to its terminal pit: J₀ = succ,
J_{k+1}(v) = J_k(J_k(v)) — pits absorb, so ceil(log₂ depth) rounds
suffice (depth is bounded by the strictly-decreasing elevation along
any flow path, ≤ the value range).

Scale shape: per round ONE self-join on the jump table + ONE 1-row
convergence aggregate — the components.py discipline (pinned
repartition, lazy localCheckpoint to cut lineage, decimal sum as the
fixpoint test is replaced here by an exact pit-count). Rows never
exceed one per valid pixel; nothing is ever collected.

Nodata discipline: a nodata-neighbor drop is masked to −1 (nothing
flows into nodata); canvas-border pixels therefore drain inward or
become pits — every valid pixel gets a label.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .halo import _D8_OFFSETS, _halo_unified, _pad_from_group, d8_direction


def pixel_successors(tiles: DataFrame, tile_size: int,
                     nodata: int = 0) -> DataFrame:
    """(v, p): global pixel id → D8 successor id (self for
    pits/flats), one row per valid pixel. v = row·W + col in global
    canvas coordinates; W is derived from the tile grid with one tiny
    aggregate."""
    ts = int(tile_size)
    ext = tiles.agg(F.max("tx").alias("mx")).collect()[0]
    if ext["mx"] is None:
        return tiles.sparkSession.createDataFrame([], "v long, p long")
    width = (int(ext["mx"]) + 1) * ts

    unified = _halo_unified(tiles, ts, corners=True)

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        pad = _pad_from_group(pdf, ts, nodata)
        if pad is None:
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "p": pd.Series([], dtype="int64")})
        c = pad[1:-1, 1:-1]
        valid = c != nodata
        if not valid.any():
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "p": pd.Series([], dtype="int64")})
        drops = []
        for dr, dc, _ in _D8_OFFSETS:
            nb = pad[1 + dr:1 + dr + ts, 1 + dc:1 + dc + ts]
            drops.append(np.where(nb == nodata, np.int64(-1), c - nb))
        dirs = d8_direction(drops)
        rr, cc = np.nonzero(valid)
        gid = (ty * ts + rr).astype(np.int64) * width + (tx * ts + cc)
        d = dirs[rr, cc]
        succ = gid.copy()
        for i, (dr, dc, _) in enumerate(_D8_OFFSETS):
            m = d == i
            succ[m] = gid[m] + dr * width + dc
        return pd.DataFrame({"v": gid, "p": succ})

    return unified.groupBy("tx", "ty").applyInPandas(
        assemble, "v long, p long")


def watershed_labels(tiles: DataFrame, tile_size: int,
                     nodata: int = 0, max_rounds: int = 48) -> DataFrame:
    """(v, pit): every valid pixel's terminal D8 pit, by pointer
    doubling on the successor table. Converges in ceil(log₂ depth)
    rounds; raises after ``max_rounds`` (a DEM whose longest flow
    path exceeds 2^48 pixels does not exist)."""
    spark = tiles.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    succ = (pixel_successors(tiles, tile_size, nodata)
            .repartition(n_parts, "v").persist())
    try:
        pits = succ.filter(F.col("v") == F.col("p")).select("v")
        jump = succ.localCheckpoint()
        for _ in range(max_rounds):
            # rows whose pointer has not yet reached a pit
            pending = (jump.join(pits.withColumnRenamed("v", "p"),
                                 "p", "left_anti").count())
            if pending == 0:
                return jump.select("v", F.col("p").alias("pit"))
            hop = jump.select(F.col("v").alias("p"),
                              F.col("p").alias("p2"))
            jump = (jump.join(hop, "p")
                    .select("v", F.col("p2").alias("p"))
                    .repartition(n_parts, "v")
                    .localCheckpoint(eager=False))
    finally:
        succ.unpersist()
    raise ValueError(
        f"watershed_labels did not converge in {max_rounds} rounds")


def watershed_stats(tiles: DataFrame, tile_size: int,
                    nodata: int = 0) -> DataFrame:
    """Per-tile basin summary in the halo stats schema: n_valid =
    labeled pixels, sum_g2 = Σ pit id (position-weighted assignment
    pin), max_g2 = distinct basins touching the tile."""
    ts = int(tile_size)
    ext = tiles.agg(F.max("tx").alias("mx")).collect()[0]
    width = (int(ext["mx"]) + 1) * ts if ext["mx"] is not None else ts
    lab = watershed_labels(tiles, ts, nodata)
    return (lab.select(
        F.expr(f"(v % {width}) div {ts}").alias("tx"),
        F.expr(f"(v div {width}) div {ts}").alias("ty"),
        "pit")
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n_valid"),
             F.sum("pit").alias("sum_g2"),
             F.count_distinct("pit").alias("max_g2")))


def basin_sizes(tiles: DataFrame, tile_size: int,
                nodata: int = 0) -> DataFrame:
    """(pit, n_px): drainage-basin size per terminal pit — the flow
    accumulation AT the outlets (one groupBy over the labels)."""
    return (watershed_labels(tiles, tile_size, nodata)
            .groupBy("pit").agg(F.count("*").alias("n_px")))


def flow_accumulation(tiles: DataFrame, tile_size: int,
                      nodata: int = 0,
                      max_rounds: int = 512) -> DataFrame:
    """(v, acc): D8 flow accumulation — the number of pixels draining
    THROUGH each pixel, itself included (acc = 1 on ridges, the basin
    size at its pit). Iterates A_{k+1}(v) = 1 + Σ_{u→v} A_k(u): after
    k rounds A_k counts upstream pixels within distance k, so
    convergence takes LONGEST-FLOW-PATH rounds (each ONE join + ONE
    groupBy + a 1-row convergence sum — the components.py loop
    shape). Depth-bounded by design: flow paths shorten as terrain
    roughens (strictly-downhill steps) but a long river channel is a
    long chain — for such DEMs raise ``max_rounds`` (it raises
    rather than returning partial counts) or use basin_sizes /
    watershed_labels (log-depth pointer doubling) when only outlet or
    basin aggregates are needed."""
    spark = tiles.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    succ = (pixel_successors(tiles, tile_size, nodata)
            .repartition(n_parts, "v").persist())
    try:
        edges = (succ.filter(F.col("v") != F.col("p"))
                 .repartition(n_parts, "p").persist())
        acc = (succ.select("v", F.lit(1).cast("long").alias("acc"))
               .repartition(n_parts, "v").localCheckpoint())
        prev = acc.agg(F.sum("acc")).first()[0]
        try:
            for _ in range(max_rounds):
                contrib = (edges.join(acc, "v")
                           .groupBy("p").agg(F.sum("acc").alias("up")))
                acc = (succ.select("v")
                       .join(contrib.withColumnRenamed("p", "v"), "v",
                             "left")
                       .select("v", (F.lit(1)
                                     + F.coalesce(F.col("up"), F.lit(0)))
                               .cast("long").alias("acc"))
                       .repartition(n_parts, "v")
                       .localCheckpoint(eager=False))
                cur = acc.agg(F.sum("acc")).first()[0]
                if cur == prev:
                    return acc
                prev = cur
        finally:
            edges.unpersist()
    finally:
        succ.unpersist()
    raise ValueError(
        f"flow_accumulation did not converge in {max_rounds} rounds — "
        "the longest flow path exceeds the bound; raise max_rounds")


def flow_accumulation_stats(tiles: DataFrame, tile_size: int,
                            nodata: int = 0) -> DataFrame:
    """Per-tile accumulation summary in the halo stats schema:
    n_valid, Σacc (= total drained-through counts, the stream-power
    mass of the tile), max acc (the tile's largest channel)."""
    ts = int(tile_size)
    ext = tiles.agg(F.max("tx").alias("mx")).collect()[0]
    width = (int(ext["mx"]) + 1) * ts if ext["mx"] is not None else ts
    acc = flow_accumulation(tiles, ts, nodata)
    return (acc.select(
        F.expr(f"(v % {width}) div {ts}").alias("tx"),
        F.expr(f"(v div {width}) div {ts}").alias("ty"),
        "acc")
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n_valid"),
             F.sum("acc").alias("sum_g2"),
             F.max("acc").alias("max_g2")))
