"""Cell-indexed spatial joins (J3/J4).

The reference's tile↔raster join is implicit (every enumerated tile is
window-read; bbox intersection decides emptiness,
/root/reference/src/dataset.rs:163-166). Generalized here: a
box-overlap (theta) join executed as an EQUI-join on covering grid
cells plus an exact bbox residual predicate — the standard
broadcast-or-partitioned spatial-join plan Catalyst can optimize
(hash/broadcast on the cell key, AQE skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_cover_cells(df: DataFrame, cell_size: float, prefix: str = "") -> DataFrame:
    """Explode a box table to one row per covering grid cell.

    Expects columns {prefix}minx/miny/maxx/maxy. Adds cell_x, cell_y.
    The grid is floor(coord / cell_size) — an abstract-plane analog of
    the zoom-Z quadkey grid (tilemath.tile_range with CE/2^Z = cell_size).
    """
    cs = F.lit(float(cell_size))
    c = lambda name: F.col(prefix + name)  # noqa: E731
    return (
        df.withColumn("_cx0", F.floor(c("minx") / cs))
        .withColumn("_cx1", F.floor(c("maxx") / cs))
        .withColumn("_cy0", F.floor(c("miny") / cs))
        .withColumn("_cy1", F.floor(c("maxy") / cs))
        .withColumn("cell_x", F.explode(F.sequence("_cx0", "_cx1")))
        .withColumn("cell_y", F.explode(F.sequence("_cy0", "_cy1")))
        .drop("_cx0", "_cx1", "_cy0", "_cy1")
    )


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    cell_size: float,
    left_keys: list[str],
    right_keys: list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """Box-overlap join: left.box ∩ right.box ≠ ∅ (strict overlap, the
    reference's window-intersection semantics).

    Both sides carry minx/miny/maxx/maxy (right's prefixed r_*).
    Executed as cell equi-join + residual predicate + pair dedup (a pair
    may share several cells). Returns left_keys + right_keys.
    """
    lc = with_cover_cells(left, cell_size)
    rc = with_cover_cells(right, cell_size, prefix="r_")
    if broadcast_right:
        rc = F.broadcast(rc)
    residual = (
        (F.col("minx") < F.col("r_maxx"))
        & (F.col("maxx") > F.col("r_minx"))
        & (F.col("miny") < F.col("r_maxy"))
        & (F.col("maxy") > F.col("r_miny"))
    )
    return (
        lc.join(rc, ["cell_x", "cell_y"], "inner")
        .filter(residual)
        .select(*left_keys, *right_keys)
        .dropDuplicates(left_keys + right_keys)
    )
