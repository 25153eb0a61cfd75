"""SPACE-FILLING-CURVE DATA LAYOUT — cluster the images table along
the quadtree curve so spatial queries prune parquet files instead of
scanning them.

At 100 TB the cheapest join is the one whose input never leaves disk:
parquet keeps per-row-group min/max for every column, and Spark pushes
comparison filters down to the footer check — but only helps if rows
with nearby keys live in the same files. ``cluster_by_quadkey``
rewrites a table sorted by the quadkey STRING of each footprint's
center tile: repartitionByRange gives every output file a contiguous
quadkey range (ranges are disjoint and sorted — pinned in tests by
reading the parquet footers back), and any quadtree-cell query is a
PREFIX of that key, i.e. one contiguous string range
(``quadkey_between``), so the scan touches only the files whose
min/max overlap the cell. This is the layout half of the engine's
cell-index story: the same key the joins bucket by becomes the order
the bytes sit in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.columns import quadkey_col
from .. import tilemath as tm


def center_tile_cols(zoom: int):
    """(tx, ty) of the tile containing the footprint center — plain
    float arithmetic matching tilemath's mercator grid (layout only:
    the key orders bytes, it is not a value contract)."""
    n = 1 << zoom
    cx = (F.col("minx") + F.col("maxx")) / 2.0
    cy = (F.col("miny") + F.col("maxy")) / 2.0
    tx = F.floor((cx + tm.ORIGIN) / tm.CE * n).cast("long")
    ty = F.floor((tm.ORIGIN - cy) / tm.CE * n).cast("long")
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(n - 1), c))  # noqa: E731
    return clamp(tx), clamp(ty)


def cluster_by_quadkey(images: DataFrame, out_path: str, zoom: int = 12,
                       n_files: int = 8) -> None:
    """Rewrite ``images`` clustered by the z-``zoom`` quadkey of the
    footprint center (footprints derived if absent, same rule as
    render): range-partitioned into ``n_files`` contiguous curve
    segments, sorted within each — one parquet file per segment."""
    from .render import with_footprints

    tx, ty = center_tile_cols(zoom)
    keyed = with_footprints(images).withColumn(
        "qk", quadkey_col(F.lit(zoom), tx, ty))
    (keyed.repartitionByRange(n_files, "qk")
     .sortWithinPartitions("qk")
     .write.mode("overwrite").parquet(out_path))


def quadkey_between(prefix: str, zoom: int) -> tuple[str, str]:
    """The inclusive quadkey-string range of a quadtree CELL: every
    z-``zoom`` quadkey under ``prefix`` sorts between prefix padded
    with '0' and prefix padded with '3' (fixed-length base-4 strings,
    lexicographic == curve order within a level)."""
    if len(prefix) > zoom or any(c not in "0123" for c in prefix):
        raise ValueError(f"bad quadkey prefix {prefix!r} for zoom {zoom}")
    return prefix.ljust(zoom, "0"), prefix.ljust(zoom, "3")


def read_cell(spark: SparkSession, path: str, prefix: str,
              zoom: int = 12) -> DataFrame:
    """Scan only the quadtree cell ``prefix``: the BETWEEN filter on
    the clustering key reaches the parquet footers (PushedFilters), so
    non-overlapping files/row groups are skipped at scan time."""
    lo, hi = quadkey_between(prefix, zoom)
    return spark.read.parquet(path).where(F.col("qk").between(lo, hi))
