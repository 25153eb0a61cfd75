"""Tileset merge (the reference's second subcommand).

Re-expresses `rastertiler-rs merge` (/root/reference/src/mbtiles.rs:147-221):
INSERT OR IGNORE from source into destination = left-anti join on the
map PK (zoom_level, tile_column, tile_row) resp. images PK (tile_id),
then UNION; minzoom/maxzoom metadata = min/max across both (A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MAP_KEY = ["zoom", "x", "tile_row"]


def merge_fused(left: DataFrame, right: DataFrame) -> DataFrame:
    """Merge two fused tile tables (zoom,x,y,tile_row,tile_hash,png).

    Left wins on (zoom, x, tile_row) conflicts — the semantics of
    `INSERT OR IGNORE INTO map ... SELECT FROM source.map`
    (/root/reference/src/mbtiles.rs:168-171) where the destination row
    is kept. Right-only tiles are appended.
    """
    right_only = right.join(left.select(*_MAP_KEY), _MAP_KEY, "left_anti")
    return left.unionByName(right_only)


def merge_tables(left_map: DataFrame, left_images: DataFrame,
                 right_map: DataFrame, right_images: DataFrame):
    """Same merge over MBTiles-shaped (map, images) DataFrame pairs.

    images: `INSERT OR IGNORE ... SELECT * from source.images`
    (/root/reference/src/mbtiles.rs:174-178) = union + dedup on tile_id
    (rows with equal tile_id carry identical bytes — tile_id IS the
    content hash — so which duplicate survives is value-irrelevant).
    """
    key = ["zoom_level", "tile_column", "tile_row"]
    merged_map = left_map.unionByName(right_map.join(left_map.select(*key), key, "left_anti"))
    merged_images = left_images.unionByName(right_images).dropDuplicates(["tile_id"])
    return merged_map, merged_images


def merge_metadata(left_meta: DataFrame, right_meta: DataFrame) -> DataFrame:
    """minzoom/maxzoom merge via UNION + min/max CTE semantics
    (/root/reference/src/mbtiles.rs:181-207); all other keys keep the
    left (destination) value."""
    both = left_meta.unionByName(right_meta)
    zooms = (
        both.filter(F.col("name").isin("minzoom", "maxzoom"))
        .groupBy("name")
        .agg(
            F.when(F.first("name") == "minzoom",
                   F.min(F.col("value").cast("int")))
            .otherwise(F.max(F.col("value").cast("int")))
            .cast("string")
            .alias("value")
        )
    )
    return left_meta.filter(~F.col("name").isin("minzoom", "maxzoom")).unionByName(zooms)
