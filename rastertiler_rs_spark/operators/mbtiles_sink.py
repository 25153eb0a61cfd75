"""Sinks: distributed parquet tile tables + driver-side .mbtiles file.

The distributed sink is the (map, images)-shaped parquet pair written
partitioned by zoom — at 100 TB that's the product. The SQLite
materialization (DDL per /root/reference/src/mbtiles.rs:13-30) is a
small-scale golden-comparison convenience, like the reference's final
single-file flush (/root/reference/src/mbtiles.rs:125-144).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..oracle import write_mbtiles
from .render import blobs_table, tiles_table


def write_tile_tables(fused: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Write map/ and images/ parquet. Partitioned by zoom_level so per-
    zoom consumers (and the overview builder) prune partitions; images/
    is hash-keyed and deduped (A5)."""
    tiles_table(fused).write.mode(mode).partitionBy("zoom_level").parquet(f"{out_dir}/map")
    blobs_table(fused).write.mode(mode).parquet(f"{out_dir}/images")


def materialize_mbtiles(fused: DataFrame, metadata: DataFrame, path: str) -> None:
    """Collect a (small) fused tile table into a real .mbtiles file."""
    rows = fused.collect()
    tiles = [(r["zoom"], r["x"], r["tile_row"], r["tile_hash"]) for r in rows]
    blobs = {r["tile_hash"]: bytes(r["png"]) for r in rows}
    meta = [(r["name"], r["value"]) for r in metadata.collect()]
    write_mbtiles(path, sorted(tiles), blobs, meta)
