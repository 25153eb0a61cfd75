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


def materialize_mbtiles(fused: DataFrame, metadata: DataFrame, path: str,
                        max_tiles: int = 5_000_000) -> None:
    """Collect a (small) fused tile table into a real .mbtiles file.

    A single SQLite file is inherently single-node, so this collects to
    the driver — bounded by ``max_tiles`` (default ~5M ≈ a few GB of
    PNGs): pointing this at a continental z14 render would otherwise OOM
    the driver silently. Past the cap, use ``write_tile_tables`` (the
    distributed parquet sink, CLI ``--tiles-dir``) instead.

    Single pass: collect through limit(max+1) — if the cap trips we
    raise without having buffered the full table, and without running
    the render twice for a separate count().
    """
    rows = fused.limit(max_tiles + 1).collect()
    if len(rows) > max_tiles:
        raise ValueError(
            f"materialize_mbtiles: tile count exceeds max_tiles={max_tiles}; "
            "a single .mbtiles file is a driver-side materialization — "
            "use the distributed parquet sink (write_tile_tables / CLI "
            "--tiles-dir) for large pyramids, or raise max_tiles knowingly")
    tiles = [(r["zoom"], r["x"], r["tile_row"], r["tile_hash"]) for r in rows]
    blobs = {r["tile_hash"]: bytes(r["png"]) for r in rows}
    meta = [(r["name"], r["value"]) for r in metadata.collect()]
    write_mbtiles(path, sorted(tiles), blobs, meta)
