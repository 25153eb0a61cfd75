"""Heatmap tile rendering — the vector→raster half of the engine's
tile toolkit (render.py is raster→raster, vector_tiles.py is
vector→vector): bin mercator points into per-pixel counts per z/x/y
tile and encode count rasters as PNG tiles (the datashader shape).

Designed for 10^12 points: stage 1 is a (tile, pixel) COUNT aggregate
— pure JVM with map-side partial combine, so the shuffle carries at
most tile_size² rows per touched tile no matter how many points hit
it; stage 2 groups the ≤ ts² count rows per tile and paints + encodes
the canvas in one python pass. No point ever crosses the wire as a
row after stage 1, and a hot tile is bounded by its pixel count, not
its point count. The pyramid form derives EVERY zoom from the one
base binning (a parent pixel is the sum of its 4 children, which
composes across levels to gx >> k) — one explode + one aggregate, so
the whole pyramid costs one extra shuffle, not one per level.

Pixel rule (stated for the SQL twin): global pixel index
gx = clamp(floor((mx + ORIGIN) / CE * 2^z * ts), 0, 2^z*ts - 1),
gy likewise from (ORIGIN - my); tile x = gx // ts, in-tile px =
gx - x*ts. Counts encode via the kernel's u32 path (adaptive
palette/RGB PNG, reference parity colormap.rs:96-101), nodata 0 =
"no points" — so pixels whose summed weight is <= 0 render as
nodata; weights are expected positive."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tilemath import ORIGIN, CE


def _binned(points: DataFrame, zoom: int, tile_size: int,
            weight: str | None) -> DataFrame:
    """(px, py[, weight]) → per-global-pixel summed counts at `zoom`.

    Pure JVM column math; the groupBy gets a map-side partial combine
    so the shuffle is bounded by touched-pixel count, not point count.
    """
    if zoom < 0 or zoom > 30:
        raise ValueError(f"zoom {zoom} out of range")
    if tile_size < 1 or tile_size > 4096:
        raise ValueError(f"tile_size {tile_size} out of range")
    n_px = F.lit(float((1 << zoom) * tile_size))
    lim = (1 << zoom) * tile_size - 1

    def clampi(col):
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit(lim).cast("long"), col.cast("long")))

    gx = clampi(F.floor((F.col("px") + F.lit(ORIGIN)) / F.lit(CE) * n_px))
    gy = clampi(F.floor((F.lit(ORIGIN) - F.col("py")) / F.lit(CE) * n_px))
    w = (F.col(weight).cast("long") if weight else F.lit(1).cast("long"))
    return (points
            .select(gx.alias("gx"), gy.alias("gy"), w.alias("_w"))
            .groupBy("gx", "gy")
            .agg(F.sum("_w").alias("cnt")))


def _paint_tiles(pixel_counts: DataFrame, tile_size: int) -> DataFrame:
    """(zoom, gx, gy, cnt) pixel rows → encoded PNG tiles.

    floor(gx / ts) is exact for any positive tile_size: a double
    quotient of longs < 2^52 can only cross an integer boundary when
    the division is exact, so the floor never misassigns a pixel.
    """
    ts = F.lit(tile_size)
    cells = pixel_counts.select(
        "zoom",
        F.floor(F.col("gx") / ts).cast("long").alias("x"),
        F.floor(F.col("gy") / ts).cast("long").alias("y"),
        (F.col("gx") % ts).cast("int").alias("pxc"),
        (F.col("gy") % ts).cast("int").alias("pyc"),
        "cnt")

    def paint(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernel import encode_tile

        z = int(pdf["zoom"].iloc[0])
        x, y = int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
        canvas = np.zeros((tile_size, tile_size), dtype=np.uint32)
        cnt = np.clip(pdf["cnt"].to_numpy(), 0, 0xFFFFFFFF)
        canvas[pdf["pyc"].to_numpy(), pdf["pxc"].to_numpy()] = \
            cnt.astype(np.uint32)
        data = encode_tile(canvas, "u32", 0)
        return pd.DataFrame({"zoom": [z], "x": [x], "y": [y],
                             "tile_row": [(1 << z) - 1 - y],
                             "bytes": [data]})

    return cells.groupBy("zoom", "x", "y").applyInPandas(
        paint, "zoom int, x long, y long, tile_row long, bytes binary")


def points_to_heatmap(points: DataFrame, zoom: int,
                      tile_size: int = 256,
                      weight: str | None = None) -> DataFrame:
    """(px, py [, weight]) mercator points → (zoom, x, y, tile_row,
    bytes) count-raster PNG tiles; ``weight`` sums an integer column
    instead of counting rows. Only touched tiles are emitted."""
    base = _binned(points, zoom, tile_size, weight)
    return _paint_tiles(base.select(F.lit(zoom).alias("zoom"),
                                    "gx", "gy", "cnt"), tile_size)


def heatmap_pyramid(points: DataFrame, min_zoom: int, max_zoom: int,
                    tile_size: int = 256,
                    weight: str | None = None) -> DataFrame:
    """All zooms [min_zoom, max_zoom] from ONE base binning.

    Count rasters aggregate by SUM under 2x decimation (unlike the
    raster pyramid's nearest rule): the zoom-(max-k) pixel covering a
    base pixel is exactly (gx >> k, gy >> k) when tile_size is shared
    across levels, so every level is a re-aggregation of the base
    pixel table. One explode over the k levels + one (zoom, pixel)
    aggregate — map-side combine collapses the 4^k fan-in before the
    shuffle, so the pyramid costs one extra exchange total, not one
    per level, and low-zoom hot tiles stay bounded by ts² rows."""
    if not 0 <= min_zoom <= max_zoom <= 30:
        raise ValueError(f"bad zoom range [{min_zoom}, {max_zoom}]")
    base = _binned(points, max_zoom, tile_size, weight)
    k = F.col("k")
    levels = (base
              .select("gx", "gy", "cnt",
                      F.explode(F.sequence(
                          F.lit(0), F.lit(max_zoom - min_zoom))).alias("k"))
              .select((F.lit(max_zoom) - k).cast("int").alias("zoom"),
                      F.expr("shiftright(gx, k)").alias("gx"),
                      F.expr("shiftright(gy, k)").alias("gy"),
                      "cnt")
              .groupBy("zoom", "gx", "gy")
              .agg(F.sum("cnt").alias("cnt")))
    return _paint_tiles(levels, tile_size)
