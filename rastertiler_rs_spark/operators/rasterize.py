"""Polygon RASTERIZATION — burn vector polygons into raster tiles
(gdal_rasterize's core), closing the vector→raster pair with
polygonize/isolines' raster→vector: together the engine round-trips
both directions of the raster↔vector bridge the north star names.

A pixel is covered when its CENTER (c+0.5, r+0.5) lies inside the
polygon by the EVEN-ODD rule, and the highest-poly_id covering
polygon paints it (painter's order — stated so the DuckDB twin can
restate it). Everything is exact integer arithmetic: with integer
vertices and half-integer centers a scan row never passes through a
vertex (2r+1 is odd, vertex ys are even after doubling), horizontal
edges drop out of the crossing test by construction, and the
number of pixels left of a crossing is one integer ceil-division —
so Spark and the SQL twin agree bit-for-bit with no epsilon anywhere.

Plan shape: polygons explode JVM-side to their covering tiles (bbox
cover via sequence() — each (poly, tile) pair exactly once), ONE
shuffle groups a tile's polygons, and a python stage scanline-fills
the tile: per edge, per scan row, the crossing contributes +1 to the
pixels left of it (an O(1) diff-array write, prefix-summed once per
tile); parity = even-odd mask. Cost per tile is O(edges·rows + ts²),
independent of polygon count per pixel. At 100 TB the shuffle
carries vertex lists, never pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..png import encode_grayscale8


def _fill_mask(pts: np.ndarray, ts: int, oy: int, ox: int) -> np.ndarray:
    """Even-odd mask of one polygon over a ts×ts tile at global
    origin (oy, ox). pts: (n, 2) integer (x, y) vertex array."""
    diff = np.zeros((ts, ts + 1), dtype=np.int64)
    n = len(pts)
    for e in range(n):
        x1, y1 = int(pts[e][0]), int(pts[e][1])
        x2, y2 = int(pts[(e + 1) % n][0]), int(pts[(e + 1) % n][1])
        if y1 == y2:
            continue
        if y2 < y1:
            x1, y1, x2, y2 = x2, y2, x1, y1
        # scan rows whose center y = r + 0.5 lies in [y1, y2):
        # r + 0.5 >= y1  and  r + 0.5 < y2  (integers: r >= y1, r < y2)
        r_lo, r_hi = max(y1, oy), min(y2, oy + ts)
        if r_lo >= r_hi:
            continue
        rows = np.arange(r_lo, r_hi, dtype=np.int64)
        # crossing x = x1 + (cy − y1)(x2−x1)/(y2−y1), cy = r + 0.5;
        # doubled: num = 2·x1·dy + (2r+1 − 2·y1)·dx over den = 2·dy>0
        dy, dx = y2 - y1, x2 - x1
        num = 2 * x1 * dy + (2 * rows + 1 - 2 * y1) * dx
        den = 2 * dy
        # pixels with center x < crossing: c + 0.5 < num/den
        # ⇔ c < (2·num − den) / (2·den) → count = ceil of that, clamped
        q = 2 * num - den
        k = -((-q) // (2 * den))              # ceil division (any sign)
        k = np.clip(k - ox, 0, ts)
        lr = rows - oy
        np.add.at(diff, (lr, np.zeros_like(lr)), 1)
        np.add.at(diff, (lr, k), -1)
        # the +1 at column 0 and −1 at column k mark [0, k); rows with
        # k == 0 cancel immediately
    par = np.cumsum(diff[:, :-1], axis=1)
    return (par % 2).astype(bool)


def burn_polygons(polys: DataFrame, width: int, height: int,
                  tile_size: int, nodata: int = 0) -> DataFrame:
    """(poly_id, pts array<struct<x:long, y:long>>, value) → (tx, ty,
    png) raster tiles of the w×h canvas; only touched tiles emit.
    Even-odd pixel-center coverage, highest poly_id paints."""
    ts = int(tile_size)
    if width % ts or height % ts:
        raise ValueError("canvas dims must be multiples of the tile size")
    ntx, nty = width // ts, height // ts

    pts = F.col("pts")
    xs = F.transform(pts, lambda p: p["x"])
    ys = F.transform(pts, lambda p: p["y"])
    ranged = polys.select(
        "poly_id", "pts", "value",
        F.greatest(F.lit(0), F.floor(F.array_min(xs) / ts))
        .cast("long").alias("txmin"),
        F.least(F.lit(ntx - 1), F.floor((F.array_max(xs) - 1) / ts))
        .cast("long").alias("txmax"),
        F.greatest(F.lit(0), F.floor(F.array_min(ys) / ts))
        .cast("long").alias("tymin"),
        F.least(F.lit(nty - 1), F.floor((F.array_max(ys) - 1) / ts))
        .cast("long").alias("tymax"))
    # degenerate or fully off-canvas polygons invert their clamped
    # range — and sequence(hi, lo) would silently DESCEND — so guard
    covered = (ranged
               .filter((F.col("txmax") >= F.col("txmin"))
                       & (F.col("tymax") >= F.col("tymin")))
               .withColumn("tx", F.explode(
                   F.sequence(F.col("txmin"), F.col("txmax"))))
               .withColumn("ty", F.explode(
                   F.sequence(F.col("tymin"), F.col("tymax")))))

    def paint(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        canvas = np.full((ts, ts), nodata, dtype=np.uint8)
        order = pdf.sort_values("poly_id")
        for row in order.itertuples(index=False):
            arr = np.array([(int(p["x"]), int(p["y"])) for p in row.pts],
                           dtype=np.int64)
            mask = _fill_mask(arr, ts, ty * ts, tx * ts)
            canvas[mask] = np.uint8(int(row.value))
        if (canvas == nodata).all():
            return pd.DataFrame({"tx": pd.Series([], dtype="int64"),
                                 "ty": pd.Series([], dtype="int64"),
                                 "png": pd.Series([], dtype=object)})
        return pd.DataFrame({"tx": [tx], "ty": [ty],
                             "png": [encode_grayscale8(canvas, nodata)]})

    return (covered.select("tx", "ty", "poly_id", "pts", "value")
            .groupBy("tx", "ty")
            .applyInPandas(paint, "tx long, ty long, png binary"))
