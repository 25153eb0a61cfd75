"""Zonal statistics — per-zone aggregation of raster pixel VALUES.

The classic raster↔vector analytics op (north-star extension; the
reference's window-intersection semantics, dataset.rs:163-166,
generalized from tiles to arbitrary zone boxes): for every zone,
aggregate the non-nodata pixels of every intersecting image whose
pixel CENTER falls inside the zone.

Plan shape (100 TB): zones × image footprints through the J3
cell-indexed equi-join (with_cover_cells — no all-pairs, skew handled
by the grid), image bytes ship through that ONE shuffle to their
zone-cell tasks (same idiom as the render's cell stage: compressed
source bytes, not raw pixels), each (zone, image) pair decodes its
PNG once task-local and reduces to a single partial row, and the only
post-join shuffle is a tiny groupBy(zone_id) over O(pairs) partials
with map-side combine.

Determinism contract: pixel membership is "center in [zmin, zmax)"
evaluated with the exact same IEEE double sequence on both engines —
psx = (maxx - minx) / w, center = minx + (c + 0.5) * psx — so the
DuckDB oracle (which rederives pixels from the generation formula)
hash-matches the engine's REAL decoded-pixel aggregation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..png import decode_band
from .render import with_footprints
from .spatial_join import with_cover_cells


def zonal_stats(zones: DataFrame, images: DataFrame, cell_size: float,
                nodata: int = 0) -> DataFrame:
    """(zone_id, n_images, n_px, vsum, vmin, vmax) — integer stats of
    the non-nodata pixels whose centers fall in each zone.

    ``zones``: (zone_id, minx, miny, maxx, maxy); ``images``: the
    engine's image table (footprints derived via with_footprints, or
    pre-georeferenced minx..maxy columns). ``n_images`` counts images
    contributing at least one valid pixel to the zone; zones with no
    valid pixels produce no row (mirrored by the oracle twin).
    """
    fp = with_footprints(images).select(
        "image_id", "bytes", "fmt",
        F.col("minx").alias("r_minx"), F.col("miny").alias("r_miny"),
        F.col("maxx").alias("r_maxx"), F.col("maxy").alias("r_maxy"))
    lz = with_cover_cells(zones, cell_size)
    ri = with_cover_cells(fp, cell_size, prefix="r_")
    residual = (
        (F.col("minx") < F.col("r_maxx")) & (F.col("maxx") > F.col("r_minx"))
        & (F.col("miny") < F.col("r_maxy")) & (F.col("maxy") > F.col("r_miny")))
    pairs = (lz.join(ri, ["cell_x", "cell_y"]).filter(residual)
             .dropDuplicates(["zone_id", "image_id"]))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"zone_id": [], "n_px": [], "vsum": [],
                   "vmin": [], "vmax": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.bytes), row.fmt)
                h, w = band.shape
                psx = (row.r_maxx - row.r_minx) / w
                psy = (row.r_maxy - row.r_miny) / h
                xc = row.r_minx + (np.arange(w) + 0.5) * psx
                yc = row.r_maxy - (np.arange(h) + 0.5) * psy
                cm = (xc >= row.minx) & (xc < row.maxx)
                rm = (yc >= row.miny) & (yc < row.maxy)
                sub = band[np.ix_(rm, cm)]
                vals = sub[sub != nodata]
                if vals.size == 0:
                    continue
                v64 = vals.astype(np.int64)
                out["zone_id"].append(row.zone_id)
                out["n_px"].append(int(v64.size))
                out["vsum"].append(int(v64.sum()))
                out["vmin"].append(int(v64.min()))
                out["vmax"].append(int(v64.max()))
            yield pd.DataFrame(out)

    partials = pairs.mapInPandas(
        fn, "zone_id long, n_px long, vsum long, vmin long, vmax long")
    return (partials.groupBy("zone_id")
            .agg(F.count("*").alias("n_images"),
                 F.sum("n_px").alias("n_px"),
                 F.sum("vsum").alias("vsum"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax")))


def zonal_stats_poly(polygons: list[tuple], images: DataFrame,
                     cell_size: float, nodata: int = 0) -> DataFrame:
    """Zonal statistics over ARBITRARY polygon zones: pixel membership
    is the even-odd ray cast of the pixel CENTER against the ring —
    the same vectorized `pip.ray_cast` the J5 join uses, so polygon
    semantics can't drift between the point and raster paths.

    ``polygons`` is the pip list form [(zone_id, [(x, y), ...]), ...]
    (broadcast-sized prepared geometry, like pip_join); candidate
    (zone, image) pairs come from the polygon's bbox through the same
    cell equi-join as the box variant, and the ray cast runs only on
    candidates' pixels. Same output schema and determinism contract as
    `zonal_stats` (all the crossing arithmetic is plain IEEE doubles a
    SQL twin evaluates in the same order)."""
    from .pip import _prepare, ray_cast

    prepared = _prepare(polygons)
    spark = images.sparkSession
    boxes = spark.createDataFrame(
        [(int(pid), float(xs.min()), float(ys.min()),
          float(xs.max()), float(ys.max())) for pid, xs, ys in prepared],
        "zone_id long, minx double, miny double, maxx double, maxy double")
    rings = {int(pid): (xs, ys) for pid, xs, ys in prepared}

    fp = with_footprints(images).select(
        "image_id", "bytes", "fmt",
        F.col("minx").alias("r_minx"), F.col("miny").alias("r_miny"),
        F.col("maxx").alias("r_maxx"), F.col("maxy").alias("r_maxy"))
    lz = with_cover_cells(boxes, cell_size)
    ri = with_cover_cells(fp, cell_size, prefix="r_")
    residual = (
        (F.col("minx") < F.col("r_maxx")) & (F.col("maxx") > F.col("r_minx"))
        & (F.col("miny") < F.col("r_maxy")) & (F.col("maxy") > F.col("r_miny")))
    pairs = (lz.join(ri, ["cell_x", "cell_y"]).filter(residual)
             .dropDuplicates(["zone_id", "image_id"]))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"zone_id": [], "n_px": [], "vsum": [],
                   "vmin": [], "vmax": []}
            for row in pdf.itertuples(index=False):
                band = decode_band(bytes(row.bytes), row.fmt)
                h, w = band.shape
                psx = (row.r_maxx - row.r_minx) / w
                psy = (row.r_maxy - row.r_miny) / h
                xc = row.r_minx + (np.arange(w) + 0.5) * psx
                yc = row.r_maxy - (np.arange(h) + 0.5) * psy
                gx = np.broadcast_to(xc, (h, w)).ravel()
                gy = np.broadcast_to(yc[:, None], (h, w)).ravel()
                xs, ys = rings[int(row.zone_id)]
                inside = ray_cast(gx, gy, xs, ys).reshape(h, w)
                vals = band[inside & (band != nodata)]
                if vals.size == 0:
                    continue
                v64 = vals.astype(np.int64)
                out["zone_id"].append(row.zone_id)
                out["n_px"].append(int(v64.size))
                out["vsum"].append(int(v64.sum()))
                out["vmin"].append(int(v64.min()))
                out["vmax"].append(int(v64.max()))
            yield pd.DataFrame(out)

    partials = pairs.select("zone_id", "bytes", "fmt", "r_minx", "r_miny",
                            "r_maxx", "r_maxy").mapInPandas(
        fn, "zone_id long, n_px long, vsum long, vmin long, vmax long")
    return (partials.groupBy("zone_id")
            .agg(F.count("*").alias("n_images"),
                 F.sum("n_px").alias("n_px"),
                 F.sum("vsum").alias("vsum"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax")))
