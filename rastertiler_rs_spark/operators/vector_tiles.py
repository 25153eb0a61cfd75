"""Vector-tile sink: points → per-tile MVT blobs (the vector half of
the tiling engine; the raster half emits PNG tiles).

Tile assignment and quantization are pure JVM column exprs — the same
G-family tile math as the raster path (functions/columns) plus the
MVT-spec local-coordinate quantization

    local = clamp(floor((p - tile_min) / tile_span * extent), 0, extent-1)

evaluated in an IEEE op order the DuckDB oracle mirrors. Only the
final per-tile protobuf encode (mvt/codec.py, from the public MVT 2.1
spec) runs in Python — one Arrow batch stream over tile groups, the
blocks-path idiom.

100 TB shape: ONE shuffle on the owning tile key (groupBy collect),
feature lists are tile-bounded, and the encode is embarrassingly
parallel per tile. Output: (zoom, x, tile_row, n_features, mvt).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

import rastertiler_rs_spark.tilemath as tm

from ..mvt import encode_mvt


def points_to_mvt(points: DataFrame, zoom: int, extent: int = 4096,
                  layer: str = "points", id_col: str = "pid",
                  x_col: str = "px", y_col: str = "py") -> DataFrame:
    """points (id, mercator x, y) -> one MVT blob per owning z tile.

    Tile ownership is floor((p + O) / CE * 2^z) clamped to the grid;
    local coordinates quantize into [0, extent) with the MVT v2 y-down
    convention (tile-local y grows from the tile's TOP edge). The TMS
    flip of the OUTPUT row key matches the raster sink (S9)."""
    n = 1 << zoom
    span = tm.CE / n
    px, py = F.col(x_col), F.col(y_col)
    tx = F.greatest(F.lit(0), F.least(
        F.lit(n - 1), F.floor((px + F.lit(tm.ORIGIN)) / F.lit(tm.CE)
                              * F.lit(float(n))).cast("long")))
    ty = F.greatest(F.lit(0), F.least(
        F.lit(n - 1), F.floor((F.lit(tm.ORIGIN) - py) / F.lit(tm.CE)
                              * F.lit(float(n))).cast("long")))
    tminx = F.lit(-tm.ORIGIN) + tx.cast("double") * F.lit(span)
    tmaxy = F.lit(tm.ORIGIN) - ty.cast("double") * F.lit(span)
    lx = F.greatest(F.lit(0), F.least(
        F.lit(extent - 1),
        F.floor((px - tminx) / F.lit(span) * F.lit(float(extent)))
        .cast("long")))
    ly = F.greatest(F.lit(0), F.least(
        F.lit(extent - 1),
        F.floor((tmaxy - py) / F.lit(span) * F.lit(float(extent)))
        .cast("long")))

    assigned = points.select(
        F.col(id_col).cast("long").alias("fid"),
        tx.alias("tile_x"), ty.alias("tile_y"),
        lx.alias("local_x"), ly.alias("local_y"))
    grouped = (assigned.groupBy("tile_x", "tile_y")
               .agg(F.sort_array(F.collect_list(
                   F.struct("fid", "local_x", "local_y"))).alias("feats")))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"zoom": [], "x": [], "tile_row": [],
                   "n_features": [], "mvt": []}
            for row in pdf.itertuples(index=False):
                features = [
                    (int(f["fid"]), 1,
                     [[(int(f["local_x"]), int(f["local_y"]))]], {})
                    for f in row.feats]
                blob = encode_mvt([(layer, extent, features)])
                out["zoom"].append(zoom)
                out["x"].append(int(row.tile_x))
                out["tile_row"].append((1 << zoom) - 1 - int(row.tile_y))
                out["n_features"].append(len(features))
                out["mvt"].append(blob)
            yield pd.DataFrame(out)

    return grouped.mapInPandas(
        fn, "zoom int, x long, tile_row long, n_features long, mvt binary")
