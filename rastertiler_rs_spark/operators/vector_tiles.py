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


def _quant_local(delta, span: float, extent: int):
    """Tile-local MVT quantization with the repo's boundary-tie rule:
    round the scaled value to 1e-6 BEFORE the discretizing floor (the
    point_tiles mercator trick) — geometry edges that sit exactly on a
    quantization boundary in exact math otherwise flip on last-ulp
    double divergence between engines. Mirrored verbatim in the
    vector-tile oracle SQL."""
    v = delta / F.lit(span) * F.lit(float(extent))
    snapped = F.floor(v * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return F.greatest(F.lit(0), F.least(
        F.lit(extent - 1), F.floor(snapped).cast("long")))


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
    lx = _quant_local(px - tminx, span, extent)
    ly = _quant_local(tmaxy - py, span, extent)

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


def boxes_to_mvt(boxes: DataFrame, zoom: int, extent: int = 4096,
                 layer: str = "boxes", id_col: str = "box_id") -> DataFrame:
    """boxes (id, mercator minx..maxy) -> per-tile MVT POLYGON blobs.

    Each box explodes to its covering z tiles (the raster manifest's
    G3/G5 tile_range_cols), is CLIPPED to the tile, and its four
    corners quantize into tile-local coordinates; the emitted ring
    (lx0,ly0)->(lx1,ly0)->(lx1,ly1)->(lx0,ly1) has positive shoelace
    area in the MVT y-down frame, i.e. a spec-conformant v2 exterior
    ring, closed by ClosePath. All geometry math is JVM exprs; python
    only protobuf-encodes the per-tile feature lists."""
    from .render import tile_range_cols

    n = 1 << zoom
    span = tm.CE / n
    cover = (tile_range_cols(boxes.withColumn("zoom", F.lit(zoom)))
             .withColumn("tx", F.explode(F.sequence("txmin", "txmax")))
             .withColumn("ty", F.explode(F.sequence("tymin", "tymax"))))
    tminx = F.lit(-tm.ORIGIN) + F.col("tx").cast("double") * F.lit(span)
    tmaxy = F.lit(tm.ORIGIN) - F.col("ty").cast("double") * F.lit(span)
    cxmin = F.greatest(F.col("minx"), tminx)
    cxmax = F.least(F.col("maxx"), tminx + F.lit(span))
    cymin = F.greatest(F.col("miny"), tmaxy - F.lit(span))
    cymax = F.least(F.col("maxy"), tmaxy)

    def quant(delta):
        return _quant_local(delta, span, extent)

    assigned = cover.select(
        F.col(id_col).cast("long").alias("fid"),
        F.col("tx").alias("tile_x"), F.col("ty").alias("tile_y"),
        quant(cxmin - tminx).alias("lx0"), quant(cxmax - tminx).alias("lx1"),
        quant(tmaxy - cymax).alias("ly0"), quant(tmaxy - cymin).alias("ly1"))
    grouped = (assigned.groupBy("tile_x", "tile_y")
               .agg(F.sort_array(F.collect_list(F.struct(
                   "fid", "lx0", "ly0", "lx1", "ly1"))).alias("feats")))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..mvt.codec import GEOM_POLYGON

        for pdf in batches:
            out = {"zoom": [], "x": [], "tile_row": [],
                   "n_features": [], "mvt": []}
            for row in pdf.itertuples(index=False):
                features = []
                for f in row.feats:
                    x0, x1 = int(f["lx0"]), int(f["lx1"])
                    y0, y1 = int(f["ly0"]), int(f["ly1"])
                    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
                    features.append((int(f["fid"]), GEOM_POLYGON,
                                     [ring], {}))
                blob = encode_mvt([(layer, extent, features)])
                out["zoom"].append(zoom)
                out["x"].append(int(row.tile_x))
                out["tile_row"].append((1 << zoom) - 1 - int(row.tile_y))
                out["n_features"].append(len(features))
                out["mvt"].append(blob)
            yield pd.DataFrame(out)

    return grouped.mapInPandas(
        fn, "zoom int, x long, tile_row long, n_features long, mvt binary")
