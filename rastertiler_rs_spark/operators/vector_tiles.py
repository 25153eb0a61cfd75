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


def _cap_per_tile(assigned: DataFrame, max_features_per_tile,
                  order_cols: tuple[str, ...] = ("fid",)) -> DataFrame:
    """Hot-tile guard: deterministically truncate a tile's feature list
    to the `max_features_per_tile` LOWEST feature ids (a documented
    drop, like the raster sink's --max-tiles guard — a pathological
    hot tile at low zoom would otherwise grow one task's aggregation
    buffer without bound). The row_number window partitions by the
    same (tile_x, tile_y) keys the downstream groupBy shuffles on, so
    Spark reuses one exchange — the cap costs a sort, not a second
    shuffle. `order_cols` must be a per-tile UNIQUE key (the line sink
    passes (fid, seg_idx) — rows there are segments, and a tie on fid
    alone would truncate nondeterministically)."""
    if max_features_per_tile is None:
        return assigned
    from pyspark.sql import Window

    w = Window.partitionBy("tile_x", "tile_y").orderBy(*order_cols)
    return (assigned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(max_features_per_tile))
            .drop("_rn"))


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
                  x_col: str = "px", y_col: str = "py",
                  max_features_per_tile: int | None = None) -> DataFrame:
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

    assigned = _cap_per_tile(points.select(
        F.col(id_col).cast("long").alias("fid"),
        tx.alias("tile_x"), ty.alias("tile_y"),
        lx.alias("local_x"), ly.alias("local_y")), max_features_per_tile)
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


def clip_ring_to_box(ring: list[tuple[float, float]],
                     bx0: float, by0: float,
                     bx1: float, by1: float) -> list[tuple[float, float]]:
    """Sutherland–Hodgman polygon clip against an axis-aligned box:
    the subject ring (arbitrary simple polygon, open — no repeated
    closing vertex) is clipped against the four half-planes in turn
    (x>=bx0, x<=bx1, y>=by0, y<=by1). Intersection points use the
    param-free two-op form  q = q1 + (bound - p1) / (p2 - p1) * (q2 -
    q1)  — the exact IEEE sequence the vector_tiles_clip oracle twin
    states in SQL (composite intersections created by later stages
    land on the same exact-math points; the 1e-6 snap in the local
    quantizer absorbs their last-ulp drift). Returns [] when the
    polygon misses the box."""

    def pass_(poly, inside, cross):
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(cross(cur, nxt))
            elif nin:
                out.append(cross(cur, nxt))
        return out

    def x_cross(bound):
        return lambda a, b: (
            bound, a[1] + (bound - a[0]) / (b[0] - a[0]) * (b[1] - a[1]))

    def y_cross(bound):
        return lambda a, b: (
            a[0] + (bound - a[1]) / (b[1] - a[1]) * (b[0] - a[0]), bound)

    poly = list(ring)
    for inside, cross in (
            (lambda p: p[0] >= bx0, x_cross(bx0)),
            (lambda p: p[0] <= bx1, x_cross(bx1)),
            (lambda p: p[1] >= by0, y_cross(by0)),
            (lambda p: p[1] <= by1, y_cross(by1))):
        poly = pass_(poly, inside, cross)
        if not poly:
            return []
    return poly


def polys_to_mvt(polys: DataFrame, zoom: int, extent: int = 4096,
                 layer: str = "polys", id_col: str = "poly_id",
                 ring_col: str = "ring",
                 max_features_per_tile: int | None = None) -> DataFrame:
    """ARBITRARY polygons (id, ring array<struct<x,y>> in mercator,
    open simple ring) -> per-tile MVT POLYGON blobs with true
    Sutherland–Hodgman clipping against each covering tile.

    Plan shape: the ring's bbox and the z-tile cover are JVM column
    exprs (array_min/max over the ring + the raster manifest's
    tile_range_cols), so candidate (tile, polygon) pairs explode
    without Python; ONE shuffle groups candidates by owning tile; the
    per-tile Python stage clips each candidate ring to the tile box,
    quantizes with the shared snap-then-floor rule, drops degenerate
    clips (< 3 distinct quantized vertices), orients the exterior ring
    to positive MVT (y-down) shoelace area, and protobuf-encodes.
    Features whose bbox covers a tile they don't actually reach clip
    to [] and emit nothing; a tile with no surviving features emits no
    row."""
    from .render import tile_range_cols

    n = 1 << zoom
    span = tm.CE / n
    ring = F.col(ring_col)
    withbox = polys.select(
        F.col(id_col).cast("long").alias("fid"), ring.alias("ring"),
        F.array_min(F.transform(ring, lambda p: p.x)).alias("minx"),
        F.array_min(F.transform(ring, lambda p: p.y)).alias("miny"),
        F.array_max(F.transform(ring, lambda p: p.x)).alias("maxx"),
        F.array_max(F.transform(ring, lambda p: p.y)).alias("maxy"),
    ).withColumn("zoom", F.lit(zoom))
    cover = (tile_range_cols(withbox)
             .withColumn("tx", F.explode(F.sequence("txmin", "txmax")))
             .withColumn("ty", F.explode(F.sequence("tymin", "tymax"))))
    assigned = _cap_per_tile(
        cover.select("fid", F.col("tx").alias("tile_x"),
                     F.col("ty").alias("tile_y"), "ring"),
        max_features_per_tile)
    grouped = (assigned.groupBy("tile_x", "tile_y")
               .agg(F.sort_array(F.collect_list(
                   F.struct("fid", "ring"))).alias("feats")))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from ..mvt.codec import GEOM_POLYGON

        def quant(v: float) -> int:
            snapped = math.floor(v * 1e6 + 0.5) / 1e6
            return max(0, min(extent - 1, int(math.floor(snapped))))

        for pdf in batches:
            out = {"zoom": [], "x": [], "tile_row": [],
                   "n_features": [], "mvt": []}
            for row in pdf.itertuples(index=False):
                tx, ty = int(row.tile_x), int(row.tile_y)
                tminx = -tm.ORIGIN + tx * span
                tmaxy = tm.ORIGIN - ty * span
                features = []
                for f in row.feats:
                    src = [(p["x"], p["y"]) for p in f["ring"]]
                    clipped = clip_ring_to_box(
                        src, tminx, tmaxy - span, tminx + span, tmaxy)
                    if not clipped:
                        continue
                    q = [(quant((vx - tminx) / span * extent),
                          quant((tmaxy - vy) / span * extent))
                         for vx, vy in clipped]
                    if len(set(q)) < 3:
                        continue  # degenerate after quantization
                    ring_q = [p for i, p in enumerate(q)
                              if p != q[(i - 1) % len(q)]]
                    # MVT v2 exterior ring: positive shoelace in the
                    # y-down tile frame
                    area2 = sum(
                        ring_q[i][0] * ring_q[(i + 1) % len(ring_q)][1]
                        - ring_q[(i + 1) % len(ring_q)][0] * ring_q[i][1]
                        for i in range(len(ring_q)))
                    if area2 < 0:
                        ring_q.reverse()
                    features.append((int(f["fid"]), GEOM_POLYGON,
                                     [ring_q], {}))
                if not features:
                    continue
                blob = encode_mvt([(layer, extent, features)])
                out["zoom"].append(zoom)
                out["x"].append(tx)
                out["tile_row"].append(n - 1 - ty)
                out["n_features"].append(len(features))
                out["mvt"].append(blob)
            yield pd.DataFrame(out)

    return grouped.mapInPandas(
        fn, "zoom int, x long, tile_row long, n_features long, mvt binary")


def lines_to_mvt(lines: DataFrame, zoom: int, extent: int = 4096,
                 layer: str = "lines", id_col: str = "line_id",
                 pts_col: str = "pts",
                 max_features_per_tile: int | None = None) -> DataFrame:
    """POLYLINES (id, pts array<struct<x,y>> in mercator) -> per-tile
    MVT LINESTRING blobs with Liang–Barsky segment clipping.

    Unlike the polygon sink, the clip itself is PURE JVM column math:
    per segment, the parametric entry/exit times against the tile box
    are closed-form —

        t0 = max(0, min((b - p1)/d over each axis' entering bound))
        t1 = min(1, ...)   (segment clipped iff t0 <= t1)

    — so candidate explode (segment bbox x tile cover via
    tile_range_cols), clip, and quantization all run in whole-stage
    codegen; Python only protobuf-encodes per-tile feature lists (one
    MULTILINESTRING feature per source line, its clipped segments as
    2-point parts in seg order). Zero-length quantized segments drop
    on both engines. One shuffle on the owning tile; the oracle twin
    states the identical parametric arithmetic in SQL.

    NOTE: here ``max_features_per_tile`` bounds SEGMENT rows per tile
    (the aggregation-buffer unit), truncating deterministically by
    (fid, seg_idx)."""
    from .render import tile_range_cols

    n = 1 << zoom
    span = tm.CE / n
    seg_expr = (f"zip_with(slice({pts_col}, 1, size({pts_col}) - 1), "
                f"slice({pts_col}, 2, size({pts_col}) - 1), "
                f"(a, b) -> struct(a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2))")
    segs = (lines.select(F.col(id_col).cast("long").alias("fid"),
                         F.posexplode(F.expr(seg_expr)).alias("seg_idx", "s"))
            .select("fid", "seg_idx", "s.x1", "s.y1", "s.x2", "s.y2"))
    withbox = (segs
               .withColumn("minx", F.least("x1", "x2"))
               .withColumn("miny", F.least("y1", "y2"))
               .withColumn("maxx", F.greatest("x1", "x2"))
               .withColumn("maxy", F.greatest("y1", "y2"))
               .withColumn("zoom", F.lit(zoom)))
    cover = (tile_range_cols(withbox)
             .withColumn("tx", F.explode(F.sequence("txmin", "txmax")))
             .withColumn("ty", F.explode(F.sequence("tymin", "tymax"))))
    tminx = F.lit(-tm.ORIGIN) + F.col("tx").cast("double") * F.lit(span)
    tmaxy = F.lit(tm.ORIGIN) - F.col("ty").cast("double") * F.lit(span)
    x1, y1, x2, y2 = (F.col(c) for c in ("x1", "y1", "x2", "y2"))
    dx, dy = x2 - x1, y2 - y1
    inf, ninf = F.lit(float("inf")), F.lit(float("-inf"))

    def axis_ts(p1, d, lo, hi):
        ta, tb = (lo - p1) / d, (hi - p1) / d
        enter = F.when(d != 0, F.least(ta, tb)).otherwise(
            F.when((p1 >= lo) & (p1 <= hi), ninf).otherwise(inf))
        exit_ = F.when(d != 0, F.greatest(ta, tb)).otherwise(
            F.when((p1 >= lo) & (p1 <= hi), inf).otherwise(ninf))
        return enter, exit_

    ex, lx_ = axis_ts(x1, dx, tminx, tminx + F.lit(span))
    ey, ly_ = axis_ts(y1, dy, tmaxy - F.lit(span), tmaxy)
    t0 = F.greatest(F.lit(0.0), ex, ey)
    t1 = F.least(F.lit(1.0), lx_, ly_)
    clipped = (cover
               .withColumn("_t0", t0).withColumn("_t1", t1)
               .filter(F.col("_t0") <= F.col("_t1"))
               .withColumn("cx1", x1 + F.col("_t0") * dx)
               .withColumn("cy1", y1 + F.col("_t0") * dy)
               .withColumn("cx2", x1 + F.col("_t1") * dx)
               .withColumn("cy2", y1 + F.col("_t1") * dy))

    def quant(delta):
        return _quant_local(delta, span, extent)

    q = clipped.select(
        "fid", "seg_idx",
        F.col("tx").alias("tile_x"), F.col("ty").alias("tile_y"),
        quant(F.col("cx1") - tminx).alias("lx1"),
        quant(tmaxy - F.col("cy1")).alias("ly1"),
        quant(F.col("cx2") - tminx).alias("lx2"),
        quant(tmaxy - F.col("cy2")).alias("ly2"),
    ).filter(~((F.col("lx1") == F.col("lx2"))
               & (F.col("ly1") == F.col("ly2"))))
    assigned = _cap_per_tile(q, max_features_per_tile,
                             order_cols=("fid", "seg_idx"))
    grouped = (assigned.groupBy("tile_x", "tile_y")
               .agg(F.sort_array(F.collect_list(F.struct(
                   "fid", "seg_idx", "lx1", "ly1", "lx2", "ly2"))).alias("feats")))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..mvt.codec import GEOM_LINESTRING

        for pdf in batches:
            out = {"zoom": [], "x": [], "tile_row": [],
                   "n_features": [], "mvt": []}
            for row in pdf.itertuples(index=False):
                per_line: dict[int, list] = {}
                for s in row.feats:  # sort_array: (fid, seg_idx) order
                    per_line.setdefault(int(s["fid"]), []).append(
                        [(int(s["lx1"]), int(s["ly1"])),
                         (int(s["lx2"]), int(s["ly2"]))])
                features = [(fid, GEOM_LINESTRING, parts, {})
                            for fid, parts in per_line.items()]
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
                 layer: str = "boxes", id_col: str = "box_id",
                 max_features_per_tile: int | None = None) -> DataFrame:
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

    assigned = _cap_per_tile(cover.select(
        F.col(id_col).cast("long").alias("fid"),
        F.col("tx").alias("tile_x"), F.col("ty").alias("tile_y"),
        quant(cxmin - tminx).alias("lx0"), quant(cxmax - tminx).alias("lx1"),
        quant(tmaxy - cymax).alias("ly0"), quant(tmaxy - cymin).alias("ly1")),
        max_features_per_tile)
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
