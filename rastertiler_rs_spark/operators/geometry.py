"""Vector GEOMETRY aggregates — the ST_Area / ST_Centroid /
ST_ConvexHull class of per-feature analytics, in EXACT integer
arithmetic over integer vertices so a SQL twin can restate every
clause:

- `polygon_metrics`: the shoelace forms — signed DOUBLED area
  2A = Σ (x_i·y_{i+1} − x_{i+1}·y_i) (cyclic) and the centroid
  NUMERATORS 6A·Cx = Σ (x_i + x_{i+1})·cr_i, 6A·Cy = Σ (y_i +
  y_{i+1})·cr_i — integers all the way (the division by 6A that
  would produce the float centroid is left to the caller, exactly
  like the engine's mean_x100 convention). Pure JVM column folds
  (F.aggregate over the vertex array) — whole-stage codegen, no
  python, no shuffle.

- `convex_hull_stats`: strict convex hull (collinear boundary points
  EXCLUDED) of each group's point set via Andrew's monotone chain
  with integer cross products. Map-side per group after ONE groupBy
  shuffle (applyInPandas); hull size is output-bounded. For point
  sets in GENERAL POSITION (no 3 collinear) this equals the
  all-points-strictly-left edge characterization the SQL twin uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _el(pts, i, n) -> tuple[Column, Column]:
    """Cyclic vertex access: element_at is 1-based; i is 0-based."""
    p = F.element_at(pts, (i % n + F.lit(1)).cast("int"))
    return p["x"].cast("long"), p["y"].cast("long")


def polygon_metrics(polys: DataFrame, pts_col: str = "pts",
                    id_col: str = "poly_id") -> DataFrame:
    """(id, pts array<struct<x: long, y: long>>) → (id, n_vtx,
    area2, cx6a, cy6a): signed doubled shoelace area and centroid
    numerators, exact int64, positive for counter-clockwise rings.
    JVM-only: one F.aggregate fold per metric, no python stage."""
    pts = F.col(pts_col)
    n = F.size(pts)

    def fold(term) -> Column:
        return F.when(n < F.lit(3), F.lit(0).cast("long")).otherwise(
            F.aggregate(
                F.sequence(F.lit(0), n - 1),
                F.lit(0).cast("long"),
                lambda acc, i: acc + term(i),
            ))

    def cross(i) -> Column:
        x0, y0 = _el(pts, i, n)
        x1, y1 = _el(pts, i + 1, n)
        return x0 * y1 - x1 * y0

    def cx_term(i) -> Column:
        x0, _ = _el(pts, i, n)
        x1, _ = _el(pts, i + 1, n)
        return (x0 + x1) * cross(i)

    def cy_term(i) -> Column:
        _, y0 = _el(pts, i, n)
        _, y1 = _el(pts, i + 1, n)
        return (y0 + y1) * cross(i)

    return polys.select(
        F.col(id_col),
        n.cast("long").alias("n_vtx"),
        fold(cross).alias("area2"),
        fold(cx_term).alias("cx6a"),
        fold(cy_term).alias("cy6a"),
    )


def hull_mask(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Strict-hull membership mask via Andrew's monotone chain over
    int64 coords (object-int cross products — no overflow). Points
    collinear on a hull edge are NOT members (strict turns only);
    duplicate points must not occur (general-position contract)."""
    n = len(xs)
    if n <= 2:
        return np.ones(n, dtype=bool)
    order = np.lexsort((ys, xs))
    px = [int(v) for v in xs[order]]
    py = [int(v) for v in ys[order]]

    def chain(idx):
        out: list[int] = []
        for k in idx:
            while len(out) >= 2:
                i, j = out[-2], out[-1]
                cr = (px[j] - px[i]) * (py[k] - py[i]) \
                    - (py[j] - py[i]) * (px[k] - px[i])
                if cr <= 0:          # non-left turn: drop (strict hull)
                    out.pop()
                else:
                    break
            out.append(k)
        return out

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    keep = np.zeros(n, dtype=bool)
    for k in lower[:-1] + upper[:-1]:
        keep[order[k]] = True
    return keep


def convex_hull_stats(points: DataFrame, group_col: str = "gid",
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """(gid, x, y) → per-group strict-hull (gid, n_vtx, sum_hx,
    sum_hy): hull vertex count and coordinate sums. ONE shuffle on
    the group key, then per-group monotone chain (output-bounded)."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x_col].to_numpy(np.int64)
        ys = pdf[y_col].to_numpy(np.int64)
        keep = hull_mask(xs, ys)
        return pd.DataFrame({
            group_col: [key[0]],
            "n_vtx": [int(keep.sum())],
            "sum_hx": [int(xs[keep].sum())],
            "sum_hy": [int(ys[keep].sum())],
        })

    return (points.select(group_col, x_col, y_col)
            .groupBy(group_col)
            .applyInPandas(
                fn, f"{group_col} long, n_vtx long, "
                    "sum_hx long, sum_hy long"))
