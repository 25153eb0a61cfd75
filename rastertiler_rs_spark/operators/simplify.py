"""Polyline SIMPLIFICATION — Douglas–Peucker over integer vertices,
the vector-tile generalization step (tippecanoe's core op: a z5 tile
cannot carry a coastline's z14 vertex budget; each zoom's MVT should
ship vertices at that zoom's resolution).

The rule is EXACT-INTEGER decidable, so a DuckDB recursive-CTE twin
can restate it verbatim and any divergence flips the value hash:

- a segment (a, b) of the working chain SPLITS at the interior vertex
  with the maximal squared deviation, ties to the SMALLEST index;
- deviation of P from chord A→B is the perpendicular form
  cross(B−A, P−A)², compared against tolerance as
  cross² > eps²·|AB|²  (both sides integer — no sqrt, no division);
- when A == B (closed or degenerate chords) the deviation degrades to
  the squared distance |P−A|², compared against eps² directly;
- a segment with no interior vertex above tolerance keeps only its
  endpoints.

Kept vertices are the union of leaf-segment endpoints; the first and
last vertex always survive. O(n²) worst case per line (the classic
bound), but lines are feature-bounded; the operator is MAP-ONLY
(mapInPandas — per-line local work, no shuffle), so at 100 TB it
rides whatever partitioning the line table already has.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, eps: int) -> np.ndarray:
    """Boolean keep-mask of Douglas–Peucker at integer tolerance
    ``eps`` over integer vertex arrays. Exact int64 arithmetic; ties
    on the maximal deviation split at the smallest index."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    xs = xs.astype(object)  # unbounded ints: cross² of 32-bit coords
    ys = ys.astype(object)  # overflows int64; object ints are exact
    eps2 = int(eps) * int(eps)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
        dx, dy = bx - ax, by - ay
        ab2 = dx * dx + dy * dy
        ix = np.arange(a + 1, b)
        px, py = xs[a + 1:b] - ax, ys[a + 1:b] - ay
        if ab2 == 0:
            d = px * px + py * py
            thr = eps2
        else:
            cr = dx * py - dy * px
            d = cr * cr
            thr = eps2 * ab2
        m_rel = int(np.argmax(d))          # first occurrence == min index
        if d[m_rel] > thr:
            m = int(ix[m_rel])
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_polylines(lines: DataFrame, tolerance: int,
                       pts_col: str = "pts") -> DataFrame:
    """(line_id, pts array<struct<x: long, y: long>>, [tol long]) →
    the same schema with each line Douglas–Peucker-simplified at
    integer ``tolerance`` (or, when a ``tol`` column exists, its
    per-line value). Map-only; preserves vertex order; endpoints
    always survive; a ≤2-vertex line passes through unchanged."""
    has_tol = "tol" in lines.columns
    cols = ["line_id", pts_col] + (["tol"] if has_tol else [])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"line_id": [], pts_col: []}
            for row in pdf.itertuples(index=False):
                pts = getattr(row, pts_col)
                xs = np.array([int(p["x"]) for p in pts], dtype=np.int64)
                ys = np.array([int(p["y"]) for p in pts], dtype=np.int64)
                eps = int(row.tol) if has_tol else int(tolerance)
                keep = dp_keep_mask(xs, ys, eps)
                out["line_id"].append(row.line_id)
                out[pts_col].append(
                    [{"x": int(x), "y": int(y)}
                     for x, y, k in zip(xs, ys, keep) if k])
            yield pd.DataFrame(out)

    return lines.select(*cols).mapInPandas(
        fn, f"line_id long, {pts_col} array<struct<x: long, y: long>>")
