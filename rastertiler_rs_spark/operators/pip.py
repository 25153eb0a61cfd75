"""Point-in-polygon via prepared-geometry ray casting (north-star J5).

Polygons are broadcast driver-side as numpy coordinate arrays (the
"prepared" form); the even-odd crossing test runs vectorized over Arrow
batches of points — one numpy pass per (polygon, batch), no per-row
Python. A cell-index candidate prefilter (spatial_join.with_cover_cells
on polygon bboxes) is worthwhile when the polygon set is large; with a
handful of polygons the broadcast loop is the right plan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def ray_cast(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd rule: points (px, py) vs polygon ring (xs, ys)
    (closed implicitly). Returns bool array."""
    inside = np.zeros(px.shape, dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        x1, y1, x2, y2 = xs[j], ys[j], xs[i], ys[i]
        j = i
        if y1 == y2:  # horizontal edge can never satisfy (y1>py) != (y2>py)
            continue
        crosses = ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )
        inside ^= crosses
    return inside


def pip_join(points: DataFrame, polygons: list[tuple], point_id: str = "pid") -> DataFrame:
    """points(pid, px, py) x polygons [(poly_id, [(x, y), ...]), ...] →
    (pid, poly_id) pairs where the point is inside."""
    spark = points.sparkSession
    prepared = [
        (pid_, np.array([p[0] for p in ring], dtype=np.float64),
         np.array([p[1] for p in ring], dtype=np.float64))
        for pid_, ring in polygons
    ]
    bc = spark.sparkContext.broadcast(prepared)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = bc.value
        for pdf in batches:
            px = pdf["px"].to_numpy(dtype=np.float64)
            py = pdf["py"].to_numpy(dtype=np.float64)
            ids = pdf[point_id]
            frames = []
            for poly_id, xs, ys in polys:
                mask = ray_cast(px, py, xs, ys)
                if mask.any():
                    frames.append(pd.DataFrame({point_id: ids[mask], "poly_id": poly_id}))
            yield pd.concat(frames) if frames else pd.DataFrame(
                {point_id: pd.Series([], dtype=ids.dtype), "poly_id": pd.Series([], dtype="int64")})

    schema = f"{point_id} long, poly_id long"
    return points.mapInPandas(fn, schema)
