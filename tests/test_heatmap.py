"""Heatmap (vector→raster) tiles: decoded count canvases must equal a
brute-force numpy binning of the same points — placement, weights,
world-edge clamping, and the sum-decimation pyramid identity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rastertiler_rs_spark.operators.heatmap import (heatmap_pyramid,
                                                    points_to_heatmap)
from rastertiler_rs_spark.operators.overview import decode_canvas
from rastertiler_rs_spark.tilemath import CE, ORIGIN


def _points(n, zoom, ts, seed=0, frac_outside=0.02):
    """Deterministic points at pixel centers (+ a tail just outside
    the world bounds to hit the clamp), with integer weights."""
    rng = np.random.default_rng(seed)
    n_px = (1 << zoom) * ts
    gx = rng.integers(0, n_px, n).astype(np.int64)
    gy = rng.integers(0, n_px, n).astype(np.int64)
    # force collisions so summed weights are exercised
    half = n // 2
    gx[half:half + n // 4] = gx[:n // 4]
    gy[half:half + n // 4] = gy[:n // 4]
    out = max(1, int(n * frac_outside))
    gx[:out] = rng.integers(-3, 3, out) * (n_px + 5) // 2  # far out both sides
    w = 1 + (np.arange(n) % 7)
    px = -ORIGIN + (gx + 0.5) * (CE / n_px)
    py = ORIGIN - (gy + 0.5) * (CE / n_px)
    gxc = np.clip(gx, 0, n_px - 1)
    gyc = np.clip(gy, 0, n_px - 1)
    return px, py, w, gxc, gyc


def _expected_canvases(gx, gy, w, zoom, ts):
    """Brute-force: dict (z,x,y) -> uint32 canvas."""
    want = {}
    for i in range(gx.size):
        x, y = int(gx[i]) // ts, int(gy[i]) // ts
        c = want.setdefault((zoom, x, y), np.zeros((ts, ts), np.uint32))
        c[int(gy[i]) % ts, int(gx[i]) % ts] += int(w[i])
    return want


def _decoded(rows):
    return {(r["zoom"], r["x"], r["y"]):
            decode_canvas(bytes(r["bytes"]), "u32") for r in rows}


@pytest.mark.parametrize("weighted", [False, True])
def test_heatmap_matches_numpy_binning(spark, weighted):
    zoom, ts = 4, 64
    px, py, w, gx, gy = _points(3000, zoom, ts, seed=1)
    import pandas as pd
    pdf = pd.DataFrame({"px": px, "py": py, "w": w})
    pts = spark.createDataFrame(pdf).repartition(8)
    tiles = points_to_heatmap(pts, zoom, tile_size=ts,
                              weight="w" if weighted else None)
    got = _decoded(tiles.collect())
    want = _expected_canvases(gx, gy, w if weighted else np.ones_like(w),
                              zoom, ts)
    assert set(got) == set(want)
    for key, canvas in want.items():
        np.testing.assert_array_equal(got[key], canvas)
    # tile_row is the TMS flip
    for r in tiles.collect():
        assert r["tile_row"] == (1 << zoom) - 1 - r["y"]


def test_heatmap_clamps_world_edges(spark):
    """Points beyond the mercator world land on the edge pixel, never
    on a phantom tile."""
    zoom, ts = 2, 32
    n_px = (1 << zoom) * ts
    import pandas as pd
    pdf = pd.DataFrame({
        "px": [-2.0 * ORIGIN, 2.0 * ORIGIN, 0.0],
        "py": [2.0 * ORIGIN, -2.0 * ORIGIN, 0.0],
    })
    tiles = points_to_heatmap(spark.createDataFrame(pdf), zoom, tile_size=ts)
    got = _decoded(tiles.collect())
    assert (zoom, 0, 0) in got and got[(zoom, 0, 0)][0, 0] == 1
    last = (n_px - 1) // ts
    assert got[(zoom, last, last)][ts - 1, ts - 1] == 1
    mid = (n_px // 2) // ts
    assert got[(zoom, mid, mid)][(n_px // 2) % ts, (n_px // 2) % ts] == 1


def test_heatmap_pyramid_sum_identity(spark):
    """Every level of the pyramid equals an independent single-zoom
    heatmap at that zoom (sum-decimation == rebinning), and parent
    pixel == sum of its 4 children."""
    zmin, zmax, ts = 1, 4, 32
    px, py, w, gx, gy = _points(1500, zmax, ts, seed=7)
    import pandas as pd
    pdf = pd.DataFrame({"px": px, "py": py, "w": w})
    pts = spark.createDataFrame(pdf).repartition(4)
    pyr = _decoded(heatmap_pyramid(pts, zmin, zmax, tile_size=ts,
                                   weight="w").collect())
    for z in range(zmin, zmax + 1):
        single = _decoded(points_to_heatmap(pts, z, tile_size=ts,
                                            weight="w").collect())
        lvl = {k: v for k, v in pyr.items() if k[0] == z}
        assert set(lvl) == set(single), f"zoom {z} tile set"
        for key, canvas in single.items():
            np.testing.assert_array_equal(lvl[key], canvas, err_msg=str(key))


def test_heatmap_validation():
    import pandas as pd

    with pytest.raises(ValueError, match="zoom"):
        points_to_heatmap(None, -1)
    with pytest.raises(ValueError, match="zoom"):
        points_to_heatmap(None, 31)
    with pytest.raises(ValueError, match="tile_size"):
        points_to_heatmap(None, 3, tile_size=0)
    with pytest.raises(ValueError, match="zoom range"):
        heatmap_pyramid(None, 5, 4)
