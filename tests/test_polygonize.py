"""Distributed raster region labeling (operators/polygonize.py):
engine output over TILES must equal a brute-force flood-fill over the
UNPARTITIONED canvas — any fragment naming, border routing, or merge
bug shows up as a row mismatch."""

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import (NODATA, region_canvas_band,
                                           region_canvas_parquet)
from rastertiler_rs_spark.operators.polygonize import region_label
from rastertiler_rs_spark.png import encode_grayscale8


def brute_regions(band: np.ndarray, nodata: int = 0):
    """Reference: BFS flood fill, 4-connectivity. Returns the set of
    result tuples in the operator's output shape."""
    h, w = band.shape
    seen = np.zeros((h, w), dtype=bool)
    out = set()
    for r0 in range(h):
        for c0 in range(w):
            if seen[r0, c0] or band[r0, c0] == nodata:
                continue
            v = band[r0, c0]
            stack = [(r0, c0)]
            seen[r0, c0] = True
            px = []
            while stack:
                r, c = stack.pop()
                px.append((r, c))
                for rr, cc in ((r - 1, c), (r + 1, c),
                               (r, c - 1), (r, c + 1)):
                    if (0 <= rr < h and 0 <= cc < w and not seen[rr, cc]
                            and band[rr, cc] == v):
                        seen[rr, cc] = True
                        stack.append((rr, cc))
            rs = [p[0] for p in px]
            cs = [p[1] for p in px]
            first = min(p[0] * (1 << 32) + p[1] for p in px)
            out.add((int(v), len(px), min(rs), min(cs), max(rs),
                     max(cs), first & 0xFFFFFFFF))
    return out


def run_engine(spark, band: np.ndarray, ts: int, nodata: int = 0):
    h, w = band.shape
    assert h % ts == 0 and w % ts == 0
    rows = []
    for ty in range(h // ts):
        for tx in range(w // ts):
            tile = band[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append((tx, ty,
                         bytearray(encode_grayscale8(tile, nodata))))
    tiles = spark.createDataFrame(rows, "tx long, ty long, png binary")
    got = region_label(tiles, ts, nodata=nodata).collect()
    return {(r.value, r.n_pixels, r.min_r, r.min_c, r.max_r, r.max_c,
             r.first_c) for r in got}


def test_fixture_canvas_matches_bruteforce(spark):
    band = region_canvas_band(256, 192, 5)
    want = brute_regions(band, NODATA)
    assert run_engine(spark, band, 64, NODATA) == want
    # a region must actually cross a tile border for the test to bite
    assert any(
        (mnr < 64 <= mxr) or (mnc < 64 <= mxc)
        for (_, _, mnr, mnc, mxr, mxc, _) in want)


def test_tile_size_invariance(spark):
    band = region_canvas_band(128, 96, 9)
    whole = run_engine(spark, band, 32)
    assert whole == brute_regions(band)
    # relabel with different tilings: identical result
    for ts in (16, 8):
        assert run_engine(spark, band, ts) == whole


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_canvases(spark, seed):
    rng = np.random.default_rng(seed)
    band = rng.integers(0, 4, size=(48, 64)).astype(np.uint8)
    assert run_engine(spark, band, 16) == brute_regions(band)


def test_u_shape_spans_multiple_borders(spark):
    # one region entering the bottom tile twice (two equivalence pairs
    # on the same border must both be found, and must merge)
    band = np.zeros((32, 32), dtype=np.uint8)
    band[4:20, 4:8] = 7    # left arm, crosses row 16 tile border
    band[4:20, 24:28] = 7  # right arm
    band[16:20, 4:28] = 7  # bridge in the lower tiles
    assert run_engine(spark, band, 16) == brute_regions(band)


def test_all_nodata_and_singletons(spark):
    band = np.zeros((16, 16), dtype=np.uint8)
    assert run_engine(spark, band, 8) == set()
    # checkerboard of two values: diagonal neighbors do NOT connect
    r, c = np.indices((16, 16))
    board = ((r + c) % 2 + 1).astype(np.uint8)
    got = run_engine(spark, board, 8)
    assert len(got) == 256
    assert all(n == 1 for (_, n, *_rest) in got)


def test_fixture_parquet_roundtrip(spark):
    path = region_canvas_parquet(128, 96, 32, 5)
    tiles = spark.read.parquet(path)
    got = region_label(tiles, 32).collect()
    want = brute_regions(region_canvas_band(128, 96, 5), NODATA)
    assert {(r.value, r.n_pixels, r.min_r, r.min_c, r.max_r, r.max_c,
             r.first_c) for r in got} == want
