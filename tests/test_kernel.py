"""Window-read kernel (K1/K2) edge cases with hand-computed expectations,
plus mosaic placement mirroring the reference shift vectors
(/root/reference/src/array.rs:162-198)."""

import numpy as np
import pytest

from rastertiler_rs_spark import tilemath as tm
from rastertiler_rs_spark.kernel import mosaic, read_tile_block


def _band(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 255, (h, w), dtype=np.uint8)  # never nodata(0)


def test_exact_cover_identity():
    """Image footprint == tile bounds, same pixel count → block == band."""
    z, x, y = 2, 1, 1
    bx = tm.tile_mercator_bounds(z, x, y)
    band = _band(256, 256)
    res = read_tile_block(band, *(float(v) for v in bx), z, x, y, 256, 0)
    left, top, w, h, block = res
    assert (left, top, w, h) == (0, 0, 256, 256)
    assert np.array_equal(block, band)


def test_exact_cover_upsample_2x():
    """Same footprint, tilesize 2x image → nearest upsample = repeat."""
    z, x, y = 3, 4, 2
    bx = tm.tile_mercator_bounds(z, x, y)
    band = _band(128, 128, seed=1)
    left, top, w, h, block = read_tile_block(band, *(float(v) for v in bx), z, x, y, 256, 0)
    assert (left, top, w, h) == (0, 0, 256, 256)
    assert np.array_equal(block, np.repeat(np.repeat(band, 2, axis=0), 2, axis=1))


def test_exact_cover_downsample_2x():
    """Image 2x tile resolution → nearest decimation picks odd indices
    (floor((i+0.5)*2) = 2i+1)."""
    z, x, y = 3, 4, 2
    bx = tm.tile_mercator_bounds(z, x, y)
    band = _band(512, 512, seed=2)
    left, top, w, h, block = read_tile_block(band, *(float(v) for v in bx), z, x, y, 256, 0)
    assert (left, top, w, h) == (0, 0, 256, 256)
    assert np.array_equal(block, band[1::2, 1::2])


def test_half_cover_right_half():
    """Image covers the right half of a tile → left margin = half tile."""
    z, x, y = 4, 5, 6
    xmin, ymin, xmax, ymax = (float(v) for v in tm.tile_mercator_bounds(z, x, y))
    mid = (xmin + xmax) / 2.0
    band = _band(128, 64, seed=3)  # 64 wide covering right half
    left, top, w, h, block = read_tile_block(band, mid, ymin, xmax, ymax, z, x, y, 256, 0)
    assert (left, top, w, h) == (128, 0, 128, 256)
    assert np.array_equal(block, np.repeat(np.repeat(band, 2, axis=0), 2, axis=1))


def test_tile_inside_big_image():
    """Tile strictly inside a 4-tile image → pure windowed decimation."""
    z = 4
    # image covers tiles x in [4,5], y in [6,7]
    bx0 = tm.tile_mercator_bounds(z, 4, 6)
    bx1 = tm.tile_mercator_bounds(z, 5, 7)
    minx, ymax = float(bx0[0]), float(bx0[3])
    maxx, miny = float(bx1[2]), float(bx1[1])
    band = _band(256, 256, seed=4)
    left, top, w, h, block = read_tile_block(band, minx, miny, maxx, maxy := ymax, z, 5, 6, 128, 0)
    assert (left, top, w, h) == (0, 0, 128, 128)
    # tile (5,6) = top-right quadrant: cols 128.., rows ..128, no resample
    assert np.array_equal(block, band[0:128, 128:256])


def test_disjoint_returns_none():
    z = 4
    bx = tm.tile_mercator_bounds(z, 5, 6)
    far = tm.tile_mercator_bounds(z, 9, 10)
    band = _band(64, 64)
    assert read_tile_block(band, *(float(v) for v in far), z, 5, 6, 256, 0) is None
    assert read_tile_block(band, *(float(v) for v in bx), z, 5, 6, 256, 0) is not None


def test_all_nodata_returns_none():
    z, x, y = 2, 1, 1
    bx = tm.tile_mercator_bounds(z, x, y)
    band = np.zeros((64, 64), dtype=np.uint8)
    assert read_tile_block(band, *(float(v) for v in bx), z, x, y, 256, 0) is None


def test_subpixel_image_at_low_zoom():
    """An image much smaller than one tile pixel → width rounds to 0 →
    treated as no data (engine-defined guard; outside the reference's
    tested envelope)."""
    band = _band(64, 64)
    cs = tm.CE / (1 << 20)
    assert read_tile_block(band, 0.0, 0.0, cs, cs, 0, 0, 0, 256, 0) is None


# --- mosaic: placement mirrors the reference shift vectors
# (/root/reference/src/array.rs:162-198, transposed to our (h,w) blocks) ---
def test_mosaic_single_placement():
    block = np.array([[1], [2]], dtype=np.uint8)  # (h=2, w=1)
    canvas = mosaic([("a", 2, 1, 1, 2, block)], 4, 0, np.uint8)
    expected = np.zeros((4, 4), dtype=np.uint8)
    expected[1, 2] = 1
    expected[2, 2] = 2
    assert np.array_equal(canvas, expected)


def test_mosaic_order_and_nodata_respect():
    b1 = np.full((2, 2), 5, dtype=np.uint8)
    b2 = np.array([[7, 0], [0, 7]], dtype=np.uint8)  # 0 = nodata, must not erase b1
    canvas = mosaic([("img2", 0, 0, 2, 2, b2), ("img1", 0, 0, 2, 2, b1)], 2, 0, np.uint8)
    assert canvas.tolist() == [[7, 5], [5, 7]]


def test_mosaic_all_nodata_returns_none():
    b = np.zeros((2, 2), dtype=np.uint8)
    assert mosaic([("a", 0, 0, 2, 2, b)], 4, 0, np.uint8) is None


def test_kernel_matches_reference_window_math():
    """Cross-check margins against an independent derivation: for an
    axis-aligned footprint, left margin in tile pixels should equal
    (img.xmin - tile.xmin)/tile_res when positive."""
    z, x, y = 6, 20, 30
    txmin, tymin, txmax, tymax = (float(v) for v in tm.tile_mercator_bounds(z, x, y))
    ts = txmax - txmin
    # image covering the central 50% of the tile
    minx, maxx = txmin + 0.25 * ts, txmax - 0.25 * ts
    miny, maxy = tymin + 0.25 * ts, tymax - 0.25 * ts
    band = _band(100, 100, seed=5)
    left, top, w, h, block = read_tile_block(band, minx, miny, maxx, maxy, z, x, y, 256, 0)
    assert (left, top, w, h) == (64, 64, 128, 128)
    assert block.shape == (128, 128)
