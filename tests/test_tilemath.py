"""Tile/affine/window math pinned to the reference's own rstest vectors.

Every case below is lifted verbatim from:
- /root/reference/src/tileid.rs:148-281
- /root/reference/src/affine.rs:85-191
- /root/reference/src/window.rs:78-141
These are the only reference-authored goldens that exist (the Rust
binary is unbuildable here: GDAL absent).
"""

import math

import numpy as np
import pytest

from rastertiler_rs_spark import tilemath as tm

EPS = 1e-6
ORIGIN = tm.ORIGIN


def approx(a, b, eps=EPS):
    return abs(a - b) < eps


# --- geo_to_mercator: /root/reference/src/tileid.rs:154-170 ---
@pytest.mark.parametrize(
    "lon,lat,x,y",
    [
        (0.0, 0.0, 0.0, 0.0),
        (-180.0, 0.0, -ORIGIN, 0.0),
        (-180.0, -90.0, -ORIGIN, -20037508.6269291),
        (-180.0, -85.051129, -ORIGIN, -20037508.6269291),
    ],
)
def test_geo_to_mercator(lon, lat, x, y):
    ax, ay = tm.geo_to_mercator(lon, lat)
    assert approx(ax, x) and approx(ay, y)


# --- tile geo_bounds: /root/reference/src/tileid.rs:185-197 ---
@pytest.mark.parametrize(
    "zoom,x,y,expected",
    [
        (0, 0, 0, (-180.0, -85.051129, 180.0, 85.051129)),
        (1, 1, 1, (0.0, -85.051129, 180.0, 0.0)),
        (10, 20, 30, (-172.968750, 84.016022, -172.617188, 84.052561)),
    ],
)
def test_tile_geo_bounds(zoom, x, y, expected):
    actual = tm.tile_geo_bounds(zoom, x, y)
    assert all(approx(a, e) for a, e in zip(actual, expected))


# --- tile mercator_bounds: /root/reference/src/tileid.rs:199-211 ---
@pytest.mark.parametrize(
    "zoom,x,y,expected",
    [
        (0, 0, 0, (-20037508.342789, -20037508.342789, 20037508.342789, 20037508.342789)),
        (1, 1, 1, (0.0, -20037508.342789, 20037508.342789, 0.0)),
        (10, 20, 30, (-19254793.173149, 18824299.829847, -19215657.414667, 18863435.588329)),
    ],
)
def test_tile_mercator_bounds(zoom, x, y, expected):
    actual = tm.tile_mercator_bounds(zoom, x, y)
    assert all(approx(a, e) for a, e in zip(actual, expected))


def _merc_box(geo):
    xmin, ymin = tm.geo_to_mercator(geo[0], geo[1])
    xmax, ymax = tm.geo_to_mercator(geo[2], geo[3])
    return xmin, ymin, xmax, ymax


# --- TileRange::new/count/iter: /root/reference/src/tileid.rs:213-280 ---
RANGE_CASES = [
    (0, (-180.0, -90.0, 180.0, 90.0), (0, 0, 0, 0), 1),
    (1, (-180.0, -90.0, 90.0, 90.0), (0, 0, 1, 1), 4),
    (1, (-180.0, -90.0, 0.0, 90.0), (0, 0, 0, 1), 2),
    (4, (-100.0, -20.0, -20.0, 20.0), (3, 7, 7, 8), 10),
    (4, (-1e-6, -1e-6, 1e-6, 1e-6), (7, 7, 8, 8), 4),
]


@pytest.mark.parametrize("zoom,geo,expected,count", RANGE_CASES)
def test_tile_range(zoom, geo, expected, count):
    r = tm.tile_range(zoom, *_merc_box(geo))
    assert tuple(int(v) for v in r) == expected
    assert int(tm.tile_range_count(*r)) == count


@pytest.mark.parametrize(
    "zoom,geo,first,last",
    [
        (0, (-180.0, -90.0, 180.0, 90.0), (0, 0, 0), (0, 0, 0)),
        (1, (-180.0, -90.0, 180.0, 90.0), (1, 0, 0), (1, 1, 1)),
        (1, (-180.0, -90.0, 0.0, 90.0), (1, 0, 0), (1, 0, 1)),
        (4, (-100.0, -20.0, -20.0, 20.0), (4, 3, 7), (4, 7, 8)),
        (4, (-1e-6, -1e-6, 1e-6, 1e-6), (4, 7, 7), (4, 8, 8)),
    ],
)
def test_tile_range_iter(zoom, geo, first, last):
    r = tm.tile_range(zoom, *_merc_box(geo))
    tiles = list(tm.tile_range_iter(zoom, *r))
    assert tiles[0] == first and tiles[-1] == last


def test_tile_range_vectorized_matches_scalar():
    zoom = 7
    rng = np.random.default_rng(42)
    xmin = rng.uniform(-ORIGIN, ORIGIN - 1, 100)
    xmax = xmin + rng.uniform(0, ORIGIN / 4, 100)
    ymin = rng.uniform(-ORIGIN, ORIGIN - 1, 100)
    ymax = ymin + rng.uniform(0, ORIGIN / 4, 100)
    v = tm.tile_range(zoom, xmin, ymin, xmax, ymax)
    for i in range(100):
        s = tm.tile_range(zoom, xmin[i], ymin[i], xmax[i], ymax[i])
        assert tuple(int(a[i]) for a in v) == tuple(int(b) for b in s)


# --- affine: /root/reference/src/affine.rs:85-191 ---
def test_affine_from_to_gdal():
    assert tm.affine_from_gdal((0.0, 1.0, 2.0, 3.0, 4.0, 5.0)) == (1.0, 2.0, 0.0, 4.0, 5.0, 3.0)
    assert tm.affine_to_gdal(tm.affine_from_gdal((0.0, 1.0, 2.0, 3.0, 4.0, 5.0))) == (
        0.0, 1.0, 2.0, 3.0, 4.0, 5.0)


def test_affine_invert():
    actual = tm.affine_invert((30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0))
    expected = (0.03333333333333333, 0.0, -33.333333333333336, 0.0, -0.03333333333333333,
                66.66666666666667)
    assert all(approx(a, e) for a, e in zip(actual, expected))


def test_affine_multiply():
    assert tm.affine_multiply((30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0), 2.0, 3.0) == (1060.0, 1910.0)


def test_affine_scale():
    assert tm.affine_scale((30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0), 2.0, 3.0) == (
        60.0, 0.0, 1000.0, 0.0, -90.0, 2000.0)


def test_affine_resolution():
    assert tm.affine_resolution((30.0, 0.0, 1000.0, 0.0, -60.0, 2000.0)) == (30.0, 60.0)


# --- window: /root/reference/src/window.rs:78-141 ---
def test_window_from_bounds():
    w = tm.window_from_bounds((30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0), (0.0, 10.0, 100.0, 200.0))
    expected = (-33.333333333333336, 60.00000000000001, 3.333333333333332, 6.333333333333336)
    assert all(approx(a, e) for a, e in zip(w, expected))


@pytest.mark.parametrize(
    "window,expected",
    [
        ((0.0, 0.0, 10.0, 20.0), (30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0)),
        ((10.0, 20.0, 10.0, 20.0), (30.0, 0.0, 1300.0, 0.0, -30.0, 1400.0)),
        ((-10.0, -20.0, 10.0, 20.0), (30.0, 0.0, 700.0, 0.0, -30.0, 2600.0)),
    ],
)
def test_window_transform(window, expected):
    actual = tm.window_transform(window, (30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0))
    assert all(approx(a, e) for a, e in zip(actual, expected))


# --- tms flip: /root/reference/src/mbtiles.rs:111-113 ---
@pytest.mark.parametrize("zoom,y,expected", [(0, 0, 0), (1, 0, 1), (10, 30, 993), (14, 0, 16383)])
def test_tms_flip(zoom, y, expected):
    assert int(tm.tms_flip_y(zoom, y)) == expected


# --- quadkey cells (north-star J4, engine-defined) ---
def test_cell_roundtrip():
    z, x, y = np.array([14, 0, 24]), np.array([16383, 0, 2**24 - 1]), np.array([1, 0, 7])
    dz, dx, dy = tm.cell_decode(tm.cell_id(z, x, y))
    assert (dz == z).all() and (dx == x).all() and (dy == y).all()


def test_cell_parent_and_ring():
    assert tuple(int(v) for v in tm.cell_parent(10, 512, 300, 8)) == (128, 75)
    ring = tm.cell_ring(4, 7, 7, 1)
    assert len(ring) == 8 and all(max(abs(cx - 7), abs(cy - 7)) == 1 for cx, cy in ring)
    assert tm.cell_ring(2, 0, 0, 1) == [(0, 1), (1, 0), (1, 1)]
    assert tm.cell_ring(4, 7, 7, 0) == [(7, 7)]


def test_mercator_geo_roundtrip():
    lon = np.array([-179.0, -42.5, 0.0, 13.37, 179.9])
    lat = np.array([-84.0, -10.0, 0.0, 45.0, 84.9])
    x, y = tm.geo_to_mercator(lon, lat)
    lon2, lat2 = tm.mercator_to_geo(x, y)
    assert np.allclose(lon, lon2) and np.allclose(lat, lat2)
