"""Property-based tests (hypothesis) for the math core: invariants that
must hold for ALL inputs, not just the reference's vectors."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from rastertiler_rs_spark import tilemath as tm
from rastertiler_rs_spark.kernel import mosaic, read_tile_block
from rastertiler_rs_spark.png import (Colormap, decode_band, decode_png,
                                      encode_grayscale8, encode_paletted,
                                      encode_rgb, rgb_from_u32)

zooms = st.integers(min_value=0, max_value=14)


@st.composite
def mercator_boxes(draw):
    z = draw(zooms)
    x0 = draw(st.floats(-tm.ORIGIN, tm.ORIGIN - 1.0))
    y0 = draw(st.floats(-tm.ORIGIN, tm.ORIGIN - 1.0))
    w = draw(st.floats(1e-3, tm.ORIGIN))
    h = draw(st.floats(1e-3, tm.ORIGIN))
    return z, x0, y0, min(x0 + w, tm.ORIGIN), min(y0 + h, tm.ORIGIN)


@settings(max_examples=200, deadline=None)
@given(mercator_boxes())
def test_tile_range_covers_box(box):
    """Every tile whose mercator bounds strictly overlap the box is in
    the range, and the range's corner tiles do overlap (up to the
    reference's deliberate eps shrink on max edges)."""
    z, xmin, ymin, xmax, ymax = box
    txmin, tymin, txmax, tymax = tm.tile_range(z, xmin, ymin, xmax, ymax)
    n = 1 << z
    assert 0 <= txmin <= txmax <= n - 1
    assert 0 <= tymin <= tymax <= n - 1
    # a strict-interior point of the box must land inside the range
    cx, cy = (xmin + xmax) / 2, (ymin + ymax) / 2
    ctx = min(max(int((cx + tm.ORIGIN) / tm.CE * n), 0), n - 1)
    cty = min(max(int((tm.ORIGIN - cy) / tm.CE * n), 0), n - 1)
    assert txmin <= ctx <= txmax
    assert tymin <= cty <= tymax


@settings(max_examples=200, deadline=None)
@given(zooms, st.integers(0), st.integers(0))
def test_tile_bounds_nesting(z, xr, yr):
    """A child tile's mercator box is contained in its parent's box."""
    if z == 0:
        return
    x, y = xr % (1 << z), yr % (1 << z)
    cxmin, cymin, cxmax, cymax = tm.tile_mercator_bounds(z, x, y)
    pxmin, pymin, pxmax, pymax = tm.tile_mercator_bounds(z - 1, x >> 1, y >> 1)
    eps = 1e-6
    assert pxmin - eps <= cxmin and cxmax <= pxmax + eps
    assert pymin - eps <= cymin and cymax <= pymax + eps
    # geo and mercator bounds agree through the projection
    gxmin, gymin, gxmax, gymax = tm.tile_geo_bounds(z, x, y)
    mx, my = tm.geo_to_mercator(gxmin, gymax)
    assert math.isclose(mx, cxmin, rel_tol=0, abs_tol=1e-6)
    assert math.isclose(my, cymax, rel_tol=0, abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**30), st.integers(0, 2**30), st.integers(1, 14))
def test_cell_pack_roundtrip_and_parent(x, y, z):
    x, y = x % (1 << z), y % (1 << z)
    cid = tm.cell_id(z, x, y)
    assert tm.cell_decode(cid) == (z, x, y)
    pz = max(z - 2, 0)
    px, py = tm.cell_parent(z, x, y, pz)
    assert px == x >> (z - pz) and py == y >> (z - pz)


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(0, 255))
def test_png_gray_roundtrip(w, h, nodata):
    rng = np.random.RandomState(w * 61 + h)
    arr = rng.randint(0, 256, (h, w)).astype(np.uint8)
    png = encode_grayscale8(arr, nodata)
    assert np.array_equal(decode_png(png)["pixels"], arr)


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 16))
def test_png_paletted_roundtrip_all_bit_depths(w, h, ncolors):
    cm = Colormap(nodata=0)
    for v in range(1, ncolors + 1):
        cm.add_color(v, (v * 3 % 256, v * 7 % 256, v * 11 % 256))
    rng = np.random.RandomState(w * 67 + h)
    arr = rng.randint(0, ncolors + 1, (h, w)).astype(np.uint8)
    png = encode_paletted(arr, cm)
    d = decode_png(png)
    # indices decode back to the palette slots of the original values
    lut = np.fromiter(cm.values.keys(), dtype=np.int64)
    assert np.array_equal(lut[d["pixels"]], arr)


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 32), st.integers(1, 32))
def test_png_rgb_roundtrip_u32(w, h):
    rng = np.random.RandomState(w * 71 + h)
    vals = rng.randint(0, 1 << 24, (h, w)).astype(np.uint32)
    png = encode_rgb(rgb_from_u32(vals), nodata_value=0)
    assert np.array_equal(decode_band(png, "png;u32"), vals)


@settings(max_examples=60, deadline=None)
@given(st.integers(2, 48), st.integers(2, 48), zooms,
       st.integers(0, 3), st.integers(0, 3))
def test_kernel_block_within_canvas(w, h, z, fx, fy):
    """read_tile_block placement always fits the tile canvas and mosaic
    never throws, for arbitrary image sizes/footprints."""
    ts = 32
    n = 1 << z
    cell = tm.CE / n
    minx = -tm.ORIGIN + (fx % n) * cell + 0.13 * cell
    maxy = tm.ORIGIN - (fy % n) * cell - 0.21 * cell
    maxx = min(minx + 1.7 * cell, tm.ORIGIN)
    miny = max(maxy - 1.3 * cell, -tm.ORIGIN)
    band = (np.arange(w * h, dtype=np.int64) % 254 + 1).astype(np.uint8).reshape(h, w)
    r = tm.tile_range(z, minx, miny, maxx, maxy)
    for _, tx, ty in tm.tile_range_iter(z, *r):
        res = read_tile_block(band, minx, miny, maxx, maxy, z, tx, ty, ts, 0)
        if res is None:
            continue
        left, top, bw, bh, block = res
        assert 0 <= left and left + bw <= ts
        assert 0 <= top and top + bh <= ts
        assert block.shape == (bh, bw)
        canvas = mosaic([("img", left, top, bw, bh, block)], ts, 0, np.uint8)
        assert canvas is None or canvas.shape == (ts, ts)


@given(st.integers(1, 3),
       st.integers(0, 7), st.integers(0, 7),
       st.integers(2, 5).map(lambda p: 1 << p))
@settings(max_examples=60, deadline=None)
def test_overzoom_child_floor_rule(levels, dx, dy, ts):
    """upsample_child == the +0.5-floor nearest rule for every
    child/pixel at every level."""
    from rastertiler_rs_spark.operators.overzoom import upsample_child

    n = 1 << levels
    dx, dy = dx % n, dy % n
    parent = (np.arange(ts * ts, dtype=np.int64).reshape(ts, ts)
              * 31 % 251).astype(np.uint8)
    child = upsample_child(parent, dx, dy, levels)
    for i in range(0, ts, max(1, ts // 7)):
        for j in range(0, ts, max(1, ts // 7)):
            r = int(math.floor((dy * ts + i + 0.5) / n))
            c = int(math.floor((dx * ts + j + 0.5) / n))
            assert child[i, j] == parent[r, c]


@given(st.lists(st.tuples(st.integers(1, 255), st.integers(1, 5000)),
                min_size=1, max_size=30, unique_by=lambda t: t[0]))
@settings(max_examples=80, deadline=None)
def test_equalize_lut_properties(hist):
    """Monotone on present values, endpoints pinned (rarest→1 iff
    more than one value... always ≥1; densest tail→255), absent
    values and nodata → 0."""
    from rastertiler_rs_spark.operators.algebra import equalize_lut

    counts = np.zeros(256, dtype=np.int64)
    for v, c in hist:
        counts[v] = c
    lut = equalize_lut(counts)
    present = np.nonzero(counts)[0]
    vals = lut[present]
    assert (np.diff(vals) >= 0).all()
    assert vals.min() >= 1 and vals.max() <= 255
    assert lut[0] == 0
    assert (lut[counts == 0] == 0).all()
    assert vals[-1] == 255 or len(present) == 1


@given(st.lists(st.integers(-30, 30), min_size=8, max_size=8))
@settings(max_examples=200, deadline=None)
def test_d8_direction_scalar(drops):
    """d8_direction vs an exact-Fraction slope argmax with first-wins
    ties — no float anywhere in the reference computation."""
    from fractions import Fraction

    from rastertiler_rs_spark.operators.halo import (_D8_OFFSETS,
                                                     d8_direction)

    arr = [np.array([d], dtype=np.int64) for d in drops]
    got = int(d8_direction(arr)[0])
    best, best_s = -1, Fraction(0)
    for i, (_, _, d2) in enumerate(_D8_OFFSETS):
        d = drops[i]
        if d <= 0:
            continue
        s = Fraction(d * d, d2)     # slope² — order-equivalent for d>0
        if s > best_s:
            best, best_s = i, s
    assert got == best


@given(st.integers(0, 255), st.integers(0, 7))
@settings(max_examples=120, deadline=None)
def test_relief_rgb_segment_bounds(v, _salt):
    """Every relief channel lies between its segment's endpoint
    colors (weighted average property), and stop values map to the
    stop colors exactly."""
    from rastertiler_rs_spark.operators.algebra import (
        DEFAULT_RELIEF_RAMP, relief_rgb)

    band = np.full((1, 1), v, dtype=np.uint8)
    rgb = relief_rgb(band)[0, 0]
    if v == 0:
        assert tuple(rgb) == (0, 0, 0)
        return
    vs = [s[0] for s in DEFAULT_RELIEF_RAMP]
    x = min(max(v, vs[0]), vs[-1])
    i = max(j for j in range(len(vs) - 1) if vs[j] <= x or j == 0)
    for ch in range(3):
        lo = min(DEFAULT_RELIEF_RAMP[i][1 + ch],
                 DEFAULT_RELIEF_RAMP[i + 1][1 + ch])
        hi = max(DEFAULT_RELIEF_RAMP[i][1 + ch],
                 DEFAULT_RELIEF_RAMP[i + 1][1 + ch])
        assert lo - 1 <= rgb[ch] <= hi
    for stop in DEFAULT_RELIEF_RAMP:
        if v == stop[0]:
            assert tuple(rgb) == stop[1:]
