"""Web-mercator tile-grid math — the engine's "expression library".

Pure numpy functions (vectorized over arrays OR plain python scalars).
Semantics mirror the reference exactly; every function cites the span of
/root/reference it re-expresses and is pinned by the reference's own
rstest vectors in tests/test_tilemath.py.

Spark-column-expression twins of the hot functions live in
``rastertiler_rs_spark.functions.columns`` — those are what run in the
distributed plan; these are the oracle + in-UDF forms.
"""

from __future__ import annotations

import math

import numpy as np

# constants per /root/reference/src/tileid.rs:8-10
RE = 6378137.0
ORIGIN = RE * math.pi
CE = 2.0 * ORIGIN

LAT_LIMIT = 85.051129  # /root/reference/src/tileid.rs:28


def geo_to_mercator(lon, lat):
    """Geographic → spherical-mercator, clamped.

    Re-expresses /root/reference/src/tileid.rs:21-34 (clamp lon to
    ±180, lat to ±85.051129; x = lon*ORIGIN/180;
    y = RE*ln(tan(pi/4 + lat*deg2rad/2))).
    """
    deg2rad = math.pi / 180.0
    lon = np.clip(lon, -180.0, 180.0)
    lat = np.clip(lat, -LAT_LIMIT, LAT_LIMIT)
    x = lon * (ORIGIN / 180.0)
    y = RE * np.log(np.tan((math.pi * 0.25) + (0.5 * deg2rad * lat)))
    return x, y


def mercator_to_geo(x, y):
    """Inverse of :func:`geo_to_mercator` (not in the reference; needed
    for metadata bounds, /root/reference/src/render.rs:73-85)."""
    lon = np.asarray(x) / (ORIGIN / 180.0)
    lat = (2.0 * np.arctan(np.exp(np.asarray(y) / RE)) - math.pi * 0.5) * (180.0 / math.pi)
    return lon, lat


def tile_geo_bounds(zoom, x, y):
    """Tile → lon/lat box. /root/reference/src/tileid.rs:54-66."""
    z = np.ldexp(1.0, np.asarray(zoom, dtype=np.int64)) if not np.isscalar(zoom) else float(1 << zoom)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rad2deg = 180.0 / math.pi
    xmin = x / z * 360.0 - 180.0
    ymin = np.arctan(np.sinh(math.pi * (1.0 - 2.0 * ((y + 1.0) / z)))) * rad2deg
    xmax = (x + 1.0) / z * 360.0 - 180.0
    ymax = np.arctan(np.sinh(math.pi * (1.0 - 2.0 * y / z))) * rad2deg
    return xmin, ymin, xmax, ymax


def tile_mercator_bounds(zoom, x, y):
    """Tile → EPSG:3857 box. /root/reference/src/tileid.rs:67-82.

    THE tile-assignment contract: must be bit-identical everywhere
    (numpy oracle, pandas UDFs, Spark column twin).
    """
    z = np.ldexp(1.0, np.asarray(zoom, dtype=np.int64)) if not np.isscalar(zoom) else float(1 << zoom)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    tile_size = CE / z
    xmin = x * tile_size - CE / 2.0
    ymax = CE / 2.0 - y * tile_size
    return xmin, ymax - tile_size, xmin + tile_size, ymax


def tile_range(zoom, xmin, ymin, xmax, ymax):
    """Mercator box → inclusive tile rect at ``zoom``.

    Copies /root/reference/src/tileid.rs:100-131 verbatim: floor with
    eps=1e-11 shrink applied to the max edges, clamp to [0, 2^z-1].
    Vectorized over the box coordinates.
    """
    z = float(1 << int(zoom)) if np.isscalar(zoom) else np.ldexp(1.0, np.asarray(zoom, dtype=np.int64))
    origin = -ORIGIN
    eps = 1e-11
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)

    txmin = np.clip(np.floor(((xmin - origin) / CE) * z), 0.0, z - 1.0).astype(np.int64)
    tymin = np.clip(np.floor((1.0 - ((ymax - origin) / CE)) * z), 0.0, z - 1.0).astype(np.int64)
    txmax = np.clip(np.floor((((xmax - origin) / CE) - eps) * z), 0.0, z - 1.0).astype(np.int64)
    tymax = np.clip(np.floor((1.0 - (((ymin - origin) / CE) + eps)) * z), 0.0, z - 1.0).astype(np.int64)
    return txmin, tymin, txmax, tymax


def tile_range_count(txmin, tymin, txmax, tymax):
    """/root/reference/src/tileid.rs:133-136."""
    return (np.asarray(txmax) - txmin + 1) * (np.asarray(tymax) - tymin + 1)


def tile_range_iter(zoom, txmin, tymin, txmax, tymax):
    """x-major iteration. /root/reference/src/tileid.rs:138-145."""
    for x in range(int(txmin), int(txmax) + 1):
        for y in range(int(tymin), int(tymax) + 1):
            yield (zoom, x, y)


def tms_flip_y(zoom, y):
    """MBTiles TMS y-flip. /root/reference/src/mbtiles.rs:111-113."""
    return (np.int64(1) << np.asarray(zoom, dtype=np.int64)) - 1 - np.asarray(y, dtype=np.int64)


# ---------------------------------------------------------------------------
# Affine transforms: 6-tuple (a, b, c, d, e, f); x' = a*x + b*y + c,
# y' = d*x + e*y + f. /root/reference/src/affine.rs:6-13, :62-67.
# Values not classes — tuples flow through UDFs and column exprs.
# ---------------------------------------------------------------------------

def affine_invert(t):
    """/root/reference/src/affine.rs:45-60."""
    a, b, c, d, e, f = t
    inv_det = 1.0 / (a * e - b * d)
    ia = e * inv_det
    ib = -b * inv_det
    id_ = -d * inv_det
    ie = a * inv_det
    return (ia, ib, -c * ia - f * ib, id_, ie, -c * id_ - f * ie)


def affine_multiply(t, x, y):
    """/root/reference/src/affine.rs:62-67."""
    a, b, c, d, e, f = t
    return (x * a + y * b + c, x * d + y * e + f)


def affine_scale(t, sx, sy):
    """Scale a and e only. /root/reference/src/affine.rs:69-78."""
    a, b, c, d, e, f = t
    return (a * sx, b, c, d, e * sy, f)


def affine_resolution(t):
    """/root/reference/src/affine.rs:80-82."""
    return (abs(t[0]), abs(t[4]))


def affine_from_gdal(g):
    """GDAL coefficient order → ours. /root/reference/src/affine.rs:30-39."""
    return (g[1], g[2], g[0], g[4], g[5], g[3])


def affine_to_gdal(t):
    """/root/reference/src/affine.rs:41-43."""
    return (t[2], t[0], t[1], t[5], t[3], t[4])


# ---------------------------------------------------------------------------
# Window: fractional pixel-space read region (x_offset, y_offset, w, h).
# /root/reference/src/window.rs:5-10.
# ---------------------------------------------------------------------------

def window_from_bounds(transform, bounds):
    """Project the 4 bounds corners through the inverted affine; envelope.

    /root/reference/src/window.rs:13-62. ``bounds`` = (xmin,ymin,xmax,ymax).
    """
    inv = affine_invert(transform)
    xmin, ymin, xmax, ymax = bounds
    corners = [
        affine_multiply(inv, xmin, ymin),
        affine_multiply(inv, xmin, ymax),
        affine_multiply(inv, xmax, ymin),
        affine_multiply(inv, xmax, ymax),
    ]
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    x0, y0 = min(xs), min(ys)
    return (x0, y0, max(xs) - x0, max(ys) - y0)


def window_transform(window, transform):
    """Affine for a window's origin. /root/reference/src/window.rs:64-75."""
    x, y = affine_multiply(transform, window[0], window[1])
    a, b, c, d, e, f = transform
    return (a, b, x, d, e, y)


# ---------------------------------------------------------------------------
# Quadkey cell index (north-star J4): the XYZ tile path IS the cell
# system — hierarchical, parent/child, k-rings as Chebyshev rings in
# tile coordinates. Generalizes the reference grid (tileid.rs) the way
# BASELINE.json's H3/S2 requirement asks.
# ---------------------------------------------------------------------------

def cell_id(zoom, x, y):
    """Pack (zoom, x, y) into one int64: 5 bits zoom | 29 bits x | 29 bits y.

    zoom <= 24 (/root/reference/src/main.rs:146-154) so 29 bits/axis
    suffice. Stable across numpy / python / Spark (same shifts).
    """
    z = np.asarray(zoom, dtype=np.int64)
    return (z << np.int64(58)) | (np.asarray(x, dtype=np.int64) << np.int64(29)) | np.asarray(y, dtype=np.int64)


def cell_decode(cid):
    cid = np.asarray(cid, dtype=np.int64)
    mask = np.int64((1 << 29) - 1)
    return (cid >> np.int64(58)), (cid >> np.int64(29)) & mask, cid & mask


def cell_parent(zoom, x, y, parent_zoom):
    """Quadkey parent: truncate the path (x >> dz, y >> dz)."""
    dz = np.asarray(zoom, dtype=np.int64) - np.int64(parent_zoom)
    return (np.asarray(x, dtype=np.int64) >> dz, np.asarray(y, dtype=np.int64) >> dz)


def cell_ring(zoom, x, y, r):
    """Chebyshev ring r around (x, y) at ``zoom``: cells at exactly
    distance r, clamped to the grid (no wrap). r=0 → the cell itself."""
    n = 1 << int(zoom)
    if r == 0:
        return [(x, y)]
    out = []
    for cx in range(x - r, x + r + 1):
        for cy in range(y - r, y + r + 1):
            if max(abs(cx - x), abs(cy - y)) == r and 0 <= cx < n and 0 <= cy < n:
                out.append((cx, cy))
    return out
