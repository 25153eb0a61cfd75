"""The column-expression library: tile-grid math as Spark Columns.

JVM-side (whole-stage-codegen) twins of the pure-python tilemath
functions — same IEEE-754 operation order, so results are bit-identical
to the numpy oracle (pinned by the reference's unit vectors,
/root/reference/src/tileid.rs:148-281). Use these for planning-layer
queries (manifests, covers, flips); the pixel kernel stays numpy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

RE = 6378137.0
ORIGIN = RE * math.pi          # /root/reference/src/tileid.rs:8-10
CE = 2.0 * ORIGIN
LAT_LIMIT = 85.051129


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v)


def zoom_scale(zoom) -> Column:
    """2^zoom as double — pow(2, z) is IEEE-exact for zoom <= 24, and
    unlike F.shiftleft it accepts a Column shift amount."""
    return F.pow(F.lit(2.0), _c(zoom).cast("int"))


def geo_to_mercator_cols(lon, lat) -> tuple[Column, Column]:
    """S6 (/root/reference/src/tileid.rs:21-34): clamp + spherical
    mercator forward."""
    lon_c = F.greatest(F.lit(-180.0), F.least(F.lit(180.0), _c(lon)))
    lat_c = F.greatest(F.lit(-LAT_LIMIT), F.least(F.lit(LAT_LIMIT), _c(lat)))
    x = lon_c * F.lit(ORIGIN / 180.0)
    y = F.lit(RE) * F.log(F.tan(F.lit(math.pi * 0.25) + F.lit(0.5 * math.pi / 180.0) * lat_c))
    return x, y


def tile_mercator_bounds_cols(zoom, x, y) -> tuple[Column, Column, Column, Column]:
    """G2 (/root/reference/src/tileid.rs:67-82): tile → EPSG:3857 box."""
    ts = F.lit(CE) / zoom_scale(zoom)
    xmin = _c(x) * ts - F.lit(ORIGIN)
    ymax = F.lit(ORIGIN) - _c(y) * ts
    return xmin, ymax - ts, xmin + ts, ymax


def tile_geo_bounds_cols(zoom, x, y) -> tuple[Column, Column, Column, Column]:
    """G1 (/root/reference/src/tileid.rs:54-66): tile → lon/lat box;
    sinh spelled as (e^a - e^-a)/2 (no Spark sinh with codegen parity)."""
    z = zoom_scale(zoom)
    rad2deg = F.lit(180.0 / math.pi)

    def lat_of(yy):
        a = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (yy / z))
        return F.atan((F.exp(a) - F.exp(-a)) / F.lit(2.0)) * rad2deg

    return (
        _c(x) / z * 360.0 - 180.0,
        lat_of(_c(y) + 1.0),
        (_c(x) + 1.0) / z * 360.0 - 180.0,
        lat_of(_c(y).cast("double")),
    )


def tms_flip_col(zoom, y) -> Column:
    """S9 y-flip (/root/reference/src/mbtiles.rs:111-113)."""
    return zoom_scale(zoom).cast("long") - 1 - _c(y)


def cell_id_col(zoom, x, y) -> Column:
    """Pack (zoom, x, y) into one int64 cell id: zoom<<58 | x<<29 | y
    (29 bits each side fits zoom <= 24; the quadkey-style cell key used
    for spatial-join partitioning, J4)."""
    return (
        F.shiftleft(_c(zoom).cast("long"), 58)
        .bitwiseOR(F.shiftleft(_c(x), 29))
        .bitwiseOR(_c(y))
    )


def cell_parent_cols(x, y, levels_up: int = 2) -> tuple[Column, Column]:
    """Parent cell coordinates ``levels_up`` zooms above (quadkey
    ancestor; the salting key family for dense-zoom skew)."""
    return F.shiftright(_c(x), levels_up), F.shiftright(_c(y), levels_up)


def quadkey_id_col(zoom, x, y) -> Column:
    """The Bing/Azure quadkey as its sentinel-int bijection:
    4^zoom + Σ_{i<zoom} digit_i·4^i with digit_i = x_bit_i + 2·y_bit_i
    (digit i is the quadkey CHARACTER for bit level i, so low digits
    are the string's last characters; the leading 4^zoom preserves
    zoom — i.e. leading-zero digits — exactly as the string does).
    Pure JVM fold (F.aggregate over sequence), fits bigint to z ≤ 30.
    z = 0 is guarded: sequence(0, -1) would silently DESCEND."""
    z, xx, yy = _c(zoom).cast("int"), _c(x), _c(y)
    shl = lambda v, n: F.call_function("shiftleft", v, n)  # noqa: E731
    shr = lambda v, n: F.call_function("shiftrightunsigned", v, n)  # noqa: E731
    digits = F.when(z <= 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), z - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + shl(
                shr(xx, i).bitwiseAND(F.lit(1))
                + shl(shr(yy, i).bitwiseAND(F.lit(1)), F.lit(1)),
                i * 2,
            ),
        )
    )
    return shl(F.lit(1).cast("long"), z * 2) + digits


def quadkey_col(zoom, x, y) -> Column:
    """The Bing/Azure quadkey STRING of (zoom, x, y): zoom base-4
    digits, most significant bit level first; z=0 is the empty string
    (the world tile). digit_i = x_bit_i + 2·y_bit_i — the Bing docs'
    worked example (x=3, y=5, level=3) → '213' pins the convention.
    z = 0 is guarded: sequence(0, -1) would silently DESCEND."""
    z, xx, yy = _c(zoom).cast("int"), _c(x), _c(y)
    shl = lambda v, n: F.call_function("shiftleft", v, n)  # noqa: E731
    shr = lambda v, n: F.call_function("shiftrightunsigned", v, n)  # noqa: E731
    return F.when(z <= 0, F.lit("")).otherwise(
        F.aggregate(
            F.reverse(F.sequence(F.lit(0), z - 1)),
            F.lit(""),
            lambda acc, i: F.concat(
                acc,
                (
                    shr(xx, i).bitwiseAND(F.lit(1))
                    + shl(shr(yy, i).bitwiseAND(F.lit(1)), F.lit(1))
                ).cast("string"),
            ),
        )
    )
