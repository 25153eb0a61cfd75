"""functions.columns (JVM column expressions) vs tilemath (numpy) —
bit-for-bit agreement on the reference unit vectors
(/root/reference/src/tileid.rs:148-281) and on a coordinate sweep."""

import math

import pytest
from pyspark.sql import functions as F

from rastertiler_rs_spark import tilemath as tm
from rastertiler_rs_spark.functions.columns import (
    cell_id_col, geo_to_mercator_cols, tile_geo_bounds_cols,
    tile_mercator_bounds_cols, tms_flip_col, zoom_scale)


def test_geo_to_mercator_reference_vectors(spark):
    # /root/reference/src/tileid.rs:156-169 incl. clamp cases
    pts = [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (-100.0, -20.0),
           (-200.0, 88.0), (150.31, 41.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    mx, my = geo_to_mercator_cols("lon", "lat")
    got = df.select("lon", "lat", mx.alias("mx"), my.alias("my")).collect()
    for r in got:
        ex, ey = tm.geo_to_mercator(r["lon"], r["lat"])
        assert r["mx"] == ex and abs(r["my"] - ey) < 1e-9, (r, ex, ey)


@pytest.mark.parametrize("zoom,x,y", [(0, 0, 0), (1, 1, 1), (10, 20, 30),
                                      (4, 3, 7), (14, 9999, 12345)])
def test_tile_bounds_match_tilemath(spark, zoom, x, y):
    df = spark.createDataFrame([(zoom, x, y)], "zoom int, x long, y long")
    m = tile_mercator_bounds_cols("zoom", "x", "y")
    g = tile_geo_bounds_cols("zoom", "x", "y")
    row = df.select(
        *[c.alias(f"m{i}") for i, c in enumerate(m)],
        *[c.alias(f"g{i}") for i, c in enumerate(g)],
        tms_flip_col("zoom", "y").alias("flip"),
        zoom_scale("zoom").alias("zs"),
        cell_id_col("zoom", "x", "y").alias("cid"),
    ).collect()[0]
    em = tm.tile_mercator_bounds(zoom, x, y)
    eg = tm.tile_geo_bounds(zoom, x, y)
    for i in range(4):
        assert row[f"m{i}"] == em[i], ("mercator", i, row[f"m{i}"], em[i])
        assert math.isclose(row[f"g{i}"], eg[i], rel_tol=0, abs_tol=1e-12)
    assert row["flip"] == tm.tms_flip_y(zoom, y)
    assert row["zs"] == float(1 << zoom)
    assert row["cid"] == tm.cell_id(zoom, x, y)
