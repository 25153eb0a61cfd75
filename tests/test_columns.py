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


# --- Bing/Azure quadkey (tile-id scheme family) ---

def _qk_py(zoom, x, y):
    return "".join(str(((x >> i) & 1) + 2 * ((y >> i) & 1))
                   for i in range(zoom - 1, -1, -1))


def test_quadkey_bing_worked_example(spark):
    # the Bing Maps tile-system docs' worked example: tile (3, 5)
    # at level 3 has quadkey "213"
    from rastertiler_rs_spark.functions.columns import (quadkey_col,
                                                        quadkey_id_col)
    df = spark.createDataFrame([(3, 3, 5)], "zoom int, x long, y long")
    row = df.select(quadkey_col("zoom", "x", "y").alias("qk"),
                    quadkey_id_col("zoom", "x", "y").alias("qid")
                    ).collect()[0]
    assert row["qk"] == "213"
    assert row["qid"] == (1 << 6) + int("213", 4)


def test_quadkey_properties(spark):
    from rastertiler_rs_spark.functions.columns import (quadkey_col,
                                                        quadkey_id_col)
    rows = [(z, x, y)
            for z in (0, 1, 2, 3, 7, 14)
            for x, y in [(0, 0), (1, 0), ((1 << z) - 1, (1 << z) - 1),
                         ((3 * (1 << z)) // 7, (5 * (1 << z)) // 11)]
            if x < (1 << z) and y < (1 << z)]
    df = spark.createDataFrame(sorted(set(rows)), "zoom int, x long, y long")
    got = df.select("zoom", "x", "y",
                    quadkey_col("zoom", "x", "y").alias("qk"),
                    quadkey_id_col("zoom", "x", "y").alias("qid")).collect()
    ids = {}
    for r in got:
        exp = _qk_py(r["zoom"], r["x"], r["y"])
        assert r["qk"] == exp, (r, exp)
        assert len(r["qk"]) == r["zoom"]
        # sentinel-int bijection: 4^z + the string read as base-4
        assert r["qid"] == (1 << (2 * r["zoom"])) + (
            int(exp, 4) if exp else 0)
        ids[(r["zoom"], r["x"], r["y"])] = (r["qk"], r["qid"])
    # parent's quadkey is the child's prefix (ancestor truncation)
    for (z, x, y), (qk, _) in ids.items():
        if z >= 1 and (z - 1, x >> 1, y >> 1) in ids:
            assert ids[(z - 1, x >> 1, y >> 1)][0] == qk[:-1]
    assert len({q for _, q in ids.values()}) == len(ids)  # injective
