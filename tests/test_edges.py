"""Edge cases: empty inputs, single image, schema stability — the
contracts a pipeline embedding this engine relies on."""

import pandas as pd

from rastertiler_rs_spark.fixtures import generate_images
from rastertiler_rs_spark.operators.overview import render_pyramid
from rastertiler_rs_spark.operators.render import render

FUSED_COLS = ["zoom", "x", "y", "tile_row", "tile_hash", "png"]


_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
           "caption string, phash long")


def _empty_images(spark):
    pdf = generate_images(1, "u8").to_pandas().iloc[0:0]
    return spark.createDataFrame(pdf, _SCHEMA)


def test_render_empty_input(spark):
    out = render(_empty_images(spark), 0, 5, 64, "u8")
    assert out.columns == FUSED_COLS
    assert out.count() == 0


def test_render_pyramid_empty_input(spark):
    out = render_pyramid(_empty_images(spark), 0, 9, 64, "u8", overview_below=8)
    assert out.columns == FUSED_COLS
    assert out.count() == 0


def test_render_single_image_all_paths(spark):
    df = spark.createDataFrame(generate_images(1, "u8").to_pandas())
    exact = render(df, 0, 9, 64, "u8").collect()
    assert len(exact) > 0
    keys = {(r["zoom"], r["x"], r["y"]) for r in exact}
    assert len(keys) == len(exact)
    # flip invariant: tile_row = 2^z - 1 - y for every row
    for r in exact:
        assert r["tile_row"] == (1 << r["zoom"]) - 1 - r["y"]


def test_supplied_footprints_respected(spark):
    """A table carrying its own minx/miny/maxx/maxy must be used as-is
    (the engine rule applies only to bare input_hint tables)."""
    import rastertiler_rs_spark.tilemath as tm

    pdf = generate_images(1, "u8").to_pandas()
    ts = tm.CE / (1 << 5)  # zoom-5 tile (16, 7)
    pdf["minx"] = 16 * ts - tm.ORIGIN + 0.1 * ts
    pdf["maxx"] = pdf["minx"] + 0.5 * ts
    pdf["maxy"] = tm.ORIGIN - 7 * ts - 0.1 * ts
    pdf["miny"] = pdf["maxy"] - 0.5 * ts
    out = render(spark.createDataFrame(pdf), 5, 5, 64, "u8").collect()
    assert {(r["zoom"], r["x"], r["y"]) for r in out} == {(5, 16, 7)}
