"""PNG ↔ lossless-WebP tile transcode: the full circle
png → webp → png must be BYTE-identical (both encoders are
deterministic and the engine's own), for u8 and u32 payloads,
including nodata alpha carriage."""

import numpy as np
import pytest

from rastertiler_rs_spark.operators.transcode import (_canvas_to_rgba,
                                                      _rgba_to_canvas,
                                                      transcode_tiles)


@pytest.mark.parametrize("dtype_tag", ["u8", "u32"])
def test_canvas_rgba_mapping_roundtrip(dtype_tag):
    rng = np.random.default_rng(3)
    if dtype_tag == "u8":
        canvas = rng.integers(1, 256, (32, 32)).astype(np.uint8)
    else:
        canvas = rng.integers(1, 1 << 24, (32, 32)).astype(np.uint32)
    canvas[0, :5] = 0  # nodata pixels
    rgba = _canvas_to_rgba(canvas, dtype_tag, 0)
    assert (rgba[0, :5, 3] == 0).all() and (rgba[1:, :, 3] == 255).all()
    back = _rgba_to_canvas(rgba, dtype_tag, 0)
    np.testing.assert_array_equal(back, canvas)


@pytest.mark.parametrize("dtype_tag", ["u8", "u32"])
def test_png_webp_png_byte_identical(spark, dtype_tag):
    from rastertiler_rs_spark.fixtures import images_parquet
    from rastertiler_rs_spark.operators.render import render

    images = spark.read.parquet(images_parquet(16, dtype_tag))
    fused = render(images, 7, 8, tile_size=64, dtype_tag=dtype_tag)
    orig = {(r["zoom"], r["x"], r["y"]): bytes(r["png"])
            for r in fused.collect()}
    as_webp = transcode_tiles(fused, "webp", dtype_tag=dtype_tag)
    assert "webp" in as_webp.columns and "png" not in as_webp.columns
    back = transcode_tiles(as_webp, "png", dtype_tag=dtype_tag)
    got = {(r["zoom"], r["x"], r["y"]): bytes(r["png"])
           for r in back.collect()}
    assert got == orig and got
    # the webp payloads are real RIFF/WEBP containers
    for r in as_webp.collect():
        assert bytes(r["webp"])[:4] == b"RIFF"
        assert bytes(r["webp"])[8:12] == b"WEBP"


def test_transcode_validation(spark):
    df = spark.range(1).selectExpr("cast(null as binary) as png")
    with pytest.raises(ValueError, match="unsupported target"):
        transcode_tiles(df, "avif")
    with pytest.raises(ValueError, match="no 'webp' column"):
        transcode_tiles(df, "png")
