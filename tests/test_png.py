"""PNG codec roundtrip + reference-behavior tests.

Bit-depth selection table per /root/reference/src/png/colormap.rs:96-101
and README.md:84-89; tRNS layouts per grayscale.rs:41-42, rgb.rs:42-49,
color.rs:112-115; hex parse per color.rs:122-133.
"""

import numpy as np
import pytest

from rastertiler_rs_spark.png import (
    Colormap,
    decode_band,
    decode_png,
    decode_rgba,
    encode_grayscale8,
    encode_paletted,
    encode_rgb,
    rgb_from_u32,
    select_bit_depth,
)


def test_hex_parse():
    cm = Colormap.parse("1:#FF00FF", nodata=0)
    assert cm.colors == [0, 0, 0, 255, 0, 255]
    assert cm.values == {0: 0, 1: 1}


def test_colormap_get_indices_missing_is_zero():
    cm = Colormap.parse("1:#686868,2:#38A800,3:#859B6C", nodata=255)
    arr = np.array([[1, 2], [3, 99]], dtype=np.uint8)
    assert cm.get_indices(arr).tolist() == [[1, 2], [3, 0]]


@pytest.mark.parametrize("n,depth", [(1, 1), (2, 1), (3, 2), (4, 2), (5, 4), (16, 4), (17, 8), (256, 8)])
def test_bit_depth_selection(n, depth):
    assert select_bit_depth(n) == depth


def test_grayscale_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    png = encode_grayscale8(arr, nodata=0)
    d = decode_png(png)
    assert d["color_type"] == 0 and d["bit_depth"] == 8
    assert d["trns"] == b"\x00\x00"
    assert np.array_equal(d["pixels"], arr)


@pytest.mark.parametrize("ncolors", [1, 3, 9, 100])
def test_paletted_roundtrip(ncolors):
    cm = Colormap(nodata=0)
    for v in range(1, ncolors + 1):
        cm.add_color(v, (v % 256, (v * 7) % 256, (v * 13) % 256))
    rng = np.random.default_rng(ncolors)
    arr = rng.integers(0, ncolors + 1, (32, 48), dtype=np.uint8)  # non-multiple-of-8 width
    png = encode_paletted(arr, cm)
    d = decode_png(png)
    assert d["color_type"] == 3
    assert d["bit_depth"] == select_bit_depth(len(cm))
    assert d["trns"] == b"\x00"
    # decoded indices == colormap indices of the values
    assert np.array_equal(d["pixels"], cm.get_indices(arr))
    # palette reproduces the colors
    assert np.array_equal(d["palette"].ravel(), np.array(cm.colors, dtype=np.uint8))


def test_rgb_roundtrip_and_u32_unpack():
    values = np.array([[0xFF00FF, 0x123456], [0, 0xFFFFFF]], dtype=np.uint32)
    rgb = rgb_from_u32(values)
    assert rgb[0, 0].tolist() == [255, 0, 255]
    assert rgb[0, 1].tolist() == [0x12, 0x34, 0x56]
    png = encode_rgb(rgb, nodata_value=0)
    d = decode_png(png)
    assert d["color_type"] == 2
    assert d["trns"] == bytes([0, 0, 0, 0, 0, 0])
    assert np.array_equal(d["pixels"], rgb)


def test_decode_band_u8_and_u32():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_band(encode_grayscale8(arr, 0), "png;u8"), arr)
    vals = (np.arange(64, dtype=np.uint32) * 99991 % (1 << 24)).reshape(8, 8)
    png = encode_rgb(rgb_from_u32(vals), nodata_value=0)
    assert np.array_equal(decode_band(png, "png;u32"), vals)


def test_decode_rgba_transparency():
    arr = np.array([[5, 0], [7, 5]], dtype=np.uint8)
    rgba = decode_rgba(encode_grayscale8(arr, nodata=0))
    assert rgba[0, 1, 3] == 0 and rgba[0, 0, 3] == 255
    assert rgba[0, 0, 0] == 5


def test_adam7_interlaced_roundtrips():
    """Adam7 decode (+ the self-verification encoder): every pass
    geometry (odd sizes straddle pass boundaries), gray and RGB."""
    from rastertiler_rs_spark.png import encode_interlaced

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 7), (8, 8), (9, 9), (16, 13), (33, 40)]:
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        d = decode_png(encode_interlaced(arr, 8, 0))
        assert np.array_equal(d["pixels"], arr), (h, w)
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        d = decode_png(encode_interlaced(rgb, 8, 2))
        assert np.array_equal(d["pixels"], rgb), (h, w, "rgb")


def test_adam7_subbyte_depths():
    from rastertiler_rs_spark.png import encode_interlaced

    rng = np.random.default_rng(12)
    for depth in (1, 2, 4):
        arr = rng.integers(0, 1 << depth, (11, 19), dtype=np.uint8)
        plte = bytes(range(3 * (1 << depth)))
        d = decode_png(encode_interlaced(arr, depth, 3, plte=plte))
        assert d["bit_depth"] == depth
        assert np.array_equal(d["pixels"], arr), depth


def test_adam7_matches_noninterlaced_decode():
    """Same pixels through interlace 0 and Adam7 → identical decodes
    (and identical decode_rgba canvases with tRNS applied)."""
    from rastertiler_rs_spark.png import encode_interlaced

    arr = (np.arange(17 * 23, dtype=np.uint32) % 251).astype(
        np.uint8).reshape(17, 23)
    plain = decode_png(encode_grayscale8(arr, nodata=0))
    inter = decode_png(encode_interlaced(arr, 8, 0,
                                         trns=bytes([0, 0])))
    assert np.array_equal(plain["pixels"], inter["pixels"])


def test_bad_interlace_method_rejected():
    png = bytearray(encode_grayscale8(np.zeros((2, 2), np.uint8), 0))
    png[8 + 8 + 12] = 2                      # IHDR interlace byte
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(png))


def test_grayscale16_roundtrip_and_interlaced():
    from rastertiler_rs_spark.png import encode_grayscale16, encode_interlaced

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 65536, (13, 21), dtype=np.uint16)
    d = decode_png(encode_grayscale16(arr, nodata=0))
    assert d["bit_depth"] == 16 and d["pixels"].dtype == np.uint16
    assert np.array_equal(d["pixels"], arr)
    assert np.array_equal(decode_band(encode_grayscale16(arr, 0), "png;u16"), arr)
    # Adam7 + 16-bit together
    di = decode_png(encode_interlaced(arr, 16, 0))
    assert di["pixels"].dtype == np.uint16
    assert np.array_equal(di["pixels"], arr)
    # extremes survive the big-endian path
    ex = np.array([[0, 65535], [32768, 1]], dtype=np.uint16)
    assert np.array_equal(decode_png(encode_grayscale16(ex, 0))["pixels"], ex)
