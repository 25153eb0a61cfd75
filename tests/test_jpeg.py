"""From-spec baseline JPEG codec (jpeg/codec.py): exactness where JPEG
is exact (dims, metadata, DC-only images), PSNR where it is lossy, and
the multimodal operators' real-jpeg path end-to-end."""

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import pixel_band
from rastertiler_rs_spark.jpeg import (decode_jpeg, encode_jpeg_gray,
                                       encode_jpeg_rgb, jpeg_dims)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_solid_blocks_exact():
    """A solid image is DC-only; the roundtrip must be bit-exact for
    any value whose level-shifted DC survives quantization (q=90 ⇒
    DC quant step small enough for all of these)."""
    for v in (0, 1, 64, 128, 130, 200, 255):
        img = np.full((40, 56), v, np.uint8)
        out = decode_jpeg(encode_jpeg_gray(img, 90))
        assert out.shape == img.shape
        assert int(np.abs(out.astype(int) - int(v)).max()) <= 1


def test_gray_roundtrip_psnr_and_dims():
    img = (np.add.outer(np.arange(61) * 3, np.arange(45) * 2) % 256).astype(np.uint8)
    for q, floor in ((95, 55), (90, 48), (75, 40)):
        out = decode_jpeg(encode_jpeg_gray(img, q))
        assert out.shape == img.shape  # non-multiple-of-8 dims preserved
        assert _psnr(img, out) > floor, q
    assert jpeg_dims(encode_jpeg_gray(img, 90)) == (45, 61, 1)


def test_rgb_roundtrip():
    base = (np.add.outer(np.arange(48) * 5, np.arange(40) * 3) % 256).astype(np.uint8)
    rgb = np.stack([base, base[::-1], (base // 2 + 64).astype(np.uint8)], axis=-1)
    out = decode_jpeg(encode_jpeg_rgb(rgb, 95))
    assert out.shape == rgb.shape
    # chroma quantization (Annex K.2 table) caps color fidelity lower
    # than luma-only — 38 dB is the q95 plateau for this pattern
    assert _psnr(rgb, out) > 38
    assert jpeg_dims(encode_jpeg_rgb(rgb, 95)) == (40, 48, 3)


def test_decode_is_deterministic():
    img = pixel_band(5, 64, 64, "u8")
    data = encode_jpeg_gray(img, 92)
    a = decode_jpeg(data)
    b = decode_jpeg(data)
    assert np.array_equal(a, b)


def test_rejects_non_baseline():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg_gray(img, 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_dims(bytes(data))
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")


def test_multimodal_real_jpeg_path(spark):
    """image_metadata / resize_images / image_features over real JPEG
    payloads — no fake_codecs flag anywhere."""
    from rastertiler_rs_spark.operators.multimodal import (image_features,
                                                           image_metadata,
                                                           resize_images)
    from rastertiler_rs_spark.png import decode_png

    rows = []
    for i in range(4):
        band = pixel_band(i, 48, 32, "u8")
        rows.append((f"jpg{i}", encode_jpeg_gray(band, 95), 48, 32, "jpeg"))
    imgs = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")

    meta = {r["image_id"]: r.asDict() for r in image_metadata(imgs).collect()}
    assert all(m["dims_match"] and m["actual_w"] == 48 and m["actual_h"] == 32
               for m in meta.values())

    res = {r["image_id"]: bytes(r["bytes"])
           for r in resize_images(imgs, target=16).collect()}
    for i in range(4):
        got = decode_png(res[f"jpg{i}"])["pixels"]
        assert got.shape == (16, 16)
        # resize of the decoded jpeg == numpy resize of an offline decode
        dec = decode_jpeg(bytes(rows[i][1]))
        ri = np.minimum(((np.arange(16) + 0.5) * 32 / 16).astype(np.int64), 31)
        ci = np.minimum(((np.arange(16) + 0.5) * 48 / 16).astype(np.int64), 47)
        assert np.array_equal(got, dec[ri[:, None], ci[None, :]])

    feats = {r["image_id"]: r.asDict() for r in image_features(imgs).collect()}
    for i in range(4):
        dec = decode_jpeg(bytes(rows[i][1])).astype(np.int64)
        vals = dec[dec != 0]
        f = feats[f"jpg{i}"]
        assert f["n_pixels"] == 48 * 32
        assert f["n_data"] == int(vals.size)
        assert f["vsum"] == int(vals.sum())
