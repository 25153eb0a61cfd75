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


def test_rejects_malformed_streams():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg_gray(img, 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # relabel SOF0 as SOF2: dims still parse, but the
    # baseline scan header (Ss=0, Se=63) is illegal for progressive
    assert jpeg_dims(bytes(data)) == (8, 8, 1)
    with pytest.raises(ValueError, match="mixes DC and AC"):
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


# ------------------------------------------------- progressive (SOF2)

def test_progressive_decodes_bit_identical_to_baseline():
    """Progressive and baseline encode the SAME quantized coefficients
    (shared _quantize_zz), so their decodes must be bit-identical —
    any defect in the Annex-G scan coding (EOB runs, correction bits,
    successive approximation) breaks the equality."""
    from rastertiler_rs_spark.jpeg.codec import (
        encode_jpeg_gray_progressive, encode_jpeg_rgb_progressive)

    rng = np.random.default_rng(7)
    for (h, w) in [(8, 8), (16, 24), (17, 9), (40, 33), (7, 50)]:
        for q in (90, 75, 35):
            x = rng.integers(0, 256, (h, w), dtype=np.uint8)
            prog = encode_jpeg_gray_progressive(x, q)
            assert jpeg_dims(prog) == (w, h, 1)
            assert np.array_equal(decode_jpeg(prog),
                                  decode_jpeg(encode_jpeg_gray(x, q)))
    for (h, w) in [(16, 16), (25, 18)]:
        for q in (90, 50):
            x = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_rgb_progressive(x, q)),
                decode_jpeg(encode_jpeg_rgb(x, q)))


def test_progressive_solid_exact_and_eob_runs():
    """Solid images: every AC band is all-zero, so every block folds
    into multi-block EOB runs in BOTH first and refinement AC scans —
    and the decode must still be exactly the solid value (DC-only at
    q90 round-trips bit-exactly)."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_gray_progressive

    for v in (0, 1, 77, 128, 254, 255):
        x = np.full((24, 40), v, np.uint8)  # 15 blocks -> EOBRUN=15
        assert np.array_equal(decode_jpeg(encode_jpeg_gray_progressive(x, 90)), x)


def test_progressive_correction_bits_under_eob_runs():
    """One high-energy block followed by all-flat blocks: the hot
    block's history-nonzero coefficients owe correction bits that must
    ride the deferred EOB-run buffer in refinement scans; gradients
    straddle the Al thresholds so every refinement level flips bits."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_gray_progressive

    x = np.full((32, 64), 90, np.uint8)
    x[:8, :8] = (np.add.outer(np.arange(8) * 29, np.arange(8) * 17) % 256)
    x[10, 30] = 95  # a tiny lone coefficient in a mid-grid block
    for q in (90, 60, 30):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_gray_progressive(x, q)),
            decode_jpeg(encode_jpeg_gray(x, q)))


def test_progressive_through_multimodal_operators(spark):
    """Progressive payloads flow through the image operators
    transparently (decode_jpeg dispatches on SOF2)."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_gray_progressive
    from rastertiler_rs_spark.operators.multimodal import (image_features,
                                                           image_metadata)

    rows = []
    for i in range(3):
        band = pixel_band(i, 32, 24, "u8")
        rows.append((f"pjp{i}", encode_jpeg_gray_progressive(band, 95),
                     32, 24, "jpeg"))
    imgs = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    meta = {r["image_id"]: r.asDict() for r in image_metadata(imgs).collect()}
    assert all(m["dims_match"] and m["actual_w"] == 32 and m["actual_h"] == 24
               for m in meta.values())
    feats = {r["image_id"]: r.asDict() for r in image_features(imgs).collect()}
    for i in range(3):
        dec = decode_jpeg(bytes(rows[i][1])).astype(np.int64)
        vals = dec[dec != 0]
        f = feats[f"pjp{i}"]
        assert f["n_pixels"] == 32 * 24
        assert f["n_data"] == int(vals.size)
        assert f["vsum"] == int(vals.sum())


def test_restart_markers_roundtrip_bit_identical():
    """DRI/RSTn only re-frames the entropy stream (byte-align, predictor
    reset) — the quantized coefficients are identical, so a restart
    encode must DECODE bit-identically to the plain encode. Exercises
    the decoder resync path (and the _fill marker rewind it needs) at
    several interval lengths, gray and interleaved RGB."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_rgb

    rng = np.random.default_rng(4)
    band = rng.integers(0, 256, (41, 53), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(band, 75))
    for ri in (1, 3, 7):
        got = decode_jpeg(encode_jpeg_gray(band, 75, restart_interval=ri))
        assert np.array_equal(got, base), f"gray ri={ri}"
    rgb = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    base3 = decode_jpeg(encode_jpeg_rgb(rgb, 80))
    for ri in (2, 5):
        got3 = decode_jpeg(encode_jpeg_rgb(rgb, 80, restart_interval=ri))
        assert np.array_equal(got3, base3), f"rgb ri={ri}"


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Inject one before DHT/SOF in sequential, progressive, and
    jpeg_dims inputs — decode and probe must be unaffected."""
    from rastertiler_rs_spark.jpeg.codec import (
        encode_jpeg_gray_progressive, jpeg_dims)

    band = pixel_band(17, 40, 32, "u8").astype(np.uint8)
    seq = encode_jpeg_gray(band, 85)
    want = decode_jpeg(seq)
    filled = seq.replace(b"\xff\xc4", b"\xff\xff\xc4", 1)
    assert len(filled) == len(seq) + 1
    assert np.array_equal(decode_jpeg(filled), want)
    assert jpeg_dims(seq.replace(b"\xff\xc0", b"\xff\xff\xc0", 1)) == (40, 32, 1)

    prog = encode_jpeg_gray_progressive(band, 85)
    pfill = prog.replace(b"\xff\xc2", b"\xff\xff\xc2", 1)
    assert np.array_equal(decode_jpeg(pfill), want)
    assert jpeg_dims(pfill) == (40, 32, 1)


def test_progressive_scan_resync_restores_state():
    """Drive _progressive_scan directly with a hand-built two-interval
    DC-first segment (RST0 between): the resync must byte-align, reset
    the DC predictor, and continue decoding the second interval."""
    from rastertiler_rs_spark.jpeg.codec import (
        _BitWriter, _DC_L, _build_code_table, _build_decode_table,
        _magnitude, _progressive_scan)

    codes = _build_code_table(*_DC_L)
    huff = {(0, 0): _build_decode_table(*_DC_L)}

    def dc_bits(bw, diff):
        cat, bits = _magnitude(diff)
        code, length = codes[cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)

    # block grid 2x1, restart interval 1: block0 DC=5, then RST0,
    # block1 DC=-3 (diff from a RESET predictor, not from 5)
    b0 = _BitWriter()
    dc_bits(b0, 5)
    b0.flush()
    b1 = _BitWriter()
    dc_bits(b1, -3)
    b1.flush()
    seg = bytes(b0.out) + b"\xff\xd0" + bytes(b1.out)

    c = {"id": 1, "h": 1, "v": 1, "tq": 0, "td": 0, "ta": 0, "pred": 0,
         "nbx": 1, "nby": 2,
         "zz": np.zeros((2, 1, 64), dtype=np.int32)}
    _progressive_scan(seg, [c], 0, 0, 0, 1, huff, 1, 1, 2)
    assert c["zz"][0, 0, 0] == 5 << 1
    assert c["zz"][1, 0, 0] == -3 << 1  # pred was reset at the restart


def test_subsampled_encode_roundtrip():
    """4:2:2 / 4:2:0 encode (box-mean chroma downsample, Y 2x1 / 2x2
    sampling factors) exercises the decoder's replication-upsample path
    with REAL streams: exact dims at non-MCU-aligned sizes, PSNR floors,
    luma nearly unaffected by the chroma subsampling, and restart
    intervals must compose (bit-identical to the plain encode)."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_rgb, jpeg_dims

    yy, xx = np.mgrid[0:37, 0:46]
    rgb = np.stack([(yy * 3 + xx * 2) % 256, (yy * 2 + xx * 5) % 256,
                    (xx * 4) % 256], -1).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_rgb(rgb, 90))

    def psnr(a, b):
        mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255.0 ** 2 / mse) if mse else np.inf

    for s, floor in [("422", 28.0), ("420", 27.0)]:
        data = encode_jpeg_rgb(rgb, 90, sampling=s)
        assert jpeg_dims(data) == (46, 37, 3)
        dec = decode_jpeg(data)
        assert dec.shape == rgb.shape
        assert psnr(dec, rgb) > floor, s
        # luma carries full resolution: Y of the subsampled decode stays
        # close to the 4:4:4 decode's Y
        ys = (0.299 * dec[:, :, 0] + 0.587 * dec[:, :, 1]
              + 0.114 * dec[:, :, 2])
        yb = (0.299 * base[:, :, 0] + 0.587 * base[:, :, 1]
              + 0.114 * base[:, :, 2])
        assert np.abs(ys - yb).mean() < 4.0, s
        dec_r = decode_jpeg(encode_jpeg_rgb(rgb, 90, restart_interval=3,
                                            sampling=s))
        assert np.array_equal(dec_r, dec), s
    with pytest.raises(ValueError, match="sampling"):
        encode_jpeg_rgb(rgb, 90, sampling="411")


def test_subsampled_solid_exact_all_values():
    """Solid-GRAY color frames (Cb=Cr=128 exactly, box-mean identity)
    round-trip bit-exactly through 4:2:0 and 4:2:2 at q90 for every
    pixel value — the premise the video_pixels_mjpeg subsampled gate
    leg's closed-form twin relies on."""
    from rastertiler_rs_spark.jpeg.codec import encode_jpeg_rgb

    for v in range(0, 256, 1):
        rgb = np.full((12, 20, 3), v, np.uint8)
        for s in ("420", "422"):
            dec = decode_jpeg(encode_jpeg_rgb(rgb, 90, sampling=s))
            assert dec.shape == (12, 20, 3) and (dec == v).all(), (v, s)


def test_empty_band_still_wellformed():
    """A zero-area band yields a well-formed (header + EOI) stream
    whose dims parse back — regression: the restart refactor briefly
    turned this into a zero-step range() crash."""
    data = encode_jpeg_gray(np.zeros((0, 5), np.uint8), 90)
    assert jpeg_dims(data) == (5, 0, 1)
