"""WebP lossless (VP8L) codec tests: roundtrips, prefix-code edge
cases, Kraft repair under adversarial frequencies, subset-boundary
errors, and the probe across container variants."""

import struct

import numpy as np
import pytest

from rastertiler_rs_spark.webp import (
    decode_webp, encode_webp_lossless, probe_webp)
from rastertiler_rs_spark.webp.codec import (
    _BitReader, _BitWriter, _build_lengths, _canonical_codes, _read_code,
    _rev, _write_code)


def _roundtrip(img):
    data = encode_webp_lossless(img)
    out = decode_webp(data)
    np.testing.assert_array_equal(out, img)
    return data


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (1, 7), (9, 1), (8, 8), (13, 17), (40, 23)]:
        _roundtrip(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))


def test_roundtrip_degenerate_channels():
    # 1 distinct value per channel -> every prefix code is the 0-bit
    # simple form; the pixel stream is empty bits
    img = np.zeros((5, 4, 4), np.uint8)
    img[..., 0] = 7
    img[..., 3] = 255
    data = _roundtrip(img)
    assert len(data) < 60
    # 2 distinct values -> 1-bit simple codes
    img[2:, :, 0] = 250
    _roundtrip(img)


def test_roundtrip_skewed_histogram():
    # geometric-ish skew drives deep Huffman trees through the
    # clamp-and-repair path
    rng = np.random.default_rng(0)
    vals = np.clip(rng.geometric(0.35, size=64 * 64), 1, 255).astype(np.uint8)
    img = np.stack([vals.reshape(64, 64)] * 3
                   + [np.full((64, 64), 255, np.uint8)], -1)
    _roundtrip(img)


def test_alpha_hint():
    opaque = np.full((3, 3, 4), 9, np.uint8)
    opaque[..., 3] = 255
    assert probe_webp(encode_webp_lossless(opaque))["has_alpha"] is False
    opaque[1, 1, 3] = 7
    assert probe_webp(encode_webp_lossless(opaque))["has_alpha"] is True


def test_build_lengths_kraft_complete_adversarial():
    # fibonacci frequencies force unlimited-Huffman depths > 15
    freqs, a, b = {}, 1, 1
    for s in range(24):
        freqs[s] = a
        a, b = b, a + b
    lengths = _build_lengths(freqs)
    assert max(lengths) <= 15
    assert sum(1 << (15 - l) for l in lengths if l) == 1 << 15
    codes = _canonical_codes(lengths)
    assert len(codes) == 24
    # prefix-free: no code is a prefix of another
    bits = sorted(format(c, f"0{l}b") for c, l in codes.values())
    for x, y in zip(bits, bits[1:]):
        assert not y.startswith(x)


def test_code_roundtrip_through_bitstream():
    # write + re-read a full (non-simple) code standalone
    rng = np.random.default_rng(3)
    freqs = {s: int(f) for s, f in
             enumerate(rng.integers(1, 1000, size=100)) if f > 0}
    lengths = _build_lengths(freqs) + [0] * (256 - 100)
    w = _BitWriter()
    _write_code(w, lengths, 256)
    table = _read_code(_BitReader(w.done()), 256)
    recovered = [0] * 256
    for (l, _c), s in table.items():
        recovered[s] = l
    assert recovered == lengths


def test_corrupt_transform_bit_fails_loud():
    """Transforms are fully supported now; flipping the transform bit
    on a literal stream must fail the parse loudly, never mis-decode."""
    img = np.full((2, 2, 4), 3, np.uint8)
    data = bytearray(encode_webp_lossless(img))
    payload_off = data.index(b"VP8L") + 8 + 1
    bit = 14 + 14 + 1 + 3                # after dims, alpha hint, version
    data[payload_off + bit // 8] |= 1 << (bit % 8)
    with pytest.raises(ValueError):
        decode_webp(bytes(data))


def test_lossy_probe_decode_and_bad_container():
    # lossy VP8 is REAL now (webp/vp8.py): probe reads the frame tag,
    # decode reconstructs pixels (deep coverage in tests/test_vp8.py)
    from rastertiler_rs_spark.webp import encode_webp_lossy_gray

    lossy = encode_webp_lossy_gray(np.full((48, 64), 200, np.uint8), qi=0)
    assert probe_webp(lossy) == {"variant": "lossy", "width": 64,
                                 "height": 48, "has_alpha": False}
    assert np.all(decode_webp(lossy)[:, :, :3] == 200)
    with pytest.raises(ValueError, match="RIFF"):
        probe_webp(b"not a webp file at all")


def test_probe_vp8x_extended():
    vp8x = bytes([0x10, 0, 0, 0]) + (99).to_bytes(3, "little") \
        + (49).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert probe_webp(data) == {"variant": "extended", "width": 100,
                                "height": 50, "has_alpha": True,
                                "has_anim": False}
    # header-only file: decodable variant but no pixel chunk
    with pytest.raises(ValueError, match="no VP8/VP8L chunk"):
        decode_webp(data)


def test_truncated_stream_raises():
    img = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    data = encode_webp_lossless(img)
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(data[:-2])


def test_max_symbol_shortcut_decode():
    """The writer never uses the max_symbol shortcut; hand-build a code
    that does (simple alphabet: symbols 0..3 all length 2, transmitted
    as 4 literal CL symbols, capped by max_symbol=4) and check the
    reader honors the countdown."""
    w = _BitWriter()
    w.write(0, 1)                        # full code
    # CL code: only symbol "2" used -> degenerate 0-bit CL code.
    # _CLC_ORDER = [17, 18, 0, 1, 2, ...]; "2" sits at index 4
    w.write(5 - 4, 4)                    # num_code_lengths = 5
    for v in (0, 0, 0, 0, 1):            # lengths for 17,18,0,1,2
        w.write(v, 3)
    w.write(1, 1)                        # use max_symbol
    w.write(0, 3)                        # length_nbits = 2
    w.write(2, 2)                        # max_symbol = 2 + 2 = 4
    # 4 CL reads consume 0 bits each (degenerate) -> lengths 2,2,2,2
    table = _read_code(_BitReader(w.done()), 8)
    recovered = sorted((s, l) for (l, _c), s in table.items())
    assert recovered == [(0, 2), (1, 2), (2, 2), (3, 2)]


def test_real_webp_operator_path(spark):
    """image_features and resize_images run the REAL VP8L decode path
    (grey r=g=b round-trips through the luma conversion exactly)."""
    from rastertiler_rs_spark.fixtures import NODATA, pixel_band
    from rastertiler_rs_spark.operators.multimodal import (
        image_features, resize_images)
    from rastertiler_rs_spark.png import decode_png

    rows = []
    bands = {}
    for i in range(4):
        w, h = 24 + i * 8, 20 + i * 4
        band = pixel_band(i, w, h, "u8")
        rgba = np.stack([band] * 3 + [np.full((h, w), 255, np.uint8)], -1)
        rows.append((f"wbp{i}", encode_webp_lossless(rgba), w, h, "webp"))
        bands[f"wbp{i}"] = band
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")

    feats = {r["image_id"]: r.asDict() for r in image_features(df).collect()}
    for iid, band in bands.items():
        vals = band[band != NODATA].astype(np.int64)
        assert feats[iid]["n_pixels"] == band.size
        assert feats[iid]["vsum"] == int(vals.sum())

    out = {r["image_id"]: bytes(r["bytes"])
           for r in resize_images(df, target=10).collect()}
    for iid, band in bands.items():
        h, w = band.shape
        ri = np.minimum(((np.arange(10) + 0.5) * h / 10).astype(np.int64), h - 1)
        ci = np.minimum(((np.arange(10) + 0.5) * w / 10).astype(np.int64), w - 1)
        np.testing.assert_array_equal(
            decode_png(out[iid])["pixels"], band[ri[:, None], ci[None, :]])


def test_color_cache_decode():
    """The writer never emits a color cache; hand-build a 2-pixel
    stream where the second pixel is a cache hit of the first."""
    argb = (0x80 << 24) | (10 << 16) | (20 << 8) | 30   # a=128 r=10 g=20 b=30
    cache_bits = 4
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)

    # green alphabet: literal 20 and cache ref 280+idx; the cache
    # symbol is >= 256 so it cannot take the simple-code form — the
    # green code goes through the full code-length-coded path
    cache_sym = 280 + idx
    w2 = _BitWriter()
    w2.write(2 - 1, 14); w2.write(1 - 1, 14); w2.write(1, 1); w2.write(0, 3)
    w2.write(0, 1)
    w2.write(1, 1); w2.write(cache_bits, 4)
    w2.write(0, 1)
    g_len = [0] * (256 + 24 + (1 << cache_bits))
    g_len[20] = 1
    g_len[cache_sym] = 1
    _write_code(w2, g_len, len(g_len))   # full path (symbol >= 256)
    for val in (10, 30, 0x80):           # r, b, a single-symbol codes
        one = [0] * 256
        one[val] = 1
        _write_code(w2, one, 256)
    dist = [0] * 40
    dist[0] = 1
    _write_code(w2, dist, 40)
    g_codes = _canonical_codes(g_len)
    code, length = g_codes[20]
    w2.write(_rev(code, length), length)     # pixel 1: literal green=20
    code, length = g_codes[cache_sym]
    w2.write(_rev(code, length), length)     # pixel 2: cache hit

    payload = b"\x2f" + w2.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(data)
    assert out.shape == (1, 2, 4)
    np.testing.assert_array_equal(out[0, 0], [10, 20, 30, 0x80])
    np.testing.assert_array_equal(out[0, 1], [10, 20, 30, 0x80])


# ---------------------------------------------- full VP8L spec surface

def _imgs_for_full_surface():
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (21, 34, 4), dtype=np.uint8)
    stripes = np.zeros((24, 31, 4), np.uint8)      # vertical runs -> dist w
    stripes[:, :, 0] = (np.arange(31)[None, :] * 9) & 0xFF
    stripes[:, :, 1] = 200
    stripes[:, :, 3] = 255
    rle = np.repeat(rng.integers(0, 4, (16, 5, 4), dtype=np.uint8) * 60,
                    7, axis=1)[:, :31]             # horizontal runs -> dist 1
    return {"noisy": noisy, "stripes": stripes, "rle": rle}


@pytest.mark.parametrize("kwargs", [
    dict(cache_bits=4),
    dict(lz77="plain"),
    dict(lz77="2d"),
    dict(lz77="2d", cache_bits=6),
    dict(subtract_green=True),
    dict(subtract_green=True, lz77="plain", cache_bits=3),
], ids=lambda k: "+".join(f"{a}={v}" for a, v in k.items()))
def test_roundtrip_lz77_cache_subtract_green(kwargs):
    for img in _imgs_for_full_surface().values():
        _roundtrip_kw(img, **kwargs)


def _roundtrip_kw(img, **kwargs):
    data = encode_webp_lossless(img, **kwargs)
    out = decode_webp(data)
    np.testing.assert_array_equal(out, img)
    return data


def test_lz77_actually_compresses():
    rle = _imgs_for_full_surface()["rle"]
    plain = encode_webp_lossless(rle)
    lz = encode_webp_lossless(rle, lz77="2d")
    assert len(lz) < len(plain) * 0.6


@pytest.mark.parametrize("bits", [2, 3, 5])
def test_roundtrip_predictor_all_modes(bits):
    """Mode grid is (bx+by) % 14 — with enough blocks every spec
    predictor mode (0..13) runs, including the Select and the two
    clamped add/subtract forms, plus the edge rules."""
    for name, img in _imgs_for_full_surface().items():
        _roundtrip_kw(img, predictor_bits=bits)


def test_roundtrip_color_transform():
    for img in _imgs_for_full_surface().values():
        _roundtrip_kw(img, color_transform_bits=3)
        _roundtrip_kw(img, color_transform_bits=2, subtract_green=True)


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (3, 2), (11, 1),
                                                 (70, 0)])
def test_roundtrip_palette_bundling(n_colors, width_bits):
    rng = np.random.default_rng(n_colors)
    pal = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (13, 29))
    img = pal[idx]
    data = _roundtrip_kw(img, palette=True)
    # the packed width must shrink the stream for sub-byte bundling
    if width_bits >= 2:
        assert len(data) < 13 * 29 + 100


def test_roundtrip_meta_prefix_groups():
    for img in _imgs_for_full_surface().values():
        _roundtrip_kw(img, meta_bits=3)
        _roundtrip_kw(img, meta_bits=2, cache_bits=4, lz77="2d")


def test_roundtrip_stacked_transforms():
    """predictor -> color transform -> subtract-green in one stream:
    inverses must unwind in exact reverse order."""
    for img in _imgs_for_full_surface().values():
        _roundtrip_kw(img, predictor_bits=3, color_transform_bits=4,
                      subtract_green=True)
        _roundtrip_kw(img, predictor_bits=2, subtract_green=True,
                      lz77="plain", cache_bits=5, meta_bits=4)


def test_palette_over_256_colors_rejected():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_webp_lossless(img, palette=True)


def test_backref_guards():
    """Hand-build streams whose backrefs run before the image start /
    past the end: the decoder must fail loud."""
    from rastertiler_rs_spark.webp.codec import (_prefix_token,
                                                 _write_image)

    def stream(tokens_px, w_px, h, copy_at_start):
        w2 = _BitWriter()
        w2.write(w_px - 1, 14); w2.write(h - 1, 14); w2.write(0, 1)
        w2.write(0, 3); w2.write(0, 1)       # version, no transforms
        w2.write(0, 1); w2.write(0, 1)       # no cache, no meta
        g_len = [0] * 280
        g_len[5] = 1                          # literal green 5
        g_len[256] = 1                        # length code for value 1..
        _write_code(w2, g_len, 280)
        for val in (1, 2, 3):
            one = [0] * 256
            one[val] = 1
            _write_code(w2, one, 256)
        dist = [0] * 40
        dist[_prefix_token(1 + 120)[0]] = 1   # dist 1, plain coding
        _write_code(w2, dist, 40)
        g_codes = _canonical_codes(g_len)
        if copy_at_start:                     # copy as FIRST symbol
            code, ln = g_codes[256]
            w2.write(_rev(code, ln), ln)
        else:                                 # literal, then huge copy
            code, ln = g_codes[5]
            w2.write(_rev(code, ln), ln)
            code, ln = g_codes[256]
            w2.write(_rev(code, ln), ln)
        payload = b"\x2f" + w2.done()
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    with pytest.raises(ValueError, match="before image start|truncated"):
        decode_webp(stream(None, 4, 1, True))
    with pytest.raises(ValueError, match="overruns|truncated"):
        decode_webp(stream(None, 2, 1, False))


def test_decode_2d_distance_codes_near_neighborhood():
    """dist code 1 == pixel above, code 2 == pixel left (the first two
    entries of the spec's neighborhood map) — decode both from a
    hand-built stream and check against the map-free plain coding."""
    img = np.zeros((3, 4, 4), np.uint8)
    img[0] = [[10, 20, 30, 255]] * 4
    img[1] = img[0]                           # row copy: dist == width
    img[2] = img[0]
    d2 = encode_webp_lossless(img, lz77="2d")
    dplain = encode_webp_lossless(img, lz77="plain")
    np.testing.assert_array_equal(decode_webp(d2), img)
    np.testing.assert_array_equal(decode_webp(dplain), img)
    assert d2 != dplain                       # genuinely different coding


def test_roundtrip_webp_feature_matrix_property():
    """Hypothesis sweep: random tiny-to-small images x random feature
    combinations must round-trip bit-exactly. Deliberately includes
    1-2 px dims and meta grids with a single tile (the decoder derives
    the group count from the meta image's max code — the encoder must
    match, not assume its nominal n_groups)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 20), w=st.integers(1, 20), seed=st.integers(0, 2**32 - 1),
        flat=st.booleans(),                       # runs for lz77/cache to bite
        cache=st.sampled_from([0, 1, 4, 10]),
        lz=st.sampled_from([None, "plain", "2d"]),
        sg=st.booleans(),
        pred=st.sampled_from([None, 2, 4]),
        ct=st.sampled_from([None, 2, 5]),
        meta=st.sampled_from([None, 2, 6]),
    )
    def check(h, w, seed, flat, cache, lz, sg, pred, ct, meta):
        rng = np.random.default_rng(seed)
        if flat:
            img = np.repeat(rng.integers(0, 3, (h, 1, 4), dtype=np.uint8) * 90,
                            w, axis=1)
        else:
            img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        data = encode_webp_lossless(
            img, cache_bits=cache, lz77=lz, subtract_green=sg,
            predictor_bits=pred, color_transform_bits=ct, meta_bits=meta)
        np.testing.assert_array_equal(decode_webp(data), img)
        assert probe_webp(data)["width"] == w

    check()


def test_meta_single_tile_group_count():
    """Direct regression for the single-tile meta grid: 4x3 image with
    meta_bits=6 has one tile -> meta max code 0 -> exactly ONE code
    group on the wire."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    data = encode_webp_lossless(img, meta_bits=6)
    np.testing.assert_array_equal(decode_webp(data), img)


# ---------------------------------------------------------- VP8X extended
# Alpha (ALPH) plane, extended stills and animation — container-spec
# features layered over the VP8/VP8L pixel coders.

from rastertiler_rs_spark.webp.codec import (  # noqa: E402
    _alph_filter_fwd, _alph_filter_inv, _blend_rgba, _decode_alph,
    _encode_alph, encode_webp_anim, encode_webp_extended, webp_anim_frames)


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alph_filter_roundtrip(filt):
    rng = np.random.default_rng(7 + filt)
    for h, w in [(1, 1), (1, 9), (6, 1), (16, 16), (13, 31)]:
        alpha = rng.integers(0, 256, (h, w), dtype=np.uint8)
        deltas = _alph_filter_fwd(alpha, filt)
        np.testing.assert_array_equal(_alph_filter_inv(deltas, filt), alpha)


@pytest.mark.parametrize("method", ["raw", "lossless"])
@pytest.mark.parametrize("filt", [0, 3])
def test_alph_chunk_roundtrip(method, filt):
    rng = np.random.default_rng(11)
    alpha = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    payload = _encode_alph(alpha, method=method, filt=filt)
    np.testing.assert_array_equal(_decode_alph(payload, 20, 12), alpha)


@pytest.mark.parametrize("method", ["raw", "lossless"])
def test_vp8x_still_alpha_exact(method):
    rng = np.random.default_rng(3)
    rgba = np.empty((32, 48, 4), np.uint8)
    rgba[:, :, :3] = 96                      # solid color: bit-exact at qi=0
    rgba[:, :, 3] = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    data = encode_webp_extended(rgba, qi=0, alpha_method=method,
                                alpha_filter=2)
    meta = probe_webp(data)
    assert (meta["variant"], meta["has_alpha"]) == ("extended", True)
    out = decode_webp(data)
    np.testing.assert_array_equal(out, rgba)


def test_anim_roundtrip_compose_blend_dispose():
    rng = np.random.default_rng(5)
    f1 = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    f2 = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    f3 = rng.integers(0, 256, (2, 2, 4), dtype=np.uint8)
    data = encode_webp_anim(8, 8, [
        {"rgba": f1, "duration_ms": 40, "dispose": True},
        {"rgba": f2, "x": 2, "y": 4, "duration_ms": 50, "blend": True},
        {"rgba": f3, "x": 0, "y": 0, "duration_ms": 60},
    ], bg_rgba=(9, 8, 7, 6))
    frames = webp_anim_frames(data)
    assert [f["duration_ms"] for f in frames] == [40, 50, 60]
    np.testing.assert_array_equal(frames[0]["canvas"], f1)
    # frame 1 disposed to bg, then frame 2 BLENDS onto the bg window
    bg = np.zeros((8, 8, 4), np.uint8)
    bg[:] = np.array([9, 8, 7, 6], np.uint8)
    expect1 = bg.copy()
    expect1[4:8, 2:8] = _blend_rgba(bg[4:8, 2:8], f2)
    np.testing.assert_array_equal(frames[1]["canvas"], expect1)
    # frame 3 default blend=False OVERWRITES its window
    expect2 = expect1.copy()
    expect2[0:2, 0:2] = f3
    np.testing.assert_array_equal(frames[2]["canvas"], expect2)
    # decode_webp on an animation = first composed canvas (gif contract)
    np.testing.assert_array_equal(decode_webp(data), f1)
    meta = probe_webp(data)
    assert (meta["n_frames"], meta["duration_ms"]) == (3, 150)


def test_blend_rgba_identities():
    rng = np.random.default_rng(13)
    dst = rng.integers(0, 256, (5, 5, 4), dtype=np.uint8)
    src = dst.copy()
    src[:, :, 3] = 255                        # opaque src -> src wins
    out = _blend_rgba(dst, src)
    np.testing.assert_array_equal(out[:, :, :3], src[:, :, :3])
    src2 = rng.integers(0, 256, (5, 5, 4), dtype=np.uint8)
    src2[:, :, 3] = 0                         # transparent src -> dst
    out2 = _blend_rgba(dst, src2)
    np.testing.assert_array_equal(out2[:, :, :3] * (dst[:, :, 3:] > 0),
                                  dst[:, :, :3] * (dst[:, :, 3:] > 0))
    np.testing.assert_array_equal(out2[:, :, 3], dst[:, :, 3])


def test_anim_mux_validation():
    f = np.zeros((4, 4, 4), np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim(8, 8, [{"rgba": f, "x": 1, "duration_ms": 1}])
    with pytest.raises(ValueError, match="exceeds canvas"):
        encode_webp_anim(4, 4, [{"rgba": f, "x": 2, "duration_ms": 1}])
    with pytest.raises(ValueError, match="at least one"):
        encode_webp_anim(4, 4, [])


def test_vp8x_reserved_bits_raise():
    vp8x = bytes([0x80, 0, 0, 0]) + (3).to_bytes(3, "little") \
        + (3).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="reserved VP8X"):
        probe_webp(data)
