"""From-spec VP8 keyframe codec (webp/vp8.py): boolean-coder and
transform round-trips, the decoder == encoder-reconstruction exactness
contract at every quantizer, the qi=0 solid family pinned bit-exact
for all 256 grays (the gate leg's closed form), container dispatch,
and the documented family fail-fasts."""

import struct

import numpy as np
import pytest

from rastertiler_rs_spark.webp import (
    decode_webp, encode_webp_lossy, encode_webp_lossy_gray, probe_webp)
from rastertiler_rs_spark.webp import vp8
from rastertiler_rs_spark.webp.codec import _wrap_vp8_chunk


# ---------------------------------------------------------------- coder

def test_bool_coder_roundtrip_random():
    rng = np.random.RandomState(7)
    for _ in range(25):
        n = rng.randint(1, 600)
        bits = rng.randint(0, 2, n)
        probs = rng.randint(1, 256, n)
        e = vp8.BoolEncoder()
        for b, p in zip(bits, probs):
            e.put(int(b), int(p))
        d = vp8.BoolDecoder(e.flush())
        assert [d.get(int(p)) for p in probs] == list(bits)


def test_bool_coder_extreme_probs():
    # long runs at prob 1 and 255 exercise carry propagation
    for prob, bit in ((1, 1), (255, 0), (1, 0), (255, 1)):
        e = vp8.BoolEncoder()
        for _ in range(1000):
            e.put(bit, prob)
        d = vp8.BoolDecoder(e.flush())
        assert all(d.get(prob) == bit for _ in range(1000))


def test_literals_and_trees_roundtrip():
    e = vp8.BoolEncoder()
    e.put_literal(0x2A, 7)
    for sym in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        e.put_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, sym)
        e.put_tree(vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROB, sym)
    d = vp8.BoolDecoder(e.flush())
    assert d.get_literal(7) == 0x2A
    for sym in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        assert d.get_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB) == sym
        assert d.get_tree(vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROB) == sym


# ----------------------------------------------------------- transforms

def test_dct_adjoint_roundtrip_within_one():
    rng = np.random.RandomState(3)
    for _ in range(200):
        r = rng.randint(-255, 256, (4, 4))
        back = vp8.idct4x4(vp8.fdct4x4(r))
        assert np.abs(back - r).max() <= 1


def test_wht_roundtrip_and_constant_rule():
    rng = np.random.RandomState(4)
    for _ in range(100):
        d = rng.randint(-255, 256, (4, 4))
        assert np.abs(vp8.iwht4x4(vp8.fwht4x4(d)) - d).max() <= 1
    # docstring closed forms the gate leg relies on
    for r in (-100, -1, 0, 1, 77):
        c = vp8.fdct4x4(np.full((4, 4), r))
        assert c[0, 0] == 8 * r and np.count_nonzero(c) == (r != 0)
        h = vp8.fwht4x4(np.full((4, 4), r))
        assert h[0, 0] == 8 * r and np.count_nonzero(h) == (r != 0)


def test_dc_only_paths_exact():
    # the qi=0 solid family's exactness chain: constant residual ->
    # DC-only -> quantize/dequantize/iwht/idct reproduce it exactly
    qf = vp8.quant_factors(0)
    for r in range(-127, 128):
        # luma: residual r -> fdct DC 8r; DC rides Y2: wht(8r)=64r,
        # quantized by y2_dc=8 exactly, iwht back to 8r, idct to r
        y2 = vp8.fwht4x4(np.full((4, 4), 8 * r))
        lev = vp8.quantize_block(y2, qf["y2_dc"], qf["y2_ac"])
        sub = vp8.iwht4x4(vp8.dequantize_block(lev, qf["y2_dc"], qf["y2_ac"]))
        assert np.all(sub == 8 * r)
        blk = np.zeros((4, 4), np.int32)
        blk[0, 0] = 8 * r
        assert np.all(vp8.idct4x4(blk) == r)


# ------------------------------------------------------------ tokenizer

def test_tokenize_values_cover_all_categories():
    for v in list(range(-70, 71)) + [100, -500, 1000, 2047, -2114]:
        lev = np.zeros((4, 4), np.int32)
        lev[0, 0] = v
        toks = vp8.tokenize_block(lev, 0)
        tok, extra, sign = toks[0]
        base = vp8.CAT_BASE.get(tok, abs(v))
        assert base + extra == abs(v)
        assert sign == (1 if v < 0 else 0)
        if v != 0:
            assert toks[-1] == (vp8.T_EOB, 0, 0)


def test_tokenize_last_position_has_no_eob():
    lev = np.zeros((4, 4), np.int32)
    lev.flat[vp8.ZIGZAG[15]] = 3  # nonzero in the final zigzag slot
    toks = vp8.tokenize_block(lev, 0)
    assert toks[-1][0] != vp8.T_EOB  # §13.3: position 16 ends the block


# ------------------------------------------------------------ full frame

def test_solid_frames_bit_exact_at_qi0_all_256():
    for g in range(256):
        y = np.full((16, 16), g, np.uint8)
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, qi=0))
        assert np.all(out["y"] == g), g
        assert np.all(out["u"] == 128) and np.all(out["v"] == 128)


def test_decoder_matches_encoder_reconstruction_every_qi():
    rng = np.random.RandomState(11)
    for qi in (0, 7, 31, 63, 101, 127):
        y = rng.randint(0, 256, (48, 80)).astype(np.uint8)
        u = rng.randint(0, 256, (24, 40)).astype(np.uint8)
        v = rng.randint(0, 256, (24, 40)).astype(np.uint8)
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, u, v, qi=qi))
        mbs, ry = vp8._encode_mb_plan(
            vp8._pad_plane(y, 16), vp8._pad_plane(u, 8),
            vp8._pad_plane(v, 8), qi)
        assert np.array_equal(out["y"], ry[:48, :80].astype(np.uint8)), qi
        assert out["qi"] == qi


def test_quality_monotone_on_smooth_image():
    yy, xx = np.mgrid[0:64, 0:64]
    y = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    psnrs = []
    for qi in (0, 40, 110):
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, qi=qi))
        mse = float(np.mean((out["y"].astype(float) - y) ** 2))
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-12)))
    assert psnrs[0] > 40.0          # near-lossless at the finest step
    assert psnrs[0] > psnrs[1] > psnrs[2]


def test_odd_dims_pad_and_crop():
    rng = np.random.RandomState(5)
    for (h, w) in ((1, 1), (17, 33), (16, 31), (15, 16)):
        y = rng.randint(0, 256, (h, w)).astype(np.uint8)
        out = vp8.decode_vp8_frame(vp8.encode_vp8_frame(y, qi=0))
        assert out["y"].shape == (h, w)
        assert out["u"].shape == ((h + 1) // 2, (w + 1) // 2)


def test_validation_errors():
    with pytest.raises(ValueError, match="qi"):
        vp8.encode_vp8_frame(np.zeros((16, 16), np.uint8), qi=200)
    with pytest.raises(ValueError, match="14 bits"):
        vp8.encode_vp8_frame(np.zeros((16, 20000), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        vp8.decode_vp8_frame(b"\x00\x00")
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8_frame(b"\x00" * 10)


def test_family_fail_fasts():
    good = vp8.encode_vp8_frame(np.full((16, 16), 9, np.uint8), qi=0)
    # interframe tag (bit 0 set) -> keyframe-only decoder refuses
    inter = bytes([good[0] | 1]) + good[1:]
    with pytest.raises(NotImplementedError, match="interframe"):
        vp8.decode_vp8_frame(inter)


# ------------------------------------------------------------ container

def test_container_roundtrip_and_probe():
    g = np.full((24, 40), 130, np.uint8)
    data = encode_webp_lossy_gray(g, qi=0)
    assert probe_webp(data) == {"variant": "lossy", "width": 40,
                                "height": 24, "has_alpha": False}
    rgba = decode_webp(data)
    assert rgba.shape == (24, 40, 4)
    assert np.all(rgba[:, :, :3] == 130) and np.all(rgba[:, :, 3] == 255)


def test_container_color_path_gray_content_near_lossless():
    # grayscale content through the RGBA color path: chroma stays flat
    # 128 exactly, luma is within the qi=0 AC-quantization bound (±1 —
    # step 4 rounding through the transform pair; only CONSTANT blocks
    # are bit-exact, which is why the gate family is solids)
    yy, xx = np.mgrid[0:32, 0:32]
    band = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    rgba = np.dstack([band, band, band,
                      np.full((32, 32), 255, np.uint8)])
    out = decode_webp(encode_webp_lossy(rgba, qi=0))
    for c in range(3):
        assert np.abs(out[:, :, c].astype(int) - band.astype(int)).max() <= 1


def test_container_smooth_color_psnr():
    yy, xx = np.mgrid[0:64, 0:64]
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[:, :, 0] = np.clip(yy * 4, 0, 255)
    rgba[:, :, 1] = np.clip(xx * 4, 0, 255)
    rgba[:, :, 2] = 100
    rgba[:, :, 3] = 255
    out = decode_webp(encode_webp_lossy(rgba, qi=0))
    mse = float(np.mean((out[:, :, :3].astype(float)
                         - rgba[:, :, :3].astype(float)) ** 2))
    assert 10 * np.log10(255 ** 2 / mse) > 38.0


def test_container_odd_payload_padded():
    # RIFF chunks are word-aligned; force an odd-length frame
    for g in range(40, 60):
        data = encode_webp_lossy_gray(np.full((16, 16), g, np.uint8), qi=0)
        frame_len = struct.unpack_from("<I", data, 16)[0]
        if frame_len & 1:
            assert len(data) % 2 == 0
            assert np.all(decode_webp(data)[:, :, 0] == g)
            break
    else:
        pytest.skip("no odd-length frame found in range")


def test_vp8x_still_header_only_raises():
    payload = b"\x00" * 4 + (15).to_bytes(3, "little") + (15).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert probe_webp(data)["variant"] == "extended"
    with pytest.raises(ValueError, match="no VP8/VP8L chunk"):
        decode_webp(data)


def test_wrap_matches_probe_dims():
    frame = vp8.encode_vp8_frame(np.zeros((30, 50), np.uint8), qi=0)
    meta = probe_webp(_wrap_vp8_chunk(frame))
    assert (meta["width"], meta["height"]) == (50, 30)
