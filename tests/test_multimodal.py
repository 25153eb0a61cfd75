"""Multimodal operators: feature extraction pinned exactly against a
numpy recomputation of the fixture pixel formula; the deterministic
fake-codec mode drives the jpeg/webp/video plumbing end-to-end while
the default mode stays an honest NotImplementedError stub."""

import zlib

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import images_parquet, pixel_band, NODATA
from rastertiler_rs_spark.operators.multimodal import (
    _fake_decode, frame_sample, image_features, resize_images)
from rastertiler_rs_spark.png import decode_png


def test_image_features_exact_u8(spark):
    images = spark.read.parquet(images_parquet(16, "u8"))
    got = {r["image_id"]: r.asDict() for r in image_features(images).collect()}
    assert len(got) == 16
    for i in range(16):
        w = [64, 128, 256, 512][i % 4]
        h = [64, 128, 192, 512][i % 4]
        band = pixel_band(i, w, h, "u8")
        vals = band[band != NODATA].astype(np.int64)
        r = got[f"img{i:08d}"]
        assert r["n_pixels"] == band.size
        assert r["n_data"] == vals.size
        if vals.size:
            assert (r["vmin"], r["vmax"], r["vsum"]) == (
                int(vals.min()), int(vals.max()), int(vals.sum()))
            assert r["mean_x100"] == int(vals.sum()) * 100 // vals.size
        else:  # the 1/8 all-nodata images: zeroed stats, not NaN/None
            assert (r["vmin"], r["vmax"], r["vsum"], r["mean_x100"]) == (0, 0, 0, 0)


def _jpeg_rows(spark, n=4):
    # webp: the remaining environment-blocked format driving the
    # fake-codec plumbing (jpeg decode is real now — jpeg/codec.py)
    rows = [(f"vid{i}", bytes(range(256)) * (i + 1), 48, 32, "webp")
            for i in range(n)]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")


def test_fake_codec_resize_and_features(spark):
    imgs = _jpeg_rows(spark)
    out = {r["image_id"]: bytes(r["bytes"])
           for r in resize_images(imgs, target=24, fake_codecs=True).collect()}
    assert set(out) == {f"vid{i}" for i in range(4)}
    for iid, png in out.items():
        band = decode_png(png)["pixels"]
        assert band.shape == (24, 24)
    # deterministic: a second run yields byte-identical output
    again = {r["image_id"]: bytes(r["bytes"])
             for r in resize_images(imgs, target=24, fake_codecs=True).collect()}
    assert again == out

    feats = {r["image_id"]: r.asDict()
             for r in image_features(imgs, fake_codecs=True).collect()}
    for i in range(4):
        payload = bytes(range(256)) * (i + 1)
        band = _fake_decode(payload, 48, 32)
        exp = band.astype(np.int64)
        r = feats[f"vid{i}"]
        assert r["n_pixels"] == 48 * 32 and r["n_data"] == 48 * 32  # fake has no 0s
        assert r["vsum"] == int(exp.sum())
        assert zlib.crc32(payload) & 0xFF == int(band[0, 0]) - 1


def test_default_stub_still_raises(spark):
    # webp default mode is REAL now (VP8L + VP8 keyframes): garbage
    # bytes fail the container parse rather than hitting a stub...
    imgs = _jpeg_rows(spark, 1)
    with pytest.raises(Exception, match="RIFF"):
        resize_images(imgs, target=8).collect()
    # ...REAL lossy VP8 decode works through the operator path...
    import struct

    from rastertiler_rs_spark.webp import encode_webp_lossy_gray

    lossy = encode_webp_lossy_gray(np.full((32, 48), 99, np.uint8), qi=0)
    lossy_df = spark.createDataFrame(
        [("v0", bytearray(lossy), 48, 32, "webp;vp8")],
        "image_id string, bytes binary, w int, h int, fmt string")
    feats = image_features(lossy_df).collect()[0]
    assert feats["vmin"] == feats["vmax"] == 99
    assert feats["n_data"] == 48 * 32
    # ...VP8X extended decodes for real now (ALPH alpha + lossy pixels)
    from rastertiler_rs_spark.webp import encode_webp_extended

    rgba = np.empty((32, 48, 4), np.uint8)
    rgba[:, :, :3] = 99
    rgba[:, :, 3] = 255
    ext = encode_webp_extended(rgba, qi=0, alpha_method="lossless")
    ext_df = spark.createDataFrame(
        [("x0", bytearray(ext), 48, 32, "webp")],
        "image_id string, bytes binary, w int, h int, fmt string")
    xf = image_features(ext_df).collect()[0]
    assert xf["vmin"] == xf["vmax"] == 99 and xf["n_data"] == 48 * 32
    # ...while a header-only VP8X file still fails loudly
    vp8x_payload = b"\x00" * 4 + (47).to_bytes(3, "little") + (31).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    hdr_only = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    hdr_df = spark.createDataFrame(
        [("x1", bytearray(hdr_only), 48, 32, "webp")],
        "image_id string, bytes binary, w int, h int, fmt string")
    with pytest.raises(Exception, match="no VP8/VP8L chunk"):
        resize_images(hdr_df, target=8).collect()
    with pytest.raises(Exception, match="not available"):
        frame_sample(imgs.selectExpr("image_id as video_id", "bytes", "fmt")).collect()


def test_frame_sample_fake_demuxer(spark):
    vids = spark.createDataFrame(
        [("v0", b"\x01" * 1024), ("v1", b"\x02" * 300)],
        "video_id string, bytes binary")
    rows = frame_sample(vids, every_n=2, fake_codecs=True).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    # v0: 1024//256 = 4 frames, every 2nd → frame_nos 0, 2
    assert sorted(r["frame_no"] for r in by_vid["v0"]) == [0, 2]
    # v1: 300//256 = 1 frame → frame_no 0
    assert [r["frame_no"] for r in by_vid["v1"]] == [0]
    for r in rows:  # every sampled frame is a decodable 16x16 PNG
        assert decode_png(bytes(r["frame_bytes"]))["pixels"].shape == (16, 16)


def test_wav_roundtrip_and_audio_features(spark):
    """WAV codec round-trip (encode→parse bit-exact) and integer audio
    features pinned against a numpy recomputation of the fixture
    formula."""
    from rastertiler_rs_spark.fixtures import (audio_params, audio_parquet,
                                               audio_samples)
    from rastertiler_rs_spark.operators.multimodal import (audio_features,
                                                           encode_wav,
                                                           parse_wav)

    for i in (0, 1, 5):
        rate, channels, _ = audio_params(i)
        s = audio_samples(i)
        d = parse_wav(encode_wav(s, rate, channels))
        assert d["sample_rate"] == rate and d["channels"] == channels
        assert np.array_equal(d["samples"], s)

    clips = spark.read.parquet(audio_parquet(8))
    got = {r["audio_id"]: r.asDict() for r in audio_features(clips).collect()}
    assert len(got) == 8
    for i in range(8):
        rate, channels, n_frames = audio_params(i)
        s = audio_samples(i).astype(np.int64)
        r = got[f"aud{i:08d}"]
        assert r["n_samples"] == s.size == n_frames * channels
        assert r["duration_ms"] == s.size * 1000 // (rate * channels)
        assert r["peak"] == int(np.abs(s).max())
        assert r["sum_sq"] == int((s * s).sum())


def test_audio_fake_codec_and_stub(spark):
    from rastertiler_rs_spark.operators.multimodal import audio_features

    clips = spark.createDataFrame(
        [("m0", b"\x00\x01\x02\x03\x04", "mp3")],
        "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="not available"):
        audio_features(clips).collect()
    r = audio_features(clips, fake_codecs=True).collect()[0]
    # 5 payload bytes → 2 int16 samples (trailing byte dropped)
    assert r["n_samples"] == 2 and r["sample_rate"] == 8000
    exp = np.frombuffer(b"\x00\x01\x02\x03", dtype=np.int16).astype(np.int64)
    assert r["sum_sq"] == int((exp * exp).sum())


def test_video_operators_animated_webp(spark):
    """Animated WebP through the video operator surface: probe fields
    and composed-RGBA-canvas frame stats both match the fixture's
    closed-form channel/duration formulas."""
    from rastertiler_rs_spark.fixtures import (webpanim_channel,
                                               webpanim_duration,
                                               webpanim_params,
                                               webpanim_parquet)
    from rastertiler_rs_spark.operators.multimodal import (
        video_frame_stats, video_probe)

    vids = spark.read.parquet(webpanim_parquet(6))
    probe = {r.video_id: r for r in video_probe(vids).collect()}
    assert len(probe) == 6
    for i in range(6):
        w, h, nf = webpanim_params(i)
        r = probe[f"wan{i:06d}"]
        assert (r.width, r.height, r.n_frames) == (w, h, nf)
        assert r.duration_ms == sum(webpanim_duration(i, f)
                                    for f in range(nf))
        assert r.codec == "webpanim"
    stats = video_frame_stats(vids, every_n=1).collect()
    assert len(stats) == sum(webpanim_params(i)[2] for i in range(6))
    for r in stats:
        i = int(r.video_id[3:])
        w, h, _ = webpanim_params(i)
        ch = [webpanim_channel(i, r.frame_no, c) for c in range(4)]
        assert (r.w, r.h, r.n_px) == (w, h, 4 * w * h)
        assert r.vsum == sum(ch) * w * h
        assert r.vmin == min(ch) and r.vmax == max(ch)
    # still WebP through video_probe fails loudly
    from rastertiler_rs_spark.webp import encode_webp_lossless

    still = encode_webp_lossless(np.full((4, 4, 4), 7, np.uint8))
    still_df = spark.createDataFrame(
        [("s0", bytearray(still), "webp")],
        "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="still WebP"):
        video_probe(still_df).collect()


def test_mode_resample_matches_bruteforce_and_tiebreak():
    """_mode_resample == per-cell brute-force majority with the exact
    tie/abstain/empty rules, incl. a crafted all-tie band."""
    import numpy as np

    from rastertiler_rs_spark.operators.multimodal import _mode_resample

    rng = np.random.default_rng(21)
    for h, w, t in [(64, 64, 32), (96, 80, 32), (65, 67, 16), (7, 9, 3)]:
        band = rng.integers(0, 6, (h, w)).astype(np.uint8)  # few values → ties
        got = _mode_resample(band, t, 0)
        r_dst = (np.arange(h) * t) // h
        c_dst = (np.arange(w) * t) // w
        want = np.zeros((t, t), np.uint8)
        for i in range(t):
            for j in range(t):
                vals = band[(r_dst == i)[:, None] & (c_dst == j)[None, :]]
                vals = vals[vals != 0]
                if vals.size:
                    uniq, cnt = np.unique(vals, return_counts=True)
                    want[i, j] = uniq[cnt == cnt.max()].min()
        assert np.array_equal(got, want), (h, w, t)
    # exact tie -> smallest value wins
    band = np.array([[3, 5], [5, 3]], np.uint8)
    assert _mode_resample(band, 1, 0)[0, 0] == 3
    # all-nodata cell stays nodata
    assert _mode_resample(np.zeros((4, 4), np.uint8), 2, 0).sum() == 0
    # upsampling fails fast
    import pytest

    with pytest.raises(ValueError, match="downsampling"):
        _mode_resample(band, 4, 0)


def test_average_resample_matches_bruteforce():
    """_average_resample == per-cell brute-force round-half-up mean of
    the valid members, incl. nodata exclusion and empty cells."""
    import numpy as np
    import pytest

    from rastertiler_rs_spark.operators.multimodal import \
        _average_resample

    rng = np.random.default_rng(57)
    for h, w, t in [(64, 64, 32), (96, 80, 32), (65, 67, 16), (7, 9, 3)]:
        band = rng.integers(0, 256, (h, w)).astype(np.uint8)
        band[rng.random((h, w)) < 0.15] = 0         # nodata holes
        got = _average_resample(band, t, 0)
        r_dst = (np.arange(h) * t) // h
        c_dst = (np.arange(w) * t) // w
        want = np.zeros((t, t), np.uint8)
        for i in range(t):
            for j in range(t):
                vals = band[(r_dst == i)[:, None] & (c_dst == j)[None, :]]
                vals = vals[vals != 0].astype(np.int64)
                if vals.size:
                    want[i, j] = (2 * vals.sum() + vals.size) // (2 * vals.size)
        assert np.array_equal(got, want), (h, w, t)
    # round-half-up: mean 2.5 -> 3
    band = np.array([[2, 3], [2, 3]], np.uint8)
    assert _average_resample(band, 1, 0)[0, 0] == 3
    # constant band is invariant
    const = np.full((13, 17), 77, np.uint8)
    assert (_average_resample(const, 4, 0) == 77).all()
    # all-nodata cell stays nodata; upsampling fails fast
    assert _average_resample(np.zeros((4, 4), np.uint8), 2, 0).sum() == 0
    with pytest.raises(ValueError, match="downsampling"):
        _average_resample(band, 4, 0)


def test_bilinear_resample_matches_bruteforce():
    """_bilinear_resample == per-pixel fraction-exact float brute force
    (denominators are powers of two times small ints — exact in
    float), incl. strict nodata propagation, up- AND downsampling,
    and edge replication."""
    from fractions import Fraction

    import numpy as np

    from rastertiler_rs_spark.operators.multimodal import \
        _bilinear_resample

    rng = np.random.default_rng(33)
    for h, w, t in [(64, 48, 32), (20, 20, 32), (7, 9, 5), (3, 3, 8)]:
        band = rng.integers(0, 256, (h, w)).astype(np.uint8)
        band[rng.random((h, w)) < 0.1] = 0          # nodata holes
        got = _bilinear_resample(band, t, 0)
        want = np.zeros((t, t), np.uint8)
        for i in range(t):
            for j in range(t):
                y = Fraction(2 * i + 1, 2) * Fraction(h, t) - Fraction(1, 2)
                x = Fraction(2 * j + 1, 2) * Fraction(w, t) - Fraction(1, 2)
                y0, x0 = y.__floor__(), x.__floor__()
                fy, fx = y - y0, x - x0
                rr0 = min(max(y0, 0), h - 1)
                rr1 = min(max(y0 + 1, 0), h - 1)
                cc0 = min(max(x0, 0), w - 1)
                cc1 = min(max(x0 + 1, 0), w - 1)
                corners = [int(band[rr0, cc0]), int(band[rr0, cc1]),
                           int(band[rr1, cc0]), int(band[rr1, cc1])]
                if 0 in corners:
                    continue
                v = (corners[0] * (1 - fy) * (1 - fx)
                     + corners[1] * (1 - fy) * fx
                     + corners[2] * fy * (1 - fx)
                     + corners[3] * fy * fx)
                want[i, j] = int((v + Fraction(1, 2)).__floor__())  # half-up
        assert np.array_equal(got, want), (h, w, t)
    # constant band is invariant at any scale (weights sum to 1)
    const = np.full((13, 17), 200, np.uint8)
    assert (_bilinear_resample(const, 32, 0) == 200).all()
    # 1:1 is the identity (fraction lands exactly on pixel centers)
    sq = rng.integers(1, 256, (16, 16)).astype(np.uint8)
    assert np.array_equal(_bilinear_resample(sq, 16, 0), sq)


def test_audio_resample_matches_bruteforce(spark):
    """audio_resample_stats == Fraction-exact per-sample brute force
    over the WAV fixture (up- and downsampling, both channel counts),
    and FLAC clips resample identically to their PCM content."""
    from fractions import Fraction

    import numpy as np

    from rastertiler_rs_spark.fixtures import (audio_params,
                                               audio_parquet,
                                               audio_samples)
    from rastertiler_rs_spark.operators.multimodal import \
        audio_resample_stats

    out_rate = 12000
    wavs = spark.read.parquet(audio_parquet(8))
    got = {(r.audio_id, r.channel): r
           for r in audio_resample_stats(wavs, out_rate).collect()}
    for i in range(8):
        rate, ch, nf = audio_params(i)
        inter = audio_samples(i).astype(np.int64) + 32768
        n_out = (nf * out_rate) // rate
        for c in range(ch):
            u = inter[c::ch]
            want = []
            for j in range(n_out):
                pos = Fraction(j * rate, out_rate)
                x0 = pos.__floor__()
                f = pos - x0
                x1 = min(x0 + 1, nf - 1)
                v = u[x0] * (1 - f) + u[x1] * f
                want.append(int((v + Fraction(1, 2)).__floor__()))
            w = np.array(want, dtype=np.int64)
            r = got[(f"aud{i:08d}", c)]
            assert r.n_out == n_out
            assert r.peak_u == int(w.max())
            assert r.sum_u == int(w.sum())
            assert r.pos_sum == int((w * (np.arange(n_out) + 1)).sum())


def test_image_ahash_bruteforce(spark):
    """aHash vs a scalar recomputation from decoded pixels (8x8 box
    means with the avg-resample rule, strict-> threshold); identical
    images hash identically and the popcount/position stats agree."""
    from rastertiler_rs_spark.fixtures import images_parquet
    from rastertiler_rs_spark.operators.multimodal import image_ahash
    from rastertiler_rs_spark.png import decode_band

    images = spark.read.parquet(images_parquet(16, "u8"))
    got = {r["image_id"]: (r["n_data"], r["vmin"], r["vmax"], r["vsum"],
                           r["mean_x100"], r["pos_sum"])
           for r in image_ahash(images).collect()}
    for row in images.collect():
        band = decode_band(bytes(row["bytes"]), row["fmt"]).astype(np.int64)
        h, w = band.shape
        cells = np.zeros((8, 8), dtype=np.int64)
        for br in range(8):
            for bc in range(8):
                rs = [r for r in range(h) if (r * 8) // h == br]
                cs = [c for c in range(w) if (c * 8) // w == bc]
                vals = band[np.ix_(rs, cs)].ravel()
                vals = vals[vals != 0]
                if vals.size:
                    cells[br, bc] = (2 * int(vals.sum()) + vals.size) \
                        // (2 * vals.size)
        total = int(cells.sum())
        m = (2 * total + 64) // 128
        bits = (cells > m).astype(np.int64).ravel()
        lo = sum(int(bits[i]) << i for i in range(32))
        hi = sum(int(bits[i + 32]) << i for i in range(32))
        want = (int(bits.sum()), lo, hi, m, total,
                int(sum(i * int(bits[i]) for i in range(64))))
        assert got[row["image_id"]] == want, row["image_id"]
