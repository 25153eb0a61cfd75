"""APNG codec (png/apng.py): encode→decode round-trips are exact by
construction (PNG is lossless), so placement/blend/dispose arithmetic
is pinned against independently composed numpy canvases."""

import numpy as np
import pytest

from rastertiler_rs_spark.png import (apng_frames, decode_rgba,
                                      encode_apng, encode_rgba,
                                      probe_apng)


def rand_rgba(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 4)).astype(np.uint8)


def test_rgba_still_roundtrip():
    rng = np.random.default_rng(0)
    px = rand_rgba(rng, 13, 17)
    assert np.array_equal(decode_rgba(encode_rgba(px)), px)


def test_full_frame_roundtrip_and_probe():
    rng = np.random.default_rng(1)
    frames = [{"rgba": rand_rgba(rng, 9, 14), "duration_ms": 30 + i}
              for i in range(4)]
    blob = encode_apng(14, 9, frames, num_plays=3)
    got = apng_frames(blob)
    assert len(got) == 4
    for f, g in zip(frames, got):
        assert np.array_equal(g["canvas"], f["rgba"])  # blend=source
        assert g["duration_ms"] == f["duration_ms"]
    p = probe_apng(blob)
    assert (p["width"], p["height"], p["n_frames"], p["num_plays"]) == \
        (14, 9, 4, 3)
    assert p["duration_ms"] == sum(30 + i for i in range(4))


def test_subrect_placement_and_dispose():
    rng = np.random.default_rng(2)
    base = rand_rgba(rng, 8, 8)
    sub = rand_rgba(rng, 3, 4)
    for dispose, expect_after in (
            (0, "keep"), (1, "clear"), (2, "restore")):
        frames = [
            {"rgba": base},
            {"rgba": sub, "x": 2, "y": 3, "dispose": dispose},
            {"rgba": rand_rgba(rng, 1, 1), "x": 0, "y": 0},
        ]
        got = apng_frames(encode_apng(8, 8, frames))
        want1 = base.copy()
        want1[3:6, 2:6] = sub
        assert np.array_equal(got[1]["canvas"], want1)
        after = got[2]["canvas"][3:6, 2:6]
        if expect_after == "keep":
            assert np.array_equal(after, sub)
        elif expect_after == "clear":
            assert not after.any()
        else:
            assert np.array_equal(after, base[3:6, 2:6])


def test_blend_over_matches_webp_blend():
    # blend=1 must equal the engine's shared integer over-compositing
    from rastertiler_rs_spark.webp.codec import _blend_rgba

    rng = np.random.default_rng(3)
    base = rand_rgba(rng, 6, 6)
    top = rand_rgba(rng, 6, 6)
    got = apng_frames(encode_apng(
        6, 6, [{"rgba": base}, {"rgba": top, "blend": 1}]))
    assert np.array_equal(got[1]["canvas"], _blend_rgba(base, top))
    # alpha extremes: opaque overwrites, transparent leaves dst
    top2 = top.copy()
    top2[:3, :, 3] = 255
    top2[3:, :, 3] = 0
    got2 = apng_frames(encode_apng(
        6, 6, [{"rgba": base}, {"rgba": top2, "blend": 1}]))
    assert np.array_equal(got2[1]["canvas"][:3, :, :3], top2[:3, :, :3])
    assert np.array_equal(got2[1]["canvas"][3:], base[3:])


def test_dispose_previous_on_frame0_is_background():
    rng = np.random.default_rng(4)
    base = rand_rgba(rng, 4, 4)
    nxt = rand_rgba(rng, 1, 1)
    got = apng_frames(encode_apng(4, 4, [
        {"rgba": base, "dispose": 2},
        {"rgba": nxt, "x": 3, "y": 3},
    ]))
    # spec: dispose-previous on frame 0 behaves as dispose-background
    assert not got[1]["canvas"][:3].any()
    assert np.array_equal(got[1]["canvas"][3, 3], nxt[0, 0])


def test_validation_failfasts():
    rng = np.random.default_rng(5)
    full = rand_rgba(rng, 4, 4)
    with pytest.raises(ValueError, match="full canvas"):
        encode_apng(4, 4, [{"rgba": full[:2]}])
    with pytest.raises(ValueError, match="exceeds canvas"):
        encode_apng(4, 4, [{"rgba": full},
                           {"rgba": full, "x": 1}])
    blob = bytearray(encode_apng(4, 4, [{"rgba": full}] * 2))
    # corrupt the fdAT sequence number → ordered-sequence fail-fast
    idx = blob.find(b"fdAT")
    blob[idx + 4:idx + 8] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="sequence"):
        apng_frames(bytes(blob))
    # a plain PNG is not an APNG
    with pytest.raises(ValueError, match="acTL"):
        probe_apng(encode_rgba(full))


def test_operator_paths(spark):
    from rastertiler_rs_spark.fixtures import (apng_channel,
                                               apng_duration,
                                               apng_params,
                                               apng_parquet)
    from rastertiler_rs_spark.operators.multimodal import (
        video_frame_stats, video_probe)

    vids = spark.read.parquet(apng_parquet(6))
    probed = {r.video_id: r for r in video_probe(vids).collect()}
    stats = {(r.video_id, r.frame_no): r
             for r in video_frame_stats(vids).collect()}
    for i in range(6):
        w, h, nf = apng_params(i)
        vid = f"apg{i:06d}"
        p = probed[vid]
        assert (p.width, p.height, p.n_frames, p.codec) == \
            (w, h, nf, "apng")
        assert p.duration_ms == sum(apng_duration(i, f)
                                    for f in range(nf))
        for f in range(nf):
            s = stats[(vid, f)]
            chans = [apng_channel(i, f, c) for c in range(4)]
            assert s.n_px == 4 * w * h
            assert s.vsum == sum(chans) * w * h
            assert s.vmin == min(chans)
            assert s.vmax == max(chans)
