"""From-spec GIF89a codec + operator integration.

Pins the LZW coder across its tricky regions (12-bit width growth,
clear-code resets at 4096, KwKwK runs), interlace row order, animation
composition (sub-rects, transparency, disposal 2), stream-walk
robustness, and the video/image operator branches over the
deterministic fixture family.
"""

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import (generate_gif_videos,
                                           gif_frame_delay,
                                           gif_frame_index, gif_palette,
                                           gif_params, gif_videos_parquet)
from rastertiler_rs_spark.gif import (decode_gif, encode_gif, gif_frames,
                                      gif_probe)

PAL256 = np.stack([np.arange(256), (np.arange(256) * 3) % 256,
                   (np.arange(256) * 7) % 256], axis=1).astype(np.uint8)
PAL3 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)


def test_roundtrip_noise_full_width():
    """256-color noise forces code width to grow to 12 bits and the
    dictionary through multiple clear-code resets."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    g = encode_gif([idx], PAL256)
    assert (gif_frames(g)[0]["indices"] == idx).all()
    assert (decode_gif(g)[0] == PAL256[idx]).all()


def test_roundtrip_runs_kwkwk():
    """Long runs of repeats drive the decoder's code==next_code case."""
    idx = np.tile(np.array([1, 1, 1, 1, 2, 2, 2, 2, 1], np.uint8),
                  200).reshape(60, 30)
    g = encode_gif([idx], PAL3)
    assert (gif_frames(g)[0]["indices"] == idx).all()


def test_roundtrip_single_color():
    """Degenerate all-one-index image (pure KwKwK chain)."""
    idx = np.full((64, 64), 1, np.uint8)
    g = encode_gif([idx], PAL3)
    assert (gif_frames(g)[0]["indices"] == idx).all()


def test_interlace_roundtrip():
    idx = (np.arange(33 * 21, dtype=np.int64).reshape(33, 21) % 3
           ).astype(np.uint8)
    g = encode_gif([idx], PAL3, interlace=True)
    assert (gif_frames(g)[0]["indices"] == idx).all()


def test_probe_fields():
    frames = [{"indices": np.zeros((5, 9), np.uint8), "delay_cs": 3},
              {"indices": np.zeros((5, 9), np.uint8), "delay_cs": 4}]
    g = encode_gif(frames, PAL3, loop=5)
    m = gif_probe(g)
    assert m["width"] == 9 and m["height"] == 5
    assert m["n_frames"] == 2 and m["duration_cs"] == 7
    assert m["loop"] == 5 and m["version"] == "89a"
    assert m["gct_size"] == 4  # 3-entry palette pads to the next power


def test_gif87a_accepted():
    g = bytearray(encode_gif([np.zeros((4, 4), np.uint8)], PAL3))
    g[3:6] = b"87a"
    assert gif_probe(bytes(g))["version"] == "87a"


def test_composition_disposal_transparency():
    f0 = {"indices": np.full((10, 10), 1, np.uint8)}
    f1 = {"indices": np.full((4, 4), 2, np.uint8), "left": 3, "top": 2,
          "transparent": 0, "disposal": 2}
    f2 = {"indices": np.full((2, 2), 0, np.uint8)}
    c0, c1, c2 = decode_gif(encode_gif([f0, f1, f2], PAL3))
    assert (c0 == PAL3[1]).all()
    assert (c1[2:6, 3:7] == PAL3[2]).all() and (c1[0, 0] == PAL3[1]).all()
    assert (c2[2:6, 3:7] == 0).all()          # disposal 2 restored rect
    assert (c2[0:2, 0:2] == PAL3[0]).all()    # frame 2 painted
    assert (c2[8, 8] == PAL3[1]).all()        # untouched canvas kept


def test_transparent_pixels_keep_canvas():
    base = {"indices": np.full((6, 6), 1, np.uint8)}
    over = np.full((6, 6), 2, np.uint8)
    over[::2] = 0
    c = decode_gif(encode_gif(
        [base, {"indices": over, "transparent": 0}], PAL3))[1]
    assert (c[::2] == PAL3[1]).all() and (c[1::2] == PAL3[2]).all()


def test_corrupt_streams_raise():
    g = bytearray(encode_gif([np.zeros((8, 8), np.uint8)], PAL3))
    with pytest.raises(ValueError):
        gif_probe(b"NOTGIF" + bytes(g[6:]))
    # truncating the image data mid-stream must not decode cleanly
    with pytest.raises(ValueError):
        bad = bytes(g[:20]) + b"\x00" + bytes(g[-1:])
        gif_frames(bad)


def test_encode_validation():
    with pytest.raises(ValueError):
        encode_gif([], PAL3)
    with pytest.raises(ValueError):
        encode_gif([np.full((2, 2), 9, np.uint8)], PAL3)  # index > palette
    with pytest.raises(ValueError):
        encode_gif([np.zeros((2, 2), np.uint8)],
                   np.zeros((300, 3), np.uint8))


def test_fixture_closed_forms():
    t = generate_gif_videos(8)
    for i in range(8):
        data = t["bytes"][i].as_py()
        w, h, nf = gif_params(i)
        m = gif_probe(data)
        assert (m["width"], m["height"], m["n_frames"]) == (w, h, nf)
        assert m["duration_cs"] == sum(gif_frame_delay(i, f)
                                       for f in range(nf))
        pal = gif_palette(i)
        for f, canvas in enumerate(decode_gif(data)):
            assert (canvas == pal[gif_frame_index(i, f)]).all()


def test_video_operators_gif(spark):
    from rastertiler_rs_spark.operators.multimodal import (
        video_frame_stats, video_probe)

    vids = spark.read.parquet(gif_videos_parquet(6))
    probe = {r.video_id: r for r in video_probe(vids).collect()}
    assert len(probe) == 6
    for i in range(6):
        w, h, nf = gif_params(i)
        r = probe[f"gif{i:06d}"]
        assert (r.width, r.height, r.n_frames) == (w, h, nf)
        assert r.codec == "gif89a"
    stats = video_frame_stats(vids, every_n=1).collect()
    for r in stats:
        i = int(r.video_id[3:])
        w, h, _ = gif_params(i)
        rgb = gif_palette(i)[gif_frame_index(i, r.frame_no)].astype(int)
        assert (r.w, r.h, r.n_px) == (w, h, 3 * w * h)
        assert r.vsum == int(rgb.sum()) * w * h
        assert r.vmin == rgb.min() and r.vmax == rgb.max()


def test_image_operators_gif(spark):
    from rastertiler_rs_spark.operators.multimodal import (image_metadata,
                                                           resize_images)
    from rastertiler_rs_spark.png import decode_band

    pal = gif_palette(3)
    idx = (np.arange(40 * 24, dtype=np.int64).reshape(24, 40) % 8
           ).astype(np.uint8)
    blob = encode_gif([idx], pal)
    df = spark.createDataFrame(
        [("g0", bytearray(blob), 40, 24, "gif;img")],
        "image_id string, bytes binary, w int, h int, fmt string")
    meta = image_metadata(df).collect()[0]
    assert meta.actual_w == 40 and meta.actual_h == 24 and meta.dims_match
    out = resize_images(df, 16).collect()[0]
    band = decode_band(bytes(out.bytes), "png;u8")
    # spot-check the K2 nearest rule against a direct numpy resample
    rgb = pal[idx]
    luma = np.clip(np.round(0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                            + 0.114 * rgb[:, :, 2]), 0, 255).astype(np.uint8)
    ri = np.minimum(((np.arange(16) + 0.5) * 24 / 16).astype(int), 23)
    ci = np.minimum(((np.arange(16) + 0.5) * 40 / 16).astype(int), 39)
    assert (band == luma[ri[:, None], ci[None, :]]).all()
