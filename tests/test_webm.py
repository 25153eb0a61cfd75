"""WebM (EBML/Matroska) container codec (media/webm.py): VINT edges,
mux→parse round-trips, multi-cluster block walks, unknown-size Segment
handling, fail-fast cross-checks, and the operator paths — including
the end-to-end VP8-in-WebM pixel decode that makes VP8 the engine's
second real video codec family."""

import struct

import numpy as np
import pytest

from rastertiler_rs_spark.media import demux_webm, encode_webm, probe_webm
from rastertiler_rs_spark.media.webm import (
    _SEGMENT, _read_vint, _vint_size)


# ------------------------------------------------------------ VINT edges

def test_vint_size_roundtrip_at_length_boundaries():
    # the last value of each VINT length is reserved (all ones), so the
    # encoder must step up a byte exactly at 2^(7n) - 1
    for n in range(1, 8):
        hi = (1 << (7 * n)) - 2           # largest value coded in n bytes
        for v in (0, 1, hi, hi + 1):
            enc = _vint_size(v)
            got, pos = _read_vint(enc, 0, keep_marker=False)
            assert got == v and pos == len(enc)
        assert len(_vint_size(hi)) == n
        assert len(_vint_size(hi + 1)) == n + 1


def test_vint_unknown_size_and_invalids():
    # all-ones one-byte VINT = unknown size
    assert _read_vint(b"\xff", 0, keep_marker=False)[0] == -1
    with pytest.raises(ValueError, match="VINT"):
        _read_vint(b"\x00\x80", 0, keep_marker=False)
    with pytest.raises(ValueError, match="truncated"):
        _read_vint(b"\x40", 0, keep_marker=False)   # 2-byte VINT, 1 byte
    with pytest.raises(ValueError, match="truncated"):
        _read_vint(b"", 0, keep_marker=False)


# ---------------------------------------------------------- round-trips

def test_mux_probe_demux_roundtrip():
    frames = [bytes([i]) * (17 + 13 * i) for i in range(9)]
    data = encode_webm(frames, 64, 48, 25, codec_id="V_FILL")
    assert probe_webm(data) == {
        "container": "webm", "codec": "V_FILL", "width": 64, "height": 48,
        "n_frames": 9, "duration_ms": 9 * 40}
    assert demux_webm(data) == frames


def test_empty_and_single_frame():
    data = encode_webm([], 16, 16, 10)
    assert probe_webm(data)["n_frames"] == 0
    assert demux_webm(data) == []
    data = encode_webm([b"\x00"], 16, 16, 10)
    assert demux_webm(data) == [b"\x00"]


def test_multi_cluster_relative_timestamp_overflow():
    # 1 fps -> 1000 ms per frame; the s16 relative field forces a new
    # Cluster every 33 frames; the block walk must see all of them
    frames = [bytes([f % 256]) for f in range(80)]
    data = encode_webm(frames, 8, 8, 1)
    assert data.count(b"\x1f\x43\xb6\x75") >= 3   # >= 3 Cluster IDs
    meta = probe_webm(data)
    assert meta["n_frames"] == 80 and meta["duration_ms"] == 80000
    assert demux_webm(data) == frames


def test_large_frame_sizes_cross_vint_lengths():
    # payload sizes that need 1-byte and 2-byte size VINTs
    frames = [b"a" * 10, b"b" * 126, b"c" * 127, b"d" * 5000]
    data = encode_webm(frames, 32, 32, 50)
    assert demux_webm(data) == frames


def test_fps_must_divide_1000():
    with pytest.raises(ValueError, match="fps"):
        encode_webm([b"x"], 16, 16, 30)


def test_unknown_size_segment_accepted():
    # rewrite the Segment size VINT to all-ones (streaming convention)
    data = bytearray(encode_webm([b"abc", b"defg"], 16, 16, 25))
    seg_id = _SEGMENT.to_bytes(4, "big")
    at = data.find(seg_id)
    size_pos = at + 4
    first = data[size_pos]
    n = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        n += 1
    unknown = ((1 << (7 * n)) | ((1 << (7 * n)) - 1)).to_bytes(n, "big")
    data[size_pos:size_pos + n] = unknown
    assert demux_webm(bytes(data)) == [b"abc", b"defg"]
    assert probe_webm(bytes(data))["n_frames"] == 2


# ------------------------------------------------------------ fail-fasts

def test_doctype_cross_check():
    data = bytearray(encode_webm([b"x"], 16, 16, 25))
    at = data.find(b"webm")
    data[at:at + 4] = b"mkvx"
    with pytest.raises(ValueError, match="DocType"):
        probe_webm(bytes(data))


def test_lacing_fails_fast():
    data = bytearray(encode_webm([b"payload"], 16, 16, 25))
    # SimpleBlock for a 7-byte payload: ID 0xA3, size 0x8B (1 track +
    # 2 rel + 1 flags + 7), track vint 0x81 (a bare 0xA3 also occurs
    # inside the EBML header ID, so match the full prefix)
    at = data.find(b"\xa3\x8b\x81")
    assert at > 0
    flags_pos = at + 3 + 2   # prefix + s16 rel
    assert data[flags_pos] == 0x80
    data[flags_pos] = 0x80 | 0x02  # Xiph lacing
    with pytest.raises(NotImplementedError, match="lacing"):
        demux_webm(bytes(data))


def test_wrong_track_number_fails_fast():
    data = bytearray(encode_webm([b"payload"], 16, 16, 25))
    at = data.find(b"\xa3\x8b\x81")
    assert at > 0
    data[at + 2] = 0x82                  # point the block at track 2
    with pytest.raises(ValueError, match="unknown track"):
        demux_webm(bytes(data))


def test_nonstandard_timestamp_scale_fails_fast():
    data = bytearray(encode_webm([b"x"], 16, 16, 25))
    # TimestampScale element: ID 0x2AD7B1, size 0x83, 3-byte 1000000
    at = data.find(b"\x2a\xd7\xb1")
    assert data[at + 3] == 0x83
    data[at + 4:at + 7] = (500_000).to_bytes(3, "big")
    with pytest.raises(ValueError, match="TimestampScale"):
        probe_webm(bytes(data))


def test_truncated_stream_fails():
    data = encode_webm([b"frame"], 16, 16, 25)
    with pytest.raises(ValueError):
        probe_webm(data[:20])
    with pytest.raises(ValueError):
        demux_webm(data[:-3])


# -------------------------------------------------- VP8-in-WebM, end to end

def test_vp8_in_webm_pixels():
    from rastertiler_rs_spark.webp.vp8 import decode_vp8_frame, \
        encode_vp8_frame

    values = [(60 + 41 * f) % 256 for f in range(5)]
    frames = [encode_vp8_frame(np.full((32, 48), v, np.uint8), qi=0)
              for v in values]
    data = encode_webm(frames, 48, 32, 25)
    meta = probe_webm(data)
    assert (meta["codec"], meta["width"], meta["height"]) == ("V_VP8", 48, 32)
    for f, payload in enumerate(demux_webm(data)):
        out = decode_vp8_frame(payload)
        assert np.all(out["y"] == values[f])


# ------------------------------------------------------- operator paths

def test_video_probe_and_frame_sample_webm(spark):
    from rastertiler_rs_spark.fixtures import (webm_frame_payload,
                                               webm_params,
                                               webm_videos_parquet)
    from rastertiler_rs_spark.operators.multimodal import (frame_sample,
                                                           video_probe)

    vids = spark.read.parquet(webm_videos_parquet(8))
    probed = {r["video_id"]: r.asDict() for r in video_probe(vids).collect()}
    for i in range(8):
        w, h, fps, n_frames = webm_params(i)
        r = probed[f"wbm{i:08d}"]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n_frames)
        assert r["duration_ms"] == n_frames * (1000 // fps)
        assert r["codec"] == "V_FILL"
    sampled = frame_sample(vids, every_n=2).collect()
    for r in sampled:
        i = int(r["video_id"][3:])
        assert bytes(r["frame_bytes"]) == webm_frame_payload(i, r["frame_no"])


def test_video_frame_stats_vp8_webm(spark):
    from rastertiler_rs_spark.fixtures import (webm_vp8_frame_value,
                                               webm_vp8_params,
                                               webm_vp8_parquet)
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    vids = spark.read.parquet(webm_vp8_parquet(6))
    rows = video_frame_stats(vids, every_n=1).collect()
    assert rows
    for r in rows:
        i = int(r["video_id"][3:])
        w, h, _, n_frames = webm_vp8_params(i)
        v = webm_vp8_frame_value(i, r["frame_no"])
        n = w * h
        assert r["frame_no"] < n_frames
        assert (r["w"], r["h"], r["n_px"]) == (w, h, n)
        assert (r["vmin"], r["vmax"], r["vsum"]) == (v, v, v * n)
        assert r["checksum"] == v * n * (n + 1) // 2


def test_video_frame_stats_rejects_non_vp8_webm(spark):
    from rastertiler_rs_spark.fixtures import webm_videos_parquet
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    vids = spark.read.parquet(webm_videos_parquet(2))
    with pytest.raises(Exception, match="V_FILL"):
        video_frame_stats(vids).collect()
