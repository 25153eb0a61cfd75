"""Container-codec tests: ISO BMFF (MP4) and RIFF (AVI) mux/probe/demux
and MPEG-1 Layer III framing — plus the Spark operators built on them."""

import struct

import pytest

from rastertiler_rs_spark.media import (
    demux_avi, demux_mp4, encode_avi, encode_mp3, encode_mp4,
    probe_avi, probe_mp3, probe_mp4)
from rastertiler_rs_spark.media.mp3 import _frame_len
from rastertiler_rs_spark.fixtures import (
    avi_frame_payload, avi_mjpeg_frame_value, avi_mjpeg_params,
    avi_mjpeg_parquet, avi_params, avi_videos_parquet,
    mp3_params, mp3_parquet, video_frame_payload, video_params,
    videos_parquet)


# ---------------------------------------------------------------- mp4

def test_mp4_roundtrip_probe_and_demux():
    frames = [bytes([i % 256]) * (50 + i * 7) for i in range(12)]
    data = encode_mp4(frames, 320, 240, fps=25)
    meta = probe_mp4(data)
    assert meta == {"width": 320, "height": 240, "n_samples": 12,
                    "duration_ms": 12 * 40, "timescale": 1000,
                    "codec": "mp4v"}
    assert demux_mp4(data) == frames


def test_mp4_empty_and_single_frame():
    data = encode_mp4([b"xyz"], 16, 16, fps=10)
    assert probe_mp4(data)["n_samples"] == 1
    assert demux_mp4(data) == [b"xyz"]
    data0 = encode_mp4([], 16, 16, fps=10)
    assert probe_mp4(data0)["n_samples"] == 0
    assert demux_mp4(data0) == []


def test_mp4_fps_must_divide_timescale():
    with pytest.raises(ValueError, match="fps"):
        encode_mp4([b"a"], 8, 8, fps=30)


def test_mp4_version1_mvhd_parsed():
    """The writer emits version-0 boxes; the prober must also read
    version-1 (64-bit) mvhd/tkhd — craft one by hand."""
    data = bytearray(encode_mp4([b"abc", b"defg"], 100, 50, fps=20))
    # locate the v0 mvhd and rebuild it as v1 (payload grows by 12)
    i = bytes(data).index(b"mvhd") - 4
    size = struct.unpack_from(">I", data, i)[0]
    body = bytes(data[i + 8:i + size])
    ver_flags, rest = body[:4], body[4:]
    cr, mo, ts, du = struct.unpack_from(">IIII", rest, 0)
    v1 = struct.pack(">BBBB", 1, 0, 0, 0) + struct.pack(
        ">QQIQ", cr, mo, ts, du) + rest[16:]
    new_box = struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
    out = bytes(data[:i]) + new_box + bytes(data[i + size:])
    # the v1 rebuild grew the enclosing moov by 12 bytes — patch its size
    j = out.index(b"moov") - 4
    moov_size = struct.unpack_from(">I", out, j)[0]
    out = out[:j] + struct.pack(">I", moov_size + 12) + out[j + 4:]
    meta = probe_mp4(out)
    assert meta["duration_ms"] == 2 * 50
    assert (meta["width"], meta["height"]) == (100, 50)


def test_mp4_corruption_raises():
    data = encode_mp4([b"abc"] * 3, 64, 64, fps=25)
    with pytest.raises(ValueError):
        probe_mp4(data[:32])            # moov truncated away
    bad = bytearray(data)
    i = bytes(bad).index(b"stco") - 4
    # point the chunk offset past EOF
    struct.pack_into(">I", bad, i + 8 + 4 + 4, len(data) + 1000)
    with pytest.raises(ValueError, match="overruns"):
        demux_mp4(bytes(bad))


def test_mp4_multichunk_and_co64_demux():
    """Hand-build stsc/co64 variants the single-chunk writer never
    emits: 2 chunks (2+1 samples) addressed by 64-bit offsets."""
    frames = [b"AAAA", b"BBBBBB", b"CC"]
    base = encode_mp4(frames, 32, 32, fps=10)
    mdat_payload_off = base.index(b"mdat") + 4  # index() lands on the type 4cc
    stbl_children = {
        b"stsd": None, b"stts": None,
        b"stsc": struct.pack(">BBBB", 0, 0, 0, 0)
        + struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 1, 1),
        b"stsz": struct.pack(">BBBB", 0, 0, 0, 0) + struct.pack(">II", 0, 3)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
        b"co64": struct.pack(">BBBB", 0, 0, 0, 0) + struct.pack(">I", 2)
        + struct.pack(">QQ", mdat_payload_off, mdat_payload_off + 10),
    }
    # splice: reuse stsd/stts from the real file, replace the rest
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p
    i = base.index(b"stsd") - 4
    stsd_size = struct.unpack_from(">I", base, i)[0]
    stsd = base[i:i + stsd_size]
    i = base.index(b"stts") - 4
    stts_size = struct.unpack_from(">I", base, i)[0]
    stts = base[i:i + stts_size]
    stbl = box(b"stbl", stsd + stts + box(b"stsc", stbl_children[b"stsc"])
               + box(b"stsz", stbl_children[b"stsz"])
               + box(b"co64", stbl_children[b"co64"]))
    i = base.index(b"vmhd") - 4
    vmhd_size = struct.unpack_from(">I", base, i)[0]
    vmhd = base[i:i + vmhd_size]
    i = base.index(b"dinf") - 4
    dinf_size = struct.unpack_from(">I", base, i)[0]
    dinf = base[i:i + dinf_size]
    minf = box(b"minf", vmhd + dinf + stbl)
    i = base.index(b"mdhd") - 4
    mdhd = base[i:i + struct.unpack_from(">I", base, i)[0]]
    i = base.index(b"hdlr") - 4
    hdlr = base[i:i + struct.unpack_from(">I", base, i)[0]]
    mdia = box(b"mdia", mdhd + hdlr + minf)
    i = base.index(b"tkhd") - 4
    tkhd = base[i:i + struct.unpack_from(">I", base, i)[0]]
    trak = box(b"trak", tkhd + mdia)
    i = base.index(b"mvhd") - 4
    mvhd = base[i:i + struct.unpack_from(">I", base, i)[0]]
    moov = box(b"moov", mvhd + trak)
    mdat_end = base.index(b"moov") - 4
    out = base[:mdat_end] + moov
    assert demux_mp4(out) == frames


# ---------------------------------------------------------------- mp3

def test_mp3_roundtrip_all_params():
    for sr in (44100, 48000, 32000):
        for kbps in (32, 128, 320):
            for ch in (1, 2):
                s = encode_mp3(9, kbps, sr, ch, pad_every=2, seed=3)
                m = probe_mp3(s)
                assert m["sample_rate"] == sr
                assert m["channels"] == ch
                assert m["n_frames"] == 9
                assert m["avg_kbps"] == kbps
                assert m["duration_ms"] == 9 * 1152 * 1000 // sr
                assert m["n_bytes"] == len(s)


def test_mp3_padding_accounting():
    # pad_every=3 pads frames 0,3,6,... -> ceil(n/3) padded frames
    s = encode_mp3(10, 128, 44100, 2, pad_every=3)
    base = _frame_len(128, 44100, False)
    assert len(s) == 10 * base + 4  # ceil(10/3) = 4 padded frames
    assert probe_mp3(s)["n_frames"] == 10


def test_mp3_corruption_raises():
    s = encode_mp3(5, 128, 44100, 2)
    with pytest.raises(ValueError, match="truncated"):
        probe_mp3(s[:-1])
    with pytest.raises(ValueError, match="sync"):
        probe_mp3(b"\x00" + s)
    with pytest.raises(ValueError, match="no MP3 frames"):
        probe_mp3(b"")
    bad = bytearray(s)
    bad[2] |= 0xF0  # bitrate index 15 = forbidden
    with pytest.raises(ValueError, match="forbidden"):
        probe_mp3(bytes(bad))


# ---------------------------------------------------------------- avi

def test_avi_roundtrip_probe_and_demux():
    # mixed odd/even payload lengths exercise RIFF word alignment
    frames = [bytes([i % 256]) * (49 + i * 7) for i in range(9)]
    data = encode_avi(frames, 320, 240, fps=25, codec=b"MJPG")
    meta = probe_avi(data)
    assert meta["width"] == 320 and meta["height"] == 240
    assert meta["n_frames"] == 9
    assert meta["duration_ms"] == 9 * 40
    assert meta["codec"] == "MJPG"
    assert meta["has_index"] and meta["usec_per_frame"] == 40000
    assert demux_avi(data) == frames


def test_avi_empty_single_and_fps_guard():
    assert demux_avi(encode_avi([b"zz"], 8, 8, fps=10)) == [b"zz"]
    assert probe_avi(encode_avi([], 8, 8, fps=10))["n_frames"] == 0
    with pytest.raises(ValueError, match="fps"):
        encode_avi([b"x"], 8, 8, fps=30)  # 30 does not divide 1000
    with pytest.raises(ValueError, match="fourcc"):
        encode_avi([b"x"], 8, 8, fps=10, codec=b"toolong")


def test_avi_header_cross_check_raises():
    data = encode_avi([b"ab", b"cde"], 64, 48, fps=25)
    avih = data.index(b"avih") + 8
    bad = bytearray(data)
    struct.pack_into("<I", bad, avih + 16, 7)  # dwTotalFrames != strh length
    with pytest.raises(ValueError, match="dwTotalFrames"):
        probe_avi(bytes(bad))
    strf = data.index(b"strf") + 8
    bad = bytearray(data)
    struct.pack_into("<i", bad, strf + 4, 65)  # biWidth != avih width
    with pytest.raises(ValueError, match="geometry"):
        probe_avi(bytes(bad))
    bad = bytearray(data)
    bad[strf + 16] ^= 0xFF  # biCompression != strh handler
    with pytest.raises(ValueError, match="biCompression"):
        probe_avi(bytes(bad))


def test_avi_idx1_cross_check_and_indexless_demux():
    frames = [b"odd" * 7, b"even" * 8]
    data = encode_avi(frames, 32, 32, fps=50)
    idx = data.rindex(b"idx1") + 8
    bad = bytearray(data)
    struct.pack_into("<I", bad, idx + 12, 999)  # entry-0 size lies
    with pytest.raises(ValueError, match="size"):
        demux_avi(bytes(bad))
    bad = bytearray(data)
    struct.pack_into("<I", bad, idx + 8, 2)  # entry-0 offset lies
    with pytest.raises(ValueError, match="offset"):
        demux_avi(bytes(bad))
    # with the index chunk dropped entirely, the movi walk stands alone
    idx_chunk_start = data.rindex(b"idx1")
    noidx = bytearray(data[:idx_chunk_start])
    struct.pack_into("<I", noidx, 4, len(noidx) - 8)  # fix RIFF size
    assert demux_avi(bytes(noidx)) == frames


def test_avi_absolute_idx1_offsets_accepted():
    # some muxers write idx1 offsets as absolute file positions; the
    # parser accepts both conventions
    frames = [b"a" * 10, b"b" * 11, b"c" * 12]
    data = encode_avi(frames, 16, 16, fps=10)
    movi_fourcc_pos = data.index(b"movi")
    idx = data.rindex(b"idx1") + 8
    out = bytearray(data)
    for i in range(3):
        off, = struct.unpack_from("<I", data, idx + 16 * i + 8)
        struct.pack_into("<I", out, idx + 16 * i + 8, movi_fourcc_pos + off)
    assert demux_avi(bytes(out)) == frames


def test_avi_rec_list_grouping_demux():
    """'00dc' chunks nested in LIST('rec ') groups (the interleaved-
    stream convention) are demuxed in order."""
    from rastertiler_rs_spark.media.avi import _chunk, _list

    frames = [b"one", b"twoo", b"three"]
    base = encode_avi(frames, 16, 16, fps=10)
    movi_start = base.index(b"LIST", base.index(b"movi") - 8)
    hdr_part = base[:movi_start]
    rec = _list(b"rec ", b"".join(_chunk(b"00dc", f) for f in frames))
    movi = _list(b"movi", rec)
    body = hdr_part[12:] + movi  # drop idx1; walk alone suffices
    data = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    assert demux_avi(data) == frames


def test_avi_truncation_raises():
    data = encode_avi([b"xy" * 40], 16, 16, fps=10)
    with pytest.raises(ValueError):
        probe_avi(data[:20])
    with pytest.raises(ValueError, match="RIFF"):
        probe_avi(b"JUNK" + data[4:])
    with pytest.raises(ValueError, match="corrupt|overruns"):
        demux_avi(data[: len(data) // 2])


# ------------------------------------------------------- Spark operators

def test_video_probe_operator(spark):
    from rastertiler_rs_spark.operators.multimodal import video_probe

    vids = spark.read.parquet(videos_parquet(16))
    rows = {r["video_id"]: r for r in video_probe(vids).collect()}
    assert len(rows) == 16
    for i in range(16):
        w, h, fps, n_frames = video_params(i)
        r = rows[f"vid{i:08d}"]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_frames"] == n_frames
        assert r["duration_ms"] == n_frames * (1000 // fps)
        assert r["codec"] == "mp4v"


def test_frame_sample_real_mp4(spark):
    from rastertiler_rs_spark.operators.multimodal import frame_sample

    vids = spark.read.parquet(videos_parquet(8))
    out = frame_sample(vids, every_n=4).collect()
    by_key = {(r["video_id"], r["frame_no"]): bytes(r["frame_bytes"])
              for r in out}
    total = 0
    for i in range(8):
        _, _, _, n_frames = video_params(i)
        for f in range(0, n_frames, 4):
            assert by_key[(f"vid{i:08d}", f)] == video_frame_payload(i, f)
            total += 1
    assert len(out) == total


def test_audio_probe_operator_wav_and_mp3(spark):
    from rastertiler_rs_spark.fixtures import audio_parquet, audio_params
    from rastertiler_rs_spark.operators.multimodal import audio_probe

    clips = spark.read.parquet(mp3_parquet(12))
    rows = {r["audio_id"]: r for r in audio_probe(clips).collect()}
    for i in range(12):
        sr, kbps, ch, n_frames, _ = mp3_params(i)
        r = rows[f"mp3{i:08d}"]
        assert r["container"] == "mp3"
        assert (r["sample_rate"], r["channels"]) == (sr, ch)
        assert r["n_samples"] == n_frames * 1152
        assert r["duration_ms"] == n_frames * 1152 * 1000 // sr

    wavs = spark.read.parquet(audio_parquet(6))
    rows = {r["audio_id"]: r for r in audio_probe(wavs).collect()}
    for i in range(6):
        rate, channels, n_frames = audio_params(i)
        r = rows[f"aud{i:08d}"]
        assert r["container"] == "wav"
        assert (r["sample_rate"], r["channels"]) == (rate, channels)
        assert r["n_samples"] == n_frames
        assert r["duration_ms"] == n_frames * 1000 // rate


def test_unknown_container_raises(spark):
    from rastertiler_rs_spark.operators.multimodal import (
        audio_probe, video_probe)

    df = spark.createDataFrame(
        [("x", bytearray(b"1234"), "webm")], "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="webm"):
        video_probe(df).collect()
    df2 = spark.createDataFrame(
        [("x", bytearray(b"1234"), "ogg")], "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="ogg"):
        audio_probe(df2).collect()


def test_video_frame_stats_real_mjpeg_decode(spark):
    """End-to-end REAL video decode: textured frames jpeg-encoded and
    muxed, then demux+decode through the operator; stats must equal a
    direct numpy recompute over decode_jpeg of the same payloads (and
    for solid frames, the closed form exactly)."""
    import numpy as np

    from rastertiler_rs_spark.jpeg import decode_jpeg, encode_jpeg_gray
    from rastertiler_rs_spark.media import encode_mp4
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    rows, expect = [], {}
    for i in range(3):
        w, h = 24 + 8 * i, 16 + 4 * i
        frames = []
        for f in range(4):
            if f % 2:                    # textured (lossy) frames
                band = ((np.add.outer(np.arange(h) * 3, np.arange(w) * 5)
                         + 31 * i + 7 * f) % 256).astype(np.uint8)
            else:                        # solid frames: exact round-trip
                band = np.full((h, w), (50 * i + 13 * f) % 256, np.uint8)
            frames.append(encode_jpeg_gray(band, quality=90))
        rows.append((f"v{i}", encode_mp4(frames, w, h, 25, codec=b"jpeg"),
                     "mp4;jpeg"))
        for f, payload in enumerate(frames):
            px = decode_jpeg(payload).reshape(-1).astype(np.int64)
            expect[(f"v{i}", f)] = (int(px.sum()), int(px.min()), int(px.max()),
                                    int(((np.arange(px.size) + 1) * px).sum()))

    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    got = {(r["video_id"], r["frame_no"]): r.asDict()
           for r in video_frame_stats(df, every_n=1).collect()}
    assert len(got) == 12
    for (vid, f), (vsum, vmin, vmax, checksum) in expect.items():
        g = got[(vid, f)]
        assert (g["vsum"], g["vmin"], g["vmax"], g["checksum"]) \
            == (vsum, vmin, vmax, checksum)
        i = int(vid[1])
        if f % 2 == 0:                   # solid closed form
            v = (50 * i + 13 * f) % 256
            n = g["n_px"]
            assert g["vsum"] == v * n and g["vmin"] == v == g["vmax"]
            assert g["checksum"] == v * n * (n + 1) // 2


def test_video_frame_stats_non_mjpeg_raises(spark):
    from rastertiler_rs_spark.fixtures import video_frame_payload
    from rastertiler_rs_spark.media import encode_mp4
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    frames = [video_frame_payload(0, f) for f in range(3)]
    df = spark.createDataFrame(
        [("v0", encode_mp4(frames, 64, 48, 25, codec=b"mp4v"), "mp4;mp4v")],
        "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="mp4v.*not available|Motion-JPEG"):
        video_frame_stats(df).collect()


def test_avi_operator_probe_and_demux(spark):
    from rastertiler_rs_spark.operators.multimodal import (
        frame_sample, video_probe)

    vids = spark.read.parquet(avi_videos_parquet(12))
    rows = {r["video_id"]: r for r in video_probe(vids).collect()}
    assert len(rows) == 12
    for i in range(12):
        w, h, fps, n_frames = avi_params(i)
        r = rows[f"avv{i:08d}"]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_frames"] == n_frames
        assert r["duration_ms"] == n_frames * (1000 // fps)
        assert r["codec"] == "rawv"

    out = frame_sample(vids, every_n=3).collect()
    by_key = {(r["video_id"], r["frame_no"]): bytes(r["frame_bytes"])
              for r in out}
    total = 0
    for i in range(12):
        _, _, _, n_frames = avi_params(i)
        for f in range(0, n_frames, 3):
            assert by_key[(f"avv{i:08d}", f)] == avi_frame_payload(i, f)
            total += 1
    assert len(out) == total


def test_avi_video_frame_stats_real_mjpeg_decode(spark):
    """The non-MP4 end of the real video decode path: RIFF demux +
    baseline JPEG decode, solid closed form exact (q90 round-trip is
    bit-exact for all 256 solid values, pinned in test_jpeg)."""
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    vids = spark.read.parquet(avi_mjpeg_parquet(8))
    got = {(r["video_id"], r["frame_no"]): r.asDict()
           for r in video_frame_stats(vids, every_n=1).collect()}
    total = 0
    for i in range(8):
        w, h, _, n_frames = avi_mjpeg_params(i)
        for f in range(n_frames):
            g = got[(f"avj{i:08d}", f)]
            v, n = avi_mjpeg_frame_value(i, f), w * h
            assert (g["w"], g["h"], g["n_px"]) == (w, h, n)
            assert g["vsum"] == v * n and g["vmin"] == v == g["vmax"]
            assert g["checksum"] == v * n * (n + 1) // 2
            total += 1
    assert len(got) == total


def test_avi_video_frame_stats_non_mjpeg_raises(spark):
    from rastertiler_rs_spark.operators.multimodal import video_frame_stats

    frames = [avi_frame_payload(0, f) for f in range(3)]
    df = spark.createDataFrame(
        [("v0", encode_avi(frames, 64, 48, 25, codec=b"rawv"), "avi;rawv")],
        "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="rawv.*not available|Motion-JPEG"):
        video_frame_stats(df).collect()


# --- Layer III payload decode (scoped family) ---------------------------

def _l3_frames(rng, n_frames, channels, max_quads=24, gains=(210, 214, 218)):
    frames = []
    for _f in range(n_frames):
        gr = []
        for _g in range(2):
            chs = []
            for _c in range(channels):
                nq = int(rng.integers(1, max_quads))
                vals = rng.integers(0, 3, size=4 * nq) - 1
                chs.append({"values": vals,
                            "global_gain": int(rng.choice(gains))})
            gr.append(chs)
        frames.append(gr)
    return frames


def test_l3_payload_roundtrip_exact_all_rates():
    import numpy as np

    from rastertiler_rs_spark.media import (decode_mp3_spectra,
                                            encode_mp3_l3, probe_mp3)

    rng = np.random.default_rng(11)
    for sr in (44100, 48000, 32000):
        for ch in (1, 2):
            frames = _l3_frames(rng, 4, ch)
            data = encode_mp3_l3(frames, sr, ch)
            meta = probe_mp3(data)  # framing stays walker-compatible
            assert meta["n_frames"] == 4 and meta["channels"] == ch
            dec = decode_mp3_spectra(data)
            assert dec["sample_rate"] == sr
            assert len(dec["granules"]) == 4 * 2 * ch
            for ent in dec["granules"]:
                spec = frames[ent["frame"]][ent["granule"]][ent["channel"]]
                ref = np.zeros(576, dtype=np.int64)
                ref[: len(spec["values"])] = spec["values"]
                assert (ent["is_values"] == ref).all()
                g = (spec["global_gain"] - 210) / 4.0
                assert (ent["xr"] == ref * 2.0 ** g).all()


def test_l3_requantize_scalefacs_preflag():
    import numpy as np

    from rastertiler_rs_spark.media import decode_mp3_spectra, encode_mp3_l3
    from rastertiler_rs_spark.media.mp3 import PRETAB, SFB_LONG

    rng = np.random.default_rng(5)
    sfs = rng.integers(0, 4, 21).tolist()  # scalefac_compress=9: slen 2/2
    vals = rng.integers(0, 3, size=240) - 1
    frames = [[[{"values": vals, "global_gain": 215, "scalefacs": sfs,
                 "scalefac_compress": 9, "preflag": 1, "scalefac_scale": 1}],
               [{"values": vals, "global_gain": 209, "scalefacs": sfs,
                 "scalefac_compress": 9, "scalefac_scale": 0}]]]
    dec = decode_mp3_spectra(encode_mp3_l3(frames, 48000, 1))
    b = SFB_LONG[48000]
    for ent, (gain, mult, pre) in zip(dec["granules"],
                                      [(215, 1.0, 1), (209, 0.5, 0)]):
        assert ent["scalefacs"] == sfs
        ref = np.zeros(576)
        ref[:240] = vals
        exp = np.full(576, (gain - 210) / 4.0)
        for sfb in range(22):
            sf = (sfs[sfb] if sfb < 21 else 0) + (PRETAB[sfb] if pre else 0)
            exp[b[sfb]:b[sfb + 1]] -= mult * sf
        want = np.sign(ref) * np.abs(ref) ** (4.0 / 3.0) * np.exp2(exp)
        assert np.array_equal(ent["xr"], want)


def _side_info_frame(channels=1, **flags):
    """Hand-build one minimal frame (empty payload) with chosen
    side-info flags, via the encoder's own bit writer."""
    from rastertiler_rs_spark.media.mp3 import _BitWriter, _frame_len

    mode = 3 if channels == 1 else 0
    h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) \
        | (1 << 12) | (0 << 10) | (mode << 6)  # 32 kbps, 44.1 kHz
    sw = _BitWriter()
    sw.write(flags.get("main_data_begin", 0), 9)
    sw.write(0, 5 if channels == 1 else 3)
    for _ in range(4 * channels):
        sw.write(0, 1)
    for _ in range(2 * channels):
        sw.write(0, 12)                                  # part2_3_length
        sw.write(flags.get("big_values", 0), 9)
        sw.write(210, 8)
        sw.write(0, 4)
        wsf = flags.get("window_switching", 0)
        sw.write(wsf, 1)
        if wsf:
            sw.write(2, 2)  # block_type short
            sw.write(0, 1)
            sw.write(0, 5), sw.write(0, 5)
            for _ in range(3):
                sw.write(0, 3)
        else:
            for _ in range(3):
                sw.write(flags.get("table_select", 0), 5)
            sw.write(0, 4)
            sw.write(0, 3)
        sw.write(0, 1)
        sw.write(0, 1)
        sw.write(flags.get("count1table_select", 1), 1)
    side = sw.getvalue()
    assert len(side) == (17 if channels == 1 else 32)
    flen = _frame_len(32, 44100, False)
    return h.to_bytes(4, "big") + side + bytes(flen - 4 - len(side))


def test_l3_fail_fast_outside_family():
    import pytest as _pytest

    from rastertiler_rs_spark.media import decode_mp3_spectra

    for flags, msg in [
        ({"main_data_begin": 5}, "bit reservoir"),
        ({"window_switching": 1}, "window switching"),
        ({"table_select": 3, "big_values": 4}, "Huffman tables"),
        ({"count1table_select": 0}, "table A"),
    ]:
        with _pytest.raises(NotImplementedError, match=msg):
            decode_mp3_spectra(_side_info_frame(**flags))
    # table_select != 0 with big_values == 0 is fine (no region to decode)
    assert decode_mp3_spectra(_side_info_frame(table_select=3))[
        "granules"][0]["is_values"].sum() == 0


def test_l3_imdct_single_line_closed_form():
    import numpy as np

    from rastertiler_rs_spark.media import l3_subband_samples

    # one spectral line in subband 0 (alias butterflies never touch
    # lines 0..9 of subband 0): output = windowed IMDCT cosine exactly
    k0, amp = 3, 2.0
    xr = np.zeros(576)
    xr[k0] = amp
    samples, overlap = l3_subband_samples(xr)
    i = np.arange(36)
    want = amp * np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k0 + 1)) \
        * np.sin(np.pi / 36 * (i + 0.5))
    assert np.allclose(samples[:, 0], want[:18], atol=1e-12)
    assert np.allclose(overlap[:, 0], want[18:], atol=1e-12)
    assert np.all(samples[:, 1:] == 0) and np.all(overlap[:, 1:] == 0)


def test_l3_overlap_add_and_inversion():
    import numpy as np

    from rastertiler_rs_spark.media import l3_subband_samples

    rng = np.random.default_rng(2)
    xr1, xr2 = rng.normal(size=576), rng.normal(size=576)
    s1, ov = l3_subband_samples(xr1)
    s2, _ = l3_subband_samples(xr2, prev_overlap=ov)
    s2_alone, _ = l3_subband_samples(xr2)
    # granule 2 = its own IMDCT head + granule 1's windowed tail, with
    # frequency inversion applied AFTER the add (odd subbands, odd t)
    sb = np.arange(32)[None, :]
    t = np.arange(18)[:, None]
    inv = np.where((sb % 2 == 1) & (t % 2 == 1), -1.0, 1.0)
    assert np.allclose(s2, s2_alone + ov * inv, atol=1e-12)
    # alias butterflies are rotations: per-pair energy is preserved
    x = np.zeros(576)
    x[17], x[18] = 1.25, -0.5
    s, ov2 = l3_subband_samples(x)
    e_time = (s ** 2).sum() + (ov2 ** 2).sum()
    # windowed 36-IMDCT of one 18-line block: energy scales by
    # sum(cos^2)*... — just pin total energy against the direct formula
    from rastertiler_rs_spark.media.mp3 import _ALIAS_CI
    cs = 1.0 / np.sqrt(1.0 + np.square(_ALIAS_CI[0]))
    ca = _ALIAS_CI[0] * cs
    lo, hi = 1.25 * cs - (-0.5) * ca, (-0.5) * cs + 1.25 * ca
    assert np.isclose(lo ** 2 + hi ** 2, 1.25 ** 2 + 0.5 ** 2, atol=1e-12)


def test_l3_fixture_formula_matches_decode():
    import numpy as np

    from rastertiler_rs_spark.fixtures import (generate_mp3_payload,
                                               mp3_payload_params)
    from rastertiler_rs_spark.media import decode_mp3_spectra

    tbl = generate_mp3_payload(6)
    for i in range(6):
        sr, ch, n_frames = mp3_payload_params(i)
        dec = decode_mp3_spectra(tbl["bytes"][i].as_py())
        assert dec["sample_rate"] == sr and dec["channels"] == ch
        assert len(dec["granules"]) == n_frames * 2 * ch
        for ent in dec["granules"]:
            f, g, c = ent["frame"], ent["granule"], ent["channel"]
            nq = 2 + ((i + 2 * f + 3 * g + 5 * c) % 4)
            p = np.arange(4 * nq, dtype=np.int64)
            want = np.zeros(576, dtype=np.int64)
            want[: 4 * nq] = (7 * i + 3 * f + 5 * g + 11 * c + p) % 3 - 1
            assert (ent["is_values"] == want).all()
            gain = (i + f + g + c) % 3
            assert ent["xr"].sum() == want.sum() * (1 << gain)


def test_l3_filterbank_perfect_reconstruction():
    """TDAC identity: the sine window satisfies Princen-Bradley, so
    windowed-IMDCT + 50% overlap-add of a forward-MDCT analysis stream
    reconstructs the signal exactly (x 9 = N/4 for N=36). Drives the
    REAL l3_subband_samples chain over 4 chained granules and all 32
    subbands; the alias butterflies are cancelled by feeding their
    inverse rotation, which simultaneously proves they are true
    rotations. A wrong IMDCT phase, window, overlap carry, inversion
    mask, or butterfly coefficient breaks the identity."""
    import numpy as np

    from rastertiler_rs_spark.media import l3_subband_samples
    from rastertiler_rs_spark.media.mp3 import _ALIAS_CI

    n, gr = 36, 4
    rng = np.random.default_rng(9)
    sig = rng.normal(size=(32, 18 * (gr + 1)))  # per-subband signals
    i = np.arange(n)[:, None]
    k = np.arange(18)[None, :]
    C = np.cos(np.pi / (2 * n) * (2 * i + 1 + n // 2) * (2 * k + 1))
    w = np.sin(np.pi / n * (np.arange(n) + 0.5))
    cs = 1.0 / np.sqrt(1.0 + np.square(_ALIAS_CI))
    ca = np.asarray(_ALIAS_CI) * cs

    sb_ax = np.arange(32)[None, :]
    t_ax = np.arange(18)[:, None]
    inv = np.where((sb_ax % 2 == 1) & (t_ax % 2 == 1), -1.0, 1.0)

    overlap = None
    outs = []
    for g in range(gr):
        X = (w * sig[:, g * 18:g * 18 + 36]) @ C       # analysis MDCT
        xr = X.reshape(-1).copy()
        for sb in range(1, 32):                        # inverse butterflies
            lo = xr[18 * sb - 1 - np.arange(8)].copy()
            hi = xr[18 * sb + np.arange(8)].copy()
            xr[18 * sb - 1 - np.arange(8)] = lo * cs + hi * ca
            xr[18 * sb + np.arange(8)] = hi * cs - lo * ca
        samples, overlap = l3_subband_samples(xr, prev_overlap=overlap)
        outs.append(samples * inv)                     # undo freq inversion
    rec = np.concatenate(outs, axis=0)                 # (18*gr, 32)
    # first granule carries no history; interior must equal 9x signal
    want = 9.0 * sig[:, 18:18 * gr].T
    assert np.allclose(rec[18:], want, atol=1e-10)


def test_l3_count1_stuffing_and_overrun():
    """Spectrum full at 576 lines before part2_3_length is exhausted ->
    the remainder is stuffing and is skipped (standard decoder
    behavior); a codeword split ACROSS the budget boundary is malformed
    and raises."""
    import pytest as _pytest

    from rastertiler_rs_spark.media import decode_mp3_spectra
    from rastertiler_rs_spark.media.mp3 import _BitWriter, _frame_len

    def frame(p23: int, main_bits: int):
        h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) \
            | (1 << 12) | (0 << 10) | (3 << 6)  # 32 kbps, 44.1 kHz, mono
        sw = _BitWriter()
        sw.write(0, 9)
        sw.write(0, 5)
        for _ in range(4):
            sw.write(0, 1)
        for g in range(2):
            sw.write(p23 if g == 0 else 0, 12)
            sw.write(0, 9)
            sw.write(210, 8)
            sw.write(0, 4)
            sw.write(0, 1)
            for _ in range(3):
                sw.write(0, 5)
            sw.write(0, 4)
            sw.write(0, 3)
            sw.write(0, 1)
            sw.write(0, 1)
            sw.write(1, 1)
        mw = _BitWriter()
        for _ in range(main_bits // 4):
            mw.write(0xF, 4)  # table-B code for the all-zero quad
        mw.write(0, main_bits % 4)
        body = sw.getvalue() + mw.getvalue()
        flen = _frame_len(32, 44100, False)
        return h.to_bytes(4, "big") + body + bytes(flen - 4 - len(body))

    # 144 zero quads = 576 lines in 576 bits; p23=580 leaves 4 stuffing
    # bits inside part2_3 — decoded spectrum is all zero, no error
    dec = decode_mp3_spectra(frame(580, 580))
    assert dec["granules"][0]["is_values"].sum() == 0
    # p23=574 ends mid-codeword: the 144th quad read crosses the budget
    with _pytest.raises(ValueError, match="overran"):
        decode_mp3_spectra(frame(574, 576))


def test_l3_crc_and_joint_stereo_fail_fast():
    """protection_bit=0 (a 16-bit CRC precedes side info) and joint
    stereo (mode=01, MS/intensity processing) are outside the verified
    family — both must raise NAMING the feature, never mis-parse."""
    import pytest as _pytest

    from rastertiler_rs_spark.media import decode_mp3_spectra

    base = bytearray(_side_info_frame())
    crc = bytearray(base)
    crc[1] &= ~1  # clear protection_bit: CRC-protected
    with _pytest.raises(NotImplementedError, match="CRC"):
        decode_mp3_spectra(bytes(crc))
    js = bytearray(base)
    # mode 01 + mode_extension bit 0: intensity stereo (blocked; MS-only
    # joint stereo is decoded — see test_l3_ms_stereo_and_scfsi)
    js[3] = (js[3] & 0x0F) | (0b01 << 6) | (0b01 << 4)
    with _pytest.raises(NotImplementedError, match="intensity"):
        decode_mp3_spectra(bytes(js))


def test_l3_ms_stereo_and_scfsi():
    """MS joint stereo (pure arithmetic, 2.4.3.4.9.2) and scfsi
    scalefactor sharing (2.4.2.7) round-trip: channel 0 carries MID,
    channel 1 SIDE; decoded xr must equal (M±S)/sqrt(2) of the
    independently-requantized spectra, and flagged scfsi groups must
    transmit no granule-1 bits yet reproduce granule 0's scalefactors."""
    import numpy as np

    from rastertiler_rs_spark.media import decode_mp3_spectra, encode_mp3_l3

    rng = np.random.default_rng(21)
    sfs0 = rng.integers(0, 4, 21).tolist()
    frames = []
    for _f in range(2):
        gr = []
        for _g in range(2):
            chs = []
            for _c in range(2):
                vals = rng.integers(0, 3, size=48) - 1
                chs.append({"values": vals, "global_gain": 214,
                            "scalefac_compress": 9, "scalefacs": sfs0})
            gr.append(chs)
        frames.append(gr)
    scfsi = [[1, 0, 1, 0], [0, 1, 1, 1]]
    data = encode_mp3_l3(frames, 44100, 2, ms_stereo=True, scfsi=scfsi)
    # header: mode 01, mode_extension 10 (MS only)
    assert (data[3] >> 6) & 0b11 == 0b01 and (data[3] >> 4) & 0b11 == 0b10
    dec = decode_mp3_spectra(data)
    by_key = {(e["frame"], e["granule"], e["channel"]): e
              for e in dec["granules"]}
    from rastertiler_rs_spark.media.mp3 import PRETAB, SFB_LONG
    b = SFB_LONG[44100]
    for f in range(2):
        for g in range(2):
            raw = []
            for c in range(2):
                spec = frames[f][g][c]
                ref = np.zeros(576)
                ref[:48] = spec["values"]
                exp = np.full(576, 1.0)  # (214-210)/4
                for sfb in range(22):
                    sf = sfs0[sfb] if sfb < 21 else 0
                    exp[b[sfb]:b[sfb + 1]] -= 0.5 * sf
                raw.append(np.sign(ref) * np.abs(ref) ** (4 / 3)
                           * np.exp2(exp))
                assert by_key[(f, g, c)]["scalefacs"] == sfs0  # scfsi reuse
            m, s = raw
            assert np.allclose(by_key[(f, g, 0)]["xr"],
                               (m + s) / np.sqrt(2), atol=0, rtol=0)
            assert np.allclose(by_key[(f, g, 1)]["xr"],
                               (m - s) / np.sqrt(2), atol=0, rtol=0)
    # flagged groups must actually be SHARED: a granule-1 spec whose
    # scalefacs differ from granule 0's is rejected at encode time
    import copy as _copy
    bad = _copy.deepcopy(frames)
    bad[0][1][0]["scalefacs"] = (np.array(sfs0) ^ 1).tolist()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scfsi"):
        encode_mp3_l3(bad, 44100, 2, ms_stereo=True, scfsi=scfsi)


def test_mp3_mixed_channel_counts_rejected():
    """A mono/stereo channel-count change mid-stream flips the side-info
    size (17 vs 32 bytes): probe/decode must refuse like mixed rates,
    never mis-parse. Mode changes among the 2-channel modes stay legal."""
    mono = encode_mp3(2, 128, 44100, 1)
    stereo = encode_mp3(2, 128, 44100, 2)
    with pytest.raises(ValueError, match="mixed channel counts"):
        probe_mp3(stereo + mono)
    # stereo (00) -> joint stereo (01): same channel count, accepted
    js = bytearray(stereo)
    js[3] = (js[3] & 0x3F) | (0b01 << 6)
    combined = bytes(js) + stereo
    assert probe_mp3(combined)["channels"] == 2
