"""Ogg container tests (media/ogg.py, RFC 3533 + the FLAC-to-Ogg
mapping): page framing, lacing/continuation reassembly, the forward
CRC-32, structural fail-fasts, FLAC round-trips through the container,
and the Spark audio operators on fmt='ogg'."""

import struct

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import flac_params, flac_sample, ogg_parquet
from rastertiler_rs_spark.media.ogg import (
    _crc32_ogg, decode_ogg_flac, demux_ogg, encode_ogg, encode_ogg_flac,
    probe_ogg_flac)


def _wave(n, seed=0):
    rng = np.random.default_rng(seed)
    k = np.arange(n)
    return (3000 * np.sin(k / 29.0) + rng.integers(-30, 31, n)).astype(
        np.int16)


# ------------------------------------------------------------ page layer

def test_packets_roundtrip_with_page_packing():
    pkts = [(bytes([i]) * (40 + i * 13), i) for i in range(30)]
    d = demux_ogg(encode_ogg(pkts))
    # payload bytes round-trip exactly; granules are PAGE properties
    # (packets sharing a page report the page's terminal granule)
    assert [p for p, _ in d["packets"]] == [p for p, _ in pkts]
    assert all(g <= pg for (_, g), (_, pg) in zip(pkts, d["packets"]))
    assert d["last_granule"] == 29


def test_zero_and_mult255_length_packets():
    pkts = [(b"", 0), (bytes(255), 1), (bytes(510), 2), (b"x", 3)]
    d = demux_ogg(encode_ogg(pkts))
    assert [p for p, _ in d["packets"]] == [p for p, _ in pkts]
    assert d["last_granule"] == 3


def test_oversized_packet_spans_pages_with_continuation():
    big = bytes(range(256)) * 400              # 102400 B > 255*255
    d = demux_ogg(encode_ogg([(big, 5), (b"tail", 6)]))
    assert d["packets"] == [(big, 5), (b"tail", 6)]
    # the stream really does contain a continuation page
    raw = encode_ogg([(big, 5)])
    flags = [raw[i + 5] for i in range(len(raw))
             if raw[i:i + 4] == b"OggS"]
    assert any(f & 0x01 for f in flags)
    assert flags[0] & 0x02 and flags[-1] & 0x04


def test_crc_corruption_detected():
    data = bytearray(encode_ogg([(b"hello world" * 30, 1)]))
    data[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        demux_ogg(bytes(data))


def test_structural_fail_fasts():
    good = encode_ogg([(b"abc", 1), (b"def", 2)])
    with pytest.raises(ValueError, match="capture"):
        demux_ogg(b"XXXX" + good[4:])
    # drop the BOS page entirely -> sequence/BOS error
    second = good.index(b"OggS", 4)
    with pytest.raises(ValueError, match="BOS"):
        demux_ogg(good[second:])
    with pytest.raises(ValueError, match="empty"):
        encode_ogg([])


def test_crc32_is_forward_not_zlib():
    import zlib
    assert _crc32_ogg(b"123456789") == 0x89A1897F   # CRC-32/MPEG-2 family
    assert _crc32_ogg(b"123456789") != zlib.crc32(b"123456789")


# ----------------------------------------------------------- FLAC mapping

@pytest.mark.parametrize("mode", ["lr", "ms", "auto"])
def test_ogg_flac_roundtrip_stereo(mode):
    s = np.stack([_wave(6000, 1), _wave(6000, 2)], axis=1).astype(np.int16)
    data = encode_ogg_flac(s, 44100, blocksize=1024, stereo=mode)
    meta = probe_ogg_flac(data)
    assert (meta["sample_rate"], meta["channels"], meta["n_samples"]) == \
        (44100, 2, 6000)
    d = decode_ogg_flac(data)
    assert np.array_equal(d["samples"], s.astype(np.int64))


def test_ogg_flac_mono_and_granule_crosscheck():
    s = _wave(3001, 3)
    data = encode_ogg_flac(s, 8000, blocksize=256)
    assert probe_ogg_flac(data)["n_samples"] == 3001
    # tamper with the terminal granule -> cross-check fires (re-CRC the page)
    raw = bytearray(data)
    last = raw.rindex(b"OggS")
    struct.pack_into("<Q", raw, last + 6, 999999)
    raw[last + 22:last + 26] = b"\x00\x00\x00\x00"
    nsegs = raw[last + 26]
    body_end = last + 27 + nsegs + sum(raw[last + 27:last + 27 + nsegs])
    crc = _crc32_ogg(bytes(raw[last:body_end]))
    raw[last + 22:last + 26] = struct.pack("<I", crc)
    with pytest.raises(ValueError, match="granule"):
        probe_ogg_flac(bytes(raw))


def test_ogg_flac_rejects_non_flac_mapping():
    data = encode_ogg([(b"\x01vorbis-ish", 0), (b"xx", 1)])
    with pytest.raises(ValueError, match="FLAC mapping"):
        probe_ogg_flac(data)


# ------------------------------------------------------- spark operators

def test_audio_operators_on_ogg(spark):
    from rastertiler_rs_spark.operators.multimodal import (
        audio_features, audio_probe)

    df = spark.read.parquet(ogg_parquet(5))
    feats = {r["audio_id"]: r for r in audio_features(df).collect()}
    probes = {r["audio_id"]: r for r in audio_probe(df).collect()}
    assert len(feats) == 5 and len(probes) == 5
    for i in range(5):
        rate, ch, nf = flac_params(i + 3)
        s = flac_sample(i + 3, nf * ch).astype(np.int64)
        f = feats[f"ogg{i:08d}"]
        assert f["sample_rate"] == rate and f["channels"] == ch
        assert f["n_samples"] == nf * ch
        assert f["peak"] == int(np.abs(s).max())
        assert f["sum_sq"] == int((s * s).sum())
        p = probes[f"ogg{i:08d}"]
        assert p["container"] == "ogg"
        # probe n_samples is the STREAMINFO per-channel count
        assert p["sample_rate"] == rate and p["n_samples"] == nf
