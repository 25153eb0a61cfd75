"""FLAC codec tests (media/flac.py, RFC 9639): exact round-trips over
every stereo assignment and predictor family, frame/stream integrity
checks (CRC-8, CRC-16, MD5), probe fields, and the Spark audio
operators consuming fmt='flac'."""

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import (
    flac_params, flac_parquet, flac_sample)
from rastertiler_rs_spark.media.flac import (
    _read_coded_number, _write_coded_number, decode_flac, encode_flac,
    probe_flac)
from rastertiler_rs_spark.media.mp3 import _BitReader, _BitWriter


def _wave(n, seed=0):
    rng = np.random.default_rng(seed)
    k = np.arange(n)
    smooth = (4000 * np.sin(k / 37.0) + 2500 * np.sin(k / 11.0)).astype(
        np.int64)
    return (smooth + rng.integers(-40, 41, n)).astype(np.int16)


# ------------------------------------------------------------ round-trips

@pytest.mark.parametrize("mode", ["lr", "ms", "ls", "rs", "auto"])
def test_stereo_roundtrip_all_assignments(mode):
    s = np.stack([_wave(5000, 1), _wave(5000, 2)], axis=1).astype(np.int16)
    data = encode_flac(s, 44100, blocksize=1024, stereo=mode)
    d = decode_flac(data)
    assert d["sample_rate"] == 44100 and d["channels"] == 2
    assert np.array_equal(d["samples"], s.astype(np.int64))
    # real compression, not verbatim passthrough
    assert len(data) < s.nbytes


def test_mono_roundtrip_partial_final_block():
    s = _wave(3333, 3)                      # 3333 % 1024 != 0
    data = encode_flac(s, 8000, blocksize=1024)
    d = decode_flac(data)
    assert d["channels"] == 1
    assert np.array_equal(d["samples"], s.astype(np.int64))


def test_noise_takes_rice_escape_and_roundtrips():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, 4096).astype(np.int16)
    data = encode_flac(s, 16000, blocksize=512)
    assert np.array_equal(decode_flac(data)["samples"], s.astype(np.int64))


def test_constant_and_extreme_values():
    for v in (0, 32767, -32768):
        s = np.full(700, v, np.int16)
        data = encode_flac(s, 8000, blocksize=256)
        assert np.array_equal(decode_flac(data)["samples"],
                              np.full(700, v, np.int64))


def test_fixture_wave_roundtrip_matches_formula():
    i = 5
    rate, ch, nf = flac_params(i)
    s = flac_sample(i, nf * ch)
    shaped = s if ch == 1 else s.reshape(nf, ch)
    d = decode_flac(encode_flac(shaped, rate, blocksize=256, stereo="auto"))
    assert d["sample_rate"] == rate and d["channels"] == ch
    got = np.asarray(d["samples"]).reshape(-1)
    assert np.array_equal(got, s.astype(np.int64))


def test_many_frames_multibyte_frame_numbers():
    """≥128 frames forces the UTF-8-style coded frame number into its
    multi-byte form inside real frame headers (regression: the lead
    byte's one-bit prefix was one bit short)."""
    s = _wave(150 * 256, 10)
    data = encode_flac(s, 8000, blocksize=256)
    assert np.array_equal(decode_flac(data)["samples"], s.astype(np.int64))


# ---------------------------------------------------------------- probe

def test_probe_fields():
    s = np.stack([_wave(2000, 4), _wave(2000, 5)], axis=1).astype(np.int16)
    meta = probe_flac(encode_flac(s, 48000, blocksize=512))
    assert meta["sample_rate"] == 48000
    assert meta["channels"] == 2
    assert meta["bits_per_sample"] == 16
    assert meta["n_samples"] == 2000
    assert len(meta["md5"]) == 16


def test_probe_rejects_non_flac():
    with pytest.raises(ValueError, match="fLaC"):
        probe_flac(b"RIFF1234WAVE")


# ------------------------------------------------------------- integrity

def test_corrupt_frame_body_fails_crc16():
    s = _wave(1000, 6)
    data = bytearray(encode_flac(s, 8000, blocksize=256))
    meta = probe_flac(bytes(data))
    data[-40] ^= 0x10                       # flip a bit in the last frame
    assert meta["frames_offset"] < len(data) - 40
    with pytest.raises(ValueError, match="CRC|MD5|sync|reserved|partition"):
        decode_flac(bytes(data))


def test_corrupt_header_fails_crc8():
    s = _wave(600, 8)
    data = bytearray(encode_flac(s, 8000, blocksize=256))
    off = probe_flac(bytes(data))["frames_offset"]
    data[off + 3] ^= 0x01                   # inside the first frame header
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_md5_mismatch_detected():
    s = _wave(500, 9)
    data = bytearray(encode_flac(s, 8000, blocksize=256))
    data[30] ^= 0xFF                        # clobber STREAMINFO md5 byte
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    decode_flac(bytes(data), verify=False)  # opt-out path still decodes


# ------------------------------------------------------------ primitives

@pytest.mark.parametrize("v", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF,
                               123456789, (1 << 36) - 1])
def test_coded_number_roundtrip(v):
    w = _BitWriter()
    _write_coded_number(w, v)
    assert _read_coded_number(_BitReader(w.getvalue())) == v


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="int16"):
        encode_flac(np.zeros(10, np.int32), 8000)
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.zeros(0, np.int16), 8000)
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(np.zeros(10, np.int16), 8000, stereo="xy")


# ------------------------------------------------------- spark operators

def test_audio_operators_on_flac(spark):
    from rastertiler_rs_spark.operators.multimodal import (
        audio_features, audio_probe)

    df = spark.read.parquet(flac_parquet(6))
    feats = {r["audio_id"]: r for r in audio_features(df).collect()}
    probes = {r["audio_id"]: r for r in audio_probe(df).collect()}
    assert len(feats) == 6 and len(probes) == 6
    for i in range(6):
        rate, ch, nf = flac_params(i)
        s = flac_sample(i, nf * ch).astype(np.int64)
        f = feats[f"flc{i:08d}"]
        assert f["sample_rate"] == rate and f["channels"] == ch
        assert f["n_samples"] == nf * ch
        assert f["peak"] == int(np.abs(s).max())
        assert f["sum_sq"] == int((s * s).sum())
        p = probes[f"flc{i:08d}"]
        assert p["sample_rate"] == rate and p["channels"] == ch
