"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with (fmt, w, h) metadata
— exactly the engine's native images table shape. The Spark-side
plumbing (schemas, Arrow batching, partition behavior) is real and
tested; PNG decode/resize/feature-extract is fully implemented via the
engine codec (png/codec.py), and baseline JPEG likewise via the
from-spec numpy codec (jpeg/codec.py: sequential 8-bit huffman+IDCT,
gray + YCbCr up to 2x2 sampling). CONTAINER-level audio/video support
is real too: MP4 probe + sample demux via the from-spec ISO BMFF
walker, AVI probe + frame demux via the from-spec RIFF walker (movi
chunk walk cross-checked against idx1), and MP3 framing metadata via
the Layer III header walk (media/mp4.py, media/avi.py, media/mp3.py).
Video PIXEL decode is real for TWO codec families in THREE containers
(video_frame_stats: Motion-JPEG via BMFF or RIFF demux + baseline
JPEG decode, VP8 keyframes via EBML WebM demux + webp/vp8.py — all
from spec), and WebP decode is real for BOTH variants — lossless
(full VP8L, webp/codec.py) and lossy (VP8 keyframe family,
webp/vp8.py; outside its documented family it raises naming the
missing piece). MP3 payload decode is real for the verified Layer III
family (media/mp3.py). Codecs still absent from this container
(non-(MJPEG|VP8) video payloads, VP8X extended webp) have two
clearly-separated modes:

- default: raise NotImplementedError with the batch signature a
  production codec would drop into (honest environment-blocked stub);
- ``fake_codecs=True``: a DETERMINISTIC FAKE decode — pixels are a
  reproducible pure function of the payload bytes (crc32-seeded
  gradient), never a real decode. This exists so the downstream
  plumbing (resize, features, frame explode: schemas, batching,
  partitioning) can be exercised and tested end-to-end for those
  formats inside this container. Production builds replace the fake
  with libwebp/pyav bindings and delete nothing else.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..png import decode_png, encode_grayscale8
from ..fixtures import NODATA

_SUPPORTED = ("png;u8", "png;u32")


def _fake_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """DETERMINISTIC FAKE (not a real codec): reproducible u8 band from
    the payload's crc32 — same modular-gradient family as the fixture
    generator, so every downstream op behaves like it would on real
    pixels (value range 1..255, stable across engines/runs)."""
    seed = zlib.crc32(data) & 0xFF
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((r * 31 + c * 17 + seed) % 255 + 1).astype(np.uint8)


def _decode_any(data: bytes, fmt: str, w: int = 0, h: int = 0,
                fake_codecs: bool = False) -> np.ndarray:
    if fmt.startswith("png"):
        return decode_png(data)["pixels"]
    if fmt.startswith("jpeg"):
        from ..jpeg import decode_jpeg

        arr = decode_jpeg(data)
        if arr.ndim == 3:  # color: luma for the single-band operators
            arr = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                   + 0.114 * arr[:, :, 2])
            arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
        return arr
    if fmt.startswith("webp"):
        if fake_codecs:
            # legacy plumbing tests feed arbitrary bytes under this flag
            return _fake_decode(data, int(w), int(h))
        from ..webp import decode_webp

        rgba = decode_webp(data)  # REAL for VP8L lossless, lossy VP8
        # keyframes, and VP8X extended stills/animations (first
        # composed canvas) — webp/codec.py + webp/vp8.py
        arr = (0.299 * rgba[:, :, 0] + 0.587 * rgba[:, :, 1]
               + 0.114 * rgba[:, :, 2])
        return np.clip(np.round(arr), 0, 255).astype(np.uint8)
    if fmt.startswith("gif"):
        from ..gif import decode_gif

        rgb = decode_gif(data)[0]  # first composed frame, REAL (LZW)
        arr = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
               + 0.114 * rgb[:, :, 2])
        return np.clip(np.round(arr), 0, 255).astype(np.uint8)
    if fmt.startswith("tif"):
        from ..geotiff import read_geotiff

        band = read_geotiff(data)["pixels"]
        if band.dtype != np.uint8:
            raise ValueError("single-band image ops take 8-bit TIFFs "
                             f"(got {band.dtype})")
        return band
    raise ValueError(f"unknown image fmt {fmt!r}")


def image_metadata(images: DataFrame) -> DataFrame:
    """Decode headers and cross-check declared vs actual dimensions:
    (image_id, fmt, decl_w, decl_h, actual_w, actual_h, dims_match)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "fmt": [], "decl_w": [], "decl_h": [],
                   "actual_w": [], "actual_h": [], "dims_match": []}
            for row in pdf.itertuples(index=False):
                if row.fmt.startswith("jpeg"):
                    from ..jpeg import jpeg_dims

                    aw, ah, _ = jpeg_dims(bytes(row.bytes))
                elif row.fmt.startswith("webp"):
                    from ..webp import probe_webp

                    meta = probe_webp(bytes(row.bytes))
                    aw, ah = meta["width"], meta["height"]
                elif row.fmt.startswith("gif"):
                    from ..gif import gif_probe

                    meta = gif_probe(bytes(row.bytes))
                    aw, ah = meta["width"], meta["height"]
                elif row.fmt.startswith("tif"):
                    from ..geotiff import _meta_from_tags, _parse_ifd

                    d = bytes(row.bytes)
                    meta = _meta_from_tags(
                        _parse_ifd(lambda o, s, _d=d: _d[o: o + s]))
                    aw, ah = meta["width"], meta["height"]
                else:
                    d = decode_png(bytes(row.bytes))
                    aw, ah = d["width"], d["height"]
                out["image_id"].append(row.image_id)
                out["fmt"].append(row.fmt)
                out["decl_w"].append(int(row.w))
                out["decl_h"].append(int(row.h))
                out["actual_w"].append(aw)
                out["actual_h"].append(ah)
                out["dims_match"].append(aw == row.w and ah == row.h)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, "image_id string, fmt string, decl_w int, decl_h int, "
            "actual_w int, actual_h int, dims_match boolean")


def _mode_resample(band: np.ndarray, target: int, nodata: int) -> np.ndarray:
    """Majority (mode) resample — the categorical-raster rule the
    north star names beside nearest. Each SOURCE pixel votes in
    destination cell (r*target//h, c*target//w) — an exact integer
    partition of the grid; nodata pixels do not vote; the winner is
    the most frequent value with ties broken to the SMALLEST value;
    a cell with no votes stays nodata. Every clause is integer and
    order-free, so a SQL twin can restate it verbatim. Vectorized:
    one np.unique over packed (cell, value) keys + a lexsort argmax —
    no per-cell python loop."""
    h, w = band.shape
    if target > h or target > w:
        raise ValueError(
            f"mode resample is a downsampling rule: target {target} "
            f"exceeds source {h}x{w}")
    r_dst = (np.arange(h, dtype=np.int64) * target) // h
    c_dst = (np.arange(w, dtype=np.int64) * target) // w
    cell = (r_dst[:, None] * target + c_dst[None, :]).reshape(-1)
    v = band.reshape(-1).astype(np.int64)
    keep = v != nodata
    cell, v = cell[keep], v[keep]
    out = np.full(target * target, nodata, dtype=band.dtype)
    if cell.size:
        pairs, counts = np.unique(cell << 33 | v, return_counts=True)
        ucell, uval = pairs >> 33, pairs & ((1 << 33) - 1)
        order = np.lexsort((uval, -counts, ucell))
        ucell, uval = ucell[order], uval[order]
        first = np.ones(ucell.size, bool)
        first[1:] = ucell[1:] != ucell[:-1]
        out[ucell[first]] = uval[first].astype(band.dtype)
    return out.reshape(target, target)


def _average_resample(band: np.ndarray, target: int,
                      nodata: int) -> np.ndarray:
    """AVERAGE (box-mean) resample — gdaladdo's default overview rule
    for continuous rasters, in exact integers: each source pixel
    belongs to dst cell (r*target//h, c*target//w) (the same exact
    integer grid partition as mode), nodata pixels are excluded, the
    cell value is the round-half-up mean (2·sum + cnt) // (2·cnt) of
    its valid members, and a cell with no valid member stays nodata.
    Sums fit int64 by construction (≤ 255·h·w), values are ≥ 1 so a
    rounded mean can never collide with nodata=0. Downsampling only."""
    h, w = band.shape
    if target > h or target > w:
        raise ValueError(
            f"average resample is a downsampling rule: target {target} "
            f"exceeds source {h}x{w}")
    r_dst = (np.arange(h, dtype=np.int64) * target) // h
    c_dst = (np.arange(w, dtype=np.int64) * target) // w
    cell = (r_dst[:, None] * target + c_dst[None, :]).reshape(-1)
    v = band.reshape(-1).astype(np.int64)
    keep = v != nodata
    sums = np.zeros(target * target, np.int64)
    cnts = np.zeros(target * target, np.int64)
    np.add.at(sums, cell[keep], v[keep])
    np.add.at(cnts, cell[keep], 1)
    out = np.full(target * target, nodata, dtype=band.dtype)
    nz = cnts > 0
    out[nz] = ((2 * sums[nz] + cnts[nz]) // (2 * cnts[nz])).astype(band.dtype)
    return out.reshape(target, target)


def _bilinear_resample(band: np.ndarray, target: int,
                       nodata: int) -> np.ndarray:
    """Exact fixed-point bilinear: the source coordinate of dst index
    i is (i+0.5)·src/dst − 0.5 = N/(2·dst) with N = (2i+1)·src − dst,
    so corner weights are integers over denominator (2·dst)² and the
    blend is a single round-half-up integer division — bit-identical
    across engines (the DuckDB twin restates the same arithmetic).
    Indices clamp (edge replication); if ANY of the 4 source corners
    is nodata the output pixel is nodata (strict propagation — a
    half-blended nodata value is meaningless)."""
    h, w = band.shape
    b = band.astype(np.int64)
    d2 = 2 * target

    def axis(s: int):
        n = (2 * np.arange(target, dtype=np.int64) + 1) * s - target
        x0 = np.floor_divide(n, d2)
        f = n - x0 * d2                       # in [0, 2·dst)
        return (np.clip(x0, 0, s - 1), np.clip(x0 + 1, 0, s - 1), f)

    r0, r1, fr = axis(h)
    c0, c1, fc = axis(w)
    wr1, wc1 = fr[:, None], fc[None, :]
    wr0, wc0 = d2 - wr1, d2 - wc1
    p00, p01 = b[r0][:, c0], b[r0][:, c1]
    p10, p11 = b[r1][:, c0], b[r1][:, c1]
    num = p00 * wr0 * wc0 + p01 * wr0 * wc1 \
        + p10 * wr1 * wc0 + p11 * wr1 * wc1
    den = d2 * d2
    out = (num + den // 2) // den
    any_nd = ((p00 == nodata) | (p01 == nodata)
              | (p10 == nodata) | (p11 == nodata))
    return np.where(any_nd, nodata, out).astype(band.dtype)


def resize_images(images: DataFrame, target: int,
                  fake_codecs: bool = False,
                  method: str = "nearest") -> DataFrame:
    """Resize to target x target: (image_id, bytes). ``method``
    'nearest' is the kernel's K2 index rule (idx = floor((i+0.5)*
    src/dst), clamped); 'mode' is the majority rule for categorical
    rasters (see _mode_resample — downsampling only); 'bilinear' is
    the exact fixed-point 4-corner blend (see _bilinear_resample —
    strict nodata propagation); 'average' is the box-mean overview
    rule (see _average_resample — round-half-up mean of the valid
    members of each exact grid cell, downsampling only). Real decode for
    png;u8, jpeg, gif, and webp (both VP8L lossless and the VP8
    keyframe family — from-spec codecs); ``fake_codecs`` keeps the
    legacy deterministic-fake webp path for plumbing tests that feed
    arbitrary bytes."""
    if method not in ("nearest", "mode", "bilinear", "average"):
        raise ValueError(f"unknown resize method {method!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": []}
            for row in pdf.itertuples(index=False):
                if (row.fmt == "png;u8" or row.fmt.startswith("jpeg")
                        or row.fmt.startswith("gif")
                        or (row.fmt.startswith("webp") and not fake_codecs)):
                    band = _decode_any(bytes(row.bytes), row.fmt)
                elif row.fmt.startswith("webp") and fake_codecs:
                    band = _fake_decode(bytes(row.bytes), int(row.w), int(row.h))
                else:
                    raise NotImplementedError(f"resize for {row.fmt!r} is stubbed")
                h, w = band.shape
                if method == "mode":
                    resized = _mode_resample(band, target, NODATA)
                elif method == "bilinear":
                    resized = _bilinear_resample(band, target, NODATA)
                elif method == "average":
                    resized = _average_resample(band, target, NODATA)
                else:
                    rows_i = ((np.arange(target) + 0.5) * h / target).astype(np.int64)
                    cols_i = ((np.arange(target) + 0.5) * w / target).astype(np.int64)
                    resized = band[np.minimum(rows_i, h - 1)[:, None],
                                   np.minimum(cols_i, w - 1)[None, :]]
                out["image_id"].append(row.image_id)
                out["bytes"].append(encode_grayscale8(resized, NODATA))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, "image_id string, bytes binary")


def image_features(images: DataFrame, fake_codecs: bool = False) -> DataFrame:
    """Feature extraction over the opaque binary column: integer pixel
    statistics per image — (image_id, n_pixels, n_data, vmin, vmax,
    vsum, mean_x100, pos_sum). nodata (0) pixels are excluded from the
    value stats; an all-nodata image reports vmin=vmax=mean_x100=0.
    pos_sum is a position-weighted checksum (sum of v * row-major
    index) that pins WHERE each pixel sits, not just the histogram.
    All outputs integer ⇒ deterministic across runs/engines; values
    are pinned exactly against a numpy recomputation in tests.

    Real decode for PNG (u8 and u32), baseline JPEG, and WebP (VP8L
    lossless and the VP8 keyframe family); ``fake_codecs`` keeps the
    legacy deterministic-fake webp path for plumbing tests."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "n_pixels": [], "n_data": [],
                   "vmin": [], "vmax": [], "vsum": [], "mean_x100": [],
                   "pos_sum": []}
            for row in pdf.itertuples(index=False):
                band = _decode_any(bytes(row.bytes), row.fmt, row.w, row.h,
                                   fake_codecs)
                flat = band.reshape(-1).astype(np.int64)
                mask = flat != NODATA
                vals = flat[mask]
                n_data = int(vals.size)
                vsum = int(vals.sum()) if n_data else 0
                out["image_id"].append(row.image_id)
                out["n_pixels"].append(int(band.size))
                out["n_data"].append(n_data)
                out["vmin"].append(int(vals.min()) if n_data else 0)
                out["vmax"].append(int(vals.max()) if n_data else 0)
                out["vsum"].append(vsum)
                out["mean_x100"].append(vsum * 100 // n_data if n_data else 0)
                out["pos_sum"].append(int(
                    (vals * np.flatnonzero(mask)).sum()) if n_data else 0)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, "image_id string, n_pixels long, n_data long, vmin long, "
            "vmax long, vsum long, mean_x100 long, pos_sum long")


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int) -> bytes:
    """Minimal RIFF/WAV writer (PCM16 little-endian, interleaved) — the
    audio analog of the engine's from-scratch PNG codec; no deps."""
    import struct

    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
        b"data", len(data))
    return hdr + data


def parse_wav(data: bytes) -> dict:
    """Minimal RIFF/WAV reader: PCM16 only. Returns dict(sample_rate,
    channels, bits, samples: int16 interleaved)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag, ln = struct.unpack_from("<4sI", data, pos)
        payload = data[pos + 8: pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload)
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    return {"sample_rate": rate, "channels": channels, "bits": bits,
            "samples": np.frombuffer(pcm, dtype=np.int16)}


def audio_resample_stats(audio: DataFrame, out_rate: int) -> DataFrame:
    """Linear sample-rate conversion in EXACT fixed-point integer
    arithmetic — the 1D counterpart of the bilinear image rule, per
    channel: output index j samples source position j·rate/out_rate =
    (j·rate) // out_rate with fraction f = (j·rate) % out_rate, so the
    blend is (u0·(out−f) + u1·f + out//2) // out — one round-half-up
    division, no floats. Arithmetic runs in the UNSIGNED domain
    (u = s + 32768 ∈ [0, 65535]) so every division operand is
    non-negative: numpy floors, DuckDB truncates, and they agree only
    there (the bilinear twin's same trick). n_out = (n·out_rate) //
    rate per channel; the last source index clamps (edge hold).

    Returns one row per (clip, channel): n_out, peak_u, sum_u and a
    position-weighted checksum over the resampled unsigned stream —
    the DuckDB twin (`resamp` leg of media_probe) restates the whole
    chain from the fixture's sample formula. Real decode for WAV,
    FLAC, and Ogg-FLAC via the engine's own codecs."""
    out = int(out_rate)
    if out <= 0:
        raise ValueError("out_rate must be positive")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = {"audio_id": [], "channel": [], "n_out": [],
                   "peak_u": [], "sum_u": [], "pos_sum": []}
            for row in pdf.itertuples(index=False):
                fmt = str(row.fmt)
                if fmt.startswith("wav"):
                    d = parse_wav(bytes(row.bytes))
                elif fmt.startswith(("flac", "ogg")):
                    from ..media.flac import decode_flac
                    from ..media.ogg import decode_ogg_flac

                    dec = (decode_flac if fmt.startswith("flac")
                           else decode_ogg_flac)
                    f = dec(bytes(row.bytes))
                    d = {"sample_rate": f["sample_rate"],
                         "channels": f["channels"],
                         "samples": np.asarray(f["samples"]).reshape(-1)}
                else:
                    raise NotImplementedError(
                        f"codec for {row.fmt!r} not available")
                rate, ch = int(d["sample_rate"]), int(d["channels"])
                inter = d["samples"].astype(np.int64) + 32768
                n_in = inter.size // ch
                n_out = (n_in * out) // rate
                for c in range(ch):
                    u = inter[c::ch]
                    j = np.arange(n_out, dtype=np.int64)
                    num = j * rate
                    x0 = num // out
                    f_ = num - x0 * out
                    x1 = np.minimum(x0 + 1, n_in - 1)
                    v = (u[x0] * (out - f_) + u[x1] * f_
                         + out // 2) // out
                    res["audio_id"].append(row.audio_id)
                    res["channel"].append(c)
                    res["n_out"].append(int(n_out))
                    res["peak_u"].append(int(v.max()) if n_out else 0)
                    res["sum_u"].append(int(v.sum()))
                    res["pos_sum"].append(int((v * (j + 1)).sum()))
            yield pd.DataFrame(res)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        fn, "audio_id string, channel int, n_out long, peak_u long, "
            "sum_u long, pos_sum long")


def audio_features(audio: DataFrame, fake_codecs: bool = False) -> DataFrame:
    """Feature extraction for the audio modality: integer per-clip
    statistics — (audio_id, sample_rate, channels, n_samples,
    duration_ms, peak, sum_sq). Real decode for RIFF/WAV PCM16 via the
    engine's own parser AND for FLAC via the from-spec codec
    (media/flac.py — rice residuals, fixed/LPC predictors, all four
    stereo modes, lossless so the stats equal the WAV twin's exactly);
    other compressed formats (mp3/ogg) raise unless ``fake_codecs``
    opts into the deterministic fake (payload bytes reinterpreted as
    PCM16 at 8 kHz mono). All outputs int64 ⇒ bit-identical across
    engines (sum_sq <= n * 2^30 — overflow-safe to ~2^33 samples per
    clip)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "sample_rate": [], "channels": [],
                   "n_samples": [], "duration_ms": [], "peak": [], "sum_sq": []}
            for row in pdf.itertuples(index=False):
                if row.fmt.startswith("wav"):
                    d = parse_wav(bytes(row.bytes))
                elif row.fmt.startswith(("flac", "ogg")):
                    from ..media.flac import decode_flac
                    from ..media.ogg import decode_ogg_flac

                    dec = (decode_flac if row.fmt.startswith("flac")
                           else decode_ogg_flac)
                    f = dec(bytes(row.bytes))
                    d = {"sample_rate": f["sample_rate"],
                         "channels": f["channels"],
                         "samples": np.asarray(f["samples"]).reshape(-1)}
                elif fake_codecs:
                    raw = bytes(row.bytes)
                    d = {"sample_rate": 8000, "channels": 1,
                         "samples": np.frombuffer(
                             raw[: len(raw) // 2 * 2], dtype=np.int16)}
                else:
                    raise NotImplementedError(
                        f"codec for {row.fmt!r} not available in this environment")
                s = d["samples"].astype(np.int64)
                n = int(s.size)
                out["audio_id"].append(row.audio_id)
                out["sample_rate"].append(d["sample_rate"])
                out["channels"].append(d["channels"])
                out["n_samples"].append(n)
                out["duration_ms"].append(
                    n * 1000 // (d["sample_rate"] * d["channels"]) if n else 0)
                out["peak"].append(int(np.abs(s).max()) if n else 0)
                out["sum_sq"].append(int((s * s).sum()))
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        fn, "audio_id string, sample_rate long, channels long, "
            "n_samples long, duration_ms long, peak long, sum_sq long")


def frame_sample(videos: DataFrame, every_n: int = 30,
                 fake_codecs: bool = False) -> DataFrame:
    """Video frame sampling: binary column in, exploded
    (video_id, frame_no, frame_bytes) out.

    MP4 input (``fmt`` starting with "mp4") and AVI input (``fmt``
    starting with "avi") are REAL: the engine's own ISO BMFF demuxer
    (media/mp4.py) walks stsz/stsc/stco, and the RIFF demuxer
    (media/avi.py) walks LIST('movi') cross-checked against idx1 —
    each emits the byte-exact stored payload of every ``every_n``-th
    sample. That is container demultiplexing, not decoding; turning
    those payloads into pixels stays environment-blocked except
    Motion-JPEG (see video_frame_stats). Other container formats raise
    by default; ``fake_codecs=True`` swaps in the DETERMINISTIC FAKE
    demuxer (frame count = payload_len // 256, each sampled frame a
    crc32-seeded 16x16 PNG) so the explode shape, schema, and batching
    stay testable. A production build plugs pyav/ffmpeg into
    ``_extract`` and changes nothing else."""
    from ..media import demux_avi, demux_mp4

    def _extract(data: bytes, fmt: str, every_n: int):
        if fmt.startswith(("mp4", "avi", "webm")):
            if fmt.startswith("mp4"):
                samples = demux_mp4(data)
            elif fmt.startswith("avi"):
                samples = demux_avi(data)
            else:
                from ..media import demux_webm

                samples = demux_webm(data)
            for frame_no in range(0, len(samples), every_n):
                yield frame_no, samples[frame_no]
            return
        if not fake_codecs:
            raise NotImplementedError(
                f"demuxer for {fmt!r} not available in this environment")
        n_frames = max(1, len(data) // 256)
        for frame_no in range(0, n_frames, every_n):
            band = _fake_decode(data + frame_no.to_bytes(4, "big"), 16, 16)
            yield frame_no, encode_grayscale8(band, NODATA)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = {"video_id": [], "frame_no": [], "frame_bytes": []}
            for row in pdf.itertuples(index=False):
                fmt = str(getattr(row, "fmt", ""))
                for frame_no, frame in _extract(bytes(row.bytes), fmt, every_n):
                    frames["video_id"].append(row.video_id)
                    frames["frame_no"].append(frame_no)
                    frames["frame_bytes"].append(frame)
            yield pd.DataFrame(frames)

    return videos.mapInPandas(fn, "video_id string, frame_no int, frame_bytes binary")


def video_frame_stats(videos: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL end-to-end video pixel decode for TWO codec families in
    THREE containers: Motion-JPEG in ISO BMFF .mp4 and RIFF .avi, VP8
    keyframe streams in EBML .webm (media/webm.py demux + webp/vp8.py
    decode, stats over the luma plane), plus animated GIF
    (gif/codec.py: LZW + frame composition with sub-rects,
    transparency, and disposal) and animated WebP (webp/codec.py
    VP8X+ANIM: per-frame VP8L/VP8 decode + composed-RGBA-canvas
    stats with spec over-blending and dispose-to-background).

    Composes the engine's from-spec codecs: the matching container
    demuxer extracts each sampled frame's stored payload, then the
    matching payload decoder turns it into pixels; integer per-frame
    stats out (all-integer ⇒ bit-identical across engines). Other
    sample-entry codecs (avc1/mp4v/VP9/...) raise — their payload
    decode is genuinely environment-blocked. North-star multimodal
    extension; the reference engine (rastertiler-rs) has no video
    surface."""
    from ..jpeg import decode_jpeg
    from ..media import demux_avi, demux_mp4, probe_avi, probe_mp4

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_no": [], "w": [], "h": [],
                   "n_px": [], "vsum": [], "vmin": [], "vmax": [],
                   "checksum": []}
            for row in pdf.itertuples(index=False):
                fmt = str(row.fmt)
                data = bytes(row.bytes)
                if fmt.startswith("gif"):
                    # animated GIF: pixels are real via the engine's
                    # from-spec LZW decoder; per-frame stats run over
                    # the COMPOSED RGB canvas (sub-rects, transparency,
                    # disposal honored), not the stored sub-rect
                    from ..gif import decode_gif

                    frames_px = [(f, c) for f, c in
                                 enumerate(decode_gif(data))
                                 if f % every_n == 0]
                elif fmt.startswith("webp"):
                    # animated WebP: stats over the fully COMPOSED RGBA
                    # canvas (sub-rects, spec over-blending, disposal
                    # honored by webp/codec.webp_anim_frames); payloads
                    # decode through the engine's VP8L / VP8 coders
                    from ..webp import webp_anim_frames

                    frames_px = [(f, d["canvas"]) for f, d in
                                 enumerate(webp_anim_frames(data))
                                 if f % every_n == 0]
                elif fmt.startswith("apng"):
                    # animated PNG: every frame payload decodes through
                    # the engine's still-PNG decoder (lossless — exact
                    # by construction); stats over the composed RGBA
                    # canvas (sub-rects, blend, dispose honored by
                    # png/apng.apng_frames)
                    from ..png import apng_frames

                    frames_px = [(f, d["canvas"]) for f, d in
                                 enumerate(apng_frames(data))
                                 if f % every_n == 0]
                else:
                    if fmt.startswith("mp4"):
                        probe, demux = probe_mp4, demux_mp4
                    elif fmt.startswith("avi"):
                        probe, demux = probe_avi, demux_avi
                    elif fmt.startswith("webm"):
                        from ..media import demux_webm, probe_webm

                        probe, demux = probe_webm, demux_webm
                    else:
                        raise NotImplementedError(
                            f"container parser for {row.fmt!r} not available")
                    codec = probe(data)["codec"]
                    if codec == "V_VP8":
                        # real VP8 keyframe decode (webp/vp8.py);
                        # stats run over the luma plane (single-band,
                        # like the grayscale MJPEG path)
                        from ..webp.vp8 import decode_vp8_frame

                        frames_px = [(f, decode_vp8_frame(p)["y"])
                                     for f, p in enumerate(demux(data))
                                     if f % every_n == 0]
                    elif codec in ("jpeg", "mjpa", "MJPG"):
                        frames_px = [(f, decode_jpeg(p)) for f, p in
                                     enumerate(demux(data))
                                     if f % every_n == 0]
                    else:
                        raise NotImplementedError(
                            f"payload decode for codec {codec!r} not "
                            "available in this environment (Motion-JPEG "
                            "and VP8 keyframes only)")
                for frame_no, px in frames_px:
                    flat = px.reshape(-1).astype(np.int64)
                    out["video_id"].append(row.video_id)
                    out["frame_no"].append(frame_no)
                    out["h"].append(px.shape[0])
                    out["w"].append(px.shape[1])
                    out["n_px"].append(flat.size)
                    out["vsum"].append(int(flat.sum()))
                    out["vmin"].append(int(flat.min()))
                    out["vmax"].append(int(flat.max()))
                    out["checksum"].append(
                        int(((np.arange(flat.size) + 1) * flat).sum()))
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        fn, "video_id string, frame_no int, w int, h int, n_px long, "
            "vsum long, vmin long, vmax long, checksum long")


def video_probe(videos: DataFrame) -> DataFrame:
    """Container metadata for the video modality — REAL for MP4 via the
    engine's ISO BMFF parser (media/mp4.py: width/height from tkhd,
    sample count from stsz, duration from mvhd normalized to ms, codec
    fourcc from stsd) AND for AVI via the RIFF parser (media/avi.py:
    avih geometry cross-checked against strf, frame count from strh
    dwLength, duration from the scale/rate clock, handler fourcc). No
    payload decode. All-integer outputs ⇒ bit-identical across
    engines."""
    from ..media import probe_avi, probe_mp4

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "width": [], "height": [],
                   "n_frames": [], "duration_ms": [], "codec": []}
            for row in pdf.itertuples(index=False):
                fmt = str(row.fmt)
                if fmt.startswith("mp4"):
                    meta = probe_mp4(bytes(row.bytes))
                    n_frames = meta["n_samples"]
                elif fmt.startswith("avi"):
                    meta = probe_avi(bytes(row.bytes))
                    n_frames = meta["n_frames"]
                elif fmt.startswith("webm"):
                    from ..media import probe_webm

                    meta = probe_webm(bytes(row.bytes))
                    n_frames = meta["n_frames"]
                elif fmt.startswith("gif"):
                    from ..gif import gif_probe

                    g = gif_probe(bytes(row.bytes))
                    meta = {"width": g["width"], "height": g["height"],
                            "duration_ms": g["duration_cs"] * 10,
                            "codec": "gif" + g["version"]}
                    n_frames = g["n_frames"]
                elif fmt.startswith("webp"):
                    from ..webp import probe_webp

                    m = probe_webp(bytes(row.bytes))
                    if not m.get("has_anim"):
                        raise ValueError(
                            "video_probe on a still WebP — animated "
                            "(VP8X+ANIM) files only")
                    meta = {"width": m["width"], "height": m["height"],
                            "duration_ms": m["duration_ms"],
                            "codec": "webpanim"}
                    n_frames = m["n_frames"]
                elif fmt.startswith("apng"):
                    from ..png import probe_apng

                    m = probe_apng(bytes(row.bytes))
                    meta = {"width": m["width"], "height": m["height"],
                            "duration_ms": m["duration_ms"],
                            "codec": "apng"}
                    n_frames = m["n_frames"]
                else:
                    raise NotImplementedError(
                        f"container parser for {row.fmt!r} not available")
                out["video_id"].append(row.video_id)
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["n_frames"].append(n_frames)
                out["duration_ms"].append(meta["duration_ms"])
                out["codec"].append(meta["codec"])
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        fn, "video_id string, width long, height long, n_frames long, "
            "duration_ms long, codec string")


def audio_probe(audio: DataFrame) -> DataFrame:
    """Container metadata for the audio modality — REAL for both RIFF/
    WAV (engine's PCM16 parser) and MP3 (media/mp3.py frame-header
    walk: sync + bitrate/samplerate indices + per-frame padding).
    For MP3 the sample count is derived from framing (1152 samples per
    MPEG-1 Layer III frame) — no Huffman payload decode. n_samples is
    per channel for both containers; duration_ms = n_samples * 1000 //
    sample_rate exactly (integer, oracle-twin-friendly)."""
    from ..media import probe_mp3

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "container": [], "sample_rate": [],
                   "channels": [], "n_samples": [], "duration_ms": []}
            for row in pdf.itertuples(index=False):
                fmt = str(row.fmt)
                if fmt.startswith("wav"):
                    d = parse_wav(bytes(row.bytes))
                    n = int(d["samples"].size) // int(d["channels"])
                    sr, ch, container = d["sample_rate"], d["channels"], "wav"
                elif fmt.startswith("mp3"):
                    m = probe_mp3(bytes(row.bytes))
                    n, sr, ch, container = (m["n_samples"], m["sample_rate"],
                                            m["channels"], "mp3")
                elif fmt.startswith(("flac", "ogg")):
                    from ..media.flac import probe_flac
                    from ..media.ogg import probe_ogg_flac

                    is_ogg = fmt.startswith("ogg")
                    m = (probe_ogg_flac if is_ogg else probe_flac)(
                        bytes(row.bytes))
                    n, sr, ch, container = (m["n_samples"], m["sample_rate"],
                                            m["channels"],
                                            "ogg" if is_ogg else "flac")
                else:
                    raise NotImplementedError(
                        f"container parser for {fmt!r} not available")
                out["audio_id"].append(row.audio_id)
                out["container"].append(container)
                out["sample_rate"].append(sr)
                out["channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // sr)
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        fn, "audio_id string, container string, sample_rate long, "
            "channels long, n_samples long, duration_ms long")


def audio_spectral_stats(audio: DataFrame) -> DataFrame:
    """REAL MP3 payload decode for the verified Layer III family — the
    audio analog of video_frame_stats' MJPEG path.

    Each clip's Huffman-coded granule payloads are decoded by the
    engine's from-spec Layer III pipeline (media/mp3.py
    decode_mp3_spectra: side-info bit layout, scalefactor parse, count1
    table-B Huffman, requantization) to the 576-line spectrum, then
    reduced to integer per-granule stats: nonzero-line count, signed
    sum of the Huffman integers, a position-weighted placement
    checksum, and the requantized-spectrum sum (exact when global_gain
    is 210+4g and scalefactors are zero — |±1|^(4/3)*2^g is an
    integer). All-int64 ⇒ bit-identical across engines. Streams outside
    the family (bit reservoir, big-values tables, count1 table A,
    window switching) fail fast with the exact reason — exactness is
    never traded for completion."""
    from ..media import decode_mp3_spectra

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "frame_no": [], "granule": [],
                   "channel": [], "n_nonzero": [], "sum_is": [],
                   "pos_sum": [], "xr_sum": []}
            for row in pdf.itertuples(index=False):
                if not str(row.fmt).startswith("mp3"):
                    raise NotImplementedError(
                        f"spectral decode for {row.fmt!r} not available")
                dec = decode_mp3_spectra(bytes(row.bytes))
                for ent in dec["granules"]:
                    iv = ent["is_values"]
                    xr = ent["xr"]
                    out["audio_id"].append(row.audio_id)
                    out["frame_no"].append(ent["frame"])
                    out["granule"].append(ent["granule"])
                    out["channel"].append(ent["channel"])
                    out["n_nonzero"].append(int(np.count_nonzero(iv)))
                    out["sum_is"].append(int(iv.sum()))
                    out["pos_sum"].append(
                        int((iv * (np.arange(576, dtype=np.int64) + 1)).sum()))
                    xs = xr.sum()
                    if xs != np.floor(xs):
                        raise ValueError(
                            "non-integer requantized sum — fixture family "
                            "guarantees integer xr (gain 210+4g, zero "
                            f"scalefacs); got {xs!r}")
                    out["xr_sum"].append(int(xs))
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        fn, "audio_id string, frame_no long, granule long, channel long, "
            "n_nonzero long, sum_is long, pos_sum long, xr_sum long")


def image_ahash(images: DataFrame, fake_codecs: bool = False) -> DataFrame:
    """Perceptual AVERAGE-HASH computed FROM the image bytes (the
    from-pixels companion to the table's precomputed phash column):
    decode → 8×8 box-mean resample (_average_resample — the exact
    round-half-up rule the `avg` resize leg pins) → 64-bit hash with
    bit_i = cell_i > m, m = round-half-up mean of the 64 cells
    ((2·Σ + 64) // 128), strict >, ties → 0. Exact integers
    throughout — engine-independent by construction.

    Output coerced into the shared image-stats schema so it unions
    under the gate: n_pixels = 64 (the grid), n_data = popcount,
    vmin/vmax = hash lo/hi 32-bit halves, vsum = m,
    mean_x100 = Σcells (the raw pre-mean pin), pos_sum = Σ i·bit_i
    (position-weighted bit placement)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "n_pixels": [], "n_data": [],
                   "vmin": [], "vmax": [], "vsum": [], "mean_x100": [],
                   "pos_sum": []}
            for row in pdf.itertuples(index=False):
                band = _decode_any(bytes(row.bytes), row.fmt, row.w,
                                   row.h, fake_codecs)
                cells = _average_resample(
                    band.astype(np.int64), 8, 0).astype(np.int64)
                total = int(cells.sum())
                m = (2 * total + 64) // 128
                bits = (cells > m).astype(np.int64).ravel()
                idx = np.arange(64, dtype=np.int64)
                lo = int((bits[:32] << idx[:32]).sum())
                hi = int((bits[32:] << idx[:32]).sum())
                out["image_id"].append(row.image_id)
                out["n_pixels"].append(64)
                out["n_data"].append(int(bits.sum()))
                out["vmin"].append(lo)
                out["vmax"].append(hi)
                out["vsum"].append(m)
                out["mean_x100"].append(total)
                out["pos_sum"].append(int((bits * idx).sum()))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        fn, "image_id string, n_pixels long, n_data long, vmin long, "
            "vmax long, vsum long, mean_x100 long, pos_sum long")
