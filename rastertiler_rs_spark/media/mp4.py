"""Minimal ISO BMFF (MP4) muxer, prober, and demuxer — from the public
ISO/IEC 14496-12 box grammar, no external libraries.

Scope (deliberate): one video track, one chunk layout, version-0 boxes
on the write side; the parse side accepts version 0 AND 1 full-box
headers and any stsc/stco chunking. This is CONTAINER support only —
`demux_mp4` returns the stored codec bitstream per sample; decoding
those payloads (H.264/mp4v/...) is environment-blocked and stays a
documented stub in operators/multimodal.py, exactly like the webp
branch. The reference engine (rastertiler-rs) has no video surface;
this module backs the north-star multimodal extension.

Byte layout notes (all integers big-endian):
- box      = u32 size | 4cc type | payload  (size includes the header)
- full box = box whose payload starts with u8 version | u24 flags
- sample tables: stts (decode deltas), stsc (chunk -> samples-per-chunk
  runs), stsz (per-sample byte sizes), stco/co64 (chunk file offsets).
  A sample's file position = chunk offset + sum of the sizes of the
  prior samples in that chunk — the walk in `demux_mp4`.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + payload)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def encode_mp4(frames: list[bytes], width: int, height: int, fps: int,
               codec: bytes = b"mp4v") -> bytes:
    """Mux pre-encoded frame payloads into a structurally valid MP4.

    Movie timescale is fixed at 1000 (so durations are milliseconds)
    and ``fps`` must divide it — the per-frame delta 1000/fps stays an
    exact integer, which keeps every duration field integral and makes
    the probe's duration_ms SQL-expressible for the oracle twin.
    """
    if fps <= 0 or 1000 % fps:
        raise ValueError(f"fps must divide 1000 for integral durations, got {fps}")
    if len(codec) != 4:
        raise ValueError(f"codec fourcc must be 4 bytes, got {codec!r}")
    n = len(frames)
    delta = 1000 // fps
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    # one chunk, starting right after the mdat header
    chunk_offset = len(ftyp) + 8

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10 + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 3, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16 + _MATRIX
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, duration) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", width, height)
                 + struct.pack(">II", 0x00480000, 0x00480000)
                 + struct.pack(">I", 0) + struct.pack(">H", 1)
                 + b"\x00" * 32 + struct.pack(">Hh", 0x18, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        size, = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            size, = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"corrupt box {typ!r} at {pos}: size {size}")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    for want in path:
        for typ, b, e in _walk(data, start, end):
            if typ == want:
                start, end = b, e
                break
        else:
            raise ValueError(f"box {want!r} not found")
    return start, end


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, first-field offset) of a full box payload."""
    return data[start], start + 4


def probe_mp4(data: bytes) -> dict:
    """Container metadata from the moov tree — no payload decode.

    Returns width, height, n_samples, duration_ms (movie timescale
    normalized to ms), timescale, and the stsd sample-entry fourcc.
    Accepts version-0 and version-1 mvhd/tkhd boxes.
    """
    moov_b, moov_e = _find(data, 0, len(data), b"moov")

    mv_b, _ = _find(data, moov_b, moov_e, b"mvhd")
    ver, p = _fullbox(data, mv_b)
    if ver == 1:
        timescale, = struct.unpack_from(">I", data, p + 16)
        duration, = struct.unpack_from(">Q", data, p + 20)
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")

    trak_b, trak_e = _find(data, moov_b, moov_e, b"trak")
    tk_b, _ = _find(data, trak_b, trak_e, b"tkhd")
    ver, p = _fullbox(data, tk_b)
    geo = p + (32 if ver == 1 else 20) + 16 + 36
    w_fixed, h_fixed = struct.unpack_from(">II", data, geo)

    stbl_b, stbl_e = _find(data, trak_b, trak_e, b"mdia", b"minf", b"stbl")
    stsd_b, _ = _find(data, stbl_b, stbl_e, b"stsd")
    _, p = _fullbox(data, stsd_b)
    fourcc = data[p + 8:p + 12]
    stsz_b, _ = _find(data, stbl_b, stbl_e, b"stsz")
    _, p = _fullbox(data, stsz_b)
    _, n_samples = struct.unpack_from(">II", data, p)

    return {
        "width": w_fixed >> 16,
        "height": h_fixed >> 16,
        "n_samples": n_samples,
        "duration_ms": duration * 1000 // timescale,
        "timescale": timescale,
        "codec": fourcc.decode("latin-1"),
    }


def demux_mp4(data: bytes) -> list[bytes]:
    """Extract every sample's stored payload via the stsz/stsc/stco walk.

    This is real demultiplexing — byte-exact sample payloads out of
    mdat — not decoding. Handles multi-chunk layouts, co64, and the
    stsz uniform-size shortcut.
    """
    moov_b, moov_e = _find(data, 0, len(data), b"moov")
    trak_b, trak_e = _find(data, moov_b, moov_e, b"trak")
    stbl_b, stbl_e = _find(data, trak_b, trak_e, b"mdia", b"minf", b"stbl")

    stsz_b, _ = _find(data, stbl_b, stbl_e, b"stsz")
    _, p = _fullbox(data, stsz_b)
    uniform, n = struct.unpack_from(">II", data, p)
    if uniform:
        sizes = [uniform] * n
    else:
        sizes = list(struct.unpack_from(f">{n}I", data, p + 8))

    try:
        stco_b, _ = _find(data, stbl_b, stbl_e, b"stco")
        _, p = _fullbox(data, stco_b)
        n_chunks, = struct.unpack_from(">I", data, p)
        offsets = list(struct.unpack_from(f">{n_chunks}I", data, p + 4))
    except ValueError:
        co64_b, _ = _find(data, stbl_b, stbl_e, b"co64")
        _, p = _fullbox(data, co64_b)
        n_chunks, = struct.unpack_from(">I", data, p)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, p + 4))

    stsc_b, _ = _find(data, stbl_b, stbl_e, b"stsc")
    _, p = _fullbox(data, stsc_b)
    n_runs, = struct.unpack_from(">I", data, p)
    runs = [struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(n_runs)]

    # expand stsc runs: samples-per-chunk for each chunk 1..n_chunks
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))

    out: list[bytes] = []
    sample = 0
    for chunk, spc in enumerate(per_chunk):
        pos = offsets[chunk]
        for _ in range(spc):
            if sample >= n:
                break
            size = sizes[sample]
            if pos + size > len(data):
                raise ValueError(f"sample {sample} overruns file: {pos}+{size}")
            out.append(data[pos:pos + size])
            pos += size
            sample += 1
    if sample != n:
        raise ValueError(f"chunk tables cover {sample} of {n} samples")
    return out
