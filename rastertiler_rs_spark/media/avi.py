"""AVI (RIFF) muxer, prober, and demuxer — from the public AVI RIFF
File Reference (Microsoft multimedia file formats; OpenDML AVI), no
external libraries.

This closes the "non-MP4 demux" gap the earlier rounds documented: the
video modality now has a SECOND real container next to ISO BMFF, so
Motion-JPEG pixel decode (operators/multimodal.video_frame_stats) works
for .avi inputs end to end with the engine's own codecs. Like
media/mp4.py this is CONTAINER support — `demux_avi` returns the stored
codec bitstream per frame chunk; decoding non-MJPEG payloads stays the
documented environment-blocked stub. The reference engine
(rastertiler-rs) has no video surface; this backs the north-star
multimodal extension.

Byte layout notes (all integers LITTLE-endian — RIFF, unlike BMFF):
- chunk = 4cc id | u32 size | payload | pad byte iff size is odd
  (chunks are word-aligned; the size field excludes the pad)
- list  = 'RIFF'/'LIST' | u32 size | 4cc form type | children
- tree  = RIFF('AVI ')
            LIST('hdrl') avih(MainAVIHeader 56B)
                         LIST('strl') strh(AVIStreamHeader 56B)
                                      strf(BITMAPINFOHEADER 40B)
            LIST('movi') '00dc' frame chunks
            idx1(16B entries: ckid | flags | offset | size) — offsets
            are relative to the position of the 'movi' form fourcc
            (the dominant writer convention; the parser also accepts
            absolute file offsets, which some muxers emit).
- duration: strh dwScale/dwRate is the exact frame clock;
  duration_ms = dwLength * dwScale * 1000 // dwRate. The writer pins
  dwScale=1, dwRate=fps with fps | 1000 so every derived duration is
  integral (same contract as media/mp4.encode_mp4) and the avih
  dwMicroSecPerFrame = 10^6/fps stays exact.
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(form: bytes, children: bytes) -> bytes:
    return _chunk(b"LIST", form + children)


def encode_avi(frames: list[bytes], width: int, height: int, fps: int,
               codec: bytes = b"MJPG") -> bytes:
    """Mux pre-encoded frame payloads into a structurally valid AVI.

    One 'vids' stream, one '00dc' chunk per frame inside LIST('movi'),
    plus a complete idx1 index (AVIF_HASINDEX set) — so both demux
    strategies (chunk walk and index walk) see the same frames.
    ``fps`` must divide 1000 for integral durations (see module note).
    """
    if fps <= 0 or 1000 % fps:
        raise ValueError(f"fps must divide 1000 for integral durations, got {fps}")
    if len(codec) != 4:
        raise ValueError(f"codec fourcc must be 4 bytes, got {codec!r}")
    n = len(frames)
    max_frame = max((len(f) for f in frames), default=0)

    avih = _chunk(b"avih", struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,            # dwMicroSecPerFrame (exact: fps | 1000)
        max_frame * fps,             # dwMaxBytesPerSec (advisory)
        0,                           # dwPaddingGranularity
        AVIF_HASINDEX,               # dwFlags
        n,                           # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        max_frame,                   # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0))                 # dwReserved[4]
    strh = _chunk(b"strh", b"vids" + codec + struct.pack(
        "<IHHIIIIIIiI4h",
        0, 0, 0,                     # dwFlags, wPriority, wLanguage
        0,                           # dwInitialFrames
        1, fps,                      # dwScale, dwRate (exact frame clock)
        0, n,                        # dwStart, dwLength (in frames)
        max_frame,                   # dwSuggestedBufferSize
        -1,                          # dwQuality (driver default)
        0,                           # dwSampleSize (0 = variable, one frame/chunk)
        0, 0, width, height))        # rcFrame
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24,    # biSize..biBitCount
        codec,                       # biCompression (fourcc, not LE int)
        0, 0, 0, 0, 0))              # biSizeImage..biClrImportant
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_children = bytearray()
    index = bytearray()
    for f in frames:
        # idx1 offsets point at the chunk's ckid, relative to the
        # position of the 'movi' fourcc (offset 0 == the fourcc itself,
        # so the first chunk sits at offset 4).
        index += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME,
                                       4 + len(movi_children), len(f))
        movi_children += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_children))
    idx1 = _chunk(b"idx1", bytes(index))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling chunks,
    honoring word alignment. For LIST/RIFF chunks the payload INCLUDES
    the form fourcc (callers skip 4 to descend)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size, = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"corrupt chunk {fourcc!r} at {pos}: size {size}")
        yield fourcc, body, body + size
        pos = body + size + (size % 2)


def _find_list(data: bytes, start: int, end: int, form: bytes) -> tuple[int, int]:
    for fourcc, b, e in _walk(data, start, end):
        if fourcc == b"LIST" and data[b:b + 4] == form:
            return b + 4, e
    raise ValueError(f"LIST({form!r}) not found")


def _find_chunk(data: bytes, start: int, end: int, fourcc: bytes) -> tuple[int, int]:
    for fcc, b, e in _walk(data, start, end):
        if fcc == fourcc:
            return b, e
    raise ValueError(f"chunk {fourcc!r} not found")


def _riff_body(data: bytes) -> tuple[int, int]:
    if data[:4] != b"RIFF" or len(data) < 12:
        raise ValueError("not a RIFF file")
    size, = struct.unpack_from("<I", data, 4)
    if data[8:12] != b"AVI ":
        raise ValueError(f"RIFF form is {data[8:12]!r}, not 'AVI '")
    if 8 + size > len(data):
        raise ValueError(f"RIFF size {size} overruns file of {len(data)}")
    return 12, 8 + size


def probe_avi(data: bytes) -> dict:
    """Stream metadata from the header lists — no payload decode.

    Returns width, height, n_frames, duration_ms, fps components
    (scale/rate), and the codec fourcc. The avih and strh/strf views of
    the same facts must AGREE (frame count, geometry, fourcc) — metadata
    from an internally inconsistent header would silently be wrong, so
    disagreement raises (same fail-fast stance as media/mp3.probe_mp3).
    """
    body_b, body_e = _riff_body(data)
    hdrl_b, hdrl_e = _find_list(data, body_b, body_e, b"hdrl")

    avih_b, avih_e = _find_chunk(data, hdrl_b, hdrl_e, b"avih")
    if avih_e - avih_b < 40:
        raise ValueError("avih too short")
    (usec_pf, _mbps, _pad, flags, total_frames, _init, n_streams, _buf,
     width, height) = struct.unpack_from("<IIIIIIIIII", data, avih_b)

    strl_b, strl_e = _find_list(data, hdrl_b, hdrl_e, b"strl")
    strh_b, strh_e = _find_chunk(data, strl_b, strl_e, b"strh")
    if strh_e - strh_b < 48:
        raise ValueError("strh too short")
    fcc_type = data[strh_b:strh_b + 4]
    if fcc_type != b"vids":
        raise ValueError(f"first stream is {fcc_type!r}, not 'vids'")
    handler = data[strh_b + 4:strh_b + 8]
    scale, rate, _start, length = struct.unpack_from("<IIII", data, strh_b + 20)
    if rate == 0 or scale == 0:
        raise ValueError("strh rate/scale is zero")

    strf_b, strf_e = _find_chunk(data, strl_b, strl_e, b"strf")
    if strf_e - strf_b < 40:
        raise ValueError("strf too short")
    bi_w, bi_h = struct.unpack_from("<ii", data, strf_b + 4)
    compression = data[strf_b + 16:strf_b + 20]

    if total_frames != length:
        raise ValueError(
            f"avih dwTotalFrames {total_frames} != strh dwLength {length}")
    if (bi_w, abs(bi_h)) != (width, height):
        raise ValueError(
            f"strf geometry {(bi_w, abs(bi_h))} != avih {(width, height)}")
    if compression != handler:
        raise ValueError(
            f"strf biCompression {compression!r} != strh handler {handler!r}")

    return {
        "width": width,
        "height": height,
        "n_frames": length,
        "duration_ms": length * scale * 1000 // rate,
        "scale": scale,
        "rate": rate,
        "usec_per_frame": usec_pf,
        "has_index": bool(flags & AVIF_HASINDEX),
        "codec": handler.decode("latin-1"),
    }


def demux_avi(data: bytes) -> list[bytes]:
    """Extract every video frame's stored payload.

    Walks LIST('movi') for '00dc'/'00db' chunks (word-aligned), then
    CROSS-CHECKS the result against the idx1 index when present: entry
    count, per-entry size, and per-entry offset (movi-relative per the
    dominant convention, or absolute — both accepted) must all point at
    the chunks the walk found, else the container is inconsistent and
    this raises rather than guessing which witness to trust.
    """
    body_b, body_e = _riff_body(data)
    movi_b, movi_e = _find_list(data, body_b, body_e, b"movi")

    frames: list[bytes] = []
    positions: list[tuple[int, int]] = []  # (ckid file pos, payload size)
    for fcc, b, e in _walk(data, movi_b, movi_e):
        if fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
            frames.append(data[b:e])
            positions.append((b - 8, e - b))
        elif fcc == b"LIST" and data[b:b + 4] == b"rec ":
            for f2, b2, e2 in _walk(data, b + 4, e):
                if f2[2:4] in (b"dc", b"db") and f2[:2].isdigit():
                    frames.append(data[b2:e2])
                    positions.append((b2 - 8, e2 - b2))

    try:
        idx_b, idx_e = _find_chunk(data, body_b, body_e, b"idx1")
    except ValueError:
        return frames  # no index; the chunk walk stands alone

    n_entries = (idx_e - idx_b) // 16
    entries = [struct.unpack_from("<4sIII", data, idx_b + 16 * i)
               for i in range(n_entries)]
    entries = [(ck, off, sz) for ck, _flags, off, sz in entries
               if ck[2:4] in (b"dc", b"db")]
    if len(entries) != len(frames):
        raise ValueError(
            f"idx1 lists {len(entries)} video chunks, movi walk found {len(frames)}")
    movi_fourcc_pos = movi_b - 4  # offsets are relative to the 'movi' fourcc
    for i, ((ck, off, sz), (pos, size)) in enumerate(zip(entries, positions)):
        if sz != size:
            raise ValueError(f"idx1 entry {i} size {sz} != chunk size {size}")
        if movi_fourcc_pos + off != pos and off != pos:  # relative | absolute
            raise ValueError(
                f"idx1 entry {i} offset {off} matches neither movi-relative "
                f"({pos - movi_fourcc_pos}) nor absolute ({pos}) position")
    return frames
