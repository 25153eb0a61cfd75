"""WebM (EBML/Matroska) muxer, prober, and demuxer — from the public
specs (RFC 8794 "Extensible Binary Meta Language", the Matroska
element registry, and the WebM Container Guidelines), no external
libraries.

This gives the video modality a THIRD real container next to ISO BMFF
(media/mp4.py) and RIFF AVI (media/avi.py) — the one VP8 streams
actually ship in — so with the from-spec VP8 keyframe codec
(webp/vp8.py) the engine decodes a second video codec family end to
end: WebM demux → VP8 keyframe decode → pixels
(operators/multimodal.video_frame_stats). Like the other two container
modules this is CONTAINER support — `demux_webm` returns the stored
codec bitstream per SimpleBlock; payload decode is the codec layer's
job. The reference engine (rastertiler-rs) has no video surface; this
backs the north-star multimodal extension.

EBML layout notes (integers BIG-endian — EBML, unlike RIFF/BMFF-LE):
- element = ID (VINT, marker bits INCLUDED in the stored bytes, 1-4
  bytes) | size (VINT, marker EXCLUDED from the value, 1-8 bytes) |
  payload. An all-ones size VINT means "unknown size"; this parser
  accepts it ONLY for Segment (treated as to-EOF, the common streaming
  convention) and fails fast anywhere else.
- tree = EBML(DocType "webm") ·
         Segment( Info(TimestampScale, Duration) ·
                  Tracks( TrackEntry(TrackNumber, TrackType=1 video,
                                     CodecID, Video(PixelWidth,
                                                    PixelHeight)) ) ·
                  Cluster(Timestamp ·
                          SimpleBlock(track VINT | s16be relative
                                      timestamp | flags | payload))* )
- clock: TimestampScale is pinned to 1,000,000 ns/tick (ticks are
  MILLISECONDS — the WebM default), so with fps | 1000 every block
  timestamp and the Duration are exact integers (same contract as
  encode_mp4 / encode_avi). The writer opens a new Cluster before a
  relative block timestamp would overflow the s16 field.

Fail-fast cross-checks (same spirit as avi.py's idx1 verification):
DocType must be "webm", exactly one video track is required and every
SimpleBlock must belong to it, lacing (flag bits 0x06) raises
NotImplementedError naming the feature, non-millisecond
TimestampScale and fractional Durations raise, and truncated
VINTs/elements raise ValueError.
"""

from __future__ import annotations

import struct

# Matroska element IDs (stored form, marker bits included)
_EBML = 0x1A45DFA3
_EBML_VERSION = 0x4286
_EBML_READ_VERSION = 0x42F7
_EBML_MAX_ID_LENGTH = 0x42F2
_EBML_MAX_SIZE_LENGTH = 0x42F3
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_DOCTYPE_READ_VERSION = 0x4285
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_FLAG_LACING = 0x9C
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3

_MS_SCALE = 1_000_000  # ns per tick -> ticks are milliseconds


# ------------------------------------------------------------- writer

def _vint_size(value: int) -> bytes:
    """Encode an element SIZE as a VINT (marker excluded from value)."""
    if value < 0:
        raise ValueError("negative EBML size")
    for n in range(1, 9):
        # all-ones is reserved for "unknown size" — stay strictly below
        if value < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError(f"EBML size too large: {value}")


def _id_bytes(element_id: int) -> bytes:
    return element_id.to_bytes((element_id.bit_length() + 7) // 8, "big")


def _elem(element_id: int, payload: bytes) -> bytes:
    return _id_bytes(element_id) + _vint_size(len(payload)) + payload


def _uint(element_id: int, value: int) -> bytes:
    if value < 0:
        raise ValueError("EBML unsigned element got a negative value")
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(element_id, value.to_bytes(n, "big"))


def _float64(element_id: int, value: float) -> bytes:
    return _elem(element_id, struct.pack(">d", value))


def _string(element_id: int, value: str) -> bytes:
    return _elem(element_id, value.encode("ascii"))


def encode_webm(frames: list[bytes], width: int, height: int, fps: int,
                codec_id: str = "V_VP8") -> bytes:
    """Mux pre-encoded frame payloads into a structurally valid WebM.

    One video track (TrackNumber 1), every frame a keyframe-flagged
    SimpleBlock; millisecond timestamp ticks (TimestampScale 10^6).
    ``fps`` must divide 1000 for integral timestamps/durations (the
    same contract as encode_mp4/encode_avi). A new Cluster opens
    before a block's relative timestamp would overflow its s16 field.
    """
    if fps <= 0 or 1000 % fps:
        raise ValueError(
            f"fps must divide 1000 for integral durations, got {fps}")
    if not codec_id or not codec_id.isascii():
        raise ValueError(f"bad codec id {codec_id!r}")
    step = 1000 // fps
    duration_ms = len(frames) * step

    header = _elem(_EBML, b"".join((
        _uint(_EBML_VERSION, 1),
        _uint(_EBML_READ_VERSION, 1),
        _uint(_EBML_MAX_ID_LENGTH, 4),
        _uint(_EBML_MAX_SIZE_LENGTH, 8),
        _string(_DOCTYPE, "webm"),
        _uint(_DOCTYPE_VERSION, 2),
        _uint(_DOCTYPE_READ_VERSION, 2),
    )))
    info = _elem(_INFO, b"".join((
        _uint(_TIMESTAMP_SCALE, _MS_SCALE),
        _float64(_DURATION, float(duration_ms)),
        _string(_MUXING_APP, "rastertiler_rs_spark"),
        _string(_WRITING_APP, "rastertiler_rs_spark"),
    )))
    tracks = _elem(_TRACKS, _elem(_TRACK_ENTRY, b"".join((
        _uint(_TRACK_NUMBER, 1),
        _uint(_TRACK_UID, 1),
        _uint(_TRACK_TYPE, 1),              # 1 = video
        _uint(_FLAG_LACING, 0),
        _string(_CODEC_ID, codec_id),
        _elem(_VIDEO, _uint(_PIXEL_WIDTH, width)
              + _uint(_PIXEL_HEIGHT, height)),
    ))))

    clusters = []
    cluster_t0 = 0
    blocks: list[bytes] = []

    def _flush() -> None:
        if blocks:
            clusters.append(_elem(
                _CLUSTER,
                _uint(_CLUSTER_TIMESTAMP, cluster_t0) + b"".join(blocks)))

    for f, payload in enumerate(frames):
        t = f * step
        rel = t - cluster_t0
        if rel > 32000:                     # s16 headroom
            _flush()
            blocks = []
            cluster_t0 = t
            rel = 0
        blocks.append(_elem(
            _SIMPLE_BLOCK,
            b"\x81" + struct.pack(">h", rel) + b"\x80" + payload))
    _flush()

    segment = _elem(_SEGMENT, info + tracks + b"".join(clusters))
    return header + segment


# ------------------------------------------------------------- parser

def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """VINT at `pos` -> (value, next_pos). keep_marker=True reads an
    element ID (stored form), False reads a size (marker stripped);
    size VINTs of all ones return -1 (unknown size)."""
    if pos >= len(data):
        raise ValueError("truncated EBML VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML VINT (leading zero byte)")
    n = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        n += 1
    if pos + n > len(data):
        raise ValueError("truncated EBML VINT")
    raw = int.from_bytes(data[pos:pos + n], "big")
    if keep_marker:
        return raw, pos + n
    value = raw & ~(1 << (7 * n))
    if value == (1 << (7 * n)) - 1:
        return -1, pos + n                  # unknown size
    return value, pos + n


def _walk(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) within a span."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size < 0:
            if eid == _SEGMENT:
                size = end - pos            # streaming convention
            else:
                raise ValueError(
                    f"unknown-size EBML element 0x{eid:X} (only Segment "
                    "may be unknown-size)")
        if pos + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns its parent")
        yield eid, pos, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, element_id: int
          ) -> tuple[int, int]:
    for eid, s, e in _walk(data, start, end):
        if eid == element_id:
            return s, e
    raise ValueError(f"EBML element 0x{element_id:X} not found")


def _child_uint(data: bytes, start: int, end: int, element_id: int,
                default: int | None = None) -> int:
    for eid, s, e in _walk(data, start, end):
        if eid == element_id:
            return int.from_bytes(data[s:e], "big")
    if default is None:
        raise ValueError(f"mandatory EBML element 0x{element_id:X} missing")
    return default


def _segment_span(data: bytes) -> tuple[int, int]:
    hs, he = _find(data, 0, len(data), _EBML)
    doctype = None
    for eid, s, e in _walk(data, hs, he):
        if eid == _DOCTYPE:
            doctype = data[s:e].rstrip(b"\x00").decode("ascii", "replace")
    if doctype != "webm":
        raise ValueError(f"not a webm file (DocType {doctype!r})")
    return _find(data, he, len(data), _SEGMENT)


def _video_track(data: bytes, seg_s: int, seg_e: int) -> dict:
    ts, te = _find(data, seg_s, seg_e, _TRACKS)
    video = None
    for eid, s, e in _walk(data, ts, te):
        if eid != _TRACK_ENTRY:
            continue
        if _child_uint(data, s, e, _TRACK_TYPE) != 1:
            continue
        if video is not None:
            raise ValueError("multiple video tracks")
        codec = None
        vs = ve = None
        for ceid, cs, ce in _walk(data, s, e):
            if ceid == _CODEC_ID:
                codec = data[cs:ce].rstrip(b"\x00").decode("ascii", "replace")
            elif ceid == _VIDEO:
                vs, ve = cs, ce
        if codec is None or vs is None:
            raise ValueError("video TrackEntry missing CodecID/Video")
        video = {
            "track": _child_uint(data, s, e, _TRACK_NUMBER),
            "codec": codec,
            "width": _child_uint(data, vs, ve, _PIXEL_WIDTH),
            "height": _child_uint(data, vs, ve, _PIXEL_HEIGHT),
        }
    if video is None:
        raise ValueError("no video track")
    return video


def _iter_blocks(data: bytes, seg_s: int, seg_e: int, track: int):
    """Yield (payload_start, payload_end, flags) for the track's
    SimpleBlocks in stream order."""
    for eid, s, e in _walk(data, seg_s, seg_e):
        if eid != _CLUSTER:
            continue
        for beid, bs, be in _walk(data, s, e):
            if beid != _SIMPLE_BLOCK:
                continue
            tnum, pos = _read_vint(data, bs, keep_marker=False)
            if tnum != track:
                raise ValueError(
                    f"SimpleBlock for unknown track {tnum} (video track "
                    f"is {track})")
            if pos + 3 > be:
                raise ValueError("truncated SimpleBlock header")
            flags = data[pos + 2]
            if flags & 0x06:
                raise NotImplementedError(
                    "SimpleBlock lacing not implemented (flags "
                    f"0x{flags:02X}) — one frame per block only")
            yield pos + 3, be, flags


def probe_webm(data: bytes) -> dict:
    """Container metadata: width/height/codec from the video
    TrackEntry, frame count from the SimpleBlock walk, integral
    duration_ms from the Info Duration (millisecond ticks enforced)."""
    seg_s, seg_e = _segment_span(data)
    info_s, info_e = _find(data, seg_s, seg_e, _INFO)
    scale = _child_uint(data, info_s, info_e, _TIMESTAMP_SCALE,
                        default=_MS_SCALE)
    if scale != _MS_SCALE:
        raise ValueError(
            f"TimestampScale {scale} ns/tick unsupported — this engine "
            "pins millisecond ticks (1000000)")
    duration_ms = 0
    for eid, s, e in _walk(data, info_s, info_e):
        if eid == _DURATION:
            if e - s == 8:
                d = struct.unpack(">d", data[s:e])[0]
            elif e - s == 4:
                d = struct.unpack(">f", data[s:e])[0]
            else:
                raise ValueError("Duration must be a 4/8-byte float")
            if d != int(d):
                raise ValueError(f"non-integral Duration {d} ticks")
            duration_ms = int(d)
    video = _video_track(data, seg_s, seg_e)
    n_frames = sum(1 for _ in _iter_blocks(data, seg_s, seg_e,
                                           video["track"]))
    return {"container": "webm", "codec": video["codec"],
            "width": video["width"], "height": video["height"],
            "n_frames": n_frames, "duration_ms": duration_ms}


def demux_webm(data: bytes) -> list[bytes]:
    """Stored codec payload of every video SimpleBlock, stream order."""
    seg_s, seg_e = _segment_span(data)
    video = _video_track(data, seg_s, seg_e)
    return [data[s:e] for s, e, _ in
            _iter_blocks(data, seg_s, seg_e, video["track"])]
