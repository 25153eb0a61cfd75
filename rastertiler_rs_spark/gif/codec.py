"""From-spec GIF89a codec: LZW, animation, interlace, composition.

Public-spec implementation (GIF89a specification, CompuServe 1990 —
the same document GIF support everywhere derives from): logical screen
descriptor, global color table, graphic control extensions (delay,
transparency, disposal), NETSCAPE2.0 looping application extension,
image descriptors with optional interlace, and the variable-width LSB
LZW coding with 12-bit cap and clear-code resets.

No counterpart exists in /root/reference (the reference links PNG via a
crate and has no GIF surface at all) — this extends the engine's
multimodal training-data column the same way jpeg/, webp/ and media/
do: one more real, dependency-free decoder so corpus image/animation
bytes can be probed, decoded, and feature-extracted executor-side.

Scoped like the sibling codecs: uncompressed-palette GIFs with a global
color table; local color tables are parsed and honored on decode, plain
text extensions are skipped, GIF87a accepted on read. The encoder
always writes GIF89a with a GCT.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9
_APP_LABEL = 0xFF
_MAX_CODE = 4096


# ------------------------------------------------------------------ LZW

def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW over a flat uint8 index stream: variable code
    width starting at mcs+1, LSB-first packing, clear/end codes,
    dictionary reset at 4096 entries."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    data = indices.tobytes()
    if not data:
        emit(end, width)
    else:
        w_code = data[0]
        for c in data[1:]:
            key = (w_code, c)
            hit = table.get(key)
            if hit is not None:
                w_code = hit
                continue
            emit(w_code, width)
            table[key] = next_code
            next_code += 1
            # the decoder's table add lags the encoder's by one code
            # (that lag IS the KwKwK case), so the encoder widens one
            # step later: at (1<<width)+1, where the decoder widens at
            # (1<<width) — both switch at the same bit-stream position
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            if next_code == _MAX_CODE:
                emit(clear, width)
                table.clear()
                next_code = end + 1
                width = mcs + 1
            w_code = c
        emit(w_code, width)
        emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, expected: int) -> np.ndarray:
    clear = 1 << mcs
    end = clear + 1
    prefix = np.full(_MAX_CODE, -1, np.int32)
    suffix = np.zeros(_MAX_CODE, np.uint8)
    out = np.empty(expected, np.uint8)
    n_out = 0
    stack = bytearray()

    pos = 0          # bit cursor
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return end  # truncated stream: treat as end of information
        byte0 = pos >> 3
        v = int.from_bytes(data[byte0: byte0 + 3], "little")
        v = (v >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return v

    width = mcs + 1
    next_code = end + 1
    prev = -1
    while True:
        code = read(width)
        if code == end:
            break
        if code == clear:
            width = mcs + 1
            next_code = end + 1
            prev = -1
            continue
        if code >= next_code and not (code == next_code and prev >= 0):
            raise ValueError("corrupt LZW stream: code out of range")
        # expand code (KwKwK case: code == next_code uses prev + prev[0])
        cur = prev if code == next_code else code
        stack.clear()
        while cur > end:  # composite entry; roots are < clear
            stack.append(suffix[cur])
            cur = int(prefix[cur])
        first = cur
        stack.append(first)
        if code == next_code:
            stack.insert(0, first)
        seq = stack[::-1]
        if n_out + len(seq) > expected:
            raise ValueError("LZW output exceeds declared image size")
        out[n_out: n_out + len(seq)] = np.frombuffer(bytes(seq), np.uint8)
        n_out += len(seq)
        if prev >= 0 and next_code < _MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != expected:
        raise ValueError(f"LZW stream ended early: {n_out}/{expected}")
    return out


# ----------------------------------------------------------- bit layout

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, np.int64)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos: pos + n]
        pos += n


# --------------------------------------------------------------- encode

def encode_gif(frames, palette, loop: bool | int = True,
               interlace: bool = False) -> bytes:
    """Encode one or more palette-indexed frames as a GIF89a stream.

    ``frames``: list of dicts with ``indices`` (2-D uint8 array) and
    optional ``left``/``top`` (sub-rect placement, default 0),
    ``delay_cs`` (centiseconds, default 0), ``transparent`` (palette
    index or None), ``disposal`` (0 none / 1 keep / 2 restore-bg).
    A bare ndarray is accepted as shorthand for a full default frame.
    ``palette``: (n, 3) uint8 RGB rows, n <= 256.
    """
    if not frames:
        raise ValueError("need at least one frame")
    frames = [f if isinstance(f, dict) else {"indices": f} for f in frames]
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    # GCT size must be a power of two >= 2
    depth = 1
    while (1 << depth) < pal.shape[0]:
        depth += 1
    gct = np.zeros((1 << depth, 3), np.uint8)
    gct[: pal.shape[0]] = pal

    width = max(f.get("left", 0) + f["indices"].shape[1] for f in frames)
    height = max(f.get("top", 0) + f["indices"].shape[0] for f in frames)

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)  # GCT flag+sizes
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += gct.tobytes()

    if (loop is not False and loop is not None) and len(frames) > 1:
        count = 0 if loop is True else int(loop)
        out += bytes([_EXTENSION, _APP_LABEL, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", count) + bytes([0])

    for f in frames:
        idx = np.ascontiguousarray(f["indices"], np.uint8)
        if idx.ndim != 2:
            raise ValueError("frame indices must be 2-D")
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("frame index outside palette")
        left, top = f.get("left", 0), f.get("top", 0)
        transparent = f.get("transparent")
        delay = int(f.get("delay_cs", 0))
        disposal = int(f.get("disposal", 0))
        if transparent is not None or delay or disposal:
            gce_packed = (disposal << 2) | (1 if transparent is not None
                                            else 0)
            out += bytes([_EXTENSION, _GCE_LABEL, 4, gce_packed])
            out += struct.pack("<H", delay)
            out += bytes([transparent or 0, 0])
        h, w = idx.shape
        ipacked = 0x40 if interlace else 0
        out += bytes([_IMAGE_SEP]) + struct.pack("<HHHHB", left, top,
                                                 w, h, ipacked)
        rows = idx[_interlace_order(h)] if interlace else idx
        mcs = max(2, depth)
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(rows.ravel(), mcs))
    out.append(_TRAILER)
    return bytes(out)


# --------------------------------------------------------------- decode

def _parse(data: bytes):
    """Walk the stream once; yield (screen_meta, frame dicts)."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF stream")
    width, height, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 7) + 1)
        gct = np.frombuffer(data[pos: pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    meta = {"width": width, "height": height, "version": data[3:6].decode(),
            "gct_size": 0 if gct is None else gct.shape[0],
            "bg_index": bg, "loop": None}
    frames = []
    gce = {}
    while True:
        b = data[pos]
        pos += 1
        if b == _TRAILER:
            break
        if b == _EXTENSION:
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == _GCE_LABEL and len(payload) >= 4:
                p, delay, tidx = payload[0], struct.unpack_from(
                    "<H", payload, 1)[0], payload[3]
                gce = {"delay_cs": delay, "disposal": (p >> 2) & 7,
                       "transparent": tidx if p & 1 else None}
            elif label == _APP_LABEL and payload[:11] == b"NETSCAPE2.0":
                if len(payload) >= 14 and payload[11] == 1:
                    meta["loop"] = struct.unpack_from("<H", payload, 12)[0]
            continue
        if b != _IMAGE_SEP:
            raise ValueError(f"unexpected block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = None
        if ipacked & 0x80:
            n = 1 << ((ipacked & 7) + 1)
            lct = np.frombuffer(data[pos: pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        flat = _lzw_decode(lzw, mcs, w * h)
        idx = flat.reshape(h, w)
        if ipacked & 0x40:
            out = np.empty_like(idx)
            out[_interlace_order(h)] = idx
            idx = out
        frames.append({"left": left, "top": top, "indices": idx,
                       "lct": lct, **gce})
        gce = {}
    return meta, frames


def gif_probe(data: bytes) -> dict:
    meta, frames = _parse(bytes(data))
    meta["n_frames"] = len(frames)
    meta["duration_cs"] = sum(f.get("delay_cs", 0) for f in frames)
    return meta


def gif_frames(data: bytes) -> list[dict]:
    """Raw stored frames (sub-rect indices + control), no composition."""
    return _parse(bytes(data))[1]


def decode_gif(data: bytes) -> list[np.ndarray]:
    """Composed RGB canvases, one (H, W, 3) uint8 array per frame,
    honoring sub-rect placement, transparency, and disposal methods
    0/1 (keep) and 2 (restore to background = transparent-black here,
    matching every major renderer's treatment of a transparent bg)."""
    data = bytes(data)
    meta, frames = _parse(data)
    if meta["gct_size"] == 0 and any(f["lct"] is None for f in frames):
        raise ValueError("frame without any color table")
    h, w = meta["height"], meta["width"]
    gct_arr = None
    if meta["gct_size"]:
        n = meta["gct_size"]
        gct_arr = np.frombuffer(data[13: 13 + 3 * n],
                                np.uint8).reshape(n, 3)
    canvas = np.zeros((h, w, 3), np.uint8)
    out = []
    for f in frames:
        table = f["lct"] if f["lct"] is not None else gct_arr
        fh, fw = f["indices"].shape
        t, l = f["top"], f["left"]
        rgb = table[f["indices"]]
        region = canvas[t: t + fh, l: l + fw]
        tr = f.get("transparent")
        if tr is None:
            region[:] = rgb
        else:
            opaque = f["indices"] != tr
            region[opaque] = rgb[opaque]
        out.append(canvas.copy())
        if f.get("disposal") == 2:
            canvas[t: t + fh, l: l + fw] = 0
    return out
