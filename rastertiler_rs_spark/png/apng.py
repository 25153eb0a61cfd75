"""APNG — animated PNG, from the public spec (PNG Third Edition
§11.3.4 / the original Mozilla acTL/fcTL/fdAT extension).

Layered over the engine's own still-PNG codec: every frame payload is
the standard filtered+zlib scanline stream, so decode rebuilds a
standalone PNG per frame (IHDR at frame dims + shared PLTE/tRNS +
the frame's data chunks) and reuses decode_rgba end to end — palette,
tRNS, 16-bit and Adam7 frames all work for free, and the encoder's
output round-trips bit-exactly (PNG is lossless), which makes the
whole animation surface self-verifiable without external tooling.

Composition mirrors gif/codec.decode_gif and webp webp_anim_frames:
``apng_frames`` returns the fully COMPOSED RGBA canvas per frame,
honoring sub-rect placement, blend_op (0 = source, 1 = the standard
non-premultiplied over — the same exact-integer arithmetic as the
WebP ANMF path, webp/codec._blend_rgba) and dispose_op (0 none,
1 background, 2 previous; dispose-previous on frame 0 acts as
background, per spec).

The third animated-image family beside GIF and WebP-ANIM; the
reference engine (rastertiler-rs) has no animation surface at all.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codec import _SIG, _chunk, decode_rgba, encode_rgba

_CTRL_TAGS = (b"acTL", b"fcTL", b"fdAT")


def _walk(data: bytes):
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        yield tag, data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("truncated PNG: no IEND")


def encode_apng(width: int, height: int, frames: list[dict],
                num_plays: int = 0) -> bytes:
    """Assemble an APNG from RGBA frames.

    Each frame dict: ``rgba`` (h, w, 4) uint8, optional ``x``/``y``
    offsets (default 0), ``duration_ms`` (default 100), ``dispose``
    (0/1/2, default 0) and ``blend`` (0 source / 1 over, default 0).
    The first frame must cover the full canvas at (0, 0) — the spec's
    rule for a frame-0 carried by IDAT."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    f0 = frames[0]
    if (f0.get("x", 0), f0.get("y", 0)) != (0, 0) or \
            f0["rgba"].shape[:2] != (height, width):
        raise ValueError("frame 0 must be the full canvas at (0, 0)")

    def fctl(seq: int, f: dict) -> bytes:
        h, w = f["rgba"].shape[:2]
        x, y = int(f.get("x", 0)), int(f.get("y", 0))
        if x < 0 or y < 0 or x + w > width or y + h > height:
            raise ValueError(f"frame rect {w}x{h}+{x}+{y} exceeds canvas")
        dispose, blend = int(f.get("dispose", 0)), int(f.get("blend", 0))
        if dispose not in (0, 1, 2) or blend not in (0, 1):
            raise ValueError("bad dispose_op/blend_op")
        return _chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, x, y,
            int(f.get("duration_ms", 100)), 1000, dispose, blend))

    def payload(f: dict) -> bytes:
        rgba = f["rgba"]
        if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
            raise ValueError("frames must be (h, w, 4) uint8")
        h, w = rgba.shape[:2]
        raw = np.empty((h, w * 4 + 1), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = rgba.reshape(h, w * 4)
        return zlib.compress(raw, 9)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    out = [_SIG, _chunk(b"IHDR", ihdr),
           _chunk(b"acTL", struct.pack(">II", len(frames), num_plays)),
           fctl(0, f0), _chunk(b"IDAT", payload(f0))]
    seq = 1
    for f in frames[1:]:
        out.append(fctl(seq, f))
        seq += 1
        out.append(_chunk(b"fdAT", struct.pack(">I", seq) + payload(f)))
        seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _parse(data: bytes):
    """Chunk walk → (ihdr_payload, shared aux chunks, acTL fields,
    frame list of (fctl_fields, [data payloads]))."""
    ihdr = actl = None
    aux: list[tuple[bytes, bytes]] = []
    frames: list[tuple[tuple, list[bytes]]] = []
    seqs: list[int] = []
    saw_idat = idat_is_frame = False
    for tag, payload in _walk(data):
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"acTL":
            if saw_idat:
                raise ValueError("acTL after IDAT")
            actl = struct.unpack(">II", payload)
        elif tag == b"fcTL":
            f = struct.unpack(">IIIIIHHBB", payload)
            seqs.append(f[0])
            if not saw_idat:
                idat_is_frame = True
            frames.append((f[1:], []))
        elif tag == b"IDAT":
            saw_idat = True
            if idat_is_frame:
                frames[0][1].append(payload)
        elif tag == b"fdAT":
            if not frames:
                raise ValueError("fdAT before any fcTL")
            seqs.append(struct.unpack(">I", payload[:4])[0])
            frames[-1][1].append(payload[4:])
        elif tag in (b"PLTE", b"tRNS"):
            aux.append((tag, payload))
    if ihdr is None or actl is None:
        raise ValueError("not an APNG (missing IHDR/acTL)")
    if seqs != list(range(len(seqs))):
        raise ValueError(f"APNG sequence numbers not 0..n-1: {seqs}")
    if actl[0] != len(frames) or not frames:
        raise ValueError(
            f"acTL num_frames {actl[0]} != {len(frames)} fcTL chunks")
    if any(not d for _, d in frames):
        raise ValueError("frame without data chunks")
    return ihdr, aux, actl, frames


def probe_apng(data: bytes) -> dict:
    """Header-only metadata: no decompression, no pixel work."""
    ihdr, _, actl, frames = _parse(data)
    w, h = struct.unpack(">II", ihdr[:8])
    dur = sum(num * 1000 // (den or 100)
              for (_, _, _, _, num, den, _, _), _ in frames)
    return {"width": w, "height": h, "n_frames": actl[0],
            "num_plays": actl[1], "duration_ms": dur, "codec": "apng"}


def apng_frames(data: bytes) -> list[dict]:
    """Decode + compose: list of {"canvas": (H, W, 4) uint8 RGBA,
    "duration_ms": int}, one per frame, fully composed."""
    from ..webp.codec import _blend_rgba

    ihdr, aux, _, frames = _parse(data)
    width, height = struct.unpack(">II", ihdr[:8])
    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    out: list[dict] = []
    for idx, ((w, h, x, y, num, den, dispose, blend), datas) in \
            enumerate(frames):
        if x + w > width or y + h > height:
            raise ValueError(f"frame {idx} rect exceeds canvas")
        # rebuild a standalone still PNG at frame dims; the shared
        # still decoder handles every color type / depth / interlace
        sub_ihdr = struct.pack(">II", w, h) + ihdr[8:]
        parts = [_SIG, _chunk(b"IHDR", sub_ihdr)]
        parts += [_chunk(t, p) for t, p in aux]
        parts += [_chunk(b"IDAT", d) for d in datas]
        parts.append(_chunk(b"IEND", b""))
        rgba = decode_rgba(b"".join(parts))
        win = canvas[y:y + h, x:x + w]
        prev = win.copy() if dispose == 2 else None
        win[:] = rgba if blend == 0 else _blend_rgba(win, rgba)
        out.append({"canvas": canvas.copy(),
                    "duration_ms": num * 1000 // (den or 100)})
        if dispose == 1 or (dispose == 2 and idx == 0):
            win[:] = 0          # dispose-previous on frame 0 = background
        elif dispose == 2:
            win[:] = prev
    return out
