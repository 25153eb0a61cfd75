"""Pure numpy + zlib PNG codec.

The sandbox has no PIL/libpng, and PNG with filter-off + max zlib is
trivial to write by hand; this mirrors the reference's three encoders:

- grayscale 8-bit, filter off, Compression::Best, tRNS = [0, nodata]
  (/root/reference/src/png/grayscale.rs:29-50)
- paletted with auto bit depth 1/2/4/8 and tRNS=[0]
  (/root/reference/src/png/colormap.rs:95-133, color.rs:38-120)
- RGB 8-bit with 6-byte tRNS (/root/reference/src/png/rgb.rs:30-56)

plus a decoder (gray8 / indexed 1-2-4-8 / rgb8, filters 0-4) used by the
fixture reader and the golden-pixel comparisons.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _encode(width: int, height: int, bit_depth: int, color_type: int,
            scanlines: np.ndarray, plte: bytes | None, trns: bytes | None) -> bytes:
    """Assemble a PNG: filter byte 0 per row (filter off, per the
    reference's FilterType::NoFilter), zlib level 9 (Compression::Best)."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    rows = np.ascontiguousarray(scanlines).reshape(height, -1)
    raw = np.empty((height, rows.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rows
    # zlib.compress consumes the C-contiguous buffer directly — skipping
    # tobytes() saves a full scanline-buffer copy per tile (~64 KB for a
    # 256px gray tile), a measurable share of the encode stage's memory
    # traffic at 32 cores. np.empty above is always contiguous; zlib
    # raises on non-contiguous buffers, so a regression can't be silent.
    idat = zlib.compress(raw, 9)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        out.append(_chunk(b"PLTE", plte))
    if trns is not None:
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", idat))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def encode_grayscale8(arr: np.ndarray, nodata: int) -> bytes:
    """8-bit grayscale; tRNS = 2-byte big-endian nodata
    (/root/reference/src/png/grayscale.rs:41-42 writes vec![0, nodata])."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return _encode(w, h, 8, 0, a, None, bytes([0, int(nodata) & 0xFF]))


def encode_grayscale16(arr: np.ndarray, nodata: int) -> bytes:
    """16-bit grayscale (big-endian per the PNG spec) — the DEM /
    elevation-raster form external corpora ship; tRNS = 2-byte
    big-endian nodata. The engine's own tile sinks stay 8-bit/u32-RGB
    (reference parity); this is ingest/interop surface."""
    a = np.asarray(arr, dtype=np.uint16)
    h, w = a.shape
    rows = np.ascontiguousarray(a.astype(">u2")).view(np.uint8).reshape(h, w * 2)
    return _encode(w, h, 16, 0, rows, None, struct.pack(">H", nodata & 0xFFFF))


def rgb_from_u32(values: np.ndarray) -> np.ndarray:
    """u32 → (r,g,b) bytes; truncating casts per
    /root/reference/src/png/color.rs:28-35."""
    v = np.asarray(values, dtype=np.uint32)
    return np.stack(
        [(v >> 16).astype(np.uint8), (v >> 8).astype(np.uint8), (v & 0xFF).astype(np.uint8)],
        axis=-1,
    )


def encode_rgb(rgb: np.ndarray, nodata_value: int) -> bytes:
    """8-bit RGB; tRNS = [0,r,0,g,0,b] of the nodata color
    (/root/reference/src/png/rgb.rs:42-49)."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    nr, ng, nb = (int(x) for x in rgb_from_u32(np.uint32(nodata_value)))
    return _encode(w, h, 8, 2, a.reshape(h, w * 3), None, bytes([0, nr, 0, ng, 0, nb]))


class Colormap:
    """value → palette-index map with nodata pinned to index 0.

    Mirrors ColormapRgb8 (/root/reference/src/png/color.rs:38-120):
    insertion-ordered growth, index 0 = nodata = transparent, missing
    values map to 0.
    """

    def __init__(self, nodata: int):
        self.nodata = int(nodata)
        self.values: dict[int, int] = {self.nodata: 0}
        self.colors: list[int] = [0, 0, 0]

    @classmethod
    def parse(cls, colormap_str: str, nodata: int) -> "Colormap":
        """Parse "v:#rrggbb,v:#rrggbb"
        (/root/reference/src/png/color.rs:83-97)."""
        cm = cls(nodata)
        for entry in colormap_str.split(","):
            value_s, hex_s = entry.split(":")
            if len(hex_s) != 7:
                raise ValueError("unsupported hex format")
            rgb = bytes.fromhex(hex_s[1:])
            cm.add_color(int(value_s), (rgb[0], rgb[1], rgb[2]))
        return cm

    def add_color(self, value: int, color: tuple[int, int, int]) -> None:
        if value not in self.values:
            if len(self.values) >= 256:
                # palette indices are uint8; the reference enforces this cap
                # at the call site (/root/reference/src/render.rs:268) — we
                # fail loudly instead of silently truncating the index.
                raise ValueError("palette overflow: more than 256 entries")
            self.values[value] = len(self.values)
            self.colors.extend(color)

    def __len__(self) -> int:
        return len(self.colors) // 3

    def get_indices(self, arr: np.ndarray) -> np.ndarray:
        """Vectorized get_index: missing → 0 (transparent),
        /root/reference/src/png/color.rs:99-106."""
        keys = np.fromiter(self.values.keys(), dtype=np.int64, count=len(self.values))
        idxs = np.fromiter(self.values.values(), dtype=np.uint8, count=len(self.values))
        order = np.argsort(keys, kind="stable")
        keys_sorted, idxs_sorted = keys[order], idxs[order]
        flat = np.asarray(arr, dtype=np.int64).ravel()
        pos = np.searchsorted(keys_sorted, flat)
        pos = np.clip(pos, 0, len(keys_sorted) - 1)
        found = keys_sorted[pos] == flat
        out = np.where(found, idxs_sorted[pos], np.uint8(0)).astype(np.uint8)
        return out.reshape(np.asarray(arr).shape)


def select_bit_depth(palette_len: int) -> int:
    """/root/reference/src/png/colormap.rs:96-101."""
    if palette_len <= 2:
        return 1
    if palette_len <= 4:
        return 2
    if palette_len <= 16:
        return 4
    return 8


def _pack_bits(indices: np.ndarray, bit_depth: int, width: int) -> np.ndarray:
    """MSB-first packing (/root/reference/src/png/util.rs:5-17), applied
    per scanline (PNG pads each row to a byte boundary)."""
    h = indices.shape[0]
    if bit_depth == 8:
        return indices
    per_byte = 8 // bit_depth
    pad = (-width) % per_byte
    if pad:
        indices = np.pad(indices, ((0, 0), (0, pad)))
    grouped = indices.reshape(h, -1, per_byte).astype(np.uint16)
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint16) * bit_depth
    return (grouped << shifts).sum(axis=2).astype(np.uint8)


def encode_paletted(arr: np.ndarray, colormap: Colormap) -> bytes:
    """Indexed PNG with auto bit depth, PLTE from the colormap, tRNS=[0]
    (/root/reference/src/png/colormap.rs:95-133)."""
    a = np.asarray(arr)
    h, w = a.shape
    depth = select_bit_depth(len(colormap))
    indices = colormap.get_indices(a)
    packed = _pack_bits(indices, depth, w)
    return _encode(w, h, depth, 3, packed, bytes(colormap.colors), b"\x00")


# ---------------------------------------------------------------------------
# Adam7 interlace (PNG spec §8.2) — the engine's own sinks always write
# interlace 0 (that layout is the reference-parity contract), but the
# DECODER must take interlaced input from external corpora, and the
# interlaced ENCODER exists so round-trips are self-verifiable without
# an external imaging library.
# ---------------------------------------------------------------------------

_ADAM7 = [(0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
          (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1)]


def _pass_dims(width: int, height: int, p: int) -> tuple[int, int]:
    r0, c0, rs, cs = _ADAM7[p]
    return max(0, (width - c0 + cs - 1) // cs), \
        max(0, (height - r0 + rs - 1) // rs)


def encode_interlaced(pixels: np.ndarray, bit_depth: int, color_type: int,
                      plte: bytes | None = None,
                      trns: bytes | None = None) -> bytes:
    """Adam7 PNG from unit pixels — (h,w) gray/indices or (h,w,3) RGB:
    each pass is an independently filtered (filter 0) sub-image packed
    to its OWN byte-aligned row stride, concatenated in pass order
    inside one zlib stream."""
    a = np.asarray(pixels, dtype=np.uint16 if bit_depth == 16 else np.uint8)
    h, w = a.shape[:2]
    parts = []
    for p in range(7):
        r0, c0, rs, cs = _ADAM7[p]
        wp, hp = _pass_dims(w, h, p)
        if wp == 0 or hp == 0:
            continue
        sub = a[r0::rs, c0::cs]
        if bit_depth == 16:
            rows = np.ascontiguousarray(sub.astype(">u2")).view(
                np.uint8).reshape(hp, wp * 2)
        elif color_type == 2:
            rows = sub.reshape(hp, wp * 3)
        else:
            rows = _pack_bits(sub, bit_depth, wp)
        raw = np.empty((hp, rows.shape[1] + 1), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = rows
        parts.append(raw.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if plte is not None:
        out.append(_chunk(b"PLTE", plte))
    if trns is not None:
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", zlib.compress(b"".join(parts), 9)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _paeth(a, b, c):
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(height, stride + 1)
    if not rows[:, 0].any():  # all filter-0 rows (our own encoder's output):
        return rows[:, 1:].copy()  # one vectorized copy, no per-row loop
    out = np.zeros((height, stride), dtype=np.uint8)
    for r in range(height):
        ft, line = rows[r, 0], rows[r, 1:].copy()
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = line
        elif ft == 1:
            for i in range(stride):
                line[i] = (line[i] + (line[i - bpp] if i >= bpp else 0)) & 0xFF
            out[r] = line
        elif ft == 2:
            out[r] = line + prev
        elif ft == 3:
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
            out[r] = line
        elif ft == 4:
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + int(_paeth(np.uint8(a), prev[i], np.uint8(c)))) & 0xFF
            out[r] = line
        else:
            raise ValueError(f"bad filter {ft}")
    return out


def _expand_pixels(arr: np.ndarray, width: int, height: int,
                   bit_depth: int, color_type: int) -> np.ndarray:
    """Unfiltered scanline bytes → unit pixels: (h,w,3) RGB, (h,w)
    8-bit values, (h,w) big-endian 16-bit, or sub-byte MSB-first
    unpacking."""
    if bit_depth == 16:
        if color_type != 0:
            raise ValueError("16-bit decode supports grayscale only")
        return np.ascontiguousarray(arr).view(">u2").reshape(
            height, width).astype(np.uint16)
    if color_type == 2:
        return arr.reshape(height, width, 3)
    if color_type == 6:
        return arr.reshape(height, width, 4)
    if bit_depth == 8:
        return arr.reshape(height, width)
    per_byte = 8 // bit_depth
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * bit_depth
    mask = (1 << bit_depth) - 1
    expanded = ((arr[:, :, None] >> shifts) & mask).reshape(height, -1)
    return expanded[:, :width].astype(np.uint8)


def decode_png(data: bytes):
    """Parse a PNG → dict(width, height, bit_depth, color_type, palette,
    trns, pixels). pixels: HxW uint8 (gray / palette indices) or HxWx3.
    Both interlace methods (0 and Adam7) decode."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, idat, plte, trns = 8, [], None, None
    width = height = bit_depth = color_type = interlace = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12]
            if interlace > 1:
                raise ValueError(f"bad interlace method {interlace}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = bytes(payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    channels = {2: 3, 6: 4}.get(color_type, 1)
    bpp = max(1, (bit_depth * channels) // 8)
    if interlace:
        # Adam7: seven independently filtered sub-images, scattered
        # back onto the full grid by each pass's (origin, step)
        shape = ((height, width, channels) if channels > 1
                 else (height, width))
        pixels = np.zeros(shape,
                          dtype=np.uint16 if bit_depth == 16 else np.uint8)
        off = 0
        for p in range(7):
            r0, c0, rs, cs = _ADAM7[p]
            wp, hp = _pass_dims(width, height, p)
            if wp == 0 or hp == 0:
                continue
            stride = (wp * bit_depth * channels + 7) // 8
            take = hp * (stride + 1)
            sub = _unfilter(raw[off:off + take], hp, stride, bpp)
            off += take
            pixels[r0::rs, c0::cs] = _expand_pixels(
                sub, wp, hp, bit_depth, color_type)
        if off != raw.size:
            raise ValueError("interlaced IDAT length mismatch")
    else:
        stride = (width * bit_depth * channels + 7) // 8
        arr = _unfilter(raw, height, stride, bpp)
        pixels = _expand_pixels(arr, width, height, bit_depth, color_type)
    return {
        "width": width, "height": height, "bit_depth": bit_depth,
        "color_type": color_type, "palette": plte, "trns": trns, "pixels": pixels,
    }


def decode_band(data: bytes, fmt: str) -> np.ndarray:
    """Fixture-format reader: 'png;u8' = grayscale band → uint8 HxW;
    'png;u16' = 16-bit grayscale → uint16 HxW; 'png;u32' = RGB whose
    bytes pack the value's low 24 bits → uint32."""
    d = decode_png(data)
    if fmt == "png;u8":
        return d["pixels"].astype(np.uint8)
    if fmt == "png;u16":
        return d["pixels"].astype(np.uint16)
    if fmt == "png;u32":
        p = d["pixels"].astype(np.uint32)
        return (p[:, :, 0] << 16) | (p[:, :, 1] << 8) | p[:, :, 2]
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_rgba(data: bytes) -> np.ndarray:
    """Canonical visual form (what a viewer renders) for golden-pixel
    comparison: applies PLTE + tRNS → HxWx4 uint8."""
    d = decode_png(data)
    h, w = d["height"], d["width"]
    out = np.zeros((h, w, 4), dtype=np.uint8)
    p = d["pixels"]
    if d["color_type"] == 0:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = p
        out[:, :, 3] = 255
        if d["trns"]:
            (nodata,) = struct.unpack(">H", d["trns"][:2])
            out[p == nodata, 3] = 0
    elif d["color_type"] == 3:
        out[:, :, :3] = d["palette"][p]
        alpha = np.full(len(d["palette"]), 255, dtype=np.uint8)
        if d["trns"]:
            t = np.frombuffer(d["trns"], dtype=np.uint8)
            alpha[: len(t)] = t
        out[:, :, 3] = alpha[p]
    elif d["color_type"] == 2:
        out[:, :, :3] = p
        out[:, :, 3] = 255
        if d["trns"]:
            r, g, b = struct.unpack(">HHH", d["trns"][:6])
            mask = (p[:, :, 0] == r) & (p[:, :, 1] == g) & (p[:, :, 2] == b)
            out[mask, 3] = 0
    elif d["color_type"] == 6:
        out[:] = p
    return out


def encode_rgba(rgba: np.ndarray) -> bytes:
    """8-bit RGBA PNG (color type 6) — the truecolor-with-alpha form
    APNG frames use. The engine's tile sinks never emit it (gray /
    paletted / RGB are the reference-parity contract); it exists for
    the animation surface."""
    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_rgba expects (h, w, 4) uint8")
    h, w = rgba.shape[:2]
    return _encode(w, h, 8, 6, rgba.reshape(h, w * 4), None, None)
