"""Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec in pure
numpy — no external imaging library exists in this environment, so the
multimodal operators' jpeg path is implemented from the public spec the
same way png/codec.py is (the reference gets its codecs from crates;
SURVEY.md §2 E-group analog for the multimodal extension).

Scope (honest): baseline sequential (SOI/APPn/COM/DQT/SOF0/DHT/DRI/
SOS/RSTn/EOI, 8-bit samples, grayscale or YCbCr with arbitrary
sampling factors up to 2x2 — 4:4:4, 4:2:2, 4:2:0 replication upsample
on decode) AND progressive (SOF2, T.81 Annex G: spectral selection +
successive approximation, huffman-coded — DC first/refine, AC
first/refine with EOB-run and correction-bit semantics, interleaved DC
scans, restart markers). Arithmetic coding and 12-bit raise
ValueError. The sequential encoder emits grayscale or YCbCr at 4:4:4,
4:2:2, or 4:2:0 (box-mean chroma downsample), with optional DRI/RSTn
restart intervals, using the Annex K example quantization/Huffman
tables scaled by a libjpeg-style quality factor; the progressive encoder reuses the same
quantized coefficients (so progressive and baseline encodes of one
image DECODE BIT-IDENTICALLY — pinned in tests) with per-scan
flat-canonical huffman tables.

JPEG is lossy: decode(encode(x)) is only quantization-close (tests pin
PSNR and exact dims); decode itself is deterministic, so fixture bytes
decode identically everywhere.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

_QL = np.array([  # K.1 luminance
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

_QC = np.array([  # K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis: C[u,x] = a(u) * cos((2x+1)u*pi/16); block' = C @ b @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style linear quality scaling of a base table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _build_code_table(bits, huffval):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (encoder direction)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, huffval):
    """(BITS, HUFFVAL) → {(length, code): symbol} (decoder direction)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """v → (category, magnitude bits): negative values use one's
    complement of |v| per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _quantize_zz(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize a (n,8,8) block stack → (n,64) zigzag-
    order coefficients (shared by the sequential and progressive
    encoders, which is what makes their decodes bit-identical)."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _C, shifted, _C)
    q = np.round(coef / quant).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _encode_blocks(bw: _BitWriter, blocks: np.ndarray, quant: np.ndarray,
                   dc_codes, ac_codes, pred: int) -> int:
    """Forward DCT + quantize + entropy-code a (n,8,8) block stack of
    one component; returns the updated DC predictor."""
    zz = _quantize_zz(blocks, quant)
    for row in zz:
        dc = int(row[0])
        diff = dc - pred
        pred = dc
        cat, bits = _magnitude(diff)
        code, length = dc_codes[cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)
        run = 0
        last_nz = int(np.max(np.nonzero(row)[0])) if np.any(row) else 0
        for i in range(1, 64):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            cat, bits = _magnitude(v)
            code, length = ac_codes[(run << 4) | cat]
            bw.write(code, length)
            bw.write(bits, cat)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    return pred


def _tile_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a plane to 8-multiples by edge replication, cut row-major
    8x8 blocks → (n, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = p.shape
    return (p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _dht_payload(tc_th: int, spec) -> bytes:
    bits, vals = spec
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_jpeg_gray(band: np.ndarray, quality: int = 90,
                     restart_interval: int = 0) -> bytes:
    """Grayscale baseline JPEG from a uint8 HxW array.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    (byte-aligned, modulo-8 cycling, DC predictor reset) after every
    that many MCUs — the quantized coefficients are unchanged, so a
    DRI encode decodes BIT-IDENTICALLY to the plain one (pinned in
    tests, which is what exercises the decoder's resync path)."""
    band = np.asarray(band, dtype=np.uint8)
    h, w = band.shape
    ql = _quality_scale(_QL, quality)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(ql.flatten()[_ZIGZAG].astype(np.uint8)))
    out += _marker(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _marker(0xFFC4, _dht_payload(0x00, _DC_L))
    out += _marker(0xFFC4, _dht_payload(0x10, _AC_L))
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    out += _marker(0xFFDA, struct.pack(">B", 1) + bytes([1, 0x00]) + bytes([0, 63, 0]))
    blocks = _tile_blocks(band)
    dc, ac = _build_code_table(*_DC_L), _build_code_table(*_AC_L)
    # max(..., 1): an empty band still yields a well-formed stream
    # (header + empty entropy + EOI), not a zero-step range()
    ri = restart_interval or max(blocks.shape[0], 1)
    ent = bytearray()
    rst = 0
    for start in range(0, blocks.shape[0], ri):
        if start:
            ent += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        bw = _BitWriter()
        _encode_blocks(bw, blocks[start:start + ri], ql, dc, ac, 0)
        bw.flush()
        ent += bw.out
    out += ent
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb_to_ycbcr_planes(rgb: np.ndarray) -> tuple[int, int, list]:
    """JFIF/BT.601 full-range color transform shared by the sequential
    and progressive RGB encoders — one copy, so their bit-identical-
    decode guarantee is structural."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    return h, w, planes


def _mcu_block_grid(plane: np.ndarray, mcux: int, mcuy: int,
                    hc: int, vc: int) -> np.ndarray:
    """Pad a component plane (edge replication) to its MCU-aligned size
    and cut it into a (mcuy*vc, mcux*hc, 8, 8) block grid."""
    th, tw = mcuy * vc * 8, mcux * hc * 8
    p = np.pad(plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
               mode="edge")
    return (p.reshape(mcuy * vc, 8, mcux * hc, 8).transpose(0, 2, 1, 3))


def encode_jpeg_rgb(rgb: np.ndarray, quality: int = 90,
                    restart_interval: int = 0,
                    sampling: str = "444") -> bytes:
    """YCbCr baseline JPEG from a uint8 HxWx3 array (JFIF/BT.601
    full-range color transform). ``restart_interval`` as in
    encode_jpeg_gray (MCU granularity). ``sampling`` selects the chroma
    layout: "444" (1x1), "422" (Y 2x1, 16x8 MCUs), "420" (Y 2x2, 16x16
    MCUs) — chroma planes are box-mean downsampled; the decoder
    upsamples by replication (the T.81-sanctioned nearest rule this
    engine uses everywhere), so round-trips are PSNR-gated."""
    h, w, planes = _rgb_to_ycbcr_planes(rgb)
    try:
        hy, vy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sampling]
    except KeyError:
        raise ValueError(f"sampling must be 444/422/420, got {sampling!r}") \
            from None
    if sampling != "444":
        for i in (1, 2):  # chroma: box-mean downsample by (vy, hy)
            p = planes[i].astype(np.float64)
            p = np.pad(p, ((0, -p.shape[0] % vy), (0, -p.shape[1] % hy)),
                       mode="edge")
            p = p.reshape(p.shape[0] // vy, vy,
                          p.shape[1] // hy, hy).mean(axis=(1, 3))
            planes[i] = np.clip(np.round(p), 0, 255).astype(np.uint8)
    ql, qc = _quality_scale(_QL, quality), _quality_scale(_QC, quality)
    out = bytearray()
    out += b"\xff\xd8"
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(ql.flatten()[_ZIGZAG].astype(np.uint8)))
    out += _marker(0xFFDB, b"\x01" + bytes(qc.flatten()[_ZIGZAG].astype(np.uint8)))
    out += _marker(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                   + bytes([1, (hy << 4) | vy, 0])
                   + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    out += _marker(0xFFC4, _dht_payload(0x00, _DC_L))
    out += _marker(0xFFC4, _dht_payload(0x10, _AC_L))
    out += _marker(0xFFC4, _dht_payload(0x01, _DC_C))
    out += _marker(0xFFC4, _dht_payload(0x11, _AC_C))
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    out += _marker(0xFFDA, struct.pack(">B", 3)
                   + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]))
    dcs = [_build_code_table(*_DC_L), _build_code_table(*_DC_C)]
    acs = [_build_code_table(*_AC_L), _build_code_table(*_AC_C)]
    mcux, mcuy = -(-w // (8 * hy)), -(-h // (8 * vy))
    comps = [
        {"grid": _mcu_block_grid(planes[0], mcux, mcuy, hy, vy),
         "h": hy, "v": vy, "q": ql, "t": 0},
        {"grid": _mcu_block_grid(planes[1], mcux, mcuy, 1, 1),
         "h": 1, "v": 1, "q": qc, "t": 1},
        {"grid": _mcu_block_grid(planes[2], mcux, mcuy, 1, 1),
         "h": 1, "v": 1, "q": qc, "t": 1},
    ]
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                preds = [0, 0, 0]
            m += 1
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = c["grid"][my * c["v"] + v, mx * c["h"] + hh]
                        preds[ci] = _encode_blocks(
                            bw, blk[None], c["q"], dcs[c["t"]],
                            acs[c["t"]], preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G)
# ---------------------------------------------------------------------------

# (Ss, Se, Ah, Al, kind): a 3-level successive-approximation script that
# exercises every Annex-G codepath — interleaved DC first + refine, AC
# first at Al=2, and two chained AC refinement passes.
_PROG_SCRIPT = [
    (0, 0, 0, 1, "dc"),
    (1, 5, 0, 2, "ac"),
    (6, 63, 0, 2, "ac"),
    (1, 5, 2, 1, "ac"),
    (6, 63, 2, 1, "ac"),
    (0, 0, 1, 0, "dc"),
    (1, 5, 1, 0, "ac"),
    (6, 63, 1, 0, "ac"),
]


class _Events:
    """Per-scan entropy event stream: huffman symbols interleaved with
    raw bit runs, buffered so the scan's table can be built from the
    symbols it actually uses before any bit is written."""

    def __init__(self):
        self.items: list[tuple] = []
        self.symbols: set[int] = set()

    def sym(self, s: int) -> None:
        self.items.append(("s", s))
        self.symbols.add(s)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.items.append(("b", v, n))

    def write(self, bw: _BitWriter, codes) -> None:
        for it in self.items:
            if it[0] == "s":
                code, length = codes[it[1]]
                bw.write(code, length)
            else:
                bw.write(it[1], it[2])


def _flat_huff_spec(symbols) -> tuple[list, list]:
    """A valid (BITS, HUFFVAL) giving every used symbol the same code
    length L with 2^L > n (the all-ones code stays unused, as T.81
    requires). Compression is not the point of the fixture encoder;
    validity and coverage are."""
    syms = sorted(symbols) or [0]
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


def _enc_dc_scan(ev: _Events, comps_zz: list[np.ndarray], ah: int, al: int) -> None:
    """Interleaved DC scan over 1x1-sampled components (MCU = one block
    per component, row-major). First pass (ah==0) huffman-codes diffs of
    the point-transformed DC (arithmetic >> al); refinement emits the
    raw al-th bit per block."""
    n = comps_zz[0].shape[0]
    preds = [0] * len(comps_zz)
    for m in range(n):
        for c, zz in enumerate(comps_zz):
            dc = int(zz[m, 0]) >> al
            if ah == 0:
                diff = dc - preds[c]
                preds[c] = dc
                cat, bits = _magnitude(diff)
                ev.sym(cat)
                ev.bits(bits, cat)
            else:
                ev.bits(dc & 1, 1)


def _enc_ac_scan(ev: _Events, zz: np.ndarray, ss: int, se: int,
                 ah: int, al: int) -> None:
    """Single-component AC scan (progressive AC is never interleaved).
    ah==0: first pass with EOB-run coding of all-zero bands; ah>0:
    refinement with ZRL-over-history, buffered correction bits, and
    EOB-run-deferred correction bits (T.81 G.1.2.2/G.1.2.3)."""
    eobrun = 0
    bebuf: list[int] = []  # correction bits owed to the pending EOB run

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ev.sym(r << 4)
            ev.bits(eobrun - (1 << r), r)
            for b in bebuf:
                ev.bits(b, 1)
            bebuf.clear()
            eobrun = 0

    for row in zz:
        band = [int(v) for v in row[ss : se + 1]]
        if ah == 0:
            vals = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
                continue
            flush_eobrun()
            run = 0
            for v in vals:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ev.sym(0xF0)
                    run -= 16
                cat, bits = _magnitude(v)
                ev.sym((run << 4) | cat)
                ev.bits(bits, cat)
                run = 0
            if run > 0:
                eobrun += 1
        else:
            absv = [abs(v) >> al for v in band]
            eob = -1  # index of the last newly-significant coefficient
            for k, t in enumerate(absv):
                if t == 1:
                    eob = k
            run = 0
            brbuf: list[int] = []
            for k, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    flush_eobrun()
                    ev.sym(0xF0)
                    run -= 16
                    for b in brbuf:
                        ev.bits(b, 1)
                    brbuf.clear()
                if t > 1:
                    brbuf.append(t & 1)  # history-nonzero: correction bit
                    continue
                flush_eobrun()
                ev.sym((run << 4) | 1)
                ev.bits(1 if band[k] >= 0 else 0, 1)
                for b in brbuf:
                    ev.bits(b, 1)
                brbuf.clear()
                run = 0
            if run > 0 or brbuf:
                eobrun += 1
                bebuf.extend(brbuf)
                if eobrun == 0x7FFF:
                    flush_eobrun()
    flush_eobrun()


def _encode_progressive(planes: list[np.ndarray], quants: list[np.ndarray],
                        h: int, w: int) -> bytes:
    """Shared progressive emitter for 1 or 3 components, all 1x1
    sampling. Each scan gets its own flat-canonical DHT built from the
    symbols it actually emits."""
    comps_zz = [_quantize_zz(_tile_blocks(p), q) for p, q in zip(planes, quants)]
    nc = len(planes)
    out = bytearray()
    out += b"\xff\xd8"
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for t in range(min(nc, 2)):
        out += _marker(0xFFDB, bytes([t])
                       + bytes(quants[t].flatten()[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, min(i, 1)])
    out += _marker(0xFFC2, sof)
    for ss, se, ah, al, kind in _PROG_SCRIPT:
        if kind == "dc":
            ev = _Events()
            _enc_dc_scan(ev, comps_zz, ah, al)
            codes = {}
            if ah == 0:  # DC refinement scans are raw bits, no table
                spec = _flat_huff_spec(ev.symbols)
                out += _marker(0xFFC4, _dht_payload(0x00, spec))
                codes = _build_code_table(*spec)
            hdr = struct.pack(">B", nc)
            for i in range(nc):
                hdr += bytes([i + 1, 0x00])
            out += _marker(0xFFDA, hdr + bytes([ss, se, (ah << 4) | al]))
            bw = _BitWriter()
            ev.write(bw, codes)
            bw.flush()
            out += bw.out
        else:  # one non-interleaved AC scan per component
            for i in range(nc):
                ev = _Events()
                _enc_ac_scan(ev, comps_zz[i], ss, se, ah, al)
                spec = _flat_huff_spec(ev.symbols)
                out += _marker(0xFFC4, _dht_payload(0x10, spec))
                out += _marker(0xFFDA, struct.pack(">B", 1) + bytes([i + 1, 0x00])
                               + bytes([ss, se, (ah << 4) | al]))
                bw = _BitWriter()
                ev.write(bw, _build_code_table(*spec))
                bw.flush()
                out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_progressive(band: np.ndarray, quality: int = 90) -> bytes:
    """Progressive (SOF2) grayscale JPEG from a uint8 HxW array — same
    quantized coefficients as encode_jpeg_gray at the same quality, so
    the two encodes decode bit-identically."""
    band = np.asarray(band, dtype=np.uint8)
    h, w = band.shape
    return _encode_progressive([band], [_quality_scale(_QL, quality)], h, w)


def encode_jpeg_rgb_progressive(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Progressive (SOF2) 4:4:4 YCbCr JPEG from a uint8 HxWx3 array —
    same color transform and coefficients as encode_jpeg_rgb."""
    h, w, planes = _rgb_to_ycbcr_planes(rgb)
    ql, qc = _quality_scale(_QL, quality), _quality_scale(_QC, quality)
    return _encode_progressive(planes, [ql, qc, qc], h, w)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; marker bytes
    terminate the segment (handled by the caller via segment slicing)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past end
                self.n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # marker: stop consuming but leave pos AT the 0xFF so
                    # a restart resync can still locate the RSTn (pad the
                    # accumulator with zero bits past this point)
                    self.pos -= 1
                    b = 0
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def jpeg_dims(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF marker — metadata
    probe without full decode."""
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if tag in (0xC0, 0xC1, 0xC2):
            _, h, w, nc = struct.unpack(">BHHB", data[pos + 4 : pos + 10])
            return w, h, nc
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + ln
    raise ValueError("no SOF marker found")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array: HxW (grayscale) or HxWx3 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if tag == 0x01 or 0xD0 <= tag <= 0xD9:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if tag == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = np.frombuffer(payload[off + 1 : off + 65], np.uint8)
                quant[tq] = t.reshape(8, 8)
                off += 65
        elif tag in (0xC0, 0xC1):  # SOF0/1 (both baseline-decodable)
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
        elif tag == 0xC2:  # SOF2: hand the whole stream to the Annex-G path
            return _decode_progressive(data)
        elif tag == 0xC4:  # DHT
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(payload[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif tag == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif tag == 0xDA:  # SOS: entropy data follows until next marker
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos += 2 + ln
            break
        pos += 2 + ln
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["coef"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        c["pred"] = 0

    br = _BitReader(data[pos:])
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # resync: skip to the RSTn marker just past current bits
                br.n = 0
                p = br.pos
                d = br.data
                while p < len(d) - 1 and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
                    p += 1
                br.pos = p + 2
                for c in order:
                    c["pred"] = 0
            for c in order:
                dq = quant[c["tq"]].astype(np.float64)
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        cat = br.read_symbol(huff[(0, c["td"])])
                        diff = _extend(br.read_bits(cat), cat)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(huff[(1, c["ta"])])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * dq
                        px = _C.T @ blk @ _C + 128.0
                        r0 = (my * c["v"] + v) * 8
                        c0 = (mx * c["h"] + hh) * 8
                        c["coef"][r0 : r0 + 8, c0 : c0 + 8] = px
            mcu_count += 1

    return _finish_planes(order, hmax, vmax, h, w)


def _finish_planes(order, hmax: int, vmax: int, h: int, w: int) -> np.ndarray:
    """Pixel-plane tail shared by the sequential and progressive
    decoders: replication upsample, crop, and (for 3 components) the
    JFIF/BT.601 inverse color transform."""
    planes = []
    for c in order:
        p = c["coef"]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8))
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G)
# ---------------------------------------------------------------------------

def _entropy_end(data: bytes, pos: int) -> int:
    """Index of the first marker that is not a stuffed 0x00, a fill
    byte, or an RSTn at/after ``pos`` — the end of one scan's
    entropy-coded segment."""
    p = pos
    while p < len(data) - 1:
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00:
            p += 2
        elif nxt == 0xFF:  # fill byte
            p += 1
        elif 0xD0 <= nxt <= 0xD7:
            p += 2
        else:
            return p
    return len(data)


def _dc_unit(br: "_BitReader", c: dict, blk: np.ndarray, ah: int, al: int,
             huff) -> None:
    """One block's DC contribution: first pass decodes a huffman diff
    of the point-transformed DC; refinement appends one raw bit."""
    if ah == 0:
        cat = br.read_symbol(huff[(0, c["td"])])
        c["pred"] += _extend(br.read_bits(cat), cat)
        blk[0] = c["pred"] << al
    elif br.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _progressive_scan(seg: bytes, scan_comps: list, ss: int, se: int,
                      ah: int, al: int, huff, ri: int,
                      mcux: int, mcuy: int) -> None:
    """Decode one SOS's entropy segment into the components' persistent
    zigzag coefficient stores (T.81 G.2: DC scans may interleave, AC
    scans are single-component over the component's own block grid)."""
    br = _BitReader(seg)

    def resync() -> None:
        br.n = 0
        p, d = br.pos, br.data
        while p < len(d) - 1 and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        br.pos = p + 2
        for c in scan_comps:
            c["pred"] = 0

    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        for c in scan_comps:
            c["pred"] = 0
        mcu = 0
        if len(scan_comps) > 1:  # interleaved DC MCU walk
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and mcu and mcu % ri == 0:
                        resync()
                    for c in scan_comps:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                _dc_unit(br, c,
                                         c["zz"][my * c["v"] + v,
                                                 mx * c["h"] + hh], ah, al, huff)
                    mcu += 1
        else:  # non-interleaved: the component's own block grid
            c = scan_comps[0]
            for by in range(c["nby"]):
                for bx in range(c["nbx"]):
                    if ri and mcu and mcu % ri == 0:
                        resync()
                    _dc_unit(br, c, c["zz"][by, bx], ah, al, huff)
                    mcu += 1
        return

    if len(scan_comps) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    c = scan_comps[0]
    table = huff[(1, c["ta"])]
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    mcu = 0
    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            if ri and mcu and mcu % ri == 0:
                resync()
                eobrun = 0
            mcu += 1
            blk = c["zz"][by, bx]
            if ah == 0:  # G.1.2.2 first pass with EOB runs
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.read_symbol(table)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1  # current block consumed
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # G.1.2.3 refinement with correction bits
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.read_symbol(table)
                        r, s = rs >> 4, rs & 15
                        sval = 0
                        if s:
                            if s != 1:
                                raise ValueError("bad refinement magnitude")
                            sval = p1 if br.read_bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        while k <= se:
                            cur = int(blk[k])
                            if cur != 0:
                                if br.read_bit() and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if sval:
                            if k > se:
                                raise ValueError("refinement index overflow")
                            blk[k] = sval
                        k += 1
                if eobrun > 0:  # finish the band under the EOB run
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if br.read_bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) → uint8 array. Scans accumulate into
    per-component zigzag coefficient stores; dequantization + IDCT run
    once at EOI. Shares the huffman/extend/IDCT/color machinery with
    the sequential decoder, so a progressive and a baseline encode of
    the same quantized coefficients decode bit-identically."""
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    hmax = vmax = mcux = mcuy = 1
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if tag == 0xD9:
            break
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if tag == 0xDB:
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                t = np.zeros(64, dtype=np.int32)
                t[_ZIGZAG] = np.frombuffer(payload[off + 1 : off + 65], np.uint8)
                quant[tq] = t.reshape(8, 8)
                off += 65
        elif tag == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq, "td": 0, "ta": 0, "pred": 0})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                comp_w = -(-(w * c["h"]) // hmax)
                comp_h = -(-(h * c["v"]) // vmax)
                c["nbx"] = -(-comp_w // 8)
                c["nby"] = -(-comp_h // 8)
                c["zz"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                   dtype=np.int32)
        elif tag in (0xC0, 0xC1, 0xC3):
            raise ValueError("mixed SOF markers in progressive stream")
        elif tag == 0xC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(payload[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif tag == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif tag == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF2")
            ns = payload[0]
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                c = by_id[cs]
                c["td"], c["ta"] = tt >> 4, tt & 0xF
                scan_comps.append(c)
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            start = pos + 2 + ln
            end = _entropy_end(data, start)
            _progressive_scan(data[start:end], scan_comps, ss, se,
                              ahal >> 4, ahal & 0xF, huff,
                              restart_interval, mcux, mcuy)
            pos = end
            continue
        pos += 2 + ln
    if comps is None:
        raise ValueError("missing SOF2")

    for c in comps:
        dq = quant[c["tq"]].astype(np.float64)
        zz = c["zz"].reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8) * dq
        px = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + 128.0
        nby, nbx = c["zz"].shape[:2]
        c["coef"] = (px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                     .reshape(nby * 8, nbx * 8))
    return _finish_planes(comps, hmax, vmax, h, w)
