"""From-spec VP8 (lossy WebP) intra-frame codec — numpy + stdlib only.

Implements the keyframe subset of RFC 6386 ("VP8 Data Format and
Decoding Guide") that lossy WebP stills and VP8 video keyframes use,
the same way jpeg/codec.py implements ITU-T T.81: the normative
DECODER machinery is transcribed from the spec — boolean arithmetic
decoder (§7), token trees and probability-indexed coefficient decode
(§13), dequantization tables (§14.1), the exact integer inverse DCT
and inverse Walsh-Hadamard transforms (§14.3-14.4), and 16x16 luma /
8x8 chroma intra prediction (§12.2) — plus a real two-pass ENCODER
(tokenize + per-frame probability fit, then bool-encode) that emits
structurally spec-shaped keyframe streams.

Family boundary (fail-fast NotImplementedError outside it, the same
honest-stub shape as media/mp3.py):

- keyframes only (frame_type 0); interframes need reference buffers.
- 16x16 luma modes (DC/V/H/TM) + 8x8 chroma modes only; B_PRED
  (per-4x4 submodes) raises.
- loop_filter_level == 0 only (our encoder always writes 0, which is
  spec-legal and makes the reconstruction exactly the transform
  output); nonzero levels would need the §15 loop filter.
- one DCT token partition (log2_partitions == 0).
- no segmentation.

Offline-fidelity caveat (stated, not hidden): this container has no
copy of the RFC's two 4x8x3x11 probability constants
(default_coeff_probs §13.5 / coeff_update_probs §13.4), so
- the ENCODER side-steps the default table entirely by TRANSMITTING
  every coefficient probability in the frame header (flag=1 + 8-bit
  literal, the spec's update mechanism §9.9, fitted per frame from the
  actual token statistics — what real two-pass encoders do anyway),
- the update-FLAG coding probability is the uniform 128 approximation
  of §13.4 (self-consistent between this encoder and decoder; swap in
  the verbatim RFC table for bit-interop with external decoders).
Everything else (trees, Pcat extra-bit probs, kf mode probs, zigzag,
bands, quant tables, transforms) is transcribed verbatim from the RFC.
In-sandbox verification is therefore round-trip + closed-form: the
boolean coder round-trips arbitrary (bit, prob) sequences, the
transforms round-trip exactly, solid frames reconstruct to a
closed-form integer value pinned for all 256 grays (tests/test_vp8.py)
— the same epistemic contract as the MP3 Layer III decoder.

Reference parity note: the reference engine (rastertiler-rs) has no
WebP/VP8 code at all (PNG via a crate); this module exists for the
multimodal image/video columns of the training-data pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# boolean arithmetic coder (RFC 6386 §7, §8)
# ---------------------------------------------------------------------------


class BoolEncoder:
    """RFC 6386 §8.1 reference encoder, with the uint32 'bottom'
    register kept exact (Python ints) and the += carry propagated
    eagerly instead of relying on 32-bit wraparound."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _add_one_to_output(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise AssertionError("carry out of stream start")
        self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        if self.bottom >= (1 << 32):  # carry past the 32-bit window
            self._add_one_to_output()
            self.bottom -= 1 << 32
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._add_one_to_output()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def put_literal(self, value: int, bits: int) -> None:
        for shift in range(bits - 1, -1, -1):
            self.put((value >> shift) & 1, 128)

    def put_tree(self, tree: list[int], probs, symbol: int) -> None:
        for node, bit in _tree_path(tree, symbol):
            self.put(bit, probs[node >> 1])

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._add_one_to_output()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


class BoolDecoder:
    """RFC 6386 §7.2 reference decoder (reads 0 past end-of-input)."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 2
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def get_literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.get(128)
        return v

    def get_tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


def _tree_path(tree: list[int], symbol: int):
    """(node_index, bit) decisions that lead to -symbol in `tree`."""
    target = -symbol
    # DFS from root recording the path
    stack = [(0, [])]
    while stack:
        node, path = stack.pop()
        for bit in (0, 1):
            nxt = tree[node + bit]
            if nxt == target and not (nxt > 0):
                return path + [(node, bit)]
            if nxt > 0:
                stack.append((nxt, path + [(node, bit)]))
    raise ValueError(f"symbol {symbol} not in tree")


# ---------------------------------------------------------------------------
# constant tables (RFC 6386 §13, §14.1) — see module docstring for the
# two tables this offline build approximates
# ---------------------------------------------------------------------------

# tokens (§13.2)
T_ZERO, T_ONE, T_TWO, T_THREE, T_FOUR = 0, 1, 2, 3, 4
T_CAT1, T_CAT2, T_CAT3, T_CAT4, T_CAT5, T_CAT6 = 5, 6, 7, 8, 9, 10
T_EOB = 11

COEFF_TREE = [
    -T_EOB, 2,
    -T_ZERO, 4,
    -T_ONE, 6,
    8, 12,
    -T_TWO, 10,
    -T_THREE, -T_FOUR,
    14, 16,
    -T_CAT1, -T_CAT2,
    18, 20,
    -T_CAT3, -T_CAT4,
    -T_CAT5, -T_CAT6,
]

# extra-bit categories: (base value, per-bit probabilities) (§13.2)
CAT_BASE = {T_CAT1: 5, T_CAT2: 7, T_CAT3: 11, T_CAT4: 19,
            T_CAT5: 35, T_CAT6: 67}
CAT_PROBS = {
    T_CAT1: [159],
    T_CAT2: [165, 145],
    T_CAT3: [173, 148, 140],
    T_CAT4: [176, 155, 140, 135],
    T_CAT5: [180, 157, 141, 134, 130],
    T_CAT6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

N_TYPES, N_BANDS, N_CTX, N_NODES = 4, 8, 3, 11
# uniform stand-in for §13.4 coeff_update_probs (see module docstring)
UPDATE_FLAG_PROB = 128
# uniform stand-in default table — our encoder always transmits probs,
# so streams never depend on these values
DEFAULT_COEFF_PROB = 128

# keyframe intra mode coding (§11.2): modes DC=0 V=1 H=2 TM=3 B_PRED=4
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]

# dequantization lookups (§14.1)
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
]
AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]
assert len(DC_QLOOKUP) == 128 and len(AC_QLOOKUP) == 128


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def quant_factors(qi: int) -> dict:
    """§14.1 dequantization factors for frame quantizer index `qi`
    (all five deltas zero — what our encoder writes)."""
    y2_ac = AC_QLOOKUP[_clamp_q(qi)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_q(qi)]
    if uv_dc > 132:
        uv_dc = 132
    return {
        "y1_dc": DC_QLOOKUP[_clamp_q(qi)],
        "y1_ac": AC_QLOOKUP[_clamp_q(qi)],
        "y2_dc": DC_QLOOKUP[_clamp_q(qi)] * 2,
        "y2_ac": y2_ac,
        "uv_dc": uv_dc,
        "uv_ac": AC_QLOOKUP[_clamp_q(qi)],
    }


# ---------------------------------------------------------------------------
# transforms: inverse per RFC 6386 §14.3-14.4 (normative), forward as
# the exact float adjoint (encoder freedom under the spec)
# ---------------------------------------------------------------------------

_COSPI8SQRT2MINUS1 = 20091
_SINPI8SQRT2 = 35468


def idct4x4(block: np.ndarray) -> np.ndarray:
    """§14.3 inverse DCT: int16 coeffs (4,4) -> residual (4,4) int32."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    # vertical pass (over columns)
    for c in range(4):
        a1 = ip[0, c] + ip[2, c]
        b1 = ip[0, c] - ip[2, c]
        t1 = (ip[1, c] * _SINPI8SQRT2) >> 16
        t2 = ip[3, c] + ((ip[3, c] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = ip[1, c] + ((ip[1, c] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (ip[3, c] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        tmp[0, c] = a1 + d1
        tmp[3, c] = a1 - d1
        tmp[1, c] = b1 + c1
        tmp[2, c] = b1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    # horizontal pass (over rows) with the final (+4)>>3
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 2]
        b1 = tmp[r, 0] - tmp[r, 2]
        t1 = (tmp[r, 1] * _SINPI8SQRT2) >> 16
        t2 = tmp[r, 3] + ((tmp[r, 3] * _COSPI8SQRT2MINUS1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r, 1] + ((tmp[r, 1] * _COSPI8SQRT2MINUS1) >> 16)
        t2 = (tmp[r, 3] * _SINPI8SQRT2) >> 16
        d1 = t1 + t2
        out[r, 0] = (a1 + d1 + 4) >> 3
        out[r, 3] = (a1 - d1 + 4) >> 3
        out[r, 1] = (b1 + c1 + 4) >> 3
        out[r, 2] = (b1 - c1 + 4) >> 3
    return out.astype(np.int32)


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """§14.4 inverse Walsh-Hadamard: Y2 coeffs (4,4) -> the 16 luma
    subblock DC coefficients, raster order (4,4) int32."""
    ip = block.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for c in range(4):
        a1 = ip[0, c] + ip[3, c]
        b1 = ip[1, c] + ip[2, c]
        c1 = ip[1, c] - ip[2, c]
        d1 = ip[0, c] - ip[3, c]
        tmp[0, c] = a1 + b1
        tmp[1, c] = c1 + d1
        tmp[2, c] = a1 - b1
        tmp[3, c] = d1 - c1
    out = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        a1 = tmp[r, 0] + tmp[r, 3]
        b1 = tmp[r, 1] + tmp[r, 2]
        c1 = tmp[r, 1] - tmp[r, 2]
        d1 = tmp[r, 0] - tmp[r, 3]
        a2 = a1 + b1
        b2 = c1 + d1
        c2 = a1 - b1
        d2 = d1 - c1
        out[r, 0] = (a2 + 3) >> 3
        out[r, 1] = (b2 + 3) >> 3
        out[r, 2] = (c2 + 3) >> 3
        out[r, 3] = (d2 + 3) >> 3
    return out.astype(np.int32)


# the inverse transforms' exact linear parts (rounding aside): composite
# inverse_DCT = Cᵀ·X·C / 8 with C rows [1,1,1,1],[β,α,-α,-β],[1,-1,-1,1],
# [α,-β,β,-α] (α=√2·sin(π/8), β=√2·cos(π/8)); C·Cᵀ = 4I, so the exact
# adjoint forward is C·X·Cᵀ / 2. Same shape for WHT with H·Hᵀ = 4I.
_ALPHA = _SINPI8SQRT2 / 65536.0
_BETA = 1.0 + _COSPI8SQRT2MINUS1 / 65536.0
_C = np.array([
    [1.0, 1.0, 1.0, 1.0],
    [_BETA, _ALPHA, -_ALPHA, -_BETA],
    [1.0, -1.0, -1.0, 1.0],
    [_ALPHA, -_BETA, _BETA, -_ALPHA],
])
_H = np.array([
    [1.0, 1.0, 1.0, 1.0],
    [1.0, 1.0, -1.0, -1.0],
    [1.0, -1.0, -1.0, 1.0],
    [1.0, -1.0, 1.0, -1.0],
])


def fdct4x4(residual: np.ndarray) -> np.ndarray:
    """Forward DCT matched to idct4x4 (float adjoint, single rounding).
    Constant residual r maps to DC exactly 8r, ACs exactly 0."""
    c = _C @ residual.astype(np.float64) @ _C.T / 2.0
    return np.round(c).astype(np.int32)


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward WHT matched to iwht4x4. Constant d maps to 8d at (0,0)."""
    c = _H @ dcs.astype(np.float64) @ _H.T / 2.0
    return np.round(c).astype(np.int32)


def quantize_block(coeffs: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    """Round-half-away quantization, magnitudes clamped to the token
    alphabet ceiling (cat6 base 67 + 11 extra bits = 2114)."""
    q = np.full((4, 4), ac_q, dtype=np.int64)
    q[0, 0] = dc_q
    a = np.abs(coeffs.astype(np.int64))
    t = (a + q // 2) // q
    np.clip(t, 0, 2114, out=t)
    return (np.sign(coeffs) * t).astype(np.int32)


def dequantize_block(levels: np.ndarray, dc_q: int, ac_q: int) -> np.ndarray:
    q = np.full((4, 4), ac_q, dtype=np.int64)
    q[0, 0] = dc_q
    return (levels.astype(np.int64) * q).astype(np.int32)


# ---------------------------------------------------------------------------
# intra prediction (§12.2) — 16x16 luma and 8x8 chroma whole-MB modes
# ---------------------------------------------------------------------------


def predict_block(recon: np.ndarray, y0: int, x0: int, size: int,
                  mode: int) -> np.ndarray:
    """Predict the size×size block at (y0, x0) of plane `recon` from
    already-reconstructed neighbors. Border conventions: missing above
    row = 127, missing left column = 129 (§12.2)."""
    have_above = y0 > 0
    have_left = x0 > 0
    if have_above:
        above = recon[y0 - 1, x0:x0 + size].astype(np.int64)
    else:
        above = np.full(size, 127, dtype=np.int64)
    if have_left:
        left = recon[y0:y0 + size, x0 - 1].astype(np.int64)
    else:
        left = np.full(size, 129, dtype=np.int64)
    if mode == DC_PRED:
        if have_above and have_left:
            shift = {4: 3, 8: 4, 16: 5}[size]
            dc = (int(above.sum()) + int(left.sum()) + size) >> shift
        elif have_above:
            shift = {4: 2, 8: 3, 16: 4}[size]
            dc = (int(above.sum()) + size // 2) >> shift
        elif have_left:
            shift = {4: 2, 8: 3, 16: 4}[size]
            dc = (int(left.sum()) + size // 2) >> shift
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    if mode == TM_PRED:
        if have_above and have_left:
            al = int(recon[y0 - 1, x0 - 1])
        elif have_above:
            al = 127
        else:
            al = 129
        p = left[:, None] + above[None, :] - al
        return np.clip(p, 0, 255)
    raise ValueError(f"unknown prediction mode {mode}")


# ---------------------------------------------------------------------------
# token (de)tokenization — shared walk so encoder and decoder cannot
# drift on tree/band/context rules
# ---------------------------------------------------------------------------


def _token_for_value(v: int) -> int:
    a = abs(v)
    if a <= 4:
        return a  # ZERO..FOUR
    for tok in (T_CAT1, T_CAT2, T_CAT3, T_CAT4, T_CAT5):
        base = CAT_BASE[tok]
        if a < base + (1 << len(CAT_PROBS[tok])):
            return tok
    return T_CAT6


def tokenize_block(levels: np.ndarray, first_coeff: int) -> list[tuple]:
    """Quantized block (4,4 raster) -> [(token, extra_bits, sign)].
    Emits tokens in zigzag order with the trailing EOB; minimal form
    (EOB immediately after the last nonzero coefficient)."""
    zz = [int(levels.flat[ZIGZAG[i]]) for i in range(16)]
    last = -1
    for i in range(first_coeff, 16):
        if zz[i] != 0:
            last = i
    toks: list[tuple] = []
    if last < 0:
        return [(T_EOB, 0, 0)]
    for i in range(first_coeff, last + 1):
        v = zz[i]
        tok = _token_for_value(v)
        extra = abs(v) - CAT_BASE.get(tok, abs(v))
        toks.append((tok, extra, 1 if v < 0 else 0))
    if last < 15:
        # position 16 is never reached, so an EOB token is coded; after
        # coefficient 15 the decoder stops without one (§13.3)
        toks.append((T_EOB, 0, 0))
    return toks


def _ctx_after(token: int, extra: int) -> int:
    if token == T_ZERO:
        return 0
    if token == T_ONE:
        return 1
    return 2


class _TokenStats:
    """Per-(type, band, ctx, node) 0/1 counts for the probability fit."""

    def __init__(self) -> None:
        self.c0 = np.zeros((N_TYPES, N_BANDS, N_CTX, N_NODES), np.int64)
        self.c1 = np.zeros_like(self.c0)

    def fit(self) -> np.ndarray:
        tot = self.c0 + self.c1
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where(tot > 0, (self.c0 * 256) // np.maximum(tot, 1), 128)
        return np.clip(p, 1, 255).astype(np.int32)


def _walk_token_bits(block_type: int, toks: list[tuple], first_coeff: int,
                     ctx0: int, sink, raw_sink=None) -> int:
    """Drive `sink(type, band, ctx, node, bit)` for every tree decision
    of a block's token list, and `raw_sink(bit, prob)` for the
    fixed-probability bits (category extra bits MSB-first per §13.2,
    then the sign at prob 128); returns the block's nonzero flag.
    raw_sink=None (the statistics pass) skips them — their
    probabilities are spec constants, not fitted."""
    ctx = ctx0
    i = first_coeff
    start = 0  # tree start index; 2 after a ZERO token (no EOB allowed)
    nonzero = 0
    for tok, extra, sign in toks:
        band = COEFF_BANDS[i] if i < 16 else 7
        for node, bit in _TOKEN_PATHS[(tok, start)]:
            sink(block_type, band, ctx, node >> 1, bit)
        if tok == T_EOB:
            break
        if raw_sink is not None and tok != T_ZERO:
            cat_probs = CAT_PROBS.get(tok)
            if cat_probs is not None:
                for shift, pb in enumerate(cat_probs):
                    raw_sink((extra >> (len(cat_probs) - 1 - shift)) & 1, pb)
            raw_sink(sign, 128)
        if tok != T_ZERO:
            nonzero = 1
        start = 2 if tok == T_ZERO else 0
        ctx = _ctx_after(tok, extra)
        i += 1
    return nonzero


def _paths() -> dict:
    out = {}
    for tok in range(12):
        full = _tree_path(COEFF_TREE, tok)
        out[(tok, 0)] = full
        if tok != T_EOB:
            # start=2 variant: skip the root EOB decision
            out[(tok, 2)] = full[1:]
    return out


_TOKEN_PATHS = _paths()


# ---------------------------------------------------------------------------
# plane helpers
# ---------------------------------------------------------------------------


def _pad_plane(plane: np.ndarray, block: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + block - 1) // block * block
    pw = (w + block - 1) // block * block
    if ph == h and pw == w:
        return plane
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:h, :]
    out[:h, w:] = plane[:, w - 1:w]
    out[h:, w:] = plane[h - 1, w - 1]
    return out


def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """Full-range BT.601 RGB -> Y, U, V with 2x2 box-mean chroma
    subsampling (documented engine convention; VP8 itself does not
    define the RGB matrix)."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    y8 = np.clip(np.round(y), 0, 255).astype(np.uint8)
    h, w = y8.shape
    ue = _pad_plane(np.clip(np.round(u), 0, 255), 2)
    ve = _pad_plane(np.clip(np.round(v), 0, 255), 2)
    u8 = np.clip(np.round(
        ue.reshape(ue.shape[0] // 2, 2, ue.shape[1] // 2, 2)
        .mean(axis=(1, 3))), 0, 255).astype(np.uint8)
    v8 = np.clip(np.round(
        ve.reshape(ve.shape[0] // 2, 2, ve.shape[1] // 2, 2)
        .mean(axis=(1, 3))), 0, 255).astype(np.uint8)
    return y8, u8, v8


def yuv420_to_rgba(y: np.ndarray, u: np.ndarray, v: np.ndarray
                   ) -> np.ndarray:
    """Inverse of rgb_to_yuv420 (nearest-replication chroma upsample)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = y.astype(np.float64)
    uf = uu.astype(np.float64) - 128.0
    vf = vv.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = np.clip(np.round(r), 0, 255)
    out[:, :, 1] = np.clip(np.round(g), 0, 255)
    out[:, :, 2] = np.clip(np.round(b), 0, 255)
    out[:, :, 3] = 255
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_PLANE_Y_NO_DC, _PLANE_Y2, _PLANE_UV = 0, 1, 2  # block types (§13.3)


def _encode_mb_plan(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                    qi: int) -> tuple[list[dict], np.ndarray]:
    """Per-MB mode decision + transform/quantize, reconstructing as it
    goes (the decoder's prediction source). Returns MB records and the
    reconstructed Y plane (for tests)."""
    qf = quant_factors(qi)
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    ry = np.zeros_like(y, dtype=np.int64)
    ru = np.zeros_like(u, dtype=np.int64)
    rv = np.zeros_like(v, dtype=np.int64)
    mbs: list[dict] = []
    for my in range(mb_h):
        for mx in range(mb_w):
            y0, x0 = my * 16, mx * 16
            src = y[y0:y0 + 16, x0:x0 + 16].astype(np.int64)
            # luma mode: min SAD over the four 16x16 modes, restricted
            # to modes whose neighbors exist (DC always legal)
            best, best_mode, best_pred = None, DC_PRED, None
            for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pred = predict_block(ry, y0, x0, 16, mode)
                sad = int(np.abs(src - pred).sum())
                if best is None or sad < best:
                    best, best_mode, best_pred = sad, mode, pred
            resid = src - best_pred
            # 16 4x4 luma blocks -> fDCT; DCs -> Y2 WHT
            levels_y = []
            dcs = np.zeros((4, 4), dtype=np.int32)
            deq_blocks = []
            for by in range(4):
                for bx in range(4):
                    blk = resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    c = fdct4x4(blk)
                    dcs[by, bx] = c[0, 0]
                    lev = quantize_block(c, qf["y1_dc"], qf["y1_ac"])
                    lev[0, 0] = 0  # DC rides Y2
                    levels_y.append(lev)
                    deq_blocks.append(
                        dequantize_block(lev, qf["y1_dc"], qf["y1_ac"]))
            y2 = fwht4x4(dcs)
            lev_y2 = quantize_block(y2, qf["y2_dc"], qf["y2_ac"])
            deq_y2 = dequantize_block(lev_y2, qf["y2_dc"], qf["y2_ac"])
            sub_dcs = iwht4x4(deq_y2)
            # reconstruct luma
            rec = np.empty((16, 16), dtype=np.int64)
            for b in range(16):
                by, bx = divmod(b, 4)
                coeffs = deq_blocks[b].copy()
                coeffs[0, 0] = sub_dcs[by, bx]
                r4 = idct4x4(coeffs)
                rec[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(
                    best_pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r4,
                    0, 255)
            ry[y0:y0 + 16, x0:x0 + 16] = rec
            # chroma (8x8 per plane): shared uv mode by min total SAD
            cy0, cx0 = my * 8, mx * 8
            usrc = u[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int64)
            vsrc = v[cy0:cy0 + 8, cx0:cx0 + 8].astype(np.int64)
            bestc, best_uv = None, DC_PRED
            for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = predict_block(ru, cy0, cx0, 8, mode)
                pv = predict_block(rv, cy0, cx0, 8, mode)
                sad = int(np.abs(usrc - pu).sum() + np.abs(vsrc - pv).sum())
                if bestc is None or sad < bestc:
                    bestc, best_uv = sad, mode
            levels_uv = []
            for plane_src, rplane, p0 in ((usrc, ru, (cy0, cx0)),
                                          (vsrc, rv, (cy0, cx0))):
                pred = predict_block(rplane, p0[0], p0[1], 8, best_uv)
                presid = plane_src - pred
                recs = np.empty((8, 8), dtype=np.int64)
                for by in range(2):
                    for bx in range(2):
                        blk = presid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                        lev = quantize_block(fdct4x4(blk),
                                             qf["uv_dc"], qf["uv_ac"])
                        levels_uv.append(lev)
                        deq = dequantize_block(lev, qf["uv_dc"], qf["uv_ac"])
                        recs[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(
                            pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                            + idct4x4(deq), 0, 255)
                rplane[p0[0]:p0[0] + 8, p0[1]:p0[1] + 8] = recs
            mbs.append({"ymode": best_mode, "uvmode": best_uv,
                        "y2": lev_y2, "y": levels_y, "uv": levels_uv})
    return mbs, ry


class _NzContext:
    """Above/left nonzero-coefficient flags per subblock (the token
    context state): 4 Y columns, 2 U, 2 V, 1 Y2 per MB column/row."""

    def __init__(self, mb_w: int) -> None:
        self.above = [np.zeros(9, dtype=np.int32) for _ in range(mb_w)]
        self.left = np.zeros(9, dtype=np.int32)

    def reset_left(self) -> None:
        self.left[:] = 0


def _mb_token_walk(mb: dict, nz_above: np.ndarray, nz_left: np.ndarray,
                   sink, raw_sink=None) -> None:
    """Walk one MB's blocks in spec order (Y2, 16 Y, 4 U, 4 V) driving
    `sink` for every bool decision and updating the nonzero contexts.
    Context layout: [0:4]=Y columns/rows, [4:6]=U, [6:8]=V, [8]=Y2."""
    # Y2 block
    ctx0 = int(nz_above[8]) + int(nz_left[8])
    toks = tokenize_block(mb["y2"], 0)
    nz = _walk_token_bits(_PLANE_Y2, toks, 0, ctx0, sink, raw_sink)
    nz_above[8] = nz_left[8] = nz
    # 16 luma blocks (first_coeff 1: DC rides Y2)
    for b in range(16):
        by, bx = divmod(b, 4)
        ctx0 = int(nz_above[bx]) + int(nz_left[by])
        toks = tokenize_block(mb["y"][b], 1)
        nz = _walk_token_bits(_PLANE_Y_NO_DC, toks, 1, ctx0, sink, raw_sink)
        nz_above[bx] = nz
        nz_left[by] = nz
    # 4 U then 4 V
    for half, base in ((0, 4), (1, 6)):
        for b in range(4):
            by, bx = divmod(b, 2)
            ctx0 = int(nz_above[base + bx]) + int(nz_left[base + by])
            toks = tokenize_block(mb["uv"][half * 4 + b], 0)
            nz = _walk_token_bits(_PLANE_UV, toks, 0, ctx0, sink, raw_sink)
            nz_above[base + bx] = nz
            nz_left[base + by] = nz


def encode_vp8_frame(y: np.ndarray, u: np.ndarray | None = None,
                     v: np.ndarray | None = None, *, qi: int = 20
                     ) -> bytes:
    """Encode planes (u8) as a VP8 keyframe bitstream (no RIFF
    container). Grayscale callers pass only `y` (chroma = flat 128)."""
    if not 0 <= qi <= 127:
        raise ValueError("qi must be in [0, 127]")
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if not (0 < w < 16384 and 0 < h < 16384):
        raise ValueError("VP8 dims must fit 14 bits")
    yp = _pad_plane(y, 16)
    if u is None:
        up = np.full((yp.shape[0] // 2, yp.shape[1] // 2), 128, np.uint8)
        vp = up.copy()
    else:
        up = _pad_plane(np.asarray(u, dtype=np.uint8), 8)
        vp = _pad_plane(np.asarray(v, dtype=np.uint8), 8)
        if up.shape != (yp.shape[0] // 2, yp.shape[1] // 2):
            raise ValueError("chroma planes must be half-size 4:2:0")
    mb_w = yp.shape[1] // 16
    mbs, _ = _encode_mb_plan(yp, up, vp, qi)

    # pass 1: token statistics -> per-frame probabilities
    stats = _TokenStats()

    def count(btype, band, ctx, node, bit):
        if bit:
            stats.c1[btype, band, ctx, node] += 1
        else:
            stats.c0[btype, band, ctx, node] += 1

    nzc = _NzContext(mb_w)
    mb_i = 0
    for my in range(yp.shape[0] // 16):
        nzc.reset_left()
        for mx in range(mb_w):
            _mb_token_walk(mbs[mb_i], nzc.above[mx], nzc.left, count)
            mb_i += 1
    probs = stats.fit()

    # first partition: frame header + per-MB modes
    e1 = BoolEncoder()
    e1.put(0, 128)  # color space: YUV (0)
    e1.put(0, 128)  # clamping: spec-required clamp (0)
    e1.put(0, 128)  # segmentation_enabled: off
    e1.put(0, 128)  # filter_type: normal
    e1.put_literal(0, 6)   # loop_filter_level 0 (family boundary)
    e1.put_literal(0, 3)   # sharpness
    e1.put(0, 128)  # loop_filter_adj off
    e1.put_literal(0, 2)   # log2_partitions: 1 token partition
    e1.put_literal(qi, 7)  # y_ac_qi
    for _ in range(5):     # all quantizer deltas absent
        e1.put(0, 128)
    e1.put(1, 128)  # refresh_entropy_probs
    # transmit every coefficient probability (see module docstring)
    for t in range(N_TYPES):
        for b in range(N_BANDS):
            for c in range(N_CTX):
                for n in range(N_NODES):
                    e1.put(1, UPDATE_FLAG_PROB)
                    e1.put_literal(int(probs[t, b, c, n]), 8)
    e1.put(0, 128)  # mb_no_coeff_skip: off (every MB codes tokens)
    for mb in mbs:
        e1.put_tree(KF_YMODE_TREE, KF_YMODE_PROB, mb["ymode"])
        e1.put_tree(UV_MODE_TREE, KF_UV_MODE_PROB, mb["uvmode"])
    part1 = e1.flush()

    # token partition
    e2 = BoolEncoder()

    def emit(btype, band, ctx, node, bit):
        e2.put(bit, int(probs[btype, band, ctx, node]))

    nzc = _NzContext(mb_w)
    mb_i = 0
    for my in range(yp.shape[0] // 16):
        nzc.reset_left()
        for mx in range(mb_w):
            _mb_token_walk(mbs[mb_i], nzc.above[mx], nzc.left, emit,
                           raw_sink=e2.put)
            mb_i += 1
    part2 = e2.flush()

    # uncompressed 10-byte keyframe header (§9.1)
    tag = (len(part1) << 5) | (1 << 4) | (0 << 1) | 0  # show=1, ver=0, key
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<H", w)   # 14-bit width, scale 0
    head += struct.pack("<H", h)
    return head + part1 + part2


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_coeff_probs(d: BoolDecoder) -> np.ndarray:
    probs = np.full((N_TYPES, N_BANDS, N_CTX, N_NODES),
                    DEFAULT_COEFF_PROB, dtype=np.int32)
    for t in range(N_TYPES):
        for b in range(N_BANDS):
            for c in range(N_CTX):
                for n in range(N_NODES):
                    if d.get(UPDATE_FLAG_PROB):
                        probs[t, b, c, n] = d.get_literal(8)
    return probs


def _decode_block_tokens(d: BoolDecoder, probs: np.ndarray, btype: int,
                         first_coeff: int, ctx0: int
                         ) -> tuple[np.ndarray, int]:
    """One block's token stream -> (4,4) quantized levels + nz flag."""
    levels = np.zeros(16, dtype=np.int32)
    ctx = ctx0
    i = first_coeff
    start = 0
    nonzero = 0
    while i < 16:
        band = COEFF_BANDS[i]
        p = probs[btype, band, ctx]
        tok = d.get_tree(COEFF_TREE, p, start)
        if tok == T_EOB:
            break
        if tok == T_ZERO:
            start = 2
            ctx = 0
            i += 1
            continue
        start = 0
        if tok <= T_FOUR:
            val = tok
        else:
            extra = 0
            for pb in CAT_PROBS[tok]:  # extra bits MSB-first (§13.2)
                extra = (extra << 1) | d.get(pb)
            val = CAT_BASE[tok] + extra
        sign = d.get(128)
        levels[ZIGZAG[i]] = -val if sign else val
        ctx = 1 if val == 1 else 2
        nonzero = 1
        i += 1
    return levels.reshape(4, 4), nonzero


def decode_vp8_frame(data: bytes) -> dict:
    """VP8 keyframe bitstream -> dict(y, u, v, width, height, qi).
    Raises NotImplementedError outside the documented family."""
    if len(data) < 10:
        raise ValueError("truncated VP8 frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframes need reference buffers — keyframe-only "
            "decoder (see module docstring)")
    part1_len = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = struct.unpack_from("<H", data, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", data, 8)[0] & 0x3FFF
    body = data[10:]
    if part1_len > len(body):
        raise ValueError("first partition overruns frame")
    d1 = BoolDecoder(body[:part1_len])
    d1.get(128)  # color space
    d1.get(128)  # clamping
    if d1.get(128):
        raise NotImplementedError("segmentation not in decode family")
    d1.get(128)                 # filter type
    flevel = d1.get_literal(6)  # loop filter level
    d1.get_literal(3)           # sharpness
    if flevel != 0:
        raise NotImplementedError(
            "loop_filter_level > 0 needs the §15 loop filter — this "
            "family always encodes level 0")
    if d1.get(128):  # loop_filter_adj
        raise NotImplementedError("per-mode/ref filter deltas")
    if d1.get_literal(2) != 0:
        raise NotImplementedError("multiple token partitions")
    qi = d1.get_literal(7)
    deltas = []
    for _ in range(5):
        if d1.get(128):
            mag = d1.get_literal(4)
            deltas.append(-mag if d1.get(128) else mag)
        else:
            deltas.append(0)
    if any(deltas):
        raise NotImplementedError("quantizer deltas not in family")
    d1.get(128)  # refresh_entropy_probs
    probs = _read_coeff_probs(d1)
    if d1.get(128):
        raise NotImplementedError("mb_no_coeff_skip not in family")
    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    modes = []
    for _ in range(mb_w * mb_h):
        ym = d1.get_tree(KF_YMODE_TREE, KF_YMODE_PROB)
        if ym == B_PRED:
            raise NotImplementedError(
                "B_PRED (per-4x4 submodes) not in decode family")
        uvm = d1.get_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
        modes.append((ym, uvm))

    qf = quant_factors(qi)
    d2 = BoolDecoder(body[part1_len:])
    ry = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int64)
    ru = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
    rv = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
    nzc = _NzContext(mb_w)
    mb_i = 0
    for my in range(mb_h):
        nzc.reset_left()
        for mx in range(mb_w):
            ym, uvm = modes[mb_i]
            mb_i += 1
            na, nl = nzc.above[mx], nzc.left
            # Y2
            lev_y2, nz = _decode_block_tokens(
                d2, probs, _PLANE_Y2, 0, int(na[8]) + int(nl[8]))
            na[8] = nl[8] = nz
            sub_dcs = iwht4x4(
                dequantize_block(lev_y2, qf["y2_dc"], qf["y2_ac"]))
            # 16 Y blocks
            y0, x0 = my * 16, mx * 16
            pred = predict_block(ry, y0, x0, 16, ym)
            rec = np.empty((16, 16), dtype=np.int64)
            for b in range(16):
                by, bx = divmod(b, 4)
                lev, nz = _decode_block_tokens(
                    d2, probs, _PLANE_Y_NO_DC, 1,
                    int(na[bx]) + int(nl[by]))
                na[bx] = nz
                nl[by] = nz
                coeffs = dequantize_block(lev, qf["y1_dc"], qf["y1_ac"])
                coeffs[0, 0] = sub_dcs[by, bx]
                r4 = idct4x4(coeffs)
                rec[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(
                    pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] + r4, 0, 255)
            ry[y0:y0 + 16, x0:x0 + 16] = rec
            # chroma
            cy0, cx0 = my * 8, mx * 8
            for base, rplane in ((4, ru), (6, rv)):
                pred = predict_block(rplane, cy0, cx0, 8, uvm)
                recs = np.empty((8, 8), dtype=np.int64)
                for b in range(4):
                    by, bx = divmod(b, 2)
                    lev, nz = _decode_block_tokens(
                        d2, probs, _PLANE_UV, 0,
                        int(na[base + bx]) + int(nl[base + by]))
                    na[base + bx] = nz
                    nl[base + by] = nz
                    deq = dequantize_block(lev, qf["uv_dc"], qf["uv_ac"])
                    recs[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(
                        pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                        + idct4x4(deq), 0, 255)
                rplane[cy0:cy0 + 8, cx0:cx0 + 8] = recs
    ch, cw = (h + 1) // 2, (w + 1) // 2
    return {"y": ry[:h, :w].astype(np.uint8),
            "u": ru[:ch, :cw].astype(np.uint8),
            "v": rv[:ch, :cw].astype(np.uint8),
            "width": w, "height": h, "qi": qi}


def decode_vp8_rgba(data: bytes) -> np.ndarray:
    f = decode_vp8_frame(data)
    return yuv420_to_rgba(f["y"], f["u"], f["v"])
