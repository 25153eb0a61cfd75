"""From-spec WebP lossless (VP8L) codec — numpy + stdlib only.

Like png/codec.py and jpeg/codec.py, this implements the public
bitstream spec (RFC 9649, "WebP Image Format") directly; the reference
engine gets WebP from a crate, this engine implements the subset it
needs:

- ``encode_webp_lossless``: spec-valid RIFF/WEBP/VP8L streams. The
  default is a stable literal-only stream; keyword knobs opt into the
  rest of the spec surface — color cache, LZ77 backward references
  (plain scan-line or 2D neighborhood distance codes), all four
  transforms (predictor with every spec mode, color transform,
  subtract-green, color-indexing with sub-byte pixel bundling), and
  tiled meta prefix-code groups. Every emitted prefix code is either
  the spec's "simple" form (1-2 symbols) or a full code-length-coded
  canonical code, so any conforming VP8L decoder reads these files.
- ``decode_webp``: the FULL VP8L lossless decode surface — all four
  transforms (inverted in reverse bitstream order, with the
  color-indexing transform reducing the running width for everything
  read after it), LZ77 backward references incl. the 120-code 2D
  distance neighborhood, color cache, meta prefix images, and simple /
  code-length-coded prefix codes (both the max-symbol and plain
  forms). Lossy 'VP8 ' chunks dispatch to the from-spec keyframe
  codec in webp/vp8.py (its documented family); only VP8X extended
  layouts still raise NotImplementedError.
- ``encode_webp_lossy`` / ``encode_webp_lossy_gray``: lossy 'VP8 '
  streams via the RFC 6386 keyframe encoder in webp/vp8.py.
- ``probe_webp``: container + header metadata (format variant, dims,
  alpha hint) for VP8L, VP8 (lossy) and VP8X (extended) containers.

Bit order facts (the parts that always bite): the VP8L bitstream is
read LSB-first, but each canonical prefix code's bits are consumed
from the code's MSB down (DEFLATE-style), so the writer emits
``reverse_bits(code, len)``. Canonical assignment is the DEFLATE rule:
ascending code values by (length, symbol).
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are transmitted
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_MAX_LEN = 15

# RFC 9649 §4.2.2: distance codes 1..120 address a close 2D
# neighborhood of the current pixel; (dx, dy) with dist = dx + dy*w,
# clamped to >= 1. Codes > 120 are plain scan-line distances - 120.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(_DIST_MAP) == 120


def _prefix_value(sym: int, r: "_BitReader") -> int:
    """LZ77 length/distance prefix coding: symbol (+ extra bits from
    the stream) -> value (RFC 9649 §4.2.2)."""
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + r.read(extra_bits) + 1


def _prefix_token(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (symbol, extra, extra_bits)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    parity = 1 if x >= (3 << eb) else 0
    return 2 + 2 * eb + parity, x - ((2 + parity) << eb), eb


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0      # bit position

    def read(self, bits: int) -> int:
        v = 0
        for i in range(bits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


def _rev(code: int, length: int) -> int:
    out = 0
    for _ in range(length):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


def _build_lengths(freqs: dict[int, int], max_len: int = _MAX_LEN) -> list[int]:
    """Length-limited Huffman code lengths over a dense alphabet.

    Plain Huffman via two-queue merge, then the classic clamp-and-
    repair: overlong lengths clamp to ``max_len`` and the Kraft sum is
    restored to exactly 1 (complete code) by deepening the shallowest
    repairable symbols — completeness is asserted, the decoder relies
    on it."""
    n = max(freqs) + 1
    syms = [s for s in range(n) if freqs.get(s, 0) > 0]
    if len(syms) <= 2:
        raise ValueError("use the simple-code path for <= 2 symbols")
    import heapq

    heap = [(freqs[s], next_id, (s,)) for next_id, s in enumerate(syms)]
    heapq.heapify(heap)
    uid = len(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        for s in a + b:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, uid, a + b))
        uid += 1
    lengths = [0] * n
    for s in syms:
        lengths[s] = min(depth[s], max_len)
    # repair Kraft: K must equal 2^max_len exactly
    def kraft() -> int:
        return sum(1 << (max_len - l) for l in lengths if l)
    while kraft() > (1 << max_len):
        # deepen the longest length still below the cap
        cand = max((l for l in lengths if 0 < l < max_len), default=None)
        if cand is None:
            raise AssertionError("cannot repair Kraft inequality")
        lengths[lengths.index(cand)] = cand + 1
    while kraft() < (1 << max_len):
        # shorten the deepest symbol whose promotion still fits
        deficit = (1 << max_len) - kraft()
        for l in sorted({l for l in lengths if l > 1}, reverse=True):
            gain = 1 << (max_len - l)  # promoting l -> l-1 adds this much
            if gain <= deficit:
                lengths[lengths.index(l)] = l - 1
                break
        else:
            raise AssertionError("cannot complete the code")
    assert kraft() == (1 << max_len)
    return lengths


# --------------------------------------------------------------- encode

def _write_code(w: _BitWriter, lengths: list[int], alphabet_size: int) -> None:
    """Emit one prefix code: simple form for <= 2 used symbols, else
    the code-length-coded full form."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if not used:
        used = [0]
    if len(used) <= 2 and all(s < 256 for s in used):
        w.write(1, 1)                      # simple
        w.write(len(used) - 1, 1)          # num_symbols - 1
        first = used[0]
        if first <= 1 and len(used) == 1:
            w.write(0, 1)                  # first symbol in 1 bit
            w.write(first, 1)
        else:
            w.write(1, 1)                  # first symbol in 8 bits
            w.write(first, 8)
        if len(used) == 2:
            w.write(used[1], 8)
        return

    w.write(0, 1)                          # full code
    # encode the length sequence with the 19-symbol code-length code.
    # The FULL alphabet must be covered: without the max_symbol
    # shortcut a conforming decoder keeps reading code-length symbols
    # until every alphabet slot is filled, so trailing zeros are
    # emitted as 17/18 zero-runs, never trimmed.
    seq: list[tuple[int, int, int]] = []   # (cl_symbol, extra, extra_bits)
    i = 0
    trimmed = list(lengths[:alphabet_size])
    n = len(trimmed)
    while i < n:
        l = trimmed[i]
        run = 1
        while i + run < n and trimmed[i + run] == l:
            run += 1
        if l == 0:
            left = run
            while left >= 3:
                take = min(left, 138)
                if take <= 10:
                    seq.append((17, take - 3, 3))
                else:
                    seq.append((18, take - 11, 7))
                left -= take
            seq.extend([(0, 0, 0)] * left)
        else:
            # one literal (sets the decoder's prev-length), then
            # repeat-16 runs for the rest
            seq.append((l, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                seq.append((16, take - 3, 2))
                left -= take
            seq.extend([(l, 0, 0)] * left)
        i += run

    cl_freq: dict[int, int] = {}
    for s, _, _ in seq:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    used_cl = sorted(cl_freq)
    if len(used_cl) == 1:
        # degenerate single-symbol CL code: transmitted as one
        # length-1 entry, read with ZERO bits per symbol (the
        # libwebp degenerate-table convention — mirrored in
        # _read_code / read_cl_symbol)
        cl_lengths = [0] * 19
        cl_lengths[used_cl[0]] = 1
    elif len(used_cl) == 2:
        cl_lengths = [0] * 19
        for s in used_cl:
            cl_lengths[s] = 1
    else:
        cl_lengths = _build_lengths(cl_freq, max_len=7)
        cl_lengths += [0] * (19 - len(cl_lengths))

    # transmit code-length-code lengths in _CLC_ORDER, trimming the tail
    order_lens = [cl_lengths[s] for s in _CLC_ORDER]
    num = len(order_lens)
    while num > 4 and order_lens[num - 1] == 0:
        num -= 1
    w.write(num - 4, 4)
    for j in range(num):
        w.write(order_lens[j], 3)

    cl_codes = _canonical_codes(cl_lengths)
    degenerate_cl = len(cl_codes) == 1     # 0 bits per CL symbol
    w.write(0, 1)                          # no max_symbol shortcut
    for s, extra, ebits in seq:
        if not degenerate_cl:
            code, length = cl_codes[s]
            w.write(_rev(code, length), length)
        if ebits:
            w.write(extra, ebits)


def _plan(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Code lengths for one alphabet: 1-bit degenerate/simple lengths
    for <= 2 used symbols, else length-limited Huffman."""
    if not freqs:
        freqs = {0: 1}
    if len(freqs) <= 2:
        lengths = [0] * alphabet
        for s in sorted(freqs):
            lengths[s] = 1
        return lengths
    lengths = _build_lengths(freqs)
    return lengths + [0] * (alphabet - len(lengths))


def _argb_of(p) -> int:
    return (int(p[3]) << 24) | (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])


def _tokenize(px: np.ndarray, width: int, cache_bits: int,
              lz77: str | None) -> list[tuple[int, tuple]]:
    """Greedy LZ77 + color-cache tokenizer over raveled (n, 4) RGBA.

    Returns [(start_pixel_index, token)]; token is ("lit", r, g, b, a),
    ("cache", idx) or ("copy", length, dist). The cache simulation
    starts empty (None) so the decoder's zero-initialized cache can
    never be referenced before first insert — conformant and safe."""
    n = px.shape[0]
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache: list[int | None] = [None] * cache_size

    def insert(argb: int) -> None:
        cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    tokens: list[tuple[int, tuple]] = []
    i = 0
    while i < n:
        if lz77 and i > 0:
            best_len, best_dist = 0, 0
            for dist in ((1, width) if 1 < width <= i else (1,)):
                if dist > i:
                    continue
                lim = min(n - i, 4096)
                eq = (px[i:i + lim] == px[i - dist:i - dist + lim]).all(axis=1)
                ln = int(np.argmax(~eq)) if not eq.all() else int(eq.size)
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append((i, ("copy", best_len, best_dist)))
                if cache_size:
                    for k in range(best_len):
                        insert(_argb_of(px[i + k]))
                i += best_len
                continue
        argb = _argb_of(px[i])
        if cache_size:
            idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == argb:
                tokens.append((i, ("cache", idx)))
                i += 1
                continue
            insert(argb)
        tokens.append((i, ("lit", int(px[i][0]), int(px[i][1]),
                           int(px[i][2]), int(px[i][3]))))
        i += 1
    return tokens


def _dist_code_of(dist: int, width: int, lz77: str | None) -> int:
    if lz77 == "2d":
        for code0, (dx, dy) in enumerate(_DIST_MAP):
            if max(dx + dy * width, 1) == dist:
                return code0 + 1
    return dist + 120


def _token_freqs(tokens: list[tuple], width: int, cache_bits: int,
                 lz77: str | None) -> list[dict[int, int]]:
    """Per-alphabet symbol frequencies: [green+len+cache, r, b, a, dist]."""
    fr: list[dict[int, int]] = [{}, {}, {}, {}, {}]

    def bump(t: int, s: int) -> None:
        fr[t][s] = fr[t].get(s, 0) + 1

    for _, tok in tokens:
        if tok[0] == "lit":
            _, r_, g_, b_, a_ = tok
            bump(0, g_), bump(1, r_), bump(2, b_), bump(3, a_)
        elif tok[0] == "cache":
            bump(0, 280 + tok[1])
        else:
            _, length, dist = tok
            bump(0, 256 + _prefix_token(length)[0])
            bump(4, _prefix_token(_dist_code_of(dist, width, lz77))[0])
    return fr


def _write_image(w: _BitWriter, px: np.ndarray, width: int, h: int, *,
                 cache_bits: int = 0, lz77: str | None = None,
                 level0: bool = False, meta_bits: int | None = None,
                 n_groups: int = 2) -> None:
    """One spatially/entropy-coded image: cache field, (level0 only)
    meta prefix image, prefix-code group(s), token stream. ``px`` is
    raveled (n, 4) RGBA in scan-line order."""
    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)

    tokens = _tokenize(px, width, cache_bits, lz77)
    group_of_px = None
    if level0:
        if meta_bits is None:
            w.write(0, 1)
        else:
            if not 2 <= meta_bits <= 9:
                raise ValueError("meta_bits out of range [2, 9]")
            w.write(1, 1)
            w.write(meta_bits - 2, 3)
            gw, gh = _ceil_div(width, 1 << meta_bits), _ceil_div(h, 1 << meta_bits)
            gx, gy = np.meshgrid(np.arange(gw), np.arange(gh))
            gmap = ((gx + gy) % n_groups).astype(np.uint8)
            # the decoder derives the group count from the meta image's
            # max code — a tiny tile grid may never reach group n-1, so
            # the number of code sets written MUST follow the map
            n_groups = int(gmap.max()) + 1
            gpx = np.zeros((gh * gw, 4), np.uint8)     # meta code rides
            gpx[:, 1] = gmap.ravel()                   # (r<<8)|g; r=0
            gpx[:, 3] = 255
            _write_image(w, gpx, gw, gh)

            def group_of_px(i: int) -> int:
                return int(gmap[(i // width) >> meta_bits,
                                (i % width) >> meta_bits])

    cache_size = (1 << cache_bits) if cache_bits else 0
    galpha = 256 + 24 + cache_size
    if group_of_px is None:
        grouped = [tokens]
    else:
        grouped = [[] for _ in range(n_groups)]
        for start, tok in tokens:
            grouped[group_of_px(start)].append((start, tok))

    all_tables = []
    for gtokens in grouped:
        freqs = _token_freqs(gtokens, width, cache_bits, lz77)
        plans = [_plan(fr, alpha) for fr, alpha in
                 zip(freqs, (galpha, 256, 256, 256, 40))]
        for lengths, alphabet in zip(plans, (galpha, 256, 256, 256, 40)):
            _write_code(w, lengths, alphabet)
        all_tables.append([( _canonical_codes(p), sum(1 for l in p if l))
                           for p in plans])

    def emit(tables_i: int, t: int, sym: int) -> None:
        codes, n_used = all_tables[tables_i][t]
        if n_used == 1:
            return                                     # 0-bit symbol
        code, length = codes[sym]
        w.write(_rev(code, length), length)

    for start, tok in tokens:
        gi = 0 if group_of_px is None else group_of_px(start)
        if tok[0] == "lit":
            _, r_, g_, b_, a_ = tok
            emit(gi, 0, g_), emit(gi, 1, r_), emit(gi, 2, b_), emit(gi, 3, a_)
        elif tok[0] == "cache":
            emit(gi, 0, 280 + tok[1])
        else:
            _, length, dist = tok
            lsym, lextra, leb = _prefix_token(length)
            emit(gi, 0, 256 + lsym)
            if leb:
                w.write(lextra, leb)
            dsym, dextra, deb = _prefix_token(_dist_code_of(dist, width, lz77))
            emit(gi, 4, dsym)
            if deb:
                w.write(dextra, deb)


# ------------------------------------------------- forward transforms

def _fwd_predictor(img: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Residual image + mode grid ((bx + by) % 14 — every spec mode
    gets exercised). Residuals predict from ORIGINAL neighbors, which
    equal the decoder's reconstructed-so-far pixels."""
    h, w = img.shape[:2]
    gw, gh = _ceil_div(w, 1 << bits), _ceil_div(h, 1 << bits)
    bx, by = np.meshgrid(np.arange(gw), np.arange(gh))
    modes = ((bx + by) % 14).astype(np.uint8)
    res = np.empty_like(img)
    src = img.astype(np.int64)
    for y in range(h):
        for x in range(w):
            pred = _predict_px(img, x, y, w, int(modes[y >> bits, x >> bits]))
            res[y, x] = (src[y, x] - np.asarray(pred, np.int64)) & 0xFF
    return res, modes


def _cte_grid(w: int, h: int, bits: int) -> np.ndarray:
    """Deterministic varied ColorTransformElements, stored RGBA with
    B=green_to_red, G=green_to_blue, R=red_to_blue (ARGB bits 0-7,
    8-15, 16-23)."""
    gw, gh = _ceil_div(w, 1 << bits), _ceil_div(h, 1 << bits)
    bx, by = np.meshgrid(np.arange(gw), np.arange(gh))
    cte = np.zeros((gh, gw, 4), np.uint8)
    cte[:, :, 0] = (11 * bx + 5 * by + 2) & 0xFF       # red_to_blue
    cte[:, :, 1] = (7 * bx + 13 * by + 1) & 0xFF       # green_to_blue
    cte[:, :, 2] = (17 * bx + 29 * by + 3) & 0xFF      # green_to_red
    cte[:, :, 3] = 255
    return cte


def _fwd_color_transform(img: np.ndarray, cte: np.ndarray,
                         bits: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    g2r = cte[ys[:, None], xs[None, :], 2]
    g2b = cte[ys[:, None], xs[None, :], 1]
    r2b = cte[ys[:, None], xs[None, :], 0]
    out = img.astype(np.int64)
    green = img[:, :, 1]
    out[:, :, 0] = (out[:, :, 0] - _ct_delta(g2r, green)) & 0xFF
    out[:, :, 2] = (out[:, :, 2] - _ct_delta(g2b, green)
                    - _ct_delta(r2b, img[:, :, 0])) & 0xFF
    return out.astype(np.uint8)


def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(palette_deltas (S, 4), packed raveled px, packed width)."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 4)
    palette = np.unique(flat, axis=0)                  # sorted, deterministic
    n_colors = palette.shape[0]
    if n_colors > 256:
        raise ValueError(
            f"palette transform needs <= 256 colors, got {n_colors} "
            "(note: palette is applied LAST, to the already-transformed "
            "image — predictor/color-transform residuals usually explode "
            "color cardinality, so combine palette only with streams "
            "that stay <= 256 colors after those transforms)")
    lookup = {tuple(c): i for i, c in enumerate(palette)}
    idx = np.fromiter((lookup[tuple(p)] for p in flat),
                      np.int64, flat.shape[0]).reshape(h, w)
    width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                  else 1 if n_colors <= 16 else 0)
    if width_bits:
        ppb = 1 << width_bits
        bpp = 8 >> width_bits
        pw = _ceil_div(w, ppb)
        packed = np.zeros((h, pw), np.int64)
        for sub in range(ppb):                         # leftmost -> LSBs
            cols = np.arange(sub, w, ppb)
            packed[:, :cols.size] |= idx[:, cols] << (sub * bpp)
    else:
        pw = w
        packed = idx
    px = np.zeros((h * pw, 4), np.uint8)
    px[:, 1] = packed.ravel()
    px[:, 3] = 255
    deltas = np.empty_like(palette)
    deltas[0] = palette[0]
    deltas[1:] = (palette[1:].astype(np.int64)
                  - palette[:-1].astype(np.int64)) & 0xFF
    return deltas, px, pw


def encode_webp_lossless(rgba: np.ndarray, *, cache_bits: int = 0,
                         lz77: str | None = None,
                         subtract_green: bool = False,
                         predictor_bits: int | None = None,
                         color_transform_bits: int | None = None,
                         palette: bool = False,
                         meta_bits: int | None = None) -> bytes:
    """RGBA uint8 (h, w, 4) -> RIFF/WEBP/VP8L bytes.

    Defaults produce the stable literal-only stream; the keyword knobs
    opt into spec features (each round-trip-tested): ``cache_bits``
    color cache, ``lz77`` ("plain" scan-line distances or "2d"
    neighborhood distance codes), ``subtract_green`` /
    ``predictor_bits`` / ``color_transform_bits`` / ``palette``
    transforms (written in that read order; forward application
    follows read order so the decoder's reverse-order inverses
    reconstruct exactly — note ``palette`` therefore palettizes the
    image AFTER the other requested transforms, whose residuals
    usually exceed 256 colors; compose them only deliberately),
    ``meta_bits`` tiled prefix-code groups."""
    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_webp_lossless expects (h, w, 4) uint8")
    h, w_px = rgba.shape[:2]
    if not (1 <= w_px <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError(f"dims out of VP8L range: {w_px}x{h}")
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"bad color-cache size {cache_bits}")

    w = _BitWriter()
    w.write(w_px - 1, 14)
    w.write(h - 1, 14)
    w.write(int((rgba[:, :, 3] != 255).any()), 1)      # alpha hint
    w.write(0, 3)                                      # version

    img = rgba
    xsize = w_px
    if predictor_bits is not None:
        w.write(1, 1), w.write(0, 2), w.write(predictor_bits - 2, 3)
        img, modes = _fwd_predictor(img, predictor_bits)
        mpx = np.zeros((modes.size, 4), np.uint8)
        mpx[:, 1] = modes.ravel()
        mpx[:, 3] = 255
        _write_image(w, mpx, modes.shape[1], modes.shape[0])
    if color_transform_bits is not None:
        w.write(1, 1), w.write(1, 2), w.write(color_transform_bits - 2, 3)
        cte = _cte_grid(xsize, h, color_transform_bits)
        img = _fwd_color_transform(img, cte, color_transform_bits)
        _write_image(w, cte.reshape(-1, 4), cte.shape[1], cte.shape[0])
    if subtract_green:
        w.write(1, 1), w.write(2, 2)
        out = img.astype(np.int64)
        out[:, :, 0] = (out[:, :, 0] - out[:, :, 1]) & 0xFF
        out[:, :, 2] = (out[:, :, 2] - out[:, :, 1]) & 0xFF
        img = out.astype(np.uint8)
    if palette:
        deltas, px, xsize = _palettize(img)
        w.write(1, 1), w.write(3, 2)
        w.write(deltas.shape[0] - 1, 8)
        _write_image(w, deltas, deltas.shape[0], 1)
    else:
        px = img.reshape(-1, 4)
    w.write(0, 1)                                      # no more transforms

    _write_image(w, px, xsize, h, cache_bits=cache_bits, lz77=lz77,
                 level0=True, meta_bits=meta_bits)

    payload = b"\x2f" + w.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------------- decode

def _read_code(r: _BitReader, alphabet_size: int) -> dict[tuple[int, int], int]:
    """Read one prefix code; return (length, code) -> symbol."""
    if r.read(1):                          # simple
        num_symbols = r.read(1) + 1
        if r.read(1):
            first = r.read(8)
        else:
            first = r.read(1)
        symbols = [first]
        if num_symbols == 2:
            symbols.append(r.read(8))
        if num_symbols == 1:
            return {(0, 0): symbols[0]}
        return {(1, 0): symbols[0], (1, 1): symbols[1]}

    num_cl = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLC_ORDER[i]] = r.read(3)
    cl_table = {(l, c): s for s, (c, l) in _canonical_codes(cl_lengths).items()}

    if r.read(1):                          # max_symbol shortcut present
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size

    def read_cl_symbol() -> int:
        if len(cl_table) == 1:
            return next(iter(cl_table.values()))
        code, length = 0, 0
        while True:
            code = (code << 1) | r.read(1)
            length += 1
            if (length, code) in cl_table:
                return cl_table[(length, code)]
            if length > 7:
                raise ValueError("corrupt code-length code")

    lengths = [0] * alphabet_size
    symbol, prev_nz = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = read_cl_symbol()
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("repeat overruns alphabet")
                lengths[symbol] = prev_nz
                symbol += 1
        elif s == 17:
            symbol += 3 + r.read(3)
        else:
            symbol += 11 + r.read(7)
    if symbol > alphabet_size:
        raise ValueError("code lengths overrun alphabet")
    table = {(l, c): s for s, (c, l) in _canonical_codes(lengths).items()}
    if not table:
        raise ValueError("empty prefix code")
    if len(table) == 1:
        sym = next(iter(table.values()))
        return {(0, 0): sym}
    return table


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    if (0, 0) in table:
        return table[(0, 0)]
    code, length = 0, 0
    while True:
        code = (code << 1) | r.read(1)
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > _MAX_LEN:
            raise ValueError("corrupt prefix code in pixel stream")


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _decode_pixels(r: _BitReader, w_px: int, h: int,
                   level0: bool = False) -> np.ndarray:
    """One spatially/entropy-coded VP8L image: optional color cache,
    optional meta prefix image (level0 only), prefix-code group(s),
    LZ77-coded pixel stream. Returns (h, w, 4) uint8 RGBA."""
    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache size {cache_bits}")
    meta = None
    gbits = 0
    n_groups = 1
    if level0 and r.read(1):                 # meta prefix image present
        gbits = r.read(3) + 2
        gimg = _decode_pixels(
            r, _ceil_div(w_px, 1 << gbits), _ceil_div(h, 1 << gbits))
        meta = (gimg[:, :, 0].astype(np.int64) << 8) \
            | gimg[:, :, 1].astype(np.int64)
        n_groups = int(meta.max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        tables = [_read_code(r, 256 + 24 + cache_size)]
        for alphabet in (256, 256, 256, 40):
            tables.append(_read_code(r, alphabet))
        groups.append(tables)

    n = w_px * h
    out = np.empty((n, 4), dtype=np.uint8)   # R, G, B, A
    cache = [0] * cache_size
    i = 0
    while i < n:
        if meta is None:
            tables = groups[0]
        else:
            tables = groups[meta[(i // w_px) >> gbits, (i % w_px) >> gbits]]
        s = _read_symbol(r, tables[0])
        if s < 256:
            green = s
            red = _read_symbol(r, tables[1])
            blue = _read_symbol(r, tables[2])
            alpha = _read_symbol(r, tables[3])
        elif s < 280:                        # LZ77 backward reference
            length = _prefix_value(s - 256, r)
            dcode = _prefix_value(_read_symbol(r, tables[4]), r)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = max(dx + dy * w_px, 1)
            if dist > i:
                raise ValueError("backward reference before image start")
            if i + length > n:
                raise ValueError("backward reference overruns image")
            for _ in range(length):
                out[i] = out[i - dist]
                if cache_size:
                    red, green, blue, alpha = (int(v) for v in out[i])
                    argb = (alpha << 24) | (red << 16) | (green << 8) | blue
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
                i += 1
            continue
        else:                                # color-cache hit
            argb = cache[s - 280]
            alpha = (argb >> 24) & 0xFF
            red = (argb >> 16) & 0xFF
            green = (argb >> 8) & 0xFF
            blue = argb & 0xFF
        out[i] = (red, green, blue, alpha)
        if cache_size:
            argb = (alpha << 24) | (red << 16) | (green << 8) | blue
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        i += 1
    return out.reshape(h, w_px, 4)


# ------------------------------------------------- predictor transform

def _avg2(a, b):
    return tuple((int(x) + int(y)) >> 1 for x, y in zip(a, b))


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict_px(img: np.ndarray, x: int, y: int, w: int, mode: int):
    """Spec predictor for pixel (x, y) from already-final neighbors of
    ``img`` (h, w, 4). Shared verbatim by the encoder (residuals from
    the original) and the decoder (reconstruction) — parity by
    construction. Edge rules per RFC 9649: (0,0)->opaque black, row 0
    -> L, column 0 -> T; TR at x == w-1 wraps to the current row's
    first pixel (scan-line predecessor + 1)."""
    if x == 0 and y == 0:
        return (0, 0, 0, 255)
    if y == 0:
        return tuple(int(v) for v in img[0, x - 1])
    if x == 0:
        return tuple(int(v) for v in img[y - 1, 0])
    L = tuple(int(v) for v in img[y, x - 1])
    T = tuple(int(v) for v in img[y - 1, x])
    TL = tuple(int(v) for v in img[y - 1, x - 1])
    TR = tuple(int(v) for v in (img[y - 1, x + 1] if x + 1 < w
                                else img[y, 0]))
    if mode == 0:
        return (0, 0, 0, 255)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:                           # Select: ties go to T
        full = [l + t - tl for l, t, tl in zip(L, T, TL)]
        p_l = sum(abs(f - l) for f, l in zip(full, L))
        p_t = sum(abs(f - t) for f, t in zip(full, T))
        return L if p_l < p_t else T
    if mode == 12:                           # ClampAddSubtractFull
        return tuple(_clamp255(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:                           # ClampAddSubtractHalf
        # (a - b) / 2 is C truncating division — NOT python floor
        out = []
        for l, t, tl in zip(L, T, TL):
            ave = (l + t) >> 1
            d = ave - tl
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clamp255(ave + half))
        return tuple(out)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: np.ndarray, bits: int) -> np.ndarray:
    h, w = img.shape[:2]
    out = img.astype(np.int64)
    for y in range(h):
        for x in range(w):
            mode = int(modes[y >> bits, x >> bits])
            pred = _predict_px(out, x, y, w, mode)
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    return (t.astype(np.int8).astype(np.int64)
            * c.astype(np.int8).astype(np.int64)) >> 5


def _inv_color_transform(img: np.ndarray, cte: np.ndarray,
                         bits: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    # stored ARGB cte: bits 0-7 (blue ch) = green_to_red,
    # 8-15 (green ch) = green_to_blue, 16-23 (red ch) = red_to_blue
    g2r = cte[ys[:, None], xs[None, :], 2]
    g2b = cte[ys[:, None], xs[None, :], 1]
    r2b = cte[ys[:, None], xs[None, :], 0]
    out = img.astype(np.int64)
    green = img[:, :, 1]
    out[:, :, 0] = (out[:, :, 0] + _ct_delta(g2r, green)) & 0xFF
    out[:, :, 2] = (out[:, :, 2] + _ct_delta(g2b, green)
                    + _ct_delta(r2b, out[:, :, 0].astype(np.uint8))) & 0xFF
    return out.astype(np.uint8)


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray,
                        width_bits: int, full_w: int) -> np.ndarray:
    h = img.shape[0]
    packed = img[:, :, 1].astype(np.int64)   # indices ride the green channel
    if width_bits:
        bpp = 8 >> width_bits
        xs = np.arange(full_w)
        # leftmost pixel lives in the least-significant bits
        idx = (packed[:, xs >> width_bits]
               >> ((xs & ((1 << width_bits) - 1)) * bpp)) & ((1 << bpp) - 1)
    else:
        idx = packed[:, :full_w]
    out = np.zeros((h, full_w, 4), np.uint8)  # out-of-range -> 0x00000000
    ok = idx < palette.shape[0]
    out[ok] = palette[idx[ok]]
    return out


def _vp8l_pixels(payload: bytes) -> tuple[np.ndarray, bool]:
    r = _BitReader(payload)
    w0 = r.read(14) + 1
    h = r.read(14) + 1
    alpha_hint = bool(r.read(1))
    if r.read(3) != 0:
        raise ValueError("unknown VP8L version")
    return _vp8l_image_stream(r, w0, h), alpha_hint


def _vp8l_image_stream(r: _BitReader, w0: int, h: int) -> np.ndarray:
    """A headerless level-0 VP8L image stream of implicit dimensions
    (transform loop + spatially-coded image + inverse transforms) —
    the shared body of a full VP8L payload (after its 5-byte header)
    and of an ALPH chunk's lossless-compressed alpha plane, which the
    container spec defines as exactly this stream with the dims
    implied by the canvas."""
    transforms: list[tuple[int, dict]] = []   # bitstream read order
    seen: set[int] = set()
    xsize = w0                               # running (possibly packed) width
    while r.read(1):
        t = r.read(2)
        if t in seen:
            raise ValueError(f"duplicate VP8L transform {t}")
        seen.add(t)
        if t in (0, 1):                      # predictor / color transform
            bits = r.read(3) + 2
            sub = _decode_pixels(r, _ceil_div(xsize, 1 << bits),
                                 _ceil_div(h, 1 << bits))
            transforms.append((t, {"bits": bits, "img": sub}))
        elif t == 2:                         # subtract green
            transforms.append((2, {}))
        else:                                # color indexing
            n_colors = r.read(8) + 1
            deltas = _decode_pixels(r, n_colors, 1)[0].astype(np.int64)
            palette = (np.cumsum(deltas, axis=0) & 0xFF).astype(np.uint8)
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append((3, {"palette": palette,
                                   "width_bits": width_bits,
                                   "full_w": xsize}))
            if width_bits:
                xsize = _ceil_div(xsize, 1 << width_bits)

    img = _decode_pixels(r, xsize, h, level0=True)
    for t, d in reversed(transforms):
        if t == 0:
            img = _inv_predictor(img, d["img"][:, :, 1], d["bits"])
        elif t == 1:
            img = _inv_color_transform(img, d["img"], d["bits"])
        elif t == 2:
            out = img.astype(np.int64)
            out[:, :, 0] = (out[:, :, 0] + out[:, :, 1]) & 0xFF
            out[:, :, 2] = (out[:, :, 2] + out[:, :, 1]) & 0xFF
            img = out.astype(np.uint8)
        else:
            img = _inv_color_indexing(img, d["palette"], d["width_bits"],
                                      d["full_w"])
    return img


def _chunks(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size, = struct.unpack_from("<I", data, pos + 4)
        yield tag, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def probe_webp(data: bytes) -> dict:
    """Container + header metadata: variant ('lossless'/'lossy'/
    'extended'), width, height, has_alpha (hint). No pixel decode."""
    for tag, payload in _chunks(data):
        if tag == b"VP8L":
            if payload[:1] != b"\x2f":
                raise ValueError("bad VP8L signature")
            r = _BitReader(payload[1:])
            w_px = r.read(14) + 1
            h = r.read(14) + 1
            alpha = bool(r.read(1))
            return {"variant": "lossless", "width": w_px, "height": h,
                    "has_alpha": alpha}
        if tag == b"VP8 ":
            # lossy: frame tag (3B) + start code 9d 01 2a + 14-bit dims
            if payload[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 keyframe start code")
            w_px = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
            return {"variant": "lossy", "width": w_px, "height": h,
                    "has_alpha": False}
        if tag == b"VP8X":
            if len(payload) != 10:
                raise ValueError(f"VP8X chunk must be 10 bytes, got "
                                 f"{len(payload)}")
            if payload[0] & ~(_VP8X_ICC | _VP8X_ALPHA | _VP8X_EXIF
                              | _VP8X_XMP | _VP8X_ANIM):
                raise ValueError(f"reserved VP8X flag bits set: "
                                 f"{payload[0]:#04x}")
            meta = {"variant": "extended",
                    "width": int.from_bytes(payload[4:7], "little") + 1,
                    "height": int.from_bytes(payload[7:10], "little") + 1,
                    "has_alpha": bool(payload[0] & _VP8X_ALPHA),
                    "has_anim": bool(payload[0] & _VP8X_ANIM)}
            if meta["has_anim"]:
                n, dur = 0, 0
                for t2, p2 in _chunks(data):
                    if t2 == b"ANMF":
                        n += 1
                        dur += int.from_bytes(p2[12:15], "little")
                meta["n_frames"], meta["duration_ms"] = n, dur
            return meta
    raise ValueError("no VP8/VP8L/VP8X chunk found")


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP bytes -> RGBA uint8 (h, w, 4). VP8L is the full
    lossless spec; 'VP8 ' (lossy) decodes through the from-spec
    keyframe codec in webp/vp8.py (its documented family — keyframes,
    whole-MB modes, filter level 0; outside it that module raises
    NotImplementedError naming the missing piece); VP8X extended
    layouts decode too: still images with an ALPH alpha chunk (raw or
    VP8L-lossless compressed, all four prediction filters), and
    animations — for which this returns the FIRST composed canvas,
    mirroring the gif path (use webp_anim_frames for all of them)."""
    for tag, payload in _chunks(data):
        if tag == b"VP8L":
            if payload[:1] != b"\x2f":
                raise ValueError("bad VP8L signature")
            pixels, _ = _vp8l_pixels(payload[1:])
            return pixels
        if tag == b"VP8 ":
            from . import vp8 as _vp8

            return _vp8.decode_vp8_rgba(payload)
        if tag == b"VP8X":
            if payload[0] & _VP8X_ANIM:
                return webp_anim_frames(data)[0]["canvas"]
            return _decode_vp8x_still(data, payload)
    raise ValueError("no VP8L chunk found")


def encode_webp_lossy(rgba: np.ndarray, *, qi: int = 20) -> bytes:
    """RGBA uint8 (h, w, 4) -> RIFF/WEBP lossy ('VP8 ') bytes via the
    from-spec keyframe encoder (webp/vp8.py). Alpha is dropped (plain
    'VP8 ' has no alpha channel). `qi` is the frame quantizer index
    (0 = finest; solid frames round-trip bit-exactly at qi=0)."""
    from . import vp8 as _vp8

    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_webp_lossy expects (h, w, 4) uint8")
    y, u, v = _vp8.rgb_to_yuv420(rgba[:, :, :3])
    return _wrap_vp8_chunk(_vp8.encode_vp8_frame(y, u, v, qi=qi))


def encode_webp_lossy_gray(gray: np.ndarray, *, qi: int = 20) -> bytes:
    """Grayscale uint8 (h, w) -> lossy WebP with flat chroma (the
    Y plane carries the image; exact-gray fixture family)."""
    from . import vp8 as _vp8

    gray = np.asarray(gray)
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("encode_webp_lossy_gray expects (h, w) uint8")
    return _wrap_vp8_chunk(_vp8.encode_vp8_frame(gray, qi=qi))


def _wrap_vp8_chunk(frame: bytes) -> bytes:
    return _riff(_chunk(b"VP8 ", frame))


# ----------------------------------------------------- VP8X extended format
# Container-level extension of the WebP spec: a VP8X feature header,
# an optional ALPH alpha-plane chunk beside lossy 'VP8 ' pixels, and
# ANIM/ANMF animation. All from the public container spec; the pixel
# payloads reuse this module's VP8L coder and webp/vp8.py.

_VP8X_ICC, _VP8X_ALPHA, _VP8X_EXIF = 0x20, 0x10, 0x08
_VP8X_XMP, _VP8X_ANIM = 0x04, 0x02
_META_TAGS = (b"ICCP", b"EXIF", b"XMP ")


def _u24(v: int) -> bytes:
    if not 0 <= v < 1 << 24:
        raise ValueError(f"value {v} out of uint24 range")
    return v.to_bytes(3, "little")


def _chunk(tag: bytes, payload: bytes) -> bytes:
    out = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _alph_filter_fwd(alpha: np.ndarray, filt: int) -> np.ndarray:
    """Forward ALPH prediction filter: delta = (value - pred) mod 256.
    Predictors read the ORIGINAL plane, so this is fully vectorized.
    Boundary rule (all methods): top-left pixel is raw, the rest of
    the top row predicts from the left neighbor, the rest of the left
    column predicts from above; method 3 clamps A+B-C to [0, 255]."""
    a = alpha.astype(np.int64)
    pred = np.zeros_like(a)
    if filt == 0:
        return alpha.copy()
    pred[0, 1:] = a[0, :-1]                       # top row: left
    pred[1:, 0] = a[:-1, 0]                       # left column: above
    if filt == 1:                                 # horizontal
        pred[1:, 1:] = a[1:, :-1]
    elif filt == 2:                               # vertical
        pred[1:, 1:] = a[:-1, 1:]
    elif filt == 3:                               # gradient
        grad = a[1:, :-1] + a[:-1, 1:] - a[:-1, :-1]
        pred[1:, 1:] = np.clip(grad, 0, 255)
    else:
        raise ValueError(f"bad ALPH filter method {filt}")
    return ((a - pred) & 0xFF).astype(np.uint8)


def _alph_filter_inv(deltas: np.ndarray, filt: int) -> np.ndarray:
    """Inverse ALPH filter: value = (pred + delta) mod 256. Horizontal
    and vertical are mod-256 cumsums; gradient's left-dependence makes
    each row sequential in x (plain loop — alpha planes are small)."""
    if filt == 0:
        return deltas.copy()
    d = deltas.astype(np.int64)
    h, w_px = d.shape
    out = np.zeros((h, w_px), np.int64)
    out[0, :] = np.cumsum(d[0, :]) & 0xFF          # top row: left chain
    if filt == 1:
        for y in range(1, h):
            d[y, 0] = (d[y, 0] + out[y - 1, 0]) & 0xFF
            out[y, :] = np.cumsum(d[y, :]) & 0xFF
    elif filt == 2:
        out[1:, :] = (np.cumsum(d[1:, :], axis=0) + out[0, :]) & 0xFF
    elif filt == 3:
        for y in range(1, h):
            left = (d[y, 0] + out[y - 1, 0]) & 0xFF
            out[y, 0] = left
            row_up = out[y - 1]
            row_d = d[y]
            for x in range(1, w_px):
                g = left + row_up[x] - row_up[x - 1]
                left = (row_d[x] + (0 if g < 0 else 255 if g > 255 else g)) & 0xFF
                out[y, x] = left
    else:
        raise ValueError(f"bad ALPH filter method {filt}")
    return out.astype(np.uint8)


def _encode_alph(alpha: np.ndarray, *, method: str = "raw",
                 filt: int = 0) -> bytes:
    """Alpha plane (h, w) uint8 -> ALPH chunk payload. ``method`` is
    'raw' (uncompressed deltas) or 'lossless' (the deltas ride the
    green channel of a HEADERLESS level-0 VP8L image stream, per the
    container spec)."""
    if alpha.ndim != 2 or alpha.dtype != np.uint8:
        raise ValueError("_encode_alph expects (h, w) uint8")
    deltas = _alph_filter_fwd(alpha, filt)
    if method == "raw":
        comp, body = 0, deltas.tobytes()
    elif method == "lossless":
        w = _BitWriter()
        w.write(0, 1)                              # no transforms
        px = np.zeros((deltas.size, 4), np.uint8)
        px[:, 1] = deltas.ravel()
        px[:, 3] = 255
        _write_image(w, px, alpha.shape[1], alpha.shape[0], level0=True)
        comp, body = 1, w.done()
    else:
        raise ValueError(f"bad ALPH method {method!r}")
    return bytes([comp | (filt << 2)]) + body


def _decode_alph(payload: bytes, w_px: int, h: int) -> np.ndarray:
    head = payload[0]
    if head >> 6:
        raise ValueError(f"reserved ALPH header bits set: {head:#04x}")
    comp, filt = head & 0x3, (head >> 2) & 0x3
    if comp == 0:
        if len(payload) - 1 < w_px * h:
            raise ValueError(f"raw ALPH body too short: "
                             f"{len(payload) - 1} < {w_px * h}")
        deltas = np.frombuffer(payload[1:1 + w_px * h],
                               np.uint8).reshape(h, w_px)
    elif comp == 1:
        deltas = _vp8l_image_stream(_BitReader(payload[1:]), w_px, h)[:, :, 1]
    else:
        raise ValueError(f"reserved ALPH compression method {comp}")
    return _alph_filter_inv(deltas, filt)


def _decode_frame_chunks(chunks: list[tuple[bytes, bytes]],
                         w_px: int, h: int) -> np.ndarray:
    """Decode one still image from an (ALPH?, VP8|VP8L) chunk list —
    the shared body of a VP8X still file and one ANMF frame. Dims are
    cross-checked against the declared canvas/frame rect (the spec
    requires them to match)."""
    alph = next((p for t, p in chunks if t == b"ALPH"), None)
    for tag, payload in chunks:
        if tag == b"VP8L":
            if alph is not None:
                raise ValueError("ALPH chunk beside VP8L (lossless "
                                 "carries its own alpha)")
            if payload[:1] != b"\x2f":
                raise ValueError("bad VP8L signature")
            rgba, _ = _vp8l_pixels(payload[1:])
        elif tag == b"VP8 ":
            from . import vp8 as _vp8

            rgba = _vp8.decode_vp8_rgba(payload)
            if alph is not None:
                rgba = rgba.copy()
                rgba[:, :, 3] = _decode_alph(alph, rgba.shape[1],
                                             rgba.shape[0])
        else:
            continue
        if rgba.shape[:2] != (h, w_px):
            raise ValueError(f"frame pixels {rgba.shape[1]}x"
                             f"{rgba.shape[0]} != declared {w_px}x{h}")
        return rgba
    raise ValueError("no VP8/VP8L chunk in frame")


def _decode_vp8x_still(data: bytes, vp8x: bytes) -> np.ndarray:
    w_px = int.from_bytes(vp8x[4:7], "little") + 1
    h = int.from_bytes(vp8x[7:10], "little") + 1
    body = [(t, p) for t, p in _chunks(data)
            if t not in _META_TAGS + (b"VP8X",)]
    return _decode_frame_chunks(body, w_px, h)


def _blend_rgba(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Non-premultiplied over-compositing of src onto dst, the
    container spec's blending formula in exact integer arithmetic
    (numerators scaled by 255, round-half-up division)."""
    sa = src[..., 3].astype(np.int64)
    da = dst[..., 3].astype(np.int64)
    oa = sa * 255 + da * (255 - sa)                # out alpha, x255
    num = (src[..., :3].astype(np.int64) * (sa * 255)[..., None]
           + dst[..., :3].astype(np.int64) * (da * (255 - sa))[..., None])
    out = np.zeros_like(dst)
    nz = oa > 0
    out[..., :3][nz] = ((num[nz] + oa[nz, None] // 2)
                        // oa[nz, None]).astype(np.uint8)
    out[..., 3] = ((oa + 127) // 255).astype(np.uint8)
    return out


def webp_anim_frames(data: bytes) -> list[dict]:
    """Animated (VP8X+ANIM) WebP -> list of dicts per frame:
    ``duration_ms`` and the fully COMPOSED ``canvas`` (h, w, 4) RGBA —
    sub-rects, blend (spec over-compositing) and dispose-to-background
    honored, mirroring gif/codec.decode_gif's contract."""
    vp8x = next((p for t, p in _chunks(data) if t == b"VP8X"), None)
    if vp8x is None or not vp8x[0] & _VP8X_ANIM:
        raise ValueError("not an animated (VP8X+ANIM) WebP")
    cw = int.from_bytes(vp8x[4:7], "little") + 1
    ch = int.from_bytes(vp8x[7:10], "little") + 1
    bg = np.zeros(4, np.uint8)
    canvas = np.zeros((ch, cw, 4), np.uint8)
    frames: list[dict] = []
    saw_anim = False
    for tag, payload in _chunks(data):
        if tag == b"ANIM":
            b_, g_, r_, a_ = payload[0], payload[1], payload[2], payload[3]
            bg = np.array([r_, g_, b_, a_], np.uint8)
            saw_anim = True
        elif tag == b"ANMF":
            if not saw_anim:
                raise ValueError("ANMF before ANIM chunk")
            fx = int.from_bytes(payload[0:3], "little") * 2
            fy = int.from_bytes(payload[3:6], "little") * 2
            fw = int.from_bytes(payload[6:9], "little") + 1
            fh = int.from_bytes(payload[9:12], "little") + 1
            dur = int.from_bytes(payload[12:15], "little")
            flags = payload[15]
            if fx + fw > cw or fy + fh > ch:
                raise ValueError(f"frame rect {fw}x{fh}+{fx}+{fy} exceeds "
                                 f"canvas {cw}x{ch}")
            sub = list(_subchunks(payload[16:]))
            rgba = _decode_frame_chunks(sub, fw, fh)
            win = canvas[fy:fy + fh, fx:fx + fw]
            if flags & 0x02:                       # B=1: no blending
                win[:] = rgba
            else:
                win[:] = _blend_rgba(win, rgba)
            frames.append({"duration_ms": dur, "canvas": canvas.copy()})
            if flags & 0x01:                       # D=1: dispose to bg
                win[:] = bg
    if not frames:
        raise ValueError("animated WebP with no ANMF frames")
    return frames


def _subchunks(data: bytes):
    pos = 0
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size, = struct.unpack_from("<I", data, pos + 4)
        yield tag, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def encode_webp_extended(rgba: np.ndarray, *, qi: int = 20,
                         alpha_method: str = "raw",
                         alpha_filter: int = 0) -> bytes:
    """RGBA uint8 (h, w, 4) -> VP8X still WebP: lossy 'VP8 ' pixels
    plus a REAL alpha plane in an ALPH chunk (plain 'VP8 ' cannot
    carry alpha). The alpha plane is exact (raw or losslessly
    compressed); the color planes follow webp/vp8.py's lossy family
    (solid frames are bit-exact at qi=0)."""
    from . import vp8 as _vp8

    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_webp_extended expects (h, w, 4) uint8")
    h, w_px = rgba.shape[:2]
    y, u, v = _vp8.rgb_to_yuv420(rgba[:, :, :3])
    body = (_chunk(b"VP8X", bytes([_VP8X_ALPHA]) + b"\x00\x00\x00"
                   + _u24(w_px - 1) + _u24(h - 1))
            + _chunk(b"ALPH", _encode_alph(rgba[:, :, 3],
                                           method=alpha_method,
                                           filt=alpha_filter))
            + _chunk(b"VP8 ", _vp8.encode_vp8_frame(y, u, v, qi=qi)))
    return _riff(body)


def encode_webp_anim(canvas_w: int, canvas_h: int, frames: list[dict], *,
                     bg_rgba: tuple = (0, 0, 0, 0), loop: int = 0) -> bytes:
    """Animated WebP mux. Each frame dict: ``rgba`` (h, w, 4) uint8,
    ``x``/``y`` canvas offsets (must be even — the wire format stores
    them halved), ``duration_ms``, optional ``blend`` (default False =
    overwrite, B=1 on the wire) and ``dispose`` (default False).
    Frame payloads are VP8L lossless, so decode round-trips exactly."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    body = _chunk(b"VP8X", bytes([_VP8X_ALPHA | _VP8X_ANIM])
                  + b"\x00\x00\x00" + _u24(canvas_w - 1)
                  + _u24(canvas_h - 1))
    r_, g_, b_, a_ = bg_rgba
    body += _chunk(b"ANIM", bytes([b_, g_, r_, a_])
                   + struct.pack("<H", loop))
    for f in frames:
        rgba, x, y = f["rgba"], int(f.get("x", 0)), int(f.get("y", 0))
        if x & 1 or y & 1:
            raise ValueError(f"frame offsets must be even, got ({x}, {y})")
        fh, fw = rgba.shape[:2]
        if x + fw > canvas_w or y + fh > canvas_h:
            raise ValueError(f"frame {fw}x{fh}+{x}+{y} exceeds canvas "
                             f"{canvas_w}x{canvas_h}")
        flags = (0 if f.get("blend") else 0x02) | (0x01 if f.get("dispose")
                                                   else 0)
        # inner chunk list of an ANMF = a WebP body; reuse the encoder
        # and strip its 12-byte RIFF/WEBP envelope
        payload = (_u24(x // 2) + _u24(y // 2) + _u24(fw - 1) + _u24(fh - 1)
                   + _u24(int(f["duration_ms"])) + bytes([flags])
                   + encode_webp_lossless(rgba)[12:])
        body += _chunk(b"ANMF", payload)
    return _riff(body)
