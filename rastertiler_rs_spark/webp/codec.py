"""From-spec WebP lossless (VP8L) codec — numpy + stdlib only.

Like png/codec.py and jpeg/codec.py, this implements the public
bitstream spec (RFC 9649, "WebP Image Format") directly; the reference
engine gets WebP from a crate, this engine implements the subset it
needs:

- ``encode_webp_lossless``: spec-valid RIFF/WEBP/VP8L streams — 14-bit
  dims, no transforms, no color cache, one prefix-code group, LITERAL
  pixels only (no LZ77 backward references). Every emitted prefix code
  is either the spec's "simple" form (1-2 symbols) or a full
  code-length-coded canonical code, so any conforming VP8L decoder
  reads these files.
- ``decode_webp``: the matching subset — no-transform, literal +
  color-cache pixel streams with simple or code-length-coded prefix
  codes (both the max-symbol and plain forms). Streams using
  transforms or LZ77 backward references raise NotImplementedError
  (honest subset boundary, same shape as jpeg/codec.py rejecting
  progressive scans); lossy VP8/VP8X streams raise likewise.
- ``probe_webp``: container + header metadata (format variant, dims,
  alpha hint) for VP8L, VP8 (lossy) and VP8X (extended) containers —
  metadata for all three, pixels only for the VP8L subset.

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
    i, prev_nz = 0, 8
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
            prev_nz = l
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


def encode_webp_lossless(rgba: np.ndarray) -> bytes:
    """RGBA uint8 (h, w, 4) -> RIFF/WEBP/VP8L bytes (literal-only)."""
    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_webp_lossless expects (h, w, 4) uint8")
    h, w_px = rgba.shape[:2]
    if not (1 <= w_px <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError(f"dims out of VP8L range: {w_px}x{h}")
    r = rgba[:, :, 0].ravel()
    g = rgba[:, :, 1].ravel()
    b = rgba[:, :, 2].ravel()
    a = rgba[:, :, 3].ravel()

    w = _BitWriter()
    w.write(w_px - 1, 14)
    w.write(h - 1, 14)
    w.write(int((a != 255).any()), 1)      # alpha hint
    w.write(0, 3)                          # version
    w.write(0, 1)                          # no transforms
    w.write(0, 1)                          # no color cache
    w.write(0, 1)                          # no meta prefix image

    def freqs_of(arr: np.ndarray) -> dict[int, int]:
        vals, counts = np.unique(arr, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    plans = []
    for arr, alphabet in ((g, 280), (r, 256), (b, 256), (a, 256)):
        fr = freqs_of(arr)
        if len(fr) <= 2:
            lengths = [0] * alphabet
            syms = sorted(fr)
            if len(syms) == 1:
                lengths[syms[0]] = 1       # degenerate: 0-bit in simple form
            else:
                for s in syms:
                    lengths[s] = 1
        else:
            lengths = _build_lengths(fr)
            lengths += [0] * (alphabet - len(lengths))
        plans.append(lengths)
    dist_lengths = [0] * 40
    dist_lengths[0] = 1                    # unused alphabet, simple 1-symbol

    for lengths, alphabet in zip(plans + [dist_lengths],
                                 (280, 256, 256, 256, 40)):
        _write_code(w, lengths, alphabet)

    tables = []
    for lengths in plans:
        codes = _canonical_codes(lengths)
        n_used = sum(1 for l in lengths if l)
        tables.append((codes, n_used))
    for i in range(g.size):
        for (codes, n_used), val in zip(tables, (g[i], r[i], b[i], a[i])):
            if n_used == 1:
                continue                   # 0-bit symbol
            code, length = codes[int(val)]
            w.write(_rev(code, length), length)

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


def _vp8l_pixels(payload: bytes) -> tuple[np.ndarray, bool]:
    r = _BitReader(payload)
    w_px = r.read(14) + 1
    h = r.read(14) + 1
    alpha_hint = bool(r.read(1))
    if r.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if r.read(1):
        raise NotImplementedError(
            "VP8L transforms not supported by this subset decoder")
    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache size {cache_bits}")
    if r.read(1):
        raise NotImplementedError(
            "VP8L meta prefix codes not supported by this subset decoder")

    cache_size = (1 << cache_bits) if cache_bits else 0
    tables = [_read_code(r, 256 + 24 + cache_size)]
    for alphabet in (256, 256, 256, 40):
        tables.append(_read_code(r, alphabet))

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
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

    n = w_px * h
    out = np.empty((n, 4), dtype=np.uint8)   # R, G, B, A
    cache = [0] * cache_size
    i = 0
    while i < n:
        s = read_symbol(tables[0])
        if s < 256:
            green = s
            red = read_symbol(tables[1])
            blue = read_symbol(tables[2])
            alpha = read_symbol(tables[3])
        elif s < 280:
            raise NotImplementedError(
                "VP8L backward references not supported by this subset decoder")
        else:
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
    return out.reshape(h, w_px, 4), alpha_hint


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
            w_px = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            return {"variant": "extended", "width": w_px, "height": h,
                    "has_alpha": bool(payload[0] & 0x10)}
    raise ValueError("no VP8/VP8L/VP8X chunk found")


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP bytes -> RGBA uint8 (h, w, 4). VP8L subset only (see
    module docstring); lossy VP8 raises NotImplementedError."""
    for tag, payload in _chunks(data):
        if tag == b"VP8L":
            if payload[:1] != b"\x2f":
                raise ValueError("bad VP8L signature")
            pixels, _ = _vp8l_pixels(payload[1:])
            return pixels
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"{tag.decode().strip()} (lossy/extended) decode not "
                "available in this environment — VP8L lossless only")
    raise ValueError("no VP8L chunk found")
