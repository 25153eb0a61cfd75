"""From-spec FLAC codec (RFC 9639): STREAMINFO + frame mux, fixed and
LPC predictors, rice-coded residuals with partitions, all four stereo
decorrelation modes, CRC-8/CRC-16 and MD5 integrity — everything here
is algorithmic (binomial fixed coefficients, Levinson-Durbin LPC fit,
rice parameter search), so unlike MP3's big-values Huffman tables
there is no spec DATA to guess: encode→decode round-trips are exact
by construction and pinned in tests/test_flac.py.

The engine's audio surface uses it through operators/multimodal.py
(audio_features/audio_probe on fmt 'flac') — the compressed lossless
audio path a training corpus actually ships, beside WAV PCM and the
scoped MP3 family. The reference engine (rastertiler-rs) has no audio
surface; this is north-star multimodal extension."""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .mp3 import _BitReader, _BitWriter

_SYNC = 0x3FFE                           # 14-bit frame sync
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_CODES = {v: k for k, v in _BPS_TABLE.items()}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _write_coded_number(w: _BitWriter, v: int) -> None:
    """The frame header's UTF-8-style variable-length number (frame or
    sample index, up to 36 bits)."""
    if v < 0 or v >= 1 << 36:
        raise ValueError(f"coded number {v} out of range")
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes in range(2, 8):
        if v < 1 << (1 + 5 * nbytes):
            break
    w.write((0xFF << (8 - nbytes)) & 0xFF | (v >> (6 * (nbytes - 1))), 8)
    for k in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError(f"bad coded-number lead byte {b0:#04x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError(f"bad coded-number continuation {b:#04x}")
        v = (v << 6) | (b & 0x3F)
    return v


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


# --------------------------------------------------------------- residual

def _rice_cost(zz: np.ndarray, p: int) -> int:
    return int((zz >> p).sum()) + zz.size * (p + 1)


def _best_rice_param(zz: np.ndarray) -> int:
    best_p, best_c = 0, _rice_cost(zz, 0)
    for p in range(1, 15):
        c = _rice_cost(zz, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p


def _write_residual(w: _BitWriter, res: np.ndarray, pred_order: int,
                    blocksize: int, part_order: int) -> None:
    """Method 0 (4-bit rice parameters) with ``2^part_order``
    partitions; the escape code covers any partition whose residuals
    outgrow rice coding."""
    w.write(0, 2)
    w.write(part_order, 4)
    nparts = 1 << part_order
    per = blocksize >> part_order
    pos = 0
    for part in range(nparts):
        cnt = per - (pred_order if part == 0 else 0)
        seg = res[pos:pos + cnt]
        pos += cnt
        zz = _zigzag(seg)
        p = _best_rice_param(zz) if cnt else 0
        raw_bits = int(np.abs(seg).max()).bit_length() + 1 if cnt else 1
        if cnt and _rice_cost(zz, p) > 5 + raw_bits * cnt:
            w.write(0xF, 4)                    # escape: raw k-bit samples
            w.write(raw_bits, 5)
            for v in seg:
                w.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
            continue
        w.write(p, 4)
        for q in zz:
            q = int(q)
            w.write(0, q >> p)                 # unary quotient, 1-terminated
            w.write(1, 1)
            if p:
                w.write(q & ((1 << p) - 1), p)


def _read_residual(r: _BitReader, pred_order: int, blocksize: int
                   ) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if blocksize % nparts or (blocksize >> part_order) <= pred_order \
            and part_order:
        raise ValueError(f"partition order {part_order} does not divide "
                         f"block of {blocksize} (pred order {pred_order})")
    out = np.empty(blocksize - pred_order, np.int64)
    pos = 0
    for part in range(nparts):
        cnt = (blocksize >> part_order) - (pred_order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("first partition shorter than predictor order")
        p = r.read(pbits)
        if p == escape:
            k = r.read(5)
            for i in range(cnt):
                out[pos + i] = _signed(r.read(k), k) if k else 0
        else:
            for i in range(cnt):
                q = 0
                while r.read(1) == 0:
                    q += 1
                v = (q << p) | (r.read(p) if p else 0)
                out[pos + i] = (v >> 1) ^ -(v & 1)
        pos += cnt
    return out


# --------------------------------------------------------------- subframes

def _predict_fixed(warm: np.ndarray, res: np.ndarray, order: int
                   ) -> np.ndarray:
    out = np.empty(warm.size + res.size, np.int64)
    out[:order] = warm
    coefs = _FIXED_COEFS[order]
    for i in range(order, out.size):
        pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
        out[i] = res[i - order] + pred
    return out


def _fixed_residual(sig: np.ndarray, order: int) -> np.ndarray:
    res = sig.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


def _lpc_fit(sig: np.ndarray, order: int, precision: int
             ) -> tuple[list[int], int] | None:
    """Levinson-Durbin over the autocorrelation, then coefficient
    quantization to ``precision`` bits with a common right shift —
    all float work happens HERE at encode time; the emitted predictor
    is pure integers, so the round-trip stays exact regardless of the
    fit quality."""
    x = sig.astype(np.float64)
    n = x.size
    if n <= order:
        return None
    ac = np.array([np.dot(x[:n - k], x[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(a[:i], ac[i:0:-1])) / err
        prev = a[:i].copy()                  # reflect update aliases a
        a[:i] = prev - k * prev[::-1]
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return [int(c) for c in q], shift


def _lpc_residual(sig: np.ndarray, coefs: list[int], shift: int
                  ) -> np.ndarray:
    s = sig.astype(np.int64)
    order = len(coefs)
    pred = np.zeros(s.size - order, np.int64)
    for j, c in enumerate(coefs):
        pred += c * s[order - 1 - j:s.size - 1 - j]
    return s[order:] - (pred >> shift)


def _predict_lpc(warm: np.ndarray, res: np.ndarray, coefs: list[int],
                 shift: int) -> np.ndarray:
    order = len(coefs)
    out = np.empty(order + res.size, np.int64)
    out[:order] = warm
    for i in range(order, out.size):
        pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
        out[i] = res[i - order] + (pred >> shift)
    return out


def _pick_part_order(n: int, pred_order: int, max_po: int = 2) -> int:
    po = 0
    for cand in range(max_po, -1, -1):
        if n % (1 << cand) == 0 and (n >> cand) > pred_order:
            po = cand
            break
    return po


def _write_subframe(w: _BitWriter, sig: np.ndarray, bps: int,
                    lpc_order: int = 8) -> None:
    """One channel of one frame: constant short-circuit, else the
    cheapest of fixed orders 0-4 and an order-``lpc_order`` LPC fit
    (estimated by zigzag magnitude sums, the standard proxy)."""
    w.write(0, 1)
    if sig.size and np.all(sig == sig[0]):
        w.write(0, 6)                          # constant
        w.write(0, 1)
        w.write(int(sig[0]) & ((1 << bps) - 1), bps)
        return
    best = None                                # (cost, kind, payload)
    for order in range(min(4, sig.size - 1) + 1):
        res = _fixed_residual(sig, order)
        cost = int(_zigzag(res).sum()) if res.size else 0
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, res)
    lpc = _lpc_fit(sig, lpc_order, 12) if sig.size > lpc_order * 2 else None
    if lpc is not None:
        coefs, shift = lpc
        res = _lpc_residual(sig, coefs, shift)
        cost = int(_zigzag(res).sum())
        if cost < best[0]:
            best = (cost, "lpc", (coefs, shift), res)
    if best[1] == "fixed":
        order, res = best[2], best[3]
        w.write(0b001000 | order, 6)
        w.write(0, 1)                          # no wasted bits
        for v in sig[:order]:
            w.write(int(v) & ((1 << bps) - 1), bps)
    else:
        (coefs, shift), res = best[2], best[3]
        order = len(coefs)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in sig[:order]:
            w.write(int(v) & ((1 << bps) - 1), bps)
        w.write(11, 4)                         # precision-1 (12 bits)
        w.write(shift, 5)
        for c in coefs:
            w.write(int(c) & 0xFFF, 12)
    po = _pick_part_order(sig.size, order)
    _write_residual(w, res, order, sig.size, po)


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe header padding bit set")
    typ = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1
        while r.read(1) == 0:
            wasted += 1
        bps -= wasted
    if typ == 0:                               # constant
        out = np.full(blocksize, _signed(r.read(bps), bps), np.int64)
    elif typ == 1:                             # verbatim
        out = np.array([_signed(r.read(bps), bps)
                        for _ in range(blocksize)], np.int64)
    elif 8 <= typ <= 12:                       # fixed order 0-4
        order = typ - 8
        warm = np.array([_signed(r.read(bps), bps) for _ in range(order)],
                        np.int64)
        res = _read_residual(r, order, blocksize)
        out = _predict_fixed(warm, res, order)
    elif typ >= 32:                            # LPC order 1-32
        order = typ - 31
        warm = np.array([_signed(r.read(bps), bps) for _ in range(order)],
                        np.int64)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = _signed(r.read(5), 5)
        if shift < 0:
            raise ValueError(f"negative LPC shift {shift}")
        coefs = [_signed(r.read(prec), prec) for _ in range(order)]
        res = _read_residual(r, order, blocksize)
        out = _predict_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {typ:#08b}")
    return out << wasted if wasted else out


# ------------------------------------------------------------ stream level

def _md5_samples(samples: np.ndarray) -> bytes:
    return hashlib.md5(
        samples.astype("<i2").tobytes(order="C")).digest()


def encode_flac_parts(samples: np.ndarray, sample_rate: int, *,
                      blocksize: int = 4096, stereo: str = "auto",
                      lpc_order: int = 8
                      ) -> tuple[bytes, list[bytes], list[int]]:
    """The stream's parts, for container mappings that packetize FLAC
    (Ogg-FLAC needs the STREAMINFO metadata block and one packet per
    frame with per-frame sample counts for granule positions):
    (streaminfo_block incl. its 4-byte header with the last-metadata
    flag, frames, samples_per_frame)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_flac takes int16 samples")
    if samples.ndim == 1:
        chans = [samples.astype(np.int64)]
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        chans = [samples[:, c].astype(np.int64)
                 for c in range(samples.shape[1])]
    else:
        raise ValueError("samples must be (n,) or (n, 1|2)")
    if stereo not in ("auto", "lr", "ms", "ls", "rs"):
        raise ValueError(f"bad stereo mode {stereo!r}")
    n, nch, bps = chans[0].size, len(chans), 16
    if n == 0:
        raise ValueError("cannot encode an empty stream")

    frames: list[bytes] = []
    frame_samples: list[int] = []
    for fno, start in enumerate(range(0, n, blocksize)):
        block = [c[start:start + blocksize] for c in chans]
        bs = block[0].size
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)
        w.write(0, 1)                          # fixed-blocksize stream
        w.write(0b0111, 4)                     # 16-bit blocksize-1 follows
        w.write(0, 4)                          # rate from STREAMINFO
        mode = "lr" if nch == 1 else stereo
        if nch == 2 and stereo == "auto":
            l, r_ = block
            side = l - r_
            costs = {"lr": int(np.abs(np.diff(l)).sum()
                               + np.abs(np.diff(r_)).sum()),
                     "ms": int(np.abs(np.diff((l + r_) >> 1)).sum()
                               + np.abs(np.diff(side)).sum()),
                     "ls": int(np.abs(np.diff(l)).sum()
                               + np.abs(np.diff(side)).sum()),
                     "rs": int(np.abs(np.diff(r_)).sum()
                               + np.abs(np.diff(side)).sum())}
            mode = min(costs, key=costs.get)
        assign = {"lr": nch - 1, "ls": 8, "rs": 9, "ms": 10}[mode]
        w.write(assign, 4)
        w.write(_BPS_CODES[bps], 3)
        w.write(0, 1)
        _write_coded_number(w, fno)
        w.write(bs - 1, 16)
        hdr = w.getvalue()
        w.write(_crc8(hdr), 8)
        if nch == 1 or mode == "lr":
            subs = [(c, bps) for c in block]
        else:
            l, r_ = block
            side = l - r_
            subs = {"ls": [(l, bps), (side, bps + 1)],
                    "rs": [(side, bps + 1), (r_, bps)],
                    "ms": [((l + r_) >> 1, bps), (side, bps + 1)]}[mode]
        for sig, sbps in subs:
            _write_subframe(w, sig, sbps, lpc_order=lpc_order)
        if w.bit_length % 8:
            w.write(0, 8 - w.bit_length % 8)
        body = w.getvalue()
        frames.append(body + struct.pack(">H", _crc16(body)))
        frame_samples.append(bs)

    si = _BitWriter()
    si.write(min(blocksize, n), 16)
    si.write(min(blocksize, n) if n <= blocksize else blocksize, 16)
    si.write(0, 24)                            # min/max framesize unset
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + _md5_samples(
        samples.reshape(n, -1) if samples.ndim == 2 else samples)
    block = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return block, frames, frame_samples


def encode_flac(samples: np.ndarray, sample_rate: int, *,
                blocksize: int = 4096, stereo: str = "auto",
                lpc_order: int = 8) -> bytes:
    """int16 samples — (n,) mono or (n, 2) stereo — to a FLAC stream.
    ``stereo`` picks the frame channel assignment: 'lr' (independent),
    'ms' (mid/side), 'ls', 'rs', or 'auto' (cheapest by residual
    magnitude per frame). Lossless by construction at any setting."""
    block, frames, _ = encode_flac_parts(
        samples, sample_rate, blocksize=blocksize, stereo=stereo,
        lpc_order=lpc_order)
    return b"fLaC" + block + b"".join(frames)


def probe_flac(data: bytes) -> dict:
    """STREAMINFO fields without any frame decode."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos, si = 4, None
    while pos + 4 <= len(data):
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        if hdr & 0x7F == 0:
            if length < 34:
                raise ValueError(f"STREAMINFO block too short ({length})")
            si = data[pos + 4:pos + 4 + length]
        pos += 4 + length
        if hdr & 0x80:
            break
    else:
        raise ValueError("unterminated metadata block chain")
    if si is None:
        raise ValueError("no STREAMINFO metadata block")
    r = _BitReader(si)
    r.read(16), r.read(16), r.read(24), r.read(24)
    rate = r.read(20)
    nch = r.read(3) + 1
    bps = r.read(5) + 1
    n = r.read(36)
    return {"sample_rate": rate, "channels": nch, "bits_per_sample": bps,
            "n_samples": n, "md5": si[18:34], "frames_offset": pos}


def decode_flac(data: bytes, verify: bool = True) -> dict:
    """Full decode: every frame, every subframe type, all four channel
    assignments; CRC-8/CRC-16 checked per frame, MD5 checked against
    STREAMINFO (``verify=False`` skips MD5 for truncated testing)."""
    meta = probe_flac(data)
    nch, total = meta["channels"], meta["n_samples"]
    bps = meta["bits_per_sample"]
    if nch > 2:
        raise ValueError(f"engine decodes mono/stereo FLAC (got {nch} ch)")
    out = np.empty((total, nch), np.int64)
    pos_bits = meta["frames_offset"] * 8
    r = _BitReader(data, pos_bits)
    got = 0
    while got < total:
        frame_start = r.pos // 8
        if r.read(14) != _SYNC:
            raise ValueError(f"lost frame sync at byte {frame_start}")
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        r.read(1)                              # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        assign = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample-rate code 15")
        elif rate_code and rate_code not in _RATE_TABLE:
            raise ValueError(f"bad sample-rate code {rate_code}")
        fbps = bps if bps_code == 0 else _BPS_TABLE.get(bps_code)
        if fbps is None:
            raise ValueError(f"reserved sample-size code {bps_code}")
        hdr_end = r.pos // 8
        if _crc8(data[frame_start:hdr_end]) != r.read(8):
            raise ValueError(f"frame header CRC-8 mismatch at byte "
                             f"{frame_start}")
        if assign < 8:
            if assign + 1 != nch:
                raise ValueError(f"frame channels {assign + 1} != "
                                 f"stream channels {nch}")
            chans = [_read_subframe(r, bs, fbps) for _ in range(nch)]
        elif assign in (8, 9, 10):
            if nch != 2:
                raise ValueError("decorrelated frame in a mono stream")
            extra0 = 1 if assign == 9 else 0
            extra1 = 1 if assign in (8, 10) else 0
            c0 = _read_subframe(r, bs, fbps + extra0)
            c1 = _read_subframe(r, bs, fbps + extra1)
            if assign == 8:                    # left/side
                chans = [c0, c0 - c1]
            elif assign == 9:                  # side/right
                chans = [c1 + c0, c1]
            else:                              # mid/side
                m = (c0 << 1) | (c1 & 1)
                chans = [(m + c1) >> 1, (m - c1) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {assign}")
        if r.pos % 8:
            if r.read(8 - r.pos % 8):
                raise ValueError("nonzero frame padding bits")
        body_end = r.pos // 8
        if _crc16(data[frame_start:body_end]) != r.read(16):
            raise ValueError(f"frame CRC-16 mismatch at byte {frame_start}")
        take = min(bs, total - got)
        for c in range(nch):
            out[got:got + take, c] = chans[c][:take]
        got += take
    samples = out[:, 0] if nch == 1 else out
    if verify and meta["md5"] != b"\x00" * 16:
        if _md5_samples(out if nch > 1 else out[:, 0]) != meta["md5"]:
            raise ValueError("decoded audio MD5 mismatch vs STREAMINFO")
    return {"sample_rate": meta["sample_rate"], "channels": nch,
            "bits_per_sample": bps, "samples": samples}
