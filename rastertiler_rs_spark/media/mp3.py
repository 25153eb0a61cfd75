"""MPEG-1 Layer III frame-header writer + walker — from the public
MPEG-1 audio (ISO/IEC 11172-3) framing rules, no external libraries.

`probe_mp3` walks the frame headers of a whole stream (sync,
bitrate/samplerate indices, padding) and derives sample_rate /
channels / frame count / duration. `encode_mp3` emits frames with
spec-correct headers and deterministic filler payloads so tests and
oracle fixtures can round-trip real framing without a real
psychoacoustic encoder. Below that, `encode_mp3_l3` /
`decode_mp3_spectra` / `l3_subband_samples` implement REAL Layer III
payload decode for a verified family (see the section comment): side
info, scalefactors, count1 Huffman, requantization, alias reduction +
IMDCT to the subband domain — with fail-fast errors on the spec-data
surfaces unavailable offline (big-values code tables, count1 table A,
bit reservoir, the Table B.3 synthesis window).

Framing facts used (MPEG-1 Layer III):
- header = 11-bit sync (all ones) | 2b version (11 = MPEG-1)
  | 2b layer (01 = Layer III) | 1b no-CRC | 4b bitrate index
  | 2b samplerate index | 1b padding | 1b private | 2b channel mode
  | 2b mode ext | 1b copyright | 1b original | 2b emphasis
- 1152 samples per frame
- frame_bytes = 144 * bitrate / sample_rate + padding
"""

from __future__ import annotations

# index 1..14; 0 is "free" and 15 is forbidden
BITRATES_KBPS = [None, 32, 40, 48, 56, 64, 80, 96, 112,
                 128, 160, 192, 224, 256, 320, None]
SAMPLE_RATES = [44100, 48000, 32000, None]
SAMPLES_PER_FRAME = 1152


def _frame_len(bitrate_kbps: int, sample_rate: int, padded: bool) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + (1 if padded else 0)


def encode_mp3(n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100,
               channels: int = 2, pad_every: int = 0, seed: int = 0) -> bytes:
    """Emit ``n_frames`` Layer III frames with valid headers.

    ``pad_every`` > 0 sets the padding bit on every k-th frame (real
    44.1 kHz streams alternate padding; the walker must honor the
    per-frame +1 byte). Payload bytes are a deterministic LCG fill.
    """
    try:
        br_idx = BITRATES_KBPS.index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"not an MPEG-1 L3 bitrate: {bitrate_kbps} kbps") from None
    try:
        sr_idx = SAMPLE_RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"not an MPEG-1 sample rate: {sample_rate}") from None
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    mode = 3 if channels == 1 else 0  # 00 stereo, 11 single channel

    out = bytearray()
    x = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    for i in range(n_frames):
        padded = pad_every > 0 and i % pad_every == 0
        h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | ((1 if padded else 0) << 9) \
            | (mode << 6)
        out += h.to_bytes(4, "big")
        body = _frame_len(bitrate_kbps, sample_rate, padded) - 4
        for _ in range(body):
            x = (x * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
            out.append((x >> 33) & 0xFF)
    return bytes(out)


def probe_mp3(data: bytes) -> dict:
    """Walk every frame header; return stream-level metadata.

    Raises on desync (a frame header that is not where the previous
    frame's length says it should be) or on mixed sample rates —
    metadata from a broken walk would silently be wrong otherwise.
    duration_ms is the exact integer n_frames*1152*1000 // sample_rate
    (matching the SQL oracle twin's expression).
    """
    pos, n_frames, byte_sum = 0, 0, 0
    sample_rate = channels = None
    kbps_sum = 0
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        if (h >> 19) & 0b11 != 0b11 or (h >> 17) & 0b11 != 0b01:
            raise ValueError(f"not MPEG-1 Layer III at byte {pos}")
        br = BITRATES_KBPS[(h >> 12) & 0xF]
        sr = SAMPLE_RATES[(h >> 10) & 0b11]
        if br is None or sr is None:
            raise ValueError(f"forbidden bitrate/samplerate index at byte {pos}")
        ch = 1 if (h >> 6) & 0b11 == 3 else 2
        if sample_rate is None:
            sample_rate, channels = sr, ch
        elif sr != sample_rate:
            raise ValueError(f"mixed sample rates at byte {pos}: {sr} vs {sample_rate}")
        elif ch != channels:
            # mode 00/01/10 may vary frame-to-frame (all 2-channel), but
            # a mono/stereo CHANNEL-COUNT change flips the side-info size
            # (17 vs 32 bytes) — stream metadata and any payload decode
            # would silently mis-parse, so refuse like mixed rates
            raise ValueError(
                f"mixed channel counts at byte {pos}: {ch} vs {channels}")
        flen = _frame_len(br, sr, bool((h >> 9) & 1))
        if pos + flen > len(data):
            raise ValueError(f"truncated final frame at byte {pos}")
        n_frames += 1
        kbps_sum += br
        byte_sum += flen
        pos += flen
    if n_frames == 0:
        raise ValueError("no MP3 frames found")
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after last frame")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_frames * SAMPLES_PER_FRAME,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sample_rate,
        "avg_kbps": kbps_sum // n_frames,
        "n_bytes": byte_sum,
    }


# ---------------------------------------------------------------------------
# Layer III PAYLOAD decode (scoped family) — ISO/IEC 11172-3 §2.4.1.7/2.4.2.7
#
# The decode chain below is real spec arithmetic: side-information parse
# (exact MPEG-1 bit layout, mono 17 / stereo 32 bytes), scalefactor parse
# (slen1/slen2 per scalefac_compress, Table B.6 semantics), Huffman decode
# of the count1 region (quadruple table B: 4-bit one's-complement codes +
# per-value sign bits), requantization (|is|^(4/3) * 2^((global_gain-210)/4
# - multiplier*(scalefac+preflag*pretab)) with the long-block scalefactor
# band boundaries of Table B.8), alias reduction (Table B.9 butterflies),
# 36-point IMDCT + sine window + overlap-add + frequency inversion.
#
# Scope is the frame family encode_mp3_l3 emits (the same fixture-family
# strategy jpeg/codec.py used for solid blocks): main_data_begin == 0 (no
# bit reservoir), long blocks only, big-values regions coded with table 0
# (all zero, zero bits), nonzero spectrum carried by the count1 region.
# Everything OUTSIDE the family fails fast with the exact reason: the
# big-values Huffman code tables (B.7 tables 1..31), count1 table A, the
# bit reservoir, window switching, and the synthesis-window coefficients
# (Table B.3) are spec DATA unavailable in this offline environment —
# parsing structure is implemented, the unverifiable table data is not
# guessed.
# ---------------------------------------------------------------------------

SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
# scfsi band groups (2.4.2.7): sfb 0-5, 6-10, 11-15, 16-20.
_SCFSI_GROUPS = [(0, 6), (6, 11), (11, 16), (16, 21)]
# Table B.8 long-block scalefactor band boundaries (MPEG-1).
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
            110, 134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
            106, 128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
            126, 156, 194, 240, 296, 364, 448, 550, 576],
}


class _BitWriter:
    """MSB-first bit accumulator (the MPEG bitstream order)."""

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits < 0 or value < 0 or value >> nbits:
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    @property
    def bit_length(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def getvalue(self) -> bytes:
        out = bytearray(self._bytes)
        if self._nbits:
            out.append((self._acc << (8 - self._nbits)) & 0xFF)
        return bytes(out)


class _BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > len(self.data) * 8:
            raise ValueError("bit read past end of buffer")
        v = 0
        p = self.pos
        while nbits:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, nbits)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            nbits -= take
        self.pos = p
        return v


def _parse_side_info(br: "_BitReader", channels: int) -> dict:
    """Exact MPEG-1 Layer III side-information layout (11172-3 2.4.1.7):
    17 bytes mono / 32 bytes stereo — the bit budget is pinned by the
    test suite (9+5+4 + 2*59 = 136; 9+3+8 + 4*59 = 256)."""
    si = {"main_data_begin": br.read(9)}
    br.read(5 if channels == 1 else 3)  # private_bits
    si["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(channels)]
    gr = []
    for _g in range(2):
        chs = []
        for _c in range(channels):
            d = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read(1),
            }
            if d["window_switching"]:
                d["block_type"] = br.read(2)
                d["mixed_block"] = br.read(1)
                d["table_select"] = [br.read(5), br.read(5)]
                d["subblock_gain"] = [br.read(3) for _ in range(3)]
                d["region0_count"] = 7 if d["block_type"] != 2 or d["mixed_block"] else 8
                d["region1_count"] = 20 - d["region0_count"]
            else:
                d["block_type"] = 0
                d["table_select"] = [br.read(5), br.read(5), br.read(5)]
                d["region0_count"] = br.read(4)
                d["region1_count"] = br.read(3)
            d["preflag"] = br.read(1)
            d["scalefac_scale"] = br.read(1)
            d["count1table_select"] = br.read(1)
            chs.append(d)
        gr.append(chs)
    si["granules"] = gr
    return si


def _requantize(is_vals, d: dict, scalefacs, sample_rate: int):
    """xr[i] = sign * |is|^(4/3) * 2^(0.25*(global_gain-210))
    * 2^(-multiplier*(scalefac[sfb] + preflag*pretab[sfb])), long blocks
    (11172-3 2.4.3.4.7.1). multiplier = 1.0 if scalefac_scale else 0.5."""
    import numpy as np

    bounds = SFB_LONG[sample_rate]
    mult = 1.0 if d["scalefac_scale"] else 0.5
    exp = np.full(576, 0.25 * (d["global_gain"] - 210), dtype=np.float64)
    for sfb in range(22):
        sf = (scalefacs[sfb] if sfb < 21 else 0) + \
            (PRETAB[sfb] if d["preflag"] else 0)
        if sf:
            exp[bounds[sfb]:bounds[sfb + 1]] -= mult * sf
    mags = np.abs(is_vals).astype(np.float64)
    return np.sign(is_vals) * mags ** (4.0 / 3.0) * np.exp2(exp)


def encode_mp3_l3(frames, sample_rate: int = 44100, channels: int = 1,
                  ms_stereo: bool = False, scfsi=None) -> bytes:
    """Real Layer III encoder for the verified payload family.

    ``frames`` is a list of frames; each frame is a list of 2 granules;
    each granule a list of ``channels`` dicts with keys:
      values       — int array in {-1,0,1}, length a multiple of 4, <=576
                     (carried entirely by the count1 region, table B)
      global_gain  — 0..255
      scalefacs    — optional 21 ints (bounded by scalefac_compress slens)
      scalefac_compress / scalefac_scale / preflag — optional ints
    Emits spec-exact headers + side info; big_values=0 with table-0
    region selects; main_data_begin=0 (each frame self-contained);
    stuffing bits pad to the chosen frame length (smallest bitrate that
    fits). probe_mp3 walks the result unchanged.

    ``ms_stereo`` (channels=2 only) writes mode=01 with mode_extension
    MS-only: channel 0 is then the MID spectrum, channel 1 the SIDE.
    ``scfsi`` is an optional per-channel list of 4 flags shared by all
    frames: flagged scalefactor band groups transmit NO bits in
    granule 1 and reuse granule 0's values (the granule-1 spec must
    carry matching scalefacs — validated)."""
    try:
        sr_idx = SAMPLE_RATES.index(sample_rate)
    except ValueError:
        raise ValueError(f"not an MPEG-1 sample rate: {sample_rate}") from None
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if ms_stereo and channels != 2:
        raise ValueError("ms_stereo requires channels=2")
    mode, ext = (3, 0) if channels == 1 else ((1, 2) if ms_stereo else (0, 0))
    scfsi = scfsi or [[0, 0, 0, 0] for _ in range(channels)]
    if len(scfsi) != channels or any(len(f) != 4 for f in scfsi):
        raise ValueError("scfsi must be 4 flags per channel")
    side_bytes = 17 if channels == 1 else 32
    out = bytearray()

    for frame in frames:
        if len(frame) != 2 or any(len(g) != channels for g in frame):
            raise ValueError("each frame needs 2 granules x channels specs")
        # --- main data first (to size part2_3_length / pick bitrate) ---
        mw = _BitWriter()
        p23 = []
        g0_sfs = [None] * channels
        for gi, g in enumerate(frame):
            for ci, spec in enumerate(g):
                start = mw.bit_length
                sfc = int(spec.get("scalefac_compress", 0))
                sfs = list(spec.get("scalefacs", [0] * 21))
                if len(sfs) != 21:
                    raise ValueError("scalefacs must have 21 entries")
                if gi == 0:
                    g0_sfs[ci] = sfs
                for grp, (lo, hi) in enumerate(_SCFSI_GROUPS):
                    if gi == 1 and scfsi[ci][grp]:
                        if sfs[lo:hi] != g0_sfs[ci][lo:hi]:
                            raise ValueError(
                                f"scfsi group {grp} flagged but granule-1 "
                                "scalefacs differ from granule 0")
                        continue  # shared: no bits transmitted
                    slen = SLEN1[sfc] if lo < 11 else SLEN2[sfc]
                    for sfb in range(lo, hi):
                        mw.write(sfs[sfb], slen)
                vals = list(spec["values"])
                if len(vals) % 4 or len(vals) > 576:
                    raise ValueError("values length must be 4k <= 576")
                for q in range(0, len(vals), 4):
                    quad = vals[q:q + 4]
                    mags = [abs(v) for v in quad]
                    if any(m > 1 for m in mags):
                        raise ValueError("count1 values must be in {-1,0,1}")
                    code = (mags[0] << 3) | (mags[1] << 2) | (mags[2] << 1) | mags[3]
                    mw.write((~code) & 0xF, 4)  # table B: one's complement
                    for v in quad:
                        if v:
                            mw.write(1 if v < 0 else 0, 1)
                p23.append(mw.bit_length - start)
        main = mw.getvalue()
        need = 4 + side_bytes + len(main)
        br_idx = next((i for i in range(1, 15)
                       if _frame_len(BITRATES_KBPS[i], sample_rate, False) >= need),
                      None)
        if br_idx is None:
            raise ValueError(f"payload needs {need} bytes; exceeds 320 kbps frame")
        flen = _frame_len(BITRATES_KBPS[br_idx], sample_rate, False)

        h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (mode << 6) \
            | (ext << 4)
        out += h.to_bytes(4, "big")
        sw = _BitWriter()
        sw.write(0, 9)                      # main_data_begin: self-contained
        sw.write(0, 5 if channels == 1 else 3)
        for c in range(channels):
            for grp in range(4):
                sw.write(scfsi[c][grp], 1)  # scfsi
        k = 0
        for g in frame:
            for spec in g:
                sw.write(p23[k], 12)
                k += 1
                sw.write(0, 9)              # big_values
                sw.write(int(spec["global_gain"]), 8)
                sw.write(int(spec.get("scalefac_compress", 0)), 4)
                sw.write(0, 1)              # window_switching: long blocks
                for _ in range(3):
                    sw.write(0, 5)          # table_select: table 0 (all zero)
                sw.write(0, 4)              # region0_count
                sw.write(0, 3)              # region1_count
                sw.write(int(spec.get("preflag", 0)), 1)
                sw.write(int(spec.get("scalefac_scale", 0)), 1)
                sw.write(1, 1)              # count1table_select: table B
        side = sw.getvalue()
        assert len(side) == side_bytes
        out += side + main + bytes(flen - need)  # zero stuffing = ancillary
    return bytes(out)


def decode_mp3_spectra(data: bytes) -> dict:
    """Decode the Huffman-coded spectral payload of every granule.

    Returns {"sample_rate", "channels", "granules": [per (frame, granule,
    channel) dicts with frame/granule/channel indices, is_values (576-int
    numpy array), xr (576-float requantized spectrum), global_gain]}.
    Fails fast (NotImplementedError naming the feature) outside the
    verified family: bit reservoir, window switching, big-values tables
    != 0, count1 table A. Malformed streams raise ValueError."""
    import numpy as np

    meta = probe_mp3(data)  # validates sync/length accounting first
    sr, channels = meta["sample_rate"], meta["channels"]
    side_bytes = 17 if channels == 1 else 32
    out = []
    pos = 0
    for fno in range(meta["n_frames"]):
        h = int.from_bytes(data[pos:pos + 4], "big")
        flen = _frame_len(BITRATES_KBPS[(h >> 12) & 0xF], sr, bool((h >> 9) & 1))
        if not (h >> 16) & 1:
            raise NotImplementedError(
                "CRC-protected frames (protection_bit=0) are outside the "
                "verified payload family (16-bit CRC precedes side info)")
        ms_on = False
        if (h >> 6) & 0b11 == 0b01:  # joint stereo: mode_extension decides
            if (h >> 4) & 0b01:
                raise NotImplementedError(
                    "intensity stereo (mode_extension bit 0) is outside "
                    "the verified payload family")
            ms_on = bool((h >> 4) & 0b10)  # MS matrixing: pure arithmetic
        br = _BitReader(data, (pos + 4) * 8)
        si = _parse_side_info(br, channels)
        if si["main_data_begin"] != 0:
            raise NotImplementedError(
                "bit reservoir (main_data_begin != 0) is outside the "
                "verified payload family")
        mr = _BitReader(data, (pos + 4 + side_bytes) * 8)
        frame_end_bit = (pos + flen) * 8
        g0_scalefacs: list = [None] * channels
        for g in range(2):
            gr_entries = []
            for c in range(channels):
                d = si["granules"][g][c]
                if d["window_switching"]:
                    raise NotImplementedError(
                        "window switching (short/start/stop blocks) is "
                        "outside the verified payload family")
                start = mr.pos
                sfc = d["scalefac_compress"]
                # scfsi: granule 1 reuses granule 0's scalefactors for
                # each flagged band GROUP (2.4.2.7: sfb 0-5/6-10/11-15/
                # 16-20) and transmits no bits for it
                scalefacs = []
                for grp, (lo, hi) in enumerate(_SCFSI_GROUPS):
                    if g == 1 and si["scfsi"][c][grp]:
                        scalefacs += g0_scalefacs[c][lo:hi]
                    else:
                        slen = SLEN1[sfc] if lo < 11 else SLEN2[sfc]
                        scalefacs += [mr.read(slen) for _ in range(lo, hi)]
                if g == 0:
                    g0_scalefacs[c] = scalefacs
                if any(t != 0 for t in d["table_select"]) and d["big_values"]:
                    raise NotImplementedError(
                        f"big-values Huffman tables {d['table_select']} "
                        "(B.7 code data) unavailable in this environment")
                # table 0: big_values pairs are all zero, zero bits each
                is_vals = np.zeros(576, dtype=np.int64)
                idx = 2 * d["big_values"]
                if d["count1table_select"] != 1:
                    raise NotImplementedError(
                        "count1 table A code data unavailable in this "
                        "environment (table B family only)")
                budget = start + d["part2_3_length"]
                while mr.pos < budget and idx + 4 <= 576:
                    code = (~mr.read(4)) & 0xF
                    for b in (8, 4, 2, 1):
                        if code & b:
                            is_vals[idx] = -1 if mr.read(1) else 1
                        idx += 1
                if mr.pos > budget:
                    raise ValueError(
                        f"frame {fno} gr {g} ch {c}: huffman data overran "
                        f"part2_3_length ({mr.pos - start} vs "
                        f"{d['part2_3_length']} bits)")
                # spectrum filled to 576 before the bit budget ran out:
                # the remainder of part2_3 is stuffing — skip it (the
                # standard decoder behavior; a codeword SPLIT across the
                # boundary is still an overrun error above)
                mr.pos = budget
                if mr.pos > frame_end_bit:
                    raise ValueError(f"frame {fno}: main data past frame end")
                xr = _requantize(is_vals, d, scalefacs, sr)
                gr_entries.append({"frame": fno, "granule": g, "channel": c,
                                   "is_values": is_vals, "xr": xr,
                                   "global_gain": d["global_gain"],
                                   "scalefacs": scalefacs})
            if ms_on:
                # MS matrixing (2.4.3.4.9.2): channel 0 carries mid,
                # channel 1 side; li = (mi+si)/sqrt(2), ri = (mi-si)/sqrt(2)
                m, s = gr_entries[0]["xr"], gr_entries[1]["xr"]
                rt2 = np.sqrt(2.0)
                gr_entries[0]["xr"] = (m + s) / rt2
                gr_entries[1]["xr"] = (m - s) / rt2
            out.extend(gr_entries)
        pos += flen
    return {"sample_rate": sr, "channels": channels, "granules": out}


# Alias-reduction butterfly coefficients (11172-3 Table B.9).
_ALIAS_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]


def l3_subband_samples(xr, prev_overlap=None):
    """Hybrid filterbank, long blocks: alias reduction -> 36-point IMDCT
    -> sine window -> overlap-add -> frequency inversion. Input xr is the
    576-sample requantized spectrum of ONE granule; returns (samples,
    overlap): samples is (18, 32) time-major subband samples ready for
    the polyphase synthesis stage, overlap the (18, 32) carry for the
    next granule. The final polyphase matrixing itself needs the 512
    synthesis-window coefficients (Table B.3) — spec DATA unavailable
    offline — so PCM stays env-blocked; everything up to the subband
    domain is real (11172-3 2.4.3.4.10.*)."""
    import numpy as np

    x = np.asarray(xr, dtype=np.float64).reshape(32, 18).copy()
    cs = 1.0 / np.sqrt(1.0 + np.square(_ALIAS_CI))
    ca = np.asarray(_ALIAS_CI) * cs
    for sb in range(1, 32):
        lo = x[sb - 1, 17 - np.arange(8)].copy()
        hi = x[sb, np.arange(8)].copy()
        x[sb - 1, 17 - np.arange(8)] = lo * cs - hi * ca
        x[sb, np.arange(8)] = hi * cs + lo * ca
    n = 36
    i = np.arange(n)[:, None]
    k = np.arange(18)[None, :]
    imdct = np.cos(np.pi / (2 * n) * (2 * i + 1 + n // 2) * (2 * k + 1))
    win = np.sin(np.pi / n * (np.arange(n) + 0.5))  # block type 0
    z = (x @ imdct.T) * win                          # (32, 36)
    if prev_overlap is None:
        prev_overlap = np.zeros((18, 32))
    samples = z[:, :18].T + prev_overlap            # overlap-add
    overlap = z[:, 18:].T
    sb = np.arange(32)[None, :]
    t = np.arange(18)[:, None]
    inv = np.where((sb % 2 == 1) & (t % 2 == 1), -1.0, 1.0)
    return samples * inv, overlap
