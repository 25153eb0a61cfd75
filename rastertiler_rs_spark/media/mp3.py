"""MPEG-1 Layer III frame-header writer + walker — from the public
MPEG-1 audio (ISO/IEC 11172-3) framing rules, no external libraries.

Like mp4.py this is CONTAINER-level support: `probe_mp3` walks the
frame headers of a whole stream (sync, bitrate/samplerate indices,
padding) and derives sample_rate / channels / frame count / duration;
decoding the Huffman-coded granule payloads is environment-blocked and
stays a stub in operators/multimodal.py. `encode_mp3` emits frames
with spec-correct headers and deterministic filler payloads so tests
and oracle fixtures can round-trip real framing without a real
psychoacoustic encoder.

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
