"""From-spec Ogg container (RFC 3533) with the FLAC-to-Ogg mapping
(xiph.org "FLAC-to-Ogg mapping" version 1.0): page framing with
255-lacing segmentation and cross-page packet continuation, the
forward (non-reflected) CRC-32 page checksum, BOS/EOS flags, granule
positions, and mux/probe/demux/decode for FLAC payloads through the
engine's own codec (media/flac.py) — everything algorithmic, no spec
data tables beyond the CRC polynomial constant.

The reference engine (rastertiler-rs) has no audio surface; this is
north-star multimodal extension: operators/multimodal.py dispatches
fmt 'ogg' here, making Ogg-FLAC the engine's fourth real end-to-end
audio/video container family (MP4, AVI, WebM, Ogg)."""

from __future__ import annotations

import struct

import numpy as np

from .flac import decode_flac, encode_flac_parts, probe_flac

_NO_GRANULE = (1 << 64) - 1                  # -1: no packet ends on page


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def _crc32_ogg(data: bytes) -> int:
    """RFC 3533 §6: CRC-32 poly 0x04C11DB7, init 0, NOT reflected, no
    final xor — deliberately different from zlib's crc32."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) ^ b) & 0xFF]
    return crc


def _emit_page(out: bytearray, serial: int, seq: int, granule: int,
               htype: int, lacing: list[int], payload: bytes) -> None:
    head = struct.pack("<4sBBQII", b"OggS", 0, htype,
                       granule & 0xFFFFFFFFFFFFFFFF, serial, seq)
    page = head + b"\x00\x00\x00\x00" + bytes([len(lacing)]) \
        + bytes(lacing) + payload
    crc = _crc32_ogg(page)
    out += page[:22] + struct.pack("<I", crc) + page[26:]


def encode_ogg(packets: list[tuple[bytes, int]], serial: int = 1,
               max_page_payload: int = 4096) -> bytes:
    """Generic Ogg mux: ``packets`` is [(payload, granule_position)];
    the first packet gets its own BOS page (every mapping requires
    this), the last page carries EOS. Whole packets pack together
    until a page reaches ~``max_page_payload`` bytes or 255 lacing
    values; an oversized packet spans pages with the continuation
    flag. Granule of a page = granule of the last packet COMPLETING
    on it, else -1 per RFC 3533."""
    if not packets:
        raise ValueError("cannot mux an empty packet list")
    out = bytearray()
    seq = 0
    # current page accumulator
    lacing: list[int] = []
    payload = bytearray()
    granule = _NO_GRANULE
    continued = False

    def flush(htype_extra: int = 0) -> None:
        nonlocal seq, lacing, payload, granule, continued
        htype = (0x01 if continued else 0) | htype_extra \
            | (0x02 if seq == 0 else 0)
        _emit_page(out, serial, seq, granule, htype, lacing, bytes(payload))
        seq += 1
        lacing, payload, granule, continued = [], bytearray(), \
            _NO_GRANULE, False

    for pi, (pkt, g) in enumerate(packets):
        last_pkt = pi == len(packets) - 1
        # lacing for this packet: n 255s then the sub-255 remainder
        segs = [255] * (len(pkt) // 255) + [len(pkt) % 255]
        pos = 0
        while segs:
            room = 255 - len(lacing)
            if room == 0 or (lacing and len(payload) >= max_page_payload):
                flush()
                continued = pos > 0
                continue
            take = segs[:room]
            segs = segs[room:]
            nbytes = sum(take)
            lacing += take
            payload += pkt[pos:pos + nbytes]
            pos += nbytes
            if not segs:                       # packet completes here
                granule = g
        if pi == 0 or last_pkt:
            # BOS page holds only the first packet; EOS flags the last
            flush(0x04 if last_pkt else 0)
    if lacing:
        flush(0x04)
    return bytes(out)


def _parse_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, [lacing], payload)
    per page, CRC-verified, fail-fast on any structural damage."""
    pos, expect_seq = 0, {}
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg page capture at byte {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        (_, version, htype, granule, serial, seq) = struct.unpack_from(
            "<4sBBQII", data, pos)
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        crc_stored = struct.unpack_from("<I", data, pos + 22)[0]
        nsegs = data[pos + 26]
        table_end = pos + 27 + nsegs
        if table_end > len(data):
            raise ValueError("truncated Ogg segment table")
        lacing = list(data[pos + 27:table_end])
        body_end = table_end + sum(lacing)
        if body_end > len(data):
            raise ValueError("truncated Ogg page body")
        page = bytearray(data[pos:body_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _crc32_ogg(bytes(page)) != crc_stored:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        prev = expect_seq.get(serial)
        if prev is not None and seq != prev + 1:
            raise ValueError(f"Ogg page sequence gap on serial {serial}: "
                             f"{prev} -> {seq}")
        expect_seq[serial] = seq
        yield (htype, granule, serial, seq,
               lacing, data[table_end:body_end])
        pos = body_end


def demux_ogg(data: bytes) -> dict:
    """Reassemble the single logical stream's packets. Returns
    {serial, packets: [(bytes, granule_of_completing_page)],
    last_granule}. Grouped/chained multi-serial streams fail fast."""
    packets: list[tuple[bytes, int]] = []
    partial = bytearray()
    mid_packet = False
    stream_serial = None
    last_granule = 0
    saw_bos = saw_eos = False
    for htype, granule, serial, seq, lacing, payload in _parse_pages(data):
        if stream_serial is None:
            stream_serial = serial
            if not htype & 0x02:
                raise ValueError("first Ogg page is not BOS")
            saw_bos = True
        elif serial != stream_serial:
            raise ValueError("multiplexed/chained Ogg streams not supported")
        elif htype & 0x02:
            raise ValueError("BOS flag repeated mid-stream")
        if saw_eos:
            raise ValueError("page after EOS")
        if bool(htype & 0x01) != mid_packet:
            raise ValueError(f"Ogg continuation flag mismatch on page {seq}")
        pos = 0
        for lv in lacing:
            partial += payload[pos:pos + lv]
            pos += lv
            if lv < 255:                       # packet boundary
                packets.append((bytes(partial), granule))
                partial = bytearray()
        mid_packet = bool(lacing) and lacing[-1] == 255
        if granule != _NO_GRANULE:
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
    if mid_packet:
        raise ValueError("stream ends mid-packet")
    if not saw_bos or not saw_eos:
        raise ValueError("missing BOS/EOS page")
    return {"serial": stream_serial, "packets": packets,
            "last_granule": last_granule}


# ------------------------------------------------------- FLAC mapping

def encode_ogg_flac(samples: np.ndarray, sample_rate: int, *,
                    serial: int = 1, blocksize: int = 4096,
                    stereo: str = "auto", lpc_order: int = 8) -> bytes:
    """FLAC-to-Ogg mapping 1.0: the BOS packet is 0x7F 'FLAC' 1 0
    nheaders=0 'fLaC' + STREAMINFO block; each FLAC frame is one
    packet; granule = cumulative interchannel sample count."""
    block, frames, counts = encode_flac_parts(
        samples, sample_rate, blocksize=blocksize, stereo=stereo,
        lpc_order=lpc_order)
    head = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + b"fLaC" + block
    packets = [(head, 0)]
    total = 0
    for frame, cnt in zip(frames, counts):
        total += cnt
        packets.append((frame, total))
    return encode_ogg(packets, serial=serial)


def _flac_stream_from_packets(packets: list[tuple[bytes, int]]) -> bytes:
    if not packets:
        raise ValueError("empty Ogg stream")
    head = packets[0][0]
    if head[:5] != b"\x7fFLAC":
        raise ValueError("BOS packet is not a FLAC mapping header")
    major, minor = head[5], head[6]
    if major != 1:
        raise ValueError(f"unsupported FLAC-to-Ogg mapping version "
                         f"{major}.{minor}")
    nheaders = struct.unpack_from(">H", head, 7)[0]
    if head[9:13] != b"fLaC":
        raise ValueError("FLAC mapping header missing fLaC signature")
    block = bytearray(head[13:])
    if len(block) < 4 or block[0] & 0x7F != 0:
        raise ValueError("mapping header does not carry STREAMINFO first")
    block[0] |= 0x80                           # drop trailing metadata
    if len(packets) - 1 < nheaders:
        raise ValueError("missing FLAC header packets")
    audio = b"".join(p for p, _ in packets[1 + nheaders:])
    return b"fLaC" + bytes(block) + audio


def probe_ogg_flac(data: bytes) -> dict:
    """Page-walk + STREAMINFO fields, no frame decode; n_samples is
    cross-checked against the terminal granule position."""
    d = demux_ogg(data)
    stream = _flac_stream_from_packets(d["packets"])
    meta = probe_flac(stream)
    if meta["n_samples"] and d["last_granule"] != meta["n_samples"]:
        raise ValueError(
            f"terminal granule {d['last_granule']} != STREAMINFO "
            f"n_samples {meta['n_samples']}")
    return {"sample_rate": meta["sample_rate"],
            "channels": meta["channels"],
            "bits_per_sample": meta["bits_per_sample"],
            "n_samples": meta["n_samples"],
            "n_pages": None, "serial": d["serial"],
            "n_packets": len(d["packets"])}


def decode_ogg_flac(data: bytes, verify: bool = True) -> dict:
    """Full decode through media/flac.py (CRC-8/16 + MD5 checks ride
    along) after Ogg page reassembly."""
    d = demux_ogg(data)
    return decode_flac(_flac_stream_from_packets(d["packets"]),
                       verify=verify)
