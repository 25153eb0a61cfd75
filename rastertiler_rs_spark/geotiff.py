"""GeoTIFF codec (S11 debug writer + the ingest source's file layer).

The reference's debug-only ``write_raster`` (/root/reference/src/
dataset.rs:199-230, call sites commented out at render.rs:240-255)
writes a tile's raw value buffer as a GeoTIFF via GDAL for inspection.
This is the GDAL-free analog: a minimal, valid little-endian GeoTIFF
with the same semantic payload — pixel matrix, affine geotransform
(ModelPixelScale + ModelTiepoint), EPSG:3857 spatial ref
(GeoKeyDirectory), and nodata (GDAL_NODATA ascii tag). Readable by
GDAL/QGIS/rasterio; no external deps.

Beyond the debug dump, this module is the file layer of the
distributed ingest source (operators/geotiff_source.py), so it speaks
the layouts a real raster archive serves — the cloud-optimized-GeoTIFF
block structure (TIFF 6.0 §15 tiled layout, tags 322-325) and the two
compressions GDAL defaults to for COGs, DEFLATE (tag 259 = 8, zlib
streams; legacy 32946 accepted on read) and LZW (tag 259 = 5, the
MSB-first TIFF variant with early code-width change, TIFF 6.0 §13),
each optionally under the horizontal-differencing predictor
(tag 317 = 2, applied per sample at the sample's bit depth). Every
layout/compression/predictor combination round-trips through
``write_geotiff``/``read_geotiff``, and ``_meta_from_tags`` normalizes
them all into ONE block manifest shape (offset, byte count, pixel
window, padded block dims) so the ingest source's ranged-read plan is
layout-independent.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import tilemath as tm

# TIFF tag ids
_IMAGE_WIDTH, _IMAGE_LENGTH = 256, 257
_BITS_PER_SAMPLE, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_BYTE_COUNTS, _SAMPLE_FORMAT = 279, 339
_PREDICTOR = 317
_TILE_WIDTH, _TILE_LENGTH, _TILE_OFFSETS, _TILE_BYTE_COUNTS = (
    322, 323, 324, 325)
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT, _GEO_KEY_DIRECTORY = 33550, 33922, 34735
_GDAL_NODATA = 42113

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE, _TYPE_ASCII = 3, 4, 12, 2
_TYPE_LONG8 = 16                                  # BigTIFF unsigned 64-bit

_COMPRESSION_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}
_COMPRESSION_NAMES = {1: "none", 5: "lzw", 8: "deflate", 32946: "deflate",
                      32773: "packbits"}


# ------------------------------------------------------------- TIFF LZW

def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first packing, 8-bit
    symbols, ClearCode=256/EOI=257, first table code 258, 12-bit cap,
    and the spec's EARLY code-width change — the width grows one code
    sooner than classic LZW, so the decoder (whose table add lags the
    encoder's by one, the KwKwK lag) widens at (1<<width)-1 while the
    encoder widens at (1<<width). Table reset at 4094 keeps every
    emitted code representable at width 12 on both sides."""
    clear, end = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = 9
    emit(clear, width)
    if not data:
        emit(end, width)
    else:
        w_code = data[0]
        for c in data[1:]:
            key = (w_code, c)
            hit = table.get(key)
            if hit is not None:
                w_code = hit
                continue
            emit(w_code, width)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            if next_code == 4094:
                emit(clear, width)
                table.clear()
                next_code = end + 1
                width = 9
            w_code = c
        emit(w_code, width)
        emit(end, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode_tiff`; stops at EOI or when
    ``expected`` bytes are produced (a block's decoded size is known
    from its padded dims, like every TIFF reader uses it)."""
    clear, end = 256, 257
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    out = bytearray()
    stack = bytearray()

    pos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return end
        byte0 = pos >> 3
        v = int.from_bytes(data[byte0: byte0 + 3], "big")
        v = (v >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        return v

    width = 9
    next_code = end + 1
    prev = -1
    while len(out) < expected:
        code = read(width)
        if code == end:
            break
        if code == clear:
            width = 9
            next_code = end + 1
            prev = -1
            continue
        if prev < 0:
            if code > 255:
                raise ValueError("LZW: first code after clear not literal")
            out.append(code)
            prev = code
            continue
        if code > next_code or (code == next_code and prev < 0):
            raise ValueError(f"LZW: code {code} ahead of table")
        # walk the chain for `code` (KwKwK: code == next_code uses prev)
        cur = prev if code == next_code else code
        stack.clear()
        while cur >= 256:
            if cur in (clear, end):
                raise ValueError("LZW: control code inside a chain")
            stack.append(suffix[cur])
            cur = int(prefix[cur])
        first = cur
        stack.append(first)
        if code == next_code:
            stack.insert(0, first)
        out += stack[::-1]
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = code
    if len(out) != expected:
        raise ValueError(
            f"LZW: decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


# --------------------------------------------------- block encode/decode

def _packbits_encode(row: bytes) -> bytes:
    """TIFF §9 PackBits RLE for ONE row (the spec forbids packing
    across row boundaries): runs of ≥2 identical bytes become
    (257-n, byte) with n ≤ 128; literals become (n-1, bytes) with
    n ≤ 128; the -128 noop is never emitted."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:                         # replicate run
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        # literal run: extend until a ≥3 replicate starts (2-byte runs
        # inside a literal cost the same either way; 3 breaks even but
        # splitting keeps the scan simple and spec-valid)
        j = i + 1
        while j < n and j - i < 128 and not (
                j + 2 < n and row[j] == row[j + 1] == row[j + 2]):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("PackBits stream ended early")
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n == -128:                          # noop
            continue
        if n >= 0:
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal overruns stream")
            out += data[i:i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits run overruns stream")
            out += data[i:i + 1] * (1 - n)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits decodes to {len(out)} bytes, expected {expected}")
    return bytes(out)


def _encode_block(arr: np.ndarray, compression: str, predictor: int
                  ) -> bytes:
    if predictor == 2:
        arr = arr.copy()
        arr[:, 1:] -= arr[:, :-1]  # unsigned wraparound, per TIFF §14
    buf = np.ascontiguousarray(arr).tobytes()
    if compression == "deflate":
        return zlib.compress(buf, 6)
    if compression == "lzw":
        return _lzw_encode_tiff(buf)
    if compression == "packbits":
        stride = arr.shape[1] * arr.dtype.itemsize
        return b"".join(_packbits_encode(buf[r * stride:(r + 1) * stride])
                        for r in range(arr.shape[0]))
    return buf


def _decode_block(raw: bytes, compression: str, predictor: int,
                  np_dt, pad_h: int, pad_w: int,
                  nrows: int, ncols: int) -> np.ndarray:
    itemsize = np.dtype(np_dt).itemsize
    expected = pad_h * pad_w * itemsize
    if compression == "deflate":
        buf = zlib.decompress(raw)
    elif compression == "lzw":
        buf = _lzw_decode_tiff(raw, expected)
    elif compression == "packbits":
        buf = _packbits_decode(raw, expected)
    else:
        buf = raw
    if len(buf) != expected:
        raise ValueError(
            f"block decodes to {len(buf)} bytes, expected {expected}")
    arr = np.frombuffer(buf, dtype=np_dt).reshape(pad_h, pad_w)
    if predictor == 2:
        arr = arr.cumsum(axis=1, dtype=np_dt)
    return arr[:nrows, :ncols]


def write_geotiff(path: str, data: np.ndarray, transform: tuple,
                  nodata: int, epsg: int = 3857,
                  rows_per_strip: int | None = None,
                  tile_size: int | None = None,
                  compression: str = "none",
                  predictor: int = 1,
                  bigtiff: bool = False) -> None:
    """Write a single-band uint8/uint32 array as a valid GeoTIFF.

    ``transform`` is the engine affine (a, b, c, d, e, f): x = a*col + c,
    y = e*row + f (b = d = 0 — axis-aligned, like every tile transform).

    ``rows_per_strip=None`` keeps the original debug layout (one strip).
    An explicit value writes a standard multi-strip file — independently
    addressable row bands, which is what makes a large GeoTIFF a
    DISTRIBUTED source: executors can ranged-read single strips without
    touching the rest of the file (operators/geotiff_source.py).

    ``tile_size`` (mutually exclusive with ``rows_per_strip``) writes
    the TIFF 6.0 §15 TILED layout instead — square blocks padded with
    ``nodata`` at the right/bottom edges, the block structure of a
    cloud-optimized GeoTIFF. ``compression`` is ``"none"``,
    ``"deflate"`` (zlib, tag 259 = 8), ``"lzw"`` (TIFF §13 MSB-first
    early-change variant) or ``"packbits"`` (TIFF §9 per-row RLE,
    tag 259 = 32773); ``predictor=2`` applies horizontal
    differencing per sample before compression (tag 317) — GDAL's
    usual COG recipe is tiled + deflate + predictor.

    ``bigtiff=True`` writes the BigTIFF (TIFF v43) layout — 64-bit
    offsets throughout, which is what any >4 GB raster (routine at
    COG scale) must use; the block manifest, compression and geo tags
    are identical, so the distributed source plans from either.
    """
    if data.ndim != 2:
        raise ValueError("write_geotiff expects a 2-D single-band array")
    a, b, c, d, e, f = transform
    if b or d:
        raise ValueError("rotated transforms are not supported (debug writer)")
    if compression not in _COMPRESSION_IDS:
        raise ValueError(f"unsupported compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    h, w = data.shape
    if data.dtype == np.uint8:
        bits, fmt = 8, 1
    elif data.dtype == np.uint32:
        bits, fmt = 32, 1
    else:
        raise ValueError(f"unsupported dtype {data.dtype}")

    tiled = tile_size is not None
    if tiled:
        if rows_per_strip is not None:
            raise ValueError("tile_size and rows_per_strip are exclusive")
        ts = int(tile_size)
        if ts <= 0 or ts % 16:
            raise ValueError("TIFF tile size must be a positive multiple "
                             "of 16 (TIFF 6.0 §15)")
        blocks = []
        for r0 in range(0, h, ts):
            for c0 in range(0, w, ts):
                blk = np.full((ts, ts), nodata, dtype=data.dtype)
                sub = data[r0:r0 + ts, c0:c0 + ts]
                blk[:sub.shape[0], :sub.shape[1]] = sub
                blocks.append(blk)
        rps = None
    else:
        rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
        blocks = [data[r:r + rps] for r in range(0, h, rps)]
    strips = [_encode_block(blk, compression, predictor) for blk in blocks]
    nstrips = len(strips)
    # blocks start on word boundaries (libtiff-style); readers address
    # them by (offset, byte count), so the pad bytes are never read
    pixels = b"".join(s + b"\x00" * (len(s) % 2) for s in strips)
    # pad past the inline-value window (4 classic, 8 bigtiff) so the
    # value always lives out-of-line (keeps the writer single-path;
    # trailing NULs are legal in TIFF ASCII)
    inline_w = 8 if bigtiff else 4
    nodata_ascii = (str(int(nodata)) + "\x00").ljust(inline_w + 1,
                                                     "\x00").encode()
    # GeoKeyDirectory: version 1.1.0, 3 keys — raster type PixelIsArea
    # plus the CRS. Geographic CRSs (EPSG:4326) use GTModelType=2 and
    # GeographicTypeGeoKey (2048); projected ones GTModelType=1 and
    # ProjectedCSTypeGeoKey (3072) — GeoTIFF 1.1 §B.2/B.3.
    geographic = epsg == 4326
    geokeys = struct.pack(
        "<16H", 1, 1, 0, 3,
        1024, 0, 1, 2 if geographic else 1,   # GTModelTypeGeoKey
        1025, 0, 1, 1,                        # GTRasterTypeGeoKey = PixelIsArea
        2048 if geographic else 3072, 0, 1, epsg)
    pixel_scale = struct.pack("<3d", a, -e, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)

    # layout: header(8) | IFD | out-of-line values | pixel strips
    entries = []  # (tag, type, count, value_or_payload)

    def entry(tag, typ, count, inline=None, payload=None):
        entries.append([tag, typ, count, inline, payload])

    off_tag = _TILE_OFFSETS if tiled else _STRIP_OFFSETS
    cnt_tag = _TILE_BYTE_COUNTS if tiled else _STRIP_BYTE_COUNTS
    # BigTIFF block offsets are LONG8 (file positions may exceed 4 GB);
    # byte counts stay LONG arrays in both layouts
    off_typ = _TYPE_LONG8 if bigtiff else _TYPE_LONG
    off_sz = 8 if bigtiff else 4
    off_fmt = "Q" if bigtiff else "I"

    entry(_IMAGE_WIDTH, _TYPE_LONG, 1, inline=w)
    entry(_IMAGE_LENGTH, _TYPE_LONG, 1, inline=h)
    entry(_BITS_PER_SAMPLE, _TYPE_SHORT, 1, inline=bits)
    entry(_COMPRESSION, _TYPE_SHORT, 1,
          inline=_COMPRESSION_IDS[compression])
    entry(_PHOTOMETRIC, _TYPE_SHORT, 1, inline=1)       # BlackIsZero
    if nstrips == 1:
        entry(off_tag, off_typ, 1, inline=None, payload=b"")  # patched
        entry(cnt_tag, _TYPE_LONG, 1, inline=len(strips[0]))
    else:
        # arrays live out-of-line in the blob; the offsets array is
        # written as zeros here and patched once the pixel base is known
        entry(off_tag, off_typ, nstrips,
              payload=b"\x00" * (off_sz * nstrips))
        if bigtiff and 4 * nstrips <= 8:
            # <= 2 counts fit the 8-byte inline window; out-of-line
            # storage of an inline-sized value is illegal in TIFF
            counts = [len(s) for s in strips] + [0] * (2 - nstrips)
            entry(cnt_tag, _TYPE_LONG, nstrips,
                  inline=counts[0] | (counts[1] << 32))
        else:
            entry(cnt_tag, _TYPE_LONG, nstrips,
                  payload=struct.pack(f"<{nstrips}I",
                                      *(len(s) for s in strips)))
    entry(_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, inline=1)
    if tiled:
        entry(_TILE_WIDTH, _TYPE_LONG, 1, inline=ts)
        entry(_TILE_LENGTH, _TYPE_LONG, 1, inline=ts)
    else:
        entry(_ROWS_PER_STRIP, _TYPE_LONG, 1, inline=rps)
    if predictor == 2:
        entry(_PREDICTOR, _TYPE_SHORT, 1, inline=2)
    entry(_SAMPLE_FORMAT, _TYPE_SHORT, 1, inline=fmt)
    entry(_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, payload=pixel_scale)
    entry(_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, payload=tiepoint)
    entry(_GEO_KEY_DIRECTORY, _TYPE_SHORT, 16, payload=geokeys)
    entry(_GDAL_NODATA, _TYPE_ASCII, len(nodata_ascii), payload=nodata_ascii)

    n = len(entries)
    if bigtiff:                 # 16-byte header, u64 count/entries/next
        ifd_start = 16
        ifd_size = 8 + n * 20 + 8
    else:
        ifd_start = 8
        ifd_size = 2 + n * 12 + 4
    data_start = ifd_start + ifd_size

    # assign out-of-line payload offsets; TIFF requires value offsets on
    # a word boundary, so pad each payload to even length (data_start is
    # even: 8-byte header + 2 + n*12 + 4). Without this the 5-byte
    # GDAL_NODATA ascii blob would make the pixel strip offset odd —
    # tolerated by GDAL but rejected by strict readers.
    blob = bytearray()
    offsets_pos = None  # blob position of the multi-block offsets array
    for ent in entries:
        if ent[4] is None or (ent[0] == off_tag and ent[4] == b""):
            continue
        ent[3] = data_start + len(blob)
        if ent[0] == off_tag:
            offsets_pos = len(blob)
        blob += ent[4]
        if len(blob) % 2:
            blob += b"\x00"
    pixel_offset = data_start + len(blob)
    if offsets_pos is None:  # single block: offset fits inline
        for ent in entries:
            if ent[0] == off_tag:
                ent[3] = pixel_offset
    else:
        offs, pos = [], pixel_offset
        for s in strips:
            offs.append(pos)
            pos += len(s) + (len(s) % 2)  # blocks are word-aligned
        blob[offsets_pos:offsets_pos + off_sz * nstrips] = struct.pack(
            f"<{nstrips}{off_fmt}", *offs)

    out = bytearray()
    if bigtiff:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_start)
        out += struct.pack("<Q", n)
    else:
        out += struct.pack("<2sHI", b"II", 42, ifd_start)
        out += struct.pack("<H", n)
    for tag, typ, count, inline, _payload in sorted(entries):
        if bigtiff:
            if typ == _TYPE_SHORT and count == 1:
                val = struct.pack("<H6x", inline)
            elif typ == _TYPE_LONG and count == 1:
                val = struct.pack("<I4x", inline)
            else:  # LONG8 offsets and the composed inline count pair
                val = struct.pack("<Q", inline)
            out += struct.pack("<HHQ", tag, typ, count) + val
        else:
            if typ == _TYPE_SHORT and count == 1:
                val = struct.pack("<HH", inline, 0)
            else:
                val = struct.pack("<I", inline)
            out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<Q" if bigtiff else "<I", 0)  # next IFD
    out += blob
    out += pixels
    with open(path, "wb") as fh:
        fh.write(out)


def write_tile_geotiff(path: str, canvas: np.ndarray, zoom: int, x: int,
                       y: int, nodata: int) -> None:
    """The reference's commented debug block (render.rs:240-255): dump
    one rendered tile with its mercator-bounds transform."""
    xmin, ymin, xmax, ymax = tm.tile_mercator_bounds(zoom, x, y)
    size = canvas.shape[0]
    xres = (xmax - xmin) / size
    yres = (ymax - ymin) / size
    write_geotiff(path, canvas, (xres, 0.0, xmin, 0.0, -yres, ymax), nodata)


_TYPE_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8,
               _TYPE_ASCII: 1, _TYPE_LONG8: 8}


def _tiff_head(read_at) -> tuple[bool, int]:
    """(bigtiff?, first IFD offset) from the 16-byte header."""
    head = read_at(0, 16)
    if head[:2] != b"II":
        raise ValueError("not a little-endian TIFF")
    (magic,) = struct.unpack_from("<H", head, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from("<I", head, 4)
        return False, ifd_off
    if magic == 43:
        osize, pad = struct.unpack_from("<HH", head, 4)
        if osize != 8 or pad != 0:
            raise ValueError(f"bad BigTIFF header (offset size {osize}, "
                             f"pad {pad})")
        (ifd_off,) = struct.unpack_from("<Q", head, 8)
        return True, ifd_off
    raise ValueError(f"bad TIFF magic {magic} (42/43)")


def _parse_ifd(read_at) -> dict:
    """Parse the first IFD through a ranged-read callable — the same
    code path works over in-memory bytes (read_geotiff) and over file
    seeks (geotiff_ifd), so a huge raster's header costs a few KB of
    I/O, never a full-file read. Handles classic TIFF (magic 42,
    32-bit offsets) AND BigTIFF (magic 43, 64-bit offsets — the layout
    any >4 GB COG must use): 8-byte entry counts, 20-byte entries with
    an 8-byte inline-value window, and LONG8 block offset arrays."""
    big, ifd_off = _tiff_head(read_at)
    tags, _next = _parse_ifd_at(read_at, ifd_off, big)
    return tags


def _parse_ifd_at(read_at, ifd_off: int, big: bool) -> tuple[dict, int]:
    """One IFD at a known offset → (tags, next-IFD offset or 0)."""
    esize, inline_w = (20, 8) if big else (12, 4)
    if big:
        (n,) = struct.unpack("<Q", read_at(ifd_off, 8))
        table = read_at(ifd_off + 8, n * esize)
        (next_off,) = struct.unpack(
            "<Q", read_at(ifd_off + 8 + n * esize, 8))
    else:
        (n,) = struct.unpack("<H", read_at(ifd_off, 2))
        table = read_at(ifd_off + 2, n * esize)
        (next_off,) = struct.unpack(
            "<I", read_at(ifd_off + 2 + n * esize, 4))
    tags = {}
    for i in range(n):
        if big:
            tag, typ, count = struct.unpack_from("<HHQ", table, i * esize)
        else:
            tag, typ, count = struct.unpack_from("<HHI", table, i * esize)
        raw = table[i * esize + esize - inline_w: i * esize + esize]
        if typ not in _TYPE_SIZES:
            raise ValueError(f"unsupported TIFF field type {typ} "
                             f"(tag {tag})")
        size = _TYPE_SIZES[typ] * count
        if size <= inline_w:
            if typ == _TYPE_ASCII:
                tags[tag] = raw[:count]
            else:
                fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I",
                       _TYPE_LONG8: "Q", _TYPE_DOUBLE: "d"}[typ]
                vals = struct.unpack(f"<{count}{fmt}", raw[:size])
                tags[tag] = vals[0] if count == 1 else vals
        else:
            (off,) = struct.unpack("<Q" if big else "<I", raw)
            payload = read_at(off, size)
            if typ == _TYPE_DOUBLE:
                tags[tag] = struct.unpack(f"<{count}d", payload)
            elif typ == _TYPE_SHORT:
                tags[tag] = struct.unpack(f"<{count}H", payload)
            elif typ == _TYPE_LONG:
                tags[tag] = struct.unpack(f"<{count}I", payload)
            elif typ == _TYPE_LONG8:
                tags[tag] = struct.unpack(f"<{count}Q", payload)
            else:
                tags[tag] = payload
    return tags, next_off


def geotiff_ifds(path: str) -> list[dict]:
    """Walk the whole IFD CHAIN header-only (seeks, no pixel I/O): a
    cloud-optimized GeoTIFF is IFD0 (full resolution) followed by one
    reduced-resolution IFD per overview level, each a standalone block
    manifest with its own pixel scale — this is the driver-side probe
    of a COG written by operators/cog_sink.write_cog_distributed."""
    with open(path, "rb") as fh:
        def read_at(off, size):
            fh.seek(off)
            return fh.read(size)

        big, off = _tiff_head(read_at)
        out = []
        while off:
            tags, off = _parse_ifd_at(read_at, off, big)
            out.append(_meta_from_tags(tags))
            if len(out) > 64:
                raise ValueError("IFD chain too long (cycle?)")
        return out


def _meta_from_tags(tags: dict) -> dict:
    """Normalize the raw tag dict: engine affine, EPSG, nodata,
    compression/predictor, and — for BOTH the strip and the tiled
    layout — one unified ``blocks`` manifest. Each block is a dict
    with its ranged-read address (``off``, ``cnt``), its pixel window
    (``row0``/``col0``/``nrows``/``ncols``), and its PADDED encoded
    dims (``pad_h``/``pad_w``: strips pad nothing, tiles pad the
    right/bottom edges to the full tile size)."""
    w, h = tags[_IMAGE_WIDTH], tags[_IMAGE_LENGTH]
    bits = tags[_BITS_PER_SAMPLE]
    comp_id = tags.get(_COMPRESSION, 1)
    if comp_id not in _COMPRESSION_NAMES:
        raise ValueError(f"unsupported TIFF compression id {comp_id} "
                         "(engine reads none/LZW/deflate)")
    compression = _COMPRESSION_NAMES[comp_id]
    predictor = tags.get(_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    def _aslist(v):
        return list(v) if isinstance(v, tuple) else [v]

    tiled = _TILE_OFFSETS in tags
    blocks = []
    if tiled:
        tw, tl = tags[_TILE_WIDTH], tags[_TILE_LENGTH]
        offs = _aslist(tags[_TILE_OFFSETS])
        cnts = _aslist(tags[_TILE_BYTE_COUNTS])
        across = -(-w // tw)
        down = -(-h // tl)
        if len(offs) != across * down or len(cnts) != len(offs):
            raise ValueError(
                f"tile directory has {len(offs)} offsets / {len(cnts)} "
                f"counts, expected {across * down}")
        for td in range(down):
            for ta in range(across):
                row0, col0 = td * tl, ta * tw
                blocks.append({
                    "off": offs[td * across + ta],
                    "cnt": cnts[td * across + ta],
                    "row0": row0, "col0": col0,
                    "nrows": min(tl, h - row0),
                    "ncols": min(tw, w - col0),
                    "pad_h": tl, "pad_w": tw})
    else:
        offs = _aslist(tags[_STRIP_OFFSETS])
        cnts = _aslist(tags[_STRIP_BYTE_COUNTS])
        rps = tags.get(_ROWS_PER_STRIP, h)
        if len(offs) != -(-h // rps) or len(cnts) != len(offs):
            raise ValueError(
                f"strip directory has {len(offs)} offsets / {len(cnts)} "
                f"counts, expected {-(-h // rps)}")
        for s, (off, cnt) in enumerate(zip(offs, cnts)):
            row0 = s * rps
            nrows = min(rps, h - row0)
            blocks.append({"off": off, "cnt": cnt, "row0": row0,
                           "col0": 0, "nrows": nrows, "ncols": w,
                           "pad_h": nrows, "pad_w": w})
    sx, sy, _ = tags[_MODEL_PIXEL_SCALE]
    ti = tags[_MODEL_TIEPOINT]
    geokeys = tags[_GEO_KEY_DIRECTORY]
    keymap = dict(zip(geokeys[4::4], geokeys[7::4]))
    # projected CRS key when the model is projected; geographic key
    # (GeoTIFF 1.1 §B.3, e.g. EPSG:4326) otherwise
    epsg = keymap.get(3072, keymap.get(2048))
    meta = {"width": w, "height": h, "bits": bits,
            "compression": compression, "predictor": predictor,
            "tiled": tiled, "blocks": blocks,
            "transform": (sx, 0.0, ti[3], 0.0, -sy, ti[4]),
            "epsg": epsg,
            "nodata": int(tags[_GDAL_NODATA].rstrip(b"\x00").decode())}
    if not tiled:
        meta["rows_per_strip"] = tags.get(_ROWS_PER_STRIP, h)
        meta["strip_offsets"] = offs
        meta["strip_byte_counts"] = cnts
    else:
        meta["tile_width"], meta["tile_length"] = tw, tl
    return meta


def geotiff_ifd(path: str) -> dict:
    """Header-only probe of a GeoTIFF file: tags + strip manifest via
    seeks (no pixel I/O). This is the driver-side half of the
    distributed source (operators/geotiff_source.py) — at 100 TB the
    driver touches only the IFD; executors ranged-read their strips."""
    with open(path, "rb") as fh:
        def read_at(off, size):
            fh.seek(off)
            return fh.read(size)

        return _meta_from_tags(_parse_ifd(read_at))


def read_geotiff(data: bytes) -> dict:
    """Full-file reader for round-trip tests: tags + pixels + transform.
    Handles every layout the writer emits — single/multi strip, tiled,
    compressed, predictor — through the same block manifest the
    distributed source plans from."""
    meta = _meta_from_tags(_parse_ifd(lambda off, size: data[off: off + size]))
    w, h = meta["width"], meta["height"]
    dt = np.uint8 if meta["bits"] == 8 else np.uint32
    pixels = np.empty((h, w), dtype=dt)
    for b in meta["blocks"]:
        pixels[b["row0"]:b["row0"] + b["nrows"],
               b["col0"]:b["col0"] + b["ncols"]] = _decode_block(
            data[b["off"]: b["off"] + b["cnt"]], meta["compression"],
            meta["predictor"], dt, b["pad_h"], b["pad_w"],
            b["nrows"], b["ncols"])
    return {"width": w, "height": h, "pixels": pixels,
            "transform": meta["transform"], "epsg": meta["epsg"],
            "nodata": meta["nodata"]}


# ---------------------------------------------------------------------------
# COG directory builder — the driver-side half of the distributed COG
# sink (operators/cog_sink.py). Unlike write_geotiff (one in-memory
# IFD + its pixels), this emits ONLY the header + chained IFDs for a
# multi-level tiled file whose block DATA the caller lays out itself
# (executor-written part files streamed into place) — the same
# header-is-tiny/data-is-streamed split as the PMTiles sink.
# ---------------------------------------------------------------------------


def _pack_tag_vals(typ: int, vals) -> bytes:
    if typ == _TYPE_ASCII:
        return bytes(vals)
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I",
           _TYPE_LONG8: "Q", _TYPE_DOUBLE: "d"}[typ]
    return struct.pack(f"<{len(vals)}{fmt}", *vals)


def cog_directory(levels: list[dict], transform: tuple, nodata: int,
                  epsg: int = 3857, compression: str = "deflate",
                  predictor: int = 2, bigtiff: bool = False,
                  bits: int = 8) -> bytes:
    """Header + chained IFDs for a tiled multi-level GeoTIFF.

    ``levels``: base level first, then overviews; each a dict with
    ``w``/``h`` (pixel dims), ``ts`` (tile size), ``counts`` and
    ``offsets`` (row-major per-block byte counts and ABSOLUTE file
    offsets — aliases/shared blocks simply repeat an offset, the TIFF
    reading model addresses blocks by (offset, count) so sharing is
    legal and is how the sink dedups nodata tiles). ``transform`` is
    the BASE level's engine affine; overview IFDs carry the 2^L-scaled
    pixel scale with the same tiepoint, so every IFD parses as a
    standalone georeferenced dataset (geotiff_ifds). The returned
    bytes are the complete file prefix: block data must start at
    ``len(result)`` — compute it first with offsets=[0,...] (the size
    does not depend on offset VALUES), assign real offsets, rebuild.
    """
    if compression not in _COMPRESSION_IDS:
        raise ValueError(f"unsupported compression {compression!r}")
    a, b, c, d, e, f = transform
    if b or d:
        raise ValueError("rotated transforms are not supported")
    inline_w = 8 if bigtiff else 4
    esize = 20 if bigtiff else 12
    off_typ = _TYPE_LONG8 if bigtiff else _TYPE_LONG
    nodata_ascii = (str(int(nodata)) + "\x00").encode()
    geokeys = (1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, epsg)

    # build per-level entry lists (tag, typ, values)
    per_level = []
    for lvl_i, lv in enumerate(levels):
        w, h, ts = int(lv["w"]), int(lv["h"]), int(lv["ts"])
        counts, offsets = list(lv["counts"]), list(lv["offsets"])
        nb = (-(-w // ts)) * (-(-h // ts))
        if len(counts) != nb or len(offsets) != nb:
            raise ValueError(f"level {lvl_i}: {len(offsets)} offsets / "
                             f"{len(counts)} counts, expected {nb}")
        if ts <= 0 or ts % 16:
            raise ValueError("TIFF tile size must be a positive multiple "
                             "of 16")
        scale = 1 << lvl_i
        ents = [
            (254, _TYPE_LONG, [0 if lvl_i == 0 else 1]),  # NewSubfileType
            (_IMAGE_WIDTH, _TYPE_LONG, [w]),
            (_IMAGE_LENGTH, _TYPE_LONG, [h]),
            (_BITS_PER_SAMPLE, _TYPE_SHORT, [bits]),
            (_COMPRESSION, _TYPE_SHORT, [_COMPRESSION_IDS[compression]]),
            (_PHOTOMETRIC, _TYPE_SHORT, [1]),
            (_SAMPLES_PER_PIXEL, _TYPE_SHORT, [1]),
            (_TILE_WIDTH, _TYPE_LONG, [ts]),
            (_TILE_LENGTH, _TYPE_LONG, [ts]),
            (_TILE_OFFSETS, off_typ, offsets),
            (_TILE_BYTE_COUNTS, _TYPE_LONG, counts),
            (_PREDICTOR, _TYPE_SHORT, [predictor]),
            (_SAMPLE_FORMAT, _TYPE_SHORT, [1]),
            (_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, [a * scale, -e * scale, 0.0]),
            (_MODEL_TIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, c, f, 0.0]),
            (_GEO_KEY_DIRECTORY, _TYPE_SHORT, list(geokeys)),
            (_GDAL_NODATA, _TYPE_ASCII, nodata_ascii),
        ]
        per_level.append(sorted(ents))

    # lay out: header | (IFD table + out-of-line blob) per level
    head_size = 16 if bigtiff else 8
    pos = head_size
    out = bytearray(b"\x00" * head_size)
    if bigtiff:
        struct.pack_into("<2sHHHQ", out, 0, b"II", 43, 8, 0, pos)
    else:
        struct.pack_into("<2sHI", out, 0, b"II", 42, pos)
    for lvl_i, ents in enumerate(per_level):
        n = len(ents)
        table_size = (8 + n * esize + 8) if bigtiff else (2 + n * esize + 4)
        blob_start = pos + table_size
        blob = bytearray()
        table = bytearray()
        if bigtiff:
            table += struct.pack("<Q", n)
        else:
            table += struct.pack("<H", n)
        for tag, typ, vals in ents:
            packed = _pack_tag_vals(typ, vals)
            count = len(vals)
            if len(packed) <= inline_w:
                raw = packed.ljust(inline_w, b"\x00")
            else:
                voff = blob_start + len(blob)
                blob += packed
                if len(blob) % 2:
                    blob += b"\x00"
                raw = struct.pack("<Q" if bigtiff else "<I",
                                  voff).ljust(inline_w, b"\x00")
            if bigtiff:
                table += struct.pack("<HHQ", tag, typ, count) + raw
            else:
                table += struct.pack("<HHI", tag, typ, count) + raw
        next_pos = blob_start + len(blob)
        if len(per_level) - 1 == lvl_i:
            next_ifd = 0
        else:
            next_ifd = next_pos
        table += struct.pack("<Q" if bigtiff else "<I", next_ifd)
        out += table + blob
        pos = next_pos
    if len(out) % 2:
        out += b"\x00"
    return bytes(out)
