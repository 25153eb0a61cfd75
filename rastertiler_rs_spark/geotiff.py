"""Debug GeoTIFF writer (S11): single-band georeferenced raster dump.

The reference's debug-only ``write_raster`` (/root/reference/src/
dataset.rs:199-230, call sites commented out at render.rs:240-255)
writes a tile's raw value buffer as a GeoTIFF via GDAL for inspection.
This is the GDAL-free analog: a minimal, valid, uncompressed
little-endian GeoTIFF with the same semantic payload — pixel matrix,
affine geotransform (ModelPixelScale + ModelTiepoint), EPSG:3857
spatial ref (GeoKeyDirectory), and nodata (GDAL_NODATA ascii tag).
Readable by GDAL/QGIS/rasterio; no external deps.
"""

from __future__ import annotations

import struct

import numpy as np

from . import tilemath as tm

# TIFF tag ids
_IMAGE_WIDTH, _IMAGE_LENGTH = 256, 257
_BITS_PER_SAMPLE, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_BYTE_COUNTS, _SAMPLE_FORMAT = 279, 339
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT, _GEO_KEY_DIRECTORY = 33550, 33922, 34735
_GDAL_NODATA = 42113

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE, _TYPE_ASCII = 3, 4, 12, 2


def write_geotiff(path: str, data: np.ndarray, transform: tuple,
                  nodata: int, epsg: int = 3857,
                  rows_per_strip: int | None = None) -> None:
    """Write a single-band uint8/uint32 array as a valid GeoTIFF.

    ``transform`` is the engine affine (a, b, c, d, e, f): x = a*col + c,
    y = e*row + f (b = d = 0 — axis-aligned, like every tile transform).

    ``rows_per_strip=None`` keeps the original debug layout (one strip).
    An explicit value writes a standard multi-strip file — independently
    addressable row bands, which is what makes a large GeoTIFF a
    DISTRIBUTED source: executors can ranged-read single strips without
    touching the rest of the file (operators/geotiff_source.py).
    """
    if data.ndim != 2:
        raise ValueError("write_geotiff expects a 2-D single-band array")
    a, b, c, d, e, f = transform
    if b or d:
        raise ValueError("rotated transforms are not supported (debug writer)")
    h, w = data.shape
    if data.dtype == np.uint8:
        bits, fmt = 8, 1
    elif data.dtype == np.uint32:
        bits, fmt = 32, 1
    else:
        raise ValueError(f"unsupported dtype {data.dtype}")

    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    strips = [np.ascontiguousarray(data[r:r + rps]).tobytes()
              for r in range(0, h, rps)]
    nstrips = len(strips)
    pixels = b"".join(strips)
    # pad to > 4 bytes so the value always lives out-of-line (keeps the
    # writer single-path; trailing NULs are legal in TIFF ASCII)
    nodata_ascii = (str(int(nodata)) + "\x00").ljust(5, "\x00").encode()
    # GeoKeyDirectory: version 1.1.0, 3 keys — model type projected,
    # raster type PixelIsArea, projected CRS = epsg
    geokeys = struct.pack("<16H", 1, 1, 0, 3,
                          1024, 0, 1, 1,       # GTModelTypeGeoKey = Projected
                          1025, 0, 1, 1,       # GTRasterTypeGeoKey = PixelIsArea
                          3072, 0, 1, epsg)    # ProjectedCSTypeGeoKey
    pixel_scale = struct.pack("<3d", a, -e, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)

    # layout: header(8) | IFD | out-of-line values | pixel strips
    entries = []  # (tag, type, count, value_or_payload)

    def entry(tag, typ, count, inline=None, payload=None):
        entries.append([tag, typ, count, inline, payload])

    entry(_IMAGE_WIDTH, _TYPE_LONG, 1, inline=w)
    entry(_IMAGE_LENGTH, _TYPE_LONG, 1, inline=h)
    entry(_BITS_PER_SAMPLE, _TYPE_SHORT, 1, inline=bits)
    entry(_COMPRESSION, _TYPE_SHORT, 1, inline=1)       # none
    entry(_PHOTOMETRIC, _TYPE_SHORT, 1, inline=1)       # BlackIsZero
    if nstrips == 1:
        entry(_STRIP_OFFSETS, _TYPE_LONG, 1, inline=None, payload=b"")  # patched
        entry(_STRIP_BYTE_COUNTS, _TYPE_LONG, 1, inline=len(pixels))
    else:
        # arrays live out-of-line in the blob; the offsets array is
        # written as zeros here and patched once the pixel base is known
        entry(_STRIP_OFFSETS, _TYPE_LONG, nstrips,
              payload=b"\x00" * (4 * nstrips))
        entry(_STRIP_BYTE_COUNTS, _TYPE_LONG, nstrips,
              payload=struct.pack(f"<{nstrips}I", *(len(s) for s in strips)))
    entry(_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, inline=1)
    entry(_ROWS_PER_STRIP, _TYPE_LONG, 1, inline=rps)
    entry(_SAMPLE_FORMAT, _TYPE_SHORT, 1, inline=fmt)
    entry(_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, payload=pixel_scale)
    entry(_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, payload=tiepoint)
    entry(_GEO_KEY_DIRECTORY, _TYPE_SHORT, 16, payload=geokeys)
    entry(_GDAL_NODATA, _TYPE_ASCII, len(nodata_ascii), payload=nodata_ascii)

    n = len(entries)
    ifd_start = 8
    ifd_size = 2 + n * 12 + 4
    data_start = ifd_start + ifd_size

    # assign out-of-line payload offsets; TIFF requires value offsets on
    # a word boundary, so pad each payload to even length (data_start is
    # even: 8-byte header + 2 + n*12 + 4). Without this the 5-byte
    # GDAL_NODATA ascii blob would make the pixel strip offset odd —
    # tolerated by GDAL but rejected by strict readers.
    blob = bytearray()
    offsets_pos = None  # blob position of the multi-strip offsets array
    for ent in entries:
        if ent[4] is None or (ent[0] == _STRIP_OFFSETS and ent[4] == b""):
            continue
        ent[3] = data_start + len(blob)
        if ent[0] == _STRIP_OFFSETS:
            offsets_pos = len(blob)
        blob += ent[4]
        if len(blob) % 2:
            blob += b"\x00"
    pixel_offset = data_start + len(blob)
    if offsets_pos is None:  # single strip: offset fits inline
        for ent in entries:
            if ent[0] == _STRIP_OFFSETS:
                ent[3] = pixel_offset
    else:
        offs, pos = [], pixel_offset
        for s in strips:
            offs.append(pos)
            pos += len(s)
        blob[offsets_pos:offsets_pos + 4 * nstrips] = struct.pack(
            f"<{nstrips}I", *offs)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_start)
    out += struct.pack("<H", n)
    for tag, typ, count, inline, _payload in sorted(entries):
        if typ == _TYPE_SHORT and count == 1:
            val = struct.pack("<HH", inline, 0)
        else:
            val = struct.pack("<I", inline)
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)  # next IFD
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


def _parse_ifd(read_at) -> dict:
    """Parse the first IFD through a ranged-read callable — the same
    code path works over in-memory bytes (read_geotiff) and over file
    seeks (geotiff_ifd), so a huge raster's header costs a few KB of
    I/O, never a full-file read."""
    head = read_at(0, 8)
    if head[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", head, 4)
    (n,) = struct.unpack("<H", read_at(ifd_off, 2))
    table = read_at(ifd_off + 2, n * 12)
    tags = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", table, i * 12)
        raw = table[i * 12 + 8: i * 12 + 12]
        size = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8, _TYPE_ASCII: 1}[typ] * count
        if size <= 4:
            if typ == _TYPE_SHORT:
                tags[tag] = struct.unpack("<H", raw[:2])[0]
            else:
                tags[tag] = struct.unpack("<I", raw)[0]
        else:
            (off,) = struct.unpack("<I", raw)
            payload = read_at(off, size)
            if typ == _TYPE_DOUBLE:
                tags[tag] = struct.unpack(f"<{count}d", payload)
            elif typ == _TYPE_SHORT:
                tags[tag] = struct.unpack(f"<{count}H", payload)
            elif typ == _TYPE_LONG:
                tags[tag] = struct.unpack(f"<{count}I", payload)
            else:
                tags[tag] = payload
    return tags


def _meta_from_tags(tags: dict) -> dict:
    """Normalize the raw tag dict: strip arrays as lists, engine affine,
    EPSG, nodata — everything a reader needs except the pixels."""
    w, h = tags[_IMAGE_WIDTH], tags[_IMAGE_LENGTH]
    bits = tags[_BITS_PER_SAMPLE]
    if tags.get(_COMPRESSION, 1) != 1:
        raise ValueError("compressed GeoTIFF is not supported (engine "
                         "writes/reads uncompressed strips)")
    offs = tags[_STRIP_OFFSETS]
    cnts = tags[_STRIP_BYTE_COUNTS]
    offs = list(offs) if isinstance(offs, tuple) else [offs]
    cnts = list(cnts) if isinstance(cnts, tuple) else [cnts]
    sx, sy, _ = tags[_MODEL_PIXEL_SCALE]
    ti = tags[_MODEL_TIEPOINT]
    geokeys = tags[_GEO_KEY_DIRECTORY]
    epsg = dict(zip(geokeys[4::4], geokeys[7::4])).get(3072)
    return {"width": w, "height": h, "bits": bits,
            "rows_per_strip": tags.get(_ROWS_PER_STRIP, h),
            "strip_offsets": offs, "strip_byte_counts": cnts,
            "transform": (sx, 0.0, ti[3], 0.0, -sy, ti[4]),
            "epsg": epsg,
            "nodata": int(tags[_GDAL_NODATA].rstrip(b"\x00").decode())}


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
    """Minimal reader for round-trip tests: tags + pixels + transform.
    Handles both the single-strip debug layout and multi-strip files."""
    meta = _meta_from_tags(_parse_ifd(lambda off, size: data[off: off + size]))
    w, h = meta["width"], meta["height"]
    dt = np.uint8 if meta["bits"] == 8 else np.uint32
    buf = b"".join(data[o: o + c] for o, c in
                   zip(meta["strip_offsets"], meta["strip_byte_counts"]))
    pixels = np.frombuffer(buf, dtype=dt).reshape(h, w)
    return {"width": w, "height": h, "pixels": pixels,
            "transform": meta["transform"], "epsg": meta["epsg"],
            "nodata": meta["nodata"]}
