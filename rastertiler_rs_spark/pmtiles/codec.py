"""PMTiles v3 — single-file, cloud-optimized tile archive codec,
from the public Protomaps PMTiles v3 specification
(github.com/protomaps/PMTiles, spec/v3): Hilbert-curve tile IDs,
varint-encoded clustered directories with run-length + offset
elision, a 127-byte fixed header, gzip internal compression, and a
root/leaf directory split so a reader resolves any tile in ≤ 2
directory fetches. This is the modern successor of the MBTiles
archive the reference writes (mbtiles.rs) — same tile payloads, but
range-request friendly: the natural format for serving a rendered
tileset straight from object storage, which is exactly where a
100 TB pipeline's output lives.

The engine is both writer and reader, so every layout detail is
self-verifiable byte-for-byte (the repo's standing codec contract:
mux → parse round-trips + independent-twin value checks; the Hilbert
ID itself is value-verified against a DuckDB recursive-CTE twin
under the driver gate).

Tile ID: ids of all zooms < z come first (base(z) = (4^z - 1) / 3),
then the level-z tiles in Hilbert order with the spec's orientation
— at z1 the order is (0,0), (0,1), (1,1), (1,0)."""

from __future__ import annotations

import gzip
import json
import struct
from dataclasses import dataclass

import numpy as np

HEADER_SIZE = 127
MAGIC = b"PMTiles"
SPEC_VERSION = 3

# header enums (spec §3)
COMPRESSION_UNKNOWN, COMPRESSION_NONE, COMPRESSION_GZIP = 0, 1, 2
TILETYPE_UNKNOWN, TILETYPE_MVT, TILETYPE_PNG, TILETYPE_JPEG, \
    TILETYPE_WEBP, TILETYPE_AVIF = 0, 1, 2, 3, 4, 5

MAX_ZOOM = 26  # 4^27/3 still fits int64


# ---------------------------------------------------------------------------
# Hilbert tile IDs
# ---------------------------------------------------------------------------

def _base(z: int) -> int:
    """Count of all tiles at zooms < z: sum 4^i = (4^z - 1) / 3."""
    return ((1 << (2 * z)) - 1) // 3


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """Hilbert d of (x, y) on the 2^z grid, offset by all lower zooms.

    xy2d walks bits high→low; the rotation complements against the
    FULL grid size (n-1-x), which is a clean bit-complement — using
    s-1-x here would borrow into already-consumed high bits."""
    if not 0 <= z <= MAX_ZOOM:
        raise ValueError(f"zoom {z} out of range 0..{MAX_ZOOM}")
    n = 1 << z
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError(f"tile ({x},{y}) outside zoom {z}")
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return _base(z) + d


def tileid_to_zxy(tileid: int) -> tuple[int, int, int]:
    """Inverse: zoom from the cumulative bases, then d2xy builds
    (x, y) low bit → high bit (here s-1-x IS correct: x < s)."""
    if tileid < 0:
        raise ValueError("negative tile id")
    z = 0
    while z <= MAX_ZOOM and tileid >= _base(z + 1):
        z += 1
    if z > MAX_ZOOM:
        raise ValueError(f"tile id {tileid} beyond zoom {MAX_ZOOM}")
    t = tileid - _base(z)
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t >>= 2
        s <<= 1
    return z, x, y


def zxy_to_tileid_np(z: np.ndarray, x: np.ndarray, y: np.ndarray,
                     max_zoom: int = 20) -> np.ndarray:
    """Vectorized zxy_to_tileid over int64 arrays (one pass per bit
    level, all rows at once) — the executor-side form."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    if z.size and (z.min() < 0 or z.max() > max_zoom):
        raise ValueError(f"zoom outside 0..{max_zoom}")
    n = np.int64(1) << z
    if ((x < 0) | (x >= n) | (y < 0) | (y >= n)).any():
        raise ValueError("tile outside its zoom grid")
    d = np.zeros_like(x)
    for j in range(max_zoom - 1, -1, -1):
        s = np.int64(1 << j)
        act = z > j  # steps with s >= 2^z must not run (rotation!)
        rx = ((x & s) > 0) & act
        ry = ((y & s) > 0) & act
        d += np.where(act, s * s * ((3 * rx.astype(np.int64))
                                    ^ ry.astype(np.int64)), 0)
        flip = rx & ~ry
        x2 = np.where(flip, n - 1 - x, x)
        y2 = np.where(flip, n - 1 - y, y)
        swap = ~ry & act
        x, y = (np.where(swap, y2, x2), np.where(swap, x2, y2))
    return ((n * n - 1) // 3 + d).astype(np.int64)


def tileid_col(zoom, x, y):
    """zxy→tileid as a pure-JVM Spark column expression: the bit loop
    as F.aggregate over sequence(z-1 .. 0) with a (x, y, d) struct
    accumulator. The lambda body references the state several times,
    so a naive unrolled withColumn fold would double the expression
    tree per level (2^z nodes — the analyzer hangs); the higher-order
    aggregate keeps the plan linear in size and still codegen/JVM."""
    from pyspark.sql import functions as F

    zoom, x, y = F.col(zoom) if isinstance(zoom, str) else zoom, \
        F.col(x) if isinstance(x, str) else x, \
        F.col(y) if isinstance(y, str) else y
    z = zoom.cast("int")
    # pow(2, z) is exact in a double for any zoom here; shiftleft's
    # python wrapper only accepts a literal shift
    n = F.pow(F.lit(2.0), z.cast("double")).cast("long")
    lvl = F.when(z > 0, F.sequence(z - F.lit(1), F.lit(0), F.lit(-1))) \
           .otherwise(F.array().cast("array<int>"))
    state0 = F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"),
                      F.lit(0).cast("long").alias("d"))

    def step(acc, j):
        s = F.pow(F.lit(2.0), j.cast("double")).cast("long")
        rx = acc["x"].bitwiseAND(s) > 0
        ry = acc["y"].bitwiseAND(s) > 0
        rxn = F.when(rx, F.lit(3).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        ryn = F.when(ry, F.lit(1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        d = acc["d"] + s * s * rxn.bitwiseXOR(ryn)
        flip = rx & ~ry
        x2 = F.when(flip, n - 1 - acc["x"]).otherwise(acc["x"])
        y2 = F.when(flip, n - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(~ry, y2).otherwise(x2)
        ny = F.when(~ry, x2).otherwise(y2)
        return F.struct(nx.alias("x"), ny.alias("y"), d.alias("d"))

    # (4^z - 1)/3 is an exact integer and < 2^53 through z=26, so the
    # double division is exact; cast back to long
    return F.aggregate(
        lvl, state0, step,
        lambda acc: ((n * n - F.lit(1)) / F.lit(3)).cast("long") + acc["d"])


# ---------------------------------------------------------------------------
# varints + directory serialization (spec §4)
# ---------------------------------------------------------------------------

def write_varint(buf: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("varints are unsigned")
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


@dataclass
class Entry:
    tile_id: int
    offset: int
    length: int
    run_length: int  # >= 1: tile entry spanning [tile_id, +run); 0: leaf dir


def serialize_directory(entries: list[Entry]) -> bytes:
    """Column-major varints: n, tile_id deltas, run_lengths, lengths,
    then offsets with the elision rule (0 == previous offset+length,
    else offset+1)."""
    buf = bytearray()
    write_varint(buf, len(entries))
    last = 0
    for e in entries:
        if e.tile_id < last:
            raise ValueError("directory entries must be sorted by tile_id")
        write_varint(buf, e.tile_id - last)
        last = e.tile_id
    for e in entries:
        write_varint(buf, e.run_length)
    for e in entries:
        write_varint(buf, e.length)
    for i, e in enumerate(entries):
        if i > 0 and e.offset == entries[i - 1].offset + entries[i - 1].length:
            write_varint(buf, 0)
        else:
            write_varint(buf, e.offset + 1)
    return bytes(buf)


def deserialize_directory(data: bytes) -> list[Entry]:
    n, pos = read_varint(data, 0)
    ids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        delta, pos = read_varint(data, pos)
        last += delta
        ids.append(last)
    for _ in range(n):
        v, pos = read_varint(data, pos)
        runs.append(v)
    for _ in range(n):
        v, pos = read_varint(data, pos)
        lens.append(v)
    for i in range(n):
        v, pos = read_varint(data, pos)
        if v == 0:
            if i == 0:
                raise ValueError("first directory offset cannot be elided")
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    if pos != len(data):
        raise ValueError("trailing bytes after directory")
    return [Entry(i, o, l, r) for i, o, l, r in zip(ids, offs, lens, runs)]


def _gzip(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)  # mtime=0: deterministic output


# ---------------------------------------------------------------------------
# header (spec §3: fixed 127-byte little-endian layout)
# ---------------------------------------------------------------------------

_HEADER_FMT = "<7sB" + "Q" * 11 + "BBBBBB" + "iiii" + "B" + "ii"


def pack_header(**f) -> bytes:
    h = struct.pack(
        _HEADER_FMT, MAGIC, SPEC_VERSION,
        f["root_offset"], f["root_length"],
        f["metadata_offset"], f["metadata_length"],
        f["leaf_offset"], f["leaf_length"],
        f["data_offset"], f["data_length"],
        f["n_addressed"], f["n_entries"], f["n_contents"],
        1 if f.get("clustered", True) else 0,
        f.get("internal_compression", COMPRESSION_GZIP),
        f.get("tile_compression", COMPRESSION_NONE),
        f.get("tile_type", TILETYPE_PNG),
        f["min_zoom"], f["max_zoom"],
        int(f.get("min_lon", -180.0) * 1e7), int(f.get("min_lat", -85.051129) * 1e7),
        int(f.get("max_lon", 180.0) * 1e7), int(f.get("max_lat", 85.051129) * 1e7),
        f.get("center_zoom", f["min_zoom"]),
        int(f.get("center_lon", 0.0) * 1e7), int(f.get("center_lat", 0.0) * 1e7))
    assert len(h) == HEADER_SIZE, len(h)
    return h


def parse_header(data: bytes) -> dict:
    if len(data) < HEADER_SIZE:
        raise ValueError("not a PMTiles archive: short header")
    vals = struct.unpack(_HEADER_FMT, data[:HEADER_SIZE])
    if vals[0] != MAGIC:
        raise ValueError("not a PMTiles archive: bad magic")
    if vals[1] != SPEC_VERSION:
        raise ValueError(f"unsupported PMTiles version {vals[1]}")
    keys = ["root_offset", "root_length", "metadata_offset",
            "metadata_length", "leaf_offset", "leaf_length",
            "data_offset", "data_length", "n_addressed", "n_entries",
            "n_contents", "clustered", "internal_compression",
            "tile_compression", "tile_type", "min_zoom", "max_zoom"]
    h = dict(zip(keys, vals[2:19]))
    h["min_lon"], h["min_lat"], h["max_lon"], h["max_lat"] = \
        (v / 1e7 for v in vals[19:23])
    h["center_zoom"] = vals[23]
    h["center_lon"], h["center_lat"] = vals[24] / 1e7, vals[25] / 1e7
    return h


# ---------------------------------------------------------------------------
# archive build + read
# ---------------------------------------------------------------------------

def build_directories(entries: list[Entry],
                      leaf_size: int = 16384) -> tuple[bytes, bytes, int]:
    """entries → (gzipped root, concatenated gzipped leaves, depth).

    Fits the spec's ≤2-fetch contract: when the root would exceed
    leaf_size entries, entries chunk into leaves and the root holds
    one run_length-0 pointer per leaf."""
    if len(entries) <= leaf_size:
        return _gzip(serialize_directory(entries)), b"", 1
    leaves = bytearray()
    root: list[Entry] = []
    for i in range(0, len(entries), leaf_size):
        chunk = entries[i:i + leaf_size]
        blob = _gzip(serialize_directory(chunk))
        root.append(Entry(chunk[0].tile_id, len(leaves), len(blob), 0))
        leaves += blob
    return _gzip(serialize_directory(root)), bytes(leaves), 2


def build_pmtiles(tiles, metadata: dict | None = None,
                  tile_type: int = TILETYPE_PNG, leaf_size: int = 16384,
                  bounds: tuple[float, float, float, float] | None = None,
                  center: tuple[int, float, float] | None = None) -> bytes:
    """(tile_id, bytes) iterable, ASCENDING tile_id → archive bytes.

    Content-addresses the payloads (identical blobs stored once) and
    coalesces consecutive ids with identical content into run-length
    entries — the spec's two dedup axes. Duplicate tile_ids are an
    error (the input is a tile SET)."""
    entries: list[Entry] = []
    data = bytearray()
    by_hash: dict[bytes, tuple[int, int]] = {}
    n_addressed = 0
    minz, maxz = 99, -1
    last_id = -1
    import hashlib
    for tid, blob in tiles:
        if tid <= last_id:
            raise ValueError(f"tile ids must be strictly ascending at {tid}")
        last_id = tid
        n_addressed += 1
        z = tileid_to_zxy(tid)[0]
        minz, maxz = min(minz, z), max(maxz, z)
        key = hashlib.md5(blob).digest()
        loc = by_hash.get(key)
        if loc is None:
            loc = (len(data), len(blob))
            data += blob
            by_hash[key] = loc
        e = entries[-1] if entries else None
        if (e is not None and e.offset == loc[0] and e.length == loc[1]
                and e.tile_id + e.run_length == tid):
            e.run_length += 1
        else:
            entries.append(Entry(tid, loc[0], loc[1], 1))
    if not entries:
        raise ValueError("cannot build an empty PMTiles archive")
    root, leaves, _ = build_directories(entries, leaf_size)
    meta = _gzip(json.dumps(metadata or {}, sort_keys=True).encode())
    pos = HEADER_SIZE
    root_offset, pos = pos, pos + len(root)
    metadata_offset, pos = pos, pos + len(meta)
    leaf_offset, pos = pos, pos + len(leaves)
    data_offset = pos
    bounds = bounds or (-180.0, -85.051129, 180.0, 85.051129)
    center = center or (minz, (bounds[0] + bounds[2]) / 2,
                        (bounds[1] + bounds[3]) / 2)
    header = pack_header(
        root_offset=root_offset, root_length=len(root),
        metadata_offset=metadata_offset, metadata_length=len(meta),
        leaf_offset=leaf_offset, leaf_length=len(leaves),
        data_offset=data_offset, data_length=len(data),
        n_addressed=n_addressed, n_entries=len(entries),
        n_contents=len(by_hash), clustered=True, tile_type=tile_type,
        min_zoom=minz, max_zoom=maxz,
        min_lon=bounds[0], min_lat=bounds[1],
        max_lon=bounds[2], max_lat=bounds[3],
        center_zoom=center[0], center_lon=center[1], center_lat=center[2])
    return header + root + meta + leaves + bytes(data)


class PMTilesReader:
    """Random-access + full-iteration reader over archive bytes (the
    self-verification half of the writer; a remote reader would issue
    the same (offset, length) reads as range requests)."""

    def __init__(self, data: bytes):
        self.data = data
        self.header = parse_header(data)
        h = self.header
        if h["internal_compression"] != COMPRESSION_GZIP:
            raise ValueError("only gzip internal compression supported")
        self.root = deserialize_directory(gzip.decompress(
            data[h["root_offset"]:h["root_offset"] + h["root_length"]]))

    def metadata(self) -> dict:
        h = self.header
        raw = self.data[h["metadata_offset"]:
                        h["metadata_offset"] + h["metadata_length"]]
        return json.loads(gzip.decompress(raw))

    def _leaf(self, e: Entry) -> list[Entry]:
        h = self.header
        off = h["leaf_offset"] + e.offset
        return deserialize_directory(
            gzip.decompress(self.data[off:off + e.length]))

    def _find(self, entries: list[Entry], tid: int) -> Entry | None:
        lo, hi = 0, len(entries) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            if entries[mid].tile_id <= tid:
                best = entries[mid]
                lo = mid + 1
            else:
                hi = mid - 1
        return best

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        tid = zxy_to_tileid(z, x, y)
        e = self._find(self.root, tid)
        if e is not None and e.run_length == 0:  # descend into leaf
            e = self._find(self._leaf(e), tid)
        if e is None or e.run_length == 0:
            return None
        if tid >= e.tile_id + e.run_length:
            return None
        h = self.header
        off = h["data_offset"] + e.offset
        return self.data[off:off + e.length]

    def tile_entries(self):
        """All run_length>=1 entries, leaf dirs expanded, sorted."""
        for e in self.root:
            if e.run_length == 0:
                yield from self._leaf(e)
            else:
                yield e

    def __iter__(self):
        """Yield (z, x, y, bytes) for every ADDRESSED tile (runs
        expanded)."""
        h = self.header
        for e in self.tile_entries():
            blob = self.data[h["data_offset"] + e.offset:
                             h["data_offset"] + e.offset + e.length]
            for tid in range(e.tile_id, e.tile_id + e.run_length):
                z, x, y = tileid_to_zxy(tid)
                yield z, x, y, blob
