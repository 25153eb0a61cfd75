"""From-spec Mapbox Vector Tile (MVT 2.1) codec — stdlib only.

Like png/, jpeg/, webp/, and media/, this implements the PUBLIC spec
directly (the protobuf wire format plus the vector-tile-spec 2.1
schema and geometry command encoding); the engine has no protobuf
dependency. The raster half of the tiling engine emits PNG tiles;
this is the vector half's sink format.

Wire format facts:
- protobuf field = tag varint ((field_no << 3) | wire_type) then
  payload; wire types used: 0 = varint, 2 = length-delimited, 5 =
  32-bit (float values).
- Tile: repeated Layer (field 3). Layer: name (1, string), features
  (2, message), keys (3, string), values (4, message Value), extent
  (5, varint), version (15, varint, = 2). Feature: id (1, varint),
  tags (2, PACKED varints — alternating key/value table indices),
  type (3, enum 1=POINT 2=LINESTRING 3=POLYGON), geometry (4, PACKED
  uint32 command stream). Value: exactly one of string_value (1),
  float_value (2), double_value (3), int_value (4), uint_value (5),
  sint_value (6), bool_value (7).
- Geometry commands: integer (id & 0x7) | (count << 3); MoveTo id=1
  and LineTo id=2 carry 2*count zigzag-encoded coordinate DELTAS,
  ClosePath id=7 carries none. The cursor persists across commands
  and features within one geometry only per spec: across commands of
  one feature's geometry (reset per feature).

Feature shape accepted here: (feature_id, geom_type, rings, attrs)
where rings is a list of coordinate lists [(x, y), ...] in tile-local
integer coordinates (POINT: one ring of points, each emitted in one
MoveTo batch per spec's multipoint rule; LINESTRING: one MoveTo +
LineTo run per ring; POLYGON: MoveTo + LineTo + ClosePath per ring).
"""

from __future__ import annotations

import struct

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def _varint(v: int) -> bytes:
    if v < 0:
        raise ValueError("varint cannot encode negatives; zigzag first")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(int(v))
    if isinstance(v, int):
        return _tag(6, 0) + _varint(_zigzag(v))     # sint64: sign-safe
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        return _ld(1, v.encode("utf-8"))
    raise ValueError(f"unsupported attribute value type {type(v)!r}")


def _encode_geometry(geom_type: int, rings) -> bytes:
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        if not ring:
            raise ValueError("empty coordinate ring")
        if geom_type == GEOM_POINT:
            cmds.append((1 & 0x7) | (len(ring) << 3))     # MoveTo xN
            for x, y in ring:
                cmds.append(_zigzag(int(x) - cx))
                cmds.append(_zigzag(int(y) - cy))
                cx, cy = int(x), int(y)
            continue
        cmds.append((1 & 0x7) | (1 << 3))                 # MoveTo x1
        x0, y0 = ring[0]
        cmds.append(_zigzag(int(x0) - cx))
        cmds.append(_zigzag(int(y0) - cy))
        cx, cy = int(x0), int(y0)
        rest = ring[1:]
        if geom_type == GEOM_POLYGON and len(rest) < 2 or \
                geom_type == GEOM_LINESTRING and len(rest) < 1:
            raise ValueError("ring too short for geometry type")
        cmds.append((2 & 0x7) | (len(rest) << 3))         # LineTo xN
        for x, y in rest:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            cmds.append((7 & 0x7) | (1 << 3))             # ClosePath x1
    return b"".join(_varint(c) for c in cmds)


def encode_mvt(layers) -> bytes:
    """layers: [(name, extent, features)] with features
    [(feature_id, geom_type, rings, attrs_dict)] -> tile bytes."""
    out = bytearray()
    for name, extent, features in layers:
        keys: list[str] = []
        values: list = []

        def idx(table: list, item) -> int:
            for i, existing in enumerate(table):
                if type(existing) is type(item) and existing == item:
                    return i
            table.append(item)
            return len(table) - 1

        body = bytearray()
        body += _ld(1, name.encode("utf-8"))
        feat_blobs = []
        for fid, gtype, rings, attrs in features:
            f = bytearray()
            f += _tag(1, 0) + _varint(int(fid))
            if attrs:
                tags = bytearray()
                for k, v in attrs.items():
                    tags += _varint(idx(keys, k))
                    tags += _varint(idx(values, v))
                f += _ld(2, bytes(tags))
            f += _tag(3, 0) + _varint(gtype)
            f += _ld(4, _encode_geometry(gtype, rings))
            feat_blobs.append(bytes(f))
        for blob in feat_blobs:
            body += _ld(2, blob)
        for k in keys:
            body += _ld(3, k.encode("utf-8"))
        for v in values:
            body += _ld(4, _encode_value(v))
        body += _tag(5, 0) + _varint(int(extent))
        body += _tag(15, 0) + _varint(2)
        out += _ld(3, bytes(body))
    return bytes(out)


# --------------------------------------------------------------- decode

class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def varint(self) -> int:
        v = shift = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("MVT varint truncated")
            b = self.data[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def fields(self, end: int):
        while self.pos < end:
            tag = self.varint()
            field, wire = tag >> 3, tag & 0x7
            if wire == 0:
                yield field, self.varint()
            elif wire == 2:
                ln = self.varint()
                start = self.pos
                self.pos += ln
                if self.pos > end:
                    raise ValueError("MVT length-delimited field overruns")
                yield field, (start, start + ln)
            elif wire == 5:
                start = self.pos
                self.pos += 4
                yield field, (start, start + 4)
            elif wire == 1:
                start = self.pos
                self.pos += 8
                yield field, (start, start + 8)
            else:
                raise ValueError(f"unsupported wire type {wire}")


def _decode_geometry(data: bytes) -> list[tuple[str, list[tuple[int, int]]]]:
    r = _Reader(data)
    ops = []
    cx = cy = 0
    while r.pos < len(data):
        cmd = r.varint()
        cid, count = cmd & 0x7, cmd >> 3
        if cid in (1, 2):                     # MoveTo / LineTo
            pts = []
            for _ in range(count):
                cx += _unzigzag(r.varint())
                cy += _unzigzag(r.varint())
                pts.append((cx, cy))
            ops.append(("MoveTo" if cid == 1 else "LineTo", pts))
        elif cid == 7:
            ops.append(("ClosePath", []))
        else:
            raise ValueError(f"bad geometry command id {cid}")
    return ops


def _decode_value(data: bytes):
    r = _Reader(data)
    for field, payload in r.fields(len(data)):
        if field == 1:
            return data[payload[0]:payload[1]].decode("utf-8")
        if field == 3:
            return struct.unpack_from("<d", data, payload[0])[0]
        if field == 2:
            return struct.unpack_from("<f", data, payload[0])[0]
        if field in (4, 5):
            return payload
        if field == 6:
            return _unzigzag(payload)
        if field == 7:
            return bool(payload)
    raise ValueError("empty MVT value")


def decode_mvt(data: bytes) -> list[dict]:
    """tile bytes -> [{name, extent, version, features: [{id, type,
    geometry: [(op, [(x, y), ...])], attrs}]}]."""
    r = _Reader(data)
    layers = []
    for field, span in r.fields(len(data)):
        if field != 3:
            continue
        lr = _Reader(data)
        lr.pos = span[0]
        layer = {"name": None, "extent": 4096, "version": None,
                 "features": []}
        keys: list[str] = []
        values: list = []
        feat_spans = []
        for f, p in lr.fields(span[1]):
            if f == 1:
                layer["name"] = data[p[0]:p[1]].decode("utf-8")
            elif f == 2:
                feat_spans.append(p)
            elif f == 3:
                keys.append(data[p[0]:p[1]].decode("utf-8"))
            elif f == 4:
                values.append(_decode_value(data[p[0]:p[1]]))
            elif f == 5:
                layer["extent"] = p
            elif f == 15:
                layer["version"] = p
        for fs in feat_spans:
            fr = _Reader(data)
            fr.pos = fs[0]
            feat = {"id": None, "type": None, "geometry": [], "attrs": {}}
            tag_ints: list[int] = []
            for f, p in fr.fields(fs[1]):
                if f == 1:
                    feat["id"] = p
                elif f == 2:
                    tr = _Reader(data[p[0]:p[1]])
                    while tr.pos < p[1] - p[0]:
                        tag_ints.append(tr.varint())
                elif f == 3:
                    feat["type"] = p
                elif f == 4:
                    feat["geometry"] = _decode_geometry(data[p[0]:p[1]])
            for ki, vi in zip(tag_ints[::2], tag_ints[1::2]):
                feat["attrs"][keys[ki]] = values[vi]
            layer["features"].append(feat)
        layers.append(layer)
    return layers
