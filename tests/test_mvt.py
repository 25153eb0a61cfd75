"""MVT 2.1 codec + vector-tile sink: wire-format round-trips, geometry
command streams, value table dedup, and the Spark points->tiles path."""

import numpy as np
import pytest

import rastertiler_rs_spark.tilemath as tm
from rastertiler_rs_spark.mvt import decode_mvt, encode_mvt
from rastertiler_rs_spark.mvt.codec import (GEOM_LINESTRING, GEOM_POINT,
                                            GEOM_POLYGON, _unzigzag,
                                            _varint, _zigzag)


def test_varint_zigzag_edges():
    from rastertiler_rs_spark.mvt.codec import _Reader

    for v in (0, 1, 127, 128, 300, 2**31, 2**63 - 1):
        r = _Reader(_varint(v))
        assert r.varint() == v
    for v in (0, -1, 1, -64, 63, -2**31, 2**31, -2**62):
        assert _unzigzag(_zigzag(v)) == v
    with pytest.raises(ValueError, match="negative"):
        _varint(-1)


def test_point_multipoint_roundtrip():
    feats = [
        (7, GEOM_POINT, [[(25, 17)]], {"name": "a", "rank": 3}),
        (9, GEOM_POINT, [[(5, 5), (100, 2000), (4095, 0)]], {"flag": True}),
    ]
    tiles = decode_mvt(encode_mvt([("pts", 4096, feats)]))
    assert len(tiles) == 1
    layer = tiles[0]
    assert (layer["name"], layer["extent"], layer["version"]) \
        == ("pts", 4096, 2)
    f0, f1 = layer["features"]
    assert f0["id"] == 7 and f0["type"] == GEOM_POINT
    assert f0["geometry"] == [("MoveTo", [(25, 17)])]
    assert f0["attrs"] == {"name": "a", "rank": 3}
    assert f1["geometry"] == [("MoveTo", [(5, 5), (100, 2000), (4095, 0)])]
    assert f1["attrs"] == {"flag": True}


def test_linestring_polygon_roundtrip():
    feats = [
        (1, GEOM_LINESTRING, [[(2, 2), (2, 10), (10, 10)]], {}),
        (2, GEOM_POLYGON, [[(0, 0), (8, 0), (8, 8), (0, 8)]],
         {"area": 64.0}),
    ]
    layer = decode_mvt(encode_mvt([("geo", 256, feats)]))[0]
    line, poly = layer["features"]
    assert line["geometry"] == [("MoveTo", [(2, 2)]),
                                ("LineTo", [(2, 10), (10, 10)])]
    assert poly["geometry"] == [("MoveTo", [(0, 0)]),
                                ("LineTo", [(8, 0), (8, 8), (0, 8)]),
                                ("ClosePath", [])]
    assert poly["attrs"] == {"area": 64.0}


def test_multi_layer_and_value_dedup():
    feats_a = [(i, GEOM_POINT, [[(i, i)]], {"kind": "x"}) for i in range(5)]
    feats_b = [(1, GEOM_POINT, [[(9, 9)]], {"kind": "y", "n": -12})]
    data = encode_mvt([("a", 4096, feats_a), ("b", 512, feats_b)])
    tiles = decode_mvt(data)
    assert [t["name"] for t in tiles] == ["a", "b"]
    assert all(f["attrs"] == {"kind": "x"} for f in tiles[0]["features"])
    assert tiles[1]["features"][0]["attrs"] == {"kind": "y", "n": -12}
    # shared key "kind" appears once in layer a's key table: the tag
    # indices in 5 features all reference it (cheap proxy: size check)
    assert data.count(b"kind") == 2            # once per layer


def test_sink_points_to_mvt(spark):
    from rastertiler_rs_spark.operators.vector_tiles import points_to_mvt

    rng = np.random.default_rng(5)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        rng.uniform(-tm.ORIGIN * 0.99, tm.ORIGIN * 0.99, (500, 2)))]
    df = spark.createDataFrame(pts, "pid long, px double, py double")
    out = points_to_mvt(df, zoom=3).collect()
    assert sum(r["n_features"] for r in out) == 500

    n = 1 << 3
    span = tm.CE / n
    seen = 0
    for r in out:
        tiles = decode_mvt(bytes(r["mvt"]))
        assert len(tiles) == 1 and tiles[0]["extent"] == 4096
        y = n - 1 - r["tile_row"]              # un-flip TMS
        tminx = -tm.ORIGIN + r["x"] * span
        tmaxy = tm.ORIGIN - y * span
        for f in tiles[0]["features"]:
            (op, pts_), = f["geometry"]
            (lx, ly), = pts_
            pid, px, py = pts[f["id"]]
            def q(delta):
                v = delta / span * 4096.0
                return min(4095, max(0, int(np.floor(
                    np.floor(v * 1e6 + 0.5) / 1e6))))
            assert lx == q(px - tminx)
            assert ly == q(tmaxy - py)
            seen += 1
    assert seen == 500


def test_sink_boxes_to_mvt_polygons(spark):
    from rastertiler_rs_spark.operators.vector_tiles import boxes_to_mvt

    boxes = spark.createDataFrame(
        [(1, -2e6, -1e6, 3e6, 2.5e6), (2, 4e6, 4e6, 4.5e6, 4.4e6 + 1e6)],
        "box_id long, minx double, miny double, maxx double, maxy double")
    out = boxes_to_mvt(boxes, zoom=4).collect()
    assert sum(r["n_features"] for r in out) >= 4   # box 1 spans tiles
    n = 1 << 4
    span = tm.CE / n
    for r in out:
        layer = decode_mvt(bytes(r["mvt"]))[0]
        for f in layer["features"]:
            ops = f["geometry"]
            assert [op for op, _ in ops] == ["MoveTo", "LineTo", "ClosePath"]
            ring = ops[0][1] + ops[1][1]
            assert len(ring) == 4
            xs = [p[0] for p in ring]
            ys = [p[1] for p in ring]
            # v2 exterior winding: positive shoelace area in y-down coords
            area = sum(xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i]
                       for i in range(4))
            assert area >= 0
            assert all(0 <= v <= 4095 for v in xs + ys)


def test_sink_polys_to_mvt_clip(spark):
    """Sutherland–Hodgman clip sink: decoded per-tile rings equal a
    direct python clip of the same triangles against each tile box
    (same clip code path, but driven end-to-end through the JVM cover,
    the shuffle, the quantizer, and the protobuf round-trip)."""
    from rastertiler_rs_spark.operators.vector_tiles import (
        clip_ring_to_box, polys_to_mvt)

    tris = []
    for k in range(1, 13):
        minx = -tm.ORIGIN + (k * 1.37e6) % (2.5e7)
        miny = -tm.ORIGIN + (k * 2.11e6) % (1.9e7)
        tris.append((k, [(minx + 101.25, miny + 77.5),
                         (minx + 4.1e6 + 1234.5, miny + 777.25),
                         (minx + 555.125, miny + 3.3e6 + 321.75)]))
    df = spark.createDataFrame(
        [(fid, [{"x": x, "y": y} for x, y in ring]) for fid, ring in tris],
        "poly_id long, ring array<struct<x: double, y: double>>")
    zoom = 4
    n = 1 << zoom
    span = tm.CE / n
    out = polys_to_mvt(df, zoom=zoom).collect()
    assert out, "triangles must cover at least one tile"

    def q(v):
        return max(0, min(4095, int(np.floor(np.floor(v * 1e6 + 0.5) / 1e6))))

    seen = 0
    for r in out:
        y = n - 1 - r["tile_row"]
        tminx = -tm.ORIGIN + r["x"] * span
        tmaxy = tm.ORIGIN - y * span
        layer = decode_mvt(bytes(r["mvt"]))[0]
        for f in layer["features"]:
            ring = next(iter(tris[f["id"] - 1][1] for _ in [0]))
            clipped = clip_ring_to_box(
                ring, tminx, tmaxy - span, tminx + span, tmaxy)
            assert clipped, "emitted feature must clip non-empty"
            want = {(q((vx - tminx) / span * 4096.0),
                     q((tmaxy - vy) / span * 4096.0)) for vx, vy in clipped}
            got = {p for _, pts_ in f["geometry"] for p in pts_}
            assert got == want
            # v2 exterior winding: positive shoelace in y-down coords
            pts_ring = f["geometry"][0][1] + f["geometry"][1][1]
            area = sum(
                pts_ring[i][0] * pts_ring[(i + 1) % len(pts_ring)][1]
                - pts_ring[(i + 1) % len(pts_ring)][0] * pts_ring[i][1]
                for i in range(len(pts_ring)))
            assert area >= 0
            seen += 1
    assert seen >= 12  # every triangle emits at least its home tile


def test_sink_polys_clip_empty_and_degenerate(spark):
    from rastertiler_rs_spark.operators.vector_tiles import clip_ring_to_box

    # fully outside -> []
    assert clip_ring_to_box([(0, 0), (10, 0), (0, 10)], 100, 100, 200, 200) == []
    # fully inside -> unchanged vertex set
    tri = [(110.5, 120.5), (150.25, 121.5), (130.125, 180.75)]
    got = clip_ring_to_box(tri, 100, 100, 200, 200)
    assert set(got) == set(tri)
    # box fully inside the polygon -> the 4 box corners
    got = clip_ring_to_box([(0, 0), (1000, 0), (500, 1000)],
                           400, 200, 550, 300)
    assert set(got) == {(400.0, 200.0), (550.0, 200.0),
                        (550.0, 300.0), (400.0, 300.0)}


def test_hot_tile_feature_cap(spark):
    """A planted hot tile (many points, one tile) truncates
    deterministically to the lowest-fid cap features; cold tiles are
    untouched."""
    from rastertiler_rs_spark.operators.vector_tiles import points_to_mvt

    n = 1 << 3
    span = tm.CE / n
    # 300 points inside tile (2, 3); 5 points in tile (4, 1)
    hot = [(i, -tm.ORIGIN + 2 * span + (i % 17 + 1) * span / 20,
            tm.ORIGIN - 3 * span - (i % 13 + 1) * span / 15)
           for i in range(300)]
    cold = [(1000 + i, -tm.ORIGIN + 4 * span + span / 2,
             tm.ORIGIN - 1 * span - (i + 1) * span / 10) for i in range(5)]
    df = spark.createDataFrame(hot + cold, "pid long, px double, py double")
    out = {(r["x"], r["tile_row"]): r
           for r in points_to_mvt(df, zoom=3,
                                  max_features_per_tile=50).collect()}
    hot_row = out[(2, n - 1 - 3)]
    cold_row = out[(4, n - 1 - 1)]
    assert hot_row["n_features"] == 50
    assert cold_row["n_features"] == 5
    kept = [f["id"] for f in decode_mvt(bytes(hot_row["mvt"]))[0]["features"]]
    assert sorted(kept) == list(range(50))  # lowest fids survive


def test_sink_lines_to_mvt_clip(spark):
    """Liang–Barsky polyline sink: decoded per-tile segments equal a
    direct python parametric clip of the same segments."""
    from rastertiler_rs_spark.operators.vector_tiles import lines_to_mvt

    paths = []
    for k in range(1, 9):
        x = -tm.ORIGIN + (k * 2.13e6) % 2.4e7 + 101.25
        y = -tm.ORIGIN + (k * 3.31e6) % 1.7e7 + 77.5
        pts = [(x, y)]
        for j in range(3):
            x += 1.9e6 + k * 1.37e5 + 251.125
            y += 1.1e6 - (j % 2) * 2.2e6 + 97.25
            pts.append((x, y))
        paths.append((k, pts))
    df = spark.createDataFrame(
        [(fid, [{"x": x, "y": y} for x, y in pts]) for fid, pts in paths],
        "line_id long, pts array<struct<x: double, y: double>>")
    zoom = 4
    n = 1 << zoom
    span = tm.CE / n
    out = lines_to_mvt(df, zoom=zoom).collect()
    assert out

    def q(v):
        return max(0, min(4095, int(np.floor(np.floor(v * 1e6 + 0.5) / 1e6))))

    def clip_seg(p1, p2, bx0, by0, bx1, by1):
        (x1, y1), (x2, y2) = p1, p2
        dx, dy = x2 - x1, y2 - y1
        tex, tlx = sorted(((bx0 - x1) / dx, (bx1 - x1) / dx))
        tey, tly = sorted(((by0 - y1) / dy, (by1 - y1) / dy))
        t0, t1 = max(0.0, tex, tey), min(1.0, tlx, tly)
        if t0 > t1:
            return None
        return ((x1 + t0 * dx, y1 + t0 * dy), (x1 + t1 * dx, y1 + t1 * dy))

    seen = 0
    for r in out:
        y = n - 1 - r["tile_row"]
        tminx = -tm.ORIGIN + r["x"] * span
        tmaxy = tm.ORIGIN - y * span
        layer = decode_mvt(bytes(r["mvt"]))[0]
        for f in layer["features"]:
            pts = paths[f["id"] - 1][1]
            want = []
            for i in range(len(pts) - 1):
                c = clip_seg(pts[i], pts[i + 1], tminx, tmaxy - span,
                             tminx + span, tmaxy)
                if c is None:
                    continue
                a = (q((c[0][0] - tminx) / span * 4096.0),
                     q((tmaxy - c[0][1]) / span * 4096.0))
                b = (q((c[1][0] - tminx) / span * 4096.0),
                     q((tmaxy - c[1][1]) / span * 4096.0))
                if a != b:
                    want.append([a, b])
            got = []
            part = []
            for op, pp in f["geometry"]:
                if op == "MoveTo":
                    part = list(pp)
                else:
                    for p in pp:
                        got.append([part[-1], p])
                        part.append(p)
            assert got == want
            seen += 1
    assert seen >= 8
