"""GeoTIFF ingest source: multi-strip codec + distributed ingest parity.

The reference's real input is a GeoTIFF (main.rs:96-107, dataset.rs:
23-60); operators/geotiff_source.py turns one into the engine's images
table. These tests pin (a) the multi-strip TIFF layout round-trip,
(b) byte-parity of ingest→render against an independently constructed
images table over the same pixels, (c) the all-nodata source skip, and
(d) the u32 path and validation errors.
"""

import os
import sqlite3
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from rastertiler_rs_spark.fixtures import (NODATA, geotiff_band,
                                           geotiff_fixture, geotiff_params)
from rastertiler_rs_spark.geotiff import (geotiff_ifd, read_geotiff,
                                          write_geotiff)
from rastertiler_rs_spark.operators.geotiff_source import (
    block_footprint, images_from_geotiff)
from rastertiler_rs_spark.operators.render import render


def _tmp_tif(tmp_path, data, transform, nodata=NODATA, rps=None, epsg=3857):
    p = str(tmp_path / "t.tif")
    write_geotiff(p, data, transform, nodata, epsg=epsg, rows_per_strip=rps)
    return p


def test_multistrip_roundtrip(tmp_path):
    # uneven last strip (257 % 64 != 0) exercises the short-strip path
    data = (np.arange(257 * 96, dtype=np.int64).reshape(257, 96) % 251
            ).astype(np.uint8)
    t = (1.5, 0.0, -100.25, 0.0, -2.5, 9000.5)
    p = _tmp_tif(tmp_path, data, t, nodata=7, rps=64)
    r = read_geotiff(open(p, "rb").read())
    assert (r["pixels"] == data).all()
    assert r["transform"] == t and r["nodata"] == 7 and r["epsg"] == 3857
    m = geotiff_ifd(p)
    assert len(m["strip_offsets"]) == -(-257 // 64)
    assert m["rows_per_strip"] == 64
    assert sum(m["strip_byte_counts"]) == data.nbytes


def test_singlestrip_layout_unchanged(tmp_path):
    data = (np.arange(64 * 64, dtype=np.int64).reshape(64, 64) % 251
            ).astype(np.uint8)
    t = (2.0, 0.0, 0.0, 0.0, -2.0, 128.0)
    p = _tmp_tif(tmp_path, data, t)
    m = geotiff_ifd(p)
    assert len(m["strip_offsets"]) == 1
    assert (read_geotiff(open(p, "rb").read())["pixels"] == data).all()


def _manual_images(spark, path, block_cols):
    """Independent construction of the same blocks: decode the WHOLE
    file driver-side with the debug reader, slice with plain numpy, and
    attach footprints via the shared affine helper."""
    from rastertiler_rs_spark.png import encode_grayscale8

    r = read_geotiff(open(path, "rb").read())
    m = geotiff_ifd(path)
    rows = []
    h, w = r["pixels"].shape
    rps = m["rows_per_strip"]
    for row0 in range(0, h, rps):
        nrows = min(rps, h - row0)
        for col0 in range(0, w, block_cols):
            ncols = min(block_cols, w - col0)
            blk = np.ascontiguousarray(
                r["pixels"][row0:row0 + nrows, col0:col0 + ncols])
            if (blk == r["nodata"]).all():
                continue
            minx, miny, maxx, maxy = block_footprint(
                r["transform"], row0, nrows, col0, ncols)
            rows.append((f"m#r{row0}c{col0}",
                         bytearray(encode_grayscale8(blk, r["nodata"])),
                         ncols, nrows, "png;u8", minx, miny, maxx, maxy))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "minx double, miny double, maxx double, maxy double")


def _tiles(df):
    return sorted((r.zoom, r.x, r.y, r.tile_hash, bytes(r.png))
                  for r in df.collect())


def test_ingest_render_parity(spark):
    """ingest→render is byte-identical to an independently built images
    table over the same pixels (tile hashes AND png bytes)."""
    path = geotiff_fixture()
    a = render(images_from_geotiff(spark, path, block_cols=512),
               7, 9, tile_size=128, dtype_tag="u8")
    b = render(_manual_images(spark, path, 512),
               7, 9, tile_size=128, dtype_tag="u8")
    ta, tb = _tiles(a), _tiles(b)
    assert len(ta) > 0
    # image_ids differ between the two constructions, but pixels and
    # footprints agree, so the fused tile set must be byte-identical
    assert [t[:3] for t in ta] == [t[:3] for t in tb]
    assert ta == tb


def test_ingest_skips_all_nodata_blocks(spark, tmp_path):
    _, _, transform, _ = geotiff_params()
    data = geotiff_band(512, 1024)  # 1 col chunk x 2 strips
    data[:512] = NODATA             # first strip entirely nodata
    p = _tmp_tif(tmp_path, data, transform, rps=512)
    img = images_from_geotiff(spark, p).collect()
    assert len(img) == 1
    assert img[0].image_id.endswith("r0000512c0000000")


def test_ingest_u32(spark, tmp_path):
    _, _, transform, _ = geotiff_params()
    data = (1 + np.arange(512 * 512, dtype=np.int64).reshape(512, 512)
            % 100000).astype(np.uint32)
    p = _tmp_tif(tmp_path, data, transform, rps=256)
    img = images_from_geotiff(spark, p)
    rows = img.collect()
    assert len(rows) == 2 and all(r.fmt == "png;u32" for r in rows)
    fused = render(img, 8, 9, tile_size=128, dtype_tag="u32")
    assert fused.count() > 0


def test_ingest_validation(spark, tmp_path):
    data = np.ones((8, 8), np.uint8)
    p = _tmp_tif(tmp_path, data, (1.0, 0, 0, 0, -1.0, 8.0), epsg=32633)
    with pytest.raises(ValueError, match="EPSG:3857 or EPSG:4326"):
        images_from_geotiff(spark, p)


def test_cli_render_tif(tmp_path):
    out = str(tmp_path / "out.mbtiles")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "rastertiler_rs_spark", "render",
         geotiff_fixture(), out, "--minzoom", "8", "--maxzoom", "8",
         "--tilesize", "128", "--workers", "4"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    con = sqlite3.connect(out)
    n = con.execute("SELECT COUNT(*) FROM tiles").fetchone()[0]
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    con.close()
    assert n > 0
    assert meta["format"] == "png"


# ------------------------------------------------------- COG layouts

def test_cog_layout_roundtrips(tmp_path):
    """Tiled layout x compression x predictor x dtype round-trips,
    including uneven right/bottom edges (77x45 under 16/32 tiles)."""
    import itertools

    t = (1.5, 0.0, -100.25, 0.0, -2.5, 9000.5)
    rng = np.random.default_rng(7)
    for dt, comp, pred, ts in itertools.product(
            [np.uint8, np.uint32], ["none", "deflate", "lzw", "packbits"], [1, 2],
            [16, 32]):
        data = rng.integers(0, 250, (77, 45)).astype(dt)
        p = str(tmp_path / "c.tif")
        write_geotiff(p, data, t, 7, tile_size=ts, compression=comp,
                      predictor=pred)
        r = read_geotiff(open(p, "rb").read())
        assert (r["pixels"] == data).all(), (dt, comp, pred, ts)
        m = geotiff_ifd(p)
        assert m["tiled"] and m["compression"] == comp
        assert m["predictor"] == pred
        assert len(m["blocks"]) == -(-77 // ts) * -(-45 // ts)


def test_compressed_strip_roundtrip(tmp_path):
    """Strip layout also accepts compression + predictor (not only the
    tiled COG layout)."""
    data = (np.arange(257 * 96, dtype=np.int64).reshape(257, 96) % 251
            ).astype(np.uint8)
    t = (1.5, 0.0, -100.25, 0.0, -2.5, 9000.5)
    for comp in ("deflate", "lzw", "packbits"):
        p = str(tmp_path / "s.tif")
        write_geotiff(p, data, t, 7, rows_per_strip=64, compression=comp,
                      predictor=2)
        r = read_geotiff(open(p, "rb").read())
        assert (r["pixels"] == data).all()
        m = geotiff_ifd(p)
        # compressed strips are smaller than raw on this sawtooth band
        assert sum(b["cnt"] for b in m["blocks"]) < data.nbytes


def test_tiff_lzw_codec_edges():
    """TIFF-variant LZW: empty stream, single byte, and streams long
    enough to cross every width change and the 4094 table reset."""
    from rastertiler_rs_spark.geotiff import (_lzw_decode_tiff,
                                              _lzw_encode_tiff)

    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 300, 5000, 200000):
        rand = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        runs = (np.arange(n) % 7).astype(np.uint8).tobytes()
        for buf in (rand, runs):
            assert _lzw_decode_tiff(_lzw_encode_tiff(buf), n) == buf
    with pytest.raises(ValueError, match="expected"):
        _lzw_decode_tiff(_lzw_encode_tiff(b"abc"), 5)


def test_cog_ingest_render_parity(spark):
    """Ingesting the tiled+deflate+predictor COG twin renders
    byte-identically to the multi-strip fixture: same pixels, same
    affine, and (by the even 512 division) the same block grid."""
    from rastertiler_rs_spark.fixtures import geotiff_cog_fixture

    a = render(images_from_geotiff(spark, geotiff_fixture(),
                                   block_cols=512),
               7, 9, tile_size=128, dtype_tag="u8")
    b = render(images_from_geotiff(spark, geotiff_cog_fixture()),
               7, 9, tile_size=128, dtype_tag="u8")
    ta, tb = _tiles(a), _tiles(b)
    assert len(ta) > 0
    assert ta == tb


def test_lzw_tiled_uneven_ingest_rows(spark, tmp_path):
    """An uneven tile grid (192-tiles over 1000x700, LZW + predictor)
    ingests EXACTLY the rows a driver-side numpy construction over the
    same grid produces: same ids, same footprints, byte-identical PNGs
    (edge tiles cropped of their nodata padding). Render parity across
    DIFFERENT grids is intentionally not asserted — per-block window
    rounding legitimately differs between grids under resampling."""
    from rastertiler_rs_spark.png import encode_grayscale8

    _, _, transform, _ = geotiff_params()
    data = geotiff_band(1000, 700)  # 1000 % 192 != 0, 700 % 192 != 0
    p_cog = str(tmp_path / "c.tif")
    write_geotiff(p_cog, data, transform, NODATA, tile_size=192,
                  compression="lzw", predictor=2)
    got = sorted((r.image_id, bytes(r.bytes), r.w, r.h,
                  r.minx, r.miny, r.maxx, r.maxy)
                 for r in images_from_geotiff(spark, p_cog).collect())
    want = []
    for row0 in range(0, 700, 192):
        nrows = min(192, 700 - row0)
        for col0 in range(0, 1000, 192):
            ncols = min(192, 1000 - col0)
            blk = np.ascontiguousarray(
                data[row0:row0 + nrows, col0:col0 + ncols])
            minx, miny, maxx, maxy = block_footprint(
                transform, row0, nrows, col0, ncols)
            want.append((f"c.tif#r{row0:07d}c{col0:07d}",
                         encode_grayscale8(blk, NODATA), ncols, nrows,
                         minx, miny, maxx, maxy))
    assert got == sorted(want)


def test_cog_ingest_block_cols_chop(spark, tmp_path):
    """block_cols chops tiled blocks too (each chunk decodes its source
    tile and slices columns); footprints follow the chunks."""
    _, _, transform, _ = geotiff_params()
    data = geotiff_band(512, 512)
    p = str(tmp_path / "c.tif")
    write_geotiff(p, data, transform, NODATA, tile_size=512,
                  compression="deflate")
    rows = images_from_geotiff(spark, p, block_cols=128).collect()
    assert len(rows) == 4
    assert sorted(r.w for r in rows) == [128] * 4
    assert len({(r.minx, r.maxx) for r in rows}) == 4


def test_corrupt_tile_directory_fails_fast(tmp_path):
    """A tile directory whose offsets count disagrees with the tile
    grid is rejected at probe time (driver-side, before any ranged
    read)."""
    data = np.ones((64, 64), np.uint8)
    p = str(tmp_path / "c.tif")
    write_geotiff(p, data, (1.0, 0, 0, 0, -1.0, 64.0), 0, tile_size=16)
    raw = bytearray(open(p, "rb").read())
    # shrink ImageWidth from 64 to 60: grid says 4x4 tiles either way,
    # so instead grow it to 80 -> expects 5x4, directory has 4x4
    pos = raw.find((256).to_bytes(2, "little") + (4).to_bytes(2, "little"))
    raw[pos + 8:pos + 12] = (80).to_bytes(4, "little")
    p2 = str(tmp_path / "bad.tif")
    open(p2, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="tile directory"):
        geotiff_ifd(p2)


def test_bigtiff_roundtrips(tmp_path):
    """BigTIFF (v43) layouts round-trip for every block scheme the
    writer emits, including the 2-strip case whose byte-count pair
    packs into the 8-byte inline window."""
    from rastertiler_rs_spark.geotiff import (geotiff_ifd, read_geotiff,
                                              write_geotiff)

    rng = np.random.default_rng(7)
    tf = (10.0, 0.0, 100.0, 0.0, -10.0, 5000.0)
    cases = [{}, {"rows_per_strip": 7},
             {"rows_per_strip": 20},  # 2 strips -> inline count pair
             {"rows_per_strip": 13, "compression": "deflate",
              "predictor": 2},
             {"tile_size": 16, "compression": "lzw", "predictor": 2}]
    for k, kwargs in enumerate(cases):
        for dt, hi in ((np.uint8, 256), (np.uint32, 1 << 30)):
            arr = rng.integers(0, hi, (37, 29)).astype(dt)
            p = str(tmp_path / f"big_{k}_{dt.__name__}.tif")
            write_geotiff(p, arr, tf, nodata=0, bigtiff=True, **kwargs)
            data = open(p, "rb").read()
            assert data[2:4] == b"\x2b\x00"            # magic 43
            d = read_geotiff(data)
            assert np.array_equal(d["pixels"], arr)
            assert d["transform"] == tf and d["epsg"] == 3857
            meta = geotiff_ifd(p)
            assert (meta["width"], meta["height"]) == (29, 37)


def test_bigtiff_bad_header_fails_fast(tmp_path):
    from rastertiler_rs_spark.geotiff import read_geotiff, write_geotiff

    p = str(tmp_path / "x.tif")
    write_geotiff(p, np.zeros((4, 4), np.uint8), (1.0, 0, 0, 0, -1.0, 4.0),
                  nodata=0, bigtiff=True)
    data = bytearray(open(p, "rb").read())
    data[4] = 4                                       # offset size != 8
    with pytest.raises(ValueError, match="BigTIFF"):
        read_geotiff(bytes(data))
    data[4] = 8
    data[2] = 44                                      # unknown magic
    with pytest.raises(ValueError, match="magic"):
        read_geotiff(bytes(data))


def test_bigtiff_ingest_render_parity(spark):
    """The distributed source over a BigTIFF COG produces the same
    mosaic as over the classic COG twin (identical pixels + blocks,
    different container layout)."""
    from rastertiler_rs_spark.fixtures import (geotiff_bigtiff_fixture,
                                               geotiff_cog_fixture)
    from rastertiler_rs_spark.operators.geotiff_source import \
        images_from_geotiff
    from rastertiler_rs_spark.operators.render import render

    def tiles(path):
        imgs = images_from_geotiff(spark, path)
        fused = render(imgs, 7, 8, tile_size=128, dtype_tag="u8")
        return {(r.zoom, r.x, r.y): bytes(r.png) for r in fused.collect()}

    a = tiles(geotiff_cog_fixture())
    b = tiles(geotiff_bigtiff_fixture())
    assert a == b and len(a) > 0


def test_packbits_codec_edges():
    """TIFF §9 PackBits: long runs split at 128, literal/replicate
    boundaries, the per-row packing rule, and stream fail-fasts."""
    import pytest

    from rastertiler_rs_spark.geotiff import (
        _packbits_decode, _packbits_encode)

    for row in (b"", b"\x07", b"\xaa" * 1000, bytes(range(256)) * 3,
                b"aaabccddddde", b"ab" * 200, b"\x00" * 128 + b"\x01"):
        enc = _packbits_encode(row)
        assert _packbits_decode(enc, len(row)) == row, row[:16]
    # a replicate run never crosses what the encoder was given
    assert _packbits_encode(b"\xaa" * 300)[0] == 257 - 128
    with pytest.raises(ValueError, match="ended early|overruns"):
        _packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="expected"):
        _packbits_decode(b"\x01abc", 1)
