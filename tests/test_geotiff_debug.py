"""S11 debug GeoTIFF writer + K6 print_2d — the reference's two
debug-only utilities (dataset.rs:199-230 write_raster, array.rs:66-88
print_2d), GDAL-free."""

import numpy as np

from rastertiler_rs_spark import tilemath as tm
from rastertiler_rs_spark.fixtures import NODATA
from rastertiler_rs_spark.geotiff import (read_geotiff, write_geotiff,
                                          write_tile_geotiff)
from rastertiler_rs_spark.kernel import print_2d


def test_geotiff_roundtrip_u8(tmp_path):
    arr = (np.arange(32 * 48, dtype=np.uint32) % 251).astype(np.uint8).reshape(48, 32)
    transform = (10.0, 0.0, -500.0, 0.0, -10.0, 800.0)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, arr, transform, nodata=0)
    d = read_geotiff(open(p, "rb").read())
    assert (d["width"], d["height"]) == (32, 48)
    assert np.array_equal(d["pixels"], arr)
    assert d["transform"] == transform
    assert d["epsg"] == 3857
    assert d["nodata"] == 0


def test_geotiff_roundtrip_u32(tmp_path):
    arr = (np.arange(16 * 16, dtype=np.uint32) * 65537 % (1 << 24)).reshape(16, 16)
    p = str(tmp_path / "t32.tif")
    write_geotiff(p, arr, (1.0, 0.0, 0.0, 0.0, -1.0, 16.0), nodata=0)
    d = read_geotiff(open(p, "rb").read())
    assert d["pixels"].dtype == np.uint32
    assert np.array_equal(d["pixels"], arr)


def test_tile_geotiff_transform_matches_mercator_bounds(tmp_path):
    canvas = np.full((64, 64), 7, dtype=np.uint8)
    p = str(tmp_path / "tile.tif")
    write_tile_geotiff(p, canvas, 4, 5, 6, NODATA)
    d = read_geotiff(open(p, "rb").read())
    xmin, ymin, xmax, ymax = tm.tile_mercator_bounds(4, 5, 6)
    a, _, c, _, e, f = d["transform"]
    assert (c, f) == (xmin, ymax)
    assert abs(a - (xmax - xmin) / 64) < 1e-9
    assert abs(e + (ymax - ymin) / 64) < 1e-9


def test_print_2d_format(capsys):
    # the reference's own doc shape: '-' for nodata, width = max repr + 1
    arr = np.array([[0, 5], [12, 0]], dtype=np.uint8)
    print_2d(arr, nodata=0)
    got = capsys.readouterr().out
    assert got == "-  5  \n12 -  \n"


def test_print_2d_all_nodata(capsys):
    print_2d(np.zeros((2, 2), dtype=np.uint8), nodata=0)
    got = capsys.readouterr().out
    assert got == "- - \n- - \n"


def test_out_of_line_offsets_word_aligned(tmp_path):
    """TIFF requires value offsets on a word boundary; the 5-byte
    GDAL_NODATA ascii payload must not leave the pixel strip (or any
    later blob) at an odd offset."""
    import struct

    import numpy as np

    from rastertiler_rs_spark.geotiff import write_tile_geotiff

    p = tmp_path / "t.tif"
    arr = (np.arange(64 * 64) % 255 + 1).astype(np.uint8).reshape(64, 64)
    write_tile_geotiff(str(p), arr, 5, 10, 12, 0)
    data = p.read_bytes()
    (ifd,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd)
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd + 2 + i * 12)
        size = {3: 2, 4: 4, 12: 8, 2: 1}[typ] * count
        if size > 4:
            (off,) = struct.unpack_from("<I", data, ifd + 2 + i * 12 + 8)
            assert off % 2 == 0, f"tag {tag} value offset {off} is odd"
