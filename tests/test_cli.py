"""The CLI surface (render + merge subcommands, the reference's two
entry points) end-to-end: render two image sets to .mbtiles, merge
them, and check against the numpy oracle + SQLite-level invariants."""

import sqlite3
import sys

import pyarrow.parquet as pq
import pytest

from rastertiler_rs_spark.__main__ import main
from rastertiler_rs_spark.fixtures import generate_images
from rastertiler_rs_spark.oracle import render_oracle


def _mb(path):
    conn = sqlite3.connect(path)
    tiles = {tuple(r[:3]): r[3] for r in conn.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_id FROM map")}
    blobs = dict(conn.execute("SELECT tile_id, tile_data FROM images"))
    meta = dict(conn.execute("SELECT name, value FROM metadata"))
    # the tiles view (map ⋈ images) must resolve every row
    joined = conn.execute("SELECT COUNT(*) FROM tiles").fetchone()[0]
    conn.close()
    assert joined == len(tiles)
    return tiles, blobs, meta


def test_cli_render_and_merge(spark, tmp_path):
    # spark fixture keeps the session alive; the CLI's get_spark reuses it
    tbl = generate_images(24, "u8")
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(tbl.slice(0, 16), a)
    pq.write_table(tbl.slice(8, 16), b)  # overlaps a on images 8..15

    out_a = str(tmp_path / "a.mbtiles")
    out_b = str(tmp_path / "b.mbtiles")
    main(["render", a, out_a, "--minzoom", "3", "--maxzoom", "6",
          "--tilesize", "64", "--disable-overviews", "--name", "seta",
          "--description", "left set", "--attribution", "test"])
    main(["render", b, out_b, "--minzoom", "3", "--maxzoom", "6",
          "--tilesize", "64", "--disable-overviews"])

    ta, ba, ma = _mb(out_a)
    want_tiles, want_blobs = render_oracle(tbl.slice(0, 16).to_pylist(), 3, 6, 64)
    assert ta == {(z, x, y): h for z, x, y, h in want_tiles}
    for h, png in ba.items():
        assert bytes(want_blobs[h]) == bytes(png)
    assert ma["name"] == "seta" and ma["description"] == "left set"
    assert ma["minzoom"] == "3" and ma["maxzoom"] == "6"
    assert ma["format"] == "png" and ma["type"] == "overlay"

    out_m = str(tmp_path / "m.mbtiles")
    main(["merge", out_a, out_b, out_m])
    # finalization parity (mbtiles.rs:213-218): compacted + consistent
    conn = sqlite3.connect(out_m)
    assert conn.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
    assert conn.execute("PRAGMA freelist_count").fetchone()[0] == 0  # vacuumed
    conn.close()
    tm_, bm, mm = _mb(out_m)
    tb, bb, _ = _mb(out_b)
    # left wins on conflicts; right-only appended (INSERT OR IGNORE)
    want = dict(tb)
    want.update(ta)
    assert tm_ == want
    for k, h in tm_.items():
        assert h in bm


def test_cli_default_overviews_respects_maxzoom(spark, tmp_path):
    """The default (overviews-enabled) path with the default --maxzoom 4,
    which sits BELOW the overview threshold (8): the output must contain
    exactly zooms minzoom..maxzoom — no overshoot past maxzoom — and the
    metadata must agree with the tiles."""
    tbl = generate_images(16, "u8")
    src = str(tmp_path / "imgs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "ov.mbtiles")
    main(["render", src, out, "--minzoom", "1", "--tilesize", "64"])
    tiles, blobs, meta = _mb(out)
    zooms = sorted({z for z, _, _ in tiles})
    # no overshoot past maxzoom (the unclamped bug rendered z..8), and
    # the base level itself must be present; inner levels may drop
    # legitimately when decimation leaves a tile all-nodata
    assert max(zooms) == 4 and min(zooms) >= 1
    assert all(1 <= z <= 4 for z in zooms)
    assert meta["minzoom"] == "1" and meta["maxzoom"] == "4"
    for h in tiles.values():
        assert h in blobs


def test_cli_validation(tmp_path):
    with pytest.raises(SystemExit):
        main(["render", "/nonexistent.parquet", str(tmp_path / "o.mbtiles")])
    with pytest.raises(SystemExit):
        main(["render", "x", "y", "--minzoom", "9", "--maxzoom", "2"])
