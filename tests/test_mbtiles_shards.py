"""Distributed sharded .mbtiles sink: executor-side streamed writes,
quadkey/hash routing parity with shard_for_tile, standalone shard
completeness, manifest accounting, and idempotent re-write."""

import json
import os
import sqlite3

import pytest

from rastertiler_rs_spark.fixtures import images_parquet
from rastertiler_rs_spark.operators.mbtiles_sink import (
    materialize_mbtiles, read_mbtiles_shards, shard_for_tile,
    write_mbtiles_shards)
from rastertiler_rs_spark.operators.render import metadata_table, render


@pytest.fixture(scope="module")
def fused(spark):
    images = spark.read.parquet(images_parquet(48, "u8"))
    df = render(images, 0, 8, tile_size=64, dtype_tag="u8").persist()
    df.count()
    yield df
    df.unpersist()


def _expected(fused):
    rows = fused.collect()
    tiles = sorted((r["zoom"], r["x"], r["tile_row"], r["tile_hash"])
                   for r in rows)
    blobs = {r["tile_hash"]: bytes(r["png"]) for r in rows}
    return tiles, blobs


def test_quadkey_shards_roundtrip(spark, fused, tmp_path):
    out = str(tmp_path / "shards")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "shardtest")
    manifest = write_mbtiles_shards(fused, meta, out, prefix_zoom=2)

    exp_tiles, exp_blobs = _expected(fused)
    tiles, blobs, m = read_mbtiles_shards(out)
    assert sorted(tiles) == exp_tiles
    assert {h: bytes(b) for h, b in blobs.items()} == exp_blobs
    assert m["name"] == "shardtest"
    assert manifest["total_tiles"] == len(exp_tiles)
    assert manifest["sharding"] == "quadkey:2"
    # manifest counts match the files on disk
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk["shards"] == {str(k): v for k, v in manifest["shards"].items()} \
        or disk["shards"] == manifest["shards"]
    assert not [f for f in os.listdir(out) if f.startswith(".shard-")]


def test_every_tile_in_its_computed_shard(fused, spark, tmp_path):
    """The JVM shard expression must equal shard_for_tile verbatim:
    every row of every shard file sits where the python twin says."""
    out = str(tmp_path / "shards")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    write_mbtiles_shards(fused, meta, out, prefix_zoom=2)
    seen = 0
    for name in os.listdir(out):
        if not name.endswith(".mbtiles"):
            continue
        shard = int(name.split("-")[1].split(".")[0])
        conn = sqlite3.connect(os.path.join(out, name))
        for z, x, y, _ in conn.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_id FROM map"):
            assert shard_for_tile(z, x, y, 2) == shard
            seen += 1
        # every shard is standalone: tiles view + metadata present
        assert conn.execute("SELECT COUNT(*) FROM tiles").fetchone()[0] > 0
        assert conn.execute("SELECT COUNT(*) FROM metadata").fetchone()[0] > 0
        conn.close()
    assert seen == fused.count()


def test_hash_shards_balance_and_roundtrip(spark, fused, tmp_path):
    out = str(tmp_path / "hashed")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    manifest = write_mbtiles_shards(fused, meta, out, hash_shards=8)
    exp_tiles, _ = _expected(fused)
    tiles, _, _ = read_mbtiles_shards(out)
    assert sorted(tiles) == exp_tiles
    counts = [v["n_tiles"] for v in manifest["shards"].values()]
    assert len(counts) == 8                       # uniform enough to hit all
    assert max(counts) < 3 * min(counts)


def test_rewrite_is_idempotent(spark, fused, tmp_path):
    out = str(tmp_path / "twice")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    m1 = write_mbtiles_shards(fused, meta, out, prefix_zoom=1)
    m2 = write_mbtiles_shards(fused, meta, out, prefix_zoom=1)
    assert m1["shards"] == m2["shards"]
    exp_tiles, _ = _expected(fused)
    tiles, _, _ = read_mbtiles_shards(out)
    assert sorted(tiles) == exp_tiles


def test_shards_union_equals_single_file(spark, fused, tmp_path):
    """Golden comparison: the sharded sink and the driver-side single
    file hold the identical tile set and blobs."""
    out = str(tmp_path / "shards")
    single = str(tmp_path / "single.mbtiles")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    write_mbtiles_shards(fused, meta, out, prefix_zoom=2)
    materialize_mbtiles(fused, meta, single)
    conn = sqlite3.connect(single)
    stiles = sorted(conn.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_id FROM map"))
    sblobs = dict(conn.execute("SELECT tile_id, tile_data FROM images"))
    conn.close()
    tiles, blobs, _ = read_mbtiles_shards(out)
    assert sorted(tiles) == stiles
    assert {h: bytes(b) for h, b in blobs.items()} \
        == {h: bytes(b) for h, b in sblobs.items()}


def test_reused_out_dir_is_cleared(spark, fused, tmp_path):
    """A rerun into the same out_dir with fewer shards must not union
    with the previous run's files (stale shard-/tmp/manifest sweep)."""
    out = str(tmp_path / "reuse")
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    write_mbtiles_shards(fused, meta, out, prefix_zoom=2)   # up to 17 shards
    # plant an orphan temp from a hypothetical dead attempt
    open(os.path.join(out, ".shard-00001.tmp-dead"), "wb").write(b"x")
    m2 = write_mbtiles_shards(fused, meta, out, hash_shards=2)
    names = sorted(os.listdir(out))
    assert [n for n in names if n.endswith(".mbtiles")] \
        == [f"shard-{i:05d}.mbtiles" for i in sorted(m2["shards"])]
    assert not [n for n in names if n.startswith(".shard-")]
    exp_tiles, _ = _expected(fused)
    tiles, _, _ = read_mbtiles_shards(out)
    assert sorted(tiles) == exp_tiles


def test_bad_prefix_zoom_rejected(spark, fused, tmp_path):
    images = spark.read.parquet(images_parquet(48, "u8"))
    meta = metadata_table(spark, images, 0, 8, "t")
    with pytest.raises(ValueError, match="prefix_zoom"):
        write_mbtiles_shards(fused, meta, str(tmp_path / "x"), prefix_zoom=0)
    with pytest.raises(ValueError, match="prefix_zoom"):
        shard_for_tile(5, 1, 1, prefix_zoom=0)
